package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must execute at sf0.001 — a fast whole-surface
  * regression net (schema errors, unresolved columns, runtime exceptions).
  */
class QuerySweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, TestSpark.sf)
      assert(df.count() >= 0)
    }
  }

  /** Whole-surface plan-shape guard: no declared query may plan a
    * data-sized Cartesian product, an unbounded BroadcastNestedLoopJoin,
    * or an unpartitioned (single-partition) WindowExec — the shapes that
    * cannot survive a 100 TB input. Plans are walked through the AQE
    * wrapper via [[TestSpark.collectDeep]]; the round-5 version collected
    * on the `AdaptiveSparkPlanExec` leaf and was vacuously green.
    *
    * A BNLJ is allowed BY SHAPE when its broadcast build side reduces to
    * one row — a grouping-key-free aggregate with no row-multiplying
    * operator (generate/expand/union/join) anywhere in the build subtree.
    * That is the documented `crossJoin(broadcast(1-row totals))` pattern
    * (window-free global totals: text_bm25's corpus stats, lowerMedian,
    * q_modularity's m, equidepth's n_total, ...). Everything else must be
    * on the explicit whitelist below, each entry with its bound.
    */
  /** True when the plan provably produces AT MOST ONE ROW: a grouping-
    * key-free aggregate anywhere at the top guarantees exactly one row
    * regardless of what feeds it; row-preserving/reducing wrappers
    * (project/filter/sort/exchange/codegen) pass through; a nested-loop
    * join of two ≤1-row sides is ≤1 row (the chained
    * `crossJoin(broadcast(total)).crossJoin(broadcast(total))` shape).
    */
  private def oneRowish(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p match {
      case a: aggregate.BaseAggregateExec => a.groupingExpressions.isEmpty
      case j: joins.BroadcastNestedLoopJoinExec =>
        oneRowish(j.left) && oneRowish(j.right)
      case c: joins.CartesianProductExec => oneRowish(c.left) && oneRowish(c.right)
      case a: AdaptiveSparkPlanExec => oneRowish(a.initialPlan)
      case q: QueryStageExec => oneRowish(q.plan)
      case r: exchange.ReusedExchangeExec => oneRowish(r.child)
      case w: WholeStageCodegenExec => oneRowish(w.child)
      case i: InputAdapter => oneRowish(i.child)
      case pr: ProjectExec => oneRowish(pr.child)
      case f: FilterExec => oneRowish(f.child)
      case e: exchange.Exchange => oneRowish(e.child)
      case s: SortExec => oneRowish(s.child)
      case l: LocalLimitExec => oneRowish(l.child)
      case g: GlobalLimitExec => g.limit <= 1 || oneRowish(g.child)
      case _ => false
    }
  }

  private def isOneRowBuild(
      j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec): Boolean = {
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    j.buildSide match {
      case BuildLeft => oneRowish(j.left)
      case BuildRight => oneRowish(j.right)
    }
  }

  /** Named exceptions that are NOT provable by the 1-row shape rule but
    * are still parameter-bounded by construction (bound stated per entry;
    * a future data-sized regression cannot hide behind these names
    * because every bound below is a CONFIG literal, not the data):
    *  - `q_join_size_est`: crosses two 1-row scalar sketch frames (1×1);
    *  - `sim_ivf_topk` / `sim_ivf_det_topk`: corpus × nlist-row centroid
    *    table (nlist = 16 config rows) — the inherent O(N·nlist)
    *    quantizer assignment; the learned (non-det) variant also carries
    *    the recallAudit's exact baseline — corpus × the literal
    *    `vec_id < 5` probe set, the same bounded shape as sim_topk;
    *  - `sim_pq_topk` / `sim_pq_det_topk`: sample × (m·ksub)-row codebook
    *    (m·ksub = 8·16 config rows) for encode, query × codebook for ADC;
    *    learned variant + audit baseline as above;
    *  - `sim_ivfpq_topk` / `sim_ivfpq_det_topk`: both of the above;
    *  - `dedup_sweep`: cumulative pair counts × (bands+1 = 11)-row
    *    threshold table — the sweep grid, not data;
    *    (`dedup_semantic_ivf` needs NO entry: routing is a pure per-row
    *    expression over the embedded centroid matrix — no join at all);
    *  - `sim_topk` / `q_knn_classify` / `q_hard_negatives` /
    *    `q_rrf_fusion` / `q_confusion` / `q_rand_index`: the exact
    *    brute-force cosine baselines — corpus scan × a broadcast probe
    *    set bounded by a LITERAL id cut (5 / 25 / 20 / 1 / ≤500 / ≤500
    *    probes respectively), never a corpus fraction; the ANN family
    *    (`sim_lsh*`, `sim_ivf*`) is the scale path for unbounded probes;
    *  - `dedup_embcos`: probe side bounded by the literal `vec_id < 100`
    *    cut (and `embeddingNearDups` enforces maxProbeRows);
    *  - `dedup_semantic_ivf_recall` / `dedup_semantic_ivf_recall08`: the
    *    gates' exact-truth leg is `embeddingNearDups` over the
    *    `id % max(1, n/2000) = 0` stratum — ≤ ~3000 probe rows BY THE
    *    MODULUS POLICY at every n (and the maxProbeRows guard enforces
    *    it), so each audit costs O(n) cosines, never the n² brute force
    *    (the 08 gate's clustered view adds only a broadcast-ranged
    *    center equi-join on top);
    *  - `q_mad_outliers`: both crossed frames are rank-selected medians —
    *    a filter on `rank == (n+1) DIV 2` keeps exactly one row, which
    *    the structural rule cannot see through a join;
    *  - `q_qdigest_quantiles`: 5 literal probe rows × the q-digest
    *    partition, whose size is ≤ (maxBits+1)·(2·10⁶/epsPpm + 2) =
    *    26·202 rows by the q-digest space theorem — parameters, not data.
    */
  private val boundedCrossAllowed = Set(
    "q_join_size_est",
    "sim_ivf_topk", "sim_ivf_det_topk",
    "sim_pq_topk", "sim_pq_det_topk",
    "sim_ivfpq_topk", "sim_ivfpq_det_topk",
    "dedup_sweep",
    "sim_topk", "q_knn_classify", "q_hard_negatives", "q_rrf_fusion",
    "q_confusion", "q_rand_index", "dedup_embcos", "q_mad_outliers",
    "q_qdigest_quantiles", "dedup_semantic_ivf_recall",
    "dedup_semantic_ivf_recall08")

  private def scaleHostileShapes(df: org.apache.spark.sql.DataFrame,
                                 allowBoundedCross: Boolean): Seq[String] = {
    val plan = df.queryExecution.executedPlan
    val globalWindows = TestSpark.collectDeep(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    val crosses = TestSpark.collectDeep(plan) {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec
        if !allowBoundedCross => j.nodeName
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
        if !allowBoundedCross && !isOneRowBuild(j) => j.nodeName
    }
    (if (globalWindows.nonEmpty) Seq("unpartitioned WindowExec") else Nil) ++
      crosses.distinct
  }

  test("no declared query plans a data-sized cross product or global window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        scaleHostileShapes(fn(spark, TestSpark.sf), boundedCrossAllowed(name))
          .map(s => s"$name: $s")
    }
    assert(offenders.isEmpty, s"scale-hostile plan shapes:\n${offenders.mkString("\n")}")
  }

  test("negative control: the guard catches a deliberate data×data cross") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = (1 to 10).toDF("x")
    val bad = d.crossJoin(d.select(col("x").as("y")))
    assert(scaleHostileShapes(bad, allowBoundedCross = false).nonEmpty,
      "guard failed to flag crossJoin(data, data) — it is vacuous again")
    val badWin = d.withColumn("r",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("x"))))
    assert(scaleHostileShapes(badWin, allowBoundedCross = false)
        .contains("unpartitioned WindowExec"),
      "guard failed to flag a global-order window — it is vacuous again")
  }
}
