package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke &amp; Buettcher, "Reciprocal
  * rank fusion outperforms Condorcet and individual rank learning
  * methods", SIGIR 2009) — the hybrid-retrieval merge: heterogeneous
  * rankers (BM25, dense cosine, ...) combine WITHOUT score calibration,
  * each contributing 1/(k + rank) for the documents on its list.
  *
  * Scale and determinism shape:
  *
  *  - each ranker's list is truncated to `perRanker` rows BEFORE fusion
  *    via orderBy.limit — Spark plans TakeOrderedAndProject (per-partition
  *    top-k + one bounded merge, never a global sort), so fusion sees
  *    ≤ rankers·perRanker rows however large the corpus is;
  *  - ranks inside a truncated list come from a bounded collect +
  *    array_sort + posexplode (the a3_fold trick), NOT a row_number over
  *    an unpartitioned window — same result, no single-partition
  *    WindowExec anywhere in the plan;
  *  - the RRF term is the 10¹²-scaled INTEGER `10¹² DIV (k + rank)`:
  *    integer sums are order-independent, so the fused score is
  *    bit-reproducible under any partitioning AND any ranker count
  *    (double addition would drift in the last ulp beyond two rankers).
  *    Adjacent ranks stay distinguishable while 10¹²/(k+r)² ≥ 1, i.e. to
  *    r ≈ 10⁶ — far beyond any practical list length.
  */
object Retrieval {

  /** Fuse rankers given as (id, score) frames; higher score = better.
    * Each ranker's order is made total by (score desc, id asc), so the
    * output is a pure function of the inputs.
    *
    * Output: (id, n_rankers, rrf_score) — the `topK` fused results by
    * (rrf_score desc, id), with n_rankers = how many lists the id hit.
    */
  def rrfFuse(rankers: Seq[DataFrame], perRanker: Int, topK: Int,
              kRrf: Int = 60): DataFrame = {
    require(rankers.nonEmpty && rankers.size <= 64,
      s"need 1..64 rankers, got ${rankers.size}")
    require(perRanker >= 1, s"perRanker=$perRanker must be >= 1")
    require(topK >= 1, s"topK=$topK must be >= 1")
    require(kRrf >= 1, s"kRrf=$kRrf must be >= 1")
    val contributions = rankers.map { r =>
      r.select(col("id"), col("score"))
        .orderBy(col("score").desc, col("id"))
        .limit(perRanker)
        // negated score makes the default fieldwise-ascending struct sort
        // equal (score desc, id asc); negation of a double is exact
        .select(struct(negate(col("score")).as("ns"), col("id").as("id"))
          .as("r"))
        .agg(array_sort(collect_list(col("r"))).as("rs"))
        .select(posexplode(col("rs")).as(Seq("pos", "r")))
        .select(col("r.id").as("id"),
          expr(s"1000000000000L DIV (${kRrf + 1} + pos)").as("term"))
    }
    contributions.reduce(_.unionByName(_))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_rankers"), sum(col("term")).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(topK)
  }

  /** Maximal-marginal-relevance selection (Carbonell &amp; Goldstein,
    * "The use of MMR, diversity-based reranking for reordering documents
    * and producing summaries", SIGIR 1998): greedily pick `k` documents
    * maximizing `λ·rel(d) − (1−λ)·max_{s∈selected} cos(d, s)` — the
    * diversified-context selection a RAG pipeline runs after retrieval so
    * the packed context isn't k near-copies of the best hit.
    *
    * Input: a CANDIDATE frame (id, vec, rel) — already truncated by the
    * upstream retriever (e.g. [[rrfFuse]] or a top-k ANN), so every join
    * here is bounded: per round, candidates × selected (≤ k broadcast
    * rows) for the max-similarity penalty, one anti-join, and a
    * TakeOrdered(1) for the argmax. k rounds of bounded work — the greedy
    * loop is inherently sequential (each pick changes the penalty), which
    * is why MMR runs AFTER retrieval shrinks the corpus to candidates.
    *
    * Cross-engine determinism: `lambda` must be a multiple of 1/64
    * (dyadic — exact in binary), so λ·rel and (1−λ)·penalty are single
    * exact-input IEEE multiplies; cosine, max and subtraction introduce
    * no accumulation order; ties break by id. The selection is therefore
    * a pure function of the candidate set, replayable in external SQL.
    *
    * Output: (id, sel_rank, rel) — sel_rank 1..k in pick order. Fewer
    * than k candidates select everything.
    */
  def mmrSelect(candidates: DataFrame, k: Int, lambda: Double): DataFrame = {
    require(k >= 1 && k <= 64, s"k=$k out of [1, 64]")
    require(lambda >= 0.0 && lambda <= 1.0 &&
      lambda * 64 == math.rint(lambda * 64),
      s"lambda=$lambda must be a multiple of 1/64 in [0, 1] " +
        "(dyadic rationals keep both engines bit-identical)")
    val c = candidates.select(col("id"), col("vec"), col("rel"))
      .localCheckpoint(true)
    var sel = c.filter(lit(false)).withColumn("pick", lit(0))
    for (i <- 1 to k) {
      val rem = c.join(sel.select(col("id")), Seq("id"), "left_anti")
      val msim = rem.alias("r")
        .crossJoin(broadcast(sel.select(col("vec").as("sv"))))
        .select(col("r.id").as("id"),
          graft.functions.VectorFunctions.cosine(col("r.vec"), col("sv"))
            .as("sim"))
        .groupBy(col("id")).agg(max(col("sim")).as("ms"))
      val pick = rem.join(msim, Seq("id"), "left")
        .withColumn("score",
          lit(lambda) * col("rel") -
            lit(1.0 - lambda) * coalesce(col("ms"), lit(0.0)))
        .orderBy(col("score").desc, col("id"))
        .limit(1)
        .select(col("id"), col("vec"), col("rel"), lit(i).as("pick"))
        .localCheckpoint(true)
      sel = sel.unionByName(pick).localCheckpoint(true)
    }
    sel.select(col("id"), col("pick").as("sel_rank"), col("rel"))
  }
}
