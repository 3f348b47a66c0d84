package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over DataFrame edge lists — PageRank and triangle
  * counting re-expressed as joins and aggregations so Catalyst plans,
  * partitions and (for the rank iteration) AQE re-plans them like any
  * other relational workload. No GraphX, no RDDs: the edge frame IS the
  * graph, exactly how a 100 TB link table would live in parquet.
  *
  * Determinism: ranks are FIXED-POINT LONGS (scale 1e12) and every
  * iteration is integer arithmetic — sums are order-independent under
  * any partitioning, so the result is bit-reproducible and replayable
  * in external SQL (no floating-point accumulation-order drift, the
  * q_token_drift lesson applied to an iterative algorithm).
  */
object Graph {

  /** Fixed-point scale: rank 1.0 == 1e12. At damping 0.85 and rank mass
    * bounded by n·SCALE, every intermediate stays inside int64 for
    * n ≤ ~500k nodes; larger graphs lower SCALE (the estimate is
    * documented with the operator, not enforced row-by-row).
    */
  val Scale: Long = 1000000000000L

  /** Directed transition edges from an ordered event log: within each
    * `sessionCol` group, consecutive events (ordered by `orderCols`)
    * yield one src→dst edge; the result aggregates to (src, dst, weight)
    * with weight = transition count. One window shuffle on the session
    * key + one edge aggregation — both partition cleanly at any scale.
    */
  def transitionEdges(events: DataFrame, sessionCol: Column,
                      nodeCol: Column, orderCols: Column*): DataFrame = {
    val projected = events.select(
      sessionCol.as("__s") +: nodeCol.as("dst") +:
        orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }: _*)
    val w = Window.partitionBy(col("__s"))
      .orderBy(orderCols.indices.map(i => col(s"__o$i")): _*)
    projected
      .withColumn("src", lag(col("dst"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight"))
  }

  /** Weighted PageRank with damping 0.85 over (src, dst, weight) edges.
    *
    * Each iteration in fixed-point integers:
    * {{{
    *   share(e)  = (rank(src) div wout)·w + ((rank(src) mod wout)·w) div wout
    *   rank'(v)  = 0.15·SCALE + (Σ_in share · 17) div 20
    * }}}
    * The share split is the overflow-safe factoring of
    * floor(rank·w / wout): `rank·w` alone would overflow int64 on big
    * graphs, while each factored term stays ≤ rank + wout·w. Dangling
    * nodes (no out-edges) leak their mass — the classic simplified
    * variant; ranking order is unaffected for the connected case and the
    * leak is documented rather than patched with an extra global
    * aggregate per iteration.
    *
    * Plan shape per iteration: one broadcast-or-shuffle hash join of the
    * rank frame (n rows) to edges + one hash aggregation on dst — no
    * driver-side loops over data, only over the ITERATION COUNT. For
    * long chains pass `checkpointEvery` &gt; 0 (dedup_canonical's pattern)
    * to cut lineage growth.
    */
  def pageRank(edges: DataFrame, iterations: Int = 8,
               checkpointEvery: Int = 0,
               teleportSeeds: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations=$iterations out of [1, 100]")
    val base = (Scale * 3L) / 20L // 0.15 in fixed point, exactly
    // materialize the edge list ONCE: it is referenced by every
    // iteration plus the node/out-weight derivations, and without the
    // checkpoint Catalyst re-runs whatever produced it (e.g. the event-
    // log window behind transitionEdges) once per reference — measured
    // 8× the window cost at 8 iterations. The edge list is the graph
    // itself, which any iterative algorithm must hold anyway.
    val e = edges.localCheckpoint(true)
    // teleportSeeds personalizes the walk (PPR, Jeh & Widom 2003-style
    // restart set): only seed nodes receive the 0.15 teleport mass, so
    // rank concentrates around the seeds — "importance relative to this
    // trusted set" instead of global importance. The seed frame is
    // broadcast (restart sets are query-sized); None keeps the classic
    // uniform teleport and the exact previous behavior.
    val nodes0 = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
    val nodes = (teleportSeeds match {
      case Some(sd) => nodes0.join(
          broadcast(sd.select(col("node")).distinct()
            .withColumn("__seed", lit(true))),
          Seq("node"), "left")
        .withColumn("__base",
          when(col("__seed"), lit(base)).otherwise(lit(0L)))
        .select(col("node"), col("__base"))
      case None => nodes0.withColumn("__base", lit(base))
    }).localCheckpoint(true)
    val wout = e.groupBy(col("src"))
      .agg(sum(col("weight")).as("wout"))
    // rank(src) enters each iteration joined THROUGH wout so the share
    // denominator rides along without a second join against the edges
    val withOut = e.join(wout, "src").localCheckpoint(true)
    var ranks = nodes.select(col("node"), lit(Scale).as("rank"))
    for (i <- 1 to iterations) {
      // DIV, not `/`: Spark's `/` on longs is double division — exact
      // floor semantics and bit-parity with the oracle need integer DIV
      val contrib = withOut
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          expr("(rank DIV wout) * weight + " +
            "((rank % wout) * weight) DIV wout").as("share"))
        .groupBy(col("dst"))
        .agg(sum(col("share")).as("in_mass"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (col("__base") +
            expr("(coalesce(in_mass, CAST(0 AS BIGINT)) * 17) DIV 20"))
            .as("rank"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  /** [[pageRank]] with EXACT dangling-mass conservation (Page et al.
    * 1999's full model rather than the simplified leak-the-mass variant):
    * each iteration sums the rank held by nodes with no out-edges and
    * redistributes it uniformly — `rank' = base + 0.85·(in_mass + D DIV n)`
    * in the same fixed-point integers, so total mass is conserved up to
    * the truncation units (&lt; 1 unit per node per DIV, plus D mod n per
    * iteration — "to the fixed-point unit").
    *
    * Plan shape per iteration: the [[pageRank]] join+agg PLUS one 1-row
    * dangling-mass aggregate broadcast back (a grouping-free aggregate —
    * the guard-allowed shape). The rank frame feeds TWO branches per
    * iteration (contributions and the dangling sum), so it is
    * checkpointed every round — n-row frames, the bounded case of the
    * branch-re-execution rule.
    */
  def pageRankExact(edges: DataFrame, iterations: Int = 8): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations=$iterations out of [1, 100]")
    val base = (Scale * 3L) / 20L
    val e = edges.localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val wout = e.groupBy(col("src")).agg(sum(col("weight")).as("wout"))
    val withOut = e.join(wout, "src").localCheckpoint(true)
    // nodes that appear only as destinations hold rank but emit none
    val dangling = nodes
      .join(e.select(col("src").as("node")).distinct(), Seq("node"), "left_anti")
      .localCheckpoint(true)
    val nFrame = nodes.agg(count(lit(1)).as("__n"))
    var ranks = nodes.select(col("node"), lit(Scale).as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = withOut
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          expr("(rank DIV wout) * weight + " +
            "((rank % wout) * weight) DIV wout").as("share"))
        .groupBy(col("dst"))
        .agg(sum(col("share")).as("in_mass"))
      val dmass = ranks.join(dangling, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("__d"))
      // non-negative operands throughout, so Spark's truncating DIV and
      // a flooring replay agree
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(dmass))
        .crossJoin(broadcast(nFrame))
        .select(col("node"),
          (lit(base) +
            expr("((coalesce(in_mass, CAST(0 AS BIGINT)) + __d DIV __n)" +
              " * 17) DIV 20")).as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** Exact triangle counting per node over an UNDIRECTED simple graph
    * given as (a, b) pairs with a &lt; b (one row per edge). Uses the
    * degree-ordered orientation (Schank &amp; Wagner 2005, "Finding,
    * counting and listing all triangles in large graphs"): each edge is
    * directed from its lower-(degree, id) endpoint to the higher one, so
    * every wedge is enumerated exactly once from its smallest-degree
    * corner — the intermediate wedge count is Σ d_out(v)², bounded by
    * O(E^1.5) instead of Σ d(v)² (which a hub node makes quadratic).
    * That orientation is what keeps the self-join feasible when a 100 TB
    * co-occurrence graph has power-law hubs.
    *
    * Output: (node, n_triangles) for every node in at least one
    * triangle.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // und feeds three consumers (degrees, orientation, closing edges) —
    // checkpoint or the upstream edge derivation (e.g. a co-occurrence
    // self-join) runs three times. Bounded: it IS the edge list.
    val und = edges.select(col("a"), col("b")).localCheckpoint(true)
    val deg = und.select(col("a").as("v"))
      .unionByName(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // orient: lower (deg, id) -> higher (deg, id); total order, no ties
    val oriented = und
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("lo"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("hi"))
    // wedges from the low corner; close them against the undirected edge
    // set — `und` already holds exactly one (a < b) row per edge
    val e1 = oriented.select(col("lo").as("u"), col("hi").as("x"))
    val e2 = oriented.select(col("lo").as("u"), col("hi").as("y"))
    val wedges = e1.join(e2, "u").filter(col("x") < col("y"))
    val closing = und.select(col("a").as("x"), col("b").as("y"))
    val tris = wedges.join(closing, Seq("x", "y"))
      .select(col("u"), col("x"), col("y"))
    tris.select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Multi-source BFS hop distance over directed (src, dst) edges:
    * `hops(v)` = length of the shortest edge path from any seed to `v`,
    * up to `maxHops`. The reachability primitive behind "documents
    * within k citation hops of a trusted set" or contamination spread
    * from a seed list.
    *
    * Frontier-based: round `i` joins ONLY the previous round's newly
    * discovered nodes (not the whole distance table) against the edge
    * list, then anti-joins against everything already labeled — so per
    * round the shuffled volume is O(frontier·out-degree), and every join
    * is a hash equi-join on the node key. The frontier is checkpointed
    * per round (it is re-referenced by the next join AND the growing
    * union; without it lineage doubles per hop). All-integer output —
    * bit-reproducible under any partitioning.
    *
    * Output: (node, hops) for every node reached within `maxHops`;
    * seeds themselves carry hops = 0.
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64, s"maxHops=$maxHops out of [1, 64]")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    var frontier = seeds.select(col("node")).distinct().localCheckpoint(true)
    var dist = frontier.withColumn("hops", lit(0L))
    var reached = frontier
    for (i <- 1 to maxHops) {
      frontier = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("dst").as("node"))
        .distinct()
        .join(reached, Seq("node"), "left_anti")
        .localCheckpoint(true)
      dist = dist.unionByName(frontier.withColumn("hops", lit(i.toLong)))
      reached = reached.unionByName(frontier).localCheckpoint(true)
    }
    dist
  }

  /** Single-source-set weighted shortest paths by `rounds` of
    * Bellman–Ford relaxation — [[bfsHops]]'s weighted sibling. Each round
    * relaxes EVERY currently-known distance through every edge
    * (dist ⋈ edges on the node key, one hash join) and folds the result
    * with a min aggregate; `rounds` bounds the path LENGTH considered,
    * so distances are exact for all shortest paths of ≤ `rounds` edges
    * (the classic bound: |V|−1 rounds = exact everywhere). Integer
    * weights only — min over integer sums is order-independent, so the
    * result is bit-reproducible under any partitioning; no
    * priority-queue Dijkstra (inherently sequential) is needed when
    * rounds are bounded and joins are hash-parallel.
    *
    * Per-round frames are checkpointed ([[pageRank]] pattern). Output:
    * `(node, dist)` for every node reachable within `rounds` edges;
    * seeds carry dist = 0.
    */
  def shortestPaths(edges: DataFrame, seeds: DataFrame,
                    rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds=$rounds out of [1, 64]")
    val e = edges.select(col("src"), col("dst"),
      col("weight").cast("long").as("w")).localCheckpoint(true)
    var dist = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val relaxed = dist.join(e, dist("node") === e("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
    }
    dist
  }

  /** HITS fixed-point scale: scores live in [0, 10⁶]. The half-step raw
    * sums are bounded by max-degree·10⁶ and the normalization multiply by
    * raw·10⁶ ≤ degree·10¹² — inside int64 for degrees to ~9·10⁶; beyond
    * that, lower the scale.
    */
  val HitsScale: Long = 1000000L

  /** HITS hubs and authorities (Kleinberg, "Authoritative sources in a
    * hyperlinked environment", JACM 1999) over directed DISTINCT (src,
    * dst) edges, in fixed-point integers: each iteration is
    * `a(v) = Σ_{u→v} h(u)` then `h(v) = Σ_{v→u} a(u)`, each half-step
    * MAX-normalized (score·10⁶ DIV max) instead of the paper's L2 norm —
    * sqrt is not bit-reproducible across engines, max-normalization
    * preserves the ranking and keeps every intermediate an
    * order-independent integer sum. The max rides back as a broadcast
    * 1-row frame; per half-step one hash join + one hash aggregate on
    * node keys. Bounded iterations, localCheckpoint per round (the
    * [[pageRank]] pattern).
    *
    * Output: (node, hub, authority) at the declared scale.
    */
  def hits(edges: DataFrame, iterations: Int = 4): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      s"iterations=$iterations out of [1, 64]")
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    var hub = nodes.withColumn("h", lit(HitsScale))
    var auth = nodes.withColumn("a", lit(HitsScale))
    for (_ <- 1 to iterations) {
      val aRaw = e.join(hub.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("h")).as("raw"))
      auth = normalized(nodes, aRaw, "a").localCheckpoint(true)
      val hRaw = e.join(auth.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node")).agg(sum(col("a")).as("raw"))
      hub = normalized(nodes, hRaw, "h").localCheckpoint(true)
    }
    nodes.join(hub, Seq("node")).join(auth, Seq("node"))
      .select(col("node"), col("h").as("hub"), col("a").as("authority"))
  }

  /** Max-normalize a raw half-step sum onto all nodes (absent → 0). */
  private def normalized(nodes: DataFrame, raw: DataFrame,
                         out: String): DataFrame = {
    val mx = raw.agg(max(col("raw")).as("__mx"))
    nodes.join(raw, Seq("node"), "left")
      .crossJoin(broadcast(mx))
      .select(col("node"),
        expr(s"coalesce(raw, CAST(0 AS BIGINT)) * ${HitsScale}L DIV __mx")
          .as(out))
  }

  /** Deterministic synchronous label propagation (Raghavan, Albert &amp;
    * Kumara, "Near linear time algorithm to detect community structures
    * in large-scale networks", Phys. Rev. E 2007) over undirected
    * (a &lt; b) edges: labels start as node ids; each round every node
    * adopts the most frequent label among its neighbors, ties toward the
    * SMALLEST label — the randomized tie-break of the paper replaced by a
    * total order, so rounds are pure functions of the graph. Communities
    * are denser than connected components: a bridge edge joins two
    * components but its endpoints keep their majority-side labels.
    *
    * The per-round argmax is `max(struct(count, -label))` inside a hash
    * aggregate — fieldwise struct max gives (max count, then min label)
    * with NO per-node window: two shuffles per round (neighbor-label join,
    * label-count aggregate), both hash equi-joins/aggs on node keys.
    * Synchronous updates can oscillate on bipartite structure, so
    * `rounds` is a fixed budget (the paper's async convergence reruns
    * are inherently order-dependent; bounded-round sync is what is
    * reproducible at scale). Per-round localCheckpoint truncates the
    * iterative lineage, as in [[pageRank]].
    *
    * Output: (node, label) — nodes sharing a label form a community.
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds=$rounds out of [1, 64]")
    val und = edges.select(col("a"), col("b"))
    val e = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val upd = e
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("node"))
        .agg(max(struct(col("c"), negate(col("lbl")).as("nl"))).as("m"))
        .select(col("node"), negate(col("m.nl")).as("newlbl"))
      labels = labels.join(upd, Seq("node"), "left")
        .select(col("node"), coalesce(col("newlbl"), col("lbl")).as("lbl"))
        .localCheckpoint(true)
    }
    labels.select(col("node"), col("lbl").as("label"))
  }

  /** Deterministic random-walk corpus over directed (src, dst) edges —
    * the DeepWalk / node2vec sampling stage (Perozzi, Al-Rfou &amp; Skiena,
    * "DeepWalk: Online Learning of Social Representations", KDD 2014)
    * with the RNG replaced by a content hash: the neighbor taken at step
    * t of walk (start, w) is `neighbors[md5(start|w|t|node) mod degree]`
    * over a deterministic neighbor ranking (row_number by dst). The walk
    * corpus is therefore a pure function of the graph — re-runs,
    * partitionings and engines all sample identical walks, which makes
    * embedding training reproducible and the sampler oracle-checkable.
    *
    * Per step: one equi-join of the walk frontier (|starts|·walksPerNode
    * rows, CONSTANT over steps) against the ranked neighbor frame on
    * (node, idx) — the degree rides in on the same row, so the chosen
    * neighbor is selected by the join itself with no per-neighbor
    * fan-out. All hash equi-joins on node keys; the neighbor frame
    * shuffles once and is reused every step. Walks that reach a node
    * with no out-edges simply end (their remaining steps emit no rows),
    * as in the reference samplers.
    *
    * Output: (start, w, t, node) trail rows — t = 0 is the start itself.
    */
  def randomWalks(edges: DataFrame, starts: DataFrame, steps: Int,
                  walksPerNode: Int): DataFrame = {
    require(steps >= 1 && steps <= 64, s"steps=$steps out of [1, 64]")
    require(walksPerNode >= 1 && walksPerNode <= 1024,
      s"walksPerNode=$walksPerNode out of [1, 1024]")
    val e = edges.select(col("src"), col("dst")).distinct()
    val nbr = e.select(col("src"), col("dst"),
        row_number().over(Window.partitionBy(col("src")).orderBy(col("dst")))
          .as("idx"),
        count(lit(1)).over(Window.partitionBy(col("src"))).as("deg"))
      .localCheckpoint(true)
    var cur = starts.select(col("node").as("start")).distinct()
      .select(col("start"),
        explode(sequence(lit(1), lit(walksPerNode))).as("w"))
      .withColumn("node", col("start"))
      .localCheckpoint(true)
    var trail = cur.withColumn("t", lit(0))
    for (t <- 1 to steps) {
      val u = conv(substring(md5(concat_ws("|",
        col("start"), col("w"), lit(t), col("node"))), 1, 15), 16, 10)
        .cast("long")
      cur = cur.join(nbr, cur("node") === nbr("src"))
        .filter(col("idx") === u % col("deg") + 1)
        .select(col("start"), col("w"), col("dst").as("node"))
        .localCheckpoint(true)
      trail = trail.unionByName(cur.withColumn("t", lit(t)))
    }
    trail.select(col("start"), col("w"), col("t"), col("node"))
  }

  /** k-core decomposition by iterative peeling: repeatedly remove nodes
    * of degree &lt; k (with their edges) until no such node remains; the
    * surviving subgraph is the k-core. Classic corpus-graph curation
    * primitive — e.g. keep only documents embedded in a dense
    * similarity neighborhood, or users with sustained interaction.
    *
    * Each round is one degree aggregation + one semi-join on each edge
    * endpoint — all equi-joins on the node key, hash-partitionable at
    * any scale; the edge frame shrinks monotonically so later rounds
    * get cheaper. `rounds` bounds the iteration for plan determinism
    * (the fixpoint is typically reached in a handful of rounds; pass
    * the diameter-scaled value for adversarial chains — a path graph
    * peels one node per round at k=2). All arithmetic is integer.
    *
    * Input: undirected (a &lt; b) edge rows. Output: (node, degree) of
    * the k-core members with their WITHIN-CORE degree.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 8): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(rounds >= 1 && rounds <= 64, s"rounds=$rounds out of [1, 64]")
    // Early exit at the FIXPOINT (same discipline as canonicalAssignments):
    // peeling is idempotent once no node falls below k, so stopping when a
    // round removes no edge is result-identical to running all `rounds`.
    // The row-count probe rides the eager checkpoint's OWN materializing
    // job via Dataset.observe — round 14 scheduled a separate count() job
    // per round, and at bench scale the per-job constant made the early
    // exit a net loss on graphs whose fixpoint never arrives early
    // (measured on both boxes); observed counts cost zero extra jobs.
    def checkpointCounted(df: DataFrame): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation()
      val out = df.observe(obs, count(lit(1)).as("n")).localCheckpoint(true)
      (out, obs.get("n").asInstanceOf[Long])
    }
    var (und, prev) = checkpointCounted(edges.select(col("a"), col("b")))
    var it = 0
    var stable = false
    while (it < rounds && !stable) {
      val deg = und.select(col("a").as("v"))
        .unionByName(und.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("v"))
      val (next, cur) = checkpointCounted(und
        .join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b")))
      und = next
      stable = cur == prev
      prev = cur
      it += 1
    }
    und.select(col("a").as("v"))
      .unionByName(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("degree"))
      .filter(col("degree") >= k)
      .select(col("v").as("node"), col("degree"))
  }

  /** First-order Markov transition model over (src, dst, weight) edges:
    * P(dst | src) in exact parts-per-million (`weight·10⁶ div Σ_src w`,
    * truncating — the q_attribution fixed-point discipline, so rows are
    * bit-reproducible in external SQL). `is_top` marks each source's
    * argmax next state, ties to the smallest dst (max-of-struct, the
    * q_label_prop trick — no per-source window).
    *
    * Plan shape: one hash aggregation for the per-source totals (≤ one
    * row per distinct src) joined back onto the edges — both sides
    * partition on src, so the join co-locates without a broadcast even
    * when the state space is huge; nothing introduces a global order.
    */
  def markovTransitions(edges: DataFrame): DataFrame = {
    val totals = edges.groupBy(col("src"))
      .agg(sum(col("weight")).as("__tot"),
        max(struct(col("weight"), -col("dst"))).as("__best"))
    edges.join(totals, Seq("src"))
      .select(col("src"), col("dst"), col("weight"),
        expr("(weight * 1000000L) DIV __tot").as("ppm"),
        (col("dst") === -col("__best").getField("col2")).as("is_top"))
  }

  /** Neighborhood link prediction over an undirected (a &lt; b) edge list:
    * for every non-adjacent pair at distance 2, the common-neighbor
    * count and the Resource Allocation index Σ_z 1/deg(z)
    * (Zhou/Lü/Zhang 2009) — RA in exact fixed-point,
    * `Σ_z SCALE div deg(z)`, so the score is an order-independent
    * integer sum, reproducible in external SQL without libm.
    *
    * Plan shape: wedge self-join of the neighbor list on the shared
    * endpoint z (the q_triangles economics — bound hub degrees upstream
    * with a min-support cut), one hash aggregation on the candidate
    * pair, and one left-anti equi-join to drop already-linked pairs.
    * Everything partitions on small keys; no windows, no cross join.
    */
  def linkPrediction(edges: DataFrame): DataFrame = {
    val und = edges.select(col("a"), col("b"))
    // adjacency with both orientations: one row per (node, neighbor)
    val adj = und.unionByName(
      und.select(col("b").as("a"), col("a").as("b")))
      .select(col("a").as("z"), col("b").as("n"))
    val deg = adj.groupBy(col("z")).agg(count(lit(1)).as("deg"))
    val wedges = adj.alias("x").join(adj.alias("y"),
        col("x.z") === col("y.z") && col("x.n") < col("y.n"))
      .select(col("x.n").as("a"), col("y.n").as("b"), col("x.z").as("z"))
    val scored = wedges
      .join(deg, Seq("z"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(expr(s"${Scale}L DIV deg")).as("ra_score"))
    scored.join(und, Seq("a", "b"), "left_anti")
  }

  /** Degree distribution in power-of-two bins — the first audit anyone
    * runs on a new graph (hub detection, power-law eyeballing, skew-guard
    * sizing). One doubled-adjacency count per node, one hash aggregation
    * on ≤ 64 bins ([[graft.operators.Sampling.pow2Ceil]] bins without
    * libm), share in exact ppm.
    *
    * Output: `(bucket_degree, n_nodes, min_degree, max_degree,
    * share_ppm)` — bucket d covers degrees (d/2, d].
    */
  def degreeHistogram(edges: DataFrame): DataFrame = {
    val adj = edges.select(col("a"))
      .unionByName(edges.select(col("b").as("a")))
    val deg = adj.groupBy(col("a")).agg(count(lit(1)).as("degree"))
    val tot = deg.agg(count(lit(1)).as("__n"))
    deg.withColumn("bucket_degree", Sampling.pow2Ceil(col("degree")))
      .groupBy(col("bucket_degree"))
      .agg(count(lit(1)).as("n_nodes"), min(col("degree")).as("min_degree"),
        max(col("degree")).as("max_degree"))
      .crossJoin(broadcast(tot))
      .select(col("bucket_degree"), col("n_nodes"), col("min_degree"),
        col("max_degree"),
        expr("1000000 * n_nodes DIV __n").as("share_ppm"))
  }

  /** Community quality metrics — per-community size, internal-edge count,
    * cut size, volume, Newman modularity contribution and conductance for
    * a node→community assignment (e.g. [[labelPropagation]] output).
    *
    * All metrics are EXACT INTEGERS so external SQL replays them:
    *  - modularity contribution ×4m² (m = |undirected edges|): the paper's
    *    `e_c/m − (d_c/2m)²` scaled by 4m² is `4m·e_c − d_c²` — integer;
    *    Q·4m² = Σ_c of this column, so ranking and sums are exact. The
    *    products run in DECIMAL(38,0) (a bare int64 `4·m·e_c` wraps
    *    silently in Spark but ERRORS in DuckDB once m ≈ 1.5·10⁹ —
    *    engine divergence); the BIGINT output column is exact while
    *    |4m·e_c − d_c²| &lt; 2⁶³, i.e. for any graph below ~1.5·10⁹
    *    undirected edges — the documented contract;
    *  - conductance in ppm: `10⁶·cut_c DIV min(vol_c, 2m − vol_c)` (NULL
    *    when one side has zero volume — single-community graphs).
    *
    * Plan shape: two equi-joins of the edge list against the (node, label)
    * frame (labels are one row per node — broadcast when the node set is
    * small, hash-partitioned otherwise; Spark's stats pick), then one hash
    * aggregation on the community label. Degree/volume comes from the same
    * doubled adjacency as [[linkPrediction]]. No windows, no cross joins —
    * the whole thing is the canonical join+agg shape that scales linearly
    * in |E|.
    *
    * `edges`: undirected edge list `(a, b)` with a < b, deduplicated.
    * `labels`: `(node, label)` assignment covering every endpoint.
    * Output: `(label, n_nodes, internal_edges, cut_edges, volume,
    * modularity_num, conductance_ppm)` — one row per community.
    */
  def communityMetrics(edges: DataFrame, labels: DataFrame): DataFrame = {
    // the edge frame feeds FOUR branches (labeled join, doubled adjacency,
    // m count, volume); materialize once so an expensive upstream
    // derivation (e.g. a co-occurrence self-join) is not re-executed per
    // branch — the filtered graph is small by construction
    val und = edges.select(col("a"), col("b")).localCheckpoint(true)
    val lab = labels.select(col("node"), col("label")).localCheckpoint(true)
    val m1 = und.agg(count(lit(1)).as("m"))
    // each undirected edge labeled on both ends, exactly once
    val labeled = und
      .join(lab.select(col("node").as("a"), col("label").as("la")), Seq("a"))
      .join(lab.select(col("node").as("b"), col("label").as("lb")), Seq("b"))
    // internal edges per community
    val internal = labeled.filter(col("la") === col("lb"))
      .groupBy(col("la").as("label"))
      .agg(count(lit(1)).as("internal_edges"))
    // cut edges touch a community from either endpoint's side
    val cut = labeled.filter(col("la") =!= col("lb"))
      .select(col("la").as("label"))
      .unionByName(labeled.filter(col("la") =!= col("lb"))
        .select(col("lb").as("label")))
      .groupBy(col("label")).agg(count(lit(1)).as("cut_edges"))
    // volume = Σ deg over members; node count per community
    val adj = und.unionByName(und.select(col("b").as("a"), col("a").as("b")))
      .select(col("a").as("node"))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val vol = lab.join(deg, Seq("node"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("volume"))
    vol
      .join(internal, Seq("label"), "left")
      .join(cut, Seq("label"), "left")
      .na.fill(0L, Seq("internal_edges", "cut_edges"))
      .crossJoin(broadcast(m1))
      .select(col("label"), col("n_nodes"), col("internal_edges"),
        col("cut_edges"), col("volume"),
        expr("""CAST(CAST(4 AS DECIMAL(38,0)) * m * internal_edges -
               |  CAST(volume AS DECIMAL(38,0)) * volume AS BIGINT)"""
            .stripMargin)
          .as("modularity_num"),
        expr("""CASE WHEN least(volume, 2 * m - volume) = 0 THEN NULL
               |ELSE CAST(1000000 * cut_edges DIV
               |  least(volume, 2 * m - volume) AS BIGINT) END""".stripMargin)
          .as("conductance_ppm"))
  }
}
