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
}
