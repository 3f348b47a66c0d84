package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed —
  * the standard salting construction. AQE's skew-join handling covers
  * sort-merge joins at runtime; explicit salting remains the tool when a
  * single hot key exceeds what one task can hold (e.g. the reference's
  * per-country feeds, where one country dominates volume).
  */
object Skew {
  private val SaltCol = "__graft_salt"

  /** Salted equi-join: the skewed (large) side gets a salt in [0, factor);
    * the small side is replicated `factor` times with every salt value, so
    * each hot key fans out over `factor` shuffle partitions. Result equals
    * `large.join(small, keys)` exactly.
    *
    * The salt comes from `monotonically_increasing_id()` (partition index +
    * row position) — per-row entropy independent of row CONTENT, so fully
    * duplicated hot rows still spread across buckets (a content hash would
    * send identical rows to one bucket, defeating the mitigation), and
    * deterministic for a given upstream partitioning.
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int = 8): DataFrame = {
    require(factor > 1)
    require(!(large.columns ++ small.columns).contains(SaltCol),
      s"input already has a $SaltCol column")
    val saltedLarge = large.withColumn(SaltCol,
      pmod(monotonically_increasing_id(), lit(factor.toLong)))
    val replicated = small.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(factor - 1L))))
    saltedLarge
      .join(replicated, keys :+ SaltCol)
      .drop(SaltCol)
  }

  /** Top-n heaviest keys with their share of total rows — the diagnostic
    * that decides whether salting / AQE skew handling is needed.
    *
    * The total is a separate one-row aggregate broadcast-cross-joined onto
    * the grouped result — NOT an unpartitioned window sum, which would move
    * every distinct key group to a single partition (exactly the skew shape
    * this diagnostic exists to detect). The grouped frame feeds both sides,
    * so the source is still scanned once.
    */
  def keySkewProfile(df: DataFrame, keys: Seq[String], topN: Int = 10): DataFrame = {
    val grouped = df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("n_rows"))
    val total = grouped.agg(sum(col("n_rows")).as("__graft_total"))
    grouped
      .crossJoin(broadcast(total))
      .withColumn("share", col("n_rows") / col("__graft_total"))
      .drop("__graft_total")
      .orderBy(col("n_rows").desc)
      .limit(topN)
  }
}
