package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed —
  * the standard salting construction. AQE's skew-join handling covers
  * sort-merge joins at runtime; explicit salting remains the tool when a
  * single hot key exceeds what one task can hold (e.g. the reference's
  * per-country feeds, where one country dominates volume).
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a random salt in
    * [0, factor); the small side is replicated `factor` times with every
    * salt value, so each hot key fans out over `factor` shuffle partitions.
    * Result equals `large.join(small, keys)` exactly.
    *
    * The salt uses a deterministic per-row hash (not rand()) so replays /
    * retries produce identical partitioning.
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int = 8): DataFrame = {
    require(factor > 1)
    val saltCol = pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(factor))
    val saltedLarge = large.withColumn("__salt", saltCol)
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1)).cast("array<long>")))
    saltedLarge
      .join(replicated, keys :+ "__salt")
      .drop("__salt")
  }

  /** Top-n heaviest keys with their share of total rows — the diagnostic
    * that decides whether salting / AQE skew handling is needed.
    */
  def keySkewProfile(df: DataFrame, keys: Seq[String], topN: Int = 10): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("share", col("n_rows") / lit(total))
      .orderBy(col("n_rows").desc)
      .limit(topN)
  }
}
