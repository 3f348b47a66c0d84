package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: left point-in-time rows against right
  * [start, end] interval rows on an equality key — `e.ts BETWEEN w.start
  * AND w.end`. Spark plans a raw inequality join as a nested loop (or, with
  * an equality key, an equi-join whose matched groups still blow up on hot
  * keys); the scalable formulation buckets time so candidates come from a
  * pure equi-join:
  *
  *  - each right interval explodes to the buckets it overlaps
  *    (`(end − start) / bucketWidth + 1` rows — bounded when intervals are
  *    bounded);
  *  - each left point maps to exactly ONE bucket, so every matching
  *    (left, right) pair meets in exactly one bucket — no post-join
  *    dedupe;
  *  - the exact BETWEEN predicate filters inside the joined stream.
  *
  * Shuffle volume is |left| + |right| · avgSpan/bucketWidth rows on
  * (key, bucket) — hash-partitionable at any scale. Pick `bucketWidth`
  * near the typical interval length: much smaller multiplies the right
  * side, much larger piles unrelated rows into one bucket.
  *
  * The same technique underlies the interval-join implementations in
  * stream processors (e.g. Flink's interval join state buckets); DuckDB's
  * IEJoin covers the single-node case the oracle uses.
  */
object RangeJoin {

  /** Inner range join. `leftTime`, `rightStart`, `rightEnd` are timestamp
    * columns; `bucketWidth` is in seconds. Right value columns must not
    * collide with left columns (alias first), mirroring [[AsOfJoin]].
    */
  def pointInInterval(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightStart: String, rightEnd: String,
      bucketWidth: Long = 3600L): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one equality key")
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth must be positive")
    val overlap = right.columns.filterNot(keys.contains).toSet
      .intersect(left.columns.filterNot(keys.contains).toSet)
    require(overlap.isEmpty,
      s"right columns collide with left columns: $overlap — alias them first")

    val w = bucketWidth * 1000000L // micros
    val l = left.withColumn("__bucket",
      floor(unix_micros(col(leftTime)) / w))
    val r = right
      .withColumn("__bucket", explode(sequence(
        floor(unix_micros(col(rightStart)) / w),
        floor(unix_micros(col(rightEnd)) / w))))
    l.join(r, keys :+ "__bucket")
      .filter(col(leftTime) >= col(rightStart) &&
        col(leftTime) <= col(rightEnd))
      .drop("__bucket")
  }
}
