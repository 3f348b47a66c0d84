package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval (sweep-line) analytics over integral timestamps: how many
  * intervals are open at once — concurrent sessions, overlapping jobs,
  * peak connection counts. The textbook solution is one running sum over
  * all boundary events ordered by time, which is exactly the
  * single-partition global window this engine bans; here the sweep is
  * split into a per-bucket phase (partitioned window) plus a bounded
  * cross-bucket carry (HOF fold over the per-bucket aggregate), the same
  * decomposition [[Sampling.orderedRank]] uses for global ranks.
  */
object Intervals {

  /** Per-bucket concurrency profile of half-open intervals `[start, end)`:
    * for each `bucketWidth`-sized time bucket containing at least one
    * interval boundary, the maximum number of simultaneously open
    * intervals observed in that bucket, plus the number of intervals
    * starting in it.
    *
    * Sweep decomposition: boundary deltas (+1 at start, −1 at end) are
    * bucketed by `t DIV bucketWidth`; a bucket's carry-in (intervals open
    * as it begins) is the exclusive prefix sum of per-bucket net deltas —
    * a bounded aggregate folded driver-free with an indexed-slice HOF, at
    * most one row per bucket. Within a bucket a window PARTITIONED BY the
    * bucket orders boundaries by `(t, delta)` (ends sort before starts at
    * the same instant — half-open semantics) and adds the running sum to
    * the carry. No global-order shuffle ever happens: boundary volume
    * shuffles once on the bucket key.
    *
    * The per-bucket aggregate is collected into one array to fold the
    * carry, so choose `bucketWidth` such that span/width stays bounded
    * (hourly buckets over a decade ≈ 90k entries — fine; do not pass
    * millisecond widths over years). Buckets with no boundary events are
    * absent from the output; their concurrency is constant and equals the
    * carry of the next emitted bucket.
    *
    * `startCol`/`endCol` must be integral (e.g. epoch nanos). Outputs
    * `(bucket, max_concurrency, n_starts)` — all integers, reproducible
    * under any partitioning.
    */
  def concurrencyByBucket(df: DataFrame, startCol: Column, endCol: Column,
                          bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth=$bucketWidth must be >= 1")
    // One explode pass (not a union of two selects — that scans the input
    // twice), checkpointed because the boundary frame feeds two consumers
    // (the net-delta aggregate and the per-bucket sweep): without the cut,
    // a window-heavy upstream like sessionization is re-evaluated once per
    // consumer per union leg — 4× the dominant cost.
    val deltas = df.select(explode(array(
        struct(startCol.cast("long").as("t"), lit(1L).as("d")),
        struct(endCol.cast("long").as("t"), lit(-1L).as("d")))).as("b"))
      .select(col("b.t").as("t"), col("b.d").as("d"))
      // integer DIV, not `/`: double division loses 60-bit ns precision
      .withColumn("bucket", expr(s"t DIV CAST($bucketWidth AS BIGINT)"))
      .localCheckpoint(true)
    val nets = deltas.groupBy(col("bucket")).agg(sum(col("d")).as("net"))
    val carries = Prefix.exclusiveFold(nets, "bucket", "net",
      lit(0L), (a, b) => a + b)
    val w = Window.partitionBy(col("bucket")).orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("run", sum(col("d")).over(w))
      .join(broadcast(carries), Seq("bucket"))
      .groupBy(col("bucket"))
      .agg(max(col("run") + col("carry")).as("max_concurrency"),
        sum(when(col("d") === 1L, 1L).otherwise(0L)).as("n_starts"))
  }

  /** Coalesce overlapping-or-adjacent half-open intervals `[start, end)`
    * per key — the classic gaps-and-islands merge (session stitching,
    * on-call coverage, retention-window union). Adjacent means
    * `start == previous end`: `[1,3)` and `[3,5)` fuse into `[1,5)`.
    *
    * Shape: every window is PARTITIONED BY the key (one shuffle on the
    * key, arbitrary key cardinality — never a global order). A new island
    * opens where the interval's start exceeds the running max end of all
    * earlier intervals of the same key; the running max uses an exclusive
    * ROWS frame, and the decision is order-independent under `(start,
    * end)` ties because a tied row is always covered by its twin's end.
    *
    * `startCol`/`endCol` must be integral (e.g. epoch micros). Output:
    * `(key, start, end, n_merged)` — one row per merged island.
    */
  def mergeIntervals(df: DataFrame, keyCol: Column, startCol: Column,
                     endCol: Column): DataFrame = {
    val iv = df.select(keyCol.as("key"), startCol.cast("long").as("s"),
      endCol.cast("long").as("e"))
    val ord = Window.partitionBy(col("key")).orderBy(col("s"), col("e"))
    val prevMax = ord.rowsBetween(Window.unboundedPreceding, -1)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv
      .withColumn("brk",
        when(col("s") > coalesce(max(col("e")).over(prevMax),
          lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(run))
      .groupBy(col("key"), col("island"))
      .agg(min(col("s")).as("start"), max(col("e")).as("end"),
        count(lit(1)).as("n_merged"))
      .drop("island")
  }
}
