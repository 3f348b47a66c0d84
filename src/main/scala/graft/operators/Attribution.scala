package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch attribution over an event log: every conversion event
  * distributes its credit across the same user's preceding touch events
  * inside a lookback window — the marketing-analytics workload that turns
  * a raw clickstream into per-channel credit totals.
  *
  * Credits are integer PPM with the division remainder assigned to the
  * MOST RECENT touch (a deterministic stand-in for the usual
  * "last-touch gets the benefit of rounding"): each conversion
  * distributes exactly 10⁶ ppm, so totals reconcile to
  * conversions × 10⁶ by construction, and integer sums make the report
  * bit-reproducible under any partitioning.
  *
  * Plan shape: one hash equi-join on user_id (the range predicate rides
  * as a join filter; per-user event volumes keep the pair count bounded),
  * then two windows partitioned by conversion id — a conversion's touch
  * set is lookback-bounded, so partitions stay small at any corpus size.
  * Each conversion credits independently: a touch preceding two
  * purchases earns credit twice, which is the standard position-based
  * semantics, not double counting.
  *
  * Input schema: (event_id, ts, user_id, event_type). Output:
  * (touch_type, n_credits, credit_ppm_total).
  */
object Attribution {

  def linearCredits(events: DataFrame, conversionType: String,
                    lookbackDays: Int): DataFrame = {
    require(lookbackDays >= 1, s"lookbackDays=$lookbackDays must be >= 1")
    val p = events.filter(col("event_type") === conversionType)
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("ts").as("conv_ts"))
    val t = events.filter(col("event_type") =!= conversionType)
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("ts").as("touch_ts"), col("event_type").as("touch_type"))
    val joined = t.join(p, Seq("user_id"))
      .filter(col("touch_ts") < col("conv_ts") &&
        col("touch_ts") >= col("conv_ts") - expr(s"INTERVAL $lookbackDays DAYS"))
    val wAll = Window.partitionBy(col("conv_id"))
    val wOrd = Window.partitionBy(col("conv_id"))
      .orderBy(col("touch_ts").desc, col("touch_id").desc)
    joined
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("credit_ppm", expr("1000000L DIV n") +
        when(col("rn") === 1, expr("1000000L % n")).otherwise(lit(0L)))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_credits"),
        sum(col("credit_ppm")).as("credit_ppm_total"))
  }
}
