package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical data-quality operators built on integer-exact arithmetic:
  * the moments are integer sums over a fixed-point column, and every
  * comparison is rearranged to avoid division and square roots — so
  * results are order-independent, partition-independent and
  * hash-reproducible in external SQL (no float accumulation anywhere).
  */
object Stats {

  private val D38 = DecimalType(38, 0)

  /** Per-group z-score outlier detection WITHOUT floats: a value x is an
    * outlier iff |x − mean| &gt; k·stddev, which over fixed-point integers
    * rearranges to
    * {{{ (n·x − S)² > k² · (n·Q − S²) }}}
    * with S = Σx, Q = Σx² (multiply |x − S/n| &gt; k·σ through by n; both
    * sides are then integers). The squares are computed in
    * DECIMAL(38, 0), which keeps the comparison exact far past int64
    * (n·x at petabyte row counts).
    *
    * `valueCol` must already be fixed-point integral (e.g. cents:
    * `round(value · 100)` — the round is what makes the double→int
    * conversion engine-agnostic). Population (not sample) variance is
    * used, matching the n-multiplied inequality.
    *
    * Plan shape: one partial-agg shuffle for the moment frame (one row
    * per group), broadcast back onto the stream — the outlier test
    * itself is map-side; nothing resorts or recollects the data.
    *
    * Output: one row per group — n, n_outliers, and the min/max outlier
    * value (NULL when the group has none).
    */
  def zScoreOutliers(df: DataFrame, grpCol: Column, valueCol: Column,
                     k: Int = 2): DataFrame = {
    require(k >= 1 && k <= 16, s"k=$k out of [1, 16]")
    val v = valueCol.cast("long")
    val moments = df.groupBy(grpCol.as("g"))
      .agg(count(lit(1)).as("n"), sum(v).as("s"), sum(v * v).as("q"))
    val x = col("__v").cast(D38)
    val n = col("n").cast(D38)
    val s = col("s").cast(D38)
    val q = col("q").cast(D38)
    val isOut = (n * x - s) * (n * x - s) >
      lit(k.toLong * k) * (n * q - s * s)
    df.select(grpCol.as("g"), v.as("__v"))
      .join(broadcast(moments), Seq("g"))
      .select(col("g"), col("n"), col("__v"), isOut.as("is_out"))
      .groupBy(col("g"), col("n"))
      .agg(
        sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"),
        min(when(col("is_out"), col("__v"))).as("min_outlier"),
        max(when(col("is_out"), col("__v"))).as("max_outlier"))
      .select(col("g"), col("n"), col("n_outliers"),
        col("min_outlier"), col("max_outlier"))
  }
}
