package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto-frontier) queries: rows not dominated in any
  * dimension — the shape of "best price for at least this quality"
  * curation cuts. Dominance here is the standard one: r' dominates r
  * iff r' ≤ r in both dimensions and strictly smaller in at least one;
  * duplicate points do not dominate each other.
  */
object Skyline {

  /** 2-D Pareto frontier, both dimensions MINIMIZED (negate a column to
    * maximize it). Both columns must be integral.
    *
    * A point (x, y) is on the frontier iff y is the minimum at its x
    * AND y < min{y' : x' < x}. That prefix minimum over x-order is
    * computed without any global-order window: x is range-bucketed by
    * `bucketWidth`, per-bucket minima (bounded, one row per bucket)
    * fold into cross-bucket carries ([[Prefix.exclusiveFold]] with
    * `least`), and a window PARTITIONED BY bucket supplies the
    * within-bucket exclusive running minimum. Data shuffles once on
    * (x, y), once on x, once on the bucket — never into one partition.
    *
    * Choose `bucketWidth` so the x-range spans a bounded bucket count
    * (the carry fold collects one array entry per non-empty bucket).
    * `xCol` must be NON-NEGATIVE: integer `DIV` truncates toward zero,
    * so negative x would bucket out of order — when maximizing x by
    * negation, shift the domain up first (`lit(MAX) - x`).
    *
    * Output: `(x, y, n_rows)` frontier points, `n_rows` counting
    * duplicate input rows at that exact point.
    */
  def paretoFrontier2D(df: DataFrame, xCol: Column, yCol: Column,
                       bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth=$bucketWidth must be >= 1")
    val points = df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_rows"))
    // the only frontier candidate at each x is its minimal y
    val perX = points
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("x")).orderBy(col("y"))))
      .filter(col("rk") === 1)
      .select(col("x"), col("y").as("my"), col("n_rows"),
        expr(s"x DIV CAST($bucketWidth AS BIGINT)").as("bucket"))
    val perBucket = perX.groupBy(col("bucket")).agg(min(col("my")).as("bmin"))
    val carries = Prefix.exclusiveFold(perBucket, "bucket", "bmin",
      lit(Long.MaxValue), (a, b) => least(a, b))
    val wExcl = Window.partitionBy(col("bucket")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perX
      .join(broadcast(carries), Seq("bucket"))
      .withColumn("prev_min",
        least(col("carry"), coalesce(min(col("my")).over(wExcl),
          lit(Long.MaxValue))))
      .filter(col("my") < col("prev_min"))
      .select(col("x"), col("my").as("y"), col("n_rows"))
  }
}
