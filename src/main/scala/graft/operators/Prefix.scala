package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exclusive prefix folds over BOUNDED per-bucket aggregates — the
  * engine's replacement for a global-order window (which single-
  * partitions the whole dataset, the plan shape QuerySweepSpec bans).
  * Callers first reduce arbitrary-cardinality data to one row per
  * bucket (buckets must be bounded: time buckets, range buckets of a
  * key); the fold then runs inside ONE array of that bounded size.
  */
object Prefix {

  /** For each bucket, fold `merge` over the `valCol` of all STRICTLY
    * EARLIER buckets (ordered by `keyCol`), starting from `zero` — an
    * exclusive scan. `perBucket` must hold one row per bucket; the
    * result `(keyCol, carry)` has the same row count and is meant to be
    * broadcast back onto the full data. Sum with `zero = lit(0L)` gives
    * carry-in counts ([[Intervals.concurrencyByBucket]]); `least` with
    * `zero = lit(Long.MaxValue)` gives prefix minima
    * ([[Skyline.paretoFrontier2D]]).
    */
  def exclusiveFold(perBucket: DataFrame, keyCol: String, valCol: String,
                    zero: Column, merge: (Column, Column) => Column): DataFrame =
    perBucket
      .agg(array_sort(collect_list(struct(col(keyCol).as("k"),
        col(valCol).as("v")))).as("kv"))
      .select(explode(transform(col("kv"), (x, i) => struct(
        x.getField("k").as("k"),
        aggregate(slice(col("kv"), lit(1), i), zero,
          (a, y) => merge(a, y.getField("v"))).as("carry")))).as("e"))
      .select(col("e.k").as(keyCol), col("e.carry"))
}
