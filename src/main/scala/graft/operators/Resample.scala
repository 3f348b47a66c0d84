package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: align irregular observations to a fixed grid
  * and gap-fill with last-observation-carried-forward (LOCF) — the
  * "resample + ffill" operation of dataframe libraries, rebuilt as three
  * declarative steps with one shuffle on the series key:
  *
  *  1. per-key bounds → grid spine via `sequence()` explode (each key's
  *     spine generates inside its own task — no global range table);
  *  2. observations bucketed to the grid, the in-bucket representative
  *     picked by (max ts, then max value) — two integer/exact maxes, so
  *     the pick is deterministic under any partitioning (a bare
  *     `last(value)` would depend on encounter order);
  *  3. LOCF via `last(value, ignoreNulls = true)` over the key-partitioned
  *     grid order — a within-partition sliding window, never global.
  *
  * All grid arithmetic is exact integer nanoseconds. Spine size is
  * span/step rows per key; pick `step` so the densest key's span stays
  * task-sized (the spine explode, like the observations themselves, is
  * partitioned by key).
  */
object Resample {

  /** Gap-fill a (key, tsNs, value) series onto a `stepNs` grid.
    * Returns (key, grid_ts, value, is_observed) — `value` is LOCF-filled,
    * NULL only before a key's first observation (by construction the
    * spine starts at the first observation's bucket, so never here).
    */
  def gapFillLocf(df: DataFrame, keyCol: Column, tsNsCol: Column,
                  valueCol: Column, stepNs: Long): DataFrame = {
    require(stepNs >= 1L, s"stepNs=$stepNs must be >= 1")
    val base = df.select(keyCol.as("k"), tsNsCol.as("t"), valueCol.as("v"))
      .withColumn("g", (col("t") - pmod(col("t"), lit(stepNs))).cast("long"))
    val spine = base.groupBy(col("k"))
      .agg(min(col("g")).as("g0"), max(col("g")).as("g1"))
      .select(col("k"),
        explode(sequence(col("g0"), col("g1"), lit(stepNs))).as("g"))
    // deterministic in-bucket representative: latest ts wins, value ties
    // broken by max — two exact aggregates instead of an order-dependent
    // last()
    val atMaxTs = base.groupBy(col("k"), col("g")).agg(max(col("t")).as("mt"))
    val obs = base
      .join(atMaxTs, Seq("k", "g"))
      .filter(col("t") === col("mt"))
      .groupBy(col("k"), col("g")).agg(max(col("v")).as("obs_v"))
    val w = Window.partitionBy(col("k")).orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(obs, Seq("k", "g"), "left")
      .withColumn("value", last(col("obs_v"), ignoreNulls = true).over(w))
      .withColumn("is_observed", col("obs_v").isNotNull.cast("int"))
      .select(col("k"), col("g").as("grid_ts"), col("value"), col("is_observed"))
  }

  /** Per-key exponential moving average, deterministic under any
    * partitioning: the series is collected, sorted by `orderCol` and
    * folded LEFT-TO-RIGHT with `ewma := (1−α)·ewma + α·x` (seeded with
    * the first observation) — the a3_fold/assemblePacks trick applied to
    * a float recurrence. Because the fold order is fixed, the double
    * arithmetic is bit-reproducible across engines; pass an EXACT BINARY
    * `alpha` (0.25, 0.5, 0.125…) so the two multipliers are themselves
    * exact.
    *
    * Group state is one series per key — bounded when keys are entities
    * with bounded history (users, sensors, days); for unbounded series
    * chunk by (key, period) first, then chain the per-period EWMAs: the
    * recurrence telescopes, so period k's output seeds period k+1.
    *
    * Output: (key, n_obs, ewma).
    */
  def ewma(df: DataFrame, keyCol: Column, orderCol: Column,
           valueCol: Column, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha=$alpha out of (0, 1]")
    // the literals must survive Scala->SQL->Catalyst round-tripping
    // exactly: render with full precision, require dyadic input
    require(alpha * 1048576 == math.rint(alpha * 1048576),
      s"alpha=$alpha is not an exact binary fraction (k/2^20) — " +
        "cross-engine bit parity needs dyadic multipliers")
    val a = alpha.toString
    val om = (1.0 - alpha).toString // exact: both operands dyadic
    df.select(keyCol.as("key"),
        struct(orderCol.as("o"), valueCol.cast("double").as("v")).as("e"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_obs"),
        array_sort(collect_list(col("e"))).as("arr"))
      .select(col("key"), col("n_obs"),
        expr(s"""aggregate(arr,
          named_struct('started', false, 'acc', CAST(0.0 AS DOUBLE)),
          (s, x) -> named_struct('started', true,
            'acc', IF(s.started,
              CAST($om AS DOUBLE) * s.acc + CAST($a AS DOUBLE) * x.v,
              x.v))).acc""").as("ewma"))
  }
}
