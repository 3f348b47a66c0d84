package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Robust (median / MAD) outlier detection, integer-exact and with NO
    * global sort: x is an outlier iff den·|x − med| &gt; num·MAD, where
    * med is the LOWER median (the value at rank (n+1) DIV 2 in
    * (value, tie) order — a single well-defined element, no averaging,
    * so the test stays in integers) and MAD is the lower median of
    * |x − med|. Median/MAD resist the heavy tails that wreck the
    * z-score test ([[zScoreOutliers]]): one 10⁹-cent row moves a mean
    * and variance arbitrarily, it moves a median by at most one rank.
    *
    * Both medians come from [[Sampling.orderedRank]] — range-bucketed
    * ranks with HOF-folded offsets — so the plan is two bounded rank
    * passes plus broadcast joins of 1-row frames; nothing single-sorts
    * the data. Bucket widths adapt to the observed value range.
    *
    * Output: one row per outlier — (uid, x, med, abs_dev, mad).
    */
  def madOutliers(df: DataFrame, valueCol: Column, tieCol: Column,
                  num: Long = 3L, den: Long = 1L): DataFrame = {
    require(num >= 1 && den >= 1, s"cut $num/$den must be positive")
    val t = df.select(valueCol.cast("long").as("x"), tieCol.as("uid"))
      .localCheckpoint(true)
    val dev = t.crossJoin(broadcast(lowerMedian(t, "x").toDF("med")))
      .withColumn("abs_dev", abs(col("x") - col("med")))
      .localCheckpoint(true)
    val mad = lowerMedian(dev.select(col("abs_dev").as("x"), col("uid")),
      "x").toDF("mad")
    dev.crossJoin(broadcast(mad))
      .filter(lit(den) * col("abs_dev") > lit(num) * col("mad"))
      .select(col("uid"), col("x"), col("med"), col("abs_dev"), col("mad"))
  }

  /** Per-group lower median: the value at rank (n_g + 1) DIV 2 of
    * (value, tie) order within each group — a real element of the group,
    * no averaging, so downstream comparisons stay in integers. Ranks come
    * from [[Sampling.orderedRank]] with the group as the stratum: the
    * data shuffles once on (group, range-bucket) and offsets fold over a
    * bounded per-group aggregate — no global sort, and no per-group
    * single-partition window over high-cardinality groups.
    *
    * The per-group count frame (one row per group) is broadcast back
    * onto the ranked stream; suited to grouping keys whose cardinality
    * fits a broadcast (profiling dimensions, not user ids).
    *
    * Output: (g, med, n) — one row per group.
    */
  def groupedLowerMedian(df: DataFrame, groupCol: Column, valueCol: Column,
                         tieCol: Column): DataFrame = {
    // three consumers of the projection (orderedRank's min/max probe, the
    // ranked stream, the per-group counts) — checkpoint once so the
    // caller's upstream lineage (often a join/agg, e.g. pipeline_datacard's
    // tokenize+size projection) is not re-executed per consumer (the
    // probe-re-execution trap measured at 2.2x in vocabCoverage)
    val t = df.select(groupCol.as("g"), valueCol.cast("long").as("x"),
      tieCol.as("uid")).localCheckpoint(true)
    val ranked = Sampling.orderedRank(t, col("g"), col("x"), col("uid"),
      nBuckets = 1024, out = "__rk")
    val counts = t.groupBy(col("g")).agg(count(lit(1)).as("__n"))
    ranked.join(broadcast(counts), Seq("g"))
      .filter(col("__rk") === expr("(__n + 1) DIV 2"))
      .select(col("g"), col("x").as("med"), col("__n").as("n"))
  }

  /** Categorical diversity profile, one row per profiled column: row
    * count, distinct count, modal frequency, and Gini impurity
    * 1 − Σ(c/n)² as exact parts-per-million — computed as
    * (n² − Σc²)·10⁶ DIV n² with the squares in DECIMAL(38, 0), so the
    * score is identical in any engine at any row count (a double Σ(c/n)²
    * is neither). High gini = well-spread column; 0 = constant.
    *
    * One partial-agg pass per profiled column over a 1-column
    * projection — no shuffle carries more than the column's distinct
    * values.
    */
  def categoricalDiversity(df: DataFrame,
                           cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    cols.map { case (label, c) =>
      df.select(c.cast("string").as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"),
          max(col("c")).as("top_count"),
          sum(col("c").cast(D38) * col("c").cast(D38)).as("sum_c2"))
        .select(lit(label).as("col_name"),
          col("n").cast("long").as("n_rows"), col("n_distinct"),
          col("top_count"),
          expr("CAST(((CAST(n AS DECIMAL(38,0)) * n - sum_c2) * 1000000)" +
            " DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)").as("gini_ppm"))
    }.reduce(_ unionByName _)
  }

  /** Two-sample Kolmogorov–Smirnov statistic over an integral value
    * column: D = max_v |F_a(v) − F_b(v)| between the `a` and `b` groups
    * of `splitCol`, the classic distribution-drift test (did this batch's
    * document lengths / prices / token counts shift vs the reference
    * corpus?). Like [[graft.operators.TextAnalysis.tvDistance]], the
    * statistic is computed as an exact INTEGER numerator
    * `max |cum_a·N_b − cum_b·N_a|` plus one final double division by
    * `N_a·N_b` — no float accumulation, so the row is bit-reproducible
    * in external SQL.
    *
    * The cumulative counts need a global value order, which is exactly
    * the single-partition window this engine bans; the sweep is split the
    * [[Intervals.concurrencyByBucket]] way: per-value counts (one hash
    * shuffle, ≤ one row per distinct value) are range-bucketed by
    * `value >> bucketShift` (shift, not division — monotone and exact on
    * longs), each bucket's carry-in is a bounded [[Prefix.exclusiveFold]]
    * over per-bucket subtotals, and a window PARTITIONED BY bucket adds
    * the within-bucket running sum. `valueCol` must be a non-negative
    * integral; choose `bucketShift` so (max value &gt;&gt; shift) stays
    * bounded (the fold state is one array entry per non-empty bucket).
    *
    * Output: one row — n_a_total, n_b_total, ks_num (integer), ks.
    */
  def ksDrift(df: DataFrame, valueCol: Column, splitCol: Column,
              a: String, b: String, bucketShift: Int = 8): DataFrame = {
    require(bucketShift >= 0 && bucketShift <= 62,
      s"bucketShift=$bucketShift out of [0, 62]")
    val perValue = df
      .select(valueCol.cast("long").as("v"), splitCol.as("__s"))
      .filter(col("__s").isin(a, b))
      .groupBy(col("v"))
      .agg(sum(when(col("__s") === a, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__s") === b, 1L).otherwise(0L)).as("n_b"))
      .withColumn("bucket", shiftright(col("v"), bucketShift))
      .localCheckpoint(true)
    val nets = perValue.groupBy(col("bucket"))
      .agg(sum(col("n_a")).as("ba"), sum(col("n_b")).as("bb"))
    val carryA = Prefix.exclusiveFold(nets, "bucket", "ba",
      lit(0L), (x, y) => x + y).withColumnRenamed("carry", "ca")
    val carryB = Prefix.exclusiveFold(nets, "bucket", "bb",
      lit(0L), (x, y) => x + y).withColumnRenamed("carry", "cb")
    val w = Window.partitionBy(col("bucket")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cums = perValue
      .withColumn("ra", sum(col("n_a")).over(w))
      .withColumn("rb", sum(col("n_b")).over(w))
      .join(broadcast(carryA), Seq("bucket"))
      .join(broadcast(carryB), Seq("bucket"))
      .select((col("ca") + col("ra")).as("cum_a"),
        (col("cb") + col("rb")).as("cum_b"))
    val totals = perValue.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
    cums.crossJoin(broadcast(totals))
      .agg(max(col("ta")).as("n_a_total"), max(col("tb")).as("n_b_total"),
        max(abs(col("cum_a") * col("tb") - col("cum_b") * col("ta"))).as("ks_num"))
      .select(col("n_a_total"), col("n_b_total"), col("ks_num"),
        (col("ks_num").cast("double") /
          (col("n_a_total") * col("n_b_total")).cast("double")).as("ks"))
  }

  /** CUSUM mean-shift changepoint scan over a BOUNDED ordered series
    * (daily counts, hourly volumes): the classic control-chart statistic
    * C_k = Σ_{i≤k} (x_i − mean), whose |maximum| marks the most likely
    * level-shift point. Computed entirely in integers — the mean never
    * materializes as a float: with T = Σx and N = #buckets, the scaled
    * statistic C_k·N = Σ_{i≤k} (x_i·N − T) is an exact integer, identical
    * on any engine and under any partitioning, and sign/argmax match the
    * textbook float statistic exactly.
    *
    * `perBucket` must hold ONE row per series point (callers aggregate
    * first; bucket count must stay bounded — it is folded into one
    * array). The prefix sum is a [[Prefix.exclusiveFold]] plus the row's
    * own delta, not a global-order window. Output per bucket:
    * `(keyCol, valCol, cusum_scaled, is_cp)` with `is_cp` true on the
    * |cusum| argmax (ties: every tied bucket flagged).
    */
  def cusumChangepoint(perBucket: DataFrame, keyCol: String,
                       valCol: String): DataFrame = {
    val totals = perBucket.agg(sum(col(valCol)).as("__t"),
      count(lit(1)).as("__n"))
    val deltas = perBucket.crossJoin(broadcast(totals))
      .select(col(keyCol), col(valCol),
        (col(valCol) * col("__n") - col("__t")).as("__d"))
      .localCheckpoint(true)
    val carries = Prefix.exclusiveFold(
      deltas.select(col(keyCol), col("__d")), keyCol, "__d",
      lit(0L), (a, b) => a + b)
    val cum = deltas.join(broadcast(carries), Seq(keyCol))
      .select(col(keyCol), col(valCol),
        (col("carry") + col("__d")).as("cusum_scaled"))
    val peak = cum.agg(max(abs(col("cusum_scaled"))).as("__m"))
    cum.crossJoin(broadcast(peak))
      .select(col(keyCol), col(valCol), col("cusum_scaled"),
        (abs(col("cusum_scaled")) === col("__m")).as("is_cp"))
  }

  /** Per-group ordinary-least-squares trend slope over an integer series
    * — "is this segment's volume rising or falling, and how fast" — as
    * ONE hash aggregation: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²),
    * every term an exact integer moment, emitted as a ppm-scaled
    * integer. x is rebased to the GLOBAL minimum first (broadcast 1-row
    * aggregate) so the squared moments stay small; the sign is factored
    * out before the integer division because Spark's DIV truncates
    * toward zero while floor-division engines floor — |num| DIV den is
    * the cross-engine-stable form. DECIMAL(38,0) carries the products.
    *
    * Output: `(group, n_points, slope_num, slope_den, slope_ppm)`;
    * `slope_ppm` is NULL for degenerate groups (all x equal).
    */
  def trendSlopes(perPoint: DataFrame, groupCol: Column, xCol: Column,
                  yCol: Column): DataFrame = {
    val pts = perPoint.select(groupCol.as("group"), xCol.cast("long").as("x"),
      yCol.cast("long").as("y"))
    val base = pts.agg(min(col("x")).as("__x0"))
    pts.crossJoin(broadcast(base))
      .select(col("group"), (col("x") - col("__x0")).as("x"), col("y"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_points"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
      .select(col("group"), col("n_points"),
        expr("CAST(n_points * sxy - sx * sy AS DECIMAL(38,0))").as("num"),
        expr("CAST(n_points * sxx - sx * sx AS DECIMAL(38,0))").as("den"))
      .select(col("group"), col("n_points"),
        expr("CAST(num AS BIGINT)").as("slope_num"),
        expr("CAST(den AS BIGINT)").as("slope_den"),
        expr("""CASE WHEN den = 0 THEN NULL ELSE
               |  CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END *
               |    ((CAST(1000000 AS DECIMAL(38,0)) * abs(num)) DIV den)
               |    AS BIGINT) END""".stripMargin).as("slope_ppm"))
  }

  /** Integer-exact sample autocorrelation of a BOUNDED series at lags
    * 1..`maxLag`: with N = #points, T = Σx, and centered integer deltas
    * d_i = x_i·N − T, the lag-k statistic is num_k/den = Σ d_i·d_{i+k} /
    * Σ d_i² (both exact integers; the N² factors cancel). Lag pairing is
    * an equi-join of the series against itself shifted by k — never a
    * global-order window — so gaps in the key simply contribute no pair.
    * Sign is factored out of the ppm division (truncate-vs-floor
    * divergence on negatives across engines).
    *
    * Output: `(lag, n_pairs, num, den, acf_ppm)` — one row per lag.
    */
  def autocorrelation(perBucket: DataFrame, keyCol: String, valCol: String,
                      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag=$maxLag must be >= 1")
    val totals = perBucket.agg(sum(col(valCol)).as("__t"),
      count(lit(1)).as("__n"))
    val d = perBucket.crossJoin(broadcast(totals))
      .select(col(keyCol).as("k"),
        (col(valCol) * col("__n") - col("__t")).as("d"))
      .localCheckpoint(true)
    val den = d.agg(sum(expr("CAST(d AS DECIMAL(38,0)) * d")).as("den"))
    val lagged = d.select(col("k"), col("d"),
        explode(array((1 to maxLag).map(l => lit(l.toLong)): _*)).as("lag"))
      .join(d.select(col("k").as("k2"), col("d").as("d2")),
        col("k2") === col("k") + col("lag"))
    lagged.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("CAST(d AS DECIMAL(38,0)) * d2")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        expr("CAST(num AS BIGINT)").as("num"),
        expr("CAST(den AS BIGINT)").as("den"),
        expr("""CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END *
               |  ((CAST(1000000 AS DECIMAL(38,0)) * abs(num)) DIV den)
               |  AS BIGINT)""".stripMargin).as("acf_ppm"))
  }

  /** Top principal direction of an embedding column by power iteration —
    * PCA's first component, computed ENTIRELY in fixed-point integers so
    * the result is bit-identical across engines and partitionings:
    *
    *  - elements are floored to `x·scale` longs (a float times 10⁶ is
    *    exact in a double — 24 + 20 bits < 53 — and floor is the same
    *    everywhere, unlike round's tie modes);
    *  - the centered covariance is the integer matrix M_ij = n·Σxᵢxⱼ −
    *    Σxᵢ·Σxⱼ (n² times the real covariance — scale factors do not
    *    change eigenvectors), accumulated in DECIMAL(38,0): one narrow
    *    per-row generator emits all dims² products (no self-join), one
    *    hash aggregation reduces them — corpus size only ever multiplies
    *    the map side;
    *  - each of the `rounds` iterations is v ← M·v re-normalized by
    *    max|·| to ±scale: a broadcast join of the dims²-row matrix with
    *    the dims-row vector, then an integer DIV with the sign factored
    *    out (truncate-vs-floor portability). Bounded per-round frames,
    *    checkpointed to keep the plan flat.
    *
    * Output: `(pos, component_scaled)` — the dominant eigenvector,
    * max-normalized to ±scale, `dims` rows. Deterministic for a given
    * corpus (start vector = all ones); the global sign follows the
    * iteration, not a convention.
    */
  def topPrincipalDirection(df: DataFrame, vecCol: Column, dims: Int,
                            rounds: Int = 8,
                            scale: Long = 1000000L): DataFrame = {
    require(dims >= 2, s"dims=$dims must be >= 2")
    require(rounds >= 1 && rounds <= 64, s"rounds=$rounds out of [1, 64]")
    val v0 = df.select(vecCol.as("__v")).localCheckpoint(true)
    val singles = v0.select(posexplode(expr(
        s"transform(slice(__v, 1, $dims), x -> " +
        s"CAST(floor(CAST(x AS DOUBLE) * $scale) AS BIGINT))"))
      .as(Seq("i", "x")))
    val sx = singles.groupBy(col("i"))
      .agg(sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"))
    val n1 = v0.agg(count(lit(1)).as("n"))
    val pairProducts = v0.select(explode(expr(
        s"""flatten(transform(sequence(0, ${dims - 1}), i ->
           |  transform(sequence(0, ${dims - 1}), j -> struct(
           |    i AS i, j AS j,
           |    CAST(floor(CAST(element_at(__v, i + 1) AS DOUBLE) * $scale)
           |      AS BIGINT) *
           |    CAST(floor(CAST(element_at(__v, j + 1) AS DOUBLE) * $scale)
           |      AS BIGINT) AS xy))))""".stripMargin)).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"), col("p.xy"))
    val m = pairProducts.groupBy(col("i"), col("j"))
      .agg(sum(expr("CAST(xy AS DECIMAL(38,0))")).as("sxy"))
      .crossJoin(broadcast(n1))
      .join(broadcast(sx), Seq("i"))
      .join(broadcast(sx.select(col("i").as("j"), col("sx").as("sxj"))),
        Seq("j"))
      .select(col("i"), col("j"),
        expr("CAST(n * sxy - sx * sxj AS DECIMAL(38,0))").as("mij"))
      .localCheckpoint(true)
    var v = df.sparkSession.range(dims)
      .select(col("id").as("i"), lit(scale).as("v"))
    for (_ <- 1 to rounds) {
      val w = m.join(broadcast(v.select(col("i").as("j"), col("v").as("vj"))),
          Seq("j"))
        .groupBy(col("i"))
        .agg(sum(expr("mij * vj")).as("w"))
      val mx = w.agg(max(abs(col("w"))).as("mx"))
      v = w.crossJoin(broadcast(mx))
        .select(col("i"),
          expr(s"""CAST(CASE WHEN w < 0 THEN -1 ELSE 1 END *
                  |  ((abs(w) * ${scale}L) DIV mx) AS BIGINT)""".stripMargin)
            .as("v"))
        .localCheckpoint(true)
    }
    v.select(col("i").cast("long").as("pos"), col("v").as("component_scaled"))
  }

  /** The value at rank (n+1) DIV 2 of (xCol, uid) order — a 1-row,
    * 1-column frame. Rank via orderedRank, never a global-order window.
    */
  private def lowerMedian(t: DataFrame, xCol: String): DataFrame = {
    val ranked = Sampling.orderedRank(t, lit(0L), col(xCol), col("uid"),
      nBuckets = 1024, out = "__rk")
    // (n+1) DIV 2, integer division — `/` on longs is DOUBLE division in
    // Spark and loses exactness past 2^53
    ranked.crossJoin(broadcast(t.agg(count(lit(1)).as("__n"))))
      .filter(col("__rk") === expr("(__n + 1) DIV 2"))
      .select(col(xCol))
  }

  /** Leave-one-out target encoding with additive smoothing — the standard
    * categorical feature for gradient-boosted / linear models, computed in
    * EXACT RATIONAL ppm so any engine reproduces it bit-for-bit:
    *
    *   enc_i = (S_c − y_i + m·S/N) / (n_c − 1 + m)
    *
    * (S_c, n_c = per-category label sum/count excluding nothing yet; y_i
    * the row's own 0/1 label — subtracted so the feature never leaks the
    * row's own target; prior = global rate S/N; smoothing weight m).
    * Clearing denominators by N gives the integer form
    * `10⁶·(N·(S_c − y_i) + m·S) DIV (N·(n_c − 1 + m))` — exact for any
    * corpus ≤ ~10¹² rows in DECIMAL(38,0).
    *
    * Plan shape: one hash aggregation over the (low-cardinality) category
    * key, a 1-row global aggregate, and a broadcast join back onto the
    * fact rows — the map side never shuffles the corpus, so the operator
    * is a single small-agg pass at 100 TB.
    *
    * Output: input key/category/label plus `enc_ppm`.
    */
  def targetEncode(df: DataFrame, keyCol: Column, catCol: Column,
                   labelCol: Column, smoothing: Long = 10L): DataFrame = {
    require(smoothing >= 1, s"smoothing=$smoothing must be >= 1")
    val rows = df.select(keyCol.as("key"), catCol.as("category"),
      labelCol.cast("long").as("y"))
    val perCat = rows.groupBy(col("category"))
      .agg(sum(col("y")).as("s_c"), count(lit(1)).as("n_c"))
    val global = rows.agg(sum(col("y")).as("s"), count(lit(1)).as("n"))
    rows
      .join(broadcast(perCat), Seq("category"))
      .crossJoin(broadcast(global))
      .select(col("key"), col("category"), col("y"),
        expr(s"""CAST((CAST(1000000 AS DECIMAL(38,0)) *
                |  (n * (s_c - y) + $smoothing * s)) DIV
                |  (n * (n_c - 1 + $smoothing)) AS BIGINT)""".stripMargin)
          .as("enc_ppm"))
  }

  /** Exact ROC-AUC by the Mann-Whitney rank-sum identity, in integer
    * arithmetic end-to-end: with midranks r̄_i over the pooled scores
    * (ties share (min+max)/2), AUC = (Σ_pos r̄ − n_p(n_p+1)/2) / (n_p·n_n).
    * Doubling clears the halves:
    *
    *   auc_ppm = 10⁶·(Σ_pos 2·r̄ − n_p(n_p+1)) DIV (2·n_p·n_n)
    *
    * and 2·r̄ per tie-group is min_rank + max_rank — exact longs.
    *
    * Ranks come from [[Sampling.orderedRank]] (bucketed prefix-sum, never
    * a global-order window): scores are floored to micros, ranked, then
    * ONE hash aggregation per distinct score takes (min, max, Σy) and a
    * 1-row aggregate closes the identity. Tie groups occupy contiguous
    * rank ranges whatever the tie-break order, so the midrank sum is
    * tie-break-independent. DECIMAL(38,0) carries the rank products
    * (N² — overflows int64 past ~3·10⁹ rows). The rank's bucket width
    * adapts to the observed micros range — probability scores spread
    * over the full bucket count, not one degenerate sort partition.
    *
    * Output: 1 row `(n_pos, n_neg, auc_ppm)`; NULL auc when either class
    * is empty.
    */
  def rocAuc(df: DataFrame, scoreCol: Column, labelCol: Column,
             tieCol: Column): DataFrame = {
    val rows = df.select(
      floor(scoreCol.cast("double") * 1000000.0).cast("long").as("s"),
      labelCol.cast("long").as("y"), tieCol.as("uid"))
    val ranked = Sampling.orderedRank(rows, lit(0L), col("s"), col("uid"),
      nBuckets = 1024, out = "__rk")
    val perScore = ranked.groupBy(col("s"))
      .agg(min(col("__rk")).as("mn"), max(col("__rk")).as("mx"),
        sum(col("y")).as("pos"))
    perScore.agg(
        sum(expr("CAST(pos AS DECIMAL(38,0)) * (mn + mx)")).as("r2"),
        sum(col("pos")).as("n_pos"),
        sum(expr("mx - mn + 1 - pos")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        expr("""CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
               |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) *
               |  (r2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1))) DIV
               |  (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)
               |END""".stripMargin).as("auc_ppm"))
  }

  /** Per-group ROC-AUC — [[rocAuc]] with the group as the rank STRATUM,
    * so every segment's Mann-Whitney statistic computes in one pass
    * (per-segment model evaluation: "does the score work for every
    * event type / market / language?"). Same integer midrank identity;
    * groups are the parallelism of both the bucketed rank and the
    * closing aggregates.
    *
    * Output: one row per group `(group, n_pos, n_neg, auc_ppm)`, NULL
    * auc for single-class groups.
    */
  def groupedRocAuc(df: DataFrame, groupCol: Column, scoreCol: Column,
                    labelCol: Column, tieCol: Column): DataFrame = {
    val rows = df.select(groupCol.as("group"),
      floor(scoreCol.cast("double") * 1000000.0).cast("long").as("s"),
      labelCol.cast("long").as("y"), tieCol.as("uid"))
    val ranked = Sampling.orderedRank(rows, col("group"), col("s"),
      col("uid"), nBuckets = 1024, out = "__rk")
    val perScore = ranked.groupBy(col("group"), col("s"))
      .agg(min(col("__rk")).as("mn"), max(col("__rk")).as("mx"),
        sum(col("y")).as("pos"))
    perScore.groupBy(col("group"))
      .agg(sum(expr("CAST(pos AS DECIMAL(38,0)) * (mn + mx)")).as("r2"),
        sum(col("pos")).as("n_pos"),
        sum(expr("mx - mn + 1 - pos")).as("n_neg"))
      .select(col("group"), col("n_pos"), col("n_neg"),
        expr("""CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
               |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) *
               |  (r2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1))) DIV
               |  (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)
               |END""".stripMargin).as("auc_ppm"))
  }

  /** Reliability (calibration) table for a probabilistic classifier:
    * scores arrive as micros in [0, 10⁶], bucketed into `bins` equi-width
    * bins; per bin the table reports count, positives, mean confidence
    * and accuracy in exact ppm, and the absolute calibration gap. The
    * Expected Calibration Error is `Σ n_b·gap_b / N` — left to the reader
    * in integers (`n`·`gap_ppm` sums exactly).
    *
    * One conditional hash aggregation on the (≤ bins)-row key; every
    * division is a floored integer DIV on already-aggregated values.
    *
    * Output: `(bin, n, n_pos, conf_ppm, acc_ppm, gap_ppm)`.
    */
  def calibrationReport(df: DataFrame, probMicrosCol: Column,
                        labelCol: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins=$bins must be >= 2")
    df.select(probMicrosCol.cast("long").as("p"),
        labelCol.cast("long").as("y"))
      .withColumn("bin",
        least(lit(bins - 1L), expr(s"p * $bins DIV 1000000")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("p")).as("psum"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("psum DIV n").as("conf_ppm"),
        expr("1000000 * n_pos DIV n").as("acc_ppm"),
        expr("abs(psum DIV n - 1000000 * n_pos DIV n)").as("gap_ppm"))
  }

  /** Winsorized (clipped) robust statistics per group: values are clamped
    * to the group's exact [loPct, hiPct] percentile values (rank
    * ceil(pct·n_g/100) of the (value, tie) order — the q_group_quantiles
    * rank convention) and the table reports the clip bounds, how many
    * rows each side clipped, and the clipped integer sum — the robust
    * alternative to mean/stddev fences when heavy tails would drag a
    * plain average.
    *
    * Ranks via [[Sampling.orderedRank]] with the group as stratum (no
    * global window; a hot group spreads over nBuckets sort partitions);
    * the two boundary rows per group broadcast back onto the data for a
    * row-local clamp, then one hash aggregation per group.
    *
    * Output: `(group, n, lo_val, hi_val, n_clipped_lo, n_clipped_hi,
    * winsorized_sum)`. The rank's bucket width adapts to the observed
    * value range (no key-space contract).
    */
  def winsorizedStats(df: DataFrame, groupCol: Column, valueCol: Column,
                      tieCol: Column, loPct: Int = 5,
                      hiPct: Int = 95): DataFrame = {
    require(0 <= loPct && loPct < hiPct && hiPct <= 100,
      s"invalid percentile bounds [$loPct, $hiPct]")
    val rows = df.select(groupCol.as("group"),
      valueCol.cast("long").as("v"), tieCol.as("uid"))
    val ranked = Sampling.orderedRank(rows, col("group"), col("v"),
      col("uid"), nBuckets = 1024, out = "__rk")
    val sizes = ranked.groupBy(col("group")).agg(count(lit(1)).as("n"))
    // ceil(pct·n/100) as (pct·n + 99) DIV 100 — positive operands, where
    // truncating DIV (Spark) and flooring // (DuckDB) agree; the negated
    // floor-division ceiling trick would NOT survive Spark's
    // truncate-toward-zero DIV
    val bounds = ranked.join(broadcast(sizes), Seq("group"))
      .filter(col("__rk") ===
          greatest(lit(1L), expr(s"($loPct * n + 99) DIV 100")) ||
        col("__rk") === expr(s"($hiPct * n + 99) DIV 100"))
      .groupBy(col("group"))
      .agg(min(col("v")).as("lo_val"), max(col("v")).as("hi_val"))
    rows.join(broadcast(bounds), Seq("group"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n"),
        min(col("lo_val")).as("lo_val"), min(col("hi_val")).as("hi_val"),
        sum((col("v") < col("lo_val")).cast("long")).as("n_clipped_lo"),
        sum((col("v") > col("hi_val")).cast("long")).as("n_clipped_hi"),
        sum(greatest(col("lo_val"), least(col("hi_val"), col("v"))))
          .as("winsorized_sum"))
  }

  /** Quantile normalization across sources: each row's value is replaced
    * by the GLOBAL value at the equivalent rank position, so every
    * source's score distribution maps onto the pooled distribution —
    * the batch-effect correction used when per-annotator / per-shard
    * score scales drift. Convention: a row at within-source rank r of
    * n_s maps to the global value at rank ⌈r·N/n_s⌉ (source max → global
    * max; `(r·N + n_s − 1) DIV n_s` keeps truncating and flooring
    * engines in agreement on positive operands).
    *
    * Both rank passes are [[Sampling.orderedRank]] (bucketed prefix sums,
    * no global-order window); the mapping is then ONE equi-join on the
    * target rank — everything hash-partitions at any scale.
    *
    * Output: `(id, source, v, v_norm)`. The rank's bucket width adapts
    * to the observed value range (no key-space contract).
    */
  def quantileNormalize(df: DataFrame, idCol: Column, srcCol: Column,
                        valueCol: Column, tieCol: Column): DataFrame = {
    val rows = df.select(idCol.as("id"), srcCol.as("source"),
      valueCol.cast("long").as("v"), tieCol.as("uid"))
    // both rank passes order the SAME value column — probe its range once
    // and hand it to both, instead of two probe scans
    val probe = rows.agg(min(col("v")), max(col("v"))).head()
    val range = if (probe.isNullAt(0)) Some((0L, 0L))
                else Some((probe.getLong(0), probe.getLong(1)))
    val perSrc = Sampling.orderedRank(rows, col("source"), col("v"),
      col("uid"), nBuckets = 1024, keyRange = range, out = "__rs")
    val sizes = rows.groupBy(col("source")).agg(count(lit(1)).as("__ns"))
    val total = rows.agg(count(lit(1)).as("__n"))
    val globalRanks = Sampling.orderedRank(rows, lit(0L), col("v"),
        col("uid"), nBuckets = 1024, keyRange = range, out = "__gr")
      .select(col("__gr"), col("v").as("v_norm"))
    perSrc
      .join(broadcast(sizes), Seq("source"))
      .crossJoin(broadcast(total))
      .withColumn("__t", expr("(__rs * __n + __ns - 1) DIV __ns"))
      .join(globalRanks, col("__t") === col("__gr"))
      .select(col("id"), col("source"), col("v"), col("v_norm"))
  }

  /** Confusion matrix with per-cell class totals: one hash aggregation on
    * the (true, predicted) label pair plus two bounded class-total
    * aggregates broadcast back. Diagonal cells carry recall/precision in
    * exact ppm (`10⁶·n DIV class_total`); off-diagonal cells leave them
    * NULL — the consumer derives macro metrics from the integer columns
    * without re-scanning predictions.
    *
    * Output: `(true_label, pred_label, n, n_true, n_pred, recall_ppm,
    * precision_ppm)`.
    */
  def confusionMatrix(df: DataFrame, trueCol: Column,
                      predCol: Column): DataFrame = {
    val rows = df.select(trueCol.as("true_label"), predCol.as("pred_label"))
    val cells = rows.groupBy(col("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("n"))
    val rowTot = rows.groupBy(col("true_label"))
      .agg(count(lit(1)).as("n_true"))
    val colTot = rows.groupBy(col("pred_label"))
      .agg(count(lit(1)).as("n_pred"))
    cells
      .join(broadcast(rowTot), Seq("true_label"))
      .join(broadcast(colTot), Seq("pred_label"))
      .select(col("true_label"), col("pred_label"), col("n"),
        col("n_true"), col("n_pred"),
        when(col("true_label") === col("pred_label"),
          expr("1000000 * n DIV n_true")).as("recall_ppm"),
        when(col("true_label") === col("pred_label"),
          expr("1000000 * n DIV n_pred")).as("precision_ppm"))
  }

  /** Adjusted Rand Index between two clusterings (Hubert & Arabie 1985)
    * — THE pair-counting agreement metric for evaluating a clustering /
    * predicted labeling against a reference, chance-corrected. Entirely
    * integer pair combinatorics: with contingency counts n_ij, row/col
    * sums a_i, b_j, n rows, and C(x) = x·(x−1)/2,
    *
    *   ARI = (Σ C(n_ij) − Σ C(a_i)·Σ C(b_j)/C(n))
    *       / (½(Σ C(a_i)+Σ C(b_j)) − Σ C(a_i)·Σ C(b_j)/C(n))
    *
    * and clearing C(n) and the half gives the exact integer form
    * `num = 2·C(n)·Σ C(n_ij) − 2·Σa·Σb`, `den = C(n)·(Σa+Σb) − 2·Σa·Σb`
    * — reported with the sign factored out of the ppm DIV (truncate vs
    * floor on negatives). DECIMAL(38,0) carries the C(n)-scale products.
    *
    * Plan shape: one hash agg on (a, b) cells, two bounded hash aggs on
    * the marginals, three 1-row broadcasts — the corpus shuffles pair
    * labels once. Output: 1 row `(n, s_cells, s_a, s_b, ari_ppm)`; NULL
    * when den = 0 (both clusterings trivial — all-singletons or
    * all-one-cluster on both sides).
    */
  def adjustedRandIndex(df: DataFrame, aCol: Column,
                        bCol: Column): DataFrame = {
    val rows = df.select(aCol.as("a"), bCol.as("b"))
    // C(x,2) via integral DIV — Column `/` is DOUBLE division in Spark
    // and loses exactness past 2^53
    val cells = rows.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("nij"))
      .agg(sum(expr("nij * (nij - 1) DIV 2")).as("s_cells"),
        sum(col("nij")).as("n"))
    val sa = rows.groupBy(col("a")).agg(count(lit(1)).as("ai"))
      .agg(sum(expr("ai * (ai - 1) DIV 2")).as("s_a"))
    val sb = rows.groupBy(col("b")).agg(count(lit(1)).as("bj"))
      .agg(sum(expr("bj * (bj - 1) DIV 2")).as("s_b"))
    cells.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .select(col("n"), col("s_cells"), col("s_a"), col("s_b"),
        // decimal division by 2 is exact here — n(n−1) is always even;
        // an integral DIV would return LONG and overflow past n ~ 4·10⁹
        expr("CAST(n AS DECIMAL(38,0)) * (n - 1) / 2").as("t"))
      .select(col("n"), col("s_cells"), col("s_a"), col("s_b"),
        expr("CAST(2 * t * s_cells - 2 * CAST(s_a AS DECIMAL(38,0)) * s_b" +
          " AS DECIMAL(38,0))").as("num"),
        expr("CAST(t * (s_a + s_b) - 2 * CAST(s_a AS DECIMAL(38,0)) * s_b" +
          " AS DECIMAL(38,0))").as("den"))
      .select(col("n"), col("s_cells"), col("s_a"), col("s_b"),
        expr("""CASE WHEN den = 0 THEN NULL
               |ELSE CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END *
               |  ((CAST(1000000 AS DECIMAL(38,0)) * abs(num)) DIV den)
               |  AS BIGINT) END""".stripMargin).as("ari_ppm"))
  }

  /** Benford first-digit audit — the classic fraud / data-entry anomaly
    * screen: observed leading-digit frequencies of a positive integer
    * measure vs the Benford expectation P(d) = log₁₀(1 + 1/d). The
    * expectations are COMPILE-TIME ppm constants (no runtime libm — the
    * text_bm25 portability rule), and the leading digit is taken
    * numerically-via-string on an INTEGER (integer→string rendering is
    * identical across engines; double→string is not, which is why the
    * caller must pre-scale doubles to integer cents).
    *
    * One hash aggregation on a 9-row key. Output: `(digit, n, obs_ppm,
    * exp_ppm, dev_ppm)` with dev = obs − exp (signed).
    */
  def benfordReport(df: DataFrame, intValueCol: Column): DataFrame = {
    // floor(10⁶·log10(1 + 1/d)) for d = 1..9, precomputed
    val expPpm = Seq(301029L, 176091L, 124938L, 96910L, 79181L,
      66946L, 57991L, 51152L, 45757L)
    val expExpr = expPpm.zipWithIndex
      .map { case (p, i) => s"WHEN ${i + 1} THEN ${p}L" }
      .mkString("CASE digit ", " ", " END")
    val rows = df.select(intValueCol.cast("long").as("x"))
      .filter(col("x") > 0L)
      .select(substring(col("x").cast("string"), 1, 1).cast("long")
        .as("digit"))
    val total = rows.agg(count(lit(1)).as("__n"))
    rows.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("1000000 * n DIV __n").as("obs_ppm"),
        expr(expExpr).as("exp_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
  }

  /** Two-proportion z-test per experiment group — A/B testing over an
    * event log. The z statistic is a SINGLE fixed-order double expression
    * per group (the text_bm25 determinism rule: +, ×, /, IEEE sqrt are
    * exact; only accumulation ORDER is not — and all sums here are
    * integer counts):
    *
    *   z = ((c1·n2 − c2·n1) / (n1·n2)) / sqrt(p̂(1−p̂)(1/n1 + 1/n2)),
    *   p̂ = (c1+c2)/(n1+n2)
    *
    * The difference `c1·n2 − c2·n1` runs in DECIMAL(38,0) before the
    * DOUBLE cast — the bare int64 product wraps silently past ~3·10⁹
    * rows per arm (DuckDB's HUGEINT doesn't — engine divergence).
    *
    * reported as `z_micros = floor(z·10⁶)` plus the raw integer counts
    * (so any downstream recompute can re-derive significance at other
    * thresholds without re-scanning the log).
    *
    * Plan shape: one conditional hash aggregation over the group key —
    * variant splits become count-if columns, not separate scans. NULL z
    * for degenerate groups (an empty variant or p̂ ∈ {0, 1}).
    *
    * Output: `(group, n1, c1, n2, c2, z_micros, significant)` with
    * `significant = |z| ≥ 1.96` at the conventional 5% two-sided level.
    */
  /** Exact covariance matrix over the first `dims` embedding components —
    * the PCA/whitening precursor, upper triangle only, in integer
    * fixed-point: per dim pair, `cov_scaled = sign·(|n·Σxy − Σx·Σy| DIV
    * n²)` ≈ 10¹²·cov for unit-scale inputs — exact products in
    * DECIMAL(38,0) (n to ~10¹²), sign factored out so truncating DIV and
    * flooring `//` agree (the negative-operand rule). Rows shorter than
    * `dims` are excluded (the ragged-input contract).
    *
    * Plan shape: posexplode to (id, dim, x) — `dims` rows per vector —
    * then a self equi-join ON THE VECTOR ID pairing dims (dims² bounded
    * fan-out per vector, never vector×vector), one hash aggregation on
    * the ≤ dims² pair key. Linear in the corpus.
    *
    * Output: `(d1, d2, n, cov_scaled)` for d1 ≤ d2.
    */
  def covarianceMatrix(df: DataFrame, idCol: Column, vecCol: Column,
                       dims: Int): DataFrame = {
    require(dims >= 1 && dims <= 64, s"dims=$dims out of [1, 64]")
    val fixed = transform(slice(vecCol, 1, dims),
      x => floor(x.cast("double") * lit(1000000.0)).cast("long"))
    val ex = df.filter(size(vecCol) >= dims)
      .select(idCol.as("id"), posexplode(fixed).as(Seq("d", "x")))
    ex.alias("a").join(ex.alias("b"),
        col("a.id") === col("b.id") && col("a.d") <= col("b.d"))
      .select(col("a.d").as("d1"), col("b.d").as("d2"),
        col("a.x").as("x"), col("b.x").as("y"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .select(col("d1"), col("d2"), col("n"),
        expr("""CAST(CASE WHEN n * sxy - sx * sy >= 0
               |  THEN (n * sxy - sx * sy) DIV (CAST(n AS DECIMAL(38,0)) * n)
               |  ELSE -((sx * sy - n * sxy) DIV (CAST(n AS DECIMAL(38,0)) * n))
               |END AS BIGINT)""".stripMargin).as("cov_scaled"))
  }

  /** Spearman rank correlation with midranks (average ranks over ties) —
    * the monotone-association screen that survives outliers and
    * nonlinearity where Pearson on raw values does not. Doubled midranks
    * keep everything integral: per distinct value, 2·r̄ = min_rank +
    * max_rank (ranks from [[Sampling.orderedRank]], tie-group ranges are
    * tie-break-independent), and Pearson over the 2r̄ integers equals ρ
    * (scale invariance). The closing statistic is ONE fixed-order double
    * expression over DECIMAL(38,0) sums — exact products while
    * n·Σ(2r̄)² &lt; 10³⁸, i.e. rows to ~10⁹ (the q_spearman contract;
    * past that, pre-aggregate or sample).
    *
    * Plan shape: two bucketed rank passes, two per-distinct-value hash
    * aggs equi-joined back on the value (never broadcast — value
    * cardinality is data-sized), one 1-row closing aggregate. No global
    * sort anywhere.
    *
    * Output: 1 row `(n, rho_micros)`; NULL when either column is
    * constant.
    */
  def spearmanRho(df: DataFrame, xCol: Column, yCol: Column,
                  tieCol: Column): DataFrame = {
    val rows = df.select(xCol.cast("long").as("x"),
      yCol.cast("long").as("y"), tieCol.as("uid"))
    // one probe pass sizes BOTH rank bucketings — the y-rank otherwise
    // probes its input through the x-midrank join (a full re-execution)
    val pr = rows.agg(min(col("x")), max(col("x")),
      min(col("y")), max(col("y"))).head()
    def rg(lo: Int): Option[(Long, Long)] =
      if (pr.isNullAt(lo)) Some((0L, 0L))
      else Some((pr.getLong(lo), pr.getLong(lo + 1)))
    val rx = Sampling.orderedRank(rows, lit(0L), col("x"), col("uid"),
      nBuckets = 1024, keyRange = rg(0), out = "__rx")
    val perX = rx.groupBy(col("x"))
      .agg((min(col("__rx")) + max(col("__rx"))).as("__m2x"))
    val withX = rx.join(perX, Seq("x")).drop("__rx")
    val ry = Sampling.orderedRank(withX, lit(0L), col("y"), col("uid"),
      nBuckets = 1024, keyRange = rg(2), out = "__ry")
    val perY = ry.groupBy(col("y"))
      .agg((min(col("__ry")) + max(col("__ry"))).as("__m2y"))
    ry.join(perY, Seq("y"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(__m2x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(__m2y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(__m2x AS DECIMAL(38,0)) * __m2y")).as("sxy"),
        sum(expr("CAST(__m2x AS DECIMAL(38,0)) * __m2x")).as("sxx"),
        sum(expr("CAST(__m2y AS DECIMAL(38,0)) * __m2y")).as("syy"))
      .select(col("n"),
        expr("""CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
               |  THEN NULL
               |ELSE CAST(floor(0.5 + 1000000.0 *
               |  CAST(n * sxy - sx * sy AS DOUBLE) /
               |  (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
               |   sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT)
               |END""".stripMargin).as("rho_micros"))
  }

  /** Two-sample chi-square homogeneity statistic over a categorical
    * bucketing — the distribution-drift test that complements the exact
    * KS ([[q_ks_drift]]'s operator) for CATEGORICAL features, where KS's
    * ordering is meaningless. For slices A/B with per-bucket counts
    * a_b/b_b:
    *
    *   χ² = Σ_b (a_b·N_B − b_b·N_A)² / (N_A·N_B·(a_b + b_b))
    *
    * reported as `chi2_micros = Σ_b ⌊10⁶·num_b / den_b⌋` — the per-bucket
    * floor makes the statistic a pure integer function of the counts
    * (deterministic and replayable anywhere; the ≤ n_buckets·1 µ-unit
    * downward bias is irrelevant against critical values). DECIMAL(38,0)
    * carries the squared cross products — exact while
    * (a_b·N_B − b_b·N_A)² &lt; 10³⁸, i.e. slice sizes to ~10⁹ rows;
    * beyond that, pre-aggregate counts to a coarser unit first.
    *
    * Plan shape: one conditional hash aggregation on the bucket key, one
    * grouping-free 1-row totals aggregate broadcast back, one 1-row
    * closing sum. Degrees of freedom = n_buckets − 1.
    *
    * Output: 1 row `(n_a, n_b, n_buckets, chi2_micros)`; NULL statistic
    * when either slice is empty.
    */
  def chiSquareDrift(df: DataFrame, sliceCol: Column,
                     bucketCol: Column): DataFrame = {
    // NULL-slice rows belong to NEITHER arm: without the filter a bucket
    // populated only by NULL slices still emits an a=b=0 row, inflating
    // n_buckets (and the caller-derived degrees of freedom) while adding
    // a NULL χ² term. Contract: rows with a NULL slice are excluded.
    val rows = df.select(bucketCol.as("bucket"),
        sliceCol.cast("int").as("sl"))
      .filter(col("sl").isNotNull)
    val perBucket = rows.groupBy(col("bucket"))
      .agg(sum(when(col("sl") === 0, 1L).otherwise(0L)).as("a"),
        sum(when(col("sl") =!= 0, 1L).otherwise(0L)).as("b"))
    val totals = perBucket.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
    perBucket.crossJoin(broadcast(totals))
      .select(col("na"), col("nb"),
        expr("""CASE WHEN na = 0 OR nb = 0 THEN NULL
               |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) *
               |  (CAST(a AS DECIMAL(38,0)) * nb - CAST(b AS DECIMAL(38,0)) * na) *
               |  (CAST(a AS DECIMAL(38,0)) * nb - CAST(b AS DECIMAL(38,0)) * na))
               |  DIV (CAST(na AS DECIMAL(38,0)) * nb * (a + b)) AS BIGINT)
               |END""".stripMargin).as("t"))
      .groupBy(col("na"), col("nb"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("t")).as("chi2_micros"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        col("n_buckets"), col("chi2_micros"))
  }

  def abTestZ(df: DataFrame, groupCol: Column, variantCol: Column,
              convertedCol: Column): DataFrame = {
    val rows = df.select(groupCol.as("group"),
      variantCol.cast("int").as("v"), convertedCol.cast("long").as("y"))
    rows.groupBy(col("group"))
      .agg(sum(when(col("v") === 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col("v") === 0, col("y")).otherwise(0L)).as("c1"),
        sum(when(col("v") =!= 0, 1L).otherwise(0L)).as("n2"),
        sum(when(col("v") =!= 0, col("y")).otherwise(0L)).as("c2"))
      .select(col("group"), col("n1"), col("c1"), col("n2"), col("c2"),
        expr("""CASE WHEN n1 = 0 OR n2 = 0
               |  OR c1 + c2 = 0 OR c1 + c2 = n1 + n2 THEN NULL
               |ELSE CAST(floor(1000000.0 *
               |  ((CAST(CAST(c1 AS DECIMAL(38,0)) * n2 -
               |         CAST(c2 AS DECIMAL(38,0)) * n1 AS DOUBLE) /
               |    (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) /
               |   sqrt((CAST(c1 + c2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) *
               |     (1.0 - CAST(c1 + c2 AS DOUBLE) /
               |       CAST(n1 + n2 AS DOUBLE)) *
               |     (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))))
               |  AS BIGINT) END""".stripMargin).as("z_micros"))
      .withColumn("significant",
        when(col("z_micros").isNull, lit(null).cast("boolean"))
          .otherwise(abs(col("z_micros")) >= 1960000L))
  }

  /** Per-(level, dyadic node) exact counts over a non-negative integral
    * column — the MERGEABLE state of the canonical q-digest
    * ([[qdigestQuantiles]]): node `(lev, v >> lev)` counts every value in
    * the dyadic interval `[node·2^lev, (node+1)·2^lev)`. Because the
    * counts are EXACT sums, merging shard sketches is plain
    * `union → groupBy(lev, node) → sum(cn)` and is bit-identical to a
    * one-pass build — the sketch's shard-merge ≡ one-pass law holds by
    * construction, not approximately (QuantileSketchSpec proves it).
    * One explode(maxBits+1) over the DISTINCT-value frame (never over
    * rows) + one hash aggregation.
    */
  def qdigestNodeCounts(df: DataFrame, valueCol: Column,
                        maxBits: Int): DataFrame = {
    require(maxBits >= 1 && maxBits <= 62, s"maxBits=$maxBits out of [1, 62]")
    df.select(valueCol.cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .select(explode(sequence(lit(0), lit(maxBits))).as("lev"),
        col("v"), col("c"))
      .groupBy(col("lev"), expr("shiftright(v, lev)").as("node"))
      .agg(sum(col("c")).as("cn"))
  }

  /** The q-digest PARTITION at threshold T = max(1, ⌊epsPpm·n/10⁶⌋): the
    * unique maximal-dyadic-interval partition of the value support where
    * every non-leaf part holds ≤ T elements — Shrivastava et al. 2004
    * ("Medians and Beyond") made CANONICAL: a node is emitted iff its
    * parent's count exceeds T and it is itself ≤ T or a leaf (count
    * monotonicity up the tree makes "parent > T" equivalent to "every
    * proper ancestor > T", so the greedy top-down recursion needs no
    * recursion — one self equi-join on (lev+1, node>>1) decides every
    * node at once). The partition is a pure function of the value
    * MULTISET — no arrival order, no randomness — which is what upgrades
    * the usual q-digest merge bound into an exact equality law.
    *
    * Size ≤ (maxBits+1)·(2n/T + 2): per level at most n/T nodes exceed T,
    * and every emitted node is a child of one (or the root). Rank error:
    * any value inside an emitted interval has its exact rank pinned to a
    * window of width cnt ≤ T (leaf intervals are EXACT) — the provable
    * ε·n worst-case bound, with no distributional assumption.
    *
    * The cumulative count `cum_below` needs a global interval order; the
    * single-partition window is banned, so it is split the [[ksDrift]]
    * way: range buckets of `v_lo >> bucketShift`, carry-ins from a
    * bounded [[Prefix.exclusiveFold]], within-bucket window PARTITIONED
    * by bucket. Input values must lie in [0, 2^maxBits) — validated by a
    * bounded probe of the root level (≤ 3 rows). Output: one row per
    * partition interval — (lev, v_lo, v_hi, cnt, cum_below).
    */
  def qdigestPartition(nodes: DataFrame, maxBits: Int, epsPpm: Long,
                       bucketShift: Int = 8): DataFrame = {
    require(epsPpm >= 1 && epsPpm <= 1000000,
      s"epsPpm=$epsPpm out of [1, 10^6]")
    require(bucketShift >= 0 && bucketShift <= 62,
      s"bucketShift=$bucketShift out of [0, 62]")
    val nd = nodes.localCheckpoint(true) // feeds root probe + both join sides
    val roots = nd.filter(col("lev") === maxBits).limit(3).collect()
    require(roots.length <= 1 && roots.forall(_.getLong(1) == 0L),
      s"values outside [0, 2^$maxBits): root nodes " +
        roots.map(_.getLong(1)).mkString(","))
    val n = if (roots.isEmpty) 0L else roots(0).getLong(2)
    val t = math.max(1L, (BigInt(epsPpm) * n / 1000000).toLong)
    // The parent's count is the SUM of its (≤ 2) children's counts — the
    // node counts are exact dyadic sums — so "parent > T" attaches with
    // one sibling-group window (partition by (lev, node >> 1), groups of
    // ≤ 2 rows — no skew exposure) instead of the former parent⋈child
    // self-join: one exchange of the node frame rather than two, no join
    // (guide §2.4). r15 clean A/B at 5 reps on a quiet box: window
    // 4.435 s raw / tide 1.08 vs self-join 4.596 s raw / tide 1.169 —
    // a tie within tide noise; the window stays for the plan win
    // (plans/r15/qdigest_emit_fragment_*.txt dumps the pre-checkpoint
    // fragment both ways).
    val emitted = nd.filter(col("lev") < maxBits)
      .withColumn("__pcn", sum(col("cn")).over(
        Window.partitionBy(col("lev"), expr("shiftright(node, 1)"))))
      .filter(col("__pcn") > t && (col("cn") <= t || col("lev") === 0))
      .select(col("lev"), col("node"), col("cn"))
    val digest = emitted
      .unionByName(nd.filter(col("lev") === maxBits && col("cn") <= t))
      .select(col("lev"), col("cn").as("cnt"),
        expr("shiftleft(node, lev)").as("v_lo"),
        expr("shiftleft(node + 1, lev) - 1").as("v_hi"))
      .withColumn("bucket", shiftright(col("v_lo"), bucketShift))
      .localCheckpoint(true) // parameter-bounded; feeds fold + window
    val nets = digest.groupBy(col("bucket")).agg(sum(col("cnt")).as("bc"))
    val carry = Prefix.exclusiveFold(nets, "bucket", "bc",
      lit(0L), (a, b) => a + b)
    val w = Window.partitionBy(col("bucket")).orderBy(col("v_lo"))
      .rowsBetween(Window.unboundedPreceding, -1)
    digest
      .withColumn("within", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .join(broadcast(carry), Seq("bucket"))
      .select(col("lev"), col("v_lo"), col("v_hi"), col("cnt"),
        (col("carry") + col("within")).as("cum_below"))
  }

  /** ε-approximate quantiles from the canonical q-digest: for each probe
    * q (ppm), the partition interval containing target rank
    * r = max(1, ⌈q·n/10⁶⌉). The answer is exact arithmetic end-to-end —
    * (q_ppm, v_lo, v_hi, cum_below, cnt_in) with the GUARANTEE
    * cum_below < r ≤ cum_below + cnt_in and (v_lo < v_hi ⟹ cnt_in ≤
    * ⌊ε·n/10⁶⌋): the true rank-r value lies in [v_lo, v_hi] and its rank
    * is pinned within ε·n. Probe resolution is a broadcast of the
    * parameter-sized digest (≤ (maxBits+1)·(2·10⁶/epsPpm + 2) rows)
    * against the literal probe list — a bounded cross, never data×data.
    */
  def qdigestQuantiles(df: DataFrame, valueCol: Column, maxBits: Int,
                       epsPpm: Long, probesPpm: Seq[Long],
                       bucketShift: Int = 8): DataFrame = {
    require(probesPpm.nonEmpty && probesPpm.forall(p => p >= 0 && p <= 1000000),
      s"probes must lie in [0, 10^6] ppm: $probesPpm")
    val spark = df.sparkSession
    import spark.implicits._
    val nodes = qdigestNodeCounts(df, valueCol, maxBits)
    // parameter-bounded; checkpointed because it feeds the n probe AND the
    // probe join (the plan-time-probe re-execution house rule)
    val part = qdigestPartition(nodes, maxBits, epsPpm, bucketShift)
      .localCheckpoint(true)
    val n = part.agg(coalesce(sum(col("cnt")), lit(0L))).collect()(0).getLong(0)
    val probes = probesPpm.toDF("q_ppm")
      .select(col("q_ppm"), greatest(lit(1L),
        expr(s"CAST((CAST(q_ppm AS DECIMAL(38,0)) * ${n}L + 999999) " +
          "DIV 1000000 AS BIGINT)")).as("rk"))
    probes.join(broadcast(part),
        col("cum_below") < col("rk") &&
          col("rk") <= col("cum_below") + col("cnt"))
      .select(col("q_ppm"), col("v_lo"), col("v_hi"), col("cum_below"),
        col("cnt").as("cnt_in"))
      .orderBy(col("q_ppm"))
  }
}
