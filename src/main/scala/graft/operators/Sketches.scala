package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min Sketch (Cormode &amp; Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms 2005)
  * as a DataFrame-native mergeable sketch: the sketch IS a (row, bucket,
  * cnt) frame of at most d×w rows, built with one partial-agg shuffle over
  * the occurrence stream. Counts are plain integer sums, so sketches from
  * different shards / days / streams merge by unioning and re-summing —
  * the property that lets a 100 TB pipeline keep per-partition sketches
  * and combine them at read time ([[cmsMerge]]).
  *
  * Hash family: row r maps key k to `((a_r · (u mod p) + b_r) mod p) mod w`
  * with `u` = the 60-bit md5 prefix of k and p = 2³¹−1 — the classic
  * Carter–Wegman pairwise-independent family, chosen over xxhash so the
  * whole sketch is replicable in external SQL (`a·u + b` stays under 2⁶²,
  * no BIGINT overflow on either engine). Estimates are biased UP only:
  * `est ≥ true` always, and `est ≤ true + εN` with probability 1−δ at
  * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  */
object Sketches {

  /** Modulus of the Carter–Wegman family: the Mersenne prime 2³¹ − 1. */
  val P: Long = 2147483647L

  /** Deterministic (a_r, b_r) per sketch row from the seed — emitted into
    * oracle SQL as literals, same pattern as the LSH hyperplanes.
    */
  def cmsRowParams(d: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(d)((1L + rnd.nextInt((P - 1).toInt).toLong,
      rnd.nextInt(P.toInt).toLong))
  }

  /** 60-bit md5 prefix of the key, reduced mod p — SQL-replicable:
    * `('0x' || substr(md5(k), 1, 15))::BIGINT % 2147483647`.
    */
  private def md5ModP(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long") % P

  /** One bucket column per sketch row, over a PRE-REDUCED `u = md5 mod p`
    * column — the md5 is computed once per input row, not once per sketch
    * row (Spark's subexpression elimination does not merge the d copies
    * inside an array constructor; measured 4× the necessary hashing).
    */
  private def bucketColsFromU(u: Column, d: Int, w: Int, seed: Long): Seq[Column] =
    cmsRowParams(d, seed).map { case (a, b) => ((u * a + b) % P) % w }

  /** Build the sketch over an occurrence frame (one input row per
    * occurrence): d buckets per occurrence via posexplode, then a
    * partial-agg count keyed by (row, bucket). Result is ≤ d×w rows —
    * broadcastable by construction — regardless of corpus size.
    *
    * The same plan runs unchanged as a Structured Streaming aggregation in
    * Complete mode (`items` = a readStream frame): aggregation state is
    * bounded by d×w however long the stream runs — see StreamingSpec's
    * stream-equals-batch test.
    */
  def cmsBuild(items: DataFrame, keyCol: Column,
               d: Int = 4, w: Int = 256, seed: Long = 42L): DataFrame = {
    require(d >= 1 && d <= 16, s"d=$d out of [1, 16]")
    require(w >= 2, s"w=$w must be >= 2")
    items
      .select(md5ModP(keyCol).as("__u"))
      .select(posexplode(array(bucketColsFromU(col("__u"), d, w, seed): _*))
        .as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches built with the SAME (d, w, seed): element-wise count
    * sum. Associative and commutative — shard-, day- or stream-scoped
    * sketches combine in any order.
    */
  def cmsMerge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "cmsMerge needs at least one sketch")
    sketches.reduce(_.unionByName(_))
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Equi-width grid quantile sketch: bucket counts over `value DIV
    * bucketWidth` — the bounded-state, MERGEABLE approximate-percentile
    * summary (shard sketches sum element-wise to the corpus sketch, the
    * same algebra as [[cmsMerge]]). A quantile estimate is the bucket
    * containing the target rank, so the error is bounded by one bucket
    * width — pick the width from the value range you must resolve, not
    * from the data volume: state is (range / width) counters at ANY
    * scale.
    *
    * Everything is integer-exact and engine-portable: the target rank is
    * `ceil(q·n)` computed as `(n·num + den − 1) DIV den` from a RATIONAL
    * q = num/den, and the cumulative counts come from a bounded
    * [[Prefix.exclusiveFold]] over the (bounded) non-empty buckets —
    * never a global-order window.
    *
    * Output: one row per requested quantile — `(p, target_rank, est_lo,
    * est_hi)`, the label and the closed value range `[lo, hi]` of the
    * bucket holding rank `target_rank`. `valueCol` must be a
    * non-negative integral.
    */
  def gridQuantiles(df: DataFrame, valueCol: Column, bucketWidth: Long,
                    quantiles: Seq[(String, Int, Int)]): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth=$bucketWidth must be >= 1")
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (l, num, den) =>
      require(num >= 0 && den >= 1 && num <= den,
        s"quantile $l: $num/$den out of [0, 1]")
    }
    val sk = df
      .select(valueCol.cast("long").as("__v"))
      .select(expr(s"__v DIV ${bucketWidth}L").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val carries = Prefix.exclusiveFold(sk, "bucket", "cnt",
      lit(0L), (a, b) => a + b)
    val tot = sk.agg(sum(col("cnt")).as("n_total"))
    val qs = quantiles.map { case (l, num, den) =>
      struct(lit(l).as("p"), lit(num.toLong).as("num"),
        lit(den.toLong).as("den"))
    }
    sk.join(broadcast(carries), Seq("bucket"))
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("cnt"), col("carry"), col("n_total"),
        explode(array(qs: _*)).as("q"))
      .withColumn("target_rank",
        expr("(n_total * q.num + q.den - 1) DIV q.den"))
      .filter(col("carry") < col("target_rank") &&
        col("target_rank") <= col("carry") + col("cnt"))
      .select(col("q.p").as("p"), col("target_rank"),
        (col("bucket") * bucketWidth).as("est_lo"),
        (col("bucket") * bucketWidth + lit(bucketWidth - 1)).as("est_hi"))
  }

  /** Equi-join cardinality estimate from two sketches built with the SAME
    * (d, w, seed): |A ⋈ B on k| = Σ_k fA(k)·fB(k), estimated by the
    * sketch inner product min_r Σ_b A_r[b]·B_r[b] (Cormode &amp;
    * Muthukrishnan §4.2). Biased UP only — collisions add non-negative
    * cross terms — so it is a safe planning bound: "will this join
    * explode" answered from two d×w frames without touching either table.
    * Returns a single-row frame (est_join_size).
    */
  def cmsJoinSize(cmsA: DataFrame, cmsB: DataFrame): DataFrame =
    cmsA.alias("a").join(cmsB.alias("b"), Seq("row", "bucket"))
      .groupBy(col("row"))
      .agg(sum(col("a.cnt") * col("b.cnt")).as("rowEst"))
      .agg(min(col("rowEst")).as("est_join_size"))

  /** Point-estimate the count of each key in `keys`: min over the d rows
    * of the key's bucket counts (an absent bucket is a true zero). The
    * sketch side is broadcast (≤ d×w rows); the keys side never shuffles
    * more than (key, d) exploded pairs.
    */
  def cmsEstimate(cms: DataFrame, keys: DataFrame, keyCol: Column,
                  d: Int = 4, w: Int = 256, seed: Long = 42L): DataFrame = {
    val kb = keys.select(keyCol.as("key"))
      .select(col("key"), md5ModP(col("key")).as("__u"))
      .select(col("key"),
        posexplode(array(bucketColsFromU(col("__u"), d, w, seed): _*))
          .as(Seq("row", "bucket")))
    kb.join(broadcast(cms), Seq("row", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  // ------------------------------------------------------------------
  // HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, "HyperLogLog: the
  // analysis of a near-optimal cardinality estimation algorithm", AofA
  // 2007) as a DataFrame-native mergeable sketch, fully deterministic
  // and SQL-replicable — unlike Spark's built-in approx_count_distinct
  // (HLL++ with engine-private hashing) or hll_sketch_agg (DataSketches
  // binary blobs), this variant hash-matches an external oracle.
  //
  // Hash: u = 60-bit md5 prefix of the key. bucket = top b bits of u;
  // rho = position of the first 1-bit in the remaining Q = 60-b bits
  // (1-based; all-zero remainder -> Q+1). rho is computed via
  // `length(bin(r))` — both Spark and DuckDB render binary without
  // leading zeros, so Q - length(bin(r)) + 1 is the leading-zero count
  // in both engines with zero floating point involved.
  //
  // The estimator's harmonic sum uses 2^(Q+1)-scaled INTEGER terms:
  // shiftleft(1, Q+1-rho) ∈ [1, 2^Q], at most m occupied-bucket terms
  // plus (m - occupied) empty-bucket terms of 2^(Q+1) — bounded by
  // m·2^(Q+1) = 2^61 at b=6, inside int64. Integer sums are
  // order-independent, so the estimate is bit-reproducible under any
  // partitioning, and the final alpha·m²·2^(Q+1)/S is one double
  // division from an exactly-agreed numerator and denominator.
  //
  // The small-range (linear counting) correction is intentionally NOT
  // folded in: it needs ln(), whose last-ulp rounding is not guaranteed
  // to agree across engines. The register frame and n_empty are exposed
  // so a caller can apply any correction; the declared queries target
  // cardinalities ≫ 2.5m where the raw estimator is the right one.
  // ------------------------------------------------------------------

  /** alpha_m bias-correction constant from the HLL paper. */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** The fully-folded estimator numerator alpha_m · m² · 2^(Q+1), as one
    * Scala-computed double emitted verbatim into both the Spark plan and
    * oracle SQL — a single agreed constant instead of trusting both
    * engines to fold the product identically.
    */
  def hllNumerator(b: Int): Double = {
    val m = 1 << b
    hllAlpha(m) * m.toDouble * m.toDouble * math.pow(2.0, 61 - b)
  }

  /** Build the register frame: one row per (group, bucket) holding the
    * max rho — at most m = 2^b rows per group regardless of input size,
    * via a single partial-agg (map-side max) shuffle. Registers built
    * over shards/days/streams merge with [[hllMerge]].
    */
  def hllRegisters(items: DataFrame, keyCol: Column,
                   grpCols: Seq[(Column, String)],
                   b: Int = 6): DataFrame = {
    require(b >= 4 && b <= 16, s"b=$b out of [4, 16]")
    val q = 60 - b
    val u = conv(substring(md5(keyCol.cast("string")), 1, 15), 16, 10)
      .cast("long")
    val r = u.bitwiseAND(lit((1L << q) - 1L))
    val rho = when(r === 0L, lit(q + 1))
      .otherwise(lit(q + 1) - length(bin(r))).cast("int")
    items
      .select(grpCols.map { case (c, n) => c.as(n) } :+
        shiftright(u, q).as("bucket") :+ rho.as("rho"): _*)
      .groupBy(grpCols.map(g => col(g._2)) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Merge register frames built with the SAME (b, key expression):
    * union + re-max. Associative and commutative — the property that
    * lets a 100 TB pipeline sketch each ingest partition independently
    * and answer any-range distinct queries from register frames alone.
    */
  def hllMerge(grpColNames: Seq[String], sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "hllMerge needs at least one sketch")
    sketches.reduce(_.unionByName(_))
      .groupBy((grpColNames :+ "bucket").map(col): _*)
      .agg(max(col("max_rho")).as("max_rho"))
  }

  /** Estimate distinct counts from a register frame: per group, the
    * scaled integer harmonic sum (occupied terms + empty-bucket mass)
    * feeds one double division. Emits n_empty alongside the estimate so
    * consumers can see when they are in linear-counting range.
    */
  def hllEstimate(registers: DataFrame, grpColNames: Seq[String],
                  b: Int = 6): DataFrame = {
    val m = 1 << b
    val q = 60 - b
    // functions.shiftleft only accepts a literal bit count — the SQL
    // form takes a column, identical to the oracle's `1 << (q+1 - rho)`
    val sScaled = sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${q + 1} - max_rho)"))
      .plus((lit(m.toLong) - count(lit(1))) * lit(1L << (q + 1)))
    registers
      .groupBy(grpColNames.map(col): _*)
      .agg((lit(m.toLong) - count(lit(1))).as("n_empty"),
        (lit(hllNumerator(b)) / sScaled.cast("double")).as("est_distinct"))
  }

  // ------------------------------------------------------------------
  // KMV — k minimum values (Bar-Yossef, Jayram, Kumar, Sivakumar &
  // Trevisan, "Counting distinct elements in a data stream", RANDOM
  // 2002; multiset operations per Beyer, Haas, Reinwald, Sismanis &
  // Gemulla, "On synopses for distinct-value estimation under multiset
  // operations", SIGMOD 2007).
  //
  // The sketch is the k smallest DISTINCT 60-bit md5 hash values — a
  // ≤ k-row frame per group. Unlike HLL registers it supports SET
  // operations: the k smallest of a union of sketches IS the sketch of
  // the union, and membership of those values in each input sketch
  // estimates Jaccard / intersection size ([[kmvJaccard]]) — the
  // "how much do these two corpora overlap" question a dedup pipeline
  // asks before paying for a full join. Everything up to the final
  // estimate is 60-bit integers, so sketches hash-match an external
  // SQL replay; the estimate is one double division from agreed
  // integers. When a group has fewer than k distinct hashes the sketch
  // holds ALL of them and the estimate is exact by construction.
  // ------------------------------------------------------------------

  /** The 60-bit md5 hash shared by every sketch here — SQL-replicable
    * as `('0x' || substr(md5(k), 1, 15))::BIGINT`.
    */
  def kmvU(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** The folded estimator numerator (k−1)·2⁶⁰ as one Scala-computed
    * double emitted verbatim into both engines (same pattern as
    * [[hllNumerator]]): est = numerator / u_(k).
    */
  def kmvNumerator(k: Int): Double = (k - 1).toDouble * math.pow(2.0, 60)

  /** Build the per-group sketch: k smallest distinct hashes of the key.
    * Dedup is a partial-agg `distinct` (map-side combine), so the
    * ranking that follows only ever sorts DISTINCT hashes. Ungrouped
    * sketches use sort+limit — Spark plans TakeOrderedAndProject:
    * per-partition top-k then a single k-row merge, no global sort.
    * Grouped sketches rank with a window partitioned by the group —
    * one sort shuffle of distinct hashes, spill-safe.
    */
  def kmvSketch(items: DataFrame, keyCol: Column,
                grpCols: Seq[(Column, String)], k: Int = 256): DataFrame = {
    require(k >= 16, s"k=$k too small for a useful estimate (need >= 16)")
    val dedup = items
      .select(grpCols.map { case (c, n) => c.as(n) } :+ kmvU(keyCol).as("u"): _*)
      .distinct()
    keepMinK(dedup, grpCols.map(_._2), k)
  }

  /** Merge sketches built with the SAME (k, key expression): union,
    * re-dedup, re-min-k. Associative and commutative, like the other
    * sketches here — shard- or day-scoped KMVs combine in any order.
    */
  def kmvMerge(grpColNames: Seq[String], k: Int,
               sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "kmvMerge needs at least one sketch")
    keepMinK(sketches.reduce(_.unionByName(_)).distinct(), grpColNames, k)
  }

  private def keepMinK(dedup: DataFrame, grpColNames: Seq[String],
                       k: Int): DataFrame =
    if (grpColNames.isEmpty) dedup.orderBy(col("u")).limit(k)
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(grpColNames.map(col): _*).orderBy(col("u"))
      dedup.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k).drop("__rk")
    }

  /** Estimate distinct counts from a sketch frame: per group,
    * (k−1)·2⁶⁰ / u_(k) — or the exact kept count when the group never
    * filled its k slots. n_kept is emitted so consumers can see which
    * regime they are in.
    */
  def kmvEstimate(sketch: DataFrame, grpColNames: Seq[String],
                  k: Int = 256): DataFrame =
    sketch.groupBy(grpColNames.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max(col("u")).as("__kth"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit(kmvNumerator(k)) / col("__kth").cast("double")))
      .drop("__kth")

  /** Jaccard / overlap estimates from two UNGROUPED sketches with the
    * same (k, key expression), per Beyer et al. §5: take the k smallest
    * of the union (`L`), count how many of them appear in BOTH input
    * sketches (k_both) — k_both / |L| estimates the Jaccard index, and
    * scaled by the union-size estimate it estimates the intersection
    * size. Both sketches are ≤ k rows, so every join here is a
    * broadcast of a k-row frame; nothing in this method rescans data.
    *
    * Output (one row): n_union_kept, k_both, est_union, est_jaccard,
    * est_intersection.
    */
  def kmvJaccard(a: DataFrame, b: DataFrame, k: Int = 256): DataFrame = {
    val l = kmvMerge(Seq.empty, k, a.select(col("u")), b.select(col("u")))
    val both = l.join(broadcast(a.select(col("u"))), Seq("u"), "left_semi")
      .join(broadcast(b.select(col("u"))), Seq("u"), "left_semi")
      .agg(count(lit(1)).as("k_both"))
    l.agg(count(lit(1)).as("n_union_kept"), max(col("u")).as("__kth"))
      .crossJoin(broadcast(both))
      .withColumn("est_union",
        when(col("n_union_kept") < k, col("n_union_kept").cast("double"))
          .otherwise(lit(kmvNumerator(k)) / col("__kth").cast("double")))
      .withColumn("est_jaccard",
        col("k_both").cast("double") / col("n_union_kept").cast("double"))
      .withColumn("est_intersection", col("est_jaccard") * col("est_union"))
      .select(col("n_union_kept"), col("k_both"), col("est_union"),
        col("est_jaccard"), col("est_intersection"))
  }
}
