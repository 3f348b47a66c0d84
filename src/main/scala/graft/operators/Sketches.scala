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
}
