package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-synthesized scale-up fixture: materializes an sf-N× corpus from an
  * existing driver fixture dir by UNIONING `replicas` key-shifted copies of
  * every fact table (dims `region`/`nation` stay fixed, as TPC-H scaling
  * does). The point is the round-6 verdict's remaining evidence gap — an
  * EMPIRICAL third scaling point (sf0.01 → sf0.1 → ~sf1) for
  * `Bench.scalingMain`, not new correctness surface (timing only; the
  * DuckDB gate keeps running on the driver's own fixtures).
  *
  * Replica construction is designed so the scale-up measures ENGINE
  * scaling, not a replication artifact:
  *
  *  - **Keys shift** by `k * 10^8` (primary and foreign keys move
  *    together), so joins fan out exactly as in the source data and
  *    nothing collides across replicas.
  *  - **Text decorrelates via a per-replica letter permutation**
  *    (`translate` over [a-zA-Z]; replica 0 is the identity). A bijection
  *    on letters preserves every length-based statistic EXACTLY — token
  *    counts, word lengths, `n_chars`, punctuation/digit ratios — and
  *    preserves the WITHIN-replica near-duplicate structure exactly
  *    (shingle equality is invariant under any injective word map), while
  *    making cross-replica shingle/vocabulary overlap zero. Duplicate
  *    DENSITY is therefore held constant as the corpus grows: pair-bound
  *    operators (minhash, PPJoin, containment) measure their genuine
  *    per-density scaling, not a 10×-copies-of-everything pair explosion
  *    that no real corpus has. The cost: stopword/langid-gated filters
  *    only "pass" replica 0 (the permuted replicas read as foreign
  *    languages — which is what a 10× multilingual crawl looks like), so
  *    stages DOWNSTREAM of an English-quality gate see sf0.1-sized data.
  *    SCALE.md carries this caveat next to the numbers.
  *  - **Embeddings decorrelate via a per-replica Rademacher sign pattern**
  *    (deterministic ±1 per (replica, dimension); replica 0 identity). A
  *    signed coordinate flip is an ISOMETRY: within-replica distances,
  *    cosines, and cluster geometry are bit-exact to the source, while
  *    cross-replica cosines collapse toward 0 — same constant-density
  *    argument as the text permutation, for the ANN/semantic-dedup family.
  *  - Low-cardinality categoricals (`l_returnflag`, `o_orderstatus`,
  *    `event_type`, `lang`, `source`, `p_brand`, `p_type`) keep their
  *    fixed domains — group-by result cardinality stays sf-invariant, as
  *    in TPC-H. Timestamps keep their range: per-window event density
  *    grows 10×, which IS the correct scaling for a fixed-horizon stream.
  *
  * Usage: `runMain graft.ScaleGen <srcDir> <outDir> [replicas=10]`.
  * Deterministic end-to-end (splitmix letter shuffles, xxhash64 signs) —
  * two runs produce identical tables.
  */
object ScaleGen {
  private val Stride = 100000000L // > every key in the source fixtures

  /** Deterministic permutation of the letter alphabet for replica k;
    * k = 0 is the identity. Fisher–Yates driven by splitmix64 so the
    * permutation is a pure function of k.
    */
  private def letterPerm(k: Int): (String, String) = {
    val from = (('a' to 'z') ++ ('A' to 'Z')).mkString
    if (k == 0) return (from, from)
    var state = 0x9e3779b97f4a7c15L * (k + 1)
    def next(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val lower = ('a' to 'z').toArray
    val upper = ('A' to 'Z').toArray
    for (arr <- Seq(lower, upper); i <- arr.length - 1 to 1 by -1) {
      val j = ((next() >>> 1) % (i + 1)).toInt
      val t = arr(i); arr(i) = arr(j); arr(j) = t
    }
    (from, new String(lower) ++ new String(upper))
  }

  private def shifted(c: String, k: Int): Column =
    (col(c) + lit(k.toLong * Stride)).as(c)

  private def permuted(c: String, k: Int): Column = {
    val (from, to) = letterPerm(k)
    translate(col(c), from, to).as(c)
  }

  /** ±1 sign for (replica k, dimension i) — Rademacher via xxhash64. */
  private def signFlipped(c: String, k: Int): Column =
    if (k == 0) col(c).as(c)
    else transform(col(c), (x, i) =>
      x * (pmod(xxhash64(lit(k), i), lit(2)) * 2 - 1).cast("float")).as(c)

  /** One replica of one table: every column mapped through the supplied
    * per-column rule (default: keep as-is).
    */
  private def replica(df: DataFrame, k: Int,
                      rules: Map[String, (String, Int) => Column]): DataFrame =
    df.select(df.columns.toSeq.map { c =>
      rules.get(c).map(f => f(c, k)).getOrElse(col(c))
    }: _*)

  private val shiftRule: (String, Int) => Column = shifted
  private val permRule: (String, Int) => Column = permuted
  private val signRule: (String, Int) => Column = signFlipped

  /** Per-table column rules; anything absent copies through unchanged. */
  private val tableRules: Map[String, Map[String, (String, Int) => Column]] = Map(
    "customer" -> Map("c_custkey" -> shiftRule, "c_name" -> permRule),
    "supplier" -> Map("s_suppkey" -> shiftRule, "s_name" -> permRule),
    "part" -> Map("p_partkey" -> shiftRule, "p_name" -> permRule),
    "orders" -> Map("o_orderkey" -> shiftRule, "o_custkey" -> shiftRule),
    "lineitem" -> Map("l_orderkey" -> shiftRule, "l_partkey" -> shiftRule,
      "l_suppkey" -> shiftRule),
    "events" -> Map("event_id" -> shiftRule, "user_id" -> shiftRule),
    "documents" -> Map("doc_id" -> shiftRule, "text" -> permRule),
    "embeddings" -> Map("vec_id" -> shiftRule, "embedding" -> signRule))

  /** Write `df` as the single plain FILE `<outDir>/<t>.parquet` — the
    * driver-fixture layout, which the streaming sources' glob
    * (`pathGlobFilter=events*.parquet`) and every `Tables` reader expect.
    * One ~100 MB parquet file stays fully splittable for the local[32]
    * readers: row groups, not files, are Spark's split unit.
    */
  private def writeAsFile(df: DataFrame, outDir: String, t: String): Unit = {
    val stage = new java.io.File(outDir, s"_stage_$t")
    df.coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
    val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      new java.io.File(outDir, s"$t.parquet").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    stage.listFiles().foreach(_.delete()); stage.delete(); ()
  }

  /** `only` restricts generation to the named tables (plus the fixed dims
    * when listed) — a decade-scale lifecycle audit needs only
    * documents+embeddings, and replicating lineitem ×100 to get them
    * would waste most of the wall-clock and disk. Default: everything.
    * NOTE: scale-up must always start from a DRIVER fixture dir — ids in
    * a ScaleGen output already span k·Stride offsets, so replicating a
    * replica would collide key ranges (the duplicate-id audit in
    * scalingMain catches it, but don't).
    */
  def generate(spark: SparkSession, srcDir: String, outDir: String,
               replicas: Int, only: Set[String] = Set.empty): Unit = {
    require(replicas >= 1 && replicas <= Int.MaxValue / 2 &&
      replicas.toLong * Stride > 0, s"bad replicas=$replicas")
    def wanted(t: String) = only.isEmpty || only(t)
    new java.io.File(outDir).mkdirs()
    for (t <- Seq("region", "nation") if wanted(t)) // fixed dims, one copy
      writeAsFile(spark.read.parquet(s"$srcDir/$t.parquet"), outDir, t)
    for ((t, rules) <- tableRules.toSeq.sortBy(_._1) if wanted(t)) {
      val src = spark.read.parquet(s"$srcDir/$t.parquet")
      val out = (0 until replicas).map(k => replica(src, k, rules))
        .reduce(_ unionByName _)
      writeAsFile(out, outDir, t)
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ScaleGen <srcDir> <outDir> [replicas] [table ...]")
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    val only = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors(), 32).toString)
    val spark = GraftSession.create(appName = "graft-scalegen",
      master = s"local[$cpus]", shufflePartitions =
        GraftSession.envShufflePartitions.orElse(Some(cpus.toInt)))
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, args(0), args(1), replicas, only)
    spark.stop()
  }
}
