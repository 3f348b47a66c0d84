package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: the split a
  * document lands in is a pure function of its CONTENT hash — stable
  * across runs, partitionings, cluster sizes and engine versions, unlike
  * `randomSplit` (seed + partition dependent) or sampling by row position.
  * A document that appears twice lands in the same split twice, which is
  * what leakage-safe dedup-then-split pipelines want to detect, not hide.
  *
  * Two hash families:
  *  - [[hashBucket]]: xxhash64 — codegen'd, the fast path;
  *  - [[md5Bucket]]: md5-derived — slower, but replicable in external SQL
  *    engines (the oracle-checked path, same family as the winnowing /
  *    simhash md5 variants).
  */
object Sampling {

  /** Stable bucket in [0, buckets) from xxhash64 of the given columns. */
  def hashBucket(cols: Seq[Column], buckets: Int = 100, seed: Long = 42L): Column = {
    require(buckets >= 1, s"buckets=$buckets must be >= 1")
    pmod(xxhash64((lit(seed) +: cols): _*), lit(buckets.toLong))
  }

  /** Stable bucket in [0, buckets) from the first 60 bits of md5(content) —
    * SQL-replicable: `('0x' || substr(md5(x), 1, 15))::BIGINT % buckets`.
    */
  def md5Bucket(content: Column, buckets: Int = 100): Column = {
    require(buckets >= 1, s"buckets=$buckets must be >= 1")
    conv(substring(md5(content.cast("string")), 1, 15), 16, 10)
      .cast("long") % buckets
  }

  /** Deterministic stratified (domain-mixing) sampler: keep a row iff its
    * content-hash bucket falls below its stratum's target percentage. This
    * is how training-data pipelines hit domain-mix targets ("books at 50%,
    * generic web at 10%") reproducibly — the keep decision is a pure
    * function of (content, stratum rate): no RNG state, no partition or
    * cluster-size dependence, and raising a stratum's rate keeps every
    * previously kept row (buckets below the old threshold stay below the
    * new one), so incremental re-mixes are monotone. The rate map is
    * configuration-sized and compiles to a literal CASE chain (same
    * broadcast-literal pattern as the J5 config lookup); the whole operator
    * is a map-only filter — zero shuffle at any corpus size.
    */
  def stratifiedSample(df: DataFrame, contentCol: Column, strataCol: Column,
                       ratesPct: Map[String, Int], defaultPct: Int): DataFrame = {
    require((ratesPct.values.toSeq :+ defaultPct).forall(p => p >= 0 && p <= 100),
      s"stratum percentages must be in [0, 100]: $ratesPct default=$defaultPct")
    val pct = ratesPct.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (stratum, p)) => when(strataCol === stratum, lit(p)).otherwise(acc)
    }
    df.filter(md5Bucket(contentCol) < pct)
  }

  /** Greedy contiguous sequence packing: within each stratum (shard), rows
    * in `orderCol` order accumulate token counts, and a row's pack is the
    * bin its cumulative START offset falls into —
    * `floor((cumsum − tokens) / budget)`. Every pack except a stratum's
    * last holds ≥ `budget` tokens (a document may straddle its pack
    * boundary; the trainer's sequence slicer handles the overflow), and
    * the assignment is a pure function of (stratum, order, token counts) —
    * reshuffling partitions cannot move a document between packs.
    *
    * Scale shape: ONE window partitioned by the stratum column — there is
    * deliberately no global-order variant, because a total order over a
    * 100 TB corpus is a single-partition sort; shard first (source, date,
    * path prefix), pack within shards in parallel.
    */
  def packSequences(df: DataFrame, strataCol: Column, orderCol: Column,
                    tokenCol: Column, budget: Long): DataFrame = {
    require(budget >= 1L, s"budget=$budget must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(orderCol)
    df.withColumn("pack_id",
      floor((sum(tokenCol).over(w) - tokenCol) / lit(budget)).cast("long"))
  }

  /** Assemble each pack produced by [[packSequences]] into its training
    * sequence: documents concatenated with `sep` in `orderCol` order.
    * Group state is bounded by the pack budget (a pack holds ~budget
    * tokens by construction), so the collect is safe at any corpus size —
    * unlike a per-key document collect, the aggregation key count GROWS
    * with the corpus while each group stays O(budget).
    *
    * Ordering inside the aggregation uses the a3_fold trick:
    * `array_sort(collect_list(struct(order, text)))` — deterministic
    * under any partitioning because the sort runs on the final buffer.
    */
  def assemblePacks(packed: DataFrame, strataCol: Column, orderCol: Column,
                    textCol: Column, sep: String = "\n"): DataFrame =
    packed.groupBy(strataCol.as("stratum"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        concat_ws(sep,
          transform(
            array_sort(collect_list(struct(orderCol.as("o"), textCol.as("t")))),
            x => x.getField("t"))).as("seq_text"))

  /** train/val/test label from a bucket column: [0, trainPct) → train,
    * [trainPct, trainPct + valPct) → val, rest → test.
    */
  def splitLabel(bucket: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }
}
