package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Raw 60-bit md5 order key in [0, 2^60) — the sort key for deterministic
    * training-shuffle order ([[orderedRank]]). SQL-replicable:
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`.
    */
  def md5OrderKey(content: Column): Column =
    conv(substring(md5(content.cast("string")), 1, 15), 16, 10).cast("long")

  /** Key range of [[md5OrderKey]] keys — pass as `keyRange` to
    * [[orderedRank]] so a key already known to be uniform in [0, 2^60)
    * skips the min/max probe scan.
    */
  val Md5KeyRange: Option[(Long, Long)] = Some((0L, (1L << 60) - 1))

  /** (lo, width) of [[orderedRank]]'s range bucketing: width =
    * span/nBuckets + 1 over the supplied or probed key range, so the
    * occupied bucket count tracks nBuckets for ANY key scale (micros
    * scores and 60-bit hashes alike). The probe is a 1-row bounded
    * collect of (min, max) — one extra narrow column scan.
    */
  private[graft] def bucketBounds(df: DataFrame, orderCol: Column,
                                  nBuckets: Int,
                                  keyRange: Option[(Long, Long)]): (Long, Long, Long) = {
    def widthOf(mn: Long, mx: Long): Long = {
      require(mn <= mx, s"key range ($mn, $mx) must have min <= max")
      require(BigInt(mx) - BigInt(mn) <= BigInt(Long.MaxValue),
        s"key range ($mn, $mx) spans more than the long range")
      ((BigInt(mx) - BigInt(mn)) / nBuckets + 1).toLong
    }
    keyRange match {
      case Some((mn, mx)) => (mn, mx, widthOf(mn, mx))
      case None =>
        val r = df.select(orderCol.cast("long").as("__ork"))
          .agg(min(col("__ork")), max(col("__ork"))).head()
        if (r.isNullAt(0)) (0L, 0L, 1L)
        else (r.getLong(0), r.getLong(1), widthOf(r.getLong(0), r.getLong(1)))
    }
  }

  /** Deterministic global (or per-stratum) rank by an integer order key —
    * the "reproducible epoch shuffle" primitive: rank every example by
    * `hash(seed, content)` and you have a training order that is a pure
    * function of the corpus, independent of partitioning, cluster size and
    * engine version.
    *
    * A naive `row_number().over(Window.orderBy(key))` is a SINGLE-PARTITION
    * sort — the one shape that cannot survive 100 TB. This computes the
    * same rank with no global window:
    *
    *  1. range-bucket the key space — `(key − lo) DIV width` is monotone
    *     in the key (truncating division is monotone non-decreasing over
    *     the whole long range), so bucket order == key order;
    *  2. count rows per (stratum, bucket) — one partial-agg shuffle of
    *     counts, ≤ strata × nBuckets rows total;
    *  3. exclusive prefix-sum of the counts in bucket order — an indexed
    *     fold over each stratum's BOUNDED (bucket, count) list (≤ nBuckets
    *     entries, O(nBuckets²) adds), never a window over the data;
    *  4. rank = bucket offset + row_number within (stratum, bucket) — a
    *     window whose partitions are 1/nBuckets of a stratum each, so a
    *     hot stratum spreads over nBuckets sort partitions.
    *
    * The bucket width ADAPTS to the observed key range: by default a
    * 1-row (min, max) probe of `orderCol` sizes `width = span/nBuckets + 1`
    * (one extra narrow column scan; the collect is bounded at one row).
    * The previous static bit-shift (`key >> (keyBits − log2 nBuckets)`)
    * silently degenerated to ONE bucket — a single-partition sort per
    * stratum — whenever the real key range undershot the assumed
    * 2^keyBits width (micros-scale scores under a 2^42 assumption; the
    * round-5 advisory). Callers whose key range is known by construction
    * pass `keyRange` (e.g. [[Md5KeyRange]]) and skip the probe. Ranks are
    * identical under ANY monotone bucketing — only window parallelism
    * varies — so the choice is a pure performance knob.
    *
    * `tieBreak` makes the rank total when distinct rows share a key
    * (duplicate content). The offsets frame is broadcast — strata ×
    * nBuckets rows; for extreme stratum cardinality drop the hint and the
    * join degrades to a small shuffle, still never a global sort.
    */
  def orderedRank(df: DataFrame, strataCol: Column, orderCol: Column,
                  tieBreak: Column, nBuckets: Int = 1024,
                  keyRange: Option[(Long, Long)] = None,
                  out: String = "stratum_rank"): DataFrame = {
    require(nBuckets >= 1 && nBuckets <= (1 << 20),
      s"nBuckets=$nBuckets out of [1, 2^20]")
    val (lo, hi, width) = bucketBounds(df, orderCol, nBuckets, keyRange)
    // (clamp(key) − lo) DIV width — integer division, not double (a double
    // mantissa cannot hold 60-bit keys exactly). Keys OUTSIDE a supplied
    // keyRange are clamped into [lo, hi] FOR BUCKETING ONLY: raw
    // subtraction would wrap for a key more than 2^63 below a positive lo
    // and silently break bucket monotonicity; the clamp keeps bucket order
    // == key order for ANY long (out-of-range keys pile into the edge
    // buckets — a performance degradation, never a wrong rank, since
    // within-bucket ordering still uses the raw key).
    val bucketed = df
      .withColumn("__ork", orderCol)
      .withColumn("__os", strataCol)
      .withColumn("__ob", expr(
        s"(greatest(${lo}L, least(${hi}L, __ork)) - ${lo}L) DIV ${width}L"))
    val counts = bucketed.groupBy(col("__os"), col("__ob"))
      .agg(count(lit(1)).as("__oc"))
    // Exclusive prefix sum over the bounded aggregate: collect each
    // stratum's ≤ nBuckets (bucket, count) pairs and compute offsets with
    // an indexed-slice fold — group state is O(nBuckets), and unlike a
    // window ordered only by bucket this never plants an unpartitioned
    // WindowExec when the stratum is a constant (the global-rank case).
    val offsets = counts
      .groupBy(col("__os"))
      .agg(array_sort(collect_list(struct(col("__ob").as("b"), col("__oc").as("c"))))
        .as("__obs"))
      .select(col("__os"),
        explode(transform(col("__obs"), (x, i) => struct(
          x.getField("b").as("__ob"),
          aggregate(slice(col("__obs"), lit(1), i), lit(0L),
            (a, y) => a + y.getField("c")).as("__ooff")))).as("__oe"))
      .select(col("__os"), col("__oe.__ob"), col("__oe.__ooff"))
    val wInBucket = Window.partitionBy(col("__os"), col("__ob"))
      .orderBy(col("__ork").asc, tieBreak.asc)
    bucketed.join(broadcast(offsets), Seq("__os", "__ob"))
      .withColumn(out, col("__ooff") + row_number().over(wInBucket))
      .drop("__os", "__ob", "__ork", "__ooff")
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
  /** Deterministic importance (quality-weighted) downsampling: keep each
    * row with probability `keepProb`, decided by the row's own content
    * hash — a pure map-side filter, zero shuffle at any corpus size, and
    * a pure function of (content, keepProb): re-runs, engine versions and
    * partitionings all keep the same rows, so a curated corpus is exactly
    * reproducible. The temperature-sampling primitive of training-data
    * pipelines (keep high-quality documents with higher probability)
    * without an RNG anywhere.
    *
    * Cross-engine exactness: the keep test is
    * `md5bucket(content) < floor(keepProb · 10^6)` — for parity with an
    * external oracle build `keepProb` from EXACT BINARY arithmetic
    * (dyadic rationals, squares, sqrt), never libm pow/exp/ln whose
    * last-ulp rounding is engine-private.
    */
  def importanceSample(df: DataFrame, contentCol: Column,
                       keepProb: Column): DataFrame =
    df.filter(md5Bucket(contentCol, 1000000) <
      floor(keepProb * lit(1000000.0)).cast("long"))

  /** Deterministic mixture sampling to OUTPUT proportions: where
    * [[stratifiedSample]] takes per-stratum keep rates as given, this
    * computes them — "make the output 20% src0, 20% src1, rest spread
    * evenly, ~`outRows` rows total" — from the per-source counts, the way
    * a training-mix builder targets domain fractions of the FINAL corpus
    * (Gao et al., "The Pile", 2020, mixture weights) rather than of each
    * input.
    *
    * Per source s with n_s input rows and target output fraction f_s
    * (ppm), the keep threshold is `min(10^6, f_s · outRows DIV n_s)` over
    * 10^6 content-hash buckets — integer-exact, so the kept SET is a pure
    * function of (corpus, targets, outRows): no RNG, no partition or
    * cluster-size dependence, and growing `outRows` only ever adds rows
    * (thresholds are monotone in it). An undersupplied source (fewer rows
    * than its target) caps at keep-everything rather than inventing data —
    * the shortfall is visible to the caller as the achieved-vs-target gap.
    *
    * Plan shape: one configuration-sized count aggregate (≤ #sources
    * rows) broadcast back onto the corpus, then a map-only hash filter —
    * no corpus-sized shuffle at any scale. Requires
    * f_s · outRows < 2^63 / 10^6, i.e. outRows to ~9·10^12.
    */
  def mixtureSample(df: DataFrame, contentCol: Column, srcCol: Column,
                    targetPpm: Map[String, Long], defaultPpm: Long,
                    outRows: Long): DataFrame = {
    require(outRows >= 1L, s"outRows=$outRows must be >= 1")
    require((targetPpm.values.toSeq :+ defaultPpm)
        .forall(p => p >= 0L && p <= 1000000L),
      s"target ppm values must be in [0, 10^6]: $targetPpm default=$defaultPpm")
    val fPpm = targetPpm.toSeq.sortBy(_._1).foldLeft(lit(defaultPpm)) {
      case (acc, (s, p)) => when(srcCol === s, lit(p)).otherwise(acc)
    }
    val counts = df.groupBy(srcCol.as("__ms")).agg(count(lit(1)).as("__mn"))
    df.withColumn("__ms", srcCol)
      .join(broadcast(counts), Seq("__ms"))
      .withColumn("__mf", fPpm)
      // integer floor-div, not floor(a/b): a double cannot hold the
      // 10^6-scaled products exactly once outRows is large
      .withColumn("__mthr",
        least(lit(1000000L), expr(s"__mf * ${outRows}L DIV __mn")))
      .filter(md5Bucket(contentCol, 1000000) < col("__mthr"))
      .drop("__ms", "__mn", "__mf", "__mthr")
  }

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

  /** Next power of two ≥ n (n ≥ 1 → 1, 2, 4, 8, …) without libm:
    * `length(bin(n−1))` is ⌈log₂ n⌉ for n ≥ 2 (bin() renders a BIGINT
    * with no leading zeros in Spark AND DuckDB), and a left shift builds
    * the bucket — pure integer ops, bit-identical everywhere.
    */
  def pow2Ceil(n: Column): Column =
    when(n <= 1L, 1L)
      .otherwise(call_function("shiftleft", lit(1L),
        length(bin(n - 1)).cast("int")))

  /** Padding-efficiency report for length-bucketed training batches: every
    * sequence pads up to the next power-of-two token count (the standard
    * bucketed-batching scheme), and the report says — per stratum and
    * bucket — how many sequences land there and what fraction of the
    * padded tokens is waste (`10⁶·(padded − real) DIV padded` ppm, exact
    * integers end-to-end).
    *
    * Plan shape: one narrow projection (the bucket is a per-row integer
    * expression) plus one hash aggregation on (stratum, bucket) — the
    * grouped key space is tiny (≤ strata × 64 buckets for any length that
    * fits an int64), so this is a pure map-side-combine pass at 100 TB.
    *
    * Output: `(stratum, bucket_tokens, n_seqs, sum_tokens, padded_tokens,
    * waste_ppm)`.
    */
  def lengthBuckets(df: DataFrame, strataCol: Column,
                    nTokensCol: Column): DataFrame =
    df.select(strataCol.as("stratum"),
        nTokensCol.cast("long").as("nt"))
      .filter(col("nt") >= 1L)
      .withColumn("bucket_tokens", pow2Ceil(col("nt")))
      .groupBy(col("stratum"), col("bucket_tokens"))
      .agg(count(lit(1)).as("n_seqs"), sum(col("nt")).as("sum_tokens"))
      .withColumn("padded_tokens", col("n_seqs") * col("bucket_tokens"))
      .withColumn("waste_ppm",
        expr("CAST(1000000 * (padded_tokens - sum_tokens) DIV padded_tokens" +
          " AS BIGINT)"))

  /** Preference-pair construction for RLHF/DPO-style training: within each
    * prompt group, pair the highest-scored candidate (chosen) against the
    * lowest (rejected), with fully deterministic tie-breaks — chosen takes
    * the SMALLEST id among top scores, rejected the smallest id among
    * bottom scores — and a minimum score gap filter so near-ties produce
    * no pair.
    *
    * Scores are compared AND reported as `floor(score·10⁶)` longs (floor
    * is portable; round's tie modes are not) so the selected ids, the gap
    * filter and the reported columns are all derived from one integer
    * ordering — engine-exact, and never the "id from one ordering, score
    * from another" torn row.
    *
    * Plan shape: one hash aggregation on the group key — chosen/rejected
    * are `max/min(struct(...))` (tie fields negated as needed), never a
    * per-group window — then a row-local filter. One shuffle at any scale.
    *
    * Output: `(group, n_candidates, chosen_id, rejected_id, chosen_micros,
    * rejected_micros, gap_micros)`.
    */
  def preferencePairs(df: DataFrame, groupCol: Column, idCol: Column,
                      scoreCol: Column, minGapMicros: Long = 1L): DataFrame = {
    require(minGapMicros >= 1, s"minGapMicros=$minGapMicros must be >= 1")
    // the chosen-side tie-break negates the id inside max(struct(...));
    // unary minus on a non-numeric id null-casts under non-ANSI mode and
    // would silently NULL chosen_id — reject at plan time (schema-only
    // resolution, no job)
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = df.select(idCol).schema.head.dataType
    require(Set[org.apache.spark.sql.types.DataType](
        ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"idCol must be an integral type for the negated tie-break, got $idType")
    val rows = df.select(groupCol.as("group"), idCol.as("id"),
      floor(scoreCol.cast("double") * 1000000.0).cast("long").as("micros"))
    rows.groupBy(col("group"))
      .agg(count(lit(1)).as("n_candidates"),
        max(struct(col("micros"), (-col("id")).as("nid"))).as("top"),
        min(struct(col("micros"), col("id"))).as("bot"))
      .select(col("group"), col("n_candidates"),
        (-col("top.nid")).as("chosen_id"), col("bot.id").as("rejected_id"),
        col("top.micros").as("chosen_micros"),
        col("bot.micros").as("rejected_micros"),
        (col("top.micros") - col("bot.micros")).as("gap_micros"))
      .filter(col("n_candidates") >= 2L &&
        col("gap_micros") >= minGapMicros)
  }
}
