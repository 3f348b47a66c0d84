package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Text-analysis operators for corpus curation: token statistics, quality
  * scoring, marker-word language identification, rolling-hash document
  * fingerprints. All built-in Catalyst expressions — one narrow projection
  * per document, no shuffle, embarrassingly parallel at 100 TB.
  */
object TextAnalysis {

  /** Token/character statistics + quality ratios per document. */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    df.withColumn("n_chars_m", length(col(textCol)))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_distinct_tokens", size(array_distinct(toks)))
      .withColumn("type_token_ratio",
        size(array_distinct(toks)).cast("double") / size(toks))
      .withColumn("avg_token_len",
        (length(col(textCol)) - size(toks) + 1).cast("double") / size(toks))
      .withColumn("stopword_ratio",
        TextFunctions.countIn(toks, TextFunctions.stopwordsEn).cast("double") / size(toks))
  }

  /** Marker-word profiles for language ID. The n-gram-profile method
    * (Cavnar-Trenkle style) degenerates to function-word counting at
    * word granularity; profiles are orderable so argmax is deterministic.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "es" -> Seq("el", "la", "de", "y", "que", "en"),
    "de" -> Seq("der", "die", "das", "und", "zu", "ist"))

  /** Language-ID scores + argmax prediction (ties break toward the earlier
    * profile, en > es > de).
    */
  def languageId(df: DataFrame, textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val scored = langProfiles.foldLeft(df) { case (acc, (lang, markers)) =>
      acc.withColumn(s"score_$lang", TextFunctions.countIn(toks, markers))
    }
    val Seq(en, es, de) = langProfiles.map { case (l, _) => col(s"score_$l") }
    scored.withColumn("predicted_lang",
      when(en >= es && en >= de, "en").when(es >= de, "es").otherwise("de"))
  }

  /** Gopher-style repetition/quality signals (Rae et al., "Scaling Language
    * Models: Methods, Analysis &amp; Insights from Training Gopher", 2021,
    * appendix A1.1): word-count and mean-word-length bounds plus duplicate
    * word-n-gram fractions, folded into a composite `keep_flag`. High
    * duplicate-n-gram fractions mark the degenerate repetition (boilerplate,
    * scraper loops, decoding artifacts) that survives exact dedup because
    * the documents differ globally. Narrow per-doc projection — a map-only
    * pass at any corpus size. Each n-gram array is evaluated a constant
    * number of times (size + distinct), so projection collapse costs O(len)
    * per reference, not the O(len²) generator-inlining trap winnowing hits.
    */
  def gopherQuality(df: DataFrame, textCol: String,
                    minWords: Int = 30, maxWords: Int = 100000,
                    maxDup2: Double = 0.05, maxDup3: Double = 0.02): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    // The duplicate fraction needs only COUNTS — total windows and distinct
    // n-grams — so the n-gram strings are never materialized: total falls
    // out of size(toks) and distinct is the length of the codegen'd sorted-
    // distinct shingle-hash sketch (one zero-allocation pass per doc, the
    // same ShingleHashes expression the MinHash path runs). Equating
    // hash-distinct with string-distinct carries the 2^-64-scale xxh64
    // collision risk the oracle-checked dedup_minhash query already
    // accepts; any collision is fixture-deterministic either way.
    def dupFrac(n: Int): Column = {
      val total = size(toks) - (n - 1)
      val distinct = size(graft.functions.ShingleFunctions
        .wordShingleHashes(toks, n))
      when(total > 0,
        lit(1.0) - distinct.cast("double") / total.cast("double"))
        .otherwise(lit(0.0))
    }
    df.withColumn("n_words", size(toks))
      .withColumn("mean_word_len",
        (length(col(textCol)) - size(toks) + 1).cast("double") / size(toks))
      .withColumn("dup_2gram_frac", dupFrac(2))
      .withColumn("dup_3gram_frac", dupFrac(3))
      .withColumn("keep_flag",
        (col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("dup_2gram_frac") <= maxDup2 &&
          col("dup_3gram_frac") <= maxDup3).cast("int"))
  }

  /** Exact corpus-level top-k most frequent word n-grams (heavy hitters for
    * boilerplate discovery / df-cut threshold picking). Explode → hash
    * aggregate: map-side partial aggregation means the one shuffle carries
    * (ngram, partial-count) pairs — vocabulary-sized, not corpus-sized —
    * and `orderBy.limit` plans as TakeOrdered (per-partition top-k, no
    * global sort). The (count desc, ngram asc) order is total, so top-k is
    * deterministic under ties.
    */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    df.select(explode(
        TextFunctions.wordNgrams(TextFunctions.tokens(col(textCol)), n))
        .as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram"))
      .limit(k)

  /** Collocation mining: adjacent token pairs ranked by pointwise mutual
    * information, with PMI kept integer-exact. The true score
    * log(c_xy·N / (c_x·c_y)) is monotone in its argument, so ranking by
    * the 10⁶-scaled integer ratio `c_xy·N·10⁶ DIV (c_x·c_y)` orders
    * identically to PMI with zero floating point — log's last-ulp
    * rounding differs across engines, integer DIV does not (same trick
    * as the log-free BM25 idf). Requires c_xy·N·10⁶ &lt; 2⁶³, i.e.
    * token streams to ~10⁵ per this scaling; larger corpora would rank
    * by the double ratio instead and keep the integer numerator and
    * denominator alongside for exact tie-breaks.
    *
    * Plan shape: two narrow explode+count aggregates (bigrams with
    * multiplicity, unigrams) plus a broadcast of the vocabulary-sized
    * unigram frame onto the bigram counts — nothing quadratic, no
    * joins over documents.
    *
    * Output: (bigram, c_xy, c_1, c_2, pmi_ppm), top k by
    * (pmi_ppm DESC, bigram), bigram count ≥ minCount.
    */
  def pmiBigrams(df: DataFrame, textCol: String, minCount: Long,
                 k: Int): DataFrame = {
    val toks = df.select(TextFunctions.tokens(col(textCol)).as("w"))
    val big = toks.select(explode(
      TextFunctions.wordNgrams(col("w"), 2)).as("bigram"))
    val bc = big.groupBy(col("bigram")).agg(count(lit(1)).as("c_xy"))
    val uni = toks.select(explode(col("w")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c_t"))
    val n = big.agg(count(lit(1)).as("n_big"))
    bc.filter(col("c_xy") >= minCount)
      .withColumn("w1", element_at(split(col("bigram"), " "), 1))
      .withColumn("w2", element_at(split(col("bigram"), " "), 2))
      .join(broadcast(uni.select(col("tok").as("w1"), col("c_t").as("c_1"))),
        Seq("w1"))
      .join(broadcast(uni.select(col("tok").as("w2"), col("c_t").as("c_2"))),
        Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("bigram"), col("c_xy"), col("c_1"), col("c_2"),
        expr("c_xy * n_big * 1000000L DIV (c_1 * c_2)").as("pmi_ppm"))
      .orderBy(col("pmi_ppm").desc, col("bigram"))
      .limit(k)
  }

  /** Rolling polynomial fingerprint per document (content-defined identity
    * that survives reformatting of surrounding fields).
    */
  def fingerprints(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      TextFunctions.rollingFingerprint(TextFunctions.tokens(col(textCol)))
        .as("rolling_fp"))

  /** Per-document bigram language-model fluency score, libm-free: each
    * bigram (x, y) contributes the 10⁶-scaled integer conditional
    * `count(x y) · 10⁶ DIV count(x ·)` — the corpus-estimated P(y|x) in
    * ppm — and a document scores the sum and mean of its bigram terms.
    * The usual per-token log-probability ranks documents identically
    * within the same length only through a monotone transform; this
    * variant is a DEFINED integer scoring (like the log-free BM25 idf
    * and PMI), in exchange for bit-reproducibility in any engine.
    * Low mean ⇒ improbable token transitions (gibberish, wrong-language,
    * boilerplate collisions) — the perplexity-style quality gate of a
    * curation pipeline without a model or a logarithm.
    *
    * The denominator counts x as a bigram PREFIX (not raw unigram
    * occurrences), so Σ_y P(y|x) = 1 exactly over the corpus. Both count
    * frames are vocabulary-sized and broadcast; scoring is one explode +
    * two broadcast joins + one per-doc aggregate.
    *
    * Output: (id, n_bigrams, lm_ppm_sum, lm_ppm_mean); documents with
    * fewer than 2 tokens score zeros.
    */
  def lmBigramScore(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val big = df.select(
      explode(TextFunctions.wordNgrams(toks, 2)).as("bigram"))
    val bc = big.groupBy(col("bigram")).agg(count(lit(1)).as("c_xy"))
    val pc = big
      .select(element_at(split(col("bigram"), " "), 1).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("c_x"))
    val scored = df
      .select(col(idCol).as("id"),
        explode(TextFunctions.wordNgrams(toks, 2)).as("bigram"))
      .join(broadcast(bc), Seq("bigram"))
      .join(broadcast(pc),
        element_at(split(col("bigram"), " "), 1) === col("x"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(expr("c_xy * 1000000L DIV c_x")).as("lm_ppm_sum"))
    df.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_ppm_sum"), lit(0L)).as("lm_ppm_sum"),
        coalesce(expr("lm_ppm_sum DIV n_bigrams"), lit(0L))
          .as("lm_ppm_mean"))
  }

  /** Per-document interpolated Kneser–Ney trigram fluency score with
    * INTEGER absolute discounting — the standard corpus-fluency filter of
    * a pretraining pipeline (Chen & Goodman 1999's interpolated KN with
    * continuation counts), kept libm-free by the same rational-arithmetic
    * discipline as [[lmBigramScore]]: the discount D = 3/4 enters as
    * `max(4c − 3, 0) / 4c` so every level is ONE integral division of
    * exact integers, and the whole score replays bit-for-bit in any
    * engine with 128-bit integers (DuckDB HUGEINT).
    *
    * With type/continuation counts over corpus trigrams (x y z):
    *   - p1_ppm(z)   = 10⁶·N1+(··z) DIV N1+(···)
    *   - p2_ppm(y,z) = (10⁶·max(4·N1+(·yz)−3, 0) + 3·N1+(y·)·p1_ppm(z))
    *                   DIV (4·N1+(·y·))
    *   - p3_ppm(x,y,z) = (10⁶·max(4·c(xyz)−3, 0) + 3·N1+(xy·)·p2_ppm(y,z))
    *                   DIV (4·c(xy·))
    * where N1+(·yz) = distinct left-extensions of (y,z), N1+(·y·) =
    * distinct trigram types with middle y (= Σ_z N1+(·yz), so each level
    * sums to ≤ 10⁶ over its continuations — a proper distribution up to
    * integer truncation), N1+(y·) / N1+(xy·) = distinct continuations of
    * y / (x,y), c(xy·) = Σ_z c(xyz). A document scores the sum and mean
    * of p3_ppm over its trigram INSTANCES; docs with < 3 tokens score
    * zeros. Low mean ⇒ improbable transitions even after backoff — the
    * perplexity gate without a model or a logarithm.
    *
    * Numerators route through DECIMAL(38,0): 10⁶·4·c stays exact to
    * c ≈ 10³¹ (a 100 TB corpus has c ≤ ~10¹³), mirrored by HUGEINT in
    * the oracle; all operands are non-negative so Spark's truncating DIV
    * and DuckDB's flooring `//` agree.
    *
    * Plan shape: one explode + one (x,y,z) count aggregate produces the
    * TYPE-level frame (vocabulary-cubed bounded, data-bounded in
    * practice; localCheckpoint'd — it feeds six derived aggregates, the
    * branch re-execution house rule), all interpolation joins run at
    * type level, and document scoring is ONE equi-join of the instance
    * explode against the per-type score frame plus a per-doc aggregate.
    * The only broadcast is the 1-row type total. Nothing is quadratic.
    *
    * Output: (id, n_trigrams, kn_ppm_sum, kn_ppm_mean).
    */
  def lmTrigramScore(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val inst = df.select(col(idCol).as("id"),
      explode(TextFunctions.wordNgrams(toks, 3)).as("tri"))
    val types = inst.groupBy(col("tri")).agg(count(lit(1)).as("c3"))
      .select(col("tri"),
        element_at(split(col("tri"), " "), 1).as("x"),
        element_at(split(col("tri"), " "), 2).as("y"),
        element_at(split(col("tri"), " "), 3).as("z"),
        col("c3"))
      .localCheckpoint(true)
    val totalTypes = types.agg(count(lit(1)).as("n_types"))
    val uniCont = types.groupBy(col("z"))
      .agg(count(lit(1)).as("n1_end"))
      .crossJoin(broadcast(totalTypes))
      .select(col("z"),
        expr("CAST(1000000L AS DECIMAL(38,0)) * n1_end DIV n_types")
          .as("p1_ppm"))
    val cont = types.groupBy(col("y"), col("z"))
      .agg(count(lit(1)).as("n1_yz"))
    val mid = types.groupBy(col("y"))
      .agg(count(lit(1)).as("n1_mid"),
        count_distinct(col("z")).as("n1_fy"))
    val p2 = cont
      .join(mid, Seq("y"))
      .join(uniCont, Seq("z"))
      .select(col("y"), col("z"),
        // cast the COUNT to DECIMAL before the ×10⁶ scale-up: a BIGINT
        // pre-multiply would wrap silently under non-ANSI Spark once the
        // count passes ~9.2e12 (a 100 TB corpus reaches ~1e13 trigram
        // instances), while the DuckDB oracle multiplies in HUGEINT
        expr("""CAST(greatest(4L * n1_yz - 3L, 0L) AS DECIMAL(38,0)) * 1000000
                   + CAST(3L AS DECIMAL(38,0)) * n1_fy * p1_ppm""")
          .as("num2"),
        col("n1_mid"))
      .select(col("y"), col("z"),
        expr("num2 DIV (4L * n1_mid)").as("p2_ppm"))
    val prefix = types.groupBy(col("x"), col("y"))
      .agg(sum(col("c3")).as("c_xy"),
        count(lit(1)).as("n1_fxy"))
    val p3 = types
      .join(p2, Seq("y", "z"))
      .join(prefix, Seq("x", "y"))
      .select(col("tri"),
        // DECIMAL-first for the same overflow reason as num2 above
        expr("""(CAST(greatest(4L * c3 - 3L, 0L) AS DECIMAL(38,0)) * 1000000
                   + CAST(3L AS DECIMAL(38,0)) * n1_fxy * p2_ppm)
                 DIV (4L * c_xy)""").as("p3_ppm"))
    val scored = inst.join(p3, Seq("tri"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(col("p3_ppm")).as("kn_ppm_sum"))
    df.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("kn_ppm_sum"), lit(0L)).as("kn_ppm_sum"),
        coalesce(expr("kn_ppm_sum DIV n_trigrams"), lit(0L))
          .as("kn_ppm_mean"))
  }

  /** Top-k keywords per document by tf·idf with the idf kept as the RAW
    * scaled ratio `(N·10⁶) DIV df` instead of the textbook log(N/df) —
    * the same libm-free discipline as the BM25 RSJ idf: the scoring is a
    * defined integer variant (rankings can differ from the log form
    * where a very rare term competes with a very frequent one), and in
    * exchange every score is an exact integer, reproducible bit-for-bit
    * in any engine. Bound: tf · N · 10⁶ must stay under 2⁶³ (N to ~10¹⁰
    * at tf ≤ 10³; shard or reduce the scale beyond).
    *
    * Plan shape: one (doc, term) count aggregate; the df frame is
    * vocabulary-sized and broadcast; top-k per doc is a window
    * partitioned by doc id (bounded by the doc's distinct terms).
    *
    * Output: (id, rank, term, tf, score), rank 1..k per document.
    */
  def topKeywords(df: DataFrame, textCol: String, idCol: String,
                  k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val tf = df
      .select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("score").desc, col("term"))
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", expr("tf * ((n_docs * 1000000L) DIV df)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tf"), col("score"))
  }

  /** Corpus-level total-variation distance between two splits' token
    * distributions — the drift summary that needs no logarithm (PSI and
    * KL do, and libm is not bit-reproducible across engines):
    * TV = ½ Σ_t |p_t − q_t|, computed over the common denominator as the
    * INTEGER Σ_t |n_a(t)·N_b − n_b(t)·N_a| (order-independent, exact),
    * with one final double division. Complements the per-token
    * chi-square report ([[tokenDriftReport]]) with a single bounded
    * [0, 1] number for alerting. Two narrow aggregates (token counts,
    * totals) + a broadcast of the 1-row totals — no corpus-sized join.
    * Integer bound: token count × other split's total must stay under
    * 2⁶³ (~3·10⁹ tokens per split at worst-case concentration); shard
    * the corpus (per source/day) before the comparison beyond that.
    *
    * Output (one row): n_a_total, n_b_total, tv_num (the scaled integer
    * numerator), tv = tv_num / (2·N_a·N_b).
    */
  def tvDistance(df: DataFrame, textCol: String, splitCol: String,
                 a: String, b: String): DataFrame = {
    val tok = df.filter(col(splitCol).isin(a, b))
      .select(col(splitCol).as("__sp"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
    val cnt = tok.groupBy(col("token"))
      .agg(sum(when(col("__sp") === a, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__sp") === b, 1L).otherwise(0L)).as("n_b"))
    val tot = cnt.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
    cnt.crossJoin(broadcast(tot))
      .agg(sum(abs(col("n_a") * col("tb") - col("n_b") * col("ta")))
          .as("tv_num"),
        max(col("ta")).as("n_a_total"), max(col("tb")).as("n_b_total"))
      .select(col("n_a_total"), col("n_b_total"), col("tv_num"),
        (col("tv_num").cast("double") /
          (col("n_a_total") * col("n_b_total") * lit(2L)).cast("double"))
          .as("tv"))
  }

  /** Fixed-size token-window chunking with overlap — the RAG-ingestion /
    * context-window-packing splitter: document → chunks of `window`
    * tokens starting every `stride` tokens (overlap = window − stride).
    * Chunk starts are 1, 1+stride, …, the last start chosen so the tail
    * is covered: start ≤ n − window + stride, hence only the final chunk
    * can be short, and a document shorter than `window` yields exactly
    * one chunk. Requires stride ≤ window (no token is ever skipped).
    *
    * Narrow explode-only projection — rows fan out by ~n/stride with no
    * shuffle, so the operator is a map-only pass at any corpus size; the
    * chunk id is derived from the start offset ((start−1)/stride), not
    * an order-dependent counter, so output is partitioning-independent.
    *
    * Output: one row per chunk (id, chunk_idx, n_chunk_tokens,
    * chunk_text).
    */
  def tokenChunks(df: DataFrame, textCol: String, idCol: String,
                  window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window=$window must be >= 1")
    require(stride >= 1 && stride <= window,
      s"stride=$stride out of [1, window=$window]")
    val toks = TextFunctions.tokens(col(textCol))
    df.select(col(idCol).as("id"), toks.as("__toks"))
      .select(col("id"), col("__toks"),
        explode(sequence(lit(1),
          greatest(size(col("__toks")) - (window - stride), lit(1)),
          lit(stride))).as("__start"))
      .select(col("id"),
        ((col("__start") - 1) / stride).cast("int").as("chunk_idx"),
        slice(col("__toks"), col("__start"), lit(window)).as("__chunk"))
      .select(col("id"), col("chunk_idx"),
        size(col("__chunk")).as("n_chunk_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }

  /** Email/phone patterns for PII scrubbing. Both stay inside the regex
    * subset shared by Java's engine (Spark) and RE2 (external engines), so
    * the operator is oracle-replicable: character classes, bounded repeats,
    * no backreferences or lookaround.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII redaction pass: counts and masks email addresses and NNN-NNN-NNNN
    * phone numbers. Emails are replaced first (a phone-shaped digit run
    * inside an email local part must count as email, not phone). Narrow
    * map-only projection — codegen'd regexp over each document, no
    * shuffle, linear in corpus bytes.
    */
  def piiRedact(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", size(regexp_extract_all(t, lit(emailPattern), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(t, lit(phonePattern), lit(0))))
      .withColumn("redacted",
        regexp_replace(regexp_replace(t, emailPattern, "<EMAIL>"),
          phonePattern, "<PHONE>"))
  }

  /** BM25-family relevance of each document against a fixed term set
    * (Robertson &amp; Zaragoza, "The Probabilistic Relevance Framework:
    * BM25 and Beyond", 2009). Two passes: one global aggregate computes
    * (N, Σdl, df_t per term) — a single reduced row, broadcast back via
    * crossJoin — then a map-only projection scores every document; no
    * per-document shuffle at any corpus size.
    *
    * Deviation, by design: the idf factor is the RAW Robertson-Spärck
    * Jones odds `(N − df + 0.5) / (df + 0.5)` WITHOUT the usual ln().
    * Rankings are identical (ln is monotone) but ln is not bit-reproducible
    * across engines, and this engine's correctness gate hash-compares
    * doubles; +, ×, / are IEEE-exact, so the log-free form is.
    */
  def bm25(df: DataFrame, textCol: String, idCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one term")
    val toks = TextFunctions.tokens(col(textCol))
    val dl = size(toks)
    val statCols =
      count(lit(1)).cast("double").as("n_docs") ::
      (sum(size(toks)).cast("double") /
        count(lit(1)).cast("double")).as("avgdl") ::
      terms.toList.map(t =>
        sum(array_contains(toks, t).cast("long")).cast("double")
          .as(s"df_${t}"))
    val stats = df.agg(statCols.head, statCols.tail: _*)
    val scored = df.crossJoin(broadcast(stats))
    val score = terms.map { t =>
      val tf = size(filter(toks, x => x === t)).cast("double")
      val idf = (col("n_docs") - col(s"df_${t}") + 0.5) / (col(s"df_${t}") + 0.5)
      idf * ((tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl.cast("double") / col("avgdl"))))
    }.reduce(_ + _)
    scored.select(col(idCol).as("id"), score.as("bm25"))
  }

  /** Multi-query BM25 retrieval: for each query (a set of terms), the
    * top-`k` documents by summed per-term BM25 — the relational form of
    * an inverted-index search, and the sparse half of a hybrid (BM25 +
    * dense) retrieval stack ([[Retrieval.rrfFuse]] merges the two).
    *
    * Unlike [[bm25]] (fixed term set, one score column per document),
    * scores here are summed across JOINED (doc, term) rows, so double
    * addition order would be partition-dependent. Instead each per-term
    * score is an exact INTEGER: with k1 = 6/5, b = 3/4, T = Σdl, N = #docs,
    * {{{ score·scale = scale · 22·tf·T·(2N − 2df + 1)
    *                   DIV (10·tf·T + 3·T + 9·dl·N)·(2df + 1) }}}
    * — the textbook formula multiplied through by its denominators
    * (10·T and 2df + 1), carried in DECIMAL(38,0). Integer sums are
    * order-independent, so the result is bit-stable under any
    * partitioning and replays exactly in external SQL (HUGEINT there).
    *
    * Shape: one tokenize + explode pass keeps only query-term tokens
    * (the posting list), one hash shuffle to (doc, term) tf counts, term
    * dfs and corpus totals broadcast back, per-query top-k via a window
    * partitioned by query_id. No global sort; posting volume, not corpus
    * size, drives the shuffle.
    *
    * `queries`: a small (query_id, term) frame — broadcast. Output:
    * `(query_id, doc_id, rank, score_scaled)`, ranks 1..k by
    * (score desc, doc_id).
    */
  def searchTopK(df: DataFrame, textCol: String, idCol: String,
                 queries: DataFrame, k: Int,
                 scale: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val d38 = "DECIMAL(38,0)"
    val toks = TextFunctions.tokens(col(textCol))
    val terms = queries.select(col("term")).distinct()
    val corpus = df.select(col(idCol).as("doc_id"), toks.as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("long"))
    // one reduced row: N and Σdl
    val totals = corpus.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    // posting list: only tokens that are query terms survive the explode
    val postings = corpus
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .join(broadcast(terms), Seq("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(max(col("dl")).as("dl"), count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfreq = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df_t"))
    val scored = postings
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(totals))
      .withColumn("score_t", expr(
        s"""CAST((CAST($scale AS $d38) * 22 * tf * sum_dl *
           |        (2 * n_docs - 2 * df_t + 1))
           |     DIV (CAST(10 AS $d38) * tf * sum_dl + 3 * sum_dl +
           |          9 * dl * n_docs)
           |     DIV (2 * df_t + 1) AS BIGINT)""".stripMargin))
      .join(broadcast(queries.select(col("query_id"), col("term"))),
        Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("score_t")).as("score_scaled"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_scaled").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"),
        col("score_scaled"))
  }

  /** Greedy longest-match segmentation statistics per document — the
    * row-local fast path: one codegen'd
    * [[graft.functions.MaxMatchStats]] pass, a narrow projection with no
    * shuffle. Same semantics (code-point positions, longest piece, 1-cp
    * fallback) as [[maxMatchSegmentsSharded]]; TextSamplingSpec proves
    * the two implementations identical row-for-row.
    */
  def maxMatchSegments(df: DataFrame, textCol: String, idCol: String,
                       vocab: Seq[String],
                       maxPieceLen: Int = 8): DataFrame =
    df.filter(length(col(textCol)) > 0)
      .select(col(idCol).as("id"),
        graft.functions.MaxMatchFunctions
          .maxMatchStats(col(textCol), vocab, maxPieceLen).as("__mm"))
      .select(col("id"), col("__mm.n_pieces").as("n_pieces"),
        col("__mm.n_fallback").as("n_fallback"))

  /** Greedy longest-match (MaxMatch / WordPiece-inference) segmentation
    * under a fixed vocabulary, WITHOUT a per-document sequential scan:
    * the greedy walk is a functional graph `pos → pos + step(pos)`
    * (step = longest vocab piece starting at pos, else 1 = fallback),
    * and the set of segmentation cuts is the chain from position 0 —
    * computed by PARALLEL POINTER DOUBLING (the classic list-ranking
    * construction): `doublingRounds` rounds of self-joins square the
    * jump table `next^(2^k)` and double the reached prefix, so a
    * document of length L needs ⌈log₂ L⌉ rounds of hash joins instead
    * of an O(L) driver- or row-local loop. Every stage is an equi-join
    * or aggregate partitioned by doc id — a single giant sequence
    * sharded across executors segments the same way.
    *
    * `2^doublingRounds` bounds the supported piece-chain length (12 ⇒
    * 4096 pieces/doc); longer docs segment their first 2^rounds pieces.
    * Vocabulary is broadcast; `maxPieceLen` bounds the per-position
    * candidate explode (positions × maxPieceLen rows).
    *
    * Output: `(id, n_pieces, n_fallback)` — fallback = positions
    * covered by the 1-char escape because no vocab piece matched.
    *
    * This is the SHARDED-SEQUENCE path — use it when one logical
    * sequence spans many rows. For ordinary row-sized documents,
    * [[maxMatchSegments]] computes the identical result in one
    * codegen'd pass at a fraction of the cost (measured 49 s → <1 s on
    * the sf0.1 corpus).
    */
  def maxMatchSegmentsSharded(df: DataFrame, textCol: String, idCol: String,
                              vocab: Seq[String], maxPieceLen: Int = 8,
                              doublingRounds: Int = 12): DataFrame = {
    require(vocab.nonEmpty, "maxMatchSegments needs a vocabulary")
    require(vocab.forall(p => p.nonEmpty && p.length <= maxPieceLen),
      s"every vocab piece must be 1..$maxPieceLen chars")
    require(doublingRounds >= 1 && doublingRounds <= 20,
      s"doublingRounds=$doublingRounds out of [1, 20]")
    val spark = df.sparkSession
    import spark.implicits._
    val vdf = broadcast(vocab.toDF("piece"))
    val docs = df
      .select(col(idCol).as("id"), col(textCol).as("t"),
        length(col(textCol)).as("len"))
      .filter(col("len") > 0)
      .localCheckpoint(true) // feeds positions, the walk seed, and the agg
    val posn = docs.select(col("id"), col("len"), col("t"),
      explode(sequence(lit(0), col("len") - 1)).as("pos"))
    val cand = posn
      .select(col("id"), col("len"), col("t"), col("pos"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), col("len") - col("pos")))).as("l"))
      .join(vdf, expr("substring(t, pos + 1, l)") === col("piece"))
      .groupBy(col("id"), col("pos")).agg(max(col("l")).as("step"))
    val nxt = posn.select(col("id"), col("pos"))
      .join(cand, Seq("id", "pos"), "left")
      .select(col("id"), col("pos"),
        (col("pos") + coalesce(col("step"), lit(1))).as("nxt"),
        col("step").isNotNull.as("matched"))
      .localCheckpoint(true)
    var jump = nxt.select(col("id"), col("pos"), col("nxt"))
    var reach = docs.select(col("id"), lit(0).as("pos"))
    for (_ <- 1 to doublingRounds) {
      reach = reach.unionByName(
          reach.join(jump, Seq("id", "pos"))
            .select(col("id"), col("nxt").as("pos")))
        .distinct().localCheckpoint(true)
      // next^(2^k) ∘ next^(2^k); the chain end (nxt = len, no jump row)
      // stays absorbing through the left join's coalesce
      val hop = jump.select(col("id").as("__bid"), col("pos").as("__bpos"),
        col("nxt").as("__bnxt"))
      jump = jump
        .join(hop, col("id") === col("__bid") && col("nxt") === col("__bpos"),
          "left")
        .select(col("id"), col("pos"),
          coalesce(col("__bnxt"), col("nxt")).as("nxt"))
        .localCheckpoint(true)
    }
    reach.join(nxt, Seq("id", "pos")) // cuts at pos < len only (nxt keys)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_pieces"),
        sum(when(!col("matched"), 1L).otherwise(0L)).as("n_fallback"))
  }

  /** Winnowed document fingerprints (Schleimer, Wilkerson &amp; Aiken,
    * "Winnowing: local algorithms for document fingerprinting", SIGMOD
    * 2003): hash every char `k`-gram, then keep the minimum hash of each
    * sliding window of `w` consecutive hashes. Guarantee: any shared
    * substring of length ≥ w + k − 1 contributes at least one common
    * fingerprint; density ≈ 2/(w+1) of the k-gram count.
    *
    * The hash family is md5-derived (first 60 bits), deliberately
    * SQL-replicable so the whole operator — and the overlap join built on
    * it — is oracle-checked in DuckDB. Returns (id, fps: sorted distinct
    * array&lt;bigint&gt;); docs shorter than k + w − 1 chars produce no row.
    * Narrow projection, no shuffle.
    */
  def winnowedFingerprints(df: DataFrame, textCol: String, idCol: String,
                           k: Int = 8, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"k=$k and w=$w must be >= 1")
    df.filter(length(col(textCol)) >= k + w - 1)
      .select(col(idCol).as("id"),
        graft.functions.WinnowFunctions
          .winnowedMd5Fingerprints(col(textCol), k, w).as("fps"))
      // Materialize the sketch at the operator boundary: downstream
      // consumers reference `fps` repeatedly (explode for the overlap join,
      // several stat columns), and Catalyst's projection collapse would
      // otherwise inline the hash pipeline into each reference. The frame
      // is the fingerprint index (≈ 2·len/(w+1) longs per doc); at
      // petabyte scale persist it to disk instead.
      .localCheckpoint(true)
  }

  /** Near-dup pairs by winnowed-fingerprint overlap: explode fingerprints,
    * equi-join on the fingerprint value, count shared per pair. Shuffle key
    * is the 64-bit fingerprint — the same sub-quadratic bucketed-join shape
    * as MinHash banding (a pair is compared once per SHARED fingerprint,
    * never all-pairs).
    *
    * `maxDocFreq` is the skew guard: a boilerplate fingerprint present in
    * d documents contributes d·(d−1)/2 join rows (measured: one hot
    * fingerprint in 3.4k of 5k fixture docs ⇒ 5.7M pairs on its own), and
    * carries no near-dup signal — the classic df-cut on posting lists.
    * Dropped fingerprints lower `n_shared` for pairs that relied on them,
    * so the cut is part of the operator's contract (the oracle applies the
    * identical cut).
    */
  /** Token-distribution drift between two corpus slices (train vs val,
    * yesterday vs today, source A vs source B): per-token occurrence
    * counts in each slice plus that token's chi-square contribution
    * against the pooled expectation. A skewed term surfaces immediately
    * (large `chi2_term`); the caller sums the column for the global
    * statistic or sorts by it for a "what changed" report.
    *
    * Determinism: the per-token term is a FIXED-ORDER +,×,/ expression
    * over exact integer counts, so it is IEEE-bit-reproducible across
    * engines (the text_bm25 trick) — unlike a cross-token sum of doubles,
    * whose accumulation order shuffles. That is why the operator reports
    * terms, not the summed statistic.
    *
    * Shape: one (slice, token) hash aggregation, a 1-row totals aggregate
    * broadcast back, then map-only arithmetic — two shuffles total, no
    * window, no driver loop.
    */
  def tokenDriftReport(df: DataFrame, textCol: String, sliceCol: String,
                       sliceA: String, sliceB: String): DataFrame = {
    val tok = df
      .filter(col(sliceCol) === sliceA || col(sliceCol) === sliceB)
      .select(col(sliceCol).as("slice"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
    val cnt = tok.groupBy(col("token")).agg(
      sum(when(col("slice") === sliceA, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("slice") === sliceB, 1L).otherwise(0L)).as("n_b"))
    val totals = cnt.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
    val ca = col("n_a").cast("double"); val cb = col("n_b").cast("double")
    val ta = col("ta").cast("double"); val tb = col("tb").cast("double")
    val ea = (ca + cb) * ta / (ta + tb)
    val eb = (ca + cb) * tb / (ta + tb)
    cnt.crossJoin(broadcast(totals))
      .select(col("token"), col("n_a"), col("n_b"),
        ((ca - ea) * (ca - ea) / ea + (cb - eb) * (cb - eb) / eb)
          .as("chi2_term"))
  }

  /** Inverted index (token → posting list) with a document-frequency cap
    * on posting materialization: every token gets its exact `df`, but the
    * sorted posting array is only collected for tokens whose df is at most
    * `maxPostingDf` — beyond that a token is effectively a stopword, its
    * posting list is O(corpus) large, and `collect_list` on it is the
    * single-hot-key failure mode of index builds at scale. Capped tokens
    * keep `postings = NULL` rather than a silently truncated list.
    *
    * Shape: one distinct (token, id) shuffle, then one hash aggregation —
    * df comes from the same aggregation that builds the postings, not a
    * second pass.
    */
  def invertedIndex(df: DataFrame, terms: Column, idCol: String,
                    maxPostingDf: Long = 10000L): DataFrame = {
    // the posting frame feeds TWO corpus-wide aggregations (df table,
    // posting lists) — materialize the explode once (r15); this is the
    // same two-consumer checkpoint every other posting operator carries
    val pairs = df.select(col(idCol).as("id"),
        explode(array_distinct(terms)).as("token"))
      .localCheckpoint(true)
    // dfs is referenced twice (hot set + final join) — materialize the
    // vocabulary-sized frame once or Catalyst re-runs the corpus explode +
    // count aggregation for each reference (verified in the plan: three
    // full scans without this). Vocabulary rows, not corpus rows: for a
    // 100 TB corpus this is the distinct-term table, which is what any
    // index build must hold anyway.
    val dfs = pairs.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .localCheckpoint(true)
    // stopword tokens (df over the cap) are anti-joined away BEFORE the
    // collect aggregation ever buffers them — the cut must happen on the
    // input side, a post-hoc NULL-out would still build the hot lists
    val hot = dfs.filter(col("df") > maxPostingDf).select(col("token"))
    val postings = pairs.join(broadcast(hot), Seq("token"), "left_anti")
      .groupBy(col("token"))
      .agg(sort_array(collect_list(col("id"))).as("postings"))
    dfs.join(postings, Seq("token"), "left")
      .select(col("token"), col("df"), col("postings"))
  }

  /** Exact sparse cosine-similarity join over term-frequency vectors:
    * pairs meet ONLY through shared terms (equi-join on term — the sparse
    * dot product), never as an all-pairs product, with the df-cut dropping
    * boilerplate terms before the self-join exactly as the winnow/CDC
    * overlap joins do. Unlike MinHash this is EXACT cosine, and unlike
    * embedding cosine it needs no model — the classic sparse-vector
    * similarity join (Bayardo et al., "Scaling up all pairs similarity
    * search", WWW 2007, in its plain df-cut form).
    *
    * Determinism across engines: dots and squared norms are INTEGER sums
    * (order-independent under any partitioning); sqrt is IEEE-correctly
    * rounded in both JVM and DuckDB; the final divide is one double op —
    * so the cosine hash-matches bit-for-bit. Norms are computed over the
    * same df-cut vectors the join uses.
    */
  def tfCosinePairs(df: DataFrame, terms: Column, idCol: String,
                    threshold: Double, maxDocFreq: Long = 10000L): DataFrame = {
    val tf = df.select(col(idCol).as("id"), explode(terms).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
      // consumed three times (df-cut, norms, pair join) — materialize the
      // term-vector table once; it is the corpus's sparse representation,
      // ~tokens-per-doc rows per doc
      .localCheckpoint(true)
    val hot = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq).select(col("term"))
    val tfc = tf.join(broadcast(hot), Seq("term"), "left_anti")
    val nrm = tfc.groupBy(col("id"))
      .agg(sqrt(sum(col("tf") * col("tf")).cast("double")).as("nrm"))
    val dots = tfc.alias("a").join(tfc.alias("b"),
        col("a.term") === col("b.term") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_1"), col("b.id").as("id_2"))
      .agg(sum(col("a.tf") * col("b.tf")).as("dot"))
    dots
      .join(nrm.select(col("id").as("id_1"), col("nrm").as("n1")), "id_1")
      .join(nrm.select(col("id").as("id_2"), col("nrm").as("n2")), "id_2")
      .withColumn("cosine", col("dot").cast("double") / (col("n1") * col("n2")))
      .filter(col("cosine") >= threshold)
      .select(col("id_1"), col("id_2"), col("cosine"))
  }

  /** Per-document term-rarity statistics from corpus-wide document
    * frequencies: how many distinct terms the doc carries, the min/max df
    * among them, and how many are "rare" (df ≤ `rareDf`) — the
    * integer-exact core of rarity-based quality scoring (a doc made of
    * corpus-rare terms is either specialist gold or gibberish; either way
    * a pipeline wants it surfaced). All aggregates are integer min/max/
    * count — order-independent under any partitioning.
    *
    * Scale shape: one explode + term-keyed count (the df table is
    * vocabulary-sized — the same table an index build must hold), one
    * shuffle join of (id, term) pairs back on term, one per-doc aggregate.
    * Docs with no terms survive via the final left join with zero counts.
    */
  def tokenRarity(df: DataFrame, terms: Column, idCol: String,
                  rareDf: Long = 2L): DataFrame = {
    require(rareDf >= 1L, s"rareDf=$rareDf must be >= 1")
    // consumed twice (df table + per-doc stats join) — materialize the
    // sparse (id, term) table once instead of running the explode twice;
    // it is the corpus's distinct-term representation, the artifact an
    // index build persists anyway. The df attach is a partial-agg +
    // broadcast join-back (dfs is vocabulary-sized): round 14's fused
    // count().over(partitionBy(token)) window was measurably slower on
    // both boxes — it shuffles the full posting frame by the Zipf-hot
    // token key (a §2.5 straggler at corpus scale) where this shape
    // combines map-side and broadcasts the tiny df table. Reverted (r15).
    val pairs = df.select(col(idCol).as("id"),
        explode(array_distinct(terms)).as("token"))
      .localCheckpoint(true)
    val dfs = pairs.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val stats = pairs.join(dfs, Seq("token"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_terms"),
        min(col("df")).as("min_term_df"),
        max(col("df")).as("max_term_df"),
        sum(when(col("df") <= rareDf, 1L).otherwise(0L)).as("n_rare_terms"))
    df.select(col(idCol).as("id"))
      .join(stats, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        col("min_term_df"), col("max_term_df"),
        coalesce(col("n_rare_terms"), lit(0L)).as("n_rare_terms"))
  }

  /** Content-defined chunk index: (id, chunks: array&lt;struct&lt;start,
    * len, hash&gt;&gt;) per document — see [[graft.functions.CdcHash]] for
    * the boundary rule and why chunk fingerprints survive insertions that
    * shift every downstream offset. Narrow map-only projection; the sketch
    * is ~len/2^maskBits entries per doc (vs O(len) for shingle families).
    */
  def cdcChunkIndex(df: DataFrame, textCol: String, idCol: String,
                    w: Int = 16, maskBits: Int = 5): DataFrame =
    df.filter(length(col(textCol)) >= 1)
      .select(col(idCol).as("id"),
        graft.functions.ChunkFunctions
          .cdcChunks(col(textCol), w, maskBits).as("chunks"))
      // materialized at the operator boundary for the same CollapseProject
      // reason as winnowedFingerprints: downstream explodes + per-chunk
      // stats would otherwise each inline the full chunking pass
      .localCheckpoint(true)

  /** Near-dup / containment pairs by shared content-defined chunks:
    * explode the chunk index, drop low-entropy chunks shorter than
    * `minChunkLen` (a chunk shorter than the hash window carries little
    * content), df-cut boilerplate chunks present in more than `maxDocFreq`
    * docs (identical skew math to [[winnowNearDups]]), distinct (doc,
    * hash), then count distinct shared chunk hashes per pair via a
    * hash-partitioned equi-join on the 64-bit chunk fingerprint.
    *
    * Unlike winnow overlap (every shared k-gram window), a shared CDC
    * chunk certifies a shared contiguous run of ~2^maskBits characters —
    * `n_shared · E[chunk]` approximates the shared byte volume, which is
    * the quantity block-level dedup storage systems bill by.
    */
  def cdcNearDups(df: DataFrame, textCol: String, idCol: String,
                  minShared: Long, w: Int = 16, maskBits: Int = 5,
                  minChunkLen: Int = 16, maxDocFreq: Long = 1000L): DataFrame = {
    val e0 = cdcChunkIndex(df, textCol, idCol, w, maskBits)
      .select(col("id"), explode(col("chunks")).as("c"))
      .filter(col("c.len") >= minChunkLen)
      .select(col("id"), col("c.hash").as("fp"))
      .distinct()
    val hot = e0.groupBy(col("fp"))
      .agg(count(lit(1)).as("d"))
      .filter(col("d") > maxDocFreq)
      .select(col("fp"))
    val pruned = e0.join(broadcast(hot), Seq("fp"), "left_anti")
    pruned.alias("a").join(pruned.alias("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_1"), col("b.id").as("id_2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  def winnowNearDups(df: DataFrame, textCol: String, idCol: String,
                     minShared: Long, k: Int = 8, w: Int = 4,
                     maxDocFreq: Long = 1000L): DataFrame = {
    // A pair needs >= minShared SHARED fingerprints, so a doc with fewer
    // than minShared fingerprints in total can never appear in the output —
    // drop it before the explode. Exact (the df-cut below only shrinks
    // counts further); on short-doc-heavy corpora this removes most of the
    // exploded posting list.
    val f = winnowedFingerprints(df, textCol, idCol, k, w)
      .filter(size(col("fps")) >= minShared)
      .select(col("id"), explode(col("fps")).as("fp"))
    val hot = f.groupBy(col("fp"))
      .agg(count(lit(1)).as("d"))
      .filter(col("d") > maxDocFreq)
      .select(col("fp"))
    val pruned = f.join(broadcast(hot), Seq("fp"), "left_anti")
    pruned.alias("a").join(pruned.alias("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_1"), col("b.id").as("id_2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Flesch readability scores from pure counting — the cheap fluency /
    * complexity feature for corpus filtering when an LM scorer is
    * overkill. Counts per document:
    *
    *  - sentences: `[.!?]`-delimited segments (min 1);
    *  - words: whitespace-split non-empty tokens;
    *  - syllables: vowel groups (`[aeiouy]+`) per word, min 1 per word —
    *    the standard heuristic (exact syllabification needs a dictionary).
    *
    * Flesch Reading Ease `206.835 − 1.015·W/S − 84.6·Y/W` and
    * Flesch-Kincaid grade `0.39·W/S + 11.8·Y/W − 15.59` are each ONE
    * fixed-order double expression over the integer counts, reported as
    * floored milli-units — the text_bm25 determinism rule (+, ×, / on
    * integer-derived doubles are exact-ordered; only accumulation order
    * is not, and there is none here).
    *
    * One narrow projection, no shuffle. Output: input columns plus
    * `(n_sentences, n_words, n_syllables, fre_milli, fk_grade_milli)`;
    * the scores are NULL for word-less documents.
    */
  def readability(df: DataFrame, textCol: String): DataFrame = {
    val words = filter(split(col(textCol), "\\s+"), w => w =!= "")
    val counted = df
      .withColumn("n_sentences",
        greatest(lit(1L),
          (size(split(col(textCol), "[.!?]")) - 1).cast("long")))
      .withColumn("n_words", size(words).cast("long"))
      .withColumn("n_syllables",
        aggregate(
          transform(words, w =>
            greatest(lit(1),
              size(regexp_extract_all(lower(w), lit("[aeiouy]+"), lit(0))))),
          lit(0L), (acc, c) => acc + c))
    counted
      .withColumn("fre_milli",
        expr("""CASE WHEN n_words = 0 THEN NULL
               |ELSE CAST(floor(1000.0 * (206.835
               |  - 1.015 * (CAST(n_words AS DOUBLE) /
               |      CAST(n_sentences AS DOUBLE))
               |  - 84.6 * (CAST(n_syllables AS DOUBLE) /
               |      CAST(n_words AS DOUBLE)))) AS BIGINT) END""".stripMargin))
      .withColumn("fk_grade_milli",
        expr("""CASE WHEN n_words = 0 THEN NULL
               |ELSE CAST(floor(1000.0 * (0.39 * (CAST(n_words AS DOUBLE) /
               |      CAST(n_sentences AS DOUBLE))
               |  + 11.8 * (CAST(n_syllables AS DOUBLE) /
               |      CAST(n_words AS DOUBLE)) - 15.59)) AS BIGINT)
               |END""".stripMargin))
  }

  /** Vocabulary coverage curve — "what fraction of the corpus token mass
    * does a top-k vocabulary cover?", the planning number behind
    * tokenizer vocab-size and UNK-rate decisions. Tokens rank by
    * (occurrences DESC, token) through the bucketed
    * [[Sampling.orderedRank]] (key = 2⁴¹ − count is monotone-descending
    * and non-negative; the VOCABULARY is ranked, not the corpus — rank
    * input is one row per distinct token at any corpus size), then one
    * conditional aggregation answers every requested k in a single pass.
    *
    * Output: one row per k — `(k, vocab_size, covered, total,
    * coverage_ppm)` with coverage = 10⁶·covered DIV total (exact
    * integers end-to-end).
    */
  /** Lexical-diversity profile per stratum: token count, distinct types,
    * hapax legomena (frequency-1 types) and the type-token / hapax ratios
    * in exact ppm — the cheap screens for template spam (TTR collapses)
    * and OCR noise / boilerplate variety (hapax share spikes). Two hash
    * aggregations — (stratum, token) then stratum; integers end-to-end.
    *
    * Output: `(stratum, n_tokens, n_types, n_hapax, ttr_ppm, hapax_ppm)`.
    */
  def typeTokenRatio(df: DataFrame, strataCol: Column,
                     tokensCol: Column): DataFrame = {
    val counts = df.select(strataCol.as("stratum"), explode(tokensCol).as("t"))
      .groupBy(col("stratum"), col("t"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("stratum"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("stratum"), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("1000000 * n_types DIV n_tokens").as("ttr_ppm"),
        expr("1000000 * n_hapax DIV n_types").as("hapax_ppm"))
  }

  def vocabCoverage(df: DataFrame, tokensCol: Column,
                    ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"bad ks=$ks")
    // the vocabulary frame feeds BOTH the rank's range probe and the rank
    // itself — checkpoint it (vocabulary-sized, bounded) so the probe
    // doesn't re-run the corpus-wide token aggregation (measured 2.2× on
    // this query when it did)
    val counts = df.select(explode(tokensCol).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val ranked = Sampling.orderedRank(counts, lit(0L),
      lit(1L << 41) - col("c"), col("t"), nBuckets = 1024, out = "rk")
    val aggCols =
      ks.map(k => sum(when(col("rk") <= k, col("c")).otherwise(0L))
        .as(s"cov$k")) ++
      ks.map(k => sum(when(col("rk") <= k, 1L).otherwise(0L))
        .as(s"vs$k")) :+
      sum(col("c")).as("total")
    val one = ranked.agg(aggCols.head, aggCols.tail: _*)
    val perK = explode(array(ks.map(k => struct(
      lit(k.toLong).as("k"), col(s"vs$k").as("vocab_size"),
      col(s"cov$k").as("covered"))): _*)).as("e")
    one.select(perK, col("total"))
      .select(col("e.k"), col("e.vocab_size"), col("e.covered"),
        col("total"),
        expr("1000000 * e.covered DIV total").as("coverage_ppm"))
  }

  /** Hashing-trick feature vectors (Weinberger et al. 2009): every token
    * maps to `bucket = h(token) mod D` with a ±1 sign from an independent
    * hash bit, and the document's feature value at a bucket is the signed
    * token count — the fixed-width, vocabulary-free text representation
    * linear models train on at corpus scale.
    *
    * Both hashes come from one md5 per DISTINCT token: bits 1–15 (hex)
    * give the bucket, hex digit 16 the sign — SQL-replicable
    * (`('0x' || substr(md5(t), 1, 15))::BIGINT`, the [[Sampling.md5Bucket]]
    * convention), so the exact vectors replay in any engine.
    *
    * Plan shape: explode → ONE hash aggregation on (id, bucket). The md5
    * is computed per token occurrence but costs less than a dictionary
    * join would; no vocabulary state, no broadcast — nothing grows with
    * corpus size except the data itself. Output rows are the sparse
    * (id, bucket, value) triplets — empty buckets cost nothing.
    */
  def featureHash(df: DataFrame, idCol: Column, tokensCol: Column,
                  numBuckets: Int): DataFrame = {
    require(numBuckets >= 2, s"numBuckets=$numBuckets must be >= 2")
    df.select(idCol.as("id"), explode(tokensCol).as("tok"))
      .select(col("id"),
        (conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
          % numBuckets).as("bucket"),
        when(conv(substring(md5(col("tok")), 16, 1), 16, 10)
          .cast("long") % 2 === 0L, 1L).otherwise(-1L).as("sign"))
      .groupBy(col("id"), col("bucket"))
      .agg(sum(col("sign")).as("value"))
      .filter(col("value") =!= 0L)
  }
}
