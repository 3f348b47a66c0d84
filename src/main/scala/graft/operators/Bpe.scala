package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary LEARNING (Sennrich, Haddow &amp; Birch,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016) as relational dataflow — the tokenizer-training half of an LLM
  * data pipeline, not just tokenization with a fixed vocab.
  *
  * The classic trick that makes BPE trainable at corpus scale is folded in
  * from the start: training never touches the corpus again after one
  * word-frequency aggregation (the ONLY corpus-sized shuffle). Every merge
  * round runs on the dictionary's symbol frame — Σ|word| rows over the
  * VOCABULARY, weighted by word frequency — so a 100 TB corpus with a 10M
  * vocabulary trains on ~10⁸ dictionary rows however big the raw text is.
  *
  * Each round is fully declarative (no driver-side collect anywhere):
  *
  *  1. pair counts: `lead(sym)` per word + one partial-agg sum(freq)
  *     shuffle of (left, right) pairs;
  *  2. the winning pair: `orderBy(cnt desc, left, right).limit(1)` — a
  *     TakeOrdered of the pair aggregate, kept as a 1-row frame and
  *     broadcast back, with the (count, left, right) order total so ties
  *     break identically in any engine;
  *  3. greedy left-to-right merge application, expressed as run-parity:
  *     positions whose (sym, next) equals the winner form islands of
  *     consecutive matches (overlap is only possible inside such islands,
  *     e.g. `aaa` under merge (a,a)); the sequential scan keeps exactly
  *     the odd-indexed matches of each island, which is a window
  *     computation — gaps-and-islands (`p − running match count`), then
  *     `row_number % 2` within the island. The symbol at a kept match
  *     becomes left||right, its successor row is deleted, positions are
  *     renumbered densely.
  *
  * All windows are partitioned by word (bounded partitions — a word has at
  * most |word|+1 symbols), never global. Per-round `localCheckpoint`
  * truncates the iterative lineage, same as the k-means and
  * connected-components fixpoints; swap for `checkpoint` on a long-lived
  * cluster with executor churn. Counts are integer sums and symbols are
  * strings, so every intermediate — and therefore the learned merge
  * table — is bit-reproducible and SQL-replicable; [[oracleSql]] emits the
  * identical computation as chained DuckDB CTEs.
  *
  * When fewer than `nMerges` pairs exist (every word fully merged), the
  * remaining rounds find an empty argmax and contribute no rows — the
  * merge table just ends early, in both engines.
  */
object Bpe {

  /** End-of-word marker symbol (its own symbol, last in every word). */
  val EndMark = "</w>"

  /** Learn `nMerges` BPE merges from a text column.
    *
    * @return (merges, finalSymbols): `merges` is the learned rule table
    *         (merge_rank, left_sym, right_sym, pair_cnt) in learning
    *         order; `finalSymbols` is the dictionary symbol frame after
    *         all merges (w, f, p, sym) — the trained subword vocabulary
    *         with frequencies, ready for `groupBy(sym)` vocab extraction.
    */
  def train(df: DataFrame, textCol: Column,
            nMerges: Int): (DataFrame, DataFrame) = {
    require(nMerges >= 1 && nMerges <= 64,
      s"nMerges=$nMerges out of [1, 64] (each merge adds a plan round)")
    val wWin = Window.partitionBy("w").orderBy("p")
    val runWin = wWin.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)

    val wf = df.select(explode(split(textCol, " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    // the per-round frame carries each symbol's SUCCESSOR (`nxt`): pair
    // counting then needs no window at all (a straight partial-agg over
    // the checkpointed frame — the former per-round lead() cost a full
    // exchange+sort of the symbol frame just to rediscover adjacency the
    // merge step had in hand when it renumbered), and the merge step's
    // match test is a plain column comparison
    var syms = wf
      .select(col("w"), col("f"),
        explode(sequence(lit(1), length(col("w")) + 1)).as("p"))
      .withColumn("sym",
        when(col("p") <= length(col("w")),
          col("w").substr(col("p"), lit(1))).otherwise(lit(EndMark)))
      .withColumn("nxt", lead(col("sym"), 1).over(wWin))
      .localCheckpoint(true)

    var merges: DataFrame = null
    for (k <- 1 to nMerges) {
      val winner = syms
        .filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("left_sym"), col("nxt").as("right_sym"))
        .agg(sum(col("f")).as("pair_cnt"))
        .orderBy(col("pair_cnt").desc, col("left_sym"), col("right_sym"))
        .limit(1)
        .localCheckpoint(true)
      val ranked = winner.withColumn("merge_rank", lit(k))
      merges = if (merges == null) ranked else merges.unionByName(ranked)

      // run-parity without the former (w, g) island window (which cost a
      // second full exchange per round): within wWin, an island of
      // consecutive matches starts where `mt && !lag(mt)`; a running max
      // of the start positions gives each match its island's start, and
      // row_number-within-island = p − start + 1 is odd iff (p − start)
      // is even — same greedy keep-set, every window function on the ONE
      // (w, p) partitioning+ordering the round already pays for
      syms = syms
        .crossJoin(broadcast(winner.select(
          col("left_sym").as("__ml"), col("right_sym").as("__mr"))))
        .withColumn("mt",
          coalesce(col("sym") === col("__ml") &&
            col("nxt") === col("__mr"), lit(false)))
        .withColumn("st",
          col("mt") && !coalesce(lag(col("mt"), 1).over(wWin), lit(false)))
        .withColumn("start",
          max(when(col("st"), col("p"))).over(runWin))
        .withColumn("mg", col("mt") && (col("p") - col("start")) % 2 === 0)
        .withColumn("del", lag(col("mg"), 1, false).over(wWin))
        .filter(!col("del"))
        .withColumn("sym2", when(col("mg"),
          concat(col("__ml"), col("__mr"))).otherwise(col("sym")))
        .select(col("w"), col("f"),
          row_number().over(wWin).as("p"), col("sym2").as("sym"))
        .withColumn("nxt", lead(col("sym"), 1).over(wWin))
        .localCheckpoint(true)
    }
    (merges.select(col("merge_rank"), col("left_sym"), col("right_sym"),
      col("pair_cnt")),
      syms.select(col("w"), col("f"), col("p"), col("sym")))
  }

  /** The identical training loop as DuckDB SQL: one CTE block per round,
    * generated for the same `nMerges` — the cross-engine replay that makes
    * the learned merge table hash-checkable.
    *
    * The round CTEs are `AS MATERIALIZED`: each round's symbol frame is
    * referenced twice by the next round (pair counting and merge
    * application), so an inlining planner would re-evaluate it — doubling
    * work per round, 2^n overall. Materialization keeps the replay linear
    * in `nMerges`, like the Spark side's per-round checkpoints.
    */
  def oracleSql(nMerges: Int): String = {
    val union = (1 to nMerges).map { k =>
      s"SELECT $k AS merge_rank, left_sym, right_sym, " +
        s"CAST(pair_cnt AS BIGINT) AS pair_cnt FROM m$k"
    }.mkString("\n", "\nUNION ALL\n", "")
    s"""${oraclePrefix(nMerges)}
       |$union
       |ORDER BY merge_rank""".stripMargin
  }

  /** Oracle for the trained subword VOCABULARY (the final symbol frame
    * aggregated): same CTE prefix as [[oracleSql]], different final
    * SELECT.
    */
  def vocabOracleSql(nMerges: Int): String =
    s"""${oraclePrefix(nMerges)}
       |SELECT sym, CAST(sum(f) AS BIGINT) AS freq,
       |  CAST(count(DISTINCT w) AS BIGINT) AS n_words
       |FROM s$nMerges GROUP BY 1 ORDER BY sym""".stripMargin

  /** Oracle for APPLYING the learned merges back to the corpus: per-doc
    * subword token counts under the trained vocabulary. Same CTE prefix;
    * the per-word symbol counts join back onto the exploded corpus.
    */
  def applyOracleSql(nMerges: Int): String =
    s"""${oraclePrefix(nMerges)},
       |wl AS (SELECT w, CAST(count(*) AS BIGINT) AS n_syms
       |       FROM s$nMerges GROUP BY 1),
       |d AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |      FROM documents)
       |SELECT doc_id, CAST(sum(n_syms) AS BIGINT) AS n_bpe_tokens,
       |  CAST(count(*) AS BIGINT) AS n_words
       |FROM d JOIN wl USING (w) GROUP BY 1 ORDER BY doc_id""".stripMargin

  private def oraclePrefix(nMerges: Int): String = {
    val rounds = (1 to nMerges).map { k =>
      val s = s"s${k - 1}"
      s"""m$k AS MATERIALIZED (
         |  SELECT sym AS left_sym, nxt AS right_sym, sum(f) AS pair_cnt
         |  FROM (SELECT f, sym, lead(sym) OVER (PARTITION BY w ORDER BY p)
         |          AS nxt FROM $s)
         |  WHERE nxt IS NOT NULL GROUP BY 1, 2
         |  ORDER BY pair_cnt DESC, left_sym, right_sym LIMIT 1),
         |a$k AS (
         |  SELECT s.w, s.f, s.p, s.sym, m.left_sym AS ml, m.right_sym AS mr,
         |    coalesce(s.sym = m.left_sym AND
         |      lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.p) = m.right_sym,
         |      FALSE) AS mt
         |  FROM $s s CROSS JOIN m$k m),
         |b$k AS (
         |  SELECT *, sum(CASE WHEN mt THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY w ORDER BY p) AS cum
         |  FROM a$k),
         |c$k AS (SELECT *, CASE WHEN mt THEN p - cum END AS g FROM b$k),
         |d$k AS (
         |  SELECT *, mt AND (row_number()
         |      OVER (PARTITION BY w, g ORDER BY p) % 2) = 1 AS mg
         |  FROM c$k),
         |e$k AS (
         |  SELECT w, f, p, CASE WHEN mg THEN ml || mr ELSE sym END AS sym,
         |    lag(mg, 1, FALSE) OVER (PARTITION BY w ORDER BY p) AS del
         |  FROM d$k),
         |s$k AS MATERIALIZED (
         |  SELECT w, f, row_number() OVER (PARTITION BY w ORDER BY p) AS p,
         |    sym
         |  FROM e$k WHERE NOT del)""".stripMargin
    }
    s"""WITH wf AS (
       |  SELECT tok AS w, count(*) AS f FROM
       |    (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |  WHERE length(tok) >= 1 GROUP BY 1),
       |s0 AS MATERIALIZED (
       |  SELECT w, f, p,
       |    CASE WHEN p <= length(w) THEN substr(w, p, 1)
       |         ELSE '$EndMark' END AS sym
       |  FROM (SELECT w, f, unnest(range(1, length(w) + 2)) AS p FROM wf)),
       |${rounds.mkString(",\n")}""".stripMargin
  }
}
