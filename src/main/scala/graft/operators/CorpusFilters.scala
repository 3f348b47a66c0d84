package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-structure quality filters for web-scale corpus curation, in the
  * family popularized by C4 (Raffel et al., "Exploring the Limits of
  * Transfer Learning with a Unified Text-to-Text Transformer", JMLR 2020,
  * §2.2) and RefinedWeb/CCNet line-level rules (Penedo et al. 2023;
  * Wenzek et al. 2020). Two granularities:
  *
  *  - [[c4LineStats]] is per-document only — a narrow projection over the
  *    line array, no shuffle, embarrassingly parallel at any corpus size;
  *  - [[boilerplateLines]] is corpus-level — repeated nav/footer lines are
  *    only visible across documents, so it pays exactly one hash shuffle
  *    (line → document-frequency) and broadcasts the small hot set back.
  */
object CorpusFilters {

  /** Terminal-punctuation predicate of the C4 line rule. */
  private def endsTerminal(line: Column): Column =
    substring(line, -1, 1).isin(".", "!", "?", "\"")

  /** C4-style per-document line statistics: a line is KEPT iff it ends in
    * terminal punctuation and has at least `minLineWords` words; the
    * document is kept iff at least `minKeptLines` lines survive and no
    * blocklist needle (lorem-ipsum boilerplate, code braces) occurs
    * anywhere in the text. Returns one row per input document:
    * (id, n_lines, n_kept_lines, kept_chars, keep_doc).
    *
    * `kept_chars` is the size of the retained text (kept lines re-joined
    * with the separator) — the number a curation pipeline budgets retained
    * bytes with.
    */
  def c4LineStats(df: DataFrame, textCol: String, idCol: String,
                  lineSep: String = "\n", minLineWords: Int = 3,
                  minKeptLines: Int = 5,
                  blocklist: Seq[String] = Seq("lorem ipsum", "{")): DataFrame = {
    require(minLineWords >= 1 && minKeptLines >= 1,
      s"minLineWords=$minLineWords and minKeptLines=$minKeptLines must be >= 1")
    val lines = split(col(textCol), java.util.regex.Pattern.quote(lineSep))
    val kept = filter(lines, x =>
      endsTerminal(x) && size(split(x, " ")) >= minLineWords)
    val blocked = blocklist.map(b => col(textCol).contains(b))
      .reduceOption(_ || _).getOrElse(lit(false))
    df.select(col(idCol).as("id"),
        size(lines).as("n_lines"),
        size(kept).as("n_kept_lines"),
        length(array_join(kept, lineSep)).as("kept_chars"),
        (size(kept) >= minKeptLines && !blocked).cast("int").as("keep_doc"))
  }

  /** Corpus-level boilerplate line removal: a line occurring in more than
    * `maxDocFreq` DISTINCT documents is boilerplate (navigation, footers,
    * cookie banners) and carries no content signal. Reports, per document,
    * total line count, boilerplate occurrences, and the character count of
    * the retained lines.
    *
    * Shape: per-document distinct lines → one hash aggregation keyed by
    * the line value → the hot set (by construction at most
    * corpus_lines / maxDocFreq entries, tiny in practice) is broadcast
    * back as an anti-mask. The same df-cut economics as the winnowing
    * overlap join: the quadratic boilerplate mass is removed by a
    * broadcast, never shuffled.
    */
  def boilerplateLines(df: DataFrame, textCol: String, idCol: String,
                       lineSep: String = "\n", maxDocFreq: Long = 100L): DataFrame = {
    require(maxDocFreq >= 1L, s"maxDocFreq=$maxDocFreq must be >= 1")
    val sep = java.util.regex.Pattern.quote(lineSep)
    val distinctPerDoc = df.select(col(idCol).as("id"),
      explode(array_distinct(split(col(textCol), sep))).as("line"))
    val hot = distinctPerDoc
      .groupBy(col("line"))
      .agg(count(lit(1)).as("d"))
      .filter(col("d") > maxDocFreq)
      .select(col("line"), lit(1).as("is_hot"))
    df.select(col(idCol).as("id"), explode(split(col(textCol), sep)).as("line"))
      .join(broadcast(hot), Seq("line"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(coalesce(col("is_hot"), lit(0))).as("n_boilerplate"),
        sum(when(col("is_hot").isNull, length(col("line")))
          .otherwise(lit(0))).as("kept_chars"))
  }
}
