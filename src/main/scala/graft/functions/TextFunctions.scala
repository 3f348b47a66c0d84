package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tokenization / shingling / text-statistics column builders for the
  * text-analysis and dedup extension surface. All pure built-in Catalyst
  * expressions (codegen'd, no UDFs); every formula is replicable in ANSI
  * SQL for the DuckDB oracle.
  */
object TextFunctions {
  private val emptyStrArray = array().cast(ArrayType(StringType))

  /** Whitespace tokenization (fixture texts are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles of a token array; [] when < n tokens.
    * (The `when` guard matters: Spark's `sequence(1, k)` with k < 1 would
    * generate a descending sequence, not an empty one.)
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(emptyStrArray)

  /** Word n-grams with multiplicity preserved ([[wordShingles]] distincts);
    * [] when < n tokens. Repetition metrics need duplicate n-grams counted.
    *
    * Built as n−1 chained `zip_with`s over shifted views of the token
    * array — O(n·len) work per document. The tempting per-position
    * `transform(sequence(…), i -> slice(toks, i, n))` is O(len²): `slice`
    * copies per element, and higher-order functions evaluate interpreted
    * (outside whole-stage codegen), which made the quadratic form dominate
    * a whole bench run (measured 14.8 s → 0.6 s for `text_gopher` at
    * sf0.1 after this rewrite).
    */
  def wordNgrams(toks: Column, n: Int): Column = {
    val m = size(toks) - (n - 1)
    val g = (1 until n).foldLeft(slice(toks, lit(1), m)) {
      case (acc, i) => zip_with(acc, slice(toks, lit(i + 1), m),
        (a, b) => concat_ws(" ", a, b))
    }
    when(size(toks) >= n, g).otherwise(emptyStrArray)
  }

  /** Distinct character n-gram shingles of a string; [] when shorter than n. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) >= n,
      array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))
      .otherwise(emptyStrArray)

  /** Exact Jaccard similarity of two set-valued (distinct) array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)) / size(array_union(a, b))

  /** Tokens kept that appear in `vocab` (e.g. a stopword list). */
  def countIn(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => t.isin(vocab.map(lit): _*)))

  /** Rolling polynomial fingerprint (Karp-Rabin style) over a token array:
    * left fold of `acc*31 + (ascii(tok)*131 + length(tok))  mod 1e9+7`.
    * Sequential, integer-exact, replicable via DuckDB `list_reduce`.
    */
  def rollingFingerprint(toks: Column): Column = {
    val MOD = 1000000007L
    aggregate(
      toks,
      lit(0L),
      (acc, t) => pmod(acc * lit(31L) + (ascii(t).cast(LongType) * lit(131L) + length(t)), lit(MOD)))
  }

  /** English-ish stopword list used by quality scoring (public knowledge). */
  val stopwordsEn: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for", "on", "with")
}
