package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Rolling polynomial fingerprint per document (content-defined identity
    * that survives reformatting of surrounding fields).
    */
  def fingerprints(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      TextFunctions.rollingFingerprint(TextFunctions.tokens(col(textCol)))
        .as("rolling_fp"))
}
