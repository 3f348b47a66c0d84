package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sampling, TextAnalysis}

/** Behavioral properties of the Gopher-style quality filter, the frequent-
  * n-gram heavy hitters, and the deterministic stratified sampler — the
  * contracts the DuckDB oracle can't express (monotonicity, partition
  * independence, constructed-input behavior).
  */
class TextSamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gopherQuality flags degenerate repetition and short docs") {
    val clean = (1 to 40).map(i => s"word$i").mkString(" ") // 40 distinct words
    val spammy = Seq.fill(40)("spam").mkString(" ")      // one repeated bigram
    val short = "just a few words here"
    val df = Seq((1L, clean), (2L, spammy), (3L, short)).toDF("doc_id", "text")
    val out = TextAnalysis.gopherQuality(df, "text")
      .select("doc_id", "dup_2gram_frac", "keep_flag")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    assert(out(1L)._1 == 0.0 && out(1L)._2 == 1)
    assert(out(2L)._1 > 0.9 && out(2L)._2 == 0)
    assert(out(3L)._2 == 0) // below minWords
  }

  test("topNgrams breaks count ties lexicographically and caps at k") {
    val df = Seq("a b", "c d", "b c").toDF("text") // every bigram count 1
    val got = TextAnalysis.topNgrams(df, "text", n = 2, k = 2)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a b", "b c"))
  }

  test("stratifiedSample is monotone in rate and partition-independent") {
    val docs = Tables.documents(spark, TestSpark.sf)
    def kept(pct: Int, parts: Int): Set[Long] =
      Sampling.stratifiedSample(docs.repartition(parts), col("doc_id"),
          col("source"), Map("src0" -> pct), defaultPct = 10)
        .filter(col("source") === "src0")
        .select("doc_id").as[Long].collect().toSet
    val at25 = kept(25, 4)
    val at75 = kept(75, 4)
    assert(at25.subsetOf(at75), "raising a stratum rate must keep all prior rows")
    assert(kept(25, 7) == at25, "keep set must not depend on partitioning")
    assert(kept(0, 4).isEmpty)
    val all = docs.filter(col("source") === "src0").count()
    assert(kept(100, 4).size == all)
  }
}
