package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** The relational BPE trainer vs an independent sequential reference: the
  * classic imperative algorithm (count pairs, take argmax, greedy
  * left-to-right replace) implemented directly, so the run-parity window
  * formulation is proven equivalent — including overlapping matches
  * (`aaaa` under merge (a,a)) and frequency weighting.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference: pair statistics over the word-frequency dict. */
  private def pairStats(dict: Map[Vector[String], Long]): Map[(String, String), Long] = {
    val m = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((syms, f) <- dict; i <- 0 until syms.length - 1)
      m((syms(i), syms(i + 1))) = m.getOrElse((syms(i), syms(i + 1)), 0L) + f
    m.toMap
  }

  /** Reference: one greedy left-to-right merge pass (the sequential scan
    * the operator's island-parity windows must reproduce).
    */
  private def applyMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(corpus: Seq[String], n: Int)
    : (Seq[(Int, String, String, Long)], Map[Vector[String], Long]) = {
    var dict = corpus.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, o) =>
        (w.map(_.toString).toVector :+ Bpe.EndMark) -> o.size.toLong
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (k <- 1 to n) {
      val stats = pairStats(dict)
      if (stats.nonEmpty) {
        val ((l, r), c) = stats.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((k, l, r, c))
        dict = dict.toSeq.map { case (s, f) => applyMerge(s, l, r) -> f }
          .groupBy(_._1).map { case (s, o) => s -> o.map(_._2).sum }
      }
    }
    (merges.toSeq, dict)
  }

  test("train matches the sequential reference, incl. overlapping runs") {
    // 'aaaa'/'aaa' force overlapping (a,a) matches; repeated docs weight
    // frequencies; 'abab' exercises repeated non-overlapping pairs
    val corpus = Seq(
      "aaaa aaa abab the the the",
      "the them then abab bb",
      "aaaa bb the them")
    val df = corpus.toDF("text")
    val (merges, finalSyms) = Bpe.train(df, col("text"), nMerges = 8)
    val got = merges.as[(Int, String, String, Long)].collect()
      .sortBy(_._1).toSeq
    val (want, wantDict) = refTrain(corpus, 8)
    assert(got == want, s"merge tables differ:\n got=$got\nwant=$want")
    // the final symbol frames agree too (same words, same segmentation)
    val gotDict = finalSyms.as[(String, Long, Int, String)].collect()
      .groupBy(_._1).map { case (w, rows) =>
        rows.sortBy(_._3).map(_._4).toVector -> rows.head._2
      }
    assert(gotDict == wantDict)
  }

  test("merge table ends early when every word is fully merged") {
    // one word, two distinct chars + end mark -> at most 2 merges possible
    val df = Seq("ab ab ab").toDF("text")
    val (merges, _) = Bpe.train(df, col("text"), nMerges = 6)
    assert(merges.count() == 2L)
    // and the oracle SQL for the same nMerges parses/behaves identically
    // (checked end-to-end by the text_bpe_train correctness row)
  }

  test("pair counts are frequency-weighted, ties break lexicographically") {
    // every pair has count 3 -> the (cnt desc, left, right) total order
    // decides; '<' sorts before letters, so (w, </w>) wins
    val corpus = Seq("xy xy xy zw zw zw")
    val (merges, _) = Bpe.train(corpus.toDF("text"), col("text"), nMerges = 1)
    val top = merges.as[(Int, String, String, Long)].collect().head
    assert(top == refTrain(corpus, 1)._1.head)
    assert(top._4 == 3L, "pair count must be frequency-weighted")
  }
}
