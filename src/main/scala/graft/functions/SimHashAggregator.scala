package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Group-level SimHash: aggregates the per-bit votes of every member
  * document's token set into one 64-bit signature for the whole group
  * (e.g. a per-source corpus fingerprint — two sources with mostly-shared
  * content get signatures at small Hamming distance).
  *
  * The typed `Aggregator[IN, BUF, OUT]` form (SURVEY.md §2.9 pref 2):
  * a mutable vote-vector buffer, merged associatively across partitions —
  * the map-side partial aggregation Spark gives every Aggregator for free.
  * Register with `udaf(SimHashAggregator)` or use via `TypedColumn` on a
  * typed Dataset.
  */
object SimHashAggregator extends Aggregator[Seq[String], Array[Int], Long] {
  private val seed = 42L

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(votes: Array[Int], tokens: Seq[String]): Array[Int] = {
    if (tokens != null) tokens.foreach { t =>
      if (t != null) {
        val utf8 = org.apache.spark.unsafe.types.UTF8String.fromString(t)
        SketchHash.voteBits(SketchHash.hashUtf8(utf8, seed), votes)
      }
    }
    votes
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(votes: Array[Int]): Long = SketchHash.votesToSig(votes)

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
