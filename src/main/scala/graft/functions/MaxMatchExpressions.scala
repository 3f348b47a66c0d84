package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match (MaxMatch / WordPiece-inference) segmentation
  * statistics as ONE linear pass per document — the row-local fast path
  * of [[graft.operators.TextAnalysis.maxMatchSegments]] (whose
  * pointer-doubling formulation covers sequences sharded across rows;
  * TextSamplingSpec proves the two implementations identical).
  *
  * Semantics are pinned to the SQL-replicable form the oracle replays:
  * positions count CODE POINTS (DuckDB `substr` semantics — Java UTF-16
  * indices would drift on astral characters), the walk takes the longest
  * vocabulary piece starting at the position (≤ maxPieceLen), and an
  * unmatched position is consumed by a 1-code-point fallback.
  */
object MaxMatch {

  /** Immutable probe set: pieces bucketed by code-point length, longest
    * first — built once per plan and shipped as a codegen reference
    * object.
    */
  final class Vocab(pieces: Seq[String], val maxPieceLen: Int)
      extends Serializable {
    val byLen: Array[java.util.HashSet[String]] = {
      val a = Array.fill(maxPieceLen + 1)(new java.util.HashSet[String]())
      pieces.foreach { p =>
        val l = p.codePointCount(0, p.length)
        require(l >= 1 && l <= maxPieceLen,
          s"vocab piece '$p' has $l code points, outside 1..$maxPieceLen")
        a(l).add(p)
      }
      a
    }
  }

  /** (n_pieces, n_fallback) of the greedy longest-match walk over `input`. */
  def stats(input: UTF8String, vocab: Vocab): GenericInternalRow = {
    val cps = input.toString.codePoints().toArray
    val n = cps.length
    var p = 0; var pieces = 0L; var fallback = 0L
    while (p < n) {
      var step = 1
      var matched = false
      var l = math.min(vocab.maxPieceLen, n - p)
      while (l >= 1 && !matched) {
        if (vocab.byLen(l).contains(new String(cps, p, l))) {
          matched = true; step = l
        }
        l -= 1
      }
      if (!matched) fallback += 1L
      pieces += 1L
      p += step
    }
    new GenericInternalRow(Array[Any](pieces, fallback))
  }
}

/** Expression form: the loop lives in [[MaxMatch.stats]], called from both
  * interpreted eval and generated code so the paths cannot drift.
  */
case class MaxMatchStats(child: Expression, vocab: Seq[String],
                         maxPieceLen: Int) extends UnaryExpression {
  require(vocab.nonEmpty, "MaxMatchStats needs a vocabulary")

  @transient private lazy val probe = new MaxMatch.Vocab(vocab, maxPieceLen)

  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("n_fallback", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MaxMatch.stats(input.asInstanceOf[UTF8String], probe)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("maxMatchVocab", probe,
      classOf[MaxMatch.Vocab].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MaxMatch.stats($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaxMatchFunctions {
  /** Column API: struct(n_pieces, n_fallback) of the greedy walk. */
  def maxMatchStats(text: Column, vocab: Seq[String],
                    maxPieceLen: Int = 8): Column =
    column(MaxMatchStats(expression(text), vocab, maxPieceLen))
}
