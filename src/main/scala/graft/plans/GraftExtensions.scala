package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}

import graft.functions._

/** SQL surface for the engine's custom Catalyst expressions: registered
  * either at session build time (`.withExtensions(new GraftExtensions)`)
  * or into a live session via [[GraftFunctions.register]]. After
  * registration every sketch/vector primitive is callable from
  * `spark.sql(...)` exactly like a built-in — no UDF indirection.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
}

object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def arity(es: Seq[Expression], name: String, lo: Int, hi: Int): Unit =
    if (es.length < lo || es.length > hi)
      throw new IllegalArgumentException(
        s"$name expects $lo${if (hi != lo) s"..$hi" else ""} arguments, got ${es.length}")

  /** name → builder for every injected function. */
  val all: Map[String, Seq[Expression] => Expression] = Map(
    "cosine_similarity" -> (es => { arity(es, "cosine_similarity", 2, 2)
      CosineSimilarity(es(0), es(1)) }),
    "dot_product" -> (es => { arity(es, "dot_product", 2, 2)
      DotProduct(es(0), es(1)) }),
    "simhash64" -> (es => { arity(es, "simhash64", 1, 2)
      es.length match {
        case 1 => SimHash64(es(0), 42L)
        case _ => SimHash64(es(0), longArg(es(1), "seed"))
      }}),
    "simhash_from_hashes" -> (es => { arity(es, "simhash_from_hashes", 1, 1)
      SimHashFromHashes(es(0)) }),
    "zorder_key" -> (es => { arity(es, "zorder_key", 2, 3)
      val bits = if (es.length == 3) intArg(es(2), "bits") else 16
      ZOrderKey(Cast(es(0), org.apache.spark.sql.types.LongType),
        Cast(es(1), org.apache.spark.sql.types.LongType), bits) }),
    "hilbert_key" -> (es => { arity(es, "hilbert_key", 2, 3)
      val bits = if (es.length == 3) intArg(es(2), "bits") else 16
      HilbertKey(Cast(es(0), org.apache.spark.sql.types.LongType),
        Cast(es(1), org.apache.spark.sql.types.LongType), bits) }),
    "minhash_signature" -> (es => { arity(es, "minhash_signature", 1, 3)
      es.length match {
        case 1 => MinHashSignature(es(0), 64, 42L)
        case 2 => MinHashSignature(es(0), intArg(es(1), "numHashes"), 42L)
        case _ => MinHashSignature(es(0), intArg(es(1), "numHashes"),
          longArg(es(2), "seed"))
      }}),
    "word_shingle_hashes" -> (es => { arity(es, "word_shingle_hashes", 2, 3)
      es.length match {
        case 2 => ShingleHashes(es(0), intArg(es(1), "n"), 42L)
        case _ => ShingleHashes(es(0), intArg(es(1), "n"), longArg(es(2), "seed"))
      }}),
    "char_shingle_hashes" -> (es => { arity(es, "char_shingle_hashes", 2, 3)
      es.length match {
        case 2 => CharShingleHashes(es(0), intArg(es(1), "n"), 42L)
        case _ => CharShingleHashes(es(0), intArg(es(1), "n"), longArg(es(2), "seed"))
      }}))

  /** Register all functions into an already-running session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
