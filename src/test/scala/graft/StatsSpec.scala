package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats

class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zScoreOutliers flags exactly the |x-mean| > k·sigma values, integer-exactly") {
    // group a: [10,10,10,100] -> mean 32.5, pop sigma ~38.97;
    //   k=1: only 100 (|67.5| > 38.97; |22.5| < 38.97)
    // group b: constant -> zero variance, strict > keeps nothing
    val df = Seq(("a", 10L), ("a", 10L), ("a", 10L), ("a", 100L),
      ("b", 5L), ("b", 5L)).toDF("g", "v")
    val out = Stats.zScoreOutliers(df, col("g"), col("v"), k = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(2) == 1L)
    assert(out("a").getLong(3) == 100L && out("a").getLong(4) == 100L)
    assert(out("b").getLong(2) == 0L)
    assert(out("b").isNullAt(3) && out("b").isNullAt(4))
  }

  test("zScoreOutliers: k widens the fence; partition-independent") {
    // one point at z ~ 6: outside the k=2 fence, inside k=16 (a LONE
    // extreme point can never exceed z = sqrt(n), so it must be moderate
    // for the k=16 leg to pass)
    val vals = (1L to 500L) :+ 1200L
    val df = vals.map(("g", _)).toDF("g", "v")
    val k2 = Stats.zScoreOutliers(df, col("g"), col("v"), k = 2)
      .collect().head
    assert(k2.getLong(2) == 1L && k2.getLong(3) == 1200L)
    val k16 = Stats.zScoreOutliers(df, col("g"), col("v"), k = 16)
      .collect().head
    // at k=16 even the extreme point sits inside the fence
    assert(k16.getLong(2) == 0L)
    val rep = Stats.zScoreOutliers(df.repartition(11), col("g"), col("v"),
      k = 2).collect().head
    assert(rep.getLong(2) == k2.getLong(2) && rep.getLong(3) == k2.getLong(3))
  }
}
