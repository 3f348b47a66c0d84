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

  test("concurrency: half-open overlap, cross-bucket carry, touching intervals") {
    import graft.operators.Intervals
    // bucket width 100. [0,50) & [40,160) overlap (max 2 in bucket 0);
    // [40,160) spans into bucket 1 where [150,250) joins it (max 2);
    // [160,250)? no — [150,250) starts BEFORE 160 ends: overlap again.
    // [250,260) touches [150,250) end-to-start: NOT concurrent (half-open).
    val iv = Seq((0L, 50L), (40L, 160L), (150L, 250L), (250L, 260L))
      .toDF("s", "e")
    val full = Intervals.concurrencyByBucket(iv, col("s"), col("e"), 100L)
      .as[(Long, Long, Long)].collect()
      .map(x => x._1 -> (x._2, x._3)).toMap
    assert(full(0L) == (2L, 2L)) // [0,50)+[40,160) open together
    assert(full(1L) == (2L, 1L)) // carry-in [40,160) + start [150,250)
    assert(full(2L) == (1L, 1L)) // [250,260) starts as [150,250) ends
    assert(full.keySet == Set(0L, 1L, 2L))
  }

  test("concurrency: carry-only bucket absent, later bucket sees full carry") {
    import graft.operators.Intervals
    // one interval spanning buckets 0..4 plus activity in bucket 4: the
    // quiet middle buckets emit nothing; bucket 4's max includes the carry
    val iv = Seq((10L, 450L), (420L, 430L)).toDF("s", "e")
    val full = Intervals.concurrencyByBucket(iv, col("s"), col("e"), 100L)
      .as[(Long, Long, Long)].collect()
      .map(x => x._1 -> (x._2, x._3)).toMap
    assert(full.keySet == Set(0L, 4L))
    assert(full(4L) == (2L, 1L))
  }

  test("skyline: frontier keeps exactly the non-dominated points, dup points survive") {
    import graft.operators.Skyline
    // (1,5) frontier; (2,5) dominated by (1,5); (3,3) frontier;
    // (3,4) dominated same-x; (7,1)x2 frontier duplicates; (9,1)
    // dominated by (7,1); (5,2) frontier
    val pts = Seq((1L, 5L), (2L, 5L), (3L, 3L), (3L, 4L),
      (7L, 1L), (7L, 1L), (9L, 1L), (5L, 2L)).toDF("x", "y")
    val got = Skyline.paretoFrontier2D(pts, col("x"), col("y"), 4L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 5L, 1L), (3L, 3L, 1L), (5L, 2L, 1L), (7L, 1L, 2L)))
  }

  test("skyline: agrees with brute-force dominance on random points") {
    import graft.operators.Skyline
    val pts = (1L to 400L).map(i => ((i * 37) % 211, (i * 53) % 197))
    val df = pts.toDF("x", "y")
    val got = Skyline.paretoFrontier2D(df, col("x"), col("y"), 16L)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    val brute = pts.distinct.filter { case (x, y) =>
      !pts.exists { case (a, b) =>
        a <= x && b <= y && (a < x || b < y) }
    }.toSet
    assert(got == brute)
    // bucket-width invariance: the decomposition must not change results
    val other = Skyline.paretoFrontier2D(df, col("x"), col("y"), 1000L)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(other == brute)
  }

  test("concurrency: partition-independent") {
    import graft.operators.Intervals
    val iv = (1L to 300L).map(i => (i * 13 % 997, i * 13 % 997 + 1 + i % 50))
      .toDF("s", "e")
    val a = Intervals.concurrencyByBucket(iv, col("s"), col("e"), 64L)
    val b = Intervals.concurrencyByBucket(iv.repartition(13, col("e")),
      col("s"), col("e"), 64L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
