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

  test("madOutliers: lower-median MAD fence, robust to a tail the z-score is not") {
    // x = 1..9 plus a wild 10^6 point. med = element at rank (11+1)/2=6
    // of sorted [1..9, 5, 1000000] -> 5; devs sorted: [0,1,1,2,2,3,3,4,4,
    // 999995] plus dev(5)=0 -> lower median mad = 2.
    // outliers: |x-5| > 3*2=6 -> only 1000000.
    val df = ((1L to 9L) :+ 1000000L :+ 5L).zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("v", "uid")
    val out = Stats.madOutliers(df, col("v"), col("uid"), num = 3L, den = 1L)
      .select("x", "med", "abs_dev", "mad")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1000000L, 5L, 999995L, 2L)))
    // the z-score fence at k=2 misses it or flags legit rows? not the
    // point — the point is MAD's fence is unchanged when the tail grows
    val grown = df.union(Seq((2000000L, 99L)).toDF("v", "uid"))
    val out2 = Stats.madOutliers(grown, col("v"), col("uid"))
      .select("med", "mad").distinct().as[(Long, Long)].collect()
    assert(out2.toSeq == Seq((5L, 2L)), "median/MAD must shrug off tail growth")
    // partition independence
    val re = Stats.madOutliers(df.repartition(7, col("uid")), col("v"),
      col("uid")).select("x").as[Long].collect()
    assert(re.toSeq == Seq(1000000L))
  }

  test("groupedLowerMedian: per-group lower median, partition-independent") {
    // group a: [1,2,3,4] -> rank (4+1)/2=2 -> med 2; group b: [10,20,30]
    // -> rank 2 -> 20; group c: [7] -> rank 1 -> 7
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 10L), ("b", 20L), ("b", 30L), ("c", 7L))
      .zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
      .toDF("g", "v", "uid")
    val got = Stats.groupedLowerMedian(df, col("g"), col("v"), col("uid"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 2L, 4L), ("b", 20L, 3L), ("c", 7L, 1L)))
    val re = Stats.groupedLowerMedian(df.repartition(5, col("uid")),
      col("g"), col("v"), col("uid")).as[(String, Long, Long)].collect().toSet
    assert(re == got)
    // ties: lower median is a real element in (value, tie) order
    val ties = Seq(("t", 5L, 1L), ("t", 5L, 2L), ("t", 9L, 3L), ("t", 9L, 4L))
      .toDF("g", "v", "uid")
    val m = Stats.groupedLowerMedian(ties, col("g"), col("v"), col("uid"))
      .select("med").as[Long].head()
    assert(m == 5L, "rank (4+1) DIV 2 = 2 -> second 5")
  }

  test("categoricalDiversity: exact gini ppm, constant and uniform extremes") {
    val df = Seq(("x", "a"), ("x", "b"), ("x", "c"), ("x", "d"))
      .toDF("const", "uniform")
    val got = Stats.categoricalDiversity(df,
        Seq("const" -> col("const"), "uniform" -> col("uniform")))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // constant: gini = 0; uniform over 4: 1 - 4*(1/16) = 3/4 -> 750000
    assert(got("const") == (("const", 4L, 1L, 4L, 0L)))
    assert(got("uniform") == (("uniform", 4L, 4L, 1L, 750000L)))
    // skewed 3-1: 1 - (9+1)/16 = 6/16 -> 375000
    val sk = Seq("a", "a", "a", "b").toDF("v")
    val g = Stats.categoricalDiversity(sk, Seq("v" -> col("v")))
      .select("gini_ppm").as[Long].head()
    assert(g == 375000L)
  }

  test("coOccurrencePairs: exact pair counts and ppm confidences; big-basket guard") {
    import graft.operators.Associations
    // baskets: b1={1,2,3}, b2={1,2}, b3={2,3}, b4={1} (dup row ignored)
    val df = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 2L), (3L, 3L), (4L, 1L), (4L, 1L)).toDF("b", "i")
    val got = Associations.coOccurrencePairs(df, col("b"), col("i"))
      .select("i1", "i2", "pair_cnt", "cnt_1", "cnt_2", "conf12_ppm",
        "conf21_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    // supports: 1->3 baskets, 2->3, 3->2
    assert(got == Set(
      (1L, 2L, 2L, 3L, 3L, 666666L, 666666L),
      (1L, 3L, 1L, 3L, 2L, 333333L, 500000L),
      (2L, 3L, 2L, 3L, 2L, 666666L, 1000000L)))
    // a basket over maxBasket contributes no pairs, but still counts
    // toward supports of surviving pairs' items
    val withBig = df.union((1L to 5L).map(i => (9L, i)).toDF("b", "i"))
    val guarded = Associations.coOccurrencePairs(withBig, col("b"), col("i"),
      maxBasket = 4L)
    assert(guarded.filter(col("i1") === 4L || col("i2") === 4L).count() == 0,
      "pairs must only come from surviving baskets")
    val s12 = guarded.filter(col("i1") === 1L && col("i2") === 2L)
      .select("cnt_1").as[Long].head()
    assert(s12 == 4L, "supports count dropped baskets too")
  }

  test("linearCredits: each conversion distributes exactly 1e6 ppm; lookback bounds") {
    import graft.operators.Attribution
    import java.sql.Timestamp
    def ts(day: Int, h: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    // user 1: three touches then a purchase (credit 333333/333333/333334,
    // most recent touch takes the remainder); one stale touch outside the
    // 7-day lookback earns nothing; user 2's purchase has no touches.
    val ev = Seq(
      (1L, ts(1, 1), 1L, "view"),     // stale: 9 days before conversion
      (2L, ts(10, 1), 1L, "view"),
      (3L, ts(10, 2), 1L, "click"),
      (4L, ts(10, 3), 1L, "view"),    // most recent -> remainder
      (5L, ts(10, 4), 1L, "purchase"),
      (6L, ts(10, 4), 2L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Attribution.linearCredits(ev, "purchase", lookbackDays = 7)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      "click" -> ((1L, 333333L)),
      "view" -> ((2L, 333333L + 333334L))))
    assert(got.values.map(_._2).sum == 1000000L,
      "credits must reconcile to conversions x 1e6")
  }

  test("frequentTriples: Apriori counts match brute force; pruning is lossless") {
    import graft.operators.Associations
    // 6 baskets over items 1..5; triple {1,2,3} in baskets 1,2,3;
    // {1,2,4} in baskets 2,4; {3,4,5} in baskets 5,6
    val baskets = Seq(
      1L -> Seq(1L, 2L, 3L), 2L -> Seq(1L, 2L, 3L, 4L), 3L -> Seq(1L, 2L, 3L),
      4L -> Seq(1L, 2L, 4L), 5L -> Seq(3L, 4L, 5L), 6L -> Seq(3L, 4L, 5L))
    val df = baskets.flatMap { case (b, is) => is.map(b -> _) }.toDF("b", "i")
    val got = Associations.frequentTriples(df, col("b"), col("i"),
        minSupport = 2L)
      .as[(Long, Long, Long, Long)].collect().toSet
    // brute force: {1,2,3}: 3 baskets; {1,2,4}: 2; {3,4,5}: 2;
    // {1,3,4},{2,3,4}: 1 each (out)
    assert(got == Set((1L, 2L, 3L, 3L), (1L, 2L, 4L, 2L), (3L, 4L, 5L, 2L)))
    // at minSupport=1 pruning keeps every triple brute force finds
    val all = Associations.frequentTriples(df, col("b"), col("i"), 1L)
      .as[(Long, Long, Long, Long)].collect().toSet
    val brute = baskets.flatMap { case (_, is) =>
      is.sorted.combinations(3)
    }.groupBy(identity).map { case (t, o) => (t(0), t(1), t(2), o.size.toLong) }
    assert(all == brute.toSet)
    // a basket over maxBasket contributes no triples
    val withBig = df.union((10L to 16L).map(i => (9L, i)).toDF("b", "i"))
    val guarded = Associations.frequentTriples(withBig, col("b"), col("i"),
      minSupport = 1L, maxBasket = 6L)
    assert(guarded.filter(col("i1") >= 10L).count() == 0)
  }

  test("pmiBigrams ranks collocations above chance pairs, integer-exactly") {
    import graft.operators.TextAnalysis
    // "new york" always together (8x); "the" everywhere dilutes its pairs
    val docs = Seq.fill(8)("the new york times the story") ++
      Seq.fill(4)("the story the end")
    val df = docs.toDF("text")
    val top = TextAnalysis.pmiBigrams(df, "text", minCount = 5L, k = 5)
      .select("bigram", "pmi_ppm").as[(String, Long)].collect()
    assert(top.nonEmpty && top.head._1 == "new york",
      s"expected 'new york' as top collocation, got ${top.toSeq}")
    val scores = top.map(_._2)
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("ksDrift: equals brute-force KS; identical distributions give 0") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      val split = if (i % 3 == 0) "b" else "a"
      // shift b's distribution so D is non-trivial
      val v = rnd.nextInt(300).toLong + (if (split == "b") 40L else 0L)
      (v, split)
    }
    val df = rows.toDF("v", "s")
    val got = Stats.ksDrift(df, col("v"), col("s"), "a", "b", bucketShift = 4)
      .as[(Long, Long, Long, Double)].collect().head
    // brute force on the driver
    val as = rows.filter(_._2 == "a").map(_._1).sorted
    val bs = rows.filter(_._2 == "b").map(_._1).sorted
    val ta = as.length.toLong; val tb = bs.length.toLong
    val ksNum = (as ++ bs).distinct.map { v =>
      math.abs(as.count(_ <= v) * tb - bs.count(_ <= v) * ta)
    }.max
    assert(got == ((ta, tb, ksNum, ksNum.toDouble / (ta * tb).toDouble)))
    // partition-independence
    val re = Stats.ksDrift(df.repartition(13, col("v")), col("v"), col("s"),
      "a", "b", bucketShift = 4).as[(Long, Long, Long, Double)].collect().head
    assert(re == got)
    // same distribution on both sides -> D = 0
    val same = (1 to 100).flatMap(i => Seq((i.toLong, "a"), (i.toLong, "b")))
      .toDF("v", "s")
    val z = Stats.ksDrift(same, col("v"), col("s"), "a", "b")
      .as[(Long, Long, Long, Double)].collect().head
    assert(z._3 == 0L && z._4 == 0.0)
  }

  test("mergeIntervals: overlap and adjacency fuse, gaps split, per key") {
    import graft.operators.Intervals
    // key a: [0,10) ∪ [5,20) ∪ [20,30) -> one island [0,30) of 3
    //   ([20,30) is ADJACENT to the running end 20 — fuses);
    //   [40,50) is past a gap -> its own island.
    // key b: two disjoint singletons.
    val iv = Seq(("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 30L),
      ("a", 40L, 50L), ("b", 0L, 5L), ("b", 10L, 15L))
      .toDF("k", "s", "e")
    val got = Intervals.mergeIntervals(iv, col("k"), col("s"), col("e"))
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(got == Seq(("a", 0L, 30L, 3L), ("a", 40L, 50L, 1L),
      ("b", 0L, 5L, 1L), ("b", 10L, 15L, 1L)))
    // an interval fully CONTAINED in an earlier one must not re-open an
    // island even though its own end is small ([0,100) ⊃ [10,20))
    val nest = Seq(("n", 0L, 100L), ("n", 10L, 20L), ("n", 90L, 150L))
      .toDF("k", "s", "e")
    val g2 = Intervals.mergeIntervals(nest, col("k"), col("s"), col("e"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(g2 == Seq(("n", 0L, 150L, 3L)))
    // partition-independence (incl. duplicate intervals / start ties)
    val dup = iv.unionByName(Seq(("a", 0L, 10L)).toDF("k", "s", "e"))
    val p1 = Intervals.mergeIntervals(dup, col("k"), col("s"), col("e"))
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    val p2 = Intervals.mergeIntervals(dup.repartition(7),
        col("k"), col("s"), col("e"))
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(p1 == p2 && p1.head == (("a", 0L, 30L, 4L)))
  }

  test("cusumChangepoint: exact scaled statistic, argmax flag, partition-independent") {
    // series 5,5,5,9,9: T=33, N=5; deltas n·N−T = −8,−8,−8,12,12;
    // cusum = −8,−16,−24,−12,0 -> |max| at day 3
    val s = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 9L), (5L, 9L))
      .toDF("day", "n")
    val got = Stats.cusumChangepoint(s, "day", "n")
      .as[(Long, Long, Long, Boolean)].collect().sorted.toSeq
    assert(got == Seq((1L, 5L, -8L, false), (2L, 5L, -16L, false),
      (3L, 5L, -24L, true), (4L, 9L, -12L, false), (5L, 9L, 0L, false)))
    val rep = Stats.cusumChangepoint(s.repartition(5), "day", "n")
      .as[(Long, Long, Long, Boolean)].collect().sorted.toSeq
    assert(rep == got)
    // flat series: every cusum 0, every bucket tied at the max -> all true
    val flat = Seq((1L, 4L), (2L, 4L)).toDF("day", "n")
    val f = Stats.cusumChangepoint(flat, "day", "n")
      .as[(Long, Long, Long, Boolean)].collect().sorted.toSeq
    assert(f == Seq((1L, 4L, 0L, true), (2L, 4L, 0L, true)))
  }

  test("topPrincipalDirection: recovers the dominant direction, exactly normalized") {
    // rank-1 data along (0.3, 0.4): component ratio must be 3:4, the max
    // component exactly ±scale (floor asymmetry on negatives shifts the
    // small component by at most a few ulps of the 1e6 scale)
    val line = Seq(Array(0.3f, 0.4f), Array(-0.3f, -0.4f),
      Array(0.6f, 0.8f), Array(-0.6f, -0.8f)).toDF("v")
    val got = Stats.topPrincipalDirection(line, col("v"), dims = 2,
        rounds = 4)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(math.abs(got.find(_._1 == 1L).get._2.abs - 1000000L) == 0L)
    assert(math.abs(got.find(_._1 == 0L).get._2.abs - 750000L) <= 3L)
    // axis-aligned data: the other component is exactly 0
    val axis = Seq(Array(1.0f, 0.0f), Array(-1.0f, 0.0f),
      Array(2.0f, 0.0f)).toDF("v")
    val ax = Stats.topPrincipalDirection(axis, col("v"), dims = 2,
        rounds = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(ax.find(_._1 == 0L).get._2.abs == 1000000L)
    assert(ax.find(_._1 == 1L).get._2 == 0L)
    // bit-identical under repartitioning (integer arithmetic throughout)
    val rep = Stats.topPrincipalDirection(line.repartition(7), col("v"),
        dims = 2, rounds = 4)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(rep == got)
  }

  test("trendSlopes: exact ppm slopes, negative slopes, degenerate group NULL") {
    // up: y = 2x+1 -> slope exactly 2; down: y = 5−2x -> exactly −2
    // (sign-factored DIV must not truncate toward −∞); one-point group
    // has den = 0 -> NULL slope
    val pts = Seq(("up", 0L, 1L), ("up", 1L, 3L), ("up", 2L, 5L),
      ("down", 0L, 5L), ("down", 1L, 3L), ("down", 2L, 1L),
      ("one", 7L, 9L)).toDF("g", "x", "y")
    val got = Stats.trendSlopes(pts, col("g"), col("x"), col("y"))
      .select("group", "n_points", "slope_ppm")
      .as[(String, Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(got == Seq(("down", 3L, Some(-2000000L)),
      ("one", 1L, None), ("up", 3L, Some(2000000L))))
    val rep = Stats.trendSlopes(pts.repartition(5), col("g"), col("x"),
        col("y"))
      .select("group", "n_points", "slope_ppm")
      .as[(String, Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(rep == got)
  }

  test("autocorrelation: alternating series anti-correlates at lag 1, correlates at lag 2") {
    // 1,2,1,2: N=4, T=6, deltas −2,2,−2,2; den = 16
    // lag 1: 3 pairs, num = −12 -> −750000 ppm (negative DIV stays exact)
    // lag 2: 2 pairs, num = 8 -> 500000 ppm
    val s = Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, 2L)).toDF("day", "n")
    val got = Stats.autocorrelation(s, "day", "n", maxLag = 2)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L, -12L, 16L, -750000L),
      (2L, 2L, 8L, 16L, 500000L)))
    // a gap in the key drops exactly the pairs that straddle it
    val gap = Seq((1L, 1L), (2L, 2L), (4L, 2L)).toDF("day", "n")
    val g = Stats.autocorrelation(gap, "day", "n", maxLag = 1)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(g.head._2 == 1L) // only (1,2) pairs; (2,4) is not lag-1
    val rep = Stats.autocorrelation(s.repartition(3), "day", "n", maxLag = 2)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rep == got)
  }

  test("targetEncode: leave-one-out rational ppm, hand-checked") {
    // cat a: y = [1,0,1] (s_c=2, n_c=3); cat b: y = [0] (s_c=0, n_c=1)
    // global S=2 N=4, m=10:
    //  (a,y=1): 1e6*(4*(2-1)+10*2)/(4*(3-1+10)) = 1e6*24/48 = 500000
    //  (a,y=0): 1e6*(4*2+20)/48 = 1e6*28/48 = 583333 (floor)
    //  (b,y=0): 1e6*(0+20)/(4*10) = 500000
    val df = Seq((1L, "a", 1), (2L, "a", 0), (3L, "a", 1), (4L, "b", 0))
      .toDF("k", "c", "y")
    val out = Stats.targetEncode(df, col("k"), col("c"), col("y"),
        smoothing = 10L)
      .select("key", "enc_ppm").as[(Long, Long)].collect().toMap
    assert(out(1L) == 500000L && out(3L) == 500000L)
    assert(out(2L) == 583333L)
    assert(out(4L) == 500000L)
    // leave-one-out: row 2's own label is excluded, so its encoding is
    // HIGHER than the same-category positive rows' (which exclude a 1)
    assert(out(2L) > out(1L))
    val rep = Stats.targetEncode(df.repartition(7), col("k"), col("c"),
        col("y"), smoothing = 10L)
      .select("key", "enc_ppm").as[(Long, Long)].collect().toMap
    assert(rep == out)
  }

  test("abTestZ: hand-computed z in micros; degenerate groups are NULL") {
    // group g: v0 100 trials / 60 conv, v1 100 / 50
    val rows =
      (1 to 100).map(i => ("g", 0, if (i <= 60) 1L else 0L)) ++
      (1 to 100).map(i => ("g", 1, if (i <= 50) 1L else 0L)) ++
      // group all1: every trial converts -> p=1 -> NULL z
      Seq(("all1", 0, 1L), ("all1", 1, 1L)) ++
      // group onearm: variant 1 empty -> NULL z
      Seq(("onearm", 0, 1L), ("onearm", 0, 0L))
    val df = rows.toDF("g", "v", "y")
    val out = Stats.abTestZ(df, col("g"), col("v"), col("y")).collect()
      .map(r => r.getString(0) -> r).toMap
    val (c1, n1, c2, n2) = (60.0, 100.0, 50.0, 100.0)
    val z = ((c1 * n2 - c2 * n1) / (n1 * n2)) /
      math.sqrt(((c1 + c2) / (n1 + n2)) * (1.0 - (c1 + c2) / (n1 + n2)) *
        (1.0 / n1 + 1.0 / n2))
    assert(out("g").getLong(5) == math.floor(1000000.0 * z).toLong)
    assert(!out("g").getBoolean(6)) // |z| ~ 1.42 < 1.96
    assert(out("all1").isNullAt(5) && out("all1").isNullAt(6))
    assert(out("onearm").isNullAt(5))
    // a large effect is significant
    val big = ((1 to 100).map(i => ("h", 0, if (i <= 90) 1L else 0L)) ++
      (1 to 100).map(i => ("h", 1, if (i <= 10) 1L else 0L))).toDF("g", "v", "y")
    val bz = Stats.abTestZ(big, col("g"), col("v"), col("y")).collect().head
    assert(bz.getBoolean(6) && bz.getLong(5) > 1960000L)
  }

  test("rocAuc: separation 1.0, tie-heavy 0.5, reversal 0.0, degenerate NULL") {
    def auc(rows: Seq[(Double, Long)]): org.apache.spark.sql.Row = {
      val df = rows.zipWithIndex.map { case ((s, y), i) => (s, y, i.toLong) }
        .toDF("s", "y", "uid")
      Stats.rocAuc(df, col("s"), col("y"), col("uid")).collect().head
    }
    val perfect = auc(Seq((1.0, 0L), (2.0, 0L), (3.0, 1L), (4.0, 1L)))
    assert(perfect.getLong(2) == 1000000L)
    // all-tied groups: midranks 1.5/1.5/3.5/3.5 -> AUC exactly 1/2
    val tied = auc(Seq((1.0, 0L), (1.0, 1L), (2.0, 0L), (2.0, 1L)))
    assert(tied.getLong(2) == 500000L)
    val reversed = auc(Seq((1.0, 1L), (2.0, 1L), (3.0, 0L), (4.0, 0L)))
    assert(reversed.getLong(2) == 0L)
    val onlyPos = auc(Seq((1.0, 1L), (2.0, 1L)))
    assert(onlyPos.isNullAt(2))
    // partition-independent (bucketed rank, no global window)
    val df = (1 to 500).map(i => ((i % 37).toDouble, (i % 3 == 0).compare(false).toLong, i.toLong))
      .toDF("s", "y", "uid")
    val a = Stats.rocAuc(df, col("s"), col("y"), col("uid")).collect().head
    val b = Stats.rocAuc(df.repartition(13), col("s"), col("y"), col("uid"))
      .collect().head
    assert(a.getLong(2) == b.getLong(2))
  }

  test("groupedRocAuc: per-group AUCs match per-group rocAuc runs") {
    val rows =
      Seq(("a", 1.0, 0L), ("a", 2.0, 0L), ("a", 3.0, 1L), ("a", 4.0, 1L),
        ("b", 1.0, 1L), ("b", 2.0, 1L), ("b", 3.0, 0L), ("b", 4.0, 0L),
        ("c", 1.0, 1L), ("c", 2.0, 1L)) // single-class -> NULL
    val df = rows.zipWithIndex
      .map { case ((g, s, y), i) => (g, s, y, i.toLong) }
      .toDF("g", "s", "y", "uid")
    val out = Stats.groupedRocAuc(df, col("g"), col("s"), col("y"),
        col("uid"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(3) == 1000000L)
    assert(out("b").getLong(3) == 0L)
    assert(out("c").isNullAt(3))
    // agrees with the single-group operator run per slice
    for (g <- Seq("a", "b")) {
      val single = Stats.rocAuc(df.filter(col("g") === g), col("s"),
        col("y"), col("uid")).collect().head
      assert(single.getLong(2) == out(g).getLong(3))
    }
  }

  test("calibrationReport: exact per-bin conf/acc/gap and edge binning") {
    // bin 2: four rows at p=0.25, one positive -> conf 250000, acc 250000
    // bin 9: p=999999 and p=1000000 both clamp into the last bin
    val rows = Seq((250000L, 0L), (250000L, 0L), (250000L, 1L),
      (250000L, 0L), (999999L, 1L), (1000000L, 1L))
    val out = Stats.calibrationReport(rows.toDF("p", "y"), col("p"), col("y"),
        bins = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(2L, 9L))
    val b2 = out(2L)
    assert(b2.getLong(1) == 4L && b2.getLong(2) == 1L)
    assert(b2.getLong(3) == 250000L && b2.getLong(4) == 250000L &&
      b2.getLong(5) == 0L)
    val b9 = out(9L)
    assert(b9.getLong(1) == 2L && b9.getLong(2) == 2L)
    assert(b9.getLong(3) == (999999L + 1000000L) / 2)
    assert(b9.getLong(4) == 1000000L)
    assert(b9.getLong(5) == 1000000L - 1999999L / 2)
  }

  test("winsorizedStats: exact rank bounds, clip counts, clipped sum") {
    // group a: 1..20 -> lo rank ceil(1)=1 -> 1, hi rank ceil(19)=19 -> 19;
    // only the 20 clips (to 19): sum = 210 - 20 + 19 = 209
    val a = (1L to 20L).map(("a", _))
    // group b: constant -> bounds equal, nothing clips
    val b = Seq.fill(5)(("b", 7L))
    val df = (a ++ b).zipWithIndex
      .map { case ((g, v), i) => (g, v, i.toLong) }.toDF("g", "v", "uid")
    val out = Stats.winsorizedStats(df, col("g"), col("v"), col("uid"),
        loPct = 5, hiPct = 95)
      .collect().map(r => r.getString(0) -> r).toMap
    val ra = out("a")
    assert(ra.getLong(1) == 20L)
    assert(ra.getLong(2) == 1L && ra.getLong(3) == 19L)
    assert(ra.getLong(4) == 0L && ra.getLong(5) == 1L)
    assert(ra.getLong(6) == 209L)
    val rb = out("b")
    assert(rb.getLong(2) == 7L && rb.getLong(3) == 7L)
    assert(rb.getLong(4) == 0L && rb.getLong(5) == 0L && rb.getLong(6) == 35L)
    val rep = Stats.winsorizedStats(df.repartition(9), col("g"), col("v"),
        col("uid"), loPct = 5, hiPct = 95)
      .collect().map(r => r.getString(0) -> r.getLong(6)).toMap
    assert(rep == out.map { case (k, r) => k -> r.getLong(6) })
  }

  test("quantileNormalize: both sources map onto the pooled distribution") {
    // a: [10,20,30], b: [100,200,300]; N=6, n_s=3 -> target ranks 2,4,6 ->
    // pooled values 20,100,300 for BOTH sources (that is the point)
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 100L), (5L, "b", 200L), (6L, "b", 300L))
      .toDF("id", "src", "v")
    val out = Stats.quantileNormalize(df, col("id"), col("src"), col("v"),
        col("id"))
      .select("id", "v_norm").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 20L, 2L -> 100L, 3L -> 300L,
      4L -> 20L, 5L -> 100L, 6L -> 300L))
    // idempotence on a single source: normalizing against itself is the
    // identity (rank r of n maps to global rank r)
    val one = df.filter(col("src") === "a")
    val idm = Stats.quantileNormalize(one, col("id"), col("src"), col("v"),
        col("id"))
      .select("v", "v_norm").as[(Long, Long)].collect()
    assert(idm.forall { case (v, n) => v == n })
    val rep = Stats.quantileNormalize(df.repartition(7), col("id"),
        col("src"), col("v"), col("id"))
      .select("id", "v_norm").as[(Long, Long)].collect().toMap
    assert(rep == out)
  }

  test("adjustedRandIndex: hand example 1/6, perfect = 1e6, degenerate NULL") {
    // a=[1,1,1,2,2], b=[1,1,2,2,2]: s_cells=2, s_a=4, s_b=4, t=10 ->
    // ARI = (2·10·2 − 2·16)/(10·8 − 32) = 8/48 = 1/6
    val df = Seq((1, 1), (1, 1), (1, 2), (2, 2), (2, 2)).toDF("a", "b")
    val r = Stats.adjustedRandIndex(df, col("a"), col("b")).collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 4L && r.getLong(3) == 4L)
    assert(r.getLong(4) == 166666L)
    // identical partitions under renamed labels score exactly 1
    val perm = Seq((1, 9), (1, 9), (2, 7), (2, 7), (3, 5)).toDF("a", "b")
    val p = Stats.adjustedRandIndex(perm, col("a"), col("b")).collect().head
    assert(p.getLong(4) == 1000000L)
    // both sides one cluster: chance correction divides by zero -> NULL
    val one = Seq((1, 1), (1, 1), (1, 1)).toDF("a", "b")
    assert(Stats.adjustedRandIndex(one, col("a"), col("b"))
      .collect().head.isNullAt(4))
    val rep = Stats.adjustedRandIndex(df.repartition(7), col("a"), col("b"))
      .collect().head
    assert(rep.getLong(4) == 166666L)
  }

  test("benfordReport: leading digits of positives only, constant expectations") {
    val df = Seq(1L, 19L, 25L, 33L, 999L, 0L, -5L).toDF("x")
    val out = Stats.benfordReport(df, col("x")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 9L)) // 0 and -5 dropped
    val d1 = out(1L)
    assert(d1.getLong(1) == 2L)            // 1 and 19
    assert(d1.getLong(2) == 400000L)       // 2 of 5
    assert(d1.getLong(3) == 301029L)       // floor(1e6·log10(2))
    assert(d1.getLong(4) == 98971L)
    assert(out(9L).getLong(3) == 45757L)
    // expectations sum to ~1e6 (floor loss < 9 ppm)
    val exps = Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L,
      57991L, 51152L, 45757L)
    assert(exps.sum > 999990L && exps.sum <= 1000000L)
  }

  test("confusionMatrix: exact cells, class totals, diagonal ppm only") {
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"))
      .toDF("t", "p")
    val out = Stats.confusionMatrix(df, col("t"), col("p")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val aa = out(("a", "a"))
    assert(aa.getLong(2) == 1L && aa.getLong(3) == 2L && aa.getLong(4) == 1L)
    assert(aa.getLong(5) == 500000L && aa.getLong(6) == 1000000L)
    val ab = out(("a", "b"))
    assert(ab.getLong(2) == 1L && ab.isNullAt(5) && ab.isNullAt(6))
    val bb = out(("b", "b"))
    assert(bb.getLong(2) == 2L && bb.getLong(3) == 2L && bb.getLong(4) == 3L)
    assert(bb.getLong(5) == 1000000L && bb.getLong(6) == 666666L)
  }

  test("chiSquareDrift: zero on identical slices, grows with divergence") {
    val same = (1 to 300).map(i => (i % 2, s"t${i % 3}"))
      .toDF("slice", "bucket")
    val r0 = Stats.chiSquareDrift(same, col("slice"), col("bucket"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(r0 == ((150L, 150L, 3L, 0L)),
      s"identical per-bucket shares must give chi2 = 0, got $r0")
    // disjoint supports: chi2 = N in micros (each bucket contributes its
    // full count share)
    val disjoint = ((1 to 100).map(_ => (0, "only_a")) ++
      (1 to 100).map(_ => (1, "only_b"))).toDF("slice", "bucket")
    val r1 = Stats.chiSquareDrift(disjoint, col("slice"), col("bucket"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(r1._4 == 200000000L, s"disjoint slices: chi2 == N, got $r1")
    // an empty slice yields NULL
    val empty = (1 to 50).map(_ => (0, "x")).toDF("slice", "bucket")
    val r2 = Stats.chiSquareDrift(empty, col("slice"), col("bucket"))
      .select("chi2_micros").as[Option[Long]].collect().head
    assert(r2.isEmpty)
    // NULL-slice rows are in NEITHER arm: a bucket populated only by them
    // must not appear (it would inflate n_buckets / degrees of freedom)
    val withNulls = ((1 to 100).map(i => (Some(i % 2), s"t${i % 3}")) ++
      (1 to 40).map(_ => (None: Option[Int], "null_only")))
      .toDF("slice", "bucket")
    val r3 = Stats.chiSquareDrift(withNulls, col("slice"), col("bucket"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(r3._1 == 50L && r3._2 == 50L && r3._3 == 3L,
      s"NULL-slice rows must not count or create buckets, got $r3")
  }

  test("spearmanRho: monotone = 1e6, reversed = -1e6, ties use midranks") {
    val n = 200
    val mono = (1 to n).map(i => (i.toLong, (i * i).toLong, i.toLong))
      .toDF("x", "y", "uid")
    def rho(df: org.apache.spark.sql.DataFrame): Option[Long] =
      Stats.spearmanRho(df, col("x"), col("y"), col("uid"))
        .select("rho_micros").as[Option[Long]].collect().head
    assert(rho(mono).contains(1000000L), "any monotone map has rho = 1")
    val rev = (1 to n).map(i => (i.toLong, (n - i).toLong, i.toLong))
      .toDF("x", "y", "uid")
    assert(rho(rev).contains(-1000000L))
    assert(rho((1 to n).map(i => (i.toLong, 7L, i.toLong))
      .toDF("x", "y", "uid")).isEmpty, "constant column -> NULL")
    // tie handling: hand-check against scipy's definition on a tiny case
    // x = 1,2,2,3; y = 10,20,20,40 -> perfectly concordant with ties on
    // both sides at the same rows -> rho = 1
    val tied = Seq((1L, 10L, 1L), (2L, 20L, 2L), (2L, 20L, 3L), (3L, 40L, 4L))
      .toDF("x", "y", "uid")
    assert(rho(tied).contains(1000000L))
    // partition independence
    assert(rho(mono.repartition(13)) == rho(mono))
  }

  test("covarianceMatrix: exact fixed-point moments on constructed dims") {
    // dim0 = i, dim1 = -i (perfect anti-correlation), dim2 = constant
    val n = 100
    val rows = (1 to n).map { i =>
      (i.toLong, Seq(i / 1000.0f, -i / 1000.0f, 0.5f))
    }
    val out = Stats.covarianceMatrix(rows.toDF("vec_id", "embedding"),
        col("vec_id"), col("embedding"), dims = 3)
      .orderBy("d1", "d2")
      .as[(Int, Int, Long, Long)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) ==
      Seq((0, 1), (0, 2), (1, 2)).flatMap(_ => Nil) ++
      Seq((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)))
    val m = out.map(r => (r._1, r._2) -> r._4).toMap
    // recompute cov(0,0) exactly from the fixed-point values
    val xs = (1 to n).map(i =>
      math.floor((i / 1000.0f).toDouble * 1000000).toLong)
    val sx = xs.sum; val sxx = xs.map(v => v * v).sum
    val expected00 = (n.toLong * sxx - sx * sx) / (n.toLong * n)
    assert(m((0, 0)) == expected00)
    assert(m((1, 1)) == expected00, "negated dim has identical variance")
    assert(m((0, 1)) <= -expected00 + 1 && m((0, 1)) >= -expected00 - 1,
      s"anti-correlated dims: cov = -var, got ${m((0, 1))} vs -$expected00")
    assert(m((2, 2)) == 0L && m((0, 2)) == 0L && m((1, 2)) == 0L,
      "constant dim has zero (co)variance")
  }
}
