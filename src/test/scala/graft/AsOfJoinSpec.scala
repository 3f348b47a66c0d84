package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("backward as-of equals per-row brute force on the events fixture") {
    val ev = Tables.events(spark, TestSpark.sf)
    val left = ev.select("event_id", "user_id", "ts", "event_type")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("pts"))
      .agg(max(col("value")).as("pval"))
    val got = AsOfJoin.asOfBackward(left, purchases, Seq("user_id"), "ts", "pts")
      .select(col("event_id"), col("pts_matched").cast("long"), col("pval"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val ls = left.select(col("event_id"), col("user_id"), col("ts").cast("long"))
      .as[(Long, Long, Long)].collect()
    val rs = purchases
      .select(col("user_id"), col("pts").cast("long"), col("pval"))
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1)
    for ((eid, uid, t) <- ls) {
      val expect = rs.getOrElse(uid, Array.empty)
        .filter(_._2 <= t)
        .sortBy(_._2).lastOption.map(p => (Some(p._2), Some(p._3)))
        .getOrElse((None, None))
      assert(got(eid) == expect, s"event $eid user $uid")
    }
    assert(ls.nonEmpty && got.values.exists(_._1.isDefined))
  }

  test("inner as-of drops unmatched left rows; left keeps them as nulls") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 15L, 1.0), (2L, 7L, 2.0))
      .toDF("k", "rt", "v")
    val lt = l.withColumn("t", timestamp_micros(col("t")))
    val rt = r.withColumn("rt", timestamp_micros(col("rt")))
    val leftJoin = AsOfJoin.asOfBackward(lt, rt, Seq("k"), "t", "rt")
    assert(leftJoin.count() == 3)
    assert(leftJoin.filter(col("v").isNull).count() == 2) // (1,10) and (2,5)
    val inner = AsOfJoin.asOfBackward(lt, rt, Seq("k"), "t", "rt", "inner")
    assert(inner.count() == 1)
    assert(inner.head().getAs[String]("tag") == "b")
  }

  test("matched right row is carried atomically — a NULL field is not backfilled") {
    // right rows: (t=5, v=1.0), (t=10, v=NULL); left at t=12 must see
    // (rt=10, v=NULL) — never the torn (rt=10, v=1.0)
    val l = Seq((1L, 12L)).toDF("k", "t")
      .withColumn("t", timestamp_micros(col("t")))
    val r = Seq((1L, 5L, Some(1.0)), (1L, 10L, None))
      .toDF("k", "rt", "v")
      .withColumn("rt", timestamp_micros(col("rt")))
    val out = AsOfJoin.asOfBackward(l, r, Seq("k"), "t", "rt")
      .select(unix_micros(col("rt_matched")), col("v")).head()
    assert(out.getLong(0) == 10L)
    assert(out.isNullAt(1))
  }

  test("exactly-at-time right row matches (>= semantics)") {
    val l = Seq((1L, 10L)).toDF("k", "t")
      .withColumn("t", timestamp_micros(col("t")))
    val r = Seq((1L, 10L, 9.0)).toDF("k", "rt", "v")
      .withColumn("rt", timestamp_micros(col("rt")))
    val out = AsOfJoin.asOfBackward(l, r, Seq("k"), "t", "rt")
    assert(out.head().getAs[Double]("v") == 9.0)
  }

  test("colliding right value columns are rejected with a clear error") {
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "v")
    val r = Seq((1L, 5L, "y")).toDF("k", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfBackward(l, r, Seq("k"), "t", "rt")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("range join equals brute-force interval scan; bucket width is semantics-free") {
    import graft.operators.RangeJoin
    val ev = Tables.events(spark, TestSpark.sf)
    val left = ev.select(col("user_id"), col("ts"), col("event_id"))
    val wins = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("window_id"),
        col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 1 DAY")).as("w_end"))
    def run(width: Long) = RangeJoin.pointInInterval(
        left, wins, Seq("user_id"), "ts", "w_start", "w_end", width)
      .select(col("window_id"), col("event_id"))
      .as[(Long, Long)].collect().toSet
    val narrow = run(3600L)
    val wide = run(7 * 86400L)
    assert(narrow == wide)

    val ls = left.select(col("user_id"), col("ts").cast("long"), col("event_id"))
      .as[(Long, Long, Long)].collect()
    val ws = wins.select(col("user_id"), col("window_id"),
        col("w_start").cast("long"), col("w_end").cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    val brute = (for {
      (u, t, eid) <- ls; (wu, wid, s0, e0) <- ws
      if u == wu && t >= s0 && t <= e0
    } yield (wid, eid)).toSet
    assert(narrow == brute)
    assert(brute.nonEmpty)
  }
}
