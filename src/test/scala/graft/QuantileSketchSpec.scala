package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats

/** Canonical q-digest: the shard-merge ≡ one-pass EQUALITY law, the
  * provable ε·n rank-error bound, the space bound, and partition sanity —
  * every property the sketch's scaladoc claims.
  */
class QuantileSketchSpec extends AnyFunSuite {
  private val spark0 = TestSpark.spark
  import spark0.implicits._

  private val maxBits = 20
  private val epsPpm = 10000L // 1%
  private val probes = Seq(10000L, 250000L, 500000L, 750000L, 990000L)

  // deterministic multiplicative-hash spread over [0, 2^20) plus one HEAVY
  // value (5000 copies — far above T) to exercise the exact-leaf path
  private val heavy = (1L << 19) + 12345L
  private def values: Seq[Long] =
    (0 until 20000).map(i => (i * 2654435761L) % (1L << 20)) ++
      Seq.fill(5000)(heavy)

  test("shard-merge of node counts equals the one-pass digest bit-for-bit") {
    val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val onePass = Stats.qdigestQuantiles(df, col("v"), maxBits, epsPpm, probes)
      .collect().toSeq
    // three shards -> per-shard sketches -> merge = union + sum. The law
    // is exact because node counts are exact sums, and the partition
    // selection is a pure function of the merged counts.
    val mergedNodes = (0 until 3)
      .map(i => Stats.qdigestNodeCounts(
        df.filter(col("id") % 3 === i), col("v"), maxBits))
      .reduce(_ unionByName _)
      .groupBy("lev", "node").agg(sum("cn").as("cn"))
    val mergedPart = Stats.qdigestPartition(mergedNodes, maxBits, epsPpm)
    val directPart = Stats.qdigestPartition(
      Stats.qdigestNodeCounts(df, col("v"), maxBits), maxBits, epsPpm)
    assert(mergedPart.collect().toSet == directPart.collect().toSet,
      "merged-shard partition must equal the one-pass partition EXACTLY")
    // and the quantile answers derived from the merged partition agree
    val n = values.size.toLong
    val merged = probes.toDF("q_ppm")
      .select(col("q_ppm"), greatest(lit(1L),
        expr(s"CAST((CAST(q_ppm AS DECIMAL(38,0)) * ${n}L + 999999) " +
          "DIV 1000000 AS BIGINT)")).as("rk"))
      .join(mergedPart, col("cum_below") < col("rk") &&
        col("rk") <= col("cum_below") + col("cnt"))
      .select(col("q_ppm"), col("v_lo"), col("v_hi"), col("cum_below"),
        col("cnt").as("cnt_in"))
      .collect().toSeq
    assert(merged.toSet == onePass.toSet)
  }

  test("every probe's true rank-r value lies in [v_lo, v_hi]; width <= eps*n") {
    val df = values.toDF("v")
    val n = values.size.toLong
    val t = math.max(1L, epsPpm * n / 1000000L)
    val sorted = values.sorted
    val got = Stats.qdigestQuantiles(df, col("v"), maxBits, epsPpm, probes)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == probes.size, "exactly one interval per probe")
    got.foreach { case (q, lo, hi, cum, cnt) =>
      val r = math.max(1L, (q * n + 999999L) / 1000000L)
      assert(cum < r && r <= cum + cnt,
        s"q=$q: rank window ($cum, ${cum + cnt}] must contain r=$r")
      val exact = sorted((r - 1).toInt)
      assert(lo <= exact && exact <= hi,
        s"q=$q: exact rank-$r value $exact outside [$lo, $hi]")
      assert(lo == hi || cnt <= t,
        s"q=$q: non-leaf interval count $cnt exceeds T=$t")
    }
    // the heavy value dominates the median: its interval must be the
    // EXACT leaf (the digest cannot split a single value, so it reports
    // it with zero value-width regardless of T)
    val med = got.find(_._1 == 500000L).get
    assert(med._2 == heavy && med._3 == heavy && med._5 == 5000L,
      s"median must pin the heavy value exactly: $med")
  }

  test("partition is disjoint, covers all mass, and respects the space bound") {
    val df = values.toDF("v")
    val n = values.size.toLong
    val t = math.max(1L, epsPpm * n / 1000000L)
    val part = Stats.qdigestPartition(
        Stats.qdigestNodeCounts(df, col("v"), maxBits), maxBits, epsPpm)
      .as[(Int, Long, Long, Long, Long)].collect()
      .sortBy(_._2)
    assert(part.map(_._4).sum == n, "interval counts must sum to n")
    part.sliding(2).foreach {
      case Array((_, _, hi1, _, _), (_, lo2, _, _, _)) =>
        assert(hi1 < lo2, s"intervals must be disjoint and ordered")
      case _ => ()
    }
    // cum_below consistency against a direct prefix sum
    var running = 0L
    part.foreach { case (_, lo, _, cnt, cum) =>
      assert(cum == running, s"cum_below drift at v_lo=$lo: $cum != $running")
      running += cnt
    }
    val bound = (maxBits + 1).toLong * (2L * n / t + 2L)
    assert(part.length <= bound,
      s"digest size ${part.length} exceeds the space theorem bound $bound")
    // non-leaf parts respect T; the heavy value forms an exact leaf
    part.filter(p => p._2 < p._3).foreach { p =>
      assert(p._4 <= t, s"non-leaf part over threshold: $p") }
    assert(part.exists(p => p._2 == heavy && p._3 == heavy && p._4 == 5000L))
  }

  test("empty input yields no rows; out-of-range values are rejected") {
    val empty = Seq.empty[Long].toDF("v")
    assert(Stats.qdigestQuantiles(empty, col("v"), maxBits, epsPpm, probes)
      .count() == 0)
    val neg = Seq(-1L, 5L).toDF("v")
    val e = intercept[IllegalArgumentException] {
      Stats.qdigestQuantiles(neg, col("v"), maxBits, epsPpm, probes).count()
    }
    assert(e.getMessage.contains("outside [0, 2^"))
    val big = Seq(1L << 21, 5L).toDF("v")
    intercept[IllegalArgumentException] {
      Stats.qdigestQuantiles(big, col("v"), 20, epsPpm, probes).count()
    }
  }
}
