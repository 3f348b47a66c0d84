package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pipeline

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("P1 keep-list projection is case-insensitive and keeps source casing") {
    val df = Seq((1, "x", 2.0)).toDF("Alpha", "BETA", "gamma")
    val out = Pipeline.keepColumns(df, Seq("ALPHA", "Gamma", "missing"))
    assert(out.columns.toSeq == Seq("Alpha", "gamma"))
  }

  test("P2 non-empty filter drops '' but keeps nulls (pandas semantics)") {
    val df = Seq(Some("a"), Some(""), None).toDF("c")
    val out = Pipeline.filterNonEmpty(df, "c").collect().map(_.getAs[String]("c"))
    assert(out.toSet == Set("a", null))
  }

  test("F3 bool-string normalization replaces exactly 'True'/'False'") {
    val df = Seq(("True", "x"), ("False", "True-ish"), ("other", "False"))
      .toDF("a", "b")
    val rows = Pipeline.normalizeBoolStrings(df).as[(String, String)].collect().toSet
    assert(rows == Set(("1", "x"), ("0", "True-ish"), ("other", "0")))
  }

  test("U1 union-by-name fills drifted columns with null and keeps dups") {
    val f1 = Seq((1, "a")).toDF("id", "name")
    val f2 = Seq((1, 5.0)).toDF("id", "score")
    val out = Pipeline.unionAll(Seq(f1, f2, f1))
    assert(out.count() == 3)
    assert(out.columns.toSet == Set("id", "name", "score"))
    assert(out.filter(col("score").isNull).count() == 2)
  }

  test("U1 empty-input union requires explicit schema (documented)") {
    intercept[IllegalArgumentException](Pipeline.unionAll(Seq.empty))
  }

  test("W1 idempotency law: applying the load twice equals once") {
    val existing = Seq((1L, 1L, "old")).toDF("k1", "k2", "v")
    val batch = Seq((1L, 1L, "dup"), (2L, 1L, "new"), (2L, 1L, "batchdup"))
      .toDF("k1", "k2", "v")
    val once = Pipeline.idempotentNewRows(batch, existing, Seq("k1", "k2"))
    assert(once.count() == 1)
    assert(once.select("k1").as[Long].head() == 2L)
    // second application against the grown sink adds nothing
    val sink2 = existing.select("k1", "k2").union(once.select("k1", "k2"))
    val twice = Pipeline.idempotentNewRows(batch, sink2, Seq("k1", "k2"))
    assert(twice.count() == 0)
  }

  test("W4 merge upsert: matched rows update, unmatched insert, rest keep") {
    val target = Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("k", "name", "bal")
    val source = Seq((2, 99.0), (3, 30.0)).toDF("k", "bal")
    val out = Pipeline.mergeUpsert(target, source, Seq("k"), Seq("name", "bal"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getAs[Any]("name"), r.getDouble(2))).toSeq ==
      Seq((1, "a", 10.0), (2, "b", 99.0), (3, null, 30.0)))
  }

  test("F1 split yields 1-element array when no delimiter (reference exact)") {
    val df = Seq("a,b", "solo").toDF("s")
    val out = df.select(Pipeline.splitPacked(col("s")).as("arr"))
      .as[Seq[String]].collect().toSet
    assert(out == Set(Seq("a", "b"), Seq("solo")))
  }

  test("F2 per-element URL qualification via transform HOF") {
    val df = Seq((Seq("x.jpg", "y.jpg"), "http://b/")).toDF("names", "base")
    val out = df.select(Pipeline.qualifyUrls(col("names"), col("base")).as("u"))
      .as[Seq[String]].head()
    assert(out == Seq("http://b/x.jpg", "http://b/y.jpg"))
  }

  test("F1/F2 round-trip property: concat_ws o split is identity") {
    val strings = Seq("a", "a,b", "a,b,c", "x.png", "one,two,three,four")
    val df = strings.toDF("s")
      .select(col("s"), concat_ws(",", Pipeline.splitPacked(col("s"))).as("rt"))
    assert(df.filter(col("s") =!= col("rt")).count() == 0)
  }

  test("SCD2 compresses no-op updates and chains validity intervals") {
    // key A: v changes 1 -> 1 (no-op) -> 2 -> null -> null (no-op) -> 2
    val log = Seq(
      ("A", 10L, Some(1)), ("A", 20L, Some(1)), ("A", 30L, Some(2)),
      ("A", 40L, None), ("A", 50L, None), ("A", 60L, Some(2)),
      ("B", 15L, Some(7))
    ).toDF("k", "o", "v")
    val out = Pipeline.scd2Intervals(log, col("k"), col("o"), col("v"))
      .orderBy("key", "valid_from")
      .as[(String, Long, Option[Long], Option[Int], Int)].collect().toSeq
    assert(out == Seq(
      ("A", 10L, Some(30L), Some(1), 0),
      ("A", 30L, Some(40L), Some(2), 0),
      ("A", 40L, Some(60L), None, 0),   // NULL value is a real version
      ("A", 60L, None, Some(2), 1),     // re-appearing value reopens
      ("B", 15L, None, Some(7), 1)))
  }

  test("SCD2 output is partitioning-independent") {
    val log = Tables.events(spark, TestSpark.sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("k"), col("ts_ns").as("o"),
        expr("CAST(round(value * 100) AS BIGINT) DIV 5000").as("v"))
    val a = Pipeline.scd2Intervals(log, col("k"), col("o"), col("v"))
    val b = Pipeline.scd2Intervals(log.repartition(7, col("o")),
      col("k"), col("o"), col("v"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("applyChangelog: latest seq wins, trailing delete drops the key, delete-then-insert revives") {
    val log = Seq(
      (1L, 1L, "I", 10L), (1L, 3L, "U", 30L), (1L, 2L, "U", 20L), // 1 -> 30
      (2L, 1L, "I", 11L), (2L, 2L, "D", 0L),                      // 2 gone
      (3L, 1L, "D", 0L), (3L, 2L, "I", 42L)                       // 3 revived
    ).toDF("k", "seq", "op", "v")
    val got = Pipeline.applyChangelog(log, Seq("k"), "seq", "op")
      .as[(Long, Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L, "U", 30L), (3L, 2L, "I", 42L)))
    val rep = Pipeline.applyChangelog(log.repartition(5), Seq("k"),
        "seq", "op")
      .as[(Long, Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(rep == got)
  }

  test("session env-int parsing: curated error for every malformed value") {
    assert(GraftSession.parsePositiveInt("X", "32") == 32)
    assert(GraftSession.parsePositiveInt("X", Int.MaxValue.toString) ==
      Int.MaxValue)
    // every rejection path carries the variable name, including values past
    // Int.MaxValue that a regex-then-toInt check would let through to a raw
    // NumberFormatException at session build
    for (bad <- Seq("0", "-4", "abc", "", "99999999999",
        "12345678901234567890")) {
      val e = intercept[IllegalArgumentException](
        GraftSession.parsePositiveInt("SPARK_GRAFT_INITIAL_PARTITIONS", bad))
      assert(e.getMessage.contains("SPARK_GRAFT_INITIAL_PARTITIONS"),
        s"value '$bad' lost the curated message: ${e.getMessage}")
    }
  }
}
