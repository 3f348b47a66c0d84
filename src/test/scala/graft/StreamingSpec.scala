package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AvailableNow streaming tumbling agg equals the batch computation") {
    val stream = Streams.eventsStream(spark, TestSpark.sf)
    // complete mode so the memory sink holds final per-window rows even
    // without future batches advancing the watermark
    val got = Streams.runAvailableNow(spark,
        Streams.tumblingCounts(stream), "t_tumbling", outputMode = "complete")
      .select("bucket_start", "event_type", "n_events", "total_value")
      .collect().map(_.toSeq).toSet

    val batch = EventQueries.all("w_tumbling")(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("watermarked dedupe drops in-batch duplicates") {
    val stream = Streams.eventsStream(spark, TestSpark.sf)
    val doubled = stream.union(stream) // duplicate every event
    val out = Streams.runAvailableNow(spark,
      Streams.dedupeWithWatermark(doubled, Seq("event_id")), "t_dedupe")
    val n = out.count()
    val expected = Tables.events(spark, TestSpark.sf).count()
    assert(n == expected)
  }

  test("streaming session windows match batch sessionization session count") {
    val stream = Streams.eventsStream(spark, TestSpark.sf)
    val sessions = Streams.runAvailableNow(spark,
      Streams.sessionAggregate(stream), "t_sessions", outputMode = "complete")
    val batchSessions = EventQueries.all("q_sessionize")(spark, TestSpark.sf)
    assert(sessions.count() == batchSessions.count())
    assert(sessions.agg(sum("n_events")).head().getLong(0) ==
      Tables.events(spark, TestSpark.sf).count())
  }
}
