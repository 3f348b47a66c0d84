package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated fixture tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives `(spark, sfDir)` and reads
  * only through these helpers so the scan always goes through the vectorized
  * Parquet reader with column pruning / predicate pushdown intact.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet has carried two physical `ts` encodings across fixture
    * generations: TIMESTAMP(NANOS) (read as LongType nanos under the legacy
    * flag) and TIMESTAMP(MICROS) (read as TimestampType/TimestampNTZType).
    * Queries are written against a stable contract — integer nanosecond
    * `ts_ns` for exact event-time arithmetic plus a TimestampType `ts` —
    * so [[withEventTime]] normalizes whichever encoding the file has.
    * DuckDB's `epoch_ns(ts)` over the same file yields the same integers
    * either way (µs-encoded files carry µs precision in both engines).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // GraftSession.create sets the flag at session build; sessions created
    // elsewhere (tests, notebooks) get it here — guarded, so a query
    // builder never mutates an already-correct session.
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withEventTime(load(s, d, "events"))
  }

  /** Shared ts derivation for batch and streaming event reads → the
    * (`ts_ns`, TimestampType `ts`) contract. One definition so the
    * stream-equals-batch tests can't drift. Works on streaming frames
    * (schema inspection only — no actions). The NTZ→LTZ cast is exact
    * under the session's UTC timezone (GraftSession).
    */
  def withEventTime(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        raw
          .withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
