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
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's Parquet reader
    * rejects by default; the legacy flag reads it as LongType nanoseconds
    * since the epoch. We keep the raw nanos (`ts_ns`, exact integer
    * event-time arithmetic) and derive a microsecond-truncated TimestampType
    * `ts` — the same truncation DuckDB applies casting TIMESTAMP_NS →
    * TIMESTAMP, so both engines see identical values.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // GraftSession.create sets the flag at session build; sessions created
    // elsewhere (tests, notebooks) get it here — guarded, so a query
    // builder never mutates an already-correct session.
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withEventTime(load(s, d, "events"))
  }

  /** Shared ts derivation for batch and streaming event reads: raw nanos →
    * (`ts_ns`, microsecond-truncated `ts`). One definition so the
    * stream-equals-batch tests can't drift.
    */
  def withEventTime(raw: DataFrame): DataFrame =
    raw
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
