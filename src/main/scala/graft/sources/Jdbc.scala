package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink (SURVEY.md §2.1 S4/S5, W5): the reference's entire sink
  * layer is relational — Postgres reads/writes
  * (reference dags/evidence_images_processing.py:232-242,269-275) and MSSQL
  * scan + writeback (reference dags/add_image_data.py:54-89). Spark's JDBC
  * data source covers both ends; these wrappers pin the options that matter
  * at scale and are exercised against an in-JVM Derby database in JdbcSpec
  * (the container has no external DB server).
  *
  * Scale notes:
  *  - [[read]] is a SINGLE-partition scan — fine for dimension-sized tables,
  *    wrong for facts. Use [[readPartitioned]] for anything big: Spark
  *    issues `numPartitions` range-bounded queries in parallel, one per
  *    executor slot, and pushes filters/column pruning into each
  *    (`.explain` shows PushedFilters in the JDBCRelation scan).
  *  - [[write]] batches inserts (`batchsize`); at 100 TB scale the
  *    relational side is the bottleneck — coalesce to a bounded number of
  *    connections rather than one-per-core.
  */
object Jdbc {

  private def props(extra: Map[String, String]): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Whole-table (or pushed-down subquery) scan over one connection. `table`
    * may be a table name or a parenthesized subquery alias, mirroring the
    * reference's hook-with-SQL reads.
    */
  def read(spark: SparkSession, url: String, table: String,
           options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, props(options))

  /** Range-partitioned parallel scan — the 100 TB shape: `numPartitions`
    * concurrent range queries on `partitionColumn` between the bounds.
    */
  def readPartitioned(
      spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props(options))

  /** Batched insert into a relational table. `numConnections` bounds the
    * parallel connection count (a 1000-executor cluster must not open 1000
    * sessions against one database).
    */
  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Append,
            numConnections: Int = 8,
            options: Map[String, String] = Map.empty): Unit = {
    // coalesce never raises a partition count, so no pre-check needed
    df.coalesce(numConnections).write.mode(mode).jdbc(url, table, props(options))
  }
}
