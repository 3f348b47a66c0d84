package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] demonstrates one operator row from SURVEY.md §2
  * (or an extension operator) as an idiomatic Spark DataFrame program over
  * the fixture tables; [[oracleSql]] carries the DuckDB-equivalent ANSI SQL
  * the driver hash-compares against at sf0.01.
  *
  * Determinism rules applied throughout (so Spark and DuckDB hash-match):
  *  - money/double aggregates are computed over DECIMAL(18,2) casts (exact,
  *    order-independent) and cast back to DOUBLE for schema parity;
  *  - every query ends in an ORDER BY on a unique key set;
  *  - no floating-point accumulation order dependence anywhere.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's only true relational query is the `image_urls` view
    * (reference dags/add_image_data.py:32-52): fact ⋈ dim on a uid, filter on
    * status, date-truncated projection, 1-based array subscript. Transposed
    * onto the fixtures: orders ⋈ customer, status filter, per-flag revenue.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("j1_join_filter")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.all ++ EventQueries.all ++ ExtensionQueries.all ++
      CompositeQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ EventQueries.oracle ++ ExtensionQueries.oracle ++
      CompositeQueries.oracle
}
