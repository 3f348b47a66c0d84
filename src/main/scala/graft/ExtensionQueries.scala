package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** North-star extension operators (dedup, similarity search, text analysis,
  * multimodal) — populated as each operator lands. */
object ExtensionQueries {
  val all: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracle: Map[String, String] = Map()
}
