package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must execute at sf0.001 — a fast whole-surface
  * regression net (schema errors, unresolved columns, runtime exceptions).
  */
class QuerySweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, TestSpark.sf)
      assert(df.count() >= 0)
    }
  }
}
