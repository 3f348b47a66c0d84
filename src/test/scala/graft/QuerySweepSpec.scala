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

  /** Whole-surface plan-shape guard: no declared query may plan a
    * Cartesian product or an unpartitioned (single-partition) WindowExec —
    * the two shapes that cannot survive a 100 TB input. Exceptions are
    * explicit and bounded:
    *  - `q_join_size_est` combines two 1-row scalar frames (a bounded
    *    1×1 nested-loop cross, not a data-sized product);
    *  - the IVF/PQ family crosses data rows with a ≤ nlist/ksub-row
    *    centroid table — bounded by config, inherent to assignment.
    */
  private val boundedCrossAllowed = Set(
    "q_join_size_est", "sim_ivf_topk", "sim_pq_topk", "sim_ivfpq_topk")

  test("no declared query plans a data-sized cross product or global window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, TestSpark.sf).queryExecution.executedPlan
        val globalWindows = plan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
        }
        val crosses = plan.collect {
          case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
          case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
            if !boundedCrossAllowed(name) => j
        }
        (if (globalWindows.nonEmpty) Seq(s"$name: unpartitioned WindowExec")
         else Nil) ++
          (if (crosses.nonEmpty) Seq(s"$name: ${crosses.head.nodeName}") else Nil)
    }
    assert(offenders.isEmpty, s"scale-hostile plan shapes:\n${offenders.mkString("\n")}")
  }
}
