package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query on SPARK_GRAFT_SF_DIR and
  * prints exactly one JSON line. A warmup pass at sf0.001 first exercises
  * each query's codegen + JIT so measured times reflect steady-state
  * execution, not first-compile overhead. Queries materialize through the
  * noop sink (a bare count() lets Catalyst prune the projection work being
  * measured). Failing queries are reported in an "errors" field rather
  * than silently timed as near-zero successes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors(), 32).toString)
    val spark = GraftSession.create(
      appName = "graft-bench",
      master = s"local[$cpus]",
      shufflePartitions = Some(cpus.toInt))
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
            dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()

    val warmDir = "/root/testdata/sf0.001"
    if (warmDir != sfDir && new java.io.File(warmDir).isDirectory) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try run(fn, warmDir) catch { case _: Exception => () }
      }
    }
    // one-time fixture materialization (mm_binary's on-disk blobs) runs
    // outside the timed loop — it is test-data generation, not query work
    try graft.sources.Multimodal.ensureFixtureFiles(spark,
      Tables.documents(spark, sfDir), graft.sources.Multimodal.fixtureDir(sfDir))
    catch { case _: Exception => () }

    val errors = scala.collection.mutable.ListBuffer[String]()
    // a failed query reports -1 and contributes nothing to the total, so
    // the headline number reflects successful executions only
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val elapsed =
        try { run(fn, sfDir); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Exception =>
          errors += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
