package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Optimization-round measurement utility: dump `.explain("formatted")`
  * for named declared queries to `plans/<tag>/<query>_<suffix>.txt`.
  *
  * Usage: `scripts/run_main.sh graft.ExplainDump <sfDir> <outDir> <suffix> [query...]`
  * (no query args = every declared query). The formatted plan is the
  * static one (pre-execution); AQE stays ON so join-strategy choices
  * reflect what the bench actually runs at planning time — runtime
  * re-optimizations (coalesced reads, demotions) are noted by the
  * `AdaptiveSparkPlan isFinalPlan=false` header they carry.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <sfDir> <outDir> <suffix> [query...]")
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(appName = "graft-explain",
      master = s"local[$cpus]",
      shufflePartitions = GraftSession.envShufflePartitions
        .orElse(Some(cpus.toInt)))
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val txt =
        try {
          val qe = fn(spark, sfDir).queryExecution
          qe.explainString(org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        } catch { case e: Exception => s"PLANNING FAILED: ${e.getMessage}" }
      Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"[explain] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
