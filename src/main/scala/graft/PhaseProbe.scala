package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Optimization-round diagnostic: decompose each declared query's wall
  * time into Catalyst phase durations (parsing/analysis/optimization/
  * planning from `QueryExecutionTracker`) vs execution, and count the
  * jobs/stages/tasks the noop-sink action schedules. Answers "is the
  * tail overhead planning-side or scheduling-side" — the question the
  * bench total alone cannot (guide §1.1, §7.3).
  *
  * Usage: `scripts/run_main.sh graft.PhaseProbe <sfDir> [query...]`
  * (no args = every declared query; one untimed warmup rep then one
  * measured rep each).
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PhaseProbe <sfDir> [query...]")
    val sfDir = args(0)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(appName = "graft-phaseprobe",
      master = s"local[$cpus]",
      shufflePartitions = GraftSession.envShufflePartitions
        .orElse(Some(cpus.toInt)))
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_PROBE_INFO=1: surface scheduler timings for one-query runs
    if (sys.env.get("SPARK_GRAFT_PROBE_INFO").contains("1"))
      try org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.scheduler.DAGScheduler",
        org.apache.logging.log4j.Level.INFO)
      catch { case _: Throwable => () }

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    }
    spark.sparkContext.addSparkListener(listener)

    println(f"${"query"}%-32s ${"wall_s"}%8s ${"plan_s"}%8s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s")
    var totW = 0.0; var totP = 0.0; var totJ = 0; var totT = 0L
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try {
        // warmup rep (codegen/JIT), untimed
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        jobs = 0; stages = 0; tasks = 0L
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val qe = df.queryExecution
        qe.executedPlan // force plan phases before the action
        val planS = qe.tracker.phases.values.map(p =>
          (p.endTimeMs - p.startTimeMs) / 1e3).sum
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        // listener bus lags the last task; give it a moment to drain
        Thread.sleep(200)
        println(f"$name%-32s $wall%8.3f $planS%8.3f $jobs%5d $stages%7d $tasks%6d")
        totW += wall; totP += planS; totJ += jobs; totT += tasks
      } catch { case e: Exception =>
        println(f"$name%-32s FAILED: ${e.getMessage.take(80)}")
      }
    }
    println(f"${"TOTAL"}%-32s $totW%8.3f $totP%8.3f $totJ%5d ${""}%7s $totT%6d")
    spark.stop()
  }
}
