package graft

import org.apache.spark.sql.functions._

/** Optimization-round diagnostic: isolate the parquet-scan cost that the
  * PhaseProbe run showed dominating simple queries (e.g. q1_agg's
  * scan+partial-agg stage at ~900 ms for 11 MB). Times a ladder of
  * increasingly rich plans over lineitem, 3 reps each, min reported.
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(appName = "graft-scanprobe",
      master = s"local[$cpus]",
      shufflePartitions = GraftSession.envShufflePartitions
        .orElse(Some(cpus.toInt)))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-44s min=${ts.min}%7.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val li = s"$sfDir/lineitem.parquet"
    time("scan 1col (l_quantity)")(spark.read.parquet(li).select("l_quantity"))
    time("scan all cols")(spark.read.parquet(li))
    time("scan+filter+proj (q1 cols)")(
      spark.read.parquet(li).filter($"l_shipdate" <= lit("1998-09-02"))
        .select("l_returnflag", "l_linestatus", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax"))
    time("q1 agg decimal")(
      spark.read.parquet(li).filter($"l_shipdate" <= lit("1998-09-02"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity".cast("decimal(18,2)")).as("sq"),
          sum($"l_extendedprice".cast("decimal(18,2)")).as("sp"),
          sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
            .cast("decimal(18,2)")).as("sd"),
          count(lit(1)).as("n")))
    time("q1 agg double")(
      spark.read.parquet(li).filter($"l_shipdate" <= lit("1998-09-02"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity").as("sq"), sum($"l_extendedprice").as("sp"),
          count(lit(1)).as("n")))
    // does split count matter? force 1 split vs default
    val one = spark.read.option("mergeSchema", "false").parquet(li).coalesce(1)
    time("scan all cols coalesce(1)")(one)
    // declared q1_agg for reference
    time("declared q1_agg")(SparkEntry.queries("q1_agg")(spark, sfDir))
    spark.stop()
  }
}
