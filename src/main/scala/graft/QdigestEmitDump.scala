package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Optimization-round diagnostic (r15, not on any query path): dump the
  * q-digest EMIT fragment's plan for both candidate shapes — the
  * committed sibling-group window and the pre-r14 parent⋈child
  * self-join — ABOVE the `localCheckpoint` that truncates every declared
  * plan dump (the round-14 verdict found the committed before/after
  * files both started at `ExistingRDD` and proved nothing). The fragment
  * is built over the same node frame `q_qdigest_quantiles` uses
  * (lineitem cents, maxBits 25), with the threshold as a literal so the
  * dump needs no data probe.
  *
  * Usage: `sbt "runMain graft.QdigestEmitDump [sfDir] [outDir]"`.
  */
object QdigestEmitDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outDir = Paths.get(args.lift(1).getOrElse("plans/r15"))
    Files.createDirectories(outDir)
    val spark = GraftSession.create(appName = "graft-qdigest-dump",
      master = "local[8]", shufflePartitions = Some(8))
    spark.sparkContext.setLogLevel("ERROR")
    val maxBits = 25
    val t = 6000L // representative threshold; a literal, like in the plan
    val nodes = graft.operators.Stats.qdigestNodeCounts(
      Tables.lineitem(spark, sfDir).select(
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents")),
      col("cents"), maxBits)
    val window = nodes.filter(col("lev") < maxBits)
      .withColumn("__pcn", sum(col("cn")).over(
        Window.partitionBy(col("lev"), expr("shiftright(node, 1)"))))
      .filter(col("__pcn") > t && (col("cn") <= t || col("lev") === 0))
      .select(col("lev"), col("node"), col("cn"))
    val ch = nodes.filter(col("lev") < maxBits).alias("c")
    val selfJoin = ch.join(nodes.alias("p"),
        col("p.lev") === col("c.lev") + 1 &&
          col("p.node") === expr("shiftright(c.node, 1)"))
      .filter(col("p.cn") > t && (col("c.cn") <= t || col("c.lev") === 0))
      .select(col("c.lev").as("lev"), col("c.node").as("node"),
        col("c.cn").as("cn"))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.write(outDir.resolve(name), txt.getBytes(StandardCharsets.UTF_8))
      println(s"[qdigest-dump] wrote $outDir/$name")
    }
    dump("qdigest_emit_fragment_window.txt", window)
    dump("qdigest_emit_fragment_selfjoin.txt", selfJoin)
    spark.stop()
  }
}
