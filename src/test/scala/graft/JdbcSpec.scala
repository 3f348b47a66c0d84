package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jdbc

/** S4/S5/W5 capability proof against an in-JVM Derby database (the
  * container has no external DB server; Derby ships with Spark's jars).
  * Mirrors the reference's MSSQL leg: scan a relational table, join, write
  * the derived result back (reference dags/add_image_data.py:54-89).
  */
class JdbcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("JDBC round-trip: write, read back, join, write derived table (S4/S5/W5)") {
    import spark.implicits._
    val images = Seq(
      (1L, "case-a", "img1.jpg"), (2L, "case-a", "img2.jpg"),
      (3L, "case-b", "img3.jpg"))
      .toDF("id", "case_uid", "filename")
    Jdbc.write(images, url, "evidence_images", SaveMode.Overwrite)

    val back = Jdbc.read(spark, url, "evidence_images")
    assert(back.count() == 3)
    assert(back.columns.map(_.toLowerCase).toSet == Set("id", "case_uid", "filename"))

    // W5 cross-store shape: relational scan ⋈ dimension → relational write
    val sites = Seq(("case-a", "austin"), ("case-b", "boston"))
      .toDF("case_uid", "site")
    val joined = back.join(broadcast(sites), "case_uid")
      .select("id", "filename", "site")
    Jdbc.write(joined, url, "image_sites", SaveMode.Overwrite)

    val derived = Jdbc.read(spark, url, "image_sites")
      .orderBy("id").collect()
    assert(derived.map(_.getAs[String]("site")).toSeq ==
      Seq("austin", "austin", "boston"))
  }

  test("partitioned JDBC read: parallel range scans return identical rows") {
    import spark.implicits._
    val rows = (1L to 100L).map(i => (i, s"f$i.jpg")).toDF("id", "filename")
    Jdbc.write(rows, url, "part_scan", SaveMode.Overwrite)
    val par = Jdbc.readPartitioned(spark, url, "part_scan",
      partitionColumn = "id", lowerBound = 1L, upperBound = 101L,
      numPartitions = 4)
    assert(par.rdd.getNumPartitions == 4)
    val got = par.select("id").as[Long].collect().sorted
    assert(got.toSeq == (1L to 100L))
  }

  test("streaming -> JDBC exactly-once: re-delivery appends nothing") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val srcDir = Files.createTempDirectory("graft-jdbc-src").toString
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (2L, "b-dup")).toDF("k", "v")
      .write.mode("overwrite").parquet(srcDir)

    def drain(ckpt: String): Unit =
      graft.streaming.Streams.streamIdempotentJdbcAppend(
        spark.readStream.schema(schema).parquet(srcDir),
        url, "stream_sink", Seq("k"), ckpt)

    drain(Files.createTempDirectory("graft-ck1").toString)
    val after1 = Jdbc.read(spark, url, "stream_sink").count()
    assert(after1 == 2) // in-batch dedupe on k

    // fresh checkpoint = full source re-delivery; the keyed sink must
    // swallow it (the reference's ON CONFLICT DO NOTHING semantics)
    drain(Files.createTempDirectory("graft-ck2").toString)
    assert(Jdbc.read(spark, url, "stream_sink").count() == 2)

    // genuinely new key flows through on the next delivery
    Seq((3L, "c")).toDF("k", "v").write.mode("append").parquet(srcDir)
    drain(Files.createTempDirectory("graft-ck3").toString)
    assert(Jdbc.read(spark, url, "stream_sink").count() == 3)
  }

  test("write bounds the connection count via coalesce") {
    import spark.implicits._
    val wide = spark.range(0, 1000, 1, 16)
      .select(col("id"), concat(lit("n"), col("id")).as("name"))
    Jdbc.write(wide, url, "bounded_conns", SaveMode.Overwrite, numConnections = 2)
    assert(Jdbc.read(spark, url, "bounded_conns").count() == 1000)
  }
}
