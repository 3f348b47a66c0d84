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

  test("write bounds the connection count via coalesce") {
    import spark.implicits._
    val wide = spark.range(0, 1000, 1, 16)
      .select(col("id"), concat(lit("n"), col("id")).as("name"))
    Jdbc.write(wide, url, "bounded_conns", SaveMode.Overwrite, numConnections = 2)
    assert(Jdbc.read(spark, url, "bounded_conns").count() == 1000)
  }
}
