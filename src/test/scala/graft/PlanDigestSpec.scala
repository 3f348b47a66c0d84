package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Plan-regression gate: every declared query's normalized plan-shape
  * digest ([[Plans.digest]]) must match the committed PLAN_DIGESTS.json.
  * A drifted digest — a broadcast demoted to sort-merge, a lost pushdown,
  * an extra exchange — fails the suite until the file is REGENERATED IN
  * THE SAME COMMIT with:
  *
  *   GRAFT_UPDATE_DIGESTS=1 sbt "testOnly graft.PlanDigestSpec"
  *
  * so every plan-shape change is visible in review. Digests are computed
  * at sf0.001 in the shared test session; the negative control proves a
  * deliberate broadcast-threshold change trips the gate.
  */
class PlanDigestSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val file = Paths.get("PLAN_DIGESTS.json")
  private val entryRe = """"([A-Za-z0-9_]+)":"([^"]*)"""".r

  /** Digests must be computed under PINNED confs, not whatever the shared
    * session happens to hold: any suite that calls `GraftSession.create`
    * in this JVM leaks `preferSortMergeJoin=false` plus a HOST-CORE-COUNT
    * shuffle.partitions into the session via getOrCreate, and shuffled-
    * hash-join eligibility scales with partition count — so without the
    * pin, digests depended on suite order and machine size (the committed
    * file stopped reproducing on a different box in round 14). The pinned
    * values are exactly TestSpark's session defaults, i.e. what a fresh
    * `sbt "testOnly graft.PlanDigestSpec"` regeneration run uses.
    */
  private val pinned = Seq(
    "spark.sql.shuffle.partitions" -> "4",
    "spark.sql.join.preferSortMergeJoin" -> "true",
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "4",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> (10L * 1024 * 1024).toString)

  private def withPinnedConfs[T](body: => T): T = {
    val saved = pinned.map { case (k, _) => k -> spark.conf.getOption(k) }
    pinned.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def computeAll(): Seq[(String, String)] = withPinnedConfs {
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> (try Plans.digest(fn(spark, TestSpark.sf))
      catch { case e: Exception => s"PLANNING FAILED: ${e.getMessage}" })
    }
  }

  test("every query's plan digest matches the committed PLAN_DIGESTS.json") {
    val got = computeAll()
    if (sys.env.get("GRAFT_UPDATE_DIGESTS").contains("1")) {
      val body = got.map { case (k, v) => s"""    "$k":"$v"""" }
        .mkString(",\n")
      Files.write(file,
        (s"""{\n  "sf": "${TestSpark.sf}",\n  "note": "regenerate: GRAFT_UPDATE_DIGESTS=1 sbt 'testOnly graft.PlanDigestSpec'",\n  "digests": {\n$body\n  }\n}\n""")
          .getBytes(StandardCharsets.UTF_8))
      info(s"rewrote $file with ${got.size} digests")
    } else {
      assert(Files.exists(file),
        "PLAN_DIGESTS.json missing — generate with GRAFT_UPDATE_DIGESTS=1")
      val recorded = entryRe
        .findAllMatchIn(new String(Files.readAllBytes(file),
          StandardCharsets.UTF_8))
        .map(m => m.group(1) -> m.group(2)).toMap - "sf" - "note"
      val drift = got.flatMap { case (name, d) =>
        recorded.get(name) match {
          case Some(r) if r == d => None
          case Some(r) => Some(s"$name:\n  recorded: $r\n  current:  $d")
          case None => Some(s"$name: NOT RECORDED (new query?)")
        }
      }
      val gone = recorded.keySet -- got.map(_._1).toSet
      assert(drift.isEmpty && gone.isEmpty,
        s"plan-shape drift — if intended, regenerate PLAN_DIGESTS.json in " +
          s"this commit (GRAFT_UPDATE_DIGESTS=1 sbt 'testOnly " +
          s"graft.PlanDigestSpec'):\n${drift.mkString("\n")}" +
          (if (gone.nonEmpty) s"\nremoved queries still recorded: $gone" else ""))
    }
  }

  test("negative control: a broadcast-threshold change trips the digest") {
    withPinnedConfs {
      val key = "spark.sql.autoBroadcastJoinThreshold"
      val orig = spark.conf.get(key)
      val before = Plans.digest(
        SparkEntry.queries("j1_join_filter")(spark, TestSpark.sf))
      assert(before.contains("BroadcastHashJoinExec"),
        s"control query must broadcast at defaults: $before")
      try {
        spark.conf.set(key, "-1")
        val after = Plans.digest(
          SparkEntry.queries("j1_join_filter")(spark, TestSpark.sf))
        assert(after != before,
          "digest failed to register a forced broadcast demotion — the gate is vacuous")
        assert(!after.contains("BroadcastHashJoinExec"))
      } finally spark.conf.set(key, orig)
    }
  }
}
