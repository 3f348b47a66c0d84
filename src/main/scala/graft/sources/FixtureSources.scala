package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Deterministic CSV / JSON-Lines fixture files for the declared source
  * queries (`q_csv_src` / `q_json_src`). Content is FIXED (independent of
  * scale factor) so the DuckDB oracle can address the same absolute path
  * with `read_csv` / `read_json`; the sf-dependent half of each query comes
  * from joining the parquet tables.
  *
  * Mirrors the reference's side-channel config inputs (the Airflow Variables
  * / connection extras its DAGs read alongside the warehouse tables) as
  * file-backed dimension legs.
  */
object FixtureSources {

  /** Fixed fixture directory — java.io.tmpdir on both the Spark side and in
    * the oracle SQL text, so the two engines read identical bytes.
    */
  val dir: String =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft_src_fixtures").toString

  val csvPath: String = Paths.get(dir, "region_rates.csv").toString
  val jsonPath: String = Paths.get(dir, "nation_tags.jsonl").toString

  /** Region-keyed rate card: header + one row per TPC-H region key. */
  private val csvContent: String = {
    val names = Array("alpha", "bravo", "charlie", "delta", "echo")
    val rows = (0 until 5).map { k =>
      val mult = 0.75 + (k % 4) * 0.5 // exact in binary: .75 1.25 1.75 2.25
      s"$k,${names(k)},$mult"
    }
    ("r_key,rate_name,multiplier" +: rows).mkString("", "\n", "\n")
  }

  /** Nation-keyed tag metadata: nested struct + array per line, exercising
    * explicit nested-schema reads on both engines.
    */
  private val jsonContent: String = {
    val tiers = Array("bronze", "gold", "silver")
    val rows = (0 until 25).map { k =>
      val tags = (0 to k % 4).map(i => s""""t$i"""").mkString("[", ",", "]")
      val weight = (k % 8) * 0.25 // exact in binary
      s"""{"n_key":$k,"meta":{"tier":"${tiers(k % 3)}","weight":$weight},"tags":$tags}"""
    }
    rows.mkString("", "\n", "\n")
  }

  private def writeOnce(path: String, content: String): Unit = {
    val p = Paths.get(path)
    val bytes = content.getBytes(StandardCharsets.UTF_8)
    if (Files.exists(p) && java.util.Arrays.equals(Files.readAllBytes(p), bytes)) return
    Files.createDirectories(p.getParent)
    Files.write(p, bytes)
  }

  /** Idempotent, content-addressed materialization of both fixture files. */
  def ensure(): Unit = {
    writeOnce(csvPath, csvContent)
    writeOnce(jsonPath, jsonContent)
  }

  // ---- ORC leg ---------------------------------------------------------

  val orcPath: String = Paths.get(dir, "supplier_audit_orc").toString

  /** The ORC fixture rows: (s_key, audit_tier, audit_score). Scores are
    * eighths — exact binary fractions, so double sums are exact and
    * order-independent. The SAME rows are emitted into the oracle as a
    * VALUES table (DuckDB cannot read ORC), which makes q_orc_src a
    * write→read round-trip check on Spark's ORC path.
    */
  def orcRows: Seq[(Long, String, Double)] = {
    val tiers = Array("low", "med", "high")
    (0L until 50L).map(k => (k, tiers((k % 3).toInt), (k % 8) * 0.125))
  }

  /** SQL literal form of [[orcRows]] for the oracle. The score is cast
    * per-row: DuckDB types a bare `0.125` literal as DECIMAL(4,3), which
    * would make the summed column DECIMAL instead of Spark's DOUBLE.
    */
  def orcValuesSql: String =
    orcRows.map { case (k, t, sc) =>
      s"($k, '$t', CAST($sc AS DOUBLE))" }.mkString(", ")

  /** Idempotent ORC materialization (needs a session — ORC is written
    * through Spark, unlike the raw text fixtures). coalesce(1) keeps the
    * fixture a single file; a marker checkpoints completion so re-runs
    * skip the write.
    */
  def ensureOrc(spark: org.apache.spark.sql.SparkSession): Unit = {
    val marker = Paths.get(orcPath, "_graft_done")
    if (Files.exists(marker)) return
    import spark.implicits._
    orcRows.toDF("s_key", "audit_tier", "audit_score")
      .coalesce(1)
      .write.mode("overwrite").orc(orcPath)
    Files.write(marker, Array.emptyByteArray)
  }
}
