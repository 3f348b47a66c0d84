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
}
