package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Pins the coupling between the adaptive-LSH queries and their static
  * oracles. The queries (`dedup_semantic`, `dedup_semantic_mp`,
  * `dedup_semantic_incr`, `q_mutual_nn`) derive geometry from the LIVE
  * corpus count via [[Similarity.lshGeometry]]; their DuckDB oracles carry
  * plane LITERALS generated for the base configuration. The two agree only
  * while the sf0.01 gate fixture sits below the occupancy knee
  * (n ≤ targetOccupancy · 2^baseBits). This spec makes a fixture
  * regeneration past the knee fail HERE with a clear message, instead of
  * as an unexplained hash mismatch in the correctness gate.
  */
class OracleCouplingSpec extends AnyFunSuite {

  private val gateDir = "/root/testdata/sf0.01"

  test("sf0.01 gate fixture sits below every adaptive-geometry knee") {
    assume(new java.io.File(s"$gateDir/embeddings.parquet").exists())
    val spark = TestSpark.spark
    val n = Tables.embeddings(spark, gateDir).count()
    // the oracle builders hardcode this count (ExtensionQueries.
    // gateEmbeddingCount); a drifted fixture must fail loudly here
    assert(n == ExtensionQueries.gateEmbeddingCount,
      s"sf0.01 embeddings fixture has $n rows but the oracle builders " +
        s"assume ${ExtensionQueries.gateEmbeddingCount} " +
        "(ExtensionQueries.gateEmbeddingCount) — update BOTH or the " +
        "adaptive queries and their static oracles diverge")
    // every (tau, base) configuration an adaptive query runs at the gate
    // must resolve to EXACTLY its base geometry at the fixture count
    val configs = Seq(
      ("dedup_semantic", n, 0.4, 6, 16),
      ("dedup_semantic_mp", n, 0.4, 8, 16),
      ("dedup_semantic_incr", n - n / 10, 0.4, 6, 16),
      ("q_mutual_nn", n, 0.5, 6, 16))
    configs.foreach { case (q, cnt, tau, bits, bands) =>
      val got = Similarity.lshGeometry(cnt, tau, bits, bands)
      assert(got == (bits, bands),
        s"$q: gate count $cnt crossed the lshGeometry knee — geometry " +
          s"adapted to $got != base ($bits, $bands); the static oracle " +
          "plane literals no longer match the query")
    }
    // occupancy-knee headroom: the 6-bit configs adapt at n = 8·2^6 + 1 =
    // 513, so the 500-row fixture has only 13 rows of slack — document it
    assert(Similarity.lshGeometry(513L, 0.4, 6, 16) != ((6, 16)),
      "knee location moved: lshGeometry(513) was expected to adapt; " +
        "re-derive the fixture-slack comment and the gate assumptions")
  }

  test("dedup_semantic_ivf gate coupling: ivfCellCount resolves to the oracle's 8") {
    assume(new java.io.File(s"$gateDir/embeddings.parquet").exists())
    val spark = TestSpark.spark
    val n = Tables.embeddings(spark, gateDir).count()
    // the static oracle hardcodes `vec_id < 8` anchor cells; the query
    // derives ncells from the live count — they agree only while
    // ivfCellCount(n) == 8, i.e. n ≤ 8·targetCellSize = 512
    assert(Similarity.ivfCellCount(n) == 8,
      s"gate count $n no longer resolves to 8 IVF cells — the " +
        "dedup_semantic_ivf oracle's anchor literal must move with it")
    assert(Similarity.ivfCellCount(513L) == 9,
      "cell-count knee moved: ivfCellCount(513) was expected to adapt")
    // dedup_semantic_ivf_incr sizes cells on the CORPUS split (every 10th
    // row is the batch); its oracle hardcodes LIMIT 8 anchors.
    // dedup_semantic_ivf_merge shares this derivation AND this oracle
    // (same corpus count — the quantizer is provisioned for the full
    // corpus before the 7-stratum is delta-appended), so this one pin
    // guards both LIMIT literals.
    assert(Similarity.ivfCellCount(n - n / 10) == 8,
      s"corpus-split count ${n - n / 10} no longer resolves to 8 cells — " +
        "the dedup_semantic_ivf_incr/_merge oracles' LIMIT literal must move")
    // dedup_semantic_ivf2's corpus-adaptive quantizer must resolve to the
    // oracle's 16 cells / 4 stride-4 groups at the gate (the query grows
    // it ∝ n past the gate — the sf3 fixed-16 spill lesson)
    val ncells2 = math.max(16, 2 * Similarity.ivfCellCount(n))
    val ngroups = math.ceil(math.sqrt(ncells2.toDouble)).toInt
    assert(ncells2 == 16 && ngroups == 4 &&
        (ncells2 + ngroups - 1) / ngroups == 4,
      s"gate count $n no longer derives the ivf2 oracle's 16-cell/" +
        "4-group/stride-4 quantizer — move the oracle literals with it")
  }

  test("recall-gate coupling: the oracles' SQL derivations track the Scala policies") {
    assume(new java.io.File(s"$gateDir/embeddings.parquet").exists())
    val spark = TestSpark.spark
    val n = Tables.embeddings(spark, gateDir).count()
    // both recall gates' oracles DERIVE the seeded cell count in SQL as
    // least(65536, greatest(8, (n+63)//64)) — the exact integer form of
    // Similarity.ivfCellCount's default policy; pin the equivalence over
    // the scales the gates can ever replay at, so a policy change in
    // either place fails HERE with a name, not as a hash mismatch
    for (cnt <- Seq(1L, 450L, n, 512L, 513L, 2000L, 20000L, 65536L * 64 + 1)) {
      val sqlForm = math.min(65536L, math.max(8L, (cnt + 63) / 64))
      assert(Similarity.ivfCellCount(cnt).toLong == sqlForm,
        s"ivfCellCount($cnt) = ${Similarity.ivfCellCount(cnt)} but the " +
          s"recall oracles' SQL derivation yields $sqlForm — move both")
    }
    // the oracles replay FLAT routing; the queries route flat only while
    // ncells ≤ 512 (the production two-level knee). The gate fixture must
    // sit well below it — past the knee the hash diverges loudly, but
    // this pin names the cause first.
    assert(Similarity.ivfCellCount(n) <= 512,
      s"gate count $n crossed the 512-cell two-level knee — the recall " +
        "oracles' flat replay no longer matches the shipped routing")
    // recall08: the oracle's k = n//20 must equal clusteredEmbeddingView's
    // default occupancy, its floor literal the declared constant, and the
    // derived view at the gate must keep EVERY residue class centered
    // (k ≤ max fixture id + 1 — contiguous ids at the gate)
    assert(math.max(1L, n / 20L) == 25L,
      s"gate count $n no longer derives k=25 clusters — the recall08 " +
        "oracle comment and the measured gate point (truth 4750) move")
    assert(Similarity.ivfClusteredPairRecallFloorPpm == 950000L,
      "clustered floor moved — the recall08 oracle's 950000 literal " +
        "must move with it")
    val view = graft.operators.Dedup.clusteredEmbeddingView(
      Tables.embeddings(spark, gateDir), "vec_id", "embedding")
    assert(view.count() == n,
      "gate fixture ids are no longer contiguous from 0 — the clustered " +
        "view dropped members and the recall08 gate point moved")
  }

  test("oracle builders refuse to build past the knee (gateLshGeometry)") {
    // the builder-side guard must throw, not silently emit mismatched
    // plane literals, when the assumed count crosses the knee
    val e = intercept[IllegalArgumentException] {
      ExtensionQueries.gateLshGeometry(2000L, 0.4, 6, 16)
    }
    assert(e.getMessage.contains("occupancy knee"))
    // and pass through the base geometry untouched below it
    assert(ExtensionQueries.gateLshGeometry(
      ExtensionQueries.gateEmbeddingCount, 0.4, 6, 16) == ((6, 16)))
  }
}
