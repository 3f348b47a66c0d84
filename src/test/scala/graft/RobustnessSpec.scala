package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ShingleFunctions, TextFunctions}
import graft.operators.{Dedup, Similarity}

/** Fixture-robustness gate for the APPROXIMATE operators (round-6 verdict
  * item 2): the declared-query configs — minhash band geometry, semantic
  * bandBits, decontamination n-gram order, LSH top-k banding — were tuned
  * against the seed-42 driver fixtures. This spec re-runs every
  * estimate-vs-exact audit on TWO corpora the engine synthesizes ITSELF
  * (deterministically, from constants unrelated to the fixtures) and fails
  * if recall/precision drops below the declared floors, so a regenerated
  * fixture or a quietly-degrading config change cannot pass unnoticed:
  *
  *  - distribution CLUSTERED: 40 template clusters of 10 docs with ~10%
  *    word-replacement noise; 16 embedding clusters with radius noise —
  *    the duplicate-rich, well-separated regime;
  *  - distribution ZIPF/ANISO: log-uniform (zipf-like) vocabulary draws
  *    with mutation-chain duplicates whose similarity SPANS the
  *    thresholds, and anisotropic embeddings (energy decaying per
  *    dimension) with noise-graded duplicate pairs — the adversarial
  *    regime where banded LSH recall genuinely degrades.
  *
  * Ground truth is computed in-memory in this file (plain Scala over
  * sets), independent of every engine operator under audit. Floors are
  * set ~10-20 points below healthy measurements — loose enough to ignore
  * load noise, tight enough that a collapsed band geometry (the keyBits=42
  * class of bug) or a vocabulary-shift blowup fails loudly.
  */
class RobustnessSpec extends AnyFunSuite {
  private val spark0 = TestSpark.spark
  import spark0.implicits._

  // --- deterministic generator (splitmix-style; constants unrelated to
  // --- the fixture generator's seed-42 PRNG). GRAFT_ROBUSTNESS_SEED
  // --- re-salts every draw so the whole gate can be re-run on an
  // --- INDEPENDENT corpus family (seed-independence evidence, round-7
  // --- verdict item 5): the default 0 preserves the committed floors;
  // --- any other value synthesizes structurally-identical corpora with
  // --- different words/vectors/duplicate placements. ---------------------
  private val seedSalt: Long =
    sys.env.get("GRAFT_ROBUSTNESS_SEED").map(_.toLong).getOrElse(0L)
  private def mix(xs: Long*): Long = {
    var a = 0x9e3779b97f4a7c15L
    // salt prepended only when set, so the default run is bit-identical
    // to the corpora the committed floors were measured on
    val salted = if (seedSalt == 0L) xs else seedSalt +: xs
    salted.foreach { x =>
      a = (a ^ x) * 0xbf58476d1ce4e5b9L
      a = (a ^ (a >>> 27)) * 0x94d049bb133111ebL
      a = a ^ (a >>> 31)
    }
    a
  }
  private def unit(xs: Long*): Double = (mix(xs: _*) >>> 11).toDouble / (1L << 53).toDouble

  // ---- corpus 1: clustered templates + noise -----------------------------
  private lazy val clusteredDocs: Seq[(Long, String)] = {
    val vocab = (0 until 500).map(i => s"w${i}")
    val noise = (0 until 4000).map(i => s"n${i}")
    for {
      t <- 0 until 40
      r <- 0 until 10
    } yield {
      val words = (0 until 30).map { j =>
        val base = vocab((mix(1L, t, j) & 0x7fffffffL).toInt % vocab.size)
        if (r > 0 && unit(2L, t, r, j) < 0.10)
          noise((mix(3L, t, r, j) & 0x7fffffffL).toInt % noise.size)
        else base
      }
      ((t * 10 + r).toLong, words.mkString(" "))
    }
  }

  // ---- corpus 2: zipf-like vocabulary + mutation chains ------------------
  private lazy val zipfDocs: Seq[(Long, String)] = {
    val v = 3000
    def word(xs: Long*): String =
      // log-uniform index: heavy head, long tail — the zipf-ish regime
      s"z${math.min(v - 1, math.pow(v.toDouble, unit(xs: _*)).toLong)}"
    val bases = (0 until 250).map { i =>
      (i.toLong, (0 until 40).map(j => word(10L, i, j)).mkString(" "))
    }
    val mutants = (0 until 150).map { m =>
      val (srcId, src) = bases(m % 250)
      val words = src.split(" ").toSeq.zipWithIndex.map { case (w, j) =>
        // mutation rate graded by m: chains span the 0.5 threshold
        if (unit(11L, m, j) < 0.03 + 0.22 * (m % 5) / 4.0) word(12L, m, j)
        else w
      }
      ((1000 + m).toLong, words.mkString(" "))
    }
    bases ++ mutants
  }

  // ---- embeddings 1: clustered ------------------------------------------
  private val dim = 32
  private lazy val clusteredEmb: Seq[(Long, Seq[Float])] =
    for { k <- 0 until 16; r <- 0 until 20 } yield {
      val vvec = (0 until dim).map { d =>
        val c = 2.0 * unit(20L, k, d) - 1.0
        (c + 0.15 * (2.0 * unit(21L, k, r, d) - 1.0)).toFloat
      }
      ((k * 20 + r).toLong, vvec)
    }

  // ---- embeddings 2: anisotropic with noise-graded duplicate pairs -------
  private lazy val anisoEmb: Seq[(Long, Seq[Float])] = {
    def base(i: Int): Seq[Double] =
      (0 until dim).map(d => (2.0 * unit(30L, i, d) - 1.0) / (1.0 + 0.25 * d))
    val originals = (0 until 200).map(i => (i.toLong, base(i).map(_.toFloat)))
    val dups = (0 until 100).map { m =>
      val src = base(m % 200)
      val lambda = 0.2 + 1.6 * (m % 10) / 9.0 // cosine grades ~0.97 → ~0.4
      val vvec = src.zipWithIndex.map { case (x, d) =>
        (x + lambda * (2.0 * unit(31L, m, d) - 1.0) / (1.0 + 0.25 * d)).toFloat
      }
      ((1000 + m).toLong, vvec)
    }
    originals ++ dups
  }

  // ---- in-memory ground truths ------------------------------------------
  private def shingleSet(text: String, n: Int): Set[String] =
    text.split(" ").sliding(n).map(_.mkString(" ")).toSet

  private def exactJaccardPairs(docs: Seq[(Long, String)], n: Int,
                                thr: Double): Set[(Long, Long)] = {
    val sh = docs.map { case (id, t) => id -> shingleSet(t, n) }
    (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter).toDouble
      if j >= thr
    } yield (a, b)).toSet
  }

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dot / math.sqrt(na * nb)
  }

  private def exactCosPairs(emb: Seq[(Long, Seq[Float])],
                            thr: Double): Set[(Long, Long)] =
    (for {
      (a, va) <- emb; (b, vb) <- emb if a < b
      if cosine(va, vb) >= thr
    } yield (a, b)).toSet

  private def recallOf(est: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
    (est & truth).size.toDouble / truth.size.toDouble

  // ------------------------------------------------------------------------

  test("minhash near-dup recall holds on both synthesized corpora") {
    for ((nameD, docs, floor) <- Seq(
        ("clustered", clusteredDocs, 0.95),
        ("zipf", zipfDocs, 0.90))) {
      val df = docs.toDF("doc_id", "text")
      val truth = exactJaccardPairs(docs, n = 3, thr = 0.5)
      assert(truth.size >= 50, s"$nameD: generator must yield >=50 true pairs, got ${truth.size}")
      val got = Dedup.minHashNearDups(df, "doc_id",
          ShingleFunctions.wordShingleHashes(TextFunctions.tokens(col("text")), 3),
          threshold = 0.5, Dedup.LshConfig(numHashes = 64, bandRows = 2))
        .select("id_1", "id_2").as[(Long, Long)].collect().toSet
      assert(got.subsetOf(truth),
        s"$nameD: exact-verified output must be a subset of ground truth " +
          s"(spurious: ${(got -- truth).take(3)})")
      val r = recallOf(got, truth)
      assert(r >= floor, s"$nameD: minhash recall $r below declared floor $floor " +
        s"(|truth|=${truth.size}, |got|=${got.size})")
    }
  }

  test("semantic near-dup recall holds on clustered AND anisotropic embeddings") {
    for ((nameD, emb, floorExact, floorMp) <- Seq(
        ("clustered", clusteredEmb, 0.80, 0.90),
        ("aniso", anisoEmb, 0.45, 0.70))) {
      val df = emb.toDF("vec_id", "embedding")
      val truth = exactCosPairs(emb, 0.4)
      assert(truth.size >= 40, s"$nameD: generator must yield >=40 true pairs, got ${truth.size}")
      val got = Dedup.semanticNearDups(df, "vec_id", "embedding",
          threshold = 0.4, bandBits = 6, numBands = 16)
        .select("id_1", "id_2").as[(Long, Long)].collect().toSet
      val r = recallOf(got, truth)
      assert(r >= floorExact,
        s"$nameD: semantic recall $r below floor $floorExact (|truth|=${truth.size})")
      val gotMp = Dedup.semanticNearDups(df, "vec_id", "embedding",
          threshold = 0.4, bandBits = 8, numBands = 16, probeDepth = 1)
        .select("id_1", "id_2").as[(Long, Long)].collect().toSet
      val rMp = recallOf(gotMp, truth)
      assert(rMp >= floorMp,
        s"$nameD: multi-probe semantic recall $rMp below floor $floorMp")
    }
  }

  test("lshTopK recall@10 holds on both embedding distributions") {
    for ((nameD, emb, floor, floorMp) <- Seq(
        ("clustered", clusteredEmb, 0.80, 0.90),
        ("aniso", anisoEmb, 0.50, 0.70))) {
      val df = emb.toDF("vec_id", "embedding")
      val byId = emb.toMap
      val ids = emb.map(_._1)
      val truth: Map[Long, Set[Long]] = ids.map { q =>
        q -> ids.filter(_ != q)
          .sortBy(n => (-cosine(byId(q), byId(n)), n)).take(10).toSet
      }.toMap
      def recallAt(probe: Int): Double = {
        val got = Similarity.lshTopK(df, df, "vec_id", "embedding", k = 10,
            probeDepth = probe)
          .select("query_id", "neighbor_id").as[(Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
        ids.map(q => (got.getOrElse(q, Set.empty) & truth(q)).size / 10.0)
          .sum / ids.size
      }
      val r0 = recallAt(0); val r1 = recallAt(1)
      assert(r0 >= floor, s"$nameD: lshTopK recall@10 $r0 below floor $floor")
      assert(r1 >= floorMp, s"$nameD: multi-probe recall@10 $r1 below floor $floorMp")
      assert(r1 >= r0 - 1e-9, s"$nameD: probing must not lose recall")
    }
  }

  test("decontamination n=5 catches planted leaks on both vocabularies") {
    for ((nameD, docs) <- Seq(("clustered", clusteredDocs), ("zipf", zipfDocs))) {
      // benchmark: 30 held-out docs from the same generator family
      val bench = (0 until 30).map { i =>
        (i.toLong, (0 until 25).map(j =>
          s"b${(mix(40L, i, j) & 0x7fffffffL) % 2000}").mkString(" "))
      }
      // plant: 10 corpus docs embed a contiguous 8-word benchmark span
      val planted = (0 until 10).map { p =>
        val src = bench(p * 3)._2.split(" ")
        val span = src.slice(5, 13).mkString(" ")
        ((9000 + p).toLong, s"${docs(p)._2} $span")
      }
      val corpus = (docs.map { case (id, t) => (id, t) } ++ planted)
        .toDF("doc_id", "text")
      def sh = ShingleFunctions.wordShingleHashes(
        TextFunctions.tokens(col("text")), 5)
      val got = Dedup.decontaminate(corpus, "doc_id", sh,
          bench.toDF("doc_id", "text"), sh)
        .filter(col("contaminated") === 1)
        .select("id").as[Long].collect().toSet
      assert((9000L until 9010L).forall(got.contains),
        s"$nameD: every planted leak must be flagged; missed ${(9000L until 9010L).toSet -- got}")
      val falsePos = got.count(_ < 9000L)
      assert(falsePos <= docs.size / 50,
        s"$nameD: $falsePos clean docs falsely flagged (>2%) — the 5-gram " +
          "order no longer separates this vocabulary distribution")
    }
  }

  test("mutualTopMatches stays within true clusters on clustered embeddings") {
    val df = clusteredEmb.toDF("vec_id", "embedding")
    val got = Similarity.mutualTopMatches(df, "vec_id", "embedding")
      .select("id_1", "id_2").as[(Long, Long)].collect()
    // mutual-NN pairs only a fraction of points by DEFINITION (best-match
    // chains break reciprocity: A→B, B→C) and banded-LSH candidate recall
    // compounds it; healthy measurement on this corpus is 75 of the 160
    // possible pairs. Floor set ~25% below, high enough that a collapsed
    // band geometry (near-zero candidates ⇒ near-zero pairs) fails loudly.
    assert(got.length >= 55,
      s"expected >=55 mutual pairs on 16 clusters x 20 members, got ${got.length}")
    val sameCluster = got.count { case (a, b) => a / 20 == b / 20 }
    assert(sameCluster.toDouble / got.length >= 0.9,
      s"mutual matches crossing true clusters: ${got.length - sameCluster}/${got.length}")
  }

  test("two-level routing recall floor: groupProbe=8 loses at most 2% of the flat route's pairs in the operating regime") {
    // the round-13 verdict's standing risk: the production dedup_semantic_ivf
    // routes TWO-LEVEL past 512 cells, and the measured IMI boundary loss
    // (ivf_km2l legs: −0.011 at τ=0.4, −0.022 at τ=0.5 vs flat at sf3) had
    // no gate — a future change to groupProbe / group sizing could widen it
    // silently. This pins the mechanism at spec scale: a clustered corpus
    // large enough that groupProbe=8 genuinely truncates (100 learned
    // cells → 10 k-means groups > 8 probed), flat vs two-level found pairs
    // on identical truth, at the τ=0.8 operating threshold AND the τ=0.5
    // band below it.
    val n = 3200
    val nClusters = 160
    // round-robin ids over clusters (RecallBench's convention) so nothing
    // is accidentally id-prefix-aligned
    val emb: Seq[(Long, Seq[Float])] =
      (0 until n).map { i =>
        val k = i % nClusters
        val r = i / nClusters
        val vvec = (0 until dim).map { d =>
          val c = 2.0 * unit(70L, k, d) - 1.0
          (c + 0.15 * (2.0 * unit(71L, k, r, d) - 1.0)).toFloat
        }
        (i.toLong, vvec)
      }
    val df = emb.toDF("vec_id", "embedding").localCheckpoint(true)
    val anchors = Similarity.kmeansCentroids(df, "embedding",
      nlist = 100, iters = 2, sampleSize = 4096)
    for ((tau, minLossless) <- Seq((0.8, 0.98), (0.5, 0.97))) {
      val truth = exactCosPairs(emb, tau)
      assert(truth.size >= 1000,
        s"tau=$tau: generator must yield >=1000 true pairs, got ${truth.size}")
      val flat = Dedup.semanticNearDupsIvf(df, "vec_id", "embedding", tau,
          cells = anchors, nassign = 2)
        .select("id_1", "id_2").as[(Long, Long)].collect().toSet
      val twoLevel = Dedup.semanticNearDupsIvf(df, "vec_id", "embedding", tau,
          cells = anchors, nassign = 2, groupProbe = 8)
        .select("id_1", "id_2").as[(Long, Long)].collect().toSet
      // both are exact-verified, so every found pair is true
      assert(flat.subsetOf(truth) && twoLevel.subsetOf(truth),
        s"tau=$tau: verified outputs must be subsets of ground truth")
      val rFlat = recallOf(flat, truth)
      val rTwo = recallOf(twoLevel, truth)
      assert(rTwo >= rFlat - (1.0 - minLossless),
        f"tau=$tau: two-level recall $rTwo%.4f fell more than " +
          f"${1.0 - minLossless}%.2f below flat's $rFlat%.4f — the IMI " +
          "boundary loss widened past the declared price")
      // and in the operating regime the SHIPPED posture itself must hold
      // the clustered-gate floor, not merely track flat
      if (tau == 0.8) assert(rTwo >= 0.95,
        f"tau=0.8: two-level recall $rTwo%.4f below the 0.95 clustered " +
          "contract (ivfClusteredPairRecallFloorPpm)")
    }
  }

  test("lshGeometry: gate-invariant below the knee, occupancy-tracking above") {
    // below the occupancy knee the base geometry comes back EXACTLY — the
    // sf0.01 oracle gate must see the very configuration its plane
    // literals replay
    assert(Similarity.lshGeometry(200L, 0.4, 6, 16) === ((6, 16)))
    assert(Similarity.lshGeometry(200L, 0.9, 8, 16) === ((8, 16)))
    // above the knee: bits = ceil(log2(n/8)), bands compensate by p^-delta
    // (p = 1 - acos(0.4)/pi = 0.6257; 16 / 0.6257^2 = 40.9 -> 41)
    assert(Similarity.lshGeometry(2000L, 0.4, 6, 16) === ((8, 41)))
    // low-tau compensation hits the band cap rather than exploding
    assert(Similarity.lshGeometry(20000L, 0.4, 6, 16) === ((12, 64)))
    // high-tau compensation stays cheap at the same scale
    val (hb, hn) = Similarity.lshGeometry(20000L, 0.9, 6, 16)
    assert(hb === 12 && hn < 64, s"high-tau bands should not cap: ($hb, $hn)")
    // expected candidate volume bands*n^2/2^bits must grow ~linearly, not
    // quadratically, across a 100x corpus step at production tau
    def vol(n: Long): Double = {
      val (b, m) = Similarity.lshGeometry(n, 0.9, 8, 16)
      m.toDouble * n.toDouble * n.toDouble / math.pow(2.0, b.toDouble)
    }
    val growth = vol(2000000L) / vol(20000L)
    assert(growth < 400.0,
      s"candidate volume grew ${growth}x across a 100x corpus step")
  }

  test("lshExpectedRecall / lshBandsForRecall: closed form, inverse, refusal") {
    // closed form against a hand-computed point: p(0.4) = 1-acos(0.4)/pi
    val p = 1.0 - math.acos(0.4) / math.Pi
    val manual = 1.0 - math.pow(1.0 - math.pow(p, 6), 16)
    assert(math.abs(Similarity.lshExpectedRecall(6, 16, 0.4) - manual) < 1e-12)
    // monotone in cosine (the lower-bound-at-tau argument relies on it)
    assert(Similarity.lshExpectedRecall(8, 16, 0.6) >
      Similarity.lshExpectedRecall(8, 16, 0.4))
    // inverse property: the band count lshBandsForRecall returns actually
    // achieves the floor, and one band fewer does not
    for (bits <- Seq(6, 8, 12); tau <- Seq(0.5, 0.7); floor <- Seq(0.8, 0.95)) {
      val b = Similarity.lshBandsForRecall(bits, tau, floor)
      assert(Similarity.lshExpectedRecall(bits, b, tau) >= floor,
        s"bits=$bits tau=$tau floor=$floor: $b bands miss the floor")
      if (b > 1)
        assert(Similarity.lshExpectedRecall(bits, b - 1, tau) < floor,
          s"bits=$bits tau=$tau floor=$floor: $b bands not minimal")
    }
    // the documented SCALE.md point: holding 0.9 recall at tau=0.4 with the
    // n=20000 capped geometry (bits=12) needs ~9x the 64-band cap
    val need = Similarity.lshBandsForRecall(12, 0.4, 0.9)
    assert(need > 500 && need < 650, s"expected ~575 bands, got $need")
    // past the sanity bound the mode REFUSES and names the IVF route
    val e = intercept[IllegalArgumentException] {
      Similarity.lshBandsForRecall(20, 0.4, 0.9)
    }
    assert(e.getMessage.contains("semanticNearDupsIvf"))
  }
}
