package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.{Dedup, Similarity}

/** Recall-at-n harness for the semantic-dedup family — the round-8
  * verdict's open measurement: the maxBands cap makes adaptive LSH cost
  * ~linear past the cap (SCALING_sf3.json), but the RECALL that bounded
  * cost trades away was only derived, never measured. This main measures
  * it on the ScaleGen corpora against exact brute-force ground truth, and
  * puts the new IVF-routed path ([[Dedup.semanticNearDupsIvf]]) on the
  * same axes.
  *
  * Method: every path VERIFIES candidates with exact cosine ≥ τ, so found
  * pairs are a SUBSET of the truth set by construction (precision 1) and
  * recall = |found| / |truth| needs only two counts — no pair-set
  * intersection. Truth counts for both τ come from ONE brute-force pass
  * (a broadcast self-join with `id_1 < id_2` evaluated before the cosine,
  * conditional-summed at both thresholds). Ground-truth structure in the
  * ScaleGen corpora is exact: replicas are isometries of sf0.1, so true
  * pairs are replica-local plus whatever rare cross-replica cosine clears
  * τ — the brute force counts those too, no planted-pair bookkeeping.
  *
  * Legs per (dir, τ):
  *  - `lsh`   — [[Dedup.semanticNearDups]] at lshGeometry(n, τ, 6, 16),
  *    exact buckets (the dedup_semantic configuration);
  *  - `lshmp` — geometry (8, 16) base with single-bit margin probes (the
  *    dedup_semantic_mp configuration);
  *  - `ivf_first`  — [[Dedup.semanticNearDupsIvf]] at ivfCellCount(n)
  *    anchors taken as the FIRST ncells ids (the dedup_semantic_ivf gate
  *    configuration). On the ScaleGen corpora this is a deliberate
  *    anchor-sensitivity ABLATION: replicas decorrelate, so first-ids
  *    anchors all come from replica 0 and 1−1/replicas of the corpus
  *    routes on noise;
  *  - `ivf_spread` — same operator, anchors = the ncells hash-smallest
  *    ids (deterministic, uniform over the corpus — the seeded choice a
  *    deployment would actually make);
  *  - `ivf_km`     — same operator with LEARNED cells
  *    ([[Similarity.kmeansCentroids]]) — the SemDeDup production
  *    configuration.
  * Each leg records found count, recall_ppm, wall seconds, and the
  * geometry it ran (bits/bands or ncells) plus the closed-form expected
  * LSH recall at cosine = τ ([[Similarity.lshExpectedRecall]] — a lower
  * bound over the above-τ pair population) for measured-vs-predicted.
  *
  * Usage: `runMain graft.RecallBench [dir ...]`, default
  * `/root/testdata/sf0.1 /tmp/sf1 /tmp/sf3`. Writes RECALL.json and
  * prints one JSON line. Not driver-run; feeds the SCALE.md table.
  */
object RecallBench {

  private case class Leg(name: String, geometry: String, found: Long,
                         truth: Long, secs: Double, predicted: Double,
                         tideRef: Double = -1.0)

  /** Ambient-load trace for the recall legs' `secs` fields — the same
    * fixed-sentinel discipline as Bench/scalingMain (round-13 verdict #4:
    * the deep-probe cost claims rode raw wall-seconds on a shared box).
    * The sentinel is q1_agg at the FIXED sf0.1 dir — it must not scale
    * with the measured corpus, or load normalization and data scaling
    * would be conflated. One sample (min of 2 reps) lands immediately
    * before every timed leg, so each leg's `tide_ref_sec` is its nearest
    * load reading and `secs_tide = secs / tide_ref_sec ×
    * tide_quietest_sec` re-expresses the leg at the run's quietest
    * observed moment.
    */
  private final class TideTrace(spark: SparkSession) {
    private val fn = SparkEntry.queries.get("q1_agg")
    private val dir = "/root/testdata/sf0.1"
    private val samples = scala.collection.mutable.ListBuffer[Double]()
    def sample(): Double = fn.map { f =>
      try {
        val ts = (0 until 2).map { _ =>
          val t0 = System.nanoTime()
          f(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val m = ts.min
        samples += m
        m
      } catch { case scala.util.control.NonFatal(_) => -1.0 }
    }.getOrElse(-1.0)
    def quietest: Double = {
      val ok = samples.filter(_ > 0)
      if (ok.isEmpty) -1.0 else ok.min
    }
  }

  private def tideAdj(secs: Double, tideRef: Double, quietest: Double): Double =
    if (tideRef > 0 && quietest > 0) secs / tideRef * quietest else -1.0

  private def fmt(v: Double): String = BigDecimal(v)
    .setScale(3, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** All legs over one embeddings frame at the given thresholds; returns
    * the JSON section body for this corpus as a closure over the run's
    * quietest sentinel reading (known only after every section has run).
    */
  private def measureSection(label: String,
      emb0: org.apache.spark.sql.DataFrame,
      taus: Seq[Double], tide: TideTrace): Double => String = {
    val emb = emb0.localCheckpoint(true)
    val n = emb.count()
    // one brute-force pass counts truth at every tau: the id_1 < id_2
    // join condition runs before the cosine, so exactly n(n-1)/2
    // cosines are evaluated
    val e1 = emb.select(col("vec_id").as("id1"), col("embedding").as("v1"))
    val e2 = emb.select(col("vec_id").as("id2"), col("embedding").as("v2"))
    val truthTide = tide.sample()
    val (truthRow, truthSecs) = timed {
      val sums = taus.map(t =>
        sum(when(col("c") >= t, 1L).otherwise(0L)).as(s"t$t"))
      e1.join(broadcast(e2), col("id1") < col("id2"))
        .select(VectorFunctions.cosine(col("v1"), col("v2")).as("c"))
        .agg(sums.head, sums.tail: _*)
        .collect().head
    }
    val truthAt = taus.zipWithIndex
      .map { case (t, i) => t -> truthRow.getLong(i) }.toMap

    val legs = taus.flatMap { tau =>
      val truth = truthAt(tau)
      val (bits, bands) = Similarity.lshGeometry(n, tau, 6, 16)
      val lshTide = tide.sample()
      val (lshFound, lshSecs) = timed {
        Dedup.semanticNearDups(emb, "vec_id", "embedding", tau,
          bandBits = bits, numBands = bands).count()
      }
      val (mpBits, mpBands) = Similarity.lshGeometry(n, tau, 8, 16)
      val mpTide = tide.sample()
      val (mpFound, mpSecs) = timed {
        Dedup.semanticNearDups(emb, "vec_id", "embedding", tau,
          bandBits = mpBits, numBands = mpBands, probeDepth = 1).count()
      }
      // query-directed probing (Lv §4.2, probeDepth=2): 6 best ≤2-bit
      // flip sets by summed margin — 7 probe rows per (vec, band) vs the
      // single-flip leg's 9; the round-10 question is whether recall
      // holds while the candidate volume (and seconds) drop
      val qdTide = tide.sample()
      val (qdFound, qdSecs) = timed {
        Dedup.semanticNearDups(emb, "vec_id", "embedding", tau,
          bandBits = mpBits, numBands = mpBands, probeDepth = 2,
          maxProbeBits = 6).count()
      }
      val ncells = Similarity.ivfCellCount(n)
      // the declared contract each ivf leg is judged against — recorded
      // with the leg so the artifact carries measurement AND floor
      val floorPpm = Similarity.ivfPairRecallFloorPpm(n)
      def ivfLeg(name: String, anchors: org.apache.spark.sql.DataFrame) = {
        val t = tide.sample()
        val (found, secs) = timed {
          Dedup.semanticNearDupsIvf(emb, "vec_id", "embedding", tau,
            cells = anchors, nassign = 2).count()
        }
        Leg(s"$name@$tau", s"ncells=$ncells,nassign=2,floor_ppm=$floorPpm",
          found, truth, secs, -1.0, t)
      }
      // the declared dedup_semantic_ivf posture past 512 cells (round-13:
      // two-level routing, groupProbe=8) — measures the IMI boundary loss
      // the routing-cost fix trades, on the same truth as the flat legs
      def ivf2lLeg(anchors: org.apache.spark.sql.DataFrame) = {
        val t = tide.sample()
        val (found, secs) = timed {
          Dedup.semanticNearDupsIvf(emb, "vec_id", "embedding", tau,
            cells = anchors, nassign = 2, groupProbe = 8).count()
        }
        Leg(s"ivf_km2l@$tau",
          s"ncells=$ncells,nassign=2,groupProbe=8,floor_ppm=$floorPpm",
          found, truth, secs, -1.0, t)
      }
      val firstAnchors = emb.filter(col("vec_id") < ncells)
        .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
      // hash-spread: ncells hash-smallest ids — deterministic and
      // uniform over the id space (every ScaleGen replica contributes)
      val spreadAnchors = emb
        .select(col("vec_id"), col("embedding"),
          xxhash64(lit(7L), col("vec_id")).as("h"))
        .orderBy(col("h").asc).limit(ncells)
        .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
        .localCheckpoint(true)
      val kmAnchors = Similarity.kmeansCentroids(emb, "embedding",
          nlist = ncells, iters = 2, sampleSize = 8192)
        .select(col("cell"),
          col("centroid").cast("array<float>").as("centroid"))
      Seq(
        Leg(s"lsh@$tau", s"bits=$bits,bands=$bands", lshFound, truth,
          lshSecs, Similarity.lshExpectedRecall(bits, bands, tau), lshTide),
        Leg(s"lshmp@$tau", s"bits=$mpBits,bands=$mpBands,probe=1",
          mpFound, truth, mpSecs,
          // probe upper bound: full single-flip set (truncation at
          // maxProbeBits makes the real value sit between this and
          // the exact-bucket form)
          Similarity.lshExpectedRecall(mpBits, mpBands, tau), mpTide),
        Leg(s"lshmp_qd@$tau",
          s"bits=$mpBits,bands=$mpBands,probe=2,nprobes=6",
          qdFound, truth, qdSecs,
          Similarity.lshExpectedRecall(mpBits, mpBands, tau), qdTide),
        ivfLeg("ivf_first", firstAnchors),
        ivfLeg("ivf_spread", spreadAnchors),
        ivfLeg("ivf_km", kmAnchors)) ++
        (if (ncells > 512) Seq(ivf2lLeg(kmAnchors)) else Nil)
    }
    (quietest: Double) => {
      val legJson = legs.map(legToJson(_, quietest)).mkString(",")
      val truthJson = taus
        .map(t => s""""$t":${truthAt(t)}""").mkString("{", ",", "}")
      s""""$label":{"n":$n,"truth_pairs":$truthJson,"truth_secs":${fmt(truthSecs)},"truth_secs_tide":${fmt(tideAdj(truthSecs, truthTide, quietest))},"legs":{$legJson}}"""
    }
  }

  /** One leg's JSON, with both raw wall seconds and the tide-adjusted
    * form (−1 when the sentinel failed or never ran). */
  private def legToJson(l: Leg, quietest: Double): String = {
    val ppm = if (l.truth == 0L) -1L else l.found * 1000000L / l.truth
    s""""${l.name}":{"geometry":"${l.geometry}","found":${l.found},"truth":${l.truth},"recall_ppm":$ppm,"secs":${fmt(l.secs)},"tide_ref_sec":${fmt(l.tideRef)},"secs_tide":${fmt(tideAdj(l.secs, l.tideRef, quietest))},"predicted_recall_at_tau":${fmt(l.predicted)}}"""
  }

  /** Recall legs for the PERSISTED-index probe paths — the steady-state
    * operators a production corpus actually runs per ingest batch
    * ([[Dedup.minHashNearDupsAgainstIndex]],
    * [[Dedup.semanticNearDupsIvfAgainstIndex]]). Both have equality specs
    * against their in-plan twins (ScaleSpec), so the open question this
    * section answers is their recall against EXACT cross-split truth:
    *
    *  - semantic: batch = vec_id % 10 = 0 (10 %), corpus = the rest;
    *    truth = brute-force batch × corpus cosine count at each τ (one
    *    pass, both thresholds); index anchors = learned k-means
    *    (production) AND hash-spread seeds (the replayable choice);
    *  - minhash: same split over documents at Jaccard ≥ 1/2 on word-3
    *    shingle hashes; truth = [[Dedup.prefixJaccardPairs]] (PPJoin —
    *    EXACT and candidate-complete; doc-freq pruning disabled so the
    *    truth set drops nothing) restricted to cross-split pairs.
    *
    * Found pairs are exact-verified subsets of truth by construction, so
    * recall = found / truth needs only counts.
    */
  private def probeSection(spark: SparkSession, label: String, dir: String,
                           semTaus: Seq[Double], tide: TideTrace)
      : Double => String = {
    import graft.functions.{ShingleFunctions, TextFunctions}
    val safe = label.replaceAll("[^A-Za-z0-9]", "_")

    val emb = Tables.embeddings(spark, dir).localCheckpoint(true)
    val corpusE = emb.filter(col("vec_id") % 10 =!= 0)
    val batchE = emb.filter(col("vec_id") % 10 === 0)
    val nC = corpusE.count()
    val tTide = tide.sample()
    val (tRow, tSecs) = timed {
      val sums = semTaus.map(t =>
        sum(when(col("c") >= t, 1L).otherwise(0L)).as(s"t$t"))
      corpusE.select(col("vec_id").as("idc"), col("embedding").as("vc"))
        .join(broadcast(batchE.select(col("vec_id").as("idn"),
          col("embedding").as("vn"))), col("idc") =!= col("idn"))
        .select(VectorFunctions.cosine(col("vc"), col("vn")).as("c"))
        .agg(sums.head, sums.tail: _*)
        .collect().head
    }
    val truthAt = semTaus.zipWithIndex
      .map { case (t, i) => t -> tRow.getLong(i) }.toMap
    val ncells = Similarity.ivfCellCount(nC)
    val floorPpm = Similarity.ivfPairRecallFloorPpm(nC)
    def semLegs(name: String, anchors: DataFrame): Seq[Leg] = {
      val table = s"graft_recall_sem_${name}_$safe"
      val (_, buildSecs) = timed {
        Dedup.writeSemanticIvfIndex(corpusE, "vec_id", "embedding",
          anchors, table)
      }
      // adaptive query-side depth (round-13): same index, deeper probe —
      // the recall-vs-cost dial measured against the symmetric leg
      val np = Similarity.ivfProbeDepth(ncells)
      val legs = semTaus.flatMap { tau =>
        val pTide = tide.sample()
        val (found, secs) = timed {
          Dedup.semanticNearDupsIvfAgainstIndex(batchE, "vec_id",
            "embedding", tau, table).count()
        }
        val dTide = tide.sample()
        val (dFound, dSecs) = timed {
          Dedup.semanticNearDupsIvfAgainstIndex(batchE, "vec_id",
            "embedding", tau, table, nprobe = np).count()
        }
        Seq(
          Leg(s"probe_sem_$name@$tau",
            s"ncells=$ncells,nassign=2,floor_ppm=$floorPpm," +
              s"build_secs=${fmt(buildSecs)}",
            found, truthAt(tau), secs, -1.0, pTide),
          Leg(s"probe_sem_${name}_deep@$tau",
            s"ncells=$ncells,nassign=2,nprobe=$np,floor_ppm=$floorPpm," +
              s"build_secs=${fmt(buildSecs)}",
            dFound, truthAt(tau), dSecs, -1.0, dTide))
      }
      Seq("_cells", "_docs", "_centroids", "_meta").foreach(s =>
        graft.sources.Sinks.dropTableAndLocation(spark, table + s))
      legs
    }
    val kmAnchors = Similarity.kmeansCentroids(corpusE, "embedding",
      nlist = ncells, iters = 2, sampleSize = 8192)
      .select(col("cell").cast("long").as("cell"), col("centroid"))
    val spreadAnchors = corpusE
      .select(col("vec_id"), col("embedding"),
        xxhash64(lit(7L), col("vec_id")).as("h"))
      .orderBy(col("h").asc).limit(ncells)
      .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
      .localCheckpoint(true)
    val semResults = semLegs("km", kmAnchors) ++
      semLegs("spread", spreadAnchors)

    // minhash probe: word-3-shingle hashes, Jaccard >= 1/2, the
    // dedup_incremental_idx configuration
    val docs = Tables.documents(spark, dir).localCheckpoint(true)
    def sh = ShingleFunctions.wordShingleHashes(
      TextFunctions.tokens(col("text")), 3)
    val corpusD = docs.filter(col("doc_id") % 10 =!= 0)
    val batchD = docs.filter(col("doc_id") % 10 === 0)
    val mhTruthTide = tide.sample()
    val (mhTruth, mhTruthSecs) = timed {
      Dedup.prefixJaccardPairs(docs, "doc_id", sh, p = 1, q = 2,
          maxDocFreq = Long.MaxValue)
        .filter((col("id_1") % 10 === 0) =!= (col("id_2") % 10 === 0))
        .count()
    }
    val cfg = Dedup.LshConfig(numHashes = 64, bandRows = 2)
    val mhTable = s"graft_recall_mh_$safe"
    val (_, mhBuildSecs) = timed {
      Dedup.writeMinHashIndex(corpusD, "doc_id", sh, cfg, mhTable)
    }
    val mhTide = tide.sample()
    val (mhFound, mhSecs) = timed {
      Dedup.minHashNearDupsAgainstIndex(batchD, "doc_id", sh,
        threshold = 0.5, mhTable, cfg).count()
    }
    Seq("_docs", "_bands", "_meta").foreach(s =>
      graft.sources.Sinks.dropTableAndLocation(spark, mhTable + s))
    val mhLeg = Leg("probe_mh@0.5",
      s"hashes=64,bandRows=2,build_secs=${fmt(mhBuildSecs)}",
      mhFound, mhTruth, mhSecs,
      // candidate-recall lower bound for a pair AT the threshold:
      // 1 - (1 - t^r)^bands
      1.0 - math.pow(1.0 - math.pow(0.5, cfg.bandRows),
        (cfg.numHashes / cfg.bandRows).toDouble), mhTide)

    // merged-index leg: the SAME corpus reaches the index 80 % via build,
    // 20 % via delta-append (the dedup_incremental_merge shape), probed by
    // the same batch against the same truth — certifying that the merge
    // path's RECALL equals the rebuild path's (ScaleSpec pins their
    // bit-equality on the fixture; this pins it on the recall axis at
    // every audited scale). Expect recall_ppm == probe_mh's exactly:
    // append computes identical signatures, so any gap is a bug.
    val mhmTable = s"graft_recall_mhm_$safe"
    val (_, mhmBuildSecs) = timed {
      Dedup.writeMinHashIndex(corpusD.filter(col("doc_id") % 10 =!= 7),
        "doc_id", sh, cfg, mhmTable)
      Dedup.appendToMinHashIndex(corpusD.filter(col("doc_id") % 10 === 7),
        "doc_id", sh, mhmTable, cfg)
    }
    val mhmTide = tide.sample()
    val (mhmFound, mhmSecs) = timed {
      Dedup.minHashNearDupsAgainstIndex(batchD, "doc_id", sh,
        threshold = 0.5, mhmTable, cfg).count()
    }
    Seq("_docs", "_bands", "_meta").foreach(s =>
      graft.sources.Sinks.dropTableAndLocation(spark, mhmTable + s))
    // split label derived from the actual doc_id % 10 === 7 append leg
    // (~10% of the corpus appended, ~90% built) — the old hardcoded
    // "built80_appended20" recorded a split the filters never made
    val mhMergedLeg = Leg("probe_mh_merged@0.5",
      s"hashes=64,bandRows=2,built90_appended10,build_secs=${fmt(mhmBuildSecs)}",
      mhmFound, mhTruth, mhmSecs,
      1.0 - math.pow(1.0 - math.pow(0.5, cfg.bandRows),
        (cfg.numHashes / cfg.bandRows).toDouble), mhmTide)

    (quietest: Double) => {
      val legJson = (semResults :+ mhLeg :+ mhMergedLeg)
        .map(legToJson(_, quietest)).mkString(",")
      val truthJson = semTaus
        .map(t => s""""$t":${truthAt(t)}""").mkString("{", ",", "}")
      s""""probe_$label":{"n_corpus":$nC,"cross_truth_pairs":$truthJson,"cross_truth_secs":${fmt(tSecs)},"cross_truth_secs_tide":${fmt(tideAdj(tSecs, tTide, quietest))},"mh_truth_pairs":$mhTruth,"mh_truth_secs":${fmt(mhTruthSecs)},"mh_truth_secs_tide":${fmt(tideAdj(mhTruthSecs, mhTruthTide, quietest))},"legs":{$legJson}}"""
    }
  }

  // -- deterministic clustered corpus (the SemDeDup regime: tight clusters,
  // -- production-band thresholds) — the splitmix mix/unit convention of
  // -- RobustnessSpec, scaled to arbitrary n ------------------------------
  private def mix(xs: Long*): Long = {
    var a = 0x9e3779b97f4a7c15L
    xs.foreach { x =>
      a = (a ^ x) * 0xbf58476d1ce4e5b9L
      a = (a ^ (a >>> 27)) * 0x94d049bb133111ebL
      a = a ^ (a >>> 31)
    }
    a
  }
  private def unit(xs: Long*): Double =
    (mix(xs: _*) >>> 11).toDouble / (1L << 53).toDouble

  /** n vectors in ⌈n/occupancy⌉ tight clusters (centers uniform in
    * [−1,1]^dim, members = center + 0.15·noise → in-cluster cosine ≈ 0.9+,
    * cross-cluster ≈ 0). Ids round-robin over clusters so id-prefix
    * anchors are NOT accidentally one-per-cluster-aligned.
    */
  private def clusteredEmb(spark: SparkSession, n: Int,
      dim: Int = 32, occupancy: Int = 20): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val k = math.max(1, n / occupancy)
    (0 until n).map { i =>
      val c = i % k
      val v = Array.tabulate(dim) { d =>
        val ctr = 2.0 * unit(20L, c, d) - 1.0
        (ctr + 0.15 * (2.0 * unit(21L, c, i, d) - 1.0)).toFloat
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  def main(args: Array[String]): Unit = {
    val clustered = args.headOption.contains("--clustered")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors(), 32).toString)
    val spark = GraftSession.create(appName = "graft-recall",
      master = s"local[$cpus]", shufflePartitions =
        GraftSession.envShufflePartitions.orElse(Some(cpus.toInt)))
    spark.sparkContext.setLogLevel("WARN")

    val tide = new TideTrace(spark)
    val (taus, outFile, sections) =
      if (clustered) {
        // the SemDeDup operating regime: clustered corpus, high tau (all
        // in-cluster cosines sit ≈0.9, so both taus share the same truth
        // set while exercising different LSH geometries)
        val sizes = args.drop(1).map(_.toInt).toSeq match {
          case Nil => Seq(20000, 60000)
          case s => s
        }
        val ts = Seq(0.5, 0.8)
        (ts, "RECALL_CLUSTERED.json", sizes.map(nn =>
          measureSection(s"clustered_n$nn", clusteredEmb(spark, nn), ts,
            tide)))
      } else {
        val dirs =
          if (args.nonEmpty) args.toSeq
          else Seq("/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf3")
        val ts = Seq(0.4, 0.5)
        val live = dirs
          .filter(d => new java.io.File(s"$d/embeddings.parquet").isFile)
        // clustered-truth legs AT THE SAME THREE SCALES as the fixture
        // dirs (round-13, verdict #1's decomposition): the uniform
        // ScaleGen fixture's true-pair density grows quadratically, so
        // its recall curve conflates that artifact with genuine boundary
        // loss; the clustered corpora (SemDeDup's operating regime) hold
        // truth density per row roughly constant, so THEIR curve isolates
        // what the partition actually loses as it refines. n is matched
        // to each dir's embedding count (2 000 / 20 000 / 60 000).
        val clusteredNs = live.map(d =>
          Tables.embeddings(spark, d).count().toInt)
        (ts, "RECALL.json",
          live.map(d =>
            measureSection(d, Tables.embeddings(spark, d), ts, tide))
            ++ live.map(d => probeSection(spark, d, d, ts, tide))
            ++ clusteredNs.map(nn =>
              measureSection(s"clustered_n$nn", clusteredEmb(spark, nn),
                ts, tide)))
      }
    // render with the run-global quietest sentinel reading — every leg's
    // secs_tide is its cost at the box's quietest observed moment, the
    // same semantics as Bench's total_tide_adjusted
    val quietest = tide.quietest
    val json = s"""{"metric":"recall_at_n","taus":[${taus.mkString(",")}],"tide_ref_query":"q1_agg","tide_ref_dir":"/root/testdata/sf0.1","tide_quietest_sec":${fmt(quietest)},"dirs":{${sections.map(_(quietest)).mkString(",")}}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
