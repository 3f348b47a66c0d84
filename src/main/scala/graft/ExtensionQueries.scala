package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{ShingleFunctions, TextFunctions}
import graft.operators.{AsOfJoin, Bpe, CorpusFilters, Dedup, Graph, RangeJoin, Sampling, Similarity, Sketches, Stats, TextAnalysis}
import graft.sources.Multimodal

/** North-star extension operators (dedup, similarity search, text analysis,
  * multimodal) as declared queries. Oracle-backed wherever the computation
  * is replicable in DuckDB SQL — including hyperplane LSH, whose seeded
  * planes are emitted into the oracle; only xxh64-based simhash, iterative
  * k-means IVF and impl-specific HLL stay rows-only, consistency-tested
  * against brute force in ScalaTest.
  */
object ExtensionQueries {

  /** Shared build-once of the persisted semantic-IVF index over the
    * corpus split (`vec_id % 10 != 0`) of `d`'s embeddings — the probe
    * (dedup_semantic_ivf_incr) and staleness-audit
    * (dedup_semantic_ivf_drift) queries exercise the SAME index, which is
    * the deployment shape: one index, many lifecycle checks. Seeded
    * anchors = the first ncells corpus ids, so DuckDB replays routing on
    * both sides; the corpus content-signature plus routing parameters
    * decide whether the persisted tables need rebuilding. Returns the
    * table base name.
    */
  private def semanticIvfIndexBuiltOnce(
      s: SparkSession, d: String, emb: DataFrame): String = {
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val ncells = Similarity.ivfCellCount(corpus.count())
    val anchors = corpus.orderBy("vec_id").limit(ncells)
      .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
    val table = "graft_sem_idx_" + d.replaceAll("[^A-Za-z0-9]", "_")
    // the signature carries the routing POSTURE the build ran under
    // (ivfGroupProbePolicy) — index content and probe routing must never
    // mix postures, so a policy change invalidates the cached build
    graft.sources.Sinks.ensureBuiltOnce(s, table,
      s"ivf:$ncells:nassign2:gp${Similarity.ivfGroupProbePolicy(ncells)}|" +
        graft.sources.Sinks.contentSignature(
          corpus.select(col("vec_id"), col("embedding"))),
      expectedSuffixes = Seq("_cells", "_docs", "_centroids", "_meta")) {
      Dedup.writeSemanticIvfIndex(corpus, "vec_id", "embedding", anchors,
        table)
    }
    table
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Dedup: exact + fingerprint --------------------------------------
    "dedup_exact" -> ((s, d) => {
      Dedup.exact(Tables.documents(s, d), "text", "doc_id")
        .select("doc_id", "n_copies")
        .orderBy("doc_id")
    }),
    "dedup_fingerprint" -> ((s, d) => {
      Dedup.withFingerprint(Tables.documents(s, d), "text")
        .select("doc_id", "fingerprint")
        .orderBy("doc_id")
    }),

    // ---- Dedup: MinHash-LSH word-3-gram near-dups (verified exact) -------
    "dedup_minhash" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.minHashNearDups(docs, "doc_id",
        ShingleFunctions.wordShingleHashes(TextFunctions.tokens(col("text")), 3),
        threshold = 0.5, Dedup.LshConfig(numHashes = 64, bandRows = 2))
        .orderBy("id_1", "id_2")
    }),

    // ---- Dedup: MinHash-LSH char-8-gram near-dups ------------------------
    // bandRows=3 over 96 hashes (32 bands): candidate-miss probability for
    // a pair at exactly the 0.6 threshold is (1-0.6^3)^32 ≈ 4e-4 (vs ~11%
    // at bandRows=4/16 bands), so the exact-Jaccard verify against the
    // brute-force oracle can't drop a borderline pair; the char-8 baseline
    // jaccard ≈ 0.04 keeps candidates ≈ 0.2% of all pairs.
    "dedup_ngram" -> ((s, d) => {
      // char-8 shingles × 96 minhashes is the heaviest per-doc hash pass
      // of the surface and the single-row-group scan cannot split —
      // spread before the signature map (see graft.operators.Spread)
      val docs = graft.operators.Spread
        .byKey(Tables.documents(s, d), col("doc_id"))
      Dedup.minHashNearDups(docs, "doc_id",
        ShingleFunctions.charShingleHashes(col("text"), 8),
        threshold = 0.6,
        Dedup.LshConfig(numHashes = 96, bandRows = 3, estMargin = 0.25))
        .orderBy("id_1", "id_2")
    }),

    // ---- Dedup: incremental (new batch vs corpus index) ------------------
    // every 10th doc plays the freshly ingested batch; the other 90% are
    // the standing corpus. Same recall math as dedup_minhash; the oracle
    // is the exact new x corpus Jaccard cross-check.
    "dedup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def sh = ShingleFunctions.wordShingleHashes(
        TextFunctions.tokens(col("text")), 3)
      Dedup.minHashNearDupsAgainst(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          "doc_id", sh, sh, threshold = 0.5,
          Dedup.LshConfig(numHashes = 64, bandRows = 2))
        .orderBy("id_new", "id_corpus")
    }),

    // ---- Dedup: incremental probe against the PERSISTED bucketed index ---
    // Same split, config and oracle as dedup_incremental, but the corpus
    // legs read writeMinHashIndex's bucketed tables: the corpus never
    // re-shuffles — per batch, only the (small) new side exchanges
    // (ScaleSpec pins the exchange-free corpus plan). The index build is
    // included in the query (a self-contained demonstration); a deployment
    // builds once and probes every batch.
    "dedup_incremental_idx" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def sh = ShingleFunctions.wordShingleHashes(
        TextFunctions.tokens(col("text")), 3)
      val cfg = Dedup.LshConfig(numHashes = 64, bandRows = 2)
      val table = "graft_mh_idx_" + d.replaceAll("[^A-Za-z0-9]", "_")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      // build-once: rebuilding on EVERY query construction (plan digests,
      // bench reps) rewrote shared managed tables as a side effect; the
      // content-signature marker skips the rebuild when corpus + config
      // are unchanged and forces it when either drifts
      graft.sources.Sinks.ensureBuiltOnce(s, table,
        s"mh:${cfg.numHashes}:${cfg.bandRows}:${cfg.seed}|" +
          graft.sources.Sinks.contentSignature(
            corpus.select(col("doc_id"), col("text"))),
        expectedSuffixes = Seq("_docs", "_bands", "_meta")) {
        Dedup.writeMinHashIndex(corpus, "doc_id", sh, cfg, table)
      }
      Dedup.minHashNearDupsAgainstIndex(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", sh,
          threshold = 0.5, table, cfg)
        .orderBy("id_new", "id_corpus")
    }),

    // ---- Dedup: index MAINTENANCE — delta-append (merge), then probe ----
    // The missing quarter of the index lifecycle (build-once → probe →
    // audit → MERGE): the standing index is built from 80% of the corpus
    // (doc_id % 10 ∉ {0,7}), the 7-stratum plays a later ingest batch
    // APPENDED via Dedup.appendToMinHashIndex (idempotent, bucket-spec-
    // preserving — the corpus is never rewritten), and the 0-stratum then
    // probes the merged index. The oracle is the exact new × (corpus ∪
    // delta) Jaccard replay — i.e. the DuckDB gate itself certifies
    // append ≡ full rebuild, because the SQL knows nothing about which
    // rows arrived via the append path.
    "dedup_incremental_merge" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def sh = ShingleFunctions.wordShingleHashes(
        TextFunctions.tokens(col("text")), 3)
      val cfg = Dedup.LshConfig(numHashes = 64, bandRows = 2)
      val table = "graft_mh_merge_" + d.replaceAll("[^A-Za-z0-9]", "_")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0 &&
        col("doc_id") % 10 =!= 7)
      val delta = docs.filter(col("doc_id") % 10 === 7)
      // the marker vouches for the POST-merge state (corpus ∪ delta +
      // config), so bench reps / digest sweeps neither rebuild nor
      // re-append; content drift in either slice forces build + merge
      graft.sources.Sinks.ensureBuiltOnce(s, table,
        s"mh:${cfg.numHashes}:${cfg.bandRows}:${cfg.seed}|" +
          graft.sources.Sinks.contentSignature(
            corpus.unionByName(delta).select(col("doc_id"), col("text"))),
        expectedSuffixes = Seq("_docs", "_bands", "_meta")) {
        Dedup.writeMinHashIndex(corpus, "doc_id", sh, cfg, table)
        Dedup.appendToMinHashIndex(delta, "doc_id", sh, table, cfg)
      }
      Dedup.minHashNearDupsAgainstIndex(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", sh,
          threshold = 0.5, table, cfg)
        .orderBy("id_new", "id_corpus")
    }),

    // ---- Dedup: full index-maintenance cycle — build → append → COMPACT →
    // probe. Compaction (Sinks.compactBucketed through
    // Dedup.compactMinHashIndex) is IO-only by contract: it re-files each
    // bucket to one file with ZERO shuffle and recomputes no signature or
    // band hash, so the probe over the compacted index must be
    // bit-identical to dedup_incremental_merge's probe over the
    // fragmented one — which is why the two queries SHARE an oracle: the
    // green hash makes the IO-only invariant driver-gated instead of
    // spec-only (file-count and plan assertions stay in ScaleSpec). ------
    "dedup_incremental_compact" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def sh = ShingleFunctions.wordShingleHashes(
        TextFunctions.tokens(col("text")), 3)
      val cfg = Dedup.LshConfig(numHashes = 64, bandRows = 2)
      val table = "graft_mh_cpt_" + d.replaceAll("[^A-Za-z0-9]", "_")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0 &&
        col("doc_id") % 10 =!= 7)
      val delta = docs.filter(col("doc_id") % 10 === 7)
      graft.sources.Sinks.ensureBuiltOnce(s, table,
        s"mhc:${cfg.numHashes}:${cfg.bandRows}:${cfg.seed}|" +
          graft.sources.Sinks.contentSignature(
            corpus.unionByName(delta).select(col("doc_id"), col("text"))),
        expectedSuffixes = Seq("_docs", "_bands", "_meta")) {
        Dedup.writeMinHashIndex(corpus, "doc_id", sh, cfg, table)
        Dedup.appendToMinHashIndex(delta, "doc_id", sh, table, cfg)
        Dedup.compactMinHashIndex(s, table)
      }
      Dedup.minHashNearDupsAgainstIndex(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", sh,
          threshold = 0.5, table, cfg)
        .orderBy("id_new", "id_corpus")
    }),

    // ---- Dedup-at-the-door THROUGH Structured Streaming -------------------
    // The flagship curation-as-a-stream path ([[graft.streaming.Streams
    // .streamDedupIngest]]) made driver-visible: TWO AvailableNow drains
    // split by doc parity — the first bootstraps the corpus from its own
    // canonical near-dup survivors, the second exercises every door check
    // in order (in-batch exact dedupe, in-batch near-dup canonicalization,
    // id anti-join vs the sink, asymmetric banded MinHash probe vs the
    // STANDING corpus) before appending. The oracle replays the whole
    // composition exactly: recursive min-label closure per phase + an
    // exact-Jaccard cross-phase kill (same band config as dedup_minhash,
    // whose recall the brute-force oracle verifies to be complete here).
    "w_stream_dedup_ingest" -> ((s, d) => {
      val base = graft.streaming.Streams.freshScratch("dedup_ingest", d)
      val sink = s"$base/corpus"
      def sh = ShingleFunctions.wordShingleHashes(
        TextFunctions.tokens(col("text")), 3)
      val cfg = Dedup.LshConfig(numHashes = 64, bandRows = 2)
      def docs = graft.streaming.Streams.documentsStream(s, d)
      graft.streaming.Streams.streamDedupIngest(
        docs.filter(col("doc_id") % 2 === 0), sink, "doc_id", sh,
        threshold = 0.5, cfg, s"$base/ck0")
      graft.streaming.Streams.streamDedupIngest(
        docs.filter(col("doc_id") % 2 === 1), sink, "doc_id", sh,
        threshold = 0.5, cfg, s"$base/ck1")
      s.read.parquet(sink).select("doc_id").orderBy("doc_id")
    }),

    // ---- Dedup-at-the-door through the PERSISTED index — the steady-state
    // streaming shape (round-12 closure of the last O(corpus)-per-trigger
    // path): the same two-drain composition as w_stream_dedup_ingest, but
    // every corpus probe reads the bucketed MinHash index exchange-free
    // and survivors delta-append to it (O(batch) maintenance,
    // Dedup.appendToMinHashIndex) instead of the door re-shingling the
    // sink parquet every micro-batch. Result-identical to the in-plan
    // door by construction (same checks, same config, corpus state ≡
    // index state per batch — StreamingSpec pins the equality), so the
    // two queries SHARE the oracle: one exact SQL replay gates both
    // doors. Index bootstraps EMPTY alongside the wiped scratch sink —
    // the stream replays from nothing, so its index must too.
    "w_stream_dedup_ingest_idx" -> ((s, d) => {
      val base = graft.streaming.Streams.freshScratch("dedup_ingest_idx", d)
      val sink = s"$base/corpus"
      def sh = ShingleFunctions.wordShingleHashes(
        TextFunctions.tokens(col("text")), 3)
      val cfg = Dedup.LshConfig(numHashes = 64, bandRows = 2)
      val table = "graft_mh_door_" + d.replaceAll("[^A-Za-z0-9]", "_")
      // 8 buckets: every per-batch delta-append writes one file generation
      // per bucket, and the door pays that DDL+write inside the stream —
      // at gate scale 32 buckets quadruples small-file churn for nothing
      // (a deployment sizes numBuckets to corpus volume, not batch count)
      Dedup.writeMinHashIndex(
        Tables.documents(s, d).limit(0), "doc_id", sh, cfg, table,
        numBuckets = 8)
      def docs = graft.streaming.Streams.documentsStream(s, d)
      // auto-compaction live in the declared loop (round-13): once the
      // index's _bands table crosses 12 data files (≥2 append generations
      // at 8 buckets) the door compacts it back to one file per bucket
      // inside the ingest loop — and the shared oracle hash certifies the
      // IO-only invariant across the fired compaction, exactly as
      // dedup_incremental_compact does for the driver-gated path.
      graft.streaming.Streams.streamDedupIngestIndexed(
        docs.filter(col("doc_id") % 2 === 0), sink, "doc_id", sh,
        threshold = 0.5, cfg, table, s"$base/ck0",
        autoCompactMaxFiles = 12)
      graft.streaming.Streams.streamDedupIngestIndexed(
        docs.filter(col("doc_id") % 2 === 1), sink, "doc_id", sh,
        threshold = 0.5, cfg, table, s"$base/ck1",
        autoCompactMaxFiles = 12)
      s.read.parquet(sink).select("doc_id").orderBy("doc_id")
    }),

    // ---- Dedup: exact duplicated-substring spans (suffix ordering) -------
    // Lee et al. (ACL 2022) exact-substring dedup: maximal spans whose
    // every 30-char window occurs ≥ 2 times corpus-wide, by equality-class
    // prefix doubling — no fingerprints, so unlike the winnow/df-cut path
    // it cannot miss the MOST-duplicated content (the df cap's blind spot;
    // DedupSimilaritySpec plants exactly that miss).
    "dedup_suffix" -> ((s, d) => {
      Dedup.suffixDuplicateSpans(Tables.documents(s, d), "doc_id", "text",
          minLen = 30)
        .orderBy("id", "span_start")
    }),

    // ---- Dedup: directed containment (sub-document detection) ------------
    // |A∩B|/|A| over word-3-gram shingles — catches whole-quotation /
    // subset documents that Jaccard misses; sparse term join + df-cut.
    "dedup_containment" -> ((s, d) => {
      Dedup.containmentPairs(Tables.documents(s, d), "doc_id",
          TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3),
          threshold = 0.7, maxDocFreq = 200L)
        .orderBy("id_sub", "id_super")
    }),

    // ---- Dedup: containment over winnowed fingerprints -------------------
    // Same directed |A∩B|/|A| as dedup_containment but over the winnow
    // SKETCH (density ≈ 2/(w+1) of the k-gram count): the posting list
    // the pair join explodes is ~12x smaller than full shingles — the
    // 100 TB path for sub-document detection. Pure composition:
    // winnowedFingerprints feeds containmentPairs unchanged.
    "dedup_containment_winnow" -> ((s, d) => {
      Dedup.containmentPairs(
          TextAnalysis.winnowedFingerprints(Tables.documents(s, d),
            "text", "doc_id"),
          "id", col("fps"), threshold = 0.6, maxDocFreq = 200L)
        .orderBy("id_sub", "id_super")
    }),

    // ---- Dedup: canonical assignment over near-dup clusters --------------
    "dedup_canonical" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minHashNearDups(docs, "doc_id",
        ShingleFunctions.wordShingleHashes(TextFunctions.tokens(col("text")), 3),
        threshold = 0.5, Dedup.LshConfig(numHashes = 64, bandRows = 2))
      Dedup.canonicalAssignments(pairs)
        .orderBy("id")
    }),

    // ---- Split: leakage-safe train/val/test (by CLUSTER, not doc) -------
    // near-dups share a canonical representative, and the split hash runs
    // on the REPRESENTATIVE — so a near-dup pair can never straddle
    // train/test (the leakage exact-dedup-then-split pipelines miss).
    "q_split_leakage_safe" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minHashNearDups(docs, "doc_id",
        ShingleFunctions.wordShingleHashes(TextFunctions.tokens(col("text")), 3),
        threshold = 0.5, Dedup.LshConfig(numHashes = 64, bandRows = 2))
      val asg = Dedup.canonicalAssignments(pairs)
      docs
        .join(asg.select(col("id").as("doc_id"), col("canonical_id")),
          Seq("doc_id"), "left")
        .withColumn("rep", coalesce(col("canonical_id"), col("doc_id")))
        .withColumn("split",
          Sampling.splitLabel(Sampling.md5Bucket(col("rep"))))
        .select(col("doc_id"), col("rep"), col("split"))
        .orderBy("doc_id")
    }),

    // ---- Dedup: SimHash at hamming radius 2 (chunks=3, width=21) over
    // md5-derived token hashes — fully oracle-checked: DuckDB brute-forces
    // all pairs and the pigeonhole chunk join is complete-recall, so the
    // sets are equal. The xxh64 signature family stays the documented fast
    // path (HashFunctions.simhash64, one hash pass per token instead of a
    // full md5); its pigeonhole completeness is pinned against brute force
    // in DedupSimilaritySpec. The md5 twin at radius 3 is dedup_simhash_md5
    // — together the two radii also pin the chunking arithmetic (3 vs 4
    // chunks over the 60-bit signature). -----------------------------------
    "dedup_simhash" -> ((s, d) => {
      // same per-token md5 whale + unsplittable scan as dedup_simhash_md5
      // — spread before the signature map (see graft.operators.Spread)
      val sigs = graft.operators.Spread
        .byKey(Tables.documents(s, d), col("doc_id"))
        .withColumn("hs", expr(
          "transform(split(text, ' '), t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"))
        .select(col("doc_id").as("id"),
          graft.functions.HashFunctions.simhashFromHashes(col("hs")).as("sig"))
      Dedup.simHashNearDupsFromSigs(sigs, maxDist = 2)
        .orderBy("id_1", "id_2")
    }),

    // ---- Dedup: SimHash over md5-derived token hashes — same pigeonhole
    // chunk join, but the 60-bit signature is computable in DuckDB SQL, so
    // this variant is fully oracle-checked (the DuckDB side brute-forces
    // all pairs; complete recall of the chunk join makes the sets equal) --
    "dedup_simhash_md5" -> ((s, d) => {
      // per-token md5 is the query's CPU whale and the single-row-group
      // scan cannot split — spread before the signature map (see
      // graft.operators.Spread)
      val sigs = graft.operators.Spread
        .byKey(Tables.documents(s, d), col("doc_id"))
        .withColumn("hs", expr(
          "transform(split(text, ' '), t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"))
        .select(col("doc_id").as("id"),
          graft.functions.HashFunctions.simhashFromHashes(col("hs")).as("sig"))
      Dedup.simHashNearDupsFromSigs(sigs, maxDist = 3)
        .orderBy("id_1", "id_2")
    }),

    // ---- Dedup: embedding-cosine near-dups -------------------------------
    "dedup_embcos" -> ((s, d) => {
      Dedup.embeddingNearDups(Tables.embeddings(s, d), "vec_id", "embedding",
        probe = col("vec_id") < 100, threshold = 0.3)
        .orderBy("id_1", "id_2")
    }),

    // ---- Dedup: semantic (SemDeDup-style, LSH-bucketed + cosine verify) --
    // Fixture embeddings are weakly clustered (max pair cosine ≈ 0.51), so
    // the query runs threshold 0.4 with bandBits=6 (~65% band recall at
    // the threshold, ~78% of unrelated pairs pruned); the 8-bit default
    // suits real corpora where dups sit at cosine ≥ 0.8 (recall ≥ 0.99).
    // The oracle replays the seeded hyperplane pipeline AND the recursive
    // closure, so the full id → canonical map is hash-checked.
    "dedup_semantic" -> ((s, d) => {
      // corpus-size-adaptive geometry (Similarity.lshGeometry): at the
      // sf0.01 gate this resolves to EXACTLY the oracle's (6, 16); past
      // the occupancy knee bandBits tracks log2(n) so candidate volume
      // stays ~linear (the sf1 scaling audit measured 19x for the 10x
      // step under fixed geometry). The count probe is metadata-fast on
      // parquet (count-star from footers).
      val emb = Tables.embeddings(s, d)
      val (bits, bands) = Similarity.lshGeometry(emb.count(), tau = 0.4,
        baseBits = 6, baseBands = 16)
      Dedup.semanticDedup(emb, "vec_id", "embedding",
          threshold = 0.4, bandBits = bits, numBands = bands)
        .orderBy("id")
    }),

    // ---- Dedup: multi-probe semantic near-dup pairs ----------------------
    // bandBits=8 with query-directed probes (probeDepth=2, Lv §4.2): the
    // 6 best flip sets of ≤2 bits by summed margin replace the former 8
    // single-bit flips — 7 probe rows per (vec, band) instead of 9 (22%
    // fewer candidate-join rows) while double flips on two near-zero
    // margins keep the recall mass the dropped confident singles carried
    // (RecallBench measures the trade at sf1/sf3). Probe rows on one side
    // of the self-join cover both directions.
    "dedup_semantic_mp" -> ((s, d) => {
      // adaptive geometry, gate-invariant at (8, 16); see dedup_semantic
      val emb = Tables.embeddings(s, d)
      val (bits, bands) = Similarity.lshGeometry(emb.count(), tau = 0.4,
        baseBits = 8, baseBands = 16)
      Dedup.semanticNearDups(emb, "vec_id", "embedding",
          threshold = 0.4, bandBits = bits, numBands = bands,
          probeDepth = 2, maxProbeBits = 6)
        .orderBy("id_1", "id_2")
    }),

    // ---- Dedup: IVF-routed semantic near-dups (SemDeDup production
    // shape — cluster, then dedup INSIDE cells). The low-τ scale path:
    // candidate volume is n·targetCellSize/2 (linear) instead of the
    // n^(1+ρ) the recall-compensated LSH pays at τ=0.4. Seeded anchors
    // (vec_id < ncells) make routing bit-reproducible, so DuckDB replays
    // assignment, candidates AND verification; production would pass
    // kmeansCentroids instead. ncells is corpus-adaptive
    // (Similarity.ivfCellCount), gate-pinned at 8 (OracleCouplingSpec). --
    "dedup_semantic_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val ncells = Similarity.ivfCellCount(emb.count())
      val anchors = emb.filter(col("vec_id") < ncells)
        .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
      // Routing posture is scale-adaptive (round-13 fix of the measured
      // 4.31× sf1→sf3 step): FLAT routing costs O(n·ncells) cosines, and
      // with constant-occupancy cells (ncells ∝ n) that is Θ(n²) — the
      // superlinear term the sf3 audit caught once the per-row map became
      // the dominant cost. Past 512 cells the declared path routes
      // TWO-LEVEL (driver k-means groups over the same anchors,
      // groupProbe=8: per-row cost ~(1+8)·√ncells vs ncells — 3.4× less
      // at the sf3 point, growing as √n), trading the standard IMI
      // boundary loss measured in RECALL.json's ivf_km2l leg. The sf0.01
      // gate (ncells=8) stays flat, so the oracle replay is unchanged.
      val groupProbe = Similarity.ivfGroupProbePolicy(ncells)
      Dedup.semanticNearDupsIvf(emb, "vec_id", "embedding",
          threshold = 0.4, cells = anchors, nassign = 2,
          groupProbe = groupProbe)
        .orderBy("id_1", "id_2")
    }),

    // ---- Dedup: scale-indexed RECALL gate for the IVF dedup family -------
    // The round-12 verdict's top item made a standing contract: RECALL.json
    // measured the flat route's pair recall eroding 0.455 → 0.158 → 0.092
    // across sf0.1/sf1/sf3 on this weakly-clustered fixture (while the
    // clustered regime holds 0.77–1.0 — RECALL_CLUSTERED.json), so the
    // floor is a declared FUNCTION of n (Similarity.ivfPairRecallFloorPpm),
    // falling with scale on purpose, and the audit row goes through the
    // oracle like the sim_* recall gates: DuckDB independently computes the
    // stratum truth (exact cosines), replays the seeded routing, re-derives
    // modulus and floor from n, and re-checks the verdict — hash-exact.
    // The audited route carries the SAME groupProbe policy as the
    // production dedup_semantic_ivf (two-level past 512 cells, round-14:
    // the gate must certify the posture the deployment actually runs, not
    // the flat route it no longer takes at scale); at the oracle gate
    // (ncells=8) the policy resolves to flat, so the replay is unchanged.
    // This is the low-τ SURVIVAL bound; the OPERATING-regime contract is
    // dedup_semantic_ivf_recall08 below.
    // Gate point: n=500, truth 59 pairs, found 46 (0.78 ≥ 0.45 floor). ----
    "dedup_semantic_ivf_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val ncells = Similarity.ivfCellCount(emb.count())
      val anchors = emb.filter(col("vec_id") < ncells)
        .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
      Dedup.semanticIvfRecallAudit(emb, "vec_id", "embedding",
        threshold = 0.4, cells = anchors, nassign = 2,
        groupProbe = Similarity.ivfGroupProbePolicy(ncells))
    }),

    // ---- Dedup: OPERATING-regime recall gate for the IVF dedup family ----
    // The round-13 verdict's top item: the τ=0.4 gate above certifies
    // survival on near-uniform truth (its floor falls to 6 % past
    // n=30 000), but the operator is a SemDeDup implementation (Abbas et
    // al. 2023 — dedup INSIDE clusters at in-cluster cosine ≈ 0.8+), and
    // THAT regime is where its recall contract must live: measured
    // 0.948–0.9998 at n = 20 000 / 60 000 (RECALL_CLUSTERED.json
    // ivf_*@0.8). The driver fixture is near-uniform (zero τ=0.8 pairs —
    // a gate over it would certify an empty truth set), so the clustered
    // regime is DERIVED from it bit-replayably
    // (Dedup.clusteredEmbeddingView: member_i = center_(i mod k) + 0.2·v_i
    // — IEEE double arithmetic both engines reproduce exactly; in-cluster
    // cosine ≈ 0.96, cross ≈ 0, so τ=0.8 truth = in-cluster pairs). Floor
    // is CONSTANT 0.95 at every scale — coherently-routed tight clusters
    // keep their pairs cell-local as the partition refines, so unlike the
    // survival bound there is no structural erosion to price in. Same
    // shipped routing posture (two-level past 512 cells), same stratum-
    // truth discipline, same integer verdict. Gate point: n=500, k=25
    // clusters, truth 4750 in-cluster pairs, found 4695 (0.988 ≥ 0.95). --
    "dedup_semantic_ivf_recall08" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val view = Dedup.clusteredEmbeddingView(emb, "vec_id", "embedding")
      val ncells = Similarity.ivfCellCount(emb.count())
      val anchors = view.filter(col("vec_id") < ncells)
        .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
      Dedup.semanticIvfRecallAudit(view, "vec_id", "embedding",
        threshold = 0.8, cells = anchors, nassign = 2,
        groupProbe = Similarity.ivfGroupProbePolicy(ncells),
        floorPpm = Some(Similarity.ivfClusteredPairRecallFloorPpm))
    }),

    // ---- Dedup: TWO-LEVEL IVF-routed semantic near-dups — the growth
    // path past ~10⁴ cells (route to √ncells coarse groups, then only
    // inside the probed groups; per-row FLOPs ~(1+gprobe)·√ncells instead
    // of ncells). Gate configuration is FULLY seeded so DuckDB replays
    // every derived artifact: 16 anchor cells (vec_id < 16), 4 seeded
    // group centroids (every 4th anchor — ⌈√16⌉ = 4, the production
    // sizing), cell→group assignment = deterministic cosine argmax
    // (Similarity.assignToGroups), per-vector routing = top-2 groups then
    // top-2 cells within them (score DESC, index ASC at both levels —
    // IvfRouteCellsTwoLevel's exact tie discipline). Production passes
    // k-means groups instead (groupCells = None); the seeded-exhaustive ≡
    // flat reduction is pinned in SketchSpec. ----------------------------
    "dedup_semantic_ivf2" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      // corpus-adaptive quantizer in the SAME seeded family at every
      // scale: ncells2 = max(16, 2·ivfCellCount(n)) resolves to the
      // oracle's 16 at the sf0.01 gate (ivfCellCount(500) = 8 —
      // OracleCouplingSpec) and grows ∝ n past it, stride-grouped into
      // ⌈√ncells2⌉ coarse groups (4 at the gate, matching the oracle's
      // cell/4). The first declared form pinned 16 cells at EVERY scale,
      // which turned cell-local pair volume Θ(n²/16): at sf3 (~135k
      // vectors) the verify sort spilled past the disk. Fixed-cell
      // configs are gate artifacts; the declared query must carry the
      // operator's own scale posture.
      val ncells2 = math.max(16, 2 * Similarity.ivfCellCount(emb.count()))
      val ngroups = math.ceil(math.sqrt(ncells2.toDouble)).toInt
      val stride = (ncells2 + ngroups - 1) / ngroups
      val anchors = emb.filter(col("vec_id") < ncells2)
        .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
      val groups = emb.filter(col("vec_id") < ncells2 &&
          col("vec_id") % stride === 0)
        .select((col("vec_id") / stride).cast("long").as("cell"),
          col("embedding").as("centroid"))
      Dedup.semanticNearDupsIvf(emb, "vec_id", "embedding",
          threshold = 0.4, cells = anchors, nassign = 2,
          groupProbe = 2, groupCells = Some(groups))
        .orderBy("id_1", "id_2")
    }),

    // ---- Dedup: cluster-coherence audit of the IVF route — the runtime
    // check of the routing rule's PRECONDITION (SCALE.md round 9: the IVF
    // route's recall premise is a clustered corpus). Mean top-1 routing
    // cosine in integer micro-units (floor(cos·10⁶) per row, integer
    // compare), so the row is fully hash-replayable under the same seeded
    // anchors as dedup_semantic_ivf2. Floor 0.20 documents the
    // seeded-anchor regime on this fixture (measured 0.227–0.246 across
    // sf); learned k-means centroids judge against ~0.7 — below that the
    // corpus is too weakly clustered for cell-local recall at low τ and
    // the operator's docs route to multi-probe LSH instead
    // (DedupSimilaritySpec pins the two-regime split). ------------------
    "dedup_semantic_ivf_coh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val anchors = emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
      Dedup.ivfRouteCoherence(emb, "vec_id", "embedding", anchors,
        floorPpm = 200000L)
    }),

    // ---- Dedup: incremental semantic probe against the PERSISTED
    // IVF index — the embedding-space mirror of dedup_incremental_idx:
    // the corpus is routed ONCE (bucketed (cell, id) + (id, v) tables),
    // each batch routes through the index's own stored centroid table
    // and equi-joins cells; corpus never re-shuffles (ScaleSpec). Seeded
    // anchors = the first ncells corpus ids, so DuckDB replays routing
    // on BOTH sides plus the join and the cosine verify. ncells is
    // gate-pinned at 8 for the 450-row corpus (OracleCouplingSpec). -----
    "dedup_semantic_ivf_incr" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val table = semanticIvfIndexBuiltOnce(s, d, emb)
      Dedup.semanticNearDupsIvfAgainstIndex(
          emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding",
          threshold = 0.4, table)
        .orderBy("id_new", "id_corpus")
    }),

    // ---- Dedup: ASYMMETRIC deep probe of the persisted IVF index ---------
    // Same index, same batch as dedup_semantic_ivf_incr, but the QUERY
    // side probes its top-4 cells while the corpus stays indexed at
    // nassign=2 — the nprobe ≫ nassign search asymmetry (Jégou PAMI'11
    // §III) that buys boundary recall back at strictly per-query cost
    // (candidates ∝ nprobe · occupancy; the corpus never re-routes). This
    // is the declared form of the round-13 recall mitigation: RECALL.json's
    // probe_sem_*_deep legs measure the same dial at sf0.1/sf1/sf3
    // (adaptive depth via Similarity.ivfProbeDepth — ≈2× candidates at the
    // sf3 cliff point). nprobe is PINNED at 4 here so the gate output is a
    // strict superset of the symmetric probe's and DuckDB replays the
    // deeper routing exactly (rk <= 4 on the batch side only). -------------
    "dedup_semantic_ivf_deep" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val table = semanticIvfIndexBuiltOnce(s, d, emb)
      Dedup.semanticNearDupsIvfAgainstIndex(
          emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding",
          threshold = 0.4, table, nprobe = 4)
        .orderBy("id_new", "id_corpus")
    }),

    // ---- Dedup: semantic-IVF index MAINTENANCE — delta-append through
    // the FROZEN quantizer, then probe. The embedding-space mirror of
    // dedup_incremental_merge: the index is built from the corpus minus
    // its 7-stratum, the 7-stratum is APPENDED via
    // Dedup.appendToSemanticIvfIndex (routed through the index's OWN
    // stored centroids — the quantizer is provisioned for the full corpus
    // and frozen, which is how a deployment ingests: merge fills cells,
    // the drift audit says when to re-cluster), and the 0-stratum probes
    // the merged index. Oracle = dedup_semantic_ivf_incr's full routing
    // replay over corpus ∪ delta — the SQL can't see which rows arrived
    // via the append path, so the green hash IS append ≡ rebuild. -------
    "dedup_semantic_ivf_merge" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val corpus = emb.filter(col("vec_id") % 10 =!= 0)
      val ncells = Similarity.ivfCellCount(corpus.count())
      val anchors = corpus.orderBy("vec_id").limit(ncells)
        .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
      val table = "graft_sem_merge_" + d.replaceAll("[^A-Za-z0-9]", "_")
      graft.sources.Sinks.ensureBuiltOnce(s, table,
        s"ivf:$ncells:nassign2:gp${Similarity.ivfGroupProbePolicy(ncells)}|" +
          graft.sources.Sinks.contentSignature(
            corpus.select(col("vec_id"), col("embedding"))),
        expectedSuffixes = Seq("_cells", "_docs", "_centroids", "_meta")) {
        Dedup.writeSemanticIvfIndex(
          corpus.filter(col("vec_id") % 10 =!= 7), "vec_id", "embedding",
          anchors, table)
        Dedup.appendToSemanticIvfIndex(
          corpus.filter(col("vec_id") % 10 === 7), "vec_id", "embedding",
          table)
      }
      Dedup.semanticNearDupsIvfAgainstIndex(
          emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding",
          threshold = 0.4, table)
        .orderBy("id_new", "id_corpus")
    }),

    // ---- Dedup: centroid-staleness audit of the PERSISTED IVF index ------
    // completes the index lifecycle as checkable queries (build-once →
    // probe → coherence → STALENESS): the ingest batch routes through the
    // index's stored centroids AND through a fresh quantizer built from
    // the batch itself; the assignment-shift share past the floor says
    // "re-cluster, don't keep probing". Fresh centroids here are the
    // seeded-anchor form (first ncells batch ids) so DuckDB replays the
    // label bridge and both routing argmaxes exactly — the trained
    // (k-means) fresh path is float-iterative and stays covered by
    // ScaleSpec instead. A seeded fresh quantizer over the SAME anchors
    // family as the index yields a drift verdict the oracle can check
    // end-to-end: n_routed, n_shifted, integer floor compare.
    "dedup_semantic_ivf_drift" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val table = semanticIvfIndexBuiltOnce(s, d, emb)
      val batch = emb.filter(col("vec_id") % 10 === 0)
      val ncells = s.table(s"${table}_centroids").count().toInt
      val fresh = batch.orderBy("vec_id").limit(ncells)
        .select(col("vec_id").cast("long").as("cell"),
          col("embedding").cast("array<double>").as("centroid"))
      Dedup.semanticIvfIndexDrift(batch, "vec_id", "embedding", table,
        shiftFloorPpm = 200000L, freshCentroids = Some(fresh))
    }),

    // ---- Dedup: incremental semantic probe (new batch vs corpus) ---------
    // every 10th vector plays the freshly embedded batch; the corpus-side
    // banded signatures are what a deployment precomputes. Same plane
    // config as dedup_semantic, so the oracle replays both sides.
    "dedup_semantic_incr" -> ((s, d) => {
      // adaptive geometry sized on the CORPUS side (it drives the
      // fan-out), gate-invariant at (6, 16); see dedup_semantic
      val emb = Tables.embeddings(s, d)
      val corpus = emb.filter(col("vec_id") % 10 =!= 0)
      val (bits, bands) = Similarity.lshGeometry(corpus.count(), tau = 0.4,
        baseBits = 6, baseBands = 16)
      Dedup.semanticNearDupsAgainst(
          corpus,
          emb.filter(col("vec_id") % 10 === 0),
          "vec_id", "embedding", threshold = 0.4, bandBits = bits,
          numBands = bands)
        .orderBy("id_new", "id_corpus")
    }),

    // ---- Embedding aggregation: deterministic per-label centroids --------
    // Float summation order varies with partitioning, which is exactly why
    // iterative k-means stays rows-only; HERE the per-component sum is an
    // ascending sorted fold (group state = group size), so the centroid is
    // bit-reproducible and the oracle replays it with list_reduce. First 8
    // components keep the output survey-sized.
    "q_embed_centroids" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .filter(col("pos") < 8)
        .groupBy("label", "pos")
        .agg(count(lit(1)).as("n"),
          aggregate(array_sort(collect_list(col("x").cast("double"))),
            lit(0.0), (acc, v) => acc + v).as("sum_c"))
        .withColumn("mean_c", col("sum_c") / col("n"))
        .orderBy("label", "pos")
    }),

    // ---- Embedding analysis: PCA top component by integer power iteration
    // The dominant direction of the (centered) covariance, bit-exact
    // cross-engine: fixed-point floored elements, integer moment matrix
    // n·Σxy − Σx·Σy, and 8 max-normalized integer iterations — no float
    // accumulation anywhere (contrast q_embed_centroids, which needs the
    // sorted-fold trick for ONE double sum). First 16 dims; full-dim is
    // a parameter.
    "q_power_iteration" -> ((s, d) => {
      import graft.operators.Stats
      Stats.topPrincipalDirection(Tables.embeddings(s, d), col("embedding"),
          dims = 16, rounds = 8)
        .orderBy("pos")
    }),

    // ---- Similarity: exact brute-force cosine top-k ----------------------
    "sim_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    // ---- Similarity: k-NN majority-vote label assignment -----------------
    // Weak supervision / label spreading: unlabeled probes (vec_id < 25)
    // take the modal label of their 10 exact cosine neighbors in the
    // labeled corpus (vec_id >= 25); ties to the smallest label via a
    // max(struct) argmax, no second window. Rank cut inherits sim_topk's
    // bit-exact cosine, so the vote set replays exactly in the oracle.
    "q_knn_classify" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val corpus = emb.filter(col("vec_id") >= 25)
      val probes = emb.filter(col("vec_id") < 25)
      Similarity.knnClassify(corpus, probes, "vec_id", "embedding",
          "label", k = 10)
        .join(broadcast(probes.select(col("vec_id").as("query_id"),
          col("label").as("true_label"))), Seq("query_id"))
        .select(col("query_id"), col("true_label"), col("pred_label"),
          col("votes"), (col("pred_label") === col("true_label")).as("correct"))
        .orderBy("query_id")
    }),

    // ---- Similarity: LSH-bucketed ANN (fully oracle-checked: the seeded
    // hyperplanes are emitted into the DuckDB SQL — see lshTopKOracle).
    // bandBits=4: the fixture embeddings are weakly clustered (top-5
    // neighbor cosine ≈ 0.25–0.5), so narrow bands hold candidate recall
    // ≈ 0.9; the bandBits=8 default suits real clustered corpora.
    "sim_lsh_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 5, bandBits = 4, numBands = 16)
        .orderBy("query_id", "rank")
    }),

    // ---- Similarity: multi-probe LSH ANN (fully oracle-checked) ----------
    // Half the bands of sim_lsh_topk (8 vs 16) at bandBits=6, with recall
    // bought back by probing perturbed buckets on the QUERY side only —
    // corpus storage unchanged. probeDepth=2 = Lv et al.'s QUERY-DIRECTED
    // sequence: the 6 best flip sets of ≤2 bits by summed |dot| margin
    // (same probe-row count as the former all-single-flips config, but a
    // double flip of two near-zero margins now out-ranks a confident
    // single). The oracle replays the ranking from the identical dots:
    // ORDER BY abs-sum ASC, mask ASC.
    "sim_lsh_mp_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, bandBits = 6, numBands = 8,
          probeDepth = 2, maxProbeBits = 6)
        .orderBy("query_id", "rank")
    }),

    // ---- Similarity: deterministic seeded-IVF ANN (fully oracle-checked) -
    // Cells anchored at vec_id < 16 instead of learned centroids: no float
    // k-means iterations, so routing AND rerank replay exactly in DuckDB —
    // the audit twin of sim_ivf_topk (whose Lloyd rounds force rows-only).
    "sim_ivf_det_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfSeededTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, nprobe = 4,
          seedPred = col("vec_id") < 16)
        .orderBy("query_id", "rank")
    }),

    // ---- Similarity: IVF coarse-quantizer ANN, gated through a macro-
    // recall contract — the learned k-means routing is not SQL-replayable
    // (float centroid means), so the DECLARED output is the audit row
    // `(n_queries, k, recall_floor_ppm, recall_ok)` vs the in-plan exact
    // scan: DuckDB independently derives n_queries/k/floor and asserts the
    // contract holds. Floor 0.60 sits far under the measured 0.88
    // macro-recall at the sf0.01 gate (margin ≈ 7 hit flips); the
    // neighbor-list leg stays fully hash-checked via sim_ivf_det_topk. ----
    "sim_ivf_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 5)
      val ann = Similarity.ivfTopK(emb, qs,
        "vec_id", "embedding", k = 5, nlist = 16, nprobe = 8)
      Similarity.recallAuditSummary(ann, emb, qs, "vec_id", "embedding",
        k = 5, floorPpm = 600000L)
    }),

    // ---- Similarity: deterministic seeded-PQ ADC (fully oracle-checked) --
    // Codebook cells = subspace slices of vec_id < 16: no per-subspace
    // k-means, so encode + reconstructed norms + ADC scores replay
    // bit-exactly in DuckDB — the audit twin of sim_pq_topk.
    "sim_pq_det_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqSeededAdcTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, m = 8, seedPred = col("vec_id") < 16)
        .orderBy("query_id", "rank")
    }),

    // ---- Similarity: product-quantization ADC ANN with the production
    // shortlist→exact-rerank shape (Jégou et al. §V), gated through the
    // same macro-recall contract as sim_ivf_topk. Rerank matters here: raw
    // ADC recall@5 is 0.28 on the weakly-clustered fixture, 0.76 after the
    // 64-candidate exact rerank — floor 0.48 cleanly separates a working
    // rerank from a broken one while leaving ~7 hit flips of margin
    // against codebook float jitter. Codebook math itself is hash-checked
    // via sim_pq_det_topk. ------------------------------------------------
    "sim_pq_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 5)
      val shortlist = Similarity.pqAdcTopK(emb, qs,
        "vec_id", "embedding", k = 64, m = 8, ksub = 16)
      val ann = Similarity.exactRerank(shortlist, emb, qs,
        "vec_id", "embedding", k = 5)
      Similarity.recallAuditSummary(ann, emb, qs, "vec_id", "embedding",
        k = 5, floorPpm = 480000L)
    }),

    // ---- Similarity: deterministic seeded IVFADC (fully oracle-checked) --
    // seeded routing cells + seeded PQ codebooks — the replayable twin of
    // sim_ivfpq_topk, completing the audit-twin set for the ANN family.
    "sim_ivfpq_det_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfPqSeededTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, nprobe = 4, m = 8,
          cellSeedPred = col("vec_id") < 16, bookSeedPred = col("vec_id") < 16)
        .orderBy("query_id", "rank")
    }),

    // ---- Similarity: full IVFADC — IVF routing + PQ-ADC shortlist +
    // exact rerank, macro-recall-gated like its two parents (measured
    // 0.76 at the gate; floor 0.48). --------------------------------------
    "sim_ivfpq_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 5)
      val shortlist = Similarity.ivfPqTopK(emb, qs,
        "vec_id", "embedding", k = 64, nlist = 16, nprobe = 8, m = 8,
        ksub = 16)
      val ann = Similarity.exactRerank(shortlist, emb, qs,
        "vec_id", "embedding", k = 5)
      Similarity.recallAuditSummary(ann, emb, qs, "vec_id", "embedding",
        k = 5, floorPpm = 480000L)
    }),

    // ---- As-of join: per event, the latest prior-or-equal purchase -------
    // (operator Spark lacks natively; union+window sort-merge shape)
    "q_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val left = ev.select("event_id", "user_id", "ts", "event_type")
      // right side unique per (key, time): max value among same-instant rows
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("pts"))
        .agg(max(col("value")).as("pval"))
      AsOfJoin.asOfBackward(left, purchases, Seq("user_id"), "ts", "pts")
        .select("event_id", "user_id", "event_type", "pts_matched", "pval")
        .orderBy("event_id")
    }),

    // ---- Range join: events inside each signup's 1-day window ------------
    // (bucketized equi-join — no inequality nested loop; see RangeJoin)
    "q_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val left = ev.select(col("user_id"), col("ts"), col("value"))
      val wins = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("window_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 1 DAY")).as("w_end"))
      RangeJoin.pointInInterval(left, wins, Seq("user_id"),
          "ts", "w_start", "w_end", bucketWidth = 86400L)
        .groupBy("window_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("window_id")
    }),

    // ---- Multiset set-ops: EXCEPT ALL / INTERSECT ALL --------------------
    // (the non-distinct variants preserve duplicate multiplicity — the
    // deduping EXCEPT/INTERSECT live in CoreQueries q_except/q_intersect)
    "q_except_all" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val all = li.select(col("l_orderkey"), col("l_returnflag"))
      val taxed = li.filter(col("l_tax") > 0.0)
        .select(col("l_orderkey"), col("l_returnflag"))
      all.exceptAll(taxed)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),
    "q_intersect_all" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val a = li.filter(col("l_quantity") >= 25)
        .select(col("l_orderkey"), col("l_returnflag"))
      val b = li.filter(col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_returnflag"))
      a.intersectAll(b)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // ---- Pivot: wide per-flag quantity sums per linestatus ---------------
    "q_pivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")))
        .select(col("l_linestatus"),
          col("A").cast("double").as("qty_a"),
          col("N").cast("double").as("qty_n"),
          col("R").cast("double").as("qty_r"))
        .orderBy("l_linestatus")
    }),

    // ---- Unpivot (melt): metrics long-form per lineitem ------------------
    "q_unpivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "val")
        .orderBy("l_orderkey", "l_linenumber", "metric")
    }),

    // ---- Skew-salted join as a declared query (result ≡ plain join) ------
    "q_salted_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
      graft.operators.Skew.saltedJoin(li, o, Seq("l_orderkey"), factor = 8)
        .select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- Sketch: join-cardinality estimate from two CMS inner products ---
    // "will this join explode" answered from two d×w frames without
    // touching either table; biased up only. Exact count shown to expose
    // the error, as in q_heavy_hitters.
    "q_join_size_est" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").cast("string").as("k"))
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 100000.0)
        .select(col("o_orderkey").cast("string").as("k"))
      val est = Sketches.cmsJoinSize(
        Sketches.cmsBuild(li, col("k"), w = 1024),
        Sketches.cmsBuild(big, col("k"), w = 1024))
      val exact = li.join(big, "k").agg(count(lit(1)).as("exact_join_size"))
      // 1-row x 1-row scalar combine — the one BNLJ in this plan is a
      // bounded single-row cross, not a data-sized product
      est.crossJoin(exact)
    }),

    // ---- Join semantics: NULL-safe equality (<=>) vs plain equality ------
    // NULL keys silently vanish from equi-joins; the null-safe operator
    // matches them — both behaviors pinned against the oracle's
    // IS NOT DISTINCT FROM on deterministically-nulled keys.
    "q_null_semantics" -> ((s, d) => {
      val l = Tables.orders(s, d)
        .select(col("o_orderkey"), expr("nullif(o_custkey % 10, 0)").as("k"))
      val r = Tables.customer(s, d)
        .select(expr("nullif(c_custkey % 10, 0)").as("k")).distinct()
      val eq = l.join(r, l("k") === r("k"))
        .agg(count(lit(1)).as("n"))
        .select(lit("equality").as("join_kind"), col("n"))
      val ns = l.join(r, l("k") <=> r("k"))
        .agg(count(lit(1)).as("n"))
        .select(lit("null_safe").as("join_kind"), col("n"))
      eq.unionByName(ns).orderBy("join_kind")
    }),

    // ---- Ops: two-table reconciliation diff ------------------------------
    // symmetric EXCEPT ALL counts between a table and its drifted replica
    // (every 100th order's quantity bumped, every 1000th order dropped) —
    // the row-level audit a cross-store migration runs after W5.
    "q_table_diff" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val drift = Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 1000 =!= 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_orderkey") % 100 === 0, col("l_quantity") + 1)
            .otherwise(col("l_quantity")).as("l_quantity"))
      graft.operators.Pipeline.reconcile(base, drift).orderBy("side")
    }),

    // ---- Profiling: equi-width histogram ---------------------------------
    // bucket = floor(price / width): one double division + floor, identical
    // IEEE semantics in both engines, so bucket boundaries can't drift.
    "q_histogram" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(floor(col("l_extendedprice") / 5000.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
        .orderBy("bucket")
    }),

    // ---- Profiling: per-column null/distinct/min-max summary -------------
    // One pruned scan per profiled column (columnar layout makes the five
    // narrow scans ≈ one full-width pass); numeric extrema travel through
    // DECIMAL(18,2) so the string rendering is engine-independent.
    "q_profile" -> ((s, d) => {
      val o = Tables.orders(s, d)
      def leg(name: String, v: org.apache.spark.sql.Column) =
        o.select(lit(name).as("col_name"), count(lit(1)).as("n_rows"),
          sum(when(v.isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(v).as("n_distinct"),
          min(v).cast("string").as("min_val"),
          max(v).cast("string").as("max_val"))
      Seq(
        leg("o_orderkey", col("o_orderkey")),
        leg("o_custkey", col("o_custkey")),
        leg("o_orderstatus", col("o_orderstatus")),
        leg("o_totalprice", col("o_totalprice").cast("decimal(18,2)")),
        leg("o_orderdate", col("o_orderdate")))
        .reduce(_.unionByName(_))
        .orderBy("col_name")
    }),

    // ---- Data contract validation: violation counts per declared rule ----
    // the pre-ingest gate: range bounds, enum membership, nullability,
    // key uniqueness — each rule one narrow aggregate, unioned into a
    // single report (0 violations on healthy fixtures; the rules are
    // chosen so some rows DO trip them and the counts are exercised).
    "q_quality_report" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      def rule(name: String, violations: org.apache.spark.sql.Column) =
        li.agg(sum(violations.cast("long")).as("n_violations"))
          .select(lit(name).as("rule"), col("n_violations"))
      val dupKeys = li.groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("__c"))
        .agg(sum(when(col("__c") > 1, col("__c")).otherwise(0L))
          .as("n_violations"))
        .select(lit("unique_order_line").as("rule"), col("n_violations"))
      Seq(
        rule("qty_in_1_to_40", !col("l_quantity").between(1, 40)),
        rule("price_positive", col("l_extendedprice") <= 0),
        rule("flag_in_enum", !col("l_returnflag").isin("A", "N", "R")),
        rule("ship_not_null", col("l_shipdate").isNull),
        dupKeys)
        .reduce(_.unionByName(_))
        .orderBy("rule")
    }),

    // ---- k-anonymity audit over quasi-identifier combinations ------------
    // The privacy gate a training-data release runs: every (mktsegment,
    // nation) equivalence class with fewer than k members must be
    // suppressed or generalized. One hash aggregation; the summary row
    // (total suppressed share in ppm) is a second bounded agg, unioned
    // in as key '__TOTAL__'. No window, no global sort.
    "q_k_anonymity" -> ((s, d) => {
      val cells = Tables.customer(s, d)
        .groupBy(col("c_mktsegment").as("segment"),
          col("c_nationkey").cast("long").as("nation"))
        .agg(count(lit(1)).as("n"))
        .withColumn("suppress", col("n") < 10)
      val total = cells.agg(
          sum(col("n")).as("__all"),
          sum(when(col("suppress"), col("n")).otherwise(0L)).as("__supp"))
        .select(lit("__TOTAL__").as("segment"), lit(-1L).as("nation"),
          col("__all").as("n"), lit(false).as("suppress"),
          expr("(__supp * 1000000L) DIV __all").as("suppressed_ppm"))
      cells.withColumn("suppressed_ppm", lit(null).cast("long"))
        .unionByName(total)
        .orderBy("segment", "nation")
    }),

    // ---- Incremental rollup maintenance: merged partials == recompute ----
    // per-day partial aggregate states (count/sum/min/max) merged with
    // the mergeable-state algebra — the pattern that lets a 100 TB
    // pipeline maintain rollups by day and re-aggregate only at read.
    "q_agg_merge" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .withColumn("cents",
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      val partials = li
        .groupBy(col("l_shipdate").as("day"), col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
          min(col("cents")).as("mn"), max(col("cents")).as("mx"))
      partials
        .groupBy(col("l_returnflag"))
        .agg(sum(col("n")).as("n_rows"), sum(col("s")).as("sum_cents"),
          min(col("mn")).as("min_cents"), max(col("mx")).as("max_cents"),
          count(lit(1)).as("n_partials"))
        .orderBy("l_returnflag")
    }),

    // ---- Exact grouped percentiles (median + quartiles) ------------------
    // Spark `percentile` and DuckDB `quantile_cont` share the linear-
    // interpolation definition (a + f·(b−a) at h = q·(n−1)), so the exact
    // aggregate hash-matches; approx_percentile stays out of the oracle set.
    "q_percentile" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5D)").as("median_qty"),
          // one aggregation buffer for both price percentiles
          expr("percentile(l_extendedprice, array(0.25D, 0.75D))").as("pq"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("median_qty"),
          element_at(col("pq"), 1).as("p25_price"),
          element_at(col("pq"), 2).as("p75_price"),
          col("n"))
        .orderBy("l_returnflag")
    }),

    // ---- Deterministic content-hash train/val/test split -----------------
    // (md5 bucket family — oracle-replicable; Sampling.hashBucket is the
    // xxhash64 fast path with identical semantics)
    "q_sample_split" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("split",
          Sampling.splitLabel(Sampling.md5Bucket(col("text"))))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("doc_id")).as("n_distinct"))
        .orderBy("split")
    }),

    // ---- Sampling: deterministic global training-shuffle order -----------
    // rank = position in the md5-keyed epoch shuffle, computed with zero
    // global sorts (bucket prefix-sum; see Sampling.orderedRank). The
    // oracle's row_number() OVER (ORDER BY ...) is the semantic spec the
    // distributed plan must reproduce exactly.
    "q_global_rank" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("k", Sampling.md5OrderKey(col("text")))
      Sampling.orderedRank(docs, lit(0), col("k"), col("doc_id"),
          keyRange = Sampling.Md5KeyRange, out = "shuffle_rank")
        .select(col("doc_id"), col("shuffle_rank"))
        .orderBy("doc_id")
    }),

    // ---- Sampling: per-source document cap (domain balancing) ------------
    // Common Crawl-style curation: no source contributes more than `cap`
    // docs, and WHICH docs survive is the md5-order prefix — deterministic,
    // partition-independent, and stable as the corpus grows (a kept doc
    // stays kept unless hash-earlier docs arrive in its source).
    "q_source_cap" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("k", Sampling.md5OrderKey(col("text")))
      Sampling.orderedRank(docs, col("source"), col("k"), col("doc_id"),
          keyRange = Sampling.Md5KeyRange, out = "cap_rank")
        .filter(col("cap_rank") <= 100)
        .select(col("doc_id"), col("source"), col("cap_rank"))
        .orderBy("doc_id")
    }),

    // ---- Token counting: whitespace + BPE-ish regex segmentation ---------
    "text_tokens_bpe" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).as("n_bpe_tokens"))
        .orderBy("doc_id")
    }),

    // ---- BPE tokenizer TRAINING: learn 12 merges from the corpus --------
    // the only corpus-sized shuffle is the word-frequency aggregate; the
    // 12 merge rounds run on the dictionary's symbol frame.
    "text_bpe_train" -> ((s, d) => {
      val (merges, _) = Bpe.train(Tables.documents(s, d), col("text"),
        nMerges = 12)
      merges.orderBy("merge_rank")
    }),

    // ---- BPE subword vocabulary after the 12 learned merges -------------
    "text_bpe_vocab" -> ((s, d) => {
      val (_, finalSyms) = Bpe.train(Tables.documents(s, d), col("text"),
        nMerges = 12)
      finalSyms.groupBy(col("sym"))
        .agg(sum(col("f")).as("freq"), countDistinct(col("w")).as("n_words"))
        .orderBy("sym")
    }),

    // ---- Diversified selection: MMR over the dense top-50 ---------------
    // rel = cosine vs the vec_id=0 embedding; 8 greedy picks at λ = 0.75
    // (dyadic, so both engines compute bit-identical scores).
    "q_mmr_select" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val rel = Similarity
        .bruteForceTopK(emb, emb.filter(col("vec_id") === 0),
          "vec_id", "embedding", k = 50)
        .select(col("neighbor_id").as("id"), col("score").as("rel"))
      val cands = rel.join(
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
        Seq("id"))
      graft.operators.Retrieval.mmrSelect(cands, k = 8, lambda = 0.75)
        .select(col("id").as("doc_id"), col("sel_rank"), col("rel"))
        .orderBy("sel_rank")
    }),

    // ---- BPE applied back: per-doc subword token counts -----------------
    "text_bpe_apply" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val (_, finalSyms) = Bpe.train(docs, col("text"), nMerges = 12)
      val wordLen = finalSyms.groupBy(col("w"))
        .agg(count(lit(1)).as("n_syms"))
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .join(broadcast(wordLen), Seq("w"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n_syms")).as("n_bpe_tokens"),
          count(lit(1)).as("n_words"))
        .orderBy("doc_id")
    }),

    // ---- RAG ingestion pipeline: quality → mixture → chunk → pack -------
    // the four curation stages as ONE declarative plan: token/TTR gate,
    // output-proportion mixture sampling, overlapped chunking, greedy
    // 64-token sequence packing per source — per-pack stats out.
    "pipeline_rag" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = TextFunctions.tokens(col("text"))
      val kept = docs
        .withColumn("n_toks", size(toks))
        .withColumn("ttr",
          size(array_distinct(toks)).cast("double") / size(toks))
        .filter(col("n_toks").between(20, 1000) && col("ttr") >= 0.3)
      val sampled = Sampling.mixtureSample(kept, col("doc_id"),
        col("source"), Map("src0" -> 200000L, "src1" -> 200000L),
        defaultPpm = 33333L, outRows = 200L)
      val chunks = TextAnalysis
        .tokenChunks(sampled, "text", "doc_id", window = 16, stride = 12)
        .join(sampled.select(col("doc_id").as("id"), col("source")),
          Seq("id"))
      Sampling.packSequences(chunks, col("source"),
          col("id") * 1000 + col("chunk_idx"), col("n_chunk_tokens"),
          budget = 64L)
        .groupBy(col("source"), col("pack_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_chunk_tokens")).as("n_tokens"))
        .orderBy("source", "pack_id")
    }),

    // ---- Contrastive mining: hard negatives per anchor ------------------
    // most-similar neighbors BELOW the duplicate threshold (0.3): close
    // enough to be informative for contrastive training, far enough to
    // not be a positive. Top-5 per anchor from the exact top-50.
    "q_hard_negatives" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val topk = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") < 20), "vec_id", "embedding", k = 50)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("rank"))
      topk.filter(col("score") < 0.3)
        .withColumn("hn_rank", row_number().over(w))
        .filter(col("hn_rank") <= 5)
        .select(col("query_id"), col("neighbor_id").as("hard_neg_id"),
          col("hn_rank"), col("score"))
        .orderBy("query_id", "hn_rank")
    }),

    // ---- Fluency: log-free bigram LM score per document -----------------
    "text_lm_score" -> ((s, d) => {
      TextAnalysis.lmBigramScore(Tables.documents(s, d), "text", "doc_id")
        .select(col("id").as("doc_id"), col("n_bigrams"),
          col("lm_ppm_sum"), col("lm_ppm_mean"))
        .orderBy("doc_id")
    }),

    // ---- Fluency: interpolated Kneser–Ney trigram LM, integer discount --
    "text_lm_trigram" -> ((s, d) => {
      TextAnalysis.lmTrigramScore(Tables.documents(s, d), "text", "doc_id")
        .select(col("id").as("doc_id"), col("n_trigrams"),
          col("kn_ppm_sum"), col("kn_ppm_mean"))
        .orderBy("doc_id")
    }),

    // ---- Keywords: top-3 tf·idf terms per document ----------------------
    "text_keywords" -> ((s, d) => {
      TextAnalysis.topKeywords(Tables.documents(s, d), "text", "doc_id",
          k = 3)
        .select(col("id").as("doc_id"), col("rank"), col("term"),
          col("tf"), col("score"))
        .orderBy("doc_id", "rank")
    }),

    // ---- Drift: corpus-level total-variation distance train vs val ------
    "q_tv_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d).withColumn("split",
        Sampling.splitLabel(Sampling.md5Bucket(col("text"))))
      TextAnalysis.tvDistance(docs, "text", "split", "train", "val")
    }),

    // ---- Drift: Kolmogorov–Smirnov over document lengths train vs val ---
    // Exact integer numerator max|cum_a·N_b − cum_b·N_a|; the CDF sweep is
    // bucket-decomposed (no global-order window) — see Stats.ksDrift.
    "q_ks_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d).withColumn("split",
        Sampling.splitLabel(Sampling.md5Bucket(col("text"))))
      graft.operators.Stats.ksDrift(docs, col("n_chars"), col("split"),
        "train", "val", bucketShift = 8)
    }),

    // ---- RAG chunking: 16-token windows, stride 12 (overlap 4) ----------
    "text_chunk" -> ((s, d) => {
      TextAnalysis.tokenChunks(Tables.documents(s, d), "text", "doc_id",
          window = 16, stride = 12)
        .select(col("id").as("doc_id"), col("chunk_idx"),
          col("n_chunk_tokens"), col("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // ---- Multimodal: frame sampling (every 10th frame per video) ---------
    "mm_frames" -> ((s, d) => {
      Multimodal.frameSample(
          Multimodal.synthesize(s, Tables.documents(s, d)), everyN = 10)
        .toDF()
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy("media_id")
    }),

    // ---- Text analysis: quality metrics ----------------------------------
    "text_quality" -> ((s, d) => {
      TextAnalysis.qualityMetrics(Tables.documents(s, d), "text")
        .select("doc_id", "n_tokens", "n_distinct_tokens",
          "type_token_ratio", "avg_token_len", "stopword_ratio")
        .orderBy("doc_id")
    }),

    // ---- Text analysis: language-ID confusion matrix ---------------------
    "text_langid" -> ((s, d) => {
      TextAnalysis.languageId(Tables.documents(s, d), "text")
        .groupBy(col("lang"), col("predicted_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted_lang")
    }),

    // ---- Text analysis: rolling-hash fingerprint -------------------------
    "text_fingerprint" -> ((s, d) => {
      TextAnalysis.fingerprints(Tables.documents(s, d), "text", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- Text analysis: Gopher-style repetition/quality filter -----------
    "text_gopher" -> ((s, d) => {
      TextAnalysis.gopherQuality(Tables.documents(s, d), "text")
        .select("doc_id", "n_words", "mean_word_len",
          "dup_2gram_frac", "dup_3gram_frac", "keep_flag")
        .orderBy("doc_id")
    }),

    // ---- Text analysis: corpus-level frequent-n-gram heavy hitters -------
    "text_top_ngrams" -> ((s, d) => {
      TextAnalysis.topNgrams(Tables.documents(s, d), "text", n = 2, k = 20)
    }),

    // ---- Sampling: deterministic stratified domain mixing ----------------
    "q_stratified_sample" -> ((s, d) => {
      Sampling.stratifiedSample(Tables.documents(s, d),
          contentCol = col("doc_id"), strataCol = col("source"),
          ratesPct = Map("src0" -> 75, "src1" -> 50, "src2" -> 25),
          defaultPct = 10)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"))
        .orderBy("source")
    }),

    // ---- Sampling: mixture targets over the OUTPUT corpus ----------------
    // "20% src0, 20% src1, rest evenly" at ~100 output rows: per-source
    // keep thresholds derived from counts, then a map-only hash filter.
    "q_mixture_sample" -> ((s, d) => {
      Sampling.mixtureSample(Tables.documents(s, d),
          contentCol = col("doc_id"), srcCol = col("source"),
          targetPpm = Map("src0" -> 200000L, "src1" -> 200000L),
          defaultPpm = 33333L, outRows = 100L)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),

    // ---- Sampling: deterministic quality-weighted (importance) sampling --
    // keepProb = (min(n_tokens, 128)/128)² — every factor is a dyadic
    // rational, so the probability and its 10^6-scaled floor are exact in
    // both engines; squaring is the T=2 temperature sharpening, done with
    // a multiply instead of libm pow (engine-private rounding).
    "q_importance_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_tokens", size(split(col("text"), " ")))
      val q = least(col("n_tokens"), lit(128)).cast("double") / lit(128.0)
      val kept = Sampling.importanceSample(docs, col("text"), q * q)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("tok_kept"))
      docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .join(kept, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("tok_kept"), lit(0L)).as("tok_kept"))
        .orderBy("source")
    }),

    // ---- Dedup: EXACT Jaccard pairs via prefix filtering (AllPairs) ------
    // threshold 1/2 as a rational so prefix lengths and the verification
    // predicate are pure integer arithmetic; the spec proves the prefix
    // candidates lose nothing vs brute force.
    "dedup_ppjoin" -> ((s, d) => {
      Dedup.prefixJaccardPairs(Tables.documents(s, d), "doc_id",
          TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3),
          p = 1, q = 2)
        .orderBy("id_1", "id_2")
    }),

    // ---- Dedup tuning: Jaccard threshold-sweep report --------------------
    // Exact pairs (prefix filtering, no recall caveat) from J >= 0.1,
    // banded by floor(10·J); the cumulative column answers "how many
    // pairs merge at each threshold" before committing to one. On THIS
    // corpus the sweep lands everything in band 9 — the honest finding
    // that the fixture is bimodal (near-identical pairs vs ~disjoint
    // docs) and any threshold in [0.1, 0.9] dedups identically; the
    // spec shows the multi-band behavior on graded-overlap documents.
    // Trigram shingles keep posting lists rare-term-dominated (bigrams
    // at this low threshold blow the candidate join up 40x).
    "dedup_sweep" -> ((s, d) => {
      Dedup.jaccardThresholdSweep(Tables.documents(s, d), "doc_id",
          TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3),
          p = 1, q = 10, bands = 10)
        .orderBy("band")
    }),

    // ---- Entity resolution: blocked edit-distance join -------------------
    // Part names blocked on their first two words; exact Levenshtein
    // verifies within blocks only. Both engines implement unit-cost
    // Levenshtein, so distances hash-match.
    // Entity resolution over near-identical identifiers: customer names
    // differ only in the trailing digits, so block on everything but the
    // last two characters (prefix blocking — true typo pairs share it)
    // and verify with a thresholded edit distance of 1. The part-name
    // column is useless here: its "name" IS its two-word vocabulary key,
    // so name-blocked pairs are all identical strings.
    "q_fuzzy_join" -> ((s, d) => {
      Dedup.editDistancePairs(Tables.customer(s, d), "c_custkey",
          col("c_name"), substring(col("c_name"), 1, 16), maxDist = 1)
        .orderBy("id_1", "id_2")
    }),

    // ---- Entity resolution PIPELINE: fuzzy match → cluster → size -------
    // the q_fuzzy_join pairs closed into connected components (the same
    // min-label propagation as dedup_canonical), with cluster sizes
    // joined back — the full "which records are the same entity" DAG as
    // one plan.
    "pipeline_er" -> ((s, d) => {
      val pairs = Dedup.editDistancePairs(Tables.customer(s, d), "c_custkey",
          col("c_name"), substring(col("c_name"), 1, 16), maxDist = 1)
        .select(col("id_1"), col("id_2"))
      val asg = Dedup.canonicalAssignments(pairs)
      asg.groupBy(col("canonical_id"))
        .agg(count(lit(1)).as("cluster_size"))
        .join(asg, Seq("canonical_id"))
        .select(col("id"), col("canonical_id"), col("cluster_size"))
        .orderBy("id")
    }),

    // ---- Profiling: equi-depth histogram without a global sort -----------
    // Bucket edges from orderedRank (range-bucketed rank, HOF-folded
    // offsets) — the scale-sane route to global order statistics; bucket
    // sizes differ by at most one by construction.
    "q_equidepth" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("l_orderkey * 10 + l_linenumber").as("uid"))
      val ranked = Sampling.orderedRank(li, lit("all"), col("cents"),
        col("uid"), nBuckets = 1024, out = "rk")
      val n = ranked.agg(count(lit(1)).as("n_total"))
      ranked.crossJoin(broadcast(n))
        .withColumn("bucket", expr("((rk - 1) * 16) DIV n_total"))
        .groupBy("bucket")
        .agg(min("cents").as("lo"), max("cents").as("hi"),
          count(lit(1)).as("n_rows"))
        .orderBy("bucket")
    }),

    // ---- Quantiles: canonical q-digest (mergeable, provable rank error) --
    // ε = 1% of n; every returned interval pins the target rank within
    // ε·n by construction (leaf intervals are exact); the underlying
    // node-count sketch shard-merges bit-identically (QuantileSketchSpec)
    "q_qdigest_quantiles" -> ((s, d) => {
      Stats.qdigestQuantiles(
        Tables.lineitem(s, d).select(
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents")),
        col("cents"), maxBits = 25, epsPpm = 10000L,
        probesPpm = Seq(10000L, 250000L, 500000L, 750000L, 990000L))
    }),

    // ---- Profiling: exact per-group quantiles without a global sort ------
    // Ranks from orderedRank (range-bucketed, HOF-folded offsets) with
    // the GROUP as the stratum; the quantile row is the rank hitting
    // ceil(q·n_g) — p50/p90/p99 per return flag in one pass, no
    // single-partition window anywhere.
    "q_group_quantiles" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_returnflag").as("g"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("l_orderkey * 10 + l_linenumber").as("uid"))
      val ranked = Sampling.orderedRank(li, col("g"), col("cents"),
        col("uid"), nBuckets = 1024, out = "rk")
      val counts = ranked.groupBy("g").agg(count(lit(1)).as("n_g"))
      ranked.join(broadcast(counts), Seq("g"))
        .select(col("g"), col("cents"), col("rk"), col("n_g"),
          explode(array(
            struct(lit("p50").as("p"), lit(1L).as("num"), lit(2L).as("den")),
            struct(lit("p90").as("p"), lit(9L).as("num"), lit(10L).as("den")),
            struct(lit("p99").as("p"), lit(99L).as("num"), lit(100L).as("den"))))
            .as("q"))
        .filter(col("rk") === expr("(n_g * q.num + q.den - 1) DIV q.den"))
        .select(col("g"), col("q.p").as("p"), col("rk").as("target_rank"),
          col("n_g"), col("cents").as("value_cents"))
        .orderBy("g", "p")
    }),

    // ---- Corpus hygiene: URL canonicalization for crawl dedup ------------
    // Five deliberately-messy deterministic URL shapes (case, default
    // ports, tracking params, param order, fragments, trailing slash)
    // collapse to their canonical identity; variants 0 and 1 MUST merge.
    // Pure built-in expressions — one narrow projection + one hash agg.
    "text_url_canon" -> ((s, d) => {
      import graft.functions.TextFunctions
      val url = expr(
        """CASE CAST(c_custkey % 5 AS INT)
          |  WHEN 0 THEN concat('HTTP://Shop.Example.COM:80/cat/',
          |    c_mktsegment, '/?utm_source=ad&id=',
          |    CAST(c_custkey % 40 AS STRING), '&b=2&a=1')
          |  WHEN 1 THEN concat('http://shop.example.com/cat/',
          |    c_mktsegment, '?a=1&b=2&id=', CAST(c_custkey % 40 AS STRING))
          |  WHEN 2 THEN concat('https://Shop.Example.com:443/cat/',
          |    c_mktsegment, '/#frag')
          |  WHEN 3 THEN concat('https://shop.example.com:8443/cat/',
          |    c_mktsegment)
          |  ELSE concat('http://shop.example.com/cat/', c_mktsegment,
          |    '/?fbclid=xyz')
          |END""".stripMargin)
      Tables.customer(s, d)
        .select(TextFunctions.canonicalizeUrl(url).as("canonical_url"))
        .groupBy("canonical_url").agg(count(lit(1)).as("n"))
        .orderBy("canonical_url")
    }),

    // ---- Profiling: mergeable grid quantile sketch -----------------------
    // Equi-width bucket counts (here $10k-wide over order totals) as the
    // bounded-state approximate-percentile summary: shard sketches SUM to
    // the corpus sketch (SketchSpec proves the algebra), the rank cursor
    // is the bounded exclusive fold, and the p50/p95/p99 answers are the
    // bucket ranges holding ceil(q·n) — error ≤ one bucket width at any
    // data volume. The complement of q_equidepth: fixed VALUE grid vs
    // fixed COUNT buckets.
    "q_grid_quantiles" -> ((s, d) => {
      val cents = Tables.orders(s, d)
        .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      Sketches.gridQuantiles(cents, col("cents"), bucketWidth = 1000000L,
          quantiles = Seq(("p50", 1, 2), ("p95", 19, 20), ("p99", 99, 100)))
        .orderBy("target_rank")
    }),

    // ---- Data quality: integer-exact z-score outliers --------------------
    // |x − mean| > 2σ rearranged to (n·x − S)² > 4(n·Q − S²) over cent-
    // scaled integers: no division, no sqrt, no float accumulation — the
    // outlier set hash-matches DuckDB exactly (HUGEINT on its side,
    // DECIMAL(38,0) on Spark's).
    "q_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("v100", round(col("value") * 100).cast("long"))
      graft.operators.Stats.zScoreOutliers(ev, col("event_type"),
          col("v100"), k = 2)
        .select(col("g").as("event_type"), col("n"), col("n_outliers"),
          col("min_outlier"), col("max_outlier"))
        .orderBy("event_type")
    }),

    // ---- Data quality: robust median/MAD outliers ------------------------
    // den·|x − med| > num·MAD with the LOWER median (a real element, no
    // averaging), both medians via orderedRank — integer end to end, no
    // global sort. Summary row keeps the oracle compact; the operator
    // emits per-row outliers. Fence at 1.5·MAD: prices are near-uniform
    // (max dev ≈ 2·MAD), so the default 3·MAD fence would flag nothing.
    "q_mad_outliers" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("l_orderkey * 10 + l_linenumber").as("uid"))
      graft.operators.Stats.madOutliers(li, col("cents"), col("uid"),
          num = 3L, den = 2L)
        .groupBy(col("med"), col("mad"))
        .agg(count(lit(1)).as("n_outliers"),
          min(col("x")).as("min_outlier"), max(col("x")).as("max_outlier"))
    }),

    // ---- Profiling: per-group median without a global sort ---------------
    // median order value per priority class — the stratified twin of
    // q_mad_outliers' global median.
    "q_grouped_median" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderpriority").as("prio"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
        col("o_orderkey").as("uid"))
      graft.operators.Stats.groupedLowerMedian(o, col("prio"), col("cents"),
          col("uid"))
        .orderBy("g")
    }),

    // ---- Profiling: categorical diversity (Gini impurity, exact ppm) -----
    "q_gini" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      graft.operators.Stats.categoricalDiversity(li, Seq(
          "l_returnflag" -> col("l_returnflag"),
          "l_linestatus" -> col("l_linestatus"),
          "l_quantity" -> col("l_quantity").cast("long")))
        .orderBy("col_name")
    }),

    // ---- Association mining: basket co-occurrence pairs ------------------
    // Which parts ship together in one order: pair counts via a basket
    // equi-join (oversized baskets dropped whole — the cross-product
    // guard), supports and directed confidences in exact ppm.
    "q_cooccur" -> ((s, d) => {
      graft.operators.Associations.coOccurrencePairs(Tables.lineitem(s, d),
          col("l_orderkey"), col("l_partkey"))
        .orderBy(col("pair_cnt").desc, col("i1"), col("i2"))
        .limit(20)
    }),

    // ---- Association mining: frequent token triples (Apriori L3) ---------
    // topic signatures: which word triples co-occur across documents.
    "q_triples" -> ((s, d) => {
      val toks = Tables.documents(s, d).select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      graft.operators.Associations.frequentTriples(toks, col("doc_id"),
          col("tok"), minSupport = 50L)
        .orderBy(col("triple_cnt").desc, col("i1"), col("i2"), col("i3"))
        .limit(30)
    }),

    // ---- Collocations: PMI-ranked bigrams, log-free ----------------------
    // rank by c_xy·N·10⁶ DIV (c_x·c_y) — monotone in PMI, integer-exact
    // in both engines (log's last ulp is not).
    "text_pmi" -> ((s, d) => {
      TextAnalysis.pmiBigrams(Tables.documents(s, d), "text",
        minCount = 5L, k = 30)
    }),

    // ---- Warehouse: SCD Type-2 intervals from a change log ---------------
    // price-tier versions per user: no-op updates (same tier as previous
    // purchase) create no version; validity runs to the next CHANGE. All
    // integer columns (ns timestamps, DIV-bucketed tiers) — hash-exact.
    "q_scd2" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .withColumn("tier",
          expr("CAST(round(value * 100) AS BIGINT) DIV 5000"))
      graft.operators.Pipeline
        .scd2Intervals(ev, col("user_id"), col("ts_ns"), col("tier"))
        // interval bounds leave as MICROS: Spark holds raw parquet nanos
        // while DuckDB's TIMESTAMP is micro-truncated — ordering is still
        // ns-exact on the Spark side, and (user, micro) is unique here
        .select(col("key").as("user_id"),
          expr("valid_from DIV 1000").as("valid_from_us"),
          expr("valid_to DIV 1000").as("valid_to_us"),
          col("value").as("tier"), col("is_current"))
        .orderBy("user_id", "valid_from_us")
    }),

    // ---- Intervals: peak concurrent sessions per hour --------------------
    // 30-min-gap sessions per user (ns-exact ordering, event_id
    // tie-break), closed up to max_ts+1 so single-event sessions still
    // register; hourly sweep via Intervals.concurrencyByBucket — no
    // global-order window anywhere in the plan.
    "q_concurrency" -> ((s, d) => {
      val gapNs = 1800000000000L // 30 min
      val ev = Tables.events(s, d).select(col("user_id"),
        col("event_id"), col("ts_ns"))
      val ow = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
      val sessions = ev
        .withColumn("new_s",
          when(col("ts_ns") - lag(col("ts_ns"), 1).over(ow) > gapNs ||
            lag(col("ts_ns"), 1).over(ow).isNull, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(
          ow.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts_ns")).as("s"), (max(col("ts_ns")) + 1).as("e"))
      graft.operators.Intervals
        .concurrencyByBucket(sessions, col("s"), col("e"),
          bucketWidth = 3600000000000L)
        .orderBy("bucket")
    }),

    // ---- Skyline: price/quantity Pareto frontier -------------------------
    // Cheapest lineitem at each undominated quantity level: minimize
    // price cents, maximize quantity (negated into the minimize frame —
    // y may go negative, only x is bucketed). ~170 non-empty 64Ki-cent
    // buckets at sf0.1.
    "q_skyline" -> ((s, d) => {
      graft.operators.Skyline.paretoFrontier2D(Tables.lineitem(s, d),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)"),
          expr("0 - CAST(round(l_quantity) AS BIGINT)"),
          bucketWidth = 65536L)
        .select(col("x").as("price_cents"), (-col("y")).as("quantity"),
          col("n_rows"))
        .orderBy("price_cents")
    }),

    // ---- Time series: per-user EWMA of purchase values -------------------
    // alpha = 0.25 (dyadic); the fold order is pinned by event_id, so the
    // double recurrence replays bit-exactly in DuckDB's list_reduce.
    "q_ewma" -> ((s, d) => {
      graft.operators.Resample.ewma(
          Tables.events(s, d).filter(col("event_type") === "purchase"),
          col("user_id"), col("event_id"), col("value"), alpha = 0.25)
        .withColumnRenamed("key", "user_id")
        .orderBy("user_id")
    }),

    // ---- Text analysis: winnowed fingerprints (Schleimer et al. 2003) ----
    "text_winnow" -> ((s, d) => {
      TextAnalysis.winnowedFingerprints(Tables.documents(s, d), "text", "doc_id")
        .select(col("id").as("doc_id"),
          size(col("fps")).as("n_fp"),
          element_at(col("fps"), 1).as("fp_min"),
          element_at(col("fps"), -1).as("fp_max"))
        .orderBy("doc_id")
    }),

    // ---- Dedup: winnowed-fingerprint overlap pairs -----------------------
    // df-cut 200: fingerprints in >200 docs are boilerplate (no near-dup
    // signal, quadratic join cost); the oracle applies the identical cut.
    "dedup_winnow" -> ((s, d) => {
      TextAnalysis.winnowNearDups(Tables.documents(s, d), "text", "doc_id",
          minShared = 50L, maxDocFreq = 200L)
        .orderBy("id_1", "id_2")
    }),

    // ---- Text analysis: content-defined chunking (LBFS/Rabin CDC) --------
    "text_cdc" -> ((s, d) => {
      TextAnalysis.cdcChunkIndex(Tables.documents(s, d), "text", "doc_id")
        .select(col("id").as("doc_id"),
          size(col("chunks")).as("n_chunks"),
          element_at(col("chunks"), 1).getField("len").as("len_1"),
          element_at(col("chunks"), 1).getField("hash").as("hash_1"),
          element_at(col("chunks"), -1).getField("hash").as("hash_n"))
        .orderBy("doc_id")
    }),

    // ---- Dedup: shared content-defined chunks ----------------------------
    // minShared=3 ≈ one shared ~100-char contiguous run (E[chunk] = 32
    // chars at maskBits=5); finds the same 21 near-dup pairs as the
    // winnow overlap at sf0.01 with a sketch 12× smaller (9.9 chunks vs
    // ~120 fingerprints per doc). df-cut 200 as in dedup_winnow.
    "dedup_cdc" -> ((s, d) => {
      TextAnalysis.cdcNearDups(Tables.documents(s, d), "text", "doc_id",
          minShared = 3L, maxDocFreq = 200L)
        .orderBy("id_1", "id_2")
    }),

    // ---- Dedup: benchmark decontamination (word-5-gram overlap) ----------
    // benchmark = every 10th doc (stand-in for an eval suite); n=5 because
    // the fixture vocabulary is tiny — 3-grams collide by chance (426/450
    // docs hit), 5-grams isolate true leakage (the near-dup docs straddling
    // the split, 30+ shared grams each vs 0 for everything else).
    "dedup_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def sh = ShingleFunctions.wordShingleHashes(
        TextFunctions.tokens(col("text")), 5)
      Dedup.decontaminate(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", sh,
          docs.filter(col("doc_id") % 10 === 0), sh)
        .select(col("id").as("doc_id"), col("n_shared_grams"), col("contaminated"))
        .orderBy("doc_id")
    }),

    // ---- Dedup: per-benchmark-doc leakage report -------------------------
    "dedup_decontaminate_report" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def sh = ShingleFunctions.wordShingleHashes(
        TextFunctions.tokens(col("text")), 5)
      Dedup.decontaminateReport(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", sh,
          docs.filter(col("doc_id") % 10 === 0), "doc_id", sh)
        .orderBy("bench_id")
    }),

    // ---- Dedup: exact-substring duplication profile (Lee et al. 2022) ----
    // k=8 token windows: the fixture vocabulary is tiny, so shorter
    // windows flag half the corpus by chance; 8-grams mark the genuinely
    // repeated spans (near-dup doc pairs + templated runs). Per-doc
    // coverage of duplicated windows, merged gaps-and-islands.
    "dedup_substring" -> ((s, d) => {
      Dedup.substringDupProfile(Tables.documents(s, d), "doc_id",
          col("text"), k = 8)
        .orderBy("id")
    }),

    // ---- Text analysis: inverted index over word bigrams -----------------
    // bigram terms because the fixture WORD vocab is 31 tokens (nearly all
    // in 80% of docs — every posting list would be capped); bigrams give
    // 916 terms, max df 46. Cap 40 exercises both branches: hot terms keep
    // df but NULL postings.
    // Postings are emitted as a comma-joined string, not an array: the
    // driver's compare loads results into pandas, and an array column is
    // unhashable there (r04 lesson) — the string carries the identical
    // information and hash-checks the order too.
    "text_inverted_index" -> ((s, d) => {
      TextAnalysis.invertedIndex(Tables.documents(s, d),
          TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 2),
          "doc_id", maxPostingDf = 40L)
        .select(col("token"), col("df"),
          array_join(col("postings"), ",").as("postings"))
        .orderBy("token")
    }),

    // ---- Text analysis: Unicode NFC canonicalization ---------------------
    // The fixture text is ASCII (where NFC is the identity), so the query
    // first DEnormalizes it — every 'a' becomes 'a' + U+0301 combining
    // acute — and the oracle only hash-matches if composition rebuilds the
    // precomposed 'á' exactly as utf8proc does: a real NFC check, not an
    // identity pass.
    "text_normalize" -> ((s, d) => {
      val denorm = regexp_replace(col("text"), "a", "a\u0301")
      val nfc = graft.functions.NormalizeFunctions.nfcNormalize(denorm)
      Tables.documents(s, d).select(
          col("doc_id"),
          length(denorm).as("len_denorm"),
          length(nfc).as("len_nfc"),
          conv(substring(md5(nfc), 1, 15), 16, 10).cast("long").as("nfc_hash"))
        .orderBy("doc_id")
    }),

    // ---- Text analysis: train/val token-distribution drift ---------------
    // Slices come from the same deterministic md5-bucket split as
    // q_sample_split, so the report is a pure function of the corpus. The
    // chi2 term is fixed-order double arithmetic from integer counts —
    // bit-reproducible in DuckDB when the oracle writes the identical
    // expression tree (the text_bm25 determinism rule).
    "q_token_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d).withColumn("split",
        Sampling.splitLabel(Sampling.md5Bucket(col("text"))))
      TextAnalysis.tokenDriftReport(docs, "text", "split", "train", "val")
        .orderBy("token")
    }),

    // ---- Sketch: Count-Min heavy hitters over bigram occurrences ---------
    // w=256 << 916 distinct bigrams, so collisions are real and the min
    // over d=4 rows is doing actual work; est >= exact for every key is
    // the CMS guarantee the spec asserts, and the oracle replays the full
    // Carter-Wegman bucket math so estimates hash-match exactly. The exact
    // count column exists to EXPOSE the sketch error — a production
    // pipeline queries only the sketch.
    "q_heavy_hitters" -> ((s, d) => {
      val occ = Tables.documents(s, d).select(
        explode(TextFunctions.wordNgrams(TextFunctions.tokens(col("text")), 2))
          .as("token"))
      val cms = Sketches.cmsBuild(occ, col("token"))
      val est = Sketches.cmsEstimate(cms, occ.distinct(), col("token"))
      val exact = occ.groupBy("token").agg(count(lit(1)).as("exact_count"))
      est.join(exact, col("key") === col("token"))
        .select(col("token"), col("est_count"), col("exact_count"))
        .orderBy(col("est_count").desc, col("token").asc)
        .limit(20)
    }),

    // ---- Text analysis: per-doc term rarity vs corpus document frequency -
    // bigram terms for the same vocabulary reason as text_inverted_index
    // (31 unigrams would make every df huge; 916 bigrams spread 1..46).
    "text_rarity" -> ((s, d) => {
      TextAnalysis.tokenRarity(Tables.documents(s, d),
          TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 2),
          "doc_id", rareDf = 2L)
        .select(col("id").as("doc_id"), col("n_terms"), col("min_term_df"),
          col("max_term_df"), col("n_rare_terms"))
        .orderBy("doc_id")
    }),

    // ---- Text analysis: exact sparse TF-cosine similarity join -----------
    // bigram tf vectors; pairs meet only via shared terms (df-cut 200).
    // Integer dots + IEEE sqrt make the cosine bit-reproducible in DuckDB.
    "text_sim_pairs" -> ((s, d) => {
      TextAnalysis.tfCosinePairs(Tables.documents(s, d),
          TextFunctions.wordNgrams(TextFunctions.tokens(col("text")), 2),
          "doc_id", threshold = 0.5, maxDocFreq = 200L)
        .orderBy("id_1", "id_2")
    }),

    // ---- Corpus filters: C4-style line rules -----------------------------
    // Fixture texts are single-line, so the query first rebuilds a
    // deterministic multi-line document (3-token lines, '.' appended when
    // the raw line length isn't divisible by 3, a lorem/brace noise line on
    // every 17th doc); the oracle performs the identical construction.
    "text_c4" -> ((s, d) => {
      CorpusFilters.c4LineStats(
          Tables.documents(s, d).withColumn("text2", linedText), "text2", "doc_id")
        .select(col("id").as("doc_id"), col("n_lines"), col("n_kept_lines"),
          col("kept_chars"), col("keep_doc"))
        .orderBy("doc_id")
    }),

    // ---- Corpus filters: cross-document boilerplate line removal ---------
    // maxDocFreq=3 is fixture-scaled (line df maxes at 5 at sf0.01); real
    // corpora use hundreds — the shape, not the constant, is the operator.
    "text_boilerplate" -> ((s, d) => {
      CorpusFilters.boilerplateLines(
          Tables.documents(s, d).withColumn("text2", linedText), "text2", "doc_id",
          maxDocFreq = 3L)
        .select(col("id").as("doc_id"), col("n_lines"), col("n_boilerplate"),
          col("kept_chars"))
        .orderBy("doc_id")
    }),

    // ---- Text analysis: PII redaction (emails + phones) ------------------
    // Fixture texts carry no PII, so the query injects deterministic
    // doc_id-derived addresses/numbers first (oracle does the same); the
    // redacted text itself is part of the hash-compared output.
    "text_pii" -> ((s, d) => {
      TextAnalysis.piiRedact(
          Tables.documents(s, d).withColumn("text2", piiInjected), "text2")
        .select(col("doc_id"), col("n_emails"), col("n_phones"), col("redacted"))
        .orderBy("doc_id")
    }),

    // ---- Sampling: greedy contiguous sequence packing --------------------
    "q_pack" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_tokens", size(split(col("text"), " ")))
      Sampling.packSequences(docs, col("source"), col("doc_id"),
          col("n_tokens"), budget = 1024L)
        .groupBy(col("source"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
        .orderBy("source", "pack_id")
    }),

    // ---- Curation: pack assembly (pack -> training sequence) -------------
    // The assembled text is compared via md5-60 + length, so the oracle
    // only passes when concatenation content AND order match exactly.
    "q_pack_assemble" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_tokens", size(split(col("text"), " ")))
      val packed = Sampling.packSequences(docs, col("source"), col("doc_id"),
        col("n_tokens"), budget = 1024L)
      Sampling.assemblePacks(packed, col("source"), col("doc_id"), col("text"))
        .select(col("stratum"), col("pack_id"), col("n_docs"),
          length(col("seq_text")).as("n_chars"),
          conv(substring(md5(col("seq_text")), 1, 15), 16, 10)
            .cast("long").as("seq_hash"))
        .orderBy("stratum", "pack_id")
    }),

    // ---- Layout: Morton (Z-order) clustering key -------------------------
    // The key itself is the declared/oracle-checked part; ScaleSpec
    // demonstrates the layout property (tight per-file min/max in both
    // dimensions after repartitionByRange on the key).
    "q_zorder" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.functions.LayoutFunctions
            .zorderKey(col("l_partkey"), col("l_suppkey"), bits = 16).as("zkey"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- Storage layout: Hilbert curve index (better locality than Z) ----
    // Same two dimensions as q_zorder; the oracle replays the classic
    // iterative xy2d loop as a 16-level recursive CTE (each row walks its
    // own (x, y, d, s) state down the bit levels).
    "q_hilbert" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.functions.LayoutFunctions
            .hilbertKey(col("l_partkey"), col("l_suppkey"), bits = 16).as("hkey"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- Graph: weighted PageRank over event transitions -----------------
    // Nodes are the 100 distinct props.k values; edges are consecutive-
    // event transitions per user ordered by event_id (NOT ts — the fixture
    // timestamps are nanosecond parquet, and Spark truncates to micros
    // while DuckDB keeps nanos, so a ts ordering could tie-break
    // differently across engines). Ranks are fixed-point integers: every
    // iteration is exact int64 arithmetic, so 8 iterations hash-match the
    // oracle's unrolled CTE chain bit for bit.
    "q_pagerank" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val edges = Graph.transitionEdges(ev, col("user_id"),
        get_json_object(col("props"), "$.k").cast("long"), col("event_id"))
      // checkpointEvery = 2: 8 unrolled join+agg rounds as ONE plan blew
      // past the codegen/task-binary budget (measured 1.57 → 7.54 s in
      // round 10's bench, "Broadcasting large task binary 1.1–1.3 MiB"
      // warnings); cutting lineage every 2 rounds keeps each compiled
      // stage graph bounded regardless of the iteration count.
      Graph.pageRank(edges, iterations = 8, checkpointEvery = 2)
        .orderBy("node")
    }),

    // ---- Graph: PageRank with exact dangling-mass conservation -----------
    // The full Page et al. model: dangling rank redistributes uniformly
    // each iteration instead of leaking. Edges are the q_pagerank
    // transitions DAG-ified by src < dst, so the max node is dangling BY
    // CONSTRUCTION at every scale (a weight threshold would make the
    // dangling set an accident of the data). Filtering on the (src, dst)
    // group keys commutes with the weight aggregation, so the oracle
    // applies the same predicate post-group.
    "q_pagerank_exact" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val edges = Graph.transitionEdges(ev, col("user_id"),
          get_json_object(col("props"), "$.k").cast("long"), col("event_id"))
        .filter(col("src") < col("dst"))
      Graph.pageRankExact(edges, iterations = 8).orderBy("node")
    }),

    // ---- Events: linear multi-touch attribution (7-day lookback) ---------
    "q_attribution" -> ((s, d) => {
      graft.operators.Attribution.linearCredits(Tables.events(s, d),
          conversionType = "purchase", lookbackDays = 7)
        .orderBy("touch_type")
    }),

    // ---- Graph: HITS hubs/authorities, integer max-normalized ------------
    "q_hits" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val edges = Graph.transitionEdges(ev, col("user_id"),
          get_json_object(col("props"), "$.k").cast("long"), col("event_id"))
        .filter(col("weight") >= 2)
        .select(col("src"), col("dst"))
      Graph.hits(edges, iterations = 4).orderBy("node")
    }),

    // ---- Graph: personalized PageRank from the % 20 seed set -------------
    // teleport mass restricted to the trusted seeds — rank concentrates
    // around them; same fixed-point integer iteration as q_pagerank.
    "q_ppr" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val edges = Graph.transitionEdges(ev, col("user_id"),
        get_json_object(col("props"), "$.k").cast("long"), col("event_id"))
      val nodes = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct()
      val seeds = nodes.filter(col("node") % 20 === 0)
      // checkpointEvery = 2 for the same lineage-budget reason as
      // q_pagerank — see the comment there.
      Graph.pageRank(edges, iterations = 8, checkpointEvery = 2,
          teleportSeeds = Some(seeds))
        .orderBy("node")
    }),

    // ---- Graph: exact per-node triangle counts ---------------------------
    // Graph = parts co-occurring in at least 2 orders (the min-support cut
    // keeps the edge set ~constant as the corpus grows: 3.6k edges at
    // sf0.01, 3.9k at sf0.1). Degree-ordered orientation bounds the wedge
    // join against hub nodes — see Graph.triangleCounts.
    "q_triangles" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      val co = li.alias("x").join(li.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
      Graph.triangleCounts(co).orderBy("node")
    }),

    // ---- Graph: k-core of the co-occurrence graph ------------------------
    // k=2 over the same min-support graph as q_triangles (the core is
    // non-empty at sf0.001/0.01/0.1 — higher k empties out at sf0.1,
    // where more orders dilute pairwise co-occurrence counts); 8 peel
    // rounds reach the fixpoint on this graph (GraphSpec asserts
    // idempotence of a further round at the declared config).
    "q_kcore" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      val co = li.alias("x").join(li.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
      Graph.kCore(co, k = 2, rounds = 8).orderBy("node")
    }),

    // ---- Graph: multi-source BFS hop distance ----------------------------
    // Reachability from the seed nodes (k % 20 == 0) over min-support
    // transition edges (weight >= 2 sparsifies what is otherwise a
    // near-complete 100-node graph). Hop labels are integers; the oracle
    // is a DuckDB recursive CTE taking min(hops) per node.
    "q_bfs" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val edges = Graph.transitionEdges(ev, col("user_id"),
          get_json_object(col("props"), "$.k").cast("long"), col("event_id"))
        .filter(col("weight") >= 2)
        .select(col("src"), col("dst"))
      val nodes = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct()
      val seeds = nodes.filter(col("node") % 20 === 0)
      Graph.bfsHops(edges, seeds, maxHops = 4).orderBy("node")
    }),

    // ---- Graph: weighted shortest paths (bounded Bellman-Ford) -----------
    // Same transition graph and seed rule as q_bfs; edge cost = 10⁶ DIV
    // weight (frequent transitions are cheap), so the answer is the
    // most-likely route cost. 4 relaxation rounds — exact for all
    // shortest paths of <= 4 edges, the weighted sibling of q_bfs's
    // hop counts.
    "q_shortest_path" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val edges = Graph.transitionEdges(ev, col("user_id"),
          get_json_object(col("props"), "$.k").cast("long"), col("event_id"))
        .filter(col("weight") >= 2)
        .select(col("src"), col("dst"),
          expr("1000000L DIV weight").as("weight"))
      val nodes = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct()
      val seeds = nodes.filter(col("node") % 20 === 0)
      Graph.shortestPaths(edges, seeds, rounds = 4).orderBy("node")
    }),

    // ---- Graph: label-propagation communities over the transition graph -
    "q_label_prop" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val tr = Graph.transitionEdges(ev, col("user_id"),
          get_json_object(col("props"), "$.k").cast("long"), col("event_id"))
        .filter(col("weight") >= 2)
      val und = tr.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      Graph.labelPropagation(und, rounds = 4).orderBy("node")
    }),

    // ---- Graph: first-order Markov next-state model ----------------------
    // P(next | current) over user clickstream transitions in exact ppm;
    // is_top marks each state's modal successor. The behavioral-model
    // sibling of q_pagerank on the same transition edges.
    "q_markov" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val edges = Graph.transitionEdges(ev, col("user_id"),
        get_json_object(col("props"), "$.k").cast("long"), col("event_id"))
      Graph.markovTransitions(edges.filter(col("weight") >= 2))
        .orderBy("src", "dst")
    }),

    // ---- Graph: link prediction (common neighbors + RA index) ------------
    // Candidate pairs at distance 2 over the q_triangles co-occurrence
    // graph, scored by common-neighbor count and the fixed-point Resource
    // Allocation index.
    "q_link_predict" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      val co = li.alias("x").join(li.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select(col("a"), col("b"))
      graft.operators.Graph.linkPrediction(co)
        .filter(col("common_neighbors") >= 2)
        .orderBy("a", "b")
    }),

    // ---- Graph: deterministic DeepWalk-style walk corpus -----------------
    // same transition graph and seed rule as q_bfs; 2 walks × 5 steps per
    // seed, neighbor choice = md5(start|w|t|node) mod degree.
    "q_random_walk" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val edges = Graph.transitionEdges(ev, col("user_id"),
          get_json_object(col("props"), "$.k").cast("long"), col("event_id"))
        .filter(col("weight") >= 2)
        .select(col("src"), col("dst"))
      val nodes = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct()
      val seeds = nodes.filter(col("node") % 20 === 0)
      Graph.randomWalks(edges, seeds, steps = 5, walksPerNode = 2)
        .groupBy(col("start").as("start_node"), col("w").cast("long").as("walk_id"))
        .agg((count(lit(1)) - 1).as("n_steps"),
          concat_ws("->", transform(
            array_sort(collect_list(struct(col("t"), col("node")))),
            x => x.getField("node").cast("string"))).as("path"))
        .orderBy("start_node", "walk_id")
    }),

    // ---- Text analysis: BM25 relevance against a fixed term set ----------
    "text_bm25" -> ((s, d) => {
      TextAnalysis.bm25(Tables.documents(s, d), "text", "doc_id",
          terms = Seq("spark", "table", "query"))
        .select(col("id").as("doc_id"), col("bm25"))
        .orderBy("doc_id")
    }),

    // ---- Multi-query BM25 retrieval: top-5 docs per query ----------------
    // The inverted-index search as one relational plan — posting-list
    // explode keeps only query terms, per-term scores are exact scaled
    // INTEGERS (order-independent sums; see TextAnalysis.searchTopK), so
    // the whole (query, doc) score grid replays in SQL. Query 3 mixes the
    // rare term 'dup' (df≈25) with a common one — idf contrast on show.
    "text_search_topk" -> ((s, d) => {
      import s.implicits._
      val queries = Seq(1 -> "spark", 1 -> "table", 2 -> "query",
        2 -> "data", 2 -> "join", 3 -> "dup", 3 -> "stream")
        .toDF("query_id", "term")
      TextAnalysis.searchTopK(Tables.documents(s, d), "text", "doc_id",
          queries, k = 5)
        .orderBy("query_id", "rank")
    }),

    // ---- Hybrid retrieval: RRF fusion of BM25 + dense cosine ------------
    // lexical ranker = text_bm25's scorer; dense ranker = cosine vs the
    // vec_id=0 embedding; both truncated to 100 before integer-RRF fusion.
    "q_rrf_fusion" -> ((s, d) => {
      val bm = TextAnalysis.bm25(Tables.documents(s, d), "text", "doc_id",
          terms = Seq("spark", "table", "query"))
        .select(col("id"), col("bm25").as("score"))
      val emb = Tables.embeddings(s, d)
      val cos = graft.operators.Similarity
        .bruteForceTopK(emb, emb.filter(col("vec_id") === 0),
          "vec_id", "embedding", k = 100)
        .select(col("neighbor_id").as("id"), col("score"))
      graft.operators.Retrieval.rrfFuse(Seq(bm, cos), perRanker = 100,
          topK = 20)
        .select(col("id").as("doc_id"), col("n_rankers"), col("rrf_score"))
        .orderBy(col("rrf_score").desc, col("doc_id"))
    }),

    // ---- Multimodal: binary columns + stubbed decode ---------------------
    "mm_meta" -> ((s, d) => {
      Multimodal.decode(Multimodal.synthesize(s, Tables.documents(s, d)))
        .toDF()
        .select("media_id", "mime", "content_len", "width", "height", "n_frames")
        .orderBy("media_id")
    }),

    // ---- Multimodal: REAL binaryFile source over on-disk blobs (same
    // decode stub, same oracle — content bytes identical by construction) -
    "mm_binary" -> ((s, d) => {
      val dir = Multimodal.fixtureDir(d)
      Multimodal.ensureFixtureFiles(s, Tables.documents(s, d), dir)
      Multimodal.decode(Multimodal.readBinaryFiles(s, dir))
        .toDF()
        .select("media_id", "mime", "content_len", "width", "height", "n_frames")
        .orderBy("media_id")
    }),

    // ---- Multimodal: perceptual hash over REAL pixels --------------------
    // Full-raster BMPs (bottom-up rows, stride padding) decoded byte-by-
    // byte, luma-converted, resized 9x8 and dHashed. The oracle replays
    // every pixel from the generation formula — equality proves the BMP
    // encode/decode round-trips AND the hash math matches bit for bit.
    "mm_phash" -> ((s, d) => {
      Multimodal.imageHashes(
          Multimodal.synthesizeImages(s, Tables.documents(s, d)))
        .orderBy("media_id")
    }),

    // ---- Text: greedy longest-match segmentation (WordPiece inference) --
    // One codegen'd pass per document (MaxMatchStats); the sibling
    // pointer-doubling formulation (maxMatchSegmentsSharded — log2(len)
    // hash-join rounds, for sequences sharded across rows) is proven
    // row-identical in TextSamplingSpec. Vocab mixes nested prefixes
    // (jo/join, ba/batch) so longest-match is load-bearing; fallback =
    // 1-code-point escape.
    "text_maxmatch" -> ((s, d) => {
      TextAnalysis.maxMatchSegments(Tables.documents(s, d), "text",
          "doc_id", vocab = ExtensionQueries.maxMatchVocab, maxPieceLen = 8)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- Multimodal: integer DSP features from REAL decoded PCM ----------
    // 16-bit WAVE blobs are parsed byte-for-byte (RIFF walk -> fmt rate,
    // data chunk -> sign-extended little-endian samples); peak, energy,
    // zero-crossings, and duration are exact integers the oracle replays
    // from the same sample formula. The decode is the one genuinely
    // imperative stage; everything else is relational.
    "mm_audio_energy" -> ((s, d) => {
      Multimodal.audioFeatures(
          Multimodal.synthesizeAudio(s, Tables.documents(s, d)))
        .orderBy("media_id")
    }),

    // Shot-boundary detection over REAL AVI movi frames: 00db BGR24
    // chunks are parsed byte-for-byte (LIST walk, stride, bottom-up rows,
    // luma); per-pair L1 diffs happen inside the decode pass, the
    // boundary threshold stays a relational knob. Shot cuts are
    // structural (every 4th frame rekeys the pattern) so the oracle
    // replays every pixel of every frame.
    "mm_shot_bounds" -> ((s, d) => {
      Multimodal.shotBoundaries(
          Multimodal.synthesizeVideos(s, Tables.documents(s, d)),
          threshold = 1000L)
        .orderBy("media_id", "f")
    }),

    // Windowed loudness profile (peak / energy / clipping / Q8.8
    // normalization gain per 50-sample window) — pure hash aggregation on
    // (media, i DIV 50), no window function; oracle replays the sample
    // formula per position.
    "mm_audio_windows" -> ((s, d) => {
      Multimodal.audioWindows(
          Multimodal.synthesizeAudio(s, Tables.documents(s, d)),
          windowSamples = 50, clipThreshold = 30000)
        .orderBy("media_id", "win")
    }),

    // Exact pixel stats from the real decoded raster — the brightness /
    // contrast pre-training screen; the oracle replays every pixel of the
    // generation formula including the one-pixel perturbation.
    "mm_image_stats" -> ((s, d) => {
      Multimodal.imageStats(
          Multimodal.synthesizeImages(s, Tables.documents(s, d)))
        .orderBy("media_id")
    }),

    // Near-dup image pairs at Hamming <= 3: each id-group of 4 images
    // differs by one inverted pixel, so groups collapse into cliques;
    // candidates come from 16-bit chunk equi-joins, never a cross join.
    "mm_phash_dups" -> ((s, d) => {
      Multimodal.phashNearDups(
          Multimodal.imageHashes(
            Multimodal.synthesizeImages(s, Tables.documents(s, d))),
          maxHamming = 3)
        .orderBy("a", "b")
    }),

    // ---- Feature engineering: leave-one-out target encoding -------------
    // category = order priority, label = order finalized; exact rational
    // ppm so the encoded feature is reproducible across engines and runs.
    "q_target_encoding" -> ((s, d) => {
      Stats.targetEncode(Tables.orders(s, d), col("o_orderkey"),
          col("o_orderpriority"), (col("o_orderstatus") === "F").cast("int"),
          smoothing = 10L)
        .withColumnRenamed("key", "o_orderkey")
        .orderBy("o_orderkey")
    }),

    // ---- Experimentation: two-proportion z-test per event type ----------
    // variant = user parity, conversion = deterministic k % 3 rule; the z
    // statistic is one fixed-order double expression (IEEE sqrt is exact),
    // reported in floored micros.
    "q_ab_test" -> ((s, d) => {
      val ev = Tables.events(s, d)
      Stats.abTestZ(ev, col("event_type"), pmod(col("user_id"), lit(2L)),
          (get_json_object(col("props"), "$.k").cast("long") % 3 === 0)
            .cast("long"))
        .withColumnRenamed("group", "event_type")
        .orderBy("event_type")
    }),

    // ---- Graph: community quality (modularity + conductance) ------------
    // Label-prop communities over the q_triangles co-occurrence graph (the
    // dense event-transition graph collapses to ONE community — useless);
    // modularity contribution ×4m² and conductance ppm are exact integers
    // (see Graph.communityMetrics). 332 communities at sf0.01.
    "q_modularity" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      // materialize the (small) min-support graph once: label propagation
      // and every metric branch read the checkpoint. The co-purchase pair
      // stream is generated MAP-SIDE from per-order sorted part arrays
      // (one groupBy exchange) instead of the former lineitem self-join —
      // same multiset of a<b pairs (multiplicity = cnt_a×cnt_b per order,
      // equal-part pairs excluded by the strict filter), one exchange of
      // the lineitem projection instead of two join sides (guide §2.4)
      val und = graft.operators.Associations.pairStream(
          li.groupBy(col("l_orderkey"))
            .agg(sort_array(collect_list(col("l_partkey"))).as("items")))
        .filter(col("i1") < col("i2"))
        .groupBy(col("i1").as("a"), col("i2").as("b"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select(col("a"), col("b"))
        .localCheckpoint(true)
      Graph.communityMetrics(und, Graph.labelPropagation(und, rounds = 4))
        .orderBy("label")
    }),

    // ---- Feature engineering: hashing-trick text vectors -----------------
    // 64 buckets over whitespace tokens; sparse (doc, bucket, value)
    // triplets with md5-derived bucket and sign.
    "q_feature_hash" -> ((s, d) => {
      TextAnalysis.featureHash(Tables.documents(s, d), col("doc_id"),
          TextFunctions.tokens(col("text")), numBuckets = 64)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "bucket")
    }),

    // ---- Training batches: power-of-two length-bucket padding report -----
    "q_length_buckets" -> ((s, d) => {
      Sampling.lengthBuckets(
          Tables.documents(s, d)
            .withColumn("nt", size(split(col("text"), " "))),
          col("source"), col("nt"))
        .orderBy("stratum", "bucket_tokens")
    }),

    // ---- Curation: DPO/RLHF preference-pair construction -----------------
    // prompt group = user, candidates = the user's events scored by value;
    // chosen/rejected by floored-micros ordering with id tie-breaks, pairs
    // below a 0.01 score gap dropped.
    "q_pref_pairs" -> ((s, d) => {
      Sampling.preferencePairs(Tables.events(s, d), col("user_id"),
          col("event_id"), col("value"), minGapMicros = 10000L)
        .withColumnRenamed("group", "user_id")
        .orderBy("user_id")
    }),

    // ---- Evaluation: exact ROC-AUC by Mann-Whitney rank sum --------------
    // "Does event value predict conversion?" — integer midranks via the
    // bucketed orderedRank, no global-order window; ties handled exactly.
    "q_roc_auc" -> ((s, d) => {
      val ev = Tables.events(s, d)
      Stats.rocAuc(ev, col("value"),
        (get_json_object(col("props"), "$.k").cast("long") % 3 === 0)
          .cast("long"),
        col("event_id"))
    }),

    // ---- Evaluation: per-segment ROC-AUC ---------------------------------
    // The q_roc_auc statistic per event type — per-segment model eval in
    // one stratified rank pass.
    "q_group_auc" -> ((s, d) => {
      val ev = Tables.events(s, d)
      Stats.groupedRocAuc(ev, col("event_type"), col("value"),
          (get_json_object(col("props"), "$.k").cast("long") % 3 === 0)
            .cast("long"),
          col("event_id"))
        .withColumnRenamed("group", "event_type")
        .orderBy("event_type")
    }),

    // ---- Evaluation: classifier reliability (calibration) table ----------
    // Synthetic calibrated scores: p = (k % 100)/100, label drawn by the
    // md5-bucket of the event id under p — so a correct implementation
    // shows per-bin acc ≈ conf and the oracle replays label generation.
    "q_calibration" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val k = get_json_object(col("props"), "$.k").cast("long")
      Stats.calibrationReport(
          ev.select((pmod(k, lit(100L)) * 10000L).as("p_micros"),
            (Sampling.md5Bucket(col("event_id"), 100) < pmod(k, lit(100L)))
              .cast("long").as("y")),
          col("p_micros"), col("y"), bins = 10)
        .orderBy("bin")
    }),

    // ---- Robust stats: winsorized per-group aggregate --------------------
    // Clamp line-item quantities at the exact per-flag [p5, p95] rank
    // values; bounds via group-stratified orderedRank, never a global
    // window.
    "q_winsorize" -> ((s, d) => {
      Stats.winsorizedStats(Tables.lineitem(s, d), col("l_returnflag"),
          col("l_quantity"), col("l_orderkey") * 8 + col("l_linenumber"),
          loPct = 5, hiPct = 95)
        .withColumnRenamed("group", "l_returnflag")
        .orderBy("l_returnflag")
    }),

    // ---- Normalization: per-source quantile normalization ----------------
    // Map every source's n_chars distribution onto the pooled corpus
    // distribution — two bucketed rank passes + one rank equi-join.
    "q_quantile_norm" -> ((s, d) => {
      Stats.quantileNormalize(Tables.documents(s, d), col("doc_id"),
          col("source"), col("n_chars"), col("doc_id"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- Embeddings: ±1 random projection (Achlioptas JL) ----------------
    // 64 -> 8 dims under the seeded md5 sign matrix; integer fixed-point
    // outputs as flat columns.
    "q_rand_proj" -> ((s, d) => {
      Similarity.randomProjection(Tables.embeddings(s, d), col("vec_id"),
          col("embedding"), dim = 64, outDims = 8, seed = 42L)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")
    }),

    // ---- API surface: SQL text through the registered Catalyst functions -
    // The SparkSessionExtensions path end-to-end: a temp view + pure
    // `spark.sql` text calling zorder_key/hilbert_key exactly like
    // built-ins (no UDF indirection; both are codegen'd expressions).
    "q_sql_surface" -> ((s, d) => {
      // sessions built outside GraftSession (the driver's Verify main)
      // lack the injected functions — registration is idempotent
      graft.plans.GraftFunctions.register(s)
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT l_orderkey, l_linenumber,
              |  zorder_key(l_partkey, l_suppkey, 16) AS zkey,
              |  hilbert_key(l_partkey, l_suppkey, 16) AS hkey
              |FROM lineitem_v
              |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    }),

    // ---- Tokenizer planning: vocabulary coverage curve -------------------
    // Corpus token mass covered by a top-k bigram vocabulary at four
    // candidate sizes; ranks via the bucketed orderedRank over the
    // VOCABULARY (one row per distinct term), one conditional agg pass.
    "q_vocab_coverage" -> ((s, d) => {
      TextAnalysis.vocabCoverage(Tables.documents(s, d),
          TextFunctions.wordNgrams(TextFunctions.tokens(col("text")), 2),
          ks = Seq(10, 100, 500, 2000))
        .orderBy("k")
    }),

    // ---- Graph: degree distribution in pow2 bins -------------------------
    // Over the q_triangles co-occurrence graph; the hub/power-law audit.
    "q_degree_dist" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      val und = li.alias("x").join(li.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select(col("a"), col("b"))
      Graph.degreeHistogram(und).orderBy("bucket_degree")
    }),

    // ---- Multimodal: silence runs in REAL decoded PCM --------------------
    // Gaps-and-islands over |sample| < 4000 positions, runs >= 2 only;
    // trim/segmentation primitive for audio curation.
    "mm_audio_silence" -> ((s, d) => {
      Multimodal.audioSilence(
          Multimodal.synthesizeAudio(s, Tables.documents(s, d)),
          threshold = 4000, minRun = 2)
        .orderBy("media_id")
    }),

    // ---- Data quality: Benford first-digit audit over order totals ------
    // Integer cents before digit extraction (double->string rendering is
    // engine-specific; integer->string is not); expectations are
    // compile-time ppm constants.
    "q_benford" -> ((s, d) => {
      Stats.benfordReport(Tables.orders(s, d),
          floor(col("o_totalprice") * lit(100.0)))
        .orderBy("digit")
    }),

    // ---- Text: Flesch readability from pure counting ---------------------
    // Over the deterministic multi-line rebuild (text_c4's linedText), so
    // sentence segmentation is real; scores are single fixed-order double
    // expressions over integer counts, floored to milli-units.
    "q_readability" -> ((s, d) => {
      TextAnalysis.readability(
          Tables.documents(s, d).withColumn("text2", linedText), "text2")
        .select(col("doc_id"), col("n_sentences"), col("n_words"),
          col("n_syllables"), col("fre_milli"), col("fk_grade_milli"))
        .orderBy("doc_id")
    }),

    // ---- Embeddings: per-class centroid drift between corpus halves ------
    // L1 distance between slice centroids per label, exact integers after
    // clearing denominators; the monitoring primitive for embedding drift.
    "q_centroid_shift" -> ((s, d) => {
      Similarity.centroidShift(Tables.embeddings(s, d), col("label"),
          pmod(col("vec_id"), lit(2L)), col("embedding"), dim = 64)
        .orderBy("label")
    }),

    // ---- Curation: per-class embedding outliers (mislabel screen) --------
    // Top-3 farthest members from their own class centroid, exact
    // cleared-denominator integer distances.
    "q_label_outliers" -> ((s, d) => {
      Similarity.labelOutliers(Tables.embeddings(s, d), col("vec_id"),
          col("label"), col("embedding"), dim = 64, k = 3)
        .orderBy("label", "rank")
    }),

    // ---- Evaluation: Adjusted Rand Index, predicted vs true labels ------
    // Chance-corrected pair-counting agreement over the q_confusion
    // holdout predictions — exact integer combinatorics end-to-end.
    "q_rand_index" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val corpus = emb.filter(col("vec_id") % 10 =!= 0)
      // the holdout is CAPPED by a literal id bound: the probe side is
      // broadcast into a nested-loop cosine scan, so it must be a fixed
      // probe BUDGET (≤500), never a fixed FRACTION of the corpus
      val probes = emb.filter(col("vec_id") % 10 === 0 && col("vec_id") < 5000)
      val preds = Similarity.knnClassify(corpus, probes, "vec_id",
        "embedding", "label", k = 10)
      Stats.adjustedRandIndex(
        preds.join(broadcast(probes.select(col("vec_id").as("query_id"),
          col("label").as("t"))), Seq("query_id")),
        col("t"), col("pred_label"))
    }),

    // ---- Audit: cross-source contamination matrix ------------------------
    // "How much of source A's content re-appears in source B?" — the
    // fingerprint is the 5-word OPENING (shared boilerplate audit; full-
    // text md5 finds zero cross-source repeats in this fixture, so the
    // prefix variant exercises the real pairwise path).
    "q_source_overlap" -> ((s, d) => {
      Dedup.sourceOverlap(Tables.documents(s, d), col("source"),
          array_join(slice(split(col("text"), " "), 1, 5), " "))
        .orderBy("source_a", "source_b")
    }),

    // ---- Audit: what does exact dedup buy (capacity planning) ------------
    // The fixture corpus has no exact text repeats (dedup_exact = 500
    // singleton clusters), so every 7th document is re-appended to give
    // the histogram a real multiplicity-2 row; the oracle replays the
    // same union.
    "dedup_savings" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.dedupSavings(
          docs.unionByName(docs.filter(col("doc_id") % 7 === 0)),
          col("text"), octet_length(col("text")))
        .orderBy("n_copies")
    }),

    // ---- Stats: Spearman rank correlation (midranks, no global sort) -----
    // Monotone association between quantity and price on the line items;
    // doubled midranks keep the whole statistic integral until one
    // fixed-order double expression.
    "q_spearman" -> ((s, d) => {
      Stats.spearmanRho(Tables.lineitem(s, d), col("l_quantity"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"),
        expr("l_orderkey * 10 + l_linenumber"))
    }),

    // ---- Evaluation: simplified (centroid) silhouette per label ----------
    // Label separation quality in embedding space; integer-exact route
    // with only fixed-order IEEE sqrt/divide at the per-vector step.
    "q_silhouette" -> ((s, d) => {
      Similarity.silhouette(Tables.embeddings(s, d), col("vec_id"),
          col("label"), col("embedding"), dim = 64)
        .orderBy("label")
    }),

    // ---- Mining: mutual nearest neighbors (reciprocal best match) --------
    // Bitext-style pair mining: LSH-banded candidates (dedup_semantic's
    // plane config), per-id cosine argmax, reciprocal filter. Never an
    // all-pairs cross.
    "q_mutual_nn" -> ((s, d) => {
      // adaptive geometry, gate-invariant at (6, 16). Band compensation
      // runs at tau = 0.5 — mutual-NN mining cares about each id's TOP
      // candidate, which on this corpus sits in the moderately-similar
      // regime; the threshold=-1 verify keeps every candidate either way.
      val emb = Tables.embeddings(s, d)
      val (bits, bands) = Similarity.lshGeometry(emb.count(), tau = 0.5,
        baseBits = 6, baseBands = 16)
      Similarity.mutualTopMatches(emb, "vec_id",
          "embedding", bandBits = bits, numBands = bands)
        .orderBy("id_1")
    }),

    // ---- Audit flagship: per-source dataset card -------------------------
    // The one-row-per-source corpus summary a dataset release ships with:
    // volume, token mass, exact-dup exposure, median length, lexical
    // diversity — composed from the library's own operators in ONE plan.
    "pipeline_datacard" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      val base = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      val perText = docs.groupBy(col("text")).agg(count(lit(1)).as("__c"))
      val dup = docs.join(perText, Seq("text"))
        .groupBy(col("source"))
        .agg(sum((col("__c") > 1).cast("long")).as("dup_docs"))
      val med = Stats.groupedLowerMedian(docs, col("source"),
          col("n_tokens"), col("doc_id"))
        .select(col("g").as("source"), col("med").as("med_tokens"))
      val tt = TextAnalysis.typeTokenRatio(docs, col("source"),
          TextFunctions.tokens(col("text")))
        .select(col("stratum").as("source"), col("ttr_ppm"))
      base.join(dup, Seq("source")).join(med, Seq("source"))
        .join(tt, Seq("source"))
        .select(col("source"), col("n_docs"), col("sum_tokens"),
          expr("sum_tokens DIV n_docs").as("mean_tokens"),
          col("dup_docs"), col("med_tokens"), col("ttr_ppm"))
        .orderBy("source")
    }),

    // ---- Audit: approximate-dedup precision/recall self-check ------------
    // The dedup_minhash estimate scored against the exact PPJoin pair set
    // at the same 0.5 word-3-gram Jaccard threshold — run before trusting
    // an LSH config on a new corpus.
    "q_dedup_eval" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val est = Dedup.minHashNearDups(docs, "doc_id",
        ShingleFunctions.wordShingleHashes(TextFunctions.tokens(col("text")), 3),
        threshold = 0.5, Dedup.LshConfig(numHashes = 64, bandRows = 2))
      val exact = Dedup.prefixJaccardPairs(docs, "doc_id",
        TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3),
        p = 1, q = 2)
      Dedup.dedupEval(est, exact)
    }),

    // ---- Embeddings: exact covariance matrix (first 8 dims) --------------
    // PCA/whitening precursor in cleared-denominator integers; dims pair
    // through a per-vector-id self-join (dims^2 fan-out, never NxN).
    "q_cov_matrix" -> ((s, d) => {
      Stats.covarianceMatrix(Tables.embeddings(s, d), col("vec_id"),
          col("embedding"), dims = 8)
        .orderBy("d1", "d2")
    }),

    // ---- Drift: two-sample chi-square over a categorical bucketing -------
    // The categorical complement of q_ks_drift/q_tv_drift: even-vs-odd
    // user cohorts compared on the event-type distribution.
    "q_chi2_drift" -> ((s, d) => {
      Stats.chiSquareDrift(Tables.events(s, d),
        col("user_id") % 2, col("event_type"))
    }),

    // ---- Text: lexical diversity (type-token / hapax ratios) -------------
    "text_ttr" -> ((s, d) => {
      TextAnalysis.typeTokenRatio(Tables.documents(s, d), col("source"),
          TextFunctions.tokens(col("text")))
        .withColumnRenamed("stratum", "source")
        .orderBy("source")
    }),

    // ---- Evaluation: kNN confusion matrix with class totals --------------
    // Same brute-cosine vote pipeline as q_knn_classify over a 50-probe
    // holdout (vec_id % 10), aggregated to (true, pred) cells with exact
    // ppm recall/precision on the diagonal.
    "q_confusion" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val corpus = emb.filter(col("vec_id") % 10 =!= 0)
      // fixed probe budget (≤500 by literal id bound), not a corpus
      // fraction — the probe side broadcasts (see q_rand_index)
      val probes = emb.filter(col("vec_id") % 10 === 0 && col("vec_id") < 5000)
      val preds = Similarity.knnClassify(corpus, probes, "vec_id",
        "embedding", "label", k = 10)
      Stats.confusionMatrix(
          preds.join(broadcast(probes.select(col("vec_id").as("query_id"),
            col("label").as("t"))), Seq("query_id")),
          col("t"), col("pred_label"))
        .orderBy("true_label", "pred_label")
    }))

  /** Shared vocabulary of text_maxmatch and its oracle/spec. */
  val maxMatchVocab: Seq[String] = Seq(" ", "jo", "join", "ha", "hash",
    "sc", "scan", "an", "ba", "batch", "row", "col", "column", "filt",
    "er", "the", "da", "data", "ta", "table", "qu", "query", "st",
    "stream", "me", "merge", "sort", "fa", "fast", "slow", "big", "small",
    "or", "order", "li", "line", "va", "value", "key", "gr", "group",
    "par", "part", "wi", "window", "ve", "vector", "cu", "customer",
    "a", "e", "s", "du", "dup")

  private val stopList = TextFunctions.stopwordsEn.map(w => s"'$w'").mkString(", ")

  /** Deterministic multi-line rebuild of the single-line fixture text, for
    * the line-level corpus filters: 3-token lines, terminal '.' appended
    * when the raw line's length isn't divisible by 3, and a lorem/brace
    * noise line on every 17th doc (exercises the C4 blocklist). The
    * [[linedTextSql]] CTE is the byte-identical DuckDB construction.
    */
  private def linedText: org.apache.spark.sql.Column = {
    val toks = split(col("text"), " ")
    val raw = when(size(toks) >= 3,
      transform(sequence(lit(1), floor(size(toks) / lit(3)).cast("int")),
        i => concat_ws(" ", slice(toks, (i - lit(1)) * lit(3) + lit(1), lit(3)))))
      .otherwise(array().cast("array<string>"))
    val punct = transform(raw, x =>
      when(pmod(length(x), lit(3)) =!= 0, concat(x, lit("."))).otherwise(x))
    val withNoise = when(col("doc_id") % 17 === 0,
      concat(punct, array(lit("function() { lorem ipsum")))).otherwise(punct)
    array_join(withNoise, "\n")
  }

  /** DuckDB CTE producing `ls` = the same line array as [[linedText]]. */
  private val linedTextSql: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |l0 AS (SELECT doc_id, CASE WHEN len(w) >= 3
      |         THEN list_transform(generate_series(1, len(w) // 3),
      |           i -> array_to_string(w[(i-1)*3+1 : (i-1)*3+3], ' '))
      |         ELSE [] END AS ls FROM toks),
      |l1 AS (SELECT doc_id, list_transform(ls,
      |         x -> CASE WHEN length(x) % 3 <> 0 THEN x || '.' ELSE x END) AS ls
      |       FROM l0),
      |ld AS (SELECT doc_id, CASE WHEN doc_id % 17 = 0
      |         THEN list_append(ls, 'function() { lorem ipsum') ELSE ls END AS ls
      |       FROM l1)""".stripMargin

  /** Deterministic PII injection (emails on every 4th doc, phones on every
    * 5th) so the redaction operator has real matches; mirrored in SQL.
    */
  private def piiInjected: org.apache.spark.sql.Column =
    concat(col("text"),
      when(col("doc_id") % 4 === 0,
        concat(lit(" reach u"), col("doc_id").cast("string"),
          lit("@mail.example.com"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" call 555-"),
          lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
          lit("-0199"))).otherwise(lit("")))

  /** DuckDB oracle for `sim_lsh_topk`: the seeded hyperplanes are
    * deterministic (`java.util.Random.nextGaussian` is algorithmically
    * specified), so they are emitted as literal DOUBLE[] VALUES rows and the
    * WHOLE pipeline — sign-bit band signatures → candidate equi-join on
    * (band, bandSig) → exact cosine rerank — is replayed in SQL.
    * `Double.toString` round-trips and DuckDB's cast parses correctly
    * rounded, so `list_dot_product` on the same operand order reproduces the
    * Spark dots bit-exactly (same family as the `sim_topk` cosine oracle).
    * Must mirror the declared query's config: dim=64, bandBits=4,
    * numBands=16, seed=42, k=5, queries = vec_id < 5.
    */
  /** DuckDB replay of [[graft.operators.Stats.topPrincipalDirection]]:
    * same floored fixed-point elements, same integer moment matrix, same
    * sign-factored max-normalization, one MATERIALIZED CTE trio per
    * iteration (DuckDB would otherwise inline each round into the next —
    * the BPE lesson).
    */
  private def powerIterationOracle(dims: Int, rounds: Int,
                                   scale: Long): String = {
    val roundCtes = (1 to rounds).map { r =>
      val prev = if (r == 1) "v0" else s"n${r - 1}"
      s"""r$r AS MATERIALIZED (
         |  SELECT m.i, sum(m.mij * p.v) AS w
         |  FROM m JOIN $prev p ON m.j = p.i GROUP BY 1),
         |x$r AS MATERIALIZED (SELECT max(abs(w)) AS mx FROM r$r),
         |n$r AS MATERIALIZED (
         |  SELECT i, (CASE WHEN w < 0 THEN -1 ELSE 1 END) *
         |    ((abs(w) * $scale) // mx) AS v
         |  FROM r$r CROSS JOIN x$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH px AS (
       |  SELECT vec_id, s.i,
       |    CAST(floor(CAST(embedding[s.i + 1] AS DOUBLE) * $scale)
       |      AS BIGINT) AS x
       |  FROM embeddings CROSS JOIN generate_series(0, ${dims - 1}) s(i)),
       |nn AS (SELECT CAST(count(DISTINCT vec_id) AS HUGEINT) AS n FROM px),
       |sx AS (SELECT i, CAST(sum(x) AS HUGEINT) AS sx FROM px GROUP BY 1),
       |sxy AS (
       |  SELECT a.i, b.i AS j, sum(CAST(a.x AS HUGEINT) * b.x) AS sxy
       |  FROM px a JOIN px b ON a.vec_id = b.vec_id GROUP BY 1, 2),
       |m AS MATERIALIZED (
       |  SELECT sxy.i, sxy.j, nn.n * sxy.sxy - si.sx * sj.sx AS mij
       |  FROM sxy CROSS JOIN nn
       |  JOIN sx si ON si.i = sxy.i JOIN sx sj ON sj.i = sxy.j),
       |v0 AS (SELECT i, CAST($scale AS HUGEINT) AS v
       |       FROM generate_series(0, ${dims - 1}) s(i)),
       |$roundCtes
       |SELECT i AS pos, CAST(v AS BIGINT) AS component_scaled
       |FROM n$rounds ORDER BY pos""".stripMargin
  }

  private def lshTopKOracle: String = {
    val bandBits = 4
    val planes = graft.operators.Similarity.hyperplanes(
      dim = 64, numPlanes = bandBits * 16, seed = 42L)
    val planeRows = planes.zipWithIndex.map { case (p, i) =>
      s"(${i / bandBits}, ${i % bandBits}, [${p.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n  ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |planes(band, bit, p) AS (VALUES
       |  $planeRows),
       |sigs AS (
       |  SELECT e.vec_id, pl.band,
       |    CAST(sum(CASE WHEN list_dot_product(e.v, pl.p) > 0
       |      THEN (1::BIGINT << pl.bit) ELSE 0 END) AS BIGINT) AS bsig
       |  FROM e CROSS JOIN planes pl
       |  GROUP BY e.vec_id, pl.band),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM sigs q JOIN sigs c
       |    ON q.band = c.band AND q.bsig = c.bsig AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 5),
       |s AS (
       |  SELECT query_id, neighbor_id,
       |    list_dot_product(a.v, b.v) /
       |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
       |      AS score
       |  FROM cand
       |  JOIN e a ON a.vec_id = cand.query_id
       |  JOIN e b ON b.vec_id = cand.neighbor_id),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM s)
       |SELECT query_id, neighbor_id, rank, score FROM r
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB oracle for `sim_lsh_mp_topk`: the [[lshTopKOracle]] replay
    * with bandBits=6, numBands=8 and the QUERY-DIRECTED probe set on the
    * query side — the 6 best flip sets of ≤2 bits ranked by summed |dot|
    * margin (sum in ascending-bit addition order, exactly
    * [[graft.functions.HyperplaneProbeGen]]'s doubles), ties by mask
    * ascending. ONE probe-set definition, derived by both engines from
    * the identical per-bit dots.
    */
  private def lshMultiProbeOracle: String = {
    val bandBits = 6
    val numProbes = 6
    val planes = graft.operators.Similarity.hyperplanes(
      dim = 64, numPlanes = bandBits * 8, seed = 42L)
    val planeRows = planes.zipWithIndex.map { case (p, i) =>
      s"(${i / bandBits}, ${i % bandBits}, [${p.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n  ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |planes(band, bit, p) AS (VALUES
       |  $planeRows),
       |dots AS (
       |  SELECT e.vec_id, pl.band, pl.bit,
       |    list_dot_product(e.v, pl.p) AS d
       |  FROM e CROSS JOIN planes pl),
       |sigs AS (
       |  SELECT vec_id, band,
       |    CAST(sum(CASE WHEN d > 0
       |      THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS bsig
       |  FROM dots
       |  GROUP BY vec_id, band),
       |fl AS (
       |  SELECT vec_id, band, (1::BIGINT << bit) AS mask, abs(d) AS msum
       |  FROM dots WHERE vec_id < 5
       |  UNION ALL
       |  SELECT a.vec_id, a.band,
       |    (1::BIGINT << a.bit) | (1::BIGINT << b.bit) AS mask,
       |    abs(a.d) + abs(b.d) AS msum
       |  FROM dots a JOIN dots b
       |    ON a.vec_id = b.vec_id AND a.band = b.band AND a.bit < b.bit
       |  WHERE a.vec_id < 5),
       |fr AS (
       |  SELECT vec_id, band, mask,
       |    row_number() OVER (PARTITION BY vec_id, band
       |      ORDER BY msum ASC, mask ASC) AS rn
       |  FROM fl),
       |qp AS (
       |  SELECT vec_id, band, bsig FROM sigs WHERE vec_id < 5
       |  UNION
       |  SELECT s.vec_id, s.band, xor(s.bsig, f.mask) AS bsig
       |  FROM sigs s JOIN fr f
       |    ON f.vec_id = s.vec_id AND f.band = s.band AND f.rn <= $numProbes
       |  WHERE s.vec_id < 5),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM qp q JOIN sigs c
       |    ON q.band = c.band AND q.bsig = c.bsig AND q.vec_id <> c.vec_id),
       |s AS (
       |  SELECT query_id, neighbor_id,
       |    list_dot_product(a.v, b.v) /
       |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
       |      AS score
       |  FROM cand
       |  JOIN e a ON a.vec_id = cand.query_id
       |  JOIN e b ON b.vec_id = cand.neighbor_id),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM s)
       |SELECT query_id, neighbor_id, rank, score FROM r
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Embedding count of the sf0.01 correctness-gate fixture. The adaptive
    * queries derive their LSH geometry from the LIVE corpus count
    * (Similarity.lshGeometry); their oracles carry STATIC plane literals,
    * so the two agree only while the gate fixture sits BELOW the
    * occupancy knee (n ≤ targetOccupancy·2^baseBits, i.e. 512 for the
    * 6-bit configs). [[gateLshGeometry]] re-derives the oracle geometry
    * through the same lshGeometry call and refuses to build an oracle
    * whose geometry has silently diverged from the base config;
    * OracleCouplingSpec additionally pins the on-disk fixture count.
    */
  private[graft] val gateEmbeddingCount = 500L

  /** Oracle-side twin of the query-side `lshGeometry(emb.count(), …)`
    * call: same function, gate fixture count. The require turns a fixture
    * regeneration past the adaptivity knee into a loud build-time error
    * instead of a silent hash mismatch.
    */
  private[graft] def gateLshGeometry(n: Long, tau: Double, baseBits: Int,
                                     baseBands: Int): (Int, Int) = {
    val (bits, bands) =
      graft.operators.Similarity.lshGeometry(n, tau, baseBits, baseBands)
    require(bits == baseBits && bands == baseBands,
      s"oracle plane literals assume the sf0.01 gate fixture (n=$n) sits " +
        s"below the lshGeometry occupancy knee, but geometry adapted to " +
        s"($bits, $bands) != base ($baseBits, $baseBands): regenerate the " +
        "oracle plane literals or shrink the gate fixture")
    (bits, bands)
  }

  /** DuckDB oracle for `dedup_semantic`: same seeded-hyperplane replay as
    * [[lshTopKOracle]] (bandBits=6, numBands=16, dim=64, seed=42), then the
    * skew-guard bucket filter, the exact-cosine verify at 0.4, and the
    * recursive-CTE connected-components closure (the dedup_canonical
    * pattern) down to the full id → canonical map.
    */
  private def semanticDedupOracle: String = {
    val (bandBits, numBands) =
      gateLshGeometry(gateEmbeddingCount, tau = 0.4, baseBits = 6, baseBands = 16)
    val planes = graft.operators.Similarity.hyperplanes(
      dim = 64, numPlanes = bandBits * numBands, seed = 42L)
    val planeRows = planes.zipWithIndex.map { case (p, i) =>
      s"(${i / bandBits}, ${i % bandBits}, [${p.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n  ")
    s"""WITH RECURSIVE e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |planes(band, bit, p) AS (VALUES
       |  $planeRows),
       |sigs AS (
       |  SELECT e.vec_id, pl.band,
       |    CAST(sum(CASE WHEN list_dot_product(e.v, pl.p) > 0
       |      THEN (1::BIGINT << pl.bit) ELSE 0 END) AS BIGINT) AS bsig
       |  FROM e CROSS JOIN planes pl
       |  GROUP BY e.vec_id, pl.band),
       |ok AS (
       |  SELECT band, bsig FROM sigs
       |  GROUP BY band, bsig HAVING count(*) <= 100000),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_1, b.vec_id AS id_2
       |  FROM sigs a
       |  JOIN ok ON ok.band = a.band AND ok.bsig = a.bsig
       |  JOIN sigs b
       |    ON a.band = b.band AND a.bsig = b.bsig AND a.vec_id < b.vec_id),
       |p AS (
       |  SELECT id_1, id_2 FROM cand
       |  JOIN e a ON a.vec_id = cand.id_1
       |  JOIN e b ON b.vec_id = cand.id_2
       |  WHERE list_dot_product(a.v, b.v) /
       |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
       |    >= 0.4),
       |ed AS (SELECT id_1 AS s, id_2 AS t FROM p
       |       UNION SELECT id_2, id_1 FROM p),
       |reach(s, t) AS (
       |  SELECT s, t FROM ed UNION SELECT s, s FROM ed
       |  UNION SELECT r.s, ed.t FROM reach r JOIN ed ON r.t = ed.s),
       |cn AS (SELECT s AS id, min(t) AS canonical_id FROM reach GROUP BY s)
       |SELECT e.vec_id AS id,
       |  COALESCE(cn.canonical_id, e.vec_id) AS canonical_id,
       |  CAST(COALESCE(cn.canonical_id, e.vec_id) = e.vec_id AS INTEGER)
       |    AS is_canonical
       |FROM e LEFT JOIN cn ON cn.id = e.vec_id
       |ORDER BY id""".stripMargin
  }

  /** DuckDB oracle for `q_mutual_nn`: the [[semanticDedupOracle]] banded
    * candidate replay (same planes, guard on both sides), then per-id
    * best-candidate and the reciprocal join.
    */
  /** Shared with q_dedup_eval, which embeds this replay. */
  /** Shared by dedup_incremental and dedup_incremental_idx: the persisted-
    * index probe is algebraically identical to the in-plan one (same split,
    * config, verify), so ONE exact new × corpus Jaccard replay gates both.
    */
  /** Full replay of the persisted semantic-IVF probe — both sides route
    * through the stored seeded anchors (first 8 corpus ids), candidates
    * are the shared-cell join, verification the shared cosine. Shared by
    * dedup_semantic_ivf_incr and dedup_semantic_ivf_merge (the probe over
    * the delta-appended index must equal this full-corpus replay).
    */
  private val semanticIvfIncrOracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |corp AS (SELECT * FROM e WHERE vec_id % 10 <> 0),
      |newb AS (SELECT * FROM e WHERE vec_id % 10 = 0),
      |c AS (SELECT vec_id AS cell, v AS cv FROM corp
      |      ORDER BY vec_id LIMIT 8),
      |sc AS (
      |  SELECT s.vec_id AS id, s.side, c.cell,
      |    list_dot_product(s.v, c.cv) /
      |      (sqrt(list_dot_product(s.v, s.v)) * sqrt(list_dot_product(c.cv, c.cv)))
      |      AS score
      |  FROM (SELECT vec_id, v, 'c' AS side FROM corp
      |        UNION ALL SELECT vec_id, v, 'n' AS side FROM newb) s
      |  CROSS JOIN c),
      |r AS (
      |  SELECT id, side, cell, row_number() OVER (PARTITION BY id, side
      |    ORDER BY score DESC, cell ASC) AS rk FROM sc),
      |ac AS (SELECT id, cell FROM r WHERE side = 'c' AND rk <= 2),
      |an AS (SELECT id, cell FROM r WHERE side = 'n' AND rk <= 2),
      |cand AS (
      |  SELECT DISTINCT n.id AS id_new, k.id AS id_corpus
      |  FROM an n JOIN ac k ON n.cell = k.cell AND n.id <> k.id)
      |SELECT cand.id_new, cand.id_corpus,
      |  list_dot_product(x.v, y.v) /
      |    (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
      |    AS cosine
      |FROM cand JOIN e x ON x.vec_id = cand.id_new
      |  JOIN e y ON y.vec_id = cand.id_corpus
      |WHERE list_dot_product(x.v, y.v) /
      |    (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
      |    >= 0.4
      |ORDER BY id_new, id_corpus""".stripMargin

  /** Full two-drain ingest replay — shared by the in-plan
    * (w_stream_dedup_ingest) and persisted-index
    * (w_stream_dedup_ingest_idx) streaming doors; see the
    * oracle-map comment for the door-equivalence argument.
    */
  private val streamDedupIngestOracleSql: String =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS MATERIALIZED (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, len(w) - 2),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
      |  FROM toks WHERE len(w) >= 3),
      |pa AS MATERIALIZED (
      |  SELECT a.doc_id AS id_1, b.doc_id AS id_2
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |    AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 0
      |  WHERE len(list_intersect(a.g, b.g)) /
      |      len(list_distinct(list_concat(a.g, b.g))) >= 0.5),
      |ea AS MATERIALIZED (
      |  SELECT id_1 AS s, id_2 AS t FROM pa UNION SELECT id_2, id_1 FROM pa),
      |reacha(s, t) AS (
      |  SELECT s, t FROM ea UNION SELECT s, s FROM ea
      |  UNION SELECT r.s, ea.t FROM reacha r JOIN ea ON r.t = ea.s),
      |dropa AS MATERIALIZED (
      |  SELECT s AS doc_id FROM reacha GROUP BY s HAVING s <> min(t)),
      |keepa AS MATERIALIZED (
      |  SELECT doc_id FROM documents WHERE doc_id % 2 = 0
      |    AND doc_id NOT IN (SELECT doc_id FROM dropa)),
      |pb AS MATERIALIZED (
      |  SELECT a.doc_id AS id_1, b.doc_id AS id_2
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |    AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 1
      |  WHERE len(list_intersect(a.g, b.g)) /
      |      len(list_distinct(list_concat(a.g, b.g))) >= 0.5),
      |eb AS MATERIALIZED (
      |  SELECT id_1 AS s, id_2 AS t FROM pb UNION SELECT id_2, id_1 FROM pb),
      |reachb(s, t) AS (
      |  SELECT s, t FROM eb UNION SELECT s, s FROM eb
      |  UNION SELECT r.s, eb.t FROM reachb r JOIN eb ON r.t = eb.s),
      |dropb AS MATERIALIZED (
      |  SELECT s AS doc_id FROM reachb GROUP BY s HAVING s <> min(t)),
      |canb AS MATERIALIZED (
      |  SELECT doc_id FROM documents WHERE doc_id % 2 = 1
      |    AND doc_id NOT IN (SELECT doc_id FROM dropb)),
      |hitb AS MATERIALIZED (
      |  SELECT DISTINCT n.doc_id
      |  FROM sh n, sh c
      |  WHERE n.doc_id IN (SELECT doc_id FROM canb)
      |    AND c.doc_id IN (SELECT doc_id FROM keepa)
      |    AND len(list_intersect(n.g, c.g)) /
      |        len(list_distinct(list_concat(n.g, c.g))) >= 0.5)
      |SELECT doc_id FROM keepa
      |UNION ALL
      |SELECT doc_id FROM canb WHERE doc_id NOT IN (SELECT doc_id FROM hitb)
      |ORDER BY doc_id""".stripMargin

  private val dedupIncrementalOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, len(w) - 2),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
      |  FROM toks WHERE len(w) >= 3)
      |SELECT n.doc_id AS id_new, c.doc_id AS id_corpus,
      |  len(list_intersect(n.g, c.g)) /
      |    len(list_distinct(list_concat(n.g, c.g))) AS jaccard
      |FROM sh n JOIN sh c ON n.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
      |WHERE len(list_intersect(n.g, c.g)) /
      |    len(list_distinct(list_concat(n.g, c.g))) >= 0.5
      |ORDER BY id_new, id_corpus""".stripMargin

  private val dedupMinhashOracleSql: String =
    """WITH toks AS (
          |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          |sh AS (
          |  SELECT doc_id, list_distinct(list_transform(
          |    generate_series(1, len(w) - 2),
          |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
          |  FROM toks WHERE len(w) >= 3)
          |SELECT a.doc_id AS id_1, b.doc_id AS id_2,
          |  len(list_intersect(a.g, b.g)) /
          |    len(list_distinct(list_concat(a.g, b.g))) AS jaccard
          |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          |WHERE len(list_intersect(a.g, b.g)) /
          |    len(list_distinct(list_concat(a.g, b.g))) >= 0.5
          |ORDER BY id_1, id_2""".stripMargin

  /** Shared with q_dedup_eval, which embeds this replay. */
  private val dedupPpjoinOracleSql: String =
    """WITH toks AS (
          |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          |t0 AS (
          |  SELECT doc_id AS id, unnest(list_distinct(list_transform(
          |    generate_series(1, len(w) - 2),
          |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS t
          |  FROM toks WHERE len(w) >= 3),
          |dfq AS (SELECT t, count(*) AS dfq FROM t0 GROUP BY 1),
          |kept AS (SELECT id, t0.t, dfq FROM t0 JOIN dfq USING (t)
          |         WHERE dfq <= 10000),
          |ranked AS (
          |  SELECT id, t,
          |    row_number() OVER (PARTITION BY id ORDER BY dfq, t) AS pos,
          |    count(*) OVER (PARTITION BY id) AS n
          |  FROM kept),
          |prefix AS (SELECT id, t, n FROM ranked
          |           WHERE pos <= n - ((n * 1 + 2 - 1) // 2) + 1),
          |cand AS (
          |  SELECT DISTINCT a.id AS id_1, b.id AS id_2, a.n AS n_1, b.n AS n_2
          |  FROM prefix a JOIN prefix b ON a.t = b.t AND a.id < b.id
          |  WHERE 2 * least(a.n, b.n) >= 1 * greatest(a.n, b.n)),
          |inter AS (
          |  SELECT c.id_1, c.id_2, c.n_1, c.n_2, count(*) AS n_shared
          |  FROM cand c
          |  JOIN kept x ON x.id = c.id_1
          |  JOIN kept y ON y.id = c.id_2 AND y.t = x.t
          |  GROUP BY 1, 2, 3, 4)
          |SELECT id_1, id_2, CAST(n_shared AS BIGINT) AS n_shared,
          |  CAST(n_shared AS DOUBLE) / (n_1 + n_2 - n_shared) AS jaccard
          |FROM inter WHERE 2 * n_shared >= 1 * (n_1 + n_2 - n_shared)
          |ORDER BY id_1, id_2""".stripMargin

  private def mutualNnOracle: String = {
    val (bandBits, numBands) =
      gateLshGeometry(gateEmbeddingCount, tau = 0.5, baseBits = 6, baseBands = 16)
    val planes = graft.operators.Similarity.hyperplanes(
      dim = 64, numPlanes = bandBits * numBands, seed = 42L)
    val planeRows = planes.zipWithIndex.map { case (p, i) =>
      s"(${i / bandBits}, ${i % bandBits}, [${p.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n  ")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |planes(band, bit, p) AS (VALUES
       |  $planeRows),
       |sigs AS MATERIALIZED (
       |  SELECT e.vec_id, pl.band,
       |    CAST(sum(CASE WHEN list_dot_product(e.v, pl.p) > 0
       |      THEN (1::BIGINT << pl.bit) ELSE 0 END) AS BIGINT) AS bsig
       |  FROM e CROSS JOIN planes pl
       |  GROUP BY e.vec_id, pl.band),
       |ok AS MATERIALIZED (
       |  SELECT band, bsig FROM sigs
       |  GROUP BY band, bsig HAVING count(*) <= 100000),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT a.vec_id AS id_1, b.vec_id AS id_2
       |  FROM sigs a
       |  JOIN ok oa ON oa.band = a.band AND oa.bsig = a.bsig
       |  JOIN sigs b
       |    ON a.band = b.band AND a.bsig = b.bsig AND a.vec_id < b.vec_id
       |  JOIN ok ob ON ob.band = b.band AND ob.bsig = b.bsig),
       |p AS MATERIALIZED (
       |  SELECT id_1, id_2,
       |    list_dot_product(a.v, b.v) /
       |      (sqrt(list_dot_product(a.v, a.v)) *
       |       sqrt(list_dot_product(b.v, b.v))) AS cosine
       |  FROM cand
       |  JOIN e a ON a.vec_id = cand.id_1
       |  JOIN e b ON b.vec_id = cand.id_2),
       |bth AS (
       |  SELECT id_1 AS id, id_2 AS nb, cosine FROM p
       |  UNION ALL SELECT id_2, id_1, cosine FROM p),
       |t1 AS (
       |  SELECT id, nb, cosine,
       |    row_number() OVER (PARTITION BY id
       |      ORDER BY cosine DESC, nb ASC) AS rn
       |  FROM bth),
       |b1 AS (SELECT id, nb AS best, cosine AS best_cos FROM t1 WHERE rn = 1)
       |SELECT x.id AS id_1, y.id AS id_2, x.best_cos AS cosine
       |FROM b1 x JOIN b1 y
       |  ON x.best = y.id AND y.best = x.id AND x.id < y.id
       |ORDER BY id_1""".stripMargin
  }

  /** DuckDB oracle for `q_heavy_hitters`: the sketch's (a_r, b_r) row
    * params are deterministic from the seed and emitted as literals, so the
    * whole Carter–Wegman bucket computation, the d×w count matrix, the
    * min-over-rows estimate and the top-20 cut are replayed exactly.
    */
  private def heavyHittersOracle: String = {
    val hrRows = graft.operators.Sketches.cmsRowParams(4, 42L).zipWithIndex
      .map { case ((a, b), r) => s"($r, ${a}::BIGINT, ${b}::BIGINT)" }
      .mkString(", ")
    s"""WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
       |g AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
       |        i -> w[i] || ' ' || w[i+1])) AS token FROM t),
       |hr(r, a, b) AS (VALUES $hrRows),
       |bk AS (SELECT hr.r,
       |    ((hr.a * (('0x' || substr(md5(g.token), 1, 15))::BIGINT % 2147483647)
       |      + hr.b) % 2147483647) % 256 AS bucket
       |  FROM g CROSS JOIN hr),
       |cms AS (SELECT r, bucket, count(*) AS cnt FROM bk GROUP BY 1, 2),
       |keys AS (SELECT DISTINCT token FROM g),
       |kb AS (SELECT keys.token, hr.r,
       |    ((hr.a * (('0x' || substr(md5(keys.token), 1, 15))::BIGINT % 2147483647)
       |      + hr.b) % 2147483647) % 256 AS bucket
       |  FROM keys CROSS JOIN hr),
       |est AS (SELECT kb.token, min(COALESCE(cms.cnt, 0)) AS est_count
       |        FROM kb LEFT JOIN cms ON cms.r = kb.r AND cms.bucket = kb.bucket
       |        GROUP BY 1),
       |ex AS (SELECT token, count(*) AS exact_count FROM g GROUP BY 1)
       |SELECT est.token, CAST(est.est_count AS BIGINT) AS est_count,
       |  ex.exact_count
       |FROM est JOIN ex USING (token)
       |ORDER BY est_count DESC, token LIMIT 20""".stripMargin
  }

  /** DuckDB oracle for `dedup_semantic_mp`: plane replay at bandBits=8
    * plus the QUERY-DIRECTED probe set on one side of the self-join —
    * the 6 best flip sets of ≤2 bits by summed |dot| margin (ascending-
    * bit addition order, ties by mask), mirroring the operator's
    * probeDepth=2 path; verified pairs only (no closure).
    */
  private def semanticMpOracle: String = {
    val (bandBits, numBands) =
      gateLshGeometry(gateEmbeddingCount, tau = 0.4, baseBits = 8, baseBands = 16)
    val numProbes = 6
    val planes = graft.operators.Similarity.hyperplanes(
      dim = 64, numPlanes = bandBits * numBands, seed = 42L)
    val planeRows = planes.zipWithIndex.map { case (p, i) =>
      s"(${i / bandBits}, ${i % bandBits}, [${p.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n  ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |planes(band, bit, p) AS (VALUES
       |  $planeRows),
       |dots AS (
       |  SELECT e.vec_id, pl.band, pl.bit,
       |    list_dot_product(e.v, pl.p) AS d
       |  FROM e CROSS JOIN planes pl),
       |sigs AS (
       |  SELECT vec_id, band,
       |    CAST(sum(CASE WHEN d > 0
       |      THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS bsig
       |  FROM dots
       |  GROUP BY vec_id, band),
       |ok AS (
       |  SELECT band, bsig FROM sigs
       |  GROUP BY band, bsig HAVING count(*) <= 100000),
       |so AS (SELECT sigs.* FROM sigs JOIN ok USING (band, bsig)),
       |fl AS (
       |  SELECT vec_id, band, (1::BIGINT << bit) AS mask, abs(d) AS msum
       |  FROM dots
       |  UNION ALL
       |  SELECT a.vec_id, a.band,
       |    (1::BIGINT << a.bit) | (1::BIGINT << b.bit) AS mask,
       |    abs(a.d) + abs(b.d) AS msum
       |  FROM dots a JOIN dots b
       |    ON a.vec_id = b.vec_id AND a.band = b.band AND a.bit < b.bit),
       |fr AS (
       |  SELECT vec_id, band, mask,
       |    row_number() OVER (PARTITION BY vec_id, band
       |      ORDER BY msum ASC, mask ASC) AS rn
       |  FROM fl),
       |pr AS (
       |  SELECT vec_id, band, bsig FROM so
       |  UNION
       |  SELECT so.vec_id, so.band, xor(so.bsig, f.mask) AS bsig
       |  FROM so JOIN fr f
       |    ON f.vec_id = so.vec_id AND f.band = so.band
       |   AND f.rn <= $numProbes),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_1, b.vec_id AS id_2
       |  FROM pr a JOIN so b
       |    ON a.band = b.band AND a.bsig = b.bsig AND a.vec_id < b.vec_id)
       |SELECT id_1, id_2,
       |  list_dot_product(a.v, b.v) /
       |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
       |    AS cosine
       |FROM cand
       |JOIN e a ON a.vec_id = cand.id_1
       |JOIN e b ON b.vec_id = cand.id_2
       |WHERE list_dot_product(a.v, b.v) /
       |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
       |    >= 0.4
       |ORDER BY id_1, id_2""".stripMargin
  }

  /** DuckDB oracle for `dedup_semantic_incr`: same plane replay as
    * [[semanticDedupOracle]], with new = vec_id % 10 = 0 probing corpus =
    * the rest; the skew guard counts corpus-side buckets only, mirroring
    * the operator.
    */
  private def semanticIncrOracle: String = {
    // geometry sized on the CORPUS side (vec_id % 10 <> 0 = 9/10 of the
    // gate fixture), mirroring the query's corpus.count() probe
    val (bandBits, numBands) = gateLshGeometry(
      gateEmbeddingCount - gateEmbeddingCount / 10,
      tau = 0.4, baseBits = 6, baseBands = 16)
    val planes = graft.operators.Similarity.hyperplanes(
      dim = 64, numPlanes = bandBits * numBands, seed = 42L)
    val planeRows = planes.zipWithIndex.map { case (p, i) =>
      s"(${i / bandBits}, ${i % bandBits}, [${p.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n  ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |planes(band, bit, p) AS (VALUES
       |  $planeRows),
       |sigs AS (
       |  SELECT e.vec_id, pl.band,
       |    CAST(sum(CASE WHEN list_dot_product(e.v, pl.p) > 0
       |      THEN (1::BIGINT << pl.bit) ELSE 0 END) AS BIGINT) AS bsig
       |  FROM e CROSS JOIN planes pl
       |  GROUP BY e.vec_id, pl.band),
       |ns AS (SELECT * FROM sigs WHERE vec_id % 10 = 0),
       |cs AS (SELECT * FROM sigs WHERE vec_id % 10 <> 0),
       |ok AS (
       |  SELECT band, bsig FROM cs
       |  GROUP BY band, bsig HAVING count(*) <= 100000),
       |cand AS (
       |  SELECT DISTINCT n.vec_id AS id_new, c.vec_id AS id_corpus
       |  FROM ns n
       |  JOIN cs c ON n.band = c.band AND n.bsig = c.bsig
       |    AND n.vec_id <> c.vec_id
       |  JOIN ok ON ok.band = c.band AND ok.bsig = c.bsig)
       |SELECT id_new, id_corpus,
       |  list_dot_product(a.v, b.v) /
       |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
       |    AS cosine
       |FROM cand
       |JOIN e a ON a.vec_id = cand.id_new
       |JOIN e b ON b.vec_id = cand.id_corpus
       |WHERE list_dot_product(a.v, b.v) /
       |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
       |    >= 0.4
       |ORDER BY id_new, id_corpus""".stripMargin
  }

  /** Shared DuckDB CTE replicating [[graft.functions.CdcHash.chunks]]
    * (w=16, maskBits=5) in the direct O(len·w) per-position form: window
    * hash = fold (a·257 + codepoint) mod 2³¹−1, cut where (h &amp; 31)=0,
    * spans between consecutive cuts plus the non-empty tail.
    */
  private val cdcChunkSql: String =
    """WITH c AS (
      |  SELECT doc_id, text, length(text) AS n,
      |    list_filter(generate_series(16, length(text)),
      |      i -> (list_reduce(list_prepend(CAST(0 AS BIGINT),
      |              list_transform(generate_series(i - 15, i),
      |                j -> CAST(ascii(text[j:j]) AS BIGINT))),
      |            (a, b) -> (a * 257 + b) % 2147483647) & 31) = 0) AS cuts
      |  FROM documents WHERE length(text) >= 1),
      |sp AS (
      |  SELECT doc_id, text,
      |    list_prepend(CAST(1 AS BIGINT), list_transform(cuts, c -> c + 1)) AS ss,
      |    list_append(cuts, CAST(n AS BIGINT)) AS es
      |  FROM c),
      |ch AS (
      |  SELECT doc_id, text,
      |    list_filter(list_transform(generate_series(1, len(es)),
      |      k -> {'s': ss[k], 'e': es[k]}),
      |      p -> struct_extract(p, 's') <= struct_extract(p, 'e')) AS spans
      |  FROM sp)""".stripMargin

  /** Unrolled PageRank oracle: one CTE per iteration, the same
    * fixed-point integer arithmetic as [[Graph.pageRank]] (`//` in DuckDB
    * == `DIV` in Spark on the all-positive operands here). Each
    * iteration's rank is cast back to BIGINT because DuckDB widens
    * integer SUM to HUGEINT — which the driver's pandas compare would
    * render as float64.
    */
  /** Unrolled HITS oracle: per round, an authority half-step and a hub
    * half-step, each max-normalized with an integer DIV (HUGEINT-safe —
    * every exposed value is cast back to BIGINT). MATERIALIZED because
    * each frame is referenced by the next half-step AND the final join.
    */
  private def hitsOracle(iterations: Int): String = {
    val roundCtes = (1 to iterations).map { k =>
      s"""ar$k AS (
         |  SELECT e.dst AS node, sum(h.h) AS raw
         |  FROM e JOIN h${k - 1} h ON h.node = e.src GROUP BY 1),
         |a$k AS MATERIALIZED (
         |  SELECT n.node,
         |    CAST(coalesce(r.raw, 0) * 1000000 // m.mx AS BIGINT) AS a
         |  FROM nodes n LEFT JOIN ar$k r USING (node)
         |  CROSS JOIN (SELECT max(raw) AS mx FROM ar$k) m),
         |hr$k AS (
         |  SELECT e.src AS node, sum(a.a) AS raw
         |  FROM e JOIN a$k a ON a.node = e.dst GROUP BY 1),
         |h$k AS MATERIALIZED (
         |  SELECT n.node,
         |    CAST(coalesce(r.raw, 0) * 1000000 // m.mx AS BIGINT) AS h
         |  FROM nodes n LEFT JOIN hr$k r USING (node)
         |  CROSS JOIN (SELECT max(raw) AS mx FROM hr$k) m)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (
       |  SELECT user_id, event_id,
       |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS node
       |  FROM events),
       |tr AS (
       |  SELECT node AS dst,
       |    lag(node) OVER (PARTITION BY user_id ORDER BY event_id) AS src
       |  FROM ev),
       |ed AS (
       |  SELECT src, dst FROM tr WHERE src IS NOT NULL
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ed),
       |nodes AS MATERIALIZED (
       |  SELECT DISTINCT src AS node FROM e UNION SELECT dst FROM e),
       |h0 AS (SELECT node, 1000000::BIGINT AS h FROM nodes),
       |$roundCtes
       |SELECT n.node, h.h AS hub, a.a AS authority
       |FROM nodes n JOIN h$iterations h USING (node)
       |JOIN a$iterations a USING (node) ORDER BY n.node""".stripMargin
  }

  private def pageRankOracle(iterations: Int,
                             baseExpr: String = "150000000000"): String = {
    val iterCtes = (1 to iterations).map { i =>
      s"""r$i AS (
         |  SELECT n.node, CAST($baseExpr + (COALESCE(sum(
         |      (r.rank // e.wout) * e.weight +
         |      ((r.rank % e.wout) * e.weight) // e.wout), 0) * 17) // 20
         |    AS BIGINT) AS rank
         |  FROM nodes n
         |  LEFT JOIN ew e ON e.dst = n.node
         |  LEFT JOIN r${i - 1} r ON r.node = e.src
         |  GROUP BY n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (
       |  SELECT user_id, event_id,
       |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS node
       |  FROM events),
       |tr AS (
       |  SELECT node AS dst,
       |    lag(node) OVER (PARTITION BY user_id ORDER BY event_id) AS src
       |  FROM ev),
       |ed AS (SELECT src, dst, count(*) AS weight
       |       FROM tr WHERE src IS NOT NULL GROUP BY 1, 2),
       |wo AS (SELECT src, CAST(sum(weight) AS BIGINT) AS wout
       |       FROM ed GROUP BY 1),
       |ew AS (SELECT e.src, e.dst, e.weight, w.wout
       |       FROM ed e JOIN wo w USING (src)),
       |nodes AS (SELECT DISTINCT src AS node FROM ed
       |          UNION SELECT DISTINCT dst FROM ed),
       |r0 AS (SELECT node, 1000000000000::BIGINT AS rank FROM nodes),
       |$iterCtes
       |SELECT node, rank FROM r$iterations ORDER BY node""".stripMargin
  }

  /** Unrolled replay of [[graft.operators.Graph.pageRankExact]] over the
    * src &lt; dst DAG: each iteration adds a 1-row dangling-mass CTE and
    * redistributes `d // n` into every node's inbound mass. CTEs are
    * MATERIALIZED — DuckDB re-executes multiply-referenced CTEs per
    * reference, and `ew`/`nodes`/`dang` are referenced once per
    * iteration.
    */
  private def pageRankExactOracle(iterations: Int): String = {
    val iterCtes = (1 to iterations).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT CAST(COALESCE((SELECT sum(rank) FROM r${i - 1}
         |    WHERE node IN (SELECT node FROM dang)), 0) AS BIGINT) AS d),
         |r$i AS MATERIALIZED (
         |  SELECT n.node, CAST(150000000000 + ((COALESCE(sum(
         |      (r.rank // e.wout) * e.weight +
         |      ((r.rank % e.wout) * e.weight) // e.wout), 0)
         |      + (SELECT d FROM d$i) // (SELECT nv FROM nn)) * 17) // 20
         |    AS BIGINT) AS rank
         |  FROM nodes n
         |  LEFT JOIN ew e ON e.dst = n.node
         |  LEFT JOIN r${i - 1} r ON r.node = e.src
         |  GROUP BY n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS MATERIALIZED (
       |  SELECT user_id, event_id,
       |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS node
       |  FROM events),
       |tr AS MATERIALIZED (
       |  SELECT node AS dst,
       |    lag(node) OVER (PARTITION BY user_id ORDER BY event_id) AS src
       |  FROM ev),
       |ed AS MATERIALIZED (
       |  SELECT src, dst, count(*) AS weight
       |  FROM tr WHERE src IS NOT NULL GROUP BY 1, 2),
       |edf AS MATERIALIZED (SELECT * FROM ed WHERE src < dst),
       |wo AS MATERIALIZED (SELECT src, CAST(sum(weight) AS BIGINT) AS wout
       |       FROM edf GROUP BY 1),
       |ew AS MATERIALIZED (SELECT e.src, e.dst, e.weight, w.wout
       |       FROM edf e JOIN wo w USING (src)),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edf
       |          UNION SELECT DISTINCT dst FROM edf),
       |nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv FROM nodes),
       |dang AS MATERIALIZED (SELECT node FROM nodes
       |        WHERE node NOT IN (SELECT src FROM wo)),
       |r0 AS MATERIALIZED (
       |  SELECT node, 1000000000000::BIGINT AS rank FROM nodes),
       |$iterCtes
       |SELECT node, rank FROM r$iterations ORDER BY node""".stripMargin
  }

  /** Unrolled k-core peel oracle over the min-support co-occurrence
    * graph: one (degree, keep, filter) CTE triple per round. The
    * per-round CTEs are MATERIALIZED — DuckDB inlines plain CTEs, and
    * each round references the previous one four times, so the default
    * expansion is 4^rounds copies of the base scan (observed as a
    * too-many-open-files explosion at rounds=8).
    */
  private def kCoreOracle(k: Int, rounds: Int): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT v, count(*) AS deg FROM (
         |        SELECT a AS v FROM und${i - 1}
         |        UNION ALL SELECT b FROM und${i - 1}) GROUP BY 1),
         |k$i AS MATERIALIZED (SELECT v FROM d$i WHERE deg >= $k),
         |und$i AS MATERIALIZED (SELECT a, b FROM und${i - 1}
         |          WHERE a IN (SELECT v FROM k$i)
         |            AND b IN (SELECT v FROM k$i))""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS w
       |  FROM lineitem x JOIN lineitem y
       |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
       |  GROUP BY 1, 2),
       |und0 AS MATERIALIZED (SELECT a, b FROM e WHERE w >= 2),
       |$roundCtes
       |SELECT v AS node, count(*) AS degree FROM (
       |  SELECT a AS v FROM und$rounds UNION ALL SELECT b FROM und$rounds)
       |GROUP BY 1 HAVING count(*) >= $k ORDER BY node""".stripMargin
  }

  /** Community-metrics oracle: label propagation (q_label_prop's CTE
    * unrolling) over the q_triangles co-occurrence graph, then
    * per-community internal/cut/volume counts and the integer modularity
    * and conductance columns of
    * [[graft.operators.Graph.communityMetrics]]. Sums are CAST to BIGINT
    * (HUGEINT → pandas float64, the r04 lesson).
    */
  private def communityMetricsOracle(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { k =>
      val prev = s"lb${k - 1}"
      s"""cnt$k AS (
         |  SELECT e.src AS node, l.lbl, count(*) AS c
         |  FROM e JOIN $prev l ON l.node = e.dst GROUP BY 1, 2),
         |arg$k AS (
         |  SELECT node, lbl AS newlbl FROM (
         |    SELECT node, lbl, row_number() OVER (PARTITION BY node
         |      ORDER BY c DESC, lbl) AS rn FROM cnt$k)
         |  WHERE rn = 1),
         |lb$k AS MATERIALIZED (
         |  SELECT n.node, coalesce(a.newlbl, n.lbl) AS lbl
         |  FROM $prev n LEFT JOIN arg$k a USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH co AS (
       |  SELECT x.l_partkey AS s, y.l_partkey AS t, count(*) AS w
       |  FROM lineitem x JOIN lineitem y
       |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
       |  GROUP BY 1, 2),
       |und AS MATERIALIZED (SELECT s AS a, t AS b FROM co WHERE w >= 2),
       |e AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM und
       |  UNION
       |  SELECT b, a FROM und),
       |lb0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
       |$roundCtes,
       |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
       |lab AS MATERIALIZED (SELECT node, lbl AS label FROM lb$rounds),
       |led AS MATERIALIZED (
       |  SELECT u.a, u.b, la.label AS la, lb.label AS lbc
       |  FROM und u
       |  JOIN lab la ON la.node = u.a
       |  JOIN lab lb ON lb.node = u.b),
       |internal AS (
       |  SELECT la AS label, CAST(count(*) AS BIGINT) AS internal_edges
       |  FROM led WHERE la = lbc GROUP BY 1),
       |cut AS (
       |  SELECT label, CAST(count(*) AS BIGINT) AS cut_edges FROM (
       |    SELECT la AS label FROM led WHERE la <> lbc
       |    UNION ALL SELECT lbc FROM led WHERE la <> lbc)
       |  GROUP BY 1),
       |deg AS (
       |  SELECT v AS node, CAST(count(*) AS BIGINT) AS deg FROM (
       |    SELECT a AS v FROM und UNION ALL SELECT b FROM und)
       |  GROUP BY 1),
       |vol AS (
       |  SELECT l.label, CAST(count(*) AS BIGINT) AS n_nodes,
       |    CAST(sum(d.deg) AS BIGINT) AS volume
       |  FROM lab l JOIN deg d USING (node) GROUP BY 1)
       |SELECT v.label, v.n_nodes,
       |  coalesce(i.internal_edges, 0) AS internal_edges,
       |  coalesce(c.cut_edges, 0) AS cut_edges, v.volume,
       |  CAST(4 * m.m * coalesce(i.internal_edges, 0)
       |    - v.volume * v.volume AS BIGINT) AS modularity_num,
       |  CASE WHEN least(v.volume, 2 * m.m - v.volume) = 0 THEN NULL
       |       ELSE CAST(1000000 * coalesce(c.cut_edges, 0) //
       |         least(v.volume, 2 * m.m - v.volume) AS BIGINT)
       |  END AS conductance_ppm
       |FROM vol v
       |LEFT JOIN internal i USING (label)
       |LEFT JOIN cut c USING (label)
       |CROSS JOIN m
       |ORDER BY label""".stripMargin
  }

  /** Random-projection oracle: the seeded ±1 sign matrix regenerates from
    * [[graft.operators.Similarity.projectionSigns]] into a VALUES table,
    * inputs floor to x·10⁶ exactly as the Spark side, and the per-dim
    * sums pivot to flat d0..dk columns (integer sums are
    * order-independent — no fold-order caveat here).
    */
  private def randProjOracle(dim: Int, outDims: Int, seed: Long): String = {
    val signs = graft.operators.Similarity.projectionSigns(dim, outDims, seed)
    val values = (for (j <- 0 until outDims; i <- 0 until dim)
      yield s"($i,$j,${signs(j)(i)})").mkString(", ")
    val pivot = (0 until outDims)
      .map(j => s"CAST(max(CASE WHEN j = $j THEN pj END) AS BIGINT) AS d$j")
      .mkString(",\n  ")
    s"""WITH ex AS (
       |  SELECT vec_id, CAST(t.i AS INTEGER) AS i,
       |    CAST(floor(CAST(embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE)
       |      * 1000000.0) AS BIGINT) AS xi
       |  FROM embeddings, unnest(range(0, $dim)) AS t(i)
       |  WHERE len(embedding) >= $dim),
       |signs(i, j, s) AS (VALUES $values),
       |p AS (
       |  SELECT vec_id, j, CAST(sum(s * xi) AS BIGINT) AS pj
       |  FROM ex JOIN signs USING (i) GROUP BY 1, 2)
       |SELECT vec_id,
       |  $pivot
       |FROM p GROUP BY 1 ORDER BY vec_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_pagerank" -> pageRankOracle(8),
    "q_pagerank_exact" -> pageRankExactOracle(8),
    "q_ppr" -> pageRankOracle(8,
      "CASE WHEN n.node % 20 = 0 THEN 150000000000 ELSE 0 END"),
    "q_hits" -> hitsOracle(4),

    "q_attribution" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS conv_id, ts AS conv_ts FROM events
        |  WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT user_id, event_id AS touch_id, ts AS touch_ts,
        |    event_type AS touch_type
        |  FROM events WHERE event_type <> 'purchase'),
        |j AS (
        |  SELECT t.touch_type, p.conv_id, t.touch_ts, t.touch_id
        |  FROM t JOIN p USING (user_id)
        |  WHERE t.touch_ts < p.conv_ts
        |    AND t.touch_ts >= p.conv_ts - INTERVAL 7 DAY),
        |r AS (
        |  SELECT touch_type,
        |    count(*) OVER (PARTITION BY conv_id) AS n,
        |    row_number() OVER (PARTITION BY conv_id
        |      ORDER BY touch_ts DESC, touch_id DESC) AS rn
        |  FROM j)
        |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_credits,
        |  CAST(sum(1000000 // n +
        |    CASE WHEN rn = 1 THEN 1000000 % n ELSE 0 END) AS BIGINT)
        |    AS credit_ppm_total
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_kcore" -> kCoreOracle(2, 8),

    "q_markov" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS node
        |  FROM events),
        |tr AS (
        |  SELECT node AS dst,
        |    lag(node) OVER (PARTITION BY user_id ORDER BY event_id) AS src
        |  FROM ev),
        |ed AS (
        |  SELECT src, dst, CAST(count(*) AS BIGINT) AS weight
        |  FROM tr WHERE src IS NOT NULL
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |tot AS (SELECT src, CAST(sum(weight) AS BIGINT) AS tot
        |        FROM ed GROUP BY 1),
        |top AS (
        |  SELECT src, dst AS top_dst FROM (
        |    SELECT src, dst, row_number() OVER (PARTITION BY src
        |      ORDER BY weight DESC, dst) AS rn FROM ed)
        |  WHERE rn = 1)
        |SELECT e.src, e.dst, e.weight,
        |  CAST(e.weight * 1000000 // t.tot AS BIGINT) AS ppm,
        |  (e.dst = p.top_dst) AS is_top
        |FROM ed e JOIN tot t USING (src) JOIN top p USING (src)
        |ORDER BY e.src, e.dst""".stripMargin,

    "q_link_predict" ->
      """WITH co AS (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |adj AS (SELECT a AS z, b AS n FROM co
        |        UNION ALL SELECT b, a FROM co),
        |deg AS (SELECT z, CAST(count(*) AS BIGINT) AS deg
        |        FROM adj GROUP BY 1),
        |wed AS (
        |  SELECT x.n AS a, y.n AS b, x.z AS z
        |  FROM adj x JOIN adj y ON x.z = y.z AND x.n < y.n),
        |sc AS (
        |  SELECT w.a, w.b, CAST(count(*) AS BIGINT) AS common_neighbors,
        |    CAST(sum(1000000000000 // d.deg) AS BIGINT) AS ra_score
        |  FROM wed w JOIN deg d USING (z) GROUP BY 1, 2)
        |SELECT s.a, s.b, s.common_neighbors, s.ra_score
        |FROM sc s LEFT JOIN co c ON s.a = c.a AND s.b = c.b
        |WHERE c.a IS NULL AND s.common_neighbors >= 2
        |ORDER BY s.a, s.b""".stripMargin,

    "q_bfs" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS node
        |  FROM events),
        |tr AS (
        |  SELECT node AS dst,
        |    lag(node) OVER (PARTITION BY user_id ORDER BY event_id) AS src
        |  FROM ev),
        |ed AS (
        |  SELECT src, dst FROM tr WHERE src IS NOT NULL
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |seeds AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM ed UNION SELECT dst FROM ed)
        |  WHERE node % 20 = 0),
        |walk(node, hops) AS (
        |  SELECT node, 0 FROM seeds
        |  UNION
        |  SELECT e.dst, w.hops + 1
        |  FROM walk w JOIN ed e ON e.src = w.node WHERE w.hops < 4)
        |SELECT node, CAST(min(hops) AS BIGINT) AS hops
        |FROM walk GROUP BY 1 ORDER BY node""".stripMargin,

    "q_shortest_path" -> {
      val rounds = (1 to 4).map { k =>
        s"""d$k AS MATERIALIZED (
           |  SELECT node, min(dist) AS dist FROM (
           |    SELECT node, dist FROM d${k - 1}
           |    UNION ALL
           |    SELECT e.dst AS node, p.dist + e.w AS dist
           |    FROM d${k - 1} p JOIN ed e ON e.src = p.node)
           |  GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH ev AS (
         |  SELECT user_id, event_id,
         |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS node
         |  FROM events),
         |tr AS (
         |  SELECT node AS dst,
         |    lag(node) OVER (PARTITION BY user_id ORDER BY event_id) AS src
         |  FROM ev),
         |ed AS (
         |  SELECT src, dst, 1000000 // count(*) AS w FROM tr
         |  WHERE src IS NOT NULL
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |seeds AS (
         |  SELECT DISTINCT node FROM (
         |    SELECT src AS node FROM ed UNION SELECT dst FROM ed)
         |  WHERE node % 20 = 0),
         |d0 AS (SELECT node, 0 AS dist FROM seeds),
         |$rounds
         |SELECT node, CAST(dist AS BIGINT) AS dist FROM d4
         |ORDER BY node""".stripMargin
    },

    "q_label_prop" -> {
      val rounds = (1 to 4).map { k =>
        val prev = s"lb${k - 1}"
        s"""cnt$k AS (
           |  SELECT e.src AS node, l.lbl, count(*) AS c
           |  FROM e JOIN $prev l ON l.node = e.dst GROUP BY 1, 2),
           |arg$k AS (
           |  SELECT node, lbl AS newlbl FROM (
           |    SELECT node, lbl, row_number() OVER (PARTITION BY node
           |      ORDER BY c DESC, lbl) AS rn FROM cnt$k)
           |  WHERE rn = 1),
           |lb$k AS MATERIALIZED (
           |  SELECT n.node, coalesce(a.newlbl, n.lbl) AS lbl
           |  FROM $prev n LEFT JOIN arg$k a USING (node))""".stripMargin
      }.mkString(",\n")
      s"""WITH ev AS (
         |  SELECT user_id, event_id,
         |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS node
         |  FROM events),
         |tr AS (
         |  SELECT node AS dst,
         |    lag(node) OVER (PARTITION BY user_id ORDER BY event_id) AS src
         |  FROM ev),
         |ed AS (
         |  SELECT src, dst FROM tr WHERE src IS NOT NULL
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |und AS (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM ed WHERE src <> dst),
         |e AS MATERIALIZED (
         |  SELECT a AS src, b AS dst FROM und
         |  UNION
         |  SELECT b, a FROM und),
         |lb0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
         |$rounds
         |SELECT node, lbl AS label FROM lb4 ORDER BY node""".stripMargin
    },

    "q_random_walk" -> {
      val stepCtes = (1 to 5).map { t =>
        s"""w$t AS MATERIALIZED (
           |  SELECT c.start, c.w, n.dst AS node
           |  FROM w${t - 1} c JOIN nbr n ON n.src = c.node AND n.idx =
           |    ('0x' || substr(md5(c.start || '|' || c.w || '|' || $t ||
           |      '|' || c.node), 1, 15))::BIGINT % n.deg + 1)""".stripMargin
      }.mkString(",\n")
      val trailUnion = (1 to 5)
        .map(t => s"UNION ALL SELECT start, w, $t, node FROM w$t")
        .mkString("\n")
      s"""WITH ev AS (
         |  SELECT user_id, event_id,
         |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS node
         |  FROM events),
         |tr AS (
         |  SELECT node AS dst,
         |    lag(node) OVER (PARTITION BY user_id ORDER BY event_id) AS src
         |  FROM ev),
         |ed AS (
         |  SELECT src, dst FROM tr WHERE src IS NOT NULL
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |nbr AS MATERIALIZED (
         |  SELECT src, dst,
         |    row_number() OVER (PARTITION BY src ORDER BY dst) AS idx,
         |    count(*) OVER (PARTITION BY src) AS deg
         |  FROM ed),
         |seeds AS (
         |  SELECT DISTINCT node FROM (
         |    SELECT src AS node FROM ed UNION SELECT dst FROM ed)
         |  WHERE node % 20 = 0),
         |w0 AS MATERIALIZED (
         |  SELECT s.node AS start, r.w, s.node AS node
         |  FROM seeds s, range(1, 3) r(w)),
         |$stepCtes,
         |trail AS (
         |  SELECT start, w, 0 AS t, node FROM w0
         |$trailUnion)
         |SELECT start AS start_node, w AS walk_id,
         |  CAST(count(*) - 1 AS BIGINT) AS n_steps,
         |  string_agg(CAST(node AS VARCHAR), '->' ORDER BY t) AS path
         |FROM trail GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "q_importance_sample" ->
      """WITH t AS (
        |  SELECT source, text, len(string_split(text, ' ')) AS nt,
        |    ('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000 AS b
        |  FROM documents),
        |p AS (SELECT source, nt, b,
        |        CAST(least(nt, 128) AS DOUBLE) / 128.0 AS q
        |      FROM t),
        |k AS (SELECT source, count(*) AS n_kept,
        |        CAST(sum(nt) AS BIGINT) AS tok_kept
        |      FROM p WHERE b < floor(q * q * 1000000.0) GROUP BY 1),
        |a AS (SELECT source, count(*) AS n_docs FROM t GROUP BY 1)
        |SELECT a.source, a.n_docs,
        |  COALESCE(k.n_kept, 0) AS n_kept,
        |  COALESCE(k.tok_kept, 0) AS tok_kept
        |FROM a LEFT JOIN k USING (source) ORDER BY a.source""".stripMargin,

    "dedup_ppjoin" -> dedupPpjoinOracleSql,

    "q_outliers" ->
      """WITH t AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |m AS (SELECT event_type, count(*) AS n,
        |        CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS q
        |      FROM t GROUP BY 1),
        |f AS (
        |  SELECT t.event_type, m.n, t.v,
        |    (CAST(m.n AS HUGEINT) * t.v - m.s)
        |      * (CAST(m.n AS HUGEINT) * t.v - m.s)
        |      > 4 * (CAST(m.n AS HUGEINT) * m.q
        |             - CAST(m.s AS HUGEINT) * m.s) AS is_out
        |  FROM t JOIN m USING (event_type))
        |SELECT event_type, n,
        |  CAST(sum(CASE WHEN is_out THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  min(CASE WHEN is_out THEN v END) AS min_outlier,
        |  max(CASE WHEN is_out THEN v END) AS max_outlier
        |FROM f GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "q_mad_outliers" ->
      """WITH t AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
        |    l_orderkey * 10 + l_linenumber AS uid
        |  FROM lineitem),
        |m AS (
        |  SELECT x AS med FROM
        |    (SELECT x, row_number() OVER (ORDER BY x, uid) AS rk FROM t)
        |  WHERE rk = (SELECT (count(*) + 1) // 2 FROM t)),
        |d AS (SELECT t.x, t.uid, m.med, abs(t.x - m.med) AS dev FROM t, m),
        |md AS (
        |  SELECT dev AS mad FROM
        |    (SELECT dev, uid, row_number() OVER (ORDER BY dev, uid) AS rk
        |     FROM d)
        |  WHERE rk = (SELECT (count(*) + 1) // 2 FROM d))
        |SELECT d.med, md.mad, CAST(count(*) AS BIGINT) AS n_outliers,
        |  min(d.x) AS min_outlier, max(d.x) AS max_outlier
        |FROM d, md WHERE 2 * d.dev > 3 * md.mad
        |GROUP BY 1, 2""".stripMargin,

    "q_grouped_median" ->
      """WITH t AS (
        |  SELECT o_orderpriority AS g,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS x,
        |    o_orderkey AS uid
        |  FROM orders),
        |r AS (
        |  SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x, uid)
        |    AS rk FROM t),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1)
        |SELECT r.g, r.x AS med, n.n AS n
        |FROM r JOIN n USING (g) WHERE r.rk = (n.n + 1) // 2
        |ORDER BY g""".stripMargin,

    "q_gini" ->
      """WITH v AS (
        |  SELECT 'l_returnflag' AS col_name, l_returnflag AS v FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linestatus', l_linestatus FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
        |  FROM lineitem),
        |c AS (SELECT col_name, v, count(*) AS c FROM v GROUP BY 1, 2),
        |a AS (
        |  SELECT col_name, CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(max(c) AS BIGINT) AS top_count,
        |    sum(c * c) AS sum_c2
        |  FROM c GROUP BY 1)
        |SELECT col_name, n_rows, n_distinct, top_count,
        |  CAST(((n_rows * n_rows - sum_c2) * 1000000)
        |    // (n_rows * n_rows) AS BIGINT) AS gini_ppm
        |FROM a ORDER BY col_name""".stripMargin,

    "q_cooccur" ->
      """WITH t AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |sup AS (SELECT i, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1),
        |p AS (
        |  SELECT a.i AS i1, c.i AS i2, CAST(count(*) AS BIGINT) AS pair_cnt
        |  FROM t a JOIN t c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2)
        |SELECT p.i1, p.i2, p.pair_cnt, s1.cnt AS cnt_1, s2.cnt AS cnt_2,
        |  p.pair_cnt * 1000000 // s1.cnt AS conf12_ppm,
        |  p.pair_cnt * 1000000 // s2.cnt AS conf21_ppm
        |FROM p
        |JOIN sup s1 ON s1.i = p.i1
        |JOIN sup s2 ON s2.i = p.i2
        |ORDER BY p.pair_cnt DESC, p.i1, p.i2 LIMIT 20""".stripMargin,

    "q_triples" ->
      """WITH t AS (
        |  SELECT DISTINCT doc_id AS b, tok AS i FROM
        |    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |     FROM documents)),
        |tr AS (
        |  SELECT a.i AS i1, c.i AS i2, e.i AS i3,
        |    CAST(count(*) AS BIGINT) AS triple_cnt
        |  FROM t a
        |  JOIN t c ON a.b = c.b AND a.i < c.i
        |  JOIN t e ON a.b = e.b AND c.i < e.i
        |  GROUP BY 1, 2, 3 HAVING count(*) >= 50)
        |SELECT i1, i2, i3, triple_cnt FROM tr
        |ORDER BY triple_cnt DESC, i1, i2, i3 LIMIT 30""".stripMargin,

    "text_pmi" ->
      """WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS bigram
        |  FROM t),
        |bc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c_xy
        |       FROM g GROUP BY 1),
        |u AS (SELECT unnest(w) AS tok FROM t),
        |uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_t
        |       FROM u GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_big FROM g)
        |SELECT bc.bigram, bc.c_xy, u1.c_t AS c_1, u2.c_t AS c_2,
        |  bc.c_xy * n.n_big * 1000000 // (u1.c_t * u2.c_t) AS pmi_ppm
        |FROM bc
        |JOIN uc u1 ON u1.tok = string_split(bc.bigram, ' ')[1]
        |JOIN uc u2 ON u2.tok = string_split(bc.bigram, ' ')[2]
        |CROSS JOIN n
        |WHERE bc.c_xy >= 5
        |ORDER BY pmi_ppm DESC, bc.bigram LIMIT 30""".stripMargin,

    "q_scd2" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS o,
        |    CAST(round(value * 100) AS BIGINT) // 5000 AS tier
        |  FROM events WHERE event_type = 'purchase'),
        |ch AS (
        |  SELECT user_id, o, tier,
        |    lag(tier) OVER (PARTITION BY user_id ORDER BY o) AS prev_t,
        |    row_number() OVER (PARTITION BY user_id ORDER BY o) AS rn
        |  FROM e),
        |v AS (
        |  SELECT user_id, o, tier FROM ch
        |  WHERE rn = 1 OR tier IS DISTINCT FROM prev_t)
        |SELECT user_id, o // 1000 AS valid_from_us,
        |  lead(o) OVER (PARTITION BY user_id ORDER BY o) // 1000
        |    AS valid_to_us,
        |  tier,
        |  CAST(lead(o) OVER (PARTITION BY user_id ORDER BY o) IS NULL
        |    AS INTEGER) AS is_current
        |FROM v ORDER BY user_id, valid_from_us""".stripMargin,

    "q_fuzzy_join" ->
      """WITH t AS (
        |  SELECT c_custkey AS id, c_name AS s, substring(c_name, 1, 16) AS blk
        |  FROM customer),
        |keep AS (SELECT blk FROM t GROUP BY blk HAVING count(*) <= 10000),
        |k AS (SELECT t.* FROM t JOIN keep USING (blk))
        |SELECT a.id AS id_1, b.id AS id_2,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS edit_dist
        |FROM k a JOIN k b ON a.blk = b.blk AND a.id < b.id
        |WHERE levenshtein(a.s, b.s) <= 1
        |ORDER BY id_1, id_2""".stripMargin,

    "pipeline_er" ->
      """WITH RECURSIVE t AS (
        |  SELECT c_custkey AS id, c_name AS s, substring(c_name, 1, 16) AS blk
        |  FROM customer),
        |keep AS (SELECT blk FROM t GROUP BY blk HAVING count(*) <= 10000),
        |k AS (SELECT t.* FROM t JOIN keep USING (blk)),
        |p AS (
        |  SELECT a.id AS id_1, b.id AS id_2
        |  FROM k a JOIN k b ON a.blk = b.blk AND a.id < b.id
        |  WHERE levenshtein(a.s, b.s) <= 1),
        |e AS (
        |  SELECT id_1 AS rs, id_2 AS rt FROM p
        |  UNION SELECT id_2, id_1 FROM p),
        |reach(rs, rt) AS (
        |  SELECT rs, rt FROM e UNION SELECT rs, rs FROM e
        |  UNION SELECT r.rs, e.rt FROM reach r JOIN e ON r.rt = e.rs),
        |asg AS (SELECT rs AS id, min(rt) AS canonical_id FROM reach
        |        GROUP BY rs),
        |cs AS (SELECT canonical_id, CAST(count(*) AS BIGINT) AS cluster_size
        |       FROM asg GROUP BY 1)
        |SELECT a.id, a.canonical_id, c.cluster_size
        |FROM asg a JOIN cs c USING (canonical_id) ORDER BY a.id""".stripMargin,

    "q_equidepth" ->
      """WITH t AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    l_orderkey * 10 + l_linenumber AS uid
        |  FROM lineitem),
        |r AS (
        |  SELECT cents, row_number() OVER (ORDER BY cents, uid) AS rk,
        |    count(*) OVER () AS n FROM t)
        |SELECT (rk - 1) * 16 // n AS bucket,
        |  min(cents) AS lo, max(cents) AS hi,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // full q-digest replay: exact dyadic node counts, the canonical
    // partition (parent > T, self <= T or leaf), cumulative counts in
    // interval order, probe ranks by ceiling division — all exact
    // integers, so // and DIV agree (non-negative throughout)
    "q_qdigest_quantiles" ->
      """WITH v AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem),
        |leaf AS MATERIALIZED (
        |  SELECT v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1),
        |nodes AS MATERIALIZED (
        |  SELECT CAST(t.lev AS INTEGER) AS lev, v >> t.lev AS node,
        |    CAST(sum(c) AS BIGINT) AS cn
        |  FROM leaf, unnest(range(0, 26)) t(lev)
        |  GROUP BY 1, 2),
        |st AS MATERIALIZED (
        |  SELECT n, greatest(CAST(1 AS BIGINT), 10000 * n // 1000000) AS t
        |  FROM (SELECT CAST(max(cn) AS BIGINT) AS n FROM nodes
        |        WHERE lev = 25)),
        |dg AS MATERIALIZED (
        |  SELECT c.lev, c.node, c.cn
        |  FROM nodes c JOIN nodes p
        |    ON p.lev = c.lev + 1 AND p.node = c.node >> 1
        |  CROSS JOIN st
        |  WHERE p.cn > st.t AND (c.cn <= st.t OR c.lev = 0)
        |  UNION ALL
        |  SELECT lev, node, cn FROM nodes CROSS JOIN st
        |  WHERE lev = 25 AND cn <= st.t),
        |iv AS (
        |  SELECT lev, cn, node << lev AS v_lo,
        |    ((node + 1) << lev) - 1 AS v_hi
        |  FROM dg),
        |cum AS MATERIALIZED (
        |  SELECT v_lo, v_hi, cn,
        |    CAST(coalesce(sum(cn) OVER (ORDER BY v_lo
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_below
        |  FROM iv),
        |pr AS (SELECT CAST(unnest([10000, 250000, 500000, 750000, 990000])
        |         AS BIGINT) AS q_ppm),
        |r AS (SELECT q_ppm,
        |        greatest(CAST(1 AS BIGINT),
        |          CAST((CAST(q_ppm AS HUGEINT) * n + 999999) // 1000000
        |            AS BIGINT)) AS rk
        |      FROM pr CROSS JOIN st)
        |SELECT q_ppm, v_lo, v_hi, cum_below, cn AS cnt_in
        |FROM r JOIN cum ON cum_below < rk AND rk <= cum_below + cn
        |ORDER BY q_ppm""".stripMargin,

    "q_group_quantiles" ->
      """WITH t AS (
        |  SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    l_orderkey * 10 + l_linenumber AS uid
        |  FROM lineitem),
        |r AS (
        |  SELECT g, cents,
        |    CAST(row_number() OVER (PARTITION BY g ORDER BY cents, uid)
        |      AS BIGINT) AS rk,
        |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n_g
        |  FROM t),
        |q AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10),
        |        ('p99', 99, 100)) x(p, num, den))
        |SELECT g, p, rk AS target_rank, n_g, cents AS value_cents
        |FROM r CROSS JOIN q
        |WHERE rk = (n_g * num + den - 1) // den
        |ORDER BY g, p""".stripMargin,

    "text_url_canon" ->
      """WITH u AS (
        |  SELECT CASE CAST(c_custkey % 5 AS INT)
        |    WHEN 0 THEN 'HTTP://Shop.Example.COM:80/cat/' || c_mktsegment
        |      || '/?utm_source=ad&id=' || CAST(c_custkey % 40 AS VARCHAR)
        |      || '&b=2&a=1'
        |    WHEN 1 THEN 'http://shop.example.com/cat/' || c_mktsegment
        |      || '?a=1&b=2&id=' || CAST(c_custkey % 40 AS VARCHAR)
        |    WHEN 2 THEN 'https://Shop.Example.com:443/cat/' || c_mktsegment
        |      || '/#frag'
        |    WHEN 3 THEN 'https://shop.example.com:8443/cat/' || c_mktsegment
        |    ELSE 'http://shop.example.com/cat/' || c_mktsegment
        |      || '/?fbclid=xyz'
        |  END AS url FROM customer),
        |p1 AS (
        |  SELECT string_split(string_split(url, '#')[1], '?') AS parts
        |  FROM u),
        |p2 AS (
        |  SELECT parts[1] AS base,
        |    CASE WHEN len(parts) > 1 THEN parts[2] END AS rawq
        |  FROM p1),
        |p3 AS (
        |  SELECT rawq,
        |    lower(regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
        |      AS scheme,
        |    regexp_replace(base, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
        |  FROM p2),
        |p4 AS (SELECT *, string_split(rest, '/')[1] AS hostport FROM p3),
        |p5 AS (
        |  SELECT *, lower(string_split(hostport, ':')[1]) AS host,
        |    CASE WHEN len(string_split(hostport, ':')) > 1
        |      THEN string_split(hostport, ':')[2] END AS port,
        |    regexp_replace(substr(rest, length(hostport) + 1), '/$', '')
        |      AS path,
        |    CASE WHEN rawq IS NULL THEN NULL ELSE
        |      array_to_string(list_sort(list_filter(string_split(rawq, '&'),
        |        x -> NOT (x LIKE 'utm\_%' ESCAPE '\' OR x LIKE 'gclid%'
        |                  OR x LIKE 'fbclid%' OR x = ''))), '&') END AS sq
        |  FROM p4),
        |canon AS (
        |  SELECT scheme || '://' || host ||
        |    CASE WHEN port IS NOT NULL AND NOT
        |        ((scheme = 'http' AND port = '80') OR
        |         (scheme = 'https' AND port = '443'))
        |      THEN ':' || port ELSE '' END ||
        |    path ||
        |    CASE WHEN rawq IS NOT NULL AND sq <> '' THEN '?' || sq
        |      ELSE '' END AS canonical_url
        |  FROM p5)
        |SELECT canonical_url, count(*) AS n FROM canon
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_grid_quantiles" ->
      """WITH v AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |sk AS (SELECT cents // 1000000 AS bucket,
        |         CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
        |c AS (
        |  SELECT bucket, cnt,
        |    CAST(coalesce(sum(cnt) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS carry,
        |    CAST(sum(cnt) OVER () AS BIGINT) AS n_total
        |  FROM sk),
        |q AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p95', 19, 20),
        |        ('p99', 99, 100)) t(p, num, den)),
        |j AS (
        |  SELECT p, CAST((n_total * num + den - 1) // den AS BIGINT)
        |      AS target_rank, bucket, cnt, carry
        |  FROM c CROSS JOIN q)
        |SELECT p, target_rank, bucket * 1000000 AS est_lo,
        |  bucket * 1000000 + 999999 AS est_hi
        |FROM j WHERE carry < target_rank AND target_rank <= carry + cnt
        |ORDER BY target_rank""".stripMargin,

    "q_skyline" ->
      """WITH t AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
        |    0 - CAST(round(l_quantity) AS BIGINT) AS y
        |  FROM lineitem),
        |g AS (SELECT x, y, count(*) AS n_rows FROM t GROUP BY 1, 2),
        |m AS (
        |  SELECT x, y, n_rows,
        |    row_number() OVER (PARTITION BY x ORDER BY y) AS rk
        |  FROM g),
        |r AS (
        |  SELECT x, y, n_rows,
        |    min(y) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM m WHERE rk = 1)
        |SELECT x AS price_cents, CAST(-y AS BIGINT) AS quantity,
        |  CAST(n_rows AS BIGINT) AS n_rows
        |FROM r WHERE pm IS NULL OR y < pm ORDER BY price_cents""".stripMargin,

    "q_concurrency" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS t FROM events),
        |o AS (
        |  SELECT user_id, event_id, t,
        |    CASE WHEN lag(t) OVER w IS NULL
        |           OR t - lag(t) OVER w > 1800000000000 THEN 1 ELSE 0
        |    END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |sess AS (
        |  SELECT user_id, t,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o),
        |iv AS (
        |  SELECT min(t) AS s, max(t) + 1 AS e
        |  FROM sess GROUP BY user_id, sid),
        |d AS (
        |  SELECT s AS t, 1 AS d FROM iv
        |  UNION ALL SELECT e, -1 FROM iv),
        |r AS (
        |  SELECT t // 3600000000000 AS bucket, d,
        |    sum(d) OVER (ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS run
        |  FROM d)
        |SELECT bucket, CAST(max(run) AS BIGINT) AS max_concurrency,
        |  CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_ewma" ->
      """WITH e AS (
        |  SELECT user_id, event_id AS o, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT user_id, count(*) AS n_obs,
        |        list_sort(list({'o': o, 'v': v})) AS arr
        |      FROM e GROUP BY 1)
        |SELECT user_id, n_obs,
        |  list_reduce(arr, (a, b) -> {'o': b.o,
        |    'v': CAST(0.75 AS DOUBLE) * a.v + CAST(0.25 AS DOUBLE) * b.v}).v
        |    AS ewma
        |FROM g ORDER BY user_id""".stripMargin,

    "q_triangles" ->
      """WITH e AS (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS w
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2),
        |und AS (SELECT a, b FROM e WHERE w >= 2),
        |deg AS (SELECT v, count(*) AS deg FROM (
        |          SELECT a AS v FROM und UNION ALL SELECT b FROM und)
        |        GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN d1.deg < d2.deg
        |           OR (d1.deg = d2.deg AND und.a < und.b)
        |         THEN und.a ELSE und.b END AS lo,
        |         CASE WHEN d1.deg < d2.deg
        |           OR (d1.deg = d2.deg AND und.a < und.b)
        |         THEN und.b ELSE und.a END AS hi
        |  FROM und JOIN deg d1 ON d1.v = und.a JOIN deg d2 ON d2.v = und.b),
        |wx AS (
        |  SELECT e1.lo AS u, e1.hi AS x, e2.hi AS y
        |  FROM o e1 JOIN o e2 ON e1.lo = e2.lo AND e1.hi < e2.hi),
        |t AS (SELECT u, x, y FROM wx JOIN und c ON c.a = wx.x AND c.b = wx.y),
        |n AS (SELECT unnest([u, x, y]) AS node FROM t)
        |SELECT node, count(*) AS n_triangles FROM n GROUP BY 1
        |ORDER BY node""".stripMargin,

    "text_cdc" ->
      (cdcChunkSql + "\n" +
       """SELECT doc_id, CAST(len(spans) AS INTEGER) AS n_chunks,
        |  CAST(struct_extract(spans[1],'e') - struct_extract(spans[1],'s') + 1
        |       AS INTEGER) AS len_1,
        |  ('0x' || substr(md5(text[struct_extract(spans[1],'s') :
        |     struct_extract(spans[1],'e')]), 1, 15))::BIGINT AS hash_1,
        |  ('0x' || substr(md5(text[struct_extract(spans[-1],'s') :
        |     struct_extract(spans[-1],'e')]), 1, 15))::BIGINT AS hash_n
        |FROM ch ORDER BY doc_id""".stripMargin),

    "dedup_cdc" ->
      (cdcChunkSql + ",\n" +
       """e0 AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substr(md5(text[struct_extract(p,'s') :
        |       struct_extract(p,'e')]), 1, 15))::BIGINT AS fp
        |  FROM ch, unnest(spans) AS t(p)
        |  WHERE struct_extract(p,'e') - struct_extract(p,'s') + 1 >= 16),
        |df AS (SELECT fp, count(*) AS d FROM e0 GROUP BY 1),
        |e AS (SELECT e0.doc_id, e0.fp FROM e0 JOIN df USING (fp)
        |      WHERE df.d <= 200)
        |SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS n_shared
        |FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY id_1, id_2""".stripMargin),

    "dedup_decontaminate_report" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(w) - 4),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
        |      || ' ' || w[i+4])) AS g
        |  FROM toks WHERE len(w) >= 5),
        |bench AS (SELECT doc_id AS bench_id, unnest(g) AS gr FROM sh
        |          WHERE doc_id % 10 = 0),
        |cg AS (SELECT doc_id, unnest(g) AS gr FROM sh WHERE doc_id % 10 <> 0),
        |hits AS (SELECT bench_id, count(DISTINCT cg.doc_id) AS nd,
        |                count(*) AS ng
        |         FROM cg JOIN bench USING (gr) GROUP BY 1)
        |SELECT d.doc_id AS bench_id, COALESCE(h.nd, 0) AS n_docs_hit,
        |  COALESCE(h.ng, 0) AS n_gram_hits
        |FROM documents d LEFT JOIN hits h ON h.bench_id = d.doc_id
        |WHERE d.doc_id % 10 = 0 ORDER BY bench_id""".stripMargin,

    "dedup_substring" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    substring(md5(list_reduce(w[i:i+7], (a, b) -> a || ' ' || b)),
        |      1, 15) AS gh
        |  FROM w, unnest(range(1, len(w) - 6)) AS t(i)),
        |dup AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
        |sp AS (SELECT doc_id, pos AS s, pos + 8 AS e FROM g JOIN dup USING (gh)),
        |m AS (
        |  SELECT doc_id, s, e,
        |    max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM sp),
        |isl AS (
        |  SELECT doc_id, s, e,
        |    sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY s, e
        |        ROWS UNBOUNDED PRECEDING) AS island
        |  FROM m),
        |sl AS (
        |  SELECT doc_id, min(s) AS st, max(e) AS en
        |  FROM isl GROUP BY doc_id, island),
        |agg AS (
        |  SELECT doc_id, CAST(sum(en - st) AS BIGINT) AS dup_tokens,
        |    CAST(count(*) AS BIGINT) AS n_spans
        |  FROM sl GROUP BY doc_id)
        |SELECT w.doc_id AS id, CAST(len(w.w) AS BIGINT) AS n_words,
        |  COALESCE(a.dup_tokens, 0) AS dup_tokens,
        |  COALESCE(a.n_spans, 0) AS n_spans,
        |  COALESCE(a.dup_tokens, 0) * 1000000 // CAST(len(w.w) AS BIGINT)
        |    AS dup_ppm
        |FROM w LEFT JOIN agg a USING (doc_id) ORDER BY id""".stripMargin,

    "text_inverted_index" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |        generate_series(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1]))) AS token
        |      FROM t),
        |d AS (SELECT token, count(*) AS df FROM g GROUP BY 1),
        |p AS (SELECT token, list_sort(list(doc_id)) AS postings
        |      FROM g GROUP BY 1)
        |SELECT d.token, d.df,
        |  CASE WHEN d.df <= 40 THEN array_to_string(p.postings, ',')
        |       ELSE NULL END AS postings
        |FROM d JOIN p USING (token) ORDER BY d.token""".stripMargin,

    "text_normalize" ->
      """WITH dn AS (
        |  SELECT doc_id, replace(text, 'a', 'a' || chr(769)) AS denorm
        |  FROM documents)
        |SELECT doc_id, CAST(length(denorm) AS INTEGER) AS len_denorm,
        |  CAST(length(nfc_normalize(denorm)) AS INTEGER) AS len_nfc,
        |  ('0x' || substr(md5(nfc_normalize(denorm)), 1, 15))::BIGINT AS nfc_hash
        |FROM dn ORDER BY doc_id""".stripMargin,

    "q_token_drift" ->
      """WITH b AS (
        |  SELECT text,
        |    CASE WHEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 100 < 90
        |           THEN 'train'
        |         WHEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 100 < 95
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |tok AS (SELECT split, unnest(string_split(text, ' ')) AS token
        |        FROM b WHERE split IN ('train', 'val')),
        |cnt AS (SELECT token,
        |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM tok GROUP BY 1),
        |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
        |             CAST(sum(n_b) AS BIGINT) AS tb FROM cnt),
        |x AS (SELECT token, n_a, n_b,
        |    CAST(n_a AS DOUBLE) AS ca, CAST(n_b AS DOUBLE) AS cb,
        |    CAST(ta AS DOUBLE) AS tda, CAST(tb AS DOUBLE) AS tdb
        |  FROM cnt, t)
        |SELECT token, n_a, n_b,
        |  (((ca - (((ca + cb) * tda) / (tda + tdb)))
        |    * (ca - (((ca + cb) * tda) / (tda + tdb))))
        |   / (((ca + cb) * tda) / (tda + tdb)))
        |  + (((cb - (((ca + cb) * tdb) / (tda + tdb)))
        |    * (cb - (((ca + cb) * tdb) / (tda + tdb))))
        |   / (((ca + cb) * tdb) / (tda + tdb))) AS chi2_term
        |FROM x ORDER BY token""".stripMargin,

    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,

    "dedup_fingerprint" ->
      """SELECT doc_id, sha256(text) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_incremental" -> dedupIncrementalOracleSql,
    "dedup_incremental_idx" -> dedupIncrementalOracleSql,
    // merge: probe result over the APPENDED index must equal the same
    // exact replay — the oracle can't see which rows came via the append
    // path, so a green hash IS the append ≡ rebuild equivalence proof
    "dedup_incremental_merge" -> dedupIncrementalOracleSql,
    // compact: probe over the build→append→COMPACT index must ALSO equal
    // it — compaction is IO-only (zero shuffle, nothing recomputed), so
    // sharing the oracle makes that invariant driver-gated
    "dedup_incremental_compact" -> dedupIncrementalOracleSql,

    "dedup_minhash" -> dedupMinhashOracleSql,

    // brute-force window extraction: a position is duplicated iff its
    // 30-char substring occurs >= 2 times anywhere; runs coalesce via
    // gaps-and-islands. INTEGER casts match Spark's posexplode int offsets.
    "dedup_suffix" ->
      """WITH p AS MATERIALIZED (
        |  SELECT doc_id, i AS pos, substr(text, CAST(i + 1 AS INTEGER), 30) AS gram
        |  FROM documents,
        |       unnest(range(0, greatest(length(text) - 29, 0))) t(i)),
        |g AS MATERIALIZED (
        |  SELECT gram FROM p GROUP BY gram HAVING count(*) >= 2),
        |dup AS MATERIALIZED (
        |  SELECT doc_id, pos FROM p WHERE gram IN (SELECT gram FROM g)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN lag(pos) OVER w IS NULL OR pos - lag(pos) OVER w > 1
        |         THEN 1 ELSE 0 END AS brk
        |  FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |grp AS (
        |  SELECT doc_id, pos,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
        |  FROM isl)
        |SELECT doc_id AS id,
        |  CAST(min(pos) AS INTEGER) AS span_start,
        |  CAST(max(pos) + 30 AS INTEGER) AS span_end,
        |  CAST(max(pos) + 30 - min(pos) AS INTEGER) AS span_len
        |FROM grp GROUP BY doc_id, gid
        |ORDER BY id, span_start""".stripMargin,

    // full replay of the two-drain ingest: canonical survivors of phase A
    // (min-label closure over exact-Jaccard ≥ 0.5 pairs), then phase B's
    // own canonical survivors minus any with exact Jaccard ≥ 0.5 against
    // an INGESTED phase-A doc. sh is referenced by both phases and the
    // cross kill — MATERIALIZED, or DuckDB re-executes it per reference.
    // SHARED by the in-plan and indexed doors (streamDedupIngest /
    // streamDedupIngestIndexed): same checks in the same order, the only
    // difference is whether the corpus probe re-shingles the sink or
    // reads the persisted index — the SQL can't tell, so one replay
    // gates both.
    "w_stream_dedup_ingest" -> streamDedupIngestOracleSql,
    "w_stream_dedup_ingest_idx" -> streamDedupIngestOracleSql,


    "dedup_ngram" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, length(text) - 7),
        |    i -> text[i : i+7])) AS g
        |  FROM documents WHERE length(text) >= 8)
        |SELECT a.doc_id AS id_1, b.doc_id AS id_2,
        |  len(list_intersect(a.g, b.g)) /
        |    len(list_distinct(list_concat(a.g, b.g))) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.g, b.g)) /
        |    len(list_distinct(list_concat(a.g, b.g))) >= 0.6
        |ORDER BY id_1, id_2""".stripMargin,

    "dedup_containment" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |        generate_series(1, len(w) - 2),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS tkn
        |      FROM t WHERE len(w) >= 3),
        |keep AS (SELECT tkn FROM g GROUP BY tkn HAVING count(*) <= 200),
        |e AS (SELECT g.* FROM g JOIN keep USING (tkn)),
        |sz AS (SELECT doc_id, count(*) AS n FROM e GROUP BY 1),
        |sh AS (SELECT a.doc_id AS id_sub, b.doc_id AS id_super,
        |         count(*) AS ns
        |       FROM e a JOIN e b ON a.tkn = b.tkn AND a.doc_id <> b.doc_id
        |       GROUP BY 1, 2)
        |SELECT id_sub, id_super, CAST(ns AS DOUBLE) / sz.n AS containment
        |FROM sh JOIN sz ON sz.doc_id = sh.id_sub
        |WHERE CAST(ns AS DOUBLE) / sz.n >= 0.7
        |ORDER BY id_sub, id_super""".stripMargin,

    "dedup_canonical" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(w) - 2),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |  FROM toks WHERE len(w) >= 3),
        |p AS (
        |  SELECT a.doc_id AS id_1, b.doc_id AS id_2
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.g, b.g)) /
        |      len(list_distinct(list_concat(a.g, b.g))) >= 0.5),
        |e AS (
        |  SELECT id_1 AS s, id_2 AS t FROM p
        |  UNION SELECT id_2, id_1 FROM p),
        |reach(s, t) AS (
        |  SELECT s, t FROM e UNION SELECT s, s FROM e
        |  UNION SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s)
        |SELECT s AS id, min(t) AS canonical_id FROM reach
        |GROUP BY s ORDER BY id""".stripMargin,

    "q_split_leakage_safe" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(w) - 2),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |  FROM toks WHERE len(w) >= 3),
        |p AS (
        |  SELECT a.doc_id AS id_1, b.doc_id AS id_2
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.g, b.g)) /
        |      len(list_distinct(list_concat(a.g, b.g))) >= 0.5),
        |e AS (
        |  SELECT id_1 AS s, id_2 AS t FROM p
        |  UNION SELECT id_2, id_1 FROM p),
        |reach(s, t) AS (
        |  SELECT s, t FROM e UNION SELECT s, s FROM e
        |  UNION SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s),
        |asg AS (SELECT s AS doc_id, min(t) AS canonical_id FROM reach
        |        GROUP BY s),
        |rep AS (
        |  SELECT d.doc_id, coalesce(a.canonical_id, d.doc_id) AS rep
        |  FROM documents d LEFT JOIN asg a USING (doc_id))
        |SELECT doc_id, rep,
        |  CASE WHEN ('0x' || substr(md5(CAST(rep AS VARCHAR)), 1, 15))::BIGINT
        |           % 100 < 90 THEN 'train'
        |       WHEN ('0x' || substr(md5(CAST(rep AS VARCHAR)), 1, 15))::BIGINT
        |           % 100 < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM rep ORDER BY doc_id""".stripMargin,

    // Radius-2 variant: same signature replay as dedup_simhash_md5, bound
    // tightened to hamming ≤ 2 — the two radii together pin the pigeonhole
    // chunking arithmetic (3 vs 4 chunks over the 60-bit signature).
    "dedup_simhash" ->
      """WITH t AS (
        |  SELECT doc_id, list_transform(string_split(text, ' '),
        |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(generate_series(0, 59),
        |      b -> CASE WHEN 2 * len(list_filter(hs, h -> ((h >> b) & 1) = 1)) > len(hs)
        |           THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS sig
        |  FROM t)
        |SELECT a.doc_id AS id_1, b.doc_id AS id_2,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 2
        |ORDER BY id_1, id_2""".stripMargin,

    "dedup_simhash_md5" ->
      """WITH t AS (
        |  SELECT doc_id, list_transform(string_split(text, ' '),
        |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(generate_series(0, 59),
        |      b -> CASE WHEN 2 * len(list_filter(hs, h -> ((h >> b) & 1) = 1)) > len(hs)
        |           THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS sig
        |  FROM t)
        |SELECT a.doc_id AS id_1, b.doc_id AS id_2,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3
        |ORDER BY id_1, id_2""".stripMargin,

    "dedup_embcos" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT DISTINCT least(a.vec_id, b.vec_id) AS id_1,
        |  greatest(a.vec_id, b.vec_id) AS id_2,
        |  list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        |    AS cosine
        |FROM e a JOIN e b ON a.vec_id < 100 AND a.vec_id <> b.vec_id
        |WHERE list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        |    >= 0.3
        |ORDER BY id_1, id_2""".stripMargin,

    "q_embed_centroids" ->
      """WITH x AS (
        |  SELECT label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings, generate_series(1, 8) t(i))
        |SELECT label, CAST(pos AS INTEGER) AS pos, count(*) AS n,
        |  list_reduce(list_prepend(0.0, list_sort(list(x))),
        |    (a, b) -> a + b) AS sum_c,
        |  list_reduce(list_prepend(0.0, list_sort(list(x))),
        |    (a, b) -> a + b) / count(*) AS mean_c
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "sim_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        |s AS (
        |  SELECT query_id, e.vec_id AS neighbor_id,
        |    list_dot_product(qv, e.v) /
        |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.v, e.v)))
        |      AS score
        |  FROM q JOIN e ON e.vec_id <> query_id),
        |r AS (
        |  SELECT query_id, neighbor_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM s)
        |SELECT query_id, neighbor_id, rank, score FROM r
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // Learned-ANN recall contracts: DuckDB derives the query-set size and
    // the declared constants, and asserts the macro-recall boolean — the
    // learned routing/codebooks stay in-plan (see recallAuditSummary).
    "sim_ivf_topk" ->
      """SELECT count(*) AS n_queries, CAST(5 AS INTEGER) AS k,
        |  CAST(600000 AS BIGINT) AS recall_floor_ppm, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5""".stripMargin,

    "sim_pq_topk" ->
      """SELECT count(*) AS n_queries, CAST(5 AS INTEGER) AS k,
        |  CAST(480000 AS BIGINT) AS recall_floor_ppm, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5""".stripMargin,

    "sim_ivfpq_topk" ->
      """SELECT count(*) AS n_queries, CAST(5 AS INTEGER) AS k,
        |  CAST(480000 AS BIGINT) AS recall_floor_ppm, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5""".stripMargin,

    "q_power_iteration" -> powerIterationOracle(dims = 16, rounds = 8,
      scale = 1000000L),

    "q_knn_classify" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv, label AS true_label
        |      FROM e WHERE vec_id < 25),
        |c AS (SELECT vec_id, v, label FROM e WHERE vec_id >= 25),
        |sc AS (
        |  SELECT query_id, c.vec_id AS neighbor_id, c.label,
        |    list_dot_product(qv, c.v) /
        |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v)))
        |      AS score
        |  FROM q CROSS JOIN c),
        |r AS (
        |  SELECT query_id, label,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, neighbor_id) AS rnk
        |  FROM sc),
        |v AS (
        |  SELECT query_id, label, CAST(count(*) AS BIGINT) AS votes
        |  FROM r WHERE rnk <= 10 GROUP BY 1, 2),
        |p AS (
        |  SELECT query_id, label AS pred_label, votes FROM (
        |    SELECT query_id, label, votes,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY votes DESC, label) AS rn
        |    FROM v) WHERE rn = 1)
        |SELECT q.query_id, q.true_label, p.pred_label, p.votes,
        |  (p.pred_label = q.true_label) AS correct
        |FROM q JOIN p USING (query_id) ORDER BY query_id""".stripMargin,

    "text_search_topk" ->
      """WITH corpus AS (
        |  SELECT doc_id, string_split(text, ' ') AS w,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |          CAST(sum(dl) AS BIGINT) AS sum_dl FROM corpus),
        |qt AS (SELECT * FROM (VALUES
        |  (1, 'spark'), (1, 'table'), (2, 'query'), (2, 'data'),
        |  (2, 'join'), (3, 'dup'), (3, 'stream')) AS t(query_id, term)),
        |post AS (
        |  SELECT doc_id, dl, tok AS term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, dl, unnest(w) AS tok FROM corpus)
        |  WHERE tok IN (SELECT DISTINCT term FROM qt)
        |  GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df_t
        |          FROM post GROUP BY 1),
        |sc AS (
        |  SELECT doc_id, term,
        |    CAST((CAST(1000000 AS HUGEINT) * 22 * tf * sum_dl *
        |            (2 * n_docs - 2 * df_t + 1))
        |         // (CAST(10 AS HUGEINT) * tf * sum_dl + 3 * sum_dl +
        |              9 * dl * n_docs)
        |         // (2 * df_t + 1) AS BIGINT) AS score_t
        |  FROM post JOIN dfreq USING (term) CROSS JOIN tot),
        |agg AS (
        |  SELECT query_id, doc_id, CAST(sum(score_t) AS BIGINT) AS score_scaled
        |  FROM sc JOIN qt USING (term) GROUP BY 1, 2),
        |r AS (
        |  SELECT query_id, doc_id, score_scaled,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score_scaled DESC, doc_id) AS INTEGER) AS rank
        |  FROM agg)
        |SELECT query_id, doc_id, rank, score_scaled FROM r
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "sim_lsh_topk" -> lshTopKOracle,

    "sim_lsh_mp_topk" -> lshMultiProbeOracle,

    "sim_pq_det_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cb AS (
        |  SELECT s.j AS subspace, CAST(e.vec_id AS INTEGER) AS cell,
        |    e.v[s.j*8+1 : s.j*8+8] AS c,
        |    list_dot_product(e.v[s.j*8+1 : s.j*8+8],
        |                     e.v[s.j*8+1 : s.j*8+8]) AS cnorm2
        |  FROM e CROSS JOIN generate_series(0, 7) s(j)
        |  WHERE e.vec_id < 16),
        |enc AS (
        |  SELECT vec_id, subspace, cell, cnorm2 FROM (
        |    SELECT e.vec_id, cb.subspace, cb.cell, cb.cnorm2,
        |      row_number() OVER (PARTITION BY e.vec_id, cb.subspace
        |        ORDER BY 2.0 * list_dot_product(
        |            e.v[cb.subspace*8+1 : cb.subspace*8+8], cb.c) - cb.cnorm2
        |          DESC,
        |        cb.cell ASC) AS rn
        |    FROM e CROSS JOIN cb)
        |  WHERE rn = 1),
        |n2 AS (
        |  SELECT vec_id AS neighbor_id,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list({'s': subspace, 'v': cnorm2})),
        |      x -> struct_extract(x, 'v'))), (a, b) -> a + b) AS norm2
        |  FROM enc GROUP BY 1),
        |q AS (SELECT vec_id AS query_id, v,
        |        sqrt(list_dot_product(v, v)) AS qnorm
        |      FROM e WHERE vec_id < 5),
        |qd AS (
        |  SELECT q.query_id, cb.subspace, cb.cell,
        |    list_dot_product(q.v[cb.subspace*8+1 : cb.subspace*8+8], cb.c)
        |      AS qdot
        |  FROM q CROSS JOIN cb),
        |ad AS (
        |  SELECT qd.query_id, enc.vec_id AS neighbor_id,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list({'s': qd.subspace, 'v': qd.qdot})),
        |      x -> struct_extract(x, 'v'))), (a, b) -> a + b) AS adot
        |  FROM enc
        |  JOIN qd ON qd.subspace = enc.subspace AND qd.cell = enc.cell
        |  WHERE enc.vec_id <> qd.query_id
        |  GROUP BY 1, 2),
        |sc AS (
        |  SELECT ad.query_id, ad.neighbor_id,
        |    CASE WHEN n2.norm2 > 0.0 AND q.qnorm > 0.0
        |         THEN ad.adot / (q.qnorm * sqrt(n2.norm2)) ELSE 0.0 END
        |      AS score
        |  FROM ad
        |  JOIN n2 USING (neighbor_id)
        |  JOIN q ON q.query_id = ad.query_id),
        |r AS (
        |  SELECT query_id, neighbor_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM sc)
        |SELECT query_id, neighbor_id, rank, score FROM r
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "sim_ivfpq_det_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cb AS (
        |  SELECT s.j AS subspace, CAST(e.vec_id AS INTEGER) AS cell,
        |    e.v[s.j*8+1 : s.j*8+8] AS c,
        |    list_dot_product(e.v[s.j*8+1 : s.j*8+8],
        |                     e.v[s.j*8+1 : s.j*8+8]) AS cnorm2
        |  FROM e CROSS JOIN generate_series(0, 7) s(j)
        |  WHERE e.vec_id < 16),
        |enc AS (
        |  SELECT vec_id, subspace, cell, cnorm2 FROM (
        |    SELECT e.vec_id, cb.subspace, cb.cell, cb.cnorm2,
        |      row_number() OVER (PARTITION BY e.vec_id, cb.subspace
        |        ORDER BY 2.0 * list_dot_product(
        |            e.v[cb.subspace*8+1 : cb.subspace*8+8], cb.c) - cb.cnorm2
        |          DESC,
        |        cb.cell ASC) AS rn
        |    FROM e CROSS JOIN cb)
        |  WHERE rn = 1),
        |n2 AS (
        |  SELECT vec_id AS neighbor_id,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list({'s': subspace, 'v': cnorm2})),
        |      x -> struct_extract(x, 'v'))), (a, b) -> a + b) AS norm2
        |  FROM enc GROUP BY 1),
        |ic AS (SELECT vec_id AS icell, v AS iv FROM e WHERE vec_id < 16),
        |asn AS (
        |  SELECT vec_id AS neighbor_id, icell FROM (
        |    SELECT e.vec_id, ic.icell,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(e.v, ic.iv) /
        |          (sqrt(list_dot_product(e.v, e.v)) *
        |           sqrt(list_dot_product(ic.iv, ic.iv))) DESC,
        |        ic.icell ASC) AS rn
        |    FROM e CROSS JOIN ic)
        |  WHERE rn = 1),
        |pb AS (
        |  SELECT vec_id AS query_id, icell FROM (
        |    SELECT e.vec_id, ic.icell,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(e.v, ic.iv) /
        |          (sqrt(list_dot_product(e.v, e.v)) *
        |           sqrt(list_dot_product(ic.iv, ic.iv))) DESC,
        |        ic.icell ASC) AS rn
        |    FROM e CROSS JOIN ic
        |    WHERE e.vec_id < 5)
        |  WHERE rn <= 4),
        |q AS (SELECT vec_id AS query_id, v,
        |        sqrt(list_dot_product(v, v)) AS qnorm
        |      FROM e WHERE vec_id < 5),
        |qd AS (
        |  SELECT q.query_id, cb.subspace, cb.cell,
        |    list_dot_product(q.v[cb.subspace*8+1 : cb.subspace*8+8], cb.c)
        |      AS qdot
        |  FROM q CROSS JOIN cb),
        |ad AS (
        |  SELECT qd.query_id, enc.vec_id AS neighbor_id,
        |    list_reduce(list_prepend(0.0, list_transform(
        |      list_sort(list({'s': qd.subspace, 'v': qd.qdot})),
        |      x -> struct_extract(x, 'v'))), (a, b) -> a + b) AS adot
        |  FROM enc
        |  JOIN qd ON qd.subspace = enc.subspace AND qd.cell = enc.cell
        |  JOIN asn ON asn.neighbor_id = enc.vec_id
        |  JOIN pb ON pb.query_id = qd.query_id AND pb.icell = asn.icell
        |  WHERE enc.vec_id <> qd.query_id
        |  GROUP BY 1, 2),
        |sc AS (
        |  SELECT ad.query_id, ad.neighbor_id,
        |    CASE WHEN n2.norm2 > 0.0 AND q.qnorm > 0.0
        |         THEN ad.adot / (q.qnorm * sqrt(n2.norm2)) ELSE 0.0 END
        |      AS score
        |  FROM ad
        |  JOIN n2 USING (neighbor_id)
        |  JOIN q ON q.query_id = ad.query_id),
        |r AS (
        |  SELECT query_id, neighbor_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM sc)
        |SELECT query_id, neighbor_id, rank, score FROM r
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "sim_ivf_det_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16),
        |asn AS (
        |  SELECT vec_id AS neighbor_id, cell FROM (
        |    SELECT e.vec_id, c.cell,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(e.v, c.cv) /
        |          (sqrt(list_dot_product(e.v, e.v)) *
        |           sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |        c.cell ASC) AS rn
        |    FROM e CROSS JOIN c)
        |  WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, cell FROM (
        |    SELECT e.vec_id, c.cell,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(e.v, c.cv) /
        |          (sqrt(list_dot_product(e.v, e.v)) *
        |           sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |        c.cell ASC) AS rn
        |    FROM e CROSS JOIN c
        |    WHERE e.vec_id < 5)
        |  WHERE rn <= 4),
        |s AS (
        |  SELECT p.query_id, a.neighbor_id,
        |    list_dot_product(q.v, n.v) /
        |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v)))
        |      AS score
        |  FROM probes p
        |  JOIN asn a USING (cell)
        |  JOIN e q ON q.vec_id = p.query_id
        |  JOIN e n ON n.vec_id = a.neighbor_id
        |  WHERE a.neighbor_id <> p.query_id),
        |r AS (
        |  SELECT query_id, neighbor_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM s)
        |SELECT query_id, neighbor_id, rank, score FROM r
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "dedup_semantic" -> semanticDedupOracle,

    // Full replay of the seeded-IVF dedup route: anchor cells are the
    // first gate-pinned ncells=8 vectors (OracleCouplingSpec pins
    // ivfCellCount(gateEmbeddingCount)=8); assignment = top-2 cells by
    // (score DESC, cell ASC) — identical to the Spark (-score, cell)
    // struct sort; candidates = within-cell self-join; verification =
    // the same double-cosine expression as dedup_embcos.
    "dedup_semantic_ivf" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8),
        |sc AS (
        |  SELECT e.vec_id AS id, c.cell,
        |    list_dot_product(e.v, c.cv) /
        |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        |      AS score
        |  FROM e CROSS JOIN c),
        |r AS (
        |  SELECT id, cell, row_number() OVER (PARTITION BY id
        |    ORDER BY score DESC, cell ASC) AS rk FROM sc),
        |asg AS (SELECT id, cell FROM r WHERE rk <= 2),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_1, b.id AS id_2
        |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.id < b.id)
        |SELECT cand.id_1, cand.id_2,
        |  list_dot_product(x.v, y.v) /
        |    (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
        |    AS cosine
        |FROM cand JOIN e x ON x.vec_id = cand.id_1
        |  JOIN e y ON y.vec_id = cand.id_2
        |WHERE list_dot_product(x.v, y.v) /
        |    (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
        |    >= 0.4
        |ORDER BY id_1, id_2""".stripMargin,

    "q_heavy_hitters" -> heavyHittersOracle,

    // Full replay of the seeded TWO-LEVEL IVF route: 16 anchor cells
    // (vec_id < 16), 4 seeded groups (every 4th anchor, grp = cell/4);
    // cg = cell→group cosine argmax (ties to the lowest group — the
    // strict-`>` index-order scan in Similarity.assignToGroups); pg =
    // top-2 probed groups per vector (same tie rule, level 1 of
    // IvfRouteCellsTwoLevel); asg = top-2 cells by (score DESC, cell ASC)
    // restricted to cells inside probed groups (level 2; ties by ORIGINAL
    // cell id). Candidates and verification are the shared flat-route
    // expressions.
    "dedup_semantic_ivf2" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16),
        |g AS (SELECT CAST(cell / 4 AS BIGINT) AS grp, cv AS gv
        |      FROM c WHERE cell % 4 = 0),
        |cg AS (
        |  SELECT cell, grp FROM (
        |    SELECT c.cell, g.grp,
        |      row_number() OVER (PARTITION BY c.cell ORDER BY
        |        list_dot_product(c.cv, g.gv) /
        |          (sqrt(list_dot_product(c.cv, c.cv)) *
        |           sqrt(list_dot_product(g.gv, g.gv))) DESC,
        |        g.grp ASC) AS rn
        |    FROM c CROSS JOIN g)
        |  WHERE rn = 1),
        |pg AS (
        |  SELECT vec_id, grp FROM (
        |    SELECT e.vec_id, g.grp,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(e.v, g.gv) /
        |          (sqrt(list_dot_product(e.v, e.v)) *
        |           sqrt(list_dot_product(g.gv, g.gv))) DESC,
        |        g.grp ASC) AS rn
        |    FROM e CROSS JOIN g)
        |  WHERE rn <= 2),
        |asg AS (
        |  SELECT id, cell FROM (
        |    SELECT e.vec_id AS id, cc.cell,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(e.v, cc.cv) /
        |          (sqrt(list_dot_product(e.v, e.v)) *
        |           sqrt(list_dot_product(cc.cv, cc.cv))) DESC,
        |        cc.cell ASC) AS rn
        |    FROM e
        |    JOIN pg ON pg.vec_id = e.vec_id
        |    JOIN cg ON cg.grp = pg.grp
        |    JOIN c cc ON cc.cell = cg.cell)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_1, b.id AS id_2
        |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.id < b.id)
        |SELECT cand.id_1, cand.id_2,
        |  list_dot_product(x.v, y.v) /
        |    (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
        |    AS cosine
        |FROM cand JOIN e x ON x.vec_id = cand.id_1
        |  JOIN e y ON y.vec_id = cand.id_2
        |WHERE list_dot_product(x.v, y.v) /
        |    (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
        |    >= 0.4
        |ORDER BY id_1, id_2""".stripMargin,

    // Coherence audit replay: top-1 cell per vector under the same seeded
    // anchors (score DESC, cell ASC — IvfRouteCells' tie discipline),
    // then the integer-exact mean: floor(score·10⁶) per row, BIGINT sum,
    // integer floor compare. No float aggregate crosses the gate.
    "dedup_semantic_ivf_coh" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16),
        |sc AS (
        |  SELECT e.vec_id,
        |    list_dot_product(e.v, c.cv) /
        |      (sqrt(list_dot_product(e.v, e.v)) *
        |       sqrt(list_dot_product(c.cv, c.cv))) AS score,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, c.cv) /
        |        (sqrt(list_dot_product(e.v, e.v)) *
        |         sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |      c.cell ASC) AS rn
        |  FROM e CROSS JOIN c),
        |t AS (SELECT CAST(floor(score * 1000000.0) AS BIGINT) AS cos_u
        |      FROM sc WHERE rn = 1)
        |SELECT count(*) AS n_routed,
        |  CAST(sum(cos_u) AS BIGINT) AS sum_cos_u,
        |  CAST(200000 AS BIGINT) AS coherence_floor_ppm,
        |  (CAST(sum(cos_u) AS BIGINT) >= 200000 * count(*)) AS coherent
        |FROM t""".stripMargin,

    "dedup_semantic_incr" -> semanticIncrOracle,

    // Full replay of the persisted-index probe: both sides route through
    // the SAME stored seeded anchors (first 8 corpus ids), candidates are
    // the shared-cell join, verification the shared cosine expression.
    // Shared with dedup_semantic_ivf_merge: a probe over the
    // delta-APPENDED index must equal this replay over the full corpus —
    // the SQL can't see which rows arrived via the append path, so the
    // shared oracle is the append ≡ rebuild equivalence proof.
    "dedup_semantic_ivf_incr" -> semanticIvfIncrOracleSql,
    "dedup_semantic_ivf_merge" -> semanticIvfIncrOracleSql,

    // Deep-probe replay: identical to the symmetric probe oracle except
    // the BATCH side keeps its top-4 cells (rk <= 4) while the corpus
    // side stays at the index's nassign=2 — the query-side asymmetry is
    // exactly one changed rank bound, which is the point: storage cost
    // untouched, search depth a per-query dial.
    "dedup_semantic_ivf_deep" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |corp AS (SELECT * FROM e WHERE vec_id % 10 <> 0),
        |newb AS (SELECT * FROM e WHERE vec_id % 10 = 0),
        |c AS (SELECT vec_id AS cell, v AS cv FROM corp
        |      ORDER BY vec_id LIMIT 8),
        |sc AS (
        |  SELECT s.vec_id AS id, s.side, c.cell,
        |    list_dot_product(s.v, c.cv) /
        |      (sqrt(list_dot_product(s.v, s.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        |      AS score
        |  FROM (SELECT vec_id, v, 'c' AS side FROM corp
        |        UNION ALL SELECT vec_id, v, 'n' AS side FROM newb) s
        |  CROSS JOIN c),
        |r AS (
        |  SELECT id, side, cell, row_number() OVER (PARTITION BY id, side
        |    ORDER BY score DESC, cell ASC) AS rk FROM sc),
        |ac AS (SELECT id, cell FROM r WHERE side = 'c' AND rk <= 2),
        |an AS (SELECT id, cell FROM r WHERE side = 'n' AND rk <= 4),
        |cand AS (
        |  SELECT DISTINCT n.id AS id_new, k.id AS id_corpus
        |  FROM an n JOIN ac k ON n.cell = k.cell AND n.id <> k.id)
        |SELECT cand.id_new, cand.id_corpus,
        |  list_dot_product(x.v, y.v) /
        |    (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
        |    AS cosine
        |FROM cand JOIN e x ON x.vec_id = cand.id_new
        |  JOIN e y ON y.vec_id = cand.id_corpus
        |WHERE list_dot_product(x.v, y.v) /
        |    (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
        |    >= 0.4
        |ORDER BY id_new, id_corpus""".stripMargin,

    // Scale-indexed recall-gate replay: DuckDB independently re-derives
    // every input to the verdict — n, the stratum modulus
    // greatest(1, n // 2000), the piecewise floor (the SQL form of
    // Similarity.ivfPairRecallFloorPpm), the seeded cell COUNT (the SQL
    // form of Similarity.ivfCellCount: least(65536, greatest(8,
    // ⌈n/64⌉)) — derived, not the former hardcoded 8, so a fixture-scale
    // change moves both engines together; round-14 advice), exact
    // stratum truth (brute-force cosines over pairs with ≥1 stratum
    // endpoint), the seeded flat routing (dedup_semantic_ivf's asg
    // replay — the gate scale resolves below the 512-cell two-level
    // knee, so flat IS the shipped posture here; past the knee the
    // replay diverges LOUDLY by hash, never silently), the verified
    // found count, and the integer cross-multiply — so a green hash
    // certifies the CONTRACT, not just the counts.
    "dedup_semantic_ivf_recall" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |par AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    greatest(CAST(1 AS BIGINT), CAST(count(*) // 2000 AS BIGINT)) AS m,
        |    least(CAST(65536 AS BIGINT), greatest(CAST(8 AS BIGINT),
        |      CAST((count(*) + 63) // 64 AS BIGINT))) AS nc,
        |    CAST(CASE WHEN count(*) <= 1000 THEN 450000
        |              WHEN count(*) <= 4000 THEN 250000
        |              WHEN count(*) <= 30000 THEN 100000
        |              ELSE 60000 END AS BIGINT) AS fl
        |  FROM e),
        |truth AS (
        |  SELECT CAST(count(*) AS BIGINT) AS truth_pairs
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id CROSS JOIN par
        |  WHERE (a.vec_id % par.m = 0 OR b.vec_id % par.m = 0)
        |    AND list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        |      >= 0.4),
        |c AS (SELECT vec_id AS cell, v AS cv FROM e CROSS JOIN par
        |      WHERE vec_id < par.nc),
        |sc AS (
        |  SELECT e.vec_id AS id, c.cell,
        |    list_dot_product(e.v, c.cv) /
        |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        |      AS score
        |  FROM e CROSS JOIN c),
        |r AS (
        |  SELECT id, cell, row_number() OVER (PARTITION BY id
        |    ORDER BY score DESC, cell ASC) AS rk FROM sc),
        |asg AS (SELECT id, cell FROM r WHERE rk <= 2),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_1, b.id AS id_2
        |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.id < b.id),
        |found AS (
        |  SELECT CAST(count(*) AS BIGINT) AS found_pairs
        |  FROM cand JOIN e x ON x.vec_id = cand.id_1
        |    JOIN e y ON y.vec_id = cand.id_2 CROSS JOIN par
        |  WHERE (cand.id_1 % par.m = 0 OR cand.id_2 % par.m = 0)
        |    AND list_dot_product(x.v, y.v) /
        |      (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
        |      >= 0.4)
        |SELECT par.n AS n, par.m AS probe_modulus, truth.truth_pairs,
        |  found.found_pairs, par.fl AS recall_floor_ppm,
        |  (found.found_pairs * 1000000 >= par.fl * truth.truth_pairs)
        |    AS recall_ok
        |FROM par CROSS JOIN truth CROSS JOIN found""".stripMargin,

    // Operating-regime (τ=0.8 clustered) recall-gate replay: DuckDB
    // re-derives the clustered VIEW itself (member = center_(id mod k) +
    // 0.2·self — list_zip/list_transform double arithmetic, bit-equal to
    // Spark's zip_with), k = greatest(1, base_n // 20), the seeded cell
    // count from the BASE corpus (ivfCellCount in SQL), the view-sized
    // stratum modulus, exact τ=0.8 stratum truth over the view, the
    // seeded flat routing over view vectors, the verified found count,
    // and the constant 0.95 floor's integer cross-multiply. As with the
    // τ=0.4 gate, the flat replay is the shipped posture at every scale
    // the oracle runs (cell count below the 512 two-level knee); past it
    // the hash diverges loudly.
    "dedup_semantic_ivf_recall08" ->
      """WITH e0 AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS sv FROM embeddings),
        |bp AS (
        |  SELECT greatest(CAST(1 AS BIGINT),
        |      CAST(count(*) // 20 AS BIGINT)) AS k,
        |    least(CAST(65536 AS BIGINT), greatest(CAST(8 AS BIGINT),
        |      CAST((count(*) + 63) // 64 AS BIGINT))) AS nc
        |  FROM e0),
        |ctr AS (SELECT e0.vec_id AS cid, e0.sv AS cv
        |        FROM e0 CROSS JOIN bp WHERE e0.vec_id < bp.k),
        |e AS (
        |  SELECT e0.vec_id,
        |    list_transform(list_zip(ctr.cv, e0.sv),
        |      p -> p[1] + CAST(0.2 AS DOUBLE) * p[2]) AS v
        |  FROM e0 CROSS JOIN bp
        |  JOIN ctr ON ctr.cid = e0.vec_id % bp.k),
        |par AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    greatest(CAST(1 AS BIGINT), CAST(count(*) // 2000 AS BIGINT)) AS m
        |  FROM e),
        |truth AS (
        |  SELECT CAST(count(*) AS BIGINT) AS truth_pairs
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id CROSS JOIN par
        |  WHERE (a.vec_id % par.m = 0 OR b.vec_id % par.m = 0)
        |    AND list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        |      >= 0.8),
        |c AS (SELECT e.vec_id AS cell, e.v AS cv2 FROM e CROSS JOIN bp
        |      WHERE e.vec_id < bp.nc),
        |sc AS (
        |  SELECT e.vec_id AS id, c.cell,
        |    list_dot_product(e.v, c.cv2) /
        |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv2, c.cv2)))
        |      AS score
        |  FROM e CROSS JOIN c),
        |r AS (
        |  SELECT id, cell, row_number() OVER (PARTITION BY id
        |    ORDER BY score DESC, cell ASC) AS rk FROM sc),
        |asg AS (SELECT id, cell FROM r WHERE rk <= 2),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_1, b.id AS id_2
        |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.id < b.id),
        |found AS (
        |  SELECT CAST(count(*) AS BIGINT) AS found_pairs
        |  FROM cand JOIN e x ON x.vec_id = cand.id_1
        |    JOIN e y ON y.vec_id = cand.id_2 CROSS JOIN par
        |  WHERE (cand.id_1 % par.m = 0 OR cand.id_2 % par.m = 0)
        |    AND list_dot_product(x.v, y.v) /
        |      (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
        |      >= 0.8)
        |SELECT par.n AS n, par.m AS probe_modulus, truth.truth_pairs,
        |  found.found_pairs, CAST(950000 AS BIGINT) AS recall_floor_ppm,
        |  (found.found_pairs * 1000000 >= 950000 * truth.truth_pairs)
        |    AS recall_ok
        |FROM par CROSS JOIN truth CROSS JOIN found""".stripMargin,

    // Staleness-audit replay: the index quantizer is the first 8 corpus
    // ids, the fresh quantizer the first 8 batch ids (both seeded-anchor
    // form). bridge = fresh→index cosine argmax (assignToGroups' strict->
    // index-order scan ⇒ score DESC, cell ASC); ri/rf = each batch
    // vector's top-1 cell under each quantizer (IvfRouteCells' tie
    // discipline). Comparing vec_id labels instead of flat-matrix
    // positions is the same equality — position ↔ sorted cell id is a
    // bijection. Integer count compare only; no float crosses the gate.
    "dedup_semantic_ivf_drift" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |corp AS (SELECT * FROM e WHERE vec_id % 10 <> 0),
        |newb AS (SELECT * FROM e WHERE vec_id % 10 = 0),
        |c AS (SELECT vec_id AS cell, v AS cv FROM corp
        |      ORDER BY vec_id LIMIT 8),
        |f AS (SELECT vec_id AS fcell, v AS fv FROM newb
        |      ORDER BY vec_id LIMIT 8),
        |bridge AS (
        |  SELECT fcell, cell AS matched_cell FROM (
        |    SELECT f.fcell, c.cell,
        |      row_number() OVER (PARTITION BY f.fcell ORDER BY
        |        list_dot_product(f.fv, c.cv) /
        |          (sqrt(list_dot_product(f.fv, f.fv)) *
        |           sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |        c.cell ASC) AS rn
        |    FROM f CROSS JOIN c)
        |  WHERE rn = 1),
        |ri AS (
        |  SELECT vec_id, cell AS idx_cell FROM (
        |    SELECT n.vec_id, c.cell,
        |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        |        list_dot_product(n.v, c.cv) /
        |          (sqrt(list_dot_product(n.v, n.v)) *
        |           sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |        c.cell ASC) AS rn
        |    FROM newb n CROSS JOIN c)
        |  WHERE rn = 1),
        |rf AS (
        |  SELECT vec_id, fcell FROM (
        |    SELECT n.vec_id, f.fcell,
        |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        |        list_dot_product(n.v, f.fv) /
        |          (sqrt(list_dot_product(n.v, n.v)) *
        |           sqrt(list_dot_product(f.fv, f.fv))) DESC,
        |        f.fcell ASC) AS rn
        |    FROM newb n CROSS JOIN f)
        |  WHERE rn = 1),
        |m AS (
        |  SELECT ri.idx_cell, bridge.matched_cell
        |  FROM ri JOIN rf ON ri.vec_id = rf.vec_id
        |  JOIN bridge ON bridge.fcell = rf.fcell)
        |SELECT CAST(count(*) AS BIGINT) AS n_routed,
        |  CAST(sum(CASE WHEN idx_cell <> matched_cell THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_shifted,
        |  CAST(200000 AS BIGINT) AS shift_floor_ppm,
        |  (CAST(sum(CASE WHEN idx_cell <> matched_cell THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000 > 200000 * count(*))
        |    AS recluster_recommended
        |FROM m""".stripMargin,

    "dedup_semantic_mp" -> semanticMpOracle,

    "q_join_size_est" -> {
      val hrRows = graft.operators.Sketches.cmsRowParams(4, 42L).zipWithIndex
        .map { case ((a, b), r) => s"($r, ${a}::BIGINT, ${b}::BIGINT)" }
        .mkString(", ")
      s"""WITH hr(r, a, b) AS (VALUES $hrRows),
         |la AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
         |ob AS (SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders
         |       WHERE o_totalprice > 100000.0),
         |ba AS (SELECT hr.r,
         |    ((hr.a * (('0x' || substr(md5(la.k), 1, 15))::BIGINT % 2147483647)
         |      + hr.b) % 2147483647) % 1024 AS bucket
         |  FROM la CROSS JOIN hr),
         |ca AS (SELECT r, bucket, count(*) AS cnt FROM ba GROUP BY 1, 2),
         |bb AS (SELECT hr.r,
         |    ((hr.a * (('0x' || substr(md5(ob.k), 1, 15))::BIGINT % 2147483647)
         |      + hr.b) % 2147483647) % 1024 AS bucket
         |  FROM ob CROSS JOIN hr),
         |cb AS (SELECT r, bucket, count(*) AS cnt FROM bb GROUP BY 1, 2),
         |je AS (SELECT ca.r, sum(ca.cnt * cb.cnt) AS rowEst
         |       FROM ca JOIN cb ON ca.r = cb.r AND ca.bucket = cb.bucket
         |       GROUP BY 1)
         |SELECT (SELECT CAST(min(rowEst) AS BIGINT) FROM je) AS est_join_size,
         |  (SELECT count(*) FROM la JOIN ob USING (k)) AS exact_join_size""".stripMargin
    },

    "q_null_semantics" ->
      """WITH l AS (
        |  SELECT o_orderkey, nullif(o_custkey % 10, 0) AS k FROM orders),
        |r AS (SELECT DISTINCT nullif(c_custkey % 10, 0) AS k FROM customer)
        |SELECT 'equality' AS join_kind, count(*) AS n
        |FROM l JOIN r ON l.k = r.k
        |UNION ALL
        |SELECT 'null_safe', count(*)
        |FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
        |ORDER BY join_kind""".stripMargin,

    "q_table_diff" ->
      """WITH base AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem),
        |drift AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_orderkey % 100 = 0 THEN l_quantity + 1
        |         ELSE l_quantity END AS l_quantity
        |  FROM lineitem WHERE l_orderkey % 1000 <> 0),
        |oa AS (SELECT count(*) AS n_rows FROM
        |  (SELECT * FROM base EXCEPT ALL SELECT * FROM drift)),
        |ob AS (SELECT count(*) AS n_rows FROM
        |  (SELECT * FROM drift EXCEPT ALL SELECT * FROM base))
        |SELECT 'only_left' AS side, n_rows FROM oa
        |UNION ALL SELECT 'only_right', n_rows FROM ob
        |ORDER BY side""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
        |  count(*) AS n, min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_quality_report" ->
      """SELECT rule, CAST(n_violations AS BIGINT) AS n_violations FROM (
        |  SELECT 'qty_in_1_to_40' AS rule,
        |    sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 40 THEN 1 ELSE 0 END)
        |      AS n_violations FROM lineitem
        |  UNION ALL
        |  SELECT 'price_positive',
        |    sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'flag_in_enum',
        |    sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0
        |      END)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'ship_not_null',
        |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'unique_order_line', sum(CASE WHEN c > 1 THEN c ELSE 0 END)
        |  FROM (SELECT count(*) AS c FROM lineitem
        |        GROUP BY l_orderkey, l_linenumber))
        |ORDER BY rule""".stripMargin,

    "q_agg_merge" ->
      """WITH p AS (
        |  SELECT l_shipdate AS day, l_returnflag,
        |    count(*) AS n,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS s,
        |    min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS mn,
        |    max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS mx
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(sum(s) AS BIGINT) AS sum_cents,
        |  CAST(min(mn) AS BIGINT) AS min_cents,
        |  CAST(max(mx) AS BIGINT) AS max_cents,
        |  CAST(count(*) AS BIGINT) AS n_partials
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_k_anonymity" ->
      """WITH cells AS (
        |  SELECT c_mktsegment AS segment, CAST(c_nationkey AS BIGINT)
        |    AS nation, CAST(count(*) AS BIGINT) AS n,
        |    count(*) < 10 AS suppress
        |  FROM customer GROUP BY 1, 2),
        |total AS (
        |  SELECT '__TOTAL__' AS segment, CAST(-1 AS BIGINT) AS nation,
        |    CAST(sum(n) AS BIGINT) AS n, false AS suppress,
        |    (CAST(sum(CASE WHEN suppress THEN n ELSE 0 END) AS BIGINT)
        |      * 1000000) // CAST(sum(n) AS BIGINT) AS suppressed_ppm
        |  FROM cells)
        |SELECT segment, nation, n, suppress,
        |  CAST(NULL AS BIGINT) AS suppressed_ppm FROM cells
        |UNION ALL
        |SELECT segment, nation, n, suppress, suppressed_ppm FROM total
        |ORDER BY segment, nation""".stripMargin,

    "q_profile" -> {
      def leg(name: String, expr: String) =
        s"""SELECT '$name' AS col_name, count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $expr IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null,
           |  count(DISTINCT $expr) AS n_distinct,
           |  CAST(min($expr) AS VARCHAR) AS min_val,
           |  CAST(max($expr) AS VARCHAR) AS max_val
           |FROM orders""".stripMargin
      Seq(
        leg("o_orderkey", "o_orderkey"),
        leg("o_custkey", "o_custkey"),
        leg("o_orderstatus", "o_orderstatus"),
        leg("o_totalprice", "CAST(o_totalprice AS DECIMAL(18,2))"),
        leg("o_orderdate", "o_orderdate"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "q_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |  FROM events),
        |p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, max(value) AS pval
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.event_type,
        |  p.pts AS pts_matched, p.pval
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts >= p.pts
        |ORDER BY e.event_id""".stripMargin,

    "q_range_join" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |w AS (
        |  SELECT user_id, event_id AS window_id, CAST(ts AS TIMESTAMP) AS ws,
        |    CAST(ts AS TIMESTAMP) + INTERVAL 1 DAY AS we
        |  FROM events WHERE event_type = 'signup')
        |SELECT w.window_id, count(*) AS n_events,
        |  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w JOIN e
        |  ON e.user_id = w.user_id AND e.ts >= w.ws AND e.ts <= w.we
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
         |SELECT doc_id,
         |  CAST(len(w) AS INTEGER) AS n_tokens,
         |  CAST(len(list_distinct(w)) AS INTEGER) AS n_distinct_tokens,
         |  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS type_token_ratio,
         |  CAST(length(text) - len(w) + 1 AS DOUBLE) / len(w) AS avg_token_len,
         |  CAST(len(list_filter(w, x -> x IN ($stopList))) AS DOUBLE) / len(w)
         |    AS stopword_ratio
         |FROM t ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
        |s AS (
        |  SELECT lang,
        |    len(list_filter(w, x -> x IN ('the','a','of','and','to','in'))) AS s_en,
        |    len(list_filter(w, x -> x IN ('el','la','de','y','que','en'))) AS s_es,
        |    len(list_filter(w, x -> x IN ('der','die','das','und','zu','ist'))) AS s_de
        |  FROM t)
        |SELECT lang,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
        |       WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS predicted_lang,
        |  count(*) AS n
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_sample_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(text), 1, 15))::BIGINT % 100 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 90 THEN 'train'
        |            WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, count(DISTINCT doc_id) AS n_distinct
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_sim_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(
        |        generate_series(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1])) AS term FROM t),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM g GROUP BY 1, 2),
        |keep AS (SELECT term FROM tf GROUP BY term HAVING count(*) <= 200),
        |tfc AS (SELECT tf.* FROM tf JOIN keep USING (term)),
        |nrm AS (SELECT doc_id, sqrt(CAST(sum(tf * tf) AS DOUBLE)) AS nrm
        |        FROM tfc GROUP BY 1),
        |dots AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2,
        |           sum(a.tf * b.tf) AS dot
        |         FROM tfc a JOIN tfc b
        |           ON a.term = b.term AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2)
        |SELECT id_1, id_2,
        |  CAST(dot AS DOUBLE) / (na.nrm * nb.nrm) AS cosine
        |FROM dots
        |JOIN nrm na ON na.doc_id = dots.id_1
        |JOIN nrm nb ON nb.doc_id = dots.id_2
        |WHERE CAST(dot AS DOUBLE) / (na.nrm * nb.nrm) >= 0.5
        |ORDER BY id_1, id_2""".stripMargin,

    "text_rarity" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |        generate_series(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1]))) AS token
        |      FROM t),
        |d AS (SELECT token, count(*) AS df FROM g GROUP BY 1),
        |s AS (SELECT doc_id, count(*) AS n_terms, min(df) AS min_term_df,
        |             max(df) AS max_term_df,
        |             CAST(sum(CASE WHEN df <= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |               AS n_rare_terms
        |      FROM g JOIN d USING (token) GROUP BY 1)
        |SELECT doc.doc_id, COALESCE(s.n_terms, 0) AS n_terms, s.min_term_df,
        |  s.max_term_df, COALESCE(s.n_rare_terms, 0) AS n_rare_terms
        |FROM documents doc LEFT JOIN s ON s.doc_id = doc.doc_id
        |ORDER BY doc.doc_id""".stripMargin,

    "q_global_rank" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (
        |    ORDER BY ('0x' || substr(md5(text), 1, 15))::BIGINT, doc_id)
        |    AS BIGINT) AS shuffle_rank
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_source_cap" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY ('0x' || substr(md5(text), 1, 15))::BIGINT, doc_id)
        |      AS BIGINT) AS cap_rank
        |  FROM documents)
        |SELECT doc_id, source, cap_rank FROM r
        |WHERE cap_rank <= 100 ORDER BY doc_id""".stripMargin,

    "text_tokens_bpe" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
        |    AS INTEGER) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_bpe_train" -> Bpe.oracleSql(12),

    "text_bpe_vocab" -> Bpe.vocabOracleSql(12),

    "text_bpe_apply" -> Bpe.applyOracleSql(12),

    "pipeline_rag" ->
      """WITH q AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS toks
        |  FROM documents),
        |keep AS (
        |  SELECT * FROM q
        |  WHERE len(toks) BETWEEN 20 AND 1000
        |    AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3),
        |c AS (SELECT source, count(*) AS n FROM keep GROUP BY 1),
        |t AS (
        |  SELECT source, n,
        |    least(1000000,
        |      CASE source WHEN 'src0' THEN 200000 WHEN 'src1' THEN 200000
        |        ELSE 33333 END * 200 // n) AS thr
        |  FROM c),
        |samp AS (
        |  SELECT k.* FROM keep k JOIN t USING (source)
        |  WHERE ('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      % 1000000 < thr),
        |ch AS (
        |  SELECT doc_id, source, (start - 1) // 12 AS chunk_idx,
        |    len(list_slice(toks, start, start + 15)) AS nt
        |  FROM (SELECT doc_id, source, toks,
        |          unnest(range(1, greatest(len(toks) - 4, 1) + 1, 12))
        |            AS start
        |        FROM samp)),
        |p AS (
        |  SELECT source, nt,
        |    sum(nt) OVER (PARTITION BY source
        |      ORDER BY doc_id * 1000 + chunk_idx) AS cum
        |  FROM ch)
        |SELECT source, CAST((cum - nt) // 64 AS BIGINT) AS pack_id,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(nt) AS BIGINT) AS n_tokens
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_hard_negatives" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
        |s AS (
        |  SELECT query_id, e.vec_id AS neighbor_id,
        |    list_dot_product(qv, e.v) /
        |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.v, e.v)))
        |      AS score
        |  FROM q JOIN e ON e.vec_id <> query_id),
        |r AS (
        |  SELECT query_id, neighbor_id, score,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, neighbor_id) AS rank
        |  FROM s),
        |f AS (
        |  SELECT query_id, neighbor_id, score,
        |    row_number() OVER (PARTITION BY query_id ORDER BY rank)
        |      AS hn_rank
        |  FROM r WHERE rank <= 50 AND score < 0.3)
        |SELECT query_id, neighbor_id AS hard_neg_id,
        |  CAST(hn_rank AS INTEGER) AS hn_rank, score
        |FROM f WHERE hn_rank <= 5 ORDER BY query_id, hn_rank""".stripMargin,

    "text_lm_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1]))
        |    AS bigram
        |  FROM t WHERE len(w) >= 2),
        |bc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c_xy
        |       FROM g GROUP BY 1),
        |pc AS (SELECT string_split(bigram, ' ')[1] AS x,
        |         CAST(count(*) AS BIGINT) AS c_x
        |       FROM g GROUP BY 1),
        |s AS (
        |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(sum(c_xy * 1000000 // c_x) AS BIGINT) AS lm_ppm_sum
        |  FROM g JOIN bc USING (bigram)
        |  JOIN pc ON pc.x = string_split(g.bigram, ' ')[1]
        |  GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(s.n_bigrams, 0) AS n_bigrams,
        |  coalesce(s.lm_ppm_sum, 0) AS lm_ppm_sum,
        |  coalesce(s.lm_ppm_sum // s.n_bigrams, 0) AS lm_ppm_mean
        |FROM documents d LEFT JOIN s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // full KN replay in HUGEINT: every interpolation level is one floor
    // division of non-negative exact integers, so DuckDB's // and Spark's
    // truncating DIV agree; type/continuation counts regroup one
    // MATERIALIZED trigram-type CTE
    "text_lm_trigram" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS MATERIALIZED (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(w) - 2),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tri
        |  FROM t WHERE len(w) >= 3),
        |ty AS MATERIALIZED (
        |  SELECT tri,
        |    string_split(tri, ' ')[1] AS x,
        |    string_split(tri, ' ')[2] AS y,
        |    string_split(tri, ' ')[3] AS z,
        |    CAST(count(*) AS BIGINT) AS c3
        |  FROM g GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM ty),
        |p1 AS MATERIALIZED (
        |  SELECT z,
        |    CAST(1000000 AS HUGEINT) * CAST(count(*) AS BIGINT) // n_types
        |      AS p1_ppm
        |  FROM ty, tot GROUP BY z, n_types),
        |cont AS (SELECT y, z, CAST(count(*) AS BIGINT) AS n1_yz
        |         FROM ty GROUP BY 1, 2),
        |mid AS (SELECT y, CAST(count(*) AS BIGINT) AS n1_mid,
        |          CAST(count(DISTINCT z) AS BIGINT) AS n1_fy
        |        FROM ty GROUP BY 1),
        |p2 AS MATERIALIZED (
        |  SELECT cont.y, cont.z,
        |    (CAST(1000000 AS HUGEINT) * greatest(4 * n1_yz - 3, 0)
        |       + CAST(3 AS HUGEINT) * n1_fy * p1_ppm) // (4 * n1_mid)
        |      AS p2_ppm
        |  FROM cont JOIN mid USING (y) JOIN p1 USING (z)),
        |pre AS (SELECT x, y, CAST(sum(c3) AS BIGINT) AS c_xy,
        |          CAST(count(*) AS BIGINT) AS n1_fxy
        |        FROM ty GROUP BY 1, 2),
        |p3 AS MATERIALIZED (
        |  SELECT tri,
        |    (CAST(1000000 AS HUGEINT) * greatest(4 * c3 - 3, 0)
        |       + CAST(3 AS HUGEINT) * n1_fxy * p2_ppm) // (4 * c_xy)
        |      AS p3_ppm
        |  FROM ty JOIN p2 USING (y, z) JOIN pre USING (x, y)),
        |s AS (
        |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
        |    CAST(sum(p3_ppm) AS BIGINT) AS kn_ppm_sum
        |  FROM g JOIN p3 USING (tri) GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(s.n_trigrams, 0) AS n_trigrams,
        |  coalesce(s.kn_ppm_sum, 0) AS kn_ppm_sum,
        |  coalesce(s.kn_ppm_sum // s.n_trigrams, 0) AS kn_ppm_mean
        |FROM documents d LEFT JOIN s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "text_keywords" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |          FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |s AS (
        |  SELECT doc_id, term, tf,
        |    tf * ((n_docs * 1000000) // df) AS score
        |  FROM tf JOIN dfreq USING (term), n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS rank
        |  FROM s)
        |SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tf,
        |  CAST(score AS BIGINT) AS score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "q_tv_drift" ->
      """WITH b AS (
        |  SELECT text,
        |    CASE WHEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 100 < 90
        |           THEN 'train'
        |         WHEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 100 < 95
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |tok AS (SELECT split, unnest(string_split(text, ' ')) AS token
        |        FROM b WHERE split IN ('train', 'val')),
        |cnt AS (SELECT token,
        |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b
        |  FROM tok GROUP BY 1),
        |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
        |             CAST(sum(n_b) AS BIGINT) AS tb FROM cnt)
        |SELECT ta AS n_a_total, tb AS n_b_total,
        |  CAST(sum(abs(n_a * tb - n_b * ta)) AS BIGINT) AS tv_num,
        |  CAST(sum(abs(n_a * tb - n_b * ta)) AS DOUBLE)
        |    / CAST(2 * ta * tb AS DOUBLE) AS tv
        |FROM cnt, t GROUP BY ta, tb""".stripMargin,

    "q_ks_drift" ->
      """WITH b AS (
        |  SELECT n_chars,
        |    CASE WHEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 100 < 90
        |           THEN 'train'
        |         WHEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 100 < 95
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |cnt AS (
        |  SELECT n_chars AS v,
        |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b
        |  FROM b WHERE split IN ('train', 'val') GROUP BY 1),
        |c AS (
        |  SELECT CAST(sum(n_a) OVER (ORDER BY v) AS BIGINT) AS cum_a,
        |         CAST(sum(n_b) OVER (ORDER BY v) AS BIGINT) AS cum_b
        |  FROM cnt),
        |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
        |             CAST(sum(n_b) AS BIGINT) AS tb FROM cnt)
        |SELECT ta AS n_a_total, tb AS n_b_total,
        |  CAST(max(abs(cum_a * tb - cum_b * ta)) AS BIGINT) AS ks_num,
        |  CAST(max(abs(cum_a * tb - cum_b * ta)) AS DOUBLE)
        |    / CAST(ta * tb AS DOUBLE) AS ks
        |FROM c, t GROUP BY ta, tb""".stripMargin,

    "text_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, toks,
        |    unnest(range(1, greatest(len(toks) - 4, 1) + 1, 12)) AS start
        |  FROM t)
        |SELECT doc_id, CAST((start - 1) // 12 AS INTEGER) AS chunk_idx,
        |  CAST(len(list_slice(toks, start, start + 15)) AS INTEGER)
        |    AS n_chunk_tokens,
        |  array_to_string(list_slice(toks, start, start + 15), ' ')
        |    AS chunk_text
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_except_all" ->
      """WITH x AS (
        |  SELECT l_orderkey, l_returnflag FROM lineitem
        |  EXCEPT ALL
        |  SELECT l_orderkey, l_returnflag FROM lineitem
        |  WHERE l_tax > 0.0)
        |SELECT l_returnflag, count(*) AS n FROM x
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_intersect_all" ->
      """WITH x AS (
        |  SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_quantity >= 25
        |  INTERSECT ALL
        |  SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_discount > 0.05)
        |SELECT l_returnflag, count(*) AS n FROM x
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_pivot" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_returnflag = 'A'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_a,
        |  CAST(sum(CASE WHEN l_returnflag = 'N'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_n,
        |  CAST(sum(CASE WHEN l_returnflag = 'R'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_r
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
        |    l_quantity AS val FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |  FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    "q_salted_join" ->
      """SELECT li.l_orderkey, li.l_linenumber, li.l_quantity, o.o_totalprice
        |FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey
        |ORDER BY li.l_orderkey, li.l_linenumber""".stripMargin,

    "q_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_extendedprice, 0.25) AS p25_price,
        |  quantile_cont(l_extendedprice, 0.75) AS p75_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "text_winnow" ->
      """WITH h AS (
        |  SELECT doc_id, list_transform(generate_series(1, length(text) - 7),
        |    i -> ('0x' || substr(md5(text[i : i+7]), 1, 15))::BIGINT) AS hs
        |  FROM documents WHERE length(text) >= 11),
        |fp AS (
        |  SELECT doc_id, list_sort(list_distinct(list_transform(
        |    generate_series(1, len(hs) - 3), i -> list_min(hs[i : i+3])))) AS fps
        |  FROM h)
        |SELECT doc_id, CAST(len(fps) AS INTEGER) AS n_fp,
        |  fps[1] AS fp_min, fps[-1] AS fp_max
        |FROM fp ORDER BY doc_id""".stripMargin,

    "dedup_containment_winnow" ->
      """WITH h AS (
        |  SELECT doc_id, list_transform(generate_series(1, length(text) - 7),
        |    i -> ('0x' || substr(md5(text[i : i+7]), 1, 15))::BIGINT) AS hs
        |  FROM documents WHERE length(text) >= 11),
        |fp AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(hs) - 3), i -> list_min(hs[i : i+3]))) AS fps
        |  FROM h),
        |e0 AS (SELECT doc_id, unnest(fps) AS fp FROM fp),
        |dfq AS (SELECT fp, count(*) AS d FROM e0 GROUP BY 1),
        |e AS (SELECT e0.doc_id, e0.fp FROM e0 JOIN dfq USING (fp)
        |      WHERE dfq.d <= 200),
        |sz AS (SELECT doc_id, count(*) AS n FROM e GROUP BY 1),
        |sh AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS n_shared
        |       FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |       GROUP BY 1, 2),
        |bo AS (SELECT id_1 AS id_sub, id_2 AS id_super, n_shared FROM sh
        |       UNION ALL SELECT id_2, id_1, n_shared FROM sh)
        |SELECT id_sub, id_super,
        |  n_shared::DOUBLE / sz.n AS containment
        |FROM bo JOIN sz ON sz.doc_id = bo.id_sub
        |WHERE n_shared::DOUBLE / sz.n >= 0.6
        |ORDER BY id_sub, id_super""".stripMargin,

    "dedup_winnow" ->
      """WITH h AS (
        |  SELECT doc_id, list_transform(generate_series(1, length(text) - 7),
        |    i -> ('0x' || substr(md5(text[i : i+7]), 1, 15))::BIGINT) AS hs
        |  FROM documents WHERE length(text) >= 11),
        |fp AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(hs) - 3), i -> list_min(hs[i : i+3]))) AS fps
        |  FROM h),
        |e0 AS (SELECT doc_id, unnest(fps) AS fp FROM fp),
        |df AS (SELECT fp, count(*) AS d FROM e0 GROUP BY 1),
        |e AS (SELECT e0.doc_id, e0.fp FROM e0 JOIN df USING (fp)
        |      WHERE df.d <= 200)
        |SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS n_shared
        |FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 50
        |ORDER BY id_1, id_2""".stripMargin,

    "text_fingerprint" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(w, x -> CAST(ascii(x) AS BIGINT) * 131 + length(x))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS rolling_fp
        |FROM t ORDER BY doc_id""".stripMargin,

    "text_gopher" ->
      """WITH t AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, text, w,
        |    list_transform(range(1, len(w)),
        |      i -> w[i] || ' ' || w[i+1]) AS g2,
        |    list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS g3
        |  FROM t),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS INTEGER) AS n_words,
        |    CAST(length(text) - len(w) + 1 AS DOUBLE) / len(w) AS mean_word_len,
        |    CASE WHEN len(g2) > 0
        |      THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / CAST(len(g2) AS DOUBLE)
        |      ELSE 0.0 END AS dup_2gram_frac,
        |    CASE WHEN len(g3) > 0
        |      THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / CAST(len(g3) AS DOUBLE)
        |      ELSE 0.0 END AS dup_3gram_frac
        |  FROM g)
        |SELECT doc_id, n_words, mean_word_len, dup_2gram_frac, dup_3gram_frac,
        |  CAST(n_words BETWEEN 30 AND 100000
        |    AND mean_word_len BETWEEN 3.0 AND 10.0
        |    AND dup_2gram_frac <= 0.05
        |    AND dup_3gram_frac <= 0.02 AS INTEGER) AS keep_flag
        |FROM m ORDER BY doc_id""".stripMargin,

    "text_top_ngrams" ->
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS ngram
        |  FROM t)
        |SELECT ngram, count(*) AS n FROM g
        |GROUP BY 1 ORDER BY n DESC, ngram LIMIT 20""".stripMargin,

    "q_stratified_sample" ->
      """WITH b AS (
        |  SELECT source,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
        |      AS bucket
        |  FROM documents)
        |SELECT source, count(*) AS n_kept FROM b
        |WHERE bucket < CASE source WHEN 'src0' THEN 75 WHEN 'src1' THEN 50
        |  WHEN 'src2' THEN 25 ELSE 10 END
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_mixture_sample" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |t AS (
        |  SELECT source, n,
        |    least(1000000,
        |      CASE source WHEN 'src0' THEN 200000 WHEN 'src1' THEN 200000
        |        ELSE 33333 END * 100 // n) AS thr
        |  FROM c)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN t USING (source)
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
        |    % 1000000 < thr
        |ORDER BY d.doc_id""".stripMargin,

    "mm_frames" ->
      """SELECT doc_id AS media_id,
        |  ((CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 30 ELSE 1 END) - 1)
        |    // 10 + 1 AS n_sampled
        |FROM documents ORDER BY media_id""".stripMargin,

    "dedup_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(w) - 4),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
        |      || ' ' || w[i+4])) AS g
        |  FROM toks WHERE len(w) >= 5),
        |bench AS (SELECT DISTINCT unnest(g) AS gr FROM sh WHERE doc_id % 10 = 0),
        |cg AS (SELECT doc_id, unnest(g) AS gr FROM sh WHERE doc_id % 10 <> 0),
        |hits AS (SELECT doc_id, count(*) AS ns FROM cg JOIN bench USING (gr)
        |         GROUP BY 1)
        |SELECT d.doc_id, COALESCE(h.ns, 0) AS n_shared_grams,
        |  CAST(COALESCE(h.ns, 0) >= 1 AS INTEGER) AS contaminated
        |FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
        |WHERE d.doc_id % 10 <> 0 ORDER BY d.doc_id""".stripMargin,

    "text_c4" ->
      s"""WITH $linedTextSql,
         |k AS (
         |  SELECT doc_id, ls, array_to_string(ls, chr(10)) AS txt,
         |    list_filter(ls, x -> x[-1] IN ('.', '!', '?', '"')
         |      AND len(string_split(x, ' ')) >= 3) AS kept
         |  FROM ld)
         |SELECT doc_id,
         |  CAST(len(ls) AS INTEGER) AS n_lines,
         |  CAST(len(kept) AS INTEGER) AS n_kept_lines,
         |  -- DuckDB array_to_string([]) is NULL, Spark array_join([]) is ''
         |  CAST(COALESCE(length(array_to_string(kept, chr(10))), 0) AS INTEGER)
         |    AS kept_chars,
         |  CAST(len(kept) >= 5 AND NOT (contains(txt, 'lorem ipsum')
         |    OR contains(txt, '{')) AS INTEGER) AS keep_doc
         |FROM k ORDER BY doc_id""".stripMargin,

    "text_boilerplate" ->
      s"""WITH $linedTextSql,
         |e0 AS (SELECT doc_id, unnest(ls) AS line FROM ld),
         |ed AS (SELECT DISTINCT doc_id, line FROM e0),
         |f AS (SELECT line, count(*) AS df FROM ed GROUP BY 1),
         |hot AS (SELECT line FROM f WHERE df > 3)
         |-- CAST: DuckDB integer SUM yields HUGEINT, which pandas renders
         |-- as float64 on the driver side — BIGINT keeps both at int64
         |SELECT e0.doc_id, count(*) AS n_lines,
         |  CAST(sum(CASE WHEN hot.line IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_boilerplate,
         |  CAST(sum(CASE WHEN hot.line IS NULL THEN length(e0.line) ELSE 0 END)
         |    AS BIGINT) AS kept_chars
         |FROM e0 LEFT JOIN hot ON e0.line = hot.line
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_pii" ->
      """WITH t AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 4 = 0
        |      THEN ' reach u' || doc_id || '@mail.example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0
        |      THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        |        || '-0199' ELSE '' END AS t2
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(t2, '[0-9]{3}-[0-9]{3}-[0-9]{4}'))
        |    AS INTEGER) AS n_phones,
        |  regexp_replace(regexp_replace(t2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source, len(string_split(text, ' ')) AS nt
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, nt,
        |    sum(nt) OVER (PARTITION BY source ORDER BY doc_id) AS cum
        |  FROM t),
        |p AS (SELECT source,
        |        CAST(floor((cum - nt) / 1024) AS BIGINT) AS pack_id, nt
        |      FROM c)
        |SELECT source, pack_id, count(*) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS sum_tokens
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_pack_assemble" ->
      """WITH t AS (
        |  SELECT doc_id, source, text, len(string_split(text, ' ')) AS nt
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, text, nt,
        |    sum(nt) OVER (PARTITION BY source ORDER BY doc_id) AS cum
        |  FROM t),
        |p AS (SELECT source, doc_id, text,
        |        CAST(floor((cum - nt) / 1024) AS BIGINT) AS pack_id
        |      FROM c)
        |SELECT source AS stratum, pack_id, count(*) AS n_docs,
        |  CAST(length(string_agg(text, chr(10) ORDER BY doc_id)) AS INTEGER)
        |    AS n_chars,
        |  ('0x' || substr(md5(string_agg(text, chr(10) ORDER BY doc_id)),
        |     1, 15))::BIGINT AS seq_hash
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_zorder" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(list_sum(list_transform(range(0, 16),
        |    i -> ((CAST(l_partkey AS BIGINT) >> i) & 1) * (1::BIGINT << (2*i))
        |       + ((CAST(l_suppkey AS BIGINT) >> i) & 1) * (1::BIGINT << (2*i+1))))
        |    AS BIGINT) AS zkey
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_hilbert" ->
      """WITH RECURSIVE h AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(l_partkey AS BIGINT) & 65535 AS x,
        |    CAST(l_suppkey AS BIGINT) & 65535 AS y,
        |    CAST(0 AS BIGINT) AS d, CAST(32768 AS BIGINT) AS s
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN (y & s) = 0 THEN
        |      CASE WHEN (x & s) > 0 THEN 65535 - y ELSE y END
        |    ELSE x END AS x,
        |    CASE WHEN (y & s) = 0 THEN
        |      CASE WHEN (x & s) > 0 THEN 65535 - x ELSE x END
        |    ELSE y END AS y,
        |    d + s * s * xor(3 * CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END,
        |                    CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END) AS d,
        |    s // 2 AS s
        |  FROM h WHERE s > 0)
        |SELECT l_orderkey, l_linenumber, d AS hkey
        |FROM h WHERE s = 0 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "text_bm25" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(len(w)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
        |    CAST(sum(CASE WHEN list_contains(w, 'spark') THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS df1,
        |    CAST(sum(CASE WHEN list_contains(w, 'table') THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS df2,
        |    CAST(sum(CASE WHEN list_contains(w, 'query') THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS df3
        |  FROM t),
        |s AS (
        |  SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl,
        |    CAST(len(list_filter(w, x -> x = 'spark')) AS DOUBLE) AS tf1,
        |    CAST(len(list_filter(w, x -> x = 'table')) AS DOUBLE) AS tf2,
        |    CAST(len(list_filter(w, x -> x = 'query')) AS DOUBLE) AS tf3
        |  FROM t)
        |SELECT doc_id,
        |  ((n - df1 + 0.5) / (df1 + 0.5))
        |    * ((tf1 * (1.2 + 1.0)) / (tf1 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)))
        |  + ((n - df2 + 0.5) / (df2 + 0.5))
        |    * ((tf2 * (1.2 + 1.0)) / (tf2 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)))
        |  + ((n - df3 + 0.5) / (df3 + 0.5))
        |    * ((tf3 * (1.2 + 1.0)) / (tf3 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)))
        |  AS bm25
        |FROM s, g ORDER BY doc_id""".stripMargin,

    "q_mmr_select" -> {
      def cos(a: String, b: String) =
        s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * " +
          s"sqrt(list_dot_product($b, $b)))"
      val rounds = (1 to 8).map { i =>
        val prev = s"sel${i - 1}"
        s"""rem$i AS (
           |  SELECT * FROM cand WHERE id NOT IN (SELECT id FROM $prev)),
           |ms$i AS (
           |  SELECT r.id, max(${cos("r.v", "s.v")}) AS ms
           |  FROM rem$i r CROSS JOIN $prev s GROUP BY r.id),
           |pick$i AS MATERIALIZED (
           |  SELECT r.id, r.v, r.rel, $i AS pick
           |  FROM rem$i r LEFT JOIN ms$i m USING (id)
           |  ORDER BY 0.75 * r.rel - (1.0 - 0.75) * coalesce(m.ms, 0.0)
           |    DESC, r.id
           |  LIMIT 1),
           |sel$i AS MATERIALIZED (
           |  SELECT * FROM $prev UNION ALL SELECT * FROM pick$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |cand AS MATERIALIZED (
         |  SELECT e.vec_id AS id, e.v, ${cos("qv", "e.v")} AS rel
         |  FROM q CROSS JOIN e WHERE e.vec_id <> 0
         |  ORDER BY rel DESC, id LIMIT 50),
         |sel0 AS (SELECT id, v, rel, 0 AS pick FROM cand WHERE FALSE),
         |$rounds
         |SELECT id AS doc_id, CAST(pick AS INTEGER) AS sel_rank, rel
         |FROM sel8 ORDER BY sel_rank""".stripMargin
    },

    "q_rrf_fusion" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(len(w)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
        |    CAST(sum(CASE WHEN list_contains(w, 'spark') THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS df1,
        |    CAST(sum(CASE WHEN list_contains(w, 'table') THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS df2,
        |    CAST(sum(CASE WHEN list_contains(w, 'query') THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS df3
        |  FROM t),
        |s AS (
        |  SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl,
        |    CAST(len(list_filter(w, x -> x = 'spark')) AS DOUBLE) AS tf1,
        |    CAST(len(list_filter(w, x -> x = 'table')) AS DOUBLE) AS tf2,
        |    CAST(len(list_filter(w, x -> x = 'query')) AS DOUBLE) AS tf3
        |  FROM t),
        |bm AS (
        |  SELECT doc_id AS id,
        |    ((n - df1 + 0.5) / (df1 + 0.5))
        |      * ((tf1 * (1.2 + 1.0)) / (tf1 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)))
        |    + ((n - df2 + 0.5) / (df2 + 0.5))
        |      * ((tf2 * (1.2 + 1.0)) / (tf2 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)))
        |    + ((n - df3 + 0.5) / (df3 + 0.5))
        |      * ((tf3 * (1.2 + 1.0)) / (tf3 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)))
        |    AS score
        |  FROM s, g),
        |bmr AS (
        |  SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank
        |  FROM bm),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |cs AS (
        |  SELECT e.vec_id AS id,
        |    list_dot_product(qv, v) /
        |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v)))
        |      AS score
        |  FROM q, e WHERE e.vec_id <> 0),
        |csr AS (
        |  SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank
        |  FROM cs),
        |u AS (
        |  SELECT id, 1000000000000 // (60 + rank) AS term
        |  FROM bmr WHERE rank <= 100
        |  UNION ALL
        |  SELECT id, 1000000000000 // (60 + rank) AS term
        |  FROM csr WHERE rank <= 100)
        |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_rankers,
        |  CAST(sum(term) AS BIGINT) AS rrf_score
        |FROM u GROUP BY 1
        |ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin,

    // mm_meta/mm_binary oracle: the fixture GENERATOR embeds these
    // id-derived values into real BMP/WAVE/AVI headers; the Spark side
    // recovers them by PARSING the header bytes (MediaFormats.parse), so a
    // generator/parser disagreement fails the hash compare. Audio has no
    // image geometry (width/height 0); WAV frame count = dataSize/blockAlign.
    "mm_binary" -> mmMetaOracle,
    "mm_meta" -> mmMetaOracle,

    // Chain replay of the greedy walk: per-position longest match, then a
    // recursive single-chain CTE from position 0 (the oracle may walk
    // sequentially; the engine side must not).
    "text_maxmatch" -> {
      val pieces = maxMatchVocab
        .map(p => s"('${p.replace("'", "''")}')").mkString(", ")
      s"""WITH RECURSIVE v(piece) AS (VALUES $pieces),
         |docs AS (
         |  SELECT doc_id AS id, text AS t, length(text) AS len
         |  FROM documents WHERE length(text) > 0),
         |posn AS (
         |  SELECT id, len, t, unnest(range(0, len)) AS pos FROM docs),
         |cl AS (
         |  SELECT id, len, t, pos, unnest(range(1, 9)) AS l FROM posn),
         |cand AS MATERIALIZED (
         |  SELECT id, pos, max(l) AS step
         |  FROM cl JOIN v ON pos + l <= len AND substr(t, pos + 1, l) = piece
         |  GROUP BY 1, 2),
         |nxt AS MATERIALIZED (
         |  SELECT p.id, p.pos, p.pos + coalesce(c.step, 1) AS nx,
         |    (c.step IS NOT NULL) AS matched
         |  FROM posn p LEFT JOIN cand c ON c.id = p.id AND c.pos = p.pos),
         |walk(id, pos) AS (
         |  SELECT id, 0 FROM docs
         |  UNION
         |  SELECT n.id, n.nx FROM walk w
         |  JOIN nxt n ON n.id = w.id AND n.pos = w.pos)
         |SELECT w.id AS doc_id,
         |  CAST(count(n.pos) AS BIGINT) AS n_pieces,
         |  CAST(sum(CASE WHEN NOT n.matched THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_fallback
         |FROM walk w JOIN nxt n ON n.id = w.id AND n.pos = w.pos
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // Sample-exact replay of the PCM features: same sample formula as
    // Multimodal.audioSample, lateral generate_series per id, windowed
    // sign-change count (oracle side may window freely).
    "mm_audio_energy" ->
      """WITH par AS (
        |  SELECT doc_id AS media_id,
        |    CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) AS sample_rate,
        |    CAST(200 + doc_id % 56 AS BIGINT) AS n
        |  FROM documents),
        |ix AS (
        |  SELECT media_id, sample_rate, n, unnest(range(0, n)) AS i
        |  FROM par),
        |s AS (
        |  SELECT media_id, sample_rate, n, i,
        |    ((i * 37 + media_id * 211 +
        |      ((i + media_id) % 13) * (i % 97) * 5) % 65536) - 32768 AS v
        |  FROM ix),
        |w AS (
        |  SELECT media_id, sample_rate, n, i, v,
        |    lag(v) OVER (PARTITION BY media_id ORDER BY i) AS pv
        |  FROM s)
        |SELECT media_id, sample_rate, n AS n_samples,
        |  n * 1000 // sample_rate AS duration_ms,
        |  CAST(max(abs(v)) AS BIGINT) AS peak,
        |  CAST(sum(v * v) AS BIGINT) AS energy,
        |  CAST(sum(CASE WHEN pv IS NOT NULL AND (v >= 0) <> (pv >= 0)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        |FROM w GROUP BY 1, 2, 3
        |ORDER BY media_id""".stripMargin,

    "mm_shot_bounds" ->
      """WITH par AS (
        |  SELECT doc_id AS media_id, CAST(8 + doc_id % 5 AS BIGINT) AS n
        |  FROM documents),
        |fr AS (SELECT media_id, unnest(range(0, n)) AS f FROM par),
        |px AS (SELECT media_id, f, unnest(range(0, 48)) AS i FROM fr),
        |keyed AS (
        |  SELECT media_id, f, i, i % 8 AS x, i // 8 AS y,
        |    media_id * 7 + (f // 4) * 31 AS g
        |  FROM px),
        |v AS (
        |  SELECT media_id, f, i,
        |    ((x * 29 + y * 53 + g * 101 +
        |       ((x + g) % 7) * ((y + g) % 11) * 3) % 256
        |     + (f + x + y) % 2) % 256 AS gray
        |  FROM keyed),
        |d AS (
        |  SELECT a.media_id, b.f, CAST(sum(abs(a.gray - b.gray)) AS BIGINT)
        |    AS l1_diff
        |  FROM v a JOIN v b
        |    ON a.media_id = b.media_id AND a.i = b.i AND b.f = a.f + 1
        |  GROUP BY 1, 2)
        |SELECT media_id, f, l1_diff,
        |  CAST(l1_diff > 1000 AS INTEGER) AS boundary
        |FROM d ORDER BY media_id, f""".stripMargin,

    "mm_audio_windows" ->
      """WITH par AS (
        |  SELECT doc_id AS media_id,
        |    CAST(200 + doc_id % 56 AS BIGINT) AS n
        |  FROM documents),
        |ix AS (
        |  SELECT media_id, unnest(range(0, n)) AS i FROM par),
        |s AS (
        |  SELECT media_id, i,
        |    ((i * 37 + media_id * 211 +
        |      ((i + media_id) % 13) * (i % 97) * 5) % 65536) - 32768 AS v
        |  FROM ix),
        |w AS (
        |  SELECT media_id, i // 50 AS win,
        |    CAST(count(*) AS BIGINT) AS n_samples,
        |    CAST(max(abs(v)) AS BIGINT) AS peak,
        |    CAST(sum(v * v) AS BIGINT) AS energy,
        |    CAST(sum(CASE WHEN abs(v) >= 30000 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_clipped
        |  FROM s GROUP BY 1, 2)
        |SELECT media_id, win, n_samples, peak, energy, n_clipped,
        |  CASE WHEN peak = 0 THEN NULL
        |    ELSE CAST(32767 * 256 // peak AS BIGINT) END AS gain_q8
        |FROM w ORDER BY media_id, win""".stripMargin,

    "mm_phash" ->
      s"""$phashHashesSql
         |SELECT media_id, h_hi, h_lo FROM hs ORDER BY media_id""".stripMargin,

    "mm_phash_dups" ->
      s"""$phashHashesSql
         |SELECT x.media_id AS a, y.media_id AS b,
         |  CAST(bit_count(xor(x.h_hi, y.h_hi)) +
         |       bit_count(xor(x.h_lo, y.h_lo)) AS BIGINT) AS hamming
         |FROM hs x JOIN hs y ON x.media_id < y.media_id
         |WHERE bit_count(xor(x.h_hi, y.h_hi)) +
         |      bit_count(xor(x.h_lo, y.h_lo)) <= 3
         |ORDER BY a, b""".stripMargin,

    "q_target_encoding" ->
      """WITH r AS (
        |  SELECT o_orderkey, o_orderpriority AS category,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        |  FROM orders),
        |c AS (SELECT category, CAST(sum(y) AS BIGINT) AS s_c,
        |        CAST(count(*) AS BIGINT) AS n_c
        |      FROM r GROUP BY 1),
        |g AS (SELECT CAST(sum(y) AS BIGINT) AS s,
        |        CAST(count(*) AS BIGINT) AS n FROM r)
        |SELECT r.o_orderkey, r.category, CAST(r.y AS BIGINT) AS y,
        |  CAST((1000000 * (g.n * (c.s_c - r.y) + 10 * g.s)) //
        |    (g.n * (c.n_c - 1 + 10)) AS BIGINT) AS enc_ppm
        |FROM r JOIN c USING (category) CROSS JOIN g
        |ORDER BY o_orderkey""".stripMargin,

    // the z expression is character-identical to Stats.abTestZ's — one
    // fixed-order double tree, so the floored micros agree bit-for-bit
    "q_ab_test" ->
      """WITH r AS (
        |  SELECT event_type, user_id % 2 AS v,
        |    CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
        |      % 3 = 0 THEN 1 ELSE 0 END AS y
        |  FROM events),
        |a AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN v = 0 THEN y ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN v <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN v <> 0 THEN y ELSE 0 END) AS BIGINT) AS c2
        |  FROM r GROUP BY 1),
        |z AS (
        |  SELECT event_type, n1, c1, n2, c2,
        |    CASE WHEN n1 = 0 OR n2 = 0
        |        OR c1 + c2 = 0 OR c1 + c2 = n1 + n2 THEN NULL
        |    ELSE CAST(floor(1000000.0 *
        |      ((CAST(c1 * n2 - c2 * n1 AS DOUBLE) /
        |        (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) /
        |       sqrt((CAST(c1 + c2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) *
        |         (1.0 - CAST(c1 + c2 AS DOUBLE) /
        |           CAST(n1 + n2 AS DOUBLE)) *
        |         (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))))
        |      AS BIGINT) END AS z_micros
        |  FROM a)
        |SELECT event_type, n1, c1, n2, c2, z_micros,
        |  CASE WHEN z_micros IS NULL THEN NULL
        |       ELSE abs(z_micros) >= 1960000 END AS significant
        |FROM z ORDER BY event_type""".stripMargin,

    "q_modularity" -> communityMetricsOracle(4),

    "q_feature_hash" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS bucket,
        |    CASE WHEN ('0x' || substr(md5(tok), 16, 1))::BIGINT % 2 = 0
        |         THEN 1 ELSE -1 END AS sign
        |  FROM t)
        |SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS value
        |FROM h GROUP BY 1, 2 HAVING sum(sign) <> 0
        |ORDER BY doc_id, bucket""".stripMargin,

    "q_length_buckets" ->
      """WITH t AS (
        |  SELECT source AS stratum,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |  FROM documents WHERE len(string_split(text, ' ')) >= 1),
        |b AS (
        |  SELECT stratum,
        |    CASE WHEN nt <= 1 THEN 1::BIGINT
        |         ELSE 1::BIGINT << length(bin(nt - 1)) END AS bucket_tokens,
        |    nt
        |  FROM t),
        |a AS (
        |  SELECT stratum, bucket_tokens,
        |    CAST(count(*) AS BIGINT) AS n_seqs,
        |    CAST(sum(nt) AS BIGINT) AS sum_tokens
        |  FROM b GROUP BY 1, 2)
        |SELECT stratum, bucket_tokens, n_seqs, sum_tokens,
        |  n_seqs * bucket_tokens AS padded_tokens,
        |  CAST(1000000 * (n_seqs * bucket_tokens - sum_tokens) //
        |    (n_seqs * bucket_tokens) AS BIGINT) AS waste_ppm
        |FROM a ORDER BY stratum, bucket_tokens""".stripMargin,

    "q_pref_pairs" ->
      """WITH r AS (
        |  SELECT user_id, event_id AS id,
        |    CAST(floor(value * 1000000.0) AS BIGINT) AS micros
        |  FROM events),
        |k AS (
        |  SELECT user_id, id, micros,
        |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
        |      AS n_candidates,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY micros DESC, id ASC) AS rtop,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY micros ASC, id ASC) AS rbot
        |  FROM r)
        |SELECT c.user_id, c.n_candidates,
        |  c.id AS chosen_id, b.id AS rejected_id,
        |  c.micros AS chosen_micros, b.micros AS rejected_micros,
        |  c.micros - b.micros AS gap_micros
        |FROM (SELECT * FROM k WHERE rtop = 1) c
        |JOIN (SELECT * FROM k WHERE rbot = 1) b USING (user_id)
        |WHERE c.n_candidates >= 2
        |  AND c.micros - b.micros >= 10000
        |ORDER BY user_id""".stripMargin,

    "q_roc_auc" ->
      """WITH r AS (
        |  SELECT CAST(floor(value * 1000000.0) AS BIGINT) AS s,
        |    CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
        |      % 3 = 0 THEN 1 ELSE 0 END AS y
        |  FROM events),
        |g AS (
        |  SELECT s, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(y) AS BIGINT) AS pos
        |  FROM r GROUP BY 1),
        |k AS (
        |  SELECT s, c, pos,
        |    CAST(sum(c) OVER (ORDER BY s) AS BIGINT) AS cum
        |  FROM g),
        |t AS (
        |  SELECT CAST(sum(pos * ((cum - c + 1) + cum)) AS BIGINT) AS r2,
        |    CAST(sum(pos) AS BIGINT) AS n_pos,
        |    CAST(sum(c - pos) AS BIGINT) AS n_neg
        |  FROM k)
        |SELECT n_pos, n_neg,
        |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
        |  ELSE CAST((1000000 * (r2 - n_pos * (n_pos + 1))) //
        |    (2 * n_pos * n_neg) AS BIGINT) END AS auc_ppm
        |FROM t""".stripMargin,

    "q_group_auc" ->
      """WITH r AS (
        |  SELECT event_type,
        |    CAST(floor(value * 1000000.0) AS BIGINT) AS s,
        |    CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
        |      % 3 = 0 THEN 1 ELSE 0 END AS y
        |  FROM events),
        |g AS (
        |  SELECT event_type, s, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(y) AS BIGINT) AS pos
        |  FROM r GROUP BY 1, 2),
        |k AS (
        |  SELECT event_type, s, c, pos,
        |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY s)
        |      AS BIGINT) AS cum
        |  FROM g),
        |t AS (
        |  SELECT event_type,
        |    CAST(sum(pos * ((cum - c + 1) + cum)) AS BIGINT) AS r2,
        |    CAST(sum(pos) AS BIGINT) AS n_pos,
        |    CAST(sum(c - pos) AS BIGINT) AS n_neg
        |  FROM k GROUP BY 1)
        |SELECT event_type, n_pos, n_neg,
        |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
        |  ELSE CAST((1000000 * (r2 - n_pos * (n_pos + 1))) //
        |    (2 * n_pos * n_neg) AS BIGINT) END AS auc_ppm
        |FROM t ORDER BY event_type""".stripMargin,

    "q_calibration" ->
      """WITH r AS (
        |  SELECT (CAST(json_extract_string(props, '$.k') AS BIGINT) % 100)
        |      * 10000 AS p,
        |    CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
        |        ::BIGINT % 100 <
        |      CAST(json_extract_string(props, '$.k') AS BIGINT) % 100
        |      THEN 1 ELSE 0 END AS y
        |  FROM events),
        |b AS (
        |  SELECT least(9, p * 10 // 1000000) AS bin,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(sum(p) AS BIGINT) AS psum
        |  FROM r GROUP BY 1)
        |SELECT bin, n, n_pos,
        |  psum // n AS conf_ppm,
        |  1000000 * n_pos // n AS acc_ppm,
        |  abs(psum // n - 1000000 * n_pos // n) AS gap_ppm
        |FROM b ORDER BY bin""".stripMargin,

    "q_winsorize" ->
      """WITH r AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v,
        |    l_orderkey * 8 + l_linenumber AS uid
        |  FROM lineitem),
        |k AS (
        |  SELECT l_returnflag, v,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY v, uid) AS rk,
        |    CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        |  FROM r),
        |b AS (
        |  SELECT l_returnflag, min(v) AS lo_val, max(v) AS hi_val
        |  FROM k
        |  WHERE rk = greatest(1, (5 * n + 99) // 100)
        |     OR rk = (95 * n + 99) // 100
        |  GROUP BY 1)
        |SELECT r.l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  min(b.lo_val) AS lo_val, min(b.hi_val) AS hi_val,
        |  CAST(sum(CASE WHEN r.v < b.lo_val THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped_lo,
        |  CAST(sum(CASE WHEN r.v > b.hi_val THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped_hi,
        |  CAST(sum(greatest(b.lo_val, least(b.hi_val, r.v))) AS BIGINT)
        |    AS winsorized_sum
        |FROM r JOIN b USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_quantile_norm" ->
      """WITH r AS (
        |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source, v,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY v, doc_id) AS BIGINT) AS rs,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS ns,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM r),
        |g AS (
        |  SELECT v AS v_norm,
        |    CAST(row_number() OVER (ORDER BY v, doc_id) AS BIGINT) AS gr
        |  FROM r)
        |SELECT s.doc_id, s.source, s.v, g.v_norm
        |FROM s JOIN g ON g.gr = (s.rs * s.n + s.ns - 1) // s.ns
        |ORDER BY doc_id""".stripMargin,

    "q_rand_proj" -> randProjOracle(64, 8, 42L),

    "q_confusion" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv, label AS true_label
        |      FROM e WHERE vec_id % 10 = 0 AND vec_id < 5000),
        |c AS (SELECT vec_id, v, label FROM e WHERE vec_id % 10 <> 0),
        |sc AS (
        |  SELECT query_id, c.vec_id AS neighbor_id, c.label,
        |    list_dot_product(qv, c.v) /
        |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v)))
        |      AS score
        |  FROM q CROSS JOIN c),
        |rr AS (
        |  SELECT query_id, label,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, neighbor_id) AS rnk
        |  FROM sc),
        |vv AS (
        |  SELECT query_id, label, CAST(count(*) AS BIGINT) AS votes
        |  FROM rr WHERE rnk <= 10 GROUP BY 1, 2),
        |p AS (
        |  SELECT query_id, label AS pred_label FROM (
        |    SELECT query_id, label, votes,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY votes DESC, label) AS rn
        |    FROM vv) WHERE rn = 1),
        |pairs AS (
        |  SELECT q.true_label, p.pred_label
        |  FROM q JOIN p USING (query_id)),
        |cells AS (
        |  SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n
        |  FROM pairs GROUP BY 1, 2),
        |rt AS (SELECT true_label, CAST(count(*) AS BIGINT) AS n_true
        |       FROM pairs GROUP BY 1),
        |ct AS (SELECT pred_label, CAST(count(*) AS BIGINT) AS n_pred
        |       FROM pairs GROUP BY 1)
        |SELECT cells.true_label, cells.pred_label, cells.n,
        |  rt.n_true, ct.n_pred,
        |  CASE WHEN cells.true_label = cells.pred_label
        |       THEN 1000000 * cells.n // rt.n_true END AS recall_ppm,
        |  CASE WHEN cells.true_label = cells.pred_label
        |       THEN 1000000 * cells.n // ct.n_pred END AS precision_ppm
        |FROM cells
        |JOIN rt USING (true_label)
        |JOIN ct USING (pred_label)
        |ORDER BY true_label, pred_label""".stripMargin,

    "dedup_savings" ->
      """WITH corpus AS (
        |  SELECT text FROM documents
        |  UNION ALL SELECT text FROM documents WHERE doc_id % 7 = 0),
        |cl AS (
        |  SELECT text, CAST(count(*) AS BIGINT) AS n_copies,
        |    CAST(max(strlen(text)) AS BIGINT) AS b
        |  FROM corpus GROUP BY 1)
        |SELECT n_copies, CAST(count(*) AS BIGINT) AS n_clusters,
        |  CAST(sum(n_copies - 1) AS BIGINT) AS dup_docs,
        |  CAST(sum((n_copies - 1) * b) AS BIGINT) AS dup_bytes
        |FROM cl GROUP BY 1 ORDER BY n_copies""".stripMargin,

    "q_spearman" ->
      """WITH r AS MATERIALIZED (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
        |    l_orderkey * 10 + l_linenumber AS uid
        |  FROM lineitem),
        |rx AS MATERIALIZED (
        |  SELECT x, y, uid, row_number() OVER (ORDER BY x, uid) AS rnx
        |  FROM r),
        |px AS MATERIALIZED (
        |  SELECT x, CAST(min(rnx) + max(rnx) AS BIGINT) AS m2x
        |  FROM rx GROUP BY 1),
        |ry AS MATERIALIZED (
        |  SELECT rx.y, px.m2x,
        |    row_number() OVER (ORDER BY rx.y, rx.uid) AS rny
        |  FROM rx JOIN px USING (x)),
        |py AS MATERIALIZED (
        |  SELECT y, CAST(min(rny) + max(rny) AS BIGINT) AS m2y
        |  FROM ry GROUP BY 1),
        |ag AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(CAST(m2x AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(m2y AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(m2x AS HUGEINT) * m2y) AS HUGEINT) AS sxy,
        |    CAST(sum(CAST(m2x AS HUGEINT) * m2x) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(m2y AS HUGEINT) * m2y) AS HUGEINT) AS syy
        |  FROM ry JOIN py USING (y))
        |SELECT CAST(n AS BIGINT) AS n,
        |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
        |    THEN NULL
        |  ELSE CAST(floor(0.5 + 1000000.0 *
        |    CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT)
        |  END AS rho_micros
        |FROM ag""".stripMargin,

    "q_mutual_nn" -> mutualNnOracle,

    // embeds the dedup_minhash and dedup_ppjoin replays as subqueries and
    // scores one against the other
    "q_dedup_eval" ->
      s"""WITH est AS MATERIALIZED (
         |  SELECT id_1, id_2 FROM ($dedupMinhashOracleSql) __mh),
         |ext AS MATERIALIZED (
         |  SELECT id_1, id_2 FROM ($dedupPpjoinOracleSql) __pp),
         |j AS (
         |  SELECT e.id_1 IS NOT NULL AS in_e, x.id_1 IS NOT NULL AS in_x
         |  FROM est e FULL OUTER JOIN ext x USING (id_1, id_2)),
         |c AS (
         |  SELECT
         |    CAST(sum(CASE WHEN in_e AND in_x THEN 1 ELSE 0 END) AS BIGINT)
         |      AS tp,
         |    CAST(sum(CASE WHEN in_e AND NOT in_x THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN NOT in_e AND in_x THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fn
         |  FROM j)
         |SELECT tp + fp AS n_est, tp + fn AS n_exact, tp, fp, fn,
         |  CASE WHEN tp + fp = 0 THEN NULL
         |    ELSE CAST(1000000 * tp // (tp + fp) AS BIGINT)
         |  END AS precision_ppm,
         |  CASE WHEN tp + fn = 0 THEN NULL
         |    ELSE CAST(1000000 * tp // (tp + fn) AS BIGINT)
         |  END AS recall_ppm
         |FROM c""".stripMargin,

    "q_cov_matrix" ->
      """WITH ex AS MATERIALIZED (
        |  SELECT vec_id AS id, CAST(t.i AS INTEGER) AS d,
        |    CAST(floor(CAST(embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE)
        |      * 1000000.0) AS BIGINT) AS x
        |  FROM embeddings, unnest(range(0, 8)) AS t(i)
        |  WHERE len(embedding) >= 8),
        |pairs AS (
        |  SELECT a.d AS d1, b.d AS d2, a.x AS x, b.x AS y
        |  FROM ex a JOIN ex b ON a.id = b.id AND a.d <= b.d),
        |ag AS (
        |  SELECT d1, d2, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        |  FROM pairs GROUP BY 1, 2)
        |SELECT d1, d2, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN n * sxy - sx * sy >= 0
        |    THEN (n * sxy - sx * sy) // (n * n)
        |    ELSE -((sx * sy - n * sxy) // (n * n))
        |  END AS BIGINT) AS cov_scaled
        |FROM ag ORDER BY d1, d2""".stripMargin,

    "pipeline_datacard" ->
      """WITH d AS MATERIALIZED (
        |  SELECT doc_id, source, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |base AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |  FROM d GROUP BY 1),
        |tc AS MATERIALIZED (
        |  SELECT text, count(*) AS c FROM d GROUP BY 1),
        |dup AS (
        |  SELECT source,
        |    CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs
        |  FROM d JOIN tc USING (text) GROUP BY 1),
        |rk AS MATERIALIZED (
        |  SELECT source, n_tokens,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_tokens, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM d),
        |med AS (
        |  SELECT source, n_tokens AS med_tokens FROM rk
        |  WHERE rn = (n + 1) // 2),
        |toks AS MATERIALIZED (
        |  SELECT source, unnest(string_split(text, ' ')) AS t FROM d),
        |tcounts AS (
        |  SELECT source, t, CAST(count(*) AS BIGINT) AS c
        |  FROM toks GROUP BY 1, 2),
        |tt AS (
        |  SELECT source,
        |    CAST(1000000 * count(*) // sum(c) AS BIGINT) AS ttr_ppm
        |  FROM tcounts GROUP BY 1)
        |SELECT base.source, n_docs, sum_tokens,
        |  CAST(sum_tokens // n_docs AS BIGINT) AS mean_tokens,
        |  dup_docs, med_tokens, ttr_ppm
        |FROM base
        |JOIN dup USING (source)
        |JOIN med USING (source)
        |JOIN tt USING (source)
        |ORDER BY source""".stripMargin,

    "q_source_overlap" ->
      """WITH fps AS MATERIALIZED (
        |  SELECT DISTINCT source AS src,
        |    md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS fp
        |  FROM documents),
        |ps AS MATERIALIZED (
        |  SELECT src, CAST(count(*) AS BIGINT) AS n_fp FROM fps GROUP BY 1),
        |pairs AS (
        |  SELECT a.src AS source_a, b.src AS source_b,
        |    CAST(count(*) AS BIGINT) AS n_shared
        |  FROM fps a JOIN fps b ON a.fp = b.fp AND a.src < b.src
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, n_shared,
        |  pa.n_fp AS n_fp_a, pb.n_fp AS n_fp_b,
        |  CAST(1000000 * n_shared // pa.n_fp AS BIGINT) AS contain_a_ppm,
        |  CAST(1000000 * n_shared // pb.n_fp AS BIGINT) AS contain_b_ppm
        |FROM pairs
        |JOIN ps pa ON pa.src = source_a
        |JOIN ps pb ON pb.src = source_b
        |ORDER BY source_a, source_b""".stripMargin,

    "q_silhouette" ->
      """WITH ex AS MATERIALIZED (
        |  SELECT vec_id, label AS own, CAST(t.i AS INTEGER) AS d,
        |    CAST(floor(CAST(embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE)
        |      * 1000000.0) AS BIGINT) AS xi
        |  FROM embeddings, unnest(range(0, 64)) AS t(i)
        |  WHERE len(embedding) >= 64),
        |sums AS MATERIALIZED (
        |  SELECT own AS cand, d, CAST(sum(xi) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM ex GROUP BY 1, 2),
        |pc AS MATERIALIZED (
        |  SELECT ex.vec_id, ex.own, sums.cand,
        |    CAST(sum((CAST(ex.xi AS HUGEINT) * sums.n - sums.s) *
        |             (CAST(ex.xi AS HUGEINT) * sums.n - sums.s))
        |      // (CAST(max(sums.n) AS HUGEINT) * max(sums.n)) AS BIGINT)
        |      AS dist2
        |  FROM ex JOIN sums ON ex.d = sums.d
        |  GROUP BY 1, 2, 3),
        |pv AS MATERIALIZED (
        |  SELECT vec_id, own,
        |    max(CASE WHEN cand = own THEN dist2 END) AS a2,
        |    min(CASE WHEN cand <> own THEN dist2 END) AS b2
        |  FROM pc GROUP BY 1, 2),
        |sv AS (
        |  SELECT own,
        |    CASE WHEN b2 IS NULL THEN NULL
        |      WHEN greatest(a2, b2) = 0 THEN CAST(0 AS BIGINT)
        |      ELSE CAST(floor(1000000.0 *
        |        (sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE))) /
        |        greatest(sqrt(CAST(a2 AS DOUBLE)), sqrt(CAST(b2 AS DOUBLE))))
        |        AS BIGINT) END AS s_ppm
        |  FROM pv)
        |SELECT own AS label, CAST(count(*) AS BIGINT) AS n_vectors,
        |  CAST(sum(s_ppm) AS BIGINT) AS sum_s_ppm,
        |  CASE WHEN sum(s_ppm) IS NULL THEN NULL
        |    WHEN sum(s_ppm) >= 0 THEN CAST(sum(s_ppm) // count(*) AS BIGINT)
        |    ELSE CAST(-((-sum(s_ppm) + count(*) - 1) // count(*)) AS BIGINT)
        |  END AS mean_s_ppm
        |FROM sv GROUP BY 1 ORDER BY label""".stripMargin,

    "q_chi2_drift" ->
      """WITH pb AS (
        |  SELECT event_type AS bucket,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS a,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS b
        |  FROM events GROUP BY 1),
        |tt AS (SELECT CAST(sum(a) AS BIGINT) AS na,
        |              CAST(sum(b) AS BIGINT) AS nb FROM pb),
        |terms AS (
        |  SELECT na, nb,
        |    CASE WHEN na = 0 OR nb = 0 THEN NULL
        |      ELSE CAST((CAST(1000000 AS HUGEINT) *
        |        (CAST(a AS HUGEINT) * nb - CAST(b AS HUGEINT) * na) *
        |        (CAST(a AS HUGEINT) * nb - CAST(b AS HUGEINT) * na))
        |        // (CAST(na AS HUGEINT) * nb * (a + b)) AS BIGINT) END AS t
        |  FROM pb CROSS JOIN tt)
        |SELECT na AS n_a, nb AS n_b, CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(sum(t) AS BIGINT) AS chi2_micros
        |FROM terms GROUP BY 1, 2""".stripMargin,

    "text_ttr" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |counts AS (
        |  SELECT source, t, CAST(count(*) AS BIGINT) AS c
        |  FROM toks GROUP BY 1, 2)
        |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  CAST(1000000 * count(*) // sum(c) AS BIGINT) AS ttr_ppm,
        |  CAST(1000000 * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) // count(*)
        |    AS BIGINT) AS hapax_ppm
        |FROM counts GROUP BY 1 ORDER BY source""".stripMargin,

    "dedup_sweep" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |t0 AS (
        |  SELECT doc_id AS id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(w) - 2),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS t
        |  FROM toks WHERE len(w) >= 3),
        |dfq AS (SELECT t, count(*) AS dfq FROM t0 GROUP BY 1),
        |kept AS (SELECT id, t0.t, dfq FROM t0 JOIN dfq USING (t)
        |         WHERE dfq <= 10000),
        |ranked AS (
        |  SELECT id, t,
        |    row_number() OVER (PARTITION BY id ORDER BY dfq, t) AS pos,
        |    count(*) OVER (PARTITION BY id) AS n
        |  FROM kept),
        |prefix AS (SELECT id, t, n FROM ranked
        |           WHERE pos <= n - ((n * 1 + 10 - 1) // 10) + 1),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_1, b.id AS id_2, a.n AS n_1, b.n AS n_2
        |  FROM prefix a JOIN prefix b ON a.t = b.t AND a.id < b.id
        |  WHERE 10 * least(a.n, b.n) >= 1 * greatest(a.n, b.n)),
        |inter AS (
        |  SELECT c.id_1, c.id_2, c.n_1, c.n_2, count(*) AS n_shared
        |  FROM cand c
        |  JOIN kept x ON x.id = c.id_1
        |  JOIN kept y ON y.id = c.id_2 AND y.t = x.t
        |  GROUP BY 1, 2, 3, 4),
        |pairs AS (
        |  SELECT 10 * n_shared // (n_1 + n_2 - n_shared) AS band
        |  FROM inter
        |  WHERE 10 * n_shared >= 1 * (n_1 + n_2 - n_shared)),
        |pb AS (
        |  SELECT band, CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM pairs GROUP BY 1)
        |SELECT x.band, x.n_pairs,
        |  CAST(sum(y.n_pairs) AS BIGINT) AS n_pairs_merged
        |FROM pb x JOIN pb y ON y.band >= x.band
        |GROUP BY x.band, x.n_pairs
        |ORDER BY x.band""".stripMargin,

    "q_rand_index" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv, label AS true_label
        |      FROM e WHERE vec_id % 10 = 0 AND vec_id < 5000),
        |c AS (SELECT vec_id, v, label FROM e WHERE vec_id % 10 <> 0),
        |sc AS (
        |  SELECT query_id, c.vec_id AS neighbor_id, c.label,
        |    list_dot_product(qv, c.v) /
        |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v)))
        |      AS score
        |  FROM q CROSS JOIN c),
        |rr AS (
        |  SELECT query_id, label,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, neighbor_id) AS rnk
        |  FROM sc),
        |vv AS (
        |  SELECT query_id, label, CAST(count(*) AS BIGINT) AS votes
        |  FROM rr WHERE rnk <= 10 GROUP BY 1, 2),
        |p AS (
        |  SELECT query_id, label AS pred_label FROM (
        |    SELECT query_id, label, votes,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY votes DESC, label) AS rn
        |    FROM vv) WHERE rn = 1),
        |pairs AS (
        |  SELECT q.true_label AS a, p.pred_label AS b
        |  FROM q JOIN p USING (query_id)),
        |cells AS (
        |  SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS s_cells,
        |    CAST(sum(nij) AS BIGINT) AS n
        |  FROM (SELECT count(*) AS nij FROM pairs GROUP BY a, b)),
        |ma AS (
        |  SELECT CAST(sum(ai * (ai - 1) // 2) AS BIGINT) AS s_a
        |  FROM (SELECT count(*) AS ai FROM pairs GROUP BY a)),
        |mb AS (
        |  SELECT CAST(sum(bj * (bj - 1) // 2) AS BIGINT) AS s_b
        |  FROM (SELECT count(*) AS bj FROM pairs GROUP BY b)),
        |f AS (
        |  SELECT n, s_cells, s_a, s_b,
        |    CAST(n AS HUGEINT) * (n - 1) // 2 AS t
        |  FROM cells CROSS JOIN ma CROSS JOIN mb)
        |SELECT n, s_cells, s_a, s_b,
        |  CASE WHEN t * (s_a + s_b) - 2 * CAST(s_a AS HUGEINT) * s_b = 0
        |    THEN NULL
        |  ELSE CAST(
        |    (CASE WHEN 2 * t * s_cells - 2 * CAST(s_a AS HUGEINT) * s_b < 0
        |      THEN -1 ELSE 1 END) *
        |    ((1000000 * abs(2 * t * s_cells -
        |        2 * CAST(s_a AS HUGEINT) * s_b)) //
        |     (t * (s_a + s_b) - 2 * CAST(s_a AS HUGEINT) * s_b))
        |    AS BIGINT) END AS ari_ppm
        |FROM f""".stripMargin,

    "q_benford" -> {
      val expCase =
        """CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
          |  WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181
          |  WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152
          |  WHEN 9 THEN 45757 END""".stripMargin
      s"""WITH r AS (
         |  SELECT CAST(floor(o_totalprice * 100.0) AS BIGINT) AS x
         |  FROM orders),
         |d AS (
         |  SELECT CAST(substr(CAST(x AS VARCHAR), 1, 1) AS BIGINT) AS digit
         |  FROM r WHERE x > 0),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM d),
         |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
         |      FROM d GROUP BY 1)
         |SELECT digit, n,
         |  1000000 * n // n_tot AS obs_ppm,
         |  $expCase AS exp_ppm,
         |  (1000000 * n // n_tot) - ($expCase) AS dev_ppm
         |FROM g CROSS JOIN t ORDER BY digit""".stripMargin
    },

    "q_readability" ->
      s"""WITH $linedTextSql,
         |doc AS (
         |  SELECT doc_id, array_to_string(ls, chr(10)) AS t FROM ld),
         |w AS (
         |  SELECT doc_id, t,
         |    list_filter(string_split_regex(t, '\\s+'), x -> x <> '')
         |      AS words
         |  FROM doc),
         |c AS (
         |  SELECT doc_id,
         |    greatest(1, CAST(len(string_split_regex(t, '[.!?]')) - 1
         |      AS BIGINT)) AS n_sentences,
         |    CAST(len(words) AS BIGINT) AS n_words,
         |    CAST(coalesce(list_sum(list_transform(words,
         |      x -> greatest(1, len(regexp_extract_all(lower(x),
         |        '[aeiouy]+'))))), 0) AS BIGINT) AS n_syllables
         |  FROM w)
         |SELECT doc_id, n_sentences, n_words, n_syllables,
         |  CASE WHEN n_words = 0 THEN NULL
         |  ELSE CAST(floor(1000.0 * (206.835
         |    - 1.015 * (CAST(n_words AS DOUBLE) /
         |        CAST(n_sentences AS DOUBLE))
         |    - 84.6 * (CAST(n_syllables AS DOUBLE) /
         |        CAST(n_words AS DOUBLE)))) AS BIGINT) END AS fre_milli,
         |  CASE WHEN n_words = 0 THEN NULL
         |  ELSE CAST(floor(1000.0 * (0.39 * (CAST(n_words AS DOUBLE) /
         |        CAST(n_sentences AS DOUBLE))
         |    + 11.8 * (CAST(n_syllables AS DOUBLE) /
         |        CAST(n_words AS DOUBLE)) - 15.59)) AS BIGINT)
         |  END AS fk_grade_milli
         |FROM c ORDER BY doc_id""".stripMargin,

    // the q_zorder interleave replay CARRIED through the q_hilbert
    // recursive walk — (l_orderkey, l_linenumber) is NOT unique in the
    // fixture, so a join of the two replays would multiply rows; one pass
    // computes both keys per physical row instead
    "q_sql_surface" ->
      """WITH RECURSIVE h AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(list_sum(list_transform(range(0, 16),
        |      i -> ((CAST(l_partkey AS BIGINT) >> i) & 1) * (1::BIGINT << (2*i))
        |         + ((CAST(l_suppkey AS BIGINT) >> i) & 1) * (1::BIGINT << (2*i+1))))
        |      AS BIGINT) AS zkey,
        |    CAST(l_partkey AS BIGINT) & 65535 AS x,
        |    CAST(l_suppkey AS BIGINT) & 65535 AS y,
        |    CAST(0 AS BIGINT) AS d, CAST(32768 AS BIGINT) AS s
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, zkey,
        |    CASE WHEN (y & s) = 0 THEN
        |      CASE WHEN (x & s) > 0 THEN 65535 - y ELSE y END
        |    ELSE x END AS x,
        |    CASE WHEN (y & s) = 0 THEN
        |      CASE WHEN (x & s) > 0 THEN 65535 - x ELSE x END
        |    ELSE y END AS y,
        |    d + s * s * xor(3 * CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END,
        |                    CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END) AS d,
        |    s // 2 AS s
        |  FROM h WHERE s > 0)
        |SELECT l_orderkey, l_linenumber, zkey, d AS hkey
        |FROM h WHERE s = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_vocab_coverage" ->
      """WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1])) AS token FROM t),
        |counts AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY 1),
        |r AS (
        |  SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rk
        |  FROM counts),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM counts),
        |ks(k) AS (VALUES (10), (100), (500), (2000))
        |SELECT CAST(k AS BIGINT) AS k,
        |  CAST(coalesce(sum(CASE WHEN rk <= k THEN 1 END), 0) AS BIGINT)
        |    AS vocab_size,
        |  CAST(coalesce(sum(CASE WHEN rk <= k THEN c END), 0) AS BIGINT)
        |    AS covered,
        |  tot.total,
        |  1000000 * CAST(coalesce(sum(CASE WHEN rk <= k THEN c END), 0)
        |    AS BIGINT) // tot.total AS coverage_ppm
        |FROM ks CROSS JOIN tot LEFT JOIN r ON r.rk <= ks.k
        |GROUP BY ks.k, tot.total
        |ORDER BY k""".stripMargin,

    // full-raster (18×16) replay of Multimodal.imagePixel + the one-pixel
    // perturbation — the phashHashesSql formula at native resolution
    "mm_image_stats" ->
      """WITH b AS (
        |  SELECT doc_id AS media_id, doc_id // 4 AS g, doc_id % 4 AS j,
        |    ((doc_id // 4) * 31 + (doc_id % 4) * 97) % 288 AS p
        |  FROM documents),
        |px AS (
        |  SELECT media_id,
        |    CASE WHEN j > 0 AND t.i = p
        |      THEN 255 - (((t.i % 18) * 29 + (t.i // 18) * 53 + g * 101
        |        + (((t.i % 18) + g) % 7) * (((t.i // 18) + g) % 11) * 3)
        |        % 256)
        |      ELSE (((t.i % 18) * 29 + (t.i // 18) * 53 + g * 101
        |        + (((t.i % 18) + g) % 7) * (((t.i // 18) + g) % 11) * 3)
        |        % 256)
        |    END AS v
        |  FROM b, unnest(range(0, 288)) AS t(i))
        |SELECT media_id, CAST(18 AS INTEGER) AS width,
        |  CAST(16 AS INTEGER) AS height,
        |  CAST(count(*) AS BIGINT) AS n_pixels,
        |  CAST(sum(v) AS BIGINT) AS sum_gray,
        |  CAST(min(v) AS BIGINT) AS min_gray,
        |  CAST(max(v) AS BIGINT) AS max_gray,
        |  CAST(count(*) * sum(v * v) - sum(v) * sum(v) AS BIGINT)
        |    AS var_num
        |FROM px GROUP BY 1 ORDER BY media_id""".stripMargin,

    "q_degree_dist" ->
      """WITH co AS (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS w
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2),
        |und AS (SELECT a, b FROM co WHERE w >= 2),
        |deg AS (
        |  SELECT v, CAST(count(*) AS BIGINT) AS degree FROM (
        |    SELECT a AS v FROM und UNION ALL SELECT b FROM und)
        |  GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
        |b AS (
        |  SELECT CASE WHEN degree <= 1 THEN 1::BIGINT
        |         ELSE 1::BIGINT << length(bin(degree - 1)) END
        |      AS bucket_degree,
        |    degree
        |  FROM deg)
        |SELECT bucket_degree, CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(min(degree) AS BIGINT) AS min_degree,
        |  CAST(max(degree) AS BIGINT) AS max_degree,
        |  1000000 * CAST(count(*) AS BIGINT) // tot.n AS share_ppm
        |FROM b CROSS JOIN tot GROUP BY bucket_degree, tot.n
        |ORDER BY bucket_degree""".stripMargin,

    "mm_audio_silence" ->
      """WITH par AS (
        |  SELECT doc_id AS media_id,
        |    CAST(200 + doc_id % 56 AS BIGINT) AS n
        |  FROM documents),
        |s AS (
        |  SELECT media_id, i,
        |    ((i * 37 + media_id * 211 +
        |      ((i + media_id) % 13) * (i % 97) * 5) % 65536) - 32768 AS v
        |  FROM (SELECT media_id, n, unnest(range(0, n)) AS i FROM par)),
        |sil AS (
        |  SELECT media_id, i,
        |    i - row_number() OVER (PARTITION BY media_id ORDER BY i) AS grp
        |  FROM s WHERE abs(v) < 4000),
        |runs AS (
        |  SELECT media_id, grp, CAST(count(*) AS BIGINT) AS run_len
        |  FROM sil GROUP BY 1, 2 HAVING count(*) >= 2),
        |agg AS (
        |  SELECT media_id, CAST(count(*) AS BIGINT) AS n_runs,
        |    CAST(max(run_len) AS BIGINT) AS max_run,
        |    CAST(sum(run_len) AS BIGINT) AS silent_samples
        |  FROM runs GROUP BY 1)
        |SELECT p.media_id, coalesce(a.n_runs, 0) AS n_runs,
        |  coalesce(a.max_run, 0) AS max_run,
        |  coalesce(a.silent_samples, 0) AS silent_samples
        |FROM par p LEFT JOIN agg a USING (media_id)
        |ORDER BY media_id""".stripMargin,

    "q_label_outliers" ->
      """WITH ex AS (
        |  SELECT vec_id, label, CAST(t.i AS INTEGER) AS d,
        |    CAST(floor(CAST(embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE)
        |      * 1000000.0) AS BIGINT) AS xi
        |  FROM embeddings, unnest(range(0, 64)) AS t(i)
        |  WHERE len(embedding) >= 64),
        |sums AS (
        |  SELECT label, d, CAST(sum(xi) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM ex GROUP BY 1, 2),
        |d2 AS (
        |  SELECT ex.vec_id, ex.label, max(sums.n) AS n_members,
        |    sum((CAST(ex.xi AS HUGEINT) * sums.n - sums.s) *
        |        (CAST(ex.xi AS HUGEINT) * sums.n - sums.s)) AS d2n2
        |  FROM ex JOIN sums USING (label, d)
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT label, vec_id, n_members, d2n2,
        |    row_number() OVER (PARTITION BY label
        |      ORDER BY d2n2 DESC, vec_id) AS rank
        |  FROM d2)
        |SELECT label, CAST(rank AS BIGINT) AS rank, vec_id, n_members,
        |  CAST(d2n2 // (CAST(n_members AS HUGEINT) * n_members) AS BIGINT)
        |    AS dist2_scaled
        |FROM r WHERE rank <= 3
        |ORDER BY label, rank""".stripMargin,

    "q_centroid_shift" ->
      """WITH ex AS (
        |  SELECT label, vec_id % 2 AS sp, CAST(t.i AS INTEGER) AS d,
        |    CAST(floor(CAST(embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE)
        |      * 1000000.0) AS BIGINT) AS xi
        |  FROM embeddings, unnest(range(0, 64)) AS t(i)
        |  WHERE len(embedding) >= 64),
        |pd AS (
        |  SELECT label, d,
        |    CAST(sum(CASE WHEN sp = 0 THEN xi ELSE 0 END) AS BIGINT) AS sa,
        |    CAST(sum(CASE WHEN sp <> 0 THEN xi ELSE 0 END) AS BIGINT) AS sb,
        |    CAST(sum(CASE WHEN sp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(sum(CASE WHEN sp <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM ex GROUP BY 1, 2),
        |ag AS (
        |  SELECT label, max(na) AS n_a, max(nb) AS n_b,
        |    CAST(sum(abs(sa * nb - sb * na)) AS BIGINT) AS l1_num
        |  FROM pd GROUP BY 1)
        |SELECT label, n_a, n_b, l1_num,
        |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
        |    ELSE CAST((1000 * l1_num) // (n_a * n_b * 64 * 1000000)
        |      AS BIGINT) END AS shift_milli
        |FROM ag ORDER BY label""".stripMargin)

  /** Shared pixel-exact dHash replay for the mm_phash oracles: rebuilds
    * each image's 9×8 resized gray grid straight from the generation
    * formula (`Multimodal.imagePixel` + the one-pixel group perturbation)
    * and packs the 64 neighbor-comparison bits into two BIGINT halves —
    * the same integers the Spark side gets by decoding the real BMP
    * container bytes.
    */
  private lazy val phashHashesSql: String =
    """WITH b AS (
      |  SELECT doc_id AS media_id, doc_id // 4 AS g, doc_id % 4 AS j,
      |    ((doc_id // 4) * 31 + (doc_id % 4) * 97) % 288 AS p
      |  FROM documents),
      |gr AS (
      |  SELECT media_id,
      |    list_transform(generate_series(0, 71), i ->
      |      CASE WHEN j > 0 AND 36 * (i // 9) + 2 * (i % 9) = p
      |        THEN 255 - ((2*(i%9))*29 + (2*(i//9))*53 + g*101
      |          + ((2*(i%9) + g) % 7) * ((2*(i//9) + g) % 11) * 3) % 256
      |        ELSE ((2*(i%9))*29 + (2*(i//9))*53 + g*101
      |          + ((2*(i%9) + g) % 7) * ((2*(i//9) + g) % 11) * 3) % 256
      |      END) AS gvals
      |  FROM b),
      |hs AS (
      |  SELECT media_id,
      |    CAST(list_sum(list_transform(generate_series(32, 63), k ->
      |      CASE WHEN gvals[(k//8)*9 + (k%8) + 1] < gvals[(k//8)*9 + (k%8) + 2]
      |        THEN 1::BIGINT << (k - 32) ELSE 0::BIGINT END)) AS BIGINT) AS h_hi,
      |    CAST(list_sum(list_transform(generate_series(0, 31), k ->
      |      CASE WHEN gvals[(k//8)*9 + (k%8) + 1] < gvals[(k//8)*9 + (k%8) + 2]
      |        THEN 1::BIGINT << k ELSE 0::BIGINT END)) AS BIGINT) AS h_lo
      |  FROM gr)""".stripMargin

  private lazy val mmMetaOracle: String =
    """SELECT doc_id AS media_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav'
      |       ELSE 'video/avi' END AS mime,
      |  CAST(CASE WHEN doc_id % 3 = 2 THEN 96 + doc_id % 128
      |       ELSE 64 + doc_id % 128 END AS INTEGER) AS content_len,
      |  CAST(CASE WHEN doc_id % 3 = 1 THEN 0
      |       ELSE 64 + doc_id % 960 END AS INTEGER) AS width,
      |  CAST(CASE WHEN doc_id % 3 = 1 THEN 0
      |       ELSE 64 + doc_id % 540 END AS INTEGER) AS height,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 20 + doc_id % 128
      |       ELSE 1 + doc_id % 30 END AS INTEGER) AS n_frames
      |FROM documents ORDER BY media_id""".stripMargin
}
