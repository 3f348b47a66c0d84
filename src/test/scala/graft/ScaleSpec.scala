package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pipeline, Skew}
import graft.sources.Sinks

class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** True when a file scan of `table` is reachable from `p` WITHOUT
    * crossing a join — i.e. the persisted index's raw rows are being
    * shuffled before any join consumes them (exchanges above a join
    * carry candidate rows and are legitimate). Descends through AQE
    * wrappers like TestSpark.collectDeep.
    */
  private def rawScanReachable(
      p: org.apache.spark.sql.execution.SparkPlan, table: String): Boolean = {
    import org.apache.spark.sql.execution._
    def kids(x: SparkPlan): Seq[SparkPlan] = x match {
      case a: adaptive.AdaptiveSparkPlanExec => Seq(a.initialPlan)
      case q: adaptive.QueryStageExec => Seq(q.plan)
      case r: exchange.ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p match {
      case f: FileSourceScanExec => f.toString.contains(table)
      case _: joins.BaseJoinExec => false
      case other => kids(other).exists(rawScanReachable(_, table))
    }
  }

  test("salted join equals plain join exactly") {
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val o = Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(li, o, Seq("l_orderkey"), factor = 4)
      .select("l_orderkey", "l_linenumber", "o_totalprice")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("salt spreads a hot key even when its rows are full duplicates") {
    // regression: a content-derived salt would send identical rows to ONE
    // bucket, defeating the mitigation entirely
    val hot = spark.range(10000).select(
      lit(1L).as("k"), lit("same-payload").as("v"))
    val salted = hot.repartition(8).withColumn("salt",
      pmod(monotonically_increasing_id(), lit(8L)))
    val buckets = salted.select("salt").distinct().count()
    assert(buckets == 8, s"expected 8 salt buckets for duplicate rows, got $buckets")
    // and the join still returns every row
    val small = Seq((1L, "dim")).toDF("k", "d")
    val out = graft.operators.Skew.saltedJoin(hot, small, Seq("k"), 8)
    assert(out.count() == 10000)
  }

  test("GraftSession.create registers SQL functions on a pre-existing session") {
    // the shared test session was built WITHOUT GraftExtensions;
    // create() must still make the functions callable via live registration.
    // getOrCreate applies create()'s configs (preferSortMergeJoin,
    // cores-sized shuffle.partitions, …) to the SHARED session as runtime
    // confs — snapshot and restore them, or every later suite in this JVM
    // (PlanDigestSpec's digests most of all) silently runs under
    // host-core-count-dependent settings (round-14 driver failure).
    val keys = Seq("spark.sql.shuffle.partitions",
      "spark.sql.join.preferSortMergeJoin",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      "spark.sql.adaptive.enabled",
      "spark.sql.legacy.parquet.nanosAsLong",
      "spark.sql.session.timeZone")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      val s = GraftSession.create(master = "local[4]")
      assert(s eq spark) // getOrCreate returned the existing session
      val n = s.sql("SELECT size(minhash_signature(array('a','b'), 8)) k")
        .head().getInt(0)
      assert(n == 8)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("key skew profile surfaces the heaviest keys") {
    val profDf = Skew.keySkewProfile(
      Tables.lineitem(spark, TestSpark.sf), Seq("l_returnflag"), 3)
    // the total must NOT come from an unpartitioned window (single-partition
    // WindowExec over every distinct key — the exact skew shape this
    // diagnostic detects); it is a broadcast one-row cross join instead
    val plan = profDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"skew profile must not use WindowExec:\n$plan")
    val prof = profDf.collect()
    assert(prof.length == 3)
    assert(prof.map(_.getAs[Double]("share")).sum > 0.9) // 3 flags dominate
  }

  test("bucketed tables join without a shuffle exchange") {
    Sinks.dropTable(spark, "b_orders"); Sinks.dropTable(spark, "b_lineitem")
    Sinks.writeBucketed(Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_totalprice"), "b_orders", Seq("o_orderkey"), 4)
    Sinks.writeBucketed(Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", Seq("o_orderkey"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so bucketing (not broadcast) is what
      // eliminates the exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, TestSpark.sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    Sinks.dropTable(spark, "b_orders"); Sinks.dropTable(spark, "b_lineitem")
  }

  test("persisted minhash index: corpus side never re-shuffles, results equal in-plan probe") {
    import graft.operators.Dedup
    import graft.functions.{ShingleFunctions, TextFunctions}
    val docs = Tables.documents(spark, TestSpark.sf)
    def sh = ShingleFunctions.wordShingleHashes(
      TextFunctions.tokens(col("text")), 3)
    val cfg = Dedup.LshConfig(numHashes = 64, bandRows = 2)
    val table = "graft_mh_idx_test"
    Seq("_docs", "_bands", "_meta").foreach(s => Sinks.dropTable(spark, table + s))
    Dedup.writeMinHashIndex(docs.filter(col("doc_id") % 10 =!= 0),
      "doc_id", sh, cfg, table, numBuckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force sort-merge everywhere so BUCKETING (not broadcast) is what
      // must eliminate the corpus-side exchanges
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = Dedup.minHashNearDupsAgainstIndex(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", sh,
        threshold = 0.5, table, cfg)
      // the corpus must never re-shuffle RAW: no index-table scan may feed
      // a shuffle exchange without crossing a join first (exchanges above
      // a join carry candidate pairs — batch-bound — and are fine)
      val plan = probe.queryExecution.executedPlan
      val shuffled = TestSpark.collectDeep(plan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if rawScanReachable(e.child, table) => e
      }
      assert(shuffled.isEmpty,
        s"raw index-table scan feeds a shuffle exchange:\n${shuffled.headOption}")
      // sanity: the plan actually reads the index tables (not a rewrite)
      assert(plan.toString.contains("graft_mh_idx_test"),
        "probe plan must scan the persisted index")
      // and the skew-guard aggregation over the bucketed band table is
      // exchange-free too: every remaining exchange carries batch-side data
      // negative control: the same probe WITHOUT the index (in-plan corpus)
      // does shuffle the corpus side — the assertion has teeth
      val inPlane = Dedup.minHashNearDupsAgainst(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0), "doc_id", sh, sh, 0.5, cfg)
      val ctrl = TestSpark.collectDeep(inPlane.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.child.toString.contains("parquet") => e
      }
      assert(ctrl.nonEmpty,
        "negative control: in-plan probe was expected to shuffle scans")
      // results identical to the in-plan operator
      val a = probe.collect().map(_.toSeq).toSet
      val b = inPlane.collect().map(_.toSeq).toSet
      assert(a == b, s"index probe diverged from in-plan probe " +
        s"(only-idx=${(a -- b).size}, only-inplane=${(b -- a).size})")
      // config mismatch must refuse, not silently mis-probe
      val e = intercept[IllegalArgumentException] {
        Dedup.minHashNearDupsAgainstIndex(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", sh,
          threshold = 0.5, table, Dedup.LshConfig(numHashes = 32, bandRows = 2))
      }
      assert(e.getMessage.contains("rebuild the index"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    Seq("_docs", "_bands", "_meta").foreach(s => Sinks.dropTable(spark, table + s))
  }

  test("minhash index delta-append: merge ≡ rebuild, replay is a no-op, probe stays exchange-free") {
    import graft.operators.Dedup
    import graft.functions.{ShingleFunctions, TextFunctions}
    val docs = Tables.documents(spark, TestSpark.sf)
    def sh = ShingleFunctions.wordShingleHashes(
      TextFunctions.tokens(col("text")), 3)
    val cfg = Dedup.LshConfig(numHashes = 64, bandRows = 2)
    val merged = "graft_mh_merge_test"
    val rebuilt = "graft_mh_rebuild_test"
    Seq(merged, rebuilt).foreach(t =>
      Seq("_docs", "_bands", "_meta").foreach(s => Sinks.dropTable(spark, t + s)))
    val corpus = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 7)
    val delta = docs.filter(col("doc_id") % 10 === 7)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    Dedup.writeMinHashIndex(corpus, "doc_id", sh, cfg, merged, numBuckets = 4)
    Dedup.appendToMinHashIndex(delta, "doc_id", sh, merged, cfg)
    Dedup.writeMinHashIndex(docs.filter(col("doc_id") % 10 =!= 0),
      "doc_id", sh, cfg, rebuilt, numBuckets = 4)
    // table-level equivalence: append produced exactly the rebuild's rows
    val mDocs = spark.table(s"${merged}_docs")
    assert(mDocs.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      spark.table(s"${rebuilt}_docs").select("id").collect().map(_.getLong(0)).sorted.toSeq)
    assert(spark.table(s"${merged}_bands").count() ==
      spark.table(s"${rebuilt}_bands").count())
    // replaying the same batch appends NOTHING (idempotent on id)
    val nDocs = mDocs.count(); val nBands = spark.table(s"${merged}_bands").count()
    Dedup.appendToMinHashIndex(delta, "doc_id", sh, merged, cfg)
    assert(spark.table(s"${merged}_docs").count() == nDocs,
      "replayed delta must not duplicate _docs rows")
    assert(spark.table(s"${merged}_bands").count() == nBands,
      "replayed delta must not duplicate _bands rows")
    // probe-level equivalence + the merged index still probes exchange-free
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pM = Dedup.minHashNearDupsAgainstIndex(batch, "doc_id", sh, 0.5, merged, cfg)
      val pR = Dedup.minHashNearDupsAgainstIndex(batch, "doc_id", sh, 0.5, rebuilt, cfg)
      assert(pM.collect().map(_.toSeq).toSet == pR.collect().map(_.toSeq).toSet,
        "probe over the appended index diverged from the full rebuild")
      val shuffled = TestSpark.collectDeep(pM.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if rawScanReachable(e.child, merged) => e
      }
      assert(shuffled.isEmpty,
        s"merged-index scan feeds a shuffle exchange:\n${shuffled.headOption}")
      // config mismatch must refuse an append (mixed-config index corruption)
      val e = intercept[IllegalArgumentException] {
        Dedup.appendToMinHashIndex(delta, "doc_id", sh, merged,
          Dedup.LshConfig(numHashes = 32, bandRows = 2))
      }
      assert(e.getMessage.contains("mixed-config"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    Seq(merged, rebuilt).foreach(t =>
      Seq("_docs", "_bands", "_meta").foreach(s => Sinks.dropTable(spark, t + s)))
  }

  test("indexed streaming door: the micro-batch probe reads the door-built index exchange-free") {
    // the steady-state ingest loop's per-trigger probe
    // (streamDedupIngestIndexed → minHashNearDupsAgainstIndex) must stay
    // exchange-free over an index the DOOR itself built through
    // bootstrap-empty + per-batch delta-appends — the plan shape a
    // deployment sees on every trigger at 100 TB
    import graft.operators.Dedup
    import graft.functions.{ShingleFunctions, TextFunctions}
    val docs = Tables.documents(spark, TestSpark.sf)
    def sh = ShingleFunctions.wordShingleHashes(
      TextFunctions.tokens(col("text")), 3)
    val cfg = Dedup.LshConfig(numHashes = 64, bandRows = 2)
    val table = "graft_mh_door_test"
    val tmp = java.nio.file.Files.createTempDirectory("graft-door-plan")
    val sink = s"$tmp/corpus"
    Dedup.writeMinHashIndex(docs.limit(0), "doc_id", sh, cfg, table,
      numBuckets = 4)
    // two micro-batches through the door's real batch body
    Seq(1, 2).foreach { m =>
      graft.streaming.Streams.dedupIngestBatchIndexed(
        docs.filter(col("doc_id") % 3 === m), sink, "doc_id", sh, 0.5,
        cfg, table)
    }
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the probe the NEXT trigger would run, against the door-built index
      val probe = Dedup.minHashNearDupsAgainstIndex(
        docs.filter(col("doc_id") % 3 === 0), "doc_id", sh, 0.5, table, cfg)
      val shuffled = TestSpark.collectDeep(probe.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if rawScanReachable(e.child, table) => e
      }
      assert(shuffled.isEmpty,
        s"door-built index scan feeds a shuffle exchange:\n${shuffled.headOption}")
      assert(probe.queryExecution.executedPlan.toString.contains(table),
        "probe plan must scan the door-built index")
      // and the door-built index is a faithful index of the door's sink
      val sinkIds = spark.read.parquet(sink).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(spark.table(s"${table}_docs").select("id")
        .collect().map(_.getLong(0)).sorted.toSeq == sinkIds,
        "door-built index must mirror the door's sink")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    Seq("_docs", "_bands", "_meta").foreach(s => Sinks.dropTable(spark, table + s))
  }

  test("index compaction: one file per bucket restored, probes bit-identical, no recompute") {
    import graft.operators.Dedup
    import graft.functions.{ShingleFunctions, TextFunctions}
    val docs = Tables.documents(spark, TestSpark.sf)
    def sh = ShingleFunctions.wordShingleHashes(
      TextFunctions.tokens(col("text")), 3)
    val cfg = Dedup.LshConfig(numHashes = 64, bandRows = 2)
    val table = "graft_mh_cpt_test"
    Seq("_docs", "_bands", "_meta", "_docs_cstg", "_bands_cstg").foreach(s =>
      Sinks.dropTableAndLocation(spark, table + s))
    // build from 80%, then TWO separate appends (7- and 17-strata of
    // doc_id % 20) — each append adds a file generation per bucket
    Dedup.writeMinHashIndex(
      docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 7),
      "doc_id", sh, cfg, table, numBuckets = 4)
    Dedup.appendToMinHashIndex(
      docs.filter(col("doc_id") % 20 === 7), "doc_id", sh, table, cfg)
    Dedup.appendToMinHashIndex(
      docs.filter(col("doc_id") % 20 === 17), "doc_id", sh, table, cfg)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val before = Dedup.minHashNearDupsAgainstIndex(
      batch, "doc_id", sh, 0.5, table, cfg).collect().map(_.toSeq).toSet
    val filesBefore = spark.table(s"${table}_docs").inputFiles.length
    assert(filesBefore > 4,
      s"two appends must leave >4 files over 4 buckets, got $filesBefore")
    Dedup.compactMinHashIndex(spark, table)
    assert(spark.table(s"${table}_docs").inputFiles.length == 4,
      "compaction must restore one file per bucket in _docs")
    assert(spark.table(s"${table}_bands").inputFiles.length == 4,
      "compaction must restore one file per bucket in _bands")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = Dedup.minHashNearDupsAgainstIndex(
        batch, "doc_id", sh, 0.5, table, cfg)
      assert(probe.collect().map(_.toSeq).toSet == before,
        "probe diverged across compaction")
      // the compacted table still carries its bucket spec: the probe's
      // corpus side remains exchange-free after the staging-table swap
      val shuffled = TestSpark.collectDeep(probe.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if rawScanReachable(e.child, table) => e
      }
      assert(shuffled.isEmpty,
        s"compacted-index scan feeds a shuffle exchange:\n${shuffled.headOption}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // semantic twin: same IO-only contract on _docs/_cells
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val ncells = graft.operators.Similarity.ivfCellCount(corpus.count())
    val anchors = corpus.orderBy("vec_id").limit(ncells)
      .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
    val sem = "graft_sem_cpt_test"
    Seq("_cells", "_docs", "_centroids", "_meta", "_cells_cstg", "_docs_cstg")
      .foreach(s => Sinks.dropTableAndLocation(spark, sem + s))
    Dedup.writeSemanticIvfIndex(corpus.filter(col("vec_id") % 10 =!= 7),
      "vec_id", "embedding", anchors, sem, numBuckets = 4)
    Dedup.appendToSemanticIvfIndex(corpus.filter(col("vec_id") % 10 === 7),
      "vec_id", "embedding", sem)
    val ebatch = emb.filter(col("vec_id") % 10 === 0)
    val sBefore = Dedup.semanticNearDupsIvfAgainstIndex(ebatch, "vec_id",
      "embedding", 0.3, sem).collect().map(_.toSeq).toSet
    Dedup.compactSemanticIvfIndex(spark, sem)
    assert(spark.table(s"${sem}_docs").inputFiles.length == 4)
    // _cells buckets by cell id (only ~8 distinct values here) — an empty
    // bucket writes no file, so "one file per NON-EMPTY bucket"
    assert(spark.table(s"${sem}_cells").inputFiles.length <= 4)
    assert(Dedup.semanticNearDupsIvfAgainstIndex(ebatch, "vec_id",
      "embedding", 0.3, sem).collect().map(_.toSeq).toSet == sBefore,
      "semantic probe diverged across compaction")
    Seq("_docs", "_bands", "_meta", "_docs_cstg", "_bands_cstg").foreach(s =>
      Sinks.dropTableAndLocation(spark, table + s))
    Seq("_cells", "_docs", "_centroids", "_meta", "_cells_cstg", "_docs_cstg")
      .foreach(s => Sinks.dropTableAndLocation(spark, sem + s))
  }

  test("persisted semantic-IVF index: corpus never re-shuffles; probe equals in-plan pairs") {
    import graft.operators.{Dedup, Similarity}
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val batch = emb.filter(col("vec_id") % 10 === 0)
    val ncells = Similarity.ivfCellCount(corpus.count())
    val anchors = corpus.orderBy("vec_id").limit(ncells)
      .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
    val table = "graft_sem_idx_test"
    Dedup.writeSemanticIvfIndex(corpus, "vec_id", "embedding", anchors,
      table, numBuckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = Dedup.semanticNearDupsIvfAgainstIndex(batch, "vec_id",
        "embedding", threshold = 0.3, table)
      val shuffled = TestSpark.collectDeep(probe.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if rawScanReachable(e.child, table) => e
      }
      assert(shuffled.isEmpty,
        s"raw semantic-index scan feeds a shuffle:\n${shuffled.headOption}")
      assert(probe.queryExecution.executedPlan.toString.contains(table),
        "probe plan must scan the persisted index")
      // reference: the symmetric IVF operator with identical anchors,
      // restricted to (batch, corpus) pairs — the index probe must find
      // exactly those (both route with nassign=2 under the same cells)
      val sym = Dedup.semanticNearDupsIvf(emb, "vec_id", "embedding",
          threshold = 0.3, cells = anchors, nassign = 2)
        .filter((col("id_1") % 10 === 0) =!= (col("id_2") % 10 === 0))
        .select(
          when(col("id_1") % 10 === 0, col("id_1")).otherwise(col("id_2"))
            .as("id_new"),
          when(col("id_1") % 10 === 0, col("id_2")).otherwise(col("id_1"))
            .as("id_corpus"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = probe.select("id_new", "id_corpus")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == sym, s"index probe diverged from the symmetric " +
        s"operator's cross pairs (only-idx=${(got -- sym).size}, " +
        s"only-sym=${(sym -- got).size})")
      assert(got.nonEmpty, "fixture must produce cross pairs at 0.3")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    Seq("_cells", "_docs", "_centroids", "_meta").foreach(s =>
      Sinks.dropTableAndLocation(spark, table + s))
  }

  test("semantic-IVF delta-append: merge ≡ rebuild under the frozen quantizer, replay no-op, refusals") {
    import graft.operators.{Dedup, Similarity}
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val ncells = Similarity.ivfCellCount(corpus.count())
    val anchors = corpus.orderBy("vec_id").limit(ncells)
      .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
    val merged = "graft_sem_merge_test"
    val rebuilt = "graft_sem_rebuild_test"
    Seq(merged, rebuilt).foreach(t =>
      Seq("_cells", "_docs", "_centroids", "_meta").foreach(s =>
        Sinks.dropTableAndLocation(spark, t + s)))
    // quantizer provisioned for the FULL corpus and frozen; the index is
    // built without the 7-stratum, which then arrives as an ingest batch
    Dedup.writeSemanticIvfIndex(corpus.filter(col("vec_id") % 10 =!= 7),
      "vec_id", "embedding", anchors, merged, numBuckets = 4)
    Dedup.appendToSemanticIvfIndex(corpus.filter(col("vec_id") % 10 === 7),
      "vec_id", "embedding", merged)
    Dedup.writeSemanticIvfIndex(corpus, "vec_id", "embedding", anchors,
      rebuilt, numBuckets = 4)
    // table-level: the appended index holds exactly the rebuild's rows
    def pairs(t: String) = spark.table(s"${t}_cells")
      .select(col("cell").cast("long"), col("id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(merged) == pairs(rebuilt),
      "merged (cell, id) assignments diverge from the full rebuild")
    assert(spark.table(s"${merged}_docs").select("id").collect()
        .map(_.getLong(0)).sorted.toSeq ==
      spark.table(s"${rebuilt}_docs").select("id").collect()
        .map(_.getLong(0)).sorted.toSeq)
    // replaying the same batch appends NOTHING (idempotent on id)
    val nDocs = spark.table(s"${merged}_docs").count()
    val nCells = spark.table(s"${merged}_cells").count()
    Dedup.appendToSemanticIvfIndex(corpus.filter(col("vec_id") % 10 === 7),
      "vec_id", "embedding", merged)
    assert(spark.table(s"${merged}_docs").count() == nDocs)
    assert(spark.table(s"${merged}_cells").count() == nCells)
    // probe-level: identical results, and the merged index probes
    // exchange-free (bucket spec preserved across the append)
    val batch = emb.filter(col("vec_id") % 10 === 0)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pM = Dedup.semanticNearDupsIvfAgainstIndex(batch, "vec_id",
        "embedding", threshold = 0.3, merged)
      val pR = Dedup.semanticNearDupsIvfAgainstIndex(batch, "vec_id",
        "embedding", threshold = 0.3, rebuilt)
      assert(pM.collect().map(_.toSeq).toSet == pR.collect().map(_.toSeq).toSet,
        "probe over the appended IVF index diverged from the full rebuild")
      val shuffled = TestSpark.collectDeep(pM.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if rawScanReachable(e.child, merged) => e
      }
      assert(shuffled.isEmpty,
        s"merged-index scan feeds a shuffle exchange:\n${shuffled.headOption}")
      // nassign mismatch must refuse the append, not corrupt the index
      val e = intercept[IllegalArgumentException] {
        Dedup.appendToSemanticIvfIndex(
          corpus.filter(col("vec_id") % 10 === 7), "vec_id", "embedding",
          merged, nassign = 1)
      }
      assert(e.getMessage.contains("mixed-config"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    Seq(merged, rebuilt).foreach(t =>
      Seq("_cells", "_docs", "_centroids", "_meta").foreach(s =>
        Sinks.dropTableAndLocation(spark, t + s)))
  }

  test("semanticIvfIndexDrift: same-distribution batch keeps the index; rotated clusters trigger re-cluster") {
    import graft.operators.{Dedup, Similarity}
    import spark.implicits._
    // 4 tight clusters on axes 0-3 of 16 dims, 64 corpus vectors
    def clusterVec(axis: Int, i: Int): Array[Float] =
      Array.tabulate(16)(j =>
        (if (j == axis) 10.0f else 0.0f) + 0.01f * ((i * 16 + j) % 7))
    val corpus = (0 until 64).map(i => (i.toLong, clusterVec(i % 4, i)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(corpus, "embedding", nlist = 4,
      iters = 3)
    val table = "graft_sem_idx_drift_test"
    Dedup.writeSemanticIvfIndex(corpus, "vec_id", "embedding",
      cents.select(col("cell").cast("long").as("cell"), col("centroid")),
      table, numBuckets = 4)
    try {
      // batch from the SAME clusters: fresh quantizer reproduces the
      // index partition → shift far below the 20% floor
      val same = (100 until 148).map(i => (i.toLong, clusterVec(i % 4, i)))
        .toDF("vec_id", "embedding")
      val sRow = Dedup.semanticIvfIndexDrift(same, "vec_id", "embedding",
        table).collect().head
      assert(!sRow.getAs[Boolean]("recluster_recommended"),
        s"same-distribution batch must keep the index: $sRow")
      assert(sRow.getAs[Long]("n_routed") == 48L)
      assert(sRow.getAs[Long]("n_shifted") * 1000000L <
        100000L * sRow.getAs[Long]("n_routed"),
        s"same-distribution shift should sit far below the floor: $sRow")
      // batch whose clusters ROTATED to axes 8-11: index cells carve the
      // new mass arbitrarily while the fresh quantizer tracks it → a
      // large assignment-shift share, past the floor
      val drifted = (200 until 248)
        .map(i => (i.toLong, clusterVec(8 + i % 4, i)))
        .toDF("vec_id", "embedding")
      val dRow = Dedup.semanticIvfIndexDrift(drifted, "vec_id", "embedding",
        table).collect().head
      assert(dRow.getAs[Boolean]("recluster_recommended"),
        s"rotated-cluster batch must recommend re-clustering: $dRow")
    } finally Seq("_cells", "_docs", "_centroids", "_meta").foreach(s =>
      Sinks.dropTableAndLocation(spark, table + s))
  }

  test("zorder layout enables file skipping on the SECOND dimension too") {
    import graft.functions.LayoutFunctions
    val li = Tables.lineitem(spark, TestSpark.sf).select("l_partkey", "l_suppkey")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // range-normalize: suppkey (0..9, 4 bits) scaled up to partkey's 8-bit
    // width — interleave weights bit positions equally (see scaladoc)
    li.withColumn("zkey",
        LayoutFunctions.zorderKey(col("l_partkey"), col("l_suppkey") * 16))
      .repartitionByRange(8, col("zkey")).sortWithinPartitions("zkey")
      .drop("zkey").write.mode("overwrite").parquet(s"$dir/zorder")
    li.repartitionByRange(8, col("l_partkey")).sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$dir/single")
    // per-file min/max stats are what row-group/file skipping reads; count
    // the files a point predicate on l_suppkey would have to open
    def filesNeeded(path: String, v: Long): (Long, Long) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("l_suppkey")).cast("long").as("lo"),
          max(col("l_suppkey")).cast("long").as("hi"))
      (stats.count(), stats.filter(col("lo") <= v && col("hi") >= v).count())
    }
    // Hilbert layout: same normalization, same skipping property (plus the
    // unit-step locality SketchSpec proves on the exhaustive grid)
    li.withColumn("hkey",
        LayoutFunctions.hilbertKey(col("l_partkey"), col("l_suppkey") * 16))
      .repartitionByRange(8, col("hkey")).sortWithinPartitions("hkey")
      .drop("hkey").write.mode("overwrite").parquet(s"$dir/hilbert")
    val (zTotal, zNeeded) = filesNeeded(s"$dir/zorder", 5L)
    val (hTotal, hNeeded) = filesNeeded(s"$dir/hilbert", 5L)
    val (sTotal, sNeeded) = filesNeeded(s"$dir/single", 5L)
    // the partkey-sorted layout smears every suppkey across every file; the
    // z-ordered layout confines each suppkey band to a subset of files
    assert(sNeeded == sTotal, s"single-dim control: expected no skipping, $sNeeded/$sTotal")
    assert(zNeeded < zTotal, s"zorder: expected some file skipped, $zNeeded/$zTotal")
    assert(hNeeded < hTotal, s"hilbert: expected some file skipped, $hNeeded/$hTotal")
  }

  test("date-partitioned layout prunes partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/ev"
    val ev = Tables.events(spark, TestSpark.sf)
      .withColumn("event_day", to_date(col("ts")))
    Sinks.writePartitioned(ev, dir, Seq("event_day"))
    val pruned = spark.read.parquet(dir)
      .filter(col("event_day") === "2024-01-02")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("event_day"),
      s"expected partition filters in scan:\n$scan")
    val expected = ev.filter(to_date(col("ts")) === "2024-01-02").count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("W2 truncation guard reports over-length values before write") {
    val df = Seq(("ok", "shortish"), ("too-long-value-here", "x"))
      .toDF("a", "b")
    val bad = Pipeline.truncationViolations(df, Map("a" -> 10, "b" -> 50))
      .collect()
    assert(bad.length == 1)
    assert(bad.head.getAs[String]("column") == "a")
    assert(bad.head.getAs[Int]("length") > 10)
  }

  test("lshTopK candidate join is an equi-join, not a nested-loop scan") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val out = graft.operators.Similarity.lshTopK(
      emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 5,
      bandBits = 4, numBands = 16)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"LSH candidate generation must be a hash-partitionable equi-join:\n$plan")
  }

  test("cdc overlap join is an equi-join on chunk hashes, not a cross product") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val out = graft.operators.TextAnalysis.cdcNearDups(
      docs, "text", "doc_id", minShared = 3L, maxDocFreq = 200L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"CDC overlap must stay a hash equi-join:\n$plan")
  }

  test("inverted index: stopword cut precedes the collect aggregation") {
    import graft.functions.TextFunctions
    val docs = Tables.documents(spark, TestSpark.sf)
    val out = graft.operators.TextAnalysis.invertedIndex(docs,
      TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 2),
      "doc_id", maxPostingDf = 40L)
    val plan = out.queryExecution.executedPlan.toString
    // the posting-list aggregation's input subtree must contain the
    // anti-join (hot terms removed before any collect buffer fills)
    val collectIdx = plan.indexOf("collect_list")
    val antiIdx = plan.indexOf("LeftAnti", collectIdx)
    assert(collectIdx >= 0 && antiIdx > collectIdx,
      s"anti-join must feed collect_list, not follow it:\n$plan")
    // dfs is eagerly checkpointed at operator build (pass 1); the returned
    // plan re-reads the corpus only for the postings side (pass 2) — both
    // hot set and final join hit the checkpoint, so exactly one FileScan
    // remains (three before the checkpoint was added)
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans <= 1, s"expected 1 corpus scan in the plan, saw $scans:\n$plan")
  }

  test("pqEncode plans as a narrow projection — no shuffle, no join") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val books = Similarity.pqCodebooks(emb, "embedding", m = 4, ksub = 8)
    val plan = Similarity.pqEncode(emb, "vec_id", "embedding", books, 4, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"PQ encode must stay map-only:\n$plan")
  }

  test("ivfTopK plan joins broadcast centroids — no nested-loop over corpus pairs") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val out = graft.operators.Similarity.ivfTopK(
      emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 5,
      nlist = 8, nprobe = 4)
    val plan = out.queryExecution.executedPlan.toString
    // the only nested-loop allowed is the bounded corpus×centroid cross join
    // (nlist rows broadcast); the probe join on cell must be a hash join
    assert(plan.contains("BroadcastHashJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("SortMergeJoin"),
      s"IVF probe should be an equi-join on cell:\n$plan")
  }

  test("minhash bucket-size guard runs without a window sort over the banded set") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val pairs = graft.operators.Dedup.minHashNearDups(docs, "doc_id",
      graft.functions.ShingleFunctions.wordShingleHashes(
        graft.functions.TextFunctions.tokens(col("text")), 3), 0.5,
      graft.operators.Dedup.LshConfig(numHashes = 64, bandRows = 2))
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window"),
      s"bucket guard should be groupBy + anti-join, not a window:\n$plan")
  }

  test("Bloom pre-join: identical result to plain anti-join, joins fewer rows") {
    val li = Tables.lineitem(spark, TestSpark.sf)
    val cutoff = lit("1997-01-01").cast(org.apache.spark.sql.types.TimestampType)
    val batch = li.filter(col("l_shipdate") >= cutoff)
      .select("l_orderkey", "l_partkey").distinct()
    val sink = li.filter(col("l_shipdate") < cutoff)
      .select("l_orderkey", "l_partkey")
    val keys = Seq("l_orderkey", "l_partkey")
    val plain = Pipeline.idempotentNewRows(batch, sink, keys)
      .collect().map(_.toSeq).toSet
    val bloomed = Pipeline.idempotentNewRowsBloom(batch, sink, keys,
      expectedSinkKeys = 10000L, fpp = 0.01)
    assert(bloomed.collect().map(_.toSeq).toSet == plain)
    // the exact-check branch (bloom said "maybe") must be far smaller than
    // the batch: only true dups + ~fpp of the new rows survive the probe
    def keyHash(df: org.apache.spark.sql.DataFrame) =
      xxhash64(keys.map(df(_)): _*)
    val bloom = sink.stat.bloomFilter(keyHash(sink), 10000L, 0.01)
    val deduped = batch.dropDuplicates(keys)
    val surviving = deduped
      .filter(graft.functions.BloomFunctions.mightContain(keyHash(deduped), bloom))
      .count()
    val trueDups = deduped.join(sink, keys, "left_semi").count()
    assert(surviving < trueDups + (deduped.count() * 0.05).toLong + 10,
      s"bloom should prune the anti-join input: $surviving rows survived, $trueDups true dups")
  }

  test("tokenChunks plans as a map-only pass — no shuffle exchange") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val out = graft.operators.TextAnalysis.tokenChunks(docs, "text",
      "doc_id", window = 16, stride = 12)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"chunking must not shuffle:\n$plan")
  }

  test("mixtureSample: broadcast count join, no window, no sort-merge") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val out = graft.operators.Sampling.mixtureSample(docs, col("doc_id"),
      col("source"), Map("src0" -> 200000L), 33333L, 100L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"per-source thresholds must ride a broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      s"mixture filter must not shuffle the corpus or use windows:\n$plan")
  }

  test("rrfFuse ranks without any single-partition window") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val r1 = docs.select(col("doc_id").as("id"),
      col("n_chars").cast("double").as("score"))
    val r2 = docs.select(col("doc_id").as("id"),
      (col("doc_id") % 97).cast("double").as("score"))
    val out = graft.operators.Retrieval.rrfFuse(Seq(r1, r2),
      perRanker = 50, topK = 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"rrf ranks must come from the bounded array sort, not a window:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"per-ranker truncation must plan as TakeOrdered:\n$plan")
  }

  test("randomWalks steps are hash equi-joins, never nested-loop or cartesian") {
    val es = (1L to 80L).map(i => (i % 17, (i * 5 + 1) % 17)).toDF("src", "dst")
    val out = graft.operators.Graph.randomWalks(es, Seq(0L, 3L).toDF("node"),
      steps = 3, walksPerNode = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"walk steps must join on (node, idx) keys:\n$plan")
  }

  test("multimodal resize/frame-sample plumbing: typed, deterministic, count-correct") {
    import graft.sources.Multimodal
    val media = Multimodal.synthesize(spark, Tables.documents(spark, TestSpark.sf))
    val resized = Multimodal.resizeStub(media, 224, 224)
    val r1 = resized.collect().map(r => r.media_id -> r.content.toSeq).toMap
    val r2 = Multimodal.resizeStub(media, 224, 224)
      .collect().map(r => r.media_id -> r.content.toSeq).toMap
    assert(r1 == r2) // deterministic across runs
    assert(r1.values.map(_.length).toSet.size == 1) // box-sized output

    val frames = Multimodal.frameSample(media, everyN = 10).collect()
    val byId = frames.groupBy(_.media_id)
    media.collect().foreach { m =>
      val expected =
        if (m.mime == "video/avi") ((1 + m.media_id % 30).toInt - 1) / 10 + 1
        else 1
      assert(byId(m.media_id).length == expected, s"media ${m.media_id}")
      assert(byId(m.media_id).map(_.frame_idx).forall(_ % 10 == 0))
    }
  }

  test("media container headers round-trip: writer fields == parsed fields") {
    import graft.sources.MediaFormats
    val hb = MediaFormats.parse(
      MediaFormats.bmpBytes(123, 456, Array.fill(10)(0x7f.toByte))).get
    assert(hb.format == "bmp" && hb.width == 123 && hb.height == 456 && hb.nFrames == 1)
    val hw = MediaFormats.parse(MediaFormats.wavBytes(44100, new Array[Byte](321))).get
    assert(hw.format == "wav" && hw.sampleRate == 44100 &&
      hw.nFrames == 321 && hw.channels == 1)
    val ha = MediaFormats.parse(MediaFormats.aviBytes(640, 480, 17, new Array[Byte](5))).get
    assert(ha.format == "avi" && ha.width == 640 && ha.height == 480 && ha.nFrames == 17)
    // garbage is rejected, not misparsed
    assert(MediaFormats.parse("not a container".getBytes).isEmpty)
  }

  test("binaryFile source leg produces the same features as synthesized media") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-mm").toString
    graft.sources.Multimodal.ensureFixtureFiles(spark, docs, dir)
    val viaFiles = graft.sources.Multimodal.decode(
      graft.sources.Multimodal.readBinaryFiles(spark, dir))
      .toDF().orderBy("media_id").collect().map(_.toSeq).toSet
    val viaSynth = graft.sources.Multimodal.decode(
      graft.sources.Multimodal.synthesize(spark, docs))
      .toDF().orderBy("media_id").collect().map(_.toSeq).toSet
    assert(viaFiles == viaSynth)
    assert(viaFiles.nonEmpty)
  }

  test("embeddingNearDups refuses an oversized broadcast probe set") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dedup.embeddingNearDups(
        emb, "vec_id", "embedding", col("vec_id") < 100, 0.3,
        maxProbeRows = 10L)
    }
    assert(e.getMessage.contains("probe set"))
  }

  test("hash split is stable across partitionings and families agree on determinism") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, TestSpark.sf)
    def labels(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        Sampling.splitLabel(Sampling.hashBucket(Seq(col("text")))).as("s"))
      .as[(Long, String)].collect().toMap
    val a = labels(docs)
    val b = labels(docs.repartition(17))
    assert(a == b) // content-hash split ignores physical layout
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    // identical content -> identical split, regardless of id
    val twice = Seq((1L, "same text"), (2L, "same text"))
      .toDF("doc_id", "text")
    assert(labels(twice).values.toSet.size == 1)
  }

  test("empty-input union yields typed empty frame with explicit schema") {
    val schema = Tables.customer(spark, TestSpark.sf).schema
    val out = Pipeline.unionAllOrEmpty(spark, Seq.empty, schema)
    assert(out.count() == 0)
    assert(out.schema == schema)
  }

  test("rocAuc plans without a global-order window over the score rows") {
    val ev = Tables.events(spark, TestSpark.sf)
    val out = graft.operators.Stats.rocAuc(ev, col("value"),
      (col("event_id") % 3 === 0).cast("long"), col("event_id"))
    val plan = out.queryExecution.executedPlan.toString
    // orderedRank's only window partitions by (stratum, bucket) — a
    // global-order Window would show an empty partition spec with an
    // ordering over the raw score
    val globalWindows = "Window \\[.*\\], \\[\\]".r.findAllIn(plan).size
    assert(globalWindows == 0,
      s"AUC ranks must come from bucketed prefix sums:\n$plan")
  }

  test("feature hash / length buckets / preference pairs plan without windows") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val fh = graft.operators.TextAnalysis.featureHash(docs, col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")), numBuckets = 64)
    assert(!fh.queryExecution.executedPlan.toString.contains("Window"))
    val lb = graft.operators.Sampling.lengthBuckets(
      docs.withColumn("nt", size(split(col("text"), " "))),
      col("source"), col("nt"))
    assert(!lb.queryExecution.executedPlan.toString.contains("Window"))
    val ev = Tables.events(spark, TestSpark.sf)
    val pp = graft.operators.Sampling.preferencePairs(ev, col("user_id"),
      col("event_id"), col("value"))
    val ppPlan = pp.queryExecution.executedPlan.toString
    assert(!ppPlan.contains("Window"),
      s"chosen/rejected must come from max/min(struct), not windows:\n$ppPlan")
  }

  test("persisted-index probe: per-batch shuffle volume does not scale with the corpus") {
    // The O(batch) gate for the door's steady-state cost claim (round-13,
    // verdict #6): the SAME batch probed through a ~9×-larger index must
    // shuffle ~the same number of records — the corpus side reads its
    // bucketed tables exchange-free, so only batch-derived rows may enter
    // an exchange. If a code change reintroduces a corpus-sized scan into
    // the micro-batch's shuffle path (lost bucket alignment, a demoted
    // broadcast, re-signaturing the corpus), the large-index leg blows
    // past the small-index leg and this fails. Records are measured at
    // the task level (shuffle WRITE records across all stages of the
    // probe's jobs), not inferred from the plan — a metric gate, not a
    // shape gate.
    import graft.operators.Dedup
    import graft.functions.{ShingleFunctions, TextFunctions}
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def sh = ShingleFunctions.wordShingleHashes(
      TextFunctions.tokens(col("text")), 3)
    val cfg = Dedup.LshConfig(numHashes = 64, bandRows = 2)
    val batch = docs.filter(col("doc_id") % 20 === 0)
    val smallCorpus = docs.filter(col("doc_id") % 20 === 1)    // ~5 %
    val largeCorpus = docs.filter(col("doc_id") % 20 =!= 0)    // ~95 %
    val (tS, tL) = ("graft_mh_obatch_s", "graft_mh_obatch_l")
    def cleanup(): Unit = for (t <- Seq(tS, tL);
                               s <- Seq("_docs", "_bands", "_meta"))
      Sinks.dropTableAndLocation(spark, t + s)
    cleanup()
    Dedup.writeMinHashIndex(smallCorpus, "doc_id", sh, cfg, tS, numBuckets = 4)
    Dedup.writeMinHashIndex(largeCorpus, "doc_id", sh, cfg, tL, numBuckets = 4)
    // Measurement isolation (round-13 advice): attribute task metrics by
    // JOB GROUP, not by wall-clock window — a lagging listener-bus event
    // from a prior test (or a parallel suite on the same SparkContext)
    // must not leak records into this gate, and "counter stopped moving"
    // is not "bus drained" on a slow bus. Stages are mapped to the probe's
    // group at onJobStart; the drain barrier is a MARKER job in its own
    // group — the bus delivers events to a listener in order, so once the
    // marker's job-end reaches THIS listener, every earlier task-end from
    // the probe has too.
    def shuffleRecordsDuring(label: String)(body: => Unit): Long = {
      val sc = spark.sparkContext
      val group = s"graft-obatch-$label"
      val markerGroup = s"$group-drain"
      val recs = new java.util.concurrent.atomic.AtomicLong(0)
      val groupStages = java.util.concurrent.ConcurrentHashMap
        .newKeySet[Int]()
      val markerJobs = java.util.concurrent.ConcurrentHashMap
        .newKeySet[Int]()
      @volatile var drained = false
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val g = Option(js.properties)
            .map(_.getProperty("spark.jobGroup.id")).orNull
          if (g == group) { js.stageIds.foreach(id => groupStages.add(id)); () }
          else if (g == markerGroup) { markerJobs.add(js.jobId); () }
        }
        // stage RETRIES get fresh ids the job-start event never saw;
        // stage-submitted events carry the group too, so map them as well
        override def onStageSubmitted(
            ss: org.apache.spark.scheduler.SparkListenerStageSubmitted)
            : Unit = {
          val g = Option(ss.properties)
            .map(_.getProperty("spark.jobGroup.id")).orNull
          if (g == group) { groupStages.add(ss.stageInfo.stageId); () }
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          if (markerJobs.contains(je.jobId)) drained = true
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null && groupStages.contains(te.stageId)) {
            recs.addAndGet(m.shuffleWriteMetrics.recordsWritten); ()
          }
        }
      }
      sc.addSparkListener(listener)
      try {
        sc.setJobGroup(group, "O(batch) shuffle metric probe")
        try body finally sc.clearJobGroup()
        sc.setJobGroup(markerGroup, "listener-bus drain marker")
        try { spark.range(1).count(); () } finally sc.clearJobGroup()
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (!drained && System.nanoTime() < deadline) Thread.sleep(20)
        assert(drained, "listener bus failed to deliver the drain marker " +
          "within 60s — metric attribution would be incomplete")
        recs.get()
      } finally sc.removeSparkListener(listener)
    }
    val rS = shuffleRecordsDuring("small") {
      Dedup.minHashNearDupsAgainstIndex(batch, "doc_id", sh, 0.5, tS, cfg)
        .write.format("noop").mode("overwrite").save()
    }
    val rL = shuffleRecordsDuring("large") {
      Dedup.minHashNearDupsAgainstIndex(batch, "doc_id", sh, 0.5, tL, cfg)
        .write.format("noop").mode("overwrite").save()
    }
    // corpus-sized leakage would add ~corpus×bands records (≈15 000 here)
    // to the large leg; batch-derived work is identical on both. Allow
    // 2× + slack for candidate-count growth (more bucket-mates in the
    // larger index is legitimate batch-side fan-out, bounded by
    // batch×bucket-mates — the corpus's own rows still never shuffle).
    val corpusBandRows = spark.table(s"${tL}_bands").count()
    assert(rL < math.max(2 * rS, rS + corpusBandRows / 4),
      s"probe shuffled $rL records against the large index vs $rS against " +
        s"the small one (corpus band rows: $corpusBandRows) — a " +
        "corpus-sized scan entered the micro-batch's shuffle path")
    cleanup()
  }

  test("centroidShift and labelOutliers never self-join the corpus") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    for (df <- Seq(
        graft.operators.Similarity.centroidShift(emb, col("label"),
          pmod(col("vec_id"), lit(2L)), col("embedding"), dim = 64),
        graft.operators.Similarity.labelOutliers(emb, col("vec_id"),
          col("label"), col("embedding"), dim = 64, k = 3))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin") &&
        !plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"centroid paths must broadcast bounded sums, not join the corpus:\n$plan")
    }
  }
}
