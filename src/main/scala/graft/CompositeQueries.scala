package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Pipeline

/** Remaining SURVEY.md §2 scalar-function rows (F10/F12/F13, J5, cube,
  * sketch aggregates) and the composite flagship pipeline — the reference's
  * entire DAG `1_process_evidence_images` as ONE logical plan.
  */
object CompositeQueries {
  private val D = DecimalType(18, 2)
  private def dec(c: org.apache.spark.sql.Column) = c.cast(D)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- F10 + F12 + F13: timestamp formatting, prefix extraction,
    //      path basename cleanup ----------------------------------------
    "f10_f13_strings" -> ((s, d) => {
      val path = concat(lit("V2/Data/"), col("event_type"), lit("/"),
        col("event_id").cast(StringType), lit(":f.parquet"))
      Tables.events(s, d).select(
        col("event_id"),
        date_format(col("ts"), "HH:mm:ss").as("event_time"),
        to_date(col("ts")).as("event_day"),
        lower(substring(col("event_type"), 1, 3)).as("type_code"),
        regexp_replace(element_at(split(path, "/"), -1), ":", "").as("basename"))
        .orderBy("event_id")
    }),

    // ---- J5: reverse-lookup join against a tiny config map --------------
    "j5_config_lookup" -> ((s, d) => {
      import s.implicits._
      val cfg = Seq(
        ("BUILDING", "b2b"), ("MACHINERY", "industrial"),
        ("AUTOMOBILE", "consumer"), ("FURNITURE", "consumer"),
        ("HOUSEHOLD", "consumer")).toDF("c_mktsegment", "channel")
      Tables.customer(s, d)
        .join(broadcast(cfg), Seq("c_mktsegment"), "left")
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_customers"),
          sum(dec(col("c_acctbal"))).cast("double").as("total_bal"))
        .orderBy("channel")
    }),

    // ---- CUBE over two dimensions ----------------------------------------
    "q_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("total_price"))
        .orderBy("status", "priority")
    }),

    // ---- GROUPING SETS via the SQL entry path ----------------------------
    "q_groupsets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
          |  COALESCE(o_orderpriority, 'ALL') AS priority,
          |  count(1) AS n_orders,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS total_price
          |FROM orders_v
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY status, priority""".stripMargin)
    }),

    // ---- Sketch aggregate: HLL approx distinct, gated through a
    //      relative-error contract — sketch register values differ across
    //      engines, so the DECLARED output per group is the EXACT counts
    //      (independently recomputed by DuckDB) plus booleans asserting the
    //      sketch estimate landed within 3× the configured rsd (0.05): the
    //      whole row set is hash-checkable while the estimate itself stays
    //      impl-specific. Spark's HLL++ registers are max-merged (order-
    //      independent), so the estimate — hence the boolean — is
    //      deterministic for a fixed input set. -----------------------------
    "q_approx_distinct" -> ((s, d) => {
      val bound = 0.15 // 3 × default rsd 0.05 — deterministic-true margin
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("ap"),
          approx_count_distinct(col("l_orderkey")).as("ao"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
        .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts")) * lit(100L) <=
            lit((bound * 100).toLong) * col("exact_parts")).as("parts_err_ok"),
          (abs(col("ao") - col("exact_orders")) * lit(100L) <=
            lit((bound * 100).toLong) * col("exact_orders")).as("orders_err_ok"))
        .orderBy("l_returnflag")
    }),

    // ---- Mergeable HLL sketches: partial per day, union across ----------
    // The pattern that makes approx-distinct work at 100 TB: sketch each
    // partition (here: event day) INDEPENDENTLY — e.g. in daily ingest
    // jobs — and answer "distinct users over any day range" by merging
    // sketch blobs, never rescanning history. Rows-only (DataSketches
    // binary format is impl-specific); merged ≈ exact asserted in
    // ScalaTest.
    // Gated like q_approx_distinct: the DataSketches blob is impl-specific,
    // so the declared output is (n_days, exact distinct users — DuckDB
    // recomputes both) + a boolean asserting the MERGED estimate is within
    // 5% of exact (default lgConfigK=12 → rse ≈ 1.6%; 3σ margin). The
    // merge-not-rescan pattern is what's being certified: the estimate
    // comes only from per-day sketch blobs union_agg'd together.
    "q_hll_union" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val perDay = ev.groupBy(to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val merged = perDay.agg(
          count(lit(1)).as("n_days"),
          hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
            .as("est"))
      val exact = ev.agg(countDistinct(col("user_id")).as("exact_users"))
      merged.crossJoin(exact)
        .select(col("n_days"), col("exact_users"),
          (abs(col("est") - col("exact_users")) * lit(100L) <=
            lit(5L) * col("exact_users")).as("merged_err_ok"))
    }),

    // ---- Deterministic HLL: the oracle-checkable twin of
    //      q_approx_distinct (same pattern as the det-ANN twins: seeded /
    //      deterministic math instead of engine-private state, so every
    //      register and the estimate itself hash-match DuckDB) -----------
    "q_hll_det" -> ((s, d) => {
      import graft.operators.Sketches
      val li = Tables.lineitem(s, d)
      val reg = Sketches.hllRegisters(li, col("l_partkey"),
        Seq(col("l_returnflag") -> "l_returnflag"))
      val est = Sketches.hllEstimate(reg, Seq("l_returnflag"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      est.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_empty"),
          col("est_distinct").as("est_parts"), col("exact_parts"))
        .orderBy("l_returnflag")
    }),

    // ---- Deterministic HLL union: per-day register frames merged into
    //      one corpus sketch — the mergeable-sketch pattern of q_hll_union
    //      with every intermediate SQL-replayable -------------------------
    "q_hll_det_union" -> ((s, d) => {
      import graft.operators.Sketches
      val ev = Tables.events(s, d)
      val perDay = Sketches.hllRegisters(ev, col("user_id"),
        Seq(to_date(col("ts")) -> "day"))
      val merged = Sketches.hllMerge(Seq.empty,
        perDay.select(col("bucket"), col("max_rho")))
      val est = Sketches.hllEstimate(merged, Seq.empty)
      val days = perDay.agg(countDistinct(col("day")).as("n_days"))
      val exact = ev.agg(countDistinct(col("user_id")).as("exact_users"))
      days.crossJoin(est).crossJoin(exact)
        .select(col("n_days"), col("n_empty"),
          col("est_distinct").as("est_users"), col("exact_users"))
    }),

    // ---- KMV distinct sketch: k smallest hashes per group; exact below
    //      k, one double division above it — SQL-replayable end to end --
    "q_kmv_distinct" -> ((s, d) => {
      import graft.operators.Sketches
      val li = Tables.lineitem(s, d)
      val sk = Sketches.kmvSketch(li, col("l_partkey"),
        Seq(col("l_returnflag") -> "l_returnflag"), k = 256)
      val est = Sketches.kmvEstimate(sk, Seq("l_returnflag"), k = 256)
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      est.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_kept"),
          col("est_distinct").as("est_parts"), col("exact_parts"))
        .orderBy("l_returnflag")
    }),

    // ---- KMV set overlap: how much do two corpora intersect, answered
    //      from two ≤ k-row sketches without joining the corpora --------
    "q_kmv_jaccard" -> ((s, d) => {
      import graft.operators.Sketches
      val li = Tables.lineitem(s, d)
      val a = Sketches.kmvSketch(li.filter(col("l_returnflag") === "A"),
        col("l_partkey"), Seq.empty, k = 256)
      val b = Sketches.kmvSketch(li.filter(col("l_returnflag") === "R"),
        col("l_partkey"), Seq.empty, k = 256)
      val est = Sketches.kmvJaccard(a, b, k = 256)
      val flagged = li.filter(col("l_returnflag").isin("A", "R"))
        .groupBy(col("l_partkey"))
        .agg(countDistinct(col("l_returnflag")).as("nf"))
      val exact = flagged.agg(
        sum(when(col("nf") === 2, 1L).otherwise(0L)).cast("long")
          .as("n_inter_exact"),
        count(lit(1)).as("n_union_exact"))
      est.crossJoin(exact)
    }),

    // ---- Declared CSV source leg: explicit schema (inference would scan
    //      the whole listing — never at 100 TB), joined to parquet dims ----
    "q_csv_src" -> ((s, d) => {
      graft.sources.FixtureSources.ensure()
      val rates = s.read
        .option("header", "true")
        .schema(StructType(Seq(
          StructField("r_key", LongType),
          StructField("rate_name", StringType),
          StructField("multiplier", DoubleType))))
        .csv(graft.sources.FixtureSources.csvPath)
      Tables.nation(s, d)
        .join(Tables.region(s, d),
          col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(rates), col("r_regionkey") === col("r_key"))
        .groupBy(col("r_name"), col("rate_name"), col("multiplier"))
        .agg(count(lit(1)).as("n_nations"))
        // multiplier values are exact binary fractions and counts are small
        // ints, so the product is exact — safe to hash-compare as DOUBLE
        .select(col("r_name"), col("rate_name"), col("n_nations"),
          (col("multiplier") * col("n_nations")).as("adjusted"))
        .orderBy("r_name")
    }),

    // ---- Declared ORC source leg: written through Spark's ORC path from
    //      deterministic rows, read back with explicit schema. DuckDB
    //      cannot read ORC, so the oracle replays the same rows as a
    //      VALUES table — the query is a round-trip check on the format --
    "q_orc_src" -> ((s, d) => {
      graft.sources.FixtureSources.ensureOrc(s)
      val audit = s.read
        .schema(StructType(Seq(
          StructField("s_key", LongType),
          StructField("audit_tier", StringType),
          StructField("audit_score", DoubleType))))
        .orc(graft.sources.FixtureSources.orcPath)
      Tables.supplier(s, d)
        .join(broadcast(audit), col("s_suppkey") % 50 === col("s_key"))
        .groupBy(col("audit_tier"))
        // scores are exact eighths — double sums are exact at any order
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("audit_score")).as("total_score"))
        .orderBy("audit_tier")
    }),

    // ---- Declared JSON source leg: newline-delimited, explicit NESTED
    //      schema (struct + array), joined to parquet dims ----------------
    "q_json_src" -> ((s, d) => {
      graft.sources.FixtureSources.ensure()
      val tags = s.read
        .schema(StructType(Seq(
          StructField("n_key", LongType),
          StructField("meta", StructType(Seq(
            StructField("tier", StringType),
            StructField("weight", DoubleType)))),
          StructField("tags", ArrayType(StringType)))))
        .json(graft.sources.FixtureSources.jsonPath)
      Tables.nation(s, d)
        .join(broadcast(tags), col("n_nationkey") === col("n_key"))
        .groupBy(col("meta.tier").as("tier"))
        // weights are exact multiples of 0.25 — the double sum is exact and
        // order-independent, so it hash-compares without a DECIMAL detour
        .agg(count(lit(1)).as("n_nations"),
          sum(col("meta.weight")).as("total_weight"),
          max(size(col("tags"))).as("max_tags"))
        .orderBy("tier")
    }),

    // ---- The reference's flagship DAG as one plan ------------------------
    // Trace (reference dags/evidence_images_processing.py:298-425):
    // 20-way fan-out scan → U1 concat → P1 keep-list → F3 dtype normalize →
    // P2 row filter → W1 idempotent load → F1 split + F2 URL writebacks.
    // Here: 3 drifting per-"country" frames → unionByName → keepColumns →
    // normalizeBoolStrings → filterNonEmpty → anti-join vs sink state →
    // split/transform/element_at derivations — one DataFrame program, no
    // intermediate materialization (the reference XCom-pickles every step).
    // ---- Flagship curation pipeline: the full training-data DAG as ONE
    //      logical plan — quality gate -> exact dedup -> MinHash near-dup
    //      canonical keep -> benchmark decontamination -> deterministic
    //      split -> per-(split, source) stats. Every stage is an operator
    //      proven by its own query elsewhere; here Catalyst fuses the whole
    //      DAG (shared scans, pushed filters, no orchestration tier), and
    //      the oracle replays all five stages in one SQL statement.
    "pipeline_curation" -> ((s, d) => {
      import graft.functions.{ShingleFunctions, TextFunctions}
      import graft.operators.{Dedup, Sampling}
      import org.apache.spark.sql.expressions.Window

      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") % 10 === 0)
      // 1. quality gate (token-count bounds)
      val quality = docs.filter(col("doc_id") % 10 =!= 0)
        .withColumn("n_tokens", size(TextFunctions.tokens(col("text"))))
        .filter(col("n_tokens").between(20, 1000))
      // 2. exact dedup: keep the minimum id per identical text
      // checkpointed: three consumers (the LSH pair mining, keepCorpus's
      // survivor join, and through `kept` the decontamination legs) would
      // otherwise each re-run the scan + tokenize + exact-dup window
      val exactKeep = quality
        .withColumn("__rk", row_number().over(
          Window.partitionBy(col("text")).orderBy(col("doc_id"))))
        .filter(col("__rk") === 1).drop("__rk")
        .localCheckpoint(true)
      // 3. near-dup canonical keep (word-3-gram MinHash, closure minima)
      def sh3 = ShingleFunctions.wordShingleHashes(
        TextFunctions.tokens(col("text")), 3)
      val pairs = Dedup.minHashNearDups(exactKeep, "doc_id", sh3,
        threshold = 0.5, Dedup.LshConfig(numHashes = 64, bandRows = 2))
      val kept = Dedup.keepCorpus(exactKeep, "doc_id", pairs)
        .localCheckpoint(true)
      // 4. benchmark decontamination (any shared word-5-gram)
      def sh5 = ShingleFunctions.wordShingleHashes(
        TextFunctions.tokens(col("text")), 5)
      val clean = kept.join(
        Dedup.decontaminate(kept, "doc_id", sh5, bench, sh5)
          .filter(col("contaminated") === 0)
          .select(col("id").as("doc_id")),
        Seq("doc_id"))
      // 5. deterministic split + corpus stats
      clean
        .withColumn("split", Sampling.splitLabel(Sampling.md5Bucket(col("text"))))
        .groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
        .orderBy("split", "source")
    }),

    // ---- Curation lineage audit: first-drop reason per document ----------
    // The same five-stage DAG as pipeline_curation, but instead of the
    // survivors it accounts for EVERY corpus document exactly once: the
    // first stage that drops it (quality / exact_dup / near_dup /
    // contaminated) or 'kept'. At 100 TB this is the report that tells
    // you where your corpus went — and it reuses the stage frames, so
    // Catalyst shares the scans/shuffles with the pipeline itself.
    "pipeline_audit" -> ((s, d) => {
      import graft.functions.{ShingleFunctions, TextFunctions}
      import graft.operators.Dedup
      import org.apache.spark.sql.expressions.Window

      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") % 10 === 0)
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
        .withColumn("n_tokens", size(TextFunctions.tokens(col("text"))))
      val quality = corpus.filter(col("n_tokens").between(20, 1000))
      // ranked / kept / contIds are each consumed by 2-4 audit legs:
      // checkpoint the stage frames once instead of re-running the scan +
      // tokenize + window per consumer (the branch-re-execution trap —
      // Catalyst does not share subtrees across branches of one plan)
      val ranked = quality.withColumn("__rk", row_number().over(
          Window.partitionBy(col("text")).orderBy(col("doc_id"))))
        .localCheckpoint(true)
      val exactKeep = ranked.filter(col("__rk") === 1).drop("__rk")
      def sh3 = ShingleFunctions.wordShingleHashes(
        TextFunctions.tokens(col("text")), 3)
      val pairs = Dedup.minHashNearDups(exactKeep, "doc_id", sh3,
        threshold = 0.5, Dedup.LshConfig(numHashes = 64, bandRows = 2))
      val kept = Dedup.keepCorpus(exactKeep, "doc_id", pairs)
        .localCheckpoint(true)
      def sh5 = ShingleFunctions.wordShingleHashes(
        TextFunctions.tokens(col("text")), 5)
      val contIds = Dedup.decontaminate(kept, "doc_id", sh5, bench, sh5)
        .filter(col("contaminated") =!= 0)
        .select(col("id").as("doc_id"))
        .localCheckpoint(true)

      def tagged(f: DataFrame, reason: String) =
        f.select(col("doc_id"), col("source"), lit(reason).as("reason"))
      val audit = tagged(corpus.filter(!col("n_tokens").between(20, 1000)),
          "quality")
        .unionByName(tagged(ranked.filter(col("__rk") > 1), "exact_dup"))
        .unionByName(tagged(exactKeep.join(kept.select("doc_id"),
          Seq("doc_id"), "left_anti"), "near_dup"))
        .unionByName(tagged(kept.join(contIds, Seq("doc_id")), "contaminated"))
        .unionByName(tagged(kept.join(contIds, Seq("doc_id"), "left_anti"),
          "kept"))
      audit.groupBy("source", "reason")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("source", "reason")
    }),

    "pipeline_evidence" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val f1 = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .withColumn("country_code", lit("uk"))
      val f2 = c.filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey"), col("c_name"))
        .withColumn("country_code", lit("de"))
      val f3 = c.filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey"), col("c_acctbal"))
        .withColumn("country_code", lit("fr"))

      val unioned = Pipeline.unionAll(Seq(f1, f2, f3))
      val kept = Pipeline.keepColumns(unioned,
        Seq("C_CUSTKEY", "c_name", "C_AcctBal", "country_code"))
      val flagged = kept
        .withColumn("flag",
          when(col("c_acctbal") > 2500, "True")
            .when(col("c_acctbal").isNull, lit(null).cast(StringType))
            .otherwise("False"))
        .withColumn("name_clean",
          when(col("c_custkey") % 97 === 0, "").otherwise(col("c_name")))
      val normalized = Pipeline.normalizeBoolStrings(flagged)
      val filtered = Pipeline.filterNonEmpty(normalized, "name_clean")

      val sinkKeys = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("c_custkey"))
      val fresh = filtered.join(sinkKeys, Seq("c_custkey"), "left_anti")

      val parts = split(col("name_clean"), "#")
      fresh.select(
        col("country_code"), col("c_custkey"),
        element_at(parts, 2).as("name_id"),
        col("flag"),
        concat(lit("http://img.example.com/"), element_at(parts, 1)).as("first_url"))
        .orderBy("c_custkey", "country_code")
    }),

    // ---- W7: completion-notification sink (the reference's EmailOperator,
    //      dags/evidence_images_processing.py:291-296) --------------------
    // The per-country ingest counts of the evidence pipeline are folded to
    // ONE message row (recipient, subject, html body — the operator's
    // exact field set), rendered + delivered through the file-backed
    // outbox (Sinks.writeOutbox: RFC-822 text, md5-named = idempotent
    // redelivery), then the .eml is read BACK and parsed, so the
    // driver-gated row covers the full render → deliver → parse
    // round-trip, not just the compose. The oracle recomputes the message
    // fields from the same customer CTEs.
    "w7_notify" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val f1 = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"))
        .withColumn("country_code", lit("uk"))
      val f2 = c.filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey"), col("c_name"))
        .withColumn("country_code", lit("de"))
      val f3 = c.filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey"))
        .withColumn("country_code", lit("fr"))
      val unioned = Pipeline.unionAll(Seq(f1, f2, f3))
      val cleaned = unioned.withColumn("name_clean",
        when(col("c_custkey") % 97 === 0, "").otherwise(col("c_name")))
      val filtered = Pipeline.filterNonEmpty(cleaned, "name_clean")
      val perCountry = filtered.groupBy(col("country_code"))
        .agg(count(lit(1)).as("n"))
      val summary = perCountry.agg(
        sum(col("n")).as("n_rows"),
        concat_ws(",", array_sort(collect_list(
          concat(col("country_code"), lit(":"), col("n").cast(StringType)))))
          .as("by_country"))
      val message = summary.select(
        lit("ops@graft.invalid").as("recipient"),
        lit("MQ Data Processing Complete").as("subject"),
        concat(
          lit("<p><b>The job processing IRMQ images completed!</b></p><p>rows="),
          col("n_rows").cast(StringType), lit("; "), col("by_country"),
          lit("</p>")).as("body_html"))
      val outbox = graft.streaming.Streams.freshScratch("outbox", d)
      graft.sources.Sinks.writeOutbox(message, outbox)
      s.read.option("wholetext", "true").text(outbox)
        .select(
          regexp_extract(col("value"), "To: ([^\r\n]+)", 1).as("recipient"),
          regexp_extract(col("value"), "Subject: ([^\r\n]+)", 1).as("subject"),
          regexp_extract(col("value"), "(?s)\r\n\r\n(.*)\r\n$", 1).as("body_html"))
    }))

  val oracle: Map[String, String] = Map(
    // HLL contracts: DuckDB independently recomputes the EXACT counts and
    // asserts every relative-error boolean is true — the sketch estimates
    // themselves are impl-specific and never leave the Spark plan.
    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS parts_err_ok, TRUE AS orders_err_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_hll_union" ->
      """SELECT count(DISTINCT CAST(ts AS DATE)) AS n_days,
        |  count(DISTINCT user_id) AS exact_users,
        |  TRUE AS merged_err_ok
        |FROM events""".stripMargin,

    // W7 notification: recompute the message fields (recipient, subject,
    // html body with per-country ingest counts) from the same customer
    // CTE prefix as pipeline_evidence; the Spark side parses these fields
    // back out of the delivered RFC-822 file.
    "w7_notify" ->
      """WITH unioned AS (
        |  SELECT c_custkey, c_name, 'uk' AS country_code
        |    FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL
        |  SELECT c_custkey, c_name, 'de' AS country_code
        |    FROM customer WHERE c_mktsegment = 'MACHINERY'
        |  UNION ALL
        |  SELECT c_custkey, NULL AS c_name, 'fr' AS country_code
        |    FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
        |cleaned AS (
        |  SELECT *,
        |    CASE WHEN c_custkey % 97 = 0 THEN '' ELSE c_name END AS name_clean
        |  FROM unioned),
        |filtered AS (
        |  SELECT * FROM cleaned WHERE name_clean <> '' OR name_clean IS NULL),
        |perc AS (
        |  SELECT country_code, count(*) AS n FROM filtered GROUP BY 1),
        |summary AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n_rows,
        |    string_agg(country_code || ':' || n, ','
        |      ORDER BY country_code || ':' || n) AS by_country
        |  FROM perc)
        |SELECT 'ops@graft.invalid' AS recipient,
        |  'MQ Data Processing Complete' AS subject,
        |  '<p><b>The job processing IRMQ images completed!</b></p><p>rows='
        |    || n_rows || '; ' || by_country || '</p>' AS body_html
        |FROM summary""".stripMargin,

    "q_csv_src" ->
      s"""SELECT r.r_name, c.rate_name, count(*) AS n_nations,
         |  c.multiplier * count(*) AS adjusted
         |FROM read_csv('${graft.sources.FixtureSources.csvPath}',
         |    header = true,
         |    columns = {'r_key': 'BIGINT', 'rate_name': 'VARCHAR',
         |               'multiplier': 'DOUBLE'}) c
         |JOIN region r ON r.r_regionkey = c.r_key
         |JOIN nation n ON n.n_regionkey = r.r_regionkey
         |GROUP BY r.r_name, c.rate_name, c.multiplier
         |ORDER BY r.r_name""".stripMargin,

    // Deterministic HLL twins: replay the 60-bit md5 hash, bucket/rho
    // split (rho via length(bin(r)) — both engines render binary without
    // leading zeros), register max, and the 2^55-scaled integer harmonic
    // sum. The estimator numerator alpha·m²·2^55 is ONE Scala-computed
    // double emitted verbatim into both plans, so the single division is
    // the only float op and it runs on bit-identical operands.
    "q_hll_det" ->
      s"""WITH u AS (
         |  SELECT l_returnflag,
         |    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT
         |      AS u
         |  FROM lineitem),
         |h AS (
         |  SELECT l_returnflag, u >> 54 AS bucket,
         |    CASE WHEN (u & ((1::BIGINT << 54) - 1)) = 0 THEN 55
         |         ELSE 55 - length(bin(u & ((1::BIGINT << 54) - 1)))
         |    END AS rho
         |  FROM u),
         |reg AS (SELECT l_returnflag, bucket, max(rho) AS max_rho
         |        FROM h GROUP BY 1, 2),
         |est AS (
         |  SELECT l_returnflag, CAST(64 - count(*) AS BIGINT) AS n_empty,
         |    sum(1::BIGINT << (55 - max_rho))
         |      + (64 - count(*)) * (1::BIGINT << 55) AS s
         |  FROM reg GROUP BY 1),
         |ex AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
         |       FROM lineitem GROUP BY 1)
         |SELECT e.l_returnflag, e.n_empty,
         |  ${graft.operators.Sketches.hllNumerator(6)} / CAST(e.s AS DOUBLE)
         |    AS est_parts,
         |  CAST(ex.exact_parts AS BIGINT) AS exact_parts
         |FROM est e JOIN ex USING (l_returnflag)
         |ORDER BY e.l_returnflag""".stripMargin,

    "q_hll_det_union" ->
      s"""WITH u AS (
         |  SELECT CAST(ts AS DATE) AS day,
         |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
         |      AS u
         |  FROM events),
         |h AS (
         |  SELECT day, u >> 54 AS bucket,
         |    CASE WHEN (u & ((1::BIGINT << 54) - 1)) = 0 THEN 55
         |         ELSE 55 - length(bin(u & ((1::BIGINT << 54) - 1)))
         |    END AS rho
         |  FROM u),
         |perday AS (SELECT day, bucket, max(rho) AS max_rho
         |           FROM h GROUP BY 1, 2),
         |merged AS (SELECT bucket, max(max_rho) AS max_rho
         |           FROM perday GROUP BY 1),
         |est AS (
         |  SELECT CAST(64 - count(*) AS BIGINT) AS n_empty,
         |    sum(1::BIGINT << (55 - max_rho))
         |      + (64 - count(*)) * (1::BIGINT << 55) AS s
         |  FROM merged)
         |SELECT
         |  (SELECT CAST(count(DISTINCT day) AS BIGINT) FROM perday) AS n_days,
         |  e.n_empty,
         |  ${graft.operators.Sketches.hllNumerator(6)} / CAST(e.s AS DOUBLE)
         |    AS est_users,
         |  (SELECT count(DISTINCT user_id) FROM events) AS exact_users
         |FROM est e""".stripMargin,

    "q_kmv_distinct" ->
      s"""WITH u AS (
         |  SELECT DISTINCT l_returnflag,
         |    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT
         |      AS u
         |  FROM lineitem),
         |r AS (
         |  SELECT l_returnflag, u,
         |    row_number() OVER (PARTITION BY l_returnflag ORDER BY u) AS rk
         |  FROM u),
         |s AS (
         |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_kept,
         |    max(u) AS kth
         |  FROM r WHERE rk <= 256 GROUP BY 1),
         |ex AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
         |       FROM lineitem GROUP BY 1)
         |SELECT s.l_returnflag, s.n_kept,
         |  CASE WHEN s.n_kept < 256 THEN CAST(s.n_kept AS DOUBLE)
         |       ELSE ${graft.operators.Sketches.kmvNumerator(256)}
         |            / CAST(s.kth AS DOUBLE) END AS est_parts,
         |  CAST(ex.exact_parts AS BIGINT) AS exact_parts
         |FROM s JOIN ex USING (l_returnflag)
         |ORDER BY s.l_returnflag""".stripMargin,

    "q_kmv_jaccard" ->
      s"""WITH ua AS (
         |  SELECT DISTINCT
         |    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT
         |      AS u
         |  FROM lineitem WHERE l_returnflag = 'A'),
         |ub AS (
         |  SELECT DISTINCT
         |    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT
         |      AS u
         |  FROM lineitem WHERE l_returnflag = 'R'),
         |ka AS (SELECT u FROM ua ORDER BY u LIMIT 256),
         |kb AS (SELECT u FROM ub ORDER BY u LIMIT 256),
         |l AS (SELECT u FROM (SELECT u FROM ka UNION SELECT u FROM kb)
         |      ORDER BY u LIMIT 256),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_union_kept, max(u) AS kth,
         |    CAST(count(*) FILTER (WHERE u IN (SELECT u FROM ka)
         |      AND u IN (SELECT u FROM kb)) AS BIGINT) AS k_both
         |  FROM l),
         |ex AS (
         |  SELECT
         |    CAST(count(*) FILTER (WHERE nf = 2) AS BIGINT) AS n_inter_exact,
         |    CAST(count(*) AS BIGINT) AS n_union_exact
         |  FROM (SELECT l_partkey, count(DISTINCT l_returnflag) AS nf
         |        FROM lineitem WHERE l_returnflag IN ('A', 'R')
         |        GROUP BY 1)),
         |est AS (
         |  SELECT n_union_kept, k_both,
         |    CASE WHEN n_union_kept < 256 THEN CAST(n_union_kept AS DOUBLE)
         |         ELSE ${graft.operators.Sketches.kmvNumerator(256)}
         |              / CAST(kth AS DOUBLE) END AS est_union,
         |    CAST(k_both AS DOUBLE) / CAST(n_union_kept AS DOUBLE)
         |      AS est_jaccard
         |  FROM agg)
         |SELECT e.n_union_kept, e.k_both, e.est_union, e.est_jaccard,
         |  e.est_jaccard * e.est_union AS est_intersection,
         |  x.n_inter_exact, x.n_union_exact
         |FROM est e, ex x""".stripMargin,

    "q_orc_src" ->
      s"""WITH audit(s_key, audit_tier, audit_score) AS (VALUES
         |  ${graft.sources.FixtureSources.orcValuesSql})
         |SELECT audit_tier, count(*) AS n_suppliers,
         |  sum(audit_score) AS total_score
         |FROM supplier JOIN audit ON s_suppkey % 50 = s_key
         |GROUP BY audit_tier ORDER BY audit_tier""".stripMargin,

    "q_json_src" ->
      s"""SELECT t.meta.tier AS tier, count(*) AS n_nations,
         |  sum(t.meta.weight) AS total_weight,
         |  CAST(max(len(t.tags)) AS INTEGER) AS max_tags
         |FROM read_json('${graft.sources.FixtureSources.jsonPath}',
         |    format = 'newline_delimited',
         |    columns = {'n_key': 'BIGINT',
         |               'meta': 'STRUCT(tier VARCHAR, weight DOUBLE)',
         |               'tags': 'VARCHAR[]'}) t
         |JOIN nation n ON n.n_nationkey = t.n_key
         |GROUP BY t.meta.tier
         |ORDER BY tier""".stripMargin,

    "f10_f13_strings" ->
      """SELECT event_id,
        |  strftime(CAST(ts AS TIMESTAMP), '%H:%M:%S') AS event_time,
        |  CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_day,
        |  lower(substr(event_type, 1, 3)) AS type_code,
        |  replace(string_split('V2/Data/' || event_type || '/' ||
        |    CAST(event_id AS VARCHAR) || ':f.parquet', '/')[-1], ':', '')
        |    AS basename
        |FROM events ORDER BY event_id""".stripMargin,

    "j5_config_lookup" ->
      """WITH cfg(c_mktsegment, channel) AS (VALUES
        |  ('BUILDING','b2b'), ('MACHINERY','industrial'),
        |  ('AUTOMOBILE','consumer'), ('FURNITURE','consumer'),
        |  ('HOUSEHOLD','consumer'))
        |SELECT channel, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer LEFT JOIN cfg USING (c_mktsegment)
        |GROUP BY channel ORDER BY channel""".stripMargin,

    "q_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q_groupsets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,

    "pipeline_curation" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, source, text, string_split(text, ' ') AS w
        |  FROM documents),
        |q AS (SELECT * FROM toks
        |      WHERE doc_id % 10 <> 0 AND len(w) BETWEEN 20 AND 1000),
        |ex AS (SELECT * FROM q
        |       QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1),
        |sh AS (SELECT doc_id, list_distinct(list_transform(
        |         generate_series(1, len(w) - 2),
        |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |       FROM ex WHERE len(w) >= 3),
        |p AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2
        |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |      WHERE len(list_intersect(a.g, b.g)) /
        |          len(list_distinct(list_concat(a.g, b.g))) >= 0.5),
        |ed AS (SELECT id_1 AS s, id_2 AS t FROM p
        |       UNION SELECT id_2, id_1 FROM p),
        |reach(s, t) AS (
        |  SELECT s, t FROM ed UNION SELECT s, s FROM ed
        |  UNION SELECT r.s, ed.t FROM reach r JOIN ed ON r.t = ed.s),
        |cn AS (SELECT s AS id, min(t) AS canonical_id FROM reach GROUP BY s),
        |kept AS (SELECT ex.* FROM ex LEFT JOIN cn ON cn.id = ex.doc_id
        |         WHERE cn.id IS NULL OR cn.canonical_id = ex.doc_id),
        |b5 AS (SELECT DISTINCT unnest(list_transform(
        |         generate_series(1, len(w) - 4),
        |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |              w[i+3] || ' ' || w[i+4])) AS gr
        |       FROM toks WHERE doc_id % 10 = 0 AND len(w) >= 5),
        |cont AS (SELECT DISTINCT k.doc_id FROM
        |         (SELECT doc_id, unnest(list_distinct(list_transform(
        |            generate_series(1, len(w) - 4),
        |            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |                 w[i+3] || ' ' || w[i+4]))) AS gr
        |          FROM kept WHERE len(w) >= 5) k
        |         JOIN b5 USING (gr)),
        |fin AS (SELECT * FROM kept
        |        WHERE doc_id NOT IN (SELECT doc_id FROM cont))
        |SELECT
        |  CASE WHEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 100 < 90
        |         THEN 'train'
        |       WHEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 100 < 95
        |         THEN 'val'
        |       ELSE 'test' END AS split,
        |  source, count(*) AS n_docs, CAST(sum(len(w)) AS BIGINT) AS sum_tokens
        |FROM fin GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "pipeline_audit" ->
      """WITH RECURSIVE toks AS MATERIALIZED (
        |  SELECT doc_id, source, text, string_split(text, ' ') AS w
        |  FROM documents),
        |corp AS MATERIALIZED (SELECT * FROM toks WHERE doc_id % 10 <> 0),
        |q AS MATERIALIZED (SELECT * FROM corp WHERE len(w) BETWEEN 20 AND 1000),
        |rk AS MATERIALIZED (SELECT *, row_number() OVER (PARTITION BY text
        |         ORDER BY doc_id) AS rn FROM q),
        |ex AS MATERIALIZED (SELECT * FROM rk WHERE rn = 1),
        |sh AS MATERIALIZED (SELECT doc_id, list_distinct(list_transform(
        |         generate_series(1, len(w) - 2),
        |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |       FROM ex WHERE len(w) >= 3),
        |p AS MATERIALIZED (SELECT a.doc_id AS id_1, b.doc_id AS id_2
        |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |      WHERE len(list_intersect(a.g, b.g)) /
        |          len(list_distinct(list_concat(a.g, b.g))) >= 0.5),
        |ed AS MATERIALIZED (SELECT id_1 AS s, id_2 AS t FROM p
        |       UNION SELECT id_2, id_1 FROM p),
        |reach(s, t) AS (
        |  SELECT s, t FROM ed UNION SELECT s, s FROM ed
        |  UNION SELECT r.s, ed.t FROM reach r JOIN ed ON r.t = ed.s),
        |cn AS MATERIALIZED (SELECT s AS id, min(t) AS canonical_id FROM reach GROUP BY s),
        |kept AS MATERIALIZED (SELECT ex.* FROM ex LEFT JOIN cn ON cn.id = ex.doc_id
        |         WHERE cn.id IS NULL OR cn.canonical_id = ex.doc_id),
        |b5 AS MATERIALIZED (SELECT DISTINCT unnest(list_transform(
        |         generate_series(1, len(w) - 4),
        |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |              w[i+3] || ' ' || w[i+4])) AS gr
        |       FROM toks WHERE doc_id % 10 = 0 AND len(w) >= 5),
        |cont AS MATERIALIZED (SELECT DISTINCT k.doc_id FROM
        |         (SELECT doc_id, unnest(list_distinct(list_transform(
        |            generate_series(1, len(w) - 4),
        |            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |                 w[i+3] || ' ' || w[i+4]))) AS gr
        |          FROM kept WHERE len(w) >= 5) k
        |         JOIN b5 USING (gr)),
        |reasons AS MATERIALIZED (
        |  SELECT doc_id, source, 'quality' AS reason FROM corp
        |    WHERE len(w) NOT BETWEEN 20 AND 1000
        |  UNION ALL
        |  SELECT doc_id, source, 'exact_dup' FROM rk WHERE rn > 1
        |  UNION ALL
        |  SELECT e.doc_id, e.source, 'near_dup' FROM ex e
        |    JOIN cn ON cn.id = e.doc_id WHERE cn.canonical_id <> e.doc_id
        |  UNION ALL
        |  SELECT k.doc_id, k.source, 'contaminated' FROM kept k
        |    WHERE k.doc_id IN (SELECT doc_id FROM cont)
        |  UNION ALL
        |  SELECT k.doc_id, k.source, 'kept' FROM kept k
        |    WHERE k.doc_id NOT IN (SELECT doc_id FROM cont))
        |SELECT source, reason, count(*) AS n_docs FROM reasons
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "pipeline_evidence" ->
      """WITH unioned AS (
        |  SELECT c_custkey, c_name, c_acctbal, 'uk' AS country_code
        |    FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL
        |  SELECT c_custkey, c_name, NULL AS c_acctbal, 'de' AS country_code
        |    FROM customer WHERE c_mktsegment = 'MACHINERY'
        |  UNION ALL
        |  SELECT c_custkey, NULL AS c_name, c_acctbal, 'fr' AS country_code
        |    FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
        |flagged AS (
        |  SELECT *,
        |    CASE WHEN c_acctbal > 2500 THEN '1'
        |         WHEN c_acctbal IS NULL THEN NULL ELSE '0' END AS flag,
        |    CASE WHEN c_custkey % 97 = 0 THEN '' ELSE c_name END AS name_clean
        |  FROM unioned),
        |filtered AS (
        |  SELECT * FROM flagged WHERE name_clean <> '' OR name_clean IS NULL),
        |fresh AS (
        |  SELECT * FROM filtered f WHERE NOT EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = f.c_custkey AND o.o_orderstatus = 'F'))
        |SELECT country_code, c_custkey,
        |  string_split(name_clean, '#')[2] AS name_id,
        |  flag,
        |  'http://img.example.com/' || string_split(name_clean, '#')[1]
        |    AS first_url
        |FROM fresh ORDER BY c_custkey, country_code""".stripMargin)
}
