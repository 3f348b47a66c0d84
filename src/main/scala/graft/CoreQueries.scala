package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Pipeline

/** Reference-parity query set (SURVEY.md §2 rows S/P/J/A/U/F/W) over the
  * fixture star schema, each paired with DuckDB oracle SQL.
  *
  * Determinism: money aggregates go through DECIMAL(18,2) (exact and
  * order-independent — fixture values all have ≤2 decimals) and are cast
  * back to DOUBLE; every result is ordered by a unique key; integer-width
  * differences between engines are normalized in the oracle SQL.
  */
object CoreQueries {
  private val D = DecimalType(18, 2)
  private def dec(c: org.apache.spark.sql.Column) = c.cast(D)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- A (agg superset): hash-agg partial/final over lineitem ----------
    "q1_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(BigDecimal(1)).cast(D) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- P1: case-insensitive keep-list projection -----------------------
    "p1_keeplist" -> ((s, d) => {
      Pipeline.keepColumns(
        Tables.lineitem(s, d),
        Seq("L_OrderKey", "l_LineNumber", "L_QUANTITY", "l_returnflag"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- P2: non-empty-string filter, nulls kept (pandas semantics) ------
    "p2_filter_nonempty" -> ((s, d) => {
      val base = Tables.orders(s, d).withColumn(
        "tag",
        when(col("o_orderstatus") === "O", lit(""))
          .when(col("o_orderstatus") === "P", lit(null).cast(StringType))
          .otherwise(col("o_orderpriority")))
      Pipeline.filterNonEmpty(base, "tag")
        .select("o_orderkey", "tag")
        .orderBy("o_orderkey")
    }),

    // ---- P4: LIKE predicate ----------------------------------------------
    "p4_like" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_type").like("%ECO%") || col("p_name").contains("blue"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    }),

    // ---- J1 + P3 + P5 + F6: the reference's image_urls view shape --------
    "j1_join_filter" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .filter(col("o_orderstatus") === "F")
        .select(
          col("o_orderkey"),
          to_date(col("o_orderdate")).as("session_date"),
          col("c_name"),
          col("c_mktsegment"),
          col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // ---- J2: left-anti (NOT EXISTS) --------------------------------------
    "j2_anti" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val done = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      li.join(done, li("l_orderkey") === done("o_orderkey"), "left_anti")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- J2b: left-semi (EXISTS) -----------------------------------------
    "j3_semi" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey"))
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),

    // ---- W1: idempotent keyed append (dedupe + anti-join vs sink) --------
    "w1_idempotent" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val cutoff = lit("1997-01-01").cast(TimestampType)
      val batch = li.filter(col("l_shipdate") >= cutoff)
        .select("l_orderkey", "l_partkey").distinct()
      val sink = li.filter(col("l_shipdate") < cutoff)
        .select("l_orderkey", "l_partkey")
      Pipeline.idempotentNewRows(batch, sink, Seq("l_orderkey", "l_partkey"))
        .orderBy("l_orderkey", "l_partkey")
    }),

    // ---- W1 at scale: same contract through the Bloom pre-filter ---------
    // Same oracle as w1_idempotent — the Bloom probe only reroutes
    // definitely-new rows around the exact anti-join, never changes output.
    "w1_idempotent_bloom" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val cutoff = lit("1997-01-01").cast(TimestampType)
      val batch = li.filter(col("l_shipdate") >= cutoff)
        .select("l_orderkey", "l_partkey").distinct()
      val sink = li.filter(col("l_shipdate") < cutoff)
        .select("l_orderkey", "l_partkey")
      Pipeline.idempotentNewRowsBloom(batch, sink,
        Seq("l_orderkey", "l_partkey"), expectedSinkKeys = 200000L)
        .orderBy("l_orderkey", "l_partkey")
    }),

    // ---- J4: 3-key correlated UPDATE (reference add_image_data.py:65-71,83:
    // UPDATE ... FROM staging ON 3 matching key columns, SET derived) ------
    "j4_corr_update" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val staged = li.filter(col("l_returnflag") === "R")
        .groupBy("l_orderkey", "l_partkey", "l_suppkey")
        .agg(sum(dec(col("l_quantity"))).as("ret_qty"))
      li.join(staged, Seq("l_orderkey", "l_partkey", "l_suppkey"), "left")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          coalesce(col("ret_qty"), lit(0)).cast("double").as("returned_qty"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- W4/J3: MERGE upsert as full-outer join + coalesce ---------------
    "w4_merge" -> ((s, d) => {
      val target = Tables.customer(s, d)
        .select("c_custkey", "c_name", "c_acctbal")
      val source = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"),
          dec(col("c_acctbal") * 2).cast("double").as("c_acctbal"))
      Pipeline.mergeUpsert(target, source, Seq("c_custkey"), Seq("c_name", "c_acctbal"))
        .orderBy("c_custkey")
    }),

    // ---- U1 + J5: union-by-name over drifting per-country frames ---------
    "u1_union_drift" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val f1 = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .withColumn("country_code", lit("uk"))
      val f2 = c.filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey"), col("c_name"))        // drift: no acctbal
        .withColumn("country_code", lit("de"))
      val f3 = c.filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey"), col("c_acctbal"))     // drift: no name
        .withColumn("country_code", lit("fr"))
      Pipeline.unionAll(Seq(f1, f2, f3)).orderBy("c_custkey")
    }),

    // ---- F1 + F2 + F9: split → transform(concat) → element_at ------------
    "f1_f2_arrays" -> ((s, d) => {
      val packed = regexp_replace(col("p_name"), " ", ",")
      val names = Pipeline.splitPacked(packed)
      val urls = Pipeline.qualifyUrls(names, lit("http://img.example.com/"))
      Tables.part(s, d).select(
        col("p_partkey"),
        element_at(names, 1).as("first_name"),
        element_at(urls, 1).as("first_url"),
        size(names).as("n_names"),
        array_join(urls, "|").as("all_urls"))
        .orderBy("p_partkey")
    }),

    // ---- F3: bool-like string normalization ------------------------------
    "f3_boolstr" -> ((s, d) => {
      val withFlags = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_returnflag") === "R", "True").otherwise("False").as("returned"),
        when(col("l_tax") > 0.0, "True").otherwise("False").as("taxed"),
        col("l_linestatus"))
      Pipeline.normalizeBoolStrings(withFlags)
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- F6 + F7 + F8: date trunc, date windows, interval seconds --------
    "f6_f8_dates" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"), "inner")
        // raw timestamp bounds (equivalent to the to_date() form in the UTC
        // session, since to_date truncates) — these push down to the
        // Parquet scan; a to_date() wrapper would block the pushdown
        .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType) &&
                col("o_orderdate") <  lit("1998-01-01").cast(TimestampType))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          to_date(col("o_orderdate")).as("order_date"),
          (unix_timestamp(col("l_shipdate")) - unix_timestamp(col("o_orderdate")))
            .as("ship_delay_s"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- Window: top-3 orders per customer (row_number) ------------------
    "q_window_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
    }),

    // ---- Window: running sum per customer over time ----------------------
    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_spend",
          sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "running_spend")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- Rollup over region → nation -------------------------------------
    "q_rollup" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(dec(col("c_acctbal"))).cast("double").as("total_bal"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("region_name"),
          coalesce(col("n_name"), lit("ALL")).as("nation_name"),
          col("n_customers"), col("total_bal"))
        .orderBy("region_name", "nation_name")
    }),

    // ---- Exact distinct count per group ----------------------------------
    "q_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy("l_returnflag")
    }),

    // ---- Global top-k (TakeOrderedAndProject) ----------------------------
    "q_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // ---- Set ops: INTERSECT / EXCEPT -------------------------------------
    "q_intersect" -> ((s, d) => {
      val c = Tables.customer(s, d)
      c.filter(col("c_mktsegment") === "BUILDING").select("c_nationkey")
        .intersect(c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_nationkey"))
        .orderBy("c_nationkey")
    }),
    "q_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .except(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    }),

    // ---- A3: ordered string fold per group -------------------------------
    "a3_fold" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      n.join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(concat_ws(" and ", array_sort(collect_list(col("n_name")))).as("nations"))
        .orderBy("r_name")
    }),

    // ---- Multi-join star query (J1 at depth, join reorder surface) -------
    "q_star_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(BigDecimal(1)).cast(D) - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name")
    }))

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "p1_keeplist" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "p2_filter_nonempty" ->
      """WITH base AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderstatus = 'O' THEN ''
        |         WHEN o_orderstatus = 'P' THEN NULL
        |         ELSE o_orderpriority END AS tag
        |  FROM orders)
        |SELECT o_orderkey, tag FROM base
        |WHERE tag <> '' OR tag IS NULL
        |ORDER BY o_orderkey""".stripMargin,

    "p4_like" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_type LIKE '%ECO%' OR p_name LIKE '%blue%'
        |ORDER BY p_partkey""".stripMargin,

    "j1_join_filter" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS session_date,
        |  c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin,

    "j2_anti" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "j3_semi" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "w1_idempotent" ->
      """SELECT DISTINCT l_orderkey, l_partkey FROM lineitem b
        |WHERE b.l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND NOT EXISTS (SELECT 1 FROM lineitem e
        |    WHERE e.l_shipdate < TIMESTAMP '1997-01-01'
        |      AND e.l_orderkey = b.l_orderkey AND e.l_partkey = b.l_partkey)
        |ORDER BY l_orderkey, l_partkey""".stripMargin,

    "w1_idempotent_bloom" ->
      """SELECT DISTINCT l_orderkey, l_partkey FROM lineitem b
        |WHERE b.l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND NOT EXISTS (SELECT 1 FROM lineitem e
        |    WHERE e.l_shipdate < TIMESTAMP '1997-01-01'
        |      AND e.l_orderkey = b.l_orderkey AND e.l_partkey = b.l_partkey)
        |ORDER BY l_orderkey, l_partkey""".stripMargin,

    "j4_corr_update" ->
      """WITH staged AS (
        |  SELECT l_orderkey, l_partkey, l_suppkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS ret_qty
        |  FROM lineitem WHERE l_returnflag = 'R'
        |  GROUP BY 1, 2, 3)
        |SELECT li.l_orderkey, li.l_linenumber, li.l_partkey, li.l_suppkey,
        |  CAST(coalesce(s.ret_qty, 0) AS DOUBLE) AS returned_qty
        |FROM lineitem li LEFT JOIN staged s
        |  ON li.l_orderkey = s.l_orderkey AND li.l_partkey = s.l_partkey
        |    AND li.l_suppkey = s.l_suppkey
        |ORDER BY li.l_orderkey, li.l_linenumber""".stripMargin,

    "w4_merge" ->
      """WITH source AS (
        |  SELECT c_custkey,
        |    CAST(CAST(c_acctbal * 2 AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal
        |  FROM customer WHERE c_mktsegment = 'BUILDING')
        |SELECT t.c_custkey, t.c_name,
        |  COALESCE(s.c_acctbal, t.c_acctbal) AS c_acctbal
        |FROM customer t FULL OUTER JOIN source s ON t.c_custkey = s.c_custkey
        |ORDER BY t.c_custkey""".stripMargin,

    "u1_union_drift" ->
      """SELECT c_custkey, c_name, c_acctbal, 'uk' AS country_code
        |  FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL
        |SELECT c_custkey, c_name, NULL AS c_acctbal, 'de' AS country_code
        |  FROM customer WHERE c_mktsegment = 'MACHINERY'
        |UNION ALL
        |SELECT c_custkey, NULL AS c_name, c_acctbal, 'fr' AS country_code
        |  FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |ORDER BY c_custkey""".stripMargin,

    "f1_f2_arrays" ->
      """WITH arr AS (
        |  SELECT p_partkey,
        |    string_split(replace(p_name, ' ', ','), ',') AS names
        |  FROM part)
        |SELECT p_partkey,
        |  names[1] AS first_name,
        |  'http://img.example.com/' || names[1] AS first_url,
        |  CAST(len(names) AS INTEGER) AS n_names,
        |  array_to_string(list_transform(names, x -> 'http://img.example.com/' || x), '|') AS all_urls
        |FROM arr ORDER BY p_partkey""".stripMargin,

    "f3_boolstr" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_returnflag = 'R' THEN '1' ELSE '0' END AS returned,
        |  CASE WHEN l_tax > 0.0 THEN '1' ELSE '0' END AS taxed,
        |  l_linestatus
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "f6_f8_dates" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(o_orderdate AS DATE) AS order_date,
        |  date_diff('second', o_orderdate, l_shipdate) AS ship_delay_s
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rk
        |  FROM orders) WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_rollup" ->
      """SELECT COALESCE(r_name, 'ALL') AS region_name,
        |  COALESCE(n_name, 'ALL') AS nation_name,
        |  count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin,

    "q_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_intersect" ->
      """SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |ORDER BY c_nationkey""".stripMargin,

    "q_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    "a3_fold" ->
      """SELECT r_name,
        |  string_agg(n_name, ' and ' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_star_join" ->
      """SELECT r_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
}
