package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity ETL operators (SURVEY.md §2), re-expressed as pure,
  * composable DataFrame transforms. Each transform is a narrow/declarative
  * operation that Catalyst can push into the scan or fuse into one codegen
  * stage — the reference applies these eagerly, operator-at-a-time, in
  * pandas (see citations on each method).
  */
object Pipeline {

  /** P1 — case-insensitive keep-list projection, preserving source casing.
    * Reference: dags/common_helpers/filter_columns.py:9-11 (lowercases both
    * sides; drops unmatched). Catalyst's ColumnPruning then pushes the
    * projection into the Parquet scan — the reference prunes after a
    * full-width read.
    */
  def keepColumns(df: DataFrame, keep: Seq[String]): DataFrame = {
    val wanted = keep.map(_.toLowerCase).toSet
    val cols = df.columns.filter(c => wanted.contains(c.toLowerCase))
    df.select(cols.map(col).toIndexedSeq: _*)
  }

  /** F3 — bool-like string normalization: 'True'→1, 'False'→0, applied only
    * where a string column holds exactly those literals (pandas
    * `replace({'True':1,'False':0})` semantics — other values pass through).
    * Reference: dags/common_helpers/column_transformations.py:13-14.
    */
  def normalizeBoolStrings(df: DataFrame): DataFrame = {
    val out = df.schema.fields.map {
      case f if f.dataType == StringType =>
        when(col(f.name) === "True", lit("1"))
          .when(col(f.name) === "False", lit("0"))
          .otherwise(col(f.name)).as(f.name)
      case f => col(f.name)
    }
    df.select(out.toIndexedSeq: _*)
  }

  /** P2 — non-empty-string row filter with reference-faithful null handling:
    * pandas `df[df[c] != '']` keeps NaN rows (NaN != '' is True), so we keep
    * nulls too. Reference: dags/evidence_images_processing.py:147-150;
    * semantics note SURVEY.md §2.2 P2.
    */
  def filterNonEmpty(df: DataFrame, c: String): DataFrame =
    df.filter(col(c) =!= "" || col(c).isNull)

  /** U1 — n-way union-by-name with column drift (missing columns → null).
    * Reference: dags/common_helpers/concat_dfs.py:11-16 (pd.concat keeps
    * duplicates, aligns by name, fills NaN). Empty input requires an
    * explicit schema — the reference returns a schemaless empty frame.
    */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionAll of zero frames needs an explicit schema")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** W1 — idempotent keyed append: at-most-once per composite key versus
    * existing sink state. Reference: INSERT … ON CONFLICT DO NOTHING,
    * dags/evidence_images_processing.py:153-179. Spark form: dedupe within
    * the batch, anti-join against the sink's keys (Catalyst prunes the sink
    * scan to the key columns only). At 100 TB the sink side is bounded by
    * the incremental window predicate before the anti-join.
    */
  def idempotentNewRows(batch: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    batch
      .dropDuplicates(keys)
      .join(existing.select(keys.map(col).toIndexedSeq: _*), keys, "left_anti")

  /** W1 at 100 TB: same result as [[idempotentNewRows]], with a Bloom
    * filter over the sink's key hashes probed first. Bloom "no" is
    * definitive (no false negatives), so those rows skip the anti-join
    * entirely; only the ~fpp false-positive share plus genuine duplicates
    * shuffle into the exact check — the anti-join's batch side shrinks from
    * |batch| to ~|dups| + fpp·|batch|. The sink is still scanned once to
    * build the filter (key columns only, pruned by Catalyst); the filter
    * itself is a compact bit array shipped to tasks inside the probe
    * expression.
    */
  def idempotentNewRowsBloom(
      batch: DataFrame, existing: DataFrame, keys: Seq[String],
      expectedSinkKeys: Long, fpp: Double = 0.01): DataFrame = {
    def keyHash(df: DataFrame) = xxhash64(keys.map(df(_)).toIndexedSeq: _*)
    val sinkKeys = existing.select(keys.map(col).toIndexedSeq: _*)
    val bloom = sinkKeys.stat.bloomFilter(keyHash(sinkKeys), expectedSinkKeys, fpp)
    val deduped = batch.dropDuplicates(keys)
    val maybeInSink = graft.functions.BloomFunctions.mightContain(keyHash(deduped), bloom)
    val definitelyNew = deduped.filter(!maybeInSink)
    val needExactCheck = deduped.filter(maybeInSink)
      .join(sinkKeys, keys, "left_anti")
    definitelyNew.unionByName(needExactCheck)
  }

  /** W2's error surface as a validation operator: the reference *catches*
    * STRING_DATA_RIGHT_TRUNCATION from Postgres after the fact
    * (dags/evidence_images_processing.py:221-228); here over-length values
    * are reported *before* any write. Returns offending (column, length)
    * rows; empty result ⇒ safe to load.
    */
  def truncationViolations(df: DataFrame, limits: Map[String, Int]): DataFrame = {
    require(limits.nonEmpty, "no length limits given")
    val checks = limits.toSeq.map { case (c, n) =>
      df.filter(length(col(c)) > n)
        .select(lit(c).as("column"), col(c).cast(StringType).as("value"),
          length(col(c)).as("length"), lit(n).as("limit"))
    }
    checks.reduce(_.union(_))
  }

  /** U1 with the empty-input edge handled: zero frames yield an empty
    * DataFrame with the given explicit schema (the reference returns a
    * schemaless empty frame — SURVEY.md §7.4).
    */
  def unionAllOrEmpty(spark: org.apache.spark.sql.SparkSession,
                      dfs: Seq[DataFrame],
                      schema: StructType): DataFrame =
    if (dfs.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else unionAll(dfs)

  /** W4 — MERGE upsert (matched → update, not matched → insert) as a
    * full-outer join + coalesce, keyed. Reference MERGE:
    * dags/learn/postgres_op.py:46-58. `updateCols` are the non-key columns
    * where the source value wins when present.
    */
  def mergeUpsert(target: DataFrame, source: DataFrame, keys: Seq[String],
                  updateCols: Seq[String]): DataFrame = {
    val t = target.alias("t")
    val s = source.alias("s")
    val joined = t.join(s, keys, "full_outer")
    val srcCols = source.columns.map(_.toLowerCase).toSet
    val proj =
      keys.map(col) ++
        updateCols.map { c =>
          if (srcCols.contains(c.toLowerCase))
            coalesce(col(s"s.$c"), col(s"t.$c")).as(c)
          else col(s"t.$c").as(c)
        }
    joined.select(proj.toIndexedSeq: _*)
  }

  /** F1 — conditional split-to-array: comma-packed string → array; a string
    * without the delimiter yields a 1-element array (Spark `split` already
    * matches pandas' conditional exactly).
    * Reference: dags/evidence_images_processing.py:245-252.
    */
  def splitPacked(c: Column, delim: String = ","): Column = split(c, delim)

  /** F2 — per-element URL qualification over the array from F1 via the
    * `transform` higher-order function (codegen'd — the reference does a
    * per-row Python loop + row-at-a-time UPDATE writeback).
    * Reference: dags/evidence_images_processing.py:262-289.
    */
  def qualifyUrls(names: Column, urlBase: Column): Column =
    transform(names, n => concat(urlBase, n))

  /** Two-table reconciliation: multiset row counts present only on each
    * side (`EXCEPT ALL` both ways), the audit a replica migration or
    * cross-store writeback (W5) runs to prove the copy. Row-level, exact,
    * duplicate-aware; each direction is one shuffle on the full row
    * (substitute a row-fingerprint projection at 100 TB to shuffle 8-byte
    * hashes instead of whole rows — same plan shape).
    */
  def reconcile(left: DataFrame, right: DataFrame): DataFrame =
    left.exceptAll(right).agg(count(lit(1)).as("n_rows"))
      .select(lit("only_left").as("side"), col("n_rows"))
      .unionByName(
        right.exceptAll(left).agg(count(lit(1)).as("n_rows"))
          .select(lit("only_right").as("side"), col("n_rows")))

  /** SCD Type-2 interval build from a change log: per key, ordered by an
    * integral `orderCol` (e.g. epoch nanos — never a float timestamp),
    * (1) compress away rows whose `valueCol` equals the previous row's
    * (no-op updates create no version), then (2) derive each surviving
    * version's validity as `[order, next_change_order)` with NULL
    * `valid_to` on the current version. The dimension-versioning
    * primitive every warehouse ingest reimplements, as two partitioned
    * windows — both keyed on the dimension key, so a 100 TB change log
    * shuffles once and sorts within key groups only.
    *
    * Output: (key, valid_from, valid_to, value, is_current).
    */
  def scd2Intervals(df: DataFrame, keyCol: Column, orderCol: Column,
                    valueCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("o"))
    df.select(keyCol.as("key"), orderCol.as("o"), valueCol.as("v"))
      .withColumn("prev_v", lag(col("v"), 1).over(w))
      // `lag` of a literal marks row existence: a NULL `prev_v` alone can't
      // distinguish "first row of the key" from "previous value was NULL",
      // and a null->null no-op update must NOT open a new version
      .withColumn("has_prev", lag(lit(true), 1).over(w))
      .filter(col("has_prev").isNull || !(col("v") <=> col("prev_v")))
      .withColumn("valid_to", lead(col("o"), 1).over(w))
      .select(col("key"), col("o").as("valid_from"), col("valid_to"),
        col("v").as("value"),
        col("valid_to").isNull.cast("int").as("is_current"))
  }

  /** Changelog compaction: collapse an insert/update/delete log to the
    * final snapshot — the read-side merge every log-structured table
    * format (and [[scd2Intervals]]'s warehouse sibling) performs. Per
    * key, the row with the greatest `seqCol` wins; a winning `opCol` of
    * `"D"` means the key was deleted and is dropped from the snapshot.
    *
    * ONE hash aggregation: `max(struct(seq, payload...))` picks the
    * per-key latest row without any window sort — the associative-
    * aggregate shape that pre-merges map-side, so a 100 TB log with
    * hot keys still reduces before it shuffles. `seqCol` must be unique
    * per key (a log sequence number); with duplicated seqs the winner
    * would fall to payload-field comparison.
    *
    * Output: one row per surviving key — `keys`, then `seqCol`, then the
    * remaining payload columns in input order.
    */
  def applyChangelog(log: DataFrame, keys: Seq[String], seqCol: String,
                     opCol: String): DataFrame =
    latestByKey(log, keys, seqCol).filter(col(opCol) =!= "D")

  /** The per-key latest row of a sequenced log, TOMBSTONES INCLUDED —
    * [[applyChangelog]] without the delete filter. This is the form a
    * MAINTAINED snapshot must store: dropping tombstones would let a
    * late (or replayed) lower-seq row resurrect a deleted key on the
    * next merge ([[graft.streaming.Streams.streamChangelogCompact]]
    * relies on this). Same single max(struct) hash aggregation.
    */
  def latestByKey(log: DataFrame, keys: Seq[String],
                  seqCol: String): DataFrame = {
    require(keys.nonEmpty, "latestByKey needs at least one key column")
    val payload = log.columns.filterNot(c =>
      keys.contains(c) || c == seqCol).toSeq
    val packed = struct((col(seqCol).as(seqCol) +:
      payload.map(c => col(c).as(c))): _*)
    log.groupBy(keys.map(col): _*)
      .agg(max(packed).as("__last"))
      .select(keys.map(col) ++ (seqCol +: payload)
        .map(c => col(s"__last.$c").as(c)): _*)
  }
}
