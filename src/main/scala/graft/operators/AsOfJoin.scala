package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series as-of join: for every left row, the single most recent right
  * row with `rightTime <= leftTime` on the same key (the "backward" as-of
  * of kdb/pandas `merge_asof`/DuckDB `ASOF JOIN`). Spark has no native
  * operator for this; the standard workarounds — a range-predicate join
  * (quadratic blowup inside a nested loop or interval explosion) or a
  * per-key `collect_list` + UDF scan — don't survive large keys.
  *
  * Implementation is the union + ordered-window formulation: tag both
  * sides, union by name, and within each key take the running `last`
  * non-null right value over `(time, side)` order. That plans as ONE hash
  * shuffle per side on the key plus a within-partition sort — the same
  * exchange profile as a sort-merge join, linear in |left| + |right|, no
  * candidate explosion, AQE-friendly at 100 TB.
  *
  * Semantics notes:
  *  - ties (`rightTime == leftTime`) match, like DuckDB's `ON l.t >= r.t`;
  *  - right rows should be unique per (key, time) — pre-aggregate
  *    duplicates first or the winner among equal-time rows is
  *    plan-dependent (the query layer dedupes with max());
  *  - `joinType = "left"` keeps unmatched left rows with nulls; `"inner"`
  *    drops them.
  */
object AsOfJoin {

  def asOfBackward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      joinType: String = "left"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    require(Seq("left", "inner").contains(joinType),
      s"joinType must be left or inner, got $joinType")
    val rightCols = right.columns.filterNot(c =>
      keys.contains(c) || c == rightTime).toSeq
    val overlap = rightCols.toSet.intersect(
      left.columns.filterNot(keys.contains).toSet)
    require(overlap.isEmpty,
      s"right value columns collide with left columns: $overlap — alias them first")

    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right
      .withColumnRenamed(rightTime, "__rt")
      .withColumn("__t", col("__rt"))
      .withColumn("__side", lit(0))
    // union by name; each side's private columns are null on the other
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // side 0 sorts before side 1 at equal __t, so an exactly-at-time right
    // row is visible to the left row (>= semantics)
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Backfill the right row as ONE struct, not column-by-column: an
    // independent last(col, ignoreNulls) per column would skip a NULL
    // field of the matched row and pull that field from an OLDER right
    // row — a torn row mixing two right rows. The struct itself is
    // non-null for every right row (fields may be null inside), so one
    // ignoreNulls fill carries the latest right row atomically.
    val packed = struct((rightCols :+ "__rt").map(col): _*)
    val filled = unioned.withColumn("__m",
      last(when(col("__side") === 0, packed), ignoreNulls = true).over(w))
    val matchedOnly =
      if (joinType == "inner") filled.filter(col("__m").isNotNull) else filled
    val unpacked = (rightCols :+ "__rt").foldLeft(matchedOnly) { (df, c) =>
      df.withColumn(c, col("__m").getField(c))
    }
    unpacked
      .filter(col("__side") === 1)
      .withColumnRenamed("__rt", s"${rightTime}_matched")
      .drop("__t", "__side", "__m")
  }
}
