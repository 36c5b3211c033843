package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the single right row
  * with the greatest `rightTs <= leftTs` within the same key — the
  * point-in-time lookup every event-attribution / slowly-changing-state
  * query needs, which Spark has no built-in operator for.
  *
  * Implementation is a UNION + running-window, not a join:
  * both sides are tagged and unioned on (key, ts, side); a
  * `last(payload, ignoreNulls)` window running over the per-key
  * time-sorted stream picks up, at every left row, the most recent right
  * payload at-or-before it. Right rows sort BEFORE left rows at equal
  * timestamps, so `rightTs == leftTs` matches (ASOF's `<=` semantics).
  *
  * Scale shape: exactly ONE shuffle (hash partition by key) and one
  * per-key sort — the same cost as any sort-merge formulation, with no
  * join node at all, no range explosion, and no per-key data duplication
  * (a range/inequality join would replicate right rows across every
  * admissible left row BEFORE picking the max). Window processing
  * streams each key group, so memory is O(1) per key beyond the sort
  * spill, which Spark's UnsafeExternalSorter handles out-of-core. At
  * 100 TB the plan is: shuffle once on a (usually high-cardinality) key,
  * sort within partitions, single pass.
  *
  * Skew: AQE's skew handling splits oversized partitions for JOINS, not
  * for Window stages — a single hot key here lands in one task, whole
  * (the sort spills out-of-core, so it completes, but serially). The
  * join-based alternatives have the same hot-key serialization AND
  * replicate data, so this shape is still the right one; for known-hot
  * keys the real mitigations are (a) pre-aggregate the right side to one
  * row per (key, coarse-time) before joining, or (b) a two-level as-of:
  * first within (key, time-bucket), then a small per-key fix-up join for
  * left rows whose bucket had no earlier right row.
  *
  * The right side must be unique per (key, rightTs) — pre-aggregate
  * duplicates first, otherwise which of the tied rows wins is
  * nondeterministic (same caveat as DuckDB's ASOF JOIN, which this
  * operator's results are hash-verified against in q32).
  */
object AsOfJoin {

  /** Left-outer as-of join.
    *
    * @param left     probe side; all its columns are preserved
    * @param right    build side, unique per (key, rightTs)
    * @param key      equi-key column name present on both sides
    * @param leftTs   left event-time column (numeric or timestamp)
    * @param rightTs  right event-time column, same type as leftTs
    * @param payload  right columns to attach (may include rightTs)
    * @return left rows + payload columns (null when no right row is
    *         at-or-before the left timestamp)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The operator reserves the "__"-prefixed scratch names below; an
    // input column with that prefix would be silently shadowed.
    val reserved = (leftCols ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"asOf reserves column names starting with '__'; rename: ${reserved.mkString(", ")}")
    val payloadType = right.select(struct(payload.map(qcol): _*)).schema.head.dataType
    val rowType = left.select(struct(leftCols.map(qcol): _*)).schema.head.dataType

    val probe = left.select(
      qcol(key).as("__k"), qcol(leftTs).as("__ts"), lit(1).as("__side"),
      lit(null).cast(payloadType).as("__p"),
      struct(leftCols.map(qcol): _*).as("__row"))
    val build = right.select(
      qcol(key).as("__k"), qcol(rightTs).as("__ts"), lit(0).as("__side"),
      struct(payload.map(qcol): _*).as("__p"),
      lit(null).cast(rowType).as("__row"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)

    val matched = probe.unionByName(build)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    // getField treats the name as a literal field, so left/payload column
    // names containing dots resolve correctly (a string path would not).
    val out: Seq[Column] =
      leftCols.map(c => col("__row").getField(c).as(c)) ++
        payload.map(p => col("__m").getField(p).as(p))
    matched.select(out: _*)
  }
}
