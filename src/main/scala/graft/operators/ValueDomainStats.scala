package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics (median, arbitrary ranks) and cumulative
  * frequencies per group, decomposed over the VALUE DOMAIN — the shape
  * q130/q160/q185/q186 share, factored out so the next median-shaped
  * query cannot regress to a whole-partition sort.
  *
  * The k-th order statistic of a multiset is the smallest value whose
  * cumulative frequency reaches k. So: aggregate the corpus to
  * (group, value, count) first — ONE partial-aggregable shuffle, the
  * only corpus-width pass — and run the cumulative window over the
  * aggregated rows, whose per-group cardinality is bounded by the
  * value domain (distinct lengths/scores), never by the corpus. The
  * naive alternative (a per-group row_number window over raw rows) has
  * no constant top-k, so WindowGroupLimit cannot prune it: at 100 TB
  * with few groups it funnels every row of a group through one
  * window-sort task. PlanHygieneSpec pins the q130 family to this
  * decomposition ("never sorts whole-source ROWS through a window").
  *
  * Glossary of columns this operator adds: `cnt` (multiplicity of a
  * value in its group), `cum` (inclusive cumulative count in ascending
  * value order), `ntot` (group total).
  */
object ValueDomainStats {

  /** The one corpus-width pass: multiset → (group, value, cnt).
    * Partial-aggregable (map-side combine collapses each scan
    * partition to its distinct (group, value) pairs pre-shuffle). */
  def valueCounts(rows: DataFrame, group: String, value: String): DataFrame =
    rows.groupBy(col(group), col(value)).agg(count(lit(1)).as("cnt"))

  /** Adds `cum`: the inclusive cumulative frequency in ascending value
    * order per group. Input must already be value-domain sized (one
    * row per (group, value)) — pass [[valueCounts]] output or any
    * densified/derived count table (q186's ECDF grid). */
  def cumFreq(counts: DataFrame, group: String, value: String,
              cnt: String = "cnt"): DataFrame =
    counts.withColumn("cum", sum(col(cnt)).over(
      Window.partitionBy(col(group)).orderBy(col(value).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** Adds `ntot`: the group's total multiplicity (an unordered window
    * over the value-domain-sized table — still never corpus rows). */
  def withGroupTotal(counts: DataFrame, group: String,
                     cnt: String = "cnt"): DataFrame =
    counts.withColumn("ntot", sum(col(cnt)).over(Window.partitionBy(col(group))))

  /** Exact k-th order statistic per group. `k` is a Column that may
    * reference `ntot` (so ranks can depend on group size: median,
    * quartile, trimmed fence). Returns one (group, out) row per group
    * where 1 ≤ k ≤ ntot; a k outside that range yields no row. */
  def orderStat(rows: DataFrame, group: String, value: String,
                k: Column, out: String): DataFrame = {
    val cum = withGroupTotal(cumFreq(valueCounts(rows, group, value),
      group, value), group)
    // the k-th element lives at the first value whose cumulative count
    // reaches k: cum ≥ k but the PREVIOUS cum (cum − cnt) has not
    cum.filter(col("cum") >= k && col("cum") - col("cnt") < k)
      .select(col(group), col(value).as(out))
  }

  /** Exact LOWER median per group — the ((n+1) div 2)-th value. */
  def medianOf(rows: DataFrame, group: String, value: String,
               out: String): DataFrame =
    orderStat(rows, group, value, expr("(ntot + 1) div 2"), out)
}
