package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order rank — the scale-correct replacement for a
  * single-partition `row_number() OVER (ORDER BY ...)` (which funnels
  * 100 TB through one task and dies).
  *
  * Shape: `repartitionByRange` on the sort keys gives globally ordered
  * partition RANGES; `sortWithinPartitions` orders inside each; the
  * global rank of a row is then (rows in all earlier partitions) +
  * (its position inside its own partition). Both terms come from ONE
  * range shuffle:
  *
  *   - position-in-partition: `monotonically_increasing_id()` evaluated
  *     ABOVE the partition-local sort is `partitionId << 33 | localRow`
  *     by construction, so the low 33 bits are the 0-based sorted
  *     position and the high bits the range-partition id. The column is
  *     nondeterministic-flagged, which is exactly what stops Catalyst
  *     from reordering it below the sort; its VALUE is deterministic
  *     here because the partition contents and order are (range
  *     partitioning + total sort key). Task retry replays the same
  *     sorted iterator and reassigns identical ids.
  *   - earlier-partition counts: a `groupBy(partitionId).count()` over
  *     the SAME ranged subtree — Catalyst's ReuseExchange dedupes the
  *     range shuffle, so the data moves once — then a prefix sum over
  *     the tiny (one row per partition) count table, broadcast-joined
  *     back. No second shuffle of the big side.
  *
  * The caller must pass a TOTAL order (append a unique tiebreak key);
  * ties across a partition boundary would otherwise make range
  * placement, and hence ranks, nondeterministic.
  */
object GlobalRank {

  private val LocalBits = 33
  private val LocalMask = (1L << LocalBits) - 1

  /** @param df        input
    * @param sortExprs  total-order sort expressions (e.g. `col("p").desc, col("id").asc`)
    * @param numParts   range partitions — on a real cluster, ~cores×2; each
    *                   partition must fit a task (the only memory bound here)
    * @param rankCol    name of the produced 1-based BIGINT rank column
    */
  def rank(df: DataFrame, sortExprs: Seq[Column], numParts: Int, rankCol: String): DataFrame =
    rankWithTotal(df, sortExprs, numParts, rankCol, totalCol = None)

  /** Like [[rank]], but also emits the TOTAL row count as a column when
    * `totalCol` is set — computed from the same tiny per-partition count
    * table and carried on the broadcast offsets join, so rank-relative
    * operators (ntile/equi-depth buckets, percentile cuts) need no
    * second scan of the data and no extra join. */
  def rankWithTotal(df: DataFrame, sortExprs: Seq[Column], numParts: Int,
                    rankCol: String, totalCol: Option[String]): DataFrame = {
    // Correctness REQUIRES the counts branch and the ranked branch to
    // read the same physical range shuffle: RangePartitioner samples
    // its boundaries per execution, so two independent executions of
    // the repartitionByRange could place rows differently and the
    // offsets would lie. ReuseExchange (and AQE stage reuse) is what
    // collapses the two subtrees onto one shuffle — fail fast if it's
    // disabled rather than return silently wrong ranks.
    // NOTE: AQE's stage cache is ALSO gated on this flag (probed: with
    // exchange.reuse=false and AQE on, the final plan carries TWO
    // independent rangepartitioning exchanges), so AQE being enabled is
    // not a substitute.
    require(df.sparkSession.conf.get("spark.sql.exchange.reuse", "true").toBoolean,
      "GlobalRank needs spark.sql.exchange.reuse enabled: without it the counts branch " +
        "re-executes the range shuffle with freshly sampled boundaries and the prefix " +
        "offsets no longer describe the ranked partitions")
    val parted = df.repartitionByRange(numParts, sortExprs: _*)
    val ranged = parted
      .sortWithinPartitions(sortExprs: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), LocalBits))
      .withColumn("__local", col("__mid").bitwiseAND(lit(LocalMask)))
    // partition sizes don't depend on intra-partition order, so the
    // counts branch hangs off the exchange BEFORE the sort
    // (spark_partition_id, no second per-partition sort at scale);
    // ReuseExchange still dedupes the range shuffle itself.
    val counts = parted
      .select(spark_partition_id().cast("long").as("__pid"))
      .groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
    // one row per partition: the single-partition window is over
    // `numParts` rows, not the data
    val withOff = counts
      .withColumn("__off",
        coalesce(
          sum(col("__n")).over(
            Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
    val offsets = totalCol match {
      case Some(tc) =>
        withOff
          .withColumn(tc,
            sum(col("__n")).over(
              Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .select(col("__pid"), col("__off"), col(tc))
      case None => withOff.select(col("__pid"), col("__off"))
    }
    ranged
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(rankCol, col("__off") + col("__local") + lit(1L))
      .drop("__mid", "__pid", "__local", "__off")
  }

  /** Distributed RUNNING SUM of `valueCol` in global `sortExprs` order —
    * the segmented-carry decomposition (the q158 shape) applied to the
    * total order: one range shuffle, a per-partition cumulative window
    * (each task sums only its own range), and a numParts-row carry
    * table broadcast back. The scale-correct replacement for
    * `sum(...).over(Window.orderBy(...))`, which drags every row
    * through ONE task. Emits `cumCol` (inclusive running sum) and,
    * when `totalCol` is set, the grand total on every row — the shape
    * budget-cut selections need (take while cum ≤ f(total)) with no
    * second scan. Same ReuseExchange requirement as [[rank]]: the
    * carry branch must read the SAME physical range shuffle. */
  def prefixSum(df: DataFrame, sortExprs: Seq[Column], valueCol: Column, numParts: Int,
                cumCol: String, totalCol: Option[String] = None): DataFrame = {
    require(df.sparkSession.conf.get("spark.sql.exchange.reuse", "true").toBoolean,
      "GlobalRank.prefixSum needs spark.sql.exchange.reuse enabled: without it the carry " +
        "branch re-executes the range shuffle with freshly sampled boundaries and the " +
        "per-partition carries no longer describe the summed partitions")
    val parted = df.withColumn("__v", valueCol).repartitionByRange(numParts, sortExprs: _*)
    // __pid is MATERIALIZED in a projection directly over the range
    // exchange, then the window partitions by the column VALUE: a
    // window partitioned by spark_partition_id() itself would re-plan
    // an exchange and re-evaluate the id on the far side — different
    // numbers, corrupted groups. The window's own hash exchange on
    // __pid moves each range partition intact (task-sized groups).
    val localW = Window.partitionBy(col("__pid"))
      .orderBy(sortExprs: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted
      .withColumn("__pid", spark_partition_id().cast("long"))
      .withColumn("__cum", sum(col("__v")).over(localW))
    val sums = parted
      .select(spark_partition_id().cast("long").as("__pid"), col("__v"))
      .groupBy(col("__pid")).agg(sum(col("__v")).as("__s"))
    // numParts rows: the carry = sum of all earlier partitions
    val carry0 = sums.withColumn("__carry",
      coalesce(sum(col("__s")).over(
        Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val carries = totalCol match {
      case Some(tc) => carry0.withColumn(tc,
          sum(col("__s")).over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("__pid"), col("__carry"), col(tc))
      case None => carry0.select(col("__pid"), col("__carry"))
    }
    local
      .join(broadcast(carries), Seq("__pid"))
      .withColumn(cumCol, col("__carry") + col("__cum"))
      .drop("__pid", "__v", "__cum", "__carry")
  }
}
