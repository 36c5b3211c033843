package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: pair each left row with every right row whose
  * point column falls inside the left row's [lo, hi] interval — with NO
  * equi-key between the sides. Spark's built-in planning for a pure
  * inequality join is BroadcastNestedLoopJoin (O(|L|·|R|) comparisons
  * and a broadcast of a whole side), which dies at scale.
  *
  * Implementation is the standard bucketed decomposition: quantize time
  * into width-`bucketWidth` buckets; each RIGHT row lands in exactly one
  * bucket, each LEFT interval is replicated across the buckets it
  * overlaps (⌈span/width⌉+1, a small constant when width ≈ span); an
  * EQUI-join on the bucket id meets every qualifying pair exactly once
  * (the right row's bucket is unique, so no post-join dedup), and the
  * precise `BETWEEN` predicate runs as a cheap post-join filter.
  *
  * Scale shape: one shuffle per side on a high-cardinality uniform key
  * (the bucket id), shuffled-hash/sort-merge joinable, no broadcast of
  * unbounded data, no nested loop. Replication factor is bounded by the
  * interval span / bucket width — callers pick `bucketWidth` on the
  * order of the typical span. Skewed buckets (event bursts) are split
  * by AQE skew-join handling.
  *
  * Assumes non-negative domain values (bucket id via truncating `div`;
  * shift inputs if negatives are possible).
  */
object RangeJoin {

  private def q(name: String): String = quoteIdent(name)

  /** Inner range join.
    *
    * @param left           interval side; all columns preserved
    * @param right          point side; all columns preserved (names must
    *                       not collide with left's)
    * @param leftLo         left column: interval lower bound (inclusive)
    * @param leftHi         left column: interval upper bound (inclusive)
    * @param rightPoint     right column: the point tested for containment
    * @param bucketWidth    bucket quantum, same unit as the bound columns
    * @param maxReplication fail fast if any single interval would fan out
    *                       across more than this many buckets — one
    *                       pathological row (corrupt bound, or a
    *                       bucketWidth orders of magnitude under the
    *                       typical span) would otherwise materialize a
    *                       huge per-row array and OOM an executor; a loud
    *                       error at the first bad row beats that.
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
                leftLo: String, leftHi: String, rightPoint: String,
                bucketWidth: Long, maxReplication: Long = 10000L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(maxReplication > 0, s"maxReplication must be positive: $maxReplication")
    val loBucket = expr(s"${q(leftLo)} div $bucketWidth")
    val hiBucket = expr(s"${q(leftHi)} div $bucketWidth")
    // when/otherwise keeps the guard inside the sequence's upper-bound
    // expression, so column pruning can never drop it. NULL bounds pass
    // a null upper bound through (sequence → null, explode drops the
    // row — standard inner-join null semantics), they do NOT abort.
    val guardedHi = when(loBucket.isNull || hiBucket.isNull, lit(null).cast("bigint"))
      .when(hiBucket - loBucket < maxReplication, hiBucket)
      .otherwise(raise_error(concat(
        lit(s"rangeJoin: interval [${q(leftLo)}, ${q(leftHi)}] spans more than " +
          s"$maxReplication buckets of width $bucketWidth (lo="),
        col(q(leftLo)), lit(", hi="), col(q(leftHi)),
        lit("); widen bucketWidth or fix the data"))))
    val l = left.withColumn("__bucket", explode(sequence(loBucket, guardedHi)))
    val r = right.withColumn("__bucket", expr(s"${q(rightPoint)} div $bucketWidth"))
    l.join(r, Seq("__bucket"))
      .where(col(q(rightPoint)).between(col(q(leftLo)), col(q(leftHi))))
      .drop("__bucket")
  }
}
