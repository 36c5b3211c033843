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

  /** Inner range join.
    *
    * @param left        interval side; all columns preserved
    * @param right       point side; all columns preserved (names must
    *                    not collide with left's)
    * @param leftLo      left column: interval lower bound (inclusive)
    * @param leftHi      left column: interval upper bound (inclusive)
    * @param rightPoint  right column: the point tested for containment
    * @param bucketWidth bucket quantum, same unit as the bound columns
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
                leftLo: String, leftHi: String, rightPoint: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val l = left.withColumn("__bucket",
      explode(sequence(expr(s"$leftLo div $bucketWidth"), expr(s"$leftHi div $bucketWidth"))))
    val r = right.withColumn("__bucket", expr(s"$rightPoint div $bucketWidth"))
    l.join(r, Seq("__bucket"))
      .where(col(rightPoint).between(col(leftLo), col(leftHi)))
      .drop("__bucket")
  }
}
