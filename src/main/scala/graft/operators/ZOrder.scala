package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two bucketed
  * sort keys so that range partitioning on the combined value keeps
  * rows close in BOTH dimensions — the data-layout optimization behind
  * lakehouse `OPTIMIZE ZORDER BY`. A multi-dimensional box predicate
  * then touches a small, contiguous-ish set of partitions/files
  * instead of all of them (a linear sort clusters only its leading
  * key; the trailing key's values scatter across every partition).
  *
  * The z-value is pure integer arithmetic — shift/mask/or over
  * `bits`-wide bucket ids — generated from ONE template for both the
  * Spark Column and the equivalent SQL (see [[zValueSql]]), so a
  * DuckDB oracle recomputes it bit-for-bit.
  */
object ZOrder {

  /** Morton-interleave two non-negative bucket ids of `bits` bits each:
    * x occupies even bit positions, y odd. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      val xbit = shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
      val ybit = shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xbit.bitwiseOR(ybit)
    }.reduce(_.bitwiseOR(_))

  /** The identical computation as engine-portable SQL over column
    * expressions `x` and `y` (DuckDB and Spark SQL both have `&`, `|`,
    * and >>/<< shifts on BIGINT). */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})", s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")

  /** Range-partition `df` by the z-value of the two bucketed keys —
    * the write-side layout step. `numParts` plays the role of target
    * file count; each output partition covers a compact z-range, i.e.
    * a small tile set in (x, y) space, which is what makes min/max
    * skipping on BOTH columns effective at read time. */
  def repartitionByZ(df: DataFrame, x: Column, y: Column, bits: Int, numParts: Int): DataFrame = {
    // collision-proof temp name: never clobber a caller's column
    val zc = Iterator.from(0).map(i => s"__z$i").find(n => !df.columns.contains(n)).get
    df.withColumn(zc, zValue(x, y, bits))
      .repartitionByRange(numParts, col(zc))
      .sortWithinPartitions(col(zc))
      .drop(zc)
  }
}
