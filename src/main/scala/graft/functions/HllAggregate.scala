package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `hll_registers(h)` — the HyperLogLog register table of a 60-bit hash
  * column as a native [[TypedImperativeAggregate]]: a fixed 32-int
  * buffer per group (m = 32 registers, rank capped at 40 — the q137
  * geometry), updated in-place and MERGED by elementwise max, so the
  * per-group shuffle payload is 32 bytes regardless of group size. The
  * relational formulation (groupBy(group, idx).max(rank)) shuffles
  * m·|groups| rows; this is the aggregate-function face of the same
  * mergeable sketch — one exchange on the group key alone.
  *
  * Register semantics are BIT-IDENTICAL to the SQL derivation both
  * engines run (q137's oracle): idx = h % 32, w = h div 32,
  * rank = least(56 − length(bin(w)), 40) with bin(0) = "0" (length 1).
  * Output: array<int> of 32 register values, 0 = never touched.
  */
case class HllRegisters(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] with ExpectsInputTypes {

  private val M = 32
  private val RankCap = 40

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_registers"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](M)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // SQL-% semantics (sign of the dividend); our hashes are ≥ 0 by
      // construction — fold a hostile negative input into the table
      // rather than corrupting an index
      var idx = (h % M).toInt
      if (idx < 0) idx += M
      val w = h / M
      // length(bin(w)): bit length, except bin(0) = "0" has length 1
      val len = if (w == 0) 1 else 64 - java.lang.Long.numberOfLeadingZeros(w)
      val rank = math.min(56 - len, RankCap)
      if (rank > buffer(idx)) buffer(idx) = rank
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < M) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](M) // ranks ≤ 40 — one byte each
    var i = 0
    while (i < M) { out(i) = buffer(i).toByte; i += 1 }
    out
  }

  override def deserialize(storageFormat: Array[Byte]): Array[Int] = {
    val out = new Array[Int](M)
    var i = 0
    while (i < M) { out(i) = storageFormat(i).toInt; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)
}
