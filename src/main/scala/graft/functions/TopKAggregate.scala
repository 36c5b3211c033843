package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, Literal}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `topk_longs(v, k)` — the k largest values of a long column per
  * group, as a descending-sorted array. A native
  * [[TypedImperativeAggregate]] with a BOUNDED min-heap buffer:
  * map-side partials carry at most k longs per group, so the shuffle
  * for a per-group top-k is O(groups × k) regardless of group size —
  * the aggregate Spark's built-ins can't express (`collect_list` +
  * `slice(sort_array)` buffers the WHOLE group map-side; a window sort
  * shuffles every row). This is the per-group analogue of the map-side
  * WindowGroupLimit that only the bare row_number filter gets.
  *
  * Duplicates count separately (top-k of a multiset). Ties at the cut
  * boundary are value-identical, so the result multiset — and the
  * sorted array — is deterministic under any input order, task retry,
  * or partial-merge tree shape.
  */
case class TopKLongs(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] with ExpectsInputTypes {

  private lazy val k: Int = right match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"topk_longs k must be an integer literal, got $other")
  }

  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_longs"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val v = left.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedDesc)

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    buffer.foreach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(storageFormat)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.insert(bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopKLongs =
    copy(left = newLeft, right = newRight)
}

/** Bounded min-heap over a primitive long array — the k largest seen.
  * Classic binary heap; root (index 0) is the smallest retained value,
  * evicted when a larger value arrives on a full heap.
  */
final class TopKHeap(val k: Int) {
  private val a = new Array[Long](math.max(k, 1))
  private var n = 0

  def size: Int = n

  def insert(v: Long): Unit = {
    if (n < k) {
      a(n) = v
      n += 1
      var i = n - 1 // sift up
      while (i > 0 && a((i - 1) / 2) > a(i)) {
        val p = (i - 1) / 2
        val t = a(p); a(p) = a(i); a(i) = t
        i = p
      }
    } else if (k > 0 && v > a(0)) {
      a(0) = v
      var i = 0 // sift down
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var m = i
        if (l < n && a(l) < a(m)) m = l
        if (r < n && a(r) < a(m)) m = r
        if (m == i) done = true
        else { val t = a(m); a(m) = a(i); a(i) = t; i = m }
      }
    }
  }

  def mergeFrom(other: TopKHeap): Unit = other.foreach(insert)

  def foreach(f: Long => Unit): Unit = {
    var i = 0
    while (i < n) { f(a(i)); i += 1 }
  }

  def sortedDesc: Array[Long] = {
    val out = java.util.Arrays.copyOf(a, n)
    java.util.Arrays.sort(out)
    // reverse in place → descending
    var i = 0; var j = n - 1
    while (i < j) { val t = out(i); out(i) = out(j); out(j) = t; i += 1; j -= 1 }
    out
  }
}
