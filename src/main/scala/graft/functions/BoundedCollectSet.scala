package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Capped distinct-set buffer: collects at most `cap` distinct longs; one
  * element past the cap flips `overflowed` and collection stops. */
final class BoundedLongSet(val cap: Int) {
  val set = new java.util.HashSet[java.lang.Long]()
  var overflowed = false

  def add(v: Long): Unit = {
    if (!overflowed) {
      if (set.size < cap || set.contains(v)) set.add(v)
      else overflowed = true
    }
  }
}

/** `bounded_collect_set(id, cap)` → sorted array<bigint> of the group's
  * distinct values, or NULL when the group exceeds `cap` distinct values.
  *
  * The memory-safe replacement for `collect_set` + post-aggregation size
  * cap in LSH bucket joins: `collect_set` accumulates an UNBOUNDED buffer
  * before the filter ever runs — a degenerate bucket with millions of
  * members OOMs the aggregation long before its size can be tested. This
  * aggregate caps the buffer itself at O(cap) on the map side, so dropping
  * oversized buckets costs nothing regardless of skew. */
case class BoundedCollectSet(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedLongSet]
    with UnaryLike[Expression] {

  require(cap >= 1, "cap must be >= 1")

  override def prettyName: String = "bounded_collect_set"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects bigint input, got ${t.sql}")
  }

  override def createAggregationBuffer(): BoundedLongSet =
    new BoundedLongSet(cap)

  override def update(buffer: BoundedLongSet,
      input: InternalRow): BoundedLongSet = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BoundedLongSet,
      other: BoundedLongSet): BoundedLongSet = {
    if (other.overflowed) buffer.overflowed = true
    else {
      val it = other.set.iterator()
      while (it.hasNext && !buffer.overflowed) buffer.add(it.next())
    }
    buffer
  }

  override def eval(buffer: BoundedLongSet): Any = {
    if (buffer.overflowed) null
    else {
      val arr = new Array[Long](buffer.set.size)
      val it = buffer.set.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      java.util.Arrays.sort(arr)
      new GenericArrayData(arr)
    }
  }

  override def serialize(buffer: BoundedLongSet): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buffer.overflowed)
    out.writeInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedLongSet = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    buf.overflowed = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedCollectSet = copy(child = newChild)
}
