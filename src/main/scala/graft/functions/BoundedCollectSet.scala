package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Capped distinct-set buffer: collects at most `cap` distinct values; one
  * element past the cap flips `overflowed` and collection stops. */
final class BoundedAnySet(val cap: Int) {
  val set = new java.util.HashSet[Any]()
  var overflowed = false

  /** Add a value; flips to the over-cap (dropped) state past the bound. */
  def add(v: Any): Unit = {
    if (!overflowed) {
      if (set.size < cap || set.contains(v)) set.add(v)
      else overflowed = true
    }
  }
}

/** `bounded_collect_set(id, cap)` → sorted array of the group's distinct
  * values (int, bigint, or string ids), or NULL when the group exceeds
  * `cap` distinct values.
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
    extends TypedImperativeAggregate[BoundedAnySet]
    with UnaryLike[Expression] {

  require(cap >= 1, "cap must be >= 1")

  override def prettyName: String = "bounded_collect_set"
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects int, bigint or string input, got ${t.sql}")
  }

  override def createAggregationBuffer(): BoundedAnySet =
    new BoundedAnySet(cap)

  override def update(buffer: BoundedAnySet,
      input: InternalRow): BoundedAnySet = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String from unsafe rows may point into reused buffers — copy
      val stable = v match {
        case u: UTF8String => u.clone()
        case other => other
      }
      buffer.add(stable)
    }
    buffer
  }

  override def merge(buffer: BoundedAnySet,
      other: BoundedAnySet): BoundedAnySet = {
    if (other.overflowed) buffer.overflowed = true
    else {
      val it = other.set.iterator()
      while (it.hasNext && !buffer.overflowed) buffer.add(it.next())
    }
    buffer
  }

  override def eval(buffer: BoundedAnySet): Any = {
    if (buffer.overflowed) null
    else {
      val arr = buffer.set.toArray
      child.dataType match {
        case IntegerType =>
          java.util.Arrays.sort(arr,
            Ordering.Int.on[AnyRef](_.asInstanceOf[Int]))
        case LongType =>
          java.util.Arrays.sort(arr,
            Ordering.Long.on[AnyRef](_.asInstanceOf[Long]))
        case StringType =>
          java.util.Arrays.sort(arr, new java.util.Comparator[AnyRef] {
            override def compare(a: AnyRef, b: AnyRef): Int =
              a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
          })
      }
      new GenericArrayData(arr)
    }
  }

  override def serialize(buffer: BoundedAnySet): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buffer.overflowed)
    out.writeInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) {
      child.dataType match {
        case IntegerType => out.writeInt(it.next().asInstanceOf[Int])
        case LongType => out.writeLong(it.next().asInstanceOf[Long])
        case StringType =>
          val b = it.next().asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length); out.write(b)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedAnySet = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    buf.overflowed = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val v: Any = child.dataType match {
        case IntegerType => in.readInt()
        case LongType => in.readLong()
        case StringType =>
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          UTF8String.fromBytes(b)
      }
      buf.add(v)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedCollectSet = copy(child = newChild)
}
