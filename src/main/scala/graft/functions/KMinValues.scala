package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded k-minimum-values buffer: the k SMALLEST distinct longs seen so
  * far. Backed by a TreeSet so duplicate inserts are free no-ops and the
  * eviction candidate (the current maximum) is O(log k). Never holds more
  * than k entries — partial aggregation buffers stay O(k) regardless of how
  * many rows a group has. */
final class KMinSet(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()

  /** Add a hash, keeping the k smallest distinct values. */
  def add(v: Long): Unit = {
    if (set.size < k) { set.add(v); () }
    else if (v < set.last()) {
      if (set.add(v)) { set.pollLast(); () }
    }
  }
}

/** `kmin_values(hash, k)` → ascending array of the group's k smallest
  * DISTINCT bigint hash values — the K-Minimum-Values cardinality sketch
  * (Bar-Yossef et al. 2002; the estimator `(k-1) * H / h_(k)` for hashes
  * uniform on [0, H)).
  *
  * The scale property vs `count(DISTINCT x)`: exact distinct aggregation
  * shuffles EVERY distinct value of every group; this sketch is an
  * associative, commutative bounded buffer — each map task keeps k longs
  * per group, only those cross the shuffle, and merging two sketches is a
  * k-way min-merge. Sketches for different partitions/days can be stored
  * and unioned later (mergeable), which is what makes distinct-counting
  * feasible over a 100 TB corpus without re-scanning history. */
case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KMinSet]
    with UnaryLike[Expression] {

  require(k >= 2, "k must be >= 2 (the estimator needs a k-th minimum)")

  override def prettyName: String = "kmin_values"
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint hash input, got ${t.sql}")
  }

  override def createAggregationBuffer(): KMinSet = new KMinSet(k)

  override def update(buffer: KMinSet, input: InternalRow): KMinSet = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KMinSet, other: KMinSet): KMinSet = {
    val it = other.set.iterator()
    while (it.hasNext) buffer.add(it.next())
    buffer
  }

  override def eval(buffer: KMinSet): Any = {
    val arr = new Array[Any](buffer.set.size)
    val it = buffer.set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buffer: KMinSet): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KMinSet = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): KMinValues = copy(child = newChild)
}
