package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k heap: keeps the k best (score, id) entries under the total
  * order (score DESC, id ASC). The root of the binary heap is the WORST kept
  * entry, so an insert into a full heap is a single root compare in the
  * common reject case. Never holds more than k entries — this is what makes
  * the aggregate's map-side partial buffers O(k) instead of O(rows).
  */
final class TopKHeap(val k: Int, idOrd: Ordering[Any]) {
  val scores = new Array[Double](k)
  val ids = new Array[Any](k)
  var size = 0

  /** entry (s1,i1) is worse than (s2,i2) under (score desc, id asc). */
  private def worse(s1: Double, i1: Any, s2: Double, i2: Any): Boolean =
    s1 < s2 || (s1 == s2 && idOrd.gt(i1, i2))

  private def worseAt(i: Int, j: Int): Boolean =
    worse(scores(i), ids(i), scores(j), ids(j))

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0 && worseAt(i, (i - 1) / 2)) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var worst = i
      if (l < size && worseAt(l, worst)) worst = l
      if (r < size && worseAt(r, worst)) worst = r
      if (worst == i) done = true
      else { swap(i, worst); i = worst }
    }
  }

  /** Insert (score, id) keeping the k best entries (ties: lowest id). */
  def insert(score: Double, id: Any): Unit = {
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }
  }

  /** Entries best-first: (index sorted by score desc, id asc). */
  def sortedIndices: Array[Int] = {
    val idx = Array.tabulate(size)(identity)
    // best-first == ascending by "worse-ness" inverted
    scala.util.Sorting.stableSort[Int](idx,
      (a: Int, b: Int) => worseAt(b, a))
    idx
  }
}

/** Typed-imperative bounded top-k aggregate: `topk_by_score(score, id, k)` →
  * `array<struct<score double, id ...>>`, best-first, ties broken by id asc.
  *
  * The scale property (vs a `row_number()` window, which sends EVERY scored
  * row for a group through one reducer): this participates in partial
  * aggregation — each map task keeps a k-entry heap per group and only those
  * k-entry buffers cross the shuffle, so per-group reducer input is
  * k × numPartitions rows regardless of corpus size.
  */
case class TopKByScore(
    left: Expression,  // score: double
    right: Expression, // id: int / long / string
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  require(k >= 1, "k must be >= 1")

  override def prettyName: String = "topk_by_score"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", right.dataType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (DoubleType, IntegerType | LongType | StringType) =>
      TypeCheckResult.TypeCheckSuccess
    case (s, i) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (double, int|bigint|string), got (${s.sql}, ${i.sql})")
  }

  private def idOrdering: Ordering[Any] = (right.dataType match {
    case IntegerType => Ordering.Int
    case LongType => Ordering.Long
    case StringType => new Ordering[UTF8String] {
      override def compare(a: UTF8String, b: UTF8String): Int = a.compareTo(b)
    }
  }).asInstanceOf[Ordering[Any]]

  override def createAggregationBuffer(): TopKHeap =
    new TopKHeap(k, idOrdering)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = left.eval(input)
    val id = right.eval(input)
    // NaN scores are skipped like nulls: NaN compares false against
    // everything, so once inserted it could never be evicted and would
    // permanently occupy a top-k slot
    if (s != null && !java.lang.Double.isNaN(s.asInstanceOf[Double]) &&
      id != null) {
      // UTF8String from unsafe rows may point into reused buffers — copy
      val stableId = id match {
        case u: UTF8String => u.clone()
        case other => other
      }
      buffer.insert(s.asInstanceOf[Double], stableId)
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) {
      buffer.insert(other.scores(i), other.ids(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: TopKHeap): Any = {
    val order = buffer.sortedIndices
    val rows = new Array[Any](order.length)
    var i = 0
    while (i < order.length) {
      rows(i) = InternalRow(buffer.scores(order(i)), buffer.ids(order(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      out.writeDouble(buffer.scores(i))
      right.dataType match {
        case IntegerType => out.writeInt(buffer.ids(i).asInstanceOf[Int])
        case LongType => out.writeLong(buffer.ids(i).asInstanceOf[Long])
        case StringType =>
          val b = buffer.ids(i).asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length); out.write(b)
      }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val id: Any = right.dataType match {
        case IntegerType => in.readInt()
        case LongType => in.readLong()
        case StringType =>
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          UTF8String.fromBytes(b)
      }
      heap.insert(s, id)
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(left = newLeft, right = newRight)
}
