package graft.vector

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k buffer: a binary heap with the WORST element at the
  * root, so insertion into a full buffer is an O(log k) replace.
  *
  * Ordering: `asc=false` keeps the k largest scores (cosine/IP
  * similarity), `asc=true` the k smallest (L2 distance). Ties break
  * toward the smaller id (numeric or lexicographic for string ids),
  * which pins a total order so results are deterministic and match the
  * SQL oracle's `row_number() OVER (ORDER BY score [DESC], id)`.
  *
  * Ids are `Long` or `UTF8String` (the reference's primary key is a
  * string — /root/reference/aiotcvectordb/model/document.py `Document.id`).
  */
final class TopKBuffer(val k: Int, val asc: Boolean) {
  private[vector] var scores = new Array[Double](math.min(k, 16))
  private[vector] var ids = new Array[Any](math.min(k, 16))
  private[vector] var size = 0

  @inline private def idWorse(i1: Any, i2: Any): Boolean = (i1, i2) match {
    case (a: java.lang.Long, b: java.lang.Long) => a > b
    case (a: UTF8String, b: UTF8String) => a.compareTo(b) > 0
    case _ => false
  }

  /** true if (s1,i1) ranks strictly worse than (s2,i2). */
  @inline private def worse(s1: Double, i1: Any, s2: Double, i2: Any): Boolean =
    if (s1 != s2) { if (asc) s1 > s2 else s1 < s2 } else idWorse(i1, i2)

  private def grow(): Unit = {
    val cap = math.min(k, math.max(scores.length * 2, 16))
    scores = java.util.Arrays.copyOf(scores, cap)
    ids = java.util.Arrays.copyOf(ids.asInstanceOf[Array[AnyRef]], cap).asInstanceOf[Array[Any]]
  }

  private def siftUp(pos0: Int): Unit = {
    var pos = pos0
    while (pos > 0) {
      val parent = (pos - 1) >> 1
      if (worse(scores(pos), ids(pos), scores(parent), ids(parent))) {
        swap(pos, parent); pos = parent
      } else return
    }
  }

  private def siftDown(pos0: Int): Unit = {
    var pos = pos0
    while (true) {
      val l = 2 * pos + 1; val r = l + 1
      var m = pos
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == pos) return
      swap(pos, m); pos = m
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  def insert(score: Double, id: Any): Unit = {
    if (size < k) {
      if (size == scores.length) grow()
      scores(size) = score; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }
  }

  def mergeFrom(other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
    this
  }

  /** (score, id) pairs best-first. */
  def sortedPairs: Array[(Double, Any)] = {
    val out = Array.tabulate(size)(i => (scores(i), ids(i)))
    out.sortWith { case ((s1, i1), (s2, i2)) =>
      if (s1 != s2) { if (asc) s1 < s2 else s1 > s2 } else idWorse(i2, i1)
    }
  }
}

/** Top-k-by-score as a [[TypedImperativeAggregate]].
  *
  * This is the scale-critical piece of exact KNN (reference surface:
  * collection.search with `limit`, /root/reference/aiotcvectordb/model/
  * collection.py): a window `row_number() <= k` would shuffle EVERY
  * scored row to sort it; this aggregate keeps a k-sized heap per
  * partition (partial aggregation), so only `k` rows per partition per
  * group cross the shuffle — at 100 TB that's the difference between
  * shuffling terabytes and kilobytes.
  *
  * Returns `array<struct<score:double, id:<id type>>>` sorted best-first.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    asc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"k must be positive, got $k")

  private def idIsString: Boolean = id.dataType == StringType

  override def children: Seq[Expression] = Seq(score, id)
  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType &&
        (id.dataType == LongType || id.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk requires (double, bigint|string) inputs, got " +
        s"${score.dataType.catalogString}, ${id.dataType.catalogString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType().add("score", DoubleType, nullable = false)
      .add("id", id.dataType, nullable = false),
    containsNull = false)
  override def prettyName: String = "topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, asc)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    if (s != null) {
      val i = id.eval(input)
      if (i != null) {
        // UTF8String from an unsafe row may be backed by a reused
        // buffer — copy before retaining across rows
        val stable = i match {
          case u: UTF8String => u.clone()
          case other => other
        }
        buffer.insert(s.asInstanceOf[Double], stable)
      }
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer =
    buffer.mergeFrom(other)

  override def eval(buffer: TopKBuffer): Any = {
    val pairs = buffer.sortedPairs
    new GenericArrayData(pairs.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    if (!idIsString) {
      val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
      bb.putInt(buffer.size)
      var i = 0
      while (i < buffer.size) {
        bb.putDouble(buffer.scores(i)); bb.putLong(buffer.ids(i).asInstanceOf[Long]); i += 1
      }
      bb.array()
    } else {
      val idBytes = (0 until buffer.size).map(i =>
        buffer.ids(i).asInstanceOf[UTF8String].getBytes)
      val bb = ByteBuffer.allocate(4 + idBytes.map(_.length + 12).sum)
      bb.putInt(buffer.size)
      var i = 0
      while (i < buffer.size) {
        bb.putDouble(buffer.scores(i))
        bb.putInt(idBytes(i).length); bb.put(idBytes(i)); i += 1
      }
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k, asc)
    var i = 0
    if (!idIsString) {
      while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    } else {
      while (i < n) {
        val s = bb.getDouble
        val len = bb.getInt
        val arr = new Array[Byte](len)
        bb.get(arr)
        buf.insert(s, UTF8String.fromBytes(arr))
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** topk(score, id) aggregate Column; array<struct<score,id>> best-first. */
  def topk(score: Column, id: Column, k: Int, asc: Boolean): Column =
    GraftShims.column(TopKAgg(GraftShims.expression(score),
      GraftShims.expression(id), k, asc).toAggregateExpression())
}
