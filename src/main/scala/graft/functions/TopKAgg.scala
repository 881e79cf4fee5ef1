package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bounded top-k as a typed imperative aggregate over (score, id) pairs:
  * each partition keeps AT MOST k entries (a bounded array-heap), partial
  * results merge map-side, and only k rows per group ever cross the
  * shuffle. The window+row_number formulation sorts EVERY candidate row
  * of a group after a full shuffle — at 100 TB the difference is the
  * shuffle, not the sort. Ordering: score DESC, id ASC on ties (the same
  * deterministic contract as the window form, so results are identical).
  *
  * Buffer layout: growable arrays kept heap-ordered lazily — entries are
  * appended and trimmed to k by partial sort when they exceed 4k, which
  * amortizes cheaper than a strict heap for small k.
  */
case class TopKAgg(score: Expression, id: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAgg.Buf] {

  require(k > 0, "k must be positive")

  // fail at ANALYSIS, not with an executor ClassCastException mid-job
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, bigint) inputs, got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def prettyName: String = s"top_$k"

  override def createAggregationBuffer(): TopKAgg.Buf = new TopKAgg.Buf(k)

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKAgg.Buf, b: TopKAgg.Buf): TopKAgg.Buf = {
    var i = 0
    while (i < b.size) { a.add(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKAgg.Buf): Any = {
    val top = buf.sortedTop
    new GenericArrayData(top.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKAgg.Buf): Array[Byte] = {
    buf.trim()
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKAgg.Buf(k)
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {

  /** Growable (score, id) buffer trimmed to the best k when it exceeds
    * 4k entries. Ordering contract: higher score wins; ties → lower id.
    */
  final class Buf(k: Int) {
    var scores: Array[Double] = new Array[Double](math.max(4, k))
    var ids: Array[Long] = new Array[Long](math.max(4, k))
    var size: Int = 0

    // java.lang.Double.compare is a TOTAL order (NaN greatest, matching
    // Spark's window DESC ordering) — a plain > comparator is inconsistent
    // under NaN and can blow up TimSort or drop entries nondeterministically.
    private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }

    def add(s: Double, i: Long): Unit = {
      if (size == scores.length) {
        if (size >= 4 * k) trim()
        if (size == scores.length) {
          scores = java.util.Arrays.copyOf(scores, scores.length * 2)
          ids = java.util.Arrays.copyOf(ids, ids.length * 2)
        }
      }
      scores(size) = s; ids(size) = i; size += 1
    }

    /** Keep only the best k entries (order within the buffer unspecified). */
    def trim(): Unit = if (size > k) {
      val idx = Array.range(0, size).sortWith { (a, b) =>
        better(scores(a), ids(a), scores(b), ids(b))
      }
      val ns = new Array[Double](math.max(4, k))
      val ni = new Array[Long](math.max(4, k))
      var j = 0
      while (j < k) { ns(j) = scores(idx(j)); ni(j) = ids(idx(j)); j += 1 }
      scores = ns; ids = ni; size = k
    }

    /** Final best-k, ordered score DESC then id ASC. */
    def sortedTop: Array[(Double, Long)] = {
      trim()
      Array.range(0, size).sortWith { (a, b) =>
        better(scores(a), ids(a), scores(b), ids(b))
      }.map(j => (scores(j), ids(j)))
    }
  }

  /** Aggregate Column producing array<struct<score,id>> of the k best. */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
