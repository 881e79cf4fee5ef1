package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Upper-triangle Gram-matrix sum of quantized vectors as a typed
  * imperative aggregate — the one-pass primitive under covariance/PCA
  * over an embedding column. For each input vector x the update loop
  * quantizes q_i = floor(x_i·scale + 0.5) as a long and accumulates
  * q_i·q_j for every i <= j into a packed dim·(dim+1)/2 long buffer.
  *
  * Integer products summed as longs are EXACT and order-independent, so
  * the emitted sums hash-match any ANSI engine computing the same
  * floor-quantized products (the [[VectorSumAgg]] micro-unit trick,
  * extended from linear to bilinear terms). Magnitudes: |q| <= scale·|x|;
  * with unit-scale embeddings and scale = 1e6, a product is ~1e12 and
  * 9e6 rows fit before a long sum could overflow — [[update]] guards the
  * per-element quantized magnitude so overflow fails loudly, not as a
  * silent wraparound.
  *
  * Scale shape: map-side partial aggregation — each task folds its rows
  * into one local triangle and only dim·(dim+1)/2 longs per task cross
  * the wire, never the vectors. At dim=64 that is 2080 longs (16 KiB);
  * a 1000-executor scan of 100 TB of embeddings reduces to one 16 KiB
  * merge per task regardless of row count.
  */
case class GramSumAgg(child: Expression, dim: Int, quantScale: Double,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(dim > 0, "dim must be positive")
  require(quantScale > 0, "quantScale must be positive")

  private val tri = dim * (dim + 1) / 2
  // |q_i| cap keeps a SINGLE product inside a long (3e9² ≈ Long.Max);
  // the running sums use addExact below, so accumulation across rows or
  // partitions can never wrap silently either — quantized unit-scale
  // embeddings sit ~6 orders below the cap, so the checks never fire on
  // sane inputs and cost one branch each (intrinsified)
  private val qCap = 3_000_000_000L

  private lazy val floats = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double>, got ${other.simpleString}")
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_sum"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](tri)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != dim)
        throw new IllegalArgumentException(
          s"gram_sum(dim=$dim) got a vector of length ${arr.numElements()}")
      val q = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(s"gram_sum: null element at $i")
        val x = if (floats) arr.getFloat(i).toDouble else arr.getDouble(i)
        val qi = math.floor(x * quantScale + 0.5)
        if (math.abs(qi) > qCap)
          throw new ArithmeticException(
            s"gram_sum: quantized magnitude ${qi.toLong} exceeds the " +
              s"overflow guard ($qCap) — lower quantScale")
        q(i) = qi.toLong
        i += 1
      }
      var k = 0
      i = 0
      while (i < dim) {
        val qi = q(i)
        var j = i
        while (j < dim) {
          buf(k) = Math.addExact(buf(k), qi * q(j))
          j += 1; k += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < tri) { a(k) = Math.addExact(a(k), b(k)); k += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * tri)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(tri)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramSumAgg =
    copy(child = newChildren.head)
}

object GramSumAgg {
  /** Aggregate Column: packed upper-triangle sums of floor(x·scale+0.5)
    * quantized outer products, as array<long> of length dim·(dim+1)/2 in
    * row-major (i <= j) order.
    */
  def gramSumQuantized(vec: Column, dim: Int, scale: Double): Column =
    ColumnBridge.column(
      GramSumAgg(ColumnBridge.expression(vec), dim, scale)
        .toAggregateExpression())
}
