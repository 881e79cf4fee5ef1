package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Element-wise vector sum as a typed imperative aggregate — the
  * primitive under group centroids (mean embedding per cluster / topic /
  * source). Map-side partial merge, one double[] buffer per group;
  * combined with count it gives the mean without ever materializing the
  * group's vectors together.
  *
  * `quantScale > 0` quantizes each element to floor(x·scale + 0.5)
  * inside the update loop before summing: the summands become integral
  * doubles, whose addition is exact and order-independent below 2^53 —
  * which is what makes a centroid query hash-comparable against another
  * engine. Quantizing here (a compiled loop) rather than with a
  * `transform` HOF on the input avoids dim interpreted lambda evals per
  * row on the aggregate's hot path.
  */
case class VectorSumAgg(child: Expression, dim: Int,
                        quantScale: Double = 0.0,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  require(dim > 0, "dim must be positive")
  require(quantScale >= 0, "quantScale must be >= 0 (0 = no quantization)")

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
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_sum"

  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      // loud failure beats a silently skewed centroid: wrong dim or null
      // elements would otherwise truncate/zero-pad/zero-sum invisibly
      if (arr.numElements() != dim)
        throw new IllegalArgumentException(
          s"vector_sum(dim=$dim) got a vector of length ${arr.numElements()}")
      var i = 0
      while (i < dim) {
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"vector_sum: null element at index $i")
        val x = if (floats) arr.getFloat(i).toDouble else arr.getDouble(i)
        buf(i) += (if (quantScale > 0) math.floor(x * quantScale + 0.5) else x)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < dim) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * dim)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(dim)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = newChildren.head)
}

object VectorSumAgg {
  /** Aggregate Column: element-wise sum of vectors. */
  def vectorSum(vec: Column, dim: Int): Column =
    ColumnBridge.column(
      VectorSumAgg(ColumnBridge.expression(vec), dim).toAggregateExpression())

  /** Element-wise sum of floor(x·scale + 0.5)-quantized vectors —
    * exact, order-independent, engine-portable (see class doc).
    */
  def vectorSumQuantized(vec: Column, dim: Int, scale: Double): Column =
    ColumnBridge.column(
      VectorSumAgg(ColumnBridge.expression(vec), dim, scale)
        .toAggregateExpression())

  /** Group mean embedding: element-wise sum / count(non-null vectors), as
    * array<double>; null (not NaN) when the group has no vectors at all.
    */
  def meanVector(vec: Column, dim: Int): Column = {
    val s = vectorSum(vec, dim)
    val n = count(vec)
    when(n > 0, transform(s, x => x / n))
      .otherwise(lit(null).cast("array<double>"))
  }
}
