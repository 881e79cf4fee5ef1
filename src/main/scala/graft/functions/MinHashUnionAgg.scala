package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** MinHash signature UNION as a typed imperative aggregate (the sketch
  * pattern): the signature of a set union is the element-wise minimum of
  * the member signatures, so grouping documents (by cluster, source,
  * shard…) and unioning their signatures yields the group's MinHash in
  * ONE aggregation with map-side partial merge — the estimated Jaccard
  * between groups then costs |groups|², not |docs|².
  */
case class MinHashUnionAgg(child: Expression, numHashes: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numHashes > 0, "numHashes must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> signatures, got ${other.simpleString}")
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_union"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(numHashes, arr.numElements())
      var i = 0
      while (i < n) {
        // a null slot would read as 0L and poison the element-wise min
        // (inflating estimated Jaccard between unrelated groups)
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"minhash_union: null signature element at index $i")
        val h = arr.getLong(i)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashUnionAgg =
    copy(child = newChildren.head)
}

/** [[MinHashUnionAgg]] over the PORTABLE md5-hex signatures
  * (array<string>): element-wise minimum under byte-wise UTF8String
  * comparison — identical to lexicographic MIN over the hex strings in
  * any engine (hex digits are ASCII, so byte order == collation order).
  * Exists so the portable group-sketch query can aggregate WITHOUT
  * exploding the per-doc signatures: a posexplode over a kernel-derived
  * array makes InferFiltersFromGenerate add `isnotnull(sig)`, and
  * predicate pushdown substitutes the md5 KERNEL into the Filter below
  * the parallelizing exchange — 2-3 kernel evals per row in one
  * pre-repartition task (measured 8x the query's true cost). An
  * aggregate child stays where it is planned.
  *
  * Empty signatures (shingle-less docs) contribute nothing; a group
  * with only empty members evaluates to an empty signature, mirroring
  * the per-doc kernel's convention.
  */
case class MinHashUnionMd5Agg(child: Expression, numHashes: Int,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[org.apache.spark.unsafe.types.UTF8String]] {
  import org.apache.spark.unsafe.types.UTF8String

  require(numHashes > 0, "numHashes must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> signatures, got ${other.simpleString}")
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "minhash_union_md5"

  override def createAggregationBuffer(): Array[UTF8String] =
    new Array[UTF8String](numHashes) // null slot = "no member yet"

  override def update(buf: Array[UTF8String], input: InternalRow): Array[UTF8String] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(numHashes, arr.numElements())
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"minhash_union_md5: null signature element at index $i")
        val h = arr.getUTF8String(i)
        // clone: the reader may reuse the backing buffer across rows
        if (buf(i) == null || h.compareTo(buf(i)) < 0) buf(i) = h.clone()
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[UTF8String], b: Array[UTF8String]): Array[UTF8String] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) != null && (a(i) == null || b(i).compareTo(a(i)) < 0)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[UTF8String]): Any =
    if (buf.forall(_ == null)) new GenericArrayData(Array.empty[AnyRef])
    else {
      // a PARTIALLY null buffer cannot happen (every member fills a
      // prefix of min(len, numHashes); producers emit full-length or
      // empty) — fail loudly rather than emit a null-holed signature
      require(buf.forall(_ != null),
        "minhash_union_md5: mixed-length signatures in one group")
      new GenericArrayData(buf.asInstanceOf[Array[AnyRef]])
    }

  override def serialize(buf: Array[UTF8String]): Array[Byte] = {
    val bytes = buf.map(s => if (s == null) null else s.getBytes)
    val total = 4 * numHashes + bytes.map(b => if (b == null) 0 else b.length).sum
    val bb = ByteBuffer.allocate(total)
    bytes.foreach { b =>
      if (b == null) bb.putInt(-1) else { bb.putInt(b.length); bb.put(b) }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[UTF8String] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes) {
      val len = bb.getInt
      if (len < 0) null
      else {
        val b = new Array[Byte](len)
        bb.get(b)
        UTF8String.fromBytes(b)
      }
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashUnionMd5Agg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashUnionMd5Agg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashUnionMd5Agg =
    copy(child = newChildren.head)
}

object MinHashUnionAgg {
  /** Aggregate Column: element-wise min over array<bigint> signatures. */
  def minhashUnion(sig: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashUnionAgg(ColumnBridge.expression(sig), numHashes)
        .toAggregateExpression())

  /** Aggregate Column: element-wise lexicographic min over array<string>
    * md5-hex signatures (the portable twin of [[minhashUnion]]).
    */
  def minhashUnionMd5(sig: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashUnionMd5Agg(ColumnBridge.expression(sig), numHashes)
        .toAggregateExpression())
}
