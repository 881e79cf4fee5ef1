package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata
  * alongside — the schema/partitioning/batching is real and tested; only
  * the codec itself is a STUB (this container has no image/audio
  * libraries), clearly marked below and swappable for a real decoder.
  *
  * The decode path deliberately mirrors the batched-UDF shape (a
  * partition-at-a-time iterator transform, like `mapInPandas`): decoding
  * is per-partition with no shuffle, so it scales linearly with input
  * splits on a real cluster.
  */
object Multimodal {

  /** Canonical media-table schema: id + opaque payload + content type. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true)))

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = true)))

  /** Build a media table from any table with an id + text column — the
    * UTF-8 bytes stand in for an encoded image payload in tests.
    */
  def packTextAsMedia(df: DataFrame, id: Column, payload: Column,
                      mediaType: String = "image/fake"): DataFrame =
    df.select(id.cast("long").as("asset_id"),
      payload.cast("binary").as("media"),
      lit(mediaType).as("media_type"))

  /** STUB DECODER — deterministic fake. A real deployment replaces this
    * one function (bytes → metadata) with an actual codec call; nothing
    * else in the pipeline changes. Kept total: any byte array decodes.
    */
  def stubDecodeMeta(bytes: Array[Byte]): (Int, Int, Int, Long) = {
    if (bytes == null || bytes.isEmpty) (0, 0, 0, 0L)
    else {
      val w = 1 + ((bytes(0) & 0xff) * 7 + bytes.length) % 512
      val h = 1 + ((bytes(bytes.length - 1) & 0xff) * 13 + bytes.length / 2) % 512
      val c = 1 + (bytes.length % 3)
      (w, h, c, bytes.length.toLong)
    }
  }

  /** Column-expression twin of [[stubDecodeMeta]] for engines that want
    * the metadata inline without the batched-iterator path (and for
    * cross-engine verification of the plumbing).
    */
  def stubDecodeMetaCols(media: Column): Seq[Column] = {
    val len = octet_length(media)
    val first = when(len > 0, conv(hex(substring(media, 1, 1)), 16, 10).cast("int")).otherwise(0)
    val last = when(len > 0, conv(hex(substring(media, -1, 1)), 16, 10).cast("int")).otherwise(0)
    Seq(
      when(len > 0, (first * 7 + len) % 512 + 1).otherwise(0).as("width"),
      when(len > 0, (last * 13 + (len / 2).cast("int")) % 512 + 1).otherwise(0).as("height"),
      when(len > 0, len % 3 + 1).otherwise(0).as("channels"),
      len.cast("long").as("n_bytes"))
  }

  /** Batched decode over partitions (the `mapInPandas` analogue): the
    * iterator is consumed lazily, one row in flight per partition, no
    * driver involvement. Appends the [[metaSchema]] fields.
    */
  def decodeMeta(df: DataFrame, mediaCol: String = "media"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ metaSchema.fields)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(mediaIdx) match {
          case b: Array[Byte] => b
          case _              => null
        }
        val (w, h, c, n) = stubDecodeMeta(bytes)
        // Seq[Any], not Seq(...): weak numeric lub would widen the Ints to
        // Long and break the INT fields of the row encoder.
        Row.fromSeq(r.toSeq ++ Seq[Any](w, h, c, n))
      }
    }(enc)
  }

  /** STUB FEATURE EXTRACTOR — deterministic fake embedding derived from
    * payload bytes (cyclic byte read, centered to [-0.5, 0.5]). A real
    * deployment swaps this expression for a model-inference call (e.g. a
    * batched ONNX scorer in [[decodeMeta]]'s iterator form); the schema
    * (array<double> of fixed dim) and everything downstream (ANN, dedup)
    * stay identical.
    */
  def stubFeatureVector(media: Column, dim: Int): Column = {
    val len = octet_length(media)
    val byteAt = (i: Column) =>
      conv(hex(substring(media, (pmod(i, len) + 1).cast("int"), lit(1))), 16, 10)
        .cast("double")
    when(len > 0,
      transform(sequence(lit(0), lit(dim - 1)),
        i => byteAt(i) / lit(255.0) - lit(0.5)))
      .otherwise(array_repeat(lit(0.0), dim)).as("features")
  }

  /** STUB RESIZE — byte-level crop/pad to an exact target size (truncate
    * long payloads, zero-pad short ones). Stands in for a real image
    * resample; keeps output size statically known for downstream batch
    * shapes.
    */
  def stubResize(media: Column, targetBytes: Int): Column = {
    val zeros = lit(Array.fill[Byte](targetBytes)(0))
    substring(concat(media, zeros), 1, targetBytes).as("resized")
  }

  /** Fixed-step frame sampling from a video-like payload: every `step`-th
    * `frameSize`-byte slice, as (asset_id, frame_idx, frame). Pure
    * column expressions — scales with no shuffle.
    */
  def sampleFrames(df: DataFrame, id: Column, media: Column,
                   frameSize: Int, step: Int): DataFrame = {
    val nFrames = (octet_length(media) / frameSize).cast("int")
    val idxs = when(nFrames > 0,
      sequence(lit(0), nFrames - 1, lit(step))).otherwise(array().cast("array<int>"))
    df.select(id.as("asset_id"), media.as("m"), explode(idxs).as("frame_idx"))
      .select(col("asset_id"), col("frame_idx"),
        expr(s"substring(m, frame_idx * $frameSize + 1, $frameSize)").as("frame"))
  }
}
