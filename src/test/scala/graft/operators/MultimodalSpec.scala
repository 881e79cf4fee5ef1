package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  private def media = {
    import graft.TestSpark.spark.implicits._
    val docs = Seq((1L, "hello world this is a fake image payload"),
      (2L, "x"), (3L, "")).toDF("doc_id", "text")
    Multimodal.packTextAsMedia(docs, col("doc_id"), col("text"))
  }

  test("pack yields the canonical media schema") {
    assert(media.schema.fieldNames.toSeq == Seq("asset_id", "media", "media_type"))
    assert(media.schema("media").dataType.typeName == "binary")
  }

  test("column-expression decode equals the JVM stub codec") {
    val viaCols = media.select((col("asset_id") +:
      Multimodal.stubDecodeMetaCols(col("media"))): _*).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))))
      .toMap
    val direct = media.select(col("asset_id"), col("media")).collect()
      .map(r => r.getLong(0) -> Multimodal.stubDecodeMeta(r.getAs[Array[Byte]](1)))
      .toMap
    assert(viaCols == direct)
  }

  test("iterator decode (mapInPandas analogue) matches the column path") {
    val it = Multimodal.decodeMeta(media)
      .select(col("asset_id"), col("width"), col("height"), col("channels"), col("n_bytes"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))))
      .toMap
    val cols = media.select((col("asset_id") +:
      Multimodal.stubDecodeMetaCols(col("media"))): _*).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))))
      .toMap
    assert(it == cols)
  }

  test("sampleFrames emits every step-th fixed-size slice") {
    import graft.TestSpark.spark.implicits._
    val payload = (0 until 64).map(i => ('a' + i % 26).toChar).mkString
    val df = Multimodal.packTextAsMedia(
      Seq((9L, payload)).toDF("id", "t"), col("id"), col("t"))
    val frames = Multimodal.sampleFrames(df, col("asset_id"), col("media"),
      frameSize = 16, step = 2).collect()
      .map(r => (r.getAs[Int]("frame_idx"), new String(r.getAs[Array[Byte]]("frame"))))
    assert(frames.map(_._1).toSeq.sorted == Seq(0, 2))
    assert(frames.toMap.apply(0) == payload.substring(0, 16))
    assert(frames.toMap.apply(2) == payload.substring(32, 48))
  }

  test("stub feature vector is deterministic with fixed dim") {
    val f = media.select(col("asset_id"),
      Multimodal.stubFeatureVector(col("media"), 8)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(f.values.forall(_.length == 8))
    assert(f(3L).forall(_ == 0.0)) // empty payload -> zero vector
    assert(f(1L).forall(v => v >= -0.5 && v <= 0.5))
    // 'h' = 104 -> 104/255 - 0.5
    assert(math.abs(f(1L).head - (104.0 / 255.0 - 0.5)) < 1e-12)
  }

  test("stub resize crops long and zero-pads short payloads") {
    val r = media.select(col("asset_id"),
      Multimodal.stubResize(col("media"), 8)).collect()
      .map(x => x.getLong(0) -> x.getAs[Array[Byte]](1)).toMap
    assert(r.values.forall(_.length == 8))
    assert(new String(r(1L)) == "hello wo")
    assert(new String(r(2L)).startsWith("x"))
  }
}
