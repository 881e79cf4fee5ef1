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

  private def dims = {
    import graft.TestSpark.spark.implicits._
    Seq((1L, 5, 4), (2L, 12, 3), (3L, 1, 1)).toDF("doc_id", "w", "h")
  }

  test("pack yields the canonical media schema") {
    assert(media.schema.fieldNames.toSeq == Seq("asset_id", "media", "media_type"))
    assert(media.schema("media").dataType.typeName == "binary")
  }

  test("synthesize -> decode round-trips real PNG dimensions and channels") {
    val synth = Multimodal.synthesizeImages(dims, col("doc_id"), col("w"), col("h"))
    val meta = Multimodal.decodeMeta(synth)
      .select("asset_id", "width", "height", "channels", "true_width", "true_height")
      .collect()
    assert(meta.length == 3)
    meta.foreach { r =>
      assert(r.getInt(1) == r.getInt(4), s"width mismatch: $r")
      assert(r.getInt(2) == r.getInt(5), s"height mismatch: $r")
      assert(r.getInt(3) == 3, s"RGB PNG must decode 3 channels: $r")
    }
  }

  test("decoded pixel sums equal the synthetic arithmetic exactly (PNG lossless)") {
    val synth = Multimodal.synthesizeImages(dims, col("doc_id"), col("w"), col("h"))
    val got = Multimodal.imageChannelStats(synth, col("asset_id")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val want = Seq((1L, 5, 4), (2L, 12, 3), (3L, 1, 1)).map { case (a, w, h) =>
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sr += Multimodal.syntheticPixel(a, x, y, 0)
        sg += Multimodal.syntheticPixel(a, x, y, 1)
        sb += Multimodal.syntheticPixel(a, x, y, 2)
      }
      a -> (w.toLong * h, sr, sg, sb)
    }.toMap
    assert(got == want)
  }

  test("golden fixture: an independently ImageIO-encoded PNG decodes to its known dims") {
    // encode OUTSIDE the operator pipeline (driver-side, explicit pixel
    // writes), then decode through the distributed iterator path
    val img = new java.awt.image.BufferedImage(7, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 7) img.setRGB(x, y, (x * 36) << 16 | 200)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    import graft.TestSpark.spark.implicits._
    val df = Seq((42L, baos.toByteArray, "image/png"))
      .toDF("asset_id", "media", "media_type")
    val r = Multimodal.decodeMeta(df)
      .select("width", "height", "channels").head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == (7, 2, 3))
  }

  test("JPEG also decodes (dims exact, content lossy by design)") {
    val bytes = Multimodal.encodeSyntheticImage(5L, 9, 6, format = "jpg")
    import graft.TestSpark.spark.implicits._
    val df = Seq((5L, bytes, "image/jpg")).toDF("asset_id", "media", "media_type")
    val r = Multimodal.decodeMeta(df).select("width", "height").head()
    assert((r.getInt(0), r.getInt(1)) == (9, 6))
  }

  test("undecodable payloads report null dims, never fabricated ones") {
    val meta = Multimodal.decodeMeta(media)
      .select("asset_id", "width", "height", "channels", "n_bytes")
      .collect().map(r => r.getLong(0) -> r).toMap
    // text bytes are not an image: null metadata, byte length preserved
    assert(meta(1L).isNullAt(1) && meta(1L).isNullAt(2) && meta(1L).isNullAt(3))
    assert(meta(1L).getLong(4) == 40L)
    // empty payload
    assert(meta(3L).isNullAt(1) && meta(3L).getLong(4) == 0L)
    // channel stats degrade the same way
    val stats = Multimodal.imageChannelStats(media, col("asset_id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(stats(1L).isNullAt(1) && stats(1L).isNullAt(2))
  }

  test("real resample hits exact target dims and stays decodable; undecodable -> null") {
    val synth = Multimodal.synthesizeImages(dims, col("doc_id"), col("w"), col("h"))
    val resized = Multimodal.resizeImages(synth, targetW = 8, targetH = 6)
      .select(col("asset_id"), col("resized").as("media"))
    val meta = Multimodal.decodeMeta(resized)
      .select("asset_id", "width", "height").collect()
    assert(meta.length == 3)
    meta.foreach(r => assert((r.getInt(1), r.getInt(2)) == (8, 6), r.toString))
    val nullRow = Multimodal.resizeImages(media, 8, 6)
      .filter(col("asset_id") === 1L).select("resized").head()
    assert(nullRow.isNullAt(0))
  }

  test("grid features: decoded cell sums match direct arithmetic; embedding assembles row-major") {
    val synth = Multimodal.synthesizeImages(dims, col("doc_id"), col("w"), col("h"))
    val got = Multimodal.imageGridFeatures(synth, col("asset_id"), 2, 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    val want = scala.collection.mutable.Map
      .empty[(Long, Int, Int), (Long, Long)]
    for ((a, w, h) <- Seq((1L, 5, 4), (2L, 12, 3), (3L, 1, 1));
         y <- 0 until h; x <- 0 until w) {
      val key = (a, x * 2 / w, y * 2 / h)
      val g = Multimodal.syntheticPixel(a, x, y, 0).toLong +
        Multimodal.syntheticPixel(a, x, y, 1) +
        Multimodal.syntheticPixel(a, x, y, 2)
      val (n0, s0) = want.getOrElse(key, (0L, 0L))
      want(key) = (n0 + 1, s0 + g)
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (n, s)) =>
      val (gn, gs, gm) = got(k)
      assert((gn, gs) == (n, s), k.toString)
      assert(gm == s.toDouble / (3.0 * n), k.toString)
    }
    // 1x1 image covers only cell (0,0) — no padding rows
    assert(got.keySet.count(_._1 == 3L) == 1)
    // embedding form: row-major cells, absent cells zero
    val emb = Multimodal.imageGridEmbedding(synth, col("asset_id"), 2, 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(emb(1L).length == 4)
    assert(emb(1L)(1) == got((1L, 1, 0))._3) // idx 1 = (cell_x=1, cell_y=0)
    assert(emb(3L) == Seq(got((3L, 0, 0))._3, 0.0, 0.0, 0.0))
  }

  test("video container: demux + decode every step-th frame with exact pixel sums") {
    import graft.TestSpark.spark.implicits._
    val vids = Seq((1L, 5), (2L, 1)).toDF("doc_id", "nf")
    val media = Multimodal.synthesizeVideo(vids, col("doc_id"), col("nf"),
      w = 3, h = 2)
    val got = Multimodal.sampleVideoFrames(media, col("asset_id"), step = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // asset 1 has frames 0..4 -> sampled 0,2,4; asset 2 -> frame 0
    assert(got.keySet == Set((1L, 0), (1L, 2), (1L, 4), (2L, 0)), got.keySet)
    got.foreach { case ((a, f), (w, h, sr, sg, sb)) =>
      assert((w, h) == (3, 2))
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until 2; x <- 0 until 3) {
        er += Multimodal.syntheticPixel(a * 1009L + f, x, y, 0)
        eg += Multimodal.syntheticPixel(a * 1009L + f, x, y, 1)
        eb += Multimodal.syntheticPixel(a * 1009L + f, x, y, 2)
      }
      assert((sr, sg, sb) == (er, eg, eb), s"asset $a frame $f")
    }
    // a truncated container stops cleanly at the last whole frame
    val cut = media.filter(col("asset_id") === 1L)
      .select(col("asset_id"),
        expr("substring(media, 1, octet_length(media) - 5)").as("media"))
    val partial = Multimodal.sampleVideoFrames(cut, col("asset_id"), step = 1)
      .collect()
    assert(partial.length == 4, partial.length.toString) // frame 5 lost its tail
  }

  test("synthesize -> decode round-trips real WAV clip shape and exact PCM sums") {
    import graft.TestSpark.spark.implicits._
    val lens = Seq((1L, 40), (2L, 137), (3L, 1)).toDF("doc_id", "n")
    val audio = Multimodal.synthesizeAudio(lens, col("doc_id"), col("n"),
      sampleRate = 8000)
    val meta = Multimodal.decodeAudioMeta(audio)
      .select("asset_id", "n_frames", "true_n_samples", "sample_rate",
        "channels", "bits").collect()
    assert(meta.length == 3)
    meta.foreach { r =>
      assert(r.getLong(1) == r.getInt(2).toLong, s"frame count: $r")
      assert((r.getInt(3), r.getInt(4), r.getInt(5)) == (8000, 1, 16), r.toString)
    }
    val got = Multimodal.audioSampleStats(audio, col("asset_id")).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val want = Seq((1L, 40), (2L, 137), (3L, 1)).map { case (a, n) =>
      val ss = (0 until n).map(Multimodal.syntheticSample(a, _).toLong)
      a -> (n.toLong, ss.sum, ss.map(math.abs).sum, ss.min, ss.max)
    }.toMap
    assert(got == want)
  }

  test("AIFF (big-endian PCM) also decodes with identical stats") {
    import graft.TestSpark.spark.implicits._
    val bytes = Multimodal.encodeSyntheticWav(7L, 64, fileType = "aiff")
    val df = Seq((7L, bytes, "audio/aiff")).toDF("asset_id", "media", "media_type")
    val m = Multimodal.decodeAudioMeta(df)
      .select("n_frames", "channels", "bits").head()
    assert((m.getLong(0), m.getInt(1), m.getInt(2)) == (64L, 1, 16))
    val st = Multimodal.audioSampleStats(df, col("asset_id")).head()
    val ss = (0 until 64).map(Multimodal.syntheticSample(7L, _).toLong)
    assert((st.getLong(1), st.getLong(2), st.getLong(4), st.getLong(5)) ==
      (64L, ss.sum, ss.min, ss.max))
  }

  test("decodable-but-unsupported audio (stereo) degrades to null stats, never a task failure") {
    import graft.TestSpark.spark.implicits._
    // hand-build a 4-frame STEREO 16-bit WAV — decodable, outside
    // audioSampleStats' mono contract
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val pcm = new Array[Byte](16)
    val st = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 4L)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(st,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val df = Seq((11L, baos.toByteArray, "audio/wav"))
      .toDF("asset_id", "media", "media_type")
    // metadata still reports the true (stereo) shape
    val m = Multimodal.decodeAudioMeta(df).select("channels", "n_frames").head()
    assert((m.getInt(0), m.getLong(1)) == (2, 4L))
    // stats degrade to the null row instead of require-crashing the job
    val s = Multimodal.audioSampleStats(df, col("asset_id")).head()
    assert(s.isNullAt(1) && s.isNullAt(2), s.toString)
  }

  test("video container: a corrupt near-Int.MaxValue length prefix stops cleanly") {
    import graft.TestSpark.spark.implicits._
    val good = Multimodal.encodeSyntheticImage(5L, 3, 2)
    val baos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(baos)
    out.writeInt(good.length); out.write(good)
    out.writeInt(0x7ffffffb) // Int-overflow bait: pos+4+len wraps negative
    out.write(Array[Byte](1, 2, 3))
    val df = Seq((5L, baos.toByteArray, "video/x-png-frames"))
      .toDF("asset_id", "media", "media_type")
    val rows = Multimodal.sampleVideoFrames(df, col("asset_id"), step = 1)
      .collect()
    assert(rows.length == 1 && rows(0).getInt(1) == 0, rows.toSeq.toString)
  }

  test("non-audio payloads report null audio metadata") {
    val m = Multimodal.decodeAudioMeta(media)
      .select("asset_id", "sample_rate", "n_frames", "n_bytes")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).isNullAt(1) && m(1L).isNullAt(2) && m(1L).getLong(3) == 40L)
    val st = Multimodal.audioSampleStats(media, col("asset_id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(st(1L).isNullAt(1))
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

  test("byte resize crops long and zero-pads short payloads") {
    val r = media.select(col("asset_id"),
      Multimodal.stubResize(col("media"), 8)).collect()
      .map(x => x.getLong(0) -> x.getAs[Array[Byte]](1)).toMap
    assert(r.values.forall(_.length == 8))
    assert(new String(r(1L)) == "hello wo")
    assert(new String(r(2L)).startsWith("x"))
  }

  test("a BMP re-encode shares NO bytes with the PNG but decodes to the " +
      "identical centered grid-sum vector (content dedup across containers)") {
    import graft.TestSpark.spark.implicits._
    val spec = Seq(
      (1L, 7L, 9, 6, 0, 0, "png"),
      (2L, 7L, 9, 6, 0, 0, "bmp"),   // same pixels, different container
      (3L, 7L, 8, 5, 1, 1, "png"),   // crop of the same content
      (4L, 777L, 9, 6, 0, 0, "png")) // unrelated content
      .toDF("img_id", "seed", "w", "h", "dx", "dy", "fmt")
    val media = Multimodal.synthesizeImageVariants(spec, col("img_id"),
      col("seed"), col("w"), col("h"), col("dx"), col("dy"), col("fmt"))
    val payloads = media.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(!java.util.Arrays.equals(payloads(1L), payloads(2L)),
      "the whole point: the encoded bytes differ")
    val vecs = Multimodal.imageGridSumVector(media, col("asset_id"), 3, 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(vecs(1L) == vecs(2L), "lossless containers, same content")
    assert(vecs(1L) != vecs(3L) && vecs(1L) != vecs(4L))
    // scaled mean-centering: every vector sums to zero exactly
    vecs.values.foreach(v => assert(v.sum == 0L, v.toString))
  }

  test("integer-exact cosine pairs: identical vectors are dups with " +
      "dot^2 = na*nb; crops/unrelated/zero vectors are not") {
    import graft.TestSpark.spark.implicits._
    import graft.operators.Similarity
    val vecs = Seq(
      (1L, Seq(3L, -1L, -2L)),
      (2L, Seq(3L, -1L, -2L)),    // exact dup of 1
      (3L, Seq(6L, -2L, -4L)),    // scaled copy: cosine exactly 1 too
      (4L, Seq(-3L, 1L, 2L)),     // antipodal: cosine -1, never a dup
      (5L, Seq(0L, 0L, 0L)))      // degenerate: never a dup
      .toDF("id", "v")
    val all = Similarity.integerCosinePairs(vecs, col("id"), col("v"),
        tNum = 999, tDen = 1000, bits = 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(3)).toMap
    assert(all.size == 10) // all C(5,2) pairs scored
    assert(all((1L, 2L)) && all((1L, 3L)) && all((2L, 3L)))
    assert(!all((1L, 4L)) && !all((1L, 5L)) && !all((4L, 5L)))
    // the SCALE arm (SRP banding) must keep every identical-vector pair
    // (equal vectors -> equal codes in every band) and agree on verdicts
    val lsh = Similarity.integerCosinePairs(vecs, col("id"), col("v"),
        tNum = 999, tDen = 1000, bits = 12, bands = 4)
      .where(col("is_dup")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((1L, 2L), (1L, 3L), (2L, 3L)).subsetOf(lsh), lsh.toString)
  }

  test("near-dup-by-sound: an AIFF re-encode of a WAV is found by the " +
      "contour + integer-cosine composition; truncation/unrelated are not") {
    import graft.TestSpark.spark.implicits._
    import graft.operators.Similarity
    val spec = Seq(
      (1L, 9L, 100, "wav"),
      (2L, 9L, 100, "aiff"),  // same chirp, big-endian container
      (3L, 9L, 80, "wav"),    // truncated to 4/5
      (4L, 7786L, 100, "wav")) // unrelated seed
      .toDF("clip_id", "seed", "n", "ft")
    val media = Multimodal.synthesizeAudioVariants(spec, col("clip_id"),
      col("seed"), col("n"), col("ft"))
    val payloads = media.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(!java.util.Arrays.equals(payloads(1L), payloads(2L)),
      "byte dedup must not see the pair")
    val vecs = Multimodal.audioGridSumVector(media, col("asset_id"), 12)
    val verdicts = Similarity.integerCosinePairs(vecs, col("asset_id"),
        col("features"), tNum = 99, tDen = 100, bits = 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(3)).toMap
    assert(verdicts((1L, 2L)), "re-encode is a content dup")
    assert(!verdicts((1L, 3L)) && !verdicts((1L, 4L)) && !verdicts((3L, 4L)),
      verdicts.toString)
    // windowed energy contour: identical for the re-encode pair, and
    // window sums are exact (lossless PCM round trip)
    val wf = Multimodal.audioWindowFeatures(media, col("asset_id"), 16)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1).toSeq).toMap
    assert(wf(1L) == wf(2L))
    assert(wf(1L).map(_._2).sum == 100L) // all frames covered
    val expectedW0 = (0 until 16).map(k => Multimodal.syntheticChirp(9L, k).toLong).sum
    assert(wf(1L).head._3 == expectedW0)
  }

  test("near-dup-by-video-content: a BMP-framed re-encode of a PNG-framed " +
      "container matches; an unrelated clip does not") {
    import graft.TestSpark.spark.implicits._
    import graft.operators.Similarity
    val spec = Seq(
      (1L, 5L, 6, "png"),
      (2L, 5L, 6, "bmp"),     // same sloped-pixel frames, other codec
      (3L, 7782L, 6, "png"))  // unrelated seed
      .toDF("vid_id", "seed", "nf", "fmt")
    val media = Multimodal.synthesizeVideoVariants(spec, col("vid_id"),
      col("seed"), col("nf"), col("fmt"), w = 6, h = 4)
    val payloads = media.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(!java.util.Arrays.equals(payloads(1L), payloads(2L)),
      "frame codecs differ, so the containers share no bytes")
    val vecs = Multimodal.videoGridSumVector(media, col("asset_id"),
      gridW = 3, gridH = 3, step = 2)
    val byId = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(byId(1L) == byId(2L) && byId(1L) != byId(3L))
    assert(byId.values.forall(_.sum == 0L)) // scaled mean-centering
    val verdicts = Similarity.integerCosinePairs(vecs, col("asset_id"),
        col("features"), tNum = 9995, tDen = 10000, bits = 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(3)).toMap
    assert(verdicts((1L, 2L)) && !verdicts((1L, 3L)) && !verdicts((2L, 3L)),
      verdicts.toString)
  }
}
