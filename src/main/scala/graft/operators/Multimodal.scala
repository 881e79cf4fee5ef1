package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata
  * alongside. The IMAGE codec is REAL: `javax.imageio` (shipped in
  * every JDK) encodes and decodes PNG/JPEG/GIF/BMP, so [[decodeMeta]],
  * [[imageChannelStats]] and [[resizeImages]] operate on actual encoded
  * bytes — pointing `media_meta` at a directory of real PNGs returns
  * their true dimensions. Only the EMBEDDING extractor remains a
  * clearly-marked stub ([[stubFeatureVector]] — model inference needs
  * an ML runtime this container does not have); its schema and
  * everything downstream (ANN, dedup) are the real shapes.
  *
  * Every decode-path operator is a partition-at-a-time iterator
  * transform (the `mapInPandas` analogue): decoding is per-partition
  * with no shuffle and no driver involvement, so it scales linearly
  * with input splits on a real cluster. PNG is lossless 8-bit sRGB, so
  * an encode→decode round trip reproduces pixel values EXACTLY — which
  * is what lets the `media_pixel_stats` query hash-match a DuckDB twin
  * that recomputes the synthetic pixel sums arithmetically: the oracle
  * proves the whole codec round trip, not just the plumbing.
  */
object Multimodal {

  // ImageIO defaults to spooling through temp FILES per call; in-memory
  // streams are strictly better for small per-row payloads. Headless is
  // forced so Graphics2D resampling never looks for a display.
  private lazy val imageIoInit: Unit = {
    System.setProperty("java.awt.headless", "true")
    ImageIO.setUseCache(false)
  }

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
    * UTF-8 bytes stand in for an OPAQUE payload (frame slicing, byte
    * resizing and the stub embedding are content-agnostic); they are
    * NOT decodable images, and [[decodeMeta]] reports null dimensions
    * for them (spec-pinned).
    */
  def packTextAsMedia(df: DataFrame, id: Column, payload: Column,
                      mediaType: String = "application/octet-stream"): DataFrame =
    df.select(id.cast("long").as("asset_id"),
      payload.cast("binary").as("media"),
      lit(mediaType).as("media_type"))

  /** The deterministic synthetic pixel: channel 0/1/2 = R/G/B. Shared
    * by the executor-side encoder and the specs; the DuckDB oracle twin
    * renders the same arithmetic (`(asset_id*31 + x*7 + y*13 +
    * channel*101) % 256`), which is what makes the round-trip pixel
    * sums oracle-checkable.
    */
  def syntheticPixel(assetId: Long, x: Int, y: Int, channel: Int): Int =
    ((assetId * 31L + x * 7L + y * 13L + channel * 101L) % 256L).toInt

  /** A CONTENT-RICH synthetic pixel whose gradient SLOPES depend on the
    * seed (`(a·31 + x·(a%7+3) + y·(a%11+5) + c·101) mod 256`) — the
    * image twin of [[syntheticChirp]] and needed for the same reason:
    * [[syntheticPixel]]'s slopes are constant, so two videos' frames
    * differ only by a constant offset and their centered grid sums
    * differ only through mod-wrap positions — too degenerate to plant
    * distinguishable near-dup fixtures on FIXED-dims frames (measured:
    * negative pairs reach cosine 1.0 exactly). Seed-dependent slopes
    * give distinct spatial shapes per frame id.
    */
  def syntheticSlopedPixel(assetId: Long, x: Int, y: Int, channel: Int): Int =
    ((assetId * 31L + x * (assetId % 7L + 3L) + y * (assetId % 11L + 5L) +
      channel * 101L) % 256L).toInt

  /** Encode one deterministic `w`×`h` image to real PNG (or JPEG/BMP…)
    * bytes via ImageIO — runs on EXECUTORS inside [[synthesizeImages]];
    * public for the specs' golden fixtures.
    */
  def encodeSyntheticImage(assetId: Long, w: Int, h: Int,
                           format: String = "png",
                           dx: Int = 0, dy: Int = 0,
                           sloped: Boolean = false): Array[Byte] = {
    imageIoInit
    require(w >= 1 && h >= 1, s"degenerate image dims ${w}x$h")
    val pixel: (Long, Int, Int, Int) => Int =
      if (sloped) syntheticSlopedPixel else syntheticPixel
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = pixel(assetId, x + dx, y + dy, 0)
        val g = pixel(assetId, x + dx, y + dy, 1)
        val b = pixel(assetId, x + dx, y + dy, 2)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    val ok = ImageIO.write(img, format, baos)
    require(ok, s"no ImageIO writer for format '$format'")
    baos.toByteArray
  }

  /** Synthesize a CORPUS WITH PLANTED VARIANTS: each row describes one
    * image as (asset id, pixel seed, dims, crop offset, container
    * format) — all per-row columns, so one call renders originals,
    * re-encodes (same seed, different lossless container: a PNG and a
    * BMP of the same pixels share no bytes but identical content),
    * crops (offset + smaller dims) and unrelated images (different
    * seed). The content-dedup fixture generator: byte-level dedup finds
    * none of the planted duplicates, content features find exactly the
    * re-encodes. Runs per-partition on executors like
    * [[synthesizeImages]]. Output: (asset_id, media, media_type).
    */
  def synthesizeImageVariants(df: DataFrame, id: Column, seed: Column,
                              width: Column, height: Column,
                              dx: Column, dy: Column,
                              format: Column): DataFrame = {
    val in = df.select(id.cast("long").as("asset_id"),
      seed.cast("long").as("seed"),
      width.cast("int").as("w"), height.cast("int").as("h"),
      dx.cast("int").as("dx"), dy.cast("int").as("dy"),
      format.cast("string").as("fmt"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val fmt = r.getString(6)
        Row(r.getLong(0),
          encodeSyntheticImage(r.getLong(1), r.getInt(2), r.getInt(3),
            fmt, r.getInt(4), r.getInt(5)),
          s"image/$fmt")
      }
    }(enc)
  }

  /** Synthesize one real encoded image per row — the fixture generator
    * for codec-path queries (no image assets exist in the container, so
    * the corpus is generated ON EXECUTORS, deterministically from the
    * id + requested dims; ImageIO both encodes here and decodes in
    * [[decodeMeta]], so the pair exercises the real codec round trip).
    * Output: (asset_id, media, media_type, true_width, true_height) —
    * the true dims ride along so decode gates can assert identity
    * without a join.
    */
  def synthesizeImages(df: DataFrame, id: Column, width: Column,
                       height: Column, format: String = "png"): DataFrame = {
    val in = df.select(id.cast("long").as("asset_id"),
      width.cast("int").as("true_width"), height.cast("int").as("true_height"))
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media", BinaryType, nullable = true),
      StructField("media_type", StringType, nullable = true),
      StructField("true_width", IntegerType, nullable = false),
      StructField("true_height", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val mime = s"image/$format"
    in.mapPartitions { rows =>
      rows.map { r =>
        val a = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
        Row(a, encodeSyntheticImage(a, w, h, format), mime, w, h)
      }
    }(enc)
  }

  /** Real decode of one payload: Some(image) for any format ImageIO
    * recognizes (PNG/JPEG/GIF/BMP out of the box), None for
    * null/empty/undecodable bytes — total by catching the codec's
    * failure modes, never by faking dimensions.
    */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] = {
    imageIoInit
    if (bytes == null || bytes.isEmpty) None
    else
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }
  }

  /** Batched REAL metadata decode over partitions (the `mapInPandas`
    * analogue): the iterator is consumed lazily, one row in flight per
    * partition, no driver involvement. Appends the [[metaSchema]]
    * fields — true decoded width/height and the color-model component
    * count for decodable payloads, nulls (with the byte length) for
    * undecodable ones.
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
        val n = if (bytes == null) 0L else bytes.length.toLong
        // Seq[Any], not Seq(...): weak numeric lub would widen the Ints
        // to Long and break the INT fields of the row encoder.
        val meta = decodeImage(bytes) match {
          case Some(img) => Seq[Any](img.getWidth, img.getHeight,
            img.getColorModel.getNumComponents, n)
          case None => Seq[Any](null, null, null, n)
        }
        Row.fromSeq(r.toSeq ++ meta)
      }
    }(enc)
  }

  /** Per-channel pixel-value sums over a decoded raster — the one
    * accumulation loop [[imageChannelStats]] and [[sampleVideoFrames]]
    * share, so a future color-model fix cannot silently diverge
    * between the image and video stats.
    */
  private def channelSums(img: BufferedImage): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff
        sg += (rgb >> 8) & 0xff
        sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    (sr, sg, sb)
  }

  /** REAL per-image feature extraction with exact-integer outputs:
    * per-channel pixel-value sums + pixel count, from the decoded
    * raster. On PNG (lossless) the sums reproduce the encoded values
    * exactly, so over [[synthesizeImages]] fixtures the whole
    * encode→decode→aggregate pipeline is DuckDB-oracle-checkable
    * (`media_pixel_stats`). Undecodable payloads yield null sums.
    * Output: (asset_id, n_pixels, sum_r, sum_g, sum_b).
    */
  def imageChannelStats(df: DataFrame, id: Column,
                        mediaCol: String = "media"): DataFrame = {
    val in = df.select(id.cast("long").as("asset_id"), col(mediaCol).as("m"))
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("n_pixels", LongType, nullable = true),
      StructField("sum_r", LongType, nullable = true),
      StructField("sum_g", LongType, nullable = true),
      StructField("sum_b", LongType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val a = r.getLong(0)
        decodeImage(r.get(1) match {
          case b: Array[Byte] => b
          case _              => null
        }) match {
          case Some(img) =>
            val (sr, sg, sb) = channelSums(img)
            Row(a, img.getWidth.toLong * img.getHeight, sr, sg, sb)
          case None => Row(a, null, null, null, null)
        }
      }
    }(enc)
  }

  /** REAL image resample to exact target dimensions (bilinear
    * Graphics2D scaling, headless), re-encoded in `format` — the
    * thumbnail/normalize step of an image-corpus pipeline. Appends a
    * `resized` binary column (null for undecodable payloads); decode
    * gates downstream can assert the decoded dims equal the target.
    * Same zero-shuffle partition-iterator shape as [[decodeMeta]].
    */
  def resizeImages(df: DataFrame, targetW: Int, targetH: Int,
                   mediaCol: String = "media",
                   format: String = "png"): DataFrame = {
    require(targetW >= 1 && targetH >= 1,
      s"degenerate target dims ${targetW}x$targetH")
    val outSchema = StructType(df.schema.fields :+
      StructField("resized", BinaryType, nullable = true))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val resized = decodeImage(r.get(mediaIdx) match {
          case b: Array[Byte] => b
          case _              => null
        }).map { img =>
          val out = new BufferedImage(targetW, targetH,
            BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, targetW, targetH, null)
          } finally g.dispose()
          val baos = new ByteArrayOutputStream()
          ImageIO.write(out, format, baos)
          baos.toByteArray
        }.orNull
        Row.fromSeq(r.toSeq :+ resized)
      }
    }(enc)
  }

  /** REAL visual feature extraction from DECODED pixels: a `gridW`×
    * `gridH` grid of grayscale means — one row per cell with the exact
    * integer sum (r+g+b over the cell's pixels), the pixel count, and
    * the mean as ONE IEEE division, so the whole feature is
    * DuckDB-oracle-checkable over [[synthesizeImages]] fixtures. This
    * is the classic pre-ML image descriptor (a downsampled intensity
    * map); [[stubFeatureVector]] remains only for the MODEL-embedding
    * shape (inference needs an ML runtime). Cell of pixel (x, y) is
    * (x·gridW div width, y·gridH div height). Images smaller than the
    * grid leave the uncovered cells absent (no padding rows).
    * Output: (asset_id, cell_x, cell_y, n_px, sum_gray, mean_gray);
    * undecodable payloads contribute no rows.
    */
  def imageGridFeatures(df: DataFrame, id: Column, gridW: Int, gridH: Int,
                        mediaCol: String = "media"): DataFrame = {
    require(gridW >= 1 && gridH >= 1, s"degenerate grid ${gridW}x$gridH")
    val in = df.select(id.cast("long").as("asset_id"), col(mediaCol).as("m"))
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("cell_x", IntegerType, nullable = false),
      StructField("cell_y", IntegerType, nullable = false),
      StructField("n_px", LongType, nullable = false),
      StructField("sum_gray", LongType, nullable = false),
      StructField("mean_gray", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val a = r.getLong(0)
        decodeImage(r.get(1) match {
          case b: Array[Byte] => b
          case _              => null
        }) match {
          case Some(img) =>
            val w = img.getWidth; val h = img.getHeight
            val sums = Array.ofDim[Long](gridW, gridH)
            val counts = Array.ofDim[Long](gridW, gridH)
            var y = 0
            while (y < h) {
              val cy = y * gridH / h
              var x = 0
              while (x < w) {
                val cx = x * gridW / w
                val rgb = img.getRGB(x, y)
                sums(cx)(cy) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                  (rgb & 0xff)
                counts(cx)(cy) += 1
                x += 1
              }
              y += 1
            }
            for {
              cx <- 0 until gridW
              cy <- 0 until gridH
              if counts(cx)(cy) > 0
            } yield Row(a, cx, cy, counts(cx)(cy), sums(cx)(cy),
              sums(cx)(cy).toDouble / (3.0 * counts(cx)(cy)))
          case None => Nil
        }
      }
    }(enc)
  }

  /** The grid features assembled into a fixed-dim `array<double>`
    * embedding (row-major cells, absent cells 0.0) — the form the ANN
    * operators consume; values are the same single-division means the
    * oracle checks on [[imageGridFeatures]].
    */
  def imageGridEmbedding(df: DataFrame, id: Column, gridW: Int, gridH: Int,
                         mediaCol: String = "media"): DataFrame = {
    val cells = imageGridFeatures(df, id, gridW, gridH, mediaCol)
    val dim = gridW * gridH
    cells
      .groupBy(col("asset_id"))
      .agg(map_from_arrays(
        collect_list(col("cell_y") * gridW + col("cell_x")),
        collect_list(col("mean_gray"))).as("__cells"))
      .select(col("asset_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("__cells"), i), lit(0.0)))
          .as("features"))
  }

  /** The grid features as an INTEGER-EXACT content signature: the
    * per-cell gray SUMS (absent cells 0, row-major like
    * [[imageGridEmbedding]]) mean-centered in scaled-integer form —
    * `c_i = d·s_i − Σs` (d = gridW·gridH), which is the per-image mean
    * subtraction multiplied through by d so every value stays a LONG.
    * Centering is what makes cosine over these vectors discriminate:
    * raw gray means of natural (and synthetic) images concentrate
    * around mid-gray, so uncentered cosines are ≈1 for EVERYTHING,
    * while centered cosine is the cells' correlation. Because the
    * values are exact integers end to end (PNG/BMP are lossless), a
    * cosine THRESHOLD decision over them can be taken in pure integer
    * arithmetic ([[Similarity.integerCosinePairs]]) — bit-identical on
    * any engine, which is what lets an image-content dedup be
    * hash-checked against a SQL oracle. Output: (asset_id, features
    * array<long> of length d).
    */
  def imageGridSumVector(df: DataFrame, id: Column, gridW: Int, gridH: Int,
                         mediaCol: String = "media"): DataFrame = {
    val cells = imageGridFeatures(df, id, gridW, gridH, mediaCol)
    val dim = gridW * gridH
    cells
      .groupBy(col("asset_id"))
      .agg(map_from_arrays(
        collect_list(col("cell_y") * gridW + col("cell_x")),
        collect_list(col("sum_gray"))).as("__cells"))
      .select(col("asset_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("__cells"), i), lit(0L)))
          .as("__sums"))
      .select(col("asset_id"),
        transform(col("__sums"),
          s => s * lit(dim.toLong) -
            aggregate(col("__sums"), lit(0L), (a, x) => a + x))
          .as("features"))
  }

  // --- video (length-prefixed PNG frame container, real frame decode) --

  /** Synthesize one "video" per row: `nFrames` real PNG frames (each a
    * `w`×`h` image whose pixels also depend on the frame index —
    * `syntheticPixel(assetId * 1009 + frame, x, y, c)`) packed into a
    * length-prefixed container (4-byte big-endian frame size + PNG
    * bytes, repeated). PNG frames are variable-size, so the container
    * needs real framing — which is exactly what makes the decode path
    * below a real demuxer shape rather than fixed-stride byte slicing
    * ([[sampleFrames]] keeps covering the fixed-stride case). Output:
    * (asset_id, media, media_type, true_n_frames).
    */
  def synthesizeVideo(df: DataFrame, id: Column, nFrames: Column,
                      w: Int, h: Int): DataFrame = {
    require(w >= 1 && h >= 1, s"degenerate frame dims ${w}x$h")
    val in = df.select(id.cast("long").as("asset_id"),
      nFrames.cast("int").as("true_n_frames"))
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media", BinaryType, nullable = true),
      StructField("media_type", StringType, nullable = true),
      StructField("true_n_frames", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val a = r.getLong(0); val n = r.getInt(1)
        val baos = new ByteArrayOutputStream()
        val out = new java.io.DataOutputStream(baos)
        var f = 0
        while (f < n) {
          val png = encodeSyntheticImage(a * 1009L + f, w, h)
          out.writeInt(png.length)
          out.write(png)
          f += 1
        }
        Row(a, baos.toByteArray, "video/x-png-frames", n)
      }
    }(enc)
  }

  /** REAL frame sampling + decode from the length-prefixed container:
    * walk the framing, DECODE every `step`-th frame through ImageIO,
    * and emit its true dimensions plus exact per-channel pixel sums —
    * one row per sampled frame. Skipped frames cost a seek (length
    * read + skip), never a decode — the demuxer property that makes
    * sparse sampling of a long video cheap. Corrupt/short containers
    * stop at the last whole frame (partial trailing bytes ignored).
    * Output: (asset_id, frame_idx, width, height, sum_r, sum_g, sum_b).
    */
  def sampleVideoFrames(df: DataFrame, id: Column, step: Int,
                        mediaCol: String = "media"): DataFrame = {
    require(step >= 1, s"step must be >= 1: $step")
    val in = df.select(id.cast("long").as("asset_id"), col(mediaCol).as("m"))
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sum_r", LongType, nullable = true),
      StructField("sum_g", LongType, nullable = true),
      StructField("sum_b", LongType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val a = r.getLong(0)
        val bytes = r.get(1) match {
          case b: Array[Byte] => b
          case _              => null
        }
        if (bytes == null) Iterator.empty
        else {
          val outRows = Seq.newBuilder[Row]
          var pos = 0
          var idx = 0
          while (pos + 4 <= bytes.length) {
            val len = ((bytes(pos) & 0xff) << 24) | ((bytes(pos + 1) & 0xff) << 16) |
              ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
            // bound check in LONG arithmetic: a corrupt prefix near
            // Int.MaxValue would wrap `pos + 4 + len` negative and slip
            // past an Int comparison straight into copyOfRange
            if (len < 0 || pos.toLong + 4L + len > bytes.length) pos = bytes.length
            else {
              if (idx % step == 0) {
                val frame = java.util.Arrays.copyOfRange(bytes, pos + 4,
                  pos + 4 + len)
                decodeImage(frame) match {
                  case Some(img) =>
                    val (sr, sg, sb) = channelSums(img)
                    outRows += Row(a, idx, img.getWidth, img.getHeight, sr, sg, sb)
                  case None => outRows += Row(a, idx, null, null, null, null, null)
                }
              }
              pos += 4 + len
              idx += 1
            }
          }
          outRows.result().iterator
        }
      }
    }(enc)
  }

  /** Video twin of [[synthesizeImageVariants]]: per-row (asset id,
    * pixel seed, frame count, FRAME FORMAT) renders a length-prefixed
    * container of real encoded frames — frame `f`'s pixels are
    * [[syntheticSlopedPixel]] under seed `seed·1009 + f` (see its
    * scaladoc for why the constant-slope pixel cannot plant
    * distinguishable fixtures), so a PNG-framed and a BMP-framed
    * container of the same seed share no bytes but identical decoded
    * content. Output: (asset_id, media, media_type).
    */
  def synthesizeVideoVariants(df: DataFrame, id: Column, seed: Column,
                              nFrames: Column, frameFormat: Column,
                              w: Int, h: Int): DataFrame = {
    val in = df.select(id.cast("long").as("asset_id"),
      seed.cast("long").as("seed"), nFrames.cast("int").as("nf"),
      frameFormat.cast("string").as("fmt"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val sd = r.getLong(1); val nf = r.getInt(2); val fmt = r.getString(3)
        val baos = new ByteArrayOutputStream()
        val out = new java.io.DataOutputStream(baos)
        var f = 0
        while (f < nf) {
          val frame = encodeSyntheticImage(sd * 1009L + f, w, h, fmt,
            sloped = true)
          out.writeInt(frame.length)
          out.write(frame)
          f += 1
        }
        Row(r.getLong(0), baos.toByteArray, s"video/x-$fmt-frames")
      }
    }(enc)
  }

  /** The video CONTENT SIGNATURE for integer-exact dedup — the temporal
    * member of the [[imageGridSumVector]] family: demux the container,
    * DECODE every `step`-th frame, and accumulate the per-cell gray
    * sums of all sampled frames into ONE gridW×gridH vector (exact
    * longs, scaled-mean-centered like its image/audio siblings). The
    * accumulation makes the signature length-independent without
    * resampling, and skipped frames still cost only a seek — the
    * [[sampleVideoFrames]] demuxer property. Feed to
    * [[Similarity.integerCosinePairs]] for near-dup-by-content across
    * frame codecs. Output: (asset_id, features array<long>).
    */
  def videoGridSumVector(df: DataFrame, id: Column, gridW: Int, gridH: Int,
                         step: Int, mediaCol: String = "media"): DataFrame = {
    require(gridW >= 1 && gridH >= 1 && step >= 1,
      s"degenerate grid/step ${gridW}x$gridH/$step")
    val in = df.select(id.cast("long").as("asset_id"), col(mediaCol).as("m"))
    val dim = gridW * gridH
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(LongType, containsNull = false),
        nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val a = r.getLong(0)
        val bytes = r.get(1) match {
          case b: Array[Byte] => b
          case _              => null
        }
        if (bytes == null) None
        else {
          val sums = new Array[Long](dim)
          var any = false
          var pos = 0
          var idx = 0
          while (pos + 4 <= bytes.length) {
            val len = ((bytes(pos) & 0xff) << 24) |
              ((bytes(pos + 1) & 0xff) << 16) |
              ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
            if (len < 0 || pos.toLong + 4L + len > bytes.length)
              pos = bytes.length
            else {
              if (idx % step == 0) {
                decodeImage(java.util.Arrays.copyOfRange(bytes, pos + 4,
                    pos + 4 + len)).foreach { img =>
                  any = true
                  val w = img.getWidth; val h = img.getHeight
                  var y = 0
                  while (y < h) {
                    val cy = y * gridH / h
                    var x = 0
                    while (x < w) {
                      val cx = x * gridW / w
                      val rgb = img.getRGB(x, y)
                      sums(cy * gridW + cx) += ((rgb >> 16) & 0xff) +
                        ((rgb >> 8) & 0xff) + (rgb & 0xff)
                      x += 1
                    }
                    y += 1
                  }
                }
              }
              pos += 4 + len
              idx += 1
            }
          }
          if (!any) None
          else {
            val total = sums.sum
            Some(Row(a, sums.map(s => s * dim - total).toSeq))
          }
        }
      }
    }(enc)
  }

  // --- audio (javax.sound.sampled — WAV/AIFF/AU ship in the JDK) -------

  /** The deterministic synthetic PCM sample for asset `assetId` at
    * frame `k` — a 12-bit-range signed value, exactly representable in
    * 16-bit PCM, so a WAV encode→decode round trip reproduces it
    * EXACTLY and the DuckDB twin can recompute aggregate statistics
    * arithmetically (`(asset_id*31 + k*7) % 4096 - 2048`).
    */
  def syntheticSample(assetId: Long, k: Int): Int =
    ((assetId * 31L + k * 7L) % 4096L).toInt - 2048

  /** A CONTENT-RICH synthetic sample — a chirp whose sweep rate depends
    * on the seed (`(a·31 + (a%13+2)·k² + 7k) mod 4096 − 2048`). The
    * plain [[syntheticSample]] sawtooth is (piecewise) LINEAR in `k`
    * over short clips, so after mean-centering every clip's energy
    * contour is the same ramp and cosine cannot tell any two clips
    * apart — fine for codec round-trip proofs, useless as a dedup
    * fixture. The seed-dependent k² term wraps at different rates per
    * seed, giving distinct contour shapes (measured: re-encodes cos =
    * 1 exactly, unrelated/truncated ≤ 0.954 at 12 cells).
    */
  def syntheticChirp(assetId: Long, k: Int): Int =
    ((assetId * 31L + (assetId % 13L + 2L) * k * k + 7L * k) % 4096L)
      .toInt - 2048

  /** Encode one deterministic mono 16-bit PCM clip to real WAV (or
    * AIFF/AU) bytes via `javax.sound.sampled` — executor-side in
    * [[synthesizeAudio]]; public for spec fixtures.
    */
  def encodeSyntheticWav(assetId: Long, nSamples: Int, sampleRate: Int = 8000,
                         fileType: String = "wav",
                         chirp: Boolean = false): Array[Byte] = {
    imageIoInit // headless (shared init; sound file IO needs no device)
    require(nSamples >= 1, s"degenerate clip length $nSamples")
    val bigEndian = fileType != "wav" // AIFF/AU are big-endian PCM
    val pcm = new Array[Byte](nSamples * 2)
    var k = 0
    while (k < nSamples) {
      val s = if (chirp) syntheticChirp(assetId, k)
        else syntheticSample(assetId, k)
      if (bigEndian) {
        pcm(2 * k) = ((s >> 8) & 0xff).toByte
        pcm(2 * k + 1) = (s & 0xff).toByte
      } else {
        pcm(2 * k) = (s & 0xff).toByte
        pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
      }
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1,
      true, bigEndian)
    val stream = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val baos = new ByteArrayOutputStream()
    val t = fileType match {
      case "wav"  => javax.sound.sampled.AudioFileFormat.Type.WAVE
      case "aiff" => javax.sound.sampled.AudioFileFormat.Type.AIFF
      case "au"   => javax.sound.sampled.AudioFileFormat.Type.AU
      case other  => throw new IllegalArgumentException(s"no writer for $other")
    }
    javax.sound.sampled.AudioSystem.write(stream, t, baos)
    baos.toByteArray
  }

  /** Synthesize one real encoded audio clip per row — the audio twin of
    * [[synthesizeImages]]. Output: (asset_id, media, media_type,
    * true_n_samples, true_sample_rate).
    */
  def synthesizeAudio(df: DataFrame, id: Column, nSamples: Column,
                      sampleRate: Int = 8000,
                      fileType: String = "wav"): DataFrame = {
    val in = df.select(id.cast("long").as("asset_id"),
      nSamples.cast("int").as("true_n_samples"))
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media", BinaryType, nullable = true),
      StructField("media_type", StringType, nullable = true),
      StructField("true_n_samples", IntegerType, nullable = false),
      StructField("true_sample_rate", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val mime = s"audio/$fileType"
    in.mapPartitions { rows =>
      rows.map { r =>
        val a = r.getLong(0); val n = r.getInt(1)
        Row(a, encodeSyntheticWav(a, n, sampleRate, fileType), mime, n,
          sampleRate)
      }
    }(enc)
  }

  /** Real decode of one audio payload to (stream, format): any
    * container `AudioSystem` recognizes (WAV/AIFF/AU out of the box);
    * None for null/empty/undecodable bytes.
    */
  def decodeAudio(bytes: Array[Byte])
      : Option[javax.sound.sampled.AudioInputStream] = {
    imageIoInit
    if (bytes == null || bytes.isEmpty) None
    else
      try Option(javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes)))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException                               => None
      }
  }

  /** Batched REAL audio metadata decode (the audio [[decodeMeta]]):
    * appends sample_rate, channels, bits, n_frames, n_bytes — true
    * decoded values for decodable payloads, nulls (plus byte length)
    * otherwise. Zero-shuffle partition iterator.
    */
  def decodeAudioMeta(df: DataFrame, mediaCol: String = "media"): DataFrame = {
    val extra = Seq(
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("bits", IntegerType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("n_bytes", LongType, nullable = true))
    val outSchema = StructType(df.schema.fields ++ extra)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(mediaIdx) match {
          case b: Array[Byte] => b
          case _              => null
        }
        val n = if (bytes == null) 0L else bytes.length.toLong
        val meta = decodeAudio(bytes) match {
          case Some(st) =>
            try {
              val f = st.getFormat
              Seq[Any](f.getSampleRate.toInt, f.getChannels,
                f.getSampleSizeInBits, st.getFrameLength, n)
            } finally st.close()
          case None => Seq[Any](null, null, null, null, n)
        }
        Row.fromSeq(r.toSeq ++ meta)
      }
    }(enc)
  }

  /** REAL per-clip PCM statistics with exact-integer outputs: sample
    * sum, absolute sum, min, max over the decoded 16-bit frames — PCM
    * is lossless, so over [[synthesizeAudio]] fixtures the whole
    * encode→decode→aggregate pipeline is DuckDB-oracle-checkable (the
    * audio twin of [[imageChannelStats]]). Output: (asset_id,
    * n_samples, sum_pcm, sum_abs, min_pcm, max_pcm); nulls for
    * undecodable payloads AND for decodable-but-unsupported layouts
    * (non-mono or non-16-bit) — never a task failure.
    */
  def audioSampleStats(df: DataFrame, id: Column,
                       mediaCol: String = "media"): DataFrame = {
    val in = df.select(id.cast("long").as("asset_id"), col(mediaCol).as("m"))
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = true),
      StructField("sum_pcm", LongType, nullable = true),
      StructField("sum_abs", LongType, nullable = true),
      StructField("min_pcm", LongType, nullable = true),
      StructField("max_pcm", LongType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val a = r.getLong(0)
        decodeAudio(r.get(1) match {
          case b: Array[Byte] => b
          case _              => null
        }) match {
          case Some(st) if st.getFormat.getSampleSizeInBits == 16 &&
              st.getFormat.getChannels == 1 =>
            // decodable but UNSUPPORTED layouts (stereo, 8/24-bit) fall
            // through to the null row below — a require here would fail
            // the whole job on one odd file, breaking the documented
            // degrade-to-nulls contract every sibling decoder keeps
            try {
              val f = st.getFormat
              val big = f.isBigEndian
              val bytes = st.readAllBytes()
              var sum = 0L; var sabs = 0L
              var mn = Long.MaxValue; var mx = Long.MinValue
              var i = 0
              while (i + 2 <= bytes.length) {
                val s =
                  if (big) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
                  else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
                sum += s; sabs += math.abs(s.toLong)
                if (s < mn) mn = s
                if (s > mx) mx = s
                i += 2
              }
              val nS = bytes.length / 2
              if (nS == 0) Row(a, 0L, 0L, 0L, null, null)
              else Row(a, nS.toLong, sum, sabs, mn, mx)
            } finally st.close()
          case other => // undecodable OR unsupported layout
            other.foreach(_.close())
            Row(a, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Audio twin of [[synthesizeImageVariants]]: per-row (asset id,
    * pixel seed, clip length, container format) renders a CHIRP clip
    * ([[syntheticChirp]] — see its scaladoc for why the sawtooth can't
    * serve as a dedup fixture) into a real WAV/AIFF/AU container — a
    * WAV and an AIFF of the same seed share no bytes but identical
    * PCM content. Output: (asset_id, media, media_type).
    */
  def synthesizeAudioVariants(df: DataFrame, id: Column, seed: Column,
                              nSamples: Column, fileType: Column,
                              sampleRate: Int = 8000): DataFrame = {
    val in = df.select(id.cast("long").as("asset_id"),
      seed.cast("long").as("seed"), nSamples.cast("int").as("n"),
      fileType.cast("string").as("ft"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val ft = r.getString(3)
        Row(r.getLong(0),
          encodeSyntheticWav(r.getLong(1), r.getInt(2), sampleRate, ft,
            chirp = true),
          s"audio/$ft")
      }
    }(enc)
  }

  /** Windowed energy contour over REAL decoded PCM — the audio analog
    * of [[imageGridFeatures]]: fixed-length windows of `windowSize`
    * frames (`win_idx = k / windowSize`, last window partial), each
    * reduced to exact-long count/sum/sum-of-squares plus ONE IEEE
    * division for the mean energy — so over [[synthesizeAudio]]
    * fixtures the whole decode→window→aggregate pipeline hash-matches
    * a SQL arithmetic twin. Mono 16-bit only (the sibling decoders'
    * degrade-to-nothing contract: unsupported layouts emit no rows).
    * Output: (asset_id, win_idx, n, sum_pcm, sum_sq, energy).
    */
  def audioWindowFeatures(df: DataFrame, id: Column, windowSize: Int,
                          mediaCol: String = "media"): DataFrame = {
    require(windowSize >= 1, s"degenerate window $windowSize")
    val in = df.select(id.cast("long").as("asset_id"), col(mediaCol).as("m"))
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("win_idx", IntegerType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("sum_pcm", LongType, nullable = false),
      StructField("sum_sq", LongType, nullable = false),
      StructField("energy", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val a = r.getLong(0)
        decodedMonoPcm(r.get(1)) match {
          case Some(samples) =>
            samples.indices.groupBy(_ / windowSize).toSeq.sortBy(_._1)
              .map { case (w, ks) =>
                var sum = 0L; var sq = 0L
                ks.foreach { k =>
                  val s = samples(k).toLong; sum += s; sq += s * s
                }
                Row(a, w, ks.length.toLong, sum, sq,
                  sq.toDouble / ks.length)
              }
          case None => Nil
        }
      }
    }(enc)
  }

  /** The audio CONTENT SIGNATURE for integer-exact dedup — the 1-D twin
    * of [[imageGridSumVector]]: the clip is split into `cells`
    * proportional segments (`cell = k·cells / n`, so clips of any
    * length map to the same fixed dimension), each reduced to its
    * exact-long sample sum, then scaled-mean-centered
    * (`c_i = cells·s_i − Σs`). Feed to
    * [[Similarity.integerCosinePairs]] for a bit-decisive
    * near-dup-by-sound join. Output: (asset_id, features array<long>
    * of length `cells`).
    */
  def audioGridSumVector(df: DataFrame, id: Column, cells: Int,
                         mediaCol: String = "media"): DataFrame = {
    require(cells >= 1, s"degenerate cell count $cells")
    val in = df.select(id.cast("long").as("asset_id"), col(mediaCol).as("m"))
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(LongType, containsNull = false),
        nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val a = r.getLong(0)
        decodedMonoPcm(r.get(1)) match {
          case Some(samples) if samples.nonEmpty =>
            val sums = new Array[Long](cells)
            val n = samples.length
            var k = 0
            while (k < n) {
              sums(((k.toLong * cells) / n).toInt) += samples(k)
              k += 1
            }
            val total = sums.sum
            Some(Row(a, sums.map(s => s * cells - total).toSeq))
          case _ => None
        }
      }
    }(enc)
  }

  /** Decode a payload to mono 16-bit PCM samples, None for
    * undecodable/unsupported layouts (shared by the window/grid
    * extractors; same total-by-construction contract as
    * [[audioSampleStats]]).
    */
  private def decodedMonoPcm(payload: Any): Option[Array[Short]] = {
    val bytes = payload match {
      case b: Array[Byte] => b
      case _              => null
    }
    decodeAudio(bytes) match {
      case Some(st) if st.getFormat.getSampleSizeInBits == 16 &&
          st.getFormat.getChannels == 1 =>
        try {
          val big = st.getFormat.isBigEndian
          val raw = st.readAllBytes()
          val out = new Array[Short](raw.length / 2)
          var i = 0
          while (i + 2 <= raw.length) {
            out(i / 2) =
              if (big) ((raw(i) << 8) | (raw(i + 1) & 0xff)).toShort
              else ((raw(i + 1) << 8) | (raw(i) & 0xff)).toShort
            i += 2
          }
          Some(out)
        } finally st.close()
      case other =>
        other.foreach(_.close())
        None
    }
  }

  /** STUB FEATURE EXTRACTOR — deterministic fake embedding derived from
    * payload bytes (cyclic byte read, centered to [-0.5, 0.5]). A real
    * deployment swaps this expression for a model-inference call (e.g. a
    * batched ONNX scorer in [[decodeMeta]]'s iterator form); the schema
    * (array<double> of fixed dim) and everything downstream (ANN, dedup)
    * stay identical. For a real NON-model feature over decoded pixels,
    * see [[imageChannelStats]].
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

  /** BYTE-level crop/pad to an exact payload size (truncate long
    * payloads, zero-pad short ones) — the content-agnostic batch-shape
    * normalizer for OPAQUE payloads (audio frames, tensors); for real
    * image resampling use [[resizeImages]]. Keeps output size
    * statically known for downstream batch shapes.
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
