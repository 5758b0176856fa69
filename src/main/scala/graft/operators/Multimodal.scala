package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.encoders.RowEncoder

/** Multimodal columns: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * stages.
  *
  * All three modalities have REAL, oracle-checked decode paths built
  * on formats that need no external codec: image = BMP via the JDK's
  * ImageIO (mm4), audio = PCM WAV via AudioSystem (mm5), video =
  * uncompressed RIFF/AVI via a genuine chunk-walking container parser
  * (mm6). The only remaining stub is the generic `decodeStub` inside
  * `extractFeatures`, kept as the pluggable-codec pipeline shape (a
  * compressed-codec impl — JNI ffmpeg etc. — swaps only that function
  * body; every plan shape stays identical).
  *
  * Scale notes: media blobs make row sizes large, so feature
  * extraction runs per-partition with an iterator (no per-row task
  * overhead, no materializing a partition in memory), and media tables
  * should be written with small `maxRecordsPerFile` /
  * `files.maxPartitionBytes` so one partition's blobs fit the executor
  * heap.
  */
object Multimodal {

  /** Metadata struct carried next to every media blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),         // image | audio | video
    StructField("format", StringType),       // codec/container tag
    StructField("width", IntegerType),       // -1 when n/a
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))   // -1 for still images

  /** Wrap a table with a fake media column for pipeline testing: the
    * text bytes stand in for an encoded blob, metadata derived
    * deterministically from the id.
    */
  def synthesizeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(textCol).cast("binary").as("blob"),
      struct(
        element_at(lit(Array("image", "audio", "video")),
          (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
        lit("synthetic/v1").as("format"),
        (pmod(col(idCol) * 37, lit(1920)) + 1).cast("int").as("width"),
        (pmod(col(idCol) * 53, lit(1080)) + 1).cast("int").as("height"),
        when(pmod(col(idCol), lit(3)) === 0, lit(-1L))
          .otherwise(pmod(col(idCol) * 97, lit(600000))).as("duration_ms"))
        .as("meta"))

  /** STUB decoder: a real implementation would decode the blob with a
    * codec; this derives `dims` deterministic float features from the
    * raw bytes (byte histogram moments) so tests have stable values.
    */
  private def decodeStub(blob: Array[Byte], dims: Int): Array[Float] = {
    val feats = new Array[Float](dims)
    if (blob != null && blob.nonEmpty) {
      var i = 0
      while (i < blob.length) {
        feats(i % dims) += (blob(i) & 0xff) / 255.0f
        i += 1
      }
      var d = 0
      while (d < dims) { feats(d) /= blob.length; d += 1 }
    }
    feats
  }

  /** Per-partition batched feature extraction over (media_id, blob,
    * meta) rows → (media_id, kind, features). mapPartitions, not a
    * per-row UDF: one iterator pass per partition, decoder state (in a
    * real impl: codec contexts, model sessions) initialized once per
    * partition instead of once per row.
    */
  def extractFeatures(media: DataFrame, dims: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      // per-partition init happens here (real decoder: open codec once)
      rows.map { r =>
        val meta = r.getStruct(metaIdx)
        Row(r.getLong(idIdx),
          meta.getString(meta.fieldIndex("kind")),
          decodeStub(r.getAs[Array[Byte]](blobIdx), dims).toSeq)
      }
    }(enc)
  }

  // ---- REAL image path (no stub) ----------------------------------
  // javax.imageio ships in the JDK, so BMP/PNG decode needs no external
  // codec even in this container: synthesizeBmp writes genuine 24-bit
  // BMP bytes with a deterministic pixel formula, decodeImageFeatures
  // decodes them back with ImageIO, and the mm4 gate's DuckDB oracle
  // recomputes the mean luma arithmetically — encode → real bytes →
  // real decoder → oracle-checked features, end to end.

  /** Genuine 24-bit BMP bytes: pixel gray value
    * `(id*31 + x*7 + y*13) % 256` — SQL-recomputable, so a decoder's
    * output is oracle-checkable. Width must keep rows 4-byte aligned
    * (w*3 % 4 == 0).
    */
  def bmpBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val rowBytes = w * 3
    require(rowBytes % 4 == 0, s"width $w breaks BMP 4-byte row alignment")
    val size = 54 + rowBytes * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1.toShort).putShort(24.toShort)
    b.putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var y = h - 1 // BMP stores rows bottom-up
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val v = (((id * 31 + x * 7 + y * 13) % 256 + 256) % 256).toInt
        b.put(v.toByte).put(v.toByte).put(v.toByte)
        x += 1
      }
      y -= 1
    }
    b.array()
  }

  /** (media_id, blob) rows of real BMP images, one per id. */
  def synthesizeBmp(df: DataFrame, idCol: String,
                    w: Int = 8, h: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, bmpBytes(id, w, h))
      }
    }(enc)
  }

  /** REAL decode via ImageIO: (media_id, width, height, mean_luma).
    * Same mapPartitions batch shape as [[extractFeatures]].
    */
  def decodeImageFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_luma", DoubleType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      // per-partition decoder init: ImageIO's default read path spools
      // every stream through a TEMP FILE cache — one disk round-trip
      // per image (measured 12.6s for 5k tiny BMPs at sf0.1, 0.9s
      // without). In-memory caching is the only sane mode for blobs
      // already in memory.
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](blobIdx)))
        require(img != null, "undecodable image blob")
        val w = img.getWidth; val h = img.getHeight
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
              (rgb & 0xff)) / 3.0
            x += 1
          }
          y += 1
        }
        Row(r.getLong(idIdx), w, h, sum / (w.toLong * h))
      }
    }(enc)
  }

  // ---- REAL audio path (no stub) ----------------------------------
  // javax.sound.sampled also ships in the JDK: synthesizeWav writes
  // genuine 8-bit mono PCM WAV bytes with an SQL-recomputable sample
  // formula, decodeAudioFeatures parses them back with AudioSystem —
  // the mm5 gate oracle recomputes the mean amplitude arithmetically.

  /** Genuine RIFF/WAVE bytes: 8-bit unsigned mono PCM, sample i value
    * `(id*17 + i*11) % 256`.
    */
  def wavBytes(id: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val size = 44 + nSamples
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(s: String): Unit = s.foreach(c => b.put(c.toByte))
    ascii("RIFF"); b.putInt(36 + nSamples); ascii("WAVE")
    ascii("fmt "); b.putInt(16)
    b.putShort(1.toShort)             // PCM
    b.putShort(1.toShort)             // mono
    b.putInt(sampleRate)
    b.putInt(sampleRate)              // byte rate (8-bit mono)
    b.putShort(1.toShort)             // block align
    b.putShort(8.toShort)             // bits per sample
    ascii("data"); b.putInt(nSamples)
    var i = 0
    while (i < nSamples) {
      b.put(((((id * 17 + i * 11) % 256) + 256) % 256).toByte)
      i += 1
    }
    b.array()
  }

  /** (media_id, blob) rows of real WAV audio, one per id. */
  def synthesizeWav(df: DataFrame, idCol: String,
                    nSamples: Int = 256, sampleRate: Int = 8000): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, wavBytes(id, nSamples, sampleRate))
      }
    }(enc)
  }

  /** REAL decode via AudioSystem: (media_id, sample_rate, n_samples,
    * mean_amp) — same mapPartitions batch shape.
    */
  def decodeAudioFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType),
      StructField("mean_amp", DoubleType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      rows.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](blobIdx)))
        try {
          val fmt = in.getFormat
          val data = in.readAllBytes()
          var sum = 0.0
          var i = 0
          while (i < data.length) { sum += (data(i) & 0xff); i += 1 }
          Row(r.getLong(idIdx), fmt.getSampleRate.toInt, data.length.toLong,
            if (data.isEmpty) 0.0 else sum / data.length)
        } finally in.close()
      }
    }(enc)
  }

  // ---- REAL video path (no stub) ----------------------------------
  // The JDK ships no video codec, but an UNCOMPRESSED AVI needs none:
  // the container is RIFF (like WAV) and 'DIB ' frames are raw
  // bottom-up BGR bitmaps (like BMP). synthesizeAvi writes a genuine
  // RIFF/AVI — hdrl (avih + strl(strh'vids'/'DIB ' + strf
  // BITMAPINFOHEADER)) + movi with one 00db chunk per frame — and
  // decodeVideoFrames walks the chunk tree back (a real container
  // parse: fourcc/size/even-padding, nested LISTs, strf for
  // dimensions, movi for frame data), exploding one row per frame.
  // Pixel formula `(id*31 + f*19 + x*7 + y*13) % 256` is
  // SQL-recomputable, so the mm6 gate oracle rebuilds every frame's
  // mean luma arithmetically. With mm4 (ImageIO) and mm5
  // (AudioSystem), all three modalities now have stub-free paths.

  /** Genuine uncompressed RIFF/AVI bytes: `nFrames` 24-bit 'DIB '
    * frames, gray pixel `(id*31 + f*19 + x*7 + y*13) % 256`, rows
    * bottom-up and 4-byte aligned like BMP.
    */
  def aviBytes(id: Long, w: Int, h: Int, nFrames: Int, fps: Int = 10): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val frameBytes = rowBytes * h
    val framePad = frameBytes & 1
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + nFrames * (8 + frameBytes + framePad)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val b = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(s: String): Unit = s.foreach(c => b.put(c.toByte))
    ascii("RIFF"); b.putInt(riffSize); ascii("AVI ")
    ascii("LIST"); b.putInt(hdrlSize); ascii("hdrl")
    ascii("avih"); b.putInt(56)
    b.putInt(1000000 / fps)            // microSecPerFrame
    b.putInt(frameBytes * fps)         // maxBytesPerSec
    b.putInt(0)                        // paddingGranularity
    b.putInt(0)                        // flags (no index)
    b.putInt(nFrames).putInt(0)        // totalFrames, initialFrames
    b.putInt(1)                        // streams
    b.putInt(frameBytes)               // suggestedBufferSize
    b.putInt(w).putInt(h)
    b.putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    ascii("LIST"); b.putInt(strlSize); ascii("strl")
    ascii("strh"); b.putInt(56)
    ascii("vids"); ascii("DIB ")
    b.putInt(0)                        // flags
    b.putShort(0.toShort).putShort(0.toShort) // priority, language
    b.putInt(0)                        // initialFrames
    b.putInt(1).putInt(fps)            // scale, rate => fps frames/s
    b.putInt(0).putInt(nFrames)        // start, length
    b.putInt(frameBytes)               // suggestedBufferSize
    b.putInt(-1).putInt(0)             // quality, sampleSize
    b.putShort(0.toShort).putShort(0.toShort) // rcFrame l,t
    b.putShort(w.toShort).putShort(h.toShort) // rcFrame r,b
    ascii("strf"); b.putInt(40)
    b.putInt(40).putInt(w).putInt(h)   // biSize, biWidth, biHeight
    b.putShort(1.toShort).putShort(24.toShort) // planes, bpp
    b.putInt(0)                        // BI_RGB (uncompressed)
    b.putInt(frameBytes)
    b.putInt(2835).putInt(2835).putInt(0).putInt(0)
    ascii("LIST"); b.putInt(moviSize); ascii("movi")
    var f = 0
    while (f < nFrames) {
      ascii("00db"); b.putInt(frameBytes)
      var y = h - 1 // DIB rows bottom-up
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val v = (((id * 31 + f * 19 + x * 7 + y * 13) % 256 + 256) % 256).toInt
          b.put(v.toByte).put(v.toByte).put(v.toByte)
          x += 1
        }
        var p = w * 3
        while (p < rowBytes) { b.put(0.toByte); p += 1 }
        y -= 1
      }
      if (framePad == 1) b.put(0.toByte)
      f += 1
    }
    b.array()
  }

  /** (media_id, blob) rows of real AVI video, one per id. */
  def synthesizeAvi(df: DataFrame, idCol: String, w: Int = 8, h: Int = 8,
                    nFrames: Int = 4): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, aviBytes(id, w, h, nFrames))
      }
    }(enc)
  }

  /** Parsed uncompressed AVI: (width, height, frames as raw DIB rows).
    * A real chunk walk — fourcc/size headers, even-byte padding,
    * nested LISTs — not an offset assumption; rejects compressed
    * streams (biCompression != 0).
    */
  def parseAvi(bytes: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val a = new Array[Byte](4); b.get(a)
      new String(a, java.nio.charset.StandardCharsets.US_ASCII)
    }
    require(fourcc() == "RIFF", "not a RIFF container")
    b.getInt
    require(fourcc() == "AVI ", "not an AVI RIFF form")
    var w = -1; var h = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(end: Int): Unit = {
      while (b.position() + 8 <= end) {
        val id = fourcc()
        val sz = b.getInt
        val start = b.position()
        if (id == "LIST") { fourcc(); walk(start + sz) }
        else if (id == "strf") {
          b.getInt // biSize
          w = b.getInt; h = b.getInt
          b.getShort // planes
          require(b.getShort == 24, "only 24-bit DIB supported")
          require(b.getInt == 0, "compressed AVI stream (need a codec)")
        } else if (id == "00db" || id == "00dc") {
          val data = new Array[Byte](sz)
          b.position(start); b.get(data)
          frames += data
        }
        b.position(start + sz + (sz & 1))
      }
    }
    walk(bytes.length)
    require(w > 0 && h > 0, "no strf header found")
    (w, h, frames.toArray)
  }

  /** REAL video decode: parse the AVI container, explode one output
    * row per frame with its decoded mean luma — (media_id, frame_no,
    * width, height, mean_luma). Same mapPartitions batch shape as the
    * image/audio paths (container parser state is per-partition).
    *
    * `stride` > 1 is real frame SAMPLING on the real decode path:
    * every stride-th frame (0, stride, 2·stride, …) is decoded and the
    * pixel pass is SKIPPED for the rest — the container walk still
    * touches every chunk header (that's how frame boundaries are
    * found), but the per-pixel work drops by the stride factor, which
    * is the cost that dominates on real video.
    */
  def decodeVideoFrames(media: DataFrame, stride: Int = 1): DataFrame = {
    require(stride >= 1, "decodeVideoFrames: stride must be >= 1")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_no", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_luma", DoubleType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val (w, h, frames) = parseAvi(r.getAs[Array[Byte]](blobIdx))
        val rowBytes = ((w * 3 + 3) / 4) * 4
        frames.iterator.zipWithIndex
          .filter { case (_, f) => f % stride == 0 }
          .map { case (data, f) =>
          var sum = 0.0
          var y = 0
          while (y < h) {
            val off = y * rowBytes
            var x = 0
            while (x < w) {
              val o = off + x * 3
              sum += ((data(o) & 0xff) + (data(o + 1) & 0xff) +
                (data(o + 2) & 0xff)) / 3.0
              x += 1
            }
            y += 1
          }
          Row(r.getLong(idIdx), f, w, h, sum / (w.toLong * h))
        }
      }
    }(enc)
  }

  /** Frame sampling for video-kind rows: emit every `stride`-th fixed
    * `frameBytes` window of the blob as one "frame" blob. A real
    * implementation seeks keyframes; the iterator/explode shape — one
    * input row to N frame rows — is the part that matters.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64,
                   stride: Int = 4): DataFrame = {
    media
      .filter(col("meta.kind") === "video")
      .select(col("media_id"), col("blob"),
        greatest(lit(1),
          (octet_length(col("blob")) / lit(frameBytes * stride)).cast("int"))
          .as("n_frames"))
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), col("n_frames") - 1),
          i => substring(col("blob"), (i * frameBytes * stride + 1).cast("int"),
            lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_blob")
  }
}
