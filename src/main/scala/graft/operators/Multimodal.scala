package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.encoders.RowEncoder

/** Multimodal columns: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * stages.
  *
  * All three modalities have REAL decode paths built on formats that
  * need no external codec: image = BMP via the JDK's ImageIO, audio =
  * PCM WAV via AudioSystem, video = uncompressed RIFF/AVI via a
  * genuine chunk-walking container parser. [[extractFeatures]]
  * dispatches on `meta.kind` through those decoders, so the whole
  * family — synthesis, metadata, per-kind decode, feature pooling,
  * frame sampling — is stub-free and oracle-checkable end to end (the
  * synthesized pixel/sample formulas are SQL-recomputable). Swapping
  * in a compressed codec (JNI ffmpeg etc.) replaces only the per-kind
  * decode bodies; every plan shape stays identical.
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

  /** Wrap a table with a REAL media column for pipeline testing: kind
    * rotates by id (image/audio/video), and the blob is a genuine
    * container of that kind — 8×8 24-bit BMP, 256-sample 8 kHz PCM
    * WAV, or 4-frame 8×8 uncompressed AVI — with the deterministic
    * pixel/sample formulas of [[bmpBytes]]/[[wavBytes]]/[[aviBytes]],
    * so every downstream decode is SQL-recomputable. Metadata carries
    * the real dimensions/duration of the synthesized container.
    */
  def synthesizeRealMedia(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType),
      StructField("meta", mediaMetaType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        (((id % 3) + 3) % 3).toInt match {
          case 0 => Row(id, bmpBytes(id, 8, 8),
            Row("image", "image/bmp", 8, 8, -1L))
          case 1 => Row(id, wavBytes(id, 256, 8000),
            Row("audio", "audio/wav", -1, -1, 256L * 1000 / 8000))
          case _ => Row(id, aviBytes(id, 8, 8, 4, fps = 10),
            Row("video", "video/avi", 8, 8, 4L * 1000 / 10))
        }
      }
    }(enc)
  }

  /** Per-partition batched feature extraction over (media_id, blob,
    * meta) rows → (media_id, kind, features): REAL decode dispatched
    * on `meta.kind` — BMP via ImageIO, WAV via AudioSystem,
    * uncompressed AVI via [[parseAvi]] — then average-pooled into a
    * `dims`-dim vector: feature d is the mean of the decoded values
    * (luma or amplitude, scaled to [0,1]) at stream positions ≡ d
    * (mod dims). Decoded stream order is the defined contract (so the
    * pooling is engine-replayable): images scan row-major top-left
    * origin (i = y·w + x), audio in sample order, video frame-major
    * then row-major (i = f·w·h + y·w + x).
    *
    * mapPartitions, not a per-row UDF: one iterator pass per
    * partition, decoder state (ImageIO cache mode; in a compressed
    * impl: codec contexts) initialized once per partition instead of
    * once per row. Unknown kinds and undecodable blobs throw — a
    * curation pipeline must surface corrupt media, not embed zeros.
    */
  def extractFeatures(media: DataFrame, dims: Int = 16): DataFrame = {
    require(dims >= 1, s"extractFeatures: dims must be >= 1 (got $dims)")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("features", ArrayType(DoubleType, containsNull = false))))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    val metaIdx = media.schema.fieldIndex("meta")
    // nested-field index resolved from the STATIC schema: runtime Rows
    // out of mapPartitions sources carry no per-row schema
    val kindIdx = media.schema("meta").dataType
      .asInstanceOf[StructType].fieldIndex("kind")
    media.mapPartitions { rows =>
      // per-partition decoder init (see decodeImageFeatures on why)
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val meta = r.getStruct(metaIdx)
        val kind = meta.getString(kindIdx)
        val blob = r.getAs[Array[Byte]](blobIdx)
        require(blob != null && blob.nonEmpty, "null/empty media blob")
        val sums = new Array[Long](dims)
        val counts = new Array[Long](dims)
        def add(i: Long, value255: Int): Unit = {
          val d = (i % dims).toInt
          sums(d) += value255; counts(d) += 1
        }
        kind match {
          case "image" =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(blob))
            require(img != null, "undecodable image blob")
            val w = img.getWidth; val h = img.getHeight
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                // synthesized BMPs are gray (r=g=b); for general
                // images this is the integer-rounded mean channel
                add(y.toLong * w + x,
                  (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                    (rgb & 0xff)) / 3)
                x += 1
              }
              y += 1
            }
          case "audio" =>
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(blob))
            try {
              // per-byte pooling is only an amplitude for 8-bit mono
              // UNSIGNED linear PCM; refuse wider/companded/signed
              // formats rather than silently pooling half-samples or
              // mu-law bytes (the video branch's 24-bit/uncompressed
              // strictness, applied here)
              requireUnsigned8BitMono(in.getFormat)
              val data = in.readAllBytes()
              var i = 0
              while (i < data.length) { add(i, data(i) & 0xff); i += 1 }
            } finally in.close()
          case "video" =>
            val (w, h, frames) = parseAvi(blob)
            val rowBytes = ((w * 3 + 3) / 4) * 4
            var f = 0
            while (f < frames.length) {
              val data = frames(f)
              var y = 0 // logical (synthesis-formula) row, top-down
              while (y < h) {
                val off = (h - 1 - y) * rowBytes // DIB rows stored bottom-up
                var x = 0
                while (x < w) {
                  val o = off + x * 3
                  add(f.toLong * w * h + y.toLong * w + x,
                    ((data(o) & 0xff) + (data(o + 1) & 0xff) +
                      (data(o + 2) & 0xff)) / 3)
                  x += 1
                }
                y += 1
              }
              f += 1
            }
          case other =>
            throw new IllegalArgumentException(s"unknown media kind: $other")
        }
        val feats = new Array[Double](dims)
        var d = 0
        while (d < dims) {
          // exact-integer sum, ONE division, /255 scale: the same two
          // correctly-rounded float ops an oracle's avg(k)/255 performs,
          // so the doubles are bit-identical cross-engine
          feats(d) =
            if (counts(d) == 0) 0.0
            else sums(d).toDouble / counts(d) / 255.0
          d += 1
        }
        Row(r.getLong(idIdx), kind, feats.toSeq)
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
    *
    * `textured = true` swaps in PSEUDORANDOM pixels: gray value = the
    * first byte of `md5("{id}-{x}-{y}")` — still engine-replayable
    * (every SQL engine with md5 rebuilds it as
    * `('0x' || substr(md5(id || '-' || x || '-' || y), 1, 2))::INT`,
    * the dd2/dd3 portable-hash discipline). The linear gradient is
    * fine for decode/resize gates but useless for PERCEPTUAL-hash
    * fixtures: `id` enters it only as a global brightness offset, and
    * dHash is brightness-invariant by design, so any two unrelated
    * gradient images land within a couple of hamming bits (measured:
    * min ham 1 across 3000 ids, >130k exact hash collisions). No
    * algebraic mod-256 mix fixes that structurally; md5 pixels make
    * every dHash bit an independent fair coin across ids, so the
    * closest unrelated pair in a 12M-pair corpus sits ~28 bits out
    * (P[ham<=3] per pair ~4e-13).
    */
  def bmpBytes(id: Long, w: Int, h: Int,
               textured: Boolean = false): Array[Byte] = {
    val rowBytes = w * 3
    require(rowBytes % 4 == 0, s"width $w breaks BMP 4-byte row alignment")
    val md = if (textured)
      java.security.MessageDigest.getInstance("MD5") else null
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
        val v =
          if (textured)
            md.digest(s"$id-$x-$y".getBytes(
              java.nio.charset.StandardCharsets.US_ASCII))(0) & 0xff
          else (((id * 31 + x * 7 + y * 13) % 256 + 256) % 256).toInt
        b.put(v.toByte).put(v.toByte).put(v.toByte)
        x += 1
      }
      y -= 1
    }
    b.array()
  }

  /** (media_id, blob) rows of real BMP images, one per id. */
  def synthesizeBmp(df: DataFrame, idCol: String,
                    w: Int = 8, h: Int = 8,
                    textured: Boolean = false): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, bmpBytes(id, w, h, textured))
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

  /** REAL nearest-neighbor image RESIZE — the remaining verb of the
    * decode / feature-extract / resize / frame-sample quartet: ImageIO
    * decode, integer-exact resample (`src = (dst * srcDim) / dstDim`,
    * floor — no float coordinates, so any engine replays the pixel
    * selection), genuine BMP re-encode. Output (media_id, blob, width,
    * height, rgb_sum): the blob is the real resized image (spec-
    * decoded back), `rgb_sum` the integer channel sum of the RESIZED
    * pixels — the decode-proof stat the oracle recomputes from the
    * source pixel formula through the same floor arithmetic. Same
    * mapPartitions batch shape (and in-memory ImageIO cache note) as
    * [[decodeImageFeatures]].
    */
  def resizeImages(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, s"bad target size ${outW}x$outH")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("rgb_sum", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](blobIdx)))
        require(img != null, "undecodable image blob")
        val sw = img.getWidth; val sh = img.getHeight
        val out = new java.awt.image.BufferedImage(outW, outH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var sum = 0L
        var y = 0
        while (y < outH) {
          val sy = (y.toLong * sh / outH).toInt
          var x = 0
          while (x < outW) {
            val rgb = img.getRGB((x.toLong * sw / outW).toInt, sy)
            out.setRGB(x, y, rgb)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "bmp", baos)
        Row(r.getLong(idIdx), baos.toByteArray, outW, outH, sum)
      }
    }(enc)
  }

  // ---- perceptual image hashing (near-dup for the image modality) --
  // The multimodal leg of corpus dedup: text near-dup blocks on
  // MinHash/SimHash sketches; images block on a perceptual hash of
  // the DECODED pixels, so re-encoded / resized / brightness-shifted
  // copies of the same picture collide even though their bytes (and
  // any content digest) differ. dHash/aHash are the standard integer
  // recipes (as popularized by the pHash family / Krawetz's
  // "kind of like that" write-ups): sample the decoded image down to
  // a tiny luma grid, emit one bit per local comparison. Pure integer
  // arithmetic end to end — floor NN sampling + integer luma — so any
  // engine replays the hash from the pixel values.

  /** Difference hash (dHash) over the REAL decode path: ImageIO
    * decode, floor-NN sample to a `gridW` x `gridH` integer luma grid
    * (src = (dst * srcDim) / dstDim, the [[resizeImages]] mapping;
    * luma = (r+g+b)/3 integer), then one bit per HORIZONTALLY adjacent
    * grid pair — bit gy*(gridW-1)+gx is set iff
    * luma(gx+1, gy) > luma(gx, gy). Output (media_id, dhash) with
    * dhash packed into a signed 64-bit long.
    *
    * (gridW-1)*gridH must stay <= 63: the classic 9x8/64-bit layout
    * would put a bit in the sign position, which survives in the JVM
    * but cannot be rebuilt portably by engines whose only 64-bit
    * integer is signed — the default 8x8 grid gives a 56-bit hash,
    * sign-safe everywhere. Comparison bits are invariant under any
    * monotone per-pixel transform that preserves strict order of
    * adjacent samples: a global brightness shift (no clamping at the
    * sampled cells), gamma, contrast — the property that makes dHash
    * a NEAR-dup key rather than a content digest.
    */
  def imageDHash(media: DataFrame, gridW: Int = 8, gridH: Int = 8)
  : DataFrame = {
    require(gridW >= 2 && gridH >= 1 && (gridW - 1) * gridH <= 63,
      s"imageDHash: need 2 <= gridW, (gridW-1)*gridH <= 63 " +
        s"(got ${gridW}x$gridH)")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("dhash", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val g = lumaGrid(r.getAs[Array[Byte]](blobIdx), gridW, gridH)
        var hash = 0L
        var gy = 0
        while (gy < gridH) {
          var gx = 0
          while (gx < gridW - 1) {
            if (g(gy * gridW + gx + 1) > g(gy * gridW + gx))
              hash |= 1L << (gy * (gridW - 1) + gx)
            gx += 1
          }
          gy += 1
        }
        Row(r.getLong(idIdx), hash)
      }
    }(enc)
  }

  /** Average hash (aHash) over the same decode + floor-NN grid: bit
    * gy*gridW+gx is set iff n*luma(gx, gy) > sum(all grid lumas) —
    * the mean comparison cleared of division (n = gridW*gridH), so
    * the bit is exact integer arithmetic on both engines. Default
    * grid 9x7 = 63 bits (sign-safe, see [[imageDHash]]). aHash keys
    * on absolute level rather than local gradient — cheaper, more
    * tolerant of local noise, NOT brightness-shift invariant; ship
    * both and let the near-dup policy pick.
    */
  def imageAHash(media: DataFrame, gridW: Int = 9, gridH: Int = 7)
  : DataFrame = {
    require(gridW >= 1 && gridH >= 1 && gridW * gridH <= 63,
      s"imageAHash: need gridW*gridH <= 63 (got ${gridW}x$gridH)")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("ahash", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    val n = gridW * gridH
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val g = lumaGrid(r.getAs[Array[Byte]](blobIdx), gridW, gridH)
        var sum = 0L
        var i = 0
        while (i < n) { sum += g(i); i += 1 }
        var hash = 0L
        i = 0
        while (i < n) {
          if (n.toLong * g(i) > sum) hash |= 1L << i
          i += 1
        }
        Row(r.getLong(idIdx), hash)
      }
    }(enc)
  }

  /** Decode + floor-NN sample to a gridW x gridH integer luma grid,
    * row-major — the shared front half of [[imageDHash]]/[[imageAHash]].
    */
  private def lumaGrid(blob: Array[Byte], gridW: Int, gridH: Int)
  : Array[Int] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(blob))
    require(img != null, "undecodable image blob")
    val sw = img.getWidth; val sh = img.getHeight
    val g = new Array[Int](gridW * gridH)
    var gy = 0
    while (gy < gridH) {
      val sy = (gy.toLong * sh / gridH).toInt
      var gx = 0
      while (gx < gridW) {
        val rgb = img.getRGB((gx.toLong * sw / gridW).toInt, sy)
        g(gy * gridW + gx) =
          (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        gx += 1
      }
      gy += 1
    }
    g
  }

  /** Brightness augmentation — clamp-add `delta` to every channel of
    * every pixel ([-255, 255]; saturating at 0/255 like any image
    * library, never wrapping) and re-encode as a genuine BMP. Output
    * (media_id, blob). Doubles as the controlled jitter source for
    * perceptual-hash fixtures: +1 preserves every strict adjacent-luma
    * order except at saturation, so the dHash of the shifted copy is
    * (near-)identical — exactly the invariance a perceptual near-dup
    * key promises.
    */
  def adjustBrightness(media: DataFrame, delta: Int): DataFrame = {
    require(delta >= -255 && delta <= 255,
      s"adjustBrightness: delta out of [-255, 255] (got $delta)")
    transformChannels(media, c => math.min(255, math.max(0, c + delta)))
  }

  /** Negative-image augmentation: every channel maps to 255 - c. The
    * anti-fixture for perceptual hashing — inversion REVERSES every
    * strict adjacent-luma comparison, so the dHash of an inverted copy
    * sits ~hash-width away from its source (a near-dup radius must
    * exclude it), while inverted images stay exactly as distinct from
    * EACH OTHER as their sources were (no degenerate cluster, unlike
    * saturating transforms that crush most pixels to one value).
    */
  def invertImage(media: DataFrame): DataFrame =
    transformChannels(media, c => 255 - c)

  /** Decode, apply `f` to every 8-bit channel value, re-encode as a
    * genuine BMP — the shared body of the per-pixel augmentation ops.
    * `f` must map [0, 255] into [0, 255].
    */
  private def transformChannels(media: DataFrame, f: Int => Int)
  : DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](blobIdx)))
        require(img != null, "undecodable image blob")
        val w = img.getWidth; val h = img.getHeight
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            out.setRGB(x, y,
              (f((rgb >> 16) & 0xff) << 16) |
                (f((rgb >> 8) & 0xff) << 8) |
                f(rgb & 0xff))
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "bmp", baos)
        Row(r.getLong(idIdx), baos.toByteArray)
      }
    }(enc)
  }

  // ---- REAL audio path (no stub) ----------------------------------
  // javax.sound.sampled also ships in the JDK: synthesizeWav writes
  // genuine 8-bit mono PCM WAV bytes with an SQL-recomputable sample
  // formula, decodeAudioFeatures parses them back with AudioSystem —
  // the mm5 gate oracle recomputes the mean amplitude arithmetically.

  /** Genuine RIFF/WAVE bytes: 8-bit unsigned mono PCM, sample i value
    * `(id*17 + i*11) % 256`. `textured = true` swaps in md5 pixels
    * (first byte of md5("{id}-{i}")) — same rationale as the image
    * variant ([[bmpBytes]]): perceptual-fingerprint fixtures need
    * samples that are independent across ids, and the linear formula
    * makes `id` a mere phase shift.
    */
  def wavBytes(id: Long, nSamples: Int, sampleRate: Int,
               textured: Boolean = false): Array[Byte] = {
    val size = 44 + nSamples
    val md = if (textured)
      java.security.MessageDigest.getInstance("MD5") else null
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
      val v =
        if (textured)
          md.digest(s"$id-$i".getBytes(
            java.nio.charset.StandardCharsets.US_ASCII))(0) & 0xff
        else ((((id * 17 + i * 11) % 256) + 256) % 256).toInt
      b.put(v.toByte)
      i += 1
    }
    b.array()
  }

  /** (media_id, blob) rows of real WAV audio, one per id. */
  def synthesizeWav(df: DataFrame, idCol: String,
                    nSamples: Int = 256, sampleRate: Int = 8000,
                    textured: Boolean = false): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, wavBytes(id, nSamples, sampleRate, textured))
      }
    }(enc)
  }

  /** The one audio format per-byte pooling is valid for: 8-bit mono
    * UNSIGNED linear PCM. Signed PCM flips amplitudes (-1 reads as
    * 255), mu-law/a-law bytes are companded, wider samples interleave
    * half-sample bytes — all would pool to finite garbage, so every
    * per-byte audio path refuses anything else.
    */
  private def requireUnsigned8BitMono(
      fmt: javax.sound.sampled.AudioFormat): Unit =
    require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1 &&
      fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      s"expected 8-bit mono unsigned PCM, got ${fmt.getEncoding}/" +
        s"${fmt.getSampleSizeInBits}-bit/${fmt.getChannels}ch — " +
        "add a conversion stage")

  /** REAL decode via AudioSystem: (media_id, sample_rate, n_samples,
    * mean_amp) — same mapPartitions batch shape; refuses non-8-bit-
    * mono-unsigned-PCM input like [[extractFeatures]] (n_samples and
    * mean_amp are per-BYTE quantities, valid only there).
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
          requireUnsigned8BitMono(fmt)
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

  /** REAL audio DECIMATION — [[resizeImages]]'s audio sibling: decode
    * via AudioSystem, keep every `factor`-th sample (integer stride —
    * no interpolation, so any engine replays the selection), re-encode
    * a genuine WAV at `rate / factor`. Output (media_id, blob,
    * sample_rate, n_samples, amp_sum): the blob is the real decimated
    * WAV (spec-decoded back), `amp_sum` the integer amplitude sum of
    * the KEPT samples — the oracle recomputes it from the source
    * sample formula through the same stride. `factor` must divide the
    * source rate (a fractional rate would silently lie about
    * duration). Bandwidth note for callers beyond fixtures: raw
    * decimation aliases frequencies above the new Nyquist — put a
    * low-pass stage first when spectral fidelity matters; the
    * plumbing (schema, batch shape, container round-trip) is what
    * this operator owns.
    */
  def resampleAudio(media: DataFrame, factor: Int): DataFrame = {
    require(factor > 0, s"bad decimation factor $factor")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType),
      StructField("amp_sum", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      rows.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](blobIdx)))
        try {
          val fmt = in.getFormat
          requireUnsigned8BitMono(fmt)
          val rate = fmt.getSampleRate.toInt
          require(rate % factor == 0,
            s"factor $factor does not divide sample rate $rate")
          val data = in.readAllBytes()
          val n = (data.length + factor - 1) / factor
          val kept = new Array[Byte](n)
          var sum = 0L
          var i = 0
          while (i < n) {
            val v = data(i * factor) & 0xff
            kept(i) = v.toByte
            sum += v
            i += 1
          }
          val outFmt = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
            (rate / factor).toFloat, 8, 1, 1, (rate / factor).toFloat,
            false)
          val baos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(kept), outFmt, n.toLong),
            javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
          Row(r.getLong(idIdx), baos.toByteArray, rate / factor,
            n.toLong, sum)
        } finally in.close()
      }
    }(enc)
  }

  /** Sample-and-hold UPSAMPLING — [[resampleAudio]]'s inverse verb:
    * decode, repeat every sample `factor` times, re-encode a genuine
    * WAV at `rate * factor` (duration preserved; zero-order hold, the
    * exact-integer upsampler — no interpolation, so any engine replays
    * the sample mapping `s'(i) = s(i / factor)`). Output matches
    * [[resampleAudio]]: (media_id, blob, sample_rate, n_samples,
    * amp_sum). Doubles as the exact-invariance fixture for
    * [[audioFingerprint]]: window boundaries scale by `factor`, so
    * every window energy exactly multiplies and every energy
    * COMPARISON is preserved.
    */
  def upsampleAudio(media: DataFrame, factor: Int): DataFrame = {
    require(factor > 0, s"bad upsampling factor $factor")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType),
      StructField("amp_sum", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      rows.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](blobIdx)))
        try {
          val fmt = in.getFormat
          requireUnsigned8BitMono(fmt)
          val rate = fmt.getSampleRate.toInt
          val data = in.readAllBytes()
          val n = data.length * factor
          val up = new Array[Byte](n)
          var sum = 0L
          var i = 0
          while (i < n) {
            val v = data(i / factor) & 0xff
            up(i) = v.toByte; sum += v
            i += 1
          }
          val outFmt = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
            (rate * factor).toFloat, 8, 1, 1, (rate * factor).toFloat,
            false)
          val baos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(up), outFmt, n.toLong),
            javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
          Row(r.getLong(idIdx), baos.toByteArray, rate * factor,
            n.toLong, sum)
        } finally in.close()
      }
    }(enc)
  }

  /** Gain attenuation: every sample maps to `64 + s / 2` (halve the
    * amplitude about the unsigned-8-bit midpoint; s is in [0, 255] so
    * the floor division is the same in every engine). Output
    * (media_id, blob) — the audio sibling of [[adjustBrightness]]:
    * window-energy ORDER survives except where the floor's half-unit
    * noise flips a near-tie, so an attenuated copy sits at (near-)zero
    * fingerprint distance.
    */
  def attenuateAudio(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      rows.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](blobIdx)))
        try {
          val fmt = in.getFormat
          requireUnsigned8BitMono(fmt)
          val data = in.readAllBytes()
          val out = new Array[Byte](data.length)
          var i = 0
          while (i < data.length) {
            out(i) = (64 + ((data(i) & 0xff) / 2)).toByte
            i += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(out), fmt, data.length.toLong),
            javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
          Row(r.getLong(idIdx), baos.toByteArray)
        } finally in.close()
      }
    }(enc)
  }

  /** Perceptual AUDIO fingerprint — the WAV sibling of [[imageDHash]]:
    * decode, split the samples into `nWindows` equal windows, compute
    * each window's energy (integer sum of squared deviations from the
    * unsigned midpoint 128), and emit one bit per ADJACENT window pair
    * — bit w set iff energy(w+1) > energy(w). The energy-difference-
    * sign recipe is the integer core of published audio fingerprints
    * (Haitsma & Kalker's "robust audio hashing" family); pure integer
    * arithmetic end to end, so any engine replays it from the sample
    * values. Output (media_id, afp) — nWindows-1 <= 63 bits packed
    * sign-safe into a long.
    *
    * `nWindows` must divide the sample count (fractional windows would
    * make the boundary arithmetic engine-dependent) — refused loudly,
    * as is empty audio (no content, no fingerprint).
    */
  def audioFingerprint(media: DataFrame, nWindows: Int = 64): DataFrame = {
    require(nWindows >= 2 && nWindows - 1 <= 63,
      s"audioFingerprint: need 2 <= nWindows <= 64 (got $nWindows)")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("afp", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      rows.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](blobIdx)))
        try {
          requireUnsigned8BitMono(in.getFormat)
          val data = in.readAllBytes()
          require(data.nonEmpty && data.length % nWindows == 0,
            s"audioFingerprint: $nWindows windows do not divide " +
              s"${data.length} samples")
          val win = data.length / nWindows
          val e = new Array[Long](nWindows)
          var i = 0
          while (i < data.length) {
            val d = (data(i) & 0xff) - 128
            e(i / win) += d.toLong * d
            i += 1
          }
          var fp = 0L
          var w = 0
          while (w < nWindows - 1) {
            if (e(w + 1) > e(w)) fp |= 1L << w
            w += 1
          }
          Row(r.getLong(idIdx), fp)
        } finally in.close()
      }
    }(enc)
  }

  /** Perceptual VIDEO fingerprint: parse the AVI, dHash every frame
    * ([[imageDHash]]'s grid + comparison layout, straight off the raw
    * bottom-up DIB rows — no ImageIO in the loop), and emit the hash
    * SEQUENCE. Output (media_id, n_frames, fhashes array<long>) — the
    * aligned per-frame form [[graft.operators.Dedup.videoNearDup]]
    * blocks and verifies on.
    */
  def videoFingerprint(media: DataFrame, gridW: Int = 8, gridH: Int = 8)
  : DataFrame = {
    require(gridW >= 2 && gridH >= 1 && (gridW - 1) * gridH <= 63,
      s"videoFingerprint: need 2 <= gridW, (gridW-1)*gridH <= 63 " +
        s"(got ${gridW}x$gridH)")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_frames", IntegerType),
      StructField("fhashes", ArrayType(LongType, containsNull = false))))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, frames) = parseAvi(r.getAs[Array[Byte]](blobIdx))
        val rowBytes = ((w * 3 + 3) / 4) * 4
        val hashes = frames.map { data =>
          val g = new Array[Int](gridW * gridH)
          var gy = 0
          while (gy < gridH) {
            val sy = (gy.toLong * h / gridH).toInt
            val off = (h - 1 - sy) * rowBytes // DIB rows bottom-up
            var gx = 0
            while (gx < gridW) {
              val o = off + ((gx.toLong * w / gridW).toInt) * 3
              g(gy * gridW + gx) =
                ((data(o) & 0xff) + (data(o + 1) & 0xff) +
                  (data(o + 2) & 0xff)) / 3
              gx += 1
            }
            gy += 1
          }
          var hash = 0L
          var r2 = 0
          while (r2 < gridH) {
            var c = 0
            while (c < gridW - 1) {
              if (g(r2 * gridW + c + 1) > g(r2 * gridW + c))
                hash |= 1L << (r2 * (gridW - 1) + c)
              c += 1
            }
            r2 += 1
          }
          hash
        }
        Row(r.getLong(idIdx), frames.length, hashes.toSeq)
      }
    }(enc)
  }

  /** REAL video frame RESIZE — completes the resize verb across all
    * three modalities ([[resizeImages]], [[resampleAudio]]): parse the
    * uncompressed AVI, nearest-neighbor-resample every frame's raw
    * bottom-up BGR pixels with the same integer-exact mapping as
    * [[resizeImages]] (`src = (dst * srcDim) / dstDim`, floor), and
    * re-encode a genuine AVI via [[aviContainerBytes]]. Output
    * (media_id, blob, width, height, n_frames, rgb_sum): the blob is
    * a real container ([[parseAvi]] round-trips it in the spec),
    * `rgb_sum` the integer channel sum over ALL resized frames — the
    * oracle recomputes it from the frame pixel formula through the
    * same floor arithmetic.
    */
  def resizeVideo(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, s"bad target size ${outW}x$outH")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("rgb_sum", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      rows.map { r =>
        val (sw, sh, frames) = parseAvi(r.getAs[Array[Byte]](blobIdx))
        val srcRow = ((sw * 3 + 3) / 4) * 4
        val dstRow = ((outW * 3 + 3) / 4) * 4
        var sum = 0L
        val outFrames = frames.map { data =>
          val fr = new Array[Byte](dstRow * outH)
          var y = 0
          while (y < outH) {
            val sy = (y.toLong * sh / outH).toInt
            // both layouts store rows bottom-up
            val srcOff = (sh - 1 - sy) * srcRow
            val dstOff = (outH - 1 - y) * dstRow
            var x = 0
            while (x < outW) {
              val so = srcOff + ((x.toLong * sw / outW).toInt) * 3
              val dO = dstOff + x * 3
              fr(dO) = data(so); fr(dO + 1) = data(so + 1)
              fr(dO + 2) = data(so + 2)
              sum += (data(so) & 0xff) + (data(so + 1) & 0xff) +
                (data(so + 2) & 0xff)
              x += 1
            }
            y += 1
          }
          fr
        }
        Row(r.getLong(idIdx), aviContainerBytes(outW, outH, outFrames),
          outW, outH, frames.length, sum)
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
  /** Genuine RIFF/AVI container around ALREADY-BUILT 'DIB ' frame
    * byte arrays (bottom-up BGR rows, 4-byte-aligned — each must be
    * exactly rowBytes(w)·h long). [[aviBytes]] builds formula frames
    * and delegates here; [[resizeVideo]] re-encodes transformed ones.
    */
  def aviContainerBytes(w: Int, h: Int, frames: Array[Array[Byte]],
                        fps: Int = 10): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val frameBytes = rowBytes * h
    frames.foreach(fr => require(fr.length == frameBytes,
      s"frame byte length ${fr.length} != $frameBytes for ${w}x$h"))
    val nFrames = frames.length
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
      b.put(frames(f))
      if (framePad == 1) b.put(0.toByte)
      f += 1
    }
    b.array()
  }

  def aviBytes(id: Long, w: Int, h: Int, nFrames: Int, fps: Int = 10,
               textured: Boolean = false): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val md = if (textured)
      java.security.MessageDigest.getInstance("MD5") else null
    val frames = Array.tabulate(nFrames) { f =>
      val fr = new Array[Byte](rowBytes * h)
      var y = h - 1 // DIB rows bottom-up
      var o = 0
      while (y >= 0) {
        var x = 0
        while (x < w) {
          // textured = md5 pixels (first byte of md5("{id}-{f}-{x}-{y}"))
          // — the perceptual-fixture variant, see bmpBytes
          val v =
            if (textured)
              (md.digest(s"$id-$f-$x-$y".getBytes(
                java.nio.charset.StandardCharsets.US_ASCII))(0) & 0xff).toByte
            else
              (((id * 31 + f * 19 + x * 7 + y * 13) % 256 + 256) % 256).toByte
          fr(o) = v; fr(o + 1) = v; fr(o + 2) = v
          o += 3; x += 1
        }
        o += rowBytes - w * 3 // row padding stays zero
        y -= 1
      }
      fr
    }
    aviContainerBytes(w, h, frames, fps)
  }

  /** (media_id, blob) rows of real AVI video, one per id. */
  def synthesizeAvi(df: DataFrame, idCol: String, w: Int = 8, h: Int = 8,
                    nFrames: Int = 4, textured: Boolean = false): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, aviBytes(id, w, h, nFrames, textured = textured))
      }
    }(enc)
  }

  /** Parsed uncompressed AVI: (width, height, frames as raw DIB rows).
    * A real chunk walk — fourcc/size headers, even-byte padding,
    * nested LISTs — not an offset assumption; rejects compressed
    * streams (biCompression != 0).
    */
  def parseAvi(bytes: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
    val (w, h, fs) = parseAviSampled(bytes, 1)
    (w, h, fs.map(_._2))
  }

  /** [[parseAvi]] with stride-aware payload extraction: every chunk
    * HEADER is still walked (that is how frame boundaries are found),
    * but only every `stride`-th frame's payload is COPIED out —
    * skipped frames cost 8 header bytes, not a frameBytes arraycopy.
    * Returns (width, height, (frame_no, payload) for sampled frames).
    * The sampling callers ([[sampleAviFrames]], [[decodeVideoFrames]])
    * go through this so the per-frame payload copy — the cost that
    * dominates on real video — drops by the stride factor too.
    */
  def parseAviSampled(bytes: Array[Byte],
                      stride: Int): (Int, Int, Array[(Int, Array[Byte])]) = {
    require(stride >= 1, "parseAviSampled: stride must be >= 1")
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
    var frameNo = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
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
          if (frameNo % stride == 0) {
            val data = new Array[Byte](sz)
            b.position(start); b.get(data)
            frames += ((frameNo, data))
          }
          frameNo += 1
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
    * every stride-th frame (0, stride, 2·stride, …) is decoded — via
    * [[parseAviSampled]], so skipped frames cost a chunk-header read
    * only: neither their payload copy nor their pixel pass happens,
    * and both costs (the ones that dominate on real video) drop by
    * the stride factor.
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
        val (w, h, frames) =
          parseAviSampled(r.getAs[Array[Byte]](blobIdx), stride)
        val rowBytes = ((w * 3 + 3) / 4) * 4
        frames.iterator.map { case (f, data) =>
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

  /** Frame SAMPLING on the real container: walk the AVI chunk tree and
    * emit every `stride`-th frame's raw DIB bytes as a standalone
    * frame blob — (media_id, frame_no, frame_blob). The explode shape
    * (one media row → N frame rows) is the multimodal-pipeline
    * contract; a compressed-codec impl would seek keyframes here
    * instead of slicing '00db' chunks. The container walk touches
    * every chunk header (that is how frame boundaries are found), but
    * skipped frames are never copied out — on real video the per-frame
    * payload copy is the cost that matters.
    */
  def sampleAviFrames(media: DataFrame, stride: Int = 1): DataFrame = {
    require(stride >= 1, s"sampleAviFrames: stride must be >= 1")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_no", IntegerType),
      StructField("frame_blob", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val (_, _, frames) =
          parseAviSampled(r.getAs[Array[Byte]](blobIdx), stride)
        frames.iterator.map { case (f, data) => Row(id, f, data) }
      }
    }(enc)
  }

  /** Cheap per-frame summary of sampled frame blobs — (media_id,
    * frame_no, frame_bytes, mean_byte): size plus mean unsigned byte
    * value, the shape-and-content check a sampling stage logs without
    * a full decode. Same mapPartitions batch discipline.
    */
  def frameBlobStats(frames: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_no", IntegerType),
      StructField("frame_bytes", LongType),
      StructField("mean_byte", DoubleType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = frames.schema.fieldIndex("media_id")
    val fIdx = frames.schema.fieldIndex("frame_no")
    val blobIdx = frames.schema.fieldIndex("frame_blob")
    frames.mapPartitions { rows =>
      rows.map { r =>
        val data = r.getAs[Array[Byte]](blobIdx)
        var sum = 0L
        var i = 0
        while (i < data.length) { sum += (data(i) & 0xff); i += 1 }
        Row(r.getLong(idIdx), r.getInt(fIdx), data.length.toLong,
          if (data.isEmpty) 0.0 else sum.toDouble / data.length)
      }
    }(enc)
  }
}
