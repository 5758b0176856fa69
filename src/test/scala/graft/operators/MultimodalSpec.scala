package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def media = Multimodal.synthesizeRealMedia(
    Tables.load(spark, TestSpark.sfDir, "documents"), "doc_id")

  test("synthesized media: real containers, typed metadata, real sizes") {
    val m = media
    assert(m.schema("blob").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val kinds = m.select("meta.kind").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    assert(m.filter(col("meta.kind") === "image")
      .select("meta.duration_ms").head().getLong(0) == -1L)
    // blob sizes are the containers' real header arithmetic
    val sizes = m.select(col("meta.kind"),
        octet_length(col("blob")).as("n"))
      .distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(sizes == Map("image" -> 246, "audio" -> 300, "video" -> 1024))
  }

  test("feature extraction: real per-kind decode, pooled to the formulas") {
    val f1 = Multimodal.extractFeatures(media, dims = 8)
    assert(f1.schema.fieldNames.toSeq == Seq("media_id", "kind", "features"))
    val byId = f1.filter(col("media_id") < 3).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getSeq[Double](2))).toMap
    assert(byId.values.forall(_._2.size == 8))
    // bucket-mean replay of each synthesis formula, per kind
    def pooled(values: Seq[Int]): Seq[Double] =
      (0 until 8).map { d =>
        val vs = values.zipWithIndex.collect { case (v, i) if i % 8 == d => v }
        vs.sum.toDouble / vs.size / 255.0
      }
    val imgExp = pooled(for (y <- 0 until 8; x <- 0 until 8)
      yield ((0 * 31 + x * 7 + y * 13) % 256))
    val audExp = pooled((0 until 256).map(i => ((1 * 17 + i * 11) % 256)))
    val vidExp = pooled(for (f <- 0 until 4; y <- 0 until 8; x <- 0 until 8)
      yield ((2 * 31 + f * 19 + x * 7 + y * 13) % 256))
    assert(byId(0L)._1 == "image" && byId(0L)._2 == imgExp)
    assert(byId(1L)._1 == "audio" && byId(1L)._2 == audExp)
    assert(byId(2L)._1 == "video" && byId(2L)._2 == vidExp)
    // determinism across evaluations
    val again = Multimodal.extractFeatures(media, dims = 8)
      .filter(col("media_id") < 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert((0L to 2L).forall(id => again(id) == byId(id)._2))
  }

  test("container frame sampling: every stride-th DIB chunk, bytes intact") {
    import spark.implicits._
    val vids = Multimodal.synthesizeAvi(
      Seq(4L, 9L).toDF("doc_id"), "doc_id", nFrames = 6)
    val frames = Multimodal.sampleAviFrames(vids, stride = 3)
    assert(frames.columns.toSeq == Seq("media_id", "frame_no", "frame_blob"))
    val got = frames.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getAs[Array[Byte]](2)).toMap
    assert(got.keySet == Set((4L, 0), (4L, 3), (9L, 0), (9L, 3)))
    assert(got.values.forall(_.length == 192))
    // sampled bytes are the frame's raw DIB: spot-check pixel (1, 2)
    // of frame 3, id 9 — stored row s = 8-1-2 (bottom-up)
    val v = got((9L, 3))((8 - 1 - 2) * 24 + 1 * 3) & 0xff
    assert(v == ((9 * 31 + 3 * 19 + 1 * 7 + 2 * 13) % 256))
    // frameBlobStats: size + mean byte equal the pixel formula
    val stats = Multimodal.frameBlobStats(frames).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val expMean = (for (x <- 0 until 8; y <- 0 until 8)
      yield ((9 * 31 + 3 * 19 + x * 7 + y * 13) % 256).toDouble).sum / 64.0
    assert(stats((9L, 3))._1 == 192L)
    assert(math.abs(stats((9L, 3))._2 - expMean) < 1e-12)
  }

  test("real WAV round trip: AudioSystem decodes synthesized PCM to the sample formula") {
    import spark.implicits._
    val ids = Seq(0L, 5L, 99L).toDF("doc_id")
    val decoded = Multimodal.decodeAudioFeatures(
      Multimodal.synthesizeWav(ids, "doc_id"))
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toMap
    def expectedMean(id: Long): Double =
      (0 until 256).map(i => ((id * 17 + i * 11) % 256).toDouble).sum / 256.0
    Seq(0L, 5L, 99L).foreach { id =>
      val (rate, n, m) = decoded(id)
      assert(rate == 8000 && n == 256L)
      assert(math.abs(m - expectedMean(id)) < 1e-9, s"id $id")
    }
  }

  test("real AVI round trip: container parse decodes synthesized frames to the pixel formula") {
    import spark.implicits._
    val ids = Seq(0L, 7L, 123L).toDF("doc_id")
    val decoded = Multimodal.decodeVideoFrames(
      Multimodal.synthesizeAvi(ids, "doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getInt(3), r.getDouble(4)))
      .toMap
    assert(decoded.size == 3 * 4) // 4 frames per video
    def expectedMean(id: Long, f: Int): Double =
      (for (x <- 0 until 8; y <- 0 until 8)
        yield ((id * 31 + f * 19 + x * 7 + y * 13) % 256).toDouble).sum / 64.0
    for (id <- Seq(0L, 7L, 123L); f <- 0 until 4) {
      val (w, h, m) = decoded((id, f))
      assert(w == 8 && h == 8)
      assert(math.abs(m - expectedMean(id, f)) < 1e-9, s"id $id frame $f")
    }
  }

  test("strided decode = full decode filtered to every stride-th frame") {
    import spark.implicits._
    val ids = Seq(0L, 9L).toDF("doc_id")
    val media = Multimodal.synthesizeAvi(ids, "doc_id", nFrames = 6)
    val full = Multimodal.decodeVideoFrames(media)
      .filter(org.apache.spark.sql.functions.col("frame_no") % 3 === 0)
      .orderBy("media_id", "frame_no").collect().toSeq
    val strided = Multimodal.decodeVideoFrames(media, stride = 3)
      .orderBy("media_id", "frame_no").collect().toSeq
    assert(strided == full)
    assert(strided.size == 2 * 2) // frames 0 and 3 of 6, per video
  }

  test("AVI parser: non-4-aligned width padding, odd-size chunk padding, rejects compressed") {
    // w=5: rowBytes 15 -> padded to 16; exercises row alignment
    val bytes = Multimodal.aviBytes(3L, 5, 3, 2)
    val (w, h, frames) = Multimodal.parseAvi(bytes)
    assert(w == 5 && h == 3 && frames.length == 2)
    assert(frames(0).length == 16 * 3)
    // bottom-up: stored row 0 is y = h-1; pixel (x=1, y=2) of frame 1
    val v = frames(1)(0 * 16 + 1 * 3) & 0xff
    assert(v == ((3 * 31 + 1 * 19 + 1 * 7 + 2 * 13) % 256))
    // corrupting biCompression must be rejected, not mis-decoded
    val bad = bytes.clone()
    val strfOff = {
      // locate 'strf' fourcc then biCompression at +8(hdr)+16
      val idx = bad.sliding(4).indexWhere(_.sameElements("strf".getBytes))
      idx + 8 + 16
    }
    bad(strfOff) = 1
    assertThrows[IllegalArgumentException](Multimodal.parseAvi(bad))
  }

  test("real BMP round trip: ImageIO decodes synthesized bytes to the pixel formula") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 42L).toDF("doc_id")
    val decoded = Multimodal.decodeImageFeatures(
      Multimodal.synthesizeBmp(ids, "doc_id"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3)))
      .toMap
    def expectedMean(id: Long): Double =
      (for (x <- 0 until 8; y <- 0 until 8)
        yield ((id * 31 + x * 7 + y * 13) % 256).toDouble).sum / 64.0
    Seq(0L, 1L, 42L).foreach { id =>
      val (w, h, m) = decoded(id)
      assert(w == 8 && h == 8)
      assert(math.abs(m - expectedMean(id)) < 1e-9, s"id $id")
    }
  }

  test("resizeImages: NN resample is pixel-exact, blob re-decodes, upsize duplicates") {
    import spark.implicits._
    def px(id: Long, x: Int, y: Int): Int =
      (((id * 31 + x * 7 + y * 13) % 256 + 256) % 256).toInt
    val media = Multimodal.synthesizeBmp(
      Seq(3L, 9L).toDF("id"), "id", w = 8, h = 8)
    // downsize 8x8 -> 4x4: source pixel (2x, 2y)
    val down = Multimodal.resizeImages(media, 4, 4).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]](1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toMap
    Seq(3L, 9L).foreach { id =>
      val (blob, w, h, sum) = down(id)
      assert(w == 4 && h == 4)
      val want = (for (x <- 0 until 4; y <- 0 until 4)
        yield 3L * px(id, 2 * x, 2 * y)).sum
      assert(sum === want, s"id $id rgb_sum")
      // the blob is a REAL image: decode it back and check every pixel
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(blob))
      assert(img.getWidth == 4 && img.getHeight == 4)
      for (x <- 0 until 4; y <- 0 until 4) {
        val v = px(id, 2 * x, 2 * y)
        assert((img.getRGB(x, y) & 0xff) == v, s"id $id px ($x,$y)")
      }
    }
    // upsize 8x8 -> 16x16: each source pixel duplicated 2x2
    val up = Multimodal.resizeImages(media, 16, 16).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    Seq(3L, 9L).foreach { id =>
      val want = (for (x <- 0 until 16; y <- 0 until 16)
        yield 3L * px(id, x / 2, y / 2)).sum
      assert(up(id) === want, s"id $id upsize sum")
    }
  }

  test("resampleAudio: strided decimation is sample-exact, blob re-decodes, bad factor refuses") {
    import spark.implicits._
    def amp(id: Long, i: Int): Int = (((id * 17 + i * 11) % 256 + 256) % 256).toInt
    val media = Multimodal.synthesizeWav(Seq(5L).toDF("id"), "id")
    val out = Multimodal.resampleAudio(media, factor = 4).collect().head
    assert(out.getInt(2) == 2000 && out.getLong(3) == 64L)
    val want = (0 until 64).map(i => amp(5L, 4 * i).toLong).sum
    assert(out.getLong(4) === want)
    // the blob is a REAL WAV: decode it back sample-exact
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]](1)))
    val fmt = in.getFormat
    assert(fmt.getSampleRate.toInt == 2000 && fmt.getChannels == 1)
    val data = in.readAllBytes()
    assert(data.length == 64)
    (0 until 64).foreach(i => assert((data(i) & 0xff) == amp(5L, 4 * i)))
    // a factor that does not divide the rate refuses loudly
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.resampleAudio(media, factor = 3).collect())
    assert(e.getMessage.contains("does not divide"))
  }

  test("resizeVideo: per-frame NN is pixel-exact and the container round-trips") {
    import spark.implicits._
    def px(id: Long, f: Int, x: Int, y: Int): Int =
      (((id * 31 + f * 19 + x * 7 + y * 13) % 256 + 256) % 256).toInt
    val media = Multimodal.synthesizeAvi(Seq(7L).toDF("id"), "id")
    val out = Multimodal.resizeVideo(media, 4, 4).collect().head
    assert(out.getInt(2) == 4 && out.getInt(3) == 4 && out.getInt(4) == 4)
    val want = (for (f <- 0 until 4; x <- 0 until 4; y <- 0 until 4)
      yield 3L * px(7L, f, 2 * x, 2 * y)).sum
    assert(out.getLong(5) === want)
    // the blob is a REAL AVI: parse it back and check every pixel of
    // every frame (bottom-up BGR layout preserved)
    val (w, h, frames) = Multimodal.parseAvi(out.getAs[Array[Byte]](1))
    assert(w == 4 && h == 4 && frames.length == 4)
    val rowBytes = ((4 * 3 + 3) / 4) * 4
    for (f <- 0 until 4; x <- 0 until 4; y <- 0 until 4) {
      val o = (h - 1 - y) * rowBytes + x * 3
      assert((frames(f)(o) & 0xff) == px(7L, f, 2 * x, 2 * y),
        s"frame $f px ($x,$y)")
    }
  }
}