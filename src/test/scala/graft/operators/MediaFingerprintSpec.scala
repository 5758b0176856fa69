package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Audio/video perceptual fingerprints + their hamming near-dup ops:
  * every expected value is recomputed independently from the textured
  * md5 synthesis formulas — the replay the mmdd3/mmdd4 gate oracles
  * perform in SQL.
  */
class MediaFingerprintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5b(s: String): Int =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("US-ASCII"))(0) & 0xff

  private def ids(n: Int) = (0L until n.toLong).toDF("id")

  private def wavs(n: Int) =
    Multimodal.synthesizeWav(ids(n), "id", textured = true)

  private def avis(n: Int) =
    Multimodal.synthesizeAvi(ids(n), "id", w = 16, h = 16, nFrames = 4,
      textured = true)

  private def afpOf(sample: Int => Int, n: Int, nW: Int = 64): Long = {
    val win = n / nW
    val e = Array.tabulate(nW)(w =>
      (0 until win).map { j =>
        val d = sample(w * win + j) - 128; d.toLong * d
      }.sum)
    (0 until nW - 1).foldLeft(0L)((fp, w) =>
      if (e(w + 1) > e(w)) fp | (1L << w) else fp)
  }

  test("audioFingerprint: engine = window-energy formula replay; " +
    "non-dividing window count refuses") {
    val got = Multimodal.audioFingerprint(wavs(12))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- 0L until 12L)
      assert(got(id) == afpOf(i => md5b(s"$id-$i"), 256), s"id $id")
    intercept[Exception] {
      Multimodal.audioFingerprint(wavs(1), nWindows = 63).collect()
    }
  }

  test("upsample preserves the fingerprint exactly; attenuation " +
    "replays through the halved formula") {
    val base = wavs(10)
    val ref = Multimodal.audioFingerprint(base)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val up = Multimodal.audioFingerprint(
      Multimodal.upsampleAudio(base, 2).select("media_id", "blob"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(up == ref) // window energies all exactly double
    val quiet = Multimodal.audioFingerprint(
      Multimodal.attenuateAudio(base).select("media_id", "blob"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- 0L until 10L)
      assert(quiet(id) ==
        afpOf(i => 64 + md5b(s"$id-$i") / 2, 256), s"id $id")
  }

  test("audioNearDup end-to-end: upsampled/attenuated clones found, " +
    "unrelated tracks not matched") {
    val base = wavs(20)
    val up = Multimodal.upsampleAudio(
        base.filter(col("media_id") % 2 === 0), 2)
      .select((col("media_id") + 1000).as("media_id"), col("blob"))
    val quiet = Multimodal.attenuateAudio(
        base.filter(col("media_id") % 2 === 1))
      .select((col("media_id") + 2000).as("media_id"), col("blob"))
    val pairs = Dedup.audioNearDup(
        base.unionByName(up).unionByName(quiet))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val got = pairs.map(p => (p._1, p._2)).toSet
    for (id <- 0L until 20L if id % 2 == 0)
      assert(got.contains((id, id + 1000)), s"missing upsample clone $id")
    for (id <- 0L until 20L if id % 2 == 1) {
      val h = pairs.collect { case (a, b, hh) if a == id && b == id + 2000 => hh }
      assert(h.nonEmpty && h.head <= 3, s"missing attenuated clone $id")
    }
    assert(!pairs.exists(p => p._1 < 20 && p._2 < 20))
  }

  test("videoFingerprint: engine per-frame dHash = formula replay " +
    "off the real 16x16 container") {
    val got = Multimodal.videoFingerprint(avis(8))
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Long](2).toList))
      .toMap
    def frameHash(id: Long, f: Int): Long = {
      // 8x8 grid over the 16x16 frame: src = (g*16)/8 = 2g
      def g(gx: Int, gy: Int) = md5b(s"$id-$f-${2 * gx}-${2 * gy}")
      var h = 0L
      for (gy <- 0 until 8; gx <- 0 until 7)
        if (g(gx + 1, gy) > g(gx, gy)) h |= 1L << (gy * 7 + gx)
      h
    }
    for (id <- 0L until 8L) {
      assert(got(id)._1 == 4)
      assert(got(id)._2 == (0 until 4).map(frameHash(id, _)).toList,
        s"id $id")
    }
  }

  test("videoNearDup: NN-downsized clones match at max_ham 0; " +
    "unrelated videos do not") {
    val base = avis(12)
    val shrunk = Multimodal.resizeVideo(
        base.filter(col("media_id") % 2 === 0), 8, 8)
      .select((col("media_id") + 1000).as("media_id"), col("blob"))
    val pairs = Dedup.videoNearDup(base.unionByName(shrunk))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    for (id <- 0L until 12L if id % 2 == 0)
      assert(pairs.contains((id, id + 1000, 0)), s"missing clone $id")
    assert(!pairs.exists(p => p._1 < 12 && p._2 < 12))
  }
}
