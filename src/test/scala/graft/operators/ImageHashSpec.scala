package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Perceptual image hashing (dHash/aHash) + hamming-banded image
  * near-dup: the engine hashes REAL decoded BMP bytes; every expected
  * value here is recomputed independently from the textured pixel
  * formula (first md5 byte of "{id}-{x}-{y}") — the same replay the
  * mmdd gates' DuckDB oracles perform.
  */
class ImageHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("id")

  private def base(n: Int) =
    Multimodal.synthesizeBmp(ids(n), "id", 8, 8, textured = true)

  // the synthesis formula, replicated independently of the engine
  private def tg(id: Long, x: Int, y: Int): Int =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id-$x-$y".getBytes("US-ASCII"))(0) & 0xff

  private def dhashOf(g: (Int, Int) => Int): Long = {
    var h = 0L
    for (gy <- 0 until 8; gx <- 0 until 7)
      if (g(gx + 1, gy) > g(gx, gy)) h |= 1L << (gy * 7 + gx)
    h
  }

  test("imageDHash: engine hash of real decoded bytes = formula replay") {
    val got = Multimodal.imageDHash(base(16))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- 0L until 16L)
      assert(got(id) == dhashOf((x, y) => tg(id, x, y)), s"id $id")
    // unrelated textured images sit far apart — the property that
    // makes a 3-bit radius a NEAR-dup key, not a match-everything key
    val hams = for (a <- 0L until 16L; b <- (a + 1) until 16L)
      yield java.lang.Long.bitCount(got(a) ^ got(b))
    assert(hams.min > 3, s"min unrelated ham ${hams.min}")
  }

  test("imageDHash: invariant under NN 2x upscale and +1 brightness " +
    "(saturation-free cells); grid bounds refuse") {
    val b = base(12)
    val href = Multimodal.imageDHash(b)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val up = Multimodal.imageDHash(
      Multimodal.resizeImages(b, 16, 16).select("media_id", "blob"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(up == href)
    // +1 clamp-add: expected hash replayed through min(v+1, 255)
    val b1 = Multimodal.imageDHash(Multimodal.adjustBrightness(b, 1))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- 0L until 12L)
      assert(b1(id) ==
        dhashOf((x, y) => math.min(tg(id, x, y) + 1, 255)), s"id $id")
    intercept[IllegalArgumentException] {
      Multimodal.imageDHash(b, gridW = 9, gridH = 8) // 64 bits: sign slot
    }
  }

  test("imageAHash: engine = mean-comparison formula; NOT brightness-" +
    "invariant at saturation") {
    val got = Multimodal.imageAHash(base(12)) // 9x7 grid, floor-NN of 8x8
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ahashOf(id: Long, shift: Int): Long = {
      val g = for (gy <- 0 until 7; gx <- 0 until 9)
        yield math.min(tg(id, gx * 8 / 9, gy * 8 / 7) + shift, 255)
      val s = g.map(_.toLong).sum
      g.zipWithIndex.foldLeft(0L) { case (h, (v, i)) =>
        if (63L * v > s) h | (1L << i) else h
      }
    }
    for (id <- 0L until 12L) assert(got(id) == ahashOf(id, 0), s"id $id")
    val b40 = Multimodal.imageAHash(
      Multimodal.adjustBrightness(base(12), 40))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- 0L until 12L) assert(b40(id) == ahashOf(id, 40), s"id $id")
    assert((0L until 12L).exists(id => b40(id) != got(id)))
    intercept[IllegalArgumentException] {
      Multimodal.imageAHash(base(1), gridW = 8, gridH = 8)
    }
  }

  test("adjustBrightness: clamps at both ends, re-decodes as real BMP") {
    val out = Multimodal.adjustBrightness(base(4), 200)
    val decoded = Multimodal.decodeImageFeatures(out)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    for (id <- 0L until 4L) {
      val exp = (for (y <- 0 until 8; x <- 0 until 8)
        yield math.min(tg(id, x, y) + 200, 255)).sum / 64.0
      assert(math.abs(decoded(id) - exp) < 1e-9, s"id $id")
    }
    val down = Multimodal.adjustBrightness(base(4), -200)
    val dec2 = Multimodal.decodeImageFeatures(down)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    for (id <- 0L until 4L) {
      val exp = (for (y <- 0 until 8; x <- 0 until 8)
        yield math.max(tg(id, x, y) - 200, 0)).sum / 64.0
      assert(math.abs(dec2(id) - exp) < 1e-9, s"id $id")
    }
    intercept[IllegalArgumentException] {
      Multimodal.adjustBrightness(base(1), 256)
    }
  }

  test("hammingNearDup: banded output = brute-force hamming ball " +
    "(pigeonhole recall), bucket cap trades recall loudly") {
    // 48-bit signatures with planted neighbors at ham 0..4
    val sigs = Seq(
      (1L, 0x0000F0F0F0F0L), (2L, 0x0000F0F0F0F0L),     // ham 0
      (3L, 0x0000F0F0F0F1L),                            // ham 1 to 1,2
      (4L, 0x0000F0F0F0FFL),                            // ham 3 to 3
      (5L, 0x0000F0F0FFFFL),                            // far from 1-4
      (6L, 0x0000A5A5A5A5L), (7L, 0x0000A5A5A5B5L))     // ham 2 pair
      .toDF("id", "sig")
    val got = Dedup.hammingNearDup(sigs, "id", "sig",
        sigBits = 48, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val all = sigs.collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, sa) <- all; (b, sb) <- all if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(got == brute)
    assert(brute.contains((1L, 2L, 0)) && brute.contains((6L, 7L, 1)))
    // radius beyond bands - 1 refuses (recall would silently drop)
    intercept[IllegalArgumentException] {
      Dedup.hammingNearDup(sigs, "id", "sig", 48, 4, 4)
    }
  }

  test("imageNearDup end-to-end: planted upscale/brightness clones " +
    "found at ham<=3; inverted copies and unrelated images not matched") {
    val b = base(24)
    val clones = Multimodal.resizeImages(b.filter(col("media_id") % 3 === 0),
        16, 16)
      .select((col("media_id") + 1000).as("media_id"), col("blob"))
    val bright = Multimodal.adjustBrightness(
      b.filter(col("media_id") % 3 === 1), 1)
      .select((col("media_id") + 2000).as("media_id"), col("blob"))
    val inverted = Multimodal.invertImage(
      b.filter(col("media_id") % 3 === 2))
      .select((col("media_id") + 3000).as("media_id"), col("blob"))
    val pairs = Dedup.imageNearDup(
        b.unionByName(clones).unionByName(bright).unionByName(inverted))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val got = pairs.map(p => (p._1, p._2)).toSet
    // every planted clone pairs with its source
    for (id <- 0L until 24L if id % 3 == 0)
      assert(got.contains((id, id + 1000)), s"missing upscale clone $id")
    for (id <- 0L until 24L if id % 3 == 1) {
      val ham = pairs.collect { case (a, bb, h) if a == id && bb == id + 2000 => h }
      assert(ham.nonEmpty && ham.head <= 3, s"missing brightness clone $id")
    }
    // inversion reverses every strict comparison — far outside radius
    assert(!pairs.exists(p => p._2 >= 3000), pairs.mkString(","))
    // no unrelated base-base matches (md5-textured ids are far apart)
    assert(!pairs.exists(p => p._1 < 24 && p._2 < 24))
  }

  test("perceptualDedupAgainstRegistry: first batch registers, later " +
    "batches match it; committed re-run emits nothing") {
    val reg = java.nio.file.Files
      .createTempDirectory("graft-phash-reg").toString
    val b = base(16)
    // batch 1: even ids — empty matches, all register
    val m1 = Dedup.perceptualDedupAgainstRegistry(
      b.filter(col("media_id") % 2 === 0), "media_id", reg)
    assert(m1.count() == 0)
    // batch 2: odd bases (clean) + brightness clones of even ids
    val clones = Multimodal.adjustBrightness(
        b.filter(col("media_id") % 2 === 0), 1)
      .select((col("media_id") + 500).as("media_id"), col("blob"))
    val m2 = Dedup.perceptualDedupAgainstRegistry(
        b.filter(col("media_id") % 2 === 1).unionByName(clones),
        "media_id", reg)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    for (id <- 0L until 16L if id % 2 == 0)
      assert(m2.exists(p => p._1 == id + 500 && p._2 == id && p._3 <= 3),
        s"clone of $id missed the registry")
    assert(!m2.exists(p => p._1 % 2 == 1 && p._1 < 16)) // odd bases clean
    // committed re-run: every id already registered -> nothing probes
    val m3 = Dedup.perceptualDedupAgainstRegistry(
      b.filter(col("media_id") % 2 === 1), "media_id", reg)
    assert(m3.count() == 0)
    // clean odd rows DID register: a fresh near-identical copy matches
    val m4 = Dedup.perceptualDedupAgainstRegistry(
        Multimodal.adjustBrightness(b.filter(col("media_id") === 1), 1)
          .select((col("media_id") + 900).as("media_id"), col("blob")),
        "media_id", reg)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(m4.contains((901L, 1L)), m4.mkString(","))
  }

  test("perceptual exactly-once delivery: matches survive every crash " +
    "window (the nearDupAgainstRegistryTo contract)") {
    val work = java.nio.file.Files
      .createTempDirectory("graft-phash-eo").toString
    val reg = s"$work/registry"
    val b = base(8)
    // batch 0: registry empty — delivery commits an EMPTY match set
    Dedup.perceptualDedupAgainstRegistryTo(
      b.filter(col("media_id") === 0), "media_id", reg,
      s"$work/out/batch-0")
    assert(new java.io.File(s"$work/out/batch-0/_SUCCESS").exists)
    assert(spark.read.parquet(s"$work/out/batch-0").count() == 0)
    // batch 1: a brightness clone of image 0 — delivered AND returned
    val b1 = Multimodal.adjustBrightness(
        b.filter(col("media_id") === 0), 1)
      .select((col("media_id") + 100).as("media_id"), col("blob"))
    val r1 = Dedup.perceptualDedupAgainstRegistryTo(
      b1, "media_id", reg, s"$work/out/batch-1")
    assert(r1.count() == 1)
    def d1() = spark.read.parquet(s"$work/out/batch-1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(d1() == Seq((100L, 0L)))
    // the plain variant's at-most-once window: replaying batch 1 after
    // its registration committed produces an empty match set — the
    // committed delivery must NOT be clobbered by it
    Dedup.perceptualDedupAgainstRegistryTo(
      b1, "media_id", reg, s"$work/out/batch-1")
    assert(d1() == Seq((100L, 0L)))
    // crash mid-delivery (partial dir, no _SUCCESS): replay overwrites
    // (another +1 clone of image 0 — batch 1's MATCHED rows never
    // registered, so this one still resolves against image 0 alone)
    val b2 = Multimodal.adjustBrightness(
        b.filter(col("media_id") === 0), 1)
      .select((col("media_id") + 200).as("media_id"), col("blob"))
    new java.io.File(s"$work/out/batch-2").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$work/out/batch-2/part-corrupt.parquet"),
      Array[Byte](1, 2, 3))
    Dedup.perceptualDedupAgainstRegistryTo(
      b2, "media_id", reg, s"$work/out/batch-2")
    assert(spark.read.parquet(s"$work/out/batch-2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((200L, 0L)))
  }
}
