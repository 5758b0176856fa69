package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class VocabularySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b b c c c"),
    (2L, "c d d a"),
    (3L, "e")).toDF("doc_id", "text")
  // counts: c=4, a=2, b=2, d=2, e=1

  test("build ranks by count desc then token, dense ids from 0") {
    val v = Vocabulary.build(docs, "text", 4).orderBy("token_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(v === Seq((0L, "c", 4L), (1L, "a", 2L), (2L, "b", 2L),
      (3L, "d", 2L)))
  }

  test("encodeExploded preserves order and encodes OOV as -1") {
    val v = Vocabulary.build(docs, "text", 4) // e is out of vocab
    val got = Vocabulary.encodeExploded(docs, "doc_id", "text", v)
      .orderBy("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(
      (1L, 0L, 1L), (1L, 1L, 2L), (1L, 2L, 2L), (1L, 3L, 0L),
      (1L, 4L, 0L), (1L, 5L, 0L),
      (2L, 0L, 0L), (2L, 1L, 3L), (2L, 2L, 3L), (2L, 3L, 1L),
      (3L, 0L, -1L)))
  }

  test("array encode equals exploded encode re-assembled") {
    val v = Vocabulary.build(docs, "text", 4)
    val arr = Vocabulary.encode(docs, "doc_id", "text", v)
      .orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(arr(1L) == Seq(1L, 2L, 2L, 0L, 0L, 0L))
    assert(arr(3L) == Seq(-1L))
  }

  test("BPE model save/load round-trips bit-identically; an " +
    "uncommitted save refuses to load") {
    val corpus = Seq((1L, "hug hug hugs pug pug pugs hug"),
      (2L, "bug bugs hug pug")).toDF("doc_id", "text")
    val model = Vocabulary.trainBpe(corpus, "text", numMerges = 8)
    assert(model.merges.nonEmpty)
    val path = java.nio.file.Files
      .createTempDirectory("graft-bpe-save").toString
    Vocabulary.saveBpeModel(spark, model, path)
    val loaded = Vocabulary.loadBpeModel(spark, path)
    assert(loaded.merges == model.merges)
    // encoding from the loaded model is identical
    val a = Vocabulary.bpeEncodeExploded(corpus, "doc_id", "text", model)
      .orderBy("doc_id", "pos", "piece_pos").collect().toSeq
    val b = Vocabulary.bpeEncodeExploded(corpus, "doc_id", "text", loaded)
      .orderBy("doc_id", "pos", "piece_pos").collect().toSeq
    assert(a == b && a.nonEmpty)
    // a crashed save (no _SUCCESS marker) must refuse loudly, not
    // load a possibly-partial merge table
    assert(new java.io.File(s"$path/merges/_SUCCESS").delete())
    val ex = intercept[IllegalArgumentException] {
      Vocabulary.loadBpeModel(spark, path)
    }
    assert(ex.getMessage.contains("committed"))
    // a never-saved path refuses with the same message
    val empty = java.nio.file.Files
      .createTempDirectory("graft-bpe-none").toString
    assert(intercept[IllegalArgumentException] {
      Vocabulary.loadBpeModel(spark, empty)
    }.getMessage.contains("committed"))
    // an empty model refuses to save at all
    assert(intercept[IllegalArgumentException] {
      Vocabulary.saveBpeModel(spark, Vocabulary.BpeModel(Seq.empty), path)
    }.getMessage.contains("empty"))
  }

  test("merges.txt export/import round-trips the HF spelling") {
    val corpus = Seq((1L, "hug hug hugs pug pug pugs hug"),
      (2L, "bug bugs hug pug")).toDF("doc_id", "text")
    val model = Vocabulary.trainBpe(corpus, "text", numMerges = 6)
    val file = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-hf").toFile,
      "merges.txt").toString
    Vocabulary.exportBpeMergesTxt(spark, model, file)
    val lines = scala.io.Source.fromFile(file, "UTF-8").getLines().toList
    assert(lines.head.startsWith("#version:"))
    assert(lines.tail.size == model.merges.size &&
      lines.tail.forall(_.split(" ").length == 2))
    val imported = Vocabulary.importBpeMergesTxt(spark, file)
    assert(imported.merges == model.merges)
    // malformed lines refuse loudly
    val bad = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-hf-bad").toFile,
      "merges.txt")
    java.nio.file.Files.writeString(bad.toPath, "#version: 0.2\na b c\n")
    assert(intercept[IllegalArgumentException] {
      Vocabulary.importBpeMergesTxt(spark, bad.toString)
    }.getMessage.contains("malformed"))
    // a missing file refuses
    assert(intercept[IllegalArgumentException] {
      Vocabulary.importBpeMergesTxt(spark, "/tmp/graft-nope-merges.txt")
    }.getMessage.contains("no merges file"))
  }

  test("merges whose symbols start with '#' survive the round-trip " +
      "(only the #version header is a comment)") {
    // '#tag #tag #tags' learns merges with a literal '#' left symbol —
    // HF's format treats only the leading #version line as special,
    // and dropping these would silently change the merge walk
    val corpus = Seq((1L, "#tag #tag #tag #tags #tags ##x ##x"))
      .toDF("doc_id", "text")
    val model = Vocabulary.trainBpe(corpus, "text", numMerges = 4)
    assert(model.merges.exists { case (l, _) => l.startsWith("#") })
    val file = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-hf-hash").toFile,
      "merges.txt").toString
    Vocabulary.exportBpeMergesTxt(spark, model, file)
    val imported = Vocabulary.importBpeMergesTxt(spark, file)
    assert(imported.merges == model.merges)
    // and a header-less file (some exporters omit it) reads fully
    val bare = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-hf-bare").toFile,
      "merges.txt")
    java.nio.file.Files.writeString(bare.toPath, "# t\n#t ag\n")
    assert(Vocabulary.importBpeMergesTxt(spark, bare.toString).merges
      == Seq(("#", "t"), ("#t", "ag")))
  }
}
