package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Instrumented encoders communicate through static state: the factory
  * closure serializes to executor threads (local mode shares the JVM,
  * so accumulation is visible back here).
  */
object InferenceProbe {
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  val closed = new java.util.concurrent.atomic.AtomicInteger(0)
  val loads = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { batchSizes.clear(); closed.set(0); loads.set(0) }
}

class InferenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def probeEncoder(d: Int): () => TextEncoder = () => {
    InferenceProbe.loads.incrementAndGet()
    new TextEncoder {
      override val dims: Int = d
      override def encodeBatch(texts: Array[String]): Array[Array[Float]] = {
        InferenceProbe.batchSizes.add(texts.length)
        texts.map(t => Array.tabulate(d)(i => (t.length + i).toFloat))
      }
      override def close(): Unit = { InferenceProbe.closed.incrementAndGet(); () }
    }
  }

  test("batch slicing, order, null contract, per-task load and close") {
    InferenceProbe.reset()
    val docs = (0L until 50L).map(i =>
        (i, if (i % 7 == 0) null else "x" * (i % 5 + 1).toInt))
      .toDF("id", "text").repartition(2)
    val out = Inference.embedText(docs, "id", "text",
      probeEncoder(3), batchSize = 8).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Float](1))).toMap
    assert(out.size == 50)
    for (i <- 0L until 50L) {
      if (i % 7 == 0) assert(out(i) == null, s"id $i")
      else {
        val len = (i % 5 + 1).toInt
        assert(out(i) == Seq(len.toFloat, (len + 1).toFloat,
          (len + 2).toFloat), s"id $i")
      }
    }
    // no batch exceeded batchSize; every non-null text was seen once
    val sizes = scala.jdk.CollectionConverters
      .CollectionHasAsScala(InferenceProbe.batchSizes).asScala.toSeq
    assert(sizes.nonEmpty && sizes.forall(_ <= 8), sizes)
    assert(sizes.sum == (0L until 50L).count(_ % 7 != 0))
    // one model load per task, and each was closed
    assert(InferenceProbe.loads.get() == 2, InferenceProbe.loads.get())
    assert(InferenceProbe.closed.get() == InferenceProbe.loads.get())
  }

  test("dims contract enforced loudly; bad inputs refused") {
    val docs = Seq((1L, "abc")).toDF("id", "text")
    val lying: () => TextEncoder = () => new TextEncoder {
      override val dims: Int = 4
      override def encodeBatch(ts: Array[String]): Array[Array[Float]] =
        ts.map(_ => Array(1.0f)) // wrong width
    }
    val e = intercept[org.apache.spark.SparkException] {
      Inference.embedText(docs, "id", "text", lying).collect()
    }
    assert(e.getMessage.contains("dim") ||
      Option(e.getCause).exists(_.getMessage.contains("dim")))
    intercept[IllegalArgumentException] {
      Inference.embedText(docs, "id", "text", probeEncoder(3),
        batchSize = 0)
    }
    intercept[IllegalArgumentException] {
      Inference.embedText(docs.select($"id", $"id".as("text")),
        "id", "text", probeEncoder(3))
    }
    intercept[IllegalArgumentException](Inference.hashEncoder(0))
  }

  test("hashEncoder replays the documented md5 quantization") {
    val enc = Inference.hashEncoder(4)()
    val v = enc.encodeBatch(Array("spark"))(0)
    def expected(d: Int, t: String): Float = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d:$t".getBytes("UTF-8"))
      val x = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
        ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      ((x % 2000L) / 1000.0 - 1.0).toFloat
    }
    assert(v.toSeq == (0 until 4).map(expected(_, "spark")))
    assert(v.forall(x => x >= -1.0f && x < 1.0f))
    // deterministic across calls and instances
    assert(Inference.hashEncoder(4)().encodeBatch(Array("spark"))(0)
      .toSeq == v.toSeq)
  }
}
