package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}
import graft.functions.TextAnalysis

class QualityClassifierSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("separable data with wildly different feature scales fits to 100%") {
    // class by x1 (range ~1000s) with x2 pure noise (range ~1):
    // without standardization GD at lr=1 would diverge on x1's scale
    val rows = (0 until 200).map { i =>
      val x1 = if (i % 2 == 0) 5000.0 + i else 1000.0 + i
      val x2 = (i % 7) / 7.0
      (i.toLong, x1, x2, if (i % 2 == 0) 1 else 0)
    }
    val df = rows.toDF("id", "x1", "x2", "label")
    val m = QualityClassifier.fit(df, Seq("x1", "x2"), "label",
      iters = 100, lr = 1.0)
    val wrong = df.filter(m.predict =!= col("label")).count()
    assert(wrong == 0)
    assert(m.weights.forall(w => !w.isNaN && !w.isInfinite))
  }

  test("probabilities are monotone in the separating feature") {
    val rows = (0 until 100).map { i =>
      (i.toLong, i.toDouble, if (i >= 50) 1 else 0)
    }
    val df = rows.toDF("id", "x", "label")
    val m = QualityClassifier.fit(df, Seq("x"), "label", iters = 200)
    val probs = df.select(col("id"), m.prob.as("p"))
      .orderBy("id").as[(Long, Double)].collect().map(_._2)
    assert(probs.zip(probs.tail).forall { case (a, b) => a <= b })
    assert(probs.head < 0.5 && probs.last > 0.5)
  }

  test("constant feature neither NaNs nor changes the fit") {
    val rows = (0 until 100).map { i =>
      (i.toLong, i.toDouble, 3.0, if (i >= 50) 1 else 0)
    }
    val df = rows.toDF("id", "x", "c", "label")
    val m = QualityClassifier.fit(df, Seq("x", "c"), "label", iters = 100)
    assert(m.weights.forall(w => !w.isNaN && !w.isInfinite))
    assert(df.filter(m.predict =!= col("label")).count() == 0)
  }

  test("IRLS reaches the same decisions as GD in a fraction of the scans") {
    // margin-separated classes (x1 >= 200 vs x1 <= -1): on separable
    // data both optimizers must reach zero training error, so their
    // hard decisions coincide even though the weights differ
    val rows = (0 until 200).map { i =>
      val x1 = if (i % 2 == 0) 200.0 + i else -200.0 + i
      val x2 = (i % 11) / 11.0
      (i.toLong, x1, x2, if (i % 2 == 0) 1 else 0)
    }
    val df = rows.toDF("id", "x1", "x2", "label")
    val gd = QualityClassifier.fit(df, Seq("x1", "x2"), "label",
      iters = 200, lr = 1.0)
    val nt = QualityClassifier.fitIrls(df, Seq("x1", "x2"), "label",
      iters = 8)
    assert(df.filter(gd.predict =!= nt.predict).count() == 0)
    assert(df.filter(nt.predict =!= col("label")).count() == 0)
  }

  test("margin-separated rule labels on the real corpus fit to 100% (the qc1 recipe)") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val feats = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("double").as("tc"),
      (length(col("text")).cast("double") /
        (TextAnalysis.tokenCount(col("text")) + lit(1)).cast("double"))
        .as("awl"))
    val labeled = feats.filter(col("tc") < 56 || col("tc") > 64)
      .withColumn("label", (col("tc") >= 60).cast("int"))
    val counts = labeled.groupBy("label").count()
      .as[(Int, Long)].collect().toMap
    assert(counts.getOrElse(0, 0L) > 0 && counts.getOrElse(1, 0L) > 0,
      s"degenerate corpus labels: $counts")
    val m = QualityClassifier.fitIrls(labeled, Seq("tc", "awl"), "label",
      iters = 8)
    assert(labeled.filter(m.predict =!= col("label")).count() == 0)
  }
}
