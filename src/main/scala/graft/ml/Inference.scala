package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Batch text-inference seam — the useful half of the reference's M4/M5
  * surface (eland/ml/pytorch/transformers.py + the
  * eland_import_hub_model CLI, eland/cli/eland_import_hub_model.py:
  * those DEPLOY a traced model INTO an ES cluster, which has no
  * equivalent in a clusterless engine; what a user actually consumes is
  * "score/embed a text column with a model", which is this seam).
  *
  * Design mirrors [[graft.operators.Multimodal.extractFeatures]]'s
  * documented native-hand-off shape:
  *
  *  - the model handle is a [[TextEncoder]] constructed PER PARTITION
  *    from a serializable factory (one model load per task, not per
  *    row — where a real deployment loads its ONNX session / traced
  *    TorchScript module; the container here has no torch, so the
  *    shipped [[Inference.hashEncoder]] stub is deterministic and
  *    oracle-replayable, which proves the batching/schema/null
  *    plumbing without the dependency),
  *  - rows feed the model in `batchSize` slices (the GPU-amortization
  *    contract: encodeBatch sees up to batchSize texts at once),
  *  - NULL texts bypass the model and embed as NULL (the es_match
  *    missing-field discipline — a curation pipeline filters them,
  *    they must not crash the batch or silently embed as ""),
  *  - the encoder's dims contract is enforced loudly per batch,
  *  - the handle is closed on task completion (TaskContext listener).
  *
  * Scale shape: embarrassingly parallel mapPartitions — no shuffle; at
  * 100 TB the only knobs are partition sizing (so a batch of texts and
  * the model fit executor memory) and batchSize.
  */
trait TextEncoder extends java.io.Closeable {
  /** Embedding width; a classifier/reward model is simply dims = 1. */
  def dims: Int
  /** Encode up to one batch of non-null texts; must return exactly
    * one `dims`-wide vector per input, in input order.
    */
  def encodeBatch(texts: Array[String]): Array[Array[Float]]
  override def close(): Unit = ()
}

object Inference {

  /** (idCol, embedding array&lt;float&gt;) for every row of `docs`:
    * the model embeds `textCol` in `batchSize` slices per partition;
    * NULL text → NULL embedding (see the seam contract above).
    */
  def embedText(docs: DataFrame, idCol: String, textCol: String,
                encoderFactory: () => TextEncoder,
                batchSize: Int = 32): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1 (got $batchSize)")
    require(idCol != "embedding",
      "idCol 'embedding' collides with the output column — rename it")
    val idType = docs.schema(idCol).dataType
    require(docs.schema(textCol).dataType == StringType,
      s"$textCol must be a string column, got " +
        docs.schema(textCol).dataType.simpleString)
    val outSchema = StructType(Seq(
      StructField(idCol, idType),
      StructField("embedding",
        ArrayType(FloatType, containsNull = false), nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    docs.select(docs(idCol), docs(textCol)).mapPartitions { rows =>
      val model = encoderFactory() // one load per task (see scaladoc)
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => model.close()))
      val d = model.dims
      require(d >= 1, s"encoder dims must be >= 1 (got $d)")
      rows.grouped(batchSize).flatMap { batch =>
        val texts = batch.map(r => if (r.isNullAt(1)) null
                                   else r.getString(1))
        val nonNull = texts.filter(_ != null).toArray
        val encoded =
          if (nonNull.isEmpty) Array.empty[Array[Float]]
          else model.encodeBatch(nonNull)
        require(encoded.length == nonNull.length,
          s"encoder returned ${encoded.length} vectors for " +
            s"${nonNull.length} texts — the batch contract is one " +
            "vector per input, in order")
        encoded.foreach(v => require(v.length == d,
          s"encoder returned a ${v.length}-dim vector (dims = $d)"))
        var j = -1
        batch.lazyZip(texts).map { (r, t) =>
          if (t == null) Row(r.get(0), null)
          else { j += 1; Row(r.get(0), encoded(j).toIndexedSeq) }
        }
      }
    }(enc)
  }

  /** Deterministic stub model (the no-torch gate harness): dimension d
    * of a text embeds as
    * `((first 8 md5 hex chars of "d:text") mod 2000) / 1000 − 1` —
    * 2000 steps of 1e-3 in [−1, 1), the portable-hyperplane
    * quantization of [[graft.operators.Similarity]], replayable in any
    * engine as `(('0x' || substr(md5(d || ':' || text), 1, 8))::BIGINT
    * % 2000) / 1000.0 - 1.0`. A real deployment swaps this factory for
    * one that loads its model; nothing else changes.
    */
  def hashEncoder(nDims: Int): () => TextEncoder = {
    require(nDims >= 1, s"hashEncoder: dims must be >= 1 (got $nDims)")
    () => new TextEncoder {
      private val md = java.security.MessageDigest.getInstance("MD5")
      override val dims: Int = nDims
      override def encodeBatch(texts: Array[String]): Array[Array[Float]] =
        texts.map { t =>
          Array.tabulate(nDims) { d =>
            val dig = md.digest(
              s"$d:$t".getBytes(java.nio.charset.StandardCharsets.UTF_8))
            val v = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
              ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
            ((v % 2000L) / 1000.0 - 1.0).toFloat
          }
        }
    }
  }
}
