package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Unigram-LM subword tokenizer (the SentencePiece recipe, Kudo
  * ACL'18) — the other half of the tokenizer story next to
  * [[Vocabulary.trainBpe]]: instead of a greedy merge walk, the model
  * is a PROBABILITY per piece, trained by EM over all segmentations
  * and applied by Viterbi (most-probable segmentation). The reference
  * stack tokenizes its NLP models with exactly such unigram models
  * (eland/ml/pytorch/transformers.py tokenizer handling).
  *
  * This implementation is the hard-EM (Viterbi-EM) variant: each
  * E-step counts pieces from the single BEST segmentation per word
  * rather than the full lattice expectation. That keeps every step in
  * exact, engine-replayable arithmetic (integer counts, one ln per
  * piece rounded half-up at 6 dp) — the property every gate in this
  * repo is built on — while preserving the algorithm's structure:
  * seed vocab from frequent substrings, iterate (estimate
  * probabilities → re-segment → re-count), prune to the target size.
  *
  * Determinism contract (what the DuckDB oracle replays literally):
  *  - words are [[TextAnalysis.tokens]] output; symbols are Unicode
  *    CODE POINTS (Spark split(""), DuckDB word[i:j] and the driver
  *    loop all agree on that unit — [[Vocabulary]]'s note);
  *  - seed = ALL single code points (counted per occurrence × word
  *    freq) plus the top `seedSize` substrings of length 2..P by
  *    (count desc, piece asc);
  *  - piece score = floor(ln(cnt/total)·1e6 + 0.5)/1e6 (the repo's
  *    rhu half-up rounding — identical spelling in both engines);
  *  - Viterbi maximizes the score sum; TIES break toward the SHORTEST
  *    last piece (strict > with piece length ascending);
  *  - E-step counts = word freq summed over best-segmentation pieces;
  *    single code points take their new count + 1 (an add-one floor —
  *    required symbols never die, the SentencePiece character-coverage
  *    guarantee in its simplest exact form); multi-char pieces with
  *    count 0 drop;
  *  - prune keeps all singles + the top (vocabSize − #singles) multis
  *    by (count desc, piece asc); final log-probs renormalize over the
  *    kept set.
  *
  * Scale shape: identical to [[Vocabulary.trainBpe]] — the ONLY
  * corpus-scale work is the word-frequency count (one shuffle,
  * map-side partial aggregation, `maxWords` TakeOrdered cap); the EM
  * loop runs driver-side over that bounded dict (how SentencePiece
  * and HF trainers work too). Encoding segments only the DISTINCT
  * word table and broadcasts back — the corpus never shuffles.
  */
object Unigram {

  /** Score assigned to an out-of-vocabulary single code point at
    * segmentation time (training corpora always cover their own
    * characters; this keeps encode total on unseen text). More
    * negative than any real log-prob, so known pieces always win.
    */
  val UnkScore: Double = -100.0

  /** Trained model: (piece, cnt, logp), sorted by piece. Pieces must
    * be unique — a duplicate would otherwise surface as a runtime
    * DUPLICATED_MAP_KEY inside every encode job (the score-map
    * literal), far from the malformed input that caused it.
    */
  final case class UnigramModel(pieces: Seq[(String, Long, Double)]) {
    require(pieces.nonEmpty, "empty unigram model")
    require(pieces.map(_._1).distinct.size == pieces.size,
      "unigram model holds duplicate pieces: " +
        pieces.groupBy(_._1).collect { case (p, g) if g.size > 1 => p }
          .mkString(", "))
    def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      pieces.toDF("piece", "cnt", "logp")
    }
    lazy val scores: Map[String, Double] =
      pieces.map { case (p, _, lp) => p -> lp }.toMap
    /** Longest piece in code points — the DP candidate depth
      * segmentation must search to reach every piece.
      */
    lazy val maxPieceLen: Int =
      pieces.iterator.map(p => p._1.codePointCount(0, p._1.length)).max
  }

  private def rhu6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def codePoints(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** Train over the corpus: one bounded word-count shuffle, then the
    * driver-side Viterbi-EM loop of [[trainUnigramFromDict]].
    */
  def trainUnigram(docs: DataFrame, textCol: String, vocabSize: Int = 60,
                   maxPieceLen: Int = 4, iters: Int = 2,
                   seedSize: Int = 200, maxWords: Int = 1000000,
                   minFreq: Long = 1L): UnigramModel = {
    require(vocabSize > 0 && maxPieceLen >= 1 && iters >= 1 && seedSize >= 0,
      "bad unigram training parameters")
    val dict = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minFreq)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainUnigramFromDict(dict, vocabSize, maxPieceLen, iters, seedSize)
  }

  private[operators] def trainUnigramFromDict(
      dict: Array[(String, Long)], vocabSize: Int, maxPieceLen: Int,
      iters: Int, seedSize: Int): UnigramModel = {
    import scala.collection.mutable
    require(dict.nonEmpty, "unigram training needs a non-empty corpus")
    // seed: every occurrence of every substring up to maxPieceLen
    val singleCnt = mutable.HashMap.empty[String, Long]
    val multiCnt = mutable.HashMap.empty[String, Long]
    dict.foreach { case (w, f) =>
      val cps = codePoints(w)
      var i = 0
      while (i < cps.length) {
        var l = 1
        while (l <= math.min(maxPieceLen, cps.length - i)) {
          val p = cps.slice(i, i + l).mkString
          val m = if (l == 1) singleCnt else multiCnt
          m.update(p, m.getOrElse(p, 0L) + f)
          l += 1
        }
        i += 1
      }
    }
    val seedMultis = multiCnt.toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedSize)
    var counts: Map[String, Long] = singleCnt.toMap ++ seedMultis

    // Viterbi-EM
    for (_ <- 1 to iters) {
      val total = counts.values.sum
      val score = counts.map { case (p, c) =>
        p -> rhu6(math.log(c.toDouble / total.toDouble))
      }
      val next = mutable.HashMap.empty[String, Long]
      dict.foreach { case (w, f) =>
        viterbi(codePoints(w), score, maxPieceLen).foreach { p =>
          next.update(p, next.getOrElse(p, 0L) + f)
        }
      }
      counts =
        (singleCnt.keysIterator.map(p => p -> (next.getOrElse(p, 0L) + 1L)) ++
          next.iterator.filter { case (p, _) => cpLen(p) > 1 }).toMap
    }

    // prune to vocabSize (singles always survive)
    val singles = counts.filter { case (p, _) => cpLen(p) == 1 }
    val multis = counts.toSeq
      .filter { case (p, _) => cpLen(p) > 1 }
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - singles.size))
    val kept = (singles.toSeq ++ multis).sortBy(_._1)
    val tf = kept.map(_._2).sum
    UnigramModel(kept.map { case (p, c) =>
      (p, c, rhu6(math.log(c.toDouble / tf.toDouble)))
    })
  }

  /** Most-probable segmentation of one word under per-piece scores —
    * the driver reference the Column form ([[unigramSegment]]) and the
    * oracle SQL both mirror. DP over code-point positions; ties break
    * toward the shortest last piece (strict >, lengths ascending);
    * unknown single code points fall back to [[UnkScore]].
    */
  private[operators] def viterbi(cps: Array[String],
                                 score: Map[String, Double],
                                 maxPieceLen: Int): Seq[String] = {
    val n = cps.length
    if (n == 0) return Seq.empty
    val v = new Array[Double](n + 1)
    val bl = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var bestS = Double.NegativeInfinity
      var bestL = 0
      var l = 1
      while (l <= math.min(maxPieceLen, j)) {
        val p = cps.slice(j - l, j).mkString
        val s = score.get(p) match {
          case Some(x)          => x
          case None if l == 1   => UnkScore
          case None             => Double.NaN // not a candidate
        }
        if (!s.isNaN) {
          val cand = v(j - l) + s
          if (cand > bestS) { bestS = cand; bestL = l }
        }
        l += 1
      }
      v(j) = bestS; bl(j) = bestL
      j += 1
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var k = n
    while (k > 0) {
      val l = bl(k)
      out.prepend(cps.slice(k - l, k).mkString)
      k -= l
    }
    out.toList
  }

  /** Column form of [[viterbi]]: word string → array of pieces, as
    * pure Column HOFs (no UDF). The model's piece→score map rides as
    * a map literal (a unigram vocab is driver-sized by definition);
    * the DP folds `aggregate` over positions carrying (V values,
    * chosen-length backpointers) and a second fold reconstructs the
    * path. Every expensive intermediate is bound through
    * [[TextAnalysis.bindOnce]] — lambda bindings are the one staging
    * the optimizer cannot substitute into (the t13 lesson).
    */
  def unigramSegment(word: Column, model: UnigramModel,
                     maxPieceLen: Int = 0): Column = {
    // default 0 = derive the DP depth from the model itself; an
    // explicit depth SMALLER than the longest piece would silently
    // never reach that piece (a production SentencePiece vocab
    // carries 5-16-char pieces), so it refuses loudly instead
    val depth = if (maxPieceLen > 0) maxPieceLen else model.maxPieceLen
    require(depth >= model.maxPieceLen,
      s"maxPieceLen $depth cannot reach the model's longest piece " +
        s"(${model.maxPieceLen} code points) — pieces beyond the DP " +
        "depth would silently never match")
    val scoreMap = map(model.pieces.flatMap { case (p, _, lp) =>
      Seq(lit(p), lit(lp))
    }: _*)
    TextAnalysis.bindOnce(array_remove(split(word, ""), "")) { cps =>
      val n = size(cps)
      val init = struct(
        array(lit(0.0)).as("vs"),
        array(lit(0)).as("bls"))
      val dp = aggregate(sequence(lit(1), greatest(n, lit(1))), init,
        (st, j) => {
          val vs = st.getField("vs")
          val cands = (1 to depth).map { l =>
            // start guarded into range: the value is only USED when
            // l <= j (the when below), but slice refuses start <= 0
            // even unevaluated branches must stay constructible
            val piece = concat_ws("",
              slice(cps, greatest(j - lit(l) + 1, lit(1)), lit(l)))
            val sc =
              if (l == 1)
                coalesce(element_at(scoreMap, piece), lit(UnkScore))
              else element_at(scoreMap, piece)
            when(lit(l) <= j && sc.isNotNull,
              struct(
                (element_at(vs, (j - lit(l) + 1).cast("int")) + sc).as("v"),
                lit(-l).as("negl")))
          }
          // greatest over (v, -l) structs = max score, then smallest l
          val best = greatest(cands: _*)
          struct(
            concat(vs, array(best.getField("v"))).as("vs"),
            concat(st.getField("bls"),
              array((-best.getField("negl")).cast("int"))).as("bls"))
        })
      val pieces = TextAnalysis.bindOnce(dp) { d =>
        aggregate(sequence(lit(1), greatest(n, lit(1))),
          struct(n.cast("int").as("j"),
            typedlit(Seq.empty[String]).as("ps")),
          (st, _) => {
            val jj = st.getField("j")
            val l = element_at(d.getField("bls"), jj + 1)
            when(jj > 0,
              struct((jj - l).as("j"),
                concat(
                  array(concat_ws("", slice(cps, jj - l + 1, l))),
                  st.getField("ps")).as("ps")))
              .otherwise(st)
          }).getField("ps")
      }
      when(n === 0, typedlit(Seq.empty[String])).otherwise(pieces)
    }
  }

  /** Encode every document as (idCol, pos, piece_pos, piece) — the
    * [[Vocabulary.bpeEncodeExploded]] shape: Viterbi runs once per
    * DISTINCT word (Zipf-bounded), then broadcasts back onto the
    * exploded corpus.
    */
  def unigramEncodeExploded(docs: DataFrame, idCol: String,
                            textCol: String, model: UnigramModel,
                            maxPieceLen: Int = 0): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "token")))
    val seg = toks.select("token").distinct()
      .withColumn("pieces", unigramSegment(col("token"), model, maxPieceLen))
    // posexplode_OUTER: a plain Generate makes Catalyst infer a
    // size(pieces) > 0 filter that inlines the Viterbi DP and pushes
    // it below the distinct — per-occurrence re-evaluation (the
    // WordPiece.wordPieceEncodeExploded finding). Viterbi always
    // yields >= 1 piece, so outer is semantically identical.
    toks.join(broadcast(seg), Seq("token"))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        posexplode_outer(col("pieces")).as(Seq("piece_pos", "piece")))
      .withColumn("piece_pos", col("piece_pos").cast("long"))
  }

  /** Persist the trained model: one committed parquet table
    * (`path/pieces`, _SUCCESS-markered) — [[Vocabulary.saveBpeModel]]'s
    * artifact discipline applied to the unigram table.
    */
  def saveUnigramModel(spark: org.apache.spark.sql.SparkSession,
                       model: UnigramModel, path: String): Unit = {
    model.toDF(spark).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/pieces")
  }

  /** Export the model in the SentencePiece `.vocab` spelling — one
    * "piece\tlogprob" line per piece, logprob as the shortest
    * round-trip double repr (Double.toString, so import rebuilds the
    * EXACT score the Viterbi compares on) — the interop format the
    * SentencePiece tooling (`spm_export_vocab`) and everything
    * downstream of it reads; [[Vocabulary.exportBpeMergesTxt]]'s role
    * for the unigram side. Pieces come from whitespace-split tokens so
    * they cannot contain tabs/newlines; guarded anyway. Counts are NOT
    * part of the format (SentencePiece vocabs carry probabilities
    * only).
    */
  def exportSpmVocabTxt(spark: org.apache.spark.sql.SparkSession,
                        model: UnigramModel, file: String): Unit = {
    model.pieces.foreach { case (p, _, _) =>
      require(p.nonEmpty && !p.exists(_.isWhitespace),
        s"vocab pieces must be non-empty and whitespace-free, got '$p'")
    }
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(model.pieces
      .map { case (pc, _, lp) => s"$pc\t$lp" }.mkString("\n")
      .concat("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load a SentencePiece-style `.vocab` file into a model: each line
    * "piece\tlogprob", order irrelevant (pieces re-sort). Counts are
    * not carried by the format, so they import as 0 — segmentation
    * reads only the log-probs. The inverse of [[exportSpmVocabTxt]],
    * and the path for encoding under a PRODUCTION SentencePiece
    * model's vocabulary.
    */
  def importSpmVocabTxt(spark: org.apache.spark.sql.SparkSession,
                        file: String): UnigramModel = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text =
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val pieces = text.linesIterator.filter(_.nonEmpty).map { line =>
      val i = line.indexOf('\t')
      require(i > 0 && i < line.length - 1,
        s"malformed .vocab line (want piece<TAB>logprob): '$line'")
      (line.substring(0, i), 0L,
        java.lang.Double.parseDouble(line.substring(i + 1)))
    }.toSeq.sortBy(_._1)
    require(pieces.nonEmpty, s"$file holds no vocab lines")
    UnigramModel(pieces)
  }

  /** Load a committed model; loud on missing/uncommitted saves. */
  def loadUnigramModel(spark: org.apache.spark.sql.SparkSession,
                       path: String): UnigramModel = {
    val p = new org.apache.hadoop.fs.Path(s"$path/pieces/_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"$path holds no committed unigram model — saveUnigramModel() " +
        "first (a crashed save leaves no _SUCCESS marker)")
    val rows = spark.read.parquet(s"$path/pieces").orderBy("piece").collect()
    require(rows.nonEmpty, s"$path/pieces is committed but empty")
    UnigramModel(rows.toSeq.map(r => (r.getAs[String]("piece"),
      r.getAs[Long]("cnt"), r.getAs[Double]("logp"))))
  }
}
