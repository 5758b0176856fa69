package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** WordPiece subword tokenizer (Schuster & Nakajima 2012; BERT's
  * tokenizer, the Hugging Face `WordPiece` trainer's recipe) — the
  * third leg of the tokenizer family next to [[Vocabulary.trainBpe]]
  * (count-argmax merges) and [[Unigram]] (probability + Viterbi):
  * WordPiece merges the adjacent symbol pair maximizing the
  * LIKELIHOOD score count(lr) ∕ (count(l) · count(r)) — "merge what
  * co-occurs more than its parts predict" — and ENCODES by greedy
  * longest-match-first over the learned vocabulary with the `##`
  * continuation convention (`playing` → `play ##ing`), a word with no
  * match anywhere collapsing to `[UNK]`.
  *
  * Determinism contract (what the DuckDB oracle replays literally):
  *
  *  - words are [[TextAnalysis.tokens]] output; symbols are Unicode
  *    code points, the first bare and the rest `##`-prefixed;
  *  - counts are word-frequency-weighted occurrence counts over the
  *    CURRENT segmentations (pair and symbol alike);
  *  - selection maximizes CAST(c AS DOUBLE) ∕ (CAST(cl AS DOUBLE) ·
  *    CAST(cr AS DOUBLE)) — identical IEEE ops both engines — ties
  *    (l, r) ascending; the merged symbol is l + r-without-`##`;
  *  - the vocabulary is the initial alphabet (sorted) plus each
  *    merge's produced symbol in merge order;
  *  - encoding walks each word left to right taking the LONGEST
  *    vocabulary piece at every position (`##`-prefixed past position
  *    one); any position with no match makes the whole word `[UNK]`
  *    (Hugging Face's behavior).
  *
  * Scale shape: training is ONE corpus-scale word-count shuffle into
  * a Zipf-bounded dict (`maxWords`), then a driver loop whose argmax
  * is an O(pairs) scan per merge — the likelihood denominator
  * changes with every symbol-count update, so the BPE trainer's
  * lazily-invalidated queue would invalidate almost everything per
  * round anyway; with numMerges·maxWords both bounded this is
  * driver-trivial. Encoding runs once per DISTINCT word as a pure
  * Column expression and broadcasts back onto the exploded corpus
  * ([[Vocabulary.bpeEncodeExploded]]'s shape) — the corpus never
  * shuffles to encode.
  */
object WordPiece {

  /** Trained model: the vocabulary in its deterministic order
    * (alphabet sorted, then merges in rank order) plus the merge list
    * for observability.
    */
  final case class WordPieceModel(vocab: Seq[String],
                                  merges: Seq[(String, String)]) {
    def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      vocab.zipWithIndex.map { case (p, i) => (i.toLong, p) }
        .toDF("rank", "piece")
    }
  }

  private def stripHashes(s: String): String =
    if (s.startsWith("##")) s.substring(2) else s

  /** " a  ##b  ##c " — [[Vocabulary]]'s two-space-separated padded
    * state, with the `##` continuation prefix baked into the symbols.
    */
  private def paddedWpSymbols(word: String): String = {
    val cps = word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    val syms = cps.zipWithIndex.map { case (c, i) =>
      if (i == 0) c else "##" + c
    }
    " " + syms.mkString("  ") + " "
  }

  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 1000000, minFreq: Long = 1L): WordPieceModel = {
    require(numMerges > 0, "numMerges must be positive")
    require(maxWords > 0, "maxWords must be positive")
    val dict = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minFreq)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromDict(dict, numMerges)
  }

  private[operators] def trainFromDict(dict: Array[(String, Long)],
                                       numMerges: Int): WordPieceModel = {
    val words = dict.map { case (w, _) => paddedWpSymbols(w) }
    val freqs = dict.map(_._2)
    def symsOf(s: String): Array[String] = s.trim.split("  ")
    val alphabet = words.flatMap(symsOf).distinct.sorted.toSeq
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      // recount pairs AND symbols over the current segmentations —
      // the likelihood denominator moves with every merge, so a
      // cached-count argmax would select on stale scores
      val pairC = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      val symC = scala.collection.mutable.HashMap.empty[String, Long]
      var i = 0
      while (i < words.length) {
        val syms = symsOf(words(i))
        val f = freqs(i)
        var j = 0
        while (j < syms.length) {
          symC.update(syms(j), symC.getOrElse(syms(j), 0L) + f)
          if (j + 1 < syms.length) {
            val p = (syms(j), syms(j + 1))
            pairC.update(p, pairC.getOrElse(p, 0L) + f)
          }
          j += 1
        }
        i += 1
      }
      if (pairC.isEmpty) done = true
      else {
        // argmax by (score desc, l asc, r asc) — score as IEEE double
        // of exact integer counts, the oracle's CAST arithmetic
        val best = pairC.iterator.map { case ((l, r), c) =>
          (c.toDouble / (symC(l).toDouble * symC(r).toDouble), l, r)
        }.reduceLeft { (a, b) =>
          if (b._1 > a._1 ||
              (b._1 == a._1 && (b._2 < a._2 ||
                (b._2 == a._2 && b._3 < a._3)))) b else a
        }
        val (l, r) = (best._2, best._3)
        merges += ((l, r))
        val pat = s" $l  $r "
        val rep = s" ${l + stripHashes(r)} "
        var w = 0
        while (w < words.length) {
          words(w) = words(w).replace(pat, rep)
          w += 1
        }
      }
    }
    WordPieceModel(
      alphabet ++ merges.toSeq.map { case (l, r) => l + stripHashes(r) },
      merges.toSeq)
  }

  /** Greedy longest-match-first segmentation of one word column under
    * `model` — a pure Column expression (an `aggregate` walk of at
    * most word-length steps; each step probes piece lengths longest
    * first against the vocabulary literal). No match at any position
    * → the Hugging Face whole-word `[UNK]`.
    */
  def wordPieceSegment(word: Column, model: WordPieceModel,
                       maxPieceLen: Int = 0): Column = {
    val maxLen = {
      val m = model.vocab.map(p => stripHashes(p).length)
        .foldLeft(1)(math.max)
      if (maxPieceLen > 0) math.min(maxPieceLen, m) else m
    }
    val vocab = typedLit(model.vocab.toArray)
    val cps = array_remove(split(word, ""), "")
    TextAnalysis.bindOnce(cps) { cs =>
      val n = size(cs)
      // state: (pos 1-based, pieces, failed); each step consumes the
      // longest matching piece or fails the word
      val init = struct(lit(1).as("pos"),
        array().cast("array<string>").as("pieces"),
        lit(false).as("failed"))
      val walked = aggregate(sequence(lit(1), greatest(n, lit(1))), init,
        (st, _) => {
          val pos = st.getField("pos")
          val idle = st.getField("failed") || pos > n
          def pieceAt(l: Int): Column = {
            val raw = concat_ws("", slice(cs, pos, lit(l)))
            when(pos === 1, raw).otherwise(concat(lit("##"), raw))
          }
          // longest-first: probe maxLen..1, keep the first hit
          val firstHit = (maxLen to 1 by -1).map(l =>
            when(pos + l - 1 <= n && array_contains(vocab, pieceAt(l)),
              struct(pieceAt(l).as("p"), lit(l).as("l")))
              .otherwise(lit(null).cast("struct<p:string,l:int>")))
            .reduceLeft((a, b) => coalesce(a, b))
          when(idle, st).otherwise(
            when(firstHit.isNull,
              struct(pos.as("pos"), st.getField("pieces").as("pieces"),
                lit(true).as("failed")))
              .otherwise(struct(
                (pos + firstHit.getField("l")).as("pos"),
                concat(st.getField("pieces"),
                  array(firstHit.getField("p"))).as("pieces"),
                lit(false).as("failed"))))
        },
        st => when(st.getField("failed") || size(st.getField("pieces")) === 0,
            array(lit("[UNK]")))
          .otherwise(st.getField("pieces")))
      walked
    }
  }

  /** Encode every document as (idCol, pos, piece_pos, piece) — the
    * [[Vocabulary.bpeEncodeExploded]] shape: segmentation runs once
    * per DISTINCT word, then broadcasts back onto the exploded
    * corpus.
    */
  def wordPieceEncodeExploded(docs: DataFrame, idCol: String,
                              textCol: String, model: WordPieceModel,
                              maxPieceLen: Int = 0): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "token")))
    val seg = toks.select("token").distinct()
      .withColumn("pieces",
        wordPieceSegment(col("token"), model, maxPieceLen))
    // posexplode_OUTER: the non-outer Generate makes Catalyst infer a
    // `size(pieces) > 0` filter that INLINES the segmentation walk and
    // pushes it below the distinct — re-evaluating the walk once per
    // corpus token occurrence instead of once per distinct word
    // (measured 15x on the sf0.1 corpus). pieces is never null/empty
    // (a failed word is ['[UNK]']), so outer is semantically identical.
    toks.join(broadcast(seg), Seq("token"))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        posexplode_outer(col("pieces")).as(Seq("piece_pos", "piece")))
      .withColumn("piece_pos", col("piece_pos").cast("long"))
  }
}
