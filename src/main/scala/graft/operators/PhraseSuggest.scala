package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** ES `phrase` suggester — whole-phrase "did you mean" (the third
  * suggester next to `term` = [[InvertedIndex.suggestTerms]] and
  * `completion` = [[InvertedIndex.suggestCompletions]]). The ES
  * recipe is a noisy channel: a candidate generator proposes
  * per-position replacements from the corpus vocabulary, a word-level
  * n-gram language model trained on the same corpus scores each
  * candidate phrase, and only phrases that outscore the input by the
  * `confidence` factor are returned. The reference never re-exposes
  * it (suggesters reach eland only as raw-DSL passthrough), so the
  * semantics here follow the ES documentation: `stupid_backoff`
  * smoothing (discount 0.4, ES's default), `max_errors`,
  * `real_word_error_likelihood`, `confidence`.
  *
  * Model, one corpus pass each (Zipf-bounded outputs): unigram and
  * bigram count tables + the token total. Candidates, per query
  * position: vocabulary terms within Damerau-less edit distance 1
  * (`levenshtein` with a pushable ±1 length bound), top
  * `numCandidates` by frequency — a bounded collect (ES's candidate
  * generator is likewise a per-shard top-n). Phrase enumeration stays
  * on the driver (≤ numCandidates^|phrase| bounded by `maxErrors` to
  * Σ C(n,e)·(numCandidates−1)^e, a few dozen rows) and scoring reads
  * the counts of the ≤ 30 candidate terms through isin-pruned scans
  * of the two count tables — the 100 TB corpus is touched exactly
  * twice (the two count scans), never per candidate. For repeated
  * serving, train the counts once and call
  * [[suggestWithModel]]; the index-backed path reuses
  * [[InvertedIndex.buildFuzzyDictionary]]'s vocabulary instead of the
  * scan (same SymSpell neighborhood contract).
  *
  * Scoring (documented exactly so an engine can replay it):
  * log-score(phrase) = log P(w₁) + Σᵢ₌₂ log P_sb(wᵢ | wᵢ₋₁) + channel,
  * with P(w) = c(w)/N (floor `discount`/N for unseen words),
  * P_sb(w₂|w₁) = c(w₁w₂)/c(w₁) when the bigram was seen, else
  * `discount` · P(w₂); channel = Σᵢ log(rwel) if the candidate keeps
  * the input term, log(1 − rwel) if it changes it. `confidence` c
  * keeps a suggestion only when score > input score + ln(c).
  */
object PhraseSuggest {

  /** (unigrams (token, c), bigrams (w1, w2, c12), total token count).
    * Train once, serve many [[suggestWithModel]] calls.
    */
  def trainCounts(corpus: DataFrame, textCol: String)
      : (DataFrame, DataFrame, Long) = {
    val toks = corpus.select(TextAnalysis.tokens(col(textCol)).as("_t"))
    val uni = toks.select(explode(col("_t")).as("token"))
      .groupBy("token").agg(count(lit(1)).cast("long").as("c"))
    val bi = toks.filter(size(col("_t")) >= 2)
      .select(posexplode(slice(col("_t"), lit(1), size(col("_t")) - 1))
        .as(Seq("_p", "w1")), col("_t"))
      .select(col("w1"), element_at(col("_t"), col("_p") + 2).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).cast("long").as("c12"))
    val n = uni.agg(sum("c")).collect().head.getLong(0)
    (uni, bi, n)
  }

  def suggest(corpus: DataFrame, textCol: String, phrase: String,
              k: Int = 3, numCandidates: Int = 5, maxErrors: Int = 1,
              discount: Double = 0.4,
              realWordErrorLikelihood: Double = 0.95,
              confidence: Double = 1.0): DataFrame = {
    val (uni, bi, n) = trainCounts(corpus, textCol)
    // the one-shot face persists the count tables for its own
    // duration: candidate generation probes the unigram table once
    // per query position plus once per count lookup, and without the
    // persist each probe would recompute the corpus aggregation
    // (suggestWithModel materializes everything before returning, so
    // the unpersist is safe)
    uni.persist(); bi.persist()
    try suggestWithModel(uni, bi, n, phrase, k, numCandidates,
      maxErrors, discount, realWordErrorLikelihood, confidence)
    finally { uni.unpersist(); bi.unpersist(); () }
  }

  def suggestWithModel(unigrams: DataFrame, bigrams: DataFrame,
                       totalTokens: Long, phrase: String, k: Int = 3,
                       numCandidates: Int = 5, maxErrors: Int = 1,
                       discount: Double = 0.4,
                       realWordErrorLikelihood: Double = 0.95,
                       confidence: Double = 1.0): DataFrame = {
    require(k > 0, s"k must be >= 1, got $k")
    require(numCandidates >= 1 && numCandidates <= 20,
      s"num_candidates must be in [1, 20], got $numCandidates")
    require(maxErrors >= 1, s"max_errors must be >= 1, got $maxErrors")
    require(discount > 0 && discount < 1,
      s"discount must be in (0, 1), got $discount")
    require(realWordErrorLikelihood > 0 && realWordErrorLikelihood < 1,
      "real_word_error_likelihood must be in (0, 1)")
    require(confidence > 0, s"confidence must be > 0, got $confidence")
    require(totalTokens > 0, "model has no tokens — train on a corpus")
    val qs = TextAnalysis.tokensOf(phrase)
    require(qs.nonEmpty, "phrase analyzes to no tokens")
    require(qs.size <= 5,
      s"phrase has ${qs.size} terms — the combination space is bounded " +
        "at 5 (ES bounds its candidate combinations the same way)")
    val spark = unigrams.sparkSession
    import spark.implicits._

    // per-position candidates: vocabulary within edit distance 1, top
    // numCandidates by frequency then term — a bounded collect per
    // position (≤ 5 × numCandidates strings total). The ±1 length
    // band prunes before levenshtein runs.
    val perPos: Seq[Seq[(String, Boolean)]] = qs.map { t =>
      val got = unigrams
        .filter(length(col("token"))
          .between(t.length - 1, t.length + 1))
        .filter(levenshtein(col("token"), lit(t)) <= 1)
        .orderBy(col("c").desc, col("token"))
        .limit(numCandidates)
        .collect().map(_.getString(0)).toSeq
      // the observed term always stays a candidate (scored with the
      // unseen-word floor if it is not in the vocabulary)
      val withSelf = if (got.contains(t)) got else (t +: got)
      withSelf.map(c => (c, c == t))
    }
    // driver-side enumeration bounded by maxErrors changed positions
    val combos = perPos.foldLeft(Seq((Vector.empty[String], 0))) {
      case (acc, cands) => acc.flatMap { case (pre, errs) =>
        cands.flatMap { case (c, keeps) =>
          val e = errs + (if (keeps) 0 else 1)
          if (e <= maxErrors) Some((pre :+ c, e)) else None
        }
      }
    }
    // the candidate vocabulary is driver-known and tiny (≤ 5 ×
    // (numCandidates + 1) strings), so the needed counts come from
    // isin-PRUNED reads of the two count tables (the predicate pushes
    // to the scan / parquet row groups of a materialized model) —
    // two bounded collects, never a per-candidate job
    val candTerms = perPos.flatten.map(_._1).distinct
    val uniMap = unigrams.filter(col("token").isin(candTerms: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val biMap = bigrams
      .filter(col("w1").isin(candTerms: _*) &&
        col("w2").isin(candTerms: _*))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val channel = math.log(realWordErrorLikelihood)
    val channelErr = math.log(1.0 - realWordErrorLikelihood)
    def pUni(w: String): Double =
      uniMap.get(w).map(_.toDouble / totalTokens)
        .getOrElse(discount / totalTokens)
    // left-to-right sum: head unigram, then each transition in
    // position order, channel last — pinned so an engine replaying
    // the definition adds in the same IEEE order
    def scoreOf(ws: Vector[String], errs: Int): Double = {
      val lm = ws.sliding(2).filter(_.size == 2)
        .foldLeft(math.log(pUni(ws.head))) { (acc, p) =>
          val t = (biMap.get((p(0), p(1))), uniMap.get(p(0))) match {
            case (Some(c12), Some(c1)) =>
              math.log(c12.toDouble / c1)
            case _ => math.log(discount * pUni(p(1)))
          }
          acc + t
        }
      lm + ((qs.size - errs) * channel + errs * channelErr)
    }
    val scored = combos.map { case (ws, errs) =>
      (ws.mkString(" "), scoreOf(ws, errs), errs == 0)
    }
    val inputScore = scored.collectFirst { case (_, s, true) => s }.get
    scored
      .filter { case (_, s, isInput) =>
        !isInput && s > inputScore + math.log(confidence)
      }
      .map { case (sug, s, _) =>
        (sug, math.floor(s * 1e6 + 0.5) / 1e6)
      }
      .sortBy { case (sug, s) => (-s, sug) }
      .take(k)
      .toDF("suggestion", "score")
  }
}
