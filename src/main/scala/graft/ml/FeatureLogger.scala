package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learning-to-rank feature extraction — the Spark re-expression of
  * eland's LTRModelConfig + FeatureLogger
  * (eland/ml/ltr/ltr_model_config.py:1-157,
  * eland/ml/ltr/feature_logger.py:30-163: named query-based feature
  * extractors evaluated per (query, document) pair to build judgment
  * lists).
  *
  * A feature extractor here is (name, query-string => Column): given
  * the query text it returns an ordinary Column over the document
  * table — es_match scores, quality features, anything. Features for a
  * whole judgment list are computed in ONE pass over the documents per
  * query (broadcast-join the small judgment list, never per-pair
  * requests like the reference's ingest-simulate round trips).
  */
object FeatureLogger {

  type Extractor = String => Column

  /** Standard extractors over a text column. */
  def defaultExtractors(textCol: String): Seq[(String, Extractor)] = {
    import graft.functions.{EsMatch, TextAnalysis}
    Seq(
      "match_any" -> (q => EsMatch.matchAny(col(textCol), q).cast("double")),
      "match_all" -> (q => EsMatch.matchAll(col(textCol), q).cast("double")),
      "match_phrase" -> (q => EsMatch.matchPhrase(col(textCol), q).cast("double")),
      // overlap count: how many query tokens occur in the doc
      "term_overlap" -> { q =>
        val qs = TextAnalysis.tokensOf(q)
        if (qs.isEmpty) lit(0.0)
        else qs.map(t => array_contains(TextAnalysis.tokens(col(textCol)), t)
          .cast("int")).reduce(_ + _).cast("double")
      },
      "doc_tokens" -> (_ => TextAnalysis.tokenCount(col(textCol)).cast("double")))
  }

  /** Feature matrix for a judgment list: `judgments` has (queryIdCol,
    * docIdCol [, grade...]); every feature extractor is evaluated once
    * per distinct query over the joined docs. Output: judgment columns
    * + one double column per feature.
    *
    * PLAN-SIZE CAVEAT: the extractors specialize Column expressions to
    * each query's literal text, so the plan carries one union branch
    * per distinct query. That is the right shape for judgment lists
    * (tens to a few hundred queries — the reference's LTR eval sets are
    * this size); `maxQueryBranches` fails fast beyond it rather than
    * letting Catalyst chew a multi-thousand-branch union. For corpus-
    * scale query logs, batch calls over query slices and union the
    * written results.
    */
  def logFeatures(docs: DataFrame, docIdCol: String,
                  judgments: DataFrame, queryIdCol: String, queryTextCol: String,
                  extractors: Seq[(String, Extractor)],
                  maxQueryBranches: Int = 500): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val queries = judgments.select(queryIdCol, queryTextCol).distinct()
      .collect().map(r => (r.get(0), r.getString(1)))
    require(queries.length <= maxQueryBranches,
      s"${queries.length} distinct queries would build ${queries.length} " +
        s"plan branches (cap $maxQueryBranches); batch the judgment list " +
        "over query slices instead")
    // one branch per query, union'd: each branch is docs ⋈ (that
    // query's judgments) with the feature Columns specialized to the
    // query text — all Column expressions, no per-pair execution
    val parts = queries.map { case (qid, qtext) =>
      val j = judgments.filter(col(queryIdCol) === lit(qid))
      val joined = j.join(docs, j(docIdCol) === docs(docIdCol))
        .drop(docs(docIdCol))
      extractors.foldLeft(joined) { case (d, (name, ex)) =>
        d.withColumn(name, ex(qtext))
      }
    }
    val all = parts.reduce(_ unionByName _)
    all.select((judgments.columns.map(col) ++
      extractors.map(e => col(e._1))).toIndexedSeq: _*)
  }
}
