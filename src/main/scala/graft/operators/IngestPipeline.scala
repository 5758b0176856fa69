package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** ES ingest pipelines (`PUT _ingest/pipeline/<id>` + index-time
  * execution; the `_simulate` surface is the same machinery run on a
  * frame) re-expressed as ORDERED Column transforms — every processor
  * is a pure projection over the previous step, so an entire pipeline
  * is ONE narrow map stage: no shuffle, no UDFs, whole-stage codegen
  * end to end, embarrassingly parallel at any scale. The reference
  * never touches ingest (eland reads/writes already-indexed docs);
  * this is the parity-plus face an ES user porting an indexing
  * pipeline needs.
  *
  * Processor subset (the deterministic, engine-independent core):
  * `set` (value / copy_from, override), `remove` (ignore_missing),
  * `rename`, `convert` (integer/long/float/double/string/boolean —
  * an unparseable non-null value FAILS the batch loudly, ES's
  * convert-error contract, unless `ignore_failure`), `lowercase`,
  * `uppercase`, `trim`, `split` (regex separator), `join`, `gsub`
  * (replace-ALL), `append` (scalar-promotes like ES), `date` (named
  * ISO8601/UNIX/UNIX_MS plus Java patterns; first matching format,
  * no match on a non-null value fails loudly), `dissect`
  * (literal-separator `%{key}` patterns), `enrich` (broadcast lookup
  * against a policy frame — the enrich-index join). REFUSED, loudly:
  * `script` and per-processor `if` (arbitrary Painless — the
  * engine's deliberate boundary, see PLANS.md scripted_metric
  * adjudication), `fail`/`drop` (conditional-only in practice),
  * `grok` (use dissect; the full grok pattern library is a Lucene
  * sidecar this engine does not ship). Schema errors (missing
  * source, existing rename target) surface at BUILD time — the
  * schema is statically known after each step, so a misconfigured
  * pipeline never reaches the cluster.
  */
object IngestPipeline {
  private implicit val formats: Formats = DefaultFormats

  /** An enrich policy: (lookup frame, match field on the lookup
    * side, enrich fields to copy). The processor's `field` matches
    * against `matchField`; the copied fields land as a STRUCT at
    * `target_field` (ES copies the enrich doc as an object).
    */
  final case class EnrichPolicy(lookup: DataFrame, matchField: String,
                                enrichFields: Seq[String])

  def apply(json: String,
            policies: Map[String, EnrichPolicy] = Map.empty)
      : DataFrame => DataFrame = {
    val procs = (JsonMethods.parse(json) \ "processors") match {
      case JArray(ps) if ps.nonEmpty => ps
      case other => throw new IllegalArgumentException(
        s"pipeline needs a non-empty processors array, got $other")
    }
    df0 => procs.zipWithIndex.foldLeft(df0) { case (df, (p, i)) =>
      val (kind, body) = p match {
        case JObject(List((k, b))) => (k, b)
        case other => throw new IllegalArgumentException(
          s"processor $i must be a single-key object, got $other")
      }
      require((body \ "if") == JNothing,
        s"processor $i ($kind): `if` conditions are Painless scripts " +
          "— refused (filter the frame with a Column predicate " +
          "before the pipeline instead)")
      applyProcessor(df, kind, body, i, policies)
    }
  }

  private def str(body: JValue, key: String, i: Int,
                  kind: String): String = (body \ key) match {
    case JString(s) => s
    case other => throw new IllegalArgumentException(
      s"processor $i ($kind) needs a string `$key`, got $other")
  }

  private def optStr(body: JValue, key: String): Option[String] =
    (body \ key) match {
      case JString(s) => Some(s)
      case JNothing   => None
      case other => throw new IllegalArgumentException(
        s"`$key` must be a string, got $other")
    }

  private def flag(body: JValue, key: String, default: Boolean): Boolean =
    (body \ key) match {
      case JBool(b) => b
      case JNothing => default
      case other => throw new IllegalArgumentException(
        s"`$key` must be a boolean, got $other")
    }

  private def requireField(df: DataFrame, f: String, i: Int,
                           kind: String): Unit =
    require(df.columns.contains(f),
      s"processor $i ($kind): field `$f` does not exist " +
        s"(have: ${df.columns.mkString(", ")})")

  private def jLit(v: JValue, i: Int, kind: String): Column = v match {
    case JString(s)  => lit(s)
    case JInt(n)     => lit(n.toLong)
    case JLong(n)    => lit(n)
    case JDouble(d)  => lit(d)
    case JDecimal(d) => lit(d.toDouble)
    case JBool(b)    => lit(b)
    case other => throw new IllegalArgumentException(
      s"processor $i ($kind): unsupported literal $other")
  }

  private def applyProcessor(df: DataFrame, kind: String, body: JValue,
                             i: Int,
                             policies: Map[String, EnrichPolicy])
      : DataFrame = kind match {
    case "set" =>
      val f = str(body, "field", i, kind)
      val v = ((body \ "value"), (body \ "copy_from")) match {
        case (JNothing, JNothing) => throw new IllegalArgumentException(
          s"processor $i (set) needs value or copy_from")
        case (value, JNothing) => jLit(value, i, kind)
        case (JNothing, JString(src)) =>
          requireField(df, src, i, kind); col(src)
        case _ => throw new IllegalArgumentException(
          s"processor $i (set): value and copy_from are exclusive")
      }
      if (flag(body, "override", default = true)) df.withColumn(f, v)
      else {
        // override:false only fills a null/absent field
        if (!df.columns.contains(f)) df.withColumn(f, v)
        else df.withColumn(f, coalesce(col(f), v))
      }
    case "remove" =>
      val f = str(body, "field", i, kind)
      if (!df.columns.contains(f)) {
        require(flag(body, "ignore_missing", default = false),
          s"processor $i (remove): field `$f` does not exist " +
            "(pass ignore_missing to tolerate)")
        df
      } else df.drop(f)
    case "rename" =>
      val f = str(body, "field", i, kind)
      val t = str(body, "target_field", i, kind)
      requireField(df, f, i, kind)
      require(!df.columns.contains(t),
        s"processor $i (rename): target `$t` already exists (ES " +
          "fails the doc; here the pipeline fails at build)")
      df.withColumnRenamed(f, t)
    case "convert" =>
      val f = str(body, "field", i, kind)
      requireField(df, f, i, kind)
      val t = optStr(body, "target_field").getOrElse(f)
      val tpe = str(body, "type", i, kind) match {
        case "integer" => "int"
        case "long"    => "long"
        case "float"   => "float"
        case "double"  => "double"
        case "string"  => "string"
        case "boolean" => "boolean"
        case other => throw new IllegalArgumentException(
          s"processor $i (convert): type `$other` not supported " +
            "(integer, long, float, double, string, boolean)")
      }
      // ANSI-mode cast throws on malformed input mid-task; try_cast
      // yields null so the FAILURE PATH stays ours (the loud
      // raise_error below names field and value)
      val casted = col(f).try_cast(tpe)
      val out =
        if (flag(body, "ignore_failure", default = false)) casted
        else when(col(f).isNotNull && casted.isNull,
          raise_error(concat(lit(s"convert: cannot parse `$f` value '"),
            col(f).cast("string"), lit(s"' as $tpe"))))
          .otherwise(casted)
      df.withColumn(t, out)
    case "lowercase" | "uppercase" | "trim" =>
      val f = str(body, "field", i, kind)
      requireField(df, f, i, kind)
      val t = optStr(body, "target_field").getOrElse(f)
      require(df.schema(f).dataType ==
        org.apache.spark.sql.types.StringType,
        s"processor $i ($kind): field `$f` is not a string " +
          "(convert first)")
      val out = kind match {
        case "lowercase" => lower(col(f))
        case "uppercase" => upper(col(f))
        case _           => trim(col(f))
      }
      df.withColumn(t, out)
    case "split" =>
      val f = str(body, "field", i, kind)
      requireField(df, f, i, kind)
      val sep = str(body, "separator", i, kind)
      val t = optStr(body, "target_field").getOrElse(f)
      df.withColumn(t, split(col(f), sep))
    case "join" =>
      val f = str(body, "field", i, kind)
      requireField(df, f, i, kind)
      val sep = str(body, "separator", i, kind)
      val t = optStr(body, "target_field").getOrElse(f)
      df.withColumn(t, array_join(col(f), sep))
    case "gsub" =>
      val f = str(body, "field", i, kind)
      requireField(df, f, i, kind)
      val t = optStr(body, "target_field").getOrElse(f)
      df.withColumn(t, regexp_replace(col(f),
        str(body, "pattern", i, kind),
        str(body, "replacement", i, kind)))
    case "append" =>
      val f = str(body, "field", i, kind)
      val vs = (body \ "value") match {
        case JArray(xs) => xs.map(jLit(_, i, kind))
        case JNothing => throw new IllegalArgumentException(
          s"processor $i (append) needs a value")
        case single => Seq(jLit(single, i, kind))
      }
      if (!df.columns.contains(f)) df.withColumn(f, array(vs: _*))
      else df.schema(f).dataType match {
        case _: org.apache.spark.sql.types.ArrayType =>
          df.withColumn(f, concat(col(f), array(vs: _*)))
        case _ => // ES scalar-promotes: [old, new...]
          df.withColumn(f, concat(array(col(f)), array(vs: _*)))
      }
    case "date" =>
      val f = str(body, "field", i, kind)
      requireField(df, f, i, kind)
      val t = optStr(body, "target_field").getOrElse("@timestamp")
      val fmts = (body \ "formats") match {
        case JArray(xs) if xs.nonEmpty => xs.map {
          case JString(s) => s
          case other => throw new IllegalArgumentException(
            s"processor $i (date): formats must be strings, got $other")
        }
        case other => throw new IllegalArgumentException(
          s"processor $i (date) needs a non-empty formats array, " +
            s"got $other")
      }
      // first matching format wins (ES's rule); try_to_timestamp
      // yields null instead of failing, so the coalesce IS the
      // format ladder
      val tries = fmts.map {
        case "ISO8601" => try_to_timestamp(col(f).cast("string"))
        case "UNIX" =>
          timestamp_seconds(col(f).try_cast("double"))
        case "UNIX_MS" =>
          timestamp_millis(col(f).try_cast("long"))
        case pattern =>
          try_to_timestamp(col(f).cast("string"), lit(pattern))
      }
      val parsed = coalesce(tries: _*)
      df.withColumn(t,
        when(col(f).isNotNull && parsed.isNull,
          raise_error(concat(lit(s"date: `$f` value '"),
            col(f).cast("string"),
            lit(s"' matches none of ${fmts.mkString("[", ", ", "]")}"))))
          .otherwise(parsed))
    case "dissect" =>
      val f = str(body, "field", i, kind)
      requireField(df, f, i, kind)
      val pattern = str(body, "pattern", i, kind)
      // alternating literals and %{keys}: literals escape into an
      // anchored regex, keys become capture groups (non-greedy
      // except the last — dissect's longest-tail rule)
      val keyRe = "%\\{([^}]*)\\}".r
      val keys = keyRe.findAllMatchIn(pattern).map(_.group(1)).toSeq
      require(keys.nonEmpty,
        s"processor $i (dissect): pattern has no %{key} fields")
      require(keys.forall(_.nonEmpty),
        s"processor $i (dissect): empty %{} key")
      require(keys.distinct.size == keys.size,
        s"processor $i (dissect): repeated keys in $pattern")
      val literals = java.util.regex.Pattern
        .compile(keyRe.regex).split(pattern, -1).toSeq
      require(literals.tail.dropRight(1).forall(_.nonEmpty),
        s"processor $i (dissect): adjacent %{} fields with no " +
          "literal separator are ambiguous")
      val regex = literals.map(java.util.regex.Pattern.quote)
        .zipWithIndex.map { case (l, j) =>
          if (j == 0) l else s"(${if (j == literals.size - 1) ".*"
          else ".*?"})$l"
        }.mkString
      val anchored = s"^$regex$$"
      val guarded = when(col(f).isNotNull && !col(f).rlike(anchored),
        raise_error(concat(lit(s"dissect: `$f` value '"), col(f),
          lit(s"' does not match pattern $pattern"))))
      val withKeys = keys.zipWithIndex.foldLeft(df) {
        case (acc, (k, j)) =>
          acc.withColumn(k,
            guarded.otherwise(
              regexp_extract(col(f), anchored, j + 1)))
      }
      withKeys
    case "enrich" =>
      val policyName = str(body, "policy_name", i, kind)
      val f = str(body, "field", i, kind)
      requireField(df, f, i, kind)
      val t = str(body, "target_field", i, kind)
      require(!df.columns.contains(t),
        s"processor $i (enrich): target `$t` already exists")
      val pol = policies.getOrElse(policyName,
        throw new IllegalArgumentException(
          s"processor $i (enrich): unknown policy `$policyName` " +
            s"(have: ${policies.keys.toSeq.sorted.mkString(", ")})"))
      pol.enrichFields.foreach(ef =>
        require(pol.lookup.columns.contains(ef),
          s"enrich policy `$policyName`: field `$ef` not in lookup"))
      // the enrich index is a broadcast dimension — the frame never
      // shuffles; max_matches=1 semantics (ES's default) via a loud
      // in-plan uniqueness guard (a dup-keyed enrich index is a
      // policy bug, not a tie to break silently with first-wins)
      val lk = pol.lookup
        .select(col(pol.matchField).as("_match_key"),
          struct(pol.enrichFields.map(col): _*).as("_enrich_val"))
        .groupBy("_match_key")
        .agg(count(lit(1)).as("_n"), first(col("_enrich_val")).as(t))
        .select(col("_match_key"),
          when(col("_n") > 1, raise_error(concat(
            lit(s"enrich policy `$policyName`: duplicate match key '"),
            col("_match_key").cast("string"), lit("'"))))
            .otherwise(col(t)).as(t))
      df.join(broadcast(lk), col(f) === col("_match_key"), "left")
        .drop("_match_key")
    case "script" =>
      throw new IllegalArgumentException(
        s"processor $i: `script` is arbitrary Painless — refused " +
          "(use Column expressions on the frame; see the " +
          "scripted_metric adjudication)")
    case "grok" =>
      throw new IllegalArgumentException(
        s"processor $i: `grok` ships Lucene's pattern library — use " +
          "`dissect` (literal separators) or a Column regexp")
    case "fail" | "drop" =>
      throw new IllegalArgumentException(
        s"processor $i: `$kind` is conditional-only in practice and " +
          "conditions are Painless — filter the frame with a Column " +
          "predicate instead")
    case other =>
      throw new IllegalArgumentException(
        s"processor $i: `$other` not supported")
  }
}
