package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The ES `_transform` API (continuous/batch transforms that
  * materialize an aggregated "entity-centric" index): the two
  * transform types as declarative plans —
  *
  *  - **pivot**: `group_by` sources (`terms`, `histogram`,
  *    `date_histogram` with calendar month/day/year or a fixed
  *    interval) × `aggregations` (avg/sum/min/max/value_count/
  *    cardinality) ⇒ ONE keyed aggregation with map-side partials —
  *    the exact shape a 100 TB pivot needs (no window, no join);
  *  - **latest**: `unique_key` + `sort` ⇒ newest row per key. ES
  *    breaks sort ties by ingest order, which is not replayable by
  *    definition; here a caller-named `tieBreaker` column closes the
  *    gap deterministically (the dd19 keep-best discipline) — ties
  *    WITHOUT a tie breaker refuse at build.
  *
  * The reference consumes transform DESTINATION indexes like any
  * other (eland frames over an entity-centric index); creating them
  * is the cluster-side half this engine executes directly. Checkpoint
  * /continuous sync is the Structured Streaming face (the st-family
  * covers streaming aggregation); this is the batch body.
  */
object Transforms {
  private implicit val formats: Formats = DefaultFormats

  private def lonely(v: JValue, what: String): (String, JValue) =
    v match {
      case JObject(List((k, b))) => (k, b)
      case other => throw new IllegalArgumentException(
        s"$what expects exactly one entry, got $other")
    }

  private def fieldOf(body: JValue, what: String): String =
    (body \ "field") match {
      case JString(f) => f
      case other => throw new IllegalArgumentException(
        s"$what needs a field, got $other")
    }

  private def numOf(v: JValue, what: String): Double = v match {
    case JInt(n)     => n.toDouble
    case JLong(n)    => n.toDouble
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a number, got $other")
  }

  /** `{"pivot": {"group_by": {...}, "aggregations": {...}}}` →
    * the aggregated frame, one row per group, ordered by the group
    * keys (a deterministic materialization order).
    */
  def pivot(df: DataFrame, json: String): DataFrame = {
    val body = (JsonMethods.parse(json) \ "pivot") match {
      case JNothing => throw new IllegalArgumentException(
        "transform body needs a pivot object")
      case x => x
    }
    val named: Seq[(String, Column)] = (body \ "group_by") match {
      case JObject(gs) if gs.nonEmpty => gs.map { case (name, spec) =>
        val (kind, b) = lonely(spec, s"group_by.$name")
        val c = kind match {
          case "terms" => col(fieldOf(b, "terms"))
          case "histogram" =>
            val f = col(fieldOf(b, "histogram")).cast("double")
            val interval = numOf(b \ "interval", "histogram.interval")
            require(interval > 0,
              s"histogram.interval must be > 0, got $interval")
            floor(f / interval) * interval
          case "date_histogram" =>
            val f = col(fieldOf(b, "date_histogram"))
            ((b \ "calendar_interval"), (b \ "fixed_interval")) match {
              case (JString(ci), JNothing) => ci match {
                case "month" | "1M" => date_trunc("month", f)
                case "day" | "1d"   => date_trunc("day", f)
                case "year" | "1y"  => date_trunc("year", f)
                case "week" | "1w"  => date_trunc("week", f)
                case other => throw new IllegalArgumentException(
                  s"calendar_interval `$other` not supported " +
                    "(month, day, year, week)")
              }
              case (JNothing, JString(fi)) =>
                val ms = parseMillis(fi)
                timestamp_millis(
                  floor(unix_millis(f).cast("double") / ms)
                    .cast("long") * ms)
              case _ => throw new IllegalArgumentException(
                "date_histogram needs exactly one of " +
                  "calendar_interval / fixed_interval")
            }
          case other => throw new IllegalArgumentException(
            s"group_by source `$other` not supported " +
              "(terms, histogram, date_histogram)")
        }
        name -> c.as(name)
      }
      case other => throw new IllegalArgumentException(
        s"pivot needs a non-empty group_by, got $other")
    }
    val groups = named.map(_._2)
    val aggs = (body \ "aggregations") match {
      case JObject(as) if as.nonEmpty => as.map { case (name, spec) =>
        val (kind, b) = lonely(spec, s"aggregations.$name")
        val f = col(fieldOf(b, s"$kind"))
        val c = kind match {
          case "avg" => graft.queries.QueryUtil.rhu(
            avg(f.cast("double")), 6)
          case "sum" => graft.queries.QueryUtil.rhu(
            sum(f.cast("double")), 6)
          case "min" => min(f)
          case "max" => max(f)
          case "value_count" => count(f).cast("long")
          case "cardinality" => count_distinct(f).cast("long")
          case other => throw new IllegalArgumentException(
            s"aggregation `$other` not supported (avg, sum, min, " +
              "max, value_count, cardinality)")
        }
        c.as(name)
      }
      case other => throw new IllegalArgumentException(
        s"pivot needs non-empty aggregations, got $other")
    }
    // ES's pivot default: a doc missing ANY group_by value lands in
    // no bucket (missing_bucket: false) — filter BEFORE the shuffle
    // so null keys neither bucket nor sort-position-diverge across
    // engines
    df.filter(groups.map(_.isNotNull).reduce(_ && _))
      .groupBy(groups: _*)
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(named.map { case (n, _) => col(n) }: _*)
  }

  private def parseMillis(s: String): Long = {
    val m = "^(\\d+)(ms|s|m|h|d)$".r.findFirstMatchIn(s).getOrElse(
      throw new IllegalArgumentException(
        s"fixed_interval `$s` must be <n>(ms|s|m|h|d)"))
    val n = m.group(1).toLong
    require(n > 0, s"fixed_interval must be positive, got $s")
    n * (m.group(2) match {
      case "ms" => 1L
      case "s"  => 1000L
      case "m"  => 60000L
      case "h"  => 3600000L
      case "d"  => 86400000L
    })
  }

  /** `{"latest": {"unique_key": [...], "sort": "f"}}` → the newest
    * row per key. `tieBreaker` closes ES's ingest-order tie (a
    * column whose (sort desc, tieBreaker desc) order is total per
    * key — typically the id).
    */
  def latest(df: DataFrame, json: String, tieBreaker: String)
      : DataFrame = {
    val body = (JsonMethods.parse(json) \ "latest") match {
      case JNothing => throw new IllegalArgumentException(
        "transform body needs a latest object")
      case x => x
    }
    val keys = (body \ "unique_key") match {
      case JArray(ks) if ks.nonEmpty => ks.map {
        case JString(k) => k
        case other => throw new IllegalArgumentException(
          s"unique_key entries must be strings, got $other")
      }
      case other => throw new IllegalArgumentException(
        s"latest needs a non-empty unique_key array, got $other")
    }
    val sort = (body \ "sort") match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(
        s"latest needs a sort field, got $other")
    }
    require(df.columns.contains(tieBreaker),
      s"tie breaker `$tieBreaker` not in the frame")
    // newest-per-key is a keyed max, not a global window: the
    // ExtremumBy shape (one aggregation with map-side partials)
    // via a (sort, tie, row) struct max — scales like any groupBy
    val packed = struct(col(sort), col(tieBreaker).as("_tie"),
      struct(df.columns.map(col): _*).as("_row"))
    df.groupBy(keys.map(col): _*)
      .agg(max(packed).as("_best"))
      .select(col("_best._row.*"))
      .orderBy(keys.map(col): _*)
  }
}
