package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Structured Streaming over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no streaming at all (SURVEY.md §2.9 — eland's
  * "streaming" is client-side result pagination); this module is the
  * parity-plus slot. Batch and streaming share the same expressions,
  * so the windowed aggregation here computes exactly what the batch
  * `ev_window_tumble` query computes per closed window.
  *
  * Scale notes: watermarking bounds state; the sessionizer keys state
  * by user_id, so state size is O(active users), not O(events); both
  * shuffle once on the grouping key, same as the batch plan.
  */
object EventsStream {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of parquet event files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling-window count/sum per event_type with a late-data
    * watermark. Append mode: a window emits once, when the watermark
    * passes its end.
    */
  def windowedCounts(events: DataFrame,
                     window_ : String = "1 hour",
                     watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Streaming exact dedup — the streaming face of
    * `Dedup.exactKeepFirst` for a continuously-ingested corpus: drop
    * rows whose dedup key (e.g. a content digest) was already seen,
    * with state bounded by the watermark via
    * `dropDuplicatesWithinWatermark` (exact dedup within the lateness
    * horizon, O(keys-in-horizon) state instead of unbounded). The batch
    * equivalent of each micro-batch's output is `distinct` on the key
    * over the same horizon.
    */
  def dedupedEvents(events: DataFrame, keyCols: Seq[String],
                    watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join: each left row joins right rows with
    * `leftKey == rightKey` and `rightTime` within
    * `[leftTime - lookbackSeconds, leftTime]` (e.g. purchases joined
    * to the clicks that preceded them). Column names must be disjoint
    * — rename before calling.
    *
    * Both sides carry a watermark and the join condition bounds the
    * time range, which is exactly what Spark needs to size and expire
    * the join state buffers: state is O(events inside
    * watermark+lookback), not unbounded. Inner-join matches emit as
    * soon as both sides arrive — no watermark wait on the output path.
    */
  def intervalJoin(left: DataFrame, leftTime: String, leftKey: String,
                   right: DataFrame, rightTime: String, rightKey: String,
                   lookbackSeconds: Long,
                   watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark(leftTime, watermark)
    val r = right.withWatermark(rightTime, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTime) >= col(leftTime) -
          expr(s"INTERVAL $lookbackSeconds SECONDS") &&
        col(rightTime) <= col(leftTime))
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(start: Long, lastTs: Long, n: Int, sum: Double)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Int, sum_value: Double)

  /** Gap-based sessionization with custom state:
    * flatMapGroupsWithState keyed by user, 30-minute inactivity gap,
    * event-time timeout so sessions close when the watermark passes.
    * The batch equivalent is the lag-gap query `w2_sessionize`.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800)
                (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, new Timestamp(s.start),
              new Timestamp(s.lastTs), s.n, s.sum))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapSeconds * 1000 =>
                  // a late cross-batch event (allowed by the watermark) may be
                  // older than lastTs — never shrink the session interval
                  cur = Some(s.copy(start = math.min(s.start, t),
                    lastTs = math.max(s.lastTs, t), n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed += Session(user, new Timestamp(s.start),
                    new Timestamp(s.lastTs), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapSeconds * 1000)
            }
            closed.result().iterator
          }
      }
  }
}
