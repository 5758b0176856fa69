package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.{Tables, TestSpark}
import java.sql.Timestamp

class EventsStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("windowed counts over a file stream match the batch aggregation") {
    import spark.implicits._
    // stage the events table as a stream source directory
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val batch = Tables.load(spark, TestSpark.sfDir, "events")
    batch.write.mode("overwrite").parquet(dir)

    val agg = EventsStream.windowedCounts(
      EventsStream.readEvents(spark, dir), "1 day", "1 minute")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      // append mode only emits windows the watermark has passed; with
      // static input the last day stays open — compare the closed set
      val got = spark.table("win_out")
        .select("window_start", "event_type", "cnt")
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val want = batch
        .groupBy(date_trunc("day", col("ts")).as("d"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(got.nonEmpty)
      got.foreach { case (k, v) => assert(want(k) == v, s"window $k") }
    } finally q.stop()
  }

  test("sessionizer over the real events table matches the batch lag-gap query") {
    import spark.implicits._
    implicit val s2 = spark
    implicit val sqlCtx2: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Tables.load(spark, TestSpark.sfDir, "events")
    val mem = MemoryStream[EventsStream.Event]
    mem.addData(events.select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventsStream.Event].collect().toSeq: _*)
    val q = EventsStream.sessionize(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_real").start()
    try {
      q.processAllAvailable()
      // push watermark far forward so every session closes
      mem.addData(EventsStream.Event(-1L,
        new Timestamp(4102444800000L), -1L, "t", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sess_real")
        .filter($"user_id" >= 0)
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_sessions"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = graft.queries.Relational
        .queries("w2_sessionize")(spark, TestSpark.sfDir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch,
        s"stream=$streamed\nbatch=$batch")
    } finally q.stop()
  }

  test("streaming exact dedup drops repeated keys within the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[EventsStream.Event]
    val base = 1000000L * 60000
    def ev(id: Long, user: Long, minute: Long): EventsStream.Event =
      EventsStream.Event(id, new Timestamp(base + minute * 60000), user, "t", 1.0)
    // user 1 appears three times close together (dups), user 2 once
    mem.addData(ev(1, 1, 0), ev(2, 1, 1), ev(3, 2, 2), ev(4, 1, 3))
    val deduped = EventsStream.dedupedEvents(
      mem.toDF(), Seq("user_id"), watermark = "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val users = spark.table("dedup_out")
        .select("user_id").as[Long].collect().sorted.toSeq
      assert(users == Seq(1L, 2L)) // one row per key, first wins
    } finally q.stop()
  }

  test("stateful sessionizer closes sessions on gap and matches batch lag-gap logic") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[EventsStream.Event]
    // base offset: an event exactly at epoch 0 equals the initial
    // watermark and is discarded as late — not a property we want the
    // test hinging on
    val base = 1000000L * 60000
    def ev(id: Long, user: Long, minute: Long): EventsStream.Event =
      EventsStream.Event(id, new Timestamp(base + minute * 60000), user, "t", 1.0)

    // user 7: events at minute 0,10,20 (one session), then 120,125
    // (second session); a late watermark-driver event at minute 600
    mem.addData(ev(1, 7, 0), ev(2, 7, 10), ev(3, 7, 20),
      ev(4, 7, 120), ev(5, 7, 125), ev(6, 99, 600))
    val out = EventsStream.sessionize(mem.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      mem.addData(ev(7, 99, 1200)) // push watermark forward to close state
      q.processAllAvailable()
      val all = spark.table("sess_out").as[EventsStream.Session].collect()
      info(s"emitted sessions: ${all.mkString("; ")}")
      val sessions = all.filter(_.user_id == 7L).sortBy(_.session_start.getTime)
      assert(sessions.length == 2)
      assert(sessions(0).n_events == 3 && sessions(1).n_events == 2)
      assert(sessions(0).session_end.getTime == base + 20 * 60000)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch interval join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ssj").toString
    val batch = Tables.load(spark, TestSpark.sfDir, "events")
    batch.write.mode("overwrite").parquet(dir)

    def side(tpe: String, p: String) =
      EventsStream.readEvents(spark, dir).filter(col("event_type") === tpe)
        .select(col("event_id").as(s"${p}_id"), col("user_id").as(s"${p}_user"),
          col("ts").as(s"${p}_ts"))
    val j = EventsStream.intervalJoin(side("purchase", "p"), "p_ts", "p_user",
        side("click", "c"), "c_ts", "c_user", lookbackSeconds = 3600)
      .select("p_id", "c_id")
    val q = j.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val p = batch.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      val c = batch.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      val want = p.join(c, col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 3600 SECONDS") &&
          col("c_ts") <= col("p_ts"))
        .select("p_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.nonEmpty && got == want)
    } finally q.stop()
  }
}
