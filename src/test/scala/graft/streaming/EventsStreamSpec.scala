package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The streaming twin must produce the same hourly aggregation as the
  * batch path once all data is processed (no late data beyond the
  * watermark in the fixture, so nothing is dropped). */
class EventsStreamSpec extends SparkSpec {

  private val eventsPath = "/root/testdata/sf0.001/events.parquet"

  /** FileStreamSource needs a directory; stage the single file into one. */
  private lazy val eventsDir: String = {
    val d = tmpDir("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(eventsPath),
      java.nio.file.Paths.get(d, "events.parquet"))
    d
  }

  test("batch hourly aggregation matches a direct computation") {
    val events = EventsStream.readEvents(spark, eventsPath)
    val got = EventsStream.hourlyByType(events)
    val expected = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
    assert(got.exceptAll(expected).count() === 0 && expected.exceptAll(got).count() === 0)
  }

  test("streaming hourly aggregation equals the batch result") {
    val streamed = EventsStream.hourlyByTypeStream(spark, eventsDir)
    val q = streamed.writeStream
      .format("memory").queryName("hourly_stream_test")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("hourly_stream_test")
      .select(col("window.start").cast("timestamp_ntz").as("hour"), col("event_type"),
        col("n_events"), col("total_value"))
    val expected = EventsStream.hourlyByType(EventsStream.readEvents(spark, eventsPath))
    assert(got.count() > 0)
    assert(got.exceptAll(expected).count() === 0 && expected.exceptAll(got).count() === 0,
      "stream (complete mode) must equal batch aggregation")
  }

  test("stream-stream interval join equals the batch interval join") {
    // TimestampType (not NTZ): both watermark columns must be event-time
    val src = EventsStream.eventsStreamSource(spark, eventsDir)
    val joined = EventsStream.intervalJoinStream(
      src.where(col("event_type") === "view"),
      src.where(col("event_type") === "click"))
    val q = joined.writeStream
      .format("memory").queryName("interval_join_test")
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("interval_join_test")
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts").cast("timestamp_ntz").as("view_ts"),
        col("click_ts").cast("timestamp_ntz").as("click_ts"))
    val expected = EventsStream.intervalJoin(
      EventsStream.readEvents(spark, eventsPath))
    assert(got.count() > 0, "fixture must produce at least one attribution pair")
    assert(got.exceptAll(expected).count() === 0 && expected.exceptAll(got).count() === 0,
      "stream-stream join must equal the batch interval join (no late data in fixture)")
  }

  test("stream-static enrichment equals the batch join") {
    import spark.implicits._
    // a static user dimension: tier derived deterministically
    val dim = (0L to 100L).map(u => (u, s"tier${u % 3}")).toDF("user_id", "tier")
    val src = EventsStream.eventsStreamSource(spark, eventsDir)
      .select("event_id", "user_id", "event_type")
    val q = EventsStream.enrichStream(src, dim, "user_id").writeStream
      .format("memory").queryName("enrich_test")
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("enrich_test")
    val expected = spark.read.parquet(eventsPath)
      .select("event_id", "user_id", "event_type")
      .join(dim, Seq("user_id"))
    assert(got.count() > 0)
    assert(got.exceptAll(expected).count() === 0 && expected.exceptAll(got).count() === 0)
  }

  test("session_window batch form matches the window-function sessionizer") {
    val events = EventsStream.readEvents(spark, eventsPath)
    val native = EventsStream.sessionWindow(events)
      .select(col("user_id"), col("session_start"), col("n_events"))
    // the two formulations only differ at an exact-30-min gap boundary
    // (absent from the fixture) and in how session_end is defined
    val wf = EventsStream.sessionize(events)
      .select(col("user_id"), col("session_start").as("session_start"),
        col("n_events"))
    assert(native.exceptAll(wf).count() === 0 && wf.exceptAll(native).count() === 0)
  }

  test("stateful streaming sessionization emits exactly the batch sessions") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    def ts(min: Int) = java.sql.Timestamp.valueOf(base.plusMinutes(min))
    val real = Seq(
      (1L, ts(0)), (1L, ts(10)),   // user 1 session A (closed by the 50' event)
      (1L, ts(50)),                // user 1 session B (closed by sentinel)
      (2L, ts(0)), (2L, ts(95)))   // user 2: two single-event sessions
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val q = EventsStream.sessionizeStreamStateful(stream.toDS())
      .writeStream.format("memory").queryName("sess_stateful")
      .outputMode("append").start()
    try {
      stream.addData(real: _*); q.processAllAvailable()
      // sentinels close each user's open session in-batch
      stream.addData((1L, ts(600)), (2L, ts(600))); q.processAllAvailable()
      // a third batch advances the watermark past sentinel_end + gap:
      // user 1's sentinel session closes via the data path, user 2's has
      // no data and must close via the EventTimeTimeout path
      stream.addData((1L, ts(1200))); q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("sess_stateful")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val realSessions = emitted.filter(_._2.before(ts(600)))
    assert(realSessions === Set(
      (1L, ts(0), ts(10), 2L),
      (1L, ts(50), ts(50), 1L),
      (2L, ts(0), ts(0), 1L),
      (2L, ts(95), ts(95), 1L)))
    // timeout-path proof: user 2's sentinel session arrived with no
    // successor event, so its emission required the event-time timeout
    assert(emitted.contains((2L, ts(600), ts(600), 1L)))
  }

  test("stateful sessionizer merges cross-batch out-of-order events correctly") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    def ts(min: Int) = java.sql.Timestamp.valueOf(base.plusMinutes(min))
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val q = EventsStream.sessionizeStreamStateful(stream.toDS())
      .writeStream.format("memory").queryName("sess_ooo")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(60))); q.processAllAvailable() // watermark -> 00:30
      // out-of-order but above the watermark: must extend the session
      // BACKWARD, not be merged under the existing start
      stream.addData((1L, ts(45))); q.processAllAvailable()
      stream.addData((1L, ts(600))); q.processAllAvailable()
      stream.addData((1L, ts(1200))); q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("sess_ooo")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(emitted.contains((1L, ts(45), ts(60), 2L)),
      s"out-of-order event must move session_start back to 00:45; got $emitted")
  }

  test("streaming exact dedup drops in-horizon duplicates, bounded state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    def ts(min: Int) = java.sql.Timestamp.valueOf(base.plusMinutes(min))
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = graft.ops.Dedup.exactDedupStream(
        stream.toDS().toDF("doc_id", "text", "ts"),
        "doc_id", "text", "ts", horizon = "30 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      stream.addData((1L, "the quick fox", ts(0)), (2L, "another doc", ts(1)))
      q.processAllAvailable()
      // same normalized content (punctuation/case differ) within horizon
      stream.addData((3L, "The QUICK-fox!!", ts(5)), (4L, "fresh content", ts(6)))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("dedup_stream").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && kept.contains(2L) && kept.contains(4L))
    assert(!kept.contains(3L), "in-horizon duplicate content must be dropped")
  }

  test("streaming session_window (append) finalizes sessions past the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    def ts(min: Int) = java.sql.Timestamp.valueOf(base.plusMinutes(min))
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val q = stream.toDS().toDF("user_id", "ts")
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream.format("memory").queryName("sess_window_stream")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(0)), (1L, ts(10)), (2L, ts(5))); q.processAllAvailable()
      // advance the watermark far past session end + gap so the windows
      // above finalize and emit in append mode
      stream.addData((1L, ts(600))); q.processAllAvailable()
      stream.addData((1L, ts(1200))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_window_stream")
      .select(col("user_id"), col("session_window.start").as("start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    // sessions entirely before the final watermark must have emitted
    assert(got.contains((1L, ts(0), 2L)), s"user 1's merged 2-event session missing from $got")
    assert(got.contains((2L, ts(5), 1L)), s"user 2's session missing from $got")
  }

  test("sessionize: gap over 30 minutes starts a new session") {
    import spark.implicits._
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    val rows = Seq(
      (1L, base),                      // session 1
      (1L, base.plusMinutes(10)),      // session 1
      (1L, base.plusMinutes(50)),      // gap 40min -> session 2
      (2L, base)                       // other user -> own session 1
    ).toDF("user_id", "ts")
    val r = EventsStream.sessionize(rows).orderBy("user_id", "session_seq").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ===
      Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }
}
