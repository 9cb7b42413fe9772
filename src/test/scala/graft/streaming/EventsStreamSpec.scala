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
