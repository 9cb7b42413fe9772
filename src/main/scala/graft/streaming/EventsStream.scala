package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table (event_id, ts[nanos],
  * user_id, event_type, value, props). The reference is batch-only — its
  * docs treat late data as an ETL partitioning problem
  * (docs/source/lakeshack.rst:130-160) — so this is a north_star
  * extension: the same windowed aggregation exposed as BOTH a batch
  * DataFrame (oracle-checkable) and a streaming query (watermark + window,
  * tested via the memory sink).
  *
  * Note on nanos: the driver testdata stores `ts` as Parquet
  * TIMESTAMP(NANOS), which Spark's reader only admits as LongType via
  * `spark.sql.legacy.parquet.nanosAsLong`; we truncate to microseconds —
  * identical to DuckDB's CAST(ts AS TIMESTAMP) semantics.
  */
/** One closed session emitted by the stateful streaming sessionizer.
  * Top-level (not nested in the object): Spark's state-store encoder
  * generates Janino code that cannot instantiate object-nested case
  * classes. */
case class Session(user_id: Long, session_start: java.sql.Timestamp,
                   session_end: java.sql.Timestamp, n_events: Long)

/** The per-user state of the stateful sessionizer: one open session. */
case class OpenSession(startMs: Long, endMs: Long, n: Long)

object EventsStream {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos (see nanosAsLong)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Loads events with `ts` as TIMESTAMP_NTZ (micros, truncated from
    * nanos exactly like DuckDB's CAST(ts AS TIMESTAMP)). NTZ end-to-end
    * keeps wall-clock semantics identical to the naive oracle values. */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // `ts div 1000` is integral division on the long nanos — `ts / 1000`
    // would go through DOUBLE, whose 53-bit mantissa cannot represent
    // ~1.7e18 and rounds the last microsecond.
    spark.read.parquet(path)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  }

  /** Tumbling-window aggregation, batch form. Deterministic (no floats
    * ungrounded: value sums decimal-cast) so it hash-matches a DuckDB
    * time_bucket oracle. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))

  /** The same aggregation as a streaming query with a watermark: late
    * rows beyond 30 minutes are dropped, windows finalize incrementally.
    * State scales with (open windows × event types) — bounded — and the
    * shuffle is the same hash exchange as the batch plan.
    */
  def hourlyByTypeStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // TimestampType, not the NTZ readEvents produces: Spark requires the
    // watermark column to be TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_
    // TYPE otherwise). Window labels are therefore session-tz wall
    // clocks; they match the batch twin's NTZ labels only under the
    // engine-wide spark.sql.session.timeZone=UTC this library pins
    // (build.sbt, Verify, Bench) — asserted by EventsStreamSpec.
    spark.readStream.schema(eventsSchema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
  }

  /** Native `session_window` sessionization, batch form: Spark merges
    * events whose gaps are under `gapMinutes` into one window per user;
    * window end = last event + gap. Same islands as `sessionize` (the
    * window-function form), but expressed with the built-in operator so
    * the identical code shape runs under Structured Streaming. */
  def sessionWindow(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Stateful streaming sessionization via `flatMapGroupsWithState` —
    * the custom-state escape hatch for semantics `session_window` can't
    * express (here: emit a session the moment a successor event proves
    * it closed, not only at watermark finalization).
    *
    * State per user is ONE open session (three longs) — bounded by
    * |active users|, not by event volume. Within a batch events are
    * sorted per group (groups are small: one user's slice of a batch);
    * a gap > `gapMinutes` closes the open session and emits it
    * immediately; the final open session is emitted when the event-time
    * timeout fires (watermark passed end + gap, so no in-order event
    * can extend it). Late events beyond the watermark are dropped by
    * the upstream `withWatermark`, the standard correctness contract.
    */
  def sessionizeStreamStateful(events: Dataset[(Long, java.sql.Timestamp)],
                               gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.toDF("user_id", "ts")
      .withWatermark("ts", s"$gapMinutes minutes")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.endMs), s.n))
          } else {
            val ts = rows.map(_._2.getTime).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var open = state.getOption.orNull
            for (t <- ts) {
              if (open == null) open = OpenSession(t, t, 1L)
              else if (t - open.endMs > gapMs) {
                closed += Session(user, new java.sql.Timestamp(open.startMs),
                  new java.sql.Timestamp(open.endMs), open.n)
                open = OpenSession(t, t, 1L)
              } else open = OpenSession(open.startMs, math.max(open.endMs, t), open.n + 1L)
            }
            state.update(open)
            // fire once the watermark proves no event can extend the session
            state.setTimeoutTimestamp(open.endMs + gapMs)
            closed.iterator
          }
      }
  }

  /** Sessionization with a 30-minute gap per user — the classic stateful
    * streaming shape, batch form: session id = running count of
    * gap-exceeding boundaries per user (window functions). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    val withGap = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      // gap compared in MICROSECONDS: casting to long truncates to whole
      // seconds, so a true gap of e.g. 1800.8s would round down to 1800
      // and merge sessions the fractional-second oracle splits
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) > gapMinutes * 60000000L,
          1L).otherwise(0L))
      .withColumn("session_seq", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withGap.groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }
}
