package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** One closed session emitted by the stateful streaming sessionizer.
  * Top-level (not nested in the object): Spark's state-store encoder
  * generates Janino code that cannot instantiate object-nested case
  * classes. */
case class Session(user_id: Long, session_start: java.sql.Timestamp,
                   session_end: java.sql.Timestamp, n_events: Long)

/** One entry of the stateful sessionizer's per-user state (a LIST of
  * open sessions — see sessionizeStreamStateful); times in micros. */
case class OpenSession(startMs: Long, endMs: Long, n: Long)

/** Structured Streaming over the `events` table (event_id, ts[nanos],
  * user_id, event_type, value, props). The reference is batch-only — its
  * docs treat late data as an ETL partitioning problem
  * (docs/source/lakeshack.rst:130-160) — so this is a north_star
  * extension: the same windowed aggregation exposed as BOTH a batch
  * DataFrame (oracle-checkable) and a streaming query (watermark + window,
  * tested via the memory sink).
  *
  * Note on `ts` representation: the driver testdata has stored `ts` as
  * Parquet TIMESTAMP(NANOS) (readable only as LongType via
  * `spark.sql.legacy.parquet.nanosAsLong`) in some generations and as
  * TIMESTAMP(MICROS) (naive → TIMESTAMP_NTZ, or UTC-adjusted →
  * TIMESTAMP) in others. The reference survives exactly this class of
  * representation drift with its safe-schema/cast-back machinery
  * (lakeshack/lakeshack.py:352-363,414-456); here the equivalent is
  * `normalizeTs`, which branches on the LOADED dtype rather than
  * assuming one physical type.
  */
object EventsStream {

  /** Converts whatever representation the parquet carried for `ts` into
    * the requested timestamp type (`"timestamp_ntz"` or `"timestamp"`):
    * nanos-as-long is integrally truncated to micros (DuckDB CAST
    * semantics), native timestamp columns are cast directly. Wall-clock
    * values agree across the branches under the engine-wide
    * spark.sql.session.timeZone=UTC this library pins. */
  def normalizeTs(df: DataFrame, target: String): DataFrame =
    df.schema("ts").dataType match {
      // `ts div 1000` is integral division on the long nanos — `ts / 1000`
      // would go through DOUBLE, whose 53-bit mantissa cannot represent
      // ~1.7e18 and rounds the last microsecond.
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(target))
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts", col("ts").cast(target))
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other — expected nanos-as-long, " +
          "TIMESTAMP_NTZ, or TIMESTAMP (testdata schema drift?)")
    }

  /** Loads events with `ts` as TIMESTAMP_NTZ (micros). NTZ end-to-end
    * keeps wall-clock semantics identical to the naive oracle values.
    *
    * SIDE EFFECT: sets `spark.sql.legacy.parquet.nanosAsLong` on the
    * session and leaves it set — the flag is consulted both at schema
    * inference and at execution, so restoring it between the two would
    * corrupt a TIMESTAMP(NANOS)-generation read. It is inert for
    * micros-generation data. */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(path), "timestamp_ntz")
  }

  /** Streaming source over the events directory with `ts` normalized to
    * TimestampType (watermarks require TIMESTAMP, not NTZ). The schema
    * is inferred from the parquet footers ALREADY in the directory (a
    * driver-side footer read, not a data scan) so the source adapts to
    * whichever `ts` representation this testdata generation uses. */
  def eventsStreamSource(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir).schema
    normalizeTs(spark.readStream.schema(schema).parquet(dir), "timestamp")
  }

  /** The hourly aggregates, shared by the batch and streaming twins so
    * the hash-match contract between them cannot drift through an edit
    * to one copy. */
  private def hourlyAggs: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_events"),
    sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))

  /** Tumbling-window aggregation, batch form. Deterministic (no floats
    * ungrounded: value sums decimal-cast) so it hash-matches a DuckDB
    * time_bucket oracle. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(hourlyAggs.head, hourlyAggs.tail: _*)

  /** The same aggregation as a streaming query with a watermark: late
    * rows beyond 30 minutes are dropped, windows finalize incrementally.
    * State scales with (open windows × event types) — bounded — and the
    * shuffle is the same hash exchange as the batch plan.
    */
  def hourlyByTypeStream(spark: SparkSession, dir: String): DataFrame = {
    // TimestampType, not the NTZ readEvents produces: Spark requires the
    // watermark column to be TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_
    // TYPE otherwise). Window labels are therefore session-tz wall
    // clocks; they match the batch twin's NTZ labels only under the
    // engine-wide spark.sql.session.timeZone=UTC this library pins
    // (build.sbt, Verify, Bench) — asserted by EventsStreamSpec.
    eventsStreamSource(spark, dir)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(hourlyAggs.head, hourlyAggs.tail: _*)
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
    * express (here: emit a session the moment the watermark proves it
    * closed, with full support for out-of-order events).
    *
    * State per user is the LIST of open sessions — more than one can be
    * open at once precisely because watermarks admit out-of-order
    * events: an event earlier than the current session's start (legal
    * while above the watermark) may seed its own session, and a later
    * event may BRIDGE two open sessions into one. A single-open-session
    * state (the obvious simplification) silently mis-starts sessions in
    * that case. The list is bounded by (out-of-orderness window / gap),
    * typically 1-2 entries.
    *
    * Times are carried in MICROSECONDS (`Timestamp.getTime` alone is
    * millisecond-truncated; the batch `sessionize` comment explains why
    * sub-second precision is load-bearing). A session is emitted only
    * when the event-time watermark passes its end + gap — by then no
    * admissible event can touch it, in-order or not; the timeout fires
    * for whichever open session finalizes first.
    */
  def sessionizeStreamStateful(events: Dataset[(Long, java.sql.Timestamp)],
                               gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L
    // floorDiv, not /: truncation-toward-zero is off by a full second
    // for pre-epoch timestamps (getTime = -800 would round UP to 0)
    def toUs(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    events.toDF("user_id", "ts")
      .withWatermark("ts", s"$gapMinutes minutes")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[OpenSession], Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[List[OpenSession]]) =>
          var sessions = state.getOption.getOrElse(Nil)
          if (!state.hasTimedOut) {
            // merge each event into the session list: absorb/extend any
            // session within gap on either side; an event landing between
            // two sessions can bridge them into one
            for (t <- rows.map(r => toUs(r._2))) {
              val (touching, apart) = sessions.partition(s =>
                t >= s.startMs - gapUs && t <= s.endMs + gapUs)
              val merged = touching.foldLeft(OpenSession(t, t, 1L)) { (acc, s) =>
                OpenSession(math.min(acc.startMs, s.startMs),
                  math.max(acc.endMs, s.endMs), acc.n + s.n)
              }
              sessions = merged :: apart
            }
          }
          // emit every session the watermark has sealed (end + gap passed
          // — no admissible event can extend or bridge it anymore)
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (finalized, open) = sessions.partition(s =>
            wmUs > 0 && s.endMs + gapUs < wmUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            state.setTimeoutTimestamp(Math.floorDiv(open.map(_.endMs).min + gapUs, 1000L) + 1)
          }
          finalized.sortBy(_.startMs).iterator
            .map(s => Session(user, toTs(s.startMs), toTs(s.endMs), s.n))
      }
  }

  /** View→click attribution join, batch form: each view pairs with the
    * same user's clicks landing within `maxGapMinutes` after it — the
    * canonical interval join. Executes as one hash join keyed by
    * user_id with the time band as a residual filter; both sides stay
    * distributed (no broadcast needed), so the shape survives any
    * corpus size as long as single users aren't hot keys. */
  def intervalJoin(events: DataFrame, maxGapMinutes: Int = 10): DataFrame = {
    val views = events.where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("_cu"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    views.join(clicks,
        col("user_id") === col("_cu") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") < col("view_ts") + expr(s"INTERVAL $maxGapMinutes MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** The same attribution as a STREAM-STREAM join: watermarks on both
    * sides plus the time-band join condition let Spark bound each
    * side's buffered state (a view can be dropped once the click
    * watermark passes view_ts + gap), which is what makes the join
    * runnable forever. Inner join: output is identical to the batch
    * twin's, modulo rows dropped for genuine lateness. */
  def intervalJoinStream(views: DataFrame, clicks: DataFrame,
                         maxGapMinutes: Int = 10): DataFrame = {
    val v = views
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
      .withWatermark("view_ts", "30 minutes")
    val c = clicks
      .select(col("user_id").as("_cu"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", "30 minutes")
    v.join(c,
        col("user_id") === col("_cu") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") < col("view_ts") + expr(s"INTERVAL $maxGapMinutes MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Stream-static enrichment: a stream joined to a STATIC dimension
    * table. Spark broadcasts (or rescans) the static side per
    * micro-batch with no state at all — the third streaming join shape
    * next to stream-stream (intervalJoinStream) and self-aggregation
    * (hourlyByTypeStream). `dim` must be a batch DataFrame; inner join
    * keeps only events whose key the dimension knows. */
  def enrichStream(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key))

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
