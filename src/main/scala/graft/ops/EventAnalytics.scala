package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics over the `events` table (event_id, ts, user_id,
  * event_type, value): calendar gap-fill with forward fill, ordered
  * funnel matching, and cohort retention. The reference has no event
  * analytics at all (its docs stop at time-partitioned ETL,
  * docs/source/lakeshack.rst:130-160) — these are the batch analytics a
  * product team runs against the same event lake the streaming side
  * (EventsStream) ingests, so they are north_star extensions in the
  * same category as sessionize/session_window.
  *
  * All three are declarative DataFrame plans: one keyed shuffle each
  * (plus one aggregate-sized join), window functions for the sequential
  * parts, no UDFs, no driver-side iteration over data. */
object EventAnalytics {

  /** Per-key hourly activity over a DENSE calendar: every (key, hour)
    * cell of the corpus-wide [min, max] hour span appears exactly once,
    * absent hours carry `n_events = 0` and a NULL `hour_sum`, and
    * `ff_sum` forward-fills the last observed hourly sum (NULL until
    * the key's first active hour). This is the gap-fill/resample step
    * every downstream time-series consumer (anomaly detection,
    * forecasting, charting) needs before it can difference or window
    * anything — missing-as-absent and missing-as-zero must be told
    * apart explicitly.
    *
    * Shape at scale: ONE shuffle aggregates events to (key, hour) cells
    * (map-side partial aggs collapse the raw volume first); the
    * corpus-wide span is a 1-row aggregate broadcast into the calendar
    * build; the calendar is `explode(sequence(...))` over the DISTINCT
    * keys — narrow, output-sized, never a join against raw events — and
    * the left join back to the cells co-partitions on (key, hour). The
    * forward fill is one window per key ordered by hour
    * (`last(ignoreNulls)` — Spark evaluates the running frame in one
    * pass per key). Dense output is (keys × span) rows by construction;
    * callers bound the span (a dashboard fills a day, not a decade), so
    * the explode factor is a config-sized constant, not a data term.
    *
    * Sums are decimal(18,2) inside the aggregation and the fill, cast
    * to double only at the output surface, so the forward-filled value
    * is bit-identical to the oracle's regardless of per-hour input
    * order. */
  def gapFill(events: DataFrame, keyCol: String = "user_id",
              tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    TextAnalysis.requireFree(events, "_hour", "_h", "hour", "n_events",
      "hour_sum", "ff_sum")
    val key = col(keyCol)
    // epoch-hour longs for the calendar arithmetic: NTZ wall-clock and
    // session-tz UTC agree, so cast-to-timestamp is value-preserving
    val hourExpr = date_trunc("hour", col(tsCol))
    val cells = events
      .groupBy(key, hourExpr.as("_hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).as("_sum"))
    val span = cells.agg(
      min(unix_timestamp(col("_hour").cast("timestamp")) / 3600).cast("long").as("_lo"),
      max(unix_timestamp(col("_hour").cast("timestamp")) / 3600).cast("long").as("_hi"))
    val calendar = cells.select(key).distinct()
      .crossJoin(broadcast(span))
      .select(key, explode(sequence(col("_lo"), col("_hi"))).as("_h"))
      .select(key, timestamp_seconds(col("_h") * 3600)
        .cast(events.schema(tsCol).dataType).as("hour"))
    val w = Window.partitionBy(key).orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar
      .join(cells.withColumnRenamed("_hour", "hour"), Seq(keyCol, "hour"), "left")
      .select(key, col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("_sum").cast("double").as("hour_sum"),
        last(col("_sum"), ignoreNulls = true).over(w).cast("double").as("ff_sum"))
  }

  /** Ordered funnel: for each user, the first time they completed step
    * 1, then the first step-2 event STRICTLY after that, then the first
    * step-3 event strictly after that, … with every step landing within
    * `horizonDays` of step 1. Returns one row per user who reached at
    * least step 1: (user, t_1…t_k, depth). The strict ordering is the
    * semantic point — a purchase logged before the view does not count,
    * which a per-step independent `min(ts)` would get wrong.
    *
    * Shape at scale: steps are matched in ONE shuffle — events are
    * filtered to the step types (narrow, pushed to the scan), grouped
    * by user with `collect_list(struct(ts, step_idx))`, and the
    * sequential first-after-previous recurrence folds over that
    * per-user array with `filter`/`array_min` (codegen'd higher-order
    * functions, no UDF). The k-step recurrence is inherently
    * sequential, so the alternatives are k self-joins (k shuffles of
    * the event volume) or this: per-user state sized by that user's
    * step-type events inside the horizon — bounded in practice by the
    * step-type filter (funnels track rare conversion events, not
    * `view` firehoses; a pathological power-user key degrades one
    * task, not the stage, and AQE skew-split covers the tail). */
  def funnel(events: DataFrame, steps: Seq[String], horizonDays: Int = 7,
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty && steps.size <= 8,
      s"funnel needs 1..8 steps, got ${steps.size}")
    TextAnalysis.requireFree(events,
      Seq("_sidx", "_evs", "depth") ++ steps.indices.map(i => s"t_${i + 1}"): _*)
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(null).cast("int")) { case (acc, (s, i)) =>
        when(col(typeCol) === s, lit(i)).otherwise(acc) }
    val grouped = events
      .where(col(typeCol).isin(steps: _*))
      .select(col(userCol), col(tsCol).as("_ts"), stepIdx.as("_sidx"))
      .groupBy(userCol)
      .agg(collect_list(struct(col("_ts"), col("_sidx"))).as("_evs"))
    // t_1 = min ts of step 0; t_{i+1} = min step-i ts strictly after t_i
    // and within the horizon of t_1 — each as a named column so the
    // recurrence is evaluated once, not re-expanded per reference
    val withSteps = steps.indices.foldLeft(grouped) { (df, i) =>
      val eligible = (e: Column) =>
        if (i == 0) e.getField("_sidx") === 0
        else e.getField("_sidx") === i &&
          e.getField("_ts") > col(s"t_$i") &&
          e.getField("_ts") <= col("t_1") + expr(s"INTERVAL $horizonDays DAYS")
      df.withColumn(s"t_${i + 1}",
        array_min(transform(filter(col("_evs"), eligible), _.getField("_ts"))))
    }
    val depth = steps.indices.map(i => when(col(s"t_${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    withSteps
      .where(col("t_1").isNotNull)
      .select(col(userCol) +: steps.indices.map(i => col(s"t_${i + 1}")) :+
        depth.cast("long").as("depth"): _*)
  }

  /** Cohort retention grid: users are cohorted by the ISO week of their
    * first event; a cohort's week-N retention is how many of its users
    * were active N weeks later. Returns (cohort_week, week_offset,
    * n_active, n_cohort, retention_ppm) with retention as parts-per-
    * million under integer division — exact in any engine, no float
    * rounding in the correctness surface.
    *
    * Shape at scale: first-seen is one user-keyed aggregate; activity
    * is one (user, week) distinct (both collapse map-side); the join
    * keys on user only and both sides are user-activity-sized, not
    * event-sized; cohort sizes are a weeks-sized aggregate broadcast
    * into the grid. Nothing here retains raw event rows past the first
    * partial aggregation. */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    TextAnalysis.requireFree(events, "_week", "cohort_week", "week_offset",
      "n_active", "n_cohort", "retention_ppm")
    val week = date_trunc("week", col(tsCol)).cast("date")
    val firstSeen = events.groupBy(userCol)
      .agg(min(week).as("cohort_week"))
    val active = events.select(col(userCol), week.as("_week")).distinct()
    val sizes = firstSeen.groupBy("cohort_week")
      .agg(count(lit(1)).as("n_cohort"))
    active.join(firstSeen, userCol)
      .groupBy(col("cohort_week"),
        (datediff(col("_week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_active"))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("n_cohort"),
        expr("CAST(n_active * 1000000 DIV n_cohort AS BIGINT)").as("retention_ppm"))
  }
}
