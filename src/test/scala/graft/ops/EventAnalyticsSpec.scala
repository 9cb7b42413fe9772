package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {

  private val base = java.time.LocalDateTime.of(2024, 3, 4, 0, 0, 0) // a Monday

  private def ev(rows: (Long, Int, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "_min", "event_type", "value")
      .withColumn("ts",
        lit(java.sql.Timestamp.valueOf(base)) + expr("make_interval(0,0,0,0,0,_min,0)"))
      .drop("_min")
  }

  test("gapFill: dense grid, zero-vs-null distinction, forward fill") {
    // user 1 active hours 0 and 3; user 2 active hour 1 only;
    // global span = hours 0..3 -> 4 cells per user
    val events = ev(
      (1L, 10, "view", 5.0), (1L, 20, "view", 7.0), (1L, 190, "view", 1.5),
      (2L, 70, "click", 2.0))
    val out = EventAnalytics.gapFill(events).orderBy("user_id", "hour").collect()
    assert(out.length === 8)
    val u1 = out.take(4)
    assert(u1.map(_.getAs[Long]("n_events")).toSeq === Seq(2L, 0L, 0L, 1L))
    // hour 0: sum 12; hours 1-2: absent (null sum) but ff carries 12
    assert(u1(0).getAs[Double]("hour_sum") === 12.0)
    assert(u1(1).isNullAt(u1(1).fieldIndex("hour_sum")))
    assert(u1(1).getAs[Double]("ff_sum") === 12.0)
    assert(u1(2).getAs[Double]("ff_sum") === 12.0)
    assert(u1(3).getAs[Double]("ff_sum") === 1.5)
    // user 2: hour 0 precedes first activity -> ff NULL, not zero
    val u2 = out.drop(4)
    assert(u2(0).isNullAt(u2(0).fieldIndex("ff_sum")))
    assert(u2(1).getAs[Double]("ff_sum") === 2.0)
    assert(u2(3).getAs[Double]("ff_sum") === 2.0)
  }

  test("funnel: strict step order and horizon are enforced") {
    val steps = Seq("signup", "view", "purchase")
    val events = ev(
      // user 1: full funnel in order
      (1L, 0, "signup", 0), (1L, 5, "view", 0), (1L, 9, "purchase", 0),
      // user 2: purchase BEFORE view -> depth 2, purchase not counted
      (2L, 0, "signup", 0), (2L, 3, "purchase", 0), (2L, 6, "view", 0),
      // user 3: view outside the 7-day horizon -> depth 1
      (3L, 0, "signup", 0), (3L, 7 * 24 * 60 + 1, "view", 0),
      // user 4: never signed up -> excluded entirely
      (4L, 0, "view", 0), (4L, 1, "purchase", 0))
    val out = EventAnalytics.funnel(events, steps).orderBy("user_id").collect()
    assert(out.map(_.getAs[Long]("user_id")).toSeq === Seq(1L, 2L, 3L))
    assert(out.map(_.getAs[Long]("depth")).toSeq === Seq(3L, 2L, 1L))
    assert(out(1).isNullAt(out(1).fieldIndex("t_3"))) // early purchase ignored
    assert(out(2).isNullAt(out(2).fieldIndex("t_2"))) // horizon exceeded
  }

  test("funnel: a step event at exactly t_prev does not count (strict >)") {
    val events = ev(
      (1L, 0, "signup", 0), (1L, 0, "view", 0), (1L, 2, "view", 0))
    val out = EventAnalytics.funnel(events, Seq("signup", "view")).collect()
    assert(out.length === 1)
    // the minute-0 view ties t_1 exactly -> skipped; minute-2 view matches
    assert(out(0).getAs[java.sql.Timestamp]("t_2").toLocalDateTime
      === base.plusMinutes(2))
  }

  test("retention: cohort by first ISO week, exact ppm") {
    val wk = 7 * 24 * 60
    val events = ev(
      // cohort week 0: users 1,2 both seen week 0; only user 1 back week 1
      (1L, 0, "view", 0), (2L, 10, "view", 0),
      (1L, wk + 5, "view", 0),
      // cohort week 1: user 3
      (3L, wk + 20, "view", 0))
    val out = EventAnalytics.retention(events)
      .orderBy("cohort_week", "week_offset").collect()
    val grid = out.map(r => (r.getAs[java.sql.Date]("cohort_week").toString,
      r.getAs[Long]("week_offset"), r.getAs[Long]("n_active"),
      r.getAs[Long]("n_cohort"), r.getAs[Long]("retention_ppm"))).toSeq
    assert(grid === Seq(
      ("2024-03-04", 0L, 2L, 2L, 1000000L),
      ("2024-03-04", 1L, 1L, 2L, 500000L),
      ("2024-03-11", 0L, 1L, 1L, 1000000L)))
  }

  test("working-column collisions are refused") {
    import spark.implicits._
    val bad = Seq((1L, java.sql.Timestamp.valueOf(base), "x", 1.0, "boom"))
      .toDF("user_id", "ts", "event_type", "value", "ff_sum")
    intercept[IllegalArgumentException](EventAnalytics.gapFill(bad))
  }
}
