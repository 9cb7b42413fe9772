package graft

import org.apache.spark.sql.types._

class TestdataCanarySpec extends SparkSpec {

  test("current testdata matches the engine's expected schemas") {
    val drifts = TestdataCanary.check(spark, "/root/testdata/sf0.001")
    assert(drifts.isEmpty, s"testdata drift detected:\n${drifts.mkString("\n")}")
  }

  test("canary fails loudly on a simulated dtype drift, naming the column") {
    import spark.implicits._
    val d = tmpDir("canary_drift")
    // events with ts as STRING — a representation the engine cannot absorb
    Seq((1L, "2024-01-01 00:00:00", 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    // the remaining tables are absent → 'unreadable' messages, fine; the
    // assertion targets the events drift specifically
    val drifts = TestdataCanary.check(spark, d)
    assert(drifts.exists(m => m.contains("events.ts") && m.contains("drifted")),
      s"expected a message naming events.ts, got:\n${drifts.mkString("\n")}")
  }

  test("canary flags a missing column by name") {
    import spark.implicits._
    val d = tmpDir("canary_missing")
    Seq((1L, 2L)).toDF("event_id", "user_id")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val drifts = TestdataCanary.check(spark, d)
    assert(drifts.exists(m => m.contains("events.ts") && m.contains("MISSING")),
      s"expected events.ts MISSING, got:\n${drifts.mkString("\n")}")
  }

  test("all accepted ts representations (incl. INT96) normalize to the same wall clock") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val us = 1704067200123456L // 2024-01-01T00:00:00.123456Z
    val asLong = Seq(Tuple1(us * 1000L)).toDF("ts") // nanos-as-long
    val asNtz = Seq(Tuple1(us)).toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
    val asTz = Seq(Tuple1(us)).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    // INT96 — the legacy Impala/Hive physical representation, still in
    // the wild and a plausible future testdata-generator output. Spark
    // can only produce it through an actual parquet round-trip
    // (outputTimestampType=INT96); it loads back as TimestampType, so
    // the canary proves normalizeTs absorbs the FILE, not just the
    // in-memory dtype.
    val asInt96 = {
      val d = tmpDir("canary_int96")
      val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
      spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      try asTz.write.mode("overwrite").parquet(d)
      finally prev.fold(spark.conf.unset("spark.sql.parquet.outputTimestampType"))(
        spark.conf.set("spark.sql.parquet.outputTimestampType", _))
      val back = spark.read.parquet(d)
      assert(back.schema("ts").dataType === TimestampType,
        "INT96 parquet must load as TimestampType")
      back
    }
    val got = Seq(asLong, asNtz, asTz, asInt96).map { df =>
      val out = graft.streaming.EventsStream.normalizeTs(df, "timestamp_ntz")
      assert(out.schema("ts").dataType === TimestampNTZType)
      out.select(col("ts").cast("string")).as[String].head()
    }
    assert(got.distinct.size === 1,
      s"representations disagree under UTC session tz: $got")
    assert(got.head === "2024-01-01 00:00:00.123456")
  }
}
