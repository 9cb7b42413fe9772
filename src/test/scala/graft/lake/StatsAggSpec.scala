package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsAggSpec extends SparkSpec {
  import spark.implicits._

  private def clusteredLongs(): String = {
    val d = tmpDir("statsagg") + "/t"
    val df = spark.range(0, 10000).select(col("id"), (col("id") * 2).as("v"))
    ClusteredWriter.write(df, d, "id", nFiles = 8)
    d
  }

  test("range aggregate equals the full-scan answer on a clustered table") {
    val d = clusteredLongs()
    val got = StatsAgg.rangeAgg(spark, d, "id", 1234L, 8765L)
      .as[(Long, Long, Long)].head()
    assert(got == ((8765L - 1234L + 1L, 1234L, 8765L)))
  }

  test("interior files are answered from footers; only boundary files scan") {
    val d = clusteredLongs()
    val p = StatsAgg.plan(spark, d, "id", 1234L, 8765L)
    assert(p.covered.nonEmpty)
    assert(p.scanned.size <= 2, s"expected <=2 boundary files, got ${p.scanned.size}")
    assert(p.covered.size + p.scanned.size + p.skipped.size == 8)
  }

  test("a range aligned to file bounds costs ZERO scanned files") {
    val d = clusteredLongs()
    val all = StatsAgg.plan(spark, d, "id", Long.MinValue, Long.MaxValue)
    assert(all.scanned.isEmpty && all.skipped.isEmpty && all.covered.size == 8)
    val got = StatsAgg.rangeAgg(spark, d, "id", Long.MinValue, Long.MaxValue)
      .as[(Long, Long, Long)].head()
    assert(got == ((10000L, 0L, 9999L)))
  }

  test("empty range returns (0, NULL, NULL) like the SQL aggregate") {
    val d = clusteredLongs()
    val row = StatsAgg.rangeAgg(spark, d, "id", 20000L, 30000L).head()
    assert(row.getLong(0) == 0L && row.isNullAt(1) && row.isNullAt(2))
  }

  test("NULLs are excluded from covered counts and all-null files are skipped") {
    val d = tmpDir("statsagg_null") + "/t"
    val withNulls = spark.range(0, 1000)
      .select(when(col("id") % 10 === 0, null).otherwise(col("id")).as("k"))
    // file 2: all-null ks
    withNulls.coalesce(1).write.parquet(d)
    spark.range(0, 50).select(lit(null).cast("long").as("k"))
      .coalesce(1).write.mode("append").parquet(d)
    val got = StatsAgg.rangeAgg(spark, d, "k", 0L, 999L).as[(Long, Long, Long)].head()
    assert(got == ((900L, 1L, 999L)))
    val p = StatsAgg.plan(spark, d, "k", 0L, 999L)
    assert(p.skipped.size == 1) // the all-null file is provably matchless
  }

  test("string columns never take the footer shortcut (truncation soundness)") {
    val d = tmpDir("statsagg_str") + "/t"
    (0 until 1000).map(i => f"k$i%04d").toDF("s")
      .repartitionByRange(4, col("s")).sortWithinPartitions("s")
      .write.parquet(d)
    val p = StatsAgg.plan(spark, d, "s", "k0100", "k0800")
    assert(p.covered.isEmpty)
    assert(p.scanned.nonEmpty)
    val got = StatsAgg.rangeAgg(spark, d, "s", "k0100", "k0800")
      .as[(Long, String, String)].head()
    assert(got == ((701L, "k0100", "k0800")))
  }

  test("timestamp range aggregate matches the scan") {
    val d = tmpDir("statsagg_ts") + "/t"
    val df = spark.range(0, 2000).select(
      timestamp_add("MINUTE", col("id"),
        lit(java.time.Instant.parse("2024-01-01T00:00:00Z")).cast("timestamp")).as("ts"))
    ClusteredWriter.write(df, d, "ts", nFiles = 4)
    val lo = java.time.Instant.parse("2024-01-01T05:00:00Z")
    val hi = java.time.Instant.parse("2024-01-01T20:00:00Z")
    val expect = spark.read.parquet(d).where(col("ts").between(lit(lo), lit(hi)))
      .agg(count(lit(1)), min("ts"), max("ts")).head()
    val got = StatsAgg.rangeAgg(spark, d, "ts", lo, hi).head()
    assert(got == expect)
    // interior files answered from footers
    assert(StatsAgg.plan(spark, d, "ts", lo, hi).covered.nonEmpty)
  }

  test("tableRowCount answers count(*) from footers alone") {
    val d = clusteredLongs()
    assert(StatsAgg.tableRowCount(spark, d) == 10000L)
  }
}
