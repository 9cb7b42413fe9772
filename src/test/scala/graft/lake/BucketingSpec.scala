package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the whole point of [[Bucketing]]: a co-bucketed equi-join
  * plans with ZERO Exchange nodes, while the identical join over the
  * raw (unbucketed) parquet shuffles both sides. If Spark's bucketing
  * rules, the merge hint, or the table registration drift, the plan
  * assertion fails instead of the exchange silently returning at
  * cluster scale where it is the query's whole cost. */
class BucketingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val tables: (String, String) = {
    val base = tmpDir("graft_bucketing")
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
    Bucketing.writeBucketed(l, "bspec_lineitem", s"$base/lineitem", "l_orderkey", 4)
    Bucketing.writeBucketed(o, "bspec_orders", s"$base/orders", "o_orderkey", 4)
    ("bspec_orders", "bspec_lineitem")
  }

  test("co-bucketed join is exchange-free; unbucketed twin shuffles") {
    val (ot, lt) = tables
    val joined = Bucketing.colocatedJoin(spark, ot, lt, "o_orderkey", "l_orderkey")
    joined.count() // materialize so AQE settles the final plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join, plan was:\n$plan")
    assert(!plan.contains("Exchange"),
      s"co-bucketed join must not shuffle, plan was:\n$plan")

    // negative control: same join over the raw files must exchange both sides
    val raw = spark.read.parquet(s"$sfDir/orders.parquet").hint("merge")
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
    raw.count()
    val rawPlan = raw.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(rawPlan).size >= 2,
      s"control join should shuffle both sides, plan was:\n$rawPlan")
  }

  test("bucketed layout changes the plan, never the answer") {
    val (ot, lt) = tables
    val bucketed = Bucketing.colocatedJoin(spark, ot, lt, "o_orderkey", "l_orderkey")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketed.nonEmpty && bucketed === plain)
  }

  test("point lookups on the bucket column scan one bucket, not eight") {
    // the layout's second dividend: an equality predicate on the bucket
    // column prunes the scan to the key's own bucket file — the same
    // hash that co-locates the join routes the lookup
    // autoBucketedScan disables the bucketed layout for plans with no
    // exchange to save — which also forfeits bucket pruning, so a
    // lookup-heavy workload should pin it off (as here) or route point
    // lookups through the metastore path instead
    val (_, lt) = tables
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val one = spark.table(lt).where(col("l_orderkey") === 42L)
      one.count()
      val plan = one.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 4"),
        s"expected a single-bucket scan, plan was:\n$plan")
    } finally spark.conf.set(key, prev)
  }

  test("aggregation on the bucket key also runs exchange-free") {
    // the layout's third dividend: groupBy on the bucket column already
    // has the required distribution, so partial+final aggregation fuses
    // with no shuffle between them
    val (_, lt) = tables
    val agg = spark.table(lt).groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    agg.count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucket-key aggregation must not shuffle, plan was:\n$plan")
  }

  test("colocatedJoin refuses unbucketed and mismatched layouts") {
    val (ot, lt) = tables
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.mode("overwrite")
      .option("path", tmpDir("graft_bucketing_flat") + "/orders")
      .saveAsTable("bspec_flat_orders")
    assertThrows[IllegalArgumentException](
      Bucketing.colocatedJoin(spark, "bspec_flat_orders", lt, "o_orderkey", "l_orderkey"))

    val o5 = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
    Bucketing.writeBucketed(o5, "bspec_orders5",
      tmpDir("graft_bucketing5") + "/orders", "o_orderkey", 5)
    assertThrows[IllegalArgumentException](
      Bucketing.colocatedJoin(spark, "bspec_orders5", lt, "o_orderkey", "l_orderkey"))
  }
}
