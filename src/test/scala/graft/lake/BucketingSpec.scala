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

  test("colocatedJoin resolves when both sides bucket the SAME column name") {
    // the common production layout: both tables bucketed on user_id-
    // style identical names. An unqualified col(key) === col(key) is an
    // ambiguous-attribute AnalysisException — the join must qualify the
    // keys per side (and stay exchange-free)
    val base = tmpDir("graft_bucketing_same")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("orderkey"), col("o_orderpriority"))
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("orderkey"), col("l_extendedprice"))
    Bucketing.writeBucketed(o, "bspec_same_o", s"$base/orders", "orderkey", 4)
    Bucketing.writeBucketed(l, "bspec_same_l", s"$base/lineitem", "orderkey", 4)
    val joined = Bucketing.colocatedJoin(spark, "bspec_same_o", "bspec_same_l",
      "orderkey", "orderkey")
    val n = joined.count()
    val expected = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(n === expected)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"same-name co-bucketed join must stay exchange-free, plan was:\n$plan")
  }

  test("bucketing composes with zone-map pruning on ONE table") {
    // the claim in Bucketing's scaladoc: "bucket by join key, sort by
    // prune column; the two compose". Recipe: range-partition the input
    // by the prune column FIRST (each writer task then holds a narrow
    // prune range), bucket by the join key — every (range-task, bucket)
    // file gets a narrow prune-column [min,max] the metastore can
    // prune, while the bucket layout keeps key joins exchange-free.
    // Both dividends are pinned HERE on the same files.
    val base = tmpDir("graft_bucketing_zm")
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_extendedprice")
      .repartitionByRange(4, col("l_partkey"))
    Bucketing.writeBucketed(l, "bspec_zm_lineitem", s"$base/lineitem",
      "l_orderkey", 4, sortCols = Seq("l_partkey"))

    // dividend 1: the key join against a co-bucketed partner is
    // exchange-free (the range pre-partitioning changed file COUNT, not
    // the bucket spec)
    val (ot, _) = tables
    val joined = Bucketing.colocatedJoin(spark, ot, "bspec_zm_lineitem",
      "o_orderkey", "l_orderkey")
    joined.count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
      s"range-partitioned bucketed table must still join exchange-free:\n$plan")

    // dividend 2: a metastore over the SAME files prunes by l_partkey.
    // 4 range stripes × 4 buckets = 16 files; a point value lives in
    // one stripe, so at most 4 files (its stripe's buckets) survive.
    val stats = Metastore.build(spark, s"$base/lineitem", "l_partkey")
    val shack = new Lakeshack(spark, stats)
    val probe = spark.read.parquet(s"$base/lineitem")
      .agg(min("l_partkey")).collect()(0).getLong(0)
    val got = shack.query(values = Seq(probe)).collect()
    val expected = spark.read.parquet(s"$base/lineitem")
      .where(col("l_partkey") === probe).count()
    assert(got.length.toLong === expected && expected > 0)
    val tel = shack.lastTelemetry.get
    assert(tel.filesTotal >= 8,
      s"range×bucket write should produce many files, got ${tel.filesTotal}")
    assert(tel.filesScanned * 2 <= tel.filesTotal,
      s"zone maps must prune the off-stripe bucket files: scanned " +
        s"${tel.filesScanned} of ${tel.filesTotal}")
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
