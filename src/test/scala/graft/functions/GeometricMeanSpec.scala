package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeometricMeanSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq(("a", 2.0), ("a", 8.0), ("b", 3.0), ("b", 9.0), ("b", 27.0)).toDF("g", "x")
  }

  test("hand-computed geometric means per group") {
    val r = GeometricMean.geoMean(col("x"))
    val got = df.groupBy("g").agg(r.as("gm")).orderBy("g").collect()
    assert(math.abs(got(0).getDouble(1) - 4.0) < 1e-12)  // √(2·8)
    assert(math.abs(got(1).getDouble(1) - 9.0) < 1e-12)  // ∛(3·9·27)
  }

  test("nulls and non-positive values are skipped; all-skipped yields NULL") {
    import spark.implicits._
    val mixed = Seq[(String, java.lang.Double)](
      ("a", 4.0), ("a", null), ("a", -5.0), ("a", 0.0), ("a", 16.0),
      ("z", -1.0), ("z", null)).toDF("g", "x")
    val got = mixed.groupBy("g").agg(GeometricMean.geoMean(col("x")).as("gm"))
      .orderBy("g").collect()
    assert(math.abs(got(0).getDouble(1) - 8.0) < 1e-12) // √(4·16)
    assert(got(1).isNullAt(1), "group with no valid values must be NULL")
  }

  test("partial-aggregation merge path agrees with single-partition result") {
    import spark.implicits._
    val big = (1 to 10000).map(i => ("g", i.toDouble)).toDF("g", "x")
    val one = big.coalesce(1).groupBy("g").agg(GeometricMean.geoMean(col("x"))).first().getDouble(1)
    val many = big.repartition(32).groupBy("g").agg(GeometricMean.geoMean(col("x"))).first().getDouble(1)
    assert(math.abs(one - many) / one < 1e-12, s"merge drift: $one vs $many")
    val viaBuiltins = big.agg(exp(avg(log(col("x"))))).first().getDouble(0)
    assert(math.abs(one - viaBuiltins) / one < 1e-12)
  }

  test("registered for SQL via GraftExtensions") {
    df.createOrReplaceTempView("gm_rows")
    val r = spark.sql("SELECT g, geo_mean(x) AS gm FROM gm_rows GROUP BY g ORDER BY g").collect()
    assert(math.abs(r(0).getDouble(1) - 4.0) < 1e-12)
    assert(math.abs(r(1).getDouble(1) - 9.0) < 1e-12)
  }

  test("runs inside HashAggregate with partial aggregation (not a UDAF sort-fallback)") {
    val d = tmpDir("gm_codegen")
    df.write.mode("overwrite").parquet(d)
    val plan = spark.read.parquet(d)
      .groupBy("g").agg(GeometricMean.geoMean(col("x")).as("gm"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && plan.contains("partial_geo_mean"),
      s"expected partially-aggregated HashAggregate in:\n$plan")
  }
}
