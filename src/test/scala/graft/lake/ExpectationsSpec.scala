package graft.lake

import graft.SparkSpec
import graft.lake.Expectations.{Expect, Expectation}
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {

  private def batch() = {
    import spark.implicits._
    Seq(
      (1L, 10.0, "O"),                    // clean
      (2L, -5.0, "O"),                    // price violation (drop)
      (3L, 20.0, null.asInstanceOf[String]), // null status -> violation (drop)
      (4L, -1.0, "Z"),                    // fails BOTH drop rules
      (5L, 7.0, "F")                      // clean, but warn rule fires (key>4)
    ).toDF("k", "price", "status")
  }

  private def rules(withFail: Boolean = false) = Seq(
    Expectation("positive_price", col("price") > 0, Expect.Drop),
    Expectation("known_status", col("status").isin("O", "F"), Expect.Drop),
    Expectation("small_key", col("k") <= 4, Expect.Warn)) ++
    (if (withFail) Seq(Expectation("no_zero", col("k") =!= 0, Expect.Fail)) else Nil)

  test("ingest splits clean/quarantine; null predicate is a violation; warn stays") {
    val base = tmpDir("expect")
    val (table, quar) = (s"$base/t", s"$base/q")
    val r = Expectations.ingest(spark, batch(), table, quar, rules(), "b0")
    assert(r.nClean === 2 && r.nQuarantined === 3)
    assert(r.violations === Map(
      "positive_price" -> 2L, "known_status" -> 2L, "small_key" -> 1L))
    val main = SnapshotLog.read(spark, table).orderBy("k").collect()
    assert(main.map(_.getLong(0)).toSeq === Seq(1L, 5L)) // warn row 5 kept
    assert(!main.head.schema.fieldNames.contains("_violations"))
    val q = SnapshotLog.read(spark, quar).orderBy("k").collect()
    assert(q.map(_.getLong(0)).toSeq === Seq(2L, 3L, 4L))
    // both failed names, sorted, on the double-violator
    assert(q(2).getAs[Seq[String]]("_violations")
      === Seq("known_status", "positive_price"))
  }

  test("replay of the same batch token commits nothing twice") {
    val base = tmpDir("expect_replay")
    val (table, quar) = (s"$base/t", s"$base/q")
    Expectations.ingest(spark, batch(), table, quar, rules(), "b0")
    val n0 = SnapshotLog.read(spark, table).count()
    val r2 = Expectations.ingest(spark, batch(), table, quar, rules(), "b0")
    assert(r2.mainVersion === -1L && r2.quarantineVersion === -1L)
    assert(SnapshotLog.read(spark, table).count() === n0)
    assert(SnapshotLog.read(spark, quar).count() === 3L)
  }

  test("fail mode aborts before either table is touched") {
    import spark.implicits._
    val base = tmpDir("expect_fail")
    val (table, quar) = (s"$base/t", s"$base/q")
    val bad = batch().union(Seq((0L, 1.0, "O")).toDF("k", "price", "status"))
    val ex = intercept[Expectations.BatchRejected](
      Expectations.ingest(spark, bad, table, quar, rules(withFail = true), "b0"))
    assert(ex.counts === Map("no_zero" -> 1L))
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(table)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(quar)))
  }

  test("an all-clean batch commits no quarantine version") {
    import spark.implicits._
    val base = tmpDir("expect_clean")
    val df = Seq((1L, 1.0, "O")).toDF("k", "price", "status")
    val r = Expectations.ingest(spark, df, s"$base/t", s"$base/q", rules(), "b0")
    assert(r.mainVersion === 0L && r.quarantineVersion === -1L)
    assert(r.violations.values.sum === 0L)
  }

  test("reserved and case-colliding expectation names are rejected") {
    import spark.implicits._
    val df = Seq((1L, 1.0, "O")).toDF("k", "price", "status")
    def rule(n: String) = Expectation(n, col("k") > 0, Expect.Drop)
    val e = intercept[IllegalArgumentException](
      Expectations.annotate(df, Seq(rule("_total"))))
    assert(e.getMessage.contains("reserved"))
    intercept[IllegalArgumentException](
      Expectations.annotate(df, Seq(rule("_VIOLATIONS"))))
    // Spark's resolver conflates case: two rules differing only by case
    // would corrupt counts, so they are refused up front
    val dup = intercept[IllegalArgumentException](
      Expectations.annotate(df, Seq(rule("posKey"), rule("poskey"))))
    assert(dup.getMessage.contains("unique"))
  }
}
