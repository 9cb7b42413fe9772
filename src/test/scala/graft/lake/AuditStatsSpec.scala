package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Every auditStats verdict class, each produced by a controlled
  * perturbation of a healthy stats table over a 3-file clustered
  * layout. The UNSOUND class (under_covering) is the one the audit
  * exists for: stored bounds that miss data the file holds make
  * pruning silently drop rows. */
class AuditStatsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dataDir: String = {
    val d = tmpDir("audit_data")
    val df = (1L to 300L).map(i => (i, s"v$i", (i % 7).toDouble)).toDF("k", "s", "x")
    ClusteredWriter.write(df, d, "k", nFiles = 3)
    d
  }

  private def healthy = Metastore.buildFromFooters(spark, dataDir, "k", Seq("x"))

  private def verdicts(stats: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
    Metastore.auditStats(spark, dataDir, stats)
      .groupBy("column", "verdict").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("healthy stats audit exact on every (file, column)") {
    assert(verdicts(healthy) === Map(("k", "exact") -> 3L, ("x", "exact") -> 3L))
  }

  test("footer and scan builders agree bound-for-bound (cross-builder audit)") {
    // the audit recomputes by SCAN; auditing footer-built stats to
    // all-exact pins the two builders' value conversion to each other
    val v = verdicts(Metastore.build(spark, dataDir, "k", Seq("x")))
    assert(v === Map(("k", "exact") -> 3L, ("x", "exact") -> 3L))
  }

  test("under_covering: narrowed bounds are flagged unsound, named column only") {
    // narrow ONE file's k_max below the file's true max
    val gmax = healthy.agg(max("k_max")).first().getLong(0)
    val tampered = healthy.withColumn("k_max",
      when(col("k_max") === gmax, col("k_max") - 1).otherwise(col("k_max")))
    val v = verdicts(tampered)
    assert(v(("k", "under_covering")) === 1L)
    assert(v(("k", "exact")) === 2L)
    assert(v(("x", "exact")) === 3L, "untouched column must stay exact")
  }

  test("over_covering: widened bounds are sound but flagged") {
    val v = verdicts(healthy.withColumn("x_min", col("x_min") - 1.0))
    assert(v(("x", "over_covering")) === 3L)
    assert(!v.contains(("x", "exact")))
    assert(v(("k", "exact")) === 3L)
  }

  test("missing_stats: an unindexed file is reported for every column") {
    val dropOne = healthy.orderBy("filepath").limit(2)
    val v = verdicts(dropOne)
    assert(v(("k", "missing_stats")) === 1L && v(("x", "missing_stats")) === 1L)
    assert(v(("k", "exact")) === 2L && v(("x", "exact")) === 2L)
  }

  test("orphan_stats: a stats row for a vanished file is reported") {
    val ghost = healthy.limit(1)
      .withColumn("filepath", lit(s"file:$dataDir/part-does-not-exist.parquet"))
    val v = verdicts(healthy.unionByName(ghost))
    assert(v(("k", "orphan_stats")) === 1L && v(("x", "orphan_stats")) === 1L)
  }

  test("no_bounds: null stored bounds on a column with data are sound but visible") {
    val nulled = healthy.withColumn("x_min", lit(null).cast("double"))
    val v = verdicts(nulled)
    assert(v(("x", "no_bounds")) === 3L)
    assert(v(("k", "exact")) === 3L)
  }
}
