package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LocalTableScanExec
import org.apache.spark.sql.functions._

/** Manifest-backed aggregate pushdown on the snapshot catalog:
  * `count(*)`/`count(col)`/`min`/`max` answered from cached footer
  * stats as a driver-local row — the plan must be a `LocalTableScan`
  * with NO file scan at all — and every soundness gate must fall back
  * to the stock distributed scan with the identical answer. */
class ManifestAggSpec extends SparkSpec {
  import spark.implicits._

  private def register(cat: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
  }

  private def isLocal(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan
    var local = false; var fileScan = false
    plan.foreach {
      case _: LocalTableScanExec => local = true
      case s if s.nodeName.contains("BatchScan") || s.nodeName.contains("FileScan") =>
        fileScan = true
      case _ => ()
    }
    local && !fileScan
  }

  test("count/min/max answered from manifests: LocalTableScan, zero file reads") {
    val root = tmpDir("magg")
    // nulls in `v` so count(v) != count(*); ts exercises temporal min/max
    val df = (0 until 1000).map { i =>
      (i.toLong, if (i % 7 == 0) None else Some(i.toLong * 3),
        java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"))
    }.toDF("id", "v", "ts")
    SnapshotLog.write(df, s"$root/t", "overwrite", clusterColumn = Some("id"), nFiles = 4)
    register("magg", root)
    val before = ManifestAgg.served.get()
    val q = spark.sql(
      "SELECT count(*) AS n, count(v) AS nv, min(id) AS mn, max(id) AS mx, " +
        "min(ts) AS mnts, max(ts) AS mxts FROM magg.t")
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (1000L, 1000L - 143L, 0L, 999L))
    assert(r.getTimestamp(4) == java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(r.getTimestamp(5) == java.sql.Timestamp.valueOf("2024-01-28 00:00:00"))
    assert(isLocal(q), s"expected LocalTableScan-only plan:\n${q.queryExecution.executedPlan}")
    assert(ManifestAgg.served.get() > before)
  }

  test("time travel aggregates from the PINNED version's manifests") {
    val root = tmpDir("magg_tt")
    SnapshotLog.write((0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      s"$root/t", "overwrite") // v0
    SnapshotLog.write((100 until 105).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      s"$root/t", "append") // v1
    register("maggtt", root)
    val q0 = spark.sql("SELECT count(*) AS n, max(id) AS mx FROM maggtt.t VERSION AS OF 0")
    assert(q0.as[(Long, Long)].head() == ((10L, 9L)))
    assert(isLocal(q0))
    val q1 = spark.sql("SELECT count(*) AS n, max(id) AS mx FROM maggtt.t")
    assert(q1.as[(Long, Long)].head() == ((15L, 104L)))
    assert(isLocal(q1))
  }

  test("every soundness gate falls back to the scan with the identical answer") {
    val root = tmpDir("magg_fb")
    val df = (0 until 100).map(i =>
      (i.toLong, i.toDouble / 3.0, s"s$i", i % 5)).toDF("id", "d", "s", "g")
    SnapshotLog.write(df, s"$root/t", "overwrite", clusterColumn = Some("id"), nFiles = 2)
    register("maggfb", root)
    // WHERE clause: aggregate must see the filtered population
    val fq = spark.sql("SELECT count(*) AS n, max(id) AS mx FROM maggfb.t WHERE id < 50")
    assert(fq.as[(Long, Long)].head() == ((50L, 49L)))
    assert(!isLocal(fq))
    // GROUP BY: per-group answers need the scan
    val gq = spark.sql("SELECT g, count(*) AS n FROM maggfb.t GROUP BY g")
    assert(gq.as[(Int, Long)].collect().toMap == (0 until 5).map(_ -> 20L).toMap)
    assert(!isLocal(gq))
    // double/string extrema: footer order is not exact order — scan
    val dq = spark.sql("SELECT min(d) AS mn, max(s) AS mx FROM maggfb.t")
    assert(dq.as[(Double, String)].head() == ((0.0, "s99")))
    assert(!isLocal(dq))
    // avg/sum: never manifest-answerable
    val aq = spark.sql("SELECT sum(id) AS s FROM maggfb.t")
    assert(aq.as[Long].head() == 4950L)
    assert(!isLocal(aq))
    // opt-out conf
    spark.conf.set("spark.graft.aggPushdown.enabled", "false")
    try {
      val oq = spark.sql("SELECT count(*) AS n FROM maggfb.t")
      assert(oq.as[Long].head() == 100L)
      assert(!isLocal(oq))
    } finally spark.conf.set("spark.graft.aggPushdown.enabled", "true")
  }

  test("a DV-carrying version never answers from manifests (counts would be stale)") {
    val root = tmpDir("magg_dv")
    SnapshotLog.write((0 until 20).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      s"$root/t", "overwrite", clusterColumn = Some("id"), nFiles = 2)
    SnapshotLog.delete(spark, s"$root/t", col("id") === 3L || col("id") === 17L)
    register("maggdv", root)
    val before = ManifestAgg.served.get()
    val q = spark.sql("SELECT count(*) AS n, max(id) AS mx FROM maggdv.t")
    assert(q.as[(Long, Long)].head() == ((18L, 19L)))
    assert(ManifestAgg.served.get() == before,
      "DV version must not serve footer counts — dead rows are invisible to footers")
    // after purge the manifests are truthful again
    SnapshotLog.purgeDeletes(spark, s"$root/t")
    val q2 = spark.sql("SELECT count(*) AS n FROM maggdv.t")
    assert(q2.as[Long].head() == 18L)
    assert(isLocal(q2))
  }
}
