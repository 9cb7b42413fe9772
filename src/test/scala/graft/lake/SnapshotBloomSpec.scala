package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom sidecar pruning on the snapshot catalog: a point lookup on a
  * HIGH-CARDINALITY column the table is not clustered by — where zone
  * maps prune nothing — must drop every file whose filter proves the
  * value absent, and must never drop a file the sidecar doesn't index
  * (post-build appends, may-contain). */
class SnapshotBloomSpec extends SparkSpec {
  import spark.implicits._

  test("point lookup on an unclustered column prunes via the sidecar; appends stay safe") {
    val root = tmpDir("snapbloom")
    val table = s"$root/t"
    // clustered by k; u is a scrambled unique id — every file's [min,max]
    // of u spans the domain, so zone maps cannot prune on it
    val df = (0 until 8000).map(i => (i.toLong, ((i * 7919) % 8000).toLong, s"r$i"))
      .toDF("k", "u", "s")
    SnapshotLog.write(df, table, "overwrite", clusterColumn = Some("k"), nFiles = 8)
    spark.conf.set("spark.sql.catalog.snb", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snb.root", root)
    // build via SQL
    val indexed = spark.sql(
      "CALL snb.system.build_bloom('t', 'u', expected_items => 2000)").as[Long].head()
    assert(indexed == 8L)
    val before = SnapshotFileIndex.bloomPrunedFiles.get()
    val hit = spark.sql("SELECT k, s FROM snb.t WHERE u = 4242").as[(Long, String)].collect()
    assert(hit.length == 1)
    val prunedOnce = SnapshotFileIndex.bloomPrunedFiles.get() - before
    assert(prunedOnce >= 5, s"expected most of 8 files bloom-pruned, got $prunedOnce")
    // IN-list probes prune too, and return exactly the right rows
    val rows = spark.sql("SELECT u FROM snb.t WHERE u IN (1, 4242, 7999)")
      .as[Long].collect().toSet
    assert(rows == Set(1L, 4242L, 7999L))
    // a post-build append is UNKNOWN to the sidecar and must never be
    // pruned: its rows answer even though the bloom says nothing
    SnapshotLog.write(Seq((900000L, 999999L, "late")).toDF("k", "u", "s"),
      table, "append")
    assert(spark.sql("SELECT s FROM snb.t WHERE u = 999999").as[String].collect()
      .toSeq == Seq("late"))
    // absent value: bloom proves every indexed file out; only the
    // unknown appended file scans — and finds nothing
    assert(spark.sql("SELECT count(*) FROM snb.t WHERE u = -5").as[Long].head() == 0L)
  }

  test("the vectorized DV read path consults the sidecar too") {
    val root = tmpDir("snapbloom_dv")
    val table = s"$root/t"
    SnapshotLog.write((0 until 4000).map(i => (i.toLong, ((i * 3571) % 4000).toLong))
      .toDF("k", "u"), table, "overwrite", clusterColumn = Some("k"), nFiles = 4)
    SnapshotLog.buildBloom(spark, table, "u", expectedItemsPerFile = 2000)
    SnapshotLog.delete(spark, table, col("k") === 7L) // head carries a DV
    spark.conf.set("spark.sql.catalog.snbd", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snbd.root", root)
    val before = SnapshotFileIndex.bloomPrunedFiles.get()
    val n = spark.sql("SELECT count(*) FROM snbd.t WHERE u = 123").as[Long].head()
    assert(n == 1L)
    assert(SnapshotFileIndex.bloomPrunedFiles.get() > before,
      "vectorized DV read did not bloom-prune")
    // the DV-deleted row stays dead even when its file bloom-matches
    val deadU = (7 * 3571) % 4000
    assert(spark.sql(s"SELECT count(*) FROM snbd.t WHERE u = $deadU").as[Long].head() == 0L)
  }
}
