package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VacuumSpec extends SparkSpec {

  test("vacuum deletes only unreferenced files past the grace period") {
    import spark.implicits._
    val root = tmpDir("vacuum")
    val data = s"$root/t"
    val stats = s"$root/stats"
    (1L to 300L).toDF("id").repartition(3).write.parquet(data)
    Metastore.update(spark, stats, Metastore.buildFromFooters(spark, data, "id"))

    // a crashed ingest's leftovers: one old orphan, one fresh orphan
    val oldOrphan = new java.io.File(data, "orphan_old.parquet")
    val freshOrphan = new java.io.File(data, "orphan_fresh.parquet")
    for (f <- Seq(oldOrphan, freshOrphan)) {
      val src = new java.io.File(data).listFiles()
        .filter(x => x.getName.endsWith(".parquet") && !x.getName.startsWith("orphan")).head
      java.nio.file.Files.copy(src.toPath, f.toPath)
    }
    assert(oldOrphan.setLastModified(System.currentTimeMillis() - 3600_000L))

    val found = Vacuum.orphans(spark, data, stats, graceMs = 600_000L)
    assert(found.size === 1 && found.head.endsWith("orphan_old.parquet"),
      s"only the aged orphan is eligible, got $found")

    val deleted = Vacuum.vacuum(spark, data, stats, graceMs = 600_000L)
    assert(deleted === found)
    assert(!oldOrphan.exists(), "aged orphan must be gone")
    assert(freshOrphan.exists(), "fresh orphan must survive (write-to-update window)")
    // registered data intact and stats untouched
    assert(Metastore.load(spark, stats).count() === 3)
    val hits = Metastore.prune(spark, Metastore.load(spark, stats), Seq(42L))
    assert(spark.read.parquet(hits: _*).where(col("id") === 42L).count() === 1)
  }

  test("vacuum refuses to run over a crashed compaction or stale stats") {
    import spark.implicits._
    val root = tmpDir("vacuum_guard")
    val data = s"$root/t"
    val stats = s"$root/stats"
    (1L to 100L).toDF("id").repartition(2).write.parquet(data)
    Metastore.update(spark, stats, Metastore.buildFromFooters(spark, data, "id"))
    val fs = new org.apache.hadoop.fs.Path(data)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash marker beside the table: every live file may be unregistered
    fs.mkdirs(new org.apache.hadoop.fs.Path(data + ".cbak"))
    val e1 = intercept[IllegalArgumentException](
      Vacuum.orphans(spark, data, stats, graceMs = 0L))
    assert(e1.getMessage.contains("crashed compaction"))
    fs.delete(new org.apache.hadoop.fs.Path(data + ".cbak"), true)
    // stats referencing a deleted file: the unreferenced set is meaningless
    val victim = new java.io.File(data).listFiles().filter(_.getName.endsWith(".parquet")).head
    assert(victim.delete())
    val e2 = intercept[IllegalArgumentException](
      Vacuum.orphans(spark, data, stats, graceMs = 0L))
    assert(e2.getMessage.contains("stale"))
  }

  test("a fully registered table has no orphans at any grace") {
    import spark.implicits._
    val root = tmpDir("vacuum_clean")
    val data = s"$root/t"
    val stats = s"$root/stats"
    (1L to 100L).toDF("id").repartition(2).write.parquet(data)
    Metastore.update(spark, stats, Metastore.buildFromFooters(spark, data, "id"))
    assert(Vacuum.orphans(spark, data, stats, graceMs = -3600_000L).isEmpty)
  }
}
