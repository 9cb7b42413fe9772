package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactorSpec extends SparkSpec {

  private def parquetFiles(dir: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).map(_.getName).filter(_.endsWith(".parquet"))
  }

  test("compaction merges small files, preserves data, and refreshes stats") {
    import spark.implicits._
    val root = tmpDir("compact")
    val data = s"$root/t"
    val stats = s"$root/stats"
    // simulate streaming ingest: 6 batch commits, 2 files each
    for (b <- 0 until 6) {
      val batch = (b * 1000L until b * 1000L + 1000L).toDF("id")
      ClusteredWriter.write(batch, s"$data/batch_$b", "id", nFiles = 2)
      Metastore.update(spark, stats, Metastore.buildFromFooters(spark, s"$data/batch_$b", "id"))
    }
    assert(parquetFiles(data).size === 12)
    assert(spark.read.parquet(stats).count() === 12)
    val before = spark.read.option("recursiveFileLookup", "true").parquet(data)
      .agg(count(lit(1)), sum("id")).first()

    Compactor.compact(spark, data, stats, "id", targetFiles = 3)

    assert(parquetFiles(data).size === 3, "12 small files must become 3")
    val after = spark.read.option("recursiveFileLookup", "true").parquet(data)
      .agg(count(lit(1)), sum("id")).first()
    assert(after === before, "compaction must not change the data")
    // stats replaced: one row per new file, none pointing at dead files
    val statRows = Metastore.load(spark, stats)
    assert(statRows.count() === 3)
    val livePaths = spark.read.option("recursiveFileLookup", "true").parquet(data)
      .select(col("_metadata.file_path")).distinct().count()
    assert(livePaths === 3)
    // pruning still sound + effective on the compacted clustered layout
    val hits = Metastore.prune(spark, statRows, Seq(42L))
    assert(hits.size === 1, s"a point value should prune to 1 of 3 files, got ${hits.size}")
    assert(spark.read.parquet(hits: _*).where(col("id") === 42L).count() === 1)
  }

  test("a crash after the data swap but before the stats replace is repaired when stats context is given") {
    import spark.implicits._
    val root = tmpDir("compact_poststats")
    val data = s"$root/t"
    val stats = s"$root/stats"
    (1L to 500L).toDF("id").repartition(4).write.parquet(data)
    Metastore.update(spark, stats, Metastore.buildFromFooters(spark, data, "id"))
    // simulate: data swap committed (bak present beside live) but the
    // stats replace never ran — stats rows point at pre-swap files
    val fs = new org.apache.hadoop.fs.Path(data)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(data + ".cbak"))
    val staleRows = Metastore.load(spark, stats).count()
    // without stats context: bak must be LEFT so repair stays possible
    Compactor.recoverIfNeeded(spark, data)
    assert(fs.exists(new org.apache.hadoop.fs.Path(data + ".cbak")))
    assert(Metastore.load(spark, stats).count() === staleRows)
    // with stats context: stats re-harvested from live files, bak dropped
    Compactor.recoverIfNeeded(spark, data, Some((stats, "id", Nil)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(data + ".cbak")))
    val repaired = Metastore.load(spark, stats)
    val liveFiles = spark.read.parquet(data)
      .select(col("_metadata.file_path")).distinct().count()
    assert(repaired.count() === liveFiles, "stats rows must match live files after repair")
  }

  test("a MetastoreFileIndex reader succeeds mid-swap while stats are stale") {
    import spark.implicits._
    val root = tmpDir("compact_reader")
    val data = s"$root/t"
    val stats = s"$root/stats"
    (1L to 1000L).toDF("id").repartitionByRange(4, col("id")).write.parquet(data)
    Metastore.update(spark, stats, Metastore.buildFromFooters(spark, data, "id"))
    val table = MetastoreFileIndex.table(spark, data, stats)
    assert(table.where(col("id") === 42L).count() === 1)

    // reproduce Compactor.compact's reader-visible window exactly: the
    // clustered rewrite lands in tmp, the swap commits (live dir now
    // holds NEW files, `.cbak` marker present), and the stats refresh
    // has NOT happened — stats rows point at renamed-away paths
    val fs = new org.apache.hadoop.fs.Path(data)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ClusteredWriter.write(spark.read.parquet(data), data + ".ctmp", "id", nFiles = 2)
    val swap = new SwapProtocol(fs, new org.apache.hadoop.fs.Path(data), ".ctmp", ".cbak")
    swap.commit()
    assert(fs.exists(new org.apache.hadoop.fs.Path(data + ".cbak")))

    // the same DataFrame must keep answering (unpruned) mid-window
    assert(table.where(col("id") === 42L).count() === 1,
      "reader must survive the swap window instead of FileNotFound")
    assert(table.count() === 1000)

    // the API path tolerates the window the same way: a Lakeshack built
    // from the (stale) stats scans live files unpruned instead of
    // resolving the stats' dead paths
    val shack = Lakeshack.fromStats(spark, data, stats, "id")
    assert(shack.queryOne(42L).count() === 1,
      "Lakeshack.query must survive the swap window")
    assert(shack.lastTelemetry.exists(t => t.filesScanned === -1L && t.filesTotal === -1L),
      "mid-window telemetry reports the -1 sentinel: pruning was bypassed and " +
        "neither the stale stats count nor the mid-swap live count is honest")

    // finish the compaction: stats re-harvested, marker dropped — and
    // after refresh() the interval map prunes over the NEW files again
    Compactor.recoverIfNeeded(spark, data, Some((stats, "id", Nil)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(data + ".cbak")))
    MetastoreFileIndex.indexOf(table).refresh()
    assert(table.where(col("id") === 42L).count() === 1)
  }

  test("a crashed swap (live missing, bak present) rolls back cleanly") {
    import spark.implicits._
    val root = tmpDir("compact_crash")
    val data = s"$root/t"
    (1L to 100L).toDF("id").coalesce(1).write.parquet(data)
    val fs = new org.apache.hadoop.fs.Path(data)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate: crash after live -> bak, before tmp -> live
    require(fs.rename(new org.apache.hadoop.fs.Path(data),
      new org.apache.hadoop.fs.Path(data + ".cbak")))
    Compactor.recoverIfNeeded(spark, data)
    assert(spark.read.parquet(data).count() === 100, "bak must be restored as live")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(data + ".cbak")))
  }
}
