package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bin-pack OPTIMIZE (`SnapshotLog.compactBin` / `CALL compact_small`):
  * only the small files rewrite — big files stay byte-identical (their
  * zone maps, bloom entries, and page cache survive the commit), a
  * DV-carrying small file folds its dead rows (partial purge), and the
  * packed output follows the table's declared cluster columns. */
class CompactBinSpec extends SparkSpec {
  import spark.implicits._

  private def liveSizes(table: String): Map[String, (Long, Long)] = {
    val snap = SnapshotLog.state(spark, table)
    val rootP = new org.apache.hadoop.fs.Path(table)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    snap.files.map { f =>
      val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(rootP, f))
      f -> (st.getLen, st.getModificationTime)
    }.toMap
  }

  test("only small files rewrite; the big file is byte-identical; DV'd smalls fold") {
    val root = tmpDir("cbin")
    val table = s"$root/t"
    // v0: one BIG file (50k rows); v1..v6: six tiny appends
    SnapshotLog.write((0 until 50000).map(i => (i.toLong, s"row-$i-payload")).toDF("id", "s"),
      table, "overwrite", clusterColumn = Some("id"), nFiles = 1)
    for (b <- 1 to 6)
      SnapshotLog.write(Seq((100000L + b, s"tiny-$b")).toDF("id", "s"), table, "append")
    // v7: DV-delete one row living in a tiny file
    SnapshotLog.delete(spark, table, col("id") === 100003L)
    val before = liveSizes(table)
    val bigEntry = before.maxBy(_._2._1)
    assert(before.size == 7)
    val v = SnapshotLog.compactBin(spark, table,
      targetBytes = 64L * 1024 * 1024, smallBytes = 64L * 1024)
    assert(v == 8L)
    val after = liveSizes(table)
    // big file survived byte-identical at the same path
    assert(after.contains(bigEntry._1), "big file must not be rewritten")
    assert(after(bigEntry._1) == bigEntry._2, "big file changed (len, mtime)")
    // the six tiny files packed into ONE new file
    assert(after.size == 2, s"want big + 1 packed, got ${after.keys}")
    // population: all rows minus the DV-deleted one; vectors folded away
    val snap = SnapshotLog.state(spark, table)
    assert(snap.dvs.isEmpty, "rewritten small files must drop their DV sets")
    assert(SnapshotLog.read(spark, table).count() == 50000L + 6 - 1)
    assert(SnapshotLog.read(spark, table).where(col("id") === 100003L).count() == 0L)
    // committed as a compact (feed no-op) and time travel still serves v7
    val ops = SnapshotLog.history(spark, table).select("version", "op")
      .as[(Long, String)].collect().toMap
    assert(ops(8L) == "compact")
    assert(SnapshotLog.read(spark, table, Some(7L)).count() == 50000L + 6 - 1)
  }

  test("fewer than min_files small files is a no-op; CALL compact_small works in SQL") {
    val root = tmpDir("cbin_sql")
    SnapshotLog.write((0 until 1000).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      s"$root/t", "overwrite", clusterColumn = Some("id"), nFiles = 1) // one file: no-op
    spark.conf.set("spark.sql.catalog.cbin", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.cbin.root", root)
    assert(spark.sql("CALL cbin.system.compact_small('t')").as[Long].head() == 0L)
    // add tiny appends, pack them via SQL with explicit thresholds
    for (b <- 1 to 3)
      spark.sql(s"INSERT INTO cbin.t VALUES (${2000 + b}, 'tiny-$b')")
    val v = spark.sql(
      "CALL cbin.system.compact_small('t', target_mb => 64, small_mb => 1)")
      .as[Long].head()
    assert(v == 4L)
    assert(spark.sql("SELECT count(*) FROM cbin.t").as[Long].head() == 1003L)
  }

  test("packed output follows the declared cluster columns (ranges disjoint)") {
    val root = tmpDir("cbin_layout")
    val table = s"$root/t"
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), table, "overwrite")
    SnapshotLog.setClusterBy(spark, table, Seq("id"))
    // shuffled tiny appends across the keyspace
    for (b <- 0 until 6)
      SnapshotLog.write((0 until 50).map(i => ((i * 113 + b) % 600).toLong -> s"x$i")
        .toDF("id", "s"), table, "append")
    SnapshotLog.compactBin(spark, table, targetBytes = 4096, smallBytes = 1024 * 1024)
    val snap = SnapshotLog.state(spark, table)
    assert(snap.files.size >= 2, s"want >1 packed file, got ${snap.files.size}")
    val rootP = new org.apache.hadoop.fs.Path(table)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val abs = snap.files.map(f => fs.makeQualified(
      new org.apache.hadoop.fs.Path(rootP, f)).toString)
    val ranges = StatsAgg.harvest(spark, abs, "id", org.apache.spark.sql.types.LongType)
      .flatMap(st => for (mn <- st.min; mx <- st.max) yield
        (mn.asInstanceOf[Long], mx.asInstanceOf[Long])).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => assert(aMax <= bMin, s"overlap: $ranges")
      case _ => ()
    }
    assert(SnapshotLog.read(spark, table).count() == 1L + 6 * 50)
  }

  test("file-size census is one listing per token dir, not one RPC per file") {
    val root = tmpDir("cbin_census")
    val table = s"$root/t"
    // 3 commits → 3 token dirs holding 4 + 4 + 4 = 12 files: the census
    // must issue exactly 3 dir listings, not 12 per-file getFileStatus
    // round-trips (the O(files) driver stall at a million-file head)
    SnapshotLog.write((0 until 400).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      table, "overwrite", clusterColumn = Some("id"), nFiles = 4)
    SnapshotLog.write((400 until 800).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      table, "append", clusterColumn = Some("id"), nFiles = 4)
    SnapshotLog.write((800 until 1200).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      table, "append", clusterColumn = Some("id"), nFiles = 4)
    val files = SnapshotLog.state(spark, table).files
    assert(files.size == 12)
    val dirs = files.map(f => f.substring(0, f.lastIndexOf('/'))).distinct
    assert(dirs.size == 3)
    val before = SnapshotLog.censusListings.get()
    // minFiles above the population → pure census, no rewrite: isolates
    // the listing count from the compaction commit's own writes
    val v = SnapshotLog.compactBin(spark, table, minFiles = 100)
    assert(v == SnapshotLog.currentVersion(spark, table))
    assert(SnapshotLog.censusListings.get() - before == 3L,
      "census must list each token dir once")
    // and the sizes it returns drive the same behavior: a real pack run
    val packed = SnapshotLog.compactBin(spark, table,
      targetBytes = 64L * 1024 * 1024, smallBytes = 1024L * 1024)
    assert(packed > 2L)
    assert(SnapshotLog.read(spark, table).count() == 1200L)
  }
}
