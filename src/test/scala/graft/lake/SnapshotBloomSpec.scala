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

  test("commit-time auto-indexing keeps the sidecar fresh across append + bin-pack") {
    val root = tmpDir("snapbloom_auto")
    val table = s"$root/t"
    // base u values are EVEN and span [0, 7998] in every file — an ODD
    // in-domain probe survives every zone map (intervals contain it) and
    // only the blooms can prune, which is what this test measures
    SnapshotLog.write((0 until 4000).map(i =>
      (i.toLong, ((i * 3571L) % 4000L) * 2L)).toDF("k", "u"),
      table, "overwrite", clusterColumn = Some("k"), nFiles = 4)
    SnapshotLog.buildBloom(spark, table, "u", expectedItemsPerFile = 2000)
    spark.conf.set("spark.sql.catalog.snba", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snba.root", root)
    // two post-build appends with odd in-domain keys: WITHOUT
    // auto-indexing these files would be unindexed forever (sound but
    // scanned on every probe)
    SnapshotLog.write(Seq((100000L, 4201L)).toDF("k", "u"), table, "append")
    SnapshotLog.write(Seq((100001L, 4203L)).toDF("k", "u"), table, "append")
    val p0 = SnapshotFileIndex.bloomPrunedFiles.get()
    val u0 = SnapshotFileIndex.bloomUnindexedProbes.get()
    // probe an odd value living ONLY in one appended file: the 4 base
    // files bloom-prune (it is absent from them; their zone maps span
    // it, so only the bloom can drop them) and ZERO candidates read as
    // unindexed — proof the appended files carry sidecar rows
    assert(spark.sql("SELECT k FROM snba.t WHERE u = 4203").as[Long].collect()
      .toSeq == Seq(100001L))
    assert(SnapshotFileIndex.bloomPrunedFiles.get() - p0 >= 4L,
      "the 4 base files must bloom-prune for an absent odd probe")
    assert(SnapshotFileIndex.bloomUnindexedProbes.get() == u0,
      "no probed file may be unindexed after auto-maintenance")
    // bin-pack folds the crumbs into a NEW file — its commit must
    // auto-index the packed output too
    // smallBytes between the 1-row crumbs (~1 KB) and the base files
    // (~16 KB): only the crumbs pack, the base files stay
    val v = SnapshotLog.compactBin(spark, table, targetBytes = 64L * 1024 * 1024,
      smallBytes = 4096L)
    assert(v > 2L, "compactBin must have committed")
    val p1 = SnapshotFileIndex.bloomPrunedFiles.get()
    val u1 = SnapshotFileIndex.bloomUnindexedProbes.get()
    assert(spark.sql("SELECT k FROM snba.t WHERE u = 4201").as[Long].collect()
      .toSeq == Seq(100000L))
    assert(SnapshotFileIndex.bloomPrunedFiles.get() - p1 >= 4L,
      "the 4 base files must bloom-prune after the pack")
    assert(SnapshotFileIndex.bloomUnindexedProbes.get() == u1,
      "the bin-packed output must be auto-indexed (telemetry stays flat)")
    // escape hatch: with auto-indexing off, a new file IS unindexed and
    // the staleness telemetry says so
    spark.conf.set("spark.graft.bloom.autoIndex", "false")
    try {
      SnapshotLog.write(Seq((100002L, 4205L)).toDF("k", "u"), table, "append")
      val u2 = SnapshotFileIndex.bloomUnindexedProbes.get()
      assert(spark.sql("SELECT k FROM snba.t WHERE u = 4205").as[Long].collect()
        .toSeq == Seq(100002L))
      assert(SnapshotFileIndex.bloomUnindexedProbes.get() > u2,
        "an unindexed probe must register in the staleness telemetry")
    } finally spark.conf.set("spark.graft.bloom.autoIndex", "true")
  }

  test("amortized auto-indexing: deferred commits batch into ONE delta build") {
    val root = tmpDir("snapbloom_amort")
    val table = s"$root/t"
    SnapshotLog.write((0 until 4000).map(i =>
      (i.toLong, ((i * 3571L) % 4000L) * 2L)).toDF("k", "u"),
      table, "overwrite", clusterColumn = Some("k"), nFiles = 4)
    SnapshotLog.buildBloom(spark, table, "u", expectedItemsPerFile = 2000)
    // geometry metadata landed beside the filters: per-commit geometry
    // resolution is one tiny file read, not a head(1) Spark job
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$table/_bloom/u/_geometry")),
      "buildBloom must persist the _geometry metadata file")
    spark.conf.set("spark.sql.catalog.snbam", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snbam.root", root)
    spark.conf.set("spark.graft.bloom.autoIndex.everyCommits", "3")
    try {
      SnapshotLog.write(Seq((200000L, 4301L)).toDF("k", "u"), table, "append")
      SnapshotLog.write(Seq((200001L, 4303L)).toDF("k", "u"), table, "append")
      // two deferred commits: the new files are UNINDEXED (sound — they
      // scan, never prune) and the staleness telemetry says so
      val u0 = SnapshotFileIndex.bloomUnindexedProbes.get()
      assert(spark.sql("SELECT k FROM snbam.t WHERE u = 4303").as[Long].collect()
        .toSeq == Seq(200001L))
      assert(SnapshotFileIndex.bloomUnindexedProbes.get() > u0,
        "deferred files must read as unindexed before the batched build")
      // the third commit crosses everyCommits=3: ONE delta build covers
      // all three pending files
      SnapshotLog.write(Seq((200002L, 4305L)).toDF("k", "u"), table, "append")
      val u1 = SnapshotFileIndex.bloomUnindexedProbes.get()
      assert(spark.sql("SELECT k FROM snbam.t WHERE u = 4301").as[Long].collect()
        .toSeq == Seq(200000L))
      assert(spark.sql("SELECT k FROM snbam.t WHERE u = 4305").as[Long].collect()
        .toSeq == Seq(200002L))
      assert(SnapshotFileIndex.bloomUnindexedProbes.get() == u1,
        "one batched build must cover every deferred file")
    } finally spark.conf.unset("spark.graft.bloom.autoIndex.everyCommits")
  }

  test("sidecar delta dirs self-compact past the threshold; probes unaffected") {
    val root = tmpDir("snapbloom_fold")
    val table = s"$root/t"
    SnapshotLog.write((0 until 4000).map(i =>
      (i.toLong, ((i * 3571L) % 4000L) * 2L)).toDF("k", "u"),
      table, "overwrite", clusterColumn = Some("k"), nFiles = 4)
    SnapshotLog.buildBloom(spark, table, "u", expectedItemsPerFile = 2000)
    spark.conf.set("spark.sql.catalog.snbf", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snbf.root", root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def deltaDirs(): Int = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$table/_bloom/u"))
      .count(st => st.isDirectory && st.getPath.getName.startsWith("delta-"))
    spark.conf.set("spark.graft.bloom.maxDeltaDirs", "3")
    try {
      // 6 appends: without folding that is 6 delta dirs; the threshold
      // folds the tree back to ONE whenever the count crosses 3
      for (i <- 0 until 6)
        SnapshotLog.write(Seq((200000L + i, 4211L + 2 * i)).toDF("k", "u"),
          table, "append")
      assert(deltaDirs() <= 4, s"delta dirs must fold, got ${deltaDirs()}")
      // every appended file still indexed: an odd probe prunes the 4
      // base files and nothing reads unindexed
      val u0 = SnapshotFileIndex.bloomUnindexedProbes.get()
      val p0 = SnapshotFileIndex.bloomPrunedFiles.get()
      assert(spark.sql("SELECT k FROM snbf.t WHERE u = 4221").as[Long].collect()
        .toSeq == Seq(200005L))
      assert(SnapshotFileIndex.bloomPrunedFiles.get() - p0 >= 4L)
      assert(SnapshotFileIndex.bloomUnindexedProbes.get() == u0,
        "folding must not lose any file's sidecar row")
    } finally spark.conf.unset("spark.graft.bloom.maxDeltaDirs")
  }

  test("sidecar survives ALTER TABLE RENAME TO (pool-relative re-anchor)") {
    val root = tmpDir("snapbloom_mv")
    spark.conf.set("spark.sql.catalog.snbm", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snbm.root", root)
    SnapshotLog.write((0 until 4000).map(i => (i.toLong, ((i * 3571) % 4000).toLong))
      .toDF("k", "u"), s"$root/t", "overwrite", clusterColumn = Some("k"), nFiles = 4)
    SnapshotLog.buildBloom(spark, s"$root/t", "u", expectedItemsPerFile = 2000)
    spark.sql("ALTER TABLE snbm.t RENAME TO t2")
    val before = SnapshotFileIndex.bloomPrunedFiles.get()
    assert(spark.sql("SELECT count(*) FROM snbm.t2 WHERE u = 123").as[Long].head() == 1L)
    // >= 3: a planning pass may invoke listFiles more than once, each
    // pass pruning the same 3-of-4 — the claim is that pruning happens
    // at all post-rename, which the re-anchor alone makes possible
    assert(SnapshotFileIndex.bloomPrunedFiles.get() - before >= 3L,
      "sidecar keys must re-anchor at the renamed root (3 of 4 files pruned)")
  }
}
