package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

class SnapshotLogSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): String = tmpDir("snap") + "/t"

  test("append/overwrite build versions; read/readAt see each version exactly") {
    val t = mkTable()
    val v0 = SnapshotLog.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t, "overwrite")
    val v1 = SnapshotLog.write(Seq((3L, "c")).toDF("id", "s"), t, "append")
    val v2 = SnapshotLog.write(Seq((9L, "z")).toDF("id", "s"), t, "overwrite")
    assert(Seq(v0, v1, v2) == Seq(0L, 1L, 2L))
    assert(SnapshotLog.read(spark, t).as[(Long, String)].collect().toSet == Set((9L, "z")))
    assert(SnapshotLog.read(spark, t, Some(0)).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    assert(SnapshotLog.read(spark, t, Some(1)).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(SnapshotLog.currentVersion(spark, t) == 2L)
  }

  test("rollback restores an old version as a NEW commit; history records it") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite")
    SnapshotLog.write(Seq((2L, "b")).toDF("id", "s"), t, "append")
    SnapshotLog.write(Seq((666L, "bad")).toDF("id", "s"), t, "overwrite")
    val v3 = SnapshotLog.rollback(spark, t, 1L)
    assert(v3 == 3L)
    assert(SnapshotLog.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // the bad version is still time-travelable — rollback never erases
    assert(SnapshotLog.read(spark, t, Some(2)).as[(Long, String)].collect().toSet ==
      Set((666L, "bad")))
    val h = SnapshotLog.history(spark, t)
      .select("version", "op", "rollback_of").as[(Long, String, Option[Long])]
      .collect().toSeq
    assert(h.head == ((3L, "rollback", Some(1L))))
    assert(h.map(_._1) == Seq(3L, 2L, 1L, 0L))
  }

  test("time travel imposes the schema committed at that version") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite")
    SnapshotLog.write(
      Seq((2L, "b", 0.5)).toDF("id", "s", "score"), t, "overwrite")
    assert(SnapshotLog.read(spark, t, Some(0)).columns.toSeq == Seq("id", "s"))
    assert(SnapshotLog.read(spark, t, Some(1)).columns.toSeq == Seq("id", "s", "score"))
  }

  test("checkpoints seed the replay and survive torn checkpoint files") {
    val t = mkTable()
    SnapshotLog.write(Seq((0L, "x")).toDF("id", "s"), t, "overwrite",
      checkpointInterval = 4)
    (1 to 9).foreach(i => SnapshotLog.write(Seq((i.toLong, "x")).toDF("id", "s"), t,
      "append", checkpointInterval = 4))
    val root = new Path(t)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cps = fs.listStatus(new Path(root, "_log"))
      .map(_.getPath.getName).filter(_.endsWith(".cp")).sorted.toSeq
    assert(cps == Seq("v000000000004.cp", "v000000000008.cp"))
    // tear the newest checkpoint: truncate its trailer
    val torn = new Path(new Path(root, "_log"), "v000000000008.cp")
    val body = {
      val in = fs.open(torn)
      val bytes = new Array[Byte](fs.getFileStatus(torn).getLen.toInt)
      in.readFully(bytes); in.close(); new String(bytes, "UTF-8")
    }
    fs.delete(torn, false)
    val out = fs.create(torn, true)
    out.write(body.substring(0, body.length / 2).getBytes("UTF-8")); out.close()
    // reads still resolve every version (fall back to v4's checkpoint)
    assert(SnapshotLog.read(spark, t).count() == 10L)
    assert(SnapshotLog.read(spark, t, Some(6)).count() == 7L)
  }

  test("clustered snapshot write yields range-disjoint files") {
    val t = mkTable()
    val df = spark.range(0, 10000).select(col("id"), (col("id") % 7).as("g"))
    SnapshotLog.write(df, t, "overwrite", clusterColumn = Some("id"), nFiles = 4)
    val stats = Metastore.buildFromFooters(spark, t + "/data", "id")
      .select("id_min", "id_max").as[(Long, Long)].collect().sortBy(_._1)
    assert(stats.length == 4)
    stats.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2)
      case _ =>
    }
  }

  test("expire drops old versions + their exclusive files, keeps retained readable") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite")   // v0
    SnapshotLog.write(Seq((666L, "bad")).toDF("id", "s"), t, "overwrite") // v1
    SnapshotLog.write(Seq((2L, "b")).toDF("id", "s"), t, "overwrite")   // v2
    SnapshotLog.write(Seq((3L, "c")).toDF("id", "s"), t, "append")      // v3
    val dropped = SnapshotLog.expire(spark, t, keepLast = 2)
    assert(dropped.nonEmpty) // v0+v1's exclusive files reclaimed
    // retained versions still resolve bit-for-bit
    assert(SnapshotLog.read(spark, t, Some(2)).as[(Long, String)].collect().toSet ==
      Set((2L, "b")))
    assert(SnapshotLog.read(spark, t, Some(3)).as[(Long, String)].collect().toSet ==
      Set((2L, "b"), (3L, "c")))
    // expired versions refuse with a clear message
    val err = intercept[IllegalArgumentException](SnapshotLog.read(spark, t, Some(0)))
    assert(err.getMessage.contains("expired"))
    // v2's data file survived (v3 references it)
    assert(SnapshotLog.read(spark, t).count() == 2L)
  }

  test("a torn head manifest is never served and its version is reclaimed") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite")
    val root = new Path(t)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a writer that died mid-manifest at v1
    val torn = new Path(new Path(root, "_log"), "v000000000001.mf")
    val out = fs.create(torn, false)
    out.write(s"${SnapshotLog.Magic}\nversion=1\nts=1\nop=append\n".getBytes("UTF-8"))
    out.close()
    assert(SnapshotLog.currentVersion(spark, t) == 0L)
    assert(SnapshotLog.read(spark, t).count() == 1L)
    // next committer reclaims v1
    val v = SnapshotLog.write(Seq((2L, "b")).toDF("id", "s"), t, "append")
    assert(v == 1L)
    assert(SnapshotLog.read(spark, t).count() == 2L)
  }

  test("overwrite planned against a stale head throws instead of losing the update") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite")
    val stale = SnapshotLog.state(spark, t) // head = v0
    SnapshotLog.write(Seq((2L, "b")).toDF("id", "s"), t, "append") // advances to v1
    intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.commit(spark, t, "overwrite", Nil, stale.files,
        stale.schemaJson, expected = stale.version)
    }
  }

  test("expireOrphans reclaims only unreferenced token dirs past grace") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite")
    // strand a fake crashed-writer dir
    val orphan = new Path(t, "data/deadbeef0000")
    val fs = orphan.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(orphan)
    val out = fs.create(new Path(orphan, "part-0.parquet"), true)
    out.write(Array[Byte](1, 2, 3)); out.close()
    assert(SnapshotLog.expireOrphans(spark, t, graceMs = Long.MaxValue).isEmpty)
    val gone = SnapshotLog.expireOrphans(spark, t, graceMs = -1000L)
    assert(gone.exists(_.endsWith("deadbeef0000")))
    assert(!fs.exists(orphan))
    assert(SnapshotLog.read(spark, t).count() == 1L) // live data untouched
  }

  test("appendBatch is exactly-once: a replayed batch token commits nothing") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite")
    val v1 = SnapshotLog.appendBatch(Seq((2L, "b")).toDF("id", "s"), t, "batch-7")
    assert(v1 == 1L)
    // crashed micro-batch re-runs with the same token
    val again = SnapshotLog.appendBatch(Seq((2L, "b")).toDF("id", "s"), t, "batch-7")
    assert(again == -1L)
    assert(SnapshotLog.read(spark, t).count() == 2L)
    // a NEW token commits normally
    assert(SnapshotLog.appendBatch(Seq((3L, "c")).toDF("id", "s"), t, "batch-8") == 2L)
    assert(SnapshotLog.read(spark, t).count() == 3L)
  }

  test("appendBatch retry after a write-but-no-commit crash lands the batch once") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite")
    // simulate the crash: the token dir exists, no manifest references it
    val orphanDf = Seq((2L, "b")).toDF("id", "s")
    orphanDf.write.parquet(s"$t/data/batch-9")
    assert(SnapshotLog.read(spark, t).count() == 1L) // not visible yet
    val v = SnapshotLog.appendBatch(orphanDf, t, "batch-9")
    assert(v == 1L)
    assert(SnapshotLog.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("compact rewrites the head clustered without touching history") {
    val t = mkTable()
    (0 until 5).foreach(i => SnapshotLog.write(
      spark.range(i * 100, (i + 1) * 100).select(col("id"), lit(i).as("g")),
      t, if (i == 0) "overwrite" else "append"))
    val before = SnapshotLog.state(spark, t)
    assert(before.files.size >= 5)
    val v = SnapshotLog.compact(spark, t, "id", nFiles = 2)
    val after = SnapshotLog.state(spark, t)
    assert(after.version == v && after.files.size == 2)
    assert(SnapshotLog.read(spark, t).count() == 500L)
    // pre-compaction version unchanged, file-for-file
    assert(SnapshotLog.state(spark, t, Some(before.version)).files == before.files)
    // the rewrite is genuinely clustered: disjoint id ranges per file
    val stats = Metastore.buildFromFooters(spark, t + "/data", "id",
        onlyPaths = after.files.map(f => s"$t/$f"))
      .select("id_min", "id_max").as[(Long, Long)].collect().sortBy(_._1)
    assert(stats.length == 2 && stats(0)._2 < stats(1)._1)
  }

  test("stats-only aggregation composes with time travel") {
    val t = mkTable()
    SnapshotLog.write(spark.range(0, 1000).toDF("id"), t, "overwrite",
      clusterColumn = Some("id"), nFiles = 4)
    SnapshotLog.write(spark.range(1000, 2000).toDF("id"), t, "append",
      clusterColumn = Some("id"), nFiles = 4)
    def agg(asOf: Long) = {
      val snap = SnapshotLog.state(spark, t, Some(asOf))
      StatsAgg.rangeAggFiles(spark, snap.files.map(f => s"$t/$f"),
          SnapshotLog.read(spark, t, Some(asOf)).schema, "id",
          0L, 5000L)
        .as[(Long, Long, Long)].head()
    }
    assert(agg(0L) == ((1000L, 0L, 999L)))  // v0 never sees v1's rows
    assert(agg(1L) == ((2000L, 0L, 1999L)))
    // and the fully-covered case costs zero scans on the version's files
    val snap0 = SnapshotLog.state(spark, t, Some(0L))
    val p = StatsAgg.planFiles(spark, snap0.files.map(f => s"$t/$f"),
      org.apache.spark.sql.types.LongType, "id", Long.MinValue, Long.MaxValue)
    assert(p.scanned.isEmpty && p.covered.size == snap0.files.size)
  }

  test("readPruned: time travel with zone maps — point query skips files of THAT version") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val t = mkTable()
    SnapshotLog.write(spark.range(0, 4000).toDF("id"), t, "overwrite",
      clusterColumn = Some("id"), nFiles = 4)                  // v0: 4 files
    SnapshotLog.write(spark.range(4000, 8000).toDF("id"), t, "append",
      clusterColumn = Some("id"), nFiles = 4)                  // v1: 8 files
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val scans = df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty)
      scans.map(_.metrics("numFiles").value).sum
    }
    // head: the point row lives in exactly one of 8 files
    val head = SnapshotLog.readPruned(spark, t, "id").where(col("id") === 4100L)
    assert(head.as[Long].collect().toSeq == Seq(4100L))
    assert(filesRead(head) == 1L)
    // v0: the same predicate matches NOTHING and prunes EVERYTHING —
    // v1's files are invisible to the pinned version, not just pruned
    val v0 = SnapshotLog.readPruned(spark, t, "id", asOf = Some(0L))
      .where(col("id") === 4100L)
    assert(v0.count() == 0L)
    assert(filesRead(v0) == 0L)
    // and an in-version point query on v0 reads one of ITS 4 files
    val v0hit = SnapshotLog.readPruned(spark, t, "id", asOf = Some(0L))
      .where(col("id") === 123L)
    assert(v0hit.as[Long].collect().toSeq == Seq(123L))
    assert(filesRead(v0hit) == 1L)
  }

  test("merge: upserts replace, deletes vanish, unaffected files stay byte-identical") {
    val t = mkTable()
    val base = spark.range(0, 1000).select(col("id"), (col("id") * 10).as("v"))
    SnapshotLog.write(base, t, "overwrite", clusterColumn = Some("id"), nFiles = 5)
    val before = SnapshotLog.state(spark, t)
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileMeta(rel: Seq[String]) = rel.map { f =>
      val st = fs.getFileStatus(new Path(new Path(t), f))
      f -> ((st.getLen, st.getModificationTime))
    }.toMap
    val metaBefore = fileMeta(before.files)

    // keys 42 and 77 live in the first file's range; 5000 is brand new
    val ups = Seq((42L, -1L), (5000L, -2L)).toDF("id", "v")
    val v1 = SnapshotLog.merge(spark, t, "id", ups, deleteKeys = Seq(77L))
    assert(v1 == 1L)

    val got = SnapshotLog.read(spark, t).as[(Long, Long)].collect().toMap
    assert(got(42L) == -1L && got(5000L) == -2L)
    assert(!got.contains(77L))
    assert(got(100L) == 1000L) // untouched row rides along
    assert(got.size == 1000L)  // -1 deleted, +1 inserted

    // only the affected file(s) were rewritten; survivors byte-identical
    val after = SnapshotLog.state(spark, t)
    val kept = after.files.toSet.intersect(before.files.toSet)
    assert(kept.nonEmpty, "merge must not rewrite unaffected files")
    val metaAfter = fileMeta(kept.toSeq)
    kept.foreach(f => assert(metaAfter(f) == metaBefore(f), s"$f changed"))

    // pre-merge version still time-travels to the original content
    val v0 = SnapshotLog.read(spark, t, Some(0L)).as[(Long, Long)].collect().toMap
    assert(v0(42L) == 420L && v0.contains(77L) && !v0.contains(5000L))

    // history records the merge
    val h = SnapshotLog.history(spark, t).select("version", "op")
      .as[(Long, String)].collect().toMap
    assert(h(1L) == "merge")
  }

  test("merge planned against a stale head throws instead of resurrecting rows") {
    val t = mkTable()
    SnapshotLog.write(spark.range(0, 100).select(col("id"), col("id").as("v")),
      t, "overwrite", clusterColumn = Some("id"), nFiles = 2)
    // interleave a commit between the merge's plan read and its claim:
    // simulate by committing first, then calling merge with a doctored
    // expectation — the public API reads head at entry, so race it with
    // a plain commit from "another writer" inside the same JVM
    val cur = SnapshotLog.state(spark, t)
    // another writer advances the table
    SnapshotLog.write(spark.range(100, 110).select(col("id"), col("id").as("v")),
      t, "append")
    // a merge that planned against v0 must fail its claim
    intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.commit(spark, t, "merge", Nil, cur.files, cur.schemaJson,
        expected = cur.version)
    }
  }

  test("merge into an empty or miss-only table inserts the upserts") {
    val t = mkTable()
    SnapshotLog.write(spark.range(0, 10).select(col("id"), col("id").as("v")),
      t, "overwrite", clusterColumn = Some("id"), nFiles = 1)
    // keys far outside every file's range: no file rewritten, pure insert
    val v = SnapshotLog.merge(spark, t, "id",
      Seq((999L, 1L)).toDF("id", "v"))
    assert(v == 1L)
    val got = SnapshotLog.read(spark, t).as[(Long, Long)].collect().toMap
    assert(got.size == 11 && got(999L) == 1L)
    // no-op merge: empty upserts, no deletes
    assert(SnapshotLog.merge(spark, t, "id",
      Seq.empty[(Long, Long)].toDF("id", "v")) == 1L)
  }

  test("empty snapshot reads as an empty, correctly-typed frame") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite")
    val cur = SnapshotLog.state(spark, t)
    SnapshotLog.commit(spark, t, "overwrite", Nil, cur.files, cur.schemaJson,
      expected = cur.version)
    val df = SnapshotLog.read(spark, t)
    assert(df.columns.toSeq == Seq("id", "s"))
    assert(df.count() == 0L)
  }

  test("compactZ: multi-dimension pruning on the versioned format, history untouched") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val scans = df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, "no FileSourceScanExec in plan")
      scans.map(_.metrics("numFiles").value).sum
    }
    val t = mkTable()
    // two independent uniform dims — a single-column sort can't serve both
    val rows = (0 until 4096).map(i => (i.toLong, ((i * 2654435761L) % 4096L), s"r$i"))
    SnapshotLog.write(rows.toDF("a", "b", "s"), t, "overwrite",
      clusterColumn = Some("a"), nFiles = 16) // v0: range-clustered on a only
    val v1 = SnapshotLog.compactZ(spark, t, Seq("a", "b"), nFiles = 16) // v1
    assert(v1 == 1L)
    // same rows before and after (a clustering rewrite is a row no-op)
    assert(SnapshotLog.read(spark, t).count() === 4096L)
    assert(SnapshotLog.read(spark, t, Some(0L)).count() === 4096L)
    assert(SnapshotLog.readChanges(spark, t, 0L).count() === 0L)
    // point-range queries on EITHER dimension prune files at v1
    val pruned = SnapshotLog.readPruned(spark, t, "a", optionalColumns = Seq("b"))
    val onA = filesRead(pruned.where(col("a").between(100L, 120L)))
    val onB = filesRead(pruned.where(col("b").between(100L, 120L)))
    assert(onA < 16, s"Z-order must prune on dim a (read $onA/16)")
    assert(onB < 16, s"Z-order must prune on dim b (read $onB/16)")
    // results match the unpruned read exactly
    assert(pruned.where(col("b").between(100L, 120L)).count() ===
      SnapshotLog.read(spark, t).where(col("b").between(100L, 120L)).count())
  }

  test("appendBatch on a long log reads O(checkpointInterval) manifests, not O(commits)") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite") // v0
    val schemaJson = SnapshotLog.state(spark, t).schemaJson
    // 99 synthetic commits (the token machinery never opens data files,
    // so fake paths keep the 100-commit log cheap to build); default
    // checkpoint interval = 10
    for (i <- 1 to 99)
      SnapshotLog.commit(spark, t, "append",
        adds = Seq(s"data/synth$i/part-0.parquet"), removes = Nil,
        schemaJson = schemaJson, expected = i - 1L)
    assert(SnapshotLog.currentVersion(spark, t) == 99L)
    SnapshotLog.tokenScanManifestReads.set(0L)
    // replayed token from v1 — 90+ commits and several checkpoints ago
    assert(SnapshotLog.appendBatch(Seq((2L, "b")).toDF("id", "s"), t, "synth1") == -1L)
    // fresh token commits (pre-check + claim-loop check = 2 scans)
    assert(SnapshotLog.appendBatch(Seq((2L, "b")).toDF("id", "s"), t, "fresh-1") == 100L)
    val reads = SnapshotLog.tokenScanManifestReads.get()
    // 3 token scans (1 replay check + 2 in the fresh append), each
    // seeded from the v90 checkpoint → ≤ ~10 manifests per scan; the
    // old O(commits) path would have read ~300 here
    assert(reads <= 45L, s"token scans read $reads manifests — not checkpoint-seeded?")
    // the fresh batch's files are live (the synthetic paths make a full
    // read impossible, so check the committed state directly)
    assert(SnapshotLog.state(spark, t).files.exists(_.startsWith("data/fresh-1/")))
  }

  test("exactly-once token skip survives expire dropping the referencing manifest") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite") // v0
    assert(SnapshotLog.appendBatch(Seq((2L, "b")).toDF("id", "s"), t, "batch-0") == 1L)
    for (i <- 100 to 110) // advance far enough that v1 expires
      SnapshotLog.write(Seq((i.toLong, s"r$i")).toDF("id", "s"), t, "append")
    SnapshotLog.expire(spark, t, keepLast = 3)
    // v1's manifest is gone — the cumulative checkpoint token set must
    // still skip the replay (the old manifest-scan skip would re-commit)
    intercept[Exception](SnapshotLog.read(spark, t, Some(1L)))
    assert(SnapshotLog.appendBatch(Seq((2L, "b")).toDF("id", "s"), t, "batch-0") == -1L)
    assert(SnapshotLog.read(spark, t).where(col("id") === 2L).count() == 1L)
  }

  test("update: one atomic DV+append commit, zero rewrites, time travel intact") {
    val t = mkTable()
    SnapshotLog.write((0 until 20).map(i => (i.toLong, s"r$i", i * 1.0)).toDF("id", "s", "x"),
      t, "overwrite", clusterColumn = Some("id"), nFiles = 4) // v0
    val v0Files = SnapshotLog.state(spark, t).files.toSet
    val v = SnapshotLog.update(spark, t, col("id") < 3L,
      Map("x" -> (col("x") + 100), "s" -> concat(col("s"), lit("!"))))
    assert(v == 1L)
    val snap = SnapshotLog.state(spark, t)
    // zero rewrites: every v0 file still live, vectors on the dirty ones
    assert(v0Files.subsetOf(snap.files.toSet))
    assert(snap.dvs.nonEmpty)
    assert(SnapshotLog.history(spark, t).select("op").limit(1)
      .as[String].head() == "update")
    val byId = SnapshotLog.read(spark, t)
      .as[(Long, String, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId.size == 20)
    assert(byId(0L) == ("r0!", 100.0) && byId(2L) == ("r2!", 102.0))
    assert(byId(3L) == ("r3", 3.0), "unmatched rows untouched")
    // pre-update version still reads the old values
    assert(SnapshotLog.read(spark, t, Some(0L)).where(col("id") === 0L)
      .select("x").as[Double].head() == 0.0)
    // an update overlapping a prior DELETE touches only live rows
    SnapshotLog.delete(spark, t, col("id") === 5L) // v2
    SnapshotLog.update(spark, t, col("id").between(4L, 6L),
      Map("x" -> lit(-1.0))) // v3: 4 and 6 only — 5 is dead
    val after = SnapshotLog.read(spark, t)
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(!after.contains(5L) && after(4L) == -1.0 && after(6L) == -1.0)
    assert(after.size == 19)
    // update matching nothing: head unchanged
    assert(SnapshotLog.update(spark, t, col("id") === 999L,
      Map("x" -> lit(0.0))) == 3L)
    // and purge folds everything with the same population
    SnapshotLog.purgeDeletes(spark, t)
    assert(SnapshotLog.state(spark, t).dvs.isEmpty)
    assert(SnapshotLog.read(spark, t).count() == 19)
  }

  test("update evaluates every SET right-hand side against the PRE-update row") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, 10.0, 20.0), (2L, 3.0, 4.0)).toDF("id", "a", "b"),
      t, "overwrite") // v0
    // the classic swap: sequential assignment application would write
    // a = b = 20 into BOTH columns
    SnapshotLog.update(spark, t, col("id") === 1L,
      Map("a" -> col("b"), "b" -> col("a")))
    val r1 = SnapshotLog.read(spark, t).where(col("id") === 1L)
      .select("a", "b").as[(Double, Double)].head()
    assert(r1 == ((20.0, 10.0)), s"SET a = b, b = a must swap, got $r1")
    // self-and-other reference: a reads both OLD values, b resets
    SnapshotLog.update(spark, t, col("id") === 2L,
      Map("a" -> (col("a") + col("b")), "b" -> lit(0.0)))
    val r2 = SnapshotLog.read(spark, t).where(col("id") === 2L)
      .select("a", "b").as[(Double, Double)].head()
    assert(r2 == ((7.0, 0.0)), s"SET a = a + b, b = 0 must use old b, got $r2")
  }

  test("deadPositions refuses beyond the driver cap with the maintenance pointer") {
    val t = mkTable()
    SnapshotLog.write((0 until 100).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      t, "overwrite") // v0
    SnapshotLog.delete(spark, t, col("id") < 10L) // v1: 10 dead rows
    val snap = SnapshotLog.state(spark, t)
    val e = intercept[IllegalStateException](
      SnapshotLog.deadPositions(spark, new Path(t), snap, maxRows = 5L))
    assert(e.getMessage.contains("purgeDeletes"), e.getMessage)
    // under the cap the map builds (and caches) fine
    assert(SnapshotLog.deadPositions(spark, new Path(t), snap)
      .values.map(_.length).sum == 10)
  }

  test("mergeInto pins the source to ONE materialization") {
    val t = mkTable()
    SnapshotLog.write((0 until 10).map(i => (i.toLong, i * 1.0)).toDF("id", "x"),
      t, "overwrite", clusterColumn = Some("id"), nFiles = 2) // v0
    SnapshotLogSpec.sourceEvals.set(0)
    val counting = udf { (i: Long) =>
      SnapshotLogSpec.sourceEvals.incrementAndGet(); i }
    val src = (0 until 4).map(i => (i.toLong, 100.0)).toDF("mid", "mx")
      .withColumn("mid", counting(col("mid")))
    SnapshotLog.mergeInto(spark, t, src, col("_t.id") === col("_s.mid"),
      matched = Seq(SnapshotLog.MatchedAction(None, Some(Map("x" -> col("_s.mx"))))),
      notMatched = Seq(SnapshotLog.NotMatchedAction(None,
        Map("id" -> col("_s.mid"), "x" -> col("_s.mx")))))
    // the cardinality check, the matched join, and the not-matched
    // anti-join all consume the source — but it must be EVALUATED
    // exactly once (4 rows), or a non-deterministic source could pass
    // the duplicate check yet write duplicates
    assert(SnapshotLogSpec.sourceEvals.get() == 4,
      s"source evaluated ${SnapshotLogSpec.sourceEvals.get()} row-times, expected 4")
    val byId = SnapshotLog.read(spark, t).as[(Long, Double)].collect().toMap
    assert(byId.size == 10 && byId(0L) == 100.0 && byId(3L) == 100.0 && byId(4L) == 4.0)
  }

  test("expire rewrites a token-less horizon checkpoint before dropping manifests") {
    val t = mkTable()
    // build a log whose horizon checkpoint predates token indexing:
    // commits with interval 2 land a checkpoint at v2, then the file is
    // DEGRADED in place to the pre-token format (no '!' lines, 3-field
    // trailer) — exactly what an upgraded production log carries
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite",
      checkpointInterval = 2) // v0
    assert(SnapshotLog.appendBatch(Seq((2L, "b")).toDF("id", "s"), t, "batch-1",
      checkpointInterval = 2) == 1L) // v1
    SnapshotLog.write(Seq((3L, "c")).toDF("id", "s"), t, "append",
      checkpointInterval = 2) // v2 + checkpoint
    SnapshotLog.write(Seq((4L, "d")).toDF("id", "s"), t, "append",
      checkpointInterval = 2) // v3
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cp = new Path(t, "_log/v%012d.cp".format(2L))
    assert(fs.exists(cp), "fixture should have a checkpoint at v2")
    val body = {
      val in = fs.open(cp)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val degraded = body.split('\n').filterNot(_.startsWith("!")).map { ln =>
      if (ln.startsWith("end=")) ln.split(',').take(3).mkString(",") else ln
    }.mkString("", "\n", "\n")
    assert(degraded != body, "the v2 checkpoint should have carried tokens")
    fs.delete(cp, false)
    val out = fs.create(cp, false)
    try out.write(degraded.getBytes("UTF-8")) finally out.close()

    // expire to horizon v2: the token-less checkpoint must be treated as
    // MISSING and rewritten with the cumulative token set — computed
    // while v0/v1 still exist — or batch-1's token dies with v1
    SnapshotLog.expire(spark, t, keepLast = 2)
    assert(SnapshotLog.appendBatch(Seq((2L, "b")).toDF("id", "s"), t, "batch-1") == -1L,
      "replayed pre-horizon batch must still be recognized after expire")
    assert(SnapshotLog.read(spark, t).where(col("id") === 2L).count() == 1L)
  }

  test("maintain's non-triggering policy check is JOBLESS (driver footer counts)") {
    val t = mkTable()
    SnapshotLog.write((1 to 40).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      t, "overwrite", clusterColumn = Some("id"), nFiles = 8) // v0
    SnapshotLog.delete(spark, t, col("id") === 3L) // v1: one dirty file
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (armed.get()) { jobs.add(j.stageInfos.map(_.name).mkString("; ")); () }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // drain any straggler bus events from the fixture's own jobs
      // before arming the counter (the listener bus is asynchronous)
      spark.range(1).count(); Thread.sleep(500)
      armed.set(true)
      // bounds not crossed: 1/8 dirty < 0.9, dead rows 1 < 10⁶ — the
      // check must read DV footers on the driver, never run a job
      val head = SnapshotLog.currentVersion(spark, t)
      assert(SnapshotLog.maintain(spark, t,
        maxDirtyFraction = 0.9, maxDeadRows = 1000000L) == head)
      // generous drain window for the async bus, then: no job may have
      // started while maintain ran (JobStart posts at submission time,
      // well inside this window on a local bus)
      Thread.sleep(1500)
      assert(jobs.isEmpty,
        s"maintain's no-op path ran ${jobs.size} Spark job(s) — not " +
          s"jobless: ${jobs.toArray.mkString(" | ")}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("compactZ validates buckets against the per-dimension code space up front") {
    val t = mkTable()
    // 8 dimensions → min(16, 62/8) = 7 bits → at most 128 buckets
    val df8 = (0 until 64).map(i => (i.toLong, i * 2L, i * 3L, i * 5L,
      i * 7L, i * 11L, i * 13L, i * 17L))
      .toDF("c1", "c2", "c3", "c4", "c5", "c6", "c7", "c8")
    SnapshotLog.write(df8, t, "overwrite")
    val cols = (1 to 8).map(i => s"c$i")
    val e = intercept[IllegalArgumentException](
      SnapshotLog.compactZ(spark, t, cols, nFiles = 2, buckets = 256))
    assert(e.getMessage.contains("code space"))
    // the same guard on the writer path
    val e2 = intercept[IllegalArgumentException](
      ClusteredWriter.writeZOrderedRanked(df8, tmpDir("zr8"), cols,
        nFiles = 2, buckets = 256))
    assert(e2.getMessage.contains("code space"))
    // at the boundary (128 = 2^7) both succeed
    SnapshotLog.compactZ(spark, t, cols, nFiles = 2, buckets = 128)
    assert(SnapshotLog.read(spark, t).count() == 64)
  }

  test("expire evicts the per-file caches; post-expire merges behave") {
    val t = mkTable()
    SnapshotLog.write((1 to 40).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      t, "overwrite", clusterColumn = Some("id"), nFiles = 4) // v0
    // merge populates the footer-stats cache for v0's files
    SnapshotLog.merge(spark, t, "id", Seq((5L, "r5-new")).toDF("id", "s")) // v1
    SnapshotLog.write(Seq((100L, "x")).toDF("id", "s"), t, "append") // v2
    val dropped = SnapshotLog.expire(spark, t, keepLast = 1)
    assert(dropped.nonEmpty, "expire should drop v0-only files")
    // the caches carry nothing about the dropped files (eviction
    // contract) — observable as: maintenance ops keep working and
    // reads serve exactly the retained head
    SnapshotLog.merge(spark, t, "id", Seq((6L, "r6-new")).toDF("id", "s")) // v3
    val byId = SnapshotLog.read(spark, t).as[(Long, String)].collect().toMap
    assert(byId(5L) == "r5-new" && byId(6L) == "r6-new" && byId(100L) == "x")
    assert(byId.size == 41)
  }

  test("a stale .crc beside a COMMITTED head adjudicates committed — never reclaimed") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite") // v0
    SnapshotLog.write(Seq((2L, "b")).toDF("id", "s"), t, "append") // v1
    // corrupt ONLY the head manifest's checksum sidecar: the body is a
    // fully-committed manifest, so readers must keep serving v1 and a
    // committer must claim v2 — the old torn-head classification would
    // silently serve v0 and, past the reclaim grace, DELETE v1 and
    // reissue its version number (a lost commit)
    val crc = java.nio.file.Paths.get(s"$t/_log/.v${"%012d".format(1)}.mf.crc")
    assert(java.nio.file.Files.exists(crc), s"fixture expects a local .crc at $crc")
    // flip the stored checksum bytes but keep the sidecar HEADER valid —
    // a header-invalid sidecar is silently ignored, not verified
    val crcBytes = java.nio.file.Files.readAllBytes(crc)
    crcBytes(crcBytes.length - 1) = (crcBytes(crcBytes.length - 1) ^ 0xff).toByte
    crcBytes(crcBytes.length - 2) = (crcBytes(crcBytes.length - 2) ^ 0xff).toByte
    java.nio.file.Files.write(crc, crcBytes)
    // fresh FileSystem statistics/caches aside, the checksummed read path
    // now fails persistently for v1 — adjudication must read raw bytes
    assert(SnapshotLog.currentVersion(spark, t) == 1L,
      "a corrupt .crc must not hide the committed head")
    assert(SnapshotLog.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // and the next commit claims v2 (no reclaim of the committed v1)
    SnapshotLog.write(Seq((3L, "c")).toDF("id", "s"), t, "append")
    assert(SnapshotLog.currentVersion(spark, t) == 2L)
    assert(SnapshotLog.read(spark, t).count() == 3L)
    // the adjudication REPAIRED the sidecar: the bad .crc is gone, so
    // the checksummed read path works again for every future reader
    assert(!java.nio.file.Files.exists(crc),
      "the stale .crc must be repaired (deleted) once the body adjudicates committed")
  }
}

object SnapshotLogSpec {
  /** Row-level evaluation counter for the merge source-pinning test —
    * a companion-object field so the UDF closure stays serializable
    * (local-mode executors share the JVM, so increments are visible). */
  val sourceEvals = new java.util.concurrent.atomic.AtomicInteger(0)
}
