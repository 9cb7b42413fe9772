package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL time travel over the snapshot format via the DSv2 catalog. */
class SnapshotCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def register(cat: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
  }

  test("SELECT ... VERSION AS OF pins the version, head read follows the log") {
    val root = tmpDir("snapcat")
    SnapshotLog.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), s"$root/docs", "overwrite") // v0
    SnapshotLog.write(Seq((3L, "c")).toDF("id", "s"), s"$root/docs", "append") // v1
    register("snapt", root)
    assert(spark.sql("SELECT * FROM snapt.docs").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(spark.sql("SELECT * FROM snapt.docs VERSION AS OF 0")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    // aggregation + predicate through pure SQL on a pinned version
    assert(spark.sql(
      "SELECT count(*) FROM snapt.docs VERSION AS OF 1 WHERE id > 1")
      .as[Long].head() == 2L)
  }

  test("time travel imposes the schema committed at that version") {
    val root = tmpDir("snapcat_schema")
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), s"$root/t", "overwrite") // v0
    SnapshotLog.write(Seq((2L, "b", 9L)).toDF("id", "s", "x"), s"$root/t", "append",
      mergeSchema = true) // v1
    register("snaps", root)
    assert(spark.sql("SELECT * FROM snaps.t VERSION AS OF 0").columns.toSeq ==
      Seq("id", "s"))
    val head = spark.sql("SELECT id, x FROM snaps.t")
      .as[(Long, Option[Long])].collect().toSet
    assert(head == Set((1L, None), (2L, Some(9L))))
  }

  test("TIMESTAMP AS OF resolves to the newest version at or before the instant") {
    val root = tmpDir("snapcat_ts")
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), s"$root/t", "overwrite") // v0
    SnapshotLog.write(Seq((2L, "b")).toDF("id", "s"), s"$root/t", "append") // v1
    register("snapts", root)
    val ts0 = SnapshotLog.history(spark, s"$root/t")
      .where(col("version") === 0L).select("ts_millis").as[Long].head()
    val lit0 = new java.sql.Timestamp(ts0).toInstant.toString
    assert(spark.sql(s"SELECT count(*) FROM snapts.t TIMESTAMP AS OF '$lit0'")
      .as[Long].head() == 1L)
    // before creation: a clear error, not an empty read
    val early = new java.sql.Timestamp(ts0 - 3600000L).toInstant.toString
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM snapts.t TIMESTAMP AS OF '$early'").collect())
    assert(e.getMessage.contains("no version"))
  }

  test("VERSION AS OF a tag name reads the pinned snapshot") {
    val root = tmpDir("snapcat_tag")
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), s"$root/t", "overwrite") // v0
    Branches.tag(spark, s"$root/t", "march-run") // pins v0
    SnapshotLog.write(Seq((2L, "b")).toDF("id", "s"), s"$root/t", "append") // v1
    register("snaptag", root)
    assert(spark.sql("SELECT count(*) FROM snaptag.t VERSION AS OF 'march-run'")
      .as[Long].head() == 1L)
    assert(spark.sql("SELECT count(*) FROM snaptag.t").as[Long].head() == 2L)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM snaptag.t VERSION AS OF 'no-such-tag'").collect())
    assert(e.getMessage.contains("neither a commit number nor a tag"))
  }

  test("a DV-carrying version reads via SQL with its dead rows dropped") {
    val root = tmpDir("snapcat_dv")
    SnapshotLog.write((0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      s"$root/t", "overwrite", clusterColumn = Some("id"), nFiles = 2) // v0
    SnapshotLog.delete(spark, s"$root/t", col("id") === 3L) // v1: DVs
    register("snapdv", root)
    // head carries vectors: SQL applies them — exactly the API read
    assert(spark.sql("SELECT id FROM snapdv.t").as[Long].collect().toSet ==
      (0L until 10L).toSet - 3L)
    // pre-delete version still reads everything
    assert(spark.sql("SELECT count(*) FROM snapdv.t VERSION AS OF 0").as[Long].head() == 10L)
    // a second, overlapping delete grows the vector set; SQL follows
    SnapshotLog.delete(spark, s"$root/t", col("id") >= 7L) // v2
    assert(spark.sql("SELECT id FROM snapdv.t").as[Long].collect().toSet ==
      Set(0L, 1L, 2L, 4L, 5L, 6L))
    // predicates still apply (post-scan — nothing pushed into parquet on
    // a DV'd version) and aggregate answers match the API read
    assert(spark.sql("SELECT count(*) FROM snapdv.t WHERE id > 2").as[Long].head() ==
      SnapshotLog.read(spark, s"$root/t").where(col("id") > 2).count())
    // purge folds the vectors; the clean head reads the same rows
    SnapshotLog.purgeDeletes(spark, s"$root/t") // v3
    assert(spark.sql("SELECT id FROM snapdv.t").as[Long].collect().toSet ==
      Set(0L, 1L, 2L, 4L, 5L, 6L))
    // the pinned DV'd version STILL time-travels across the purge
    assert(spark.sql("SELECT count(*) FROM snapdv.t VERSION AS OF 1").as[Long].head() == 9L)
  }

  test("catalog scans zone-map prune files on WHERE (physical numFiles)") {
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val root = tmpDir("snapcat_prune")
    SnapshotLog.write((0 until 4000).map(i => (i.toLong, i.toString)).toDF("id", "s"),
      s"$root/t", "overwrite", clusterColumn = Some("id"), nFiles = 8) // v0
    register("snappr", root)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec =>
        b.inputPartitions.collect { case fp: FilePartition => fp.files.length }.sum
      }.getOrElse(fail("no BatchScanExec in the plan"))
    val point = spark.sql("SELECT * FROM snappr.t WHERE id = 42")
    assert(point.as[(Long, String)].collect().toSeq == Seq((42L, "42")))
    val pruned = scannedFiles(point)
    val full = scannedFiles(spark.sql("SELECT * FROM snappr.t"))
    assert(full == 8, s"fixture should have 8 files, saw $full")
    assert(pruned <= 2, s"point query scanned $pruned of $full files — not pruned")
    // pruning on a DV'd version too: file skipping works under the DV scan
    SnapshotLog.delete(spark, s"$root/t", col("id") === 1L) // v1
    val dvPoint = spark.sql("SELECT * FROM snappr.t WHERE id = 42")
    assert(dvPoint.as[(Long, String)].collect().toSeq == Seq((42L, "42")))
    assert(scannedFiles(dvPoint) <= 2)
    // and the DV'd point read of a dead key returns nothing
    assert(spark.sql("SELECT * FROM snappr.t WHERE id = 1").collect().isEmpty)
  }

  test("SQL DML: INSERT INTO appends, INSERT OVERWRITE replaces, DELETE commits DVs") {
    val root = tmpDir("snapcat_dml")
    SnapshotLog.write((0 until 6).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      s"$root/t", "overwrite", clusterColumn = Some("id"), nFiles = 2) // v0
    register("snapdml", root)

    // INSERT INTO: one append commit through the DSv2 write path
    spark.sql("INSERT INTO snapdml.t VALUES (100, 'x'), (101, 'y')")
    assert(SnapshotLog.currentVersion(spark, s"$root/t") == 1L)
    assert(SnapshotLog.history(spark, s"$root/t")
      .select("op").limit(1).as[String].head() == "append")
    assert(spark.sql("SELECT count(*) FROM snapdml.t").as[Long].head() == 8L)

    // DELETE FROM … WHERE: a deletion-vector commit, zero rewrites
    spark.sql("DELETE FROM snapdml.t WHERE id IN (2, 100)")
    assert(SnapshotLog.state(spark, s"$root/t").dvs.nonEmpty,
      "SQL DELETE should commit deletion vectors, not rewrite")
    assert(spark.sql("SELECT id FROM snapdml.t").as[Long].collect().toSet ==
      Set(0L, 1L, 3L, 4L, 5L, 101L))
    // time travel still sees the pre-delete rows
    assert(spark.sql("SELECT count(*) FROM snapdml.t VERSION AS OF 1").as[Long].head() == 8L)
    // a second DML on the DV'd head composes (delete by range)
    spark.sql("DELETE FROM snapdml.t WHERE id >= 101")
    assert(spark.sql("SELECT count(*) FROM snapdml.t").as[Long].head() == 5L)

    // INSERT OVERWRITE: one overwrite commit replacing the live set
    spark.sql("INSERT OVERWRITE snapdml.t VALUES (7, 'z')")
    assert(spark.sql("SELECT id, s FROM snapdml.t").as[(Long, String)]
      .collect().toSeq == Seq((7L, "z")))
    // history intact underneath: the DV'd version still time-travels
    assert(spark.sql("SELECT count(*) FROM snapdml.t VERSION AS OF 2").as[Long].head() == 6L)

    // a pinned version refuses writes
    val e = intercept[Exception](
      spark.sql("INSERT INTO snapdml.t VERSION AS OF 1 VALUES (1, 'no')"))
    assert(e != null) // parser/analyzer refuses time-travel writes
  }

  test("SQL UPDATE: atomic merge-on-read commit through the extension rule") {
    val root = tmpDir("snapcat_upd")
    SnapshotLog.write((0 until 10).map(i => (i.toLong, s"r$i", i * 1.0)).toDF("id", "s", "x"),
      s"$root/t", "overwrite", clusterColumn = Some("id"), nFiles = 2) // v0
    register("snapupd", root)
    spark.sql("UPDATE snapupd.t SET x = x + 100, s = concat(s, '!') WHERE id < 2")
    assert(SnapshotLog.history(spark, s"$root/t").select("op").limit(1)
      .as[String].head() == "update")
    val byId = spark.sql("SELECT id, s, x FROM snapupd.t")
      .as[(Long, String, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId.size == 10)
    assert(byId(0L) == ("r0!", 100.0) && byId(1L) == ("r1!", 101.0))
    assert(byId(2L) == ("r2", 2.0))
    // time travel shows the pre-update values; views of the change feed
    // see it as bounded delete+insert
    assert(spark.sql("SELECT x FROM snapupd.t VERSION AS OF 0 WHERE id = 0")
      .as[Double].head() == 0.0)
    val feed = SnapshotLog.readChanges(spark, s"$root/t", fromVersion = 0L)
      .groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(feed == Map("delete" -> 2L, "insert" -> 2L))
    // a pinned version refuses UPDATE... via the command's writable guard
    // (Spark's parser has no time-travel UPDATE syntax, so nothing to test
    // there); an UPDATE with an unknown column fails in analysis
    intercept[Exception](spark.sql("UPDATE snapupd.t SET nope = 1"))
  }

  test("SQL MERGE INTO: conditional arms, one atomic DV+append commit") {
    val root = tmpDir("snapcat_merge")
    SnapshotLog.write((0 until 10).map(i => (i.toLong, s"r$i", i * 1.0)).toDF("id", "s", "x"),
      s"$root/t", "overwrite", clusterColumn = Some("id"), nFiles = 2) // v0
    register("snapmrg", root)
    Seq((1L, "u1", 100.0), (3L, "u3", -1.0), (50L, "new", 500.0), (60L, "drop", -1.0))
      .toDF("mid", "ms", "mx").createOrReplaceTempView("merge_src")
    spark.sql(
      """MERGE INTO snapmrg.t AS t USING merge_src AS s ON t.id = s.mid
        |WHEN MATCHED AND s.mx < 0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET s = s.ms, x = s.mx + t.x
        |WHEN NOT MATCHED AND s.mx > 0 THEN INSERT (id, s, x) VALUES (s.mid, s.ms, s.mx)
        |""".stripMargin)
    // ONE commit carrying both halves
    assert(SnapshotLog.currentVersion(spark, s"$root/t") == 1L)
    assert(SnapshotLog.history(spark, s"$root/t").select("op").limit(1)
      .as[String].head() == "merge_into")
    val byId = spark.sql("SELECT id, s, x FROM snapmrg.t")
      .as[(Long, String, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId(1L) == ("u1", 101.0), "matched update with both-side refs")
    assert(!byId.contains(3L), "matched delete arm (first matching arm wins)")
    assert(byId(50L) == ("new", 500.0), "conditional insert arm")
    assert(!byId.contains(60L), "insert arm condition filtered the row")
    assert(byId(2L) == ("r2", 2.0), "unmatched target rows untouched")
    assert(byId.size == 10) // 10 − deleted 3 + inserted 50
    // time travel shows v0; the feed sees bounded deletes+inserts
    assert(spark.sql("SELECT count(*) FROM snapmrg.t VERSION AS OF 0")
      .as[Long].head() == 10L)
    val feed = SnapshotLog.readChanges(spark, s"$root/t", fromVersion = 0L)
      .groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(feed == Map("delete" -> 2L, "insert" -> 2L))
    // duplicate source matches throw the standard cardinality error
    Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("mid", "ms", "mx")
      .createOrReplaceTempView("merge_dup")
    val e = intercept[Exception](spark.sql(
      """MERGE INTO snapmrg.t AS t USING merge_dup AS s ON t.id = s.mid
        |WHEN MATCHED THEN UPDATE SET x = s.mx""".stripMargin))
    assert(e.getMessage.contains("more than one source row"))

    // WHEN NOT MATCHED BY SOURCE: target rows outside the source get
    // their own arms (prune disabled for this shape — table-wide by
    // definition); keep ids < 3 and 50+, flag 4..9 as stale, drop none
    Seq((1L, 0.0), (2L, 0.0), (50L, 0.0)).toDF("mid", "mx")
      .createOrReplaceTempView("merge_keep")
    spark.sql(
      """MERGE INTO snapmrg.t AS t USING merge_keep AS s ON t.id = s.mid
        |WHEN NOT MATCHED BY SOURCE AND t.id >= 9 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET s = 'stale'
        |""".stripMargin)
    val after = spark.sql("SELECT id, s FROM snapmrg.t")
      .as[(Long, String)].collect().toMap
    assert(!after.contains(9L), "delete arm on the unmatched side")
    assert(after(4L) == "stale" && after(8L) == "stale")
    assert(after(1L) == "u1" && after(50L) == "new", "matched rows untouched")
  }

  test("CTAS creates a snapshot table: empty v0 + append, readable back") {
    val root = tmpDir("snapcat_ctas")
    // seed something so the namespace dir exists
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), s"$root/seed", "overwrite")
    register("snapctas", root)
    spark.sql(
      "CREATE TABLE snapctas.derived AS SELECT id * 10 AS id10, s FROM snapctas.seed")
    assert(spark.sql("SELECT id10, s FROM snapctas.derived")
      .as[(Long, String)].collect().toSeq == Seq((10L, "a")))
    // the log shape: v0 create (empty), v1 append with the rows
    assert(SnapshotLog.history(spark, s"$root/derived")
      .select("op").as[String].collect().toSeq == Seq("append", "create"))
    // and it is a real snapshot table: DML composes on it
    spark.sql("DELETE FROM snapctas.derived WHERE id10 = 10")
    assert(spark.sql("SELECT count(*) FROM snapctas.derived").as[Long].head() == 0L)
    // PARTITIONED BY is refused with a pointer to clustering
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE snapctas.p (id BIGINT) PARTITIONED BY (id)"))
    assert(e.getMessage.contains("cluster at write time") ||
      e.getMessage.toLowerCase.contains("partition"))
  }

  test("branches address through the catalog namespace: the WAP loop in SQL") {
    val root = tmpDir("snapcat_branch")
    SnapshotLog.write((0 until 6).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      s"$root/t", "overwrite", clusterColumn = Some("id"), nFiles = 2) // main v0
    Branches.create(spark, s"$root/t", "audit")
    register("snapbr", root)
    // a branch log is a table at <table>/_branches/<name> — the catalog's
    // namespace → path mapping serves it with zero extra code
    assert(spark.sql("SELECT count(*) FROM snapbr.t.`_branches`.audit")
      .as[Long].head() == 6L)
    // WRITE stage: SQL INSERT lands on the branch (shared pool, branch
    // log) — main readers never see it
    spark.sql("INSERT INTO snapbr.t.`_branches`.audit VALUES (100, 'new')")
    spark.sql("DELETE FROM snapbr.t.`_branches`.audit WHERE id = 0")
    assert(spark.sql("SELECT count(*) FROM snapbr.t.`_branches`.audit")
      .as[Long].head() == 6L) // 6 + 1 − 1
    assert(spark.sql("SELECT count(*) FROM snapbr.t").as[Long].head() == 6L,
      "unpublished branch work must be invisible on main")
    // AUDIT in SQL against the branch, then PUBLISH: one main commit
    assert(spark.sql(
      "SELECT count(*) FROM snapbr.t.`_branches`.audit WHERE s IS NULL")
      .as[Long].head() == 0L)
    Branches.publish(spark, s"$root/t", "audit")
    assert(spark.sql("SELECT id FROM snapbr.t").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L, 5L, 100L))
  }

  test("ALTER/DROP/RENAME refused; listTables sees only snapshot tables") {
    val root = tmpDir("snapcat_ro")
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), s"$root/t1", "overwrite")
    Seq((1L, "x")).toDF("id", "s").write.parquet(s"$root/plain") // no _log
    register("snapro", root)
    assert(spark.sql("SHOW TABLES IN snapro").select("tableName")
      .as[String].collect().toSet == Set("t1"))
    intercept[Exception](spark.sql("DROP TABLE snapro.t1"))
    intercept[Exception](spark.sql("ALTER TABLE snapro.t1 ADD COLUMN x BIGINT"))
    // missing table: the standard error, not a crash
    val e = intercept[Exception](spark.sql("SELECT * FROM snapro.nope").collect())
    assert(e.getMessage.toLowerCase.contains("table"))
  }
}
