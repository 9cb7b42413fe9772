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
    // predicates still apply (pushed into parquet by the vectorized
    // rewrite; re-applied above the scan on the row-based fallback)
    // and aggregate answers match the API read
    assert(spark.sql("SELECT count(*) FROM snapdv.t WHERE id > 2").as[Long].head() ==
      SnapshotLog.read(spark, s"$root/t").where(col("id") > 2).count())
    // purge folds the vectors; the clean head reads the same rows
    SnapshotLog.purgeDeletes(spark, s"$root/t") // v3
    assert(spark.sql("SELECT id FROM snapdv.t").as[Long].collect().toSet ==
      Set(0L, 1L, 2L, 4L, 5L, 6L))
    // the pinned DV'd version STILL time-travels across the purge
    assert(spark.sql("SELECT count(*) FROM snapdv.t VERSION AS OF 1").as[Long].head() == 9L)
  }

  test("DV-carrying SQL reads stay vectorized with pushed filters (rewrite rule)") {
    val root = tmpDir("snapcat_dvvec")
    SnapshotLog.write((0 until 4000).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      s"$root/t", "overwrite", clusterColumn = Some("id"), nFiles = 8) // v0
    SnapshotLog.delete(spark, s"$root/t", col("id") === 1L) // v1: DVs on one file
    register("snapdvvec", root)
    val df = spark.sql("SELECT id, s FROM snapdvvec.t WHERE id > 3990")
    assert(df.as[(Long, String)].collect().toSet ==
      (3991L until 4000L).map(i => (i, s"r$i")).toSet)
    val phys = df.queryExecution.executedPlan.toString
    // the rewrite fired: no DSv2 row-based fallback anywhere in the plan
    assert(!phys.contains("BatchScan"),
      s"DV version must not plan the row-based DSv2 fallback:\n$phys")
    // columnar batches survive the DV (one deleted row must not
    // devectorize the version) and the predicate reaches parquet
    assert(phys.contains("Batched: true"), s"scan lost vectorization:\n$phys")
    assert(!phys.contains("Batched: false"), s"a scan fell off the vectorized reader:\n$phys")
    assert(phys.contains("GreaterThan(id,3990)"),
      s"filter not pushed into the parquet scan:\n$phys")
    // dead rows stay dead through the vectorized path — including under
    // a pushed point filter on the dirty file itself
    assert(spark.sql("SELECT * FROM snapdvvec.t WHERE id = 1").collect().isEmpty)
    assert(spark.sql("SELECT count(*) FROM snapdvvec.t").as[Long].head() == 3999L)
    // the row-based fallback stays available and agrees (escape hatch +
    // the path a session without GraftExtensions gets)
    spark.conf.set("spark.graft.dvRead.vectorized", "false")
    try {
      val fb = spark.sql("SELECT id FROM snapdvvec.t WHERE id <= 2")
      assert(fb.as[Long].collect().toSet == Set(0L, 2L))
      assert(fb.queryExecution.executedPlan.toString.contains("BatchScan"),
        "with the rewrite disabled the DSv2 fallback must serve the scan")
    } finally spark.conf.unset("spark.graft.dvRead.vectorized")
  }

  test("SQL UPDATE evaluates SET right-hand sides against the pre-update row") {
    val root = tmpDir("snapcat_updswap")
    SnapshotLog.write(Seq((1L, 10.0, 20.0), (2L, 3.0, 4.0)).toDF("id", "a", "b"),
      s"$root/t", "overwrite") // v0
    register("snapswap", root)
    spark.sql("UPDATE snapswap.t SET a = b, b = a WHERE id = 1")
    assert(spark.sql("SELECT a, b FROM snapswap.t WHERE id = 1")
      .as[(Double, Double)].head() == ((20.0, 10.0)))
    spark.sql("UPDATE snapswap.t SET a = a + b, b = 0 WHERE id = 2")
    assert(spark.sql("SELECT a, b FROM snapswap.t WHERE id = 2")
      .as[(Double, Double)].head() == ((7.0, 0.0)))
  }

  test("CREATE TABLE refuses TBLPROPERTIES loudly instead of dropping them") {
    val root = tmpDir("snapcat_props")
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), s"$root/seed", "overwrite")
    register("snapprops", root)
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE snapprops.p (id BIGINT, s STRING) TBLPROPERTIES ('k'='v')"))
    assert(e.getMessage.contains("TBLPROPERTIES"), e.getMessage)
    // a plain CREATE (only Spark's reserved keys in the map) still works
    spark.sql("CREATE TABLE snapprops.q (id BIGINT, s STRING)")
    assert(spark.sql("SELECT count(*) FROM snapprops.q").as[Long].head() == 0L)
  }

  test("catalog scans zone-map prune files on WHERE (physical numFiles)") {
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val root = tmpDir("snapcat_prune")
    SnapshotLog.write((0 until 4000).map(i => (i.toLong, i.toString)).toDF("id", "s"),
      s"$root/t", "overwrite", clusterColumn = Some("id"), nFiles = 8) // v0
    register("snappr", root)
    // physical file count across BOTH scan shapes: the DSv2 BatchScan
    // (clean versions) and the V1 scans the DV-vectorizing rewrite
    // plans (walks into AQE stages — the DV form joins, so AQE wraps)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      var n = 0L
      def walk(p: SparkPlan): Unit = {
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case b: BatchScanExec =>
            n += b.inputPartitions.collect { case fp: FilePartition => fp.files.length }.sum
          case f: FileSourceScanExec => n += f.metrics("numFiles").value
          case _ => ()
        }
        p.children.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
      assert(n > 0, "no scan found in the plan")
      n
    }
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

  test("UPDATE/MERGE fold uncorrelated scalar subqueries; correlated rewrites via MERGE") {
    val root = tmpDir("snapcat_subq")
    SnapshotLog.write((0 until 6).map(i => (i.toLong, i * 1.0)).toDF("id", "x"),
      s"$root/t", "overwrite") // v0
    Seq((100L, 7.5), (200L, 2.5)).toDF("rid", "rx")
      .createOrReplaceTempView("ref_vals")
    register("snapsq", root)
    // SET from a scalar subquery, WHERE from another
    spark.sql(
      """UPDATE snapsq.t SET x = (SELECT max(rx) FROM ref_vals)
        |WHERE id >= (SELECT count(*) FROM ref_vals) + 2""".stripMargin)
    val byId = spark.sql("SELECT id, x FROM snapsq.t")
      .as[(Long, Double)].collect().toMap
    assert(byId(4L) == 7.5 && byId(5L) == 7.5 && byId(3L) == 3.0, byId.toString)
    // MERGE arm values fold too
    Seq(0L, 1L).toDF("mid").createOrReplaceTempView("subq_src")
    spark.sql(
      """MERGE INTO snapsq.t AS t USING subq_src AS s ON t.id = s.mid
        |WHEN MATCHED THEN UPDATE SET x = (SELECT min(rx) FROM ref_vals)
        |""".stripMargin)
    val after = spark.sql("SELECT id, x FROM snapsq.t")
      .as[(Long, Double)].collect().toMap
    assert(after(0L) == 2.5 && after(1L) == 2.5 && after(2L) == 2.0)
    // >1-row scalar subquery: the standard cardinality error
    val multi = intercept[Exception](spark.sql(
      "UPDATE snapsq.t SET x = (SELECT rx FROM ref_vals) WHERE id = 0"))
    assert(multi.getMessage.contains("more than one row"), multi.getMessage)
    // correlated in an ASSIGNMENT rewrites through the MERGE join
    // machinery (SnapshotDml.runCorrelated): matched ids take the
    // per-key aggregate, unmatched ids take the empty-aggregate value
    Seq((4L, 40.0), (5L, 50.0), (5L, 49.0)).toDF("rid", "rx")
      .createOrReplaceTempView("corr_vals")
    spark.sql(
      "UPDATE snapsq.t SET x = (SELECT max(rx) FROM corr_vals WHERE rid = t.id) " +
        "WHERE id >= 4")
    def xOf(): Map[Long, Option[Double]] =
      spark.sql("SELECT id, x FROM snapsq.t").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val c1 = xOf()
    assert(c1(4L) == Some(40.0) && c1(5L) == Some(50.0) && c1(3L) == Some(3.0), c1.toString)
    // a row in range with NO source match: SQL gives the aggregate over
    // zero rows — NULL for max — via the not-matched-by-source arm
    spark.sql(
      "UPDATE snapsq.t SET x = (SELECT max(rx) FROM corr_vals WHERE rid = t.id) " +
        "WHERE id = 2")
    assert(xOf()(2L).isEmpty, xOf().toString)
    // one atomic merge_into commit per correlated UPDATE
    assert(SnapshotLog.history(spark, s"$root/t")
      .select("op").limit(1).as[String].head() == "merge_into")
    // correlated in WHERE stays refused, loudly
    val corrW = intercept[Exception](spark.sql(
      "UPDATE snapsq.t SET x = 0 " +
        "WHERE x = (SELECT max(rx) FROM corr_vals WHERE rid = t.id)"))
    assert(corrW.getMessage.contains("WHERE clause"), corrW.getMessage)
    // non-equality correlation stays refused
    val corrNe = intercept[Exception](spark.sql(
      "UPDATE snapsq.t SET x = (SELECT max(rx) FROM corr_vals WHERE rid > t.id)"))
    assert(corrNe.getMessage.contains("non-equality"), corrNe.getMessage)
  }

  test("SQL schema evolution: ALTER TABLE ADD COLUMN then INSERT, time travel keeps the old schema") {
    val root = tmpDir("snapcat_evolve")
    SnapshotLog.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      s"$root/t", "overwrite") // v0
    register("snapevo", root)
    spark.sql("ALTER TABLE snapevo.t ADD COLUMN note STRING") // v1: metadata-only
    assert(SnapshotLog.history(spark, s"$root/t").select("op").limit(1)
      .as[String].head() == "evolve_schema")
    // old rows null-fill; the INSERT now validates against the evolved head
    spark.sql("INSERT INTO snapevo.t VALUES (3, 'c', 'fresh')") // v2
    assert(spark.sql("SELECT id, s, note FROM snapevo.t")
      .as[(Long, String, Option[String])].collect().toSet ==
      Set((1L, "a", None), (2L, "b", None), (3L, "c", Some("fresh"))))
    // time travel below the evolution commit reads the OLD schema
    assert(spark.sql("SELECT * FROM snapevo.t VERSION AS OF 0").columns.toSeq ==
      Seq("id", "s"))
    // multi-column form + duplicate refusal
    spark.sql("ALTER TABLE snapevo.t ADD COLUMNS (x DOUBLE, y BIGINT)")
    assert(spark.sql("SELECT * FROM snapevo.t").columns.toSeq ==
      Seq("id", "s", "note", "x", "y"))
    val dup = intercept[Exception](
      spark.sql("ALTER TABLE snapevo.t ADD COLUMN id BIGINT"))
    assert(dup.getMessage.contains("already exists"), dup.getMessage)
    // positioned adds are refused loudly (name-resolved format)
    val pos = intercept[Exception](
      spark.sql("ALTER TABLE snapevo.t ADD COLUMN z BIGINT FIRST"))
    assert(pos.getMessage.contains("FIRST/AFTER"), pos.getMessage)
  }

  test("SnapshotFileIndex builds per-column intervals concurrently (no convoy)") {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal => CLit}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val root = tmpDir("snapcat_conc")
    SnapshotLog.write(
      (0 until 4000).map(i => (i.toLong, (i % 4).toLong, i.toString)).toDF("id", "g", "s"),
      s"$root/t", "overwrite", clusterColumn = Some("id"), nFiles = 8) // v0
    val snap = SnapshotLog.state(spark, s"$root/t")
    val dataRoot = SnapshotLog.dataRootOf(new Path(s"$root/t"))
    // fs-qualified like tableAt builds them — the interval map keys by
    // the index's listed URIs
    val fsys = dataRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val abs = snap.files.map(f => fsys.makeQualified(new Path(dataRoot, f)).toString)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("g", LongType), StructField("s", StringType)))
    val idx = new SnapshotFileIndex(spark, abs, schema)
    def eq(c: String, v: Long) = EqualTo(AttributeReference(c, LongType)(), CLit(v))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // 16 planners race the FIRST interval build of two different
      // columns on one shared index — per-column memoization must give
      // every one the same (correct) pruning, with no lost update and
      // no coarse-lock deadlock
      val res = Await.result(Future.sequence((0 until 16).map { i => Future {
        if (i % 2 == 0) idx.listFiles(Nil, Seq(eq("id", 42L))).map(_.files.length).sum
        else idx.listFiles(Nil, Seq(eq("g", 1L))).map(_.files.length).sum
      }}), 2.minutes)
      val (idScans, gScans) = (res.indices.filter(_ % 2 == 0).map(res),
        res.indices.filter(_ % 2 == 1).map(res))
      assert(idScans.forall(_ == 1), s"id=42 is clustered into one file: $idScans")
      assert(gScans.forall(_ == 8), s"g spans every file (no prune): $gScans")
    } finally pool.shutdown()
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

  test("column ALTERs beyond ADD refused; listTables sees only snapshot tables") {
    val root = tmpDir("snapcat_ro")
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), s"$root/t1", "overwrite")
    Seq((1L, "x")).toDF("id", "s").write.parquet(s"$root/plain") // no _log
    register("snapro", root)
    assert(spark.sql("SHOW TABLES IN snapro").select("tableName")
      .as[String].collect().toSet == Set("t1"))
    // ALTER beyond ADD COLUMN stays refused (renames/drops/type changes
    // would silently re-type files already committed)
    intercept[Exception](spark.sql("ALTER TABLE snapro.t1 DROP COLUMN s"))
    intercept[Exception](spark.sql("ALTER TABLE snapro.t1 RENAME COLUMN s TO z"))
    // missing table: the standard error, not a crash
    val e = intercept[Exception](spark.sql("SELECT * FROM snapro.nope").collect())
    assert(e.getMessage.toLowerCase.contains("table"))
  }

  test("DROP TABLE removes the table; RENAME TO relocates it with history intact") {
    val root = tmpDir("snapcat_lc")
    register("snaplc", root)
    spark.sql("CREATE TABLE snaplc.a (id BIGINT)")
    spark.sql("INSERT INTO snaplc.a VALUES (1), (2)")
    spark.sql("INSERT INTO snaplc.a VALUES (3)")
    // rename: pool-relative manifest paths mean the log replays
    // identically under the new root — data, history, time travel all
    // survive the move
    spark.sql("ALTER TABLE snaplc.a RENAME TO b")
    assert(spark.sql("SELECT count(*) FROM snaplc.b").as[Long].head() == 3L)
    assert(spark.sql("SELECT count(*) FROM snaplc.b VERSION AS OF 1").as[Long].head() == 2L)
    assert(SnapshotLog.history(spark, s"$root/b").count() == 3L) // create + 2 appends
    intercept[Exception](spark.sql("SELECT * FROM snaplc.a").collect())
    // rename onto an existing table refuses
    spark.sql("CREATE TABLE snaplc.c (id BIGINT)")
    val e = intercept[Exception](spark.sql("ALTER TABLE snaplc.b RENAME TO c"))
    assert(e.getMessage.contains("already exists"))
    // drop: the dir is gone, SHOW TABLES agrees, IF EXISTS is quiet
    spark.sql("DROP TABLE snaplc.b")
    assert(spark.sql("SHOW TABLES IN snaplc").select("tableName")
      .as[String].collect().toSet == Set("c"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/b")))
    spark.sql("DROP TABLE IF EXISTS snaplc.b") // no-op, no error
  }

  test("TBLPROPERTIES('CLUSTER_BY') is honored case-insensitively, never dropped") {
    val root = tmpDir("snapcat_cb")
    register("snapcb", root)
    // upper-case key: the lookup and the refuse-loudly exclusion use the
    // same case-insensitive rule — the table must come out CLUSTERED,
    // not silently unclustered
    spark.sql("CREATE TABLE snapcb.t (id BIGINT, s STRING) " +
      "TBLPROPERTIES('CLUSTER_BY'='id')")
    assert(SnapshotLog.clusterByOf(spark, s"$root/t") == Seq("id"))
    // a bad column under the upper-case key still refuses loudly
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE snapcb.bad (id BIGINT) TBLPROPERTIES('Cluster_By'='nope')"))
    assert(e.getMessage.contains("nope"))
    // unknown properties refuse regardless of the cluster_by spelling
    val e2 = intercept[Exception](spark.sql(
      "CREATE TABLE snapcb.bad2 (id BIGINT) " +
        "TBLPROPERTIES('CLUSTER_BY'='id', 'zstd'='9')"))
    assert(e2.getMessage.contains("zstd"))
  }
}
