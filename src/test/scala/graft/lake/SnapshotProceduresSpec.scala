package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `CALL snap.system.<proc>(…)` — the SQL maintenance surface. Every
  * procedure must (a) produce its documented result relation and (b)
  * leave the table in exactly the state the API call would: the
  * procedures are name bindings over the audited implementations, so
  * these tests pin the BINDING (arg coercion, defaults, named args,
  * result schema), not the op semantics their own specs already pin. */
class SnapshotProceduresSpec extends SparkSpec {
  import spark.implicits._

  private def register(cat: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
  }

  test("CALL compact rewrites the head clustered; data identical, history gains a compact op") {
    val root = tmpDir("proc_compact")
    val df = (0 until 100).map(i => ((i * 37) % 100).toLong -> s"r$i").toDF("id", "s")
    SnapshotLog.write(df.repartition(5), s"$root/t", "overwrite") // v0: unclustered
    register("prc", root)
    val out = spark.sql("CALL prc.system.compact(table => 't', cluster_by => 'id', n_files => 2)")
    assert(out.columns.toSeq == Seq("version"))
    assert(out.as[Long].head() == 1L)
    // data survived byte-for-byte (as a set), now in 2 files
    assert(spark.sql("SELECT count(*) FROM prc.t").as[Long].head() == 100L)
    assert(SnapshotLog.state(spark, s"$root/t").files.size == 2)
    val ops = spark.sql("CALL prc.system.history('t')")
    assert(ops.columns.toSeq == Seq(
      "version", "ts_millis", "op", "n_adds", "n_removes", "rollback_of"))
    assert(ops.select("version", "op").as[(Long, String)].collect().toSet ==
      Set((0L, "overwrite"), (1L, "compact")))
  }

  test("CALL zorder defaults buckets and accepts comma-separated columns") {
    val root = tmpDir("proc_z")
    val df = (0 until 200).map(i => (i.toLong, (i * 31 % 200).toLong, s"p$i"))
      .toDF("x", "y", "s")
    SnapshotLog.write(df, s"$root/t", "overwrite")
    register("prz", root)
    val v = spark.sql("CALL prz.system.zorder('t', 'x, y', 4)").as[Long].head()
    assert(v == 1L)
    assert(spark.sql("SELECT count(*) FROM prz.t").as[Long].head() == 200L)
    assert(SnapshotLog.state(spark, s"$root/t").files.size == 4)
  }

  test("CALL maintain + purge_deletes clear DV debt exactly like the API") {
    val root = tmpDir("proc_purge")
    SnapshotLog.write((0 until 40).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      s"$root/t", "overwrite", clusterColumn = Some("id"), nFiles = 8) // v0
    SnapshotLog.delete(spark, s"$root/t", col("id") === 7L) // v1: one DV
    register("prp", root)
    // below both bounds (1/8 dirty < 0.2): no-op, returns the head unchanged
    assert(spark.sql("CALL prp.system.maintain('t')").as[Long].head() == 1L)
    // zero dirty tolerance: triggers the purge commit
    assert(spark.sql(
      "CALL prp.system.maintain('t', max_dirty_fraction => 0.0D)").as[Long].head() == 2L)
    assert(SnapshotLog.state(spark, s"$root/t").dvs.isEmpty)
    assert(spark.sql("SELECT count(*) FROM prp.t").as[Long].head() == 39L)
    // purge on a clean table: no-op at the head
    assert(spark.sql("CALL prp.system.purge_deletes('t')").as[Long].head() == 2L)
  }

  test("CALL rollback, create_tag (default = head), expire respect the tag floor") {
    val root = tmpDir("proc_roll")
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), s"$root/t", "overwrite") // v0
    SnapshotLog.write(Seq((2L, "b")).toDF("id", "s"), s"$root/t", "append")    // v1
    SnapshotLog.write(Seq((9L, "bad")).toDF("id", "s"), s"$root/t", "overwrite") // v2
    register("prr", root)
    assert(spark.sql("CALL prr.system.rollback('t', 1)").as[Long].head() == 3L)
    assert(spark.sql("SELECT count(*) FROM prr.t").as[Long].head() == 2L)
    // tag the head (version default NULL = head), then expire keeps it
    assert(spark.sql("CALL prr.system.create_tag('t', 'good')").as[Long].head() == 3L)
    assert(Branches.tagVersions(spark, s"$root/t") == Map("good" -> 3L))
    val del = spark.sql("CALL prr.system.expire('t', 1)")
    assert(del.columns.toSeq == Seq("deleted"))
    assert(spark.sql("SELECT count(*) FROM prr.t").as[Long].head() == 2L)
    assert(spark.sql("CALL prr.system.drop_tag('t', 'good')").as[Boolean].head())
    assert(Branches.tagVersions(spark, s"$root/t").isEmpty)
  }

  test("CALL create_branch / publish_branch / drop_branch run the WAP loop in SQL") {
    val root = tmpDir("proc_wap")
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), s"$root/t", "overwrite") // v0
    register("prw", root)
    spark.sql("CALL prw.system.create_branch('t', 'audit')")
    spark.sql("INSERT INTO prw.t.`_branches`.audit VALUES (2, 'b')")
    // main is untouched until publish
    assert(spark.sql("SELECT count(*) FROM prw.t").as[Long].head() == 1L)
    val v = spark.sql("CALL prw.system.publish_branch('t', 'audit')").as[Long].head()
    assert(v == 1L)
    assert(spark.sql("SELECT * FROM prw.t").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    assert(spark.sql("CALL prw.system.drop_branch('t', 'audit')").as[Boolean].head())
    assert(Branches.list(spark, s"$root/t").isEmpty)
  }

  test("CALL expire_orphans reclaims an aborted token dir after grace") {
    val root = tmpDir("proc_orph")
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), s"$root/t", "overwrite")
    // plant an orphan: a token dir no manifest references
    val pool = SnapshotLog.poolDir(new org.apache.hadoop.fs.Path(s"$root/t"))
    val fs = pool.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(pool, "deadbeef0000/part-0.parquet")
    fs.mkdirs(orphan.getParent)
    fs.create(orphan).close()
    register("pro", root)
    assert(spark.sql("CALL pro.system.expire_orphans('t', grace_ms => 0)")
      .as[Int].head() >= 1)
    assert(!fs.exists(orphan))
    assert(spark.sql("SELECT count(*) FROM pro.t").as[Long].head() == 1L)
  }

  test("unknown procedure and bad namespace refuse with the available list") {
    val root = tmpDir("proc_bad")
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), s"$root/t", "overwrite")
    register("prb", root)
    val e = intercept[Exception](spark.sql("CALL prb.system.vacuum_all('t')").collect())
    // Spark wraps the catalog's refusal in FAILED_TO_LOAD_ROUTINE; the
    // available-procedures list must survive in the cause chain
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("\n")
    assert(msgs.contains("available:") || msgs.contains("vacuum_all"))
    val ids = spark.sessionState.catalogManager.catalog("prb")
      .asInstanceOf[SnapshotCatalog].listProcedures(Array("system"))
    assert(ids.map(_.name()).toSet.contains("compact"))
  }

  test("table_detail: one metadata row — files, bytes, DV debt, layout, sidecars") {
    val root = tmpDir("proc_detail")
    val table = s"$root/t"
    SnapshotLog.write((0 until 400).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      table, "overwrite", clusterColumn = Some("id"), nFiles = 4)
    SnapshotLog.setClusterBy(spark, table, Seq("id"))
    SnapshotLog.buildBloom(spark, table, "id", expectedItemsPerFile = 100)
    SnapshotLog.delete(spark, table, org.apache.spark.sql.functions.col("id") === 7L)
    register("prd", root)
    val r = spark.sql("CALL prd.system.table_detail('t')").collect().head
    assert(r.getLong(0) == 1L) // head = v1 (the DV delete)
    assert(r.getLong(1) == 4L) // live files
    assert(r.getLong(2) > 0L)  // bytes from the batched census
    assert(r.getLong(3) == 1L) // one dirty file
    assert(r.getLong(4) == 1L) // one DV parquet
    assert(r.getString(5) == "id")
    assert(r.getString(6) == "id")
    // AS-OF form: v0 has no DV debt
    val r0 = spark.sql("CALL prd.system.table_detail('t', version => 0)").collect().head
    assert(r0.getLong(0) == 0L && r0.getLong(3) == 0L && r0.getLong(4) == 0L)
  }
}
