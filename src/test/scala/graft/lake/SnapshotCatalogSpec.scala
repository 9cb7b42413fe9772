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

  test("a DV-carrying version is refused with a pointer to the API read") {
    val root = tmpDir("snapcat_dv")
    SnapshotLog.write((0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      s"$root/t", "overwrite", clusterColumn = Some("id"), nFiles = 2) // v0
    SnapshotLog.delete(spark, s"$root/t", col("id") === 3L) // v1: DVs
    register("snapdv", root)
    val e = intercept[Exception](spark.sql("SELECT * FROM snapdv.t").collect())
    assert(e.getMessage.contains("deletion vectors"))
    // v0 (pre-delete) still reads via SQL; purge clears the head for SQL
    assert(spark.sql("SELECT count(*) FROM snapdv.t VERSION AS OF 0").as[Long].head() == 10L)
    SnapshotLog.purgeDeletes(spark, s"$root/t") // v2
    assert(spark.sql("SELECT count(*) FROM snapdv.t").as[Long].head() == 9L)
  }

  test("catalog is read-only; listTables sees only snapshot tables") {
    val root = tmpDir("snapcat_ro")
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), s"$root/t1", "overwrite")
    Seq((1L, "x")).toDF("id", "s").write.parquet(s"$root/plain") // no _log
    register("snapro", root)
    assert(spark.sql("SHOW TABLES IN snapro").select("tableName")
      .as[String].collect().toSet == Set("t1"))
    intercept[Exception](
      spark.sql("CREATE TABLE snapro.t2 (id BIGINT) USING parquet"))
    intercept[Exception](spark.sql("DROP TABLE snapro.t1"))
    // missing table: the standard error, not a crash
    val e = intercept[Exception](spark.sql("SELECT * FROM snapro.nope").collect())
    assert(e.getMessage.toLowerCase.contains("table"))
  }
}
