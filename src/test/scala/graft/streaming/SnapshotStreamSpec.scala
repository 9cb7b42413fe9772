package graft.streaming

import graft.SparkSpec
import graft.lake.SnapshotLog
import org.apache.spark.sql.functions._

/** `spark.readStream.table(...)` on a snapshot-catalog table — the
  * SQL-surface streaming read (zero-copy: each micro-batch reads the
  * new versions' added files straight from the pool). */
class SnapshotStreamSpec extends SparkSpec {
  import spark.implicits._

  private def register(cat: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.lake.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
  }

  test("readStream.table follows SQL INSERTs commit by commit, exactly once") {
    val root = tmpDir("snapstream")
    SnapshotLog.write(Seq((1L, "seed")).toDF("id", "s"), s"$root/t", "overwrite") // v0
    register("snapstr", root)
    val q = spark.readStream.table("snapstr.t")
      .writeStream.format("memory").queryName("snapstr_sink")
      .option("checkpointLocation", tmpDir("snapstream_cp"))
      .start()
    try {
      // nothing yet: the stream starts at the head (v0 is history)
      q.processAllAvailable()
      assert(spark.table("snapstr_sink").count() == 0L)
      // an SQL INSERT lands as the next micro-batch
      spark.sql("INSERT INTO snapstr.t VALUES (2, 'a'), (3, 'b')") // v1
      q.processAllAvailable()
      assert(spark.table("snapstr_sink").as[(Long, String)].collect().toSet ==
        Set((2L, "a"), (3L, "b")))
      // an API append streams identically (manifest-shape classification,
      // not op-string whitelisting)
      SnapshotLog.write(Seq((4L, "c")).toDF("id", "s"), s"$root/t", "append",
        opLabel = Some("labeled_ingest")) // v2
      q.processAllAvailable()
      assert(spark.table("snapstr_sink").count() == 3L)
      // replay safety: nothing ships twice
      q.processAllAvailable()
      assert(spark.table("snapstr_sink").count() == 3L)
    } finally q.stop()
  }

  test("change commits refuse by default; skipChangeCommits skips them whole") {
    val root = tmpDir("snapstream_chg")
    SnapshotLog.write((0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      s"$root/t", "overwrite") // v0
    register("snapstrc", root)
    // default: a DELETE mid-stream fails the query with a clear error
    val q1 = spark.readStream.table("snapstrc.t")
      .writeStream.format("memory").queryName("snapstrc_sink1")
      .option("checkpointLocation", tmpDir("snapstream_chg_cp1"))
      .start()
    try {
      q1.processAllAvailable() // pin the initial offset at the current head
      spark.sql("DELETE FROM snapstrc.t WHERE id = 3") // v1: DV commit
      val err = intercept[Exception](q1.processAllAvailable())
      assert(err.getMessage.contains("skipChangeCommits") ||
        Option(err.getCause).exists(_.getMessage.contains("skipChangeCommits")),
        s"wanted the skipChangeCommits pointer, got: ${err.getMessage}")
    } finally q1.stop()
    // with the option: the change commit skips, later inserts still flow
    val q2 = spark.readStream.option("skipChangeCommits", "true")
      .table("snapstrc.t")
      .writeStream.format("memory").queryName("snapstrc_sink2")
      .option("checkpointLocation", tmpDir("snapstream_chg_cp2"))
      .start()
    try {
      q2.processAllAvailable() // pin the initial offset at the current head
      spark.sql("INSERT INTO snapstrc.t VALUES (100, 'x')") // v2
      q2.processAllAvailable()
      assert(spark.table("snapstrc_sink2").as[(Long, String)].collect().toSet ==
        Set((100L, "x")))
    } finally q2.stop()
  }

  test("startingVersion replays history; time-travel pins refuse streaming") {
    val root = tmpDir("snapstream_sv")
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), s"$root/t", "overwrite") // v0
    SnapshotLog.write(Seq((2L, "b")).toDF("id", "s"), s"$root/t", "append") // v1
    register("snapstrv", root)
    val q = spark.readStream.option("startingVersion", "0")
      .table("snapstrv.t")
      .writeStream.format("memory").queryName("snapstrv_sink")
      .option("checkpointLocation", tmpDir("snapstream_sv_cp"))
      .start()
    try {
      q.processAllAvailable()
      // v0 (a pure create: adds, no removes) + v1 both replay
      assert(spark.table("snapstrv_sink").as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b")))
    } finally q.stop()
  }

  test("TRUNCATE across a running stream refuses; skip-mode ships only the new generation") {
    val root = tmpDir("snapstream_tr")
    SnapshotLog.write((0 until 5).map(i => (i.toLong, "old")).toDF("id", "s"),
      s"$root/t", "overwrite") // v0
    register("snapstrt", root)
    // default mode: a TRUNCATE mid-stream is a change commit (removes
    // every live file) — the stream must FAIL loudly, never silently
    // continue into the new table generation
    val q1 = spark.readStream.table("snapstrt.t")
      .writeStream.format("memory").queryName("snapstrt_sink1")
      .option("checkpointLocation", tmpDir("snapstream_tr_cp1"))
      .start()
    try {
      q1.processAllAvailable()
      spark.sql("TRUNCATE TABLE snapstrt.t") // v1: overwrite-to-empty
      spark.sql("INSERT INTO snapstrt.t VALUES (100, 'new')") // v2
      val err = intercept[Exception](q1.processAllAvailable())
      assert(err.getMessage.contains("skipChangeCommits") ||
        Option(err.getCause).exists(_.getMessage.contains("skipChangeCommits")),
        s"wanted the skipChangeCommits pointer, got: ${err.getMessage}")
    } finally q1.stop()
    // skip mode: the truncate version skips WHOLE; the repopulating
    // append ships; the dead generation's rows never re-ship
    val q2 = spark.readStream.option("skipChangeCommits", "true")
      .option("startingVersion", "0").table("snapstrt.t")
      .writeStream.format("memory").queryName("snapstrt_sink2")
      .option("checkpointLocation", tmpDir("snapstream_tr_cp2"))
      .start()
    try {
      q2.processAllAvailable()
      val got = spark.table("snapstrt_sink2").as[(Long, String)].collect().toSet
      // replay from v0: the old generation (v0 adds) + the new insert,
      // with the truncate itself contributing NOTHING
      assert(got == (0 until 5).map(i => (i.toLong, "old")).toSet + ((100L, "new")),
        got.toString)
    } finally q2.stop()
    // a stream STARTED between the truncate and a later append (default
    // offset = the current head) ships exactly the commits after its
    // start — never a silent slice of the dead generation
    val q3 = spark.readStream.table("snapstrt.t")
      .writeStream.format("memory").queryName("snapstrt_sink3")
      .option("checkpointLocation", tmpDir("snapstream_tr_cp3"))
      .start()
    try {
      q3.processAllAvailable()
      assert(spark.table("snapstrt_sink3").count() == 0L) // head is history
      spark.sql("INSERT INTO snapstrt.t VALUES (200, 'newer')") // v3
      q3.processAllAvailable()
      assert(spark.table("snapstrt_sink3").as[(Long, String)].collect().toSet ==
        Set((200L, "newer")))
    } finally q3.stop()
  }
}
