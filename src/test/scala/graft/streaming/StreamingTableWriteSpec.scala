package graft.streaming

import graft.SparkSpec
import graft.lake.{SnapshotCatalog, SnapshotLog}
import org.apache.spark.sql.functions._

/** `df.writeStream.toTable("snap.t")` — the DSv2 STREAMING_WRITE half
  * of the catalog's streaming parity (readStream.table landed in round
  * 14 batch 1). Each micro-batch is ONE append commit claimed under
  * the deterministic token `stream-<queryId>-e<epoch>`, so a restarted
  * query's replay of a committed epoch commits nothing twice — the
  * same appendBatch contract the foreachBatch path has always had,
  * now reachable without leaving SQL-surface APIs. */
class StreamingTableWriteSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def register(cat: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
  }

  test("writeStream.toTable commits one append per micro-batch, readable mid-stream") {
    val root = tmpDir("stw")
    register("stw", root)
    spark.sql("CREATE TABLE stw.t (id BIGINT, s STRING)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDF().toDF("id", "s")
      .writeStream
      .option("checkpointLocation", tmpDir("stw_ckpt"))
      .toTable("stw.t")
    try {
      stream.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM stw.t").as[Long].head() == 2L)
      stream.addData((3L, "c"))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM stw.t").as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
    // every micro-batch landed as exactly one append commit with a
    // stream epoch token in the pool
    val hist = SnapshotLog.history(spark, s"$root/t")
      .select("version", "op").as[(Long, String)].collect().toMap
    assert(hist(0L) == "create")
    assert(hist.view.filterKeys(_ > 0L).values.forall(_ == "append"))
    assert(hist.size == 3) // create + 2 epochs
    val pool = new org.apache.hadoop.fs.Path(s"$root/t/data")
    val fs = pool.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tokens = fs.listStatus(pool).map(_.getPath.getName)
    assert(tokens.count(_.startsWith("stream-")) == 2, tokens.toSeq.toString)
    assert(!tokens.exists(_.startsWith("staging-")), "staging dir leaked")
  }

  test("a replayed epoch commits nothing twice (exactly-once under the epoch token)") {
    val root = tmpDir("stw_replay")
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), s"$root/t", "overwrite")
    val tableP = new org.apache.hadoop.fs.Path(s"$root/t")
    val fs = tableP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // stage epoch 7's files, commit, then simulate the restart replay:
    // a SECOND staging of the same epoch must be skipped and cleaned
    def stage(rows: Seq[(Long, String)]): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(s"$root/t/data/staging-${java.util.UUID.randomUUID().toString.take(8)}")
      rows.toDF("id", "s").write.parquet(p.toString)
      p
    }
    val first = SnapshotLog.commitStreamEpoch(spark, s"$root/t",
      stage(Seq((2L, "b"))), "stream-q1-e7", Seq((2L, "b")).toDF("id", "s").schema)
    assert(first == 1L)
    val replayStaging = stage(Seq((2L, "b")))
    val second = SnapshotLog.commitStreamEpoch(spark, s"$root/t",
      replayStaging, "stream-q1-e7", Seq((2L, "b")).toDF("id", "s").schema)
    assert(second == -1L)
    assert(!fs.exists(replayStaging), "replay staging must be cleaned up")
    assert(SnapshotLog.read(spark, s"$root/t").count() == 2L)
    // a TORN prior attempt (renamed dir exists but unreferenced) is replaced
    val torn = new org.apache.hadoop.fs.Path(s"$root/t/data/stream-q1-e8")
    Seq((99L, "stale")).toDF("id", "s").write.parquet(torn.toString)
    val third = SnapshotLog.commitStreamEpoch(spark, s"$root/t",
      stage(Seq((3L, "c"))), "stream-q1-e8", Seq((3L, "c")).toDF("id", "s").schema)
    assert(third == 2L)
    assert(SnapshotLog.read(spark, s"$root/t").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("a time-travel pin and complete mode refuse streaming writes") {
    val root = tmpDir("stw_refuse")
    register("stwr", root)
    spark.sql("CREATE TABLE stwr.t (id BIGINT)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Long]
    stream.addData(1L, 2L) // the write only materializes once a batch runs
    val e = intercept[Exception] {
      val q = stream.toDF().toDF("id")
        .groupBy().count().select(col("count").as("id"))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", tmpDir("stw_refuse_ckpt"))
        .toTable("stwr.t")
      try q.processAllAvailable() finally q.stop()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.toLowerCase.contains("append") || msgs.toLowerCase.contains("truncate") ||
      msgs.toLowerCase.contains("complete"))
  }
}
