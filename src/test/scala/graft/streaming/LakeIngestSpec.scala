package graft.streaming

import graft.SparkSpec
import graft.lake.{Lakeshack, Metastore}
import org.apache.spark.sql.functions._

/** End-to-end streaming ingest: micro-batches land as clustered files,
  * stats upsert per batch, and lake queries see the data through the
  * metastore — the full reference lifecycle driven by a stream. */
class LakeIngestSpec extends SparkSpec {

  test("micro-batches land clustered, stats upsert, queries find the rows") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dataPath = tmpDir("ingest_data") + "/lake"
    val statsPath = tmpDir("ingest_stats") + "/stats"
    val checkpoint = tmpDir("ingest_ckpt")

    val stream = MemoryStream[(Long, String)]
    val q = LakeIngest.start(stream.toDS().toDF("k", "payload"),
      dataPath, statsPath, clusterColumn = "k",
      filesPerBatch = 2, checkpoint = checkpoint)
    try {
      stream.addData((1 to 100).map(i => (i.toLong, s"v$i")): _*)
      q.processAllAvailable()
      stream.addData((101 to 200).map(i => (i.toLong, s"v$i")): _*)
      q.processAllAvailable()
    } finally q.stop()

    val stats = Metastore.load(spark, statsPath)
    assert(stats.count() === 4, "2 batches x 2 clustered files each")
    // stats rows must be disjoint per batch (range clustering)
    val shack = new Lakeshack(spark, stats,
      Some(spark.read.option("recursiveFileLookup", "true").parquet(dataPath).schema))
    // a value from each batch is retrievable through pruning
    assert(shack.query(Seq(42L)).count() === 1)
    assert(shack.query(Seq(142L)).count() === 1)
    assert(shack.queryOne(142L).select("payload").first().getString(0) === "v142")
    // point query prunes to one file of the four
    assert(Metastore.prune(spark, stats, Seq(42L)).size === 1)
    // REAL replayed-batch retry: overwrite the batch dir (Spark embeds a
    // fresh job UUID, so every part file gets a NEW name) and re-land its
    // stats — replaceUnderPrefix must swap the old rows out, leaving no
    // stale filepath behind and no growth in the stats table
    import graft.lake.ClusteredWriter
    val batch0 = spark.read.parquet(s"$dataPath/batch_0")
    ClusteredWriter.write(batch0, s"$dataPath/batch_0", "k", nFiles = 2)
    Metastore.replaceUnderPrefix(spark, statsPath, s"$dataPath/batch_0",
      Metastore.buildFromFooters(spark, s"$dataPath/batch_0", "k"))
    val after = Metastore.load(spark, statsPath)
    assert(after.count() === 4, "retry must replace, not accumulate, the batch's stats rows")
    // every stats filepath still exists on disk (no stale pointers)
    val shack2 = new Lakeshack(spark, after, Some(batch0.schema))
    assert(shack2.query(Seq(42L)).count() === 1)
  }

  test("versioned ingest: one snapshot commit per micro-batch, replay-safe") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.lake.SnapshotLog
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val table = tmpDir("vingest") + "/t"
    val checkpoint = tmpDir("vingest_ckpt")

    val stream = MemoryStream[(Long, String)]
    val q = LakeIngest.startVersioned(stream.toDS().toDF("k", "payload"),
      table, checkpoint, clusterColumn = Some("k"), filesPerBatch = 2)
    try {
      stream.addData((1 to 100).map(i => (i.toLong, s"v$i")): _*)
      q.processAllAvailable()
      stream.addData((101 to 200).map(i => (i.toLong, s"v$i")): _*)
      q.processAllAvailable()
    } finally q.stop()

    // two micro-batches -> two versions, each a time-travel point
    assert(SnapshotLog.currentVersion(spark, table) == 1L)
    assert(SnapshotLog.read(spark, table, Some(0L)).count() == 100L)
    assert(SnapshotLog.read(spark, table).count() == 200L)

    // REPLAYED batch: re-running batch 1's append with its token is a
    // no-op — the table-format half of streaming exactly-once
    val batch1 = SnapshotLog.read(spark, table)
      .where(col("k") > 100L)
    assert(SnapshotLog.appendBatch(batch1, table, "batch-1") == -1L)
    assert(SnapshotLog.currentVersion(spark, table) == 1L)
    assert(SnapshotLog.read(spark, table).count() == 200L)

    // clustered per batch: a pinned-version point query prunes
    val pruned = SnapshotLog.readPruned(spark, table, "k", asOf = Some(0L))
      .where(col("k") === 42L)
    assert(pruned.count() == 1L)
  }
}
