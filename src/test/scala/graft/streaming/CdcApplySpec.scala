package graft.streaming

import graft.SparkSpec
import graft.lake.{ClusteredWriter, JdbcMetastore, Metastore, StatsStore}
import org.apache.spark.sql.functions._

/** Streaming CDC apply: change batches (upsert/delete ops) land on a
  * clustered lake through Merge, one transaction pair per micro-batch,
  * with mixed batches resolving deletes-last. */
class CdcApplySpec extends SparkSpec {

  test("change stream applies upserts and deletes across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmpDir("cdc")
    val dataPath = s"$root/lake"
    val statsPath = s"$root/stats"
    val checkpoint = s"$root/ckpt"

    // seed table: keys 1..100, payload "v<k>"
    ClusteredWriter.write(
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "payload"),
      dataPath, "k", nFiles = 4)
    Metastore.update(spark, statsPath,
      Metastore.buildFromFooters(spark, dataPath, "k"))

    val stream = MemoryStream[(String, Long, String)]
    val q = CdcApply.start(stream.toDS().toDF("op", "k", "payload"),
      dataPath, statsPath, checkpoint = checkpoint)
    try {
      // batch 1: update two keys, insert one, delete one
      stream.addData(("upsert", 5L, "v5-new"), ("upsert", 200L, "v200"),
        ("upsert", 7L, "v7-new"), ("delete", 9L, ""))
      q.processAllAvailable()
      // batch 2: a key both upserted and deleted in one batch ends deleted
      stream.addData(("upsert", 11L, "v11-new"), ("delete", 11L, ""),
        ("delete", 200L, ""))
      q.processAllAvailable()
    } finally q.stop()

    val table = spark.read.option("recursiveFileLookup", "true").parquet(dataPath)
    val byKey = table.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byKey.size === table.count(), "no duplicate keys after CDC apply")
    assert(byKey(5L) === "v5-new" && byKey(7L) === "v7-new")
    assert(!byKey.contains(9L) && !byKey.contains(11L) && !byKey.contains(200L))
    assert(byKey(4L) === "v4" && byKey(100L) === "v100", "untouched keys intact")
    assert(byKey.size === 98, "100 seeded minus deleted 9 and 11; 200 inserted then deleted")

    // stats stayed consistent: a lake query through the refreshed stats
    // finds the updated row and prunes
    val shack = graft.lake.Lakeshack.fromStats(spark, dataPath, statsPath, "k")
    assert(shack.queryOne(5L).select("payload").first().getString(0) === "v5-new")
    assert(shack.query(Seq(9L)).count() === 0)
  }

  test("store-generic streaming CDC runs against a DB-backed metastore") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmpDir("cdc_jdbc")
    val dataPath = s"$root/lake"
    val checkpoint = s"$root/ckpt"
    val url = s"jdbc:derby:$root/db;create=true"
    ClusteredWriter.write(
      (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "payload"),
      dataPath, "k", nFiles = 2)
    JdbcMetastore.update(spark, url, "cdc_stats",
      Metastore.buildFromFooters(spark, dataPath, "k"))

    val stream = MemoryStream[(String, Long, String)]
    val q = CdcApply.startWith(stream.toDS().toDF("op", "k", "payload"),
      dataPath, StatsStore.jdbc(spark, url, "cdc_stats"), checkpoint)
    try {
      stream.addData(("upsert", 5L, "v5-new"), ("delete", 9L, ""), ("upsert", 60L, "v60"))
      q.processAllAvailable()
    } finally q.stop()

    val byKey = spark.read.option("recursiveFileLookup", "true").parquet(dataPath)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byKey(5L) === "v5-new" && byKey(60L) === "v60" && !byKey.contains(9L))
    // the DB-held stats agree with disk: every row's file exists
    val fs = new org.apache.hadoop.fs.Path(dataPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    JdbcMetastore.load(spark, url, "cdc_stats")
      .select("filepath").collect().map(_.getString(0)).foreach(p =>
        assert(fs.exists(new org.apache.hadoop.fs.Path(p)), s"stale stats row $p"))
  }

  test("versioned CDC apply: merge+DV deletes per batch, auto-maintain purges the debt") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.lake.SnapshotLog
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmpDir("cdcv")
    val table = s"$root/t"
    SnapshotLog.write((1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "payload"),
      table, "overwrite", clusterColumn = Some("k"), nFiles = 4) // v0

    val stream = MemoryStream[(String, Long, String)]
    // maintainEvery=2 with a zero dirty-fraction bound: the policy check
    // on every 2nd batch MUST purge any vector debt standing then
    val q = CdcApply.startVersioned(stream.toDS().toDF("op", "k", "payload"),
      table, s"$root/ckpt", keyCol = "k",
      maintainEvery = 2, maxDirtyFraction = 0.0)
    try {
      stream.addData(("upsert", 5L, "v5-new"), ("delete", 9L, ""),
        ("upsert", 200L, "v200")) // batch 0: merge + DV delete
      q.processAllAvailable()
      // after batch 0 (no maintain tick yet) the delete is merge-on-read
      assert(SnapshotLog.state(spark, table).dvs.nonEmpty,
        "batch-0 delete should stand as a deletion vector")
      stream.addData(("delete", 11L, ""), ("upsert", 7L, "v7-new")) // batch 1
      q.processAllAvailable() // separate ticks: MemoryStream coalesces otherwise
      // batch 2 (maintain tick): the upsert targets a key range FAR from
      // the standing DV (key 11's file) so the tick finds real vector
      // debt — a nearby upsert would have rewritten the dirty file and
      // cleared it as a merge side effect
      stream.addData(("upsert", 80L, "v80-new"))
      q.processAllAvailable()
    } finally q.stop()

    // the maintain tick at batch 2 folded every vector (purge commit)
    assert(SnapshotLog.state(spark, table).dvs.isEmpty,
      "auto-maintain should have purged the DV debt")
    assert(SnapshotLog.history(spark, table).select("op").as[String]
      .collect().contains("purge"), "history should carry the auto-purge")
    val byKey = SnapshotLog.read(spark, table)
      .as[(Long, String)].collect().toMap
    assert(byKey(5L) == "v5-new" && byKey(7L) == "v7-new" && byKey(200L) == "v200")
    assert(byKey(80L) == "v80-new")
    assert(!byKey.contains(9L) && !byKey.contains(11L))
    assert(byKey(4L) == "v4" && byKey.size == 99,
      "100 seeded − deleted 9,11 + inserted 200")
  }
}
