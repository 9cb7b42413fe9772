package graft.streaming

import graft.SparkSpec
import graft.lake.{Expectations, SnapshotLog}
import graft.lake.Expectations.{Expect, Expectation}
import org.apache.spark.sql.functions._

class GatedIngestSpec extends SparkSpec {

  test("streaming expectations gate: clean and quarantined halves, per-batch versions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = tmpDir("gated")
    val (table, quar) = (s"$base/t", s"$base/q")
    val stream = MemoryStream[(Long, Double)]
    val q = LakeIngest.startGated(
      stream.toDF().toDF("k", "price"), table, quar,
      Seq(Expectation("positive_price", col("price") > 0, Expect.Drop)),
      s"$base/ckpt", clusterColumn = Some("k"))
    try {
      stream.addData((1L, 10.0), (2L, -3.0), (3L, 5.0))
      q.processAllAvailable()
      stream.addData((4L, -1.0), (5L, 2.0))
      q.processAllAvailable()
    } finally q.stop()
    val main = SnapshotLog.read(spark, table).orderBy("k").collect()
    assert(main.map(_.getLong(0)).toSeq === Seq(1L, 3L, 5L))
    val qd = SnapshotLog.read(spark, quar).orderBy("k").collect()
    assert(qd.map(_.getLong(0)).toSeq === Seq(2L, 4L))
    assert(qd.forall(_.getAs[Seq[String]]("_violations") === Seq("positive_price")))
    // one main commit per non-empty half per batch: versions 0 and 1
    assert(SnapshotLog.currentVersion(spark, table) === 1L)
    assert(SnapshotLog.currentVersion(spark, quar) === 1L)
  }

  test("a replayed micro-batch commits nothing twice through the gate") {
    import spark.implicits._
    val base = tmpDir("gated_replay")
    val (table, quar) = (s"$base/t", s"$base/q")
    val batch = Seq((1L, 1.0), (2L, -2.0)).toDF("k", "price")
    val rules = Seq(Expectation("positive_price", col("price") > 0, Expect.Drop))
    // simulate foreachBatch replay after a crash: same token re-runs
    Expectations.ingest(spark, batch, table, quar, rules, "batch-0")
    val r2 = Expectations.ingest(spark, batch, table, quar, rules, "batch-0")
    assert(r2.mainVersion === -1L && r2.quarantineVersion === -1L)
    assert(SnapshotLog.read(spark, table).count() === 1)
    assert(SnapshotLog.read(spark, quar).count() === 1)
  }
}
