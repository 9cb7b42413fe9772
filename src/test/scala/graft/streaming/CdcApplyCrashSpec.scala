package graft.streaming

import graft.SparkSpec
import graft.lake.{ClusteredWriter, Metastore, StatsStore, Vacuum}
import org.apache.spark.sql.DataFrame

/** Crash-point property test for the streaming CDC path — the sibling
  * of MergePropertySpec: every micro-batch is a Merge transaction pair,
  * and foreachBatch is at-least-once, so a kill at ANY point inside the
  * merge protocol must leave stats-routed readers consistent and must
  * converge to the oracle state once the batch replays.
  *
  * Injection seam: a StatsStore wrapper that throws either BEFORE
  * delegating `replaceFiles` (kill between the data write and the
  * stats swap — the new batch dir is an unregistered orphan) or AFTER
  * (kill between the stats swap and the old-file delete — the replaced
  * files are undeleted orphans). The streaming query dies mid-batch,
  * the checkpoint does not advance, and a restart replays the same
  * batch; `Metastore.load`'s built-in `recoverIfNeeded` covers the
  * stats dir's own swap. Crash plans enumerate both points plus
  * double-crash sequences (a replay that crashes again at the other
  * point); batch content is seeded-random.
  */
class CdcApplyCrashSpec extends SparkSpec {

  /** Consumes one planned crash per `replaceFiles` call. */
  private class FlakyStore(inner: StatsStore) extends StatsStore {
    val plan = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def load(): DataFrame = inner.load()
    def replaceFiles(removedFiles: Seq[String], newStats: DataFrame): Unit =
      Option(plan.poll()) match {
        case Some("before") =>
          throw new RuntimeException("injected-crash before stats swap")
        case Some("after") =>
          inner.replaceFiles(removedFiles, newStats)
          throw new RuntimeException("injected-crash after stats swap")
        case _ => inner.replaceFiles(removedFiles, newStats)
      }
  }

  test("kills between data-write and stats-swap replay to the oracle state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmpDir("cdc_crash")
    val dataPath = s"$root/lake"
    val statsPath = s"$root/stats"
    val checkpoint = s"$root/ckpt"
    val rng = new scala.util.Random(20260813L)

    var model: Map[Long, Seq[String]] =
      (1L to 60L).map(k => k -> Seq(s"v$k")).toMap
    ClusteredWriter.write(
      model.toSeq.flatMap { case (k, vs) => vs.map(v => (k, v)) }.toDF("k", "payload"),
      dataPath, "k", nFiles = 4)
    Metastore.update(spark, statsPath, Metastore.buildFromFooters(spark, dataPath, "k"))

    val flaky = new FlakyStore(StatsStore.parquet(spark, statsPath))
    val stream = MemoryStream[(String, Long, String)]

    /** One query lifetime over the shared checkpoint: replays whatever
      * batch a previous crashed attempt left uncommitted. */
    def attempt(): Option[Throwable] = {
      val q = CdcApply.startWith(stream.toDS().toDF("op", "k", "payload"),
        dataPath, flaky, checkpoint)
      try { q.processAllAvailable(); None }
      catch { case e: Throwable => Some(e) }
      finally q.stop()
    }

    /** The table as a stats-routed reader sees it (Lakeshack /
      * MetastoreFileIndex resolve files through the stats rows). */
    def statsRouted(): Map[Long, Seq[String]] = {
      val files = Metastore.load(spark, statsPath)
        .select("filepath").collect().map(_.getString(0)).toSeq
      if (files.isEmpty) Map.empty
      else spark.read.parquet(files: _*).collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("payload")))
        .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).sorted.toSeq }
    }

    // every crash-point transition, including a replay that crashes
    // again at the other point; batch content is randomized per step
    val plans = Seq(Nil, Seq("before"), Seq("after"),
      Seq("before", "after"), Seq("after", "before"), Nil)
    for ((plan, step) <- plans.zipWithIndex) {
      // batch: 2-5 upserted keys (some new, some existing; 1-2 rows
      // each), 0-3 deleted keys — occasionally overlapping an upserted
      // key, which must end deleted (deletes-last batch semantics)
      val upKeys = (0 until (2 + rng.nextInt(4)))
        .map(_ => rng.nextLong(90L) + 1L).distinct
      val upserts = upKeys.map { k =>
        k -> (0 until (1 + rng.nextInt(2))).map(j => s"s$step-k$k-$j")
      }
      val delKeys = ((0 until rng.nextInt(3)).map(_ => rng.nextLong(90L) + 1L) ++
        (if (rng.nextBoolean() && upKeys.nonEmpty) Seq(upKeys.head) else Nil)).distinct
      stream.addData(
        upserts.flatMap { case (k, vs) => vs.map(v => ("upsert", k, v)) } ++
          delKeys.map(k => ("delete", k, "")): _*)
      model = model ++ upserts.map { case (k, vs) => k -> vs } -- delKeys

      var crashes = 0
      plan.foreach(flaky.plan.add)
      var outcome = attempt()
      while (outcome.isDefined) {
        val msg = String.valueOf(outcome.get.getMessage) +
          String.valueOf(Option(outcome.get.getCause).map(_.getMessage).orNull)
        assert(msg.contains("injected-crash"), s"unexpected failure: ${outcome.get}")
        crashes += 1
        // stats must never reference a missing file at any crash point:
        // that is the stats-routed reader's consistency contract
        val fs = new org.apache.hadoop.fs.Path(dataPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        Metastore.load(spark, statsPath).select("filepath").collect().foreach(r =>
          assert(fs.exists(new org.apache.hadoop.fs.Path(r.getString(0))),
            s"stats row points at a dead file after crash $crashes of step $step"))
        outcome = attempt() // replay the uncommitted batch
      }
      assert(crashes === plan.size, s"expected ${plan.size} injected crashes, saw $crashes")
      assert(statsRouted() === model.map { case (k, vs) => k -> vs.sorted },
        s"stats-routed table diverged from the model after step $step ($plan)")
    }

    // crashed attempts left unregistered batch dirs / undeleted replaced
    // files: vacuum reclaims them, after which the RAW recursive listing
    // agrees with the model too
    Vacuum.vacuum(spark, dataPath, statsPath, graceMs = 0L)
    val raw = spark.read.option("recursiveFileLookup", "true").parquet(dataPath)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("payload")))
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).sorted.toSeq }
    assert(raw === model.map { case (k, vs) => k -> vs.sorted },
      "raw table must equal the model once orphans are vacuumed")
    assert(Vacuum.orphans(spark, dataPath, statsPath, graceMs = 0L).isEmpty)
  }
}
