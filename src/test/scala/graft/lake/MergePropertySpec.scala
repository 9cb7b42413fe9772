package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model-based property test: a seeded random sequence of upsert and
  * delete batches applied through `Merge` must leave the lake table
  * equal to a driver-side map model applying the same key-group
  * semantics — after EVERY step, and with stats that agree with disk
  * (no orphans, no stale rows, pruning still sound). This is the test
  * that catches protocol-ordering bugs no single-scenario spec does. */
class MergePropertySpec extends SparkSpec {

  test("random upsert/delete sequences match the key-group model at every step") {
    import spark.implicits._
    val root = tmpDir("merge_prop")
    val data = s"$root/lake"
    val stats = s"$root/stats"
    val rng = new scala.util.Random(20260812L)

    // seed: 200 keys, 1-3 rows per key group
    var model: Map[Long, Seq[String]] =
      (1L to 200L).map { k =>
        k -> (0 until (1 + rng.nextInt(3))).map(j => s"v$k-$j")
      }.toMap
    ClusteredWriter.write(
      model.toSeq.flatMap { case (k, vs) => vs.map(v => (k, v)) }.toDF("k", "payload"),
      data, "k", nFiles = 5)
    Metastore.update(spark, stats, Metastore.buildFromFooters(spark, data, "k"))

    def checkState(step: String): Unit = {
      val table = spark.read.option("recursiveFileLookup", "true").parquet(data)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val got = table.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).sorted.toSeq }
      val want = model.map { case (k, vs) => k -> vs.sorted }
      assert(got === want, s"table diverged from model after $step")
      // stats agree with disk: every registered file exists, and no
      // data file is unregistered (orphans only transiently, i.e. never
      // after a completed merge)
      val loaded = Metastore.load(spark, stats)
      assert(Vacuum.orphans(spark, data, loaded, graceMs = 0L).isEmpty,
        s"orphan files left after $step")
      val fs = new org.apache.hadoop.fs.Path(data)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      loaded.select("filepath").collect().map(_.getString(0)).foreach(p =>
        assert(fs.exists(new org.apache.hadoop.fs.Path(p)), s"stale stats row after $step"))
    }

    for (step <- 1 to 8) {
      if (rng.nextBoolean()) {
        // upsert: 1-10 keys, mixing existing and brand-new, 1-2 rows each
        val keys = (0 until (1 + rng.nextInt(10)))
          .map(_ => (rng.nextLong(300L) + 1L)).distinct
        val batch = keys.map { k =>
          k -> (0 until (1 + rng.nextInt(2))).map(j => s"s$step-k$k-$j")
        }
        Merge.upsert(spark, data, stats,
          batch.flatMap { case (k, vs) => vs.map(v => (k, v)) }.toDF("k", "payload"))
        model = model ++ batch.map { case (k, vs) => k -> vs }
      } else {
        // delete: 1-10 keys, some present, some absent
        val keys = (0 until (1 + rng.nextInt(10)))
          .map(_ => (rng.nextLong(300L) + 1L)).distinct
        Merge.delete(spark, data, stats, keys.toDF("k"))
        model = model -- keys
      }
      checkState(s"step $step")
    }
  }
}
