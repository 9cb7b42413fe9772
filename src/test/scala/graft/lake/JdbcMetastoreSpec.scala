package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** store_url parity against embedded Derby (on Spark's classpath):
  * build stats from parquet files, keep them in a database, and run the
  * same pruning/validation paths the parquet-backed store uses. */
class JdbcMetastoreSpec extends SparkSpec {

  private lazy val url = s"jdbc:derby:${tmpDir("jdbc_ms")}/db;create=true"

  test("update is idempotent and pruning works from a DB-backed stats table") {
    import spark.implicits._
    val d = tmpDir("jdbc_data") + "/t"
    // range-clustered so per-file [min,max] are disjoint and a point
    // value prunes to exactly one file
    (1L to 1000L).toDF("id").repartitionByRange(10, col("id")).write.parquet(d)
    val stats = Metastore.buildFromFooters(spark, d, "id")

    JdbcMetastore.update(spark, url, "lake_stats", stats)
    JdbcMetastore.update(spark, url, "lake_stats", stats) // replay must no-op
    val loaded = JdbcMetastore.load(spark, url, "lake_stats")
    assert(loaded.count() === 10, "one row per file, replay added nothing")

    // the same validate + prune paths as the parquet store
    Metastore.validate(loaded.schema, spark.read.parquet(d).schema, "id")
    val hits = Metastore.prune(spark, loaded, Seq(42L))
    assert(hits.size === 1, s"point value should prune to 1 of 10 files, got ${hits.size}")
    assert(spark.read.parquet(hits: _*).where(col("id") === 42L).count() === 1)
  }

  test("replaceUnderPrefix swaps a rewritten batch's rows inside the DB") {
    import spark.implicits._
    val root = tmpDir("jdbc_replace")
    val batch = s"$root/batch1"
    (1L to 100L).toDF("id").coalesce(1).write.parquet(batch)
    JdbcMetastore.update(spark, url, "replace_stats",
      Metastore.buildFromFooters(spark, batch, "id"))
    // rewrite the batch in place (new part-file names) and replace
    (201L to 300L).toDF("id").coalesce(1).write.mode("overwrite").parquet(batch)
    JdbcMetastore.replaceUnderPrefix(spark, url, "replace_stats", batch,
      Metastore.buildFromFooters(spark, batch, "id"))
    val rows = JdbcMetastore.load(spark, url, "replace_stats").collect()
    assert(rows.length === 1, "old batch rows must be gone")
    assert(rows.head.getLong(rows.head.fieldIndex("id_min")) === 201L)
  }

  test("replaceFiles is transactional and Merge runs against the DB store") {
    import spark.implicits._
    val root = tmpDir("jdbc_merge")
    val data = s"$root/lake"
    ClusteredWriter.write(
      (1L to 400L).map(i => (i, s"v$i")).toDF("k", "payload"), data, "k", nFiles = 4)
    JdbcMetastore.update(spark, url, "merge_stats",
      Metastore.buildFromFooters(spark, data, "k"))
    val store = StatsStore.jdbc(spark, url, "merge_stats")

    // key-group upsert + delete through the SAME Merge core, DB-backed
    Merge.upsertWith(spark, data, store,
      Seq((42L, "v42-new"), (999L, "v999")).toDF("k", "payload"))
    Merge.deleteWith(spark, data, store, Seq(77L).toDF("k"))

    val table = spark.read.option("recursiveFileLookup", "true").parquet(data)
    val byKey = table.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byKey(42L) === "v42-new" && byKey(999L) === "v999" && !byKey.contains(77L))
    assert(byKey.size === 400) // 400 seeded - 77 deleted + 999 inserted
    // DB stats agree with disk: every registered file exists, pruning works
    val loaded = JdbcMetastore.load(spark, url, "merge_stats")
    val registered = loaded.select("filepath").collect().map(_.getString(0))
    registered.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      assert(hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp))
    }
    val shack = new Lakeshack(spark, loaded, Some(table.schema))
    assert(shack.queryOne(42L).select("payload").first().getString(0) === "v42-new")
    assert(shack.query(Seq(77L)).count() === 0)
    // a failing replace must roll the delete back (atomicity): a
    // schema-mismatched newStats aborts before any statement commits
    val before = JdbcMetastore.load(spark, url, "merge_stats").count()
    intercept[IllegalArgumentException] {
      JdbcMetastore.replaceFiles(spark, url, "merge_stats",
        registered.toSeq, Seq((1L, 2L)).toDF("a", "b"))
    }
    assert(JdbcMetastore.load(spark, url, "merge_stats").count() === before,
      "failed replace must leave the table untouched")
  }

  test("timestamp stats round-trip type-identically (validate sees no drift)") {
    import spark.implicits._
    val d = tmpDir("jdbc_ts") + "/t"
    (1L to 50L).map(i => (i, java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(i)))
      .toDF("id", "ts").coalesce(1).write.parquet(d)
    val stats = Metastore.buildFromFooters(spark, d, "id", Seq("ts"))
    JdbcMetastore.update(spark, url, "ts_stats", stats)
    val loaded = JdbcMetastore.load(spark, url, "ts_stats")
    Metastore.validate(loaded.schema, spark.read.parquet(d).schema, "id", Seq("ts"))
    assert(loaded.first().getAs[Any]("ts_min") !== null)
  }
}
