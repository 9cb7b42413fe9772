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
