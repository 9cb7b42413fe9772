package graft.lake

import graft.{Fixtures, SparkSpec}
import graft.Fixtures.NaiveTs
import org.apache.spark.sql.functions._

/** Copy-on-write merge: upsert/delete correctness, file-level surgical
  * rewrite (untouched files must survive byte-identical), and crash/
  * orphan behavior of the swap protocol. */
class MergeSpec extends SparkSpec {

  private def freshLake(prefix: String): (String, String) = {
    val d = tmpDir(prefix)
    val data = s"$d/t"
    val stats = s"$d/stats"
    Fixtures.generate(spark, data, NaiveTs, nFiles = 4)
    Metastore.update(spark, stats, Metastore.build(spark, data, "id", Seq("timestamp")))
    (data, stats)
  }

  /** Materialized local copy: a `.cache()` of the pre-merge read would
    * poison the post-merge read too (Spark's cache manager substitutes
    * the cached relation for any plan-equal later read of the same
    * path), and a lazy frame over the old files breaks once the merge
    * deletes them. A LocalRelation is immune to both. */
  private def snapshot(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(df.collect(): _*)), df.schema)

  test("upsert replaces matched key groups and inserts new keys") {
    val (data, stats) = freshLake("merge_upsert")
    val before = snapshot(spark.read.option("recursiveFileLookup", "true").parquet(data))
    val schema = before.schema
    // pick 3 existing keys; replace each key's rows with ONE row of x=999
    val keys = before.select("id").distinct().orderBy("id").limit(3)
      .collect().map(_.getString(0)).toSeq
    val template = before.where(col("id") === keys.head).limit(1)
    val updates = keys.map(k =>
        template.withColumn("id", lit(k)).withColumn("x", lit(999)))
      .reduce(_ unionByName _)
    val insert = template.withColumn("id", lit("zz_brand_new")).withColumn("x", lit(7))
    val source = snapshot(updates.unionByName(insert))
    assert(source.count() === 4)

    Merge.upsert(spark, data, stats, source)

    val after = spark.read.option("recursiveFileLookup", "true").parquet(data)
    // each touched key now has exactly its source rows
    for (k <- keys) {
      val got = after.where(col("id") === k).collect()
      assert(got.length === 1 && got.head.getAs[Int]("x") === 999, s"key $k not replaced")
    }
    assert(after.where(col("id") === "zz_brand_new").count() === 1)
    // untouched keys unchanged (full equality modulo the touched keys)
    val touched = keys :+ "zz_brand_new"
    val expectOld = before.where(!col("id").isin(touched: _*))
    val gotOld = after.where(!col("id").isin(touched: _*))
    assert(gotOld.exceptAll(expectOld).count() === 0 && expectOld.exceptAll(gotOld).count() === 0)
    // the refreshed stats still answer queries (round-trip through Lakeshack)
    val shack = Lakeshack.fromStats(spark, data, stats, "id", Seq("timestamp"))
    assert(shack.query(Seq(keys.head)).count() === 1)
  }

  test("merge rewrites only the pruned files; others stay registered untouched") {
    val (data, stats) = freshLake("merge_surgical")
    val statsBefore = Metastore.load(spark, stats)
      .select("filepath", "id_min", "id_max").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // probe with the max-min file's lower bound: a key contained in few
    // ranges (the fixture's clustered layout keeps ranges near-disjoint)
    val lo = statsBefore.map(_._2).max
    val affected = statsBefore.filter { case (_, mn, mx) => mn <= lo && lo <= mx }.map(_._1).toSet
    val untouched = statsBefore.map(_._1).filterNot(affected.contains)
    assert(affected.nonEmpty && untouched.nonEmpty, "fixture must split affected/untouched")
    val before = spark.read.option("recursiveFileLookup", "true").parquet(data)
    val source = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(
          before.where(col("id") === lo).limit(1)
            .withColumn("x", lit(123456)).collect(): _*)), before.schema)
    Merge.upsert(spark, data, stats, source)
    val statsAfter = Metastore.load(spark, stats).select("filepath")
      .collect().map(_.getString(0)).toSet
    for (f <- untouched) {
      assert(statsAfter.contains(f), s"untouched $f dropped from stats")
      val hp = new org.apache.hadoop.fs.Path(f)
      assert(hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp),
        s"untouched $f deleted from disk")
    }
    for (f <- affected) {
      assert(!statsAfter.contains(f), s"affected $f must leave the stats")
      val hp = new org.apache.hadoop.fs.Path(f)
      assert(!hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp),
        s"affected $f must be deleted after the swap")
    }
    assert(statsAfter.exists(_.contains("/merge-")), "rewritten batch must be registered")
  }

  test("delete removes exactly the requested keys") {
    val (data, stats) = freshLake("merge_delete")
    val before = snapshot(spark.read.option("recursiveFileLookup", "true").parquet(data))
    val keys = before.select("id").distinct().orderBy(col("id").desc).limit(5)
      .collect().map(_.getString(0)).toSeq
    val keyDf = before.select("id").where(col("id").isin(keys: _*)).distinct()
    val expect = before.where(!col("id").isin(keys: _*))
    Merge.delete(spark, data, stats, keyDf)
    val after = spark.read.option("recursiveFileLookup", "true").parquet(data)
    assert(after.where(col("id").isin(keys: _*)).count() === 0)
    assert(after.exceptAll(expect).count() === 0 && expect.exceptAll(after).count() === 0)
    // a completed merge leaves no dark bytes: every on-disk file is
    // registered (old affected files were deleted in step 4)
    assert(Vacuum.orphans(spark, data, Metastore.load(spark, stats), graceMs = 0L).isEmpty)
  }

  test("delete of keys absent from the table is a no-op") {
    val (data, stats) = freshLake("merge_noop")
    val before = spark.read.option("recursiveFileLookup", "true").parquet(data)
    val n = before.count()
    import spark.implicits._
    Merge.delete(spark, data, stats, Seq("zz_not_there_1", "zz_not_there_2").toDF("id"))
    assert(spark.read.option("recursiveFileLookup", "true").parquet(data).count() === n)
  }

  test("upsert into an empty key range is a pure insert as a new batch") {
    val (data, stats) = freshLake("merge_insert")
    val before = spark.read.option("recursiveFileLookup", "true").parquet(data)
    val n = before.count()
    val schema = before.schema
    val row = before.limit(1).withColumn("id", lit("zzz_outside_all_ranges"))
    val source = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(row.collect(): _*)), schema)
    Merge.upsert(spark, data, stats, source)
    val after = spark.read.option("recursiveFileLookup", "true").parquet(data)
    assert(after.count() === n + 1)
    assert(after.where(col("id") === "zzz_outside_all_ranges").count() === 1)
  }
}
