package graft.lake

import graft.{Fixtures, SparkSpec}
import graft.Fixtures.NaiveTs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Transparent pruning: plain `spark.sql` / DataFrame queries over the
  * MetastoreFileIndex-backed table must (a) return exactly the unpruned
  * result and (b) physically read only the files whose [min,max]
  * intervals may contain matches — verified via the scan's `numFiles`
  * metric, using the reference's boundary counts (SURVEY.md §5:
  * `< min_file0` → 0 files, `<= min_file0` → 1, point id → its file).
  */
class MetastoreFileIndexSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = tmpDir("mfi_fixture")
    Fixtures.generate(spark, d, NaiveTs)
    d
  }
  private lazy val all = Fixtures.read(spark, dir).cache()
  private lazy val table: DataFrame =
    MetastoreFileIndex.table(spark, dir,
      Metastore.build(spark, dir, "id", Seq("timestamp")))

  /** Files actually read by the (executed) scan. */
  private def filesRead(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  test("point query reads one file and matches the unpruned result") {
    val id0 = all.agg(min("id")).first().getString(0)
    val q = table.where(col("id") === id0)
    val expected = all.where(col("id") === id0).count()
    assert(q.count() === expected)
    assert(filesRead(table.where(col("id") === id0)) === 1L)
  }

  test("spark.sql over the registered view prunes transparently") {
    table.createOrReplaceTempView("mfi_events")
    val id0 = all.agg(min("id")).first().getString(0)
    val q = spark.sql(s"SELECT sum(x) AS sx FROM mfi_events WHERE id = '$id0'")
    val expected = all.where(col("id") === id0).agg(sum("x")).first().getLong(0)
    assert(q.first().getLong(0) === expected)
    val scanned = filesRead(spark.sql(s"SELECT x FROM mfi_events WHERE id = '$id0'"))
    assert(scanned === 1L)
  }

  test("reference boundary semantics: < min_file0 reads 0 files, <= reads 1") {
    val tsMin = Fixtures.tsLit(NaiveTs, Fixtures.windowOf(0)._1)
    assert(filesRead(table.where(col("timestamp") < lit(tsMin))) === 0L)
    assert(filesRead(table.where(col("timestamp") <= lit(tsMin))) === 1L)
    // >= min of file 0 keeps everything (10 files)
    assert(filesRead(table.where(col("timestamp") >= lit(tsMin))) === 10L)
  }

  test("IN-list prunes to the union of matching files") {
    val ids = all.select("id").distinct().orderBy("id").limit(3)
      .collect().map(_.getString(0)).toSeq
    val q = table.where(col("id").isin(ids: _*))
    assert(q.count() === all.where(col("id").isin(ids: _*)).count())
    // the 3 smallest ids cluster in the first file(s) of the globally
    // sorted layout — strictly fewer than all 10 must be read
    assert(filesRead(table.where(col("id").isin(ids: _*))) < 10L)
  }

  test("unsupported predicates never prune (false positives only)") {
    // x has no stats: full scan, correct rows
    val q = table.where(col("x") > 250)
    assert(q.count() === all.where(col("x") > 250).count())
    assert(filesRead(table.where(col("x") > 250)) === 10L)
    // conjunction: the id leg prunes, the x leg filters at scan
    val id0 = all.agg(min("id")).first().getString(0)
    val q2 = table.where(col("id") === id0 && col("x") > 250)
    assert(q2.count() === all.where(col("id") === id0 && col("x") > 250).count())
    assert(filesRead(table.where(col("id") === id0 && col("x") > 250)) === 1L)
  }

  test("property: random predicate conjunctions never lose rows vs full scan") {
    // pruning soundness (SURVEY §5's property): for ANY conjunction of
    // comparison predicates — on indexed columns, unindexed columns,
    // present or absent values, in or out of the data's range — the
    // pruned table returns exactly the unpruned result. 40 seeded random
    // predicate sets; a single lost row fails.
    import org.apache.spark.sql.Column
    val rng = new scala.util.Random(812)
    val hex = "0123456789abcdef"
    val idPool = all.select("id").distinct().collect().map(_.getString(0))
    val ops: Seq[(Column, Any) => Column] = Seq(_ === _, _ < _, _ <= _, _ > _, _ >= _)
    val tsLo = Fixtures.windowOf(0)._1 - Fixtures.Delta
    val tsHi = Fixtures.windowOf(9)._2 + Fixtures.Delta
    for (i <- 0 until 40) {
      val preds = scala.collection.mutable.ArrayBuffer[Column]()
      if (rng.nextBoolean()) {
        val idVal = // existing id half the time, arbitrary hex pair otherwise
          if (rng.nextBoolean()) idPool(rng.nextInt(idPool.length))
          else s"${hex(rng.nextInt(16))}${hex(rng.nextInt(16))}"
        preds += ops(rng.nextInt(ops.size))(col("id"), idVal)
      }
      if (rng.nextBoolean()) {
        val epoch = tsLo + math.abs(rng.nextLong()) % (tsHi - tsLo)
        preds += ops(rng.nextInt(ops.size))(col("timestamp"),
          Fixtures.tsLit(Fixtures.NaiveTs, epoch))
      }
      if (rng.nextBoolean()) preds += ops(rng.nextInt(ops.size))(col("x"), rng.nextInt(520))
      val pred = preds.reduceOption(_ && _).getOrElse(lit(true))
      val got = table.where(pred).count()
      val expected = all.where(pred).count()
      assert(got === expected, s"sample $i: predicate $pred lost rows ($got vs $expected)")
    }
  }

  test("tz-aware timestamps prune with the same boundary counts") {
    import graft.Fixtures.ZonedTs
    val d = tmpDir("mfi_zoned")
    Fixtures.generate(spark, d, ZonedTs)
    val tbl = MetastoreFileIndex.table(spark, d,
      Metastore.build(spark, d, "id", Seq("timestamp")))
    val tsMin = Fixtures.tsLit(ZonedTs, Fixtures.windowOf(0)._1)
    def files(df: DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s.metrics("numFiles").value }.sum
    }
    assert(files(tbl.where(col("timestamp") < lit(tsMin))) === 0L)
    assert(files(tbl.where(col("timestamp") <= lit(tsMin))) === 1L)
    assert(tbl.where(col("timestamp") <= lit(tsMin)).count() ===
      Fixtures.read(spark, d).where(col("timestamp") <= lit(tsMin)).count())
  }

  test("hive-partitioned layout: partition columns resolve and prune") {
    import spark.implicits._
    val d = tmpDir("mfi_part") + "/t"
    (0 until 1000).map(i => (i.toLong, i % 4, s"v$i"))
      .toDF("id", "bucket", "payload")
      .write.partitionBy("bucket").parquet(d)
    val stats = Metastore.build(spark, d, "id")
    val tbl = MetastoreFileIndex.table(spark, d, stats)
    val plain = spark.read.parquet(d)
    // partition column readable (not nulls from footers)
    assert(tbl.where(col("bucket") === 2).count() ===
      plain.where(col("bucket") === 2).count())
    // combined partition + zone-map filter stays correct
    val got = tbl.where(col("bucket") === 1 && col("id") < 100)
      .select("id", "payload").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val exp = plain.where(col("bucket") === 1 && col("id") < 100)
      .select("id", "payload").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === exp && got.nonEmpty)
  }

  test("NaN rows are never pruned away by float max-side predicates") {
    import spark.implicits._
    val d = tmpDir("mfi_nan") + "/t"
    // one file whose score column holds {1.0, NaN}: a spec-compliant
    // writer records min=max=1.0 (NaN excluded from stats)
    Seq((1L, 1.0), (2L, Double.NaN)).toDF("id", "score")
      .coalesce(1).write.parquet(d)
    val stats = Metastore.build(spark, d, "id", Seq("score"))
    // Spark orders NaN above all doubles: score > 5.0 matches the NaN row
    val expected = spark.read.parquet(d).where(col("score") > 5.0).count()
    assert(expected === 1L, "sanity: NaN > 5.0 is true in Spark")
    val tbl = MetastoreFileIndex.table(spark, d, stats)
    assert(tbl.where(col("score") > 5.0).count() === expected,
      "max-side float predicate must not prune the file holding the NaN row")
    val shack = new Lakeshack(spark, stats, Some(spark.read.parquet(d).schema))
    assert(shack.query(Seq(1L, 2L), clauses = Seq(Clause("score", ">", 5.0))).count() === expected)
  }

  test("aggregation and join probes through the pruned table stay correct") {
    val id0 = all.agg(min("id")).first().getString(0)
    val byId = table.where(col("id") === id0)
      .groupBy("id").agg(count(lit(1)).as("n"), sum("x").as("sx"))
    val exp = all.where(col("id") === id0)
      .groupBy("id").agg(count(lit(1)).as("n"), sum("x").as("sx"))
    assert(byId.collect().toSeq === exp.collect().toSeq)
  }

  test("refresh() on a path-backed index picks up newly harvested files") {
    import spark.implicits._
    val root = tmpDir("mfi_refresh")
    val d = root + "/data"
    val sp = root + "/stats"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1).write.parquet(d)
    Metastore.update(spark, sp, Metastore.buildFromFooters(spark, d, "k"))
    val tbl = MetastoreFileIndex.table(spark, d, sp)
    assert(filesRead(tbl.where(col("k") === 1L)) === 1L)

    // append a second immutable file, harvest it, refresh the index
    Seq((100L, "x"), (101L, "y")).toDF("k", "v").coalesce(1).write.mode("append").parquet(d)
    Metastore.update(spark, sp, Metastore.buildFromFooters(spark, d, "k"))
    MetastoreFileIndex.indexOf(tbl).refresh()
    assert(tbl.where(col("k") === 100L).count() === 1L,
      "after refresh the new file's rows must be visible")
    assert(filesRead(tbl.where(col("k") === 100L)) === 1L,
      "the refreshed interval map must prune the old file for new-file keys")
    assert(filesRead(tbl.where(col("k") === 1L)) === 1L,
      "old-file keys must still prune the new file")
  }

  test("mixed layout: top-level files plus nested batch dirs are all visible") {
    import spark.implicits._
    // the Merge/ingest lake shape: original top-level files + a nested
    // batch subdir. A non-recursive index silently returns only the
    // root's DIRECT children (PartitioningAwareFileIndex.allFiles) —
    // this pins the recursive branch of MetastoreFileIndex.table.
    val root = tmpDir("mfi_mixed")
    val d = root + "/data"
    val sp = root + "/stats"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1).write.parquet(d)
    Seq((100L, "x"), (101L, "y")).toDF("k", "v").coalesce(1).write.parquet(s"$d/merge-0001")
    Metastore.update(spark, sp, Metastore.buildFromFooters(spark, d, "k"))
    val tbl = MetastoreFileIndex.table(spark, d, sp)
    assert(tbl.count() === 4L, "nested batch rows must be listed")
    assert(tbl.where(col("k") === 100L).count() === 1L)
    assert(filesRead(tbl.where(col("k") === 100L)) === 1L,
      "zone maps must prune the top-level file for nested-batch keys")
  }
}
