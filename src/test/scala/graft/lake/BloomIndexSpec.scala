package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-file Bloom pruning: no false negatives ever (the soundness
  * contract), real candidate reduction on disjoint files, fpp in the
  * designed ballpark, null/absent-value behavior, and the zone-map
  * intersection. */
class BloomIndexSpec extends SparkSpec {

  import spark.implicits._

  /** Two files with disjoint value sets: file A holds 0-499, file B
    * holds 10000-10499. */
  private lazy val dir: String = {
    val d = tmpDir("bloom_fixture") + "/t"
    (0L until 500L).toDF("u").withColumn("pay", col("u") * 2)
      .coalesce(1).write.parquet(d)
    (10000L until 10500L).toDF("u").withColumn("pay", col("u") * 2)
      .coalesce(1).write.mode("append").parquet(d)
    d
  }
  private lazy val bloom =
    BloomIndex.build(spark, dir, "u", expectedItemsPerFile = 500L).cache()

  private def fileOf(value: Long): String = {
    val paths = spark.read.parquet(dir)
      .select(col("_metadata.file_path").as("p"), col("u"))
      .where(col("u") === value).select("p").distinct().collect()
    assert(paths.length === 1)
    new org.apache.hadoop.fs.Path(paths.head.getString(0)).toString
  }

  test("no false negatives: every present value's file survives pruning") {
    val rng = new scala.util.Random(7)
    val probes = Seq.fill(40)(rng.nextInt(500).toLong) ++
      Seq.fill(40)(10000L + rng.nextInt(500))
    for (v <- probes) {
      val kept = BloomIndex.prune(bloom, Seq(v))
      assert(kept.contains(fileOf(v)), s"value $v's file was wrongly pruned")
    }
  }

  test("disjoint files prune each other for present values") {
    // deterministic inputs → deterministic (seeded) hashes: if these
    // probes dodge the ~1% fpp once, they always do
    val keptA = BloomIndex.prune(bloom, Seq(42L))
    assert(keptA === Seq(fileOf(42L)), s"value 42 must prune to its own file, got $keptA")
    val keptB = BloomIndex.prune(bloom, Seq(10042L))
    assert(keptB === Seq(fileOf(10042L)))
  }

  test("absent values prune everything (within fpp)") {
    // 200 probes far outside both ranges: expected false-positive file
    // hits ≈ 200 probes × 2 files × 1% = 4; assert a generous ceiling
    val hits = (0 until 200).map(i => BloomIndex.prune(bloom, Seq(5000L + i)).size).sum
    assert(hits <= 20, s"false-positive rate far above design: $hits/400 file hits")
  }

  test("multi-value probe unions the files") {
    val kept = BloomIndex.prune(bloom, Seq(7L, 10007L)).toSet
    assert(kept === Set(fileOf(7L), fileOf(10007L)))
  }

  test("nulls are not indexed and all-null files never match") {
    val d = tmpDir("bloom_nulls") + "/t"
    Seq(Some(1L), Some(2L), None).toDF("u").coalesce(1).write.parquet(d)
    Seq(Option.empty[Long], Option.empty[Long]).toDF("u")
      .coalesce(1).write.mode("append").parquet(d)
    val b = BloomIndex.build(spark, d, "u", expectedItemsPerFile = 10L)
    // the all-null file produces no bloom row at all — absent row =
    // nothing to match; the mixed file matches its non-null values
    assert(b.count() === 1)
    assert(BloomIndex.prune(b, Seq(1L)).size === 1)
    assert(BloomIndex.prune(b, Seq(99L)).isEmpty)
  }

  test("pruneWith intersects zone-map and bloom survivors") {
    val stats = Metastore.buildFromFooters(spark, dir, "u")
    // value 42: zone-map keeps file A only (ranges are disjoint), bloom
    // agrees — intersection is exactly file A
    val kept = BloomIndex.pruneWith(spark, stats, bloom, Seq(42L), Seq(42L))
    assert(kept === Seq(fileOf(42L)))
    // contradictory probes (cluster says A, bloom says B) intersect to nothing
    assert(BloomIndex.pruneWith(spark, stats, bloom, Seq(42L), Seq(10042L)).isEmpty)
  }

  test("filepaths join against stats-table filepaths (normalized form)") {
    val stats = Metastore.buildFromFooters(spark, dir, "u")
    val statPaths = stats.select("filepath").collect().map(_.getString(0)).toSet
    val bloomPaths = bloom.select("filepath").collect().map(_.getString(0)).toSet
    assert(bloomPaths === statPaths)
  }
}
