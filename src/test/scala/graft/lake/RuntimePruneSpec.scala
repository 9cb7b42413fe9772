package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Join-driven runtime file pruning on the snapshot catalog: a
  * broadcast join against a filtered dim must plant a dynamic-pruning
  * subquery on the fact scan (SupportsRuntimeFiltering over the
  * zone maps), and at execution the fact side must DROP the files
  * whose [min,max] cannot hold the surviving join keys — the
  * unpartitioned-table equivalent of dynamic partition pruning. */
class RuntimePruneSpec extends SparkSpec {
  import spark.implicits._

  test("broadcast join against a filtered dim drops non-matching fact files at runtime") {
    val root = tmpDir("rtprune")
    // fact: 4000 rows clustered on k into 8 files → each file holds a
    // ~500-wide key range
    val fact = (0 until 4000).map(i => (i.toLong, i % 13)).toDF("k", "payload")
    SnapshotLog.write(fact, s"$root/fact", "overwrite",
      clusterColumn = Some("k"), nFiles = 8)
    spark.conf.set("spark.sql.catalog.rtp", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.rtp.root", root)
    // dim must be FILE-BASED: an in-memory view collapses its filter
    // into the LocalRelation before PartitionPruning runs, and a
    // filterless dim is never treated as selective
    val dimPath = tmpDir("rtprune_dim")
    (0 until 4000 by 80).map(i => (i.toLong, if (i < 150) "hot" else "cold"))
      .toDF("dk", "cat").write.mode("overwrite").parquet(dimPath)
    spark.read.parquet(dimPath).createOrReplaceTempView("rtp_dim")
    val before = StreamableParquetScan.runtimePrunedSplits.get()
    val q = spark.sql(
      """SELECT count(*) AS n, sum(f.payload) AS s
        |FROM rtp.fact f JOIN rtp_dim d ON f.k = d.dk
        |WHERE d.cat = 'hot'""".stripMargin)
    val (n, s) = q.as[(Long, Long)].head()
    // oracle: the 'hot' dim keys (0, 80) all exist in fact
    val hot = (0 until 4000 by 80).filter(_ < 150)
    assert(n == hot.size.toLong)
    assert(s == hot.map(_ % 13).sum.toLong)
    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"expected a dynamic-pruning runtime filter on the fact scan:\n$planStr")
    assert(StreamableParquetScan.runtimePrunedSplits.get() > before,
      "runtime zone-map pruning dropped no splits")
  }

  test("runtime filter with keys spanning every file prunes nothing and loses nothing") {
    val root = tmpDir("rtprune_all")
    val fact = (0 until 1000).map(i => (i.toLong, 1)).toDF("k", "one")
    SnapshotLog.write(fact, s"$root/fact", "overwrite",
      clusterColumn = Some("k"), nFiles = 4)
    spark.conf.set("spark.sql.catalog.rtpa", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.rtpa.root", root)
    val dimPath = tmpDir("rtprune_all_dim")
    (0 until 1000 by 100).map(i => (i.toLong, "x")).toDF("dk", "cat")
      .write.mode("overwrite").parquet(dimPath)
    spark.read.parquet(dimPath).createOrReplaceTempView("rtpa_dim")
    val n = spark.sql(
      """SELECT count(*) AS n FROM rtpa.fact f JOIN rtpa_dim d ON f.k = d.dk
        |WHERE d.cat = 'x'""".stripMargin).as[Long].head()
    assert(n == 10L)
  }

  test("projection that drops a column never breaks filter-attribute resolution") {
    val root = tmpDir("rtprune_proj")
    SnapshotLog.write((0 until 100).map(i => (i.toLong, i, s"s$i")).toDF("k", "v", "s"),
      s"$root/fact", "overwrite", clusterColumn = Some("k"), nFiles = 2)
    spark.conf.set("spark.sql.catalog.rtpp", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.rtpp.root", root)
    val dimPath = tmpDir("rtprune_proj_dim")
    Seq((5L, "x"), (95L, "x")).toDF("dk", "cat")
      .write.mode("overwrite").parquet(dimPath)
    spark.read.parquet(dimPath).createOrReplaceTempView("rtpp_dim")
    // only k survives column pruning on the fact side
    val n = spark.sql(
      """SELECT count(*) AS n FROM rtpp.fact f JOIN rtpp_dim d ON f.k = d.dk
        |WHERE d.cat = 'x'""".stripMargin).as[Long].head()
    assert(n == 2L)
  }
}
