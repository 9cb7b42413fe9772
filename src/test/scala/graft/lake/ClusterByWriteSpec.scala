package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Declared CLUSTER BY layout: `CREATE TABLE … TBLPROPERTIES
  * ('cluster_by'='c')` stores the table's layout preference, and every
  * SQL INSERT then range-distributes + sorts its rows before writing —
  * so the files a plain INSERT produces carry DISJOINT zone-map ranges
  * and point/range queries keep pruning without an OPTIMIZE pass. */
class ClusterByWriteSpec extends SparkSpec {
  import spark.implicits._

  private def register(cat: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
  }

  test("INSERT INTO a cluster_by table writes range-disjoint files that prune") {
    val root = tmpDir("cby")
    register("cby", root)
    spark.sql("CREATE TABLE cby.t (id BIGINT, s STRING) TBLPROPERTIES ('cluster_by'='id')")
    assert(SnapshotLog.clusterByOf(spark, s"$root/t") == Seq("id"))
    // a deliberately SHUFFLED insert: without the declared layout these
    // rows land in arrival order and every file spans the key space
    val src = (0 until 2000).map(i => ((i * 997) % 2000).toLong -> s"r$i")
      .toDF("id", "s").repartition(7)
    src.createOrReplaceTempView("cby_src")
    // AQE would rightly coalesce 2000 rows into one ~64MB-advisory
    // partition; the spec needs >1 file to prove range disjointness
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try spark.sql("INSERT INTO cby.t SELECT * FROM cby_src")
    finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    // all rows arrived
    assert(spark.sql("SELECT count(*) FROM cby.t WHERE id >= 0").as[Long].head() == 2000L)
    // per-file ranges are disjoint: harvest footer stats and check
    val snap = SnapshotLog.state(spark, s"$root/t")
    assert(snap.files.size >= 2, s"want >1 file, got ${snap.files}")
    val rootP = new org.apache.hadoop.fs.Path(s"$root/t")
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val abs = snap.files.map(f => fs.makeQualified(
      new org.apache.hadoop.fs.Path(SnapshotLog.dataRootOf(rootP), f)).toString)
    val stats = StatsAgg.harvest(spark, abs, "id", org.apache.spark.sql.types.LongType)
    val ranges = stats.map(s => (s.min.get.asInstanceOf[Long], s.max.get.asInstanceOf[Long]))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"overlapping file ranges: $ranges")
      case _ => ()
    }
  }

  test("cluster_by validates columns and type; other properties still refuse") {
    val root = tmpDir("cby_bad")
    register("cbyb", root)
    val e1 = intercept[Exception](spark.sql(
      "CREATE TABLE cbyb.bad1 (id BIGINT) TBLPROPERTIES ('cluster_by'='nope')"))
    assert(e1.getMessage.contains("not in the schema"))
    val e2 = intercept[Exception](spark.sql(
      "CREATE TABLE cbyb.bad2 (id BIGINT, a ARRAY<INT>) TBLPROPERTIES ('cluster_by'='a')"))
    assert(e2.getMessage.contains("non-orderable"))
    val e3 = intercept[Exception](spark.sql(
      "CREATE TABLE cbyb.bad3 (id BIGINT) TBLPROPERTIES ('foo'='bar')"))
    assert(e3.getMessage.contains("cluster_by"))
    // an unclustered table still writes fine with no distribution ask
    spark.sql("CREATE TABLE cbyb.plain (id BIGINT)")
    spark.sql("INSERT INTO cbyb.plain VALUES (1), (2)")
    assert(spark.sql("SELECT count(*) FROM cbyb.plain").as[Long].head() == 2L)
    // CALL set_cluster_by adopts the layout on an existing table, and
    // SHOW TBLPROPERTIES reports it
    assert(spark.sql("CALL cbyb.system.set_cluster_by('plain', 'id')")
      .as[String].head() == "id")
    assert(SnapshotLog.clusterByOf(spark, s"$root/plain") == Seq("id"))
    val props = spark.sql("SHOW TBLPROPERTIES cbyb.plain")
      .as[(String, String)].collect().toMap
    assert(props.get("cluster_by").contains("id"))
    val eBad = intercept[Exception](
      spark.sql("CALL cbyb.system.set_cluster_by('plain', 'missing')").collect())
    assert(eBad.getMessage.contains("not in the schema"))
  }

  test("TRUNCATE TABLE is one O(1) empty-overwrite commit; rollback restores") {
    val root = tmpDir("cby_trunc")
    register("cbyt", root)
    spark.sql("CREATE TABLE cbyt.t (id BIGINT)")
    spark.sql("INSERT INTO cbyt.t VALUES (1), (2), (3)")
    spark.sql("TRUNCATE TABLE cbyt.t")
    assert(spark.sql("SELECT count(*) FROM cbyt.t").as[Long].head() == 0L)
    val hist = SnapshotLog.history(spark, s"$root/t")
      .select("version", "op", "n_adds", "n_removes")
      .as[(Long, String, Long, Long)].collect()
      .map { case (v, o, a, rm) => v -> ((o, a, rm)) }.toMap
    // the truncate commit added NOTHING (no DV files, no data) and
    // removed the live set — O(1) metadata, not O(rows) vectors
    val (op, adds, removes) = hist(hist.keys.max)
    assert(op == "overwrite" && adds == 0L && removes >= 1L)
    spark.sql("CALL cbyt.system.rollback('t', 1)") // v0 create, v1 insert, v2 truncate
    assert(spark.sql("SELECT count(*) FROM cbyt.t").as[Long].head() == 3L)
  }
}
