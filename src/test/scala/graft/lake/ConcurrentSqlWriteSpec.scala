package graft.lake

import graft.SparkSpec

/** Concurrent SQL writers on one catalog table: the claim protocol
  * means two INSERTs never lose each other's rows (the loser of the
  * manifest race re-reads the head and re-claims), and a concurrent
  * INSERT during a maintenance rewrite surfaces as the documented
  * lost-update refusal on the REWRITE side, never as silent data loss. */
class ConcurrentSqlWriteSpec extends SparkSpec {
  import spark.implicits._

  test("parallel INSERT INTO from many threads: every row lands, one commit each") {
    val root = tmpDir("cconc")
    spark.conf.set("spark.sql.catalog.ccw", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.ccw.root", root)
    spark.sql("CREATE TABLE ccw.t (id BIGINT, src INT)")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futures = (0 until 4).map { w =>
      scala.concurrent.Future {
        spark.sql(s"INSERT INTO ccw.t VALUES (${w}0, $w), (${w}1, $w)")
      }
    }
    import scala.concurrent.duration._
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures), 120.seconds)
    pool.shutdown()
    assert(spark.sql("SELECT count(*) FROM ccw.t").as[Long].head() == 8L)
    assert(spark.sql("SELECT count(DISTINCT src) FROM ccw.t").as[Long].head() == 4L)
    // 4 appends + create — nobody's commit was lost or doubled
    val ops = SnapshotLog.history(spark, s"$root/t")
      .select("op").as[String].collect()
    assert(ops.count(_ == "append") == 4 && ops.count(_ == "create") == 1)
  }

  test("a compact racing an INSERT refuses with the lost-update error, data intact") {
    val root = tmpDir("cconc_race")
    spark.conf.set("spark.sql.catalog.ccr", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.ccr.root", root)
    spark.sql("CREATE TABLE ccr.t (id BIGINT)")
    spark.sql("INSERT INTO ccr.t VALUES (1), (2)")
    // simulate the race: a rewrite plans against the current head,
    // an INSERT moves it, then the rewrite's claim (expected = the
    // stale head) must REFUSE — the lost-update protection every
    // non-append commit relies on
    val head = SnapshotLog.currentVersion(spark, s"$root/t")
    val cur = SnapshotLog.state(spark, s"$root/t", Some(head))
    spark.sql("INSERT INTO ccr.t VALUES (3)") // head moves
    intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.commit(spark, s"$root/t", "compact",
        adds = Nil, removes = cur.files, schemaJson = cur.schemaJson,
        expected = head)
    }
    // nothing was lost: both inserts' rows are all present
    assert(spark.sql("SELECT count(*) FROM ccr.t").as[Long].head() == 3L)
  }
}
