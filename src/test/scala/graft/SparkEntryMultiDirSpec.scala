package graft

import org.apache.spark.sql.functions.col

/** Regression: lake_sql_pruned once registered a single session-global
  * view name, so querying a second data dir in the same session silently
  * rebound the first dir's cached queries to the second dir's data. The
  * view name is now dir-unique; both dirs must keep serving their own
  * rows in any interleaving. */
class SparkEntryMultiDirSpec extends SparkSpec {

  private def directCount(dir: String): Long =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .where(col("l_orderkey").isin(42L, 4242L, 9999L, 14000L)).count()

  test("lake_sql_pruned serves each dir's own data after a second dir registers") {
    val q = SparkEntry.queries("lake_sql_pruned")
    val a1 = q(spark, "/root/testdata/sf0.001").collect()
    val b = q(spark, "/root/testdata/sf0.01").collect()
    val a2 = q(spark, "/root/testdata/sf0.001").collect()
    assert(a1.toSeq === a2.toSeq,
      "first dir's results changed after the second dir was registered")
    assert(a1.length.toLong === directCount("/root/testdata/sf0.001"))
    assert(b.length.toLong === directCount("/root/testdata/sf0.01"))
  }
}
