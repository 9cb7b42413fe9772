package graft

/** The driver's flagship smoke, kept green in-repo: `SparkEntry.entry`
  * must return > 0 rows on sf0.001. Guarded on the testdata dir so the
  * suite still passes on a machine without the fixtures. */
class EntrySmokeSpec extends SparkSpec {
  test("flagship entry returns rows on sf0.001") {
    assume(new java.io.File("/root/testdata/sf0.001/lineitem.parquet").exists())
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
