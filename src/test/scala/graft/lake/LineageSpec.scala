package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineageSpec extends SparkSpec {

  test("readLineage: rows credit their adding commit; DVs still apply") {
    import spark.implicits._
    val table = s"${tmpDir("lineage")}/t"
    SnapshotLog.write((0 until 50).map(i => (i.toLong, "v0")).toDF("k", "s"),
      table, "overwrite", clusterColumn = Some("k"), nFiles = 2)
    SnapshotLog.write((100 until 120).map(i => (i.toLong, "v1")).toDF("k", "s"),
      table, "append", clusterColumn = Some("k"), nFiles = 2)
    SnapshotLog.deleteByKeys(spark, table, "k", Seq(3L, 101L)) // v2, DV only
    val rows = SnapshotLog.readLineage(spark, table).collect()
    assert(rows.length === 68)
    assert(rows.forall(r => r.getAs[String]("_source_file").startsWith("data/")))
    val byVer = rows.groupBy(_.getAs[Long]("_commit_version"))
      .view.mapValues(_.map(_.getAs[Long]("k")).toSet).toMap
    assert(byVer(0L) === (0 until 50).map(_.toLong).toSet - 3L)
    assert(byVer(1L) === (100 until 120).map(_.toLong).toSet - 101L)
    // time travel to v1: deleted rows back, same provenance
    val v1 = SnapshotLog.readLineage(spark, table, asOf = Some(1L))
    assert(v1.count() === 70)
    assert(v1.where(col("k") === 3L).select("_commit_version")
      .collect()(0).getLong(0) === 0L)
  }

  test("readLineage after expire: pre-horizon adds resolve to -1, never wrong") {
    import spark.implicits._
    val table = s"${tmpDir("lineage_exp")}/t"
    SnapshotLog.write(Seq((1L, "old")).toDF("k", "s"), table, "overwrite")
    for (i <- 2 to 4)
      SnapshotLog.write(Seq((i.toLong, s"g$i")).toDF("k", "s"), table, "append")
    SnapshotLog.expire(spark, table, keepLast = 2)
    val vers = SnapshotLog.readLineage(spark, table)
      .select("k", "_commit_version").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vers(4L) === 3L) // retained manifest still resolves
    assert(vers(1L) === -1L) // v0's manifest expired: unknown, not wrong
  }

  test("readLineage on a branch credits branch-local versions") {
    import spark.implicits._
    val table = s"${tmpDir("lineage_br")}/t"
    SnapshotLog.write(Seq((1L, "main")).toDF("k", "s"), table, "overwrite")
    Branches.create(spark, table, "b")
    val b = Branches.path(table, "b")
    SnapshotLog.write(Seq((2L, "staged")).toDF("k", "s"), b, "append")
    val vers = SnapshotLog.readLineage(spark, b)
      .select("k", "_commit_version").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vers === Map(1L -> 0L, 2L -> 1L)) // fork restatement = branch v0
  }
}
