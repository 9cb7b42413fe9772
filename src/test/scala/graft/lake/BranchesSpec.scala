package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BranchesSpec extends SparkSpec {

  private def mkTable(prefix: String, n: Int = 100): String = {
    import spark.implicits._
    val table = s"${tmpDir(prefix)}/t"
    SnapshotLog.write((0 until n).map(i => (i.toLong, s"r$i")).toDF("k", "s"),
      table, "overwrite", clusterColumn = Some("k"), nFiles = 4)
    table
  }

  test("branch isolation: writes on the branch never touch main") {
    import spark.implicits._
    val table = mkTable("br_iso")
    Branches.create(spark, table, "audit")
    val b = Branches.path(table, "audit")
    SnapshotLog.write(Seq((1000L, "new")).toDF("k", "s"), b, "append")
    SnapshotLog.deleteByKeys(spark, b, "k", Seq(0L, 1L))
    assert(SnapshotLog.read(spark, b).count() === 99)
    assert(SnapshotLog.read(spark, table).count() === 100) // main untouched
    assert(SnapshotLog.currentVersion(spark, table) === 0L)
    assert(Branches.forkVersion(spark, table, "audit") === 0L)
    assert(Branches.list(spark, table) === Seq("audit"))
  }

  test("publish fast-forwards main to the branch head atomically") {
    import spark.implicits._
    val table = mkTable("br_pub")
    Branches.create(spark, table, "wap")
    val b = Branches.path(table, "wap")
    SnapshotLog.write(Seq((1000L, "new")).toDF("k", "s"), b, "append")
    SnapshotLog.deleteByKeys(spark, b, "k", Seq(7L)) // a DV delete on the branch
    val v = Branches.publish(spark, table, "wap")
    assert(v === 1L)
    val main = SnapshotLog.read(spark, table)
    assert(main.count() === 100) // 100 + 1 - 1
    assert(main.where(col("k") === 1000L).count() === 1)
    assert(main.where(col("k") === 7L).count() === 0)
    // time travel below the publish still shows fork state
    assert(SnapshotLog.read(spark, table, asOf = Some(0L)).count() === 100)
    assert(SnapshotLog.read(spark, table, asOf = Some(0L))
      .where(col("k") === 7L).count() === 1)
    Branches.drop(spark, table, "wap")
    assert(Branches.list(spark, table) === Nil)
  }

  test("publish refuses when main advanced past the fork (no silent merge)") {
    import spark.implicits._
    val table = mkTable("br_conflict")
    Branches.create(spark, table, "stale")
    SnapshotLog.write(Seq((2000L, "x")).toDF("k", "s"), table, "append")
    intercept[java.util.ConcurrentModificationException](
      Branches.publish(spark, table, "stale"))
    // and a double publish cannot double-apply
    val t2 = mkTable("br_double")
    Branches.create(spark, t2, "once")
    SnapshotLog.write(Seq((1L, "y")).toDF("k", "s"),
      Branches.path(t2, "once"), "append")
    Branches.publish(spark, t2, "once")
    intercept[java.util.ConcurrentModificationException](
      Branches.publish(spark, t2, "once"))
  }

  test("branch survives main manifest expiry; expire keeps branch-referenced files") {
    import spark.implicits._
    val table = mkTable("br_expire")
    Branches.create(spark, table, "old")
    // push main far ahead with overwrites so v0's files become droppable
    for (i <- 1 to 3)
      SnapshotLog.write((0 until 10).map(j => (j.toLong, s"g$i-$j")).toDF("k", "s"),
        table, "overwrite", clusterColumn = Some("k"), nFiles = 2)
    val dropped = SnapshotLog.expire(spark, table, keepLast = 1)
    assert(SnapshotLog.read(spark, table).count() === 10)
    // the branch still reads its fork state: v0's files were NOT deleted
    assert(SnapshotLog.read(spark, Branches.path(table, "old")).count() === 100)
    assert(dropped.forall(f => !SnapshotLog.state(spark,
      Branches.path(table, "old")).files.contains(f)))
  }

  test("expireOrphans never reclaims an unpublished branch's data") {
    import spark.implicits._
    val table = mkTable("br_orphan")
    Branches.create(spark, table, "wip")
    SnapshotLog.write(Seq((1L, "keep")).toDF("k", "s"),
      Branches.path(table, "wip"), "append")
    val dropped = SnapshotLog.expireOrphans(spark, table, graceMs = 0L)
    assert(dropped.isEmpty)
    assert(SnapshotLog.read(spark, Branches.path(table, "wip"))
      .where(col("s") === "keep").count() === 1)
    // after the branch is dropped the same data IS reclaimable
    Branches.drop(spark, table, "wip")
    assert(SnapshotLog.expireOrphans(spark, table, graceMs = 0L).nonEmpty)
  }

  test("branch-scoped retention is refused (shared pool)") {
    val table = mkTable("br_guard")
    Branches.create(spark, table, "b")
    intercept[IllegalArgumentException](
      SnapshotLog.expire(spark, Branches.path(table, "b"), 1))
    intercept[IllegalArgumentException](
      SnapshotLog.expireOrphans(spark, Branches.path(table, "b"), 0L))
  }

  test("tags: immutable named versions; expire never drops below a tag") {
    import spark.implicits._
    val table = mkTable("br_tags", n = 20)
    SnapshotLog.write(Seq((100L, "v1")).toDF("k", "s"), table, "append")
    Branches.tag(spark, table, "march-run", Some(0L))
    intercept[IllegalStateException](Branches.tag(spark, table, "march-run"))
    assert(Branches.tagVersion(spark, table, "march-run") === 0L)
    assert(Branches.readTag(spark, table, "march-run").count() === 20)
    for (i <- 1 to 3)
      SnapshotLog.write(Seq((200L + i, "x")).toDF("k", "s"), table, "append")
    SnapshotLog.expire(spark, table, keepLast = 1)
    // tagged v0 must still resolve
    assert(Branches.readTag(spark, table, "march-run").count() === 20)
    Branches.dropTag(spark, table, "march-run")
    SnapshotLog.expire(spark, table, keepLast = 1)
    intercept[Exception](SnapshotLog.read(spark, table, asOf = Some(0L)))
  }

  test("full WAP round-trip with an audit gate between write and publish") {
    import spark.implicits._
    val table = mkTable("br_wap")
    Branches.create(spark, table, "ingest")
    val b = Branches.path(table, "ingest")
    SnapshotLog.write(Seq((5000L, "good"), (5001L, "good")).toDF("k", "s"),
      b, "append")
    // audit on the BRANCH: no duplicate keys, expected row count
    val audited = SnapshotLog.read(spark, b)
    assert(audited.groupBy("k").count().where(col("count") > 1).count() === 0)
    assert(audited.count() === 102)
    val v = Branches.publish(spark, table, "ingest")
    Branches.tag(spark, table, "audited-2024-03", Some(v))
    assert(SnapshotLog.read(spark, table).count() === 102)
    assert(Branches.readTag(spark, table, "audited-2024-03").count() === 102)
  }

  test("all-digit tag names are rejected at creation (VERSION AS OF shadowing)") {
    val table = mkTable("br_digit_tag")
    val e = intercept[IllegalArgumentException](Branches.tag(spark, table, "42"))
    assert(e.getMessage.contains("all digits"))
    // a letter anywhere makes the name unambiguous — accepted
    Branches.tag(spark, table, "v42")
    assert(Branches.tagVersions(spark, table).contains("v42"))
  }

  test("branch-of-branch is refused: the nested pool would diverge") {
    val table = mkTable("br_nest")
    Branches.create(spark, table, "b1")
    val e = intercept[IllegalArgumentException](
      Branches.create(spark, Branches.path(table, "b1"), "b2"))
    assert(e.getMessage.contains("TABLE root"))
    // the guard also rejects any _branches segment smuggled in the path
    intercept[IllegalArgumentException](
      Branches.create(spark, s"$table/${Branches.BranchesDir}/b1", "b3"))
  }
}
