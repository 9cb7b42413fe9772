package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Row-level change feed + incremental materialized view + schema
  * evolution on the snapshot format. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): String = tmpDir("chfeed") + "/t"

  private def changes(t: String, from: Long, to: Option[Long] = None,
                      full: Boolean = false): Set[(Long, String, String, Long)] =
    SnapshotLog.readChanges(spark, t, from, to, allowFullDiff = full)
      .select("id", "s", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet

  test("append commits feed inserts; fromVersion is exclusive") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite") // v0
    SnapshotLog.write(Seq((2L, "b"), (3L, "c")).toDF("id", "s"), t, "append") // v1
    assert(changes(t, -1L) == Set(
      (1L, "a", "insert", 0L), (2L, "b", "insert", 1L), (3L, "c", "insert", 1L)))
    assert(changes(t, 0L) == Set((2L, "b", "insert", 1L), (3L, "c", "insert", 1L)))
    assert(changes(t, 1L) == Set.empty)
  }

  test("DV delete commits feed exactly the newly-dead rows") {
    val t = mkTable()
    SnapshotLog.write((0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      t, "overwrite", clusterColumn = Some("id"), nFiles = 2) // v0
    SnapshotLog.delete(spark, t, col("id") < 3) // v1
    SnapshotLog.delete(spark, t, col("id") < 5) // v2: only 3,4 are NEW dead
    assert(changes(t, 0L) == Set(
      (0L, "r0", "delete", 1L), (1L, "r1", "delete", 1L), (2L, "r2", "delete", 1L),
      (3L, "r3", "delete", 2L), (4L, "r4", "delete", 2L)))
  }

  test("merge feeds the upserted rows as delete+insert and nothing else") {
    val t = mkTable()
    SnapshotLog.write((0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      t, "overwrite", clusterColumn = Some("id"), nFiles = 2) // v0
    SnapshotLog.merge(spark, t, "id",
      Seq((3L, "r3x"), (42L, "new")).toDF("id", "s"), deleteKeys = Seq(7L)) // v1
    assert(changes(t, 0L) == Set(
      (3L, "r3", "delete", 1L), (7L, "r7", "delete", 1L),
      (3L, "r3x", "insert", 1L), (42L, "new", "insert", 1L)))
  }

  test("merge after a DV delete never re-deletes the dead row in the feed") {
    val t = mkTable()
    SnapshotLog.write((0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      t, "overwrite", clusterColumn = Some("id"), nFiles = 1) // v0: one file
    SnapshotLog.delete(spark, t, col("id") === 2) // v1
    SnapshotLog.merge(spark, t, "id", Seq((5L, "r5x")).toDF("id", "s")) // v2 rewrites the file
    assert(changes(t, 1L) == Set(
      (5L, "r5", "delete", 2L), (5L, "r5x", "insert", 2L)))
  }

  test("compact feeds no row changes") {
    val t = mkTable()
    SnapshotLog.write((0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      t, "overwrite", clusterColumn = Some("id"), nFiles = 4) // v0
    SnapshotLog.delete(spark, t, col("id") === 9) // v1
    SnapshotLog.compact(spark, t, "id", nFiles = 1) // v2
    assert(changes(t, 0L) == Set((9L, "r9", "delete", 1L))) // v2 adds nothing
  }

  test("overwrite refuses without allowFullDiff, diffs correctly with it") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t, "overwrite") // v0
    SnapshotLog.write(Seq((2L, "b"), (3L, "c")).toDF("id", "s"), t, "overwrite") // v1
    val e = intercept[IllegalArgumentException](changes(t, 0L))
    assert(e.getMessage.contains("allowFullDiff"))
    assert(changes(t, 0L, full = true) == Set(
      (1L, "a", "delete", 1L), (3L, "c", "insert", 1L))) // unchanged 2L cancels
  }

  test("rollback un-delete shows as inserts under allowFullDiff") {
    val t = mkTable()
    SnapshotLog.write((0 until 6).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      t, "overwrite") // v0
    SnapshotLog.delete(spark, t, col("id") < 2) // v1
    SnapshotLog.rollback(spark, t, 0L) // v2: rows 0,1 return
    assert(changes(t, 1L, full = true) == Set(
      (0L, "r0", "insert", 2L), (1L, "r1", "insert", 2L)))
  }

  // ── incremental view ─────────────────────────────────────────────

  private def viewState(v: String): Map[String, (Long, Long)] =
    IncrementalView.read(spark, v)
      .select(col("g"), col("n_rows"), col("sum_x"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("incremental view equals a full recompute across append/delete/merge refreshes") {
    val src = mkTable(); val mv = tmpDir("chfeed") + "/mv"
    def df(rows: (Long, String, Long)*) = rows.toDF("id", "g", "x")
    SnapshotLog.write(df((1L, "a", 10L), (2L, "a", 5L), (3L, "b", 7L)), src,
      "overwrite", clusterColumn = Some("id"), nFiles = 1) // v0
    IncrementalView.create(spark, src, mv, Seq("g"), Seq("x"))
    assert(viewState(mv) == Map("a" -> (2L, 15L), "b" -> (1L, 7L)))

    SnapshotLog.write(df((4L, "b", 1L), (5L, "c", 2L)), src, "append") // v1
    SnapshotLog.delete(spark, src, col("id") === 2L) // v2
    IncrementalView.refresh(spark, mv)
    assert(viewState(mv) == Map("a" -> (1L, 10L), "b" -> (2L, 8L), "c" -> (1L, 2L)))

    // a group whose count reaches zero disappears, like the recompute
    SnapshotLog.delete(spark, src, col("g") === "c") // v3
    SnapshotLog.merge(spark, src, "id", df((1L, "a", 100L))) // v4: a: 10 → 100
    IncrementalView.refresh(spark, mv)
    assert(viewState(mv) == Map("a" -> (1L, 100L), "b" -> (2L, 8L)))

    // refresh with no source movement is a no-op
    val vBefore = SnapshotLog.currentVersion(spark, mv)
    assert(IncrementalView.refresh(spark, mv) == vBefore)

    // final state equals the from-scratch aggregate
    val full = SnapshotLog.read(spark, src).groupBy("g")
      .agg(count(lit(1)).as("n_rows"), sum(col("x")).as("sum_x"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(viewState(mv) == full)
  }

  test("min/max view: inserts fold; a delete retracting the extremum rescans that group only") {
    val src = mkTable(); val mv = tmpDir("chfeed") + "/mvmm"
    def df(rows: (Long, String, Long)*) = rows.toDF("id", "g", "x")
    SnapshotLog.write(df((1L, "a", 10L), (2L, "a", 5L), (3L, "b", 7L), (4L, "b", 7L)),
      src, "overwrite", clusterColumn = Some("id"), nFiles = 1) // v0
    IncrementalView.create(spark, src, mv, Seq("g"), Seq("x"), minMaxCols = Seq("x"))
    def mm(): Map[String, (Long, Long, Double)] = IncrementalView.read(spark, mv)
      .select(col("g"), col("min_x"), col("max_x"), col("avg_x"))
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(mm() == Map("a" -> (5L, 10L, 7.5), "b" -> (7L, 7L, 7.0)))

    // insert-only refresh: extrema fold in with no rescan
    SnapshotLog.write(df((5L, "a", 20L), (6L, "b", 1L)), src, "append") // v1
    IncrementalView.refresh(spark, mv)
    assert(mm() == Map("a" -> (5L, 20L, 35.0 / 3), "b" -> (1L, 7L, 5.0)))

    // delete retracts a's MAX (20) and one of b's tied 7s: 'a' must
    // rescan down to 10; 'b' keeps max 7 via the surviving witness
    SnapshotLog.delete(spark, src, col("id") === 5L || col("id") === 3L) // v2
    IncrementalView.refresh(spark, mv)
    assert(mm() == Map("a" -> (5L, 10L, 7.5), "b" -> (1L, 7L, 4.0)))

    // delete strictly inside the range: no retraction, extrema stand
    SnapshotLog.delete(spark, src, col("id") === 4L) // v3: b loses its 7
    IncrementalView.refresh(spark, mv)
    assert(mm() == Map("a" -> (5L, 10L, 7.5), "b" -> (1L, 1L, 1.0)))

    // final state equals the from-scratch aggregate
    val full = SnapshotLog.read(spark, src).groupBy("g")
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"),
        (sum(col("x")).cast("double") / count(lit(1))).as("av"))
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(mm() == full)
  }

  test("incremental view maintains through an UPDATE commit (delete+insert feed)") {
    val src = mkTable(); val mv = tmpDir("chfeed") + "/mvupd"
    SnapshotLog.write((0 until 10).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i.toLong))
      .toDF("id", "g", "x"), src, "overwrite", clusterColumn = Some("id"), nFiles = 2) // v0
    IncrementalView.create(spark, src, mv, Seq("g"), Seq("x"))
    SnapshotLog.update(spark, src, col("id") < 4L, Map("x" -> (col("x") + 100L))) // v1
    IncrementalView.refresh(spark, mv)
    val st = IncrementalView.read(spark, mv).select("g", "n_rows", "sum_x")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val full = SnapshotLog.read(spark, src).groupBy("g")
      .agg(count(lit(1)), sum(col("x")))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(st == full)
  }

  test("min/max view: the NULL group's retraction rescans null-safely") {
    val src = mkTable(); val mv = tmpDir("chfeed") + "/mvnull"
    // groupBy treats NULL as a real group — a delete retracting ITS
    // extremum must flow through the rescan's null-safe joins, not fall
    // out of a plain-equality semi-join
    def df(rows: (Long, Option[String], Long)*) = rows.toDF("id", "g", "x")
    SnapshotLog.write(df((1L, None, 10L), (2L, None, 5L), (3L, Some("b"), 7L)),
      src, "overwrite", clusterColumn = Some("id"), nFiles = 1) // v0
    IncrementalView.create(spark, src, mv, Seq("g"), Nil, minMaxCols = Seq("x"))
    SnapshotLog.delete(spark, src, col("id") === 1L) // retracts NULL group's max
    IncrementalView.refresh(spark, mv)
    val st = IncrementalView.read(spark, mv)
      .select(col("g"), col("min_x"), col("max_x"))
      .as[(Option[String], Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(st == Map(None -> (5L, 5L), Some("b") -> (7L, 7L)))
  }

  test("view cursor survives in the commit label; foreign head is refused") {
    val src = mkTable(); val mv = tmpDir("chfeed") + "/mv2"
    SnapshotLog.write(Seq((1L, "a", 1L)).toDF("id", "g", "x"), src, "overwrite")
    IncrementalView.create(spark, src, mv, Seq("g"), Seq("x"))
    val m = IncrementalView.meta(spark, mv)
    assert(m.src == src && m.srcVersion == 0L &&
      m.groupCols == Seq("g") && m.sumCols == Seq("x"))
    // a foreign overwrite severs the cursor → clear refusal
    SnapshotLog.write(Seq(("a", 1L, 1L)).toDF("g", "n_rows", "sum_x"), mv, "overwrite")
    val e = intercept[IllegalStateException](IncrementalView.refresh(spark, mv))
    assert(e.getMessage.contains("cursor"))
  }

  // ── schema evolution ─────────────────────────────────────────────

  test("append with mergeSchema adds a nullable column; old rows read null") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite") // v0
    SnapshotLog.write(Seq((2L, "b", 0.5)).toDF("id", "s", "score"), t, "append",
      mergeSchema = true) // v1
    val head = SnapshotLog.read(spark, t)
    assert(head.columns.toSeq == Seq("id", "s", "score"))
    val rows = head.as[(Long, String, Option[Double])].collect().toSet
    assert(rows == Set((1L, "a", None), (2L, "b", Some(0.5))))
    // time travel: v0 keeps its own 2-column schema
    assert(SnapshotLog.read(spark, t, Some(0L)).columns.toSeq == Seq("id", "s"))
  }

  test("append with a narrower batch under mergeSchema null-fills the head column") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a", 0.1)).toDF("id", "s", "score"), t, "overwrite")
    SnapshotLog.write(Seq((2L, "b")).toDF("id", "s"), t, "append", mergeSchema = true)
    val rows = SnapshotLog.read(spark, t).as[(Long, String, Option[Double])]
      .collect().toSet
    assert(rows == Set((1L, "a", Some(0.1)), (2L, "b", None)))
  }

  test("strict append refuses schema drift and type changes") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite")
    val drift = intercept[IllegalArgumentException](
      SnapshotLog.write(Seq((2L, "b", 1.0)).toDF("id", "s", "extra"), t, "append"))
    assert(drift.getMessage.contains("mergeSchema"))
    val tpe = intercept[IllegalArgumentException](
      SnapshotLog.write(Seq(("2", "b")).toDF("id", "s"), t, "append",
        mergeSchema = true))
    assert(tpe.getMessage.contains("type"))
  }

  test("change feed null-fills pre-evolution rows to the target schema") {
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite") // v0
    SnapshotLog.write(Seq((2L, "b", 9L)).toDF("id", "s", "x"), t, "append",
      mergeSchema = true) // v1
    val ch = SnapshotLog.readChanges(spark, t, -1L)
      .select("id", "x", "_commit_version").as[(Long, Option[Long], Long)]
      .collect().toSet
    assert(ch == Set((1L, None, 0L), (2L, Some(9L), 1L)))
  }

  test("publish feeds the branch's net diff: append, DV delete, nothing else") {
    val t = mkTable()
    SnapshotLog.write((0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      t, "overwrite", clusterColumn = Some("id"), nFiles = 2) // v0
    Branches.create(spark, t, "wap")
    val b = Branches.path(t, "wap")
    SnapshotLog.write(Seq((100L, "new")).toDF("id", "s"), b, "append")
    SnapshotLog.delete(spark, b, col("id") === 7L) // DV on a surviving file
    Branches.publish(spark, t, "wap") // main v1, op 'publish:wap'
    // the feed must see the WAP batch: one insert, one delete — a
    // silent skip here was the round-11 ADVICE-high hazard
    assert(changes(t, 0L) == Set(
      (100L, "new", "insert", 1L), (7L, "r7", "delete", 1L)))
    // and the incremental path composes: a view refreshed across the
    // publish equals a from-scratch aggregate (consumer-level check)
    val mv = tmpDir("chfeed_pubmv") + "/mv"
    IncrementalView.create(spark, t, mv, Seq("s"), Nil, asOf = Some(0L))
    IncrementalView.refresh(spark, mv)
    assert(IncrementalView.read(spark, mv).where(col("s") === "new").count() === 1)
    assert(IncrementalView.read(spark, mv).where(col("s") === "r7").count() === 0)
  }

  test("adds-only custom op label feeds inserts; removes-bearing label is gated") {
    import org.apache.spark.sql.functions.lit
    val t = mkTable()
    SnapshotLog.write(Seq((1L, "a")).toDF("id", "s"), t, "overwrite") // v0
    SnapshotLog.write(Seq((2L, "b")).toDF("id", "s"), t, "append",
      opLabel = Some("my-ingest:batch7")) // v1: append-shaped custom label
    assert(changes(t, 0L) == Set((2L, "b", "insert", 1L)))
    SnapshotLog.write(Seq((3L, "c")).toDF("id", "s"), t, "overwrite",
      opLabel = Some("mv:9:src:g:")) // v2: overwrite-shaped custom label
    val e = intercept[IllegalArgumentException](changes(t, 1L))
    assert(e.getMessage.contains("allowFullDiff"))
    assert(changes(t, 1L, full = true) == Set(
      (1L, "a", "delete", 2L), (2L, "b", "delete", 2L), (3L, "c", "insert", 2L)))
  }
}
