package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Incrementally-maintained fact⋈dim aggregate: the two-term delta
  * identity V(F',D') − V(F,D) = V(ΔF,D') + V(F,ΔD), signed feeds,
  * pruned fact probe on the dim-change side. The invariant throughout:
  * the view equals a from-scratch join+aggregate at the source heads. */
class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  private def mkBase(): String = tmpDir("joinview")

  /** fact(id, k, x): 12 rows over dim keys 0..3; dim(k, grp). */
  private def seed(base: String): (String, String, String) = {
    val fact = s"$base/fact"; val dim = s"$base/dim"; val view = s"$base/mv"
    SnapshotLog.write(
      (0 until 12).map(i => (i.toLong, (i % 4).toLong, i * 10.0))
        .toDF("id", "k", "x"),
      fact, "overwrite", clusterColumn = Some("k"), nFiles = 4)
    SnapshotLog.write(
      Seq((0L, "even"), (1L, "odd"), (2L, "even"), (3L, "odd")).toDF("dk", "grp"),
      dim, "overwrite")
    JoinView.create(spark, fact, dim, view, "k", "dk", Seq("grp"), Seq("x"))
    (fact, dim, view)
  }

  private def fullRecompute(fact: String, dim: String): Map[String, (Long, Double)] =
    SnapshotLog.read(spark, fact)
      .join(SnapshotLog.read(spark, dim), col("k") === col("dk"))
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("x").as("s"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  private def viewState(view: String): Map[String, (Long, Double)] =
    JoinView.read(spark, view).select("grp", "n_rows", "sum_x")
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("create equals the full join+aggregate") {
    val (fact, dim, view) = seed(mkBase())
    assert(viewState(view) == fullRecompute(fact, dim))
  }

  test("fact append advances via V(ΔF, D′) only — no fact rescan term") {
    val (fact, dim, view) = seed(mkBase())
    SnapshotLog.write(Seq((100L, 1L, 5.0), (101L, 3L, 7.0)).toDF("id", "k", "x"),
      fact, "append")
    JoinView.refresh(spark, view)
    assert(viewState(view) == fullRecompute(fact, dim))
    assert(JoinView.meta(spark, view).factVersion == 1L)
  }

  test("fact DV delete retracts the dead rows from the view") {
    val (fact, dim, view) = seed(mkBase())
    SnapshotLog.delete(spark, fact, col("id") < 4) // one row per dim key dies
    JoinView.refresh(spark, view)
    assert(viewState(view) == fullRecompute(fact, dim))
  }

  test("dim attribute update migrates fact mass between groups") {
    val (fact, dim, view) = seed(mkBase())
    // key 2 flips even → odd: its fact rows must move wholesale
    SnapshotLog.merge(spark, dim, "dk", Seq((2L, "odd")).toDF("dk", "grp"))
    JoinView.refresh(spark, view)
    assert(viewState(view) == fullRecompute(fact, dim))
    assert(JoinView.meta(spark, view).dimVersion == 1L)
  }

  test("both sides change in one interval (the cross-term rides V(ΔF, D′))") {
    val (fact, dim, view) = seed(mkBase())
    SnapshotLog.write(Seq((100L, 2L, 50.0)).toDF("id", "k", "x"), fact, "append")
    SnapshotLog.merge(spark, dim, "dk", Seq((2L, "odd")).toDF("dk", "grp"))
    SnapshotLog.delete(spark, fact, col("id") === 0L)
    JoinView.refresh(spark, view)
    assert(viewState(view) == fullRecompute(fact, dim))
    val m = JoinView.meta(spark, view)
    assert(m.factVersion == 2L && m.dimVersion == 1L)
  }

  test("dim key deletion drops its group mass; empty groups vanish") {
    val (fact, dim, view) = seed(mkBase())
    // kill BOTH odd keys: group 'odd' must disappear from the state
    SnapshotLog.deleteByKeys(spark, dim, "dk", Seq(1L, 3L))
    JoinView.refresh(spark, view)
    val st = viewState(view)
    assert(st == fullRecompute(fact, dim))
    assert(!st.contains("odd"))
  }

  test("refresh with no source movement is a no-op; cursors survive a crash window") {
    val (fact, dim, view) = seed(mkBase())
    val v = SnapshotLog.currentVersion(spark, view)
    assert(JoinView.refresh(spark, view) == v)
    // a re-run over the SAME ranges (simulating a replay after a crash
    // before the view commit landed) converges, never double-applies
    SnapshotLog.write(Seq((100L, 0L, 1.0)).toDF("id", "k", "x"), fact, "append")
    JoinView.refresh(spark, view)
    val once = viewState(view)
    JoinView.refresh(spark, view) // cursor already at head → no-op
    assert(viewState(view) == once)
  }

  test("the dim-change fact probe prunes to may-contain files (clustered fact)") {
    val (fact, dim, view) = seed(mkBase())
    // replicate refresh's V(F, ΔD) probe for one changed key on the
    // 4-file key-clustered fact: zone maps must cut the scan
    val probe = SnapshotLog.readPruned(spark, fact, "k", asOf = Some(0L))
      .where(col("k").isin(2L))
    probe.collect()
    val scanned = probe.queryExecution.executedPlan
      .collect { case s: FileSourceScanExec => s.metrics("numFiles").value }.sum
    assert(scanned < 4, s"probe read $scanned of 4 files — zone maps pruned nothing")
    assert(viewState(view) == fullRecompute(fact, dim)) // and the view is sane
  }

  test("foreign overwrite of the view severs the cursor with a clear error") {
    val (_, _, view) = seed(mkBase())
    SnapshotLog.write(Seq((1L, 1L)).toDF("a", "b"), view, "overwrite")
    val e = intercept[IllegalStateException](JoinView.refresh(spark, view))
    assert(e.getMessage.contains("cursor is lost"))
  }

  test("min/max across the join: fold on insert, joined rescan on retract, migration") {
    val base = mkBase()
    val fact = s"$base/fact"; val dim = s"$base/dim"; val view = s"$base/mv"
    SnapshotLog.write(
      (0 until 12).map(i => (i.toLong, (i % 4).toLong, i * 10.0)).toDF("id", "k", "x"),
      fact, "overwrite", clusterColumn = Some("k"), nFiles = 4)
    SnapshotLog.write(
      Seq((0L, "even"), (1L, "odd"), (2L, "even"), (3L, "odd")).toDF("dk", "grp"),
      dim, "overwrite")
    JoinView.create(spark, fact, dim, view, "k", "dk", Seq("grp"), Seq("x"),
      minMaxCols = Seq("x"))
    def mmState(): Map[String, (Long, Double, Double)] =
      JoinView.read(spark, view).select("grp", "n_rows", "min_x", "max_x")
        .as[(String, Long, Double, Double)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    def fullMm(): Map[String, (Long, Double, Double)] =
      SnapshotLog.read(spark, fact)
        .join(SnapshotLog.read(spark, dim), col("k") === col("dk"))
        .groupBy("grp").agg(count(lit(1)), min("x"), max("x"))
        .as[(String, Long, Double, Double)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(mmState() == fullMm()) // create = full compute

    // insert-only: extrema fold, no retraction
    SnapshotLog.write(Seq((100L, 0L, 500.0)).toDF("id", "k", "x"), fact, "append")
    JoinView.refresh(spark, view)
    assert(mmState() == fullMm())

    // fact DV delete retracts 'even's max (500 @ id=100) and 'odd's max
    // (110 @ id=11): both groups must rescan through the join
    SnapshotLog.delete(spark, fact, col("id") === 100L || col("id") === 11L)
    JoinView.refresh(spark, view)
    assert(mmState() == fullMm())

    // dim migration: dk=0 moves to 'odd' — whole-group extremum mass
    // migrates; the delete side of the old group flags its own rescan
    SnapshotLog.merge(spark, dim, "dk", Seq((0L, "odd")).toDF("dk", "grp"))
    JoinView.refresh(spark, view)
    assert(mmState() == fullMm())

    // dim DV delete drops dk=3: its joined rows leave 'odd'
    SnapshotLog.deleteByKeys(spark, dim, "dk", Seq(3L))
    JoinView.refresh(spark, view)
    assert(mmState() == fullMm())
  }
}
