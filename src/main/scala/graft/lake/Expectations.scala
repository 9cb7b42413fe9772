package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations enforced at ingest — the
  * constraint layer the reference leaves entirely to the caller (its
  * `Metastore.update` ingests whatever the parquet holds,
  * lakeshack/metastore.py:240-330). Modeled on the public
  * expectations surface of Delta Live Tables / Great Expectations:
  * each expectation is a named boolean predicate with an enforcement
  * mode, and a batch is split row-by-row into the main table and a
  * quarantine table in one gated commit pair.
  *
  *  - [[Expect.Warn]]  — violating rows STAY in the main table; the
  *    violation is counted (and carried in the quarantine table's
  *    `_violations` only if the row was dropped by another rule).
  *  - [[Expect.Drop]]  — violating rows are diverted to the quarantine
  *    table with the full list of failed expectation names.
  *  - [[Expect.Fail]]  — any violation aborts the whole batch before
  *    either table is touched (exactly-once: nothing to roll back).
  *
  * A predicate that evaluates to NULL is a VIOLATION (`coalesce(p,
  * false)`): "price > 0" must not wave through a null price — the
  * DLT/SQL-CHECK discrepancy every data engineer gets bitten by once,
  * resolved here to the conservative side.
  *
  * At 100 TB the gate is a narrow map (one `array_compact` of
  * conditional literals per row, codegen'd, no UDF) over the incoming
  * BATCH — never the table; the per-expectation counts are one
  * batch-sized aggregate; the two appends go through
  * [[SnapshotLog.appendBatch]] under derived tokens, so a crashed or
  * replayed ingest converges: re-running the same (batch, token)
  * recomputes the same split and each half commits at most once. */
object Expectations {

  sealed trait Mode
  object Expect {
    case object Warn extends Mode
    case object Drop extends Mode
    case object Fail extends Mode
  }

  /** One named rule. `predicate` must be true for the row to pass. */
  final case class Expectation(name: String, predicate: Column, mode: Mode = Expect.Drop)

  /** Per-batch enforcement outcome. Versions are -1 when the side
    * committed nothing (no rows, or token already applied). */
  final case class Report(mainVersion: Long, quarantineVersion: Long,
                          nClean: Long, nQuarantined: Long,
                          violations: Map[String, Long])

  final class BatchRejected(val counts: Map[String, Long])
    extends RuntimeException(
      s"Fail-mode expectation(s) violated, batch aborted: " +
        counts.map { case (n, c) => s"$n=$c" }.mkString(", "))

  /** Adds `_violations`: the names of every expectation the row fails
    * (all modes — the count surface), as a sorted array so downstream
    * hashing is order-stable. */
  def annotate(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "at least one expectation required")
    // case-insensitive uniqueness: Spark's default resolver conflates
    // names differing only by case, which would corrupt the per-rule
    // counts rather than error
    require(expectations.map(_.name.toLowerCase).distinct.size == expectations.size,
      "expectation names must be unique (case-insensitively)")
    // '_total' is ingest's internal count alias and '_violations' the
    // annotation column — an expectation named either would silently
    // collide with them in the aggregate row / output schema
    expectations.map(_.name)
      .find(n => n.equalsIgnoreCase("_total") || n.equalsIgnoreCase("_violations"))
      .foreach(n => throw new IllegalArgumentException(
        s"expectation name '$n' is reserved"))
    require(!df.columns.contains("_violations"),
      "input already has a _violations column")
    val marks = expectations.map(e =>
      when(!coalesce(e.predicate, lit(false)), lit(e.name)))
    df.withColumn("_violations", array_sort(array_compact(array(marks: _*))))
  }

  /** Gates `df` through `expectations` and commits the clean rows to
    * `table` and the dropped rows (input schema + `_violations`) to
    * `quarantine`, both via exactly-once batch appends under tokens
    * derived from `batchToken` — a replay of the same token commits
    * nothing twice on either side. The batch is persisted for the
    * three passes (count, clean append, quarantine append) and
    * unpersisted before returning. */
  def ingest(spark: SparkSession, df: DataFrame, table: String,
             quarantine: String, expectations: Seq[Expectation],
             batchToken: String, clusterColumn: Option[String] = None,
             nFiles: Int = 8): Report = {
    val ann = annotate(df, expectations).persist()
    try {
      val countCols = expectations.map(e =>
        sum(when(array_contains(col("_violations"), e.name), 1L).otherwise(0L))
          .as(e.name)) :+ count(lit(1)).as("_total")
      val row = ann.agg(countCols.head, countCols.tail: _*).collect()(0)
      val counts = expectations.map(e =>
        e.name -> row.getAs[Long](e.name)).toMap
      val failed = expectations
        .filter(e => e.mode == Expect.Fail && counts(e.name) > 0)
      if (failed.nonEmpty)
        throw new BatchRejected(failed.map(e => e.name -> counts(e.name)).toMap)

      val dropNames = expectations.collect {
        case Expectation(n, _, Expect.Drop) => n }
      val isDropped =
        if (dropNames.isEmpty) lit(false)
        else arrays_overlap(col("_violations"),
          array(dropNames.map(lit(_)): _*))
      val clean = ann.where(!isDropped).drop("_violations")
      val quar = ann.where(isDropped)
      val nQuar = dropNames.headOption.map(_ => quar.count()).getOrElse(0L)
      val nClean = row.getAs[Long]("_total") - nQuar
      val vMain =
        if (nClean > 0)
          SnapshotLog.appendBatch(clean, table, s"$batchToken-clean",
            clusterColumn, nFiles)
        else -1L
      val vQuar =
        if (nQuar > 0)
          SnapshotLog.appendBatch(quar, quarantine, s"$batchToken-quar",
            clusterColumn, nFiles)
        else -1L
      Report(vMain, vQuar, nClean, nQuar, counts)
    } finally ann.unpersist()
  }
}
