package graft.lake

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate over a
  * [[SnapshotLog]] table, driven by its row-level change feed.
  *
  * The reference recomputes every query from the live files
  * (lakeshack/lakeshack.py:156-233 plans the full scan each call); a
  * 100 TB curation pipeline instead keeps its dashboard/report
  * aggregates MATERIALIZED and pays O(changed rows) per refresh:
  * `refresh` reads [[SnapshotLog.readChanges]] since the last applied
  * source version, folds inserts as +1/+x and deletes as −1/−x
  * (SUM/COUNT are commutative groups — the only aggregate class this
  * maintains; MIN/MAX are not subtractable and need a recompute),
  * merges the per-group deltas into the state with one aggregate over
  * (state ∪ delta), drops groups whose row count hits zero, and
  * commits the new state. The view is ITSELF a snapshot table, so
  * refreshes are atomic, versioned, time-travelable, and crash-safe
  * (a crashed refresh leaves the old head; the re-run re-reads the
  * same change range — the cursor advances only WITH the commit,
  * because it is STORED in the commit's op label).
  *
  * State size is aggregate-sized (distinct groups), so the
  * state-rewrite per refresh is NOT a function of source bytes; the
  * change-feed read is O(changed rows). Exactness: refresh order
  * cannot perturb integral-valued doubles, longs, or decimals (group
  * addition is exact); free-floating doubles may differ from a full
  * recompute by float reassociation — pin decimals for
  * bit-reproducible audits.
  *
  * Maintain the view ONLY through this object: the source-version
  * cursor lives in the view's own commit history (`mv:` op labels),
  * which a foreign overwrite would sever (refresh then refuses with a
  * clear error rather than double-applying).
  */
object IncrementalView {

  /** The view's persisted coordinates: source table, the source version
    * the state reflects, and the aggregate spec. */
  final case class Meta(src: String, srcVersion: Long,
                        groupCols: Seq[String], sumCols: Seq[String])

  private def enc(s: String) = URLEncoder.encode(s, StandardCharsets.UTF_8.name())
  private def dec(s: String) = URLDecoder.decode(s, StandardCharsets.UTF_8.name())

  private def label(m: Meta): String =
    s"mv:${m.srcVersion}:${enc(m.src)}:${m.groupCols.map(enc).mkString(",")}:" +
      m.sumCols.map(enc).mkString(",")

  private def parseLabel(op: String): Option[Meta] = op.split(':') match {
    case Array("mv", v, src, g, s) =>
      Some(Meta(dec(src), v.toLong, g.split(',').toSeq.map(dec),
        if (s.isEmpty) Nil else s.split(',').toSeq.map(dec)))
    case Array("mv", v, src, g) => // no sum columns: counts only
      Some(Meta(dec(src), v.toLong, g.split(',').toSeq.map(dec), Nil))
    case _ => None
  }

  /** The view's meta, from the HEAD commit's op label. */
  def meta(spark: SparkSession, view: String): Meta = {
    val head = SnapshotLog.currentVersion(spark, view)
    require(head >= 0, s"no view at $view")
    val op = SnapshotLog.history(spark, view)
      .select("op").limit(1).collect()(0).getString(0)
    parseLabel(op).getOrElse(throw new IllegalStateException(
      s"$view head was not committed by IncrementalView (op='$op') — " +
        "the cursor is lost; recreate the view"))
  }

  /** One full aggregate over `df` — the same expression create and the
    * equivalence contract use: per group, `n_rows` = COUNT(*) and
    * `sum_<c>` = SUM(c) for each sum column. */
  private def fullAgg(df: DataFrame, groupCols: Seq[String],
                      sumCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      sumCols.map(c => sum(col(c)).as(s"sum_$c"))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Create (or recreate) the view from a FULL aggregate of the source
    * at `asOf` (default: head). One table scan — the last one this
    * aggregate ever needs. */
  def create(spark: SparkSession, src: String, view: String,
             groupCols: Seq[String], sumCols: Seq[String],
             asOf: Option[Long] = None): Long = {
    require(groupCols.nonEmpty, "need at least one group column")
    val srcV = asOf.getOrElse(SnapshotLog.currentVersion(spark, src))
    val state = fullAgg(SnapshotLog.read(spark, src, Some(srcV)), groupCols, sumCols)
    SnapshotLog.write(state, view, "overwrite",
      opLabel = Some(label(Meta(src, srcV, groupCols, sumCols))))
  }

  /** Advance the view to the source head: O(changed rows) read +
    * aggregate-sized state merge, committed atomically with the new
    * cursor. No-op (returns the current view version) when the source
    * has not moved. `allowFullDiff` is passed through to the change
    * feed for table-sized overwrite/rollback commits — for those,
    * [[create]] (one clean full scan) is usually cheaper than the diff. */
  def refresh(spark: SparkSession, view: String,
              allowFullDiff: Boolean = false): Long = {
    val m = meta(spark, view)
    val srcHead = SnapshotLog.currentVersion(spark, m.src)
    require(srcHead >= m.srcVersion,
      s"${m.src} is at v$srcHead, behind the view's cursor v${m.srcVersion} — " +
        "the source history was replaced; recreate the view")
    if (srcHead == m.srcVersion) return SnapshotLog.currentVersion(spark, view)

    val ch = SnapshotLog.readChanges(spark, m.src, m.srcVersion, Some(srcHead),
      allowFullDiff)
    val sign = when(col("_change_type") === "insert", lit(1)).otherwise(lit(-1))
    val deltaAggs = sum(sign).as("n_rows") +:
      m.sumCols.map(c => sum(col(c) * sign).as(s"sum_$c"))
    val delta = ch.groupBy(m.groupCols.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)

    val cur = SnapshotLog.read(spark, view)
    val stateCols: Seq[(String, org.apache.spark.sql.types.DataType)] =
      cur.schema.fields.toSeq.map(f => f.name -> f.dataType)
    def conformed(df: DataFrame): DataFrame =
      df.select(stateCols.map { case (n, t) => col(n).cast(t).as(n) }: _*)
    val mergeAggs = sum(col("n_rows")).as("n_rows") +:
      m.sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))
    val merged = conformed(cur).unionByName(conformed(delta))
      .groupBy(m.groupCols.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
      .where(col("n_rows") =!= 0)
    // cast the re-sum back to the state types (sum widens decimals) so
    // the schema is a fixed point across refreshes, not a widening drift
    SnapshotLog.write(conformed(merged), view, "overwrite",
      opLabel = Some(label(m.copy(srcVersion = srcHead))))
  }

  /** Read the view's current state: (groupCols…, n_rows, sum_<c>…). */
  def read(spark: SparkSession, view: String): DataFrame =
    SnapshotLog.read(spark, view)
}
