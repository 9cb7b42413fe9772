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
  * (SUM/COUNT are commutative groups; AVG is derived from the pair at
  * read time; MIN/MAX are NOT subtractable, so they fold inserts for
  * free and re-aggregate only the groups whose extremum a delete
  * retracted — rescan-on-retract, bounded by the CDC batch),
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
    * the state reflects, and the aggregate spec. `minMaxCols` maintain
    * MIN/MAX — NOT subtractable like SUM/COUNT, so deletes that retract
    * a group's extremum trigger a bounded per-group rescan (see
    * [[refresh]]). */
  final case class Meta(src: String, srcVersion: Long,
                        groupCols: Seq[String], sumCols: Seq[String],
                        minMaxCols: Seq[String] = Nil)

  private def enc(s: String) = URLEncoder.encode(s, StandardCharsets.UTF_8.name())
  private def dec(s: String) = URLDecoder.decode(s, StandardCharsets.UTF_8.name())

  private def label(m: Meta): String =
    s"mv:${m.srcVersion}:${enc(m.src)}:${m.groupCols.map(enc).mkString(",")}:" +
      m.sumCols.map(enc).mkString(",") +
      (if (m.minMaxCols.isEmpty) "" else ":" + m.minMaxCols.map(enc).mkString(","))

  private def parseLabel(op: String): Option[Meta] = {
    def split(s: String) = if (s.isEmpty) Nil else s.split(',').toSeq.map(dec)
    op.split(':') match {
      case Array("mv", v, src, g, s, mm) =>
        Some(Meta(dec(src), v.toLong, g.split(',').toSeq.map(dec), split(s), split(mm)))
      case Array("mv", v, src, g, s) =>
        Some(Meta(dec(src), v.toLong, g.split(',').toSeq.map(dec), split(s)))
      case Array("mv", v, src, g) => // no sum columns: counts only
        Some(Meta(dec(src), v.toLong, g.split(',').toSeq.map(dec), Nil))
      case _ => None
    }
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
    * equivalence contract use: per group, `n_rows` = COUNT(*),
    * `sum_<c>` = SUM(c), and `min_<c>`/`max_<c>` for min/max columns. */
  private def fullAgg(df: DataFrame, groupCols: Seq[String],
                      sumCols: Seq[String],
                      minMaxCols: Seq[String] = Nil): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      (sumCols.map(c => sum(col(c)).as(s"sum_$c")) ++
        minMaxCols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Create (or recreate) the view from a FULL aggregate of the source
    * at `asOf` (default: head). One table scan — the last one this
    * aggregate ever needs. */
  def create(spark: SparkSession, src: String, view: String,
             groupCols: Seq[String], sumCols: Seq[String],
             asOf: Option[Long] = None,
             minMaxCols: Seq[String] = Nil): Long = {
    require(groupCols.nonEmpty, "need at least one group column")
    val srcV = asOf.getOrElse(SnapshotLog.currentVersion(spark, src))
    val state = fullAgg(SnapshotLog.read(spark, src, Some(srcV)), groupCols,
      sumCols, minMaxCols)
    SnapshotLog.write(state, view, "overwrite",
      opLabel = Some(label(Meta(src, srcV, groupCols, sumCols, minMaxCols))))
  }

  /** Advance the view to the source head: O(changed rows) read +
    * aggregate-sized state merge, committed atomically with the new
    * cursor. No-op (returns the current view version) when the source
    * has not moved. `allowFullDiff` is passed through to the change
    * feed for table-sized overwrite/rollback commits — for those,
    * [[create]] (one clean full scan) is usually cheaper than the diff.
    *
    * MIN/MAX maintenance (rescan-on-retract): inserts fold in for free
    * (`min(cur_min, batch_min)`); a DELETE whose value TIES the group's
    * candidate extremum may have been its last witness, so exactly
    * those groups are re-aggregated from the source head — filtered by
    * a broadcast semi-join on the (CDC-bounded) flagged group set, with
    * a pushed `isin` when the group key is one column so a clustered
    * source prunes files. Deletes strictly inside the range never
    * rescan. Cost: O(changed rows) + O(rows of retracted groups),
    * never a full source scan. */
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
    val isIns = col("_change_type") === "insert"
    val sign = when(isIns, lit(1)).otherwise(lit(-1))
    val deltaAggs = sum(sign).as("n_rows") +:
      (m.sumCols.map(c => sum(col(c) * sign).as(s"sum_$c")) ++
        m.minMaxCols.flatMap(c => Seq(
          min(when(isIns, col(c))).as(s"min_$c"),
          max(when(isIns, col(c))).as(s"max_$c"),
          min(when(!isIns, col(c))).as(s"_dmin_$c"),
          max(when(!isIns, col(c))).as(s"_dmax_$c"))))
    val delta = ch.groupBy(m.groupCols.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)

    val cur = SnapshotLog.read(spark, view)
    val stateCols: Seq[(String, org.apache.spark.sql.types.DataType)] =
      cur.schema.fields.toSeq.map(f => f.name -> f.dataType)
    def conformed(df: DataFrame): DataFrame =
      df.select(stateCols.map { case (n, t) => col(n).cast(t).as(n) }: _*)
    // the state side carries no delete marks; the delta side's min/max
    // columns are its INSERT extrema (same names, so the union folds)
    def conformDelta(df: DataFrame): DataFrame =
      df.select(stateCols.map { case (n, t) => col(n).cast(t).as(n) } ++
        m.minMaxCols.flatMap(c => Seq(col(s"_dmin_$c"), col(s"_dmax_$c"))): _*)
    def nullDels(df: DataFrame): DataFrame =
      m.minMaxCols.foldLeft(df)((d, c) => d
        .withColumn(s"_dmin_$c", lit(null).cast(cur.schema(s"min_$c").dataType))
        .withColumn(s"_dmax_$c", lit(null).cast(cur.schema(s"max_$c").dataType)))
    val mergeAggs = sum(col("n_rows")).as("n_rows") +:
      (m.sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
        m.minMaxCols.flatMap(c => Seq(
          min(col(s"min_$c")).as(s"min_$c"),
          max(col(s"max_$c")).as(s"max_$c"),
          min(col(s"_dmin_$c")).as(s"_dmin_$c"),
          max(col(s"_dmax_$c")).as(s"_dmax_$c"))))
    var merged = nullDels(conformed(cur)).unionByName(conformDelta(delta))
      .groupBy(m.groupCols.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
      .where(col("n_rows") =!= 0)

    if (m.minMaxCols.nonEmpty) {
      // retraction check: a deleted value ≤ the candidate min (or ≥ the
      // candidate max) may have been its last witness → rescan that
      // group from the source head; strict insiders never rescan
      val retract = m.minMaxCols.map(c =>
        coalesce(col(s"_dmin_$c") <= col(s"min_$c"), lit(false)) ||
          coalesce(col(s"_dmax_$c") >= col(s"max_$c"), lit(false)))
        .reduce(_ || _)
      val flagged = merged.where(retract).select(m.groupCols.map(col): _*)
        .collect() // CDC-bounded: groups whose extremum a delete touched
      if (flagged.nonEmpty) {
        val gSchema = org.apache.spark.sql.types.StructType(
          m.groupCols.map(c => cur.schema(c)))
        val gdf = spark.createDataFrame(
          spark.sparkContext.parallelize(flagged.toSeq, 1), gSchema)
        var src = SnapshotLog.read(spark, m.src, Some(srcHead))
        if (m.groupCols.size == 1 && flagged.length <= 10000) {
          // groupBy treats NULL as a real group, but `isin` never
          // matches it — OR an explicit isNull arm in when the flagged
          // set carries the NULL group (both arms push down)
          val (nullKeys, vs) = flagged.toSeq.partition(_.isNullAt(0))
          val key = col(m.groupCols.head)
          val in = if (vs.isEmpty) lit(false) else key.isin(vs.map(_.get(0)): _*)
          src = src.where(if (nullKeys.nonEmpty) in || key.isNull else in)
        }
        // NULL-SAFE equality (<=>) throughout: a retracted extremum of
        // the NULL group must rescan and land back on its state row —
        // plain `=` (what a using-columns join builds) drops it and
        // leaves a stale min/max in the view
        val semiCond = m.groupCols.map(c => src(c) <=> gdf(c)).reduce(_ && _)
        val re = src.join(broadcast(gdf), semiCond, "left_semi")
          .groupBy(m.groupCols.map(col): _*)
          .agg(max(lit(true)).as("_rescanned"),
            m.minMaxCols.flatMap(c => Seq(
              min(col(c)).as(s"_remin_$c"), max(col(c)).as(s"_remax_$c"))): _*)
        val reCols = m.groupCols.indices.map(i => s"_rg_$i")
        val re2 = m.groupCols.zip(reCols).foldLeft(re) {
          case (d, (c, rc)) => d.withColumnRenamed(c, rc) }
        val joinCond = m.groupCols.zip(reCols)
          .map { case (c, rc) => col(c) <=> col(rc) }.reduce(_ && _)
        merged = merged.join(broadcast(re2), joinCond, "left").drop(reCols: _*)
        for (c <- m.minMaxCols) merged = merged
          .withColumn(s"min_$c", when(col("_rescanned"), col(s"_remin_$c"))
            .otherwise(col(s"min_$c")))
          .withColumn(s"max_$c", when(col("_rescanned"), col(s"_remax_$c"))
            .otherwise(col(s"max_$c")))
      }
    }
    // cast the re-sum back to the state types (sum widens decimals) so
    // the schema is a fixed point across refreshes, not a widening drift
    SnapshotLog.write(conformed(merged), view, "overwrite",
      opLabel = Some(label(m.copy(srcVersion = srcHead))))
  }

  /** Read the view's current state: (groupCols…, n_rows, sum_<c>…,
    * min_<c>…, max_<c>…) plus DERIVED `avg_<c>` for every sum column —
    * AVG is exactly SUM/COUNT, so it needs no state of its own and is
    * always as fresh as the pair it divides. */
  def read(spark: SparkSession, view: String): DataFrame = {
    val m = meta(spark, view)
    m.sumCols.foldLeft(SnapshotLog.read(spark, view))((df, c) =>
      df.withColumn(s"avg_$c",
        col(s"sum_$c").cast("double") / col("n_rows").cast("double")))
  }
}
