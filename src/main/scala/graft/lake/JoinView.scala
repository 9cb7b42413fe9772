package graft.lake

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate over a FACT ⋈ DIM equi-join —
  * the star-schema dashboard (fact rows keyed into a dimension,
  * grouped by dimension/fact attributes, SUM/COUNT measures), kept
  * materialized across changes to EITHER side.
  *
  * [[IncrementalView]] maintains single-table aggregates; real report
  * queries join first (revenue by customer segment, tokens by source
  * domain). Recomputing such a view at 100 TB re-reads the fact table;
  * this module instead applies the classic delta-join identity over
  * the snapshot format's signed change feeds (insert = +1, delete =
  * −1, so each side is a multiset with weights and the join's weight
  * is the product):
  *
  *   V(F, D) is linear in each side, hence with F' = F + ΔF,
  *   D' = D + ΔD:
  *     V(F', D') − V(F, D) = V(ΔF, D') + V(F, ΔD)
  *   (the ΔF⋈ΔD cross-term belongs to V(ΔF, D') because D' already
  *   contains ΔD — two joins per refresh, not three).
  *
  * Refresh cost, term by term:
  *  - `V(ΔF, D')`: the fact-side change rows (O(changed rows), the
  *    feed's contract) joined against the CURRENT dim, with the dim
  *    probe zone-map-pruned to the batch's join keys — on a dim
  *    clustered by its key, O(affected dim files), never a fact scan.
  *  - `V(F, ΔD)`: the OLD fact joined against the dim-side change
  *    rows. The fact is read via [[SnapshotLog.readPruned]] with an
  *    `IN (changed dim keys)` predicate — the changed-key set is
  *    CDC-batch-sized by contract (collected like [[SnapshotLog.merge]]'s
  *    prune list), so on a fact table clustered on the join key the
  *    scan planning-time-prunes to the may-contain files: a dim update
  *    touches O(affected fact files), not 100 TB. Unclustered fact =
  *    full scan of that one term (sound, just unhelpful) — cluster the
  *    fact on its foreign key, which is also the right layout for the
  *    serving join.
  *  - state merge: aggregate-sized, like the single-table view.
  *
  * The view state is a snapshot table; BOTH source cursors (fact
  * version, dim version) are stored in the commit's op label, so a
  * refresh is atomic-with-its-cursor and a crashed refresh re-reads
  * the same change ranges. Same aggregate class as
  * [[IncrementalView]]: COUNT/SUM (commutative groups) plus MIN/MAX
  * via rescan-on-retract over the joined recompute of flagged groups;
  * same float caveat (pin decimals for bit-reproducible audits);
  * groups whose row count reaches zero are dropped.
  */
object JoinView {

  /** Persisted coordinates: the two sources, the version of each the
    * state reflects, the equi-join keys, and the aggregate spec.
    * `minMaxCols` maintain MIN/MAX over the JOINED measure — not
    * subtractable, so deletes that may retract a group's extremum
    * trigger a bounded joined recompute of exactly those groups (see
    * [[refresh]]). */
  final case class Meta(fact: String, factVersion: Long, dim: String,
                        dimVersion: Long, factKey: String, dimKey: String,
                        groupCols: Seq[String], sumCols: Seq[String],
                        minMaxCols: Seq[String] = Nil)

  private def enc(s: String) = URLEncoder.encode(s, StandardCharsets.UTF_8.name())
  private def dec(s: String) = URLDecoder.decode(s, StandardCharsets.UTF_8.name())

  private def label(m: Meta): String =
    s"mvj:${m.factVersion}:${m.dimVersion}:${enc(m.fact)}:${enc(m.dim)}:" +
      s"${enc(m.factKey)}:${enc(m.dimKey)}:${m.groupCols.map(enc).mkString(",")}:" +
      m.sumCols.map(enc).mkString(",") +
      (if (m.minMaxCols.isEmpty) "" else ":" + m.minMaxCols.map(enc).mkString(","))

  private def parseLabel(op: String): Option[Meta] = {
    def split(s: String) = if (s.isEmpty) Nil else s.split(',').toSeq.map(dec)
    op.split(':') match {
      case Array("mvj", fv, dv, f, d, fk, dk, g, s, mm) =>
        Some(Meta(dec(f), fv.toLong, dec(d), dv.toLong, dec(fk), dec(dk),
          g.split(',').toSeq.map(dec), split(s), split(mm)))
      case Array("mvj", fv, dv, f, d, fk, dk, g, s) =>
        Some(Meta(dec(f), fv.toLong, dec(d), dv.toLong, dec(fk), dec(dk),
          g.split(',').toSeq.map(dec), split(s)))
      case Array("mvj", fv, dv, f, d, fk, dk, g) => // counts only
        Some(Meta(dec(f), fv.toLong, dec(d), dv.toLong, dec(fk), dec(dk),
          g.split(',').toSeq.map(dec), Nil))
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
      s"$view head was not committed by JoinView (op='$op') — " +
        "the cursor is lost; recreate the view"))
  }

  /** The view's defining aggregate over an (already joined) frame with
    * a signed weight column: n_rows = Σw, sum_<c> = Σ w·c, and for
    * min/max columns the INSERT-side extrema (w > 0) under the state
    * names plus, when `emitDeletes`, the DELETE-side extrema (w < 0)
    * as `_dmin_<c>`/`_dmax_<c>` — the retraction probes. A full
    * (re)compute is the same expression with w ≡ 1. */
  private def weightedAgg(joined: DataFrame, groupCols: Seq[String],
                          sumCols: Seq[String], w: org.apache.spark.sql.Column,
                          minMaxCols: Seq[String] = Nil,
                          emitDeletes: Boolean = false): DataFrame = {
    val aggs = sum(w).cast("long").as("n_rows") +:
      (sumCols.map(c => sum(col(c) * w).as(s"sum_$c")) ++
        minMaxCols.flatMap(c =>
          Seq(min(when(w > 0, col(c))).as(s"min_$c"),
            max(when(w > 0, col(c))).as(s"max_$c")) ++
            (if (emitDeletes) Seq(
              min(when(w < 0, col(c))).as(s"_dmin_$c"),
              max(when(w < 0, col(c))).as(s"_dmax_$c")) else Nil)))
    joined.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def joined(fact: DataFrame, dim: DataFrame, m: Meta): DataFrame =
    fact.join(dim, fact(m.factKey) === dim(m.dimKey))

  /** Create (or recreate) the view from a FULL join+aggregate of the
    * sources at (`factAsOf`, `dimAsOf`) (default: each head) — the
    * last fact scan this aggregate ever needs. */
  def create(spark: SparkSession, fact: String, dim: String, view: String,
             factKey: String, dimKey: String,
             groupCols: Seq[String], sumCols: Seq[String],
             factAsOf: Option[Long] = None, dimAsOf: Option[Long] = None,
             minMaxCols: Seq[String] = Nil): Long = {
    require(groupCols.nonEmpty, "need at least one group column")
    val fv = factAsOf.getOrElse(SnapshotLog.currentVersion(spark, fact))
    val dv = dimAsOf.getOrElse(SnapshotLog.currentVersion(spark, dim))
    val m = Meta(fact, fv, dim, dv, factKey, dimKey, groupCols, sumCols, minMaxCols)
    val state = weightedAgg(
      joined(SnapshotLog.read(spark, fact, Some(fv)),
        SnapshotLog.read(spark, dim, Some(dv)), m),
      groupCols, sumCols, lit(1L), minMaxCols)
    SnapshotLog.write(state, view, "overwrite", opLabel = Some(label(m)))
  }

  /** Advance the view to both source heads. No-op when neither source
    * moved. `allowFullDiff` passes through to the change feeds (for
    * table-sized overwrite/rollback commits [[create]] is usually
    * cheaper than the diff). `maxProbeKeys` bounds the driver-held key
    * lists that prune each term's probe scan: a change batch with more
    * distinct join keys falls back to an unpruned probe of that term
    * (sound — the join itself restricts to the keys — just unpruned,
    * the right trade for a backfill-sized batch). */
  def refresh(spark: SparkSession, view: String,
              allowFullDiff: Boolean = false,
              maxProbeKeys: Int = 100000): Long = {
    val m = meta(spark, view)
    val fHead = SnapshotLog.currentVersion(spark, m.fact)
    val dHead = SnapshotLog.currentVersion(spark, m.dim)
    require(fHead >= m.factVersion && dHead >= m.dimVersion,
      s"a source is behind the view's cursor (fact v$fHead < v${m.factVersion} " +
        s"or dim v$dHead < v${m.dimVersion}) — history replaced; recreate the view")
    if (fHead == m.factVersion && dHead == m.dimVersion)
      return SnapshotLog.currentVersion(spark, view)

    val sign = when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    val deltas = Seq.newBuilder[DataFrame]

    /** The batch's distinct join keys if there are ≤ maxProbeKeys of
      * them (the CDC contract's normal case — the same driver-held
      * prune-list class as [[SnapshotLog.merge]]'s affected keys),
      * None for a backfill-sized batch. */
    def probeKeys(batch: DataFrame, keyCol: String): Option[Seq[Any]] = {
      val ks = batch.select(keyCol).distinct().limit(maxProbeKeys + 1)
        .collect().map(_.get(0)).toSeq
      if (ks.size > maxProbeKeys) None else Some(ks)
    }

    // V(ΔF, D′): fact-side change rows against the CURRENT dim — the
    // dim probe is zone-map-pruned to the batch's keys, so a clustered
    // dim is read at O(affected files), not table size
    if (fHead > m.factVersion) {
      val dF = SnapshotLog.readChanges(spark, m.fact, m.factVersion, Some(fHead),
          allowFullDiff)
        .withColumn("_w", sign).drop("_change_type", "_commit_version")
      val dNew = probeKeys(dF, m.factKey) match {
        case Some(ks) if ks.isEmpty => null // empty change set: no term
        case Some(ks) =>
          SnapshotLog.readPruned(spark, m.dim, m.dimKey, asOf = Some(dHead))
            .where(col(m.dimKey).isin(ks: _*))
        case None => SnapshotLog.read(spark, m.dim, Some(dHead))
      }
      if (dNew != null)
        deltas += weightedAgg(joined(dF, dNew, m), m.groupCols, m.sumCols,
          col("_w"), m.minMaxCols, emitDeletes = true)
    }

    // V(F, ΔD): OLD fact (pruned to the changed dim keys) against the
    // dim-side change rows
    if (dHead > m.dimVersion) {
      val dD = SnapshotLog.readChanges(spark, m.dim, m.dimVersion, Some(dHead),
          allowFullDiff)
        .withColumn("_w", sign).drop("_change_type", "_commit_version")
      val fOld = probeKeys(dD, m.dimKey) match {
        case Some(ks) if ks.isEmpty => null
        case Some(ks) =>
          SnapshotLog.readPruned(spark, m.fact, m.factKey, asOf = Some(m.factVersion))
            .where(col(m.factKey).isin(ks: _*))
        case None => SnapshotLog.read(spark, m.fact, Some(m.factVersion))
      }
      if (fOld != null)
        deltas += weightedAgg(joined(fOld, dD, m), m.groupCols, m.sumCols,
          col("_w"), m.minMaxCols, emitDeletes = true)
    }

    val cur = SnapshotLog.read(spark, view)
    val stateCols: Seq[(String, org.apache.spark.sql.types.DataType)] =
      cur.schema.fields.toSeq.map(f => f.name -> f.dataType)
    def conformed(df: DataFrame): DataFrame =
      df.select(stateCols.map { case (n, t) => col(n).cast(t).as(n) }: _*)
    // delta frames carry the delete-side extrema probes beside the
    // state columns; the state side rides with them null-filled
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
    var merged = (nullDels(conformed(cur)) +: deltas.result().map(conformDelta))
      .reduce(_ unionByName _)
      .groupBy(m.groupCols.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
      .where(col("n_rows") =!= 0)

    if (m.minMaxCols.nonEmpty) {
      // RESCAN-ON-RETRACT over the JOINED recompute: a delete-side value
      // that TIES the group's candidate extremum may have been its last
      // witness — exactly those groups are re-aggregated from fact⋈dim
      // at the new heads, semi-joined (null-safely: NULL is a real
      // group) to the flagged set. The tie test also self-corrects the
      // two-term delta algebra's phantom pairs: a cross-term insert that
      // becomes the candidate extremum always has a matching delete of
      // the same value in the other term, so it flags its own group.
      // Cost: one join of the sources restricted to the flagged groups'
      // rows — paid only when a retraction happened, never on the
      // insert-only fast path.
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
        val full = joined(SnapshotLog.read(spark, m.fact, Some(fHead)),
          SnapshotLog.read(spark, m.dim, Some(dHead)), m)
        val semiCond = m.groupCols.map(c => full(c) <=> gdf(c)).reduce(_ && _)
        val re = full.join(broadcast(gdf), semiCond, "left_semi")
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
    SnapshotLog.write(conformed(merged), view, "overwrite",
      opLabel = Some(label(m.copy(factVersion = fHead, dimVersion = dHead))))
  }

  /** Read the view's current state: (groupCols…, n_rows, sum_<c>…,
    * min_<c>…, max_<c>…) plus DERIVED `avg_<c>` per sum column — AVG
    * is exactly SUM/COUNT, so it rides the maintained pair with no
    * state of its own. MIN/MAX (when declared in `minMaxCols`) are
    * maintained by rescan-on-retract over the joined recompute of the
    * flagged groups — see [[refresh]]. */
  def read(spark: SparkSession, view: String): DataFrame = {
    val m = meta(spark, view)
    m.sumCols.foldLeft(SnapshotLog.read(spark, view))((df, c) =>
      df.withColumn(s"avg_$c",
        col(s"sum_$c").cast("double") / col("n_rows").cast("double")))
  }
}
