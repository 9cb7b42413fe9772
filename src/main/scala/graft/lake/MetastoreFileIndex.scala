package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources._
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._

/** Transparent zone-map pruning: a Catalyst `FileIndex` that consults
  * the Metastore's per-file [min,max] intervals when the planner asks
  * which files a scan must read.
  *
  * `Lakeshack.query` prunes *before plan construction* (SURVEY.md §4) —
  * faithful to the reference's explicit two-step flow
  * (lakeshack/metastore.py:414-481 then lakeshack.py:550-557). This
  * class is the Spark-first finish: Catalyst hands every scan's pushed
  * data filters to `FileIndex.listFiles`, so ANY query over the table —
  * `spark.sql` text, DataFrame ops, a join probe — skips non-matching
  * files without knowing the Metastore exists. The reference cannot
  * express this layering (its host has no optimizer to hook).
  *
  * Pruning semantics are exactly Metastore.prune's (reference O8,
  * metastore.py:444-467), extended to the predicate shapes Catalyst
  * actually pushes: =, IN/INSET, >, >=, <, <= (each one-sided, as in the
  * reference), AND/OR recursion, literal-on-either-side. Anything else —
  * unknown column, cast-wrapped attribute, UDF — keeps the file:
  * pruning may produce false positives, never false negatives
  * (SURVEY.md §2.3); the scan filter re-applies every predicate.
  *
  * Scale: intervals live on the driver (one entry per file — ~100k files
  * is MBs), mirroring the reference's driver-side metastore DB round
  * trip; evaluation is files × conjuncts literal comparisons per query,
  * no I/O, no footer reads.
  */
class MetastoreFileIndex(
    base: FileIndex,
    statsSource: () => DataFrame,
    conf: Option[org.apache.hadoop.conf.Configuration] = None) extends FileIndex {

  def this(base: FileIndex, stats: DataFrame) = this(base, () => stats)

  /** Snapshot of the stats table. IMMUTABLE-FILES contract: a file's
    * bounds are fixed at harvest; a file rewritten IN PLACE after its
    * stats row was collected may be pruned on stale bounds (a NEW file
    * the metastore hasn't seen is safe — unknown files are never
    * pruned). After appending files + updating stats, call `refresh()`:
    * it re-lists the base index AND rebuilds the interval map from
    * `statsSource` — a path-backed source (see `table(…, statsPath)`)
    * re-reads the stats table, so rows appended since are picked up. */
  @volatile private var intervals: Map[String, Map[String, (Literal, Literal)]] =
    MetastoreFileIndex.intervalMap(statsSource())

  /** Hadoop conf resolved ONCE at construction (the building thread has
    * a session in hand) — the compaction probe must not call
    * `SparkSession.active` at listFiles time: planning can run on a
    * user thread with no active session set, where the lookup throws
    * (or grabs the wrong session) and the GUARD itself becomes a
    * query-planning failure mode. A caller constructing the index with
    * neither a conf argument nor any session fails HERE, loudly — a
    * blank fallback Configuration would silently drop the session's
    * filesystem settings (credentials, fs.defaultFS) and surface as an
    * inscrutable probe failure at first listFiles instead. */
  private val hadoopConf = conf.orElse(
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration))
    .getOrElse(throw new IllegalStateException(
      "MetastoreFileIndex needs a Hadoop conf: construct it with one, or on a " +
        "thread with an active/default SparkSession"))

  override def rootPaths: Seq[Path] = base.rootPaths
  override def inputFiles: Array[String] = base.inputFiles
  override def refresh(): Unit = {
    base.refresh()
    intervals = MetastoreFileIndex.intervalMap(statsSource())
  }
  override def sizeInBytes: Long = base.sizeInBytes
  override def partitionSchema: StructType = base.partitionSchema

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // Compaction tolerance: Compactor's commit protocol leaves a
    // `<root>.cbak` marker beside the live dir from the data swap until
    // the stats refresh completes (Compactor.scala, "READER visibility").
    // Inside that window — or after a crash mid-compaction — this
    // index's cached FileStatus entries and its interval map both
    // reference the renamed-away files, so a scan would FileNotFound.
    // When the marker is present, re-list the live dir and skip
    // interval pruning for this planning call: the live files are
    // unknown to the stale stats, and the may-contain contract already
    // forbids pruning unknown files. Costs pruning effectiveness (never
    // correctness) for the seconds-wide window; once the marker drops,
    // call refresh() to re-arm the interval map over the new files.
    // RESIDUAL RACE: the probe runs at PLANNING time — a query planned
    // an instant before the swap commits still executes against the
    // old FileStatus list and can FileNotFound. The guard closes the
    // dominant (seconds-wide, stats-refresh) window; the
    // planning-to-execution instant keeps the documented retry /
    // tolerateCorrupt contract (Compactor.scala, READER visibility).
    if (MetastoreFileIndex.underCompaction(base.rootPaths, hadoopConf)) {
      MetastoreFileIndex.log.warn(
        "metastore prune: .cbak marker present (compaction in flight or crashed) — " +
          "re-listing live files; zone-map pruning disabled for this query")
      base.refresh()
      return base.listFiles(partitionFilters, dataFilters)
    }
    var total = 0L
    var kept = 0L
    val out = base.listFiles(partitionFilters, dataFilters).map { pd =>
      pd.copy(files = pd.files.filter { f =>
        total += 1
        val keep = intervals.get(f.getPath.toString) match {
          case Some(stats) => dataFilters.forall(MetastoreFileIndex.mayContain(stats, _))
          case None => true // file unknown to the metastore: never prune
        }
        if (keep) kept += 1
        keep
      })
    }
    // O19 telemetry for the transparent path (Lakeshack.query logs its
    // own counters): at 100 TB "how many files did pruning skip" is the
    // operational signal a plan regression shows up in first
    if (dataFilters.nonEmpty)
      MetastoreFileIndex.log.info(
        s"metastore prune: files_scanned=$kept/$total files_pruned=${total - kept}")
    out
  }

}

object MetastoreFileIndex {

  /** May the file (with these column intervals) contain a row satisfying
    * `e`? Unknown shapes answer true. Shared by this index and the
    * catalog-side [[SnapshotFileIndex]] — ONE definition of the pruning
    * semantics, so the SQL path cannot drift from the API path. */
  private[lake] def mayContain(stats: Map[String, (Literal, Literal)], e: Expression): Boolean = {
    // Floating-point columns: a spec-compliant writer EXCLUDES NaN from
    // footer min/max, and Spark orders NaN above every double — so a
    // NaN row satisfies `col > v`, `col >= v`, and `col === NaN` even
    // when the recorded max says the file can't match. Only the
    // min-side tests (<, <=) stay sound; everything else must keep the
    // file. (Same rule as Metastore.prunePairs' float handling.)
    def fp(a: Attribute): Boolean =
      a.dataType == FloatType || a.dataType == DoubleType
    def bounds(a: Attribute): Option[(Literal, Literal)] = stats.get(a.name)
    def isTrue(p: Expression): Boolean = p.eval(null) == true
    e match {
      case And(l, r) => mayContain(stats, l) && mayContain(stats, r)
      case Or(l, r) => mayContain(stats, l) || mayContain(stats, r)
      // = : both bounds (metastore.py:461-463)
      case EqualTo(a: Attribute, v: Literal) if !fp(a) =>
        bounds(a).forall { case (mn, mx) =>
          isTrue(LessThanOrEqual(mn, v)) && isTrue(LessThanOrEqual(v, mx)) }
      case EqualTo(v: Literal, a: Attribute) => mayContain(stats, EqualTo(a, v))
      case In(a: Attribute, vs) if !fp(a) && vs.forall(_.isInstanceOf[Literal]) =>
        bounds(a).forall { case (mn, mx) => vs.exists { v =>
          isTrue(LessThanOrEqual(mn, v)) && isTrue(LessThanOrEqual(v, mx)) } }
      case InSet(a: Attribute, vs) if !fp(a) =>
        bounds(a).forall { case (mn, mx) => vs.exists { v =>
          val l = Literal(v, a.dataType)
          isTrue(LessThanOrEqual(mn, l)) && isTrue(LessThanOrEqual(l, mx)) } }
      // one-sided interval tests (metastore.py:459-467)
      case GreaterThan(a: Attribute, v: Literal) if !fp(a) =>
        bounds(a).forall { case (_, mx) => isTrue(LessThan(v, mx)) }
      case GreaterThanOrEqual(a: Attribute, v: Literal) if !fp(a) =>
        bounds(a).forall { case (_, mx) => isTrue(LessThanOrEqual(v, mx)) }
      case LessThan(a: Attribute, v: Literal) =>
        bounds(a).forall { case (mn, _) => isTrue(GreaterThan(v, mn)) }
      case LessThanOrEqual(a: Attribute, v: Literal) =>
        bounds(a).forall { case (mn, _) => isTrue(GreaterThanOrEqual(v, mn)) }
      // literal-on-left mirrors
      case GreaterThan(v: Literal, a: Attribute) => mayContain(stats, LessThan(a, v))
      case GreaterThanOrEqual(v: Literal, a: Attribute) => mayContain(stats, LessThanOrEqual(a, v))
      case LessThan(v: Literal, a: Attribute) => mayContain(stats, GreaterThan(a, v))
      case LessThanOrEqual(v: Literal, a: Attribute) => mayContain(stats, GreaterThanOrEqual(a, v))
      case _ => true
    }
  }

  private[lake] val log = org.slf4j.LoggerFactory.getLogger(classOf[MetastoreFileIndex])

  /** True when any root has a live compaction marker (see
    * `Compactor.underCompaction` — one definition of the marker
    * naming). One driver-side existence probe per root per planning
    * call (no I/O beyond a namenode/inode stat), so the steady-state
    * cost of the guard is negligible. */
  private def underCompaction(roots: Seq[Path],
                              conf: org.apache.hadoop.conf.Configuration): Boolean =
    roots.exists(r => Compactor.underCompaction(r.getFileSystem(conf), r))

  /** A DataFrame over `dataPath` whose every scan consults the stats
    * table for file skipping. Register it as a temp view and `spark.sql`
    * queries prune transparently.
    *
    * Assumes IMMUTABLE data files (see the intervals doc): append new
    * files + update stats, then drop/rebuild or refresh the index —
    * never rewrite a file in place under the same name. With this
    * overload the stats snapshot is the DataFrame as of its own plan;
    * use the `statsPath` overload for an index whose refresh() re-reads
    * the stats table from storage. */
  def table(spark: SparkSession, dataPath: String, stats: DataFrame): DataFrame =
    table(spark, dataPath, () => stats)

  /** Path-backed variant: the interval map is (re)loaded from
    * `statsPath` at construction and on every `FileIndex.refresh()`, so
    * `Metastore.update` + `refresh()` makes newly harvested files
    * prunable without rebuilding the view. */
  def table(spark: SparkSession, dataPath: String, statsPath: String): DataFrame =
    table(spark, dataPath, () => Metastore.load(spark, statsPath))

  private def table(spark: SparkSession, dataPath: String, statsSource: () => DataFrame): DataFrame = {
    // default read keeps hive partition-column inference; a plain nested
    // layout (no top-level files) can't infer that way, so fall back to
    // recursive lookup (the file index below lists recursively either way)
    val schema =
      try spark.read.parquet(dataPath).schema
      catch { case _: org.apache.spark.sql.AnalysisException =>
        spark.read.option("recursiveFileLookup", "true").parquet(dataPath).schema }
    val probe = new InMemoryFileIndex(spark, Seq(new Path(dataPath)),
      Map.empty[String, String], Some(schema), FileStatusCache.getOrCreate(spark), None, None)
    // NON-hive layouts must list recursively: with empty partition
    // columns and no recursiveFileLookup, PartitioningAwareFileIndex
    // .allFiles returns only each root's DIRECT child files, silently
    // dropping nested batch dirs (a Merge/ingest lake's native shape —
    // top-level files plus merge-*/batch-* subdirs). Hive layouts keep
    // the default index: their files all live under partition dirs, and
    // recursive lookup would disable the partition-column inference.
    val base =
      if (probe.partitionSchema.nonEmpty) probe
      else new InMemoryFileIndex(spark, Seq(new Path(dataPath)),
        Map("recursiveFileLookup" -> "true"), Some(schema),
        FileStatusCache.getOrCreate(spark), None, None)
    val idx = new MetastoreFileIndex(base, statsSource,
      Some(spark.sparkContext.hadoopConfiguration))
    // hive-style layouts: partition columns come from the directory
    // structure, not the file footers — declaring them in dataSchema
    // would read them (as nulls) from files where they don't exist
    val partSchema = base.partitionSchema
    val dataSchema = StructType(schema.filterNot(f => partSchema.fieldNames.contains(f.name)))
    val rel = HadoopFsRelation(idx, partSchema, dataSchema, None,
      new ParquetFileFormat(), Map.empty[String, String])(spark)
    GraftColumnBridge.ofRows(spark, LogicalRelation(rel, isStreaming = false))
  }

  /** Explicit-file-set variant for VERSIONED tables: the base index
    * lists exactly `files` (a [[SnapshotLog]] snapshot's live set), so
    * the view reads that version — untouched by later commits — while
    * zone-map pruning works transparently through the same interval
    * map. No hive partition inference (token dirs are not partition
    * dirs); `schema` is the version's committed schema. */
  def tableForFiles(spark: SparkSession, files: Seq[String],
                    schema: StructType, stats: DataFrame): DataFrame = {
    val base = new InMemoryFileIndex(spark, files.map(new Path(_)),
      Map.empty[String, String], Some(schema), FileStatusCache.getOrCreate(spark), None, None)
    val idx = new MetastoreFileIndex(base, () => stats,
      Some(spark.sparkContext.hadoopConfiguration))
    val rel = HadoopFsRelation(idx, StructType(Nil), schema, None,
      new ParquetFileFormat(), Map.empty[String, String])(spark)
    GraftColumnBridge.ofRows(spark, LogicalRelation(rel, isStreaming = false))
  }

  /** The MetastoreFileIndex behind a DataFrame returned by `table` —
    * call `.refresh()` on it after appending files + updating stats. */
  def indexOf(df: DataFrame): MetastoreFileIndex =
    df.queryExecution.logical.collectFirst {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location
      }
    } match {
      case Some(idx: MetastoreFileIndex) => idx
      case _ => throw new IllegalArgumentException(
        "DataFrame was not produced by MetastoreFileIndex.table")
    }

  /** Collect the (tiny) stats table into filepath → column → (min,max)
    * Literals. NULL bounds (a file with no footer stats for the column)
    * drop the column's entry — that file is then never pruned on it.
    * Paths are normalized through Hadoop `Path` so `_metadata.file_path`
    * URIs (`file:///x`) match `FileStatus` URIs (`file:/x`). */
  def intervalMap(stats: DataFrame): Map[String, Map[String, (Literal, Literal)]] = {
    val statCols = stats.schema.fields.filter(_.name.endsWith("_min"))
      .map(f => (f.name.dropRight(4), f.dataType))
    stats.collect().map { row =>
      val fp = new Path(row.getAs[String]("filepath")).toString
      val byCol = statCols.flatMap { case (c, dt) =>
        val mn = row.getAs[Any](c + "_min")
        val mx = row.getAs[Any](c + "_max")
        if (mn == null || mx == null) None
        else Some(c -> (Literal.create(mn, dt), Literal.create(mx, dt)))
      }.toMap
      fp -> byCol
    }.toMap
  }
}
