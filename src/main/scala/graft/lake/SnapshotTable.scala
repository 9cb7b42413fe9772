package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FileSourceOptions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.catalog.SupportsDelete
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, VariantExtraction}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex, PartitionDirectory, PartitionedFile, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FilePartitionReaderFactory
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetPartitionReaderFactory, ParquetScan, ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The DataSource V2 table [[SnapshotCatalog]] serves: Spark's own
  * `ParquetTable` over a version's exact live file set, extended with
  * the two behaviors a snapshot version needs that a stock parquet scan
  * cannot give —
  *
  *  1. ZONE-MAP FILE PRUNING ([[SnapshotFileIndex]]): `WHERE` clauses
  *     skip non-matching files at planning time from cached footer
  *     stats, exactly like the API path's
  *     [[MetastoreFileIndex.tableForFiles]] (one shared `mayContain`,
  *     so the SQL and API pruning semantics cannot drift);
  *  2. DELETION-VECTOR application ([[DvScanBuilder]]): a version that
  *     carries DVs is readable in pure SQL — each dirty file's dead
  *     positions are dropped by a per-file positional filter inside the
  *     scan, the row-level equivalent of `SnapshotLog.read`'s broadcast
  *     anti-join (reference capability: query-the-lake,
  *     lakeshack/lakeshack.py:476-579, here versioned + SQL + DV-aware).
  *
  * DV READ TAX (the price of merge-on-read, cleared by
  * `SnapshotLog.purgeDeletes` / `maintain`): when the version carries
  * vectors, the scan (a) pushes NO filters into parquet and (b) reads
  * row-based, with dirty files unsplit. (a) and the unsplit part exist
  * because the DV keys are PHYSICAL row positions — `_metadata
  * .row_index` at delete time — so the reader-side position counter
  * must see every row of the file in order; row-group skipping or a
  * byte-range split would silently desynchronize it. Row-based applies
  * to the whole version (Spark's `BatchScanExec` refuses mixed
  * row/columnar partitions); clean files still split and skip the
  * position filter. Catalyst re-applies every predicate above the scan
  * (correctness), and zone-map file pruning still works underneath
  * (the dominant saving). A DV-free version pays none of this.
  *
  * Scale: the dead-position map is dead-row-sized (the DV contract;
  * `maintain` bounds it at ~1M rows), shipped once per scan as a
  * broadcast, and probed per row with a binary search. 100 TB of clean
  * data + a CDC trickle of deletes reads at full parquet speed on the
  * clean files and pays O(log deadRows) per row only on the handful of
  * dirty ones.
  */
/** The read half: Spark's `ParquetTable` with the pruning index and the
  * DV-applying scan. Kept as an INTERNAL delegate of
  * [[SnapshotParquetTable]] rather than the served table itself:
  * Spark's `FallBackFileSourceV2` rule force-rewrites ANY
  * `INSERT INTO` over a `FileTable` onto the V1 path (which requires a
  * single root path — a snapshot's explicit file list is many), so the
  * catalog's table must not BE a `FileTable` for SQL DML to reach the
  * DSv2 write path. */
private[lake] class SnapshotReadTable(
    tname: String, spark: SparkSession, filePaths: Seq[String],
    tableSchema: StructType, hasDvs: Boolean,
    deadFn: () => Map[String, Array[Long]],
    tablePath: String, streamable: Boolean)
  extends ParquetTable(tname, spark, CaseInsensitiveStringMap.empty(), filePaths,
    Some(tableSchema), classOf[ParquetFileFormat]) {

  override lazy val fileIndex: PartitioningAwareFileIndex =
    new SnapshotFileIndex(spark, filePaths, tableSchema)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ParquetScanBuilder = {
    val b = super.newScanBuilder(options)
    if (!hasDvs)
      new SnapshotScanBuilder(b.sparkSession, b.fileIndex, b.schema, b.dataSchema,
        options, tablePath, tableSchema, streamable)
    // deadFn materializes the driver-side dead map ONLY here — the
    // row-based fallback for sessions without GraftExtensions (whose
    // rewrite rule replaces this scan with the vectorized anti-join
    // form and never builds the map). Capped by
    // SnapshotLog.MaxDriverDeadRows with a loud refusal beyond it.
    else new DvScanBuilder(b.sparkSession, b.fileIndex, b.schema, b.dataSchema,
      options, deadFn(), tablePath, tableSchema, streamable)
  }
}

private[lake] class SnapshotParquetTable(
    tname: String, spark: SparkSession, filePaths: Seq[String],
    tableSchema: StructType,
    private[lake] val dvFiles: Map[String, Seq[String]],
    deadFn: () => Map[String, Array[Long]],
    private[lake] val tablePath: String, private[lake] val writable: Boolean)
  extends org.apache.spark.sql.connector.catalog.Table
  with org.apache.spark.sql.connector.catalog.SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite
  with SupportsDelete {

  private val readTable =
    new SnapshotReadTable(tname, spark, filePaths, tableSchema, dvFiles.nonEmpty,
      deadFn, tablePath, streamable = writable)

  /** The vectorized DV-applying read `VectorizeSnapshotDvRead`
    * substitutes for this relation (see
    * [[SnapshotLog.vectorizedCatalogRead]]). */
  private[lake] def vectorizedRead(session: SparkSession): org.apache.spark.sql.DataFrame =
    SnapshotLog.vectorizedCatalogRead(session, tablePath, tableSchema, filePaths, dvFiles)

  override def name(): String = tname
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[org.apache.spark.sql.connector.catalog.TableCapability] = {
    import org.apache.spark.sql.connector.catalog.TableCapability._
    val caps = new java.util.HashSet[org.apache.spark.sql.connector.catalog.TableCapability]()
    caps.add(BATCH_READ)
    // readStream.table(...) — pure-insert versions stream as they
    // commit (SnapshotMicroBatchStream); a pinned AS OF table refuses
    // at stream build with a clear message
    caps.add(MICRO_BATCH_READ)
    if (writable) { caps.add(BATCH_WRITE); caps.add(TRUNCATE) }
    caps
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ParquetScanBuilder =
    readTable.newScanBuilder(options)

  // ── SQL DML: INSERT INTO / INSERT OVERWRITE ────────────────────────
  // The DSv2 two-phase write maps 1:1 onto the snapshot commit
  // protocol: executors stream parquet into a FRESH POOL TOKEN DIR
  // through Spark's stock parquet BatchWrite (task-attempt isolation,
  // speculative-duplicate handling — all stock), and the driver-side
  // BatchWrite.commit claims the manifest, which IS the query's commit
  // point. An abort (or a driver crash before the claim) strands at
  // most an orphan token dir for expireOrphans — the table never shows
  // a half-written INSERT. Appends validate strictly against the head
  // schema; INSERT OVERWRITE (truncate) replaces the live set as one
  // lost-update-safe overwrite commit.
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(writable,
      s"$tname is a time-travel pin — write to the table head (no AS OF)")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = {
          val token = java.util.UUID.randomUUID().toString.take(12)
          val tokenDir = new Path(
            SnapshotLog.poolDir(new Path(tablePath)), token)
          val inner = ParquetTable(s"$tname#write", spark,
            CaseInsensitiveStringMap.empty(), Seq(tokenDir.toString),
            Some(info.schema()), classOf[ParquetFileFormat])
            .newWriteBuilder(info).build().toBatch
          val ow = overwrite
          new BatchWrite {
            override def createBatchWriterFactory(p: PhysicalWriteInfo): DataWriterFactory =
              inner.createBatchWriterFactory(p)
            override def useCommitCoordinator(): Boolean = inner.useCommitCoordinator()
            override def commit(messages: Array[WriterCommitMessage]): Unit = {
              inner.commit(messages) // files land under the token dir
              SnapshotLog.commitWrittenToken(spark, tablePath, tokenDir, ow,
                info.schema())
              ()
            }
            override def abort(messages: Array[WriterCommitMessage]): Unit =
              inner.abort(messages)
          }
        }
      }
    }
  }

  // ── SQL DML: DELETE FROM ... WHERE ─────────────────────────────────
  // Row-level SQL delete = one deletion-vector commit
  // (SnapshotLog.delete): O(matched rows) written, zero files
  // rewritten, time travel un-deleted — the same semantics the API
  // delete documents, now a language feature. Only filters this table
  // can compile to a Column are accepted (canDeleteWhere), so Spark
  // refuses loudly rather than deleting the wrong rows.
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    writable && filters.forall(f => SnapshotTable.filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(writable,
      s"$tname is a time-travel pin — delete on the table head (no AS OF)")
    val cond = filters.flatMap(SnapshotTable.filterToColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    SnapshotLog.delete(spark, tablePath, cond)
    ()
  }
}

private[lake] object SnapshotTable {
  private val RelRe = "^.*/(data/.*)$".r

  /** Pool-relative path of an absolute data-file path — the same
    * last-`/data/`-segment anchor as `SnapshotLog.relFileCol`, so the
    * DV keys written by `delete` match by construction. */
  def relOf(absPath: String): String = absPath match {
    case RelRe(rel) => rel
    case other => other
  }

  /** Compile a DSv1 source filter (what `SupportsDelete` hands over) to
    * a `Column` for `SnapshotLog.delete`'s pushed scan. None = a shape
    * this table refuses to delete by (canDeleteWhere gates on it). */
  def filterToColumn(f: Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(a, v) => Some(col(a) === lit(v))
      case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
      case GreaterThan(a, v) => Some(col(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case LessThan(a, v) => Some(col(a) < lit(v))
      case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
      case IsNull(a) => Some(col(a).isNull)
      case IsNotNull(a) => Some(col(a).isNotNull)
      case StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case StringEndsWith(a, v) => Some(col(a).endsWith(v))
      case StringContains(a, v) => Some(col(a).contains(v))
      case And(l, r) =>
        for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc && rc
      case Or(l, r) =>
        for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc || rc
      case Not(c) => filterToColumn(c).map(!_)
      case AlwaysTrue() => Some(lit(true))
      case AlwaysFalse() => Some(lit(false))
      case _ => None
    }
  }
}

/** `InMemoryFileIndex` + transparent zone-map pruning for a snapshot
  * version's file set. Intervals are built LAZILY per referenced
  * column from the shared per-(file, column) footer-stats cache
  * (`SnapshotLog.cachedHarvest`) the first time a filter mentions the
  * column — so `snap.t VERSION AS OF 3 WHERE k = 42` pays one footer
  * sweep over the version's files on first use and map lookups after,
  * the identical cost shape as the API path's `readPruned`. Unknown
  * files and unknown predicate shapes are never pruned (may-contain,
  * sound); files are immutable by the pool protocol, so the memo never
  * goes stale. */
private[lake] class SnapshotFileIndex(
    spark: SparkSession, absFiles: Seq[String], schema: StructType)
  extends InMemoryFileIndex(spark, absFiles.map(new Path(_)),
    Map.empty[String, String], Some(schema),
    FileStatusCache.getOrCreate(spark), None, None) {

  // per-COLUMN memo (ConcurrentHashMap.computeIfAbsent): concurrent
  // first-planning of many queries on one huge version serializes only
  // per contended column — a coarse synchronized block here was a
  // measured convoy risk on the driver (every first query of a session
  // queuing behind one column's footer sweep)
  private val colIntervals = new java.util.concurrent.ConcurrentHashMap[
    String, Map[String, (Literal, Literal)]]()

  private def intervalsOf(c: String): Map[String, (Literal, Literal)] =
    colIntervals.computeIfAbsent(c, { c =>
      val dt = schema(c).dataType
      SnapshotLog.cachedHarvest(spark, absFiles, c, dt).flatMap { st =>
        for (mn <- st.min; mx <- st.max) yield
          new Path(st.path).toString ->
            (Literal.create(mn, dt), Literal.create(mx, dt))
      }.toMap
    })

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    if (dataFilters.isEmpty) return base
    val cols = dataFilters.flatMap(_.references.toSeq.map(_.name)).distinct
      .filter(c => schema.fieldNames.contains(c) &&
        Metastore.isOrderable(schema(c).dataType))
    if (cols.isEmpty) return base
    val byCol = cols.map(c => c -> intervalsOf(c))
    var total = 0; var kept = 0
    val out = base.map { pd =>
      pd.copy(files = pd.files.filter { f =>
        total += 1
        val p = f.getPath.toString
        val stats = byCol.flatMap { case (c, m) => m.get(p).map(c -> _) }.toMap
        val keep = dataFilters.forall(MetastoreFileIndex.mayContain(stats, _))
        if (keep) kept += 1
        keep
      })
    }
    MetastoreFileIndex.log.info(
      s"snapshot catalog prune: files_scanned=$kept/$total files_pruned=${total - kept}")
    out
  }
}

/** The clean-version scan builder: stock parquet pushdown + a scan
  * that additionally serves [[SnapshotMicroBatchStream]] for
  * `readStream.table(...)`. */
private[lake] class SnapshotScanBuilder(
    spark: SparkSession, idx: PartitioningAwareFileIndex,
    tblSchema: StructType, dSchema: StructType,
    opts: CaseInsensitiveStringMap,
    tablePath: String, baseSchema: StructType, streamable: Boolean)
  extends ParquetScanBuilder(spark, idx, tblSchema, dSchema, opts) {

  override def build(): ParquetScan = {
    val s = super.build()
    new StreamableParquetScan(s.sparkSession, s.hadoopConf, s.fileIndex,
      s.dataSchema, s.readDataSchema, s.readPartitionSchema, s.pushedFilters,
      s.options, s.pushedAggregate, s.partitionFilters, s.dataFilters,
      s.pushedVariantExtractions, tablePath, baseSchema, streamable)
  }
}

/** `ParquetScan` + the snapshot streaming source. Batch reads are the
  * stock scan untouched. */
private[lake] class StreamableParquetScan(
    ss: SparkSession, hconf: org.apache.hadoop.conf.Configuration,
    idx: PartitioningAwareFileIndex, dSchema: StructType,
    rdSchema: StructType, rpSchema: StructType,
    pFilters: Array[Filter], opts: CaseInsensitiveStringMap,
    pAgg: Option[Aggregation], partFilters: Seq[Expression],
    dFilters: Seq[Expression], pVar: Array[VariantExtraction],
    tablePath: String, baseSchema: StructType, streamable: Boolean)
  extends ParquetScan(ss, hconf, idx, dSchema, rdSchema, rpSchema, pFilters,
    opts, pAgg, partFilters, dFilters, pVar) {

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(streamable,
      s"a time-travel pin cannot be streamed — readStream the table head " +
        "(no AS OF); the stream follows commits as they land")
    SnapshotMicroBatchStream.fromOptions(sparkSession, tablePath, baseSchema, opts)
  }
}

/** Scan builder for DV-carrying versions. Pushes NOTHING into the
  * parquet reader (filters would row-group-skip and desync the
  * physical position counter; a pushed aggregate would aggregate dead
  * rows) — Catalyst applies every predicate above the scan instead,
  * and file-level pruning still runs in the index below. */
private[lake] class DvScanBuilder(
    spark: SparkSession, idx: PartitioningAwareFileIndex,
    tblSchema: StructType, dSchema: StructType,
    opts: CaseInsensitiveStringMap, dead: Map[String, Array[Long]],
    tablePath: String, baseSchema: StructType, streamable: Boolean)
  extends ParquetScanBuilder(spark, idx, tblSchema, dSchema, opts) {

  override def pushDataFilters(dataFilters: Array[Filter]): Array[Filter] =
    Array.empty

  override def pushAggregation(aggregation: Aggregation): Boolean = false

  override def build(): ParquetScan = {
    val s = super.build()
    new DvParquetScan(s.sparkSession, s.hadoopConf, s.fileIndex, s.dataSchema,
      s.readDataSchema, s.readPartitionSchema, s.pushedFilters, s.options,
      s.pushedAggregate, s.partitionFilters, s.dataFilters,
      s.pushedVariantExtractions, dead, tablePath, baseSchema, streamable)
  }
}

/** `ParquetScan` that drops each dirty file's dead positions. Dirty
  * files are kept unsplit (one task sees the whole file, positions
  * 0..n−1 in order); clean files split and vectorize as usual.
  * Streaming rides [[StreamableParquetScan]] (the stream plans its own
  * per-version scans, so the DV batch tax never applies to it). */
private[lake] class DvParquetScan(
    ss: SparkSession, hconf: org.apache.hadoop.conf.Configuration,
    idx: PartitioningAwareFileIndex, dSchema: StructType,
    rdSchema: StructType, rpSchema: StructType,
    pFilters: Array[Filter], opts: CaseInsensitiveStringMap,
    pAgg: Option[Aggregation], partFilters: Seq[Expression],
    dFilters: Seq[Expression], pVar: Array[VariantExtraction],
    dead: Map[String, Array[Long]],
    tablePath: String, baseSchema: StructType, streamable: Boolean)
  extends StreamableParquetScan(ss, hconf, idx, dSchema, rdSchema, rpSchema,
    pFilters, opts, pAgg, partFilters, dFilters, pVar,
    tablePath, baseSchema, streamable) {

  override def isSplitable(path: Path): Boolean =
    !dead.contains(SnapshotTable.relOf(path.toUri.getPath)) && super.isSplitable(path)

  override def createReaderFactory(): PartitionReaderFactory = {
    val inner = super.createReaderFactory().asInstanceOf[ParquetPartitionReaderFactory]
    new DvReaderFactory(inner, sparkSession.sparkContext.broadcast(dead))
  }
}

/** Per-file wrapping of the stock parquet readers: a dirty file's
  * row-based reader is filtered by a position counter + binary search
  * over its sorted dead set; clean files pass through untouched
  * (including the vectorized columnar path when every file of the
  * partition is clean). */
private[lake] class DvReaderFactory(
    inner: ParquetPartitionReaderFactory,
    dead: Broadcast[Map[String, Array[Long]]])
  extends FilePartitionReaderFactory {

  override def options: FileSourceOptions = inner.options

  private def relOf(file: PartitionedFile): String =
    SnapshotTable.relOf(file.toPath.toUri.getPath)

  override def buildReader(file: PartitionedFile): PartitionReader[InternalRow] = {
    val r = inner.buildReader(file)
    dead.value.get(relOf(file)) match {
      case None => r
      case Some(sorted) =>
        require(file.start == 0,
          s"DV-filtered file ${file.toPath} arrived as a split (start=" +
            s"${file.start}) — isSplitable must keep dirty files whole")
        new PartitionReader[InternalRow] {
          private var pos = -1L
          private var cur: InternalRow = _
          override def next(): Boolean = {
            while (r.next()) {
              pos += 1
              if (java.util.Arrays.binarySearch(sorted, pos) < 0) {
                cur = r.get(); return true
              }
            }
            false
          }
          override def get(): InternalRow = cur
          override def close(): Unit = r.close()
        }
    }
  }

  // uniformly row-based: BatchScanExec refuses mixed row/columnar
  // partitions, and a DV'd version always has at least one dirty file —
  // the whole-version row-based read is part of the documented DV tax
  // (purge/maintain restores the vectorized path)
  override def supportColumnarReads(partition: InputPartition): Boolean = false
}
