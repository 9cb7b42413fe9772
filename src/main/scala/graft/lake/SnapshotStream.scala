package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Version-number offset of the snapshot streaming source — one offset
  * per committed table version, so the engine's offset log IS a commit
  * cursor and replay after a crash re-plans exactly the unprocessed
  * versions. */
private[lake] case class SnapshotOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** `spark.readStream.table("cat.t")` over a [[SnapshotCatalog]] table —
  * the SQL-surface twin of [[graft.streaming.ChangeRelay]], with ZERO
  * write amplification: each micro-batch reads the manifests' ADDED
  * FILES of the versions in `(start, end]` directly from the pool (no
  * outbox copy, no per-row tagging) through a stock batch parquet scan.
  * The reference has no streaming surface at all; this finishes the
  * catalog's parity story (the last API-only read capability).
  *
  * Version classification is by MANIFEST SHAPE, not op string, so
  * labeled appends (view refresh cursors etc.) stream too:
  *
  *  - `adds` only (no removes, no DV sets): a pure insert — its added
  *    files ARE the new rows; stream them.
  *  - empty delta (schema evolution, empty append): skip silently.
  *  - anything carrying removes or DV sets (delete / update / merge /
  *    compact / purge / rollback / overwrite): a CHANGE commit — a
  *    compact's rewritten files hold rows already shipped, a delete
  *    can't be represented in an append-only stream. Refused loudly
  *    unless `.option("skipChangeCommits", true)` (Delta's contract),
  *    which skips the whole version.
  *
  * Options: `startingVersion` (default: the head at stream start — only
  * NEW commits stream; pass 0 to replay from the create),
  * `skipChangeCommits` (default false).
  *
  * Scale: `latestOffset` is one manifest-log listing; planning reads
  * one manifest per version (KBs); the data path is the same pruned,
  * vectorized parquet scan a batch read gets, sized O(new rows) per
  * micro-batch. Exactly-once rides the engine's offset log — the
  * source itself is stateless and idempotent. */
private[lake] class SnapshotMicroBatchStream(
    spark: SparkSession, tablePath: String, baseSchema: StructType,
    startingVersion: Option[Long], skipChangeCommits: Boolean)
  extends MicroBatchStream {

  override def initialOffset(): Offset =
    SnapshotOffset(startingVersion.map(_ - 1L).getOrElse(
      SnapshotLog.currentVersion(spark, tablePath)))

  override def latestOffset(): Offset =
    SnapshotOffset(SnapshotLog.currentVersion(spark, tablePath))

  override def deserializeOffset(json: String): Offset =
    SnapshotOffset(json.toLong)

  // the reader factory of the LAST planned batch: the engine always
  // calls planInputPartitions(start, end) then createReaderFactory()
  // for the same batch, single-threaded per stream
  @volatile private var lastFactory: PartitionReaderFactory = _

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[SnapshotOffset].version
    val to = end.asInstanceOf[SnapshotOffset].version
    val files = Seq.newBuilder[String]
    for (v <- (from + 1) to to) {
      val (op, adds, nRemoves, nDvSets) = SnapshotLog.versionDelta(spark, tablePath, v)
      if (nRemoves == 0 && nDvSets == 0) files ++= adds // pure insert (or empty)
      else if (!skipChangeCommits) throw new IllegalStateException(
        s"version $v of $tablePath is a '$op' commit that changes existing " +
          "rows — an append-only stream cannot represent it. Either " +
          ".option(\"skipChangeCommits\", true) to skip such commits, or " +
          "consume the row-level change feed (graft.streaming.ChangeRelay)")
    }
    val fileList = files.result()
    if (fileList.isEmpty) { lastFactory = EmptyReaderFactory; return Array.empty }
    val root = new Path(tablePath)
    val abs = fileList.map(f => new Path(SnapshotLog.dataRootOf(root), f).toString)
    val readSchema = StructType(baseSchema.fields.map(SnapshotLog.relaxNullability))
    val scan = ParquetTable(s"$tablePath#stream", spark,
      CaseInsensitiveStringMap.empty(), abs, Some(readSchema),
      classOf[ParquetFileFormat])
      .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
    lastFactory = scan.createReaderFactory()
    scan.toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory = lastFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  private object EmptyReaderFactory extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
      throw new IllegalStateException("empty micro-batch has no partitions to read")
  }
}

private[lake] object SnapshotMicroBatchStream {
  /** Build from the scan's read options (`.option(...)` on the
    * DataStreamReader arrives here, case-insensitive). */
  def fromOptions(spark: SparkSession, tablePath: String,
                  baseSchema: StructType,
                  options: CaseInsensitiveStringMap): SnapshotMicroBatchStream = {
    val sv = Option(options.get("startingVersion")).map(_.toLong)
    val skip = options.getBoolean("skipChangeCommits", false)
    new SnapshotMicroBatchStream(spark, tablePath, baseSchema, sv, skip)
  }
}
