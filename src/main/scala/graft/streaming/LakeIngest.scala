package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.lake.{ClusteredWriter, Metastore}

/** Continuous ingest into a clustered lake: the reference's daily-load
  * ETL recipe (docs/source/lakeshack.rst:130-160 — immutable load
  * batches, clustered files, metastore refreshed per load) expressed as
  * a Structured Streaming job.
  *
  * Each micro-batch is range-clustered on the cluster column and written
  * as immutable files under its own `batch_<id>/` directory, then its
  * per-file stats land in the metastore via `replaceUnderPrefix`: a
  * REPLAYED batch (driver died between the write and the streaming
  * commit) rewrites its directory with new part-file names, so the
  * stats rows from the failed attempt are replaced, not merely
  * appended-around — no stale filepath can survive a retry. Stats come
  * from the footer-only builder (KBs per file) so ingest never re-reads
  * the data bytes it just wrote; the batch itself is persisted across
  * its three uses (emptiness probe, range-sampling pass, write).
  * Queries through `Lakeshack`/`MetastoreFileIndex` see each batch as
  * soon as its stats land; files within a batch have disjoint cluster
  * ranges, so pruning stays tight as the lake grows.
  */
object LakeIngest {

  def start(stream: DataFrame, dataPath: String, statsPath: String,
            checkpoint: String, clusterColumn: String,
            optionalColumns: Seq[String] = Nil,
            filesPerBatch: Int = 4): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          if (!batch.isEmpty) {
            val dir = s"$dataPath/batch_$batchId"
            ClusteredWriter.write(batch, dir, clusterColumn, filesPerBatch)
            Metastore.replaceUnderPrefix(batch.sparkSession, statsPath, dir,
              Metastore.buildFromFooters(batch.sparkSession, dir, clusterColumn, optionalColumns))
          }
        } finally batch.unpersist()
        ()
      }
      .start()

  /** Continuous ingest into a VERSIONED table ([[graft.lake.SnapshotLog]]):
    * one snapshot commit per micro-batch, keyed `batch-<id>` so a
    * replayed batch (driver died between the data write and the
    * streaming commit) is recognized by its token and COMMITS NOTHING
    * TWICE — exactly-once at the table-format level, not just the
    * sink's. Unlike [[start]]'s replace-under-prefix repair, the
    * snapshot path needs no repair at all: an uncommitted token dir is
    * simply overwritten by the retry, an already-committed one is
    * skipped. Readers time-travel to any micro-batch boundary. */
  def startVersioned(stream: DataFrame, table: String, checkpoint: String,
                     clusterColumn: Option[String] = None,
                     filesPerBatch: Int = 4): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          if (!batch.isEmpty)
            graft.lake.SnapshotLog.appendBatch(batch, table, s"batch-$batchId",
              clusterColumn = clusterColumn, nFiles = filesPerBatch)
        } finally batch.unpersist()
        ()
      }
      .start()

  /** Continuous ingest through the [[graft.lake.Expectations]] gate:
    * each micro-batch is split row-by-row against the rules — clean
    * rows append to `table`, dropped rows (with their `_violations`)
    * to `quarantine`, both exactly-once under tokens derived from the
    * batch id (a replayed batch recomputes the same deterministic
    * split and each half commits at most once; a crash BETWEEN the two
    * appends is healed by the replay committing only the missing
    * half). A fail-mode violation throws inside foreachBatch and
    * stops the query with neither table touched for that batch — the
    * operator fixes the upstream and restarts from the checkpoint.
    *
    * This is the streaming form of the DLT expectations contract: bad
    * rows never reach queryable state, and the quarantine table is
    * itself a versioned lake table an operator can replay, audit, and
    * re-ingest from. */
  def startGated(stream: DataFrame, table: String, quarantine: String,
                 expectations: Seq[graft.lake.Expectations.Expectation],
                 checkpoint: String,
                 clusterColumn: Option[String] = None,
                 filesPerBatch: Int = 4): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.lake.Expectations.ingest(batch.sparkSession, batch, table,
            quarantine, expectations, s"batch-$batchId",
            clusterColumn, filesPerBatch)
        ()
      }
      .start()
}
