package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.lake.{Merge, Metastore, StatsStore}

/** Continuous CDC apply: a change stream — rows tagged upsert/delete —
  * applied to a clustered lake table as one `Merge` transaction pair
  * per micro-batch. This is the row-level sibling of `LakeIngest`
  * (append-only loads): together they cover the two ingest shapes a
  * lake table has, and both keep the single-writer contract for free
  * because Structured Streaming serializes `foreachBatch` calls.
  *
  * Batch semantics: every row whose `opCol` equals `deleteOp` deletes
  * its cluster-key group; every other row is part of a key-group
  * upsert (the non-key columns must match the table schema once
  * `opCol` is dropped). Deletes apply AFTER upserts, so a key both
  * upserted and deleted in one batch ends deleted — the CDC "last
  * state wins" reading of a mixed batch.
  *
  * Replay safety (foreachBatch is at-least-once): both halves are
  * idempotent — re-running a key-group upsert with the same source
  * rows reproduces the same key groups, and re-deleting deleted keys
  * is a no-op — so a replayed batch converges to the same table state
  * provided the source replays the same batch content (the usual
  * replayable-source contract).
  *
  * At 100 TB the per-batch cost is `Merge`'s: files touched by the
  * batch's keys are rewritten, nothing else is read — a thousand-key
  * CDC batch against a well-clustered table rewrites a handful of
  * files regardless of table size.
  */
object CdcApply {

  def start(stream: DataFrame, dataPath: String, statsPath: String,
            checkpoint: String, opCol: String = "op",
            deleteOp: String = "delete"): StreamingQuery =
    startWith(stream, dataPath, StatsStore.parquet(stream.sparkSession, statsPath),
      checkpoint, opCol, deleteOp)

  /** Store-generic form — the streaming sibling of `Merge.upsertWith`:
    * apply the change stream against ANY `StatsStore` (e.g.
    * `StatsStore.jdbc` for a database-backed metastore). */
  def startWith(stream: DataFrame, dataPath: String, store: StatsStore,
                checkpoint: String, opCol: String = "op",
                deleteOp: String = "delete"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          val spark = batch.sparkSession
          val cluster = Metastore.clusterColumnOf(store.load())
          val upserts = batch.where(col(opCol) =!= lit(deleteOp)).drop(opCol)
          val deletes = batch.where(col(opCol) === lit(deleteOp))
            .select(col(cluster)).distinct()
          if (upserts.head(1).nonEmpty) Merge.upsertWith(spark, dataPath, store, upserts)
          if (deletes.head(1).nonEmpty) Merge.deleteWith(spark, dataPath, store, deletes)
        } finally batch.unpersist()
        ()
      }
      .start()

  /** CDC apply on the VERSIONED format ([[graft.lake.SnapshotLog]]):
    * per micro-batch, upserts land as one copy-on-write `merge` commit
    * (file-pruned rewrite) and deletes as one deletion-vector
    * `deleteByKeys` commit (O(deleted rows) written, zero rewrites) —
    * deletes after upserts, so a key both upserted and deleted in a
    * batch ends deleted (same last-state-wins reading as [[startWith]]).
    * The table must already exist (its head schema is the merge
    * contract); create v0 with `SnapshotLog.write` first.
    *
    * AUTO-MAINTENANCE — the hook that keeps the DV read tax bounded
    * WITHOUT an operator remembering: every `maintainEvery`-th batch
    * (by batch id, so replays hit the same schedule; 0 disables) runs
    * [[graft.lake.SnapshotLog.maintain]] with the given bounds. The
    * non-triggering check is jobless (driver footer counts), so the
    * steady-state cost is nil; when the dead-row debt crosses a bound
    * the purge rewrites only the dirty files. Without this, a CDC
    * delete trickle grows the merge-on-read anti-join tax on every
    * future read forever.
    *
    * Replay safety (foreachBatch is at-least-once): re-running a merge
    * with the same rows converges, re-deleting dead keys is a no-op
    * (the DV scan excludes already-dead rows), and `maintain`/`purge`
    * are row-content no-ops by contract — so a replayed batch
    * reconverges to the same table state. */
  def startVersioned(stream: DataFrame, table: String, checkpoint: String,
                     keyCol: String, opCol: String = "op",
                     deleteOp: String = "delete",
                     clusterColumn: Option[String] = None, nFiles: Int = 4,
                     maintainEvery: Int = 0,
                     maxDirtyFraction: Double = 0.2,
                     maxDeadRows: Long = 1000000L): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          val spark = batch.sparkSession
          val upserts = batch.where(col(opCol) =!= lit(deleteOp)).drop(opCol)
          val deleteKeys = batch.where(col(opCol) === lit(deleteOp))
            .select(col(keyCol)).distinct()
            .collect().map(_.get(0)).toSeq // CDC-batch-sized by contract
          if (upserts.head(1).nonEmpty)
            graft.lake.SnapshotLog.merge(spark, table, keyCol, upserts,
              clusterColumn = clusterColumn, nFiles = nFiles)
          if (deleteKeys.nonEmpty)
            graft.lake.SnapshotLog.deleteByKeys(spark, table, keyCol, deleteKeys)
          if (maintainEvery > 0 && batchId > 0 && batchId % maintainEvery == 0)
            graft.lake.SnapshotLog.maintain(spark, table,
              maxDirtyFraction = maxDirtyFraction, maxDeadRows = maxDeadRows)
        } finally batch.unpersist()
        ()
      }
      .start()
}
