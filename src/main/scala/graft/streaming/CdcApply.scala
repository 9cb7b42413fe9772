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
}
