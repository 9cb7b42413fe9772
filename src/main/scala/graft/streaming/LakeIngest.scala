package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.lake.{ClusteredWriter, Metastore}

/** Continuous ingest into a clustered lake: the reference's daily-load
  * ETL recipe (docs/source/lakeshack.rst:130-160 — immutable load
  * batches, clustered files, metastore refreshed per load) expressed as
  * a Structured Streaming job.
  *
  * Each micro-batch is range-clustered on the cluster column and written
  * as immutable files under its own `batch_<id>/` directory, then its
  * per-file stats are upserted into the metastore. The per-batch
  * directory + overwrite mode + `Metastore.update`'s left-anti upsert
  * make a retried batch idempotent (same directory rewritten, same
  * filepaths skipped on re-upsert) — the foreachBatch exactly-once
  * recipe. Queries through `Lakeshack`/`MetastoreFileIndex` see each
  * batch as soon as its stats land; files within a batch have disjoint
  * cluster ranges, so pruning stays tight as the lake grows.
  */
object LakeIngest {

  def start(stream: DataFrame, dataPath: String, statsPath: String,
            clusterColumn: String, optionalColumns: Seq[String] = Nil,
            filesPerBatch: Int = 4, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val dir = s"$dataPath/batch_$batchId"
          ClusteredWriter.write(batch, dir, clusterColumn, filesPerBatch)
          Metastore.update(batch.sparkSession, statsPath,
            Metastore.build(batch.sparkSession, dir, clusterColumn, optionalColumns))
        }
        ()
      }
      .start()
}
