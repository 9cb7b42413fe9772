package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM batch preparation: assign documents to
  * fixed-token-budget training sequences. The reference has no packing
  * operator (SURVEY.md §2.2) — north_star extension.
  */
object Packing {

  /** Greedy cumulative packing: within each shard (`partitionCol`),
    * documents in `orderCol` order fill sequences of `budget` tokens; a
    * document's sequence id is ⌊tokens-before-it / budget⌋. This is the
    * standard streaming-fill approximation of bin packing — documents
    * straddling a boundary are split/padded by the downstream tokenizer,
    * which is how production packers behave.
    *
    * Scale shape: ONE window per shard (partition + sort), no global
    * ordering — a global cumulative sum would serialize 100 TB through
    * a single partition, so the shard key is required, not optional.
    * Shards are natural corpus units (source, date, bucket); sequence
    * ids are only unique per shard, matching per-shard training files.
    *
    * `tokens_before` is kept in the output: it is the doc's byte-offset
    * analog in the packed stream, and downstream writers need it to
    * place the doc inside its sequence. The working name must be free.
    */
  def packSequences(docs: DataFrame, tokenCol: Column, budget: Long,
                    partitionCol: String, orderCol: String): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    TextAnalysis.requireFree(docs, "tokens_before", "seq_id")
    val w = Window.partitionBy(partitionCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("tokens_before", coalesce(sum(tokenCol).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("tokens_before") / budget))
  }

  /** Deterministic shard assignment: `(shard_id, shard_pos)` for a
    * fixed shard count — the global-shuffle-then-write primitive of a
    * training-data run. Hashing the key spreads any source/time
    * clustering in the input uniformly across shards, and ordering
    * WITHIN the shard by the same hash decorrelates neighbors (two
    * docs adjacent in a shard file come from unrelated corpus
    * positions) — the "shuffled dataset" property training loaders
    * assume, without an RNG: re-running the pipeline reproduces every
    * shard byte-for-byte, and a doc's placement depends only on its
    * own key and `nShards`.
    *
    * Scale shape: the one exchange (partition by shard_id for the
    * row_number window) IS the write partitioning — downstream,
    * `.repartition(nShards, col("shard_id"))` + partitioned write
    * reuses it, so placement costs one shuffle of (key, hash) pairs
    * total. `shard_pos` is dense and 0-based: it is the record's
    * offset in its shard file, which loaders use to seek and resume.
    * Working column `_h` and outputs `shard_id`/`shard_pos` must be
    * free.
    *
    * `inShardOrder` overrides the hash order WITHIN a shard (shard
    * membership stays hash-determined either way): pass a quality
    * score for curriculum-ordered shards — loaders that stream a file
    * front-to-back then see easy/clean documents first. The override
    * is appended with (hash, key) as the final tie-breaks, so the
    * order — and the written file — stays fully deterministic.
    */
  def assignShards(docs: DataFrame, keyCol: Column, nShards: Int,
                   inShardOrder: Seq[Column] = Nil): DataFrame =
    placed(docs, keyCol, nShards, inShardOrder, identity)

  /** Shared placement pipeline: compute `shard_id`, let `pre` pick the
    * physical distribution (identity = the window's own exchange at the
    * session's shuffle parallelism; [[shardedForWrite]] = an explicit
    * `repartition(nShards, shard_id)` the window then REUSES), then the
    * `shard_pos` window. The window needs only clustering by shard_id,
    * which any hash partitioning on it satisfies — so `pre`'s exchange,
    * when present, is the ONLY one. */
  private def placed(docs: DataFrame, keyCol: Column, nShards: Int,
                     inShardOrder: Seq[Column],
                     pre: DataFrame => DataFrame): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    TextAnalysis.requireFree(docs, "_h", "shard_id", "shard_pos")
    val w = Window.partitionBy(col("shard_id"))
      .orderBy(inShardOrder ++ Seq(col("_h"), keyCol): _*)
    pre(docs
      .withColumn("_h", Sampling.knuthHash(keyCol))
      .withColumn("shard_id", pmod(col("_h"), lit(nShards.toLong)).cast("int")))
      .withColumn("shard_pos", row_number().over(w) - 1)
      .drop("_h")
  }

  /** [[writeShards]]' pre-write frame: identical rows to
    * [[assignShards]], physically distributed as ONE exchange into
    * exactly `nShards` hash partitions of `shard_id` — the window's
    * clustering requirement is satisfied by the explicit repartition,
    * so no second shuffle follows (spec-pinned), and each partition IS
    * one shard's file-to-be. Exposed separately so the one-exchange
    * plan property is testable without a filesystem round-trip; prefer
    * [[assignShards]] for further processing (its window exchange keeps
    * the session's full parallelism instead of collapsing to
    * `nShards` partitions). */
  def shardedForWrite(docs: DataFrame, keyCol: Column, nShards: Int,
                      inShardOrder: Seq[Column] = Nil): DataFrame =
    placed(docs, keyCol, nShards, inShardOrder,
      _.repartition(nShards, col("shard_id")))

  /** Materialize the placement as shard FILES: one `shard_id=K`
    * directory per shard, rows inside each file in `shard_pos` order —
    * the layout training loaders stream directly. This is where "the
    * placement exchange IS the write partitioning" cashes out:
    * [[shardedForWrite]] repartitions into `nShards` hash partitions of
    * shard_id BEFORE the window, the window reuses that clustering
    * (no exchange of its own — spec-pinned), `sortWithinPartitions` is
    * a local sort, and each task writes exactly its own shard — so the
    * whole global shuffle costs ONE exchange of the rows, total.
    * Byte-for-byte reproducible like everything keyed off the hash:
    * re-running the pipeline regenerates identical shard files, which
    * is what makes resumable/auditable training runs possible.
    *
    * At 100 TB: `nShards` is the training file count (pick size-
    * targeted, e.g. corpus / 1 GB); one task per shard bounds writer
    * memory at shard size, and the parquet `partitionBy` dirs mean a
    * loader seeks its shard by path, never by scan. */
  def writeShards(docs: DataFrame, keyCol: Column, nShards: Int,
                  path: String, inShardOrder: Seq[Column] = Nil): Unit =
    shardedForWrite(docs, keyCol, nShards, inShardOrder)
      .sortWithinPartitions("shard_id", "shard_pos")
      .write.mode("overwrite").partitionBy("shard_id").parquet(path)
}
