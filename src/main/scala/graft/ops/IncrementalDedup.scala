package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate detection against a PERSISTED MinHash-LSH
  * index — the 100 TB shape for a growing corpus: dedup each incoming
  * batch against everything already accepted WITHOUT re-fingerprinting
  * (or re-shuffling) the accepted corpus.
  *
  * The reference deduplicates only within what it scans per query
  * (lakeshack has no dedup surface at all — SURVEY §2.2 ★); a training
  * -data pipeline ingesting continuously needs the incremental form:
  * index once, probe per batch, append what survives.
  *
  * On-disk layout under `indexPath`:
  *   - `postings/` — `(doc, band, bucket)`, one row per (document,
  *     band): the LSH blocking keys, produced by the SAME fused native
  *     signature expression as the batch pipeline
  *     ([[graft.functions.MinHashBandBuckets]]), so a stored posting
  *     and a freshly computed one for identical text are bit-identical
  *     — the property incremental candidate generation rests on.
  *   - `sets/` — `(doc, sh_set)`: the distinct shingle-hash set per
  *     document, for exact verification of proposed pairs.
  *   - `meta/` — the signature parameters; [[ingest]] ADOPTS them
  *     rather than taking its own (probing with a mismatched band
  *     layout would silently find nothing).
  *
  * Scale shape of a probe (index n docs, batch m docs, m ≪ n):
  *   - the batch's postings and shingle sets are narrow maps over the
  *     batch only — the accepted corpus is NEVER re-fingerprinted;
  *   - the index postings are scanned ONCE and reduced to the batch's
  *     (band, bucket) keys by a broadcast semi-join — no shuffle of
  *     the index, no sort; candidate old-docs' shingle sets are
  *     fetched the same way (broadcast semi-join on candidate ids);
  *   - per-bucket work is capped by `maxBucket` on the COMBINED
  *     (index + batch) bucket population — same bound, and therefore
  *     the same recall contract, as the batch pipeline's;
  *   - verification cost is O(surviving candidate pairs · doc length).
  *   Each batch therefore costs one index-postings scan + one
  *   sets-fetch scan + batch-sized narrow work. For micro-batches,
  *   amortize the scans by grouping batches; for a lakehouse-resident
  *   index, the postings scan prunes further if `postings/` is written
  *   through [[graft.lake.ClusteredWriter]] on `bucket`.
  */
object IncrementalDedup {

  private case class Meta(numHashes: Int, bands: Int, shingleSize: Int)

  // `meta`, not `_meta`: underscore-prefixed paths are hidden to
  // Spark's file listing (the json read warned `All paths were
  // ignored` on every probe, working only through the explicit-root
  // exception)
  private def metaPath(indexPath: String) = s"$indexPath/meta"

  private def writeMeta(spark: SparkSession, indexPath: String, m: Meta): Unit = {
    import spark.implicits._
    Seq((m.numHashes, m.bands, m.shingleSize))
      .toDF("num_hashes", "bands", "shingle_size")
      .coalesce(1).write.mode("overwrite").json(metaPath(indexPath))
    // a REBUILD may change the parameters — refresh this session's view
    // (other sessions re-read on first use; cross-process rebuild during
    // a live session remains the caller's coordination problem, as with
    // every parquet-store writer here)
    metaCache.put((spark, indexPath), m)
  }

  // one json read per (session, index): ingest would otherwise read the
  // meta twice per batch (itself + ingestPairs). The only in-session
  // writer is writeMeta, which refreshes the entry on rebuild.
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Meta]()

  private def cachedMeta(spark: SparkSession, indexPath: String): Meta =
    metaCache.computeIfAbsent((spark, indexPath), _ => readMeta(spark, indexPath))

  private def readMeta(spark: SparkSession, indexPath: String): Meta = {
    val r = spark.read.json(metaPath(indexPath)).head()
    Meta(r.getAs[Long]("num_hashes").toInt, r.getAs[Long]("bands").toInt,
      r.getAs[Long]("shingle_size").toInt)
  }

  /** Builds (or replaces) the index at `indexPath` from an accepted
    * corpus. Both writes are narrow maps over `df` — no shuffle. */
  def buildIndex(df: DataFrame, idCol: String, textCol: String,
                 indexPath: String, numHashes: Int = 64, bands: Int = 32,
                 shingleSize: Int = 3): Unit = {
    Dedup.minhashBuckets(df, idCol, textCol, numHashes, bands, shingleSize)
      .write.mode("overwrite").parquet(s"$indexPath/postings")
    Dedup.shingleSets(df, idCol, textCol, shingleSize)
      .write.mode("overwrite").parquet(s"$indexPath/sets")
    writeMeta(df.sparkSession, indexPath, Meta(numHashes, bands, shingleSize))
  }

  /** Probes `batch` against the index and returns one row PER BATCH DOC:
    * `(doc_id, kept, n_matches, min_match_id)` where a match is a
    * verified J ≥ `threshold` pair with (a) any indexed doc, or (b) a
    * SMALLER-ID batch doc — the same greedy min-id-keeper policy as
    * [[Dedup.exact]], deterministic and oracle-recomputable. (For
    * transitive-cluster semantics, feed the pair list from
    * [[ingestPairs]] to [[Dedup.clusters]] instead.)
    *
    * When `appendKept` is set, the kept docs' postings and shingle sets
    * are appended to the index, so the next batch dedups against them
    * too — the steady-state ingest loop. */
  def ingest(batch: DataFrame, idCol: String, textCol: String,
             indexPath: String, threshold: Double = 0.5,
             maxBucket: Int = 1000, appendKept: Boolean = false): DataFrame = {
    val spark = batch.sparkSession
    val meta = cachedMeta(spark, indexPath)
    val ids = batch.select(col(idCol).as("doc")).distinct()

    val pairs = ingestPairs(batch, idCol, textCol, indexPath, threshold, maxBucket)
    // a batch doc d is matched by pair (doc_a=d, doc_b=old) — cross
    // pairs are oriented new→old — or by within pair (doc_a=a, doc_b=d)
    // with a < d (candidatePairsFromBuckets emits doc_a < doc_b)
    val matches = pairs.where(col("is_cross"))
      .select(col("doc_a").as("doc"), col("doc_b").as("m"))
      .unionByName(pairs.where(!col("is_cross"))
        .select(col("doc_b").as("doc"), col("doc_a").as("m")))
    val out = ids
      .join(matches, Seq("doc"), "left")
      .groupBy(col("doc").as("doc_id"))
      .agg(count(col("m")).as("n_matches"), min(col("m")).as("min_match_id"))
      .select(col("doc_id"), (col("n_matches") === 0).as("kept"),
        col("n_matches"), col("min_match_id"))
      // LINEAGE SEVERED (eager localCheckpoint) before any append: the
      // verdicts' plan READS the index the append below writes. Left
      // lazy, a caller collecting after appendKept would re-probe an
      // index already holding this batch's own postings and every kept
      // doc would match itself — and a plain persist() is NOT enough:
      // the append triggers CacheManager.recacheByPath on the index
      // path, which RECOMPUTES any cached plan referencing it. One
      // (verdict) row per batch doc — cheap to pin.
      .localCheckpoint()

    if (appendKept) {
      val kept = batch.join(
          out.where(col("kept")).select(col("doc_id").as(idCol)), Seq(idCol), "left_semi")
        // idempotent append: a doc whose id the index already holds (a
        // REPLAYED micro-batch — the driver died between the append and
        // the streaming commit) is not appended twice. One sets-scan
        // anti-join per batch, the same order of work as the probe's own
        // sets fetch.
        .join(spark.read.parquet(s"$indexPath/sets").select(col("doc").as(idCol)),
          Seq(idCol), "left_anti")
      // persist the kept set: the two appends below would otherwise
      // re-run the whole probe (out depends on the index being read)
      val keptP = kept.persist()
      try {
        Dedup.minhashBuckets(keptP, idCol, textCol,
            meta.numHashes, meta.bands, meta.shingleSize)
          .write.mode("append").parquet(s"$indexPath/postings")
        Dedup.shingleSets(keptP, idCol, textCol, meta.shingleSize)
          .write.mode("append").parquet(s"$indexPath/sets")
      } finally keptP.unpersist()
    }
    out
  }

  /** Continuous corpus ingest: each micro-batch is deduped against the
    * index (and itself), its verdicts land under
    * `indexPath/verdicts/batch_<id>/`, and its kept docs' postings+sets
    * are appended — the steady-state loop of [[ingest]] as a
    * Structured Streaming job.
    *
    * Replay safety (driver died between the append and the streaming
    * commit): verdicts are IDEMPOTENT — the self-pair guard in
    * [[ingestPairs]] keeps a replayed doc from matching its own
    * just-appended postings, kept/dropped therefore re-derive
    * identically, and the verdict dir is overwritten per batch id —
    * and the append skips ids the index already holds, so nothing
    * duplicates. State lives entirely in the on-disk index: unlike
    * [[Dedup.nearDupStream]] (in-memory state store, TTL-bounded
    * horizon), this form dedups against the FULL accepted history at
    * one postings scan per batch. */
  def ingestStream(stream: DataFrame, idCol: String, textCol: String,
                   indexPath: String, checkpoint: String,
                   threshold: Double = 0.5, maxBucket: Int = 1000)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.persist()
        try {
          if (!b.isEmpty)
            ingest(b, idCol, textCol, indexPath, threshold, maxBucket,
                appendKept = true)
              .write.mode("overwrite")
              .parquet(s"$indexPath/verdicts/batch_$batchId")
        } finally b.unpersist()
        ()
      }
      .start()

  /** Compacts the index's postings and sets tables into `filesPerTable`
    * files each — every appended micro-batch adds its own small files,
    * and a year of batches makes the per-probe postings scan pay an
    * open-file tax far above the bytes. Each table is fully rewritten
    * to a staging dir and swapped in by [[graft.lake.SwapProtocol]]'s
    * two-rename commit (crash between the renames → `recover()` on the
    * next compact restores the previous table; probes read whichever
    * complete table is live). Single-maintainer contract, like the
    * parquet stats store. */
  def compact(spark: SparkSession, indexPath: String,
              filesPerTable: Int = 8): Unit = {
    import org.apache.hadoop.fs.Path
    Seq("postings", "sets").foreach { table =>
      val live = new Path(s"$indexPath/$table")
      val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val swap = new graft.lake.SwapProtocol(fs, live, ".compact_tmp", ".compact_bak")
      swap.recover()
      swap.dropBak()
      swap.clearTmp()
      spark.read.parquet(live.toString)
        .repartition(filesPerTable)
        .write.parquet(swap.tmp.toString)
      swap.commit()
      swap.dropBak()
    }
  }

  /** One-row health summary of the index, postings-scan cost only:
    * `(n_docs, n_postings, n_buckets, max_bucket, avg_bucket,
    * n_files_postings)`. `max_bucket` approaching the probe-time cap
    * means boilerplate content is about to cost recall (capped buckets
    * drop candidates — the documented tripwire); `n_files_postings`
    * growing into the thousands says [[compact]]. The monitoring
    * counterpart of [[VectorIndex.drift]]. */
  def indexStats(spark: SparkSession, indexPath: String): DataFrame = {
    val postings = spark.read.parquet(s"$indexPath/postings")
    val nFiles = postings.inputFiles.length.toLong
    val sets = spark.read.parquet(s"$indexPath/sets")
    postings.groupBy("band", "bucket").agg(count(lit(1)).as("_n"))
      .agg(sum(col("_n")).as("n_postings"), count(lit(1)).as("n_buckets"),
        max(col("_n")).as("max_bucket"),
        (sum(col("_n")) / count(lit(1))).as("avg_bucket"))
      .crossJoin(sets.agg(count(lit(1)).as("n_docs")))
      .select(col("n_docs"), col("n_postings"), col("n_buckets"),
        col("max_bucket"), col("avg_bucket"), lit(nFiles).as("n_files_postings"))
  }

  /** The verified near-dup PAIRS a batch generates against index ∪
    * batch: `(doc_a, doc_b, n_common, jaccard, is_cross)` — cross pairs
    * oriented (new, old), within-batch pairs (a, b) with a < b. Shared
    * by [[ingest]]; exposed for callers wanting cluster semantics.
    *
    * `broadcastProbe` (default on) pins the batch side of every probe
    * join to a broadcast — right whenever the batch is genuinely small
    * (the design regime: batch ≪ index). A LARGE backfill batch (tens
    * of millions of postings — past
    * `spark.sql.autoBroadcastJoinThreshold` territory) should pass
    * `false`: the probe joins then shuffle BOTH sides on (band, bucket)
    * — the index pays one exchange of its matching postings, which at
    * that batch size is cheaper than shipping a multi-GB broadcast to
    * every executor (or dying on the 8 GB broadcast ceiling). Results
    * are identical either way (spec-pinned); only the join strategy
    * moves. */
  def ingestPairs(batch: DataFrame, idCol: String, textCol: String,
                  indexPath: String, threshold: Double = 0.5,
                  maxBucket: Int = 1000,
                  broadcastProbe: Boolean = true): DataFrame = {
    val spark = batch.sparkSession
    val meta = cachedMeta(spark, indexPath)
    // the batch side of each probe join: pinned broadcast in the small-
    // batch regime, shuffle hint for backfills
    def probeSide(df: DataFrame): DataFrame =
      if (broadcastProbe) broadcast(df) else df.hint("shuffle_hash")

    // EAGER localCheckpoint, not persist-with-finally-unpersist: the
    // returned frame is lazy, so an unpersist on function exit would
    // fire before any action and every downstream reference (okKeys,
    // cross, within all read batchPost; okKeys and cross read probed)
    // would re-execute the upstream from scratch — the persist would
    // cache nothing. Both frames are batch-scale: postings are b rows
    // per batch doc, and `probed` is the index reduced to the batch's
    // keys. Checkpointing `probed` also severs the plan's lineage to
    // the index files (see `ingest`'s recacheByPath note).
    val batchPost: DataFrame = Dedup.minhashBuckets(batch, idCol, textCol,
      meta.numHashes, meta.bands, meta.shingleSize).localCheckpoint()
    val batchKeys = batchPost.select("band", "bucket").distinct()
    // index postings: ONE scan, reduced to the batch's keys by a
    // broadcast semi-join (the batch side is the small one by
    // contract) — the index is never shuffled or sorted
    val probed: DataFrame = spark.read.parquet(s"$indexPath/postings")
      .join(probeSide(batchKeys), Seq("band", "bucket"), "left_semi")
      .localCheckpoint()
    locally {
        // combined-population bucket cap — same bound as the batch
        // pipeline applies to a bucket of the unioned corpus, so the
        // recall contract (and its tripwire: a capped bucket DROPS
        // candidates, visibly degrading the verified pair set) is
        // unchanged by incrementality
        val okKeys = probed.groupBy("band", "bucket")
          .agg(count(lit(1)).as("_ni"))
          .join(batchPost.groupBy("band", "bucket").agg(count(lit(1)).as("_nb")),
            Seq("band", "bucket"))
          .where(col("_ni") + col("_nb") <= maxBucket)
          .select("band", "bucket")
        val cross = probed
          .join(probeSide(okKeys), Seq("band", "bucket"), "left_semi")
          .select(col("band"), col("bucket"), col("doc").as("_old"))
          .join(probeSide(batchPost.select(col("band"), col("bucket"), col("doc").as("_new"))),
            Seq("band", "bucket"))
          // self-pair guard: ids are disjoint by contract, EXCEPT when a
          // replayed micro-batch probes an index already holding its own
          // postings ([[ingestStream]]) — a doc must never match itself
          .where(col("_new") =!= col("_old"))
          .select(col("_new").as("doc_a"), col("_old").as("doc_b"))
          .distinct()
        val within = Dedup.candidatePairsFromBuckets(
          batchPost, Seq("band", "bucket"), "doc", maxBucket)

        val batchSets = Dedup.shingleSets(batch, idCol, textCol, meta.shingleSize)
        // only the candidate old-docs' sets are fetched: one sets scan,
        // broadcast semi-join on the (batch-bounded) candidate id list
        val oldSets = spark.read.parquet(s"$indexPath/sets")
          .join(probeSide(cross.select(col("doc_b").as("doc")).distinct()),
            Seq("doc"), "left_semi")
        val sets = batchSets.unionByName(oldSets)

        Dedup.verifiedJaccardOnSets(sets, cross.unionByName(within), threshold)
          // restore the orientation flag the verifier drops: a pair is
          // cross iff its doc_b is not a batch doc (ids are disjoint)
          .join(probeSide(batch.select(col(idCol).as("_bid")).distinct()),
            col("doc_b") === col("_bid"), "left")
          .withColumn("is_cross", col("_bid").isNull)
          .drop("_bid")
    }
  }
}
