package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Streaming banded-MinHash near-dup: candidates across batches,
  * signature-agreement estimates, bounded per-bucket state, and
  * banding consistency with the batch pipeline. */
class NearDupStreamSpec extends SparkSpec {

  private def runStream(rows: Seq[Seq[(Long, String)]], name: String,
                        threshold: Double = 0.5,
                        maxBucket: Int = 1000,
                        stateTtl: Option[String] = Dedup.DefaultStreamStateTtl,
                        betweenBatches: () => Unit = () => ()): Set[(Long, Long, Double)] = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    // Processing-time timers ask the engine for a wake-up batch EVERY
    // batch (FlatMapGroupsWithStateExec.shouldRunAnotherBatch is
    // unconditionally true for ProcessingTimeTimeout), so with no-data
    // micro-batches enabled `processAllAvailable` never latches "no new
    // data" and hangs while the engine spins empty batches. The spec
    // drives every batch explicitly, so timers firing on DATA batches —
    // what this conf leaves — is exactly the semantics asserted below.
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val ndPrev = spark.conf.get(ndKey)
    spark.conf.set(ndKey, "false")
    val q = Dedup.nearDupStream(stream.toDS().toDF("doc_id", "text"),
        "doc_id", "text", threshold = threshold, maxBucket = maxBucket,
        stateTtl = stateTtl)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try rows.zipWithIndex.foreach { case (batch, i) =>
      if (i > 0) betweenBatches()
      stream.addData(batch: _*); q.processAllAvailable()
    }
    finally { q.stop(); spark.conf.set(ndKey, ndPrev) }
    spark.table(name)
      .select("doc_a", "doc_b", "est_jaccard").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("identical docs pair across batches at est 1.0; unrelated don't; empties drop") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val got = runStream(Seq(
      Seq(1L -> text, 2L -> "completely different content about spark and parquet files"),
      Seq(3L -> text, 4L -> "", 5L -> "!!! ???")), "neardup_basic")
    val pairs = got.map(p => (p._1, p._2))
    assert(pairs.contains((1L, 3L)), s"identical cross-batch pair missing from $pairs")
    assert(got.collect { case (1L, 3L, e) => e }.forall(_ === 1.0),
      "identical content must estimate J = 1.0 (all slots agree)")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), "unrelated doc must not pair")
    assert(!pairs.exists(p => Set(p._1, p._2).exists(Set(4L, 5L))),
      "token-less docs have no signature and must emit nothing")
  }

  test("streaming banding matches the batch pipeline's candidate blocking") {
    // the stream's Scala-side band fold must reproduce the batch
    // MinHashBandBuckets fold exactly — same (band, bucket) keys means
    // the stream finds exactly the pairs the batch pipeline would block
    // together (modulo arrival order); pin it on real fixture text
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
    val batchPairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamPairs = runStream(
        Seq(docs.collect().map(r => r.getLong(0) -> r.getString(1)).toSeq),
        "neardup_batch_parity", threshold = 0.0)
      .map(p => (p._1, p._2))
    // threshold 0.0 emits every in-bucket pair → must cover the batch
    // candidate set exactly (both sides are the same blocking)
    assert(streamPairs === batchPairs,
      s"stream/batch blocking diverged: stream-only=${streamPairs -- batchPairs}, " +
        s"batch-only=${batchPairs -- streamPairs}")
  }

  test("per-bucket registry is FIFO-bounded: evicted docs stop matching") {
    // identical text → every doc lands in the same buckets; cap 2 keeps
    // only the 2 newest signatures per bucket, so doc 1 is evicted by
    // the time doc 4 arrives — (1,4) must NOT pair, (3,4) must
    val text = "some very repetitive boilerplate text shared by every document here"
    val got = runStream(Seq(
      Seq(1L -> text), Seq(2L -> text), Seq(3L -> text), Seq(4L -> text)),
      "neardup_evict", maxBucket = 2)
    val pairs = got.map(p => (p._1, p._2))
    assert(pairs.contains((3L, 4L)) && pairs.contains((2L, 3L)))
    assert(!pairs.contains((1L, 4L)),
      s"doc 1 must be evicted from the cap-2 registry before doc 4 arrives; got $pairs")
  }

  test("state TTL is armed by default and evicts idle buckets") {
    // the DEFAULT configuration must bound bucket-key state: the
    // parameter-level contract is that unbounded state is an explicit
    // opt-in (stateTtl = None), never the consequence of omitting an
    // argument
    assert(Dedup.DefaultStreamStateTtl.isDefined,
      "nearDupStream must default to a bounded-state TTL")

    // behavioral pin at a spec-sized TTL (the 30-minute default is the
    // same code path — ProcessingTimeTimeout with setTimeoutDuration):
    // doc 1's bucket goes idle past the TTL, a keep-alive batch fires
    // the timeout and removes the registry, so the identical doc 3
    // arrives into an EMPTY bucket and must not pair with doc 1 —
    // exactly the state that would have accrued forever without the TTL
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val got = runStream(Seq(
        Seq(1L -> text),
        Seq(2L -> "completely unrelated filler content about parquet row groups"),
        Seq(3L -> text)),
      "neardup_ttl", stateTtl = Some("1 second"),
      betweenBatches = () => Thread.sleep(1500))
    val pairs = got.map(p => (p._1, p._2))
    assert(!pairs.contains((1L, 3L)),
      s"doc 1's idle bucket must time out before doc 3 arrives; got $pairs")

    // control: same cadence with TTL explicitly disabled — the pair
    // survives, proving the eviction above was the TTL, not the cadence
    val kept = runStream(Seq(
        Seq(11L -> text),
        Seq(12L -> "completely unrelated filler content about parquet row groups"),
        Seq(13L -> text)),
      "neardup_no_ttl", stateTtl = None,
      betweenBatches = () => Thread.sleep(1500))
    assert(kept.map(p => (p._1, p._2)).contains((11L, 13L)),
      s"without a TTL the idle bucket must persist; got $kept")
  }
}
