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
                        maxBucket: Int = 1000): Set[(Long, Long, Double)] = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = Dedup.nearDupStream(stream.toDS().toDF("doc_id", "text"),
        "doc_id", "text", threshold = threshold, maxBucket = maxBucket)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try rows.foreach { batch => stream.addData(batch: _*); q.processAllAvailable() }
    finally q.stop()
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
}
