package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted BM25 index's defining property: indexing changes WHERE
  * df/tf/dl live, never WHAT a query scores — index-served answers are
  * bit-identical to [[TextAnalysis.bm25TopK]] on the same corpus. */
class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark merge batch pipelines shuffle spark"),
    (2L, "window sort key ranges and batch windows"),
    (3L, "hash table scan over sorted spark tables"),
    (4L, "merge sort join against the hash table"),
    (5L, ""), // token-less: carries no postings, counts toward N/avgdl
    (6L, "unrelated prose about watermarks and sessions"),
    (7L, "spark spark spark merge merge batch"),
    (8L, "key value scan with window functions")
  ).toDF("doc_id", "text")

  private val queries = Seq(0L -> "spark merge batch",
    1L -> "window sort key", 2L -> "hash table scan")

  private def brute(docs: DataFrame, k: Int = 10) =
    TextAnalysis.bm25TopK(docs, queries, k = k)
      .as[(Long, Long, Int, Double)].collect().toSeq.sortBy(r => (r._1, r._3))

  private def served(idx: String, k: Int = 10) =
    TextIndex.bm25TopK(spark, idx, queries, k = k)
      .as[(Long, Long, Int, Double)].collect().toSeq.sortBy(r => (r._1, r._3))

  test("index-served answers are bit-identical to the brute operator") {
    val idx = tmpDir("txtidx_parity")
    TextIndex.build(corpus, "doc_id", "text", idx)
    val got = served(idx)
    val want = brute(corpus)
    assert(got.nonEmpty)
    assert(got === want) // exact — scores compared at full double precision
  }

  test("build + append equals build on the union, bit-identically") {
    val a = corpus.where(col("doc_id") <= 4)
    val b = corpus.where(col("doc_id") > 4)
    val idx = tmpDir("txtidx_append")
    TextIndex.build(a, "doc_id", "text", idx)
    TextIndex.append(b, "doc_id", "text", idx)
    assert(served(idx) === brute(corpus))
  }

  test("a replayed append changes nothing (idempotent by doc id)") {
    val a = corpus.where(col("doc_id") <= 4)
    val b = corpus.where(col("doc_id") > 4)
    val idx = tmpDir("txtidx_replay")
    TextIndex.build(a, "doc_id", "text", idx)
    TextIndex.append(b, "doc_id", "text", idx)
    val once = served(idx)
    TextIndex.append(b, "doc_id", "text", idx) // replay
    assert(served(idx) === once)
    // and the totals did not double-count
    val st = TextIndex.stats(spark, idx).head()
    assert(st.getLong(0) === corpus.count())
  }

  test("token-less docs count toward N and avgdl (the brute semantics)") {
    // drop doc 5 from a copy; the scores must DIFFER from the full
    // corpus build — proving the index really carries N/avgdl and not
    // just postings
    val without = corpus.where(col("doc_id") =!= 5)
    val idxFull = tmpDir("txtidx_n_full")
    val idxLess = tmpDir("txtidx_n_less")
    TextIndex.build(corpus, "doc_id", "text", idxFull)
    TextIndex.build(without, "doc_id", "text", idxLess)
    assert(served(idxFull) === brute(corpus))
    assert(served(idxLess) === brute(without))
    assert(served(idxFull) !== served(idxLess))
  }

  test("query scan is zone-map-pruned to the query terms' files") {
    // many docs, vocabulary spread so term ranges split across files
    val big = (1L to 400L)
      .map(i => (i, s"w${"%03d".format(i % 97)} x${"%03d".format(i % 89)} " +
        s"y${"%03d".format(i % 83)} spark merge"))
      .toDF("doc_id", "text")
    val idx = tmpDir("txtidx_prune")
    TextIndex.build(big, "doc_id", "text", idx, clusterFiles = 8)
    val saved = IndexRead.minPruneBytes
    IndexRead.minPruneBytes = 0L
    try {
      // a query whose terms sit in a narrow range of the term space
      val r = TextIndex.bm25TopK(spark, idx, Seq(0L -> "w001 w002"), k = 5)
      r.collect()
      val (read, total) = IndexRead.lastPrune.get(s"$idx/postings")
      assert(total === 8)
      assert(read < total, s"expected a pruned read, got $read/$total")
      // and pruning never changes answers
      val full = TextAnalysis.bm25TopK(big, Seq(0L -> "w001 w002"), k = 5)
        .as[(Long, Long, Int, Double)].collect().toSeq.sortBy(_._3)
      val got = r.as[(Long, Long, Int, Double)].collect().toSeq.sortBy(_._3)
      assert(got === full)
    } finally IndexRead.minPruneBytes = saved
  }

  test("refreshMeta recovers totals from the docs table") {
    val idx = tmpDir("txtidx_meta")
    TextIndex.build(corpus, "doc_id", "text", idx)
    // simulate the crash window: clobber meta with wrong totals
    Seq((1L, 1L)).toDF("n_docs", "sum_dl")
      .coalesce(1).write.mode("overwrite").json(s"$idx/meta")
    assert(served(idx) !== brute(corpus)) // stale totals really bite
    TextIndex.refreshMeta(spark, idx)
    assert(served(idx) === brute(corpus))
  }

  test("compact folds replayed-append duplicates and keeps answers bit-identical") {
    val a = corpus.where(col("doc_id") <= 4)
    val b = corpus.where(col("doc_id") > 4)
    val idx = tmpDir("txtidx_compact")
    TextIndex.build(a, "doc_id", "text", idx)
    TextIndex.append(b, "doc_id", "text", idx)
    val want = served(idx)
    val posts = s"$idx/postings"
    val clean = spark.read.parquet(posts).count()
    // simulate the documented crash window: a replayed postings append
    // leaves bit-identical duplicate rows (docs/ not yet written when
    // the driver died). Scores must survive the duplicates (the
    // distinct-fold claim)...
    spark.read.parquet(posts)
      .where(col("doc") > 4).write.mode("append").parquet(posts)
    assert(spark.read.parquet(posts).count() > clean)
    assert(served(idx) === want)
    // ...and compact must reclaim them without changing answers
    TextIndex.compact(spark, idx, filesPerTable = 4)
    assert(spark.read.parquet(posts).count() === clean)
    assert(spark.read.parquet(posts).inputFiles.length === 4)
    assert(served(idx) === want)
  }

  test("compact restores pruning quality after appends") {
    // appends write files covering each batch's WHOLE term range; after
    // compact the ranges are disjoint again and a narrow query reads
    // fewer files than it did pre-compact
    val big = (1L to 400L)
      .map(i => (i, s"w${"%03d".format(i % 97)} x${"%03d".format(i % 89)} spark"))
      .toDF("doc_id", "text")
    val idx = tmpDir("txtidx_compact_prune")
    TextIndex.build(big.where(col("doc_id") <= 100), "doc_id", "text", idx,
      clusterFiles = 4)
    (1 to 3).foreach { i =>
      TextIndex.append(big.where(col("doc_id") > i * 100 &&
        col("doc_id") <= (i + 1) * 100), "doc_id", "text", idx)
    }
    val saved = IndexRead.minPruneBytes
    IndexRead.minPruneBytes = 0L
    try {
      def probeFiles(): (Int, Int) = {
        TextIndex.bm25TopK(spark, idx, Seq(0L -> "w001 w002"), k = 5).collect()
        IndexRead.lastPrune.get(s"$idx/postings")
      }
      val (readBefore, totalBefore) = probeFiles()
      // each append-era file spans the full term space: none prune away
      assert(totalBefore > 4)
      TextIndex.compact(spark, idx, filesPerTable = 8)
      val (readAfter, totalAfter) = probeFiles()
      assert(totalAfter === 8)
      assert(readAfter < totalAfter, "compacted ranges must prune")
      assert(readAfter < readBefore || readBefore === totalBefore,
        s"compact must not worsen pruning: $readBefore/$totalBefore -> $readAfter/$totalAfter")
      // and answers still match the brute operator end to end
      assert(TextIndex.bm25TopK(spark, idx, queries, k = 10)
          .as[(Long, Long, Int, Double)].collect().toSeq.sortBy(r => (r._1, r._3))
        === TextAnalysis.bm25TopK(big, queries, k = 10)
          .as[(Long, Long, Int, Double)].collect().toSeq.sortBy(r => (r._1, r._3)))
    } finally IndexRead.minPruneBytes = saved
  }

  test("ingestStream maintains the index; a restart replays safely") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = tmpDir("txtidx_stream")
    TextIndex.build(corpus.where(col("doc_id") <= 4), "doc_id", "text", idx)
    val stream = MemoryStream[(Long, String)]
    val ckpt = tmpDir("txtidx_stream_ckpt")
    val q = TextIndex.ingestStream(
      stream.toDS().toDF("doc_id", "text"), "doc_id", "text", idx, ckpt)
    try {
      stream.addData((5L, ""), (6L, "unrelated prose about watermarks and sessions"))
      q.processAllAvailable()
      stream.addData((7L, "spark spark spark merge merge batch"),
        (8L, "key value scan with window functions"))
      q.processAllAvailable()
    } finally q.stop()
    assert(served(idx) === brute(corpus))
    // a replayed batch (new query, same checkpoint semantics: append is
    // id-idempotent) changes nothing
    TextIndex.append(corpus.where(col("doc_id") > 6), "doc_id", "text", idx)
    assert(served(idx) === brute(corpus))
    assert(TextIndex.stats(spark, idx).head().getLong(0) === corpus.count())
  }

  test("plan: the query path shuffles no text bytes") {
    val idx = tmpDir("txtidx_plan")
    TextIndex.build(corpus, "doc_id", "text", idx)
    val r = TextIndex.bm25TopK(spark, idx, queries, k = 5)
    r.collect()
    val bad = graft.PlanAudit.stringShuffles(r)
    // the postings exchange carries `term` strings (short tokens, the
    // index key) — but never document text
    assert(!bad.exists(_.contains("text")), s"query shuffled doc text: $bad")
  }
}
