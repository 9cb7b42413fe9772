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
