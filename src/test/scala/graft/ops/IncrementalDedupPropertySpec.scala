package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model-based property test for the incremental ingest loop: a seeded
  * random corpus (mutation-planted near-dups; the closest pairs to the
  * t=0.5 boundary sit at J ≈ 0.54, where the b=32/r=2 candidate-miss
  * probability is ~2e-5 per pair — and the seed is FIXED, so the run
  * is deterministic, not 2e-5-flaky) is ingested batch by batch; the accepted set must then satisfy the
  * two defining invariants of greedy online dedup against the EXACT
  * pair graph:
  *
  *   1. INDEPENDENCE — no kept doc matches anything accepted before it
  *      (the initial corpus, earlier batches' kept docs, or smaller-id
  *      docs kept in its own batch);
  *   2. DOMINATION — every dropped doc matches at least one doc that
  *      was accepted at the moment of its verdict.
  *
  * Together these say the kept set is a maximal independent set w.r.t.
  * the processing order — the semantic contract incremental ingest
  * shares with the batch keeper policy, checked here across 3 batches
  * and a compaction (which must change file counts, never verdicts). */
class IncrementalDedupPropertySpec extends SparkSpec {

  import spark.implicits._

  test("sequential ingest keeps a maximal independent set; compact preserves probes") {
    val rng = new scala.util.Random(20260813L)
    val vocab = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
      "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
      "victor", "whiskey", "xray", "yankee", "zulu", "anchor", "beacon",
      "cinder", "dagger", "ember", "fathom", "grove", "harbor", "inlet",
      "jasper", "keel", "lumen", "marrow", "nectar", "onyx", "pike",
      "quill", "ridge", "slate", "thorn", "umbra", "vault", "willow", "zephyr")
    def sentence(): Array[String] = Array.fill(12)(vocab(rng.nextInt(vocab.length)))
    // 60 docs; after the first 10, half are 1-2-token mutations of an
    // earlier doc (1-token mutations land at J ≈ 0.54-0.7, 2-token at
    // ≈ 0.25-0.54; unrelated random docs at J ≈ 0.1) — pairs above the
    // threshold are candidate-missed with prob ≤ ~2e-5 each, and the
    // fixed seed makes the outcome deterministic either way
    val texts = scala.collection.mutable.ArrayBuffer[Array[String]]()
    for (i <- 0 until 60) {
      if (i >= 10 && rng.nextBoolean()) {
        val base = texts(rng.nextInt(texts.length)).clone()
        for (_ <- 0 to rng.nextInt(2)) base(rng.nextInt(base.length)) = vocab(rng.nextInt(vocab.length))
        texts += base
      } else texts += sentence()
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }.toSeq
    val df = docs.toDF("doc_id", "text")

    // exact pair graph over the full corpus at the ingest threshold
    val exactPairs = Dedup.ngramJaccard(df, "doc_id", "text", n = 3,
        threshold = 0.5, maxShingleDf = 1000)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    def partners(d: Long): Set[Long] = exactPairs.getOrElse(d, Set.empty)

    val idx = tmpDir("incr_prop_idx")
    val accepted0 = docs.take(30).map(_._1).toSet
    IncrementalDedup.buildIndex(df.where(col("doc_id") < 30), "doc_id", "text",
      idx, numHashes = 64, bands = 32)

    var acceptedBefore = accepted0 // everything accepted before the current batch
    val allKept = scala.collection.mutable.Set[Long]()
    val allDropped = scala.collection.mutable.Map[Long, Set[Long]]() // doc -> accepted-at-verdict
    for (b <- 0 until 3) {
      val ids = (30 + b * 10) until (30 + (b + 1) * 10)
      val batch = df.where(col("doc_id") >= ids.head && col("doc_id") <= ids.last)
      val verdicts = IncrementalDedup.ingest(batch, "doc_id", "text", idx,
          threshold = 0.5, appendKept = true)
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      val keptNow = verdicts.filter(_._2).keySet
      for (d <- ids.map(_.toLong)) {
        val acceptedAtVerdict = acceptedBefore ++ keptNow.filter(_ < d)
        if (verdicts(d)) {
          assert(partners(d).intersect(acceptedAtVerdict).isEmpty,
            s"INDEPENDENCE violated: kept $d matches ${partners(d).intersect(acceptedAtVerdict)}")
        } else {
          allDropped(d) = acceptedAtVerdict
        }
      }
      allKept ++= keptNow
      acceptedBefore ++= keptNow
    }
    for ((d, acceptedAtVerdict) <- allDropped) {
      assert(partners(d).intersect(acceptedAtVerdict).nonEmpty,
        s"DOMINATION violated: dropped $d matches none of the accepted set")
    }
    assert(allKept.nonEmpty && allDropped.nonEmpty,
      s"fixture must exercise both verdicts (kept=${allKept.size}, dropped=${allDropped.size})")

    // compaction: file counts change, probe results do not
    val probe = df.where(col("doc_id") >= 55)
    val before = IncrementalDedup.ingestPairs(probe, "doc_id", "text", idx, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    IncrementalDedup.compact(spark, idx, filesPerTable = 2)
    assert(spark.read.parquet(s"$idx/postings").inputFiles.length === 2)
    assert(spark.read.parquet(s"$idx/sets").inputFiles.length === 2)
    val after = IncrementalDedup.ingestPairs(probe, "doc_id", "text", idx, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before, "compaction must never change probe results")

    // stats sanity: doc count = initial accepted + all kept
    val st = IncrementalDedup.indexStats(spark, idx).collect().head
    assert(st.getAs[Long]("n_docs") === (accepted0.size + allKept.size).toLong)
    assert(st.getAs[Long]("n_files_postings") === 2L)
  }
}
