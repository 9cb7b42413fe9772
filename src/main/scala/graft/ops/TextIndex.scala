package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.lake.{ClusteredWriter, Metastore}

/** Persisted inverted index serving BM25 retrieval — the index
  * [[TextAnalysis.bm25TopK]]'s scaladoc promises: at 100 TB with a
  * high-traffic query workload you don't re-scan the corpus per query
  * batch, you persist df/tf/dl postings CLUSTERED ON TERM and prune
  * each query's read to the files whose term range intersects the
  * query's terms. The contract that keeps the index honest: its
  * answers are BIT-IDENTICAL to the index-free operator's (same idf
  * longs, same IEEE operand order, same term-sorted summation), so the
  * same DuckDB oracle hash-verifies both forms.
  *
  * On-disk layout under `indexPath`:
  *   - `postings/` — `(term, doc, tf, dl)`, one row per (term,
  *     document) with tf ≥ 1; range-clustered on `term` through
  *     [[graft.lake.ClusteredWriter]].
  *   - `postings_stats/` — per-file [min,max] zone maps on `term`
  *     (parquet-footer harvest); what [[IndexRead.prunedRead]] prunes
  *     query scans with.
  *   - `docs/` — `(doc, dl)`, one row per ingested document INCLUDING
  *     token-less ones (they carry no postings but count toward N and
  *     Σdl); clustered on `doc` for the append path's idempotency
  *     anti-join.
  *   - `meta/` — `(n_docs, sum_dl)`: the corpus totals BM25's idf and
  *     avgdl need, maintained additively so a query never scans the
  *     corpus for them.
  *
  * Scale shape of a query batch (corpus n docs, q distinct query
  * terms, q ≪ vocabulary):
  *   - the postings read is zone-map-pruned to the files whose term
  *     interval intersects the q terms — O(q · files-per-term), not
  *     O(corpus); the prune decision is driver-side interval math over
  *     cached stats rows ([[IndexRead]]);
  *   - df comes from the SAME pruned read (count per term), avgdl/N
  *     from `meta/` — no corpus pass at all;
  *   - scoring touches only matching postings rows; the final per-query
  *     top-k window shuffles (query_id, doc, score) triplets of
  *     MATCHING docs, the same overwhelming filter as the brute form.
  *
  * Build cost is deliberately shuffle-light: per-doc term counts are
  * computed IN-ROW (O(distinct-terms · doc-length) per doc via
  * `filter`, the tf expression the brute scorer uses) rather than by
  * an explode + (doc, term) groupBy — the only exchange in the build
  * is the clustering range partition itself.
  */
object TextIndex {

  private case class Meta(nDocs: Long, sumDl: Long)

  // `meta`, not `_meta`: underscore-prefixed paths are hidden to
  // Spark's file listing (see IncrementalDedup.metaPath)
  private def metaPath(indexPath: String) = s"$indexPath/meta"
  private def postingsPath(indexPath: String) = s"$indexPath/postings"
  private def statsPath(indexPath: String) = s"$indexPath/postings_stats"
  private def docsPath(indexPath: String) = s"$indexPath/docs"
  private def docsStatsPath(indexPath: String) = s"$indexPath/docs_stats"

  // NOT cached across calls: unlike IncrementalDedup's signature
  // params, these totals change on every append
  private def readMeta(spark: SparkSession, indexPath: String): Meta = {
    val r = spark.read.json(metaPath(indexPath)).head()
    Meta(r.getAs[Long]("n_docs"), r.getAs[Long]("sum_dl"))
  }

  private def writeMeta(spark: SparkSession, indexPath: String, m: Meta): Unit = {
    import spark.implicits._
    Seq((m.nDocs, m.sumDl)).toDF("n_docs", "sum_dl")
      .coalesce(1).write.mode("overwrite").json(metaPath(indexPath))
  }

  /** `(doc, dl, term, tf)` rows for `docs` — tf computed in-row (the
    * same `size(filter(tk, = t))` expression the brute scorer uses, so
    * a stored tf and a freshly computed one are identical), token-less
    * docs dropped (no terms to post). */
  private def postingsOf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = TextAnalysis.tokensCol(col(textCol))
    docs
      .select(col(idCol).as("doc"), tk.as("_tk"))
      .select(col("doc"), size(col("_tk")).cast("long").as("dl"),
        explode(transform(array_distinct(col("_tk")), t =>
          struct(t.as("term"),
            size(filter(col("_tk"), x => x === t)).cast("long").as("tf")))).as("_p"))
      .select(col("_p.term").as("term"), col("doc"), col("_p.tf").as("tf"),
        col("dl"))
  }

  private def dlOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
      size(TextAnalysis.tokensCol(col(textCol))).cast("long").as("dl"))

  /** Builds (or replaces) the index at `indexPath` from `docs`.
    * `clusterFiles` targets ~128-512 MB per postings file at scale. */
  def build(docs: DataFrame, idCol: String, textCol: String,
            indexPath: String, clusterFiles: Int = 16): Unit = {
    val spark = docs.sparkSession
    TextAnalysis.requireFree(docs, "_tk", "_p")
    val dl = dlOf(docs, idCol, textCol)
    ClusteredWriter.write(postingsOf(docs, idCol, textCol),
      postingsPath(indexPath), "term", clusterFiles)
    ClusteredWriter.write(dl, docsPath(indexPath), "doc",
      math.max(1, clusterFiles / 4))
    Metastore.buildFromFooters(spark, postingsPath(indexPath), "term")
      .write.mode("overwrite").parquet(statsPath(indexPath))
    Metastore.buildFromFooters(spark, docsPath(indexPath), "doc")
      .write.mode("overwrite").parquet(docsStatsPath(indexPath))
    refreshMeta(spark, indexPath)
  }

  /** Recomputes `meta/` from the `docs/` table — one tiny aggregate
    * over (doc, dl) rows, O(corpus docs) not O(corpus bytes). The
    * recovery path for a crash that landed between [[append]]'s table
    * appends and its meta rewrite (queries in that window score with
    * slightly stale N/avgdl — retrieval still works, ranks may differ
    * at the margin until refresh). */
  def refreshMeta(spark: SparkSession, indexPath: String): Unit = {
    val r = spark.read.parquet(docsPath(indexPath))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("s")).head()
    writeMeta(spark, indexPath, Meta(r.getLong(0), r.getLong(1)))
  }

  /** Appends `batch` to the index. Idempotent by doc id: a doc the
    * index already holds (a replayed micro-batch) is skipped via an
    * anti-join against `docs/` — zone-map-pruned to the batch's ids,
    * the [[IncrementalDedup.ingest]] append discipline. Write order is
    * postings → docs → stats → meta. Crash windows, in order: after
    * the postings append but before the docs append, a replay re-posts
    * the same rows — tolerated, because [[bm25TopK]] dedups identical
    * (term, contribution) entries and counts df by distinct doc, so
    * duplicate postings never change a score; after the docs append
    * but before the meta rewrite, queries score with slightly stale
    * N/avgdl until [[refreshMeta]] (retrieval still works, marginal
    * ranks may differ). */
  def append(batch: DataFrame, idCol: String, textCol: String,
             indexPath: String): Unit = {
    val spark = batch.sparkSession
    TextAnalysis.requireFree(batch, "_tk", "_p")
    val meta = readMeta(spark, indexPath)
    def batchIds = batch.select(col(idCol)).distinct()
      .collect().map(_.get(0)).toSeq
    val fresh = batch.join(
        IndexRead.prunedRead(spark, docsPath(indexPath),
            docsStatsPath(indexPath), batchIds)
          .select(col("doc").as(idCol)),
        Seq(idCol), "left_anti")
      .persist()
    try {
      val delta = dlOf(fresh, idCol, textCol)
        .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("s")).head()
      if (delta.getLong(0) > 0) {
        val pBefore = IndexRead.listFiles(spark, postingsPath(indexPath)).toSet
        val dBefore = IndexRead.listFiles(spark, docsPath(indexPath)).toSet
        postingsOf(fresh, idCol, textCol)
          .sortWithinPartitions("term")
          .write.mode("append").parquet(postingsPath(indexPath))
        dlOf(fresh, idCol, textCol)
          .write.mode("append").parquet(docsPath(indexPath))
        IndexRead.upsertStats(spark, postingsPath(indexPath),
          statsPath(indexPath), "term",
          IndexRead.listFiles(spark, postingsPath(indexPath))
            .filterNot(pBefore))
        IndexRead.upsertStats(spark, docsPath(indexPath),
          docsStatsPath(indexPath), "doc",
          IndexRead.listFiles(spark, docsPath(indexPath))
            .filterNot(dBefore))
        writeMeta(spark, indexPath,
          Meta(meta.nDocs + delta.getLong(0), meta.sumDl + delta.getLong(1)))
      }
    } finally fresh.unpersist()
    ()
  }

  /** Compacts the index tables into `filesPerTable` files each via the
    * shared [[IndexRead.compactTable]] discipline (clustered rewrite,
    * SwapProtocol two-rename commit, stats replacement) — restores
    * probe-time zone-map pruning to build-time quality after append-era
    * files (each covering its batch's whole term range) accumulate.
    * The postings rewrite also folds away tolerated append-crash
    * redundancy: a replayed postings append leaves BIT-IDENTICAL
    * duplicate rows (score-neutral under [[bm25TopK]]'s distinct-fold,
    * but paid for in scan bytes) — `distinct()` here reclaims them.
    * `meta/` is untouched: totals don't change under a rewrite. */
  def compact(spark: SparkSession, indexPath: String,
              filesPerTable: Int = 8): Unit = {
    IndexRead.compactTable(spark, postingsPath(indexPath),
      statsPath(indexPath), "term", filesPerTable, _.distinct())
    IndexRead.compactTable(spark, docsPath(indexPath),
      docsStatsPath(indexPath), "doc",
      math.max(1, filesPerTable / 4))
  }

  /** Continuous index maintenance: appends each micro-batch to the
    * index — the retrieval twin of [[IncrementalDedup.ingestStream]].
    * Replay safety comes entirely from [[append]]'s idempotency-by-id
    * (a replayed batch anti-joins to nothing) plus the score-neutral
    * postings crash window documented there; state lives in the
    * on-disk index, so a restarted job serves queries against the full
    * ingested history immediately. Run [[compact]] periodically to
    * fold micro-batch files back into tight term ranges. */
  def ingestStream(stream: DataFrame, idCol: String, textCol: String,
                   indexPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try { if (!b.isEmpty) append(b, idCol, textCol, indexPath) }
        finally b.unpersist()
        ()
      }
      .start()

  /** BM25 top-k served FROM THE INDEX — same scoring contract as
    * [[TextAnalysis.bm25TopK]] (Okapi formula, integer idf inputs,
    * one-division avgdl, term-sorted IEEE summation), so for an index
    * holding exactly the corpus the two return bit-identical rows.
    * Term-sorted summation here means: per (query, doc), the matching
    * terms' contributions are collected, sorted by term, and folded in
    * order via `aggregate` — a zero-tf term contributes exactly 0.0 in
    * the brute fold, and x + 0.0 == x in IEEE for the non-negative
    * partial sums involved, so skipping absent terms preserves the
    * float result.
    *
    * Cost: two reads of the PRUNED postings (df aggregate + scoring) —
    * each O(query terms · files-per-term); `meta/` supplies N and
    * avgdl with no corpus pass.
    *
    * Returns (query_id, `idCol`, rank, score), rank 1-based, ties
    * broken by ascending id. */
  def bm25TopK(spark: SparkSession, indexPath: String,
               queries: Seq[(Long, String)], idCol: String = "doc_id",
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "no queries")
    val meta = readMeta(spark, indexPath)
    val n = meta.nDocs
    require(n > 0, "empty index")
    val avgdl = meta.sumDl.toDouble / n

    val qterms: Seq[(Long, Seq[String])] =
      queries.map { case (qid, q) => qid -> TextAnalysis.tokenizeQuery(q) }
    val allTerms: Seq[String] = qterms.flatMap(_._2).distinct.sorted
    require(allTerms.nonEmpty, "queries tokenize to no terms")

    def posts = IndexRead.prunedRead(spark, postingsPath(indexPath),
        statsPath(indexPath), allTerms)
      .where(col("term").isin(allTerms: _*)) // exact re-filter: may-contain prune

    // df per query term from the pruned read — a posting row exists
    // iff tf >= 1, so distinct-doc-per-term == the brute form's
    // array_contains df over the whole corpus (distinct, not count:
    // replayed appends may leave duplicate postings rows)
    val dfMap: Map[String, Long] = posts.groupBy("term")
      .agg(countDistinct(col("doc")).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def idf(t: String): Double = {
      val df = dfMap.getOrElse(t, 0L).toDouble
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }
    import spark.implicits._
    val qmap = qterms.flatMap { case (qid, ts) => ts.map(t => (qid, t, idf(t))) }
      .toDF("query_id", "term", "_idf")

    // per matching (query, doc, term): the brute scorer's contribution
    // expression verbatim (operand order is the float contract)
    val tf = col("tf").cast("double")
    val dl = col("dl").cast("double")
    val contrib: Column = col("_idf") * (tf * lit(k1 + 1.0)) /
      (tf + lit(k1) * (lit(1.0) - lit(b) + (lit(b) * dl) / lit(avgdl)))

    // array_distinct: a replayed append's duplicate posting is
    // BIT-IDENTICAL (same term/tf/dl, so same contribution struct) —
    // dedup before the fold keeps the crash window score-neutral
    val scores = posts.join(broadcast(qmap), Seq("term"))
      .select(col("query_id"), col("doc"), col("term"), contrib.as("_c"))
      .groupBy("query_id", "doc")
      .agg(sort_array(array_distinct(
        collect_list(struct(col("term"), col("_c"))))).as("_cs"))
      .select(col("query_id"), col("doc"),
        aggregate(col("_cs"), lit(0.0), (acc, x) => acc + x.getField("_c"))
          .as("score"))
      .where(col("score") > 0d)

    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc").asc)
    scores.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc").as(idCol), col("rank"), col("score"))
  }

  /** One-row health summary: `(n_docs, sum_dl, n_terms, n_postings,
    * postings_files)` — n_terms/n_postings by a full postings scan
    * (maintenance cost, not query cost). */
  def stats(spark: SparkSession, indexPath: String): DataFrame = {
    val meta = readMeta(spark, indexPath)
    val nFiles = IndexRead.listFiles(spark, postingsPath(indexPath)).size
    spark.read.parquet(postingsPath(indexPath))
      .agg(approx_count_distinct(col("term")).as("n_terms"),
        count(lit(1)).as("n_postings"))
      .select(lit(meta.nDocs).as("n_docs"), lit(meta.sumDl).as("sum_dl"),
        col("n_terms"), col("n_postings"), lit(nFiles).as("postings_files"))
  }
}
