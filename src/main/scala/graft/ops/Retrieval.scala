package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combine ranked lists from
  * DIFFERENT scorers (lexical BM25, embedding cosine, …) into one
  * ranking per query with Reciprocal Rank Fusion (public method:
  * Cormack/Clarke/Büttcher, "Reciprocal Rank Fusion outperforms
  * Condorcet and individual rank learning methods", SIGIR 2009):
  *
  *   rrf(d) = Σ_lists 1 / (k0 + rank_list(d))
  *
  * RRF is the standard way to marry [[TextAnalysis.bm25TopK]] /
  * [[TextIndex]] with [[Similarity]] / [[VectorIndex]] answers — rank
  * is scale-free, so no per-scorer calibration is needed, and a
  * document missing from a list simply contributes nothing (the
  * reference engine has no retrieval surface at all; this completes
  * the engine's own: brute + indexed lexical, brute + indexed vector,
  * and now their fusion).
  *
  * Scale shape: the inputs are ALREADY top-candK lists (each the
  * output of a bounded, possibly index-pruned search), so fusion
  * touches Σ |lists|·candK rows per query — never a corpus. One union,
  * one (query, doc) aggregate, one per-query window over ≤ Σ candK
  * candidates: a single keyed exchange end to end. Determinism: ranks
  * are ints and 1/(k0+rank) sums over a handful of doubles are
  * order-exact for two lists (and tie-broken by id for any), so the
  * fused ranking is reproducible and ANSI-oracle-expressible.
  */
object Retrieval {

  /** Fuse ranked lists into a per-query RRF top-`k`.
    *
    * Every input must expose `(query_id, idCol, rank)` with rank
    * 1-based within its own (list, query) — exactly the shape
    * [[TextAnalysis.bm25TopK]], [[TextIndex.topK]],
    * [[Similarity.bruteForceTopK]] and [[VectorIndex.topK]] return
    * (rename the id column to a shared name first). Returns
    * `(query_id, idCol, rank, rrf_score, n_lists)` — `n_lists` = how
    * many input lists voted for the document, the standard diagnostic
    * for why a fused hit surfaced. Ties (documents with equal rrf)
    * break by ascending id, the library-wide convention. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String = "doc_id",
              k: Int = 10, k0: Double = 60.0): DataFrame = {
    require(lists.nonEmpty, "no ranked lists to fuse")
    require(k > 0 && k0 > 0, "k and k0 must be positive")
    val cols = Seq("query_id", idCol, "rank")
    val contrib = lists
      .map(_.select(cols.head, cols.tail: _*))
      .reduce(_ unionByName _)
      .withColumn("_rr", lit(1.0) / (lit(k0) + col("rank").cast("double")))
    val fused = contrib
      .groupBy("query_id", idCol)
      .agg(sum(col("_rr")).as("rrf_score"), count(lit(1)).cast("int").as("n_lists"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col(idCol).asc)
    fused
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("rank"),
        col("rrf_score"), col("n_lists"))
  }
}
