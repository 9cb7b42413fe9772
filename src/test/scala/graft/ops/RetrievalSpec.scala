package graft.ops

import graft.{PlanAudit, SparkSpec}
import org.apache.spark.sql.functions._

/** RRF fusion: the formula, missing-list behavior, determinism, and
  * the one-exchange plan shape. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def lex = Seq(
    (0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3),
    (1L, 20L, 1), (1L, 21L, 2)
  ).toDF("query_id", "doc_id", "rank")

  private def vec = Seq(
    (0L, 11L, 1), (0L, 13L, 2),
    (1L, 21L, 1), (1L, 20L, 2)
  ).toDF("query_id", "doc_id", "rank")

  test("rrf score is the exact reciprocal-rank sum; two-list voters outrank singles") {
    val out = Retrieval.rrfFuse(Seq(lex, vec), k = 10)
      .select("query_id", "doc_id", "rank", "rrf_score", "n_lists")
      .as[(Long, Long, Int, Double, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // doc 11: rank 2 lexically + rank 1 vectorially
    val exp11 = 1.0 / 62 + 1.0 / 61
    assert(math.abs(out((0L, 11L))._2 - exp11) < 1e-15)
    assert(out((0L, 11L))._1 == 1 && out((0L, 11L))._3 == 2) // fused #1, both lists
    // doc 10: lexical #1 only — beaten by the two-list doc 11
    assert(out((0L, 10L))._2 == 1.0 / 61 && out((0L, 10L))._1 == 2)
    // query 1: 20 and 21 each hold {1,2} across the lists — tied rrf,
    // id-asc tiebreak
    assert(out((1L, 20L))._1 == 1 && out((1L, 21L))._1 == 2)
    assert(out((1L, 20L))._2 == out((1L, 21L))._2)
  }

  test("k bounds the fused list per query; n_lists counts the voters") {
    val out = Retrieval.rrfFuse(Seq(lex, vec), k = 2)
    assert(out.groupBy("query_id").count().select(max("count")).as[Long].head() == 2L)
    val single = out.where(col("doc_id") === 10L).select("n_lists").as[Int].head()
    assert(single == 1)
  }

  test("fusion is one keyed exchange + one window — no join, no corpus touch") {
    val out = Retrieval.rrfFuse(Seq(lex, vec), k = 10)
    // union → hash-agg on (query, doc) → window on query: the agg and
    // window share the query_id-prefixed key, so ≤ 2 exchanges appear
    // and neither is a broadcast/cartesian of anything corpus-like
    assert(PlanAudit.shuffles(out).size <= 2, PlanAudit.shuffles(out).mkString("; "))
  }

  test("fusing a list with itself doubles scores but keeps the order") {
    val once = Retrieval.rrfFuse(Seq(lex), k = 10)
      .select("query_id", "doc_id", "rank").as[(Long, Long, Int)].collect().toSet
    val twice = Retrieval.rrfFuse(Seq(lex, lex), k = 10)
      .select("query_id", "doc_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(once == twice)
  }
}
