package graft.ops

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark spark merge"),     // tf(spark)=2, dl=3
    (2L, "spark join"),            // tf(spark)=1, dl=2
    (3L, "merge only here"),       // dl=3
    (4L, "nothing relevant at all")) // dl=4

  private def topk(qs: Seq[(Long, String)], k: Int = 10) =
    TextAnalysis.bm25TopK(corpus.toDF("doc_id", "text"), qs, k = k)
      .as[(Long, Long, Int, Double)].collect().toSeq
      .sortBy(r => (r._1, r._3))

  test("scores match the hand-computed Okapi formula") {
    val got = topk(Seq(0L -> "spark"))
    // N=4, avgdl=12/4=3, df(spark)=2 -> idf = ln(1 + 2.5/2.5) = ln 2
    val idf = math.log(2.0)
    def s(tf: Double, dl: Double) =
      0.0 + idf * (tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dl) / 3.0))
    assert(got.map(_._2) == Seq(1L, 2L)) // tf=2 beats tf=1 (dl nearly equal)
    assert(math.abs(got(0)._4 - s(2, 3)) < 1e-12)
    assert(math.abs(got(1)._4 - s(1, 2)) < 1e-12)
  }

  test("docs sharing no query term never appear") {
    val got = topk(Seq(0L -> "spark merge"))
    assert(!got.exists(_._2 == 4L))
    assert(got.map(_._2).toSet == Set(1L, 2L, 3L))
  }

  test("multi-term scores are the sorted-order sum of per-term scores") {
    val both = topk(Seq(0L -> "merge spark"))
    val merge = topk(Seq(0L -> "merge")).map(r => r._2 -> r._4).toMap
    val sparkT = topk(Seq(0L -> "spark")).map(r => r._2 -> r._4).toMap
    for ((_, doc, _, score) <- both) {
      val expect = merge.getOrElse(doc, 0.0) + sparkT.getOrElse(doc, 0.0)
      assert(math.abs(score - expect) < 1e-12, s"doc $doc")
    }
  }

  test("k caps each query independently; rank is 1-based and dense") {
    val got = topk(Seq(0L -> "spark merge", 1L -> "merge"), k = 2)
    assert(got.count(_._1 == 0L) == 2)
    assert(got.filter(_._1 == 0L).map(_._3) == Seq(1, 2))
    assert(got.filter(_._1 == 1L).map(_._3).forall(_ <= 2))
  }

  test("rare terms outrank common ones (idf ordering)") {
    val docs = Seq(
      (1L, "common common rare"),
      (2L, "common x"), (3L, "common y"), (4L, "common z"))
    val got = TextAnalysis.bm25TopK(docs.toDF("doc_id", "text"),
        Seq(0L -> "rare common"), k = 4)
      .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
    assert(got.head._2 == 1L) // the only doc with the rare term wins
  }

  test("plan: the scoring pass shuffles (query_id, id, score) triplets, never text") {
    val docs = (1L to 60L).map(i => (i, s"spark merge w${i % 9} x${i % 4}"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bm25TopK(docs, Seq(0L -> "spark merge", 1L -> "merge"), k = 5)
    r.collect()
    val bad = graft.PlanAudit.stringShuffles(r)
    assert(bad.isEmpty, s"bm25 shuffled text: $bad")
  }

  test("query terms absent from the corpus yield no rows, not errors") {
    assert(topk(Seq(0L -> "zzz qqq")).isEmpty)
  }
}
