package graft.ops

import graft.SparkSpec

class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed add-k unigram perplexity") {
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramPerplexity(docs)
      .as[(Long, Long, Option[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // vocab a:2 b:1 c:1; total=4, V=3, denom = 4 + 0.5*4 = 6
    val (pa, pb, pc) = (2.5 / 6, 1.5 / 6, 1.5 / 6)
    val ppl1 = math.exp(-(2 * math.log(pa) + math.log(pb)) / 3)
    val ppl2 = math.exp(-math.log(pc))
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2.get - ppl1) < 1e-12)
    assert(out(2L)._1 == 1L && math.abs(out(2L)._2.get - ppl2) < 1e-12)
  }

  test("out-of-vocabulary words take the count-zero probability") {
    val docs = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramPerplexity(docs, vocabSize = 1)
      .as[(Long, Long, Option[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // kept vocab = {a}; total=4 (all tokens), V=1, denom = 4 + 0.5*2 = 5
    val punk = 0.5 / 5
    assert(math.abs(out(2L)._2.get - math.exp(-math.log(punk))) < 1e-12)
  }

  test("rare-word-heavy documents score higher perplexity") {
    val common = Seq.fill(30)("the data pipeline runs fast").mkString(" ")
    val docs = (Seq((1L, common), (2L, "the data pipeline runs fast"),
      (3L, "zyx qwv jkl mnop")).toDF("doc_id", "text"))
    val out = TextAnalysis.unigramPerplexity(docs)
      .as[(Long, Long, Option[Double])].collect().map(r => r._1 -> r._3.get).toMap
    assert(out(3L) > out(2L))
    assert(math.abs(out(1L) - out(2L)) < 1e-9) // same word distribution
  }

  test("token-less documents get NULL perplexity, zero tokens") {
    val docs = Seq((1L, "real words"), (2L, "!!! ...")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramPerplexity(docs)
      .as[(Long, Long, Option[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(2L) == ((0L, None)))
  }

  test("plan: the scoring pass is fully narrow — zero shuffles") {
    val docs = (1L to 50L).map(i => (i, s"w${i % 11} common words here"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.unigramPerplexity(docs)
    r.collect()
    assert(graft.PlanAudit.shuffles(r).isEmpty,
      "perplexity scoring must not shuffle")
  }
}
