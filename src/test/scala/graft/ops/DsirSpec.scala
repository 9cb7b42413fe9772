package graft.ops

import graft.{PlanAudit, SparkSpec}
import org.apache.spark.sql.functions._

/** DSIR importance weighting + Gumbel resampling. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha alpha beta", "tgt"),
    (2L, "alpha beta beta", "tgt"),
    (3L, "gamma gamma delta", "raw"),
    (4L, "delta delta gamma", "raw"),
    (5L, "alpha gamma", "raw"),
    (6L, "", "raw")
  ).toDF("doc_id", "text", "source")

  private def model = Dsir.train(
    corpus.where(col("source") === "tgt"), corpus, vocabSize = 100)

  test("target-heavy words carry positive log ratio, raw-only words negative") {
    val m = model
    assert(m.logRatio("alpha") > 0, "alpha dominates the target")
    assert(m.logRatio("gamma") < 0, "gamma never appears in the target")
    // vocabulary covers all distinct raw words (alpha/beta/gamma/delta)
    assert(m.vocabSize == 4 && m.logRatio.size == 4)
  }

  test("logWeights: ordered fold, empty doc scores 0.0, weight ranks target-like docs up") {
    val w = Dsir.logWeights(corpus, model)
      .select("doc_id", "n_tokens", "dsir_logw")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(w(6L) == ((0L, 0.0)))
    // doc 1 (pure target vocabulary) outranks doc 3 (pure raw-only)
    assert(w(1L)._2 > w(3L)._2)
    // hand-check doc 5 = lr(alpha) + lr(gamma), in that order
    val m = model
    assert(math.abs(w(5L)._2 - (m.logRatio("alpha") + m.logRatio("gamma"))) < 1e-12)
  }

  test("the scoring pass is shuffle-free (model rides as a plan literal)") {
    val scored = Dsir.logWeights(corpus, model)
    assert(PlanAudit.shuffles(scored).isEmpty,
      "logWeights must not exchange — the model is a literal, the fold is narrow")
  }

  test("OOV tokens score the shared OOV ratio") {
    val m = model
    val w = Dsir.logWeights(Seq((9L, "zzz zzz")).toDF("doc_id", "text"), m)
      .select("dsir_logw").as[Double].head()
    assert(math.abs(w - 2 * m.oovLogRatio) < 1e-12)
  }

  test("resample: deterministic, n-bounded, and monotone in the weight") {
    val w = Dsir.logWeights(corpus, model)
    val a = Dsir.resample(w, n = 3).select("doc_id").as[Long].collect().toSet
    val b = Dsir.resample(w, n = 3).select("doc_id").as[Long].collect().toSet
    assert(a == b && a.size == 3)
    // boosting one doc's weight far enough always pulls it in
    val boosted = w.withColumn("dsir_logw",
      when(col("doc_id") === 4L, lit(1e6)).otherwise(col("dsir_logw")))
    assert(Dsir.resample(boosted, n = 1).select("doc_id").as[Long].head() == 4L)
  }

  test("train caps the vocabulary deterministically by raw count desc, word asc") {
    val m = Dsir.train(corpus.where(col("source") === "tgt"), corpus, vocabSize = 2)
    // raw counts: alpha 4, beta 3, gamma 4, delta 3 → top-2 = alpha, gamma
    assert(m.logRatio.keySet == Set("alpha", "gamma"))
    assert(m.vocabSize == 2)
  }
}
