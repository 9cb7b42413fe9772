package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityTrainerSpec extends SparkSpec {

  import QualityTrainer._

  // a linearly separable toy corpus: fluent docs full of 'alpha', spam
  // docs full of 'spam'
  private def corpus() = {
    import spark.implicits._
    Seq(
      (1L, "alpha alpha alpha beta", 1),
      (2L, "alpha beta alpha alpha", 1),
      (3L, "alpha alpha beta beta", 1),
      (4L, "spam spam spam beta", 0),
      (5L, "spam beta spam spam", 0),
      (6L, "spam spam beta beta", 0)).toDF("doc_id", "text", "label")
  }

  test("training separates a separable corpus; loss falls; signs correct") {
    val docs = corpus()
    val r3 = train(docs, Seq("alpha", "spam"), col("label") === 1, epochs = 3, lr = 5.0)
    val r30 = train(docs, Seq("alpha", "spam"), col("label") === 1, epochs = 30, lr = 5.0)
    assert(r30.loss < r3.loss, s"loss must fall with epochs: ${r3.loss} -> ${r30.loss}")
    assert(r30.nCorrect === 6L && r30.n === 6L)
    val w = r30.lexicon.toMap
    assert(w("alpha") > 0 && w("spam") < 0,
      s"signs must track the labels: $w")
  }

  test("trained weights slot into lexiconScore unchanged") {
    val docs = corpus()
    val r = train(docs, Seq("alpha", "spam"), col("label") === 1, epochs = 10, lr = 5.0)
    // lexiconScore's sigmoid(bias + sum w(tok)/n) IS sigmoid(margin):
    // per-occurrence sum over tokens == sum_k w_k * count_k / n
    val scored = TextAnalysis.lexiconScore(docs, r.lexicon, bias = r.bias)
      .select(col("doc_id"), col("lex_score"), col("label")).collect()
    scored.foreach { row =>
      val s = row.getDouble(1)
      if (row.getInt(2) == 1) assert(s > 0.5, s"doc ${row.getLong(0)} scored $s")
      else assert(s < 0.5, s"doc ${row.getLong(0)} scored $s")
    }
  }

  test("quantized gradients make training partitioning-invariant") {
    val docs = corpus()
    val a = train(docs.repartition(1), Seq("alpha", "spam"), col("label") === 1,
      epochs = 5, lr = 5.0)
    val b = train(docs.repartition(7), Seq("alpha", "spam"), col("label") === 1,
      epochs = 5, lr = 5.0)
    assert(a.weights.toSeq === b.weights.toSeq, "weights must not depend on partitioning")
    assert(a.bias === b.bias && a.loss === b.loss)
  }

  test("feature table: frequencies, zero-token docs, guards") {
    import spark.implicits._
    val docs = Seq((1L, "alpha alpha beta", 1), (2L, "", 0)).toDF("doc_id", "text", "label")
    val ft = featureTable(docs, Seq("alpha", "beta"), col("label") === 1)
      .orderBy(desc("y")).collect()
    assert(ft(0).getDouble(0) === 1.0)                    // y
    assert(math.abs(ft(0).getDouble(1) - 2.0 / 3) < 1e-15) // x0 = alpha freq
    assert(ft(1).getDouble(1) === 0.0 && ft(1).getDouble(2) === 0.0) // empty doc
    intercept[IllegalArgumentException](
      train(docs, Seq.empty, col("label") === 1, epochs = 1, lr = 1.0))
    intercept[IllegalArgumentException](
      train(docs, Seq("a", "a"), col("label") === 1, epochs = 1, lr = 1.0))
    intercept[IllegalArgumentException](
      train(docs, Seq("a"), col("label") === 1, epochs = 0, lr = 1.0))
    intercept[IllegalArgumentException](
      train(docs, Seq("a"), col("label") === 1, epochs = 1, lr = 0.0))
  }
}
