package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine TRAINING of the learned quality filter — full-batch logistic
  * regression over lexicon term-frequency features, the missing half of
  * the [[TextAnalysis.lexiconScore]] / [[TextAnalysis.hashedScore]]
  * inference pair (CCNet/fastText-style curation trains exactly this
  * linear model on "good vs bad" corpora, then deploys the weights as a
  * filter). The reference has no model training (SURVEY.md §2.2); this is
  * a north-star extension.
  *
  * Model: `p(doc) = sigmoid(b + Σ_k w_k · x_k)` with `x_k =
  * count(term_k)/n_tokens` over the canonical [[TextAnalysis.tokensCol]]
  * tokens — the SAME per-occurrence mean that `lexiconScore` applies, so
  * a trained `(weights, bias)` slots into inference unchanged
  * (QualityTrainerSpec pins the equivalence).
  *
  * 100 TB shape: the corpus is reduced ONCE to a compact per-document
  * feature row (`|lexicon|` doubles + label), cached; each epoch is one
  * scan of that table ending in a config-sized aggregate (one long per
  * feature) collected to the driver — textbook distributed full-batch GD:
  * no per-row driver work, no shuffle beyond the final partial-agg tree,
  * epochs × O(corpus/cluster) wall-clock. The weight vector lives on the
  * driver and rides into each pass as plan literals (lexicons are
  * config-sized by contract — hundreds of terms; a vocabulary-scale model
  * belongs to `hashedScore`'s bucketed form).
  *
  * Exactness contract (what lets a DuckDB oracle reproduce training
  * bit-for-bit, the same discipline as
  * [[Sampling.temperatureMixture]]'s ordered summation):
  *
  *  - Per-document gradient/loss contributions are QUANTIZED to a
  *    fixed-point grid (`round(v · 1e6)` as a long) before the corpus
  *    sum. Integer addition is associative, so the distributed sum is
  *    order-free — and the quantization absorbs the last-ulp differences
  *    engines are allowed in `exp`/`ln` (a ~1e-16 relative error moves a
  *    scaled value ~1e-11 of a grid step: it cannot flip the rounded
  *    long except on an exact tie both engines see identically).
  *  - The margin `b + w_0·x_0 + w_1·x_1 + …` is built as a
  *    LEFT-ASSOCIATIVE chain (foldLeft here, the literal `+` chain in
  *    SQL), never a HOF/SUM whose order an engine may choose — so margins
  *    agree bit-for-bit and `margin ≥ 0` classification counts are exact.
  *  - The weight recursion `w ← w − lr · ((Σq/1e6) / N)` runs on the
  *    driver with the SAME expression shape the oracle uses; operands are
  *    identical, IEEE ops are exactly rounded, so weights stay identical
  *    across engines for any epoch count.
  *
  * The training loss uses the softplus form `ln(1+exp(∓margin))` (never
  * `ln(p)` — no overflow cliff at large margins) and is reported
  * quantized, at the FINAL weights, alongside `n_correct`
  * (margin-sign classification) from one extra metrics pass.
  */
object QualityTrainer {

  /** Fixed-point grid for order-free corpus sums: contributions are
    * rounded to 1e-6 before summing as longs. */
  val Scale = 1e6

  final case class TrainResult(terms: Seq[String], weights: Array[Double],
                               bias: Double, loss: Double, nCorrect: Long,
                               n: Long) {
    /** Weights in the `(term, weight)` shape `lexiconScore` consumes. */
    def lexicon: Seq[(String, Double)] = terms.zip(weights)
  }

  /** The compact per-document training row: `y` (label as 0/1 double)
    * and one `x$k` frequency feature per lexicon term. This is the only
    * corpus-sized projection training touches — every epoch re-scans it,
    * so the caller-visible contract is "features once, then |lexicon|
    * doubles per doc". */
  def featureTable(docs: DataFrame, lexicon: Seq[String], label: Column,
                   textCol: String = "text"): DataFrame = {
    require(lexicon.nonEmpty, "empty lexicon: nothing to train")
    require(lexicon.distinct.size == lexicon.size,
      s"duplicate lexicon terms: ${lexicon.diff(lexicon.distinct).mkString(",")}")
    TextAnalysis.requireFree(docs, "_tk" +: lexicon.indices.map(k => s"x$k"): _*)
    val tk = col("_tk")
    val n = size(tk)
    docs
      .withColumn("_tk", TextAnalysis.tokensCol(col(textCol)))
      .select(
        label.cast("double").as("y") +:
        lexicon.zipWithIndex.map { case (term, k) =>
          when(n > 0,
            size(filter(tk, t => t === term)).cast("double") / n)
            .otherwise(lit(0.0)).as(s"x$k")
        }: _*)
  }

  /** margin = ((b + w0·x0) + w1·x1) + … — the left-associative chain of
    * the exactness contract. */
  private def marginCol(weights: Array[Double], bias: Double): Column =
    weights.zipWithIndex.foldLeft(lit(bias): Column) { case (acc, (w, k)) =>
      acc + lit(w) * col(s"x$k")
    }

  private def quantized(v: Column): Column = round(v * Scale, 0).cast("long")

  /** Full-batch gradient descent from zero weights. `epochs` scans for
    * gradients + one metrics scan at the final weights. */
  def train(docs: DataFrame, lexicon: Seq[String], label: Column,
            epochs: Int, lr: Double, textCol: String = "text"): TrainResult = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    require(lr > 0.0, s"lr must be positive, got $lr")
    val feats = featureTable(docs, lexicon, label, textCol).cache()
    try {
      val n = feats.count()
      require(n > 0, "empty corpus: nothing to train")
      val k = lexicon.size
      var w = Array.fill(k)(0.0)
      var b = 0.0
      for (_ <- 1 to epochs) {
        val margin = marginCol(w, b)
        val p = lit(1.0) / (lit(1.0) + exp(-margin))
        val err = p - col("y")
        val gradAggs =
          (0 until k).map(i => sum(quantized(err * col(s"x$i"))).as(s"g$i")) :+
          sum(quantized(err)).as("gb")
        val row = feats.agg(gradAggs.head, gradAggs.tail: _*).head()
        // the oracle's exact recursion shape: lr * ((Σq / 1e6) / N)
        w = Array.tabulate(k)(i =>
          w(i) - lr * ((row.getLong(i).toDouble / Scale) / n))
        b = b - lr * ((row.getLong(k).toDouble / Scale) / n)
      }
      val margin = marginCol(w, b)
      val softplusLoss =
        when(col("y") === 1.0, log(lit(1.0) + exp(-margin)))
          .otherwise(log(lit(1.0) + exp(margin)))
      val m = feats.agg(
        sum(quantized(softplusLoss)).as("lq"),
        sum(when((margin >= 0) === (col("y") === 1.0), 1L).otherwise(0L))
          .as("ok")).head()
      TrainResult(lexicon, w, b, m.getLong(0).toDouble / Scale, m.getLong(1), n)
    } finally feats.unpersist()
  }
}
