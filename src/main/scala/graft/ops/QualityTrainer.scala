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
                   textCol: String = "text"): DataFrame =
    featureTableWith(docs, lexicon, label, textCol, Nil)

  private def featureTableWith(docs: DataFrame, lexicon: Seq[String],
                               label: Column, textCol: String,
                               extra: Seq[Column]): DataFrame = {
    require(lexicon.nonEmpty, "empty lexicon: nothing to train")
    require(lexicon.distinct.size == lexicon.size,
      s"duplicate lexicon terms: ${lexicon.diff(lexicon.distinct).mkString(",")}")
    TextAnalysis.requireFree(docs, "_tk" +: lexicon.indices.map(k => s"x$k"): _*)
    val tk = col("_tk")
    val n = size(tk)
    docs
      .withColumn("_tk", TextAnalysis.tokensCol(col(textCol)))
      .select(
        (label.cast("double").as("y") +:
        lexicon.zipWithIndex.map { case (term, k) =>
          when(n > 0,
            size(filter(tk, t => t === term)).cast("double") / n)
            .otherwise(lit(0.0)).as(s"x$k")
        }) ++ extra: _*)
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

  /** [[train]]'s fixed-point grid rounding as a LOCAL function — the
    * exact semantics of Spark's `round(v·1e6, 0)` (and DuckDB's
    * `round`): the double's exact binary value, scale 0, HALF UP away
    * from zero. `math.round`/`floor(v+0.5)` differ on negative halves
    * and on the largest-double-below-.5 FP-carry edge; BigDecimal over
    * the exact binary value is what both engines actually compute. */
  private def q6(v: Double): Long =
    new java.math.BigDecimal(v).setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** LOCAL-EPOCHS training with model averaging (Zinkevich et al.,
    * "Parallelized Stochastic Gradient Descent", NIPS'10) — the
    * barrier-free scale form of [[train]].
    *
    * Why it exists: exact full-batch GD is information-theoretically
    * one GLOBAL sync per epoch (each update needs the corpus-wide
    * gradient at the just-updated weights), so [[train]] pays
    * `epochs + 2` driver-barriered jobs — the many-sync shape that
    * straggler-amplifies on a 1000-executor cluster. Here the corpus
    * shards DETERMINISTICALLY by `pmod(key, shards)`, each shard runs
    * ALL `epochs` full-batch epochs locally over its own rows, and the
    * final model is the shard-size-weighted average folded in shard
    * order. Total distributed cost: ONE training job (a single keyed
    * shuffle of the compact feature rows) + ONE metrics pass — two
    * barriers for ANY epoch count (spec-pinned).
    *
    * Memory contract: one shard's feature rows ((|lexicon|+1) doubles
    * per doc) must fit an executor — size `shards` so that
    * `corpus_docs × 8(k+1) / shards` is comfortably under executor
    * memory. At 10⁹ docs × 17 features × 8 B ≈ 136 GB total, 256
    * shards ≈ 0.5 GB each.
    *
    * Exactness contract (a SQL oracle replays this bit-for-bit, the
    * same discipline as [[train]]):
    *  - shard id is PLAIN MODULO of a caller-named numeric key (hash
    *    functions differ across engines);
    *  - per-doc margins are the same left-associative chain as
    *    [[marginCol]]; contributions quantize through [[q6]] (the
    *    engines' shared round-half-away-from-zero on the exact binary
    *    double); per-shard gradient sums are order-free LONGS, so any
    *    iteration order inside a shard yields the same model;
    *  - the average `Σ_s n_s·w_s / N` folds in ASCENDING shard order
    *    (`SUM(… ORDER BY shard)` on the oracle side).
    *
    * The averaged model is NOT the full-batch optimum — it is the
    * standard local-epochs trade (k× fewer syncs; shard models agree
    * as shard distributions do). The spec pins determinism under
    * repartitioning, sign/classification parity with [[train]] on the
    * test corpus, and the two-barrier job count. */
  def trainLocalEpochs(docs: DataFrame, lexicon: Seq[String], label: Column,
                       key: Column, epochs: Int, lr: Double, shards: Int,
                       textCol: String = "text"): TrainResult = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    require(lr > 0.0, s"lr must be positive, got $lr")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val k = lexicon.size
    val feats = featureTableWith(docs, lexicon, label, textCol,
      Seq(pmod(key.cast("long"), lit(shards.toLong)).cast("int").as("_shard"))).cache()
    try {
      val models = feats
        .select(col("_shard") +: col("y") +: (0 until k).map(i => col(s"x$i")): _*)
        .rdd
        .map(r => (r.getInt(0),
          (r.getDouble(1), Array.tabulate(k)(i => r.getDouble(i + 2)))))
        .groupByKey(shards)
        .map { case (s, rows) =>
          val n = rows.size.toLong
          var w = new Array[Double](k)
          var b = 0.0
          var e = 0
          while (e < epochs) {
            val gq = new Array[Long](k + 1)
            rows.foreach { case (y, x) =>
              var m = b
              var i = 0
              while (i < k) { m += w(i) * x(i); i += 1 } // left-assoc chain
              val err = 1.0 / (1.0 + math.exp(-m)) - y
              i = 0
              while (i < k) { gq(i) += q6(err * x(i) * Scale); i += 1 }
              gq(k) += q6(err * Scale)
            }
            val w2 = new Array[Double](k)
            var i = 0
            while (i < k) {
              w2(i) = w(i) - lr * ((gq(i).toDouble / Scale) / n); i += 1
            }
            w = w2
            b = b - lr * ((gq(k).toDouble / Scale) / n)
            e += 1
          }
          (s, w, b, n)
        }
        .collect().sortBy(_._1)
      require(models.nonEmpty, "empty corpus: nothing to train")
      val n = models.map(_._4).sum
      // shard-size-weighted average, folded in ascending shard order
      val wAvg = Array.tabulate(k)(i =>
        models.foldLeft(0.0) { case (acc, (_, w, _, ns)) => acc + ns * w(i) } / n)
      val bAvg = models.foldLeft(0.0) { case (acc, (_, _, b, ns)) => acc + ns * b } / n
      val margin = marginCol(wAvg, bAvg)
      val softplusLoss =
        when(col("y") === 1.0, log(lit(1.0) + exp(-margin)))
          .otherwise(log(lit(1.0) + exp(margin)))
      val m = feats.agg(
        sum(quantized(softplusLoss)).as("lq"),
        sum(when((margin >= 0) === (col("y") === 1.0), 1L).otherwise(0L))
          .as("ok")).head()
      TrainResult(lexicon, wAvg, bAvg, m.getLong(0).toDouble / Scale, m.getLong(1), n)
    } finally feats.unpersist()
  }
}
