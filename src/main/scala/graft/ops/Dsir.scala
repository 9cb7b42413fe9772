package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (public method:
  * Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023): score every RAW document by the log
  * importance ratio of a smoothed bag-of-words model of a TARGET
  * corpus against one of the raw corpus, then draw the training subset
  * by deterministic Gumbel top-k over the scores — the "make the crawl
  * look like the curated set" selection step of a pretraining pipeline
  * (the reference engine has no selection operators at all; this
  * extends the §2.2 sampling family).
  *
  * Scale shape, stage by stage:
  *  - [[train]] is two corpus-wide token counts (explode + groupBy —
  *    ONE shuffle each, carrying (word, int64)) with the vocabulary
  *    capped at `vocabSize` by RAW frequency (deterministic
  *    count-desc/word-asc TakeOrdered, the same bounded-model
  *    discipline as the PQ codebook sample and the BPE word cap); the
  *    target count is reduced to the vocabulary by a broadcast
  *    semi-join before it ever reaches the driver, so the collected
  *    model is O(vocabSize) regardless of corpus bytes.
  *  - [[logWeights]] is SHUFFLE-FREE: the (word → log-ratio) model
  *    rides the plan as ONE map literal (same as
  *    [[TextAnalysis.unigramPerplexity]]) and each document folds its
  *    tokens IN POSITION ORDER (`aggregate` over the token array), so
  *    the float sum is bit-reproducible and the ANSI oracle mirrors it
  *    with `SUM(x ORDER BY o)`.
  *  - [[resample]] is a Gumbel top-k draw under the library's standard
  *    multiplicative id hash (u ∈ (0,1) from the key alone, so the
  *    draw is reproducible and audit-re-derivable like every sampler
  *    here), executed as TakeOrdered — no global window, no single
  *    reducer.
  *
  * Smoothing: add-k with the raw-vocabulary size V; both models share
  * the OOV bucket (k mass over the same V+1 cells), so the ratio is
  * defined for every token and a document full of unseen words scores
  * the flat OOV ratio rather than ±∞.
  */
object Dsir {

  /** Driver-held model: per-vocab-word log importance ratio
    * ln p_target(w) − ln p_raw(w), the shared OOV ratio, and the
    * vocabulary size it was trained with. O(vocabSize) — broadcastable
    * by construction. */
  final case class Model(logRatio: Map[String, Double], oovLogRatio: Double,
                         vocabSize: Int)

  private def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokensCol(col(textCol))).as("_w"))
      .groupBy("_w").agg(count(lit(1)).as("_c"))

  private def totalTokens(df: DataFrame, textCol: String): Long =
    df.select(size(TextAnalysis.tokensCol(col(textCol))).as("_n"))
      .agg(coalesce(sum(col("_n")), lit(0L))).head().getLong(0)

  /** Train the importance-ratio model. The vocabulary is the top
    * `vocabSize` words of the RAW corpus (the distribution being
    * corrected, and the larger side — its head is the stable one);
    * target counts are folded onto that vocabulary. Totals are over
    * the WHOLE corpora, so OOV mass stays in both denominators and
    * each model remains a proper distribution. */
  def train(target: DataFrame, raw: DataFrame, textCol: String = "text",
            vocabSize: Int = 65536, addK: Double = 0.5): Model = {
    require(vocabSize > 0 && addK > 0, "vocabSize and addK must be positive")
    val rawCounts: Array[(String, Long)] = tokenCounts(raw, textCol)
      .orderBy(col("_c").desc, col("_w").asc)
      .limit(vocabSize)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val spark = raw.sparkSession
    import spark.implicits._
    val vocabDf = rawCounts.map(_._1).toSeq.toDF("_w")
    val tgtCounts: Map[String, Long] = tokenCounts(target, textCol)
      .join(broadcast(vocabDf), "_w")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nRaw = totalTokens(raw, textCol)
    val nTgt = totalTokens(target, textCol)
    val v = rawCounts.length
    val denomT = nTgt + addK * (v + 1)
    val denomR = nRaw + addK * (v + 1)
    val lr = rawCounts.map { case (w, cr) =>
      w -> (math.log((tgtCounts.getOrElse(w, 0L) + addK) / denomT) -
        math.log((cr + addK) / denomR))
    }.toMap
    Model(lr, math.log(addK / denomT) - math.log(addK / denomR), v)
  }

  /** Per-document log importance weight: Σ over tokens (in position
    * order) of the word's log ratio — plus `n_tokens`. Appends the two
    * columns to `docs`; an empty document scores 0.0. Narrow map, no
    * shuffle: the model is one plan literal. */
  def logWeights(docs: DataFrame, model: Model, textCol: String = "text",
                 weightCol: String = "dsir_logw"): DataFrame = {
    TextAnalysis.requireFree(docs, "_tk", weightCol, "n_tokens")
    val lrMap = typedLit(model.logRatio)
    val oov = lit(model.oovLogRatio)
    docs
      .withColumn("_tk", TextAnalysis.tokensCol(col(textCol)))
      .withColumn("n_tokens", size(col("_tk")).cast("long"))
      .withColumn(weightCol,
        aggregate(
          transform(col("_tk"), w => coalesce(element_at(lrMap, w), oov)),
          lit(0.0), (acc, x) => acc + x))
      .drop("_tk")
  }

  /** The library's standard multiplicative id hash mapped into (0, 1)
    * strictly — the +0.5 keeps both log() calls finite. */
  private def unitHash(id: Column): Column =
    ((pmod(id.cast("long") * lit(2654435761L), lit(4294967296L)).cast("double") +
      lit(0.5)) / lit(4294967296.0))

  /** Gumbel top-`n` draw: key = logw + Gumbel(u(id)), take the n
    * largest (id-asc tiebreak). Sampling WITHOUT replacement
    * proportionally to exp(logw) — the Gumbel-max trick, made
    * deterministic by deriving u from the id hash, so the same
    * (corpus, model, n) always selects the same documents and an audit
    * can re-derive membership from keys alone. Executes as a
    * distributed TakeOrdered: no global sort materializes, no window
    * over one partition. */
  def resample(weights: DataFrame, idCol: String = "doc_id",
               weightCol: String = "dsir_logw", n: Int = 1000): DataFrame = {
    require(n > 0, "n must be positive")
    TextAnalysis.requireFree(weights, "_gk")
    weights
      .withColumn("_gk", col(weightCol) - log(-log(unitHash(col(idCol)))))
      .orderBy(col("_gk").desc, col(idCol).asc)
      .limit(n)
      .drop("_gk")
  }
}
