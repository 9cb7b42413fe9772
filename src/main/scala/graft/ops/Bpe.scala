package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}

/** A trained byte-pair-encoding vocabulary: the ordered merge list
  * (rank = training order, lower merges first — the greedy encoder's
  * priority). Serializable as-is for broadcast; `rank` is rebuilt per
  * executor. */
final case class BpeModel(merges: Seq[(String, String)]) {
  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Greedy BPE encode of ONE word (the standard inference rule:
    * repeatedly apply the LOWEST-rank merge present, all its
    * occurrences left-to-right, until none applies). Deterministic. */
  def encodeWord(word: String): Seq[String] = {
    if (word.isEmpty) return Nil
    var syms: Vector[String] = word.map(_.toString).toVector :+ Bpe.EndMark
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))).foreach(r => if (r < best) best = r)
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  /** Inverse of encoding: concatenate, end-markers back to spaces. */
  def decode(tokens: Seq[String]): String =
    tokens.mkString("").replace(Bpe.EndMark, " ").trim
}

/** Byte-pair encoding (Sennrich, Haddow & Birch, "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016 — the
  * public algorithm behind GPT-2/RoBERTa-style tokenizers), split
  * Spark-style:
  *
  *  - TRAINING is driver-side over a DISTRIBUTED word-frequency table:
  *    one explode+groupBy pass computes corpus word counts, the top
  *    `maxWords` by frequency (deterministic count-then-word order)
  *    come to the driver — the same bounded-training-sample discipline
  *    as PQ codebook training (Similarity.trainPqCodebooks's 65,536
  *    cap) — and the classic merge loop runs on that weighted
  *    vocabulary. At 100 TB the distinct-word table is the ONLY thing
  *    that scales with the corpus, and the cap holds training cost
  *    constant while covering the frequency mass that matters.
  *
  *  - ENCODING is a distributed imperative map. This is the one
  *    operator family where `mapPartitions` is the honest tool
  *    (preference (d) and the reason it exists): greedy
  *    lowest-rank-merge resolution is a data-dependent loop no
  *    Catalyst expression expresses without serializing the whole
  *    model into a megabyte of codegen. The model rides a broadcast;
  *    a per-partition word→tokens cache makes the common case (a
  *    Zipf-repeated word) a hash lookup, so throughput tracks DISTINCT
  *    words per partition, not tokens.
  *
  * Character-preservation invariant (what the oracle checks): encoding
  * never invents or drops characters — `decode(encode(w)) == w` for
  * every tokenized word, so the round-tripped corpus md5 equals the
  * normalized-text md5 and the marker-stripped character count equals
  * the summed word lengths.
  */
object Bpe {

  val EndMark = "</w>"

  /** Train `numMerges` merges on the corpus's word-frequency table.
    * Deterministic: pair counts break ties lexicographically; the
    * training vocabulary is the top `maxWords` words by
    * (count desc, word asc). Merges stop early when no pair occurs
    * twice (weighted). */
  def train(docs: DataFrame, textCol: String = "text", numMerges: Int = 200,
            maxWords: Int = 65536): BpeModel = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val vocab: Array[(String, Long)] = docs
      .select(explode(TextAnalysis.tokensCol(col(textCol))).as("_w"))
      .groupBy("_w").agg(count(lit(1)).as("_c"))
      .orderBy(col("_c").desc, col("_w").asc)
      .limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1))

    // driver merge loop over ≤ maxWords weighted symbol sequences
    var words: Array[(Vector[String], Long)] =
      vocab.map { case (w, c) => (w.map(_.toString).toVector :+ EndMark, c) }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + c))
      if (counts.isEmpty) exhausted = true
      else {
        val (pair, cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (cnt < 2) exhausted = true
        else {
          merges += pair
          val (a, b) = pair
          words = words.map { case (syms, c) =>
            if (!syms.containsSlice(Seq(a, b))) (syms, c)
            else {
              val out = Vector.newBuilder[String]
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                  out += (a + b); j += 2
                } else { out += syms(j); j += 1 }
              }
              (out.result(), c)
            }
          }
          m += 1
        }
      }
    }
    BpeModel(merges.result())
  }

  /** Distributed encode: one row per input row,
    * (idCol, bpe_tokens array&lt;string&gt;, n_bpe_tokens). The id
    * column passes through untouched in its original type. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             model: BpeModel): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val idField = docs.schema(idCol)
    val outSchema = StructType(Seq(
      idField,
      StructField("bpe_tokens", ArrayType(StringType, containsNull = false)),
      StructField("n_bpe_tokens", LongType, nullable = false)))
    val rdd = docs.select(col(idCol), col(textCol)).rdd.mapPartitions { it =>
      val m = bc.value
      val cache = scala.collection.mutable.HashMap[String, Seq[String]]()
      it.map { r =>
        val text = if (r.isNullAt(1)) "" else r.getString(1)
        val toks = TextAnalysis.tokenizeRaw(text)
        val bpe = toks.flatMap(w => cache.getOrElseUpdate(w, m.encodeWord(w)))
        Row(r.get(0), bpe, bpe.length.toLong)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
