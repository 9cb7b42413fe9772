package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine — over (id, text) corpora. Absent from the reference
  * (SURVEY.md §2.2 ★); designed for the 100 TB case:
  *
  *  - exact dedup shuffles a 16-byte digest, never document bytes;
  *  - near-dup never does an O(n²) cross join: MinHash/SimHash band
  *    buckets (and a shingle inverted index for Jaccard) bound candidate
  *    generation, and hot buckets are capped to keep worst-case skew from
  *    exploding a single reducer;
  *  - everything is `org.apache.spark.sql.functions` (codegen'd), no UDFs.
  */
object Dedup {

  /** Rolling n-token shingles from a token array (contiguous n-grams,
    * space-joined). Used by MinHash and Jaccard so both agree. */
  def shingles(tokens: Column, n: Int): Column = {
    val sz = size(tokens)
    when(sz >= n,
      transform(sequence(lit(0), sz - n),
        i => array_join(slice(tokens, i + 1, lit(n)), " ")))
      .otherwise(
        // short docs: one shingle = whole doc, so they can still match
        when(sz > 0, array(array_join(tokens, " "))).otherwise(array()))
  }

  /** Exact dedup, canonical-keeper form: one surviving row per distinct
    * key tuple, keeping the minimum id (deterministic, unlike
    * dropDuplicates' arbitrary row). */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(min(col(idCol)).as(idCol))
      .select(col(idCol) +: keyCols.map(col): _*)

  /** Exact dedup by content digest. At 100 TB this is THE scalable form:
    * group by md5(normalized text) so the exchange carries 16-byte keys
    * plus ids instead of full documents. */
  def exactByHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = array_join(TextAnalysis.tokensCol(col(textCol)), " ")
    df.select(col(idCol), md5(norm).as("content_md5"))
      .groupBy("content_md5")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
  }

  /** MinHash signature matrix + LSH banding: near-dup candidate pairs.
    *
    * Pipeline (all narrow until the band-bucket aggregation):
    *   tokens → n-token shingles → k hash functions per shingle
    *   (xxhash64 seeded by slot index) → per-doc elementwise min =
    *   signature → split into b bands of r rows → explode bands →
    *   groupBy(band, bandHash) → pairs within bucket.
    *
    * Jaccard(J) collision probability per band is J^r; with b bands the
    * standard S-curve 1-(1-J^r)^b. Defaults (k=64, b=16, r=4) put the
    * threshold near J≈0.5.
    *
    * Scale notes: the shuffle is keyed by (band, bandHash) — documents
    * never move, only (hash, id) pairs. `maxBucket` caps degenerate
    * buckets (boilerplate shingles) so one hot key can't produce a
    * quadratic reducer; capped buckets are dropped, trading recall for
    * bounded work, the standard production compromise.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 64, bands: Int = 16,
                        shingleSize: Int = 3, maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    val toks = TextAnalysis.tokensCol(col(textCol))
    val sh = shingles(toks, shingleSize)

    // k seeded hashes per shingle; seeds are part of the hashed input so
    // the k functions are independent-ish without a UDF.
    val sig = df
      .select(col(idCol).as("doc"), explode(sh).as("shingle"))
      .select(col("doc"),
        posexplode(transform(sequence(lit(0), lit(numHashes - 1)),
          i => xxhash64(i, col("shingle")))).as(Seq("slot", "h")))
      .groupBy("doc", "slot").agg(min("h").as("mh"))

    // bands: slot -> band = slot / r; band hash folds the r slot minima.
    val buckets = sig
      .withColumn("band", (col("slot") / r).cast("int"))
      .groupBy("doc", "band")
      .agg(xxhash64(sort_array(collect_list(struct(col("slot"), col("mh"))))).as("bucket"))

    candidatePairsFromBuckets(buckets, Seq("band", "bucket"), "doc", maxBucket)
  }

  /** SimHash 64-bit fingerprints: per token-hash bit, +1 if set else -1,
    * summed over the document; fingerprint bit = sign. Near-dups =
    * fingerprints within `maxHamming`. Candidate generation blocks on
    * 16-bit fingerprint chunks: Hamming ≤ 3 ⟹ at least one of 4 chunks
    * is identical (pigeonhole), so the join is equi on (chunk idx, chunk)
    * — never a cross join.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.tokensCol(col(textCol))
    val bitSums = df
      .select(col(idCol).as("doc"), explode(toks).as("token"))
      .withColumn("h", xxhash64(col("token")))
      .select(col("doc"),
        posexplode(array((0 until 64).map(b =>
          when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)): _*)).as(Seq("bit", "contrib")))
      .groupBy("doc", "bit").agg(sum("contrib").as("s"))
    bitSums
      .groupBy("doc")
      .agg(sum(when(col("s") > 0, expr("shiftleft(1L, CAST(bit AS INT))")).otherwise(0L)).as("simhash"))
  }

  /** Near-dup pairs from simhash fingerprints with chunk blocking. */
  def simhashCandidates(fps: DataFrame, maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val chunks = fps.select(col("doc"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(0xFFFFL)): _*)).as(Seq("chunk_idx", "chunk")))
    val a = chunks.as("a")
    val b = chunks.as("b")
    a.join(b,
        col("a.chunk_idx") === col("b.chunk_idx") &&
        col("a.chunk") === col("b.chunk") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** n-gram (shingle) Jaccard similarity via an inverted index:
    * explode shingles → self-equi-join on shingle → common-count per
    * pair → |A∩B| / (|A|+|B|-|A∩B|). Document-frequency cutoff
    * (`maxShingleDf`) drops stop-shingles, which is both the skew guard
    * and the recall/cost knob at scale.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxShingleDf: Int = 100): DataFrame = {
    val toks = TextAnalysis.tokensCol(col(textCol))
    val docShingles = df
      .select(col(idCol).as("doc"), explode(array_distinct(shingles(toks, n))).as("shingle"))
    val sizes = docShingles.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val filtered = docShingles
      .join(docShingles.groupBy("shingle").agg(count(lit(1)).as("df_count"))
        .where(col("df_count") <= maxShingleDf), Seq("shingle"))
    val common = filtered.as("a")
      .join(filtered.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "sh_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "sh_b"), Seq("doc_b"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("sh_a") + col("sh_b") - col("n_common")))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_common", "jaccard")
  }

  /** Embedding-cosine near-dup pairs. Candidate generation uses
    * random-hyperplane LSH buckets (see Similarity.signBuckets) so the
    * pairwise cosine runs inside buckets, not across the corpus; at test
    * scale the bucketing is optional via `bruteForce=true`.
    */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
                       threshold: Double, bruteForce: Boolean = false,
                       planes: Int = 8, seed: Long = 42L): DataFrame = {
    val pairs =
      if (bruteForce) {
        val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
        val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
        a.join(b, col("id_a") < col("id_b"))
      } else {
        val dim = emb.select(size(col(vecCol))).first().getInt(0)
        val bucketed = Similarity.signBuckets(emb, vecCol, dim, planes, seed).select(col(idCol), col(vecCol), col("bucket"))
        val a = bucketed.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("v_a"))
        val b = bucketed.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("v_b"))
        a.join(b, Seq("bucket")).where(col("id_a") < col("id_b")).drop("bucket").distinct()
      }
    pairs
      .withColumn("cos", Similarity.cosineCol(col("v_a"), col("v_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Pairs of ids sharing a bucket key, with a skew cap: buckets larger
    * than `maxBucket` are dropped entirely (documented recall trade). */
  private[ops] def candidatePairsFromBuckets(buckets: DataFrame, keyCols: Seq[String],
                                             idCol: String, maxBucket: Int): DataFrame = {
    val key = keyCols.map(col)
    val capped = buckets
      .join(buckets.groupBy(key: _*).agg(count(lit(1)).as("bsize"))
        .where(col("bsize") <= maxBucket && col("bsize") > 1), keyCols)
    capped.as("a")
      .join(capped.as("b"),
        keyCols.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
  }
}
