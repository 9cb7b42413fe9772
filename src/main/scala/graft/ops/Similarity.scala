package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). Absent from the reference (SURVEY.md §2.2 ★).
  *
  * Two paths, same contract:
  *  - `bruteForceTopK` — exact baseline: broadcast the (small) query set,
  *    compute cosine against every corpus vector in one narrow pass, then
  *    rank per query. The corpus is scanned once and never shuffled; the
  *    only exchange carries (query_id, corpus_id, cos) candidate rows.
  *  - `lshTopK` — scale path: random-hyperplane LSH. Corpus vectors land
  *    in 2^planes sign-pattern buckets; queries probe their own bucket
  *    (plus multi-probe neighbors at Hamming distance 1), so per-query
  *    work is corpus/2^planes on average instead of the full corpus.
  *
  * All vector math is `zip_with`/`aggregate` higher-order functions in
  * DOUBLE precision — codegen'd, no UDF, and bit-identical to a DuckDB
  * double-precision oracle.
  */
object Similarity {

  /** Double-precision dot product of two array columns (higher-order-fn
    * form; used where inputs are mixed double/float, e.g. hyperplanes). */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Double-precision L2 norm. */
  def normCol(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity of two `array<float>` columns in double
    * precision, via the native codegen'd expression
    * (graft.functions.CosineSimilarity) — bit-identical to the
    * higher-order-function formulation but runs as a fused primitive
    * loop inside whole-stage codegen instead of interpreted lambdas. */
  def cosineCol(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.CosineSimilarity(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** Exact top-k neighbors for each query vector.
    *
    * @param corpus  (idCol, vecCol) corpus table
    * @param queries (idCol, vecCol) query table — SMALL; it is broadcast
    * @param k       neighbors per query (excluding the query row itself
    *                when ids collide)
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosineCol(col("q_vec"), col("c_vec")))
    // rank per query; ties break on neighbor_id for determinism
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Deterministic pseudo-random hyperplanes: component h[p][d] derived
    * from a splitmix-style avalanche of (seed, plane, dim), mapped to
    * [-1, 1). Generated on the driver as literals — tiny (planes × dim
    * doubles), baked into the plan, no side input to ship.
    */
  private def hyperplane(seed: Long, plane: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      var z = seed + plane.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (z.toDouble / Long.MaxValue.toDouble)
    }

  /** Sign-pattern bucket id (0 .. 2^planes-1) for each vector: bit p is
    * set iff dot(hyperplane_p, v) >= 0. Narrow map, codegen'd. */
  def signBuckets(df: DataFrame, vecCol: String, dim: Int, planes: Int,
                  seed: Long): DataFrame = {
    val bucket = (0 until planes).map { p =>
      val h = hyperplane(seed, p, dim)
      val hCol = array(h.map(lit(_)): _*)
      when(dotCol(hCol, col(vecCol)) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("bucket", bucket)
  }

  /** LSH approximate top-k: bucket corpus + queries with the same
    * hyperplanes, multi-probe the query bucket and all Hamming-1
    * neighbors (flip each bit), rank within the probed candidates.
    * Recall is tested against bruteForceTopK in SimilaritySpec.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 4, seed: Long = 42L): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val c = signBuckets(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")),
      "c_vec", dim, planes, seed)
    val qb = signBuckets(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      "q_vec", dim, planes, seed)
    // multi-probe: own bucket + flip of each plane bit
    val probes = qb.select(col("query_id"), col("q_vec"), col("bucket"),
      explode(array((lit(0L) +: (0 until planes).map(p => lit(1L << p))): _*)).as("flip"))
      .withColumn("bucket", col("bucket").bitwiseXOR(col("flip")))
      .drop("flip")
    val scored = broadcast(probes).join(c, Seq("bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosineCol(col("q_vec"), col("c_vec")))
      .select("query_id", "neighbor_id", "cos").distinct()
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }
}
