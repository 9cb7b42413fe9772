package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, StructField, StructType}

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). Absent from the reference (SURVEY.md §2.2 ★).
  *
  * Two paths, same contract:
  *  - `bruteForceTopK` — exact baseline: broadcast the (small) query set,
  *    compute cosine against every corpus vector in one narrow pass, then
  *    rank per query. The corpus is scanned once and never shuffled; the
  *    only exchange carries (query_id, corpus_id, cos) candidate rows.
  *  - `lshTopK` — scale path: BANDED random-hyperplane LSH — L
  *    independent tables of r sign planes each; candidates are the
  *    union over bands of the query's band-bucket, so per-query work
  *    is ~L · mean-band-bucket instead of the full corpus, and recall
  *    comes from the multi-band OR (held ≥90% at the cos-0.8 reference
  *    by deriving L from r — see `autoPlanes`/`autoBands` for why the
  *    knobs must move TOGETHER).
  *  - `ivfTopK` — learned-cell path: spherical k-means Voronoi cells,
  *    `nlist` auto-sized to √n (`autoNlist`) and trainable on a seeded
  *    sample (`sampleFraction`) so index build cost is decoupled from
  *    corpus size.
  *
  * All vector math is `zip_with`/`aggregate` higher-order functions in
  * DOUBLE precision — codegen'd, no UDF, and bit-identical to a DuckDB
  * double-precision oracle.
  */
object Similarity {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.ops.Similarity")

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

  /** Native codegen'd dot product (`array<float>` × `array<float>` →
    * double). For SIGN tests (LSH hyperplane sides) this is the right
    * kernel: `sign(dot) == sign(cos)` and the cosine form would pay a
    * redundant norm loop per plane. */
  def dotColNative(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.DotProduct(
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
      val hCol = array(h.toIndexedSeq.map(lit(_)): _*)
      when(dotCol(hCol, col(vecCol)) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("bucket", bucket)
  }

  /** Banded random-hyperplane LSH keys: each input row explodes to
    * `bands` rows keyed (band, bucket), where a band's bucket is the
    * sign pattern of that band's `planesPerBand` private hyperplanes.
    * Two vectors at angle θ share a given band with probability
    * (1-θ/π)^planesPerBand; over b bands the OR gives the standard
    * 1-(1-p^r)^b S-curve — recall comes from multi-band OR, so a pair
    * dropped from one band's hot bucket can still surface in another.
    *
    * The bucket space is bands × 2^planesPerBand — callers scale
    * `planesPerBand` with corpus size so mean bucket size stays bounded
    * (vs the single-code `signBuckets`, whose 2^planes space is fixed).
    * Each sign test is the native codegen'd DOT PRODUCT against the
    * hyperplane (sign(dot) = sign(cos): norms are positive) — the
    * earlier cosine form recomputed the vector's norm once per plane,
    * and bands·planes sign tests per row is the hot loop here. */
  def bandedSignBuckets(df: DataFrame, vecCol: String, dim: Int,
                        bands: Int, planesPerBand: Int, seed: Long): DataFrame = {
    require(planesPerBand >= 1 && planesPerBand <= 62, s"planesPerBand=$planesPerBand out of range")
    // One O(1)-sized expression node per band: the hyperplane components
    // are regenerated executor-side from (seed, plane, d) inside the
    // fused loop (bit-identical to the earlier literal-array form — see
    // HyperplaneBandBucket), so the plan no longer carries L·r·dim float
    // literals into every task binary.
    val bandCols = (0 until bands).map { b =>
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.HyperplaneBandBucket(
          org.apache.spark.sql.GraftColumnBridge.expression(col(vecCol)),
          seed, b * planesPerBand, planesPerBand, dim))
    }
    df.select(col("*"), posexplode(array(bandCols: _*)).as(Seq("band", "bucket")))
  }

  /** Auto-derived planes PER BAND for the banded lshTopK: 2^planes
    * band-buckets sized so the mean band-bucket holds ~256 vectors. A
    * FIXED plane count stops being sublinear when the corpus outgrows
    * its bucket space — but growing the plane count unboundedly is the
    * OPPOSITE trap: per-band match probability for a cos-0.8 neighbor
    * is 0.795^planes, so a single giant-bucket-space table silently
    * loses recall as n grows (measured failure of the earlier
    * single-table form: ~9% recall at n=16M). The cap at 14 planes
    * holds the per-band recall floor; past n ≈ 4M the band-bucket size
    * grows linearly instead — candidates stay a vanishing FRACTION of
    * the corpus (L·n/2^14) at pinned recall, which is the honest LSH
    * trade (true sublinearity at fixed recall needs L ∝ n^ρ tables,
    * i.e. more bands, which `bands` exposes). */
  private[ops] def autoPlanes(n: Long): Int =
    math.min(14, math.max(4,
      math.ceil(math.log(math.max(n, 1L) / 256.0) / math.log(2.0)).toInt))

  /** Bands needed for ≥90% recall at the cos 0.8 reference similarity:
    * per-plane sign agreement s₀ = 1 − acos(0.8)/π ≈ 0.795, per-band
    * match s₀^r, and the multi-band OR gives 1−(1−s₀^r)^L — solved for
    * L at 0.9, clamped to [8, 56] (56 = the exact solve at the r = 14
    * plane cap, so the floor holds across the whole reachable range).
    * Every band is an independent chance to catch a neighbor, so recall
    * is monotone in L; callers chasing higher recall at higher cost
    * raise `bands` explicitly.
    *
    * COST CURVE — L is a direct multiplier on candidate generation
    * (each band is a full bucketing pass + its share of the candidate
    * join), and the solve grows fast in r because per-band match decays
    * as 0.795^r. The reachable (r, L) pairs:
    *
    * | r (planes/band) | L = autoBands(r) | candidate multiplier |
    * |---|---|---|
    * | 4  | 8  (floor) | 8×  |
    * | 6  | 8  | 8×  |
    * | 8  | 14 | 14× |
    * | 10 | 22 | 22× |
    * | 12 | 35 | 35× |
    * | 14 | 56 (cap)   | 56× |
    *
    * With r = autoPlanes(n), a corpus crossing the n ≈ 4M plane-cap
    * threshold is already running 56 tables — a caller who fixes
    * `planes` high without fixing `bands` hits the same multiplier
    * silently, which is why `lshTopK` logs the chosen pair at INFO. */
  private[ops] def autoBands(planesPerBand: Int): Int = {
    val pBand = math.pow(1.0 - math.acos(0.8) / math.Pi, planesPerBand)
    math.min(56, math.max(8, math.ceil(math.log(0.1) / math.log(1.0 - pBand)).toInt))
  }

  /** Auto-derived IVF cell count: nlist ≈ √n (the standard IVF sizing —
    * balances per-query centroid scoring, O(nlist), against cell scan,
    * O(n·nprobe/nlist); √n equalizes the two), clamped to [16, 65536].
    * Per-query work then grows as √n instead of n/16. The full range is
    * reachable: past [[LiteralCentroidCap]] cell assignment rides a
    * broadcast centroid table, so plan size stays O(1) in nlist. */
  private[ops] def autoNlist(n: Long): Int =
    math.min(65536, math.max(16, math.ceil(math.sqrt(math.max(n, 1L).toDouble)).toInt))

  /** Empty (query_id, neighbor_id, rank, cos) result with the right id
    * type — the approximate paths probe the corpus for its dimension, so
    * an empty corpus must short-circuit instead of crashing `.head`. */
  private def emptyTopK(corpus: DataFrame, idCol: String): DataFrame = {
    val idt = corpus.schema(idCol).dataType
    corpus.sparkSession.createDataFrame(new java.util.ArrayList[Row](),
      StructType(Seq(StructField("query_id", idt), StructField("neighbor_id", idt),
        StructField("rank", IntegerType, nullable = false),
        StructField("cos", DoubleType, nullable = false))))
  }

  /** Spherical k-means centroids for an IVF index, trained with Lloyd
    * iterations executed as DataFrame jobs. Only the centroid matrix
    * (nlist × dim doubles — a few KB) ever reaches the driver; the
    * corpus itself is never collected, so training scales to any corpus
    * size (at 100 TB, train on `corpus.sample(...)` — assignment
    * quality needs only a representative sample).
    *
    * Init is deterministic: the nlist rows with the smallest
    * xxhash64(id) (a seeded uniform draw, stable across runs and
    * partitionings). Each iteration: argmax-cosine assignment (centroid
    * matrix baked into the plan as literals, so assignment is a narrow
    * codegen'd map — no join, no shuffle of vectors), then per-cluster
    * per-dimension mean via one partial-aggregated exchange of
    * (cluster, dim, sum, n) — nlist·dim rows, independent of corpus
    * size. Empty clusters keep their previous centroid. */
  def trainIvfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                        nlist: Int = 0, iters: Int = 3, seed: Long = 42L,
                        sampleFraction: Double = 1.0): Array[Array[Double]] = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction=$sampleFraction out of (0, 1]")
    // Degenerate vectors are excluded from training: a zero-norm vector
    // would contribute 0/0 = NaN components and poison its centroid
    // (NaN then sorts above every real cosine, so argmax funnels the
    // whole corpus into the poisoned cell); a null vector would NPE the
    // driver-side collect. cosineCol(v, v) is 1.0 for valid vectors and
    // 0.0 for zero-norm ones — a cheap codegen'd validity test. The
    // projected frame is persisted: training touches it 1 + 2·iters
    // times, and without the persist each pass re-executes the corpus
    // lineage.
    //
    // `sampleFraction` is THE 100 TB knob: centroid quality needs a
    // representative sample, not the corpus — Lloyd passes over 10% cost
    // 10× less and assignment quality is statistically indistinguishable
    // (recall parity is spec-pinned). The sample is seeded, so training
    // is deterministic. nlist = 0 auto-sizes cells as √n of the FULL
    // corpus (the sample count is scaled back up by the fraction —
    // cells partition the corpus, not the training sample).
    val all = corpus.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .where(col("_v").isNotNull && cosineCol(col("_v"), col("_v")) > 0)
    val vecs = (if (sampleFraction < 1.0) all.sample(sampleFraction, seed) else all)
      .persist()
    try {
      val sampled = vecs.count()
      // an empty (or undersized) sample must fail HERE with a usable
      // message, not downstream as a zero-centroid analysis error
      require(sampled > 0,
        s"sampleFraction=$sampleFraction produced 0 training vectors — raise it " +
          "(or check that the corpus has non-null, non-zero-norm vectors)")
      val k =
        if (nlist > 0) nlist
        else autoNlist(math.ceil(sampled / sampleFraction).toLong)
      // never ask for more cells than training vectors: limit(k) would
      // silently return fewer centroids than promised
      trainOn(vecs, math.min(k, sampled).toInt, iters, seed)
    } finally vecs.unpersist()
  }

  private def trainOn(vecs: DataFrame, nlist: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    var centroids: Array[Array[Double]] = vecs
      .orderBy(xxhash64(lit(seed), col("_id")), col("_id"))
      .limit(nlist)
      .collect().map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0.0) v else v.map(_ / n)
      }
    for (_ <- 0 until iters) {
      // assignment is the native codegen'd cosine against each centroid
      // (literal plan below LiteralCentroidCap, broadcast centroid table
      // above — training hits the same plan-size ceiling as search);
      // cosine is scale-invariant, so no normalization pass. The norm
      // for the mean update is ONE interpreted aggregate per row, kept
      // on the far side of the posexplode Generate node so
      // CollapseProject cannot inline it per element.
      val base = vecs.select(col("_v"))
      val withCell =
        if (centroids.length <= LiteralCentroidCap)
          base.withColumn("_c", argmaxCos(centroids, col("_v")))
        else {
          val cents = broadcast(centroidArrayDf(vecs.sparkSession, centroids))
          base.crossJoin(cents)
            .withColumn("_c", argmaxCosArr(col("_cents"), col("_v"))).drop("_cents")
        }
      val assigned = withCell.withColumn("_norm", normCol(col("_v")))
      // (cluster, dim) sums of unit vectors: nlist·dim rows through the
      // exchange, with map-side partial aggregation — corpus-size-
      // independent.
      val sums = assigned
        .select(col("_c"), col("_norm"), posexplode(col("_v")).as(Seq("_d", "_x")))
        .groupBy("_c", "_d")
        .agg(sum(col("_x").cast("double") / col("_norm")).as("_s"),
          count(lit(1)).as("_n"))
        .collect()
      val next = centroids.map(_.clone())
      val counts = Array.fill(nlist)(0L)
      sums.foreach { r =>
        val c = r.getInt(0); val d = r.getInt(1)
        next(c)(d) = r.getDouble(2) / r.getLong(3)
        counts(c) = r.getLong(3)
      }
      // re-normalize non-empty centroids to the unit sphere (spherical
      // k-means: cosine assignment stays a plain dot product)
      centroids = next.zipWithIndex.map { case (v, i) =>
        if (counts(i) == 0L) centroids(i)
        else {
          val n = math.sqrt(v.map(x => x * x).sum)
          if (n == 0.0) centroids(i) else v.map(_ / n)
        }
      }
    }
    centroids
  }

  /** A centroid as an `array<float>` literal — the native cosine
    * expression's input type; float truncation only perturbs cell
    * boundaries, never the reported scores. */
  private def floatLits(c: Array[Double]): Column =
    array(c.toIndexedSeq.map(x => lit(x.toFloat)): _*)

  /** Index (0-based) of the centroid most cosine-similar to `v`, as
    * ONE fused codegen node (graft.functions.ArgmaxCosineMatrix): the
    * matrix rides as a reference object, the loop hoists the vector
    * norm and reads precomputed centroid norms — bit-identical scores
    * and tiebreak to [[argmaxCosHof]], the superseded struct-max form
    * it replaces (spec-pinned in ArgmaxCosineSpec). The HOF form's
    * plan grew O(nlist): one CosineSimilarity node + struct + array
    * slot per centroid, and past ~2K cells the generated methods blow
    * the JIT's bytecode ceiling and run interpreted. */
  private[ops] def argmaxCos(centroids: Array[Array[Double]], v: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.ArgmaxCosineMatrix(
        org.apache.spark.sql.GraftColumnBridge.expression(v), centroids))

  /** The superseded struct-max argmax (array_max over (score, index)
    * structs, one CosineSimilarity per centroid) — retained as the
    * bit-identity REFERENCE for ArgmaxCosineSpec, not called on any
    * query path. */
  private[ops] def argmaxCosHof(centroids: Array[Array[Double]], v: Column): Column =
    array_max(array(centroids.zipWithIndex.toIndexedSeq.map { case (c, i) =>
      struct(cosineCol(floatLits(c), v).as("s"), lit(i).as("i"))
    }: _*)).getField("i")

  /** Top-`nprobe` centroid indices for a query vector, as an array
    * column: sort the (score, index) struct array descending, slice,
    * project the index. Literal-path only — see [[argmaxCos]]. */
  private def topProbes(centroids: Array[Array[Double]], v: Column,
                        nprobe: Int): Column =
    transform(
      slice(sort_array(array(centroids.zipWithIndex.toIndexedSeq.map { case (c, i) =>
        struct(cosineCol(floatLits(c), v).as("s"), lit(i).as("i"))
      }: _*), asc = false), 1, nprobe),
      s => s.getField("i"))

  /** Centroid count above which cell assignment switches from
    * plan-literal centroids to a broadcast centroid table. The literal
    * form wins below the cap (no join node, pure codegen'd map); above
    * it the plan itself becomes the bottleneck: 65,536 CosineSimilarity
    * nodes ≈ 400 MB of `array<float>` literals at dim 768 — plan
    * construction, task-binary broadcast, and Janino all die long
    * before execution. 2,048 centroids × dim 768 is ~6 MB of literals,
    * safely under every one of those ceilings while keeping the fast
    * path for the common √n-sized nlist at bench scale. */
  private[ops] val LiteralCentroidCap = 2048

  /** The full centroid matrix as ONE ROW holding an
    * `array<struct<i int, v array<float>>>` column `_cents` — the
    * scale-path carrier: broadcast-cross-joined onto the corpus (a
    * single-row BroadcastNestedLoopJoin), it ships the matrix ONCE per
    * executor as data (torrent broadcast), keeping the plan O(1) in
    * nlist. Components are float-truncated exactly like [[floatLits]],
    * so cell boundaries match the literal path bit-for-bit. */
  private def centroidArrayDf(spark: org.apache.spark.sql.SparkSession,
                              centroids: Array[Array[Double]]): DataFrame = {
    val rows: Array[Row] =
      centroids.zipWithIndex.map { case (v, i) => Row(i, v.map(_.toFloat).toSeq) }
    val schema = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("v", org.apache.spark.sql.types.ArrayType(FloatType, containsNull = false),
        nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .agg(sort_array(collect_list(struct(col("i"), col("v")))).as("_cents"))
  }

  /** Broadcast-table twin of [[argmaxCos]]: argmax-cosine over the
    * `_cents` array column, as ONE fused codegen node
    * (graft.functions.ArgmaxCosineOver). The superseded `transform` +
    * `array_max` form ([[argmaxCosArrHof]], kept as the spec's
    * bit-identity reference) dispatched an interpreted lambda + struct
    * allocation per centroid per row (CodegenFallback), dropping the
    * whole projection out of whole-stage codegen — the flat-assignment
    * dispatch cost the round-18 verdict ranked #1. */
  private[ops] def argmaxCosArr(cents: Column, v: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.ArgmaxCosineOver(
        org.apache.spark.sql.GraftColumnBridge.expression(cents),
        org.apache.spark.sql.GraftColumnBridge.expression(v)))

  /** The superseded transform/struct-max broadcast-table argmax —
    * retained as the bit-identity REFERENCE for ArgmaxCosineSpec, not
    * called on any query path. */
  private[ops] def argmaxCosArrHof(cents: Column, v: Column): Column =
    array_max(transform(cents, c =>
      struct(cosineCol(c.getField("v"), v).as("s"), c.getField("i").as("i"))))
      .getField("i")

  /** Broadcast-table twin of [[topProbes]]. */
  private def topProbesArr(cents: Column, v: Column, nprobe: Int): Column =
    transform(
      slice(sort_array(transform(cents, c =>
        struct(cosineCol(c.getField("v"), v).as("s"), c.getField("i").as("i"))),
        asc = false), 1, nprobe),
      s => s.getField("i"))

  /** Centroid count above which CORPUS cell assignment goes two-level
    * (coarse quantizer): the broadcast table removes the plan-size
    * ceiling, but flat argmax still scores nlist centroids PER CORPUS
    * ROW — at the 65,536-cell cap that is 65,536 × dim multiplies per
    * vector, ~128× more than the two-level ~2·√nlist. Queries keep the
    * FLAT exact probe ranking: the query side is small by contract, and
    * flat probes preserve the planted-copy recovery theorem the oracle
    * checks. Training also stays flat (the coarse layer would have to
    * be re-derived every Lloyd iteration); cap training cost with
    * `sampleFraction`, not hierarchy. */
  private[ops] val TwoLevelCentroidCap = 8192

  /** Coarse layer for two-level assignment: k-means over the centroid
    * MATRIX itself — nc ≈ √nlist groups — run on the driver, where the
    * matrix already lives (it was collected to build the index; no new
    * scalability surface). Returns the coarse centroids (unit-norm)
    * and, per coarse group, the ORIGINAL indices of its fine centroids.
    * Deterministic: init spreads evenly over the index range; empty
    * groups are dropped from the output (their children array would be
    * empty — an argmax over nothing). */
  private[ops] def coarseLayer(centroids: Array[Array[Double]], nc: Int,
                               iters: Int = 3): (Array[Array[Double]], Array[Array[Int]]) = {
    val n = centroids.length
    val dim = centroids.head.length
    def norm(v: Array[Double]): Array[Double] = {
      val m = math.sqrt(v.map(x => x * x).sum)
      if (m == 0.0) v else v.map(_ / m)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var d = 0
      while (d < dim) { dot += a(d) * b(d); na += a(d) * a(d); nb += b(d) * b(d); d += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
    var coarse = Array.tabulate(nc)(c => norm(centroids((c.toLong * n / nc).toInt).clone()))
    val assign = new Array[Int](n)
    def assignAll(): Unit = {
      var i = 0
      while (i < n) {
        var best = 0; var bestS = Double.NegativeInfinity; var c = 0
        while (c < nc) {
          val s = cos(coarse(c), centroids(i))
          if (s > bestS) { bestS = s; best = c }
          c += 1
        }
        assign(i) = best; i += 1
      }
    }
    for (_ <- 0 until iters) {
      assignAll()
      val sums = Array.fill(nc)(new Array[Double](dim))
      val counts = new Array[Int](nc)
      var j = 0
      while (j < n) {
        val cn = norm(centroids(j)); val c = assign(j)
        var d = 0
        while (d < dim) { sums(c)(d) += cn(d); d += 1 }
        counts(c) += 1; j += 1
      }
      coarse = Array.tabulate(nc)(c => if (counts(c) == 0) coarse(c) else norm(sums(c)))
    }
    // one extra assignment against the FINAL centroids: the loop's last
    // update moved them after its assignment, so without this pass a
    // fine centroid could be grouped under a coarse centroid it is no
    // longer nearest to (mild two-level assignment-quality loss)
    assignAll()
    val kept = (0 until nc).filter(c => assign.contains(c))
    (kept.map(coarse).toArray,
      kept.map(c => (0 until n).filter(assign(_) == c).toArray).toArray)
  }

  /** Adds a `cell` column — the IVF cell of `vecCol` — choosing the
    * assignment strategy by centroid count:
    *  - ≤ literalCap: plan-literal argmax (fastest; plan grows with
    *    nlist — see [[argmaxCos]]);
    *  - ≤ [[TwoLevelCentroidCap]]: FLAT argmax over a broadcast
    *    centroid table (plan O(1) in nlist; per-row cost O(nlist));
    *  - above: TWO-LEVEL — nearest coarse group (≈√nlist cosines) then
    *    argmax within that group's fine cells, ~2·√nlist per row
    *    instead of nlist (~128× less at the 65,536-cell cap). Coarse
    *    assignment is scale-invariant like everything else here, so
    *    exact-direction copies still share their source's cell; the
    *    hierarchy only perturbs which (equally approximate) cell a
    *    BOUNDARY vector lands in — IVF semantics, not a new
    *    approximation class. Assignment quality vs flat argmax is
    *    spec-pinned. */
  private[ops] def assignedCells(df: DataFrame, vecCol: String,
                                 centroids: Array[Array[Double]],
                                 literalCap: Int = LiteralCentroidCap): DataFrame =
    if (centroids.length <= literalCap)
      df.withColumn("cell", argmaxCos(centroids, col(vecCol)))
    else if (centroids.length <= TwoLevelCentroidCap) {
      val cents = broadcast(centroidArrayDf(df.sparkSession, centroids))
      df.crossJoin(cents)
        .withColumn("cell", argmaxCosArr(col("_cents"), col(vecCol))).drop("_cents")
    } else {
      val (coarse, children) = coarseLayer(centroids,
        math.max(1, math.ceil(math.sqrt(centroids.length.toDouble)).toInt))
      val cents = broadcast(twoLevelArrayDf(df.sparkSession, centroids, coarse, children))
      df.crossJoin(cents)
        .withColumn("cell", argmaxCosArr(
          element_at(col("_fine"), argmaxCosArr(col("_coarse"), col(vecCol)) + 1),
          col(vecCol)))
        .drop("_coarse", "_fine")
    }

  /** One-row broadcast table for the two-level path: `_coarse` holds
    * the coarse centroids with their GROUP POSITION as `i`, `_fine`
    * holds each group's fine centroids with their ORIGINAL cell index.
    * (The query side's exact probe ranking broadcasts its own flat
    * `centroidArrayDf` — duplicating the flat matrix here would ship
    * a third centroid copy per task for no reader.) */
  private def twoLevelArrayDf(spark: org.apache.spark.sql.SparkSession,
                              centroids: Array[Array[Double]],
                              coarse: Array[Array[Double]],
                              children: Array[Array[Int]]): DataFrame = {
    def cstruct(i: Int, v: Array[Double]) = Row(i, v.map(_.toFloat).toSeq)
    val sType = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("v", org.apache.spark.sql.types.ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val schema = StructType(Seq(
      StructField("_coarse", org.apache.spark.sql.types.ArrayType(sType, containsNull = false),
        nullable = false),
      StructField("_fine",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ArrayType(sType, containsNull = false),
          containsNull = false), nullable = false)))
    val row = Row(
      coarse.zipWithIndex.map { case (v, c) => cstruct(c, v) }.toSeq,
      children.map(_.map(i => cstruct(i, centroids(i))).toSeq).toSeq)
    spark.createDataFrame(java.util.Arrays.asList(row), schema)
  }

  /** IVF-Flat approximate top-k: corpus vectors are partitioned into
    * `nlist` Voronoi cells of the trained centroids; each query scores
    * only the cells of its `nprobe` nearest centroids. Expected per-
    * query work is corpus·nprobe/nlist. Complements `lshTopK`: IVF
    * adapts to the data distribution (learned cells) where LSH is
    * data-oblivious, at the cost of a training pass.
    *
    * The probe join broadcasts the (small) query side; the corpus side
    * is a narrow scan + argmax map, shuffled only by the final
    * per-query rank window on candidate rows. Recall vs bruteForceTopK
    * is pinned in SimilaritySpec. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 0, nprobe: Int = 0,
              iters: Int = 3, seed: Long = 42L,
              sampleFraction: Double = 1.0): DataFrame = {
    if (corpus.head(1).isEmpty) return emptyTopK(corpus, idCol)
    ivfTopKWith(trainIvfCentroids(corpus, idCol, vecCol, nlist, iters, seed, sampleFraction),
      corpus, queries, idCol, vecCol, k, nprobe)
  }

  /** Auto-scaled probe count: nprobe ≈ √nlist, floor 4. With
    * nlist ≈ √n this probes ~n^¾ vectors per query — still sublinear —
    * where a FIXED nprobe shrinks the probed fraction as 4/nlist and
    * silently degrades recall exactly as the corpus grows (a query
    * whose true neighbor sits in its 5th-closest cell loses it). */
  private[ops] def autoNprobe(nlist: Int): Int =
    math.max(4, math.ceil(math.sqrt(nlist.toDouble)).toInt)

  /** IVF search against an already-trained centroid matrix — the
    * steady-state path: an index is trained once (or refreshed on a
    * schedule) and queried many times; re-training per query would make
    * the training jobs dominate sub-second searches. */
  def ivfTopKWith(centroids: Array[Array[Double]],
                  corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int, nprobe: Int = 0): DataFrame =
    ivfTopKWithCap(centroids, corpus, queries, idCol, vecCol, k, nprobe,
      LiteralCentroidCap)

  /** [[ivfTopKWith]] with the literal/broadcast switchover exposed —
    * `literalCap = 0` forces the broadcast-centroid path at any nlist
    * (the spec pins both paths to identical rows). */
  /** Each query row exploded to its top-`nprobe` probe cells: one
    * `(…, cell)` row per (query, probed cell). Shared by the in-memory
    * IVF search and the disk-resident [[VectorIndex]] so both probe
    * IDENTICAL cells. Queries keep the FLAT exact probe ranking at
    * every nlist — the query side is small by contract, and flat
    * probing preserves the planted-copy recovery theorem the oracle
    * checks. */
  private[ops] def probedQueries(q: DataFrame, vecCol: String,
                                 centroids: Array[Array[Double]], nprobe: Int,
                                 literalCap: Int = LiteralCentroidCap): DataFrame =
    if (centroids.length <= literalCap)
      q.withColumn("cell", explode(topProbes(centroids, col(vecCol), nprobe)))
    else {
      val cents = broadcast(centroidArrayDf(q.sparkSession, centroids))
      q.crossJoin(cents)
        .withColumn("cell", explode(topProbesArr(col("_cents"), col(vecCol), nprobe)))
        .drop("_cents")
    }

  private[ops] def ivfTopKWithCap(centroids: Array[Array[Double]],
                                  corpus: DataFrame, queries: DataFrame, idCol: String,
                                  vecCol: String, k: Int, nprobe: Int,
                                  literalCap: Int): DataFrame = {
    // nprobe = 0 scales probes with the cell count (see autoNprobe):
    // one knob auto-scaling while the other stays fixed is how recall
    // silently decays with corpus growth
    val np = if (nprobe > 0) nprobe else autoNprobe(centroids.length)
    // null vectors are unscorable — drop them (zero-norm vectors are
    // fine here: cosine scores them 0.0, so they never rank)
    val cRaw = corpus.where(col(vecCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val qRaw = queries.where(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = assignedCells(cRaw, "c_vec", centroids, literalCap)
    val q = probedQueries(qRaw, "q_vec", centroids, np, literalCap)
    val scored = broadcast(q).join(c, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosineCol(col("q_vec"), col("c_vec")))
      .select("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Persist a trained IVF centroid matrix as a tiny parquet table
    * (`cell`, `centroid`) — the missing half of the train-once contract:
    * `trainIvfCentroids` already decouples training cost from queries
    * within a session, but a 100 TB deployment trains on a schedule and
    * queries from MANY sessions/jobs; the index must round-trip through
    * storage like the Metastore's stats do.
    *
    * Refresh protocol: the new index is FULLY written to a `.tmp` dir
    * first, then swapped in by two renames (old → `.old`, tmp → live) —
    * a plain `mode("overwrite")` would delete the live dir for the
    * whole duration of the write job, leaving concurrent readers a
    * seconds-wide missing-index window; the rename pair narrows that to
    * the instant between renames. A reader that hits that instant (or
    * a crash between the renames) finds no live dir and should retry
    * after `recoverIvfIndex` — same contract as the lake swaps. */
  def saveIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                   centroids: Array[Array[Double]]): Unit = {
    require(centroids.nonEmpty, "refusing to persist an empty centroid matrix")
    val rows = centroids.zipWithIndex.map { case (v, i) => Row(i, v.toSeq) }
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(live.getParent, live.getName + ".tmp")
    val old = new org.apache.hadoop.fs.Path(live.getParent, live.getName + ".old")
    fs.delete(tmp, true)
    spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        StructType(Seq(StructField("cell", IntegerType, nullable = false),
          StructField("centroid", org.apache.spark.sql.types.ArrayType(DoubleType, false)))))
      .repartition(1) // nlist × dim doubles — KBs; one file, like a stats table
      .write.parquet(tmp.toString)
    fs.delete(old, true)
    if (fs.exists(live)) require(fs.rename(live, old), s"could not stage $live aside")
    require(fs.rename(tmp, live), s"could not commit $tmp to $live")
    fs.delete(old, true)
  }

  /** Roll back a refresh that crashed between the two renames (live
    * missing, `.old` present): restores the previous index. Call before
    * `loadIvfIndex` in environments where a trainer may die mid-swap. */
  def recoverIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(live.getParent, live.getName + ".old")
    if (!fs.exists(live) && fs.exists(old))
      require(fs.rename(old, live), s"could not restore $old to $live")
    else if (fs.exists(old))
      // live exists → `.old` is a superseded leftover from a save that
      // crashed after its commit rename but before the final delete;
      // without this it lingers until the NEXT successful save
      fs.delete(old, true)
    fs.delete(new org.apache.hadoop.fs.Path(live.getParent, live.getName + ".tmp"), true)
  }

  /** Directory content tag for the matrix-load caches below: file
    * (name, mtime, length) triples in one listing. A two-rename swap
    * ([[saveIvfIndex]]/[[savePqCodebooks]]) replaces the part files, so
    * any rewrite changes the tag; a cross-process writer is caught the
    * same way (the listing is re-taken per load call). */
  private def dirTag(spark: org.apache.spark.sql.SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).map(st =>
        s"${st.getPath.getName}#${st.getModificationTime}#${st.getLen}")
      .sorted.mkString(";")
  }

  // loaded index matrices, one entry per (session, path), invalidated
  // by directory-content tag: a probe pays ONE fs listing instead of a
  // parquet read + collect job per query — an index is loaded many
  // times per lifetime, the [[IncrementalDedup]] metaCache contract
  private val ivfLoadCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), (String, Array[Array[Double]])]()
  private val pqLoadCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), (String, (Array[Array[Array[Float]]], Boolean))]()

  /** Load a persisted IVF index. Validates shape on the way in — cells
    * must be exactly 0..n-1 with one uniform-dimension centroid each —
    * so a corrupted or half-written index fails HERE with a usable
    * message, not downstream as a wrong-cell assignment. Cached per
    * (session, path) against the directory tag. */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): Array[Array[Double]] = {
    val tag = dirTag(spark, path)
    val key = (spark, path)
    val cached = ivfLoadCache.get(key)
    if (cached != null && cached._1 == tag) return cached._2
    val fresh = loadIvfIndexUncached(spark, path)
    ivfLoadCache.put(key, (tag, fresh))
    fresh
  }

  private def loadIvfIndexUncached(spark: org.apache.spark.sql.SparkSession,
                                   path: String): Array[Array[Double]] = {
    val rows = spark.read.parquet(path).select("cell", "centroid").collect()
    require(rows.nonEmpty, s"IVF index at $path is empty")
    val byCell = rows.map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    require(byCell.map(_._1).toSeq == (0 until rows.length),
      s"IVF index at $path has non-contiguous cells — corrupted or partially written")
    val dims = byCell.map(_._2.length).distinct
    require(dims.length == 1 && dims.head > 0,
      s"IVF index at $path mixes centroid dimensions: ${dims.mkString(",")}")
    byCell.map(_._2)
  }

  /** Embedding-space decontamination — the semantic twin of
    * [[Dedup.contamination]] (n-gram): flags every training vector
    * whose cosine against ANY benchmark vector reaches `threshold`, as
    * `(train_id, bench_id, cos)` pairs. Paraphrased or translated eval
    * leakage survives n-gram decontamination but not an embedding
    * match — production pipelines run BOTH.
    *
    * Scale shape (the same contract as the text twin): the benchmark
    * side is eval-suite-sized by definition, so it travels ONCE as a
    * single collected struct array inside a broadcast row; the training
    * corpus is scanned in one NARROW pass (per-row higher-order filter
    * over the bench array — the same codegen'd CosineSimilarity kernel
    * per element as `argmaxCosArr`) and never shuffles; rows without a
    * match emit nothing (explode of an empty array). Exact — no LSH
    * recall caveat — at O(|train| · |bench| · dim) multiplies, which at
    * |bench| ≈ 10⁴ is a constant factor on the scan, not a join. */
  def embeddingContamination(train: DataFrame, bench: DataFrame,
                             idCol: String, vecCol: String,
                             threshold: Double): DataFrame = {
    val b = bench.where(col(vecCol).isNotNull)
      .agg(collect_list(struct(col(idCol).as("bid"), col(vecCol).as("bv"))).as("_bs"))
    train.where(col(vecCol).isNotNull)
      .crossJoin(broadcast(b))
      .select(col(idCol).as("train_id"),
        explode(filter(
          transform(col("_bs"), s =>
            struct(s.getField("bid").as("bench_id"),
              cosineCol(s.getField("bv"), col(vecCol)).as("cos"))),
          s => s.getField("cos") >= threshold)).as("m"))
      .select(col("train_id"), col("m.bench_id").as("bench_id"), col("m.cos").as("cos"))
  }

  /** LSH approximate top-k: BANDED multi-table search — L independent
    * bands of r private hyperplanes each (same `bandedSignBuckets` as
    * `Dedup.embeddingNearDup`); candidates are the union over bands of
    * the query's band-bucket, ranked by exact cosine. Recall comes from
    * the multi-band OR, 1−(1−s^r)^L: each band is an independent draw,
    * so growing the bucket space (r, which bounds candidate work) no
    * longer collapses recall — the earlier single-table+bit-flip form
    * had exactly that failure: auto-scaling its one table's plane count
    * with n drove per-table match probability for a non-identical
    * neighbor toward zero (~9% recall for cos 0.8 at n=16M) while the
    * Hamming-1 probes recovered only one flipped bit of p. Defaults:
    * r = autoPlanes(n) (mean band-bucket ~256, capped — see autoPlanes
    * for the past-the-cap contract), L = autoBands(r) (≥90% recall at
    * cos 0.8). Per-query candidate work ≈ L · mean-bucket.
    * Recall is tested against bruteForceTopK in SimilaritySpec.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 0, seed: Long = 42L,
              bands: Int = 0): DataFrame = {
    // (count, dimension) probe + null filter: null vectors are
    // unbucketable (a null dot silently lands them all in bucket 0) and
    // a null-vector first row would NPE the getInt. One job probes both.
    val valid = corpus.where(col(vecCol).isNotNull)
    val probe = valid.agg(count(lit(1)), max(size(col(vecCol)))).head()
    if (probe.getLong(0) == 0L) return emptyTopK(corpus, idCol)
    val dim = probe.getInt(1)
    val r = if (planes > 0) planes else autoPlanes(probe.getLong(0))
    val l = if (bands > 0) bands else autoBands(r)
    // the chosen pair is the cost story (L multiplies candidate work —
    // see autoBands' table); logged so a bench regression after corpus
    // growth is attributable to the knobs, not guessed at
    log.info(s"lshTopK: n=${probe.getLong(0)} dim=$dim planesPerBand=$r bands=$l " +
      s"(candidate work scales with bands × mean band-bucket size)")
    val c = bandedSignBuckets(
      valid.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")),
      "c_vec", dim, l, r, seed)
    val qb = bandedSignBuckets(queries.where(col(vecCol).isNotNull)
        .select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      "q_vec", dim, l, r, seed)
    // equi-join on (band, bucket): a candidate surfacing in several
    // bands is scored per band and deduped after — cosines are cheap
    // next to shuffling vector arrays through a pre-score distinct
    val scored = broadcast(qb).join(c, Seq("band", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosineCol(col("q_vec"), col("c_vec")))
      .select("query_id", "neighbor_id", "cos").distinct()
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  // ─────────────────────────────────────────────────────────────────────
  // Product quantization (PQ) — the memory-compression leg of ANN.
  // LSH and IVF bound how many vectors a query TOUCHES; PQ bounds how
  // many BYTES each touched vector costs: an m-subspace, ks-entry
  // codebook turns a dim-float vector into m small codes (64 floats →
  // 8 bytes at m=8, ks=16 — 32×), so a candidate scan reads codes, not
  // embeddings. At 100 TB of raw fp32 embeddings the code table is
  // ~3 TB — the difference between a scan that thrashes and one that
  // sits in page cache. Search is two-stage: asymmetric-distance
  // (query vs reconstructed codes) shortlists candidates, then the
  // shortlist alone is re-ranked against true vectors — the standard
  // IVFADC refinement split (Jégou et al., "Product Quantization for
  // Nearest Neighbor Search").
  //
  // All distances run on L2-NORMALIZED vectors (cosine geometry), in
  // DOUBLE, as higher-order functions — no UDF. Normalization is also
  // what makes the planted-copy oracle theorem carry over: a
  // power-of-two-scaled copy normalizes BIT-IDENTICALLY to its source
  // (each step — square, sum, sqrt, divide — is exact under 2^m
  // scaling), so copies share their source's code, and ADC distance to
  // one's own code is the per-subspace minimum — copies tie at rank 1
  // of the shortlist by construction.
  // ─────────────────────────────────────────────────────────────────────

  /** Evaluate `e` ONCE per row and hand its VALUE to `f` as a lambda
    * variable (a one-element `transform`). Catalyst has no common
    * subexpression elimination across higher-order-function lambdas:
    * a Column spliced into a lambda body is re-inlined — and
    * re-evaluated — at every usage site, so an aggregate-over-the-
    * vector subexpression used inside an m·ks-iteration HOF multiplies
    * the tree (and the generated Java, and the runtime) by m·ks.
    * Binding turns those sites into a cheap lambda-variable read and
    * keeps one copy of the subtree in the plan. */
  private def bindOnce(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), f), 1)

  /** L2-normalized DOUBLE copy of a float-array vector column; zero
    * vectors pass through unscaled (their cosine is defined 0.0
    * downstream, so their code only needs to be deterministic). The
    * norm is [[bindOnce]]-bound — one aggregate per row, not one per
    * element of the output. */
  private[ops] def normalizedCol(v: Column): Column =
    bindOnce(sqrt(aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))) { n =>
      when(n > 0, transform(v, x => x.cast("double") / n))
        .otherwise(transform(v, x => x.cast("double")))
    }

  /** Codebooks as a plan literal: array<array<array<double>>> of
    * (m, ks, dsub). m·ks·dsub doubles — ~1k lits at the defaults, the
    * same bake-into-the-plan treatment as the LSH hyperplanes. */
  private[ops] def pqLit(cb: Array[Array[Array[Float]]]): Column =
    array(cb.map(sub => array(sub.map(e =>
      array(e.map(x => lit(x.toDouble)): _*)): _*)): _*)

  /** Driver-side Lloyd's iterations over one subspace's points.
    * Deterministic: evenly-spaced init over the (hash-ordered) sample,
    * fixed iteration count, empty clusters keep their previous center.
    * Returns min(ks, n) centers — a degenerate tiny corpus just gets a
    * smaller codebook. */
  private def lloyd(points: Array[Array[Double]], ks: Int, iters: Int): Array[Array[Double]] = {
    val n = points.length
    val dsub = points.head.length
    val kEff = math.min(ks, n)
    var centers = Array.tabulate(kEff)(c => points(((c.toLong * n) / kEff).toInt).clone())
    def nearest(p: Array[Double]): Int = {
      var best = 0; var bd = Double.MaxValue; var c = 0
      while (c < kEff) {
        var d = 0.0; var t = 0
        while (t < dsub) { val x = p(t) - centers(c)(t); d += x * x; t += 1 }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      best
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kEff, dsub)(0.0)
      val cnts = new Array[Long](kEff)
      points.foreach { p =>
        val c = nearest(p)
        var t = 0
        while (t < dsub) { sums(c)(t) += p(t); t += 1 }
        cnts(c) += 1
      }
      centers = Array.tabulate(kEff)(c =>
        if (cnts(c) > 0L) sums(c).map(_ / cnts(c)) else centers(c))
      it += 1
    }
    centers
  }

  /** Train per-subspace PQ codebooks on a deterministic hash-ordered
    * sample of the corpus (top-`sampleMax` by xxhash64(id, seed) — a
    * `TakeOrderedAndProject`, not a global sort). The collect is
    * bounded by sampleMax·dim doubles (~32 MB at the defaults) — PQ
    * codebooks, like k-means centroids, train on a sample by design;
    * corpus size never changes the driver footprint. */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                       m: Int = 8, ks: Int = 16, iters: Int = 10,
                       seed: Long = 42L, sampleMax: Int = 65536): Array[Array[Array[Float]]] =
    trainPqOnPrepared(samplePqNormalized(corpus, idCol, vecCol, seed, sampleMax),
      m, ks, iters)

  /** [[trainPqCodebooks]] for RESIDUAL encoding (the Jégou et al.
    * IVFADC form): codebooks learn the distribution of
    * `normalized(v) − centroid(cell(v))` instead of the vectors
    * themselves. Residuals concentrate near the origin regardless of
    * which cell a vector lives in, so the same ks entries quantize
    * every cell's local geometry instead of spreading over the whole
    * sphere — finer effective resolution at equal code size. Cell
    * assignment here replicates [[assignedCells]]' rule (max cosine,
    * ties to the larger index) driver-side over the training sample. */
  def trainPqCodebooksResidual(corpus: DataFrame, idCol: String, vecCol: String,
                               cents: Array[Array[Double]],
                               m: Int = 8, ks: Int = 16, iters: Int = 10,
                               seed: Long = 42L, sampleMax: Int = 65536): Array[Array[Array[Float]]] = {
    val normed = samplePqNormalized(corpus, idCol, vecCol, seed, sampleMax)
    val cNorms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    def cellOf(v: Array[Double]): Int = {
      var best = 0; var bs = Double.MinValue
      var i = 0
      while (i < cents.length) {
        var d = 0.0; var t = 0
        while (t < v.length) { d += v(t) * cents(i)(t); t += 1 }
        val cos = if (cNorms(i) > 0) d / cNorms(i) else 0.0
        if (cos >= bs) { bs = cos; best = i } // ties -> larger index, like argmaxCos
        i += 1
      }
      best
    }
    val residuals = normed.map { v =>
      val c = cents(cellOf(v))
      Array.tabulate(v.length)(t => v(t) - c(t))
    }
    trainPqOnPrepared(residuals, m, ks, iters)
  }

  private def samplePqNormalized(corpus: DataFrame, idCol: String, vecCol: String,
                                 seed: Long, sampleMax: Int): Array[Array[Double]] = {
    val rows = corpus.where(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
      .limit(sampleMax)
      .select(col(vecCol)).collect()
    require(rows.nonEmpty, "cannot train PQ codebooks on an empty corpus")
    rows.map { r =>
      val v = r.getSeq[Float](0).toArray.map(_.toDouble)
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else v
    }
  }

  private def trainPqOnPrepared(prepared: Array[Array[Double]], m: Int,
                                ks: Int, iters: Int): Array[Array[Array[Float]]] = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(ks >= 2, s"ks must be >= 2, got $ks")
    val dim = prepared.head.length
    require(dim % m == 0, s"vector dim=$dim is not divisible by m=$m subspaces")
    val dsub = dim / m
    Array.tabulate(m) { j =>
      val sub = prepared.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      lloyd(sub, ks, iters).map(_.map(_.toFloat))
    }
  }

  /** Squared L2 between the j-th dsub-slice of a normalized vector and
    * one codebook entry. */
  private def sqDistSlice(vn: Column, j: Column, entry: Column, dsub: Int): Column =
    aggregate(sequence(lit(1), lit(dsub)), lit(0.0), (acc, t) => {
      val d = element_at(vn, j * dsub + t) - element_at(entry, t)
      acc + d * d
    })

  /** PQ code (array<int>, one entry per subspace) for a vector column:
    * per subspace, the index of the L2-nearest codebook entry of the
    * NORMALIZED vector. First-minimum tiebreak via a min-then-locate
    * pass (two identical expression evaluations compare exactly equal),
    * avoiding struct accumulators whose field names type-coerce
    * unpredictably through `when` branches. Narrow, codegen-friendly,
    * m·ks·dsub multiply-adds per row. */
  def pqEncodeCol(vecCol: Column, cb: Array[Array[Array[Float]]]): Column =
    pqEncodePreparedCol(normalizedCol(vecCol), cb)

  /** Encode an already-PREPARED double-array column (normalized vector
    * for raw PQ; normalized-minus-centroid for residual IVFADC — the
    * residual must NOT be re-normalized, its magnitude IS the signal).
    * Native codegen'd ([[graft.functions.PqEncode]]) — the HOF form it
    * replaces ([[pqEncodePreparedColHof]], the spec's bit-identity
    * anchor) paid ~m·ks·2·dsub interpreted lambda steps per row. */
  private[ops] def pqEncodePreparedCol(prepared: Column, cb: Array[Array[Array[Float]]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.PqEncode(
        org.apache.spark.sql.GraftColumnBridge.expression(prepared), cb))

  /** The superseded higher-order-function encode — retained ONLY as the
    * arithmetic reference [[PqFusedSpec]] pins the native expression
    * against (least-fold, first-minimum locate, null/NaN corners). */
  private[ops] def pqEncodePreparedColHof(prepared: Column, cb: Array[Array[Array[Float]]]): Column = {
    val dsub = cb(0)(0).length
    val cbL = pqLit(cb)
    bindOnce(prepared) { vn =>
      transform(sequence(lit(0), lit(cb.length - 1)), j => {
        val entries = element_at(cbL, j + 1)
        bindOnce(aggregate(entries, lit(Double.MaxValue),
          (acc, e) => least(acc, sqDistSlice(vn, j, e, dsub)))) { minD =>
          aggregate(sequence(lit(1), size(entries)), lit(0),
            (acc, ci) => when(acc === 0 &&
              sqDistSlice(vn, j, element_at(entries, ci), dsub) === minD, ci)
              .otherwise(acc)) - 1
        }
      })
    }
  }

  /** `normalized − centroid` (both double arrays), the IVFADC residual. */
  private[ops] def residualCol(vn: Column, centroid: Column): Column =
    zip_with(vn, centroid, (x, c) => x - c)

  /** Corpus → (idCol, code) table. At scale this runs ONCE at ingest
    * (or in [[VectorIndex]]-style layout builds) and is what queries
    * scan instead of embeddings. */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               cb: Array[Array[Array[Float]]]): DataFrame =
    corpus.where(col(vecCol).isNotNull)
      .select(col(idCol), pqEncodeCol(col(vecCol), cb).as("code"))

  /** Asymmetric distance (ADC): ‖qn − reconstruct(code)‖² summed over
    * subspaces, qn the normalized query. Reads only the CODE column of
    * the corpus side. Native codegen'd expression
    * ([[graft.functions.AdcDistance]]) — this is the per-PAIR scoring
    * loop of every ADC shortlist, and the HOF form it replaces
    * ([[adcDistColHof]], kept as the spec's bit-identity anchor) paid
    * m·dsub interpreted lambda steps per pair. */
  private[ops] def adcDistCol(qn0: Column, code0: Column,
                              cb: Array[Array[Array[Float]]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.AdcDistance(
        org.apache.spark.sql.GraftColumnBridge.expression(qn0),
        org.apache.spark.sql.GraftColumnBridge.expression(code0), cb))

  /** The superseded higher-order-function ADC formulation — retained
    * ONLY as the arithmetic reference [[PqFusedSpec]] pins the native
    * expression against, element-order and corner cases included. */
  private[ops] def adcDistColHof(qn0: Column, code0: Column, cbL: Column, dsub: Int): Column =
    // both inputs bound once: even if the optimizer splices the full
    // encode expression in place of the `code` attribute (projection
    // collapse through the cross join), it evaluates once per pair —
    // not once per subspace access inside the aggregate below
    bindOnce(qn0) { qn =>
      bindOnce(code0) { code =>
        aggregate(sequence(lit(0), size(code) - 1), lit(0.0), (acc, j) => {
          val entry = element_at(element_at(cbL, j + 1), element_at(code, j + 1) + 1)
          acc + sqDistSlice(qn, j, entry, dsub)
        })
      }
    }

  /** Two-stage PQ search against pre-encoded codes: ADC shortlist of
    * `candK` per query (RANK, not row_number — an ADC tie never drops
    * a candidate, which is what makes planted-copy recovery a theorem
    * rather than a tiebreak accident), then exact cosine re-rank of
    * the shortlist against true vectors. The code scan is the only
    * full-corpus pass and it carries (id, m bytes); the true-vector
    * join touches candK·|queries| rows. Output schema matches the
    * other top-k paths: (query_id, neighbor_id, rank, cos), self-pairs
    * excluded. */
  def pqTopKWith(cb: Array[Array[Array[Float]]], codes: DataFrame,
                 corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int, candK: Int = 32): DataFrame = {
    require(candK >= k, s"candK=$candK must be >= k=$k")
    val q = queries.where(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        normalizedCol(col(vecCol)).as("_qn"))
    val scored = codes
      .select(col(idCol).as("neighbor_id"), col("code"))
      .crossJoin(broadcast(q.select(col("query_id"), col("_qn"))))
      .withColumn("_adist", adcDistCol(col("_qn"), col("code"), cb))
      .select("query_id", "neighbor_id", "_adist")
    // _adist ALONE — adding an id tiebreak would make the order total,
    // collapsing rank() into row_number() and silently dropping tied
    // candidates past the candK cut (the documented tie contract would
    // then hold only by accident). Ties straddling the cut all survive
    // (the shortlist may exceed candK by the tie width); the exact
    // re-rank window below supplies final determinism.
    val wA = Window.partitionBy("query_id").orderBy(col("_adist").asc)
    val cands = scored.withColumn("_arank", rank().over(wA))
      .where(col("_arank") <= candK)
      .select("query_id", "neighbor_id")
    val cv = corpus.where(col(vecCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val rer = cv.join(broadcast(cands), Seq("neighbor_id"))
      .join(broadcast(q.select(col("query_id"), col("q_vec"))), Seq("query_id"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosineCol(col("q_vec"), col("c_vec")))
      // project the vectors away BEFORE the rank window: its exchange
      // then carries only (query_id, neighbor_id, cos) — no shuffle in
      // the whole plan moves an array column (spec-pinned)
      .select("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    rer.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Train + encode + search in one call — the small-corpus/spec form.
    * Steady-state deployments call [[trainPqCodebooks]] on a schedule,
    * persist codes via [[pqEncode]], and query with [[pqTopKWith]]. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 8, ks: Int = 16,
             candK: Int = 32, seed: Long = 42L): DataFrame = {
    if (corpus.head(1).isEmpty) return emptyTopK(corpus, idCol)
    val cb = trainPqCodebooks(corpus, idCol, vecCol, m, ks, seed = seed)
    pqTopKWith(cb, pqEncode(corpus, idCol, vecCol, cb), corpus, queries,
      idCol, vecCol, k, candK)
  }

  /** Persist trained PQ codebooks (same two-rename swap as
    * [[saveIvfIndex]]: a reader never sees PARTIAL data — it reads the
    * old complete matrix or the new one). The swap is not seamless:
    * between rename(live→old) and rename(tmp→live) the live path is
    * briefly absent, so a concurrent [[loadPqCodebooks]] can fail with
    * path-not-found (retry), and a crash inside that window leaves the
    * matrix stranded at `<path>.old` — [[recoverIvfIndex]] is
    * path-generic and restores a codebook dir exactly as it does the
    * centroid twin. One row per subspace — m·ks·dsub floats, KBs. */
  def savePqCodebooks(spark: org.apache.spark.sql.SparkSession, path: String,
                      cb: Array[Array[Array[Float]]],
                      residual: Boolean = false): Unit = {
    require(cb.nonEmpty, "refusing to persist empty PQ codebooks")
    // the residual flag rides every row (uniform): a probe MUST prepare
    // its query the way the codes were encoded, so the layout is
    // self-describing rather than trusting callers to remember
    val rows = cb.zipWithIndex.map { case (sub, j) =>
      Row(j, sub.map(_.toSeq).toSeq, residual)
    }
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(live.getParent, live.getName + ".tmp")
    val old = new org.apache.hadoop.fs.Path(live.getParent, live.getName + ".old")
    fs.delete(tmp, true)
    spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        StructType(Seq(StructField("sub", IntegerType, nullable = false),
          StructField("codebook", org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.ArrayType(FloatType, false), false)),
          StructField("residual", org.apache.spark.sql.types.BooleanType,
            nullable = false))))
      .repartition(1)
      .write.parquet(tmp.toString)
    fs.delete(old, true)
    if (fs.exists(live)) require(fs.rename(live, old), s"could not stage $live aside")
    require(fs.rename(tmp, live), s"could not commit $tmp to $live")
    fs.delete(old, true)
  }

  /** Load persisted PQ codebooks → (codebooks, residual?). Validates
    * subspaces are exactly 0..m-1 with uniform entry count and
    * sub-dimension, so a corrupt index fails here with a usable
    * message. Layouts written before the residual flag load as
    * residual = false (the raw encoding they were built with).
    * Cached per (session, path) against the directory tag, like
    * [[loadIvfIndex]]. */
  def loadPqCodebooks(spark: org.apache.spark.sql.SparkSession,
                      path: String): (Array[Array[Array[Float]]], Boolean) = {
    val tag = dirTag(spark, path)
    val key = (spark, path)
    val cached = pqLoadCache.get(key)
    if (cached != null && cached._1 == tag) return cached._2
    val fresh = loadPqCodebooksUncached(spark, path)
    pqLoadCache.put(key, (tag, fresh))
    fresh
  }

  private def loadPqCodebooksUncached(spark: org.apache.spark.sql.SparkSession,
                                      path: String): (Array[Array[Array[Float]]], Boolean) = {
    val df = spark.read.parquet(path)
    val hasFlag = df.columns.contains("residual")
    val raw = df.collect()
    val rows = raw
      .map(r => r.getInt(0) -> r.getSeq[scala.collection.Seq[Float]](1)
        .map(_.toArray).toArray)
      .sortBy(_._1)
    require(rows.nonEmpty, s"PQ codebook index at $path is empty")
    require(rows.map(_._1).toSeq == rows.indices.toSeq,
      s"PQ codebook index at $path has gaps: subs ${rows.map(_._1).mkString(",")}")
    val cb = rows.map(_._2)
    val ks = cb.head.length
    val dsub = cb.head.head.length
    require(cb.forall(sub => sub.length == ks && sub.forall(_.length == dsub)),
      s"PQ codebook index at $path is ragged (expected uniform ks=$ks, dsub=$dsub)")
    val residual = hasFlag && {
      val flags = raw.map(_.getAs[Boolean]("residual")).distinct
      require(flags.length == 1,
        s"PQ codebook index at $path mixes residual and raw subspaces")
      flags.head
    }
    (cb, residual)
  }
}
