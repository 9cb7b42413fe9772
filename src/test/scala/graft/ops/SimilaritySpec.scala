package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("cosine column math is exact in double precision") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 1.0f), Array(1.0f, 1.0f)),
      (Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
    val r = df.select(Similarity.cosineCol(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(r(0) === 0.0)
    assert(math.abs(r(1) - 1.0) < 1e-12)
    assert(math.abs(r(2) - 24.0 / 25.0) < 1e-12)
  }

  private lazy val corpus: DataFrame = {
    // deterministic pseudo-random corpus: 100 vectors, dim 8
    import spark.implicits._
    val rng = new scala.util.Random(4242)
    (0L until 100L).map(i => (i, Array.fill(8)(rng.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  test("brute-force top-k: ranks ordered, correct count, self excluded") {
    val q = corpus.where(col("vec_id") < 3)
    val r = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", 5)
      .orderBy("query_id", "rank").collect()
    assert(r.length === 15)
    for (row <- r) assert(row.getLong(1) !== row.getLong(0), "query must not be its own neighbor")
    r.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).toSeq === (1 to 5).toSeq)
      val cos = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }, "cos must be non-increasing in rank")
    }
  }

  test("brute-force top-1 is the true argmax (verified by local math)") {
    val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val top1 = Similarity.bruteForceTopK(corpus, corpus.where(col("vec_id") === 0), "vec_id", "embedding", 1)
      .first()
    val expected = vecs.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(vecs(0L), v)) }
      .maxBy { case (id, c) => (c, -id) }
    assert(top1.getLong(1) === expected._1)
    assert(math.abs(top1.getDouble(3) - expected._2) < 1e-12)
  }

  test("LSH top-k achieves reasonable recall vs brute force") {
    val q = corpus.where(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(corpus, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    // deterministic (fixed seed): banded multi-table OR — independent
    // bands make recall robust where the old single-table form's was
    // a per-seed coin flip
    assert(recall >= 0.6, f"LSH recall $recall%.2f too low vs brute force")
    // and LSH never invents neighbors with higher cos than true top-k's floor
    assert(lsh.forall { case (qid, _) => q.select("vec_id").collect().map(_.getLong(0)).contains(qid) })
  }

  test("IVF top-k achieves reasonable recall vs brute force") {
    val q = corpus.where(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(corpus, q, "vec_id", "embedding", 5,
        nlist = 8, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.5, f"IVF recall $recall%.2f too low vs brute force")
    // every reported cos must equal the true cosine (IVF approximates the
    // candidate set, never the score)
    val scores = Similarity.ivfTopK(corpus, q, "vec_id", "embedding", 5,
      nlist = 8, nprobe = 3).collect()
    val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    scores.foreach { r =>
      assert(math.abs(r.getDouble(3) - cos(vecs(r.getLong(0)), vecs(r.getLong(1)))) < 1e-9)
    }
  }

  test("exact-direction copies are structurally recovered by BOTH approximate paths") {
    // power-of-2 scalings of a vector share its hyperplane signs and its
    // argmax-cosine cell bit-for-bit (scaling by 2^m is exact in fp), so
    // LSH and IVF must surface every copy — this is the theorem the
    // sim_lsh_topk / sim_ivf_topk oracles rely on
    val q = corpus.where(col("vec_id") < 4)
    val copies = (1 to 3).map(m =>
      q.select((col("vec_id") + m * 1000L).as("vec_id"),
        transform(col("embedding"), x => x * lit((1 << m).toFloat)).as("embedding")))
      .reduce(_ union _)
    val planted = corpus.union(copies)
    def topIds(df: DataFrame) = df.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val expected = (0L until 4L).map(i => i -> (1 to 3).map(m => i + m * 1000L).toSet).toMap
    val lsh = topIds(Similarity.lshTopK(planted, q, "vec_id", "embedding", 3))
    val ivf = topIds(Similarity.ivfTopK(planted, q, "vec_id", "embedding", 3,
      nlist = 8, nprobe = 1))
    assert(lsh === expected, "LSH must recover every exact-direction copy")
    assert(ivf === expected, "IVF must recover every exact-direction copy even at nprobe=1")
  }

  test("auto-scaled knobs keep per-query work sublinear across a 16x corpus sweep") {
    // LSH: below the plane cap, mean band-bucket n / 2^autoPlanes(n)
    // stays bounded instead of growing linearly with the corpus
    for (n <- Seq(1000L, 4000L, 16000L, 1000000L, 4000000L)) {
      val mean = n.toDouble / (1L << Similarity.autoPlanes(n))
      assert(mean >= 16 && mean <= 512,
        s"n=$n: mean band-bucket $mean outside [16, 512] — bucket space not tracking corpus")
    }
    assert(Similarity.autoPlanes(100L) === 4, "small corpora keep the floor")
    assert(Similarity.autoPlanes(1000000000L) === 14,
      "the plane cap holds per-band recall; past it buckets grow instead")
    // the band count must hold the S-curve recall floor at cos 0.8 for
    // every reachable plane count — the knob pair scales TOGETHER
    // (growing r without growing L is the silent-recall-loss trap)
    val s0 = 1.0 - math.acos(0.8) / math.Pi
    for (r <- 4 to 14) {
      val l = Similarity.autoBands(r)
      val rec = 1.0 - math.pow(1.0 - math.pow(s0, r), l)
      assert(rec >= 0.88, f"r=$r, L=$l: theoretical recall $rec%.2f below floor")
      assert(l <= 56, s"r=$r: band count $l exceeds the cost cap")
    }
    // IVF: probes scale as √nlist, so the probed fraction shrinks
    // gracefully instead of collapsing as 4/nlist
    assert(Similarity.autoNprobe(16) === 4 && Similarity.autoNprobe(1024) === 32)
    // IVF: cells must multiply ~4x per 16x corpus (nlist ≈ √n), so
    // per-query work nprobe·n/nlist grows as √n, not n
    for (n <- Seq(10000L, 160000L, 2560000L)) {
      val r = Similarity.autoNlist(16 * n).toDouble / Similarity.autoNlist(n)
      assert(r >= 3.9 && r <= 4.1, s"n=$n: nlist ratio $r, expected ~4 (sqrt scaling)")
    }
  }

  test("IVF index round-trips through storage and answers identically") {
    val root = tmpDir("ivf_idx")
    val cents = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding", nlist = 8, iters = 2)
    Similarity.saveIvfIndex(spark, s"$root/idx", cents)
    val loaded = Similarity.loadIvfIndex(spark, s"$root/idx")
    assert(loaded.length === cents.length)
    assert(loaded.zip(cents).forall { case (a, b) => a.toSeq == b.toSeq },
      "persisted centroids must round-trip bit-identically")
    val q = corpus.where(col("vec_id") < 5)
    val direct = Similarity.ivfTopKWith(cents, corpus, q, "vec_id", "embedding", 5)
      .collect().map(_.toSeq).toSeq
    val fromDisk = Similarity.ivfTopKWith(loaded, corpus, q, "vec_id", "embedding", 5)
      .collect().map(_.toSeq).toSeq
    assert(direct === fromDisk, "a reloaded index must answer identically")
    // a refresh REPLACES the live index via rename swap; a crash
    // between the renames (live missing, .old present) rolls back
    val cents2 = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding", nlist = 4, iters = 1)
    Similarity.saveIvfIndex(spark, s"$root/idx", cents2)
    assert(Similarity.loadIvfIndex(spark, s"$root/idx").length === 4)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.rename(new org.apache.hadoop.fs.Path(s"$root/idx"),
      new org.apache.hadoop.fs.Path(s"$root/idx.old"))) // simulate mid-swap crash
    Similarity.recoverIvfIndex(spark, s"$root/idx")
    assert(Similarity.loadIvfIndex(spark, s"$root/idx").length === 4,
      "previous index must be restored after a mid-swap crash")

    // corruption fails loudly at load, not as a wrong-cell assignment
    import spark.implicits._
    Seq((0, Seq(1.0, 2.0)), (2, Seq(3.0, 4.0))).toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$root/bad")
    val e = intercept[IllegalArgumentException](Similarity.loadIvfIndex(spark, s"$root/bad"))
    assert(e.getMessage.contains("non-contiguous"))
  }

  test("banded LSH holds recall at a scale where the auto knobs actually engage") {
    import spark.implicits._
    // 10k clustered vectors: auto r = 6 (not the floor 4 the n=500 pin
    // exercises), auto L = autoBands(6). Noise σ=0.5 per dim against
    // unit-variance centers puts within-cluster cosines at ≈1/(1+σ²) ≈
    // 0.8 — ON the S-curve reference similarity, where the recall
    // guarantee is actually at stake (tight σ would make the true
    // top-k cos≈0.99 neighbors that even a broken band count finds).
    // This is the regression test for the single-table form's silent
    // recall collapse (single-digit recall once its one table's plane
    // count grew with n).
    val rng = new scala.util.Random(11)
    val centers = Array.fill(100)(Array.fill(8)(rng.nextGaussian()))
    val big = (0L until 10000L).map { i =>
      val c = centers((i % 100).toInt)
      (i, c.map(x => (x + rng.nextGaussian() * 0.5).toFloat))
    }.toDF("vec_id", "embedding").cache()
    val q = big.where(col("vec_id") < 8)
    val bf = Similarity.bruteForceTopK(big, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(big, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    assert(recall >= 0.8, f"banded LSH recall $recall%.2f below floor at n=10k, cos≈0.8")
    big.unpersist()
  }

  test("sample-trained IVF centroids reach recall parity with full-corpus training") {
    import spark.implicits._
    // clustered corpus: 20 seeded centers, 100 members each — structure
    // a 10% training sample must still capture
    val rng = new scala.util.Random(7)
    val centers = Array.fill(20)(Array.fill(8)(rng.nextGaussian()))
    val big = (0L until 2000L).map { i =>
      val c = centers((i % 20).toInt)
      (i, c.map(x => (x + rng.nextGaussian() * 0.15).toFloat))
    }.toDF("vec_id", "embedding")
    val q = big.where(col("vec_id") < 8)
    val bf = Similarity.bruteForceTopK(big, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(sampleFraction: Double): Double = {
      val cents = Similarity.trainIvfCentroids(big, "vec_id", "embedding",
        nlist = 20, sampleFraction = sampleFraction)
      val got = Similarity.ivfTopKWith(cents, big, q, "vec_id", "embedding", 5, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (bf intersect got).size.toDouble / bf.size
    }
    val full = recall(1.0)
    val sampled = recall(0.1)
    assert(full >= 0.8, f"full-corpus recall $full%.2f below floor")
    assert(sampled >= 0.8, f"10%%-sample recall $sampled%.2f below floor")
    assert(sampled >= full - 0.1,
      f"sample-trained recall $sampled%.2f not at parity with full $full%.2f")
  }

  test("IVF centroid training is deterministic and corpus stays distributed") {
    val c1 = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding", 8, iters = 2)
    val c2 = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding", 8, iters = 2)
    assert(c1.length === 8)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
    // spherical k-means: every trained centroid is unit-norm
    c1.foreach { v =>
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    }
  }

  test("zero-norm and null vectors cannot poison IVF training or results") {
    import spark.implicits._
    val dirty = corpus.union(
      Seq((900L, Array.fill(8)(0.0f)),
        (901L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val cents = Similarity.trainIvfCentroids(dirty, "vec_id", "embedding", 8, iters = 2)
    cents.foreach { v =>
      assert(v.forall(x => !x.isNaN), "a degenerate vector must not poison centroids with NaN")
    }
    val q = corpus.where(col("vec_id") < 3)
    val r = Similarity.ivfTopK(dirty, q, "vec_id", "embedding", 5, nlist = 8, nprobe = 3).collect()
    assert(r.nonEmpty)
    assert(r.forall(row => !row.getDouble(3).isNaN), "no NaN scores may rank")
    assert(r.forall(_.getLong(1) !== 901L), "null vector must not appear as a neighbor")
  }

  test("empty corpus returns an empty result, not a crash") {
    val empty = corpus.where(col("vec_id") < 0)
    val q = corpus.where(col("vec_id") < 3)
    assert(Similarity.lshTopK(empty, q, "vec_id", "embedding", 5).count() === 0)
    assert(Similarity.ivfTopK(empty, q, "vec_id", "embedding", 5).count() === 0)
    assert(Dedup.embeddingNearDup(empty, "vec_id", "embedding", 0.9).count() === 0)
  }

  test("executor-side hyperplane buckets match a literal-form recomputation bit-for-bit") {
    // bandedSignBuckets now regenerates hyperplane components on the
    // executor (HyperplaneBandBucket) instead of shipping L·r·dim float
    // literals; this pins the arithmetic to the exact literal-form
    // recipe — splitmix double, truncated through float, dot
    // accumulated left-to-right in double — so dedup_embedding_lsh /
    // sim_lsh_topk hashes cannot move
    def hyperplane(seed: Long, plane: Int, dim: Int): Array[Float] =
      Array.tabulate(dim) { d =>
        var z = seed + plane.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        (z.toDouble / Long.MaxValue.toDouble).toFloat
      }
    val bands = 3; val planes = 5; val seed = 42L
    val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val expected = vecs.flatMap { case (id, v) =>
      (0 until bands).map { b =>
        var bucket = 0L
        for (p <- 0 until planes) {
          val h = hyperplane(seed, b * planes + p, 8)
          var dot = 0.0
          for (d <- 0 until 8) dot += h(d).toDouble * v(d).toDouble
          if (dot >= 0.0) bucket |= 1L << p
        }
        (id, b, bucket)
      }
    }.toSet
    val got = Similarity.bandedSignBuckets(corpus, "embedding", 8, bands, planes, seed)
      .select("vec_id", "band", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === expected)
    // wrong-dimension vectors still fail loudly, same as the DotProduct form
    val e = intercept[org.apache.spark.SparkException] {
      Similarity.bandedSignBuckets(
        corpus.select(col("vec_id"), slice(col("embedding"), 1, 4).as("embedding")),
        "embedding", 8, 1, 4, seed).collect()
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      e.getCause.getMessage.contains("dimension mismatch"))
  }

  test("IVF literal and broadcast-centroid paths return identical rows") {
    val cents = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding", nlist = 8, iters = 2)
    val q = corpus.where(col("vec_id") < 5)
    val literal = Similarity.ivfTopKWith(cents, corpus, q, "vec_id", "embedding", 5, nprobe = 3)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val broadcasted = Similarity.ivfTopKWithCap(cents, corpus, q, "vec_id", "embedding", 5,
        nprobe = 3, literalCap = 0) // force the scale path at any nlist
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(literal === broadcasted,
      "cell assignment and probe order must be identical across the literal/broadcast switch")
  }

  test("broadcast-centroid path survives nlist=4096 (past the literal-plan ceiling)") {
    // 4096 centroids × dim 8 as literals would be ~4096 expression nodes
    // per projection — plan construction and Janino die well before
    // execution (the round-6 scale ceiling). The broadcast path keeps
    // the plan O(1) in nlist; probing ALL cells degenerates IVF to
    // exact search, so correctness is pinned against bruteForceTopK.
    val rng = new scala.util.Random(99)
    val cents = Array.fill(4096)(Array.fill(8)(rng.nextGaussian()))
    val q = corpus.where(col("vec_id") < 3)
    val ivf = Similarity.ivfTopKWith(cents, corpus, q, "vec_id", "embedding", 5,
        nprobe = 4096)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val bf = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", 5)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(ivf === bf, "all-cells IVF at nlist=4096 must equal exact top-k")
  }

  test("two-level assignment: valid partition, near-flat quality, copies stay with sources") {
    // 9,000 clustered centroids (> TwoLevelCentroidCap = 8,192) — the
    // deep-scale tier where flat per-row argmax would cost nlist
    // cosines and the hierarchy costs ~2·√nlist
    val rng = new scala.util.Random(5)
    val bases = Array.fill(100)(Array.fill(8)(rng.nextGaussian()))
    val cents = Array.tabulate(9000) { i =>
      val b = bases(i % 100)
      val v = b.map(x => x + rng.nextGaussian() * 0.05)
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    // coarseLayer returns a PARTITION of 0..n-1
    val (coarse, children) = Similarity.coarseLayer(cents, 95)
    assert(coarse.length === children.length)
    assert(children.flatten.sorted.toSeq === (0 until 9000))
    // assignment quality: the hierarchically-chosen cell's centroid must
    // be nearly as cosine-close as the flat argmax's for almost every
    // corpus vector (the hierarchy may only perturb boundary vectors)
    import spark.implicits._
    val corpusDf = (0 until 200).map { i =>
      val b = bases(i % 100)
      (i.toLong, b.map(x => (x + rng.nextGaussian() * 0.1).toFloat))
    }.toDF("vec_id", "embedding")
    val hier = Similarity.assignedCells(corpusDf, "embedding", cents)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = corpusDf.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(c: Array[Double], v: Array[Float]): Double = {
      val dot = c.zip(v).map { case (x, y) => x * y.toDouble }.sum
      val nv = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      dot / nv // centroids are unit-norm
    }
    val ok = vecs.count { case (id, v) =>
      val flatBest = cents.map(cos(_, v)).max
      cos(cents(hier(id)), v) >= flatBest - 0.02
    }
    assert(ok >= 190, s"only $ok/200 vectors within 0.02 cosine of their flat-argmax cell")
    // exact-direction copies (power-of-2 scaling) share their source's
    // cell through BOTH levels — scale-invariant cosine at each level
    val scaled = corpusDf.select(col("vec_id"),
      transform(col("embedding"), x => x * lit(4.0f)).as("embedding"))
    val hierScaled = Similarity.assignedCells(scaled, "embedding", cents)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hierScaled === hier)
  }

  test("coarseLayer groups children under their nearest RETURNED centroid") {
    // the final Lloyd update moves the coarse centroids after the last
    // assignment; without a closing re-assignment pass a fine centroid
    // could be grouped under a coarse centroid it is no longer nearest
    // to. Pin the invariant: every child is at least as close to its
    // own group's returned centroid as to any other returned centroid.
    val rng = new scala.util.Random(11)
    val cents = Array.fill(500) {
      val v = Array.fill(8)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val (coarse, children) = Similarity.coarseLayer(cents, 20)
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    children.zipWithIndex.foreach { case (kids, g) =>
      kids.foreach { c =>
        val own = cos(coarse(g), cents(c))
        val best = coarse.map(cos(_, cents(c))).max
        assert(own >= best - 1e-12,
          s"fine centroid $c sits in group $g (cos $own) but a nearer " +
            s"returned centroid exists (cos $best)")
      }
    }
  }

  test("embeddingContamination flags exactly the brute-force pairs, zero shuffle") {
    val bench = corpus.where(col("vec_id") % 10 === 0)
    val got = Similarity.embeddingContamination(corpus, bench,
      "vec_id", "embedding", threshold = 0.8)
    // brute-force recomputation: every (train, bench) pair above t
    val expected = corpus.select(col("vec_id").as("train_id"), col("embedding").as("tv"))
      .crossJoin(bench.select(col("vec_id").as("bench_id"), col("embedding").as("bv")))
      .withColumn("cos", Similarity.cosineCol(col("tv"), col("bv")))
      .where(col("cos") >= 0.8)
      .select("train_id", "bench_id", "cos")
    assert(got.exceptAll(expected).count() === 0 && expected.exceptAll(got).count() === 0)
    // self-pairs guarantee at least |bench| matches
    assert(got.count() >= 10)
    // the train side must not shuffle: the executed plan has NO
    // shuffle exchange anywhere (broadcast exchanges are fine)
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning") && !plan.contains("Exchange rangepartitioning"),
      s"embeddingContamination must be shuffle-free:\n$plan")
  }

  test("sign buckets are deterministic and stable across invocations") {
    val b1 = Similarity.signBuckets(corpus, "embedding", 8, 4, 42L)
      .select("vec_id", "bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b2 = Similarity.signBuckets(corpus, "embedding", 8, 4, 42L)
      .select("vec_id", "bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(b1 === b2)
    assert(b1.values.forall(b => b >= 0 && b < 16))
  }

  // ───── product quantization

  test("PQ codebooks: deterministic, right shape, train-on-sample bound") {
    val cb1 = Similarity.trainPqCodebooks(corpus, "vec_id", "embedding", m = 4, ks = 8)
    val cb2 = Similarity.trainPqCodebooks(corpus, "vec_id", "embedding", m = 4, ks = 8)
    assert(cb1.length === 4)
    assert(cb1.forall(sub => sub.length === 8 && sub.forall(_.length === 2)))
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq === cb2.map(_.map(_.toSeq).toSeq).toSeq)
    // sampleMax smaller than the corpus still trains (on the sample)
    val cbS = Similarity.trainPqCodebooks(corpus, "vec_id", "embedding", m = 4, ks = 8,
      sampleMax = 32)
    assert(cbS.length === 4 && cbS.forall(_.length === 8))
  }

  test("PQ encode: m codes per row, each a valid codebook index") {
    val cb = Similarity.trainPqCodebooks(corpus, "vec_id", "embedding", m = 4, ks = 8)
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", cb).collect()
    assert(codes.length === 100)
    for (r <- codes) {
      val c = r.getSeq[Int](1)
      assert(c.length === 4)
      assert(c.forall(x => x >= 0 && x < 8), s"code out of range: $c")
    }
  }

  test("PQ encode: a power-of-two-scaled copy gets its source's exact code") {
    import spark.implicits._
    val cb = Similarity.trainPqCodebooks(corpus, "vec_id", "embedding", m = 4, ks = 8)
    val scaled = corpus.select(col("vec_id"),
      transform(col("embedding"), x => x * lit(8.0f)).as("embedding"))
    val a = Similarity.pqEncode(corpus, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = Similarity.pqEncode(scaled, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a === b, "normalization must erase exact power-of-two scaling")
  }

  test("PQ top-k: planted exact copies are recovered as the top ranks") {
    import spark.implicits._
    // plant 3 scaled copies of each query direction — exact top-3 by theorem
    val q = corpus.where(col("vec_id") < 3)
    val copies = (1 to 3).map(m => q.select((col("vec_id") + m * 1000L).as("vec_id"),
      transform(col("embedding"), x => x * lit((1 << m).toFloat)).as("embedding")))
      .reduce(_ union _)
    val planted = corpus.union(copies)
    val r = Similarity.pqTopK(planted, q, "vec_id", "embedding", k = 3, m = 4, ks = 8)
      .collect()
    assert(r.length === 9)
    for (row <- r) {
      val (qid, nid, cos) = (row.getLong(0), row.getLong(1), row.getDouble(3))
      assert(nid % 1000L === qid, s"rank ${row.getInt(2)} of q$qid is $nid, not a planted copy")
      assert(math.abs(cos - 1.0) < 1e-9)
    }
  }

  test("PQ top-k agrees with brute force on recall@5 >= 0.6 for random queries") {
    // PQ is lossy; on a random 100-vector corpus the two-stage search
    // with candK=32 should still capture most true neighbors
    val q = corpus.where(col("vec_id") >= 97)
    val exact = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.pqTopK(corpus, q, "vec_id", "embedding", k = 5, m = 4, ks = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall@5 = $recall")
  }

  test("PQ top-k: code scan is the only full-corpus side (plan shape)") {
    val q = corpus.where(col("vec_id") < 2)
    val cb = Similarity.trainPqCodebooks(corpus, "vec_id", "embedding", m = 4, ks = 8)
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", cb)
    val r = Similarity.pqTopKWith(cb, codes, corpus, q, "vec_id", "embedding", 3)
    r.collect()
    val plan = r.queryExecution.executedPlan.toString
    // the candidate/query sides ride broadcasts; the corpus code scan
    // must not be hash- or range-shuffled (the rank window partitions
    // scored rows by query_id — that exchange carries skinny
    // (query_id, neighbor_id, _adist) rows, never vectors)
    assert(plan.contains("BroadcastExchange"), s"expected broadcast joins:\n$plan")
  }

  test("PQ top-k: no shuffle carries an array column (vectors/codes ride scans and broadcasts)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    val q = corpus.where(col("vec_id") < 2)
    val r = Similarity.pqTopK(corpus, q, "vec_id", "embedding", k = 3, m = 4, ks = 8)
    r.collect()
    def walk(p: SparkPlan): Seq[ShuffleExchangeExec] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case st: QueryStageExec => walk(st.plan)
      case e: ShuffleExchangeExec => e +: e.children.flatMap(walk)
      case other => other.children.flatMap(walk)
    }
    val bad = walk(r.queryExecution.executedPlan)
      .filter(_.schema.fields.exists(_.dataType.isInstanceOf[ArrayType]))
      .map(_.schema.fieldNames.mkString(","))
    assert(bad.isEmpty, s"PQ search shuffled array columns: $bad")
  }

  test("PQ codebooks persist atomically with the residual flag") {
    val path = tmpDir("pq_codebooks") + "/cb"
    val cb = Similarity.trainPqCodebooks(corpus, "vec_id", "embedding", m = 4, ks = 8)
    Similarity.savePqCodebooks(spark, path, cb)
    val (r1, f1) = Similarity.loadPqCodebooks(spark, path)
    assert(!f1 && r1.map(_.map(_.toSeq).toSeq).toSeq === cb.map(_.map(_.toSeq).toSeq).toSeq)
    // overwrite with a residual-trained matrix — the swap replaces
    // atomically and the flag round-trips
    val cents = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding", nlist = 4)
    val cbR = Similarity.trainPqCodebooksResidual(corpus, "vec_id", "embedding",
      cents, m = 4, ks = 8)
    Similarity.savePqCodebooks(spark, path, cbR, residual = true)
    val (r2, f2) = Similarity.loadPqCodebooks(spark, path)
    assert(f2 && r2.map(_.map(_.toSeq).toSeq).toSeq === cbR.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("residual codebooks differ from raw and train deterministically") {
    val cents = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding", nlist = 4)
    val raw = Similarity.trainPqCodebooks(corpus, "vec_id", "embedding", m = 4, ks = 8)
    val res1 = Similarity.trainPqCodebooksResidual(corpus, "vec_id", "embedding",
      cents, m = 4, ks = 8)
    val res2 = Similarity.trainPqCodebooksResidual(corpus, "vec_id", "embedding",
      cents, m = 4, ks = 8)
    assert(res1.map(_.map(_.toSeq).toSeq).toSeq === res2.map(_.map(_.toSeq).toSeq).toSeq)
    assert(res1.map(_.map(_.toSeq).toSeq).toSeq !== raw.map(_.map(_.toSeq).toSeq).toSeq,
      "residual training must see a different (origin-centered) distribution")
  }

  test("PQ: zero-norm vectors encode deterministically and never rank") {
    import spark.implicits._
    val withZero = corpus.union(
      Seq((999L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding"))
    val q = withZero.where(col("vec_id") < 2)
    val r = Similarity.pqTopK(withZero, q, "vec_id", "embedding", k = 5, m = 4, ks = 8)
      .collect()
    assert(r.forall(_.getLong(1) != 999L), "zero vector must not outrank real neighbors")
  }
}
