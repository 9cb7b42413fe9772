package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model-based property test for incremental SEMANTIC dedup — the
  * embedding-space twin of IncrementalDedupPropertySpec: a seeded
  * random corpus with planted perturbed near-dups is ingested batch by
  * batch through [[VectorIndex.ingestDedup]] with full cell coverage
  * (nprobe = nlist, so IVF recall is exact and the greedy semantics
  * are deterministic), and the accepted set must satisfy the two
  * defining invariants of greedy online dedup against the EXACT cosine
  * pair graph:
  *
  *   1. INDEPENDENCE — no kept vector matches anything accepted before
  *      it (the initial corpus, earlier batches' kept vectors, or
  *      smaller-id vectors kept in its own batch);
  *   2. DOMINATION — every dropped vector matches at least one vector
  *      accepted at the moment of its verdict.
  *
  * Threshold sits at 0.9 with planted pairs near cos ≈ 0.99 and random
  * pairs far below — no boundary flakiness; the seed is fixed. */
class IngestDedupPropertySpec extends SparkSpec {

  import spark.implicits._

  test("sequential semantic ingest keeps a maximal independent set") {
    val rng = new scala.util.Random(20260814L)
    val dim = 8
    def randVec(): Array[Float] = {
      val v = Array.fill(dim)(rng.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      v.map(_ / n)
    }
    // 60 vectors; after the first 10, half are small perturbations of
    // an earlier vector (cos ≈ 0.99+), the rest fresh random directions
    // (random unit cos in R^8 concentrates well below 0.9)
    val vecs = scala.collection.mutable.ArrayBuffer[Array[Float]]()
    for (i <- 0 until 60) {
      if (i >= 10 && rng.nextBoolean()) {
        val base = vecs(rng.nextInt(vecs.length))
        vecs += base.map(x => x + 0.02f * rng.nextGaussian().toFloat)
      } else vecs += randVec()
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < dim) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val threshold = 0.9
    def partners(i: Int): Set[Long] =
      (0 until 60).filter(j => j != i && cos(vecs(i), vecs(j)) >= threshold)
        .map(_.toLong).toSet

    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "embedding")
    val idx = tmpDir("ingest_dedup_prop")
    VectorIndex.build(df.where(col("vec_id") < 30), "vec_id", "embedding",
      idx, nlist = 4)

    var acceptedBefore = (0L until 30L).toSet
    val allKept = scala.collection.mutable.Set[Long]()
    val allDropped = scala.collection.mutable.Map[Long, Set[Long]]()
    for (b <- 0 until 3) {
      val ids = (30 + b * 10) until (30 + (b + 1) * 10)
      val batch = df.where(col("vec_id") >= ids.head && col("vec_id") <= ids.last)
      val verdicts = VectorIndex.ingestDedup(batch, "vec_id", "embedding", idx,
          threshold = threshold, nprobe = 4, appendKept = true)
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      val keptNow = verdicts.filter(_._2).keySet
      for (d <- ids.map(_.toLong)) {
        val acceptedAtVerdict = acceptedBefore ++ keptNow.filter(_ < d)
        if (verdicts(d))
          assert(partners(d.toInt).intersect(acceptedAtVerdict).isEmpty,
            s"INDEPENDENCE violated: kept $d matches " +
              partners(d.toInt).intersect(acceptedAtVerdict))
        else allDropped(d) = acceptedAtVerdict
      }
      allKept ++= keptNow
      acceptedBefore ++= keptNow
    }
    for ((d, acceptedAtVerdict) <- allDropped)
      assert(partners(d.toInt).intersect(acceptedAtVerdict).nonEmpty,
        s"DOMINATION violated: dropped $d matches none of the accepted set")
    assert(allKept.nonEmpty && allDropped.nonEmpty,
      s"fixture must exercise both verdicts (kept=${allKept.size}, dropped=${allDropped.size})")
  }
}
