package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"lang${i % 4}")).toDF("id", "lang")
  }

  test("hashSample is deterministic and roughly proportional") {
    val df = corpus(10000)
    val a = Sampling.hashSample(df, col("id"), 0.1).select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df, col("id"), 0.1).select("id").collect().map(_.getLong(0)).toSet
    assert(a === b, "same key set on every run")
    assert(math.abs(a.size - 1000) < 150, s"~10% of 10000 expected, got ${a.size}")
  }

  test("hashSample fractions nest: sample(5%) is a subset of sample(10%)") {
    // threshold sampling's audit property: growing the fraction only ADDS
    // documents — membership of an already-sampled doc never flips
    val df = corpus(10000)
    val small = Sampling.hashSample(df, col("id"), 0.05).select("id").collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(df, col("id"), 0.10).select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
    assert(small.size < big.size)
  }

  test("property: membership is independent of physical layout") {
    // the determinism contract: a doc's fate depends only on its key,
    // never on partitioning or row order
    val df = corpus(2000)
    val flat = Sampling.hashSample(df.coalesce(1), col("id"), 0.2)
      .collect().map(_.getLong(0)).toSet
    val spread = Sampling.hashSample(df.repartition(17, col("lang")), col("id"), 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(flat === spread)
  }

  test("property: nesting holds across a ladder of random fractions") {
    val df = corpus(3000)
    val rnd = new scala.util.Random(7)
    val fracs = Seq.fill(6)(rnd.nextDouble()).sorted
    val sets = fracs.map(f =>
      Sampling.hashSample(df, col("id"), f).collect().map(_.getLong(0)).toSet)
    sets.sliding(2).foreach { case Seq(small, big) =>
      assert(small.subsetOf(big), "a larger fraction may only ADD members")
    }
  }

  test("hashSample edge fractions") {
    val df = corpus(100)
    assert(Sampling.hashSample(df, col("id"), 0.0).count() === 0)
    assert(Sampling.hashSample(df, col("id"), 1.0).count() === 100)
    intercept[IllegalArgumentException](Sampling.hashSample(df, col("id"), 1.5))
  }

  test("stratifiedSample draws exactly k per stratum, deterministically") {
    val df = corpus(1000) // 4 langs x 250
    val s = Sampling.stratifiedSample(df, Seq("lang"),
      Seq(pmod(col("id") * Sampling.KnuthA, lit(4294967296L)), col("id")), 25)
    val byLang = s.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.values.toSet === Set(25L))
    val again = Sampling.stratifiedSample(df, Seq("lang"),
      Seq(pmod(col("id") * Sampling.KnuthA, lit(4294967296L)), col("id")), 25)
    assert(s.select("id").collect().map(_.getLong(0)).toSet ===
      again.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("stratifiedSample keeps whole strata smaller than k") {
    import spark.implicits._
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "lang")
    val s = Sampling.stratifiedSample(tiny, Seq("lang"), Seq(col("id")), 5)
    assert(s.count() === 3)
  }
}
