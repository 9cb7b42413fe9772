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

  test("mixtureSample applies per-domain fractions under one hash") {
    val df = corpus(8000) // 4 langs x 2000
    val m = Sampling.mixtureSample(df, col("id"), col("lang"),
      Map("lang0" -> 1.0, "lang1" -> 0.5, "lang2" -> 0.0), defaultFraction = 0.1)
    val byLang = m.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("lang0") === 2000L, "fraction 1.0 keeps the whole domain")
    assert(!byLang.contains("lang2"), "fraction 0.0 drops the whole domain")
    assert(math.abs(byLang("lang1") - 1000L) < 120, s"~50% expected, got ${byLang.get("lang1")}")
    assert(math.abs(byLang("lang3") - 200L) < 60,
      s"unlisted domain at the 10% default, got ${byLang.get("lang3")}")
  }

  test("mixtureSample agrees with hashSample domain-by-domain") {
    // one hash everywhere: the mixture restricted to a domain IS the
    // plain Bernoulli sample of that domain at the domain's fraction
    val df = corpus(4000)
    val mixed = Sampling.mixtureSample(df, col("id"), col("lang"), Map("lang1" -> 0.3))
      .collect().map(_.getLong(0)).toSet
    val direct = Sampling.hashSample(df.where(col("lang") === "lang1"), col("id"), 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(mixed === direct)
  }

  test("mixtureSample is monotone in the weights") {
    val df = corpus(4000)
    val low = Sampling.mixtureSample(df, col("id"), col("lang"),
      Map("lang0" -> 0.2, "lang1" -> 0.1), defaultFraction = 0.05)
      .collect().map(_.getLong(0)).toSet
    val high = Sampling.mixtureSample(df, col("id"), col("lang"),
      Map("lang0" -> 0.4, "lang1" -> 0.3), defaultFraction = 0.05)
      .collect().map(_.getLong(0)).toSet
    assert(low.subsetOf(high), "raising weights may only ADD documents")
    intercept[IllegalArgumentException](
      Sampling.mixtureSample(df, col("id"), col("lang"), Map("lang0" -> 1.5)))
  }

  test("weightedSample: per-row probabilities, natural edge semantics") {
    import spark.implicits._
    val df = (0L until 8000L).map(i =>
      (i, if (i % 4 == 0) 0.0 else if (i % 4 == 1) 0.5 else if (i % 4 == 2) 1.0 else 1.7))
      .toDF("id", "w")
    val kept = Sampling.weightedSample(df, col("id"), col("w"))
      .collect().map(_.getLong(0)).toSet
    assert(!kept.exists(_ % 4 == 0), "w = 0 never keeps")
    assert((0L until 8000L).filter(i => i % 4 == 2 || i % 4 == 3).forall(kept),
      "w >= 1 always keeps")
    val half = kept.count(_ % 4 == 1)
    assert(math.abs(half - 1000) < 120, s"~50% of the w=0.5 stratum, got $half")
    // constant weight w agrees with hashSample(f = w): one hash line
    val viaHash = Sampling.hashSample(df.where(col("id") % 4 === 1), col("id"), 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept.filter(_ % 4 == 1) === viaHash)
  }

  test("upsample: floor copies plus deterministic fractional extra") {
    import spark.implicits._
    val df = (0L until 6000L).map(i => (i, 2.5)).toDF("id", "w")
    val out = Sampling.upsample(df, col("id"), col("w")).collect()
      .map(r => r.getLong(0) -> r.getLong(2))
    val byId = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byId.size === 6000, "every row appears (floor(2.5) >= 1)")
    assert(byId.values.forall(c => c == (0 until c.size) && (c.size == 2 || c.size == 3)),
      "copies are dense 0-based, 2 or 3 of them")
    val mean = out.length.toDouble / 6000
    assert(math.abs(mean - 2.5) < 0.05, s"expected ~2.5 copies/row, got $mean")
    // w < 1 downsamples and agrees with weightedSample membership
    val sub = (0L until 4000L).map(i => (i, 0.3)).toDF("id", "w")
    val up = Sampling.upsample(sub, col("id"), col("w"))
      .collect().map(_.getLong(0)).toSet
    val ws = Sampling.weightedSample(sub, col("id"), col("w"))
      .collect().map(_.getLong(0)).toSet
    assert(up === ws)
    // and determinism: same inputs, same expansion
    val again = Sampling.upsample(df, col("id"), col("w")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(again === byId)
  }

  test("splitAssign partitions the corpus; train agrees with hashSample") {
    val df = corpus(10000)
    val out = Sampling.splitAssign(df, col("id"),
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val byId = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId.size === 10000, "every key labeled exactly once")
    val counts = byId.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 9000) < 200, s"~90% train, got ${counts.get("train")}")
    assert(counts.keySet === Set("train", "val", "test"))
    // same hash line: train@0.9 IS hashSample@0.9
    val hs = Sampling.hashSample(df, col("id"), 0.9).collect().map(_.getLong(0)).toSet
    assert(byId.filter(_._2 == "train").keySet === hs)
    intercept[IllegalArgumentException](
      Sampling.splitAssign(df, col("id"), Seq("a" -> 0.5, "b" -> 0.4)))
  }

  test("splitAssign: growing a split shrinks only its right neighbors") {
    val df = corpus(5000)
    def label(tr: Double, va: Double) = Sampling.splitAssign(df, col("id"),
      Seq("train" -> tr, "val" -> va, "test" -> (1.0 - tr - va)))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val a = label(0.8, 0.1); val b = label(0.9, 0.05)
    // nothing ever moves INTO an earlier split's complement: train only grows
    assert(a.filter(_._2 == "train").keySet.subsetOf(b.filter(_._2 == "train").keySet))
  }

  private def tokenCorpus(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"lang${i % 4}", 10L + i % 90)).toDF("id", "lang", "toks")
  }

  test("temperatureMixture: alpha=1 is a uniform downsample, alpha=0 equalizes domains") {
    import spark.implicits._
    // skewed domains: 600 / 300 / 100
    val df = ((0 until 600).map(i => (i.toLong, "big")) ++
      (600 until 900).map(i => (i.toLong, "mid")) ++
      (900 until 1000).map(i => (i.toLong, "small"))).toDF("id", "source")
    val at1 = Sampling.temperatureMixture(df, col("id"), "source", 1.0, 500L)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // targets = floor(500 * n_d / 1000)
    assert(at1 === Map("big" -> 300L, "mid" -> 150L, "small" -> 50L))
    val at0 = Sampling.temperatureMixture(df, col("id"), "source", 0.0, 240L)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // equal targets: floor(240/3) = 80 each
    assert(at0 === Map("big" -> 80L, "mid" -> 80L, "small" -> 80L))
  }

  test("temperatureMixture: alpha=0.5 upweights small domains; targets capped by size") {
    import spark.implicits._
    val df = ((0 until 900).map(i => (i.toLong, "big")) ++
      (900 until 1000).map(i => (i.toLong, "small"))).toDF("id", "source")
    val m = Sampling.temperatureMixture(df, col("id"), "source", 0.5, 400L)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sqrt weights 30 / 10 -> targets floor(300)/floor(100); small's
    // SHARE (25%) exceeds its corpus share (10%)
    assert(m === Map("big" -> 300L, "small" -> 100L))
    // a target above the domain size keeps the whole domain, no more
    val all = Sampling.temperatureMixture(df, col("id"), "source", 0.0, 4000L)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all === Map("big" -> 900L, "small" -> 100L))
  }

  test("temperatureMixture: deterministic, and growing the budget only adds rows") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, s"src${i % 3}")).toDF("id", "source")
    val a = Sampling.temperatureMixture(df, col("id"), "source", 0.5, 300L)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureMixture(df, col("id"), "source", 0.5, 300L)
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    val bigger = Sampling.temperatureMixture(df, col("id"), "source", 0.5, 600L)
      .collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(bigger), "hash-prefix membership must nest in the budget")
  }

  test("tokenBudgetSample never exceeds a domain's budget") {
    val df = tokenCorpus(2000)
    val out = Sampling.tokenBudgetSample(df, col("id"), col("toks"), "lang",
      Map("lang0" -> 5000L, "lang1" -> 1000L), defaultBudget = 100L)
    val spent = out.groupBy("lang").agg(sum("toks").as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spent("lang0") <= 5000L && spent("lang0") > 4000L,
      s"budget is a ceiling approached from below, spent ${spent.get("lang0")}")
    assert(spent("lang1") <= 1000L)
    assert(spent.getOrElse("lang2", 0L) <= 100L)
  }

  test("tokenBudgetSample membership is the prefix of the hash order") {
    // drop the budget: the smaller draw must be a prefix (subset) of the
    // larger one — the same audit property as nested fractions
    val df = tokenCorpus(2000)
    def ids(b: Long) = Sampling.tokenBudgetSample(df, col("id"), col("toks"), "lang",
      Map.empty, defaultBudget = b).collect().map(_.getLong(0)).toSet
    val small = ids(2000L); val big = ids(8000L)
    assert(small.subsetOf(big))
    // and layout independence, as for every sampler here
    val spread = Sampling.tokenBudgetSample(df.repartition(13, col("toks")),
      col("id"), col("toks"), "lang", Map.empty, defaultBudget = 8000L)
      .collect().map(_.getLong(0)).toSet
    assert(spread === big)
    intercept[IllegalArgumentException](
      Sampling.tokenBudgetSample(df, col("id"), col("toks"), "lang", Map("a" -> -1L)))
  }

  test("tokenBudgetSample spreads a dominant domain across sub-range tasks") {
    import spark.implicits._
    // one domain owns the whole corpus — the single-window form would
    // serialize it through one task
    val df = (0 until 5000).map(i => (i.toLong, "hot", 10L)).toDF("id", "lang", "toks")
    val out = Sampling.tokenBudgetSample(df, col("id"), col("toks"), "lang",
      Map("hot" -> 20000L), subRanges = 8)
    out.count() // materialize so AQE settles the final plan
    val plan = out.queryExecution.executedPlan.toString
    // the cumulative window is keyed (domain, sub-range), so the hot
    // domain's sort+sum runs as 8 independent groups, not one
    assert("hashpartitioning\\(lang#\\d+, _r#\\d+".r.findFirstIn(plan).isDefined,
      s"expected a (domain, _r) window exchange, plan was:\n$plan")
    // membership is bit-identical to the degenerate one-range draw
    // (ranges tile the same hash line in order)
    val one = Sampling.tokenBudgetSample(df, col("id"), col("toks"), "lang",
      Map("hot" -> 20000L), subRanges = 1)
      .collect().map(_.getLong(0)).toSet
    assert(out.collect().map(_.getLong(0)).toSet === one)
  }

  test("tokenBudgetSample keeps null-domain rows under the default budget") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String], 10L), (2L, Some("a"), 10L))
      .toDF("id", "lang", "toks")
    val out = Sampling.tokenBudgetSample(df, col("id"), col("toks"), "lang",
      Map("a" -> 100L), defaultBudget = 100L, subRanges = 4)
    // a plain equi-join on the domain would drop the null-domain row
    assert(out.count() === 2)
  }
}
