package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Pins the PLANS.md shuffle claims for the training-set assembly
  * surface: the stateless samplers are exchange-FREE narrow filters,
  * and the capstone composition shuffles on exactly two key families —
  * the domain (the budget draw's (domain, sub-range) window plus its
  * O(domains·subRanges)-row totals aggregate, both hashed domain-first)
  * and the shard placement — nothing else. A regression that sneaks a
  * join or a global sort into a sampler fails here as a plan diff, not
  * as a 100 TB incident. */
class AssemblyPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def exchanges(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.count() // materialize so AQE settles the final plan
    "(?m)Exchange (?:hash|range)partitioning\\(([a-zA-Z_#0-9]+)".r
      .findAllMatchIn(df.queryExecution.executedPlan.toString)
      .map(_.group(1).takeWhile(_ != '#')).toSeq
  }

  test("stateless samplers plan with no exchange at all") {
    for (q <- Seq("sample_mixture", "sample_weighted", "sample_split")) {
      // the final orderBy is a rangepartitioning exchange — the point is
      // that the SAMPLING stage adds no hashpartitioning shuffle
      val hashEx = exchanges(q).filterNot(_ == "doc_id")
      assert(hashEx.isEmpty, s"$q sampled with a shuffle: $hashEx")
    }
  }

  test("pipeline_assemble shuffles exactly on its two window keys") {
    // "_dom" is the budget draw's per-(domain, sub-range) totals
    // aggregate — an exchange of O(domains·subRanges) partially-
    // aggregated rows, not corpus data (the price of the skew-safe
    // two-phase draw; the full-data exchanges remain the two windows)
    val keys = exchanges("pipeline_assemble").toSet -- Set("doc_id")
    assert(keys === Set("source", "shard_id", "_dom"),
      s"expected the domain-budget, budget-offsets, and shard-placement exchanges, got $keys")
  }
}
