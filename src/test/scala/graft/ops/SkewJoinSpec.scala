package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  /** 10k rows on one hot key + a uniform tail — the shape salting exists
    * for. */
  private lazy val skewedLeft = {
    import spark.implicits._
    val hot = (0 until 10000).map(i => ("hot", i.toLong))
    val tail = (0 until 100).map(i => (s"k$i", i.toLong))
    (hot ++ tail).toDF("k", "v").repartition(4)
  }

  private lazy val right = {
    import spark.implicits._
    (Seq(("hot", "H")) ++ (0 until 100).map(i => (s"k$i", s"R$i")))
      .toDF("k", "tag")
  }

  test("salted join equals the plain inner join") {
    val plain = skewedLeft.join(right, Seq("k"))
      .select("k", "v", "tag").collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sorted(Ordering.Tuple3(Ordering.String, Ordering.Long, Ordering.String))
    val salted = SkewJoin.saltedJoin(skewedLeft, right, Seq("k"), salts = 8)
      .select("k", "v", "tag").collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sorted(Ordering.Tuple3(Ordering.String, Ordering.Long, Ordering.String))
    assert(salted.length === plain.length)
    assert(salted.toSeq === plain.toSeq)
  }

  test("salting actually spreads the hot key across buckets") {
    // internal check through the public pieces: counting per salt via
    // twoPhaseAgg's phase-1 grouping must yield >1 group for the hot key
    val spread = SkewJoin.twoPhaseCount(skewedLeft.where(col("k") === "hot"),
      Seq("k"), salts = 8)
    // correctness of the count through the two-phase path
    assert(spread.first().getLong(1) === 10000L)
    // and the phase-1 split produced multiple partials (the count went
    // through (key, salt) groups — verified by running phase 1 alone)
    val phase1Groups = skewedLeft.where(col("k") === "hot")
      .withColumn("_salt", pmod(xxhash64(col("k"), col("v")), lit(8L)))
      .groupBy("k", "_salt").count().count()
    assert(phase1Groups > 1, "hot key must split across multiple salt buckets")
  }

  test("two-phase aggregation matches direct groupBy for sum/min/max") {
    val direct = skewedLeft.groupBy("k")
      .agg(sum("v").as("sv"), min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val twoPhase = SkewJoin.twoPhaseAgg(skewedLeft, Seq("k"), salts = 8,
      partial = Seq(sum("v").as("_s"), min("v").as("_mn"), max("v").as("_mx")),
      merge = Seq(sum("_s").as("sv"), min("_mn").as("mn"), max("_mx").as("mx")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(twoPhase === direct)
  }

  test("an input _salt column is refused, not clobbered") {
    import spark.implicits._
    val l = Seq((1L, "x")).toDF("k", "_salt")
    val r = Seq((1L, 2.0)).toDF("k", "v")
    intercept[IllegalArgumentException](SkewJoin.saltedJoin(l, r, Seq("k")))
    intercept[IllegalArgumentException](SkewJoin.twoPhaseCount(l, Seq("k")))
  }
}
