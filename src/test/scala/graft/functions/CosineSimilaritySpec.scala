package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {

  private lazy val vecs = {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    (0 until 200).map(i =>
      (i.toLong, Array.fill(32)(rng.nextFloat() * 2 - 1), Array.fill(32)(rng.nextFloat() * 2 - 1)))
      .toDF("id", "a", "b")
  }

  test("native expression is bit-identical to the higher-order-function form") {
    val hof = Similarity.dotCol(col("a"), col("b")) /
      (Similarity.normCol(col("a")) * Similarity.normCol(col("b")))
    val both = vecs.select(
      Similarity.cosineCol(col("a"), col("b")).as("native"), hof.as("hof")).collect()
    for (r <- both)
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "must match bit-for-bit")
  }

  test("interpreted eval path (nullSafeEval) agrees with codegen") {
    // expression on constant-ish input exercises eval via the optimizer
    val r = vecs.limit(1).select(Similarity.cosineCol(col("a"), col("a"))).first().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    // direct interpreted eval
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0f, 2.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(2.0f, 4.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(math.abs(e.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("zero-norm vectors score 0.0 (never NaN) on both eval paths") {
    import spark.implicits._
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f)),
      (Array(0.0f, 0.0f), Array(0.0f, 0.0f))).toDF("a", "b")
    // codegen path
    val r = df.select(Similarity.cosineCol(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(r.toSeq === Seq(0.0, 0.0), "zero-norm must score 0.0, not NaN (NaN sorts above all doubles)")
    // interpreted path
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(0.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(3.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null).asInstanceOf[Double] === 0.0)
  }

  test("dimension mismatch fails loudly instead of truncating") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(Similarity.cosineCol(col("a"), col("b"))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(t => Option(t.getMessage).exists(_.contains("dimension mismatch"))))
  }

  test("null inputs propagate null") {
    val withNull = vecs.select(col("a"), lit(null).cast("array<float>").as("nb"))
    assert(withNull.select(Similarity.cosineCol(col("a"), col("nb"))).first().isNullAt(0))
  }

  test("registered for SQL via GraftExtensions") {
    vecs.createOrReplaceTempView("cos_vecs")
    val r = spark.sql(
      "SELECT id, cosine_similarity(a, b) AS c FROM cos_vecs ORDER BY id LIMIT 5").collect()
    val expected = vecs.select(col("id"), Similarity.cosineCol(col("a"), col("b")))
      .orderBy("id").limit(5).collect()
    assert(r.map(_.getDouble(1)).toSeq === expected.map(_.getDouble(1)).toSeq)
  }

  test("participates in whole-stage codegen (no interpreted lambdas in plan)") {
    // a local relation would be constant-folded away; go through parquet
    val d = tmpDir("cos_codegen")
    vecs.write.mode("overwrite").parquet(d)
    val plan = spark.read.parquet(d)
      .select(Similarity.cosineCol(col("a"), col("b")).as("c"))
      .queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen stage in the compact plan string
    assert(plan.contains("*(1) Project [cosine_similarity"),
      s"expected codegen'd projection in:\n$plan")
    assert(!plan.contains("lambdafunction"), "native expression must not fall back to HOF lambdas")
  }
}
