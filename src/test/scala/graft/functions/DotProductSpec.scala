package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {

  private lazy val vecs = {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    (0 until 200).map(i =>
      (i.toLong, Array.fill(32)(rng.nextFloat() * 2 - 1), Array.fill(32)(rng.nextFloat() * 2 - 1)))
      .toDF("id", "a", "b")
  }

  test("native dot is bit-identical to the higher-order-function form") {
    val both = vecs.select(
      Similarity.dotColNative(col("a"), col("b")).as("native"),
      Similarity.dotCol(col("a"), col("b")).as("hof")).collect()
    for (r <- both)
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "must match bit-for-bit")
  }

  test("sign(dot) equals sign(cosine) — the LSH bucket invariant") {
    val both = vecs.select(
      Similarity.dotColNative(col("a"), col("b")).as("dot"),
      Similarity.cosineCol(col("a"), col("b")).as("cos")).collect()
    for (r <- both)
      assert((r.getDouble(0) >= 0) === (r.getDouble(1) >= 0))
  }

  test("dimension mismatch fails loudly") {
    import spark.implicits._
    val bad = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(Similarity.dotColNative(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("registered for SQL via GraftExtensions") {
    import spark.implicits._
    Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
      .createOrReplaceTempView("dp_vecs")
    val r = spark.sql("SELECT dot_product(a, b) AS d FROM dp_vecs").first().getDouble(0)
    assert(math.abs(r - 32.0) < 1e-12)
  }
}
