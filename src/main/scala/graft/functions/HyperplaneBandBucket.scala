package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd banded-LSH sign bucket: the `planes`-bit bucket id of
  * a vector for one band, with the band's hyperplanes DERIVED ON THE
  * EXECUTOR from the splitmix avalanche of (seed, plane, dim-index)
  * instead of shipped as plan literals.
  *
  * Why: the literal form (an `array<float>` literal per plane, a
  * DotProduct node per plane) scales the PLAN as L·r·dim floats — at the
  * auto-knob caps (L=56 bands, r=14 planes) and dim 768 that is ~2.4 MB
  * of literals serialized into every task binary (`WARN DAGScheduler:
  * Broadcasting large task binary`), and it grows with dim. The
  * hyperplane component is a pure function of (seed, plane, d), so
  * nothing needs shipping: this expression regenerates each component
  * inline in the fused loop, making the plan O(1) in dim and the
  * arithmetic BIT-IDENTICAL to the literal form it replaces — the
  * component is computed in double, truncated through float (exactly
  * what `floatLits` did), then accumulated left-to-right in double like
  * [[DotProduct]].
  *
  * Bit p (0-based) of the result is set iff dot(h_{firstPlane+p}, v) >= 0.
  * A vector of the wrong dimension fails loudly (same contract as
  * DotProduct); regenerating ~planes·dim components per row costs a few
  * mul/xor/shift per component — cheaper than the memory traffic of
  * reading a literal array, and measured at parity at bench scale.
  */
case class HyperplaneBandBucket(child: Expression, seed: Long,
                                firstPlane: Int, planes: Int, dim: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if planes >= 1 && planes <= 62 && dim >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: planes=$planes must be in [1, 62] and dim=$dim >= 1")
    case dt =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float>, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_band_bucket"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"hyperplane_band_bucket: dimension mismatch (${v.numElements()} vs $dim)")
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val pbase = seed + (firstPlane + p).toLong * 0x9E3779B97F4A7C15L
      var dot = 0.0
      var d = 0
      while (d < dim) {
        var z = pbase + d.toLong * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        val h = (z.toDouble / Long.MaxValue.toDouble).toFloat
        dot += h.toDouble * v.getFloat(d).toDouble
        d += 1
      }
      if (dot >= 0.0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val z = ctx.freshName("z")
      val h = ctx.freshName("h")
      val dot = ctx.freshName("dot")
      val pbase = ctx.freshName("pbase")
      val bucket = ctx.freshName("bucket")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "hyperplane_band_bucket: dimension mismatch (" + $v.numElements() + " vs " + $dim + ")");
         |}
         |long $bucket = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  long $pbase = ${seed}L + (long) ($firstPlane + $p) * 0x9E3779B97F4A7C15L;
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    long $z = $pbase + (long) $d * 0xBF58476D1CE4E5B9L;
         |    $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |    $z = $z ^ ($z >>> 31);
         |    float $h = (float) ((double) $z / (double) Long.MAX_VALUE);
         |    $dot += (double) $h * (double) $v.getFloat($d);
         |  }
         |  if ($dot >= 0.0) $bucket |= 1L << $p;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
