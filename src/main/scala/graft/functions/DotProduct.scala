package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two `array<float>` columns, double
  * accumulation — the normalization-free sibling of [[CosineSimilarity]].
  *
  * Born for the LSH sign tests: a hyperplane side decision needs only
  * `sign(h·v)`, and `sign(cos(h,v)) == sign(h·v)` (norms are positive) —
  * but the cosine form recomputes `|v|` once PER PLANE, so a banded
  * bucketer doing bands×r sign tests per row pays bands×r redundant
  * norm loops. This expression is the same fused primitive loop with
  * the two norm accumulators deleted: ~half the FLOPs per sign test.
  * (The banded bucketer has since fused the loop AND the hyperplane
  * generation into [[HyperplaneBandBucket]] — this remains the
  * general-purpose kernel for explicit vector×vector dots.)
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  /** Same loud dimension-mismatch contract as CosineSimilarity. */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"dot_product: dimension mismatch (${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product: dimension mismatch (" + $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
