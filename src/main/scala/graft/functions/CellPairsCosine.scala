package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All within-cell near-dup pairs of one blocking bucket in ONE fused
  * pass: given the bucket's sorted `array<struct<doc long, v
  * array<float>>>` items, returns `array<struct<id_a long, id_b long,
  * cos double>>` for every i<j pair whose cosine clears `threshold`.
  *
  * Why an Expression (SURVEY.md §7.3): the superseded shape
  * (`candidatePairsFromBuckets` → distinct → join the vector table back
  * on id_a AND id_b → cosine → filter) moved every candidate pair
  * through a distinct exchange and two sort-merge joins that each
  * carried the vector payload PER PAIR — at the 100× probe that is
  * ~20M pair rows × two ~300-byte arrays where the cell layout had
  * already co-located everything. This expression scores pairs where
  * the vectors already sit (guide §8: decide on co-located data, never
  * re-attach by join) and emits ONLY the survivors, so the quadratic
  * candidate volume never materializes as rows at all.
  *
  * Arithmetic is [[CosineSimilarity]]'s exactly (float→double
  * promotion, left-to-right accumulation, zero-norm → 0.0, dimension
  * mismatch throws), with per-item norms hoisted (computed once per
  * item, not per pair — the same double values by determinism, so
  * every emitted cosine is bit-identical to the join form's;
  * spec-pinned in DedupSpec). Pair orientation follows the superseded
  * expansion: items are sorted ascending, pair (i, j>i) emits
  * (doc_i, doc_j) — doc_a < doc_b for unique ids. A null vector makes
  * its pairs' cosines null, which the join form's `cos >= t` filter
  * dropped — here they are simply skipped, identical output. The
  * threshold filter uses the same `>=` (NaN fails, as it fails the
  * Column filter).
  *
  * Per-GROUP evaluation (one call per bucket, not per corpus row), so
  * CodegenFallback costs one interpreted dispatch per bucket — noise —
  * while the heavy i<j loop runs as compiled Scala inside eval.
  */
case class CellPairsCosine(child: Expression, threshold: Double)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(f1, f2)), _)
      if f1.dataType == LongType && f2.dataType.isInstanceOf[ArrayType] &&
        f2.dataType.asInstanceOf[ArrayType].elementType == FloatType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<doc long, v array<float>>>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "cell_pairs_cosine"

  override protected def nullSafeEval(input: Any): Any = {
    val items = input.asInstanceOf[ArrayData]
    val n = items.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    // unpack once: ids, vectors (as float arrays), and hoisted norms —
    // the norm fold is CosineSimilarity's left-to-right sum of squares,
    // so hoisting reuses identical doubles
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Float]](n)
    val normsSq = new Array[Double](n)
    var i = 0
    while (i < n) {
      val e = items.getStruct(i, 2)
      ids(i) = e.getLong(0)
      if (!e.isNullAt(1)) {
        val v = e.getArray(1).toFloatArray()
        vecs(i) = v
        var na = 0.0
        var t = 0
        while (t < v.length) { val x = v(t).toDouble; na += x * x; t += 1 }
        normsSq(i) = na
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      val va = vecs(i)
      if (va != null) {
        val na = normsSq(i)
        var j = i + 1
        while (j < n) {
          val vb = vecs(j)
          if (vb != null) {
            if (va.length != vb.length)
              throw new IllegalArgumentException(
                s"cosine_similarity: dimension mismatch (${va.length} vs ${vb.length})")
            var dot = 0.0
            var t = 0
            while (t < va.length) { dot += va(t).toDouble * vb(t).toDouble; t += 1 }
            val nb = normsSq(j)
            val cos = if (na == 0.0 || nb == 0.0) 0.0
                      else dot / (math.sqrt(na) * math.sqrt(nb))
            if (cos >= threshold) {
              val row = new GenericInternalRow(3)
              row.setLong(0, ids(i)); row.setLong(1, ids(j)); row.setDouble(2, cos)
              out += row
            }
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
