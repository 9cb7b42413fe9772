package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native i<j pair expansion of one blocking bucket's sorted id array:
  * `array<T>` → `array<struct<doc_a T, doc_b T>>`, the exact row set of
  * the superseded nested-HOF expansion
  * (`explode(flatten(transform(ids, (a,i) => transform(slice(ids, i+2, …),
  * b => struct(a, b)))))` in `candidatePairsFromBuckets`).
  *
  * Why an Expression (SURVEY.md §7.3): array higher-order functions are
  * CodegenFallback — the expansion paid an interpreted lambda dispatch,
  * a slice allocation and a boxed struct per PAIR, and it was the
  * measured majority of the candidate stage at the 100× probe (the
  * pair-volume term the skew cap bounds but cannot shrink). This is one
  * compiled loop per bucket; per-GROUP dispatch (one eval per bucket
  * row) makes CodegenFallback itself noise. Element values are copied
  * positionally, so any id type works (long/int/string); field
  * nullability mirrors the input array's element nullability exactly.
  * Pinned pair-for-pair against the HOF form in DedupSpec. */
case class BucketPairExpand(child: Expression)
  extends UnaryExpression with CodegenFallback {

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  private def elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_a", elemType, nullable = elemNullable),
    StructField("doc_b", elemType, nullable = elemNullable))), containsNull = false)
  override def prettyName: String = "bucket_pair_expand"

  override protected def nullSafeEval(input: Any): Any = {
    val ids = input.asInstanceOf[ArrayData]
    val n = ids.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val et = elemType
    val vals = new Array[Any](n)
    var i = 0
    while (i < n) { vals(i) = ids.get(i, et); i += 1 }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val row = new GenericInternalRow(2)
        row.update(0, vals(i)); row.update(1, vals(j))
        out(k) = row; k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native filtered pair expansion for the inverted-index Jaccard core
  * (`jaccardFromIndex`): one shingle bucket's sorted
  * `array<struct<doc T, n_sh long>>` → the i<j pairs SURVIVING the
  * exact length-ratio bound, as
  * `array<struct<doc_a T, sh_a long, doc_b T, sh_b long>>`.
  *
  * Replaces the superseded HOF form (nested transform + an interpreted
  * `filter` predicate evaluating `least/greatest` per pair) with one
  * compiled loop per bucket, emitting exactly the same pairs: the
  * bound is `min(sh_a, sh_b) / max(sh_a, sh_b) >= threshold - 1e-9`
  * in doubles — the identical expression the Column form folded
  * (`lit(threshold - 1e-9)` is the same compile-time double), so not
  * one admitted/dropped pair can differ. Null n_sh never occurs
  * (window count / size() cast — both non-null); a null would make the
  * HOF predicate null → dropped, mirrored here. Pinned pair-for-pair
  * against the HOF form in DedupSpec. */
case class JaccardPairExpand(child: Expression, threshold: Double)
  extends UnaryExpression with CodegenFallback {

  private def docType: DataType = child.dataType match {
    case ArrayType(StructType(fs), _) => fs(0).dataType
    case _ => NullType
  }
  private def fieldNullable(i: Int): Boolean = child.dataType match {
    case ArrayType(StructType(fs), containsNull) => containsNull || fs(i).nullable
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(_, f2)), _) if f2.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<doc, n_sh long>>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_a", docType, nullable = fieldNullable(0)),
    StructField("sh_a", LongType, nullable = fieldNullable(1)),
    StructField("doc_b", docType, nullable = fieldNullable(0)),
    StructField("sh_b", LongType, nullable = fieldNullable(1)))), containsNull = false)
  override def prettyName: String = "jaccard_pair_expand"

  override protected def nullSafeEval(input: Any): Any = {
    val items = input.asInstanceOf[ArrayData]
    val n = items.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val dt = docType
    val docs = new Array[Any](n)
    val shs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val e = items.getStruct(i, 2)
      docs(i) = e.get(0, dt)
      shs(i) = e.getLong(1)
      i += 1
    }
    val bound = threshold - 1e-9
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      val sa = shs(i)
      var j = i + 1
      while (j < n) {
        val sb = shs(j)
        val lo = math.min(sa, sb).toDouble
        val hi = math.max(sa, sb).toDouble
        if (lo / hi >= bound) {
          val row = new GenericInternalRow(4)
          row.update(0, docs(i)); row.setLong(1, sa)
          row.update(2, docs(j)); row.setLong(3, sb)
          out += row
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native filtered pair expansion for simhash chunk buckets: one
  * bucket's sorted `array<struct<doc T, simhash long>>` → the i<j
  * pairs whose fingerprints agree within `maxHamming`, as
  * `array<struct<doc_a T, doc_b T, hamming int>>`.
  *
  * Replaces the superseded nested-HOF expansion + post-explode
  * `hamming <= maxHamming` filter: emitting survivors only means the
  * |bucket|²/2 candidate structs never materialize (in a dup-dense
  * chunk bucket almost all pairs fail the Hamming test). Arithmetic is
  * `bit_count(a ^ b)` exactly; the `<=` filter is the Column filter's.
  * Pinned pair-for-pair against the HOF form in DedupSpec. */
case class SimhashPairExpand(child: Expression, maxHamming: Int)
  extends UnaryExpression with CodegenFallback {

  private def docType: DataType = child.dataType match {
    case ArrayType(StructType(fs), _) => fs(0).dataType
    case _ => NullType
  }
  private def fieldNullable(i: Int): Boolean = child.dataType match {
    case ArrayType(StructType(fs), containsNull) => containsNull || fs(i).nullable
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(_, f2)), _) if f2.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<doc, simhash long>>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_a", docType, nullable = fieldNullable(0)),
    StructField("doc_b", docType, nullable = fieldNullable(0)),
    StructField("hamming", IntegerType, nullable = fieldNullable(1)))), containsNull = false)
  override def prettyName: String = "simhash_pair_expand"

  override protected def nullSafeEval(input: Any): Any = {
    val items = input.asInstanceOf[ArrayData]
    val n = items.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val dt = docType
    val docs = new Array[Any](n)
    val fps = new Array[Long](n)
    var i = 0
    while (i < n) {
      val e = items.getStruct(i, 2)
      docs(i) = e.get(0, dt)
      fps(i) = e.getLong(1)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      val fa = fps(i)
      var j = i + 1
      while (j < n) {
        val h = java.lang.Long.bitCount(fa ^ fps(j))
        if (h <= maxHamming) {
          val row = new GenericInternalRow(3)
          row.update(0, docs(i)); row.update(1, docs(j)); row.setInt(2, h)
          out += row
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
