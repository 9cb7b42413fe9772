package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the largest
  * right-time ≤ left-time within the same key (at-or-before semantics,
  * matching DuckDB/kdb ASOF JOIN). Absent from both the reference and
  * Spark's built-ins (SURVEY.md §2.2) — the canonical custom operator for
  * time-series enrichment.
  *
  * Implementation is the scalable MERGE form, not a range join: tag and
  * union both sides, sort within key by (time, side) so a right row at
  * equal time precedes the left rows it should match, and carry the last
  * non-null right payload forward with a running window. Cost is ONE
  * shuffle of |L|+|R| rows keyed by the join key plus a per-key sort —
  * compare a range join's candidate explosion (every right row earlier
  * than the left time) which is quadratic per key at 100 TB. Skewed keys
  * shard like any window: pre-split by time range if a single key's rows
  * exceed a partition.
  */
object AsofJoin {

  /** @param left       left table
    * @param right      right table
    * @param key        equi-join key column (same name both sides)
    * @param leftTime   left time column
    * @param rightTime  right time column
    * @param payload    right columns to carry (emitted with their names;
    *                   must not clash with left column names)
    * @param leftCols   left columns to keep (default: all)
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           payload: Seq[String], leftCols: Option[Seq[String]] = None): DataFrame = {
    val lCols = leftCols.getOrElse(left.columns.toSeq)
    require(!payload.exists(lCols.contains), s"payload ${payload} clashes with left columns")
    val reserved = Seq("_k", "_t", "_side", "_payload", "_m")
    require(!(lCols ++ payload).exists(reserved.contains),
      s"column names $reserved are reserved by asof; rename the clashing input column")

    // SQL join semantics: right rows with a null key or null time can
    // never match (equi-join never matches nulls; `left.ts >= NULL` is
    // never true) — without this filter, null keys group into one
    // joinable window partition and null times sort FIRST, handing their
    // payload to every left row of the key
    val cleanRight = right.where(col(key).isNotNull && col(rightTime).isNotNull)
    val taggedRight = cleanRight.select(
      col(key).as("_k") +: col(rightTime).as("_t") +: lit(0).as("_side") +:
        struct(payload.map(col): _*).as("_payload") +: lCols.map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      col(key).as("_k") +: col(leftTime).as("_t") +: lit(1).as("_side") +:
        lit(null).cast(taggedRight.schema("_payload").dataType).as("_payload") +: lCols.map(col): _*)

    // right rows sort before left rows at the same timestamp, so an
    // equal-time right row is visible to that left row (>= semantics);
    // the payload struct is the final sort key so duplicate
    // (key, rightTime) right rows resolve deterministically (greatest
    // payload wins) instead of depending on partition arrival order.
    // Struct ordering requires every field orderable (MapType is not):
    // an unorderable payload drops the tiebreak rather than failing
    // analysis — ties then resolve by arrival order, documented best
    // effort.
    val payloadOrderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(taggedRight.schema("_payload").dataType)
    val ordering =
      if (payloadOrderable) Seq(col("_t").asc, col("_side").asc, col("_payload").asc)
      else Seq(col("_t").asc, col("_side").asc)
    val w = Window.partitionBy("_k").orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("_m", last(col("_payload"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(lCols.map(col) ++ payload.map(p => col("_m").getField(p).as(p)): _*)
  }
}
