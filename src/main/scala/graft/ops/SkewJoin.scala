package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hash-partitioned joins and aggregations.
  *
  * At 100 TB a single hot key (a boilerplate document hash, a null-ish
  * default id, one power user) can put an entire reducer's worth of rows
  * on one task. Spark's AQE skew-join handles the sort-merge-join case
  * at runtime by splitting oversized partitions; these helpers cover the
  * cases AQE cannot rewrite: broadcast-ineligible joins where one side
  * must replicate, and skewed aggregations (AQE never splits a hash
  * aggregate's exchange).
  *
  * The trade is explicit: `salts`× replication of the (smaller) right
  * side buys a `salts`-way spread of every hot left key. Pick salts ≈
  * (hot-key rows / target partition rows); replication cost is
  * |right| × salts rows through the exchange.
  */
object SkewJoin {

  /** Salt expression over [0, salts): xxhash64 of the full row content —
    * NOT the key alone (that would send every hot-key row to the same
    * salt, re-creating the skew) and NOT `spark_partition_id()`/
    * `monotonically_increasing_id()` (nondeterministic across task
    * retries and speculative execution: a re-run map task could emit a
    * row under a different salt than the copy some reducers already
    * fetched, double-counting it in one (key, salt) partition and losing
    * it from another). Identical rows share a salt — harmless for
    * correctness, and real hot keys differ in their payload columns. */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts.toLong)).cast("int")

  /** Inner equi-join with a salted left side and a `salts`-times
    * replicated right side: every (key, salt) bucket holds 1/salts of
    * the hot key's left rows and one full copy of its right rows, so no
    * single task receives the whole hot key.
    *
    * Semantically identical to `left.join(right, keys, "inner")` for any
    * salt assignment (each left row still meets each matching right row
    * exactly once — in its own salt bucket).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salts: Int = 8): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    TextAnalysis.requireFree(left, "_salt")
    TextAnalysis.requireFree(right, "_salt")
    val saltedLeft = left.withColumn("_salt", rowSalt(left, salts))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, keys :+ "_salt").drop("_salt")
  }

  /** Two-phase skewed aggregation for algebraic aggregates (sum, count,
    * min, max): phase 1 aggregates by (key, salt) — the hot key's rows
    * split across `salts` partial groups — phase 2 merges the partials
    * by key. The partial-merge pairs must be supplied because only the
    * caller knows how each aggregate recombines (count→sum, sum→sum,
    * min→min, max→max).
    *
    * Note Spark's own map-side partial aggregation already covers MOST
    * skewed groupBys (partials are per-task before the exchange); this
    * helper is for the residual case where per-task partials stay large
    * (huge per-key state, e.g. collect_set, or very many tasks per key).
    */
  def twoPhaseAgg(df: DataFrame, keys: Seq[String], salts: Int,
                  partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(partial.nonEmpty && partial.size == merge.size,
      "one merge expression per partial aggregate")
    TextAnalysis.requireFree(df, "_salt")
    df.withColumn("_salt", rowSalt(df, salts))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Per-key row counts through the two-phase shape. */
  def twoPhaseCount(df: DataFrame, keys: Seq[String], salts: Int = 8): DataFrame =
    twoPhaseAgg(df, keys, salts,
      partial = Seq(count(lit(1)).as("_n")),
      merge = Seq(sum("_n").as("n")))
}
