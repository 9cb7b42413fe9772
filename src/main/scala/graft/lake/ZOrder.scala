package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Morton (Z-curve) keys for multi-dimensional write-side clustering.
  * The reference clusters on ONE column (O20, docs/source/lakeshack
  * .rst:252-263), so a query filtering a second dimension prunes
  * nothing; interleaving the bits of two normalized columns gives every
  * file a tight [min,max] box in BOTH dimensions, and the zone-map
  * metastore prunes on each independently — the standard lakehouse
  * multi-dim clustering technique (as in Delta/Iceberg `ZORDER BY`).
  *
  * Everything here is plain `Column` bit arithmetic — shifts, masks,
  * ors — so the key stays inside whole-stage codegen; no UDF, no custom
  * Expression needed.
  */
object ZOrder {

  /** Spread the low 16 bits of `c`, inserting a 0 between each bit
    * (the classic Morton shift-mask ladder). */
  private def spread16(c: Column): Column = {
    val m = c.bitwiseAND(lit(0xFFFFL))
    val a = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Linear [min,max] → [0, 65535] quantization. Linear value-space
    * scaling (not rank-space): heavy skew concentrates codes, which
    * loosens — never breaks — pruning; swap in quantile boundaries if a
    * production table needs rank normalization. A degenerate range
    * (min == max) maps everything to 0. */
  private def norm16(c: Column, mn: Double, mx: Double): Column =
    if (mx <= mn) lit(0L)
    else least(greatest(
      ((c.cast("double") - lit(mn)) / lit(mx - mn) * lit(65535.0)).cast("long"),
      lit(0L)), lit(65535L))

  /** 32-bit Morton key interleaving two numeric columns, each first
    * quantized to 16 bits against its supplied [min,max]. */
  def mortonKey(a: Column, aMin: Double, aMax: Double,
                b: Column, bMin: Double, bMax: Double): Column =
    spread16(norm16(a, aMin, aMax))
      .bitwiseOR(shiftleft(spread16(norm16(b, bMin, bMax)), 1))

  /** Linear [min,max] → [0, 2^bits-1] quantization (norm16 generalized
    * to a caller-chosen code width). */
  private def normBits(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val maxCode = (1L << bits) - 1
    if (mx <= mn) lit(0L)
    else least(greatest(
      ((c.cast("double") - lit(mn)) / lit(mx - mn) * lit(maxCode.toDouble)).cast("long"),
      lit(0L)), lit(maxCode))
  }

  /** Morton key over ANY number of dimensions (2-8): bit i of dimension
    * d's quantized code lands at position i·k + d, so every dimension
    * gets equal interleaving weight and a range-partition on the key
    * gives each output file a tight box in ALL k columns. Code width
    * shrinks as dimensions are added (min(16, 62/k) bits per dim — the
    * key must stay in a positive Long), which is also the right
    * modeling choice: each added dimension dilutes per-dimension
    * pruning selectivity, the standard Z-order trade-off.
    *
    * Built as per-bit extract/shift/or terms rather than a
    * stride-generalized shift-mask ladder: k·bits ≈ 48 tiny integer
    * ops stay inside one whole-stage-codegen projection, and Spark's
    * subexpression elimination evaluates each dimension's quantization
    * once. For k = 2 this is bit-identical to `mortonKey` (same bit
    * layout; pinned by ZOrderSpec). */
  def mortonKeyN(dims: Seq[(Column, Double, Double)]): Column = {
    val k = dims.size
    require(k >= 2 && k <= 8, s"mortonKeyN supports 2-8 dimensions, got $k")
    val bits = math.min(16, 62 / k)
    val terms = for {
      (code, d) <- dims.map { case (c, mn, mx) => normBits(c, mn, mx, bits) }.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(code, i).bitwiseAND(lit(1L)), i * k + d)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Rank (quantile) code: #boundaries ≤ v, over a sorted boundary
    * array baked into the plan. NULL compares land at code 0 (the
    * bottom bucket — sound, like any may-contain stat). O(|boundaries|)
    * codegen'd comparisons per row, so boundary counts stay ≤ 255. */
  private def rankCode(c: Column, boundaries: Array[Double]): Column =
    size(filter(lit(boundaries), b => b <= c.cast("double"))).cast("long")

  /** Morton key with RANK (quantile) normalization instead of linear
    * value scaling: dimension d's code = how many of its supplied
    * quantile boundaries the value exceeds, so codes are
    * equi-POPULATED regardless of the value distribution. Linear
    * scaling collapses a heavy-tailed column into a handful of codes —
    * one outlier stretches [min,max] until the dense region quantizes
    * to a single value, the key stops varying in that dimension, and
    * zone-map pruning on it dies. Rank codes keep every file's box
    * tight in occupied value space (the Delta/Iceberg production
    * answer to skewed ZORDER BY columns).
    *
    * `boundaries` per dim: sorted interior quantiles (≤ 255 of them —
    * file-granularity pruning needs code cardinality ~ file count, not
    * 16-bit resolution). Same bit layout as `mortonKeyN`. */
  def mortonKeyRanked(dims: Seq[(Column, Array[Double])]): Column = {
    val k = dims.size
    require(k >= 2 && k <= 8, s"mortonKeyRanked supports 2-8 dimensions, got $k")
    val bits = math.min(16, 62 / k)
    dims.foreach { case (_, b) =>
      require(b.length <= (1 << bits) - 1,
        s"${b.length} boundaries exceed the $bits-bit code space for $k dims")
      require(b.sameElements(b.sorted), "boundaries must be sorted ascending")
    }
    val terms = for {
      (code, d) <- dims.map { case (c, b) => rankCode(c, b) }.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(code, i).bitwiseAND(lit(1L)), i * k + d)
    terms.reduce(_.bitwiseOR(_))
  }
}
