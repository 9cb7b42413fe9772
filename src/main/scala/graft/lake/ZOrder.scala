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
}
