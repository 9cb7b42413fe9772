package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines. The
  * reference has no sampling operators (SURVEY.md §2.2) — these are
  * north_star extensions.
  *
  * Both samplers are deterministic on purpose: a training-data pipeline
  * must be able to re-derive exactly the same sample after a re-run,
  * audit which documents were in a training set, and hold membership
  * stable as the corpus grows (a doc's fate depends only on its own
  * key, never on partitioning, row order, or an RNG seed lost with the
  * job). `df.sample()` guarantees none of that.
  */
object Sampling {

  /** Knuth's multiplicative-hash constant (⌊2^32/φ⌋, golden-ratio
    * scrambling): consecutive keys land far apart in [0, 2^32). */
  val KnuthA = 2654435761L
  private val Mod = 4294967296L // 2^32

  /** Deterministic Bernoulli sampling: keep a row iff the multiplicative
    * hash of its numeric key falls under `fraction` of the hash space.
    * A narrow filter — no shuffle, no barrier to pushdown of OTHER
    * predicates, and at 100 TB it composes with partition pruning
    * instead of fighting it.
    *
    * The hash is `(key·A) mod 2^32` computed overflow-free for ANY Long
    * key: reduce the key mod 2^32 (only the low 32 bits affect the
    * result), split it into 16-bit halves with bit ops, and fold — every
    * intermediate stays < 2^49, so the arithmetic never overflows Long
    * (a naive `key * A` overflows past key ≈ 3.47e9: silently
    * nondeterministic vs the ANSI oracle twin, and a hard error under
    * ANSI mode). For keys in [0, 2^32) this is bit-identical to the
    * plain `(key * 2654435761) % 4294967296` oracle SQL.
    */
  def hashSample(df: DataFrame, keyCol: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    val k = pmod(keyCol, lit(Mod)) // [0, 2^32), negatives folded
    val hi = shiftright(k, 16) * lit(KnuthA)          // < 2^48
    val lo = k.bitwiseAND(lit(0xFFFFL)) * lit(KnuthA) // < 2^48
    val hash = pmod(pmod(hi, lit(Mod)) * lit(65536L) + lo, lit(Mod))
    df.where(hash < lit((fraction * Mod).toLong))
  }

  /** Fixed-size-per-stratum sampling: the first `k` rows of each stratum
    * in a caller-chosen deterministic order (pass a hash-of-key ordering
    * for a pseudo-random draw, or a quality score for top-k selection).
    * One shuffle keyed by the strata — row_number needs no global sort.
    * The `_rn` working column must be free (see TextAnalysis.requireFree). */
  def stratifiedSample(df: DataFrame, strata: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    TextAnalysis.requireFree(df, "_rn")
    val w = Window.partitionBy(strata.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .drop("_rn")
  }
}
