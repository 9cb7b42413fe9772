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
    df.where(knuthHash(keyCol) < lit((fraction * Mod).toLong))
  }

  /** The overflow-free multiplicative hash as a reusable column: the
    * shared "deterministic shuffle" key every sampler here draws from
    * (see `hashSample` for the overflow analysis). Bit-identical to
    * `(key * 2654435761) % 4294967296` for keys in [0, 2^32). */
  def knuthHash(keyCol: Column): Column = {
    val k = pmod(keyCol, lit(Mod)) // [0, 2^32), negatives folded
    val hi = shiftright(k, 16) * lit(KnuthA)          // < 2^48
    val lo = k.bitwiseAND(lit(0xFFFFL)) * lit(KnuthA) // < 2^48
    pmod(pmod(hi, lit(Mod)) * lit(65536L) + lo, lit(Mod))
  }

  /** Domain-mixture sampling: per-domain Bernoulli fractions under ONE
    * deterministic hash — the "resample the corpus to a target domain
    * mix" primitive (upweight curated sources, downsample crawl data).
    * Same membership guarantees as `hashSample`, and additionally
    * monotone in the weights: raising a domain's fraction only ADDS
    * documents (the kept set at w is a subset of the kept set at w' ≥
    * w), so mixture iterations reuse everything already downstream.
    *
    * Still a narrow filter — the weights become a literal CASE chain, no
    * join, no shuffle, full pushdown compatibility. A mixture spec is
    * human-authored config (tens of domains, not millions), which is
    * why a broadcast-join variant would be over-engineering; if a
    * generated million-domain spec ever appears, swap the chain for a
    * broadcast join against a (domain, fraction) table.
    *
    * Unlisted domains get `defaultFraction` (default: dropped) — an
    * explicit mixture should not silently pass a new crawl source at
    * full weight.
    */
  def mixtureSample(df: DataFrame, keyCol: Column, domainCol: Column,
                    weights: Map[String, Double],
                    defaultFraction: Double = 0.0): DataFrame = {
    (weights.values ++ Iterator(defaultFraction)).foreach(w =>
      require(w >= 0.0 && w <= 1.0, s"fractions must be in [0,1], got $w"))
    val threshold = weights.toSeq.sortBy(_._1).foldLeft(
      lit((defaultFraction * Mod).toLong)) { case (acc, (dom, w)) =>
        when(domainCol === lit(dom), lit((w * Mod).toLong)).otherwise(acc)
      }
    df.where(knuthHash(keyCol) < threshold)
  }

  /** Per-ROW weighted Bernoulli: keep a row iff its key's hash falls
    * under ⌊w·2^32⌋, where the weight is a COLUMN — quality-weighted
    * downsampling ("keep high-quality docs with probability ∝ score"),
    * the per-document generalization of `mixtureSample`'s per-domain
    * constant. Same determinism contract; the threshold arithmetic is
    * plain IEEE double multiply + floor, so an ANSI oracle reproduces
    * membership bit-for-bit (no transcendental functions — an
    * exp/log-keyed weighted draw would diverge between engines in the
    * last ulp and flip boundary rows).
    *
    * Weight semantics at the edges are the natural limits: w ≤ 0 never
    * keeps, w ≥ 1 always keeps (no clamp, no error — the weight is
    * data, and a scoring model emitting 1.3 means "certainly keep").
    * Still a narrow filter; no shuffle.
    */
  def weightedSample(df: DataFrame, keyCol: Column, weightCol: Column): DataFrame =
    df.where(knuthHash(keyCol) <
      floor(weightCol.cast("double") * lit(Mod.toDouble)).cast("long"))

  /** Repeat-factor UPsampling: emit ⌊w⌋ copies of each row, plus one
    * more with probability frac(w), tagged `copy` ∈ [0, reps) — the
    * "epochs per domain" half of a mixing spec (w = 2.5 ⟹ this row
    * appears 2 or 3 times, 2.5 in expectation, deterministically
    * chosen by its own key). Downsampling (w < 1) falls out as the
    * 0-or-1-copy case and agrees with `weightedSample` membership.
    *
    * The expansion is a narrow `explode(sequence(...))` — rows never
    * shuffle, output size is Σ reps. Compose BEFORE `assignShards` so
    * the copies of a document land in different shards (the copy index
    * is part of nothing — shard placement hashes the key column the
    * caller passes, so pass a (key, copy) combination there; the
    * composition is oracle-verified end-to-end by SparkEntry's
    * `pipeline_epochs` query, which places copies by key·4 + copy).
    * Working column `_reps` and output `copy` must be free.
    */
  def upsample(df: DataFrame, keyCol: Column, weightCol: Column): DataFrame = {
    TextAnalysis.requireFree(df, "_reps", "copy")
    val w = weightCol.cast("double")
    val extra = when(knuthHash(keyCol) <
      floor((w - floor(w)) * lit(Mod.toDouble)).cast("long"), 1L).otherwise(0L)
    // _reps stays LONG end to end: an int cast would wrap a corrupt
    // giant weight negative and silently DROP the row; as a long, an
    // absurd weight fails loudly in sequence()'s array-length check
    df.withColumn("_reps", floor(w).cast("long") + extra)
      .where(col("_reps") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("_reps") - 1L)))
      .drop("_reps")
  }

  /** Deterministic train/val/test split: consecutive named RANGES of
    * the same hash space every sampler here draws from. Each key lands
    * in exactly one split (the last range is the unconditional
    * remainder, so fp boundary rounding can never leave a key
    * unlabeled), membership has the usual guarantees (re-derivable,
    * layout-independent, stable as the corpus grows), and because the
    * ranges tile the SAME hash line as `hashSample`, the 'train' split
    * at fraction f IS `hashSample(df, key, f)` — one consistent notion
    * of "the first f of the corpus" across the whole toolkit.
    *
    * Splits are ordered (a Seq, not a Map): the boundaries are
    * cumulative, so reordering renames rows. Growing one split shrinks
    * only its right neighbors — train/val boundaries hold while a test
    * share is re-cut. A narrow projection; no shuffle.
    */
  def splitAssign(df: DataFrame, keyCol: Column,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    splits.foreach { case (n, f) =>
      require(f > 0.0 && f <= 1.0, s"fraction for '$n' out of (0,1]: $f") }
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"split fractions must sum to 1 (a partition, not a sample), got $total")
    TextAnalysis.requireFree(df, "split")
    val h = knuthHash(keyCol)
    val bounds = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val label = splits.zip(bounds).dropRight(1).foldRight(
      lit(splits.last._1): Column) { case (((name, _), bound), acc) =>
        when(h < lit((bound * Mod).toLong), lit(name)).otherwise(acc)
      }
    df.withColumn("split", label)
  }

  /** Token-budget sampling: per-domain, draw documents in deterministic
    * hash order until the domain's token budget is exhausted — the form
    * mixture specs actually take for LLM training ("20 B tokens of
    * code, 5 B of forums"), where a FRACTION of an unknown-sized corpus
    * is the wrong contract. The kept set is the maximal PREFIX of the
    * domain's hash order whose token sum stays ≤ budget: the budget is
    * a ceiling, never overshot, and the draw stops at the first
    * document that would cross it. Later, smaller documents are NOT
    * back-filled — that greedy knapsack variant is inherently
    * sequential (each admit depends on every prior skip), unexpressible
    * as one window and much harder to audit; the prefix rule wastes at
    * most one document's worth of budget per domain.
    *
    * SKEW-SAFE TWO-PHASE DRAW: a naive per-domain cumulative window is
    * one partition per domain — a domain that is 80% of a 100 TB corpus
    * would serialize through a single task. Instead the domain's hash
    * line [0, 2^32) is cut into `subRanges` consecutive sub-ranges
    * (`_r = _h div width` — ranges tile the SAME hash order, so
    * concatenating them in `_r` order IS the global order and
    * membership stays bit-identical to the one-window form):
    * phase 1 aggregates per-(domain, range) token totals — a map-side
    * partial aggregation whose exchange carries O(domains · subRanges)
    * rows — and turns them into per-range exclusive prefix OFFSETS with
    * a window over that tiny frame; phase 2 broadcasts the offsets
    * back, runs the cumulative sum WITHIN each (domain, range)
    * partition — the hot domain now spreads across `subRanges` tasks —
    * and keeps a row iff offset + within-range cumulative ≤ budget.
    * Long arithmetic throughout, so the split-then-add decomposition is
    * exactly the single window's running sum at every row. The corpus
    * is scanned twice (totals pass + window pass), both narrow; the
    * offsets frame must be broadcast-sized (domains · subRanges rows —
    * the operator's design envelope, same class as the mixture CASE
    * chain).
    *
    * `subRanges` = 0 (default) uses the session's shuffle parallelism;
    * 1 degenerates to the single-window draw.
    *
    * Working columns `_h`, `_cum`, `_r`, `_off` must be free.
    */
  def tokenBudgetSample(df: DataFrame, keyCol: Column, tokenCol: Column,
                        domainCol: String, budgets: Map[String, Long],
                        defaultBudget: Long = 0L, subRanges: Int = 0): DataFrame = {
    (budgets.values ++ Iterator(defaultBudget)).foreach(b =>
      require(b >= 0L, s"budgets must be non-negative, got $b"))
    require(subRanges >= 0, s"subRanges must be >= 0, got $subRanges")
    TextAnalysis.requireFree(df, "_h", "_cum", "_r", "_off")
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (dom, b)) => when(col(domainCol) === lit(dom), lit(b)).otherwise(acc)
    }
    val ranges =
      if (subRanges > 0) subRanges
      else scala.util.Try(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt).getOrElse(64)
    // ceil width keeps _r < ranges for every _h in [0, 2^32); DIV is
    // exact integer division (a double floor could round at range
    // boundaries when width is not a power of two)
    val width = (Mod + ranges - 1) / ranges
    val withH = df.withColumn("_h", knuthHash(keyCol))
      .withColumn("_r", expr(s"_h DIV ${width}L"))
    // phase 1: per-(domain, range) totals → exclusive prefix offsets.
    // The offsets join below is NULL-SAFE on the domain: a null domain
    // is a legitimate group (it draws defaultBudget, exactly as the
    // window form partitioned it), and a plain equi-join would silently
    // drop those rows.
    val offs = withH.groupBy(col(domainCol).as("_dom"), col("_r").as("_r2"))
      .agg(sum(tokenCol).as("_rt"))
      .withColumn("_off", coalesce(
        sum(col("_rt")).over(Window.partitionBy("_dom").orderBy("_r2")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_dom"), col("_r2"), col("_off"))
    // phase 2: within-range cumulative + broadcast offsets
    val w = Window.partitionBy(col(domainCol), col("_r")).orderBy(col("_h"), keyCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withH
      .join(broadcast(offs),
        col(domainCol) <=> col("_dom") && col("_r") === col("_r2"))
      .withColumn("_cum", col("_off") + sum(tokenCol).over(w))
      .where(col("_cum") <= budget)
      .drop("_h", "_r", "_dom", "_r2", "_off", "_cum")
  }

  /** Temperature-flattened domain mixture (the `count^α` re-weighting
    * of Gopher/PaLM-style training mixes): domain `d` with `n_d` rows
    * gets a target of `t_d = ⌊totalRows · n_d^α / Σ n^α⌋` rows, drawn
    * as its `t_d` hash-smallest keys. `α = 1` is a uniform downsample
    * (targets ∝ sizes); `α = 0` gives every domain the same target
    * (capped at its size); between, small domains are progressively
    * upweighted relative to their share — the standard knob for "don't
    * let the crawl drown the curated sources" without hand-writing
    * per-domain weights the way [[mixtureSample]] expects.
    *
    * Exactness contract: weights use `sqrt` at α = 0.5 and the plain
    * count at α ∈ {0, 1} (all correctly-rounded IEEE ops), and Σ n^α
    * accumulates in lexicographic domain order — so an ANSI oracle
    * reproduces every `t_d` bit-for-bit. Other α go through `pow`,
    * whose last-ulp rounding is implementation-defined (may flip a
    * boundary row vs another engine — fine for production, not for a
    * hash gate). The floor allocation can leave up to #domains−1 of
    * `totalRows` unassigned; that remainder is the price of exact
    * reproducibility (largest-remainder rounding would need a
    * tie-break policy leaking into every oracle).
    *
    * Scale shape: one domain-sized count aggregate collects to the
    * driver (the operator's design envelope — domains are config-sized,
    * like the mixture CASE chain), then the draw IS
    * [[tokenBudgetSample]] with unit tokens, inheriting its skew-safe
    * two-phase prefix: a dominant domain spreads over `subRanges`
    * tasks instead of one reducer. Rows with a NULL domain are
    * dropped (budget 0), like unlisted domains in [[mixtureSample]]. */
  def temperatureMixture(df: DataFrame, keyCol: Column, domainCol: String,
                         alpha: Double, totalRows: Long,
                         subRanges: Int = 0): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    require(totalRows >= 0L, s"totalRows must be >= 0, got $totalRows")
    val counts = df.where(col(domainCol).isNotNull)
      .groupBy(col(domainCol)).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    def weight(n: Long): Double =
      if (alpha == 1.0) n.toDouble
      else if (alpha == 0.5) math.sqrt(n.toDouble)
      else if (alpha == 0.0) { if (n > 0) 1.0 else 0.0 }
      else math.pow(n.toDouble, alpha)
    val weights = counts.map { case (d, n) => d -> weight(n) }
    val sumW = weights.foldLeft(0.0)(_ + _._2) // lexicographic order — oracle-replicable
    val targets = weights.map { case (d, wd) =>
      d -> (if (sumW > 0.0) math.floor(totalRows.toDouble * (wd / sumW)).toLong else 0L)
    }.toMap
    tokenBudgetSample(df, keyCol, lit(1L), domainCol, targets,
      defaultBudget = 0L, subRanges = subRanges)
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
