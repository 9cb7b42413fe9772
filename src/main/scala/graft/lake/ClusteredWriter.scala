package graft.lake

import org.apache.spark.sql.{DataFrame, functions => F}

/** Write-side clustering (reference O20 — doc-only recipe,
  * docs/source/lakeshack.rst:252-263, which is itself a Spark snippet):
  * range-partition by the cluster column and sort within partitions so
  * every output file (and row group) covers a disjoint, tight [min,max]
  * range. This is what makes zone-map pruning effective: a well-clustered
  * table answers a point query from ~1 file and ~1 row group
  * (docs/source/lakeshack.rst:184-250).
  *
  * Scale: `repartitionByRange` samples the key distribution to build
  * balanced range bounds, so skewed keys still give even file sizes at
  * 100 TB; `nFiles` should target ~128-512 MB per output file.
  */
object ClusteredWriter {
  def write(df: DataFrame, path: String, clusterColumn: String, nFiles: Int,
            sortColumns: Seq[String] = Nil): Unit = {
    val sortCols = (clusterColumn +: sortColumns).map(F.col)
    df.repartitionByRange(nFiles, F.col(clusterColumn))
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Z-order clustered write over TWO dimensions: range-partition and
    * sort by the Morton key of the pair, so each output file covers a
    * tight box in both columns and zone-map pruning works for filters
    * on either (or both) — see `ZOrder`. The bounds scan is one tiny
    * min/max aggregate (a full-scan partial aggregate; at 100 TB reuse
    * footer stats via `Metastore.buildFromFooters` and pass the global
    * fold if the table is already on the lake). */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    nFiles: Int): Unit = {
    require(!df.columns.contains("_z"),
      "input column '_z' clashes with the working Morton-key column; rename it first")
    val b = df.agg(
      F.min(F.col(colA).cast("double")), F.max(F.col(colA).cast("double")),
      F.min(F.col(colB).cast("double")), F.max(F.col(colB).cast("double"))).first()
    require(!b.isNullAt(0) && !b.isNullAt(2), "cannot z-order an empty table")
    val z = ZOrder.mortonKey(
      F.col(colA), b.getDouble(0), b.getDouble(1),
      F.col(colB), b.getDouble(2), b.getDouble(3))
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, F.col("_z"))
      .sortWithinPartitions(F.col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Z-order clustered write over ANY 2-8 dimensions — `writeZOrdered`
    * generalized via `ZOrder.mortonKeyN`. One tiny min/max aggregate
    * computes all bounds in a single pass; same 100 TB note as the
    * two-column form (reuse footer stats for the bounds if the table
    * is already on the lake). */
  def writeZOrderedN(df: DataFrame, path: String, cols: Seq[String],
                     nFiles: Int): Unit = {
    require(!df.columns.contains("_z"),
      "input column '_z' clashes with the working Morton-key column; rename it first")
    val aggs = cols.flatMap(c =>
      Seq(F.min(F.col(c).cast("double")), F.max(F.col(c).cast("double"))))
    val b = df.agg(aggs.head, aggs.tail: _*).first()
    require((0 until cols.size * 2).forall(i => !b.isNullAt(i)),
      "cannot z-order an empty table or an all-NULL dimension")
    val dims = cols.zipWithIndex.map { case (c, i) =>
      (F.col(c), b.getDouble(2 * i), b.getDouble(2 * i + 1))
    }
    df.withColumn("_z", ZOrder.mortonKeyN(dims))
      .repartitionByRange(nFiles, F.col("_z"))
      .sortWithinPartitions(F.col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Z-order clustered write with RANK (quantile) normalization — use
    * when a cluster column is heavy-tailed: linear quantization lets
    * one outlier stretch [min,max] until the dense region collapses to
    * a single code and pruning on that column dies (see
    * `ZOrder.mortonKeyRanked`). Boundaries come from one
    * `approxQuantile` pass (Greenwald-Khanna sketch — a single
    * distributed scan; the driver receives cols × `buckets` doubles).
    * Duplicate boundaries from heavy ties are collapsed, which only
    * merges empty codes. */
  def writeZOrderedRanked(df: DataFrame, path: String, cols: Seq[String],
                          nFiles: Int, buckets: Int = 256): Unit = {
    require(!df.columns.contains("_z"),
      "input column '_z' clashes with the working Morton-key column; rename it first")
    require(buckets >= 2 && buckets <= 256, s"buckets must be in [2,256], got $buckets")
    // boundary count (buckets − 1) must fit the per-dimension Morton
    // code space — fail before the quantile pass, not inside
    // mortonKeyRanked after it (5+ dims have fewer than 8 bits each)
    val zBits = math.min(16, 62 / cols.size)
    require(buckets <= (1 << zBits),
      s"buckets=$buckets exceeds the $zBits-bit per-dimension code space " +
        s"for ${cols.size} Z-order columns — use buckets <= ${1 << zBits}")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // one pass over a projection cast to double (approxQuantile is
    // numeric-only; the cast also normalizes int/date dims)
    val castCols = cols.map(c => F.col(c).cast("double").as(c))
    val quantiles = df.select(castCols: _*)
      .stat.approxQuantile(cols.toArray, probs, 0.001)
    val dims = cols.zip(quantiles).map { case (c, q) =>
      require(q.nonEmpty, s"cannot rank-normalize '$c': empty or all-NULL column")
      (F.col(c), q.distinct.sorted)
    }
    df.withColumn("_z", ZOrder.mortonKeyRanked(dims))
      .repartitionByRange(nFiles, F.col("_z"))
      .sortWithinPartitions(F.col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
