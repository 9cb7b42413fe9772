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
}
