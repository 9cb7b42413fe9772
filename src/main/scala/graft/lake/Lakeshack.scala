package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The retrieval engine: prune files via the Metastore, then scan only the
  * surviving Parquet files with projection + conjunctive predicate
  * pushdown — the Spark rebuild of `Lakeshack.query`
  * (lakeshack/lakeshack.py:476-579). The reference's second path,
  * `query_s3_select` (lakeshack.py:303-474), collapses into this same
  * plan: per-file server-side filter+projection is exactly what a Spark
  * executor task does against Parquet, so there is ONE code path.
  *
  * Query lifecycle (SURVEY.md §3):
  *   1. normalize scalar→list input (lakeshack.py:514-515)
  *   2. prune: stats range-join → surviving file list (metastore.py:414-481)
  *   3. scan only those files; `isin` + clause conjunction + projection are
  *      pushed by Catalyst into the Parquet reader (row-group skipping
  *      included), replacing pyarrow's to_batches(filter=, columns=)
  *   4. limit — Spark's CollectLimit is exact and early-terminating, a
  *      strict strengthening of the reference's "≤ N + batch_size"
  *      contract (lakeshack.py:504-507).
  *
  * Scale: the data table is never shuffled; the query is (pruned scan →
  * filter → project → limit), embarrassingly parallel across file splits.
  * The must-apply-at-scan rule matters for correctness: pruning is
  * may-contain (false positives allowed), so the scan filter re-applies
  * both the membership predicate and every clause — including clauses on
  * columns the metastore never indexed.
  */
class Lakeshack(spark: SparkSession, stats: DataFrame, dataSchema: Option[StructType] = None) {

  val clusterColumn: String = Metastore.clusterColumnOf(stats)

  /** Point/range retrieval. Returns an unexecuted DataFrame so callers
    * can compose further operators (the host engine IS Spark).
    *
    * @param values   requested cluster-column value(s)
    * @param clauses  AND-conjoined comparison clauses (6 ops, see Clause)
    * @param columns  projection; None = all columns
    * @param limit    max records (None = unlimited); exact, unlike the
    *                 reference's approximate n_records_max
    */
  def query(values: Seq[Any],
            clauses: Seq[Clause] = Nil,
            columns: Option[Seq[String]] = None,
            limit: Option[Int] = None): DataFrame = {
    val files = Metastore.prune(spark, stats, values, clauses)
    if (files.isEmpty) {
      // no surviving file: empty result with the right schema
      val schema = dataSchema.getOrElse(
        throw new IllegalStateException("No files matched and no schema supplied for empty result"))
      val projected = columns.map(cs => StructType(cs.map(schema(_)))).getOrElse(schema)
      return spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), projected)
    }
    val reader = dataSchema.fold(spark.read)(s => spark.read.schema(s))
    var df = reader.parquet(files: _*)
      .where(col(clusterColumn).isin(values: _*) && Clause.conjunction(clauses))
    df = columns.fold(df)(cs => df.select(cs.map(col): _*))
    limit.fold(df)(df.limit)
  }

  /** Scalar-input convenience, mirroring the reference's scalar→list
    * coercion (lakeshack.py:344-345,514-515). */
  def queryOne(value: Any): DataFrame = query(values = Seq(value))
}

object Lakeshack {
  /** Build stats in one pass and return a ready-to-query engine. The
    * stats DataFrame is cached: it is tiny (one row per file) and every
    * query's prune step consumes it — without the cache each query
    * would silently re-run the full stats-build scan of the data. */
  def apply(spark: SparkSession, dataPath: String, clusterColumn: String,
            optionalColumns: Seq[String] = Nil): Lakeshack = {
    // recursive, matching Metastore.build's discovery on nested layouts
    val schema = spark.read.option("recursiveFileLookup", "true").parquet(dataPath).schema
    new Lakeshack(spark,
      Metastore.build(spark, dataPath, clusterColumn, optionalColumns).cache(),
      Some(schema))
  }

  /** The steady-state path: load a PERSISTED stats table instead of
    * re-harvesting — harvest once at ingest (`Metastore.update`), then
    * every later session loads in O(stats) time. The load is strictly
    * validated column-by-column against the data schema (reference O14,
    * metastore.py:128-204): stats built for a different table, cluster
    * column, or drifted type are rejected up front instead of silently
    * pruning garbage. */
  def fromStats(spark: SparkSession, dataPath: String, statsPath: String,
                clusterColumn: String, optionalColumns: Seq[String] = Nil): Lakeshack = {
    val schema = spark.read.option("recursiveFileLookup", "true").parquet(dataPath).schema
    val stats = Metastore.loadValidated(spark, statsPath, schema, clusterColumn, optionalColumns)
    new Lakeshack(spark, stats.cache(), Some(schema))
  }
}
