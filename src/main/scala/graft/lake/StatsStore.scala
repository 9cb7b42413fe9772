package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The two operations row-level maintenance (Merge) needs from a stats
  * backend, abstracted over the parquet store and the RDBMS store so
  * `Merge.upsert/delete` run unchanged against either — the same
  * store-duality the reference exposes through `store_url`
  * (lakeshack/metastore.py:81-100).
  *
  * `replaceFiles` must be ATOMIC per call (all removed rows gone and
  * all new rows visible, or neither): Merge's crash contract — stats-
  * routed readers see a consistent table at every crash point — stands
  * on that. The parquet store gets it from the SwapProtocol rename
  * pair; the JDBC store from a single DB transaction.
  */
trait StatsStore {
  def load(): DataFrame
  def replaceFiles(removedFiles: Seq[String], newStats: DataFrame): Unit
}

object StatsStore {

  /** Parquet-directory store (`Metastore.load`/`replaceFiles`). */
  def parquet(spark: SparkSession, statsPath: String): StatsStore = new StatsStore {
    def load(): DataFrame = Metastore.load(spark, statsPath)
    def replaceFiles(removedFiles: Seq[String], newStats: DataFrame): Unit =
      Metastore.replaceFiles(spark, statsPath, removedFiles, newStats)
  }

  /** RDBMS store (`JdbcMetastore`), for deployments that keep stats in
    * a database (`store_url` parity). */
  def jdbc(spark: SparkSession, url: String, table: String): StatsStore = new StatsStore {
    def load(): DataFrame = JdbcMetastore.load(spark, url, table)
    def replaceFiles(removedFiles: Seq[String], newStats: DataFrame): Unit =
      JdbcMetastore.replaceFiles(spark, url, table, removedFiles, newStats)
  }
}
