package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** RDBMS-backed stats store — the reference's `store_url` parity
  * (lakeshack/metastore.py:81-100: a SQLAlchemy engine URL, "any DB").
  * The parquet-backed `Metastore` functions carry a SINGLE-WRITER
  * contract because object stores have no transactions; pointing the
  * stats table at a database instead inherits the DB's locking and
  * atomicity, exactly as the reference does — `update` keeps the same
  * idempotent left-anti semantics, `replaceUnderPrefix` becomes a
  * delete+insert the DB can wrap in its own transaction machinery.
  *
  * The stats DataFrames are tiny (one row per file), so JDBC round
  * trips are MBs even at 100k files. Works against any JDBC database
  * on the classpath; tested against embedded Derby (ships with Spark).
  * Caveat: embedded Derby is single-JVM — use a networked database for
  * a real multi-writer cluster.
  */
object JdbcMetastore {

  /** TIMESTAMP columns come back as TIMESTAMP_NTZ so stats written from
    * a TimestampNTZType lake column round-trip type-identically and
    * `Metastore.validate` sees no drift. */
  private def reader(spark: SparkSession, url: String, table: String) =
    spark.read.option("preferTimestampNTZ", "true").jdbc(url, table, new java.util.Properties())

  def exists(spark: SparkSession, url: String, table: String): Boolean =
    try { reader(spark, url, table).schema; true }
    catch { case _: Exception => false }

  def load(spark: SparkSession, url: String, table: String): DataFrame = {
    val df = reader(spark, url, table)
    require(df.schema.fieldNames.headOption.contains("filepath") &&
      df.schema.fieldNames.exists(_.endsWith("_min")),
      s"Not a metastore stats table: ${df.schema.simpleString}")
    df
  }

  /** Idempotent upsert, same left-anti semantics as `Metastore.update`
    * (reference O12). */
  def update(spark: SparkSession, url: String, table: String, newStats: DataFrame): Unit = {
    val fresh =
      if (exists(spark, url, table)) {
        val old = load(spark, url, table)
        require(old.schema.map(f => (f.name, f.dataType)) == newStats.schema.map(f => (f.name, f.dataType)),
          s"Metastore schema mismatch: existing ${old.schema.simpleString} vs new ${newStats.schema.simpleString}")
        newStats.join(old.select("filepath"), Seq("filepath"), "left_anti")
      } else newStats
    fresh.write.mode(SaveMode.Append).jdbc(url, table, new java.util.Properties())
  }

  /** Replace all stats rows under a directory prefix with fresh ones
    * (the rewritten-batch upsert — see `Metastore.replaceUnderPrefix`).
    * No rename protocol needed: the overwrite is the database's own
    * table replacement. */
  def replaceUnderPrefix(spark: SparkSession, url: String, table: String,
                         dirPrefix: String, newStats: DataFrame): Unit = {
    import org.apache.spark.sql.functions.col
    if (!exists(spark, url, table)) {
      newStats.write.mode(SaveMode.Append).jdbc(url, table, new java.util.Properties())
      return
    }
    val p = new org.apache.hadoop.fs.Path(dirPrefix)
    val norm = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
    val old = load(spark, url, table)
    require(old.schema.map(f => (f.name, f.dataType)) == newStats.schema.map(f => (f.name, f.dataType)),
      s"Metastore schema mismatch: existing ${old.schema.simpleString} vs new ${newStats.schema.simpleString}")
    // collect-then-overwrite, like the parquet store: the merged table
    // is tiny, and a lazy read-and-overwrite of the same JDBC table
    // would truncate the source under the reader
    val merged = old.where(!col("filepath").startsWith(norm + "/"))
      .unionByName(newStats)
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    merged.collect().foreach(rows.add)
    spark.createDataFrame(rows, merged.schema)
      .write.mode(SaveMode.Overwrite).jdbc(url, table, new java.util.Properties())
  }
}
