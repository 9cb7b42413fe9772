package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Orphan-file cleanup for a lake table: data files on disk that no
  * metastore stats row references. The rename protocols protect the
  * stats table and compaction swaps, but a plain ingest that crashes
  * after materializing part-files and before `Metastore.update` leaves
  * dark bytes on storage forever — at 100 TB that is real money and
  * real scan-listing overhead. The reference has no vacuum (its S3
  * layout assumes writers never fail mid-batch); this closes the gap.
  *
  * SAFETY GATES — deletion refuses to run unless the table is known
  * healthy, because "unreferenced" is only meaningful against
  * trustworthy stats:
  *  - a compaction crash marker (`.cbak`/`.ctmp` beside the table)
  *    aborts: after a crash between the data swap and the stats
  *    replace, EVERY live file is briefly unregistered — vacuuming then
  *    would delete the whole table. Run `Compactor.recoverIfNeeded`
  *    with the stats context first.
  *  - stats rows pointing at files that no longer exist abort for the
  *    same reason (stale stats ⇒ the unreferenced set is meaningless).
  *  - a GRACE PERIOD covers the legitimate window between a batch's
  *    write and its stats update; pick it comfortably above the longest
  *    ingest-to-update gap (hours, not minutes).
  * SINGLE-WRITER like all metastore maintenance: do not vacuum while a
  * compaction or ingest for this table is in flight.
  */
object Vacuum {

  /** Unreferenced `.parquet` files under `dataPath` older than
    * `graceMs`, judged against an explicit stats table (use this
    * overload with `JdbcMetastore.load` or any other store). */
  def orphans(spark: SparkSession, dataPath: String, stats: DataFrame,
              graceMs: Long): Seq[String] = {
    val root = new Path(dataPath) // Path-normalized: "/t/" and "/t" agree
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (suffix <- Seq(Compactor.BakSuffix, Compactor.TmpSuffix)) {
      // sibling markers built exactly as SwapProtocol builds them — raw
      // string concat would miss them for a trailing-slash dataPath
      val marker = new Path(root.getParent, root.getName + suffix)
      require(!fs.exists(marker),
        s"crashed compaction detected ($marker exists); run " +
          "Compactor.recoverIfNeeded with the stats context before vacuuming")
    }
    // registered set: one entry per file — driver-held, like the
    // pruning interval map
    val registered = stats.select("filepath").collect()
      .map(r => new Path(r.getString(0)).toString).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    val it = fs.listFiles(root, true)
    val onDisk = scala.collection.mutable.Set[String]()
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
        onDisk += f.getPath.toString
        if (f.getModificationTime < cutoff && !registered.contains(f.getPath.toString))
          buf += f.getPath.toString
      }
    }
    // stale-stats gate, scoped to THIS path: one stats table may span
    // many batch dirs, and registrations outside the vacuumed subtree
    // are legitimately not on this listing
    val prefix = Metastore.qualifiedPrefix(spark, dataPath)
    val dead = registered
      .filter(p => p == prefix || p.startsWith(prefix + "/"))
      .filterNot(onDisk.contains)
    require(dead.isEmpty,
      s"stats reference ${dead.size} missing file(s) (e.g. ${dead.head}) — stats are stale; " +
        "repair them (Metastore.replaceUnderPrefix / Compactor.recoverIfNeeded) before vacuuming")
    buf.toSeq
  }

  /** Parquet-store convenience overload. */
  def orphans(spark: SparkSession, dataPath: String, statsPath: String,
              graceMs: Long): Seq[String] =
    orphans(spark, dataPath, Metastore.load(spark, statsPath), graceMs)

  /** Delete the orphans and return what was actually deleted. Stats are
    * not touched — orphans were never registered. A path whose delete
    * returns false (permissions, concurrent removal) is logged and
    * EXCLUDED from the result, never falsely reported reclaimed. */
  def vacuum(spark: SparkSession, dataPath: String, stats: DataFrame,
             graceMs: Long): Seq[String] = {
    val root = new Path(dataPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (deleted, failed) = orphans(spark, dataPath, stats, graceMs)
      .partition(p => fs.delete(new Path(p), false))
    if (failed.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"vacuum could not delete ${failed.size} orphan(s): ${failed.take(5).mkString(", ")}")
    deleted
  }

  /** Parquet-store convenience overload. */
  def vacuum(spark: SparkSession, dataPath: String, statsPath: String,
             graceMs: Long): Seq[String] =
    vacuum(spark, dataPath, Metastore.load(spark, statsPath), graceMs)
}
