package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Orphan-file cleanup for a lake table: data files on disk that no
  * metastore stats row references. The rename protocols protect the
  * stats table and compaction swaps, but a plain ingest that crashes
  * after materializing part-files and before `Metastore.update` leaves
  * dark bytes on storage forever — at 100 TB that is real money and
  * real scan-listing overhead. The reference has no vacuum (its S3
  * layout assumes writers never fail mid-batch); this closes the gap.
  *
  * Deletion is gated on a GRACE PERIOD: between a batch's write and its
  * stats update every new file is legitimately unreferenced, so only
  * orphans older than `graceMs` are touched. Pick a grace comfortably
  * above the longest ingest-to-update window (hours, not minutes).
  * SINGLE-WRITER like all metastore maintenance: do not vacuum while a
  * compaction or ingest for this table is in flight.
  */
object Vacuum {

  /** Unreferenced `.parquet` files under `dataPath` older than
    * `graceMs`, as qualified path strings. The registered set is one
    * entry per file — driver-held, like the pruning interval map. */
  def orphans(spark: SparkSession, dataPath: String, statsPath: String,
              graceMs: Long): Seq[String] = {
    val registered = Metastore.load(spark, statsPath)
      .select("filepath").collect()
      .map(r => new Path(r.getString(0)).toString).toSet
    val root = new Path(dataPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cutoff = System.currentTimeMillis() - graceMs
    val it = fs.listFiles(root, true)
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet") &&
          f.getModificationTime < cutoff &&
          !registered.contains(f.getPath.toString))
        buf += f.getPath.toString
    }
    buf.toSeq
  }

  /** Delete the orphans and return what was deleted. Stats are not
    * touched — orphans were never registered. */
  def vacuum(spark: SparkSession, dataPath: String, statsPath: String,
             graceMs: Long): Seq[String] = {
    val root = new Path(dataPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dead = orphans(spark, dataPath, statsPath, graceMs)
    dead.foreach(p => fs.delete(new Path(p), false))
    dead
  }
}
