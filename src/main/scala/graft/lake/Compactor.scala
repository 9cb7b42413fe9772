package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for a lake table + its metastore stats — the
  * maintenance operator every streaming-ingested lake needs: each
  * micro-batch commit leaves a few small files (streaming.LakeIngest),
  * and at 100k+ files task-scheduling overhead dominates scans while
  * fragmented [min,max] ranges blunt zone-map pruning. Compaction
  * rewrites the table as `targetFiles` range-clustered files and swaps
  * them in atomically, then replaces the table's stats rows.
  *
  * The reference has no compaction (its docs assume well-sized batch
  * writes, docs/source/lakeshack.rst:252-263); this closes the loop for
  * continuous ingest.
  *
  * Commit protocol (same shape as Metastore.replaceUnderPrefix): write
  * `<path>.ctmp`, swing live to `<path>.cbak`, rename tmp in, refresh
  * stats, drop bak. `recoverIfNeeded` rolls a crashed swap forward or
  * back; SINGLE-WRITER like all metastore maintenance — pause ingest
  * for the table (not the whole lake) while compacting.
  */
object Compactor {

  def compact(spark: SparkSession, dataPath: String, statsPath: String,
              clusterColumn: String, targetFiles: Int,
              optionalColumns: Seq[String] = Nil): Unit = {
    require(targetFiles > 0, s"targetFiles must be positive, got $targetFiles")
    recoverIfNeeded(spark, dataPath)
    val live = new Path(dataPath)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = tmpPath(live)
    val bak = bakPath(live)
    fs.delete(tmp, true)
    // the rewrite is an eager action: the clustered copy is fully
    // committed to tmp before any rename touches the live dir
    ClusteredWriter.write(
      spark.read.option("recursiveFileLookup", "true").parquet(dataPath),
      tmp.toString, clusterColumn, targetFiles)
    fs.delete(bak, true)
    require(fs.rename(live, bak), s"could not stage $live aside to $bak")
    require(fs.rename(tmp, live), s"could not commit $tmp to $live")
    // stats: all rows under the table's prefix are stale (the old files
    // are gone); replace them with a footer-only harvest of the new
    // files. Crash before this point: recoverIfNeeded rolls the data
    // swap back (bak still present), so stats were never wrong.
    Metastore.replaceUnderPrefix(spark, statsPath, dataPath,
      Metastore.buildFromFooters(spark, dataPath, clusterColumn, optionalColumns))
    fs.delete(bak, true)
  }

  /** Roll an interrupted compaction forward or back:
    *  - live missing + bak present → crashed between the renames: the
    *    bak IS the table; restore it (the tmp may be incomplete — drop).
    *  - live present + bak present → crashed after the data swap but
    *    before stats/cleanup: the OLD files' stats rows may still be
    *    live, so re-harvest and replace before dropping bak.
    *  - leftover tmp → uncommitted rewrite; drop it. */
  def recoverIfNeeded(spark: SparkSession, dataPath: String,
                      statsContext: Option[(String, String, Seq[String])] = None): Unit = {
    val live = new Path(dataPath)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = tmpPath(live)
    val bak = bakPath(live)
    if (fs.exists(bak)) {
      if (!fs.exists(live)) {
        require(fs.rename(bak, live), s"could not restore $bak to $live")
      } else statsContext match {
        case Some((statsPath, clusterColumn, optionalColumns)) =>
          Metastore.replaceUnderPrefix(spark, statsPath, dataPath,
            Metastore.buildFromFooters(spark, dataPath, clusterColumn, optionalColumns))
          fs.delete(bak, true)
        case None =>
          // bak alongside live but no stats context: leave bak for a
          // caller that knows the stats table — deleting it here would
          // forfeit nothing (data is swapped) but stats may be stale
          ()
      }
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
  }

  private def tmpPath(live: Path) = new Path(live.getParent, live.getName + ".ctmp")
  private def bakPath(live: Path) = new Path(live.getParent, live.getName + ".cbak")
}
