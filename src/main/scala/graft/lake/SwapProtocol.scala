package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}

/** The two-phase rename commit shared by `Metastore.replaceUnderPrefix`
  * and `Compactor`: the caller fully writes `tmp`, then `commit()`
  * swings live aside to `bak` and renames tmp in. Each rename is atomic
  * on HDFS/POSIX; `recover()` rolls the gaps between them forward or
  * back. One implementation so a future fix to the crash protocol
  * cannot silently miss one of the two users; suffixes stay
  * caller-chosen so their staging dirs never collide on one table.
  * (private[graft]: `ops.IncrementalDedup.compact` swaps its index
  * tables through the same protocol.)
  */
private[graft] final class SwapProtocol(fs: FileSystem, live: Path,
                                        tmpSuffix: String, bakSuffix: String) {
  val tmp = new Path(live.getParent, live.getName + tmpSuffix)
  val bak = new Path(live.getParent, live.getName + bakSuffix)

  def clearTmp(): Unit = fs.delete(tmp, true)
  def dropBak(): Unit = fs.delete(bak, true)

  /** Commit a fully-written `tmp` over `live`. */
  def commit(): Unit = {
    fs.delete(bak, true)
    require(fs.rename(live, bak), s"could not stage $live aside to $bak")
    require(fs.rename(tmp, live), s"could not commit $tmp to $live")
  }

  /** Roll an interrupted commit forward or back:
    *  - live missing + bak present → crashed between the renames: the
    *    bak IS the previous table; restore it (tmp may be incomplete —
    *    dropped, the operation can simply be re-run).
    *  - live present + bak present → data committed, post-commit work
    *    (cleanup, dependent-state refresh) unfinished.
    *  - leftover tmp → an uncommitted write; dropped.
    * Returns true in the committed-bak case so the caller can finish
    * its post-commit work before calling `dropBak()`. */
  def recover(): Boolean = {
    var committedBak = false
    if (fs.exists(bak)) {
      if (!fs.exists(live)) require(fs.rename(bak, live), s"could not restore $bak to $live")
      else committedBak = true
    }
    fs.delete(tmp, true)
    committedBak
  }
}
