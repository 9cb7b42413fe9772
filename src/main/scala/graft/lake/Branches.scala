package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Branches and tags over [[SnapshotLog]] — the write-audit-publish
  * (WAP) lifecycle of the public Iceberg ref model, on one shared
  * immutable data pool.
  *
  * A BRANCH is a full snapshot log of its own (`<table>/_branches/
  * <name>/_log`) whose manifests resolve file paths against the parent
  * table's `data/` pool ([[SnapshotLog.dataRootOf]]). Branch v0 is a
  * self-contained `fork@<version>` commit restating the forked
  * version's live set, schema, and deletion vectors — so EVERY
  * SnapshotLog operation (append, appendBatch, merge, deleteByKeys,
  * purgeDeletes, compact, readChanges, time travel, rollback) works on
  * a branch path unchanged, and the branch keeps reading its fork
  * state even after the main log expires the manifests of that
  * version.
  *
  * [[publish]] is fast-forward-only write-audit-publish: it requires
  * the main head to still BE the fork version and commits the net
  * manifest diff (branch head vs fork state) as ONE main commit — no
  * file moves, no data copies, readers of main flip atomically from
  * fork state to audited state. If main advanced, publish throws and
  * the caller re-forks (rebase = re-run the pipeline on a fresh
  * branch; automatic file-level rebase would silently merge
  * un-audited rows, defeating the audit gate).
  *
  * A TAG is an immutable named pointer to a main version
  * (`<table>/_tags/<name>`, create-no-overwrite): "the snapshot the
  * March run trained on". [[SnapshotLog.expire]] never drops below the
  * oldest tag, so a tagged version stays reproducible until the tag is
  * deleted.
  *
  * At 100 TB: fork cost is one manifest write of O(live files) lines
  * (no data touched); per-branch-commit cost is the same as a main
  * commit; publish is O(changed files) manifest lines. The audit step
  * between write and publish is whatever the pipeline runs against
  * `Branches.path(table, name)` — e.g. [[Expectations]] rules or the
  * stats-soundness audit — with main readers never exposed to
  * unaudited rows. */
object Branches {

  val BranchesDir = "_branches"
  val TagsDir = "_tags"
  val TagMagic = "graft-tag-v1"

  private val NamePat = "[A-Za-z0-9._-]{1,64}".r

  private def checkName(name: String): Unit =
    require(NamePat.pattern.matcher(name).matches(),
      s"bad ref name '$name' (allowed: [A-Za-z0-9._-]{1,64})")

  /** The branch's log root — pass this to any SnapshotLog operation. */
  def path(table: String, name: String): String = {
    checkName(name)
    s"$table/$BranchesDir/$name"
  }

  /** Fork `name` from `fromVersion` (default: head). The fork commit
    * restates the version's full live set + schema + DV sets, tagged
    * `fork@<version>`, so the branch is self-contained from birth.
    * Fails if the branch already exists. */
  def create(spark: SparkSession, table: String, name: String,
             fromVersion: Option[Long] = None): Long = {
    // A branch of a branch would nest `_branches/b1/_branches/b2`,
    // whose dataRootOf resolves to `…/b1/data` — NOT the table pool
    // the fork commit's restated paths are relative to: every read of
    // the nested branch would miss, and appends would open a divergent
    // second pool. Refuse the shape outright (fork from the table and
    // a version instead).
    require(!table.split('/').contains(BranchesDir),
      s"cannot fork from '$table' — branches fork from the TABLE root " +
        s"(use fromVersion to pin the state; nesting under $BranchesDir " +
        "would split the shared data pool)")
    val broot = path(table, name)
    val (fs, rootP) = SnapshotLog.fsOf(spark, broot)
    require(!fs.exists(SnapshotLog.logDir(rootP)),
      s"branch '$name' already exists on $table")
    val snap = SnapshotLog.state(spark, table, fromVersion)
    SnapshotLog.commit(spark, broot, s"fork@${snap.version}",
      adds = snap.files, removes = Nil, schemaJson = snap.schemaJson,
      expected = -1L, dvSets = snap.dvs.toSeq)
  }

  /** The main-table version branch `name` was forked from. */
  def forkVersion(spark: SparkSession, table: String, name: String): Long = {
    val op = SnapshotLog.history(spark, path(table, name))
      .where(org.apache.spark.sql.functions.col("version") === 0L)
      .select("op").collect()
    require(op.nonEmpty, s"branch '$name' has no fork commit")
    val s = op(0).getString(0)
    require(s.startsWith("fork@"), s"branch '$name' v0 op is '$s', not a fork")
    s.stripPrefix("fork@").toLong
  }

  /** Existing branch names (sorted). */
  def list(spark: SparkSession, table: String): Seq[String] = {
    val (fs, rootP) = SnapshotLog.fsOf(spark, table)
    val bdir = new Path(rootP, BranchesDir)
    if (!fs.exists(bdir)) Nil
    else fs.listStatus(bdir).filter(_.isDirectory).map(_.getPath.getName)
      .toSeq.sorted
  }

  /** Fast-forward publish: commit the branch head's net diff against
    * its fork state as ONE main commit (`publish:<name>`). Requires
    * the main head to still be the fork version — otherwise throws
    * `ConcurrentModificationException` (re-fork to rebase). Returns
    * the new main version. The branch is left in place (typically
    * [[drop]]ped next); re-publishing an already-published branch
    * throws the same conflict, never double-applies. */
  def publish(spark: SparkSession, table: String, name: String): Long = {
    val fork = forkVersion(spark, table, name)
    val bh = SnapshotLog.state(spark, table = path(table, name))
    val fk = SnapshotLog.state(spark, table, Some(fork))
    val forkFiles = fk.files.toSet
    val branchFiles = bh.files.toSet
    val adds = bh.files.filterNot(forkFiles)
    val removes = fk.files.filterNot(branchFiles)
    // DV restatement for surviving files whose set changed (replacement
    // semantics; removed files' sets die in the replay itself)
    val dvSets = bh.files.filter(forkFiles)
      .filter(f => bh.dvs.getOrElse(f, Nil) != fk.dvs.getOrElse(f, Nil))
      .map(f => f -> bh.dvs.getOrElse(f, Nil)) ++
      adds.filter(bh.dvs.contains).map(f => f -> bh.dvs(f))
    SnapshotLog.commit(spark, table, s"publish:$name", adds, removes,
      bh.schemaJson, expected = fork, dvSets = dvSets)
  }

  /** Delete the branch's log. Shared-pool data files the branch alone
    * referenced become orphans, reclaimed by
    * [[SnapshotLog.expireOrphans]] after its grace period. */
  def drop(spark: SparkSession, table: String, name: String): Unit = {
    val (fs, rootP) = SnapshotLog.fsOf(spark, path(table, name))
    fs.delete(rootP, true)
  }

  // ── tags ─────────────────────────────────────────────────────────

  private def tagPath(rootP: Path, name: String) = {
    checkName(name)
    new Path(new Path(rootP, TagsDir), name)
  }

  /** Tag `version` (default: head) of the main table as `name` —
    * atomic create-no-overwrite; a tag is immutable (delete + re-tag
    * to move it, accepting that the old pin is gone).
    *
    * An ALL-DIGIT name is rejected: SQL `VERSION AS OF <v>` resolves a
    * numeric argument as a commit number FIRST ([[SnapshotCatalog
    * .loadTable]]), so a tag named '42' would be unreachable there —
    * shadowed by commit 42, possibly a different snapshot than the tag
    * pins. Refusing at creation keeps the ambiguity impossible instead
    * of documented. */
  def tag(spark: SparkSession, table: String, name: String,
          version: Option[Long] = None): Long = {
    val (fs, rootP) = SnapshotLog.fsOf(spark, table)
    require(!SnapshotLog.isBranchRoot(rootP), "tags live on the table root")
    require(!name.forall(_.isDigit),
      s"tag name '$name' is all digits — SQL VERSION AS OF would resolve " +
        "it as a commit number, never the tag; pick a name with a letter")
    val head = SnapshotLog.currentVersion(spark, table)
    val v = version.getOrElse(head)
    require(v >= 0 && v <= head, s"cannot tag v$v (head is v$head)")
    val p = tagPath(rootP, name)
    fs.mkdirs(p.getParent)
    val out =
      try fs.create(p, false)
      catch {
        case _: java.io.IOException =>
          throw new IllegalStateException(
            s"tag '$name' already exists on $table (tags are immutable)")
      }
    try out.write(s"$TagMagic\nversion=$v\n".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    v
  }

  /** All tags as name → version. Torn tag files (no trailing version
    * line) are ignored: the create either wrote fully or the tag does
    * not exist. */
  def tagVersions(spark: SparkSession, table: String): Map[String, Long] = {
    val (fs, rootP) = SnapshotLog.fsOf(spark, table)
    val dir = new Path(rootP, TagsDir)
    if (!fs.exists(dir)) return Map.empty
    fs.listStatus(dir).iterator.filter(_.isFile).flatMap { st =>
      val in = fs.open(st.getPath)
      val body =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      body.split('\n') match {
        case Array(TagMagic, v, _*) if v.startsWith("version=") =>
          scala.util.Try(st.getPath.getName -> v.stripPrefix("version=").toLong).toOption
        case _ => None
      }
    }.toMap
  }

  /** Resolve one tag. */
  def tagVersion(spark: SparkSession, table: String, name: String): Long =
    tagVersions(spark, table).getOrElse(name,
      throw new NoSuchElementException(s"no tag '$name' on $table"))

  /** Read the main table at a tag. */
  def readTag(spark: SparkSession, table: String, name: String): DataFrame =
    SnapshotLog.read(spark, table, Some(tagVersion(spark, table, name)))

  def dropTag(spark: SparkSession, table: String, name: String): Unit = {
    val (fs, rootP) = SnapshotLog.fsOf(spark, table)
    fs.delete(tagPath(rootP, name), false)
  }
}
