package graft.lake

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}

/** Versioned snapshot log for a lake table — time travel, history,
  * rollback, and safe concurrent append on top of immutable data files.
  *
  * The reference has no notion of table versions: a batch dir is
  * overwritten in place and yesterday's data is gone
  * (lakeshack/lakeshack.py writes/reads one live layout). At 100 TB a
  * curation pipeline needs the opposite: reproduce last week's training
  * mix exactly, audit what a merge changed, and roll back a bad ingest
  * without restoring from backup. This module adds that as a
  * Delta-style (public design: Armbrust et al., "Delta Lake:
  * High-Performance ACID Table Storage over Cloud Object Stores",
  * VLDB 2020) manifest log, re-derived from first principles and kept
  * deliberately small:
  *
  *  - data files are IMMUTABLE and live under `<table>/data/<token>/`,
  *    one token per commit (a crashed writer strands at most an orphan
  *    token dir, reclaimed by [[expireOrphans]]);
  *  - each commit is ONE manifest file `_log/v%012d.mf` listing the
  *    files it adds and removes (relative paths — the table can be
  *    relocated wholesale) plus the full schema of the version;
  *  - a snapshot's live set is the replay of manifests up to its
  *    version, seeded from the newest valid CHECKPOINT `≤` it
  *    (`_log/v%012d.cp`, the full live set, written every
  *    [[checkpointInterval]] commits) — so reconstruction cost is
  *    O(interval), not O(commits since creation);
  *  - commit atomicity is an exclusive create of the manifest: atomic
  *    version claim on HDFS via `fs.create(path, overwrite = false)`;
  *    on `file:` via POSIX O_EXCL (hadoop's local create is
  *    check-then-act — see [[tryClaim]]); on an object store without
  *    conditional put, front the log with a lock service (the same
  *    caveat Delta documents for S3) — the seam is exactly
  *    [[tryClaim]]. A writer that dies mid-write leaves a manifest
  *    without its `end=` trailer; the next claim of that version
  *    detects the torn file and — after [[TornReclaimGraceMs]], so a
  *    LIVE claimant's milliseconds-long write window is never raided —
  *    replaces it ([[nextVersionReclaiming]]); readers refuse a torn
  *    manifest with a clear message rather than serving a partial
  *    commit.
  *
  * Concurrency: appends are optimistic-retry (two appends never
  * conflict logically — the loser re-reads the head and re-claims);
  * overwrite / rollback / expire validate the head is still the one
  * they planned against and throw `ConcurrentModificationException`
  * otherwise (lost-update protection). Readers never lock: a version,
  * once committed, is immutable.
  *
  * Scale: a manifest is O(files touched by the commit); a checkpoint is
  * O(live files) but amortized 1/interval; [[state]] lists one log dir
  * and reads interval-many small files — independent of table bytes.
  * The live-set replay is driver-held, same class as the pruning
  * interval map (reference metastore keeps the same thing in an RDBMS).
  */
object SnapshotLog {

  val Magic = "graft-snapshot-v1"
  val DefaultCheckpointInterval = 10

  /** A resolved snapshot: `version`, live data files (relative to the
    * table root), the schema committed at that version, and the
    * deletion vectors attached to each live file (`dvs`: data file →
    * DV parquet files whose (file, pos) rows are dead in it). A file
    * absent from `dvs` has no dead rows. */
  final case class Snapshot(version: Long, files: Seq[String], schemaJson: String,
                            dvs: Map[String, Seq[String]] = Map.empty)

  /** One history entry (see [[history]]). */
  final case class Entry(version: Long, tsMillis: Long, op: String,
                         nAdds: Int, nRemoves: Int, rollbackOf: Option[Long])

  private[lake] def fsOf(spark: SparkSession, table: String): (FileSystem, Path) = {
    val root = new Path(table)
    (root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  /** The root that owns the DATA POOL for a log root. A branch
    * ([[Branches]]) keeps its own `_log` under
    * `<table>/_branches/<name>/` but shares the TABLE's `data/` pool —
    * one immutable file namespace, many refs selecting subsets of it
    * (the public Iceberg ref model). Every file path a manifest stores
    * is relative to this pool root, so a branch manifest and a main
    * manifest describe the same file with the same string and publish
    * is a pure manifest diff — no file ever moves. */
  private[lake] def dataRootOf(root: Path): Path =
    if (root.getParent != null && root.getParent.getName == Branches.BranchesDir)
      root.getParent.getParent
    else root

  private[lake] def isBranchRoot(root: Path): Boolean = dataRootOf(root) != root

  /** The shared `data/` pool a log root commits into. */
  private[lake] def poolDir(root: Path) = new Path(dataRootOf(root), "data")

  private[lake] def logDir(root: Path) = new Path(root, "_log")
  private def manifestPath(root: Path, v: Long) = new Path(logDir(root), f"v$v%012d.mf")
  private def checkpointPath(root: Path, v: Long) = new Path(logDir(root), f"v$v%012d.cp")

  private def enc(s: String) = URLEncoder.encode(s, StandardCharsets.UTF_8.name())
  private def dec(s: String) = URLDecoder.decode(s, StandardCharsets.UTF_8.name())

  // ── manifest format ──────────────────────────────────────────────
  // Line-based, URL-encoded payloads, `end=<adds>,<removes>` trailer as
  // the torn-write detector. No JSON library: the format is six line
  // kinds, and a hand-rolled parser has no escaping corner cases once
  // every variable payload is URL-encoded.

  private def render(e: Entry, schemaJson: String, adds: Seq[String],
                     removes: Seq[String],
                     dvSets: Seq[(String, Seq[String])] = Nil,
                     tokens: Option[Seq[String]] = None): String = {
    val sb = new StringBuilder
    sb.append(Magic).append('\n')
    sb.append("version=").append(e.version).append('\n')
    sb.append("ts=").append(e.tsMillis).append('\n')
    sb.append("op=").append(enc(e.op)).append('\n')
    e.rollbackOf.foreach(v => sb.append("rollbackOf=").append(v).append('\n'))
    sb.append("schema=").append(enc(schemaJson)).append('\n')
    adds.foreach(p => sb.append('+').append(enc(p)).append('\n'))
    removes.foreach(p => sb.append('-').append(enc(p)).append('\n'))
    // `~<file>|<dv>|<dv>…` — REPLACEMENT semantics: the listed DV set
    // becomes the file's whole set at this version (an empty list
    // clears it). Replacement, not append, is what makes rollback and
    // checkpoints one-line replays: the commit states the outcome, the
    // reader never folds deltas.
    dvSets.foreach { case (f, dvs) =>
      sb.append('~').append((f +: dvs).map(enc).mkString("|")).append('\n')
    }
    // `!<token>` — CHECKPOINT-ONLY: the cumulative set of commit tokens
    // any manifest ≤ this version ever referenced (including expired
    // ones — the set is seeded from the previous token-carrying
    // checkpoint, so it survives retention). This is what keeps
    // [[appendBatch]]'s exactly-once skip O(checkpointInterval) instead
    // of O(commits), twice per streaming micro-batch.
    tokens.foreach(_.foreach(t => sb.append('!').append(enc(t)).append('\n')))
    sb.append("end=").append(adds.size).append(',').append(removes.size)
    if (dvSets.nonEmpty || tokens.isDefined) sb.append(',').append(dvSets.size)
    tokens.foreach(ts => sb.append(',').append(ts.size))
    sb.append('\n')
    sb.toString
  }

  private final case class Parsed(entry: Entry, schemaJson: String,
                                  adds: Seq[String], removes: Seq[String],
                                  dvSets: Seq[(String, Seq[String])] = Nil,
                                  tokens: Seq[String] = Nil,
                                  tokensKnown: Boolean = false) {
    /** Every DV parquet file this manifest references. */
    def dvFiles: Seq[String] = dvSets.flatMap(_._2)
  }

  /** Parse a manifest/checkpoint body; None = torn or foreign file. */
  private def parse(body: String): Option[Parsed] = {
    val lines = body.split('\n')
    if (lines.isEmpty || lines.head != Magic) return None
    var version = -1L; var ts = -1L; var op = ""; var rollbackOf: Option[Long] = None
    var schema = ""; val adds = Seq.newBuilder[String]; val removes = Seq.newBuilder[String]
    val dvSets = Seq.newBuilder[(String, Seq[String])]
    val tokens = Seq.newBuilder[String]
    var nA = 0; var nR = 0; var nD = 0; var nT = 0
    var ended = false; var tokensKnown = false
    for (ln <- lines.tail if ln.nonEmpty) {
      if (ended) return None // content after the trailer: torn/garbled
      if (ln.startsWith("version=")) version = ln.stripPrefix("version=").toLong
      else if (ln.startsWith("ts=")) ts = ln.stripPrefix("ts=").toLong
      else if (ln.startsWith("op=")) op = dec(ln.stripPrefix("op="))
      else if (ln.startsWith("rollbackOf=")) rollbackOf = Some(ln.stripPrefix("rollbackOf=").toLong)
      else if (ln.startsWith("schema=")) schema = dec(ln.stripPrefix("schema="))
      else if (ln.startsWith("+")) { adds += dec(ln.tail); nA += 1 }
      else if (ln.startsWith("-")) { removes += dec(ln.tail); nR += 1 }
      else if (ln.startsWith("~")) {
        val parts = ln.tail.split('|')
        if (parts.isEmpty || parts(0).isEmpty) return None
        dvSets += dec(parts(0)) -> parts.tail.toSeq.map(dec); nD += 1
      }
      else if (ln.startsWith("!")) { tokens += dec(ln.tail); nT += 1 }
      else if (ln.startsWith("end=")) {
        val parts = ln.stripPrefix("end=").split(',')
        // 2-field trailer = pre-DV manifest (nD must be 0); 3-field
        // counts the `~` lines too; 4-field (checkpoints) adds the
        // token-set count — its PRESENCE distinguishes "empty token
        // set" from "written before token indexing existed"
        val ok = parts.length match {
          case 2 => parts(0).toInt == nA && parts(1).toInt == nR && nD == 0 && nT == 0
          case 3 => parts(0).toInt == nA && parts(1).toInt == nR &&
            parts(2).toInt == nD && nT == 0
          case 4 => parts(0).toInt == nA && parts(1).toInt == nR &&
            parts(2).toInt == nD && parts(3).toInt == nT
          case _ => false
        }
        if (!ok) return None
        tokensKnown = parts.length == 4
        ended = true
      } else return None
    }
    if (!ended || version < 0 || ts < 0 || op.isEmpty || schema.isEmpty) None
    else Some(Parsed(Entry(version, ts, op, nA, nR, rollbackOf), schema,
      adds.result(), removes.result(), dvSets.result(), tokens.result(), tokensKnown))
  }

  private def readFile(fs: FileSystem, p: Path): String = {
    // Transient-read retry: on a CHECKSUMMED local/NFS filesystem the
    // claim's create-no-overwrite reserves the NAME atomically but the
    // content lands through the open stream, so a reader racing the
    // few-microsecond write window can hit a CRC-lag ChecksumException
    // or a short read — resolved by the writer's close, so retry
    // briefly. Persisting failure (real corruption, dead disks)
    // rethrows loudly; a writer that DIED mid-write leaves consistent
    // checksums for the bytes it flushed, reads fine, and is handled
    // as a torn manifest by `parse`'s magic/trailer checks — this
    // retry never masks that path. Object stores (atomic PUT
    // visibility) never take a retry.
    var attempts = 0
    while (true) {
      try {
        val in = fs.open(p)
        try {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](65536)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          return new String(out.toByteArray, StandardCharsets.UTF_8)
        } finally in.close()
      } catch {
        case e @ (_: org.apache.hadoop.fs.ChecksumException |
                  _: java.io.EOFException) =>
          if (attempts >= 20) throw e
          attempts += 1
          Thread.sleep(25L * attempts)
      }
    }
    "" // unreachable
  }

  /** Atomic version claim — THE commit point of the whole module,
    * dispatched through the [[ClaimStore]] seam: [[PosixExclusiveClaimStore]]
    * (default — O_EXCL name claim + UUID ownership fence on `file:`,
    * plain exclusive create elsewhere) or [[ConditionalPutClaimStore]]
    * (object-store `If-None-Match` semantics: full-body-or-nothing,
    * one winner, no torn manifests), selected by the Hadoop config key
    * `graft.claim.store` so racing DRIVERS resolve the same store with
    * no shared JVM state. Returns false when the version is already
    * claimed. */
  private def tryClaim(fs: FileSystem, p: Path, body: String): Boolean =
    ClaimStore.of(fs).tryClaim(fs, p, body)

  // ── log scanning ─────────────────────────────────────────────────

  private final case class LogListing(manifests: Seq[Long], checkpoints: Seq[Long])

  private def listLog(fs: FileSystem, root: Path): LogListing = {
    val dir = logDir(root)
    if (!fs.exists(dir)) return LogListing(Nil, Nil)
    val st = fs.listStatus(dir)
    def vers(suffix: String) = st.iterator
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(suffix))
      .flatMap(n => scala.util.Try(n.stripPrefix("v").stripSuffix(suffix).toLong).toOption)
      .toSeq.sorted
    LogListing(vers(".mf"), vers(".cp"))
  }

  /** Adjudicate a manifest whose CHECKSUM persistently fails: re-read
    * the raw bytes with CRC verification out of the way. A stale or
    * corrupt `.crc` SIDECAR beside a fully-committed body must read as
    * COMMITTED — classifying it torn would make readers silently serve
    * the previous version and, past the reclaim grace, let the next
    * committer DELETE the committed manifest and reissue its version
    * number (a silent lost commit). The body's own magic/trailer checks
    * in [[parse]] still adjudicate integrity — a writer genuinely dead
    * mid-body parses as torn here too. When the raw body parses, the
    * bad sidecar is REPAIRED (deleted) so future checksummed reads
    * succeed; repair failure is harmless (this path re-adjudicates). */
  private def adjudicateChecksumFailure(fs: FileSystem, p: Path): Option[Parsed] =
    try {
      val body =
        if (fs.getScheme == "file")
          new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(p.toUri.getPath)), StandardCharsets.UTF_8)
        else {
          // a FRESH handle: setVerifyChecksum on the cached instance
          // would race every concurrent reader in the JVM
          val raw = FileSystem.newInstance(p.toUri, fs.getConf)
          try { raw.setVerifyChecksum(false); readFile(raw, p) }
          finally raw.close()
        }
      val parsed = parse(body)
      if (parsed.isDefined) {
        fs match {
          case cfs: org.apache.hadoop.fs.ChecksumFileSystem =>
            try { cfs.getRawFileSystem.delete(cfs.getChecksumFile(p), false); () }
            catch { case _: java.io.IOException => () }
          case _ => ()
        }
      }
      parsed
    } catch { case _: java.io.IOException => None }

  /** Current committed version, or -1 for a table with no log. A torn
    * head manifest (crashed writer) is not a committed version; one
    * whose checksum persistently fails is adjudicated on its RAW bytes
    * ([[adjudicateChecksumFailure]]) — committed when the body parses
    * (a stale .crc must not hide a commit), torn otherwise — so commits
    * can reclaim a genuinely broken head ([[nextVersionReclaiming]])
    * without ever reclaiming a committed one. */
  def currentVersion(spark: SparkSession, table: String): Long = {
    val (fs, root) = fsOf(spark, table)
    val ms = listLog(fs, root).manifests
    ms.reverse.find { v =>
      (try parse(readFile(fs, manifestPath(root, v)))
       catch {
         case _: org.apache.hadoop.fs.ChecksumException =>
           adjudicateChecksumFailure(fs, manifestPath(root, v))
         case _: java.io.EOFException => None
       }).isDefined
    }.getOrElse(-1L)
  }

  /** Next claimable version; deletes a TORN head manifest in passing
    * (a writer died mid-write — its version was never committed, and
    * the claim below would otherwise be blocked forever). Interior torn
    * manifests are impossible by construction (a writer only ever
    * claims head+1) and [[replay]] hard-fails on them. */
  /** Grace before a TORN head manifest is reclaimed: a claimant holds
    * the manifest stream open for milliseconds between winning the
    * name and the content landing, and during that window the file
    * parses as torn — reclaiming it immediately would DELETE a live
    * writer's just-won commit and reissue its version (a silently lost
    * commit; hadoop `create` makes the file visible EMPTY on both
    * file:// and HDFS, so the window is real). Younger-than-grace torn
    * heads throw `ConcurrentModificationException` instead — the
    * retrying-append loops back off past the grace, so a writer that
    * genuinely DIED mid-manifest is still reclaimed within one call. */
  private[lake] val TornReclaimGraceMs = 5000L

  private def nextVersionReclaiming(fs: FileSystem, root: Path): Long = {
    val ms = listLog(fs, root).manifests
    ms.lastOption match {
      case None => 0L
      case Some(last) =>
        val p = manifestPath(root, last)
        // a head manifest whose CHECKSUM still fails after readFile's
        // ~5 s of retries: adjudicate on the RAW bytes first — a stale
        // .crc beside a COMPLETE body is a committed version and must
        // never be reclaimed (a silent lost commit); only a body that
        // itself fails parse (writer died mid-manifest) is TORN,
        // subject to the same reclaim grace below, instead of
        // rethrowing — which would block every future commit until
        // manual cleanup
        val headParsed =
          try parse(readFile(fs, p))
          catch {
            case _: org.apache.hadoop.fs.ChecksumException =>
              adjudicateChecksumFailure(fs, p)
            case _: java.io.EOFException => None
          }
        if (headParsed.isEmpty) {
          val age =
            try System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime
            catch {
              // a concurrent reclaimer deleted it first — the head is
              // moving; let the caller re-plan
              case _: java.io.FileNotFoundException =>
                throw new java.util.ConcurrentModificationException(
                  s"v$last of $root reclaimed by a concurrent committer")
            }
          if (age < TornReclaimGraceMs)
            throw new java.util.ConcurrentModificationException(
              s"v$last of $root is mid-write (torn, ${age}ms old) — " +
                "a concurrent claimant owns it")
          fs.delete(p, false)
          last
        } else last + 1
    }
  }

  /** Resolve the snapshot at `asOf` (default: head). Seeds from the
    * newest VALID checkpoint ≤ target, replays the manifests after it.
    * A torn checkpoint (crashed checkpointer) is skipped — checkpoints
    * are an optimization, never required for correctness. */
  def state(spark: SparkSession, table: String, asOf: Option[Long] = None): Snapshot = {
    val (fs, root) = fsOf(spark, table)
    val listing = listLog(fs, root)
    require(listing.manifests.nonEmpty, s"no snapshot log at $table")
    val head = currentVersion(spark, table)
    require(head >= 0, s"snapshot log at $table has no committed version")
    val target = asOf.getOrElse(head)
    require(target >= 0 && target <= head,
      s"version $target out of range [0, $head] for $table")
    require(listing.manifests.contains(target),
      s"version $target expired from $table (oldest retained: ${listing.manifests.head})")

    val cpSeed: Option[(Long, Parsed)] = listing.checkpoints
      .filter(_ <= target).sorted.reverse.iterator
      .flatMap(v => parse(readFile(fs, checkpointPath(root, v))).map(v -> _))
      .take(1).toSeq.headOption

    val live = scala.collection.mutable.LinkedHashSet[String]()
    val dvs = scala.collection.mutable.LinkedHashMap[String, Seq[String]]()
    var schema = ""
    var from = 0L
    def applyDvSets(sets: Seq[(String, Seq[String])]): Unit = sets.foreach {
      case (f, Nil) => dvs.remove(f)
      case (f, set) => if (live.contains(f)) dvs(f) = set
    }
    cpSeed.foreach { case (v, p) =>
      live ++= p.adds; applyDvSets(p.dvSets); schema = p.schemaJson; from = v + 1
    }
    for (v <- listing.manifests if v >= from && v <= target) {
      val p = parse(readFile(fs, manifestPath(root, v))).getOrElse(
        throw new IllegalStateException(
          s"torn manifest v$v inside the log at $table — log is corrupt"))
      live ++= p.adds
      live --= p.removes
      p.removes.foreach(dvs.remove) // a removed file's dead-row set dies with it
      applyDvSets(p.dvSets)
      schema = p.schemaJson
    }
    Snapshot(target, live.toSeq, schema, dvs.toMap)
  }

  // ── commits ──────────────────────────────────────────────────────

  /** Low-level commit: claim `expected + 1` with the given file deltas.
    * `expected` is the head version the caller planned against
    * (-1 = creating the table); a different head at claim time throws
    * `ConcurrentModificationException`. Returns the committed version. */
  def commit(spark: SparkSession, table: String, op: String,
             adds: Seq[String], removes: Seq[String], schemaJson: String,
             expected: Long, rollbackOf: Option[Long] = None,
             dvSets: Seq[(String, Seq[String])] = Nil,
             checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    val (fs, root) = fsOf(spark, table)
    fs.mkdirs(logDir(root))
    val next = nextVersionReclaiming(fs, root)
    if (next != expected + 1)
      throw new java.util.ConcurrentModificationException(
        s"$table moved to v${next - 1} (planned against v$expected)")
    val e = Entry(next, System.currentTimeMillis(), op, adds.size, removes.size, rollbackOf)
    if (!tryClaim(fs, manifestPath(root, next), render(e, schemaJson, adds, removes, dvSets)))
      throw new java.util.ConcurrentModificationException(
        s"lost the claim race for v$next of $table")
    maybeCheckpoint(spark, fs, root, table, next, checkpointInterval)
    autoIndexBloomSidecars(spark, fs, root, adds)
    autoCollectAggStats(spark, fs, root, adds)
    next
  }

  /** AUTO-MAINTENANCE of SUM sidecars, the [[autoIndexBloomSidecars]]
    * twin: after any commit that adds data files, append (sum, count)
    * rows for exactly those files to every column sidecar the table
    * carries — `CALL collect_agg_stats` is a one-time decision, not a
    * re-CALL treadmill. Without this every appended or compacted file
    * is absent from the sidecar: never served wrongly (the rewrite
    * degrades it to scanned — sound) but the SUM shortcut silently
    * decays under continuous ingest. ONE column-pruned pass over the
    * BATCH covers every collected column (a K-column table pays one
    * job, not K — the per-column loop re-read the same files K times);
    * a unique delta dir per commit (two concurrent committers must not
    * share a parquet dir's staging). Best-effort: the manifest claim
    * already landed, so a failure here costs only freshness, never the
    * commit. Delta-dir creep is folded by [[maybeFoldAggStats]].
    * Disable with `spark.graft.aggstats.autoCollect = false`. */
  private def autoCollectAggStats(spark: SparkSession, fs: FileSystem,
                                  root: Path, adds: Seq[String]): Unit = {
    if (adds.isEmpty) return
    try {
      if (!spark.conf.get("spark.graft.aggstats.autoCollect", "true").toBoolean) return
      val statsRoot = new Path(logDir(root).getParent, "_aggstats")
      if (!fs.exists(statsRoot)) return
      val colDirs = fs.listStatus(statsRoot).toSeq.filter(_.isDirectory)
      if (colDirs.isEmpty) return
      val abs = adds.map(f => fs.makeQualified(new Path(dataRootOf(root), f)).toString)
      import org.apache.spark.sql.functions.{col => c, coalesce, count, lit, sum}
      val batch = spark.read.option("ignoreMissingFiles", "true").parquet(abs: _*)
      val columns = colDirs.map(_.getPath.getName).filter(n =>
        batch.columns.contains(n) && aggStatsIntegral.contains(batch.schema(n).dataType))
      if (columns.isEmpty) return
      // one fused pass: per-file (exact decimal sum, non-null count)
      // for ALL collected columns — see [[collectAggStats]] for the
      // eval-mode-independence argument behind the decimal sums
      val aggs = columns.zipWithIndex.flatMap { case (n, i) => Seq(
        sum(c(n).cast(aggStatsSumType)).as(s"_s$i"), count(c(n)).as(s"_c$i")) }
      val computed = batch
        .select(c("_metadata.file_path").as("filepath") +: columns.map(c(_)): _*)
        .groupBy("filepath")
        .agg(aggs.head, aggs.tail: _*)
      // zero-row adds produce no group: left-join the full list so
      // every added file lands a row (null sum, 0 count). Persisted:
      // K delta writes below must not re-run the batch pass K times
      // (the frame is one row per added file — metadata-sized).
      val all = spark.createDataFrame(
        spark.sparkContext.parallelize(abs.map(Row(_)),
          math.max(1, abs.size / 20000)),
        StructType(Seq(StructField("filepath", StringType, nullable = false))))
        .join(computed, Seq("filepath"), "left")
        .persist()
      try {
        columns.zipWithIndex.foreach { case (n, i) =>
          val cd = new Path(statsRoot, n)
          aggStatsRows(all.select(c("filepath"), c(s"_s$i").as("sum_dec"),
              coalesce(c(s"_c$i"), lit(0L)).as("cnt")))
            .write.mode("errorifexists").parquet(new Path(cd,
              "delta-" + java.util.UUID.randomUUID().toString.take(12)).toString)
          maybeFoldAggStats(spark, fs, cd)
        }
      } finally all.unpersist()
    } catch { case e: Exception =>
      MetastoreFileIndex.log.warn(
        s"agg-stats sidecar auto-collect failed for $root (serving stays sound, " +
          s"the SUM shortcut decays to scanning new files): ${e.getMessage}")
    }
  }

  /** Decimal accumulator type for sidecar collects: wide enough that a
    * per-file sum of longs can never overflow it in practice (10^38 ≥
    * 2^63 · any feasible row count), so the collected sum is EXACT
    * regardless of the collecting session's eval mode — a LEGACY
    * session can no longer store a silently WRAPPED per-file sum that
    * an ANSI query would then serve where the stock plan raises
    * ARITHMETIC_OVERFLOW. */
  private[lake] val aggStatsSumType = org.apache.spark.sql.types.DecimalType(38, 0)

  /** Final projection of a sidecar delta: `(filepath, sum_dec, cnt)` →
    * `(filepath, sum_v: long, cnt)`. A file whose exact sum falls
    * OUTSIDE long range gets NO row (it degrades to scanned, where the
    * stock plan's own semantics — ANSI overflow error or legacy wrap —
    * apply); genuinely empty/all-null files keep their (null, 0) row.
    * The in-range guard runs before the long cast, so the cast itself
    * can never overflow under either eval mode. */
  private def aggStatsRows(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col => c, lit}
    df.where(c("cnt") === 0L || (c("sum_dec").isNotNull &&
        c("sum_dec") >= lit(Long.MinValue) && c("sum_dec") <= lit(Long.MaxValue)))
      .select(c("filepath"),
        c("sum_dec").cast(org.apache.spark.sql.types.LongType).as("sum_v"), c("cnt"))
  }

  /** SELF-COMPACTION of a SUM sidecar, the [[maybeFoldBloomDeltas]]
    * twin: past `spark.graft.aggstats.maxDeltaDirs` (default 64) delta
    * dirs, fold the tree into ONE dir and delete the captured inputs.
    * Duplicate filepath rows collapse on read (files are immutable, any
    * copy is the right copy); a racer's delta landing after the listing
    * capture survives untouched. */
  private def maybeFoldAggStats(spark: SparkSession, fs: FileSystem,
                                colDir: Path): Unit = {
    val maxDirs = spark.conf.get("spark.graft.aggstats.maxDeltaDirs", "64").toInt
    val captured = fs.listStatus(colDir).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_"))
    if (captured.size <= maxDirs) return
    val folded = spark.read.option("recursiveFileLookup", "true")
      .option("ignoreMissingFiles", "true")
      .parquet(captured.map(_.getPath.toString): _*)
      .dropDuplicates("filepath")
    folded.write.mode("errorifexists").parquet(new Path(colDir,
      "delta-" + java.util.UUID.randomUUID().toString.take(12)).toString)
    captured.foreach(st => fs.delete(st.getPath, true))
  }

  /** AUTO-MAINTENANCE of Bloom sidecars: after any commit that adds
    * data files, append sidecar rows for exactly those files to every
    * column sidecar the table carries — one distributed pass over the
    * BATCH per indexed column, so `CALL build_bloom` is a one-time
    * layout decision instead of a manual re-CALL treadmill. Without
    * this, every file appended (or produced by `compact`/`compactBin`)
    * after the build is absent from the sidecar: it is never pruned
    * (sound) but every point probe pays its scan forever, an invisible
    * perf decay under continuous ingest. Delta rows land under
    * `_bloom/<col>/delta-<id>/` — a UNIQUE dir per commit, because two
    * concurrent committers appending into one parquet dir would race
    * each other's `_temporary` staging — and [[bloomFor]] reads the
    * tree recursively with the same geometry (m, k) as the base build
    * (read from the sidecar's own rows). Rows for files a compaction
    * REMOVED stay behind as harmless orphans (pruning intersects the
    * LIVE candidate list; a full `buildBloom` clears them).
    *
    * Best-effort by design: the manifest claim has already landed, so
    * a failure here costs pruning freshness — visible in the
    * probed-but-unindexed telemetry
    * ([[SnapshotFileIndex.bloomUnindexedProbes]]) — never the commit.
    * Disable with `spark.graft.bloom.autoIndex = false`. */
  /** JVM-local amortization state for [[autoIndexBloomSidecars]]:
    * pool-relative adds DEFERRED past a commit, per qualified bloom
    * root — (commits since last build, accumulated adds). Deliberately
    * not persisted: a crashed writer's pending files simply stay
    * unindexed (probe-side may-contain: never pruned, always scanned —
    * sound), and the next full build or bin-compaction re-covers them. */
  private val bloomPendingAdds =
    new scala.collection.concurrent.TrieMap[String, (Int, Vector[String])]

  /** Sidecar geometry, persisted as the tiny `_geometry` metadata file
    * (`column,m,k`) beside the filter parquet — ONE small read per
    * commit instead of the Spark job head(1) costs. Underscore names
    * are invisible to the parquet reads and exempt from fold deletes.
    * Read fresh each time (never JVM-cached): a full rebuild may
    * re-size m to the new data volume, and a stale cached geometry
    * would append deltas whose bit positions don't match the base. */
  private def bloomGeometryOf(spark: SparkSession, fs: FileSystem,
                              colDir: Path): Option[(String, Int, Int)] = {
    val gp = new Path(colDir, "_geometry")
    val viaFile =
      try {
        if (!fs.exists(gp)) None
        else readFile(fs, gp).trim.split(',') match {
          case Array(c, m, k) => Some((c, m.toInt, k.toInt))
          case _ => None
        }
      } catch { case _: Exception => None }
    viaFile.orElse {
      val headRows = spark.read.option("recursiveFileLookup", "true")
        .option("ignoreMissingFiles", "true").parquet(colDir.toString)
        .select("colname", "m", "k").head(1)
      if (headRows.isEmpty) None
      else {
        val g = (headRows.head.getString(0), headRows.head.getInt(1),
          headRows.head.getInt(2))
        writeBloomGeometry(fs, colDir, g._1, g._2, g._3, overwrite = false)
        Some(g)
      }
    }
  }

  private def writeBloomGeometry(fs: FileSystem, colDir: Path, column: String,
                                 m: Int, k: Int, overwrite: Boolean): Unit =
    try {
      val out = fs.create(new Path(colDir, "_geometry"), overwrite)
      try out.write(s"$column,$m,$k".getBytes(StandardCharsets.UTF_8))
      finally out.close()
    } catch { case _: java.io.IOException => () } // best-effort cache

  private def autoIndexBloomSidecars(spark: SparkSession, fs: FileSystem,
                                     root: Path, adds: Seq[String]): Unit = {
    if (adds.isEmpty) return
    try {
      if (!spark.conf.get("spark.graft.bloom.autoIndex", "true").toBoolean) return
      // the same root anchor as [[bloomDir]] (branch logs keep their
      // own sidecars beside their own _log)
      val bloomRoot = new Path(logDir(root).getParent, "_bloom")
      if (!fs.exists(bloomRoot)) return
      val colDirs = fs.listStatus(bloomRoot).toSeq.filter(_.isDirectory)
      if (colDirs.isEmpty) return
      // ── amortization (streaming micro-batch ingest): the delta build
      // is several Spark jobs ON THE COMMIT CRITICAL PATH, so a table
      // can defer it — everyCommits > 1 batches up to N commits' adds
      // into one build; minBytes defers further until the accumulated
      // batch is worth a job. Deferred files are merely UNINDEXED
      // (never pruned — sound); a crash forfeits only this JVM's
      // pending list. Defaults (1, 0) keep the index exactly fresh.
      val everyN = spark.conf.get("spark.graft.bloom.autoIndex.everyCommits", "1").toInt
      val minBytes = spark.conf.get("spark.graft.bloom.autoIndex.minBytes", "0").toLong
      val key = fs.makeQualified(bloomRoot).toString
      val (prevCommits, prevAdds) = bloomPendingAdds.getOrElse(key, (0, Vector.empty[String]))
      val batchRel = (prevAdds ++ adds).distinct
      val absOf = (f: String) => fs.makeQualified(new Path(dataRootOf(root), f)).toString
      if (everyN > 1 || minBytes > 0) {
        val commits = prevCommits + 1
        // trigger on EITHER rule: N commits reached, or (when a byte
        // floor is configured) the accumulated batch crossed it early
        val bytesReady = minBytes > 0 && {
          val sz = batchRel.map(f =>
            try fs.getFileStatus(new Path(absOf(f))).getLen
            catch { case _: java.io.IOException => 0L }).sum
          sz >= minBytes
        }
        if (commits < everyN && !bytesReady) {
          bloomPendingAdds.put(key, (commits, batchRel))
          return
        }
        bloomPendingAdds.remove(key)
      }
      val abs = batchRel.map(absOf)
      for (cd <- colDirs) {
        bloomGeometryOf(spark, fs, cd.getPath).foreach { case (column, m, k) =>
          val batch = spark.read.option("ignoreMissingFiles", "true").parquet(abs: _*)
          if (batch.columns.contains(column)) {
            BloomIndex.buildFromWith(batch, column, m, k)
              .write.mode("errorifexists").parquet(new Path(cd.getPath,
                "delta-" + java.util.UUID.randomUUID().toString.take(12)).toString)
            maybeFoldBloomDeltas(spark, fs, cd.getPath)
          }
        }
      }
    } catch { case e: Exception =>
      MetastoreFileIndex.log.warn(
        s"bloom sidecar auto-index failed for $root (pruning stays sound, " +
          s"freshness decays — see bloomUnindexedProbes): ${e.getMessage}")
    }
  }

  /** SELF-COMPACTION of a column sidecar: once the delta-dir count
    * crosses `spark.graft.bloom.maxDeltaDirs` (default 64), fold the
    * whole tree — base + deltas — into ONE fresh delta dir and delete
    * the folded inputs. Without this a streaming table accrues one tiny
    * dir per commit forever and the first probe of every session pays
    * an O(commits) listing + tiny-file read. Amortized O(sidecar bytes)
    * once per threshold commits. Duplicate filepath rows (a fold racing
    * an append) collapse — a file's filter is deterministic for its
    * life, so any copy is the right copy. Concurrency: the pre-read
    * LISTING is the delete set, so a racer's delta landing after the
    * capture survives untouched; a concurrent READER mid-fold can see
    * duplicates (harmless) or, in the worst case, lose a just-deleted
    * file mid-scan and fail that one query (the same transient
    * `buildBloom`'s full rebuild already has — retry reads it fresh). */
  private def maybeFoldBloomDeltas(spark: SparkSession, fs: FileSystem,
                                   colDir: Path): Unit = {
    val maxDeltas = spark.conf.get("spark.graft.bloom.maxDeltaDirs", "64").toInt
    val entries = fs.listStatus(colDir)
    val deltaDirs = entries.filter(st => st.isDirectory &&
      st.getPath.getName.startsWith("delta-"))
    if (deltaDirs.length <= maxDeltas) return
    val captured = entries.map(_.getPath.getName).toSet // the delete set
    val all = spark.read.option("recursiveFileLookup", "true")
      .option("ignoreMissingFiles", "true") // a concurrent fold's deletes
      .parquet(colDir.toString)
      .dropDuplicates("filepath")
    val foldDir = new Path(colDir,
      "delta-fold-" + java.util.UUID.randomUUID().toString.take(12))
    all.write.mode("errorifexists").parquet(foldDir.toString)
    // underscore names ( _geometry ) are metadata, not folded inputs
    for (name <- captured if name != foldDir.getName && !name.startsWith("_"))
      fs.delete(new Path(colDir, name), true)
    MetastoreFileIndex.log.info(
      s"bloom sidecar folded: ${deltaDirs.length} delta dirs -> 1 at $colDir")
  }

  /** Write a checkpoint when the version lands on the interval. Crash
    * here is harmless (readers validate + skip); a later commit on the
    * same version number cannot exist, so no claim conflict. The
    * checkpoint carries the CUMULATIVE referenced-token set (seeded
    * from the previous token-carrying checkpoint, so O(interval) to
    * compute) — [[appendBatch]]'s exactly-once skip reads it instead of
    * re-parsing every retained manifest. */
  private def maybeCheckpoint(spark: SparkSession, fs: FileSystem, root: Path,
                              table: String, v: Long, interval: Int): Unit =
    if (interval > 0 && v > 0 && v % interval == 0) {
      val snap = state(spark, table, Some(v))
      val tokens = tokenSetAt(fs, root, Some(v)).toSeq.sorted
      val e = Entry(v, System.currentTimeMillis(), "checkpoint", snap.files.size, 0, None)
      tryClaim(fs, checkpointPath(root, v),
        render(e, snap.schemaJson, snap.files, Nil, snap.dvs.toSeq,
          tokens = Some(tokens)))
    }

  /** The commit token a pool-relative path belongs to. */
  private def tokenOf(path: String): Option[String] = path.split('/') match {
    case Array("data", tok, _*) => Some(tok)
    case _ => None
  }

  /** Diagnostic: manifests parsed by [[tokenSetAt]] since JVM start —
    * the spec pins appendBatch's per-batch log reads to
    * O(checkpointInterval) on a long log. */
  private[lake] val tokenScanManifestReads = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Every commit token any manifest with version ≤ `upTo` (default:
    * all) references — INCLUDING manifests already dropped by
    * [[expire]], via the cumulative checkpoint token set. Seeds from
    * the newest token-carrying checkpoint ≤ `upTo` and parses only the
    * manifests after it: O(checkpointInterval) steady-state. Falls back
    * to the full retained-manifest scan when no checkpoint carries
    * tokens yet (a log written before token indexing). */
  private def tokenSetAt(fs: FileSystem, root: Path,
                         upTo: Option[Long] = None): Set[String] = {
    val listing = listLog(fs, root)
    val bound = upTo.getOrElse(Long.MaxValue)
    val seed = listing.checkpoints.filter(_ <= bound).sorted.reverse.iterator
      .flatMap(cv => parse(readFile(fs, checkpointPath(root, cv)))
        .filter(_.tokensKnown).map(cv -> _))
      .take(1).toSeq.headOption
    val (from, base) = seed match {
      case Some((cv, p)) => (cv + 1, p.tokens.toSet)
      case None => (Long.MinValue, Set.empty[String])
    }
    base ++ listing.manifests.filter(v => v >= from && v <= bound).flatMap { v =>
      tokenScanManifestReads.incrementAndGet()
      parse(readFile(fs, manifestPath(root, v))).toSeq
        .flatMap(p => p.adds ++ p.removes ++ p.dvFiles)
    }.flatMap(tokenOf)
  }

  /** Append retry loop: re-read the head and re-claim — two appends
    * never logically conflict, so losing a claim race is not an error.
    * `schemaFor` re-resolves the committed schema against the head seen
    * by EACH attempt, so a concurrent schema evolution is never
    * clobbered by a stale pre-race resolution. */
  private def retryingAppend(spark: SparkSession, table: String, op: String,
                             adds: Seq[String], schemaFor: Long => String,
                             checkpointInterval: Int): Long = {
    var attempts = 0
    while (true) {
      val head = currentVersion(spark, table)
      try return commit(spark, table, op, adds, Nil, schemaFor(head), head,
        checkpointInterval = checkpointInterval)
      catch {
        case _: java.util.ConcurrentModificationException if attempts < 30 =>
          // backoff past TornReclaimGraceMs in the worst case, so a
          // dead writer's torn head self-heals within one call; the
          // common claim-race retry stays tens of ms
          attempts += 1; Thread.sleep(25L * math.min(attempts, 10))
      }
    }
    -1L // unreachable
  }

  /** List the `.parquet` files Spark materialized under a commit token
    * dir, as table-relative paths. */
  private def partFiles(fs: FileSystem, root: Path, tokenDir: Path): Seq[String] = {
    val prefix = dataRootOf(root).toUri.getPath match {
      case p if p.endsWith("/") => p; case p => p + "/" }
    val it = fs.listFiles(tokenDir, true)
    val buf = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
        val abs = f.getPath.toUri.getPath
        require(abs.startsWith(prefix), s"$abs escaped table root $prefix")
        buf += abs.stripPrefix(prefix)
      }
    }
    buf.result()
  }

  /** The schema an APPEND commits, validated against the table's head
    * schema by (name, type) — nullability and metadata are ignored
    * (parquet round-trips relax nullability; that is not evolution).
    *
    * Strict mode (`mergeSchema = false`): the batch must carry exactly
    * the head's columns (any order) with matching types; the HEAD
    * schema is re-committed so column order never drifts. A mismatch
    * throws instead of silently flipping the table's schema.
    *
    * Evolution mode (`mergeSchema = true`): common columns must match
    * types; batch-only columns are APPENDED to the head schema as
    * nullable (old files read them as null — the parquet reader
    * null-fills missing columns); head-only columns the batch lacks are
    * kept (the new files read them as null). Type changes are never
    * merged. */
  private def resolveAppendSchema(head: StructType, batch: StructType,
                                  mergeSchema: Boolean): StructType = {
    val headByName = head.fields.map(f => f.name -> f).toMap
    for (bf <- batch.fields; hf <- headByName.get(bf.name))
      require(hf.dataType == bf.dataType,
        s"column '${bf.name}': batch type ${bf.dataType.simpleString} != " +
          s"table type ${hf.dataType.simpleString} — type changes cannot be appended")
    if (!mergeSchema) {
      val missing = head.fieldNames.toSet -- batch.fieldNames.toSet
      val extra = batch.fieldNames.toSet -- head.fieldNames.toSet
      require(missing.isEmpty && extra.isEmpty,
        s"append schema mismatch (missing=$missing, extra=$extra) — pass " +
          "mergeSchema = true to evolve the table")
      head
    } else {
      val newCols = batch.fields.filterNot(f => headByName.contains(f.name))
        .map(_.copy(nullable = true))
      StructType(head.fields ++ newCols)
    }
  }

  /** Materialize `df` as a new commit. `mode` is `"append"` or
    * `"overwrite"`; pass `clusterColumn` to range-cluster the files so
    * zone-map pruning works on the snapshot (same recipe as
    * [[ClusteredWriter]]). Returns the committed version.
    *
    * Appends validate against the head schema ([[resolveAppendSchema]]);
    * `mergeSchema = true` evolves it by appending new nullable columns.
    * `opLabel` overrides the manifest op string (consumers like
    * [[IncrementalView]] persist their cursor there); file semantics
    * stay those of `mode`.
    *
    * The data write happens BEFORE any claim, into a fresh token dir —
    * heavy I/O runs unlocked, the commit itself is one small file. An
    * overwrite that loses its claim race throws and strands its token
    * dir as an orphan ([[expireOrphans]] reclaims it); it never
    * half-applies. */
  def write(df: DataFrame, table: String, mode: String = "append",
            clusterColumn: Option[String] = None, nFiles: Int = 8,
            checkpointInterval: Int = DefaultCheckpointInterval,
            mergeSchema: Boolean = false, opLabel: Option[String] = None): Long = {
    require(mode == "append" || mode == "overwrite", s"unknown mode '$mode'")
    val spark = df.sparkSession
    val (fs, root) = fsOf(spark, table)
    val planned = if (mode == "overwrite" && fs.exists(logDir(root)) &&
      listLog(fs, root).manifests.nonEmpty) {
      val head = currentVersion(spark, table)
      if (head >= 0) Some(head -> state(spark, table, Some(head)).files) else None
    } else None

    val token = java.util.UUID.randomUUID().toString.take(12)
    val tokenDir = new Path(poolDir(root), token)
    val shaped = clusterColumn match {
      case Some(c) => df.repartitionByRange(nFiles, org.apache.spark.sql.functions.col(c))
        .sortWithinPartitions(c)
      case None => df
    }
    shaped.write.mode("errorifexists").parquet(tokenDir.toString)
    val adds = partFiles(fs, root, tokenDir)

    mode match {
      case "append" =>
        def schemaFor(head: Long): String =
          if (head >= 0) {
            val headSchema = DataType.fromJson(state(spark, table, Some(head))
              .schemaJson).asInstanceOf[StructType]
            resolveAppendSchema(headSchema, df.schema, mergeSchema).json
          } else df.schema.json
        retryingAppend(spark, table, opLabel.getOrElse("append"), adds, schemaFor,
          checkpointInterval)
      case "overwrite" =>
        val (expected, removes) = planned match {
          case Some((head, files)) => (head, files)
          case None => (currentVersion(spark, table), Nil)
        }
        commit(spark, table, opLabel.getOrElse("overwrite"), adds, removes,
          df.schema.json, expected, checkpointInterval = checkpointInterval)
    }
  }

  /** Commit the parquet files a DSv2 writer already materialized under
    * a pool token dir — the manifest half of the SQL write path
    * ([[SnapshotCatalog]] `INSERT INTO` / `INSERT OVERWRITE`): executors
    * wrote the data through Spark's stock parquet `BatchWrite`, and this
    * runs at `BatchWrite.commit` time on the driver, so the version
    * claim IS the query's commit point — an aborted INSERT strands at
    * most an orphan token dir ([[expireOrphans]] reclaims it), never a
    * half-visible table. Appends validate strictly against the head
    * schema (evolve via [[write]](mergeSchema = true) first). */
  private[lake] def commitWrittenToken(spark: SparkSession, table: String,
      tokenDir: Path, overwrite: Boolean, batchSchema: StructType,
      checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    val (fs, root) = fsOf(spark, table)
    val adds = partFiles(fs, root, tokenDir)
    if (overwrite) {
      val head = currentVersion(spark, table)
      val removes = if (head >= 0) state(spark, table, Some(head)).files else Nil
      commit(spark, table, "overwrite", adds, removes, batchSchema.json, head,
        checkpointInterval = checkpointInterval)
    } else {
      def schemaFor(head: Long): String =
        if (head >= 0) {
          val hs = DataType.fromJson(state(spark, table, Some(head)).schemaJson)
            .asInstanceOf[StructType]
          resolveAppendSchema(hs, batchSchema, mergeSchema = false).json
        } else batchSchema.json
      retryingAppend(spark, table, "append", adds, schemaFor, checkpointInterval)
    }
  }

  /** TRUNCATE: one metadata-only commit restating an empty live set —
    * O(1) regardless of table size, history stays time-travelable
    * below it (the rows come back with `rollback`). Lost-update safe
    * like every overwrite. */
  def truncate(spark: SparkSession, table: String,
               checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    val head = currentVersion(spark, table)
    require(head >= 0, s"no snapshot table at $table")
    val cur = state(spark, table, Some(head))
    commit(spark, table, "overwrite", Nil, cur.files, cur.schemaJson, head,
      checkpointInterval = checkpointInterval)
  }

  /** Exactly-once commit of a STREAMING epoch whose parquet files
    * Spark's stock writers already materialized under `stagedDir` (a
    * random pool staging dir — the epoch number is unknown at factory
    * creation, so staging is anonymous and the DETERMINISTIC name
    * arrives here): the staged dir is renamed to the epoch token and
    * claimed as one append. Replay safety, the [[appendBatch]]
    * contract: a token any manifest already references commits nothing
    * (the restarted query's re-run of a committed epoch deletes its
    * staging and walks away); a torn rename target from a crashed
    * attempt is unreferenced by definition and is replaced. */
  private[graft] def commitStreamEpoch(spark: SparkSession, table: String,
      stagedDir: Path, streamToken: String, batchSchema: StructType,
      checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    require(streamToken.nonEmpty && !streamToken.contains('/'),
      s"bad stream token '$streamToken'")
    val (fs, root) = fsOf(spark, table)
    if (tokensReferenced(fs, root).contains(streamToken)) {
      fs.delete(stagedDir, true)
      return -1L
    }
    val target = new Path(poolDir(root), streamToken)
    if (fs.exists(target)) fs.delete(target, true) // torn prior attempt
    require(fs.rename(stagedDir, target),
      s"rename $stagedDir -> $target failed (concurrent duplicate epoch writer?)")
    val adds = partFiles(fs, root, target)
    var attempts = 0
    while (true) {
      if (tokensReferenced(fs, root).contains(streamToken)) return -1L
      val head = currentVersion(spark, table)
      val schemaJson =
        if (head >= 0) {
          val hs = DataType.fromJson(state(spark, table, Some(head)).schemaJson)
            .asInstanceOf[StructType]
          resolveAppendSchema(hs, batchSchema, mergeSchema = false).json
        } else batchSchema.json
      // zombie fence: a dead driver's replay of the SAME epoch runs the
      // torn-prior-attempt cleanup above (delete + rename of the token
      // dir) unsynchronized with this live writer — if it replaced the
      // dir after `partFiles` listed our adds, committing them would
      // reference deleted files. Re-verify existence immediately before
      // the claim and fail the epoch loudly instead (the replayer's own
      // commit of the re-staged dir carries the rows).
      val missing = adds.filterNot(a => fs.exists(new Path(dataRootOf(root), a)))
      if (missing.nonEmpty) throw new IllegalStateException(
        s"epoch token dir $target was replaced mid-commit " +
          s"(${missing.size} staged file(s) vanished, e.g. ${missing.head}) — " +
          "a concurrent replay of this epoch raced this writer; failing the " +
          "epoch rather than committing dangling references")
      try return commit(spark, table, "append", adds, Nil, schemaJson, head,
        checkpointInterval = checkpointInterval)
      catch {
        case _: java.util.ConcurrentModificationException if attempts < 30 =>
          // backoff past TornReclaimGraceMs in the worst case, so a
          // dead writer's torn head self-heals within one call; the
          // common claim-race retry stays tens of ms
          attempts += 1; Thread.sleep(25L * math.min(attempts, 10))
      }
    }
    -1L // unreachable
  }

  /** Metadata-only SCHEMA EVOLUTION commit: append new nullable columns
    * to the head schema without touching one data file — the `ALTER
    * TABLE ADD COLUMNS` half of [[write]]`(mergeSchema = true)` (which
    * evolves-and-appends in one commit; this evolves alone, so a SQL
    * user can ALTER then INSERT). Every existing file reads the new
    * columns as null (the parquet reader null-fills missing columns —
    * the same contract `lake_schema_evo` pins), live files and deletion
    * vectors carry over untouched, and time travel below the commit
    * still reads the OLD schema. Duplicate or nested names are refused;
    * columns are forced nullable (rows already committed have no value
    * to give a NOT NULL column). The reference re-validates schemas
    * column-by-column on reconnect (lakeshack/metastore.py:128-204);
    * here evolution is an explicit, versioned commit instead. */
  def addColumns(spark: SparkSession, table: String,
                 cols: Seq[StructField],
                 checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    require(cols.nonEmpty, "ALTER TABLE ADD COLUMNS with no columns")
    val head = currentVersion(spark, table)
    require(head >= 0, s"no snapshot table at $table")
    val cur = state(spark, table, Some(head))
    val schema = DataType.fromJson(cur.schemaJson).asInstanceOf[StructType]
    cols.foreach(f => require(!schema.fieldNames.contains(f.name),
      s"column '${f.name}' already exists in $table"))
    require(cols.map(_.name).distinct.size == cols.size,
      s"duplicate column names in ADD COLUMNS: ${cols.map(_.name).mkString(", ")}")
    val evolved = StructType(schema.fields ++ cols.map(_.copy(nullable = true)))
    commit(spark, table, "evolve_schema", adds = Nil, removes = Nil,
      schemaJson = evolved.json, expected = head,
      checkpointInterval = checkpointInterval)
  }

  /** Manifest delta of ONE committed version: (op, added files,
    * n_removes, n_dvSets) — the streaming source's per-version planning
    * handle (O(1): one small manifest read, no data touched). Throws a
    * clear error when the version expired below the retention horizon
    * (a lagging stream must restart from current state, never silently
    * skip). */
  private[lake] def versionDelta(spark: SparkSession, table: String,
                                 v: Long): (String, Seq[String], Int, Int) = {
    val (fs, root) = fsOf(spark, table)
    val mp = manifestPath(root, v)
    if (!fs.exists(mp)) throw new IllegalStateException(
      s"version $v of $table expired below the retention horizon — " +
        "restart the stream from the table's current state")
    val p = parse(readFile(fs, mp)).getOrElse(
      throw new IllegalStateException(s"torn manifest v$v at $table"))
    (p.entry.op, p.adds, p.removes.size, p.dvSets.size)
  }

  /** Create an EMPTY table at v0 with the given schema — the catalog's
    * `CREATE TABLE` half (CTAS then appends into it). Fails if the
    * table already has a log. */
  private[lake] def createEmpty(spark: SparkSession, table: String,
                                schemaJson: String): Long = {
    require(currentVersion(spark, table) < 0, s"table already exists at $table")
    commit(spark, table, "create", Nil, Nil, schemaJson, expected = -1L)
  }

  // ── declared layout: CLUSTER BY ──────────────────────────────────
  // The table's declared cluster columns, stored as a side file
  // `_log/_cluster` (a layout PREFERENCE like Iceberg's sort order,
  // not data semantics — so it lives beside the log, not inside the
  // versioned manifests). The SQL write path reads it to request a
  // range distribution + sort from Spark (`RequiresDistributionAndOrdering`),
  // so plain `INSERT INTO` keeps producing zone-map-disjoint files —
  // without it, every SQL insert of shuffled rows writes overlapping
  // ranges and pruning decays until the next OPTIMIZE.
  private val ClusterMagic = "graft-cluster-v1"

  def setClusterBy(spark: SparkSession, table: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty && cols.forall(_.nonEmpty), "cluster columns must be non-empty")
    val (fs, rootP) = fsOf(spark, table)
    val p = new Path(logDir(rootP), "_cluster")
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(s"$ClusterMagic\n${cols.mkString(",")}\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The declared cluster columns, or Nil. Torn/missing files read as
    * Nil (unclustered) — never an error on the write path. */
  def clusterByOf(spark: SparkSession, table: String): Seq[String] = {
    val (fs, rootP) = fsOf(spark, table)
    val p = new Path(logDir(rootP), "_cluster")
    if (!fs.exists(p)) return Nil
    val lines = readFile(fs, p).split('\n')
    if (lines.length >= 2 && lines(0) == ClusterMagic)
      lines(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    else Nil
  }

  /** Exactly-once APPEND for streaming/retried writers: the caller
    * names the batch (e.g. `s"batch-$batchId"` from foreachBatch), the
    * name becomes the token dir, and a batch whose token any manifest
    * already references is SKIPPED — a crashed micro-batch re-runs to
    * the same token, so replay commits nothing twice. Returns the
    * committed version, or -1 when the batch was already applied.
    *
    * A crash AFTER the data write but BEFORE the commit leaves a
    * complete token dir that the retry re-writes (overwrite of an
    * uncommitted dir — safe, nothing references it) and then commits.
    * A token must never be reused for different data: the skip is
    * keyed on the name alone. */
  def appendBatch(df: DataFrame, table: String, batchToken: String,
                  clusterColumn: Option[String] = None, nFiles: Int = 8,
                  checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    require(batchToken.nonEmpty && !batchToken.contains('/'),
      s"bad batch token '$batchToken'")
    val spark = df.sparkSession
    val (fs, root) = fsOf(spark, table)
    if (tokensReferenced(fs, root).contains(batchToken)) return -1L
    val tokenDir = new Path(poolDir(root), batchToken)
    val shaped = clusterColumn match {
      case Some(c) => df.repartitionByRange(nFiles, org.apache.spark.sql.functions.col(c))
        .sortWithinPartitions(c)
      case None => df
    }
    shaped.write.mode("overwrite").parquet(tokenDir.toString)
    val adds = partFiles(fs, root, tokenDir)
    // the claim race can interleave a concurrent writer committing the
    // SAME token (e.g. a zombie retry): re-check inside the retry loop
    var attempts = 0
    while (true) {
      if (tokensReferenced(fs, root).contains(batchToken)) return -1L
      val head = currentVersion(spark, table)
      // strict schema check against the head this attempt claims — a
      // streaming batch never evolves the schema silently; evolve via
      // [[write]](mergeSchema = true) first
      val schemaJson =
        if (head >= 0) {
          val headSchema = DataType.fromJson(state(spark, table, Some(head))
            .schemaJson).asInstanceOf[StructType]
          resolveAppendSchema(headSchema, df.schema, mergeSchema = false).json
        } else df.schema.json
      try return commit(spark, table, "append", adds, Nil, schemaJson, head,
        checkpointInterval = checkpointInterval)
      catch {
        case _: java.util.ConcurrentModificationException if attempts < 30 =>
          // backoff past TornReclaimGraceMs in the worst case, so a
          // dead writer's torn head self-heals within one call; the
          // common claim-race retry stays tens of ms
          attempts += 1; Thread.sleep(25L * math.min(attempts, 10))
      }
    }
    -1L // unreachable
  }

  /** Every token dir any manifest ever referenced (committed or torn,
    * retained or expired) — checkpoint-seeded, O(checkpointInterval)
    * per call (see [[tokenSetAt]]). The cumulative set also closes a
    * replay hole retention used to open: a batch whose only
    * referencing manifest was [[expire]]d stays skipped. */
  private def tokensReferenced(fs: FileSystem, root: Path): Set[String] =
    tokenSetAt(fs, root)

  /** OPTIMIZE: rewrite the head's live set range-clustered on
    * `clusterColumn` as ONE new commit — readers of the old versions
    * keep their exact file sets (small-file compaction never rewrites
    * history), zone maps start pruning on the new one. Lost-update
    * safe: planned against the head like any overwrite. */
  def compact(spark: SparkSession, table: String, clusterColumn: String,
              nFiles: Int,
              checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    val head = currentVersion(spark, table)
    val cur = state(spark, table, Some(head))
    val df = read(spark, table, Some(head))
    val (fs, rootP) = fsOf(spark, table)
    val token = java.util.UUID.randomUUID().toString.take(12)
    val tokenDir = new Path(poolDir(rootP), token)
    df.repartitionByRange(nFiles, org.apache.spark.sql.functions.col(clusterColumn))
      .sortWithinPartitions(clusterColumn)
      .write.mode("errorifexists").parquet(tokenDir.toString)
    val adds = partFiles(fs, rootP, tokenDir)
    commit(spark, table, "compact", adds, cur.files, cur.schemaJson, head,
      checkpointInterval = checkpointInterval)
  }

  /** OPTIMIZE (Z-ORDER): rewrite the head's live set clustered on the
    * interleaved rank-normalized Morton key of 2–8 columns, as ONE
    * commit — [[compact]]'s multi-dimension form. After it,
    * [[readPruned]] with one dimension as the cluster column and the
    * rest as `optionalColumns` skips files on ANY of the dimensions at
    * planning time: range clustering serves one predicate column well,
    * Z-ordering serves several at once (the standard OPTIMIZE ZORDER
    * trade — per-dimension pruning is a bit weaker than a dedicated
    * sort, but every dimension prunes). Rank normalization (quantile
    * boundaries from one `approxQuantile` pass) keeps interleaving
    * effective under skew — same recipe as
    * [[ClusteredWriter.writeZOrderedRanked]], committed through the
    * snapshot token protocol so history stays time-travelable and the
    * change feed sees a row-content no-op (`compact` op by contract). */
  def compactZ(spark: SparkSession, table: String, cols: Seq[String],
               nFiles: Int, buckets: Int = 256,
               checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    import org.apache.spark.sql.functions.{col => c}
    require(cols.size >= 2 && cols.size <= 8,
      s"Z-order wants 2-8 columns, got ${cols.size} (use compact for one)")
    require(buckets >= 2 && buckets <= 256, s"buckets must be in [2,256], got $buckets")
    // the Morton key packs min(16, 62/k) bits per dimension, so the
    // boundary count (buckets − 1) must fit that code space — validated
    // HERE, before the approxQuantile pass, not inside mortonKeyRanked
    // after it (5+ dims shrink the per-dimension budget below 256)
    val zBits = math.min(16, 62 / cols.size)
    require(buckets <= (1 << zBits),
      s"buckets=$buckets exceeds the $zBits-bit per-dimension code space " +
        s"for ${cols.size} Z-order columns — use buckets <= ${1 << zBits}")
    val head = currentVersion(spark, table)
    val cur = state(spark, table, Some(head))
    val df = read(spark, table, Some(head))
    require(!df.columns.contains("_z"),
      "input column '_z' clashes with the working Morton-key column")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val quantiles = df.select(cols.map(x => c(x).cast("double").as(x)): _*)
      .stat.approxQuantile(cols.toArray, probs, 0.001)
    val dims = cols.zip(quantiles).map { case (x, q) =>
      require(q.nonEmpty, s"cannot rank-normalize '$x': empty or all-NULL column")
      (c(x), q.distinct.sorted)
    }
    val (fs, rootP) = fsOf(spark, table)
    val token = java.util.UUID.randomUUID().toString.take(12)
    val tokenDir = new Path(poolDir(rootP), token)
    df.withColumn("_z", ZOrder.mortonKeyRanked(dims))
      .repartitionByRange(nFiles, c("_z"))
      .sortWithinPartitions(c("_z"))
      .drop("_z")
      .write.mode("errorifexists").parquet(tokenDir.toString)
    val adds = partFiles(fs, rootP, tokenDir)
    commit(spark, table, "compact", adds, cur.files, cur.schemaJson, head,
      checkpointInterval = checkpointInterval)
  }

  // ── per-file Bloom sidecar ────────────────────────────────────────
  // The point-lookup complement to zone maps on the SNAPSHOT format:
  // [min,max] prunes nothing for a high-cardinality column the table
  // is not clustered by, so an unclustered point lookup scans every
  // file. The sidecar lives at `<root>/_bloom/<column>/` keyed by
  // ABSOLUTE file path — pool files are immutable, so a row can never
  // go stale; files written after the build are simply absent and are
  // never pruned (may-contain). [[SnapshotFileIndex]] consults it
  // transparently for `=`/`IN` filters on both the SQL and vectorized
  // read paths.
  private[lake] def bloomDir(root: Path, column: String): Path =
    new Path(logDir(root).getParent, s"_bloom/$column")

  /** Build (or refresh) the Bloom sidecar for `column` over the HEAD's
    * live files. Returns the number of files indexed. Cost: one
    * distributed pass over the live data (the filter build is
    * DataFrame aggregates; only (file, word, bits) rows shuffle). */
  def buildBloom(spark: SparkSession, table: String, column: String,
                 expectedItemsPerFile: Long = 1000000L,
                 fpp: Double = 0.01): Long = {
    val head = currentVersion(spark, table)
    require(head >= 0, s"no snapshot table at $table")
    val cur = state(spark, table, Some(head))
    if (cur.files.isEmpty) return 0L
    val (fs, rootP) = fsOf(spark, table)
    val dataRoot = dataRootOf(rootP)
    val abs = cur.files.map(f => fs.makeQualified(new Path(dataRoot, f)).toString)
    val df = BloomIndex.buildFrom(spark.read.parquet(abs: _*), column,
      expectedItemsPerFile, fpp)
    val dir = bloomDir(rootP, column)
    df.write.mode("overwrite").parquet(dir.toString)
    // persist the geometry beside the filters (the overwrite wiped any
    // previous copy — a full rebuild may legitimately re-size m):
    // commit-time maintenance then resolves it with one tiny read
    val m = BloomIndex.optimalBits(expectedItemsPerFile, fpp)
    writeBloomGeometry(fs, dir, column, m,
      BloomIndex.optimalHashes(m, expectedItemsPerFile), overwrite = true)
    spark.read.parquet(dir.toString).count()
  }

  /** The sidecar's filter table for `column`, if one was built.
    * RENAME-PROOF: rows store the filepath as written at build time
    * (absolute), but `ALTER TABLE RENAME TO` relocates the whole pool —
    * so every row's key is re-anchored at the CURRENT data root by its
    * pool-relative `data/…` suffix (the same last-`/data/`-segment
    * anchor manifests and DV keys use). A row whose path carries no
    * such suffix keeps its stored form (never matches → never prunes —
    * sound). Read recursively: incremental maintenance appends delta
    * dirs under the sidecar root (see [[appendBloomSidecars]]). */
  private[lake] def bloomFor(spark: SparkSession, tablePath: String,
                             column: String): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{col, concat, lit, regexp_extract, when}
    val (fs, rootP) = fsOf(spark, tablePath)
    val dir = bloomDir(rootP, column)
    if (!fs.exists(dir)) return None
    val prefix = fs.makeQualified(dataRootOf(rootP)).toString + "/"
    val rel = regexp_extract(col("filepath"), "^.*/(data/.*)$", 1)
    // ignoreMissingFiles (scoped to THIS read): a sidecar self-fold
    // ([[maybeFoldBloomDeltas]]) deletes its captured inputs after the
    // fold dir lands, so a reader that listed before the delete would
    // otherwise fail its whole query mid-scan; skipping the vanished
    // delta is sound — its rows live on in the fold dir, and a file
    // with no sidecar row is never pruned (may-contain)
    Some(spark.read.option("recursiveFileLookup", "true")
      .option("ignoreMissingFiles", "true").parquet(dir.toString)
      .withColumn("filepath",
        when(rel === lit(""), col("filepath")).otherwise(concat(lit(prefix), rel))))
  }

  // ── per-file SUM sidecar (agg stats) ─────────────────────────────
  // Parquet footers carry count/min/max but never SUMS, so the
  // dominant reporting aggregate at 100 TB — `SELECT sum(x) … WHERE
  // cluster_col BETWEEN lo AND hi` — always paid a full scan even when
  // every interior file was zone-map covered. This sidecar stores one
  // (filepath, sum, non-null count) row per live file per collected
  // column at `<root>/_aggstats/<column>/`, letting
  // [[PushFilteredAggToManifest]] answer SUM/AVG for covered files
  // from metadata and scan only the boundary. Soundness mirrors the
  // Bloom sidecar's: pool files are IMMUTABLE, so a row can never go
  // stale; files lacking a row (written after the collect) simply
  // degrade to scanned, and DV-carrying files are never covered by the
  // rewrite in the first place. Only INTEGRAL columns are collected —
  // integer addition is exact and associative, where float sums are
  // rounding-order-dependent. EVAL-MODE INDEPENDENCE: the collect
  // accumulates in DECIMAL(38,0) and refuses (→ scan) any file whose
  // exact sum exceeds long range ([[aggStatsSumType]]/[[aggStatsRows]]),
  // so a stored sum is the file's true sum under ANY collecting
  // session's mode. Serving is then sound for both query modes: a
  // LEGACY fold of exact per-file sums equals the stock wrapped total
  // (addition mod 2^64 is associative), and an ANSI fold re-checks
  // overflow in the emitted Sum aggregates — the per-file grouping is
  // just a legal physical partitioning of the same query, and Spark's
  // own transient-overflow detection already varies with partitioning.

  private[lake] val aggStatsIntegral: Set[org.apache.spark.sql.types.DataType] =
    Set(org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)

  private[lake] def aggStatsDir(root: Path, column: String): Path =
    new Path(logDir(root).getParent, s"_aggstats/$column")

  /** Collect per-file (sum, non-null count) for `column` over the
    * HEAD's live files that don't already have a sidecar row —
    * incremental by construction (re-running after appends pays only
    * the new files; an unchanged table pays one listing). Zero-row or
    * all-null files get an explicit (null, 0) row so they stay covered
    * instead of degrading forever. Returns the number of files newly
    * collected. Cost: one distributed pass over the MISSING files'
    * `column` bytes (column-pruned scan), one tiny sidecar append. */
  def collectAggStats(spark: SparkSession, table: String, column: String): Long = {
    val head = currentVersion(spark, table)
    require(head >= 0, s"no snapshot table at $table")
    val cur = state(spark, table, Some(head))
    val schema = org.apache.spark.sql.types.DataType.fromJson(cur.schemaJson)
      .asInstanceOf[StructType]
    require(schema.fieldNames.contains(column), s"no column '$column' in $table")
    require(aggStatsIntegral.contains(schema(column).dataType),
      s"agg stats require an integral column; '$column' is " +
        schema(column).dataType.sql + " (float sums are rounding-order-dependent, " +
        "so a sidecar fold could differ from a scan in the last ulp)")
    if (cur.files.isEmpty) return 0L
    val (fs, rootP) = fsOf(spark, table)
    val dataRoot = dataRootOf(rootP)
    val abs = cur.files.map(f => fs.makeQualified(new Path(dataRoot, f)).toString)
    val have: Set[String] = aggStatsFor(spark, table, column)
      .map(_.select("filepath").collect().map(_.getString(0)).toSet)
      .getOrElse(Set.empty)
    val missing = abs.filterNot(have)
    if (missing.isEmpty) return 0L
    import org.apache.spark.sql.functions.{col => c, count, lit, sum}
    // the sum accumulates in DECIMAL(38,0) ([[aggStatsSumType]]) so the
    // stored per-file sum is mathematically EXACT whatever eval mode
    // the collecting session runs — the long-range guard in
    // [[aggStatsRows]] drops (→ scan) the pathological file whose sum
    // a long cannot hold, closing the legacy-collect/ANSI-serve hole
    val computed = spark.read.parquet(missing: _*)
      .select(c("_metadata.file_path").as("filepath"), c(column))
      .groupBy("filepath")
      .agg(sum(c(column).cast(aggStatsSumType)).as("sum_dec"),
        count(c(column)).as("cnt"))
    // zero-row files produce no group — left-join the full list so
    // every missing file lands a row (sum NULL, cnt 0 = "no non-null
    // values", exactly Spark's sum-over-empty)
    val all = aggStatsRows(spark.createDataFrame(
      spark.sparkContext.parallelize(missing.map(Row(_)), math.max(1, missing.size / 20000)),
      StructType(Seq(StructField("filepath", StringType, nullable = false))))
      .join(computed, Seq("filepath"), "left")
      .select(c("filepath"), c("sum_dec"),
        org.apache.spark.sql.functions.coalesce(c("cnt"), lit(0L)).as("cnt")))
    val dir = aggStatsDir(rootP, column)
    val delta = new Path(dir, s"delta-${java.util.UUID.randomUUID().toString.take(12)}")
    all.write.mode("errorifexists").parquet(delta.toString)
    missing.size.toLong
  }

  /** The sidecar's (filepath, sum_v, cnt) table for `column`, if one
    * was collected. Rename-proof exactly like [[bloomFor]]: rows are
    * re-anchored at the current data root by their pool-relative
    * suffix. Read recursively over the delta dirs; duplicate rows for
    * one file (two concurrent collects) are IDENTICAL — files are
    * immutable — so readers may pick either. */
  def aggStatsFor(spark: SparkSession, tablePath: String,
                  column: String): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{col, concat, lit, regexp_extract, when}
    val (fs, rootP) = fsOf(spark, tablePath)
    val dir = aggStatsDir(rootP, column)
    if (!fs.exists(dir)) return None
    val prefix = fs.makeQualified(dataRootOf(rootP)).toString + "/"
    val rel = regexp_extract(col("filepath"), "^.*/(data/.*)$", 1)
    Some(spark.read.option("recursiveFileLookup", "true")
      .option("ignoreMissingFiles", "true").parquet(dir.toString)
      .withColumn("filepath",
        when(rel === lit(""), col("filepath")).otherwise(concat(lit(prefix), rel)))
      .dropDuplicates("filepath"))
  }

  // the collected sidecar, ONE entry per sidecar dir (a version-keyed
  // map would retain every superseded version's rows across a long
  // streaming session): the dir-version tag (delta count + max mtime
  // from ONE listing) invalidates the entry when a new collect lands
  private val aggStatsMapCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Map[String, (Option[Long], Long)])]()

  /** Driver-held sidecar map for the rewrite: qualified path →
    * (sum — None when the file has no non-null values —, non-null
    * count). One fs listing per call; the collect() behind it runs
    * once per sidecar version. Empty when never collected. */
  private[lake] def aggStatsMap(spark: SparkSession, tablePath: String,
                                column: String): Map[String, (Option[Long], Long)] = {
    val (fs, rootP) = fsOf(spark, tablePath)
    val dir = aggStatsDir(rootP, column)
    if (!fs.exists(dir)) return Map.empty
    val ls = fs.listStatus(dir)
    val ver = s"${ls.length}#${ls.map(_.getModificationTime).foldLeft(0L)(math.max)}"
    val key = dir.toString
    val cached = aggStatsMapCache.get(key)
    if (cached != null && cached._1 == ver) return cached._2
    val fresh = aggStatsFor(spark, tablePath, column) match {
      case None => Map.empty[String, (Option[Long], Long)]
      case Some(df) => df.collect().map { r =>
        r.getString(0) -> ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getLong(2))
      }.toMap
    }
    aggStatsMapCache.put(key, (ver, fresh))
    fresh
  }

  /** OPTIMIZE (BIN-PACK): rewrite ONLY the head's small files into
    * ~`targetBytes` outputs as one commit — the routine maintenance op
    * a continuously-ingested table needs, where [[compact]]'s
    * whole-head rewrite would be a 100 TB job to fix a few thousand
    * micro-batch crumbs. Files at or above `smallBytes` are NOT read,
    * NOT rewritten, and stay byte-identical (keeping their zone-map
    * stats, bloom entries, and page-cache residency). A small file
    * that carries deletion vectors rewrites through them — its dead
    * rows drop and its vector set dies with the removed file, so
    * bin-packing doubles as a partial purge. Output layout follows the
    * table's declared cluster columns ([[clusterByOf]]) when present —
    * range-distributed + sorted, so the packed files prune — else a
    * plain coalesce-shaped repartition. Commits as `compact` (a
    * row-content no-op by contract; the change feed skips it). Returns
    * the new version, or the head unchanged when fewer than `minFiles`
    * small files exist. Cost: O(small-file bytes) read + written, one
    * driver listing for sizes. Lost-update safe like every non-append
    * commit. */
  def compactBin(spark: SparkSession, table: String,
                 targetBytes: Long = 128L * 1024 * 1024,
                 smallBytes: Long = -1L, minFiles: Int = 2,
                 checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    require(targetBytes > 0, "targetBytes must be positive")
    val smallBound = if (smallBytes > 0) smallBytes else targetBytes / 2
    val head = currentVersion(spark, table)
    val cur = state(spark, table, Some(head))
    val (fs, rootP) = fsOf(spark, table)
    val sizes = fileSizes(fs, rootP, cur.files)
    val sized = cur.files.map(f => f -> sizes(f))
    val small = sized.filter(_._2 < smallBound)
    if (small.size < math.max(2, minFiles)) return head
    val smallFiles = small.map(_._1)
    val nOut = math.max(1, math.ceil(small.map(_._2).sum.toDouble / targetBytes).toInt)
    val df = readSnapshot(spark, table, cur, onlyFiles = Some(smallFiles))
    val token = java.util.UUID.randomUUID().toString.take(12)
    val tokenDir = new Path(poolDir(rootP), token)
    val shaped = clusterByOf(spark, table) match {
      case c if c.nonEmpty =>
        df.repartitionByRange(nOut, c.map(org.apache.spark.sql.functions.col): _*)
          .sortWithinPartitions(c.head, c.tail: _*)
      case _ => df.repartition(nOut)
    }
    shaped.write.mode("errorifexists").parquet(tokenDir.toString)
    val adds = partFiles(fs, rootP, tokenDir)
    // removed files drop their DV sets in the same replay step
    commit(spark, table, "compact", adds, smallFiles, cur.schemaJson, head,
      checkpointInterval = checkpointInterval)
  }

  /** Diagnostic: directory listings issued by [[fileSizes]] since JVM
    * start — the spec pins the census at O(token dirs), not O(files). */
  private[lake] val censusListings = new java.util.concurrent.atomic.AtomicLong(0L)

  /** BATCHED size census for a live file set: ONE `listStatus` per pool
    * token dir instead of one `getFileStatus` round-trip per file — on
    * a million-file head the per-file loop is minutes of driver RPC
    * time before any real work, and a token dir holds its whole
    * commit's files, so the listing count is O(commits retained), not
    * O(files). A wanted file missing from its dir's listing throws the
    * same `FileNotFoundException` the per-file probe raised. */
  private[lake] def fileSizes(fs: FileSystem, root: Path,
                              relFiles: Seq[String]): Map[String, Long] = {
    val dataRoot = dataRootOf(root)
    val wanted = relFiles.toSet
    val byDir = relFiles.groupBy(f => f.lastIndexOf('/') match {
      case -1 => ""
      case i => f.substring(0, i)
    })
    val out = Map.newBuilder[String, Long]
    for (dir <- byDir.keys) {
      censusListings.incrementAndGet()
      val dirPath = if (dir.isEmpty) dataRoot else new Path(dataRoot, dir)
      for (st <- fs.listStatus(dirPath) if st.isFile) {
        val rel = if (dir.isEmpty) st.getPath.getName else dir + "/" + st.getPath.getName
        if (wanted.contains(rel)) out += rel -> st.getLen
      }
    }
    val res = out.result()
    relFiles.find(f => !res.contains(f)).foreach(f =>
      throw new java.io.FileNotFoundException(s"$f not found under $dataRoot"))
    res
  }

  /** PURGE: materialize the head's merge-on-read deletes by rewriting
    * ONLY the files that carry deletion vectors — each dirty file is
    * re-read once with its dead rows dropped, the clean files are not
    * read, not rewritten, and stay byte-identical (and keep their
    * zone-map stats, bloom entries, and page-cache residency) across
    * the commit. This is the bounded merge-on-read → copy-on-write
    * conversion every DV format needs ([[delete]] keeps deletes
    * O(deleted rows); a steady trickle of them would otherwise tax
    * every future read with the anti-join until a FULL [[compact]]
    * rewrote the table): cost is O(dirty-file bytes), the right
    * maintenance cadence at 100 TB where deletes cluster in a few
    * recent files. The op commits as `purge` — a row-content no-op by
    * contract, so [[readChanges]] (and every feed consumer) skips it
    * exactly like `compact`. Old versions still time-travel with their
    * vectors applied; the superseded DV parquet files age out with
    * them via [[expire]]. Returns the new version, or the head
    * unchanged when no file carries a vector. Lost-update safe like
    * every non-append commit. */
  def purgeDeletes(spark: SparkSession, table: String,
                   checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    val head = currentVersion(spark, table)
    val cur = state(spark, table, Some(head))
    val dirty = cur.files.filter(cur.dvs.contains)
    if (dirty.isEmpty) return head
    val (fs, rootP) = fsOf(spark, table)
    val token = java.util.UUID.randomUUID().toString.take(12)
    val tokenDir = new Path(poolDir(rootP), token)
    readSnapshot(spark, table, cur, onlyFiles = Some(dirty))
      .write.mode("errorifexists").parquet(tokenDir.toString)
    val adds = partFiles(fs, rootP, tokenDir)
    // removing a file drops its DV set in the same replay step (state's
    // `p.removes.foreach(dvs.remove)`), so no dvSets restate is needed
    commit(spark, table, "purge", adds, dirty, cur.schemaJson, head,
      checkpointInterval = checkpointInterval)
  }

  /** MAINTENANCE POLICY for merge-on-read deletes: [[purgeDeletes]]
    * when the head's dead-row debt crosses a bound, else a no-op.
    * Every read of a DV'd version pays a broadcast of the dead-row set
    * ([[dvRows]]) and the anti-join on dirty files; [[delete]] keeps
    * writes O(deleted rows), so WITHOUT a trigger that read-side tax
    * only ever grows — this is the trigger. Call it on an ingest/delete
    * cadence (e.g. every N micro-batches, or after each CDC apply):
    *
    *  - `maxDirtyFraction`: purge when more than this fraction of the
    *    head's live files carry vectors (read-amplification bound);
    *  - `maxDeadRows`: purge when the pooled dead-row count exceeds
    *    this (broadcast-size bound — the DV parquet files are
    *    dead-row-sized, so counting them is cheap).
    *
    * Returns the new version after a purge, or the head unchanged.
    * Cost when triggered is [[purgeDeletes]]'s O(dirty-file bytes);
    * when not triggered, one footer-count pass over the (small) DV
    * files. Lost-update safe like every non-append commit. */
  def maintain(spark: SparkSession, table: String,
               maxDirtyFraction: Double = 0.2, maxDeadRows: Long = 1000000L,
               checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    require(maxDirtyFraction >= 0.0 && maxDeadRows >= 0L,
      "bounds must be non-negative")
    val head = currentVersion(spark, table)
    val cur = state(spark, table, Some(head))
    val dirty = cur.files.count(cur.dvs.contains)
    if (dirty == 0) return head
    val dirtyFraction = dirty.toDouble / cur.files.size
    val trigger =
      if (dirtyFraction > maxDirtyFraction) true
      else {
        // dead-row count from DV parquet FOOTERS, on the driver: the
        // non-triggering path of a per-micro-batch policy check must be
        // JOBLESS (no Spark job, no executor round-trip) — DV files are
        // dead-row-sized and immutable, so each footer is read at most
        // once per JVM (cache below) and the steady-state cost is a map
        // lookup per DV file
        val (fs, root) = fsOf(spark, table)
        cur.dvs.values.flatten.toSeq.distinct.map { f =>
          footerRowCount(fs, new Path(dataRootOf(root), f))
        }.sum > maxDeadRows
      }
    if (trigger) purgeDeletes(spark, table, checkpointInterval) else head
  }

  /** Driver-side parquet footer row count, cached per path (pool files
    * are immutable by protocol, so the count is valid for the file's
    * life). Used by [[maintain]]'s no-op path; DV files only — data
    * files go through the distributed [[StatsAgg.harvest]]. */
  private val footerRowCountCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, java.lang.Long](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.lang.Long]): Boolean =
        size() > 100000
    })

  private def footerRowCount(fs: FileSystem, p: Path): Long = {
    val key = p.toString
    val cached = footerRowCountCache.get(key)
    if (cached != null) return cached.longValue()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, fs.getConf))
    val n = try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
            finally reader.close()
    footerRowCountCache.put(key, java.lang.Long.valueOf(n))
    n
  }

  /** Copy-on-write MERGE as ONE snapshot commit: rows of `upserts`
    * replace same-key rows, `deleteKeys` vanish, every other row rides
    * along untouched. File-level pruning bounds the rewrite: footer
    * stats are harvested for the HEAD's live files only, and a file is
    * rewritten only when its [min,max] on `keyCol` may contain an
    * affected key (stats-less files always rewrite — may-contain,
    * sound). Unaffected files are not read, not rewritten, and stay
    * byte-identical across the commit; the pre-merge version remains
    * time-travelable.
    *
    * The affected-key set is collected to the driver (CDC-batch-sized
    * by contract, same as [[Merge]]'s prune list — a backfill that
    * touches every key should [[write]] an overwrite instead).
    * Lost-update safe: planned against the head, so a concurrent
    * commit makes this throw rather than resurrect overwritten rows.
    * Re-running the same merge converges (same keys → same rows), it
    * is NOT exactly-once — wrap in [[appendBatch]]-style tokens via a
    * caller check on [[history]] if the source may replay. */
  def merge(spark: SparkSession, table: String, keyCol: String,
            upserts: DataFrame, deleteKeys: Seq[Any] = Nil,
            clusterColumn: Option[String] = None, nFiles: Int = 4,
            checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    val head = currentVersion(spark, table)
    val cur = state(spark, table, Some(head))
    val schema = DataType.fromJson(cur.schemaJson).asInstanceOf[StructType]
    val (fs, rootP) = fsOf(spark, table)
    val absAll = cur.files.map(f => fs.makeQualified(new Path(dataRootOf(rootP), f)).toString)
    val upsertKeys = upserts.select(keyCol).distinct().collect().map(_.get(0)).toSeq
    val keys = (upsertKeys ++ deleteKeys).distinct
    if (keys.isEmpty) return head

    // affected = live files whose footer interval may contain a key;
    // files without usable stats rewrite (never silently kept)
    val kstats = cachedHarvest(spark, absAll, keyCol, schema(keyCol).dataType)
    // sorted keys + binary search: the may-contain probe is
    // files x log(keys), not files x keys (a large CDC batch against a
    // 100k-file version would otherwise burn the driver)
    val sortedKeys = keys.toArray.sortWith(StatsAgg.cmp(_, _) < 0)
    val affectedAbs = kstats.filter { fsRow =>
      (fsRow.min, fsRow.max) match {
        case (Some(mn), Some(mx)) => StatsAgg.anyKeyInRange(sortedKeys, mn, mx)
        case _ => true
      }
    }.map(_.path).toSet
    val affectedRel = cur.files.filter(f =>
      affectedAbs.contains(fs.makeQualified(new Path(dataRootOf(rootP), f)).toString))

    val keysDf = spark.createDataFrame(
      // slice the key batch so no single task ships megabytes of keys
      // (a 150k-key batch in one slice was the 4.4 MiB task the round-11
      // bench flagged)
      spark.sparkContext.parallelize(keys.map(Row(_)),
        math.max(1, keys.size / 20000)),
      StructType(Seq(schema(keyCol).copy(name = "_mk"))))
    // DV-aware: rows already dead in an affected file must not be
    // resurrected by its rewrite
    val survivors = readSnapshot(spark, table, cur, onlyFiles = Some(affectedRel))
      .join(org.apache.spark.sql.functions.broadcast(keysDf),
        org.apache.spark.sql.functions.col(keyCol) ===
          org.apache.spark.sql.functions.col("_mk"), "left_anti")
    val replacement = survivors.unionByName(
      upserts.select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*))

    val token = java.util.UUID.randomUUID().toString.take(12)
    val tokenDir = new Path(poolDir(rootP), token)
    val cc = clusterColumn.getOrElse(keyCol)
    replacement
      .repartitionByRange(nFiles, org.apache.spark.sql.functions.col(cc))
      .sortWithinPartitions(cc)
      .write.mode("errorifexists").parquet(tokenDir.toString)
    val adds = partFiles(fs, rootP, tokenDir)
    commit(spark, table, "merge", adds, affectedRel, cur.schemaJson, head,
      checkpointInterval = checkpointInterval)
  }

  /** Row-level DELETE as a deletion-vector commit — O(deleted rows)
    * written, ZERO data files rewritten. The predicate scan is pushed
    * into the parquet reader (row-group skipping applies); matching
    * rows' positions (`_metadata.row_index`) are written as DV parquet
    * `(file, pos)` rows under a fresh commit token — one file in the
    * CDC-sized common case, `⌈rows / dvRowsPerFile⌉` (≤ 64) for a bulk
    * predicate, so no delete funnels through one task — and the
    * commit restates each affected file's vector set (prior set + the
    * new DV — replacement semantics, see [[render]]). Readers of the
    * new version apply the DV merge-on-read; every pre-delete version
    * still reads the rows (time travel is un-deleted). Contrast with
    * [[merge]]'s copy-on-write: at 100 TB a 0.001 % delete rewrites
    * nothing here, where copy-on-write would rewrite every may-contain
    * file. [[compact]] folds DVs into clean files; re-deleting an
    * already-dead row is a no-op (positions are idempotent and the
    * scan excludes dead rows). Returns the new version, or the head
    * unchanged when nothing matched. Lost-update safe like every
    * non-append commit. `candidates` (table-relative) bounds the scan
    * to a pruned file subset — see [[deleteByKeys]]. */
  def delete(spark: SparkSession, table: String,
             predicate: org.apache.spark.sql.Column,
             candidates: Option[Seq[String]] = None,
             checkpointInterval: Int = DefaultCheckpointInterval,
             dvRowsPerFile: Long = 8L * 1024 * 1024): Long = {
    import org.apache.spark.sql.functions.col
    require(dvRowsPerFile > 0, "dvRowsPerFile must be positive")
    val head = currentVersion(spark, table)
    val cur = state(spark, table, Some(head))
    val scanFiles = candidates.getOrElse(cur.files)
    require(scanFiles.forall(cur.files.contains),
      "candidate files must be live in the head version")
    if (scanFiles.isEmpty) return head
    val schema = DataType.fromJson(cur.schemaJson).asInstanceOf[StructType]
    val (fs, root) = fsOf(spark, table)
    val abs = scanFiles.map(f => new Path(dataRootOf(root), f).toString)

    var hits = spark.read.schema(schema).parquet(abs: _*)
      .where(predicate)
      .select(relFileCol.as("file"), col("_metadata.row_index").as("pos"))
    // exclude rows already dead — a re-run of the same delete (or an
    // overlapping predicate) must not grow the vectors
    val dirtyScanned = scanFiles.filter(cur.dvs.contains)
    if (dirtyScanned.nonEmpty) {
      val sub = cur.copy(dvs = cur.dvs.filter { case (f, _) => dirtyScanned.contains(f) })
      hits = hits.join(org.apache.spark.sql.functions.broadcast(
        dvRows(spark, root, sub)), Seq("file", "pos"), "left_anti")
    }

    // count-aware DV layout: the CDC-sized common case writes ONE file,
    // but a predicate matching 10⁸ rows must not funnel through one
    // task — the hit set is cached (it is (string, long) pairs, tiny
    // relative to the scanned data) so the count never re-runs the scan
    hits.persist()
    try {
      val nDead = hits.count()
      if (nDead == 0) return head
      val nParts = math.min(64L, nDead / dvRowsPerFile + 1).toInt
      val token = java.util.UUID.randomUUID().toString.take(12)
      val tokenDir = new Path(poolDir(root), token)
      hits.repartition(nParts).write.mode("errorifexists").parquet(tokenDir.toString)
      val dvRel = partFiles(fs, root, tokenDir)
      val affected = spark.read.parquet(tokenDir.toString)
        .select("file").distinct().collect().map(_.getString(0)).toSeq.sorted
      val dvSets = affected.map(f => f -> (cur.dvs.getOrElse(f, Nil) ++ dvRel))
      commit(spark, table, "delete", adds = Nil, removes = Nil,
        schemaJson = cur.schemaJson, expected = head, dvSets = dvSets,
        checkpointInterval = checkpointInterval)
    } finally hits.unpersist()
  }

  /** Row-level UPDATE as ONE merge-on-read commit: the matched rows die
    * via deletion vectors AND their updated copies land as appended
    * files — one atomic manifest claim carries both halves, so readers
    * see the old rows or the new, never neither nor both. Cost is
    * O(matched rows) written with ZERO data files rewritten — contrast
    * copy-on-write UPDATE, which at 100 TB rewrites every may-contain
    * file for a point fix. Time travel keeps the pre-update rows;
    * [[purgeDeletes]]/[[maintain]] fold the vectors as usual; the
    * change feed shows the commit as bounded deletes + inserts (see
    * [[readChanges]]'s `update` case), so incremental views maintain
    * straight through it. `assignments` values are cast to the column's
    * committed type. NOT idempotent by design (SQL semantics: re-running
    * `SET x = x + 1` matches the updated rows and adds again); rows
    * already dead under the head's vectors are excluded, so an UPDATE
    * whose predicate overlaps a prior DELETE touches only live rows.
    * Returns the new version, or the head unchanged when nothing
    * matched. Lost-update safe like every non-append commit. */
  def update(spark: SparkSession, table: String,
             predicate: org.apache.spark.sql.Column,
             assignments: Map[String, org.apache.spark.sql.Column],
             checkpointInterval: Int = DefaultCheckpointInterval,
             dvRowsPerFile: Long = 8L * 1024 * 1024): Long = {
    import org.apache.spark.sql.functions.{broadcast, col}
    require(assignments.nonEmpty, "update needs at least one assignment")
    val head = currentVersion(spark, table)
    val cur = state(spark, table, Some(head))
    if (cur.files.isEmpty) return head
    val schema = DataType.fromJson(cur.schemaJson).asInstanceOf[StructType]
    assignments.keys.foreach(c => require(schema.fieldNames.contains(c),
      s"unknown column '$c' in UPDATE of $table (schema: ${schema.fieldNames.mkString(",")})"))
    Seq("_uf", "_up").foreach(c => require(!schema.fieldNames.contains(c),
      s"input column '$c' clashes with the update working columns"))
    val (fs, root) = fsOf(spark, table)
    val abs = cur.files.map(f => new Path(dataRootOf(root), f).toString)

    // ONE scan finds the matched rows with their positions AND payload
    var hits = spark.read.schema(schema).parquet(abs: _*)
      .where(predicate)
      .select(relFileCol.as("_uf") +: col("_metadata.row_index").as("_up") +:
        schema.fieldNames.toSeq.map(col): _*)
    if (cur.dvs.nonEmpty) {
      val dv = dvRows(spark, root, cur)
      hits = hits.join(broadcast(dv),
        hits("_uf") === dv("file") && hits("_up") === dv("pos"), "left_anti")
    }
    hits.persist()
    try {
      val nHit = hits.count()
      if (nHit == 0) return head
      // DV half: the matched rows' positions, count-aware layout like
      // [[delete]]
      val nParts = math.min(64L, nHit / dvRowsPerFile + 1).toInt
      val dvToken = java.util.UUID.randomUUID().toString.take(12)
      val dvDir = new Path(poolDir(root), dvToken)
      hits.select(col("_uf").as("file"), col("_up").as("pos"))
        .repartition(nParts).write.mode("errorifexists").parquet(dvDir.toString)
      val dvRel = partFiles(fs, root, dvDir)
      val affected = hits.select("_uf").distinct()
        .collect().map(_.getString(0)).toSeq.sorted
      val dvSets = affected.map(f => f -> (cur.dvs.getOrElse(f, Nil) ++ dvRel))
      // APPEND half: the updated copies as ONE simultaneous projection —
      // SQL UPDATE semantics require every SET right-hand side to read
      // the PRE-update row, so `SET a = b, b = a` swaps and
      // `SET a = a + b, b = 0` uses the old b. A sequential
      // withColumn-per-assignment would feed later assignments the
      // already-updated columns (in unordered Map iteration order, no
      // less). Each value is cast back to the committed column type so
      // the schema stays a fixed point.
      val updated = hits.select(schema.fields.toSeq.map(f =>
        assignments.get(f.name).map(_.cast(f.dataType)).getOrElse(col(f.name))
          .as(f.name)): _*)
      val addToken = java.util.UUID.randomUUID().toString.take(12)
      val addDir = new Path(poolDir(root), addToken)
      updated.write.mode("errorifexists").parquet(addDir.toString)
      val adds = partFiles(fs, root, addDir)
      commit(spark, table, "update", adds, Nil, cur.schemaJson, head,
        dvSets = dvSets, checkpointInterval = checkpointInterval)
    } finally hits.unpersist()
  }

  /** One WHEN MATCHED arm of [[mergeInto]]: `assignments = None` is
    * DELETE, `Some(map)` is UPDATE SET. Columns reference the joined
    * pair through the `_t` (target) and `_s` (source) aliases. */
  final case class MatchedAction(condition: Option[org.apache.spark.sql.Column],
                                 assignments: Option[Map[String, org.apache.spark.sql.Column]])

  /** One WHEN NOT MATCHED arm: INSERT with `values` per target column
    * (absent columns insert NULL). Columns reference `_s`. */
  final case class NotMatchedAction(condition: Option[org.apache.spark.sql.Column],
                                    values: Map[String, org.apache.spark.sql.Column])

  /** MERGE INTO with full SQL semantics as ONE merge-on-read commit:
    * matched target rows die via deletion vectors, their updated copies
    * and the not-matched inserts land as appended files, and a single
    * manifest claim carries all of it — O(changed rows) written, ZERO
    * data files rewritten (contrast [[merge]], the copy-on-write
    * key-upsert that REWRITES affected files; this is the general form
    * with per-arm conditions, first-match-wins, and the standard
    * duplicate-match error).
    *
    * The target is exposed as alias `_t`, the source as `_s` — build
    * `condition` / arm columns against those names. First arm whose
    * condition holds wins (SQL order semantics); a target row matched
    * by MORE than one source row throws (the standard MERGE
    * cardinality error) BEFORE anything commits.
    *
    * Scale: `pruneKey = Some((targetCol, sourceCol))` — an equi-pair
    * from the merge condition — bounds the TARGET scan to the
    * may-contain files of the source's distinct keys (footer zone maps,
    * the [[merge]]/[[deleteByKeys]] prune), sound because a file whose
    * interval excludes every source key can produce no match, so both
    * the inner join AND the not-matched anti-join see identical rows.
    * Batches beyond `maxProbeKeys` distinct keys fall back to the full
    * scan (backfill regime — correct, just unpruned).
    *
    * `notMatchedBySource` arms (UPDATE/DELETE of target rows with no
    * source match — columns reference `_t` only) DISABLE the prune:
    * they touch exactly the rows outside the source's key range, so the
    * scan is inherently table-wide — the same cost every engine pays
    * for that clause. */
  def mergeInto(spark: SparkSession, table: String,
                source: DataFrame, condition: org.apache.spark.sql.Column,
                matched: Seq[MatchedAction], notMatched: Seq[NotMatchedAction],
                pruneKey: Option[(String, String)] = None,
                maxProbeKeys: Int = 100000,
                checkpointInterval: Int = DefaultCheckpointInterval,
                dvRowsPerFile: Long = 8L * 1024 * 1024,
                notMatchedBySource: Seq[MatchedAction] = Nil): Long = {
    require(matched.nonEmpty || notMatched.nonEmpty || notMatchedBySource.nonEmpty,
      "MERGE with no action arms")
    val head = currentVersion(spark, table)
    val cur = state(spark, table, Some(head))
    val schema = DataType.fromJson(cur.schemaJson).asInstanceOf[StructType]
    Seq("_uf", "_up").foreach(c => require(!schema.fieldNames.contains(c),
      s"input column '$c' clashes with the merge working columns"))
    val (fs, root) = fsOf(spark, table)

    // Pin the source to ONE materialization before anything reads it:
    // the prune-key collect, the cardinality check, the matched join,
    // and both anti-joins must all see the SAME rows. A
    // non-deterministic source (rand(), LIMIT, sampling) re-evaluated
    // per consumer could pass the duplicate-match check yet produce
    // duplicate matches in the evaluation that writes — or land a row
    // as both an update and an insert.
    source.persist()
    try {
      mergeIntoPinned(spark, table, source, condition, matched, notMatched,
        pruneKey, maxProbeKeys, checkpointInterval, dvRowsPerFile,
        notMatchedBySource, head, cur, schema, fs, root)
    } finally { source.unpersist(); () }
  }

  private def mergeIntoPinned(spark: SparkSession, table: String,
                source: DataFrame, condition: org.apache.spark.sql.Column,
                matched: Seq[MatchedAction], notMatched: Seq[NotMatchedAction],
                pruneKey: Option[(String, String)],
                maxProbeKeys: Int,
                checkpointInterval: Int,
                dvRowsPerFile: Long,
                notMatchedBySource: Seq[MatchedAction],
                head: Long, cur: Snapshot, schema: StructType,
                fs: org.apache.hadoop.fs.FileSystem, root: Path): Long = {
    import org.apache.spark.sql.functions.{broadcast, col, lit, when}

    // zone-map prune of the target scan by the source's key batch —
    // sound for matched arms AND the not-matched anti-join (a pruned
    // file may-contains no source key, so none of its rows can match),
    // but NOT with not-matched-by-source arms, which touch exactly the
    // target rows OUTSIDE the source: those force the full scan
    val scanFiles: Seq[String] = pruneKey match {
      case Some((tk, sk)) if cur.files.nonEmpty && notMatchedBySource.isEmpty =>
        require(schema.fieldNames.contains(tk), s"unknown prune column '$tk'")
        val keys = source.select(sk).distinct().limit(maxProbeKeys + 1)
          .collect().map(_.get(0)).filter(_ != null).toSeq
        if (keys.size > maxProbeKeys) cur.files // backfill: full scan
        else if (keys.isEmpty) Nil
        else {
          val absAll = cur.files.map(f =>
            fs.makeQualified(new Path(dataRootOf(root), f)).toString)
          val kstats = cachedHarvest(spark, absAll, tk, schema(tk).dataType)
          val sorted = keys.toArray.sortWith(StatsAgg.cmp(_, _) < 0)
          val keep = kstats.filter { r =>
            (r.min, r.max) match {
              case (Some(mn), Some(mx)) => StatsAgg.anyKeyInRange(sorted, mn, mx)
              case _ => true
            }
          }.map(_.path).toSet
          cur.files.filter(f =>
            keep.contains(fs.makeQualified(new Path(dataRootOf(root), f)).toString))
        }
      case _ => cur.files
    }

    // live target rows with their physical positions, aliased `_t`
    val tFrame: DataFrame = {
      if (scanFiles.isEmpty) {
        val fields = StructField("_uf", StringType) +:
          StructField("_up", LongType) +: schema.fields
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(fields))
      } else {
        val abs = scanFiles.map(f => new Path(dataRootOf(root), f).toString)
        var t = spark.read.schema(schema).parquet(abs: _*)
          .select(relFileCol.as("_uf") +: col("_metadata.row_index").as("_up") +:
            schema.fieldNames.toSeq.map(col): _*)
        if (cur.dvs.nonEmpty) {
          val dv = dvRows(spark, root, cur)
          t = t.join(broadcast(dv),
            t("_uf") === dv("file") && t("_up") === dv("pos"), "left_anti")
        }
        t
      }
    }
    val tA = tFrame.alias("_t")
    val sA = source.alias("_s")

    /** First-arm-wins action index: 0 = no arm applies (row untouched). */
    def actionIndex(conds: Seq[Option[org.apache.spark.sql.Column]]): org.apache.spark.sql.Column =
      conds.zipWithIndex.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
        case (acc, (c, i)) =>
          val arm = c.getOrElse(lit(true))
          Some(acc.fold(when(arm, lit(i + 1)))(_.when(arm, lit(i + 1))))
      }.fold(lit(0))(_.otherwise(lit(0)))

    def castTo(f: StructField, c: org.apache.spark.sql.Column) = c.cast(f.dataType).as(f.name)

    val parts = Seq.newBuilder[DataFrame]
    val deadParts = Seq.newBuilder[DataFrame]
    val persisted = Seq.newBuilder[DataFrame]
    try {
      if (matched.nonEmpty) {
        val m = tA.join(sA, condition, "inner")
        // standard MERGE cardinality rule, checked before ANY write: a
        // target row matched by >1 source row is ambiguous
        val dup = m.groupBy(col("_uf"), col("_up")).count()
          .where(col("count") > 1).head(1)
        if (dup.nonEmpty) throw new IllegalStateException(
          "MERGE matched a target row with more than one source row — " +
            "deduplicate the source on the merge keys first")
        val affected = m.withColumn("_act", actionIndex(matched.map(_.condition)))
          .where(col("_act") > 0)
        affected.persist(); persisted += affected
        deadParts += affected.select(col("_uf").as("file"), col("_up").as("pos"))
        matched.zipWithIndex.foreach {
          case (MatchedAction(_, Some(asg)), i) =>
            parts += affected.where(col("_act") === i + 1)
              .select(schema.fields.toSeq.map(f =>
                castTo(f, asg.getOrElse(f.name, col(s"_t.${f.name}")))): _*)
          case _ => () // DELETE arm: dead positions only
        }
      }
      if (notMatched.nonEmpty) {
        val nm = sA.join(tA, condition, "left_anti")
          .withColumn("_act", actionIndex(notMatched.map(_.condition)))
          .where(col("_act") > 0)
        nm.persist(); persisted += nm
        notMatched.zipWithIndex.foreach { case (NotMatchedAction(_, vals), i) =>
          parts += nm.where(col("_act") === i + 1)
            .select(schema.fields.toSeq.map(f =>
              castTo(f, vals.getOrElse(f.name, lit(null)))): _*)
        }
      }
      if (notMatchedBySource.nonEmpty) {
        // target rows with NO source match: same arm machinery as
        // matched (columns reference _t only); each target row appears
        // once in the anti-join, so no cardinality check is needed
        val tn = tA.join(sA, condition, "left_anti")
          .withColumn("_act", actionIndex(notMatchedBySource.map(_.condition)))
          .where(col("_act") > 0)
        tn.persist(); persisted += tn
        deadParts += tn.select(col("_uf").as("file"), col("_up").as("pos"))
        notMatchedBySource.zipWithIndex.foreach {
          case (MatchedAction(_, Some(asg)), i) =>
            parts += tn.where(col("_act") === i + 1)
              .select(schema.fields.toSeq.map(f =>
                castTo(f, asg.getOrElse(f.name, col(s"_t.${f.name}")))): _*)
          case _ => () // DELETE arm
        }
      }

      val deadRows = deadParts.result().reduceOption(_ unionByName _)
      val nDead = deadRows.map(_.count()).getOrElse(0L)
      val addsDf = parts.result().reduceOption(_ unionByName _)
      val nAdds = addsDf.map(_.count()).getOrElse(0L)
      if (nDead == 0 && nAdds == 0) return head

      val dvSets: Seq[(String, Seq[String])] =
        if (nDead == 0) Nil
        else {
          val nParts = math.min(64L, nDead / dvRowsPerFile + 1).toInt
          val dvToken = java.util.UUID.randomUUID().toString.take(12)
          val dvDir = new Path(poolDir(root), dvToken)
          deadRows.get.repartition(nParts)
            .write.mode("errorifexists").parquet(dvDir.toString)
          val dvRel = partFiles(fs, root, dvDir)
          val affectedFiles = deadRows.get.select("file").distinct()
            .collect().map(_.getString(0)).toSeq.sorted
          affectedFiles.map(f => f -> (cur.dvs.getOrElse(f, Nil) ++ dvRel))
        }
      val adds: Seq[String] =
        if (nAdds == 0) Nil
        else {
          val addToken = java.util.UUID.randomUUID().toString.take(12)
          val addDir = new Path(poolDir(root), addToken)
          addsDf.get.write.mode("errorifexists").parquet(addDir.toString)
          partFiles(fs, root, addDir)
        }
      commit(spark, table, "merge_into", adds, Nil, cur.schemaJson, head,
        dvSets = dvSets, checkpointInterval = checkpointInterval)
    } finally persisted.result().foreach(_.unpersist())
  }

  /** Key-batch DELETE with file-level pruning: footer stats on `keyCol`
    * are harvested for the head's live files ([[StatsAgg]], O(version
    * files) of KB footers) and only may-contain files are scanned —
    * the [[merge]] prune applied to the DV path, so a CDC delete batch
    * touches O(affected files), not the table. Stats-less files are
    * always scanned (may-contain, sound). */
  def deleteByKeys(spark: SparkSession, table: String, keyCol: String,
                   keys: Seq[Any],
                   checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    if (keys.isEmpty) return currentVersion(spark, table)
    val head = currentVersion(spark, table)
    val cur = state(spark, table, Some(head))
    val schema = DataType.fromJson(cur.schemaJson).asInstanceOf[StructType]
    val (fs, root) = fsOf(spark, table)
    val absAll = cur.files.map(f => fs.makeQualified(new Path(dataRootOf(root), f)).toString)
    val kstats = cachedHarvest(spark, absAll, keyCol, schema(keyCol).dataType)
    val sortedKeys = keys.toArray.sortWith(StatsAgg.cmp(_, _) < 0)
    val affectedAbs = kstats.filter { r =>
      (r.min, r.max) match {
        case (Some(mn), Some(mx)) => StatsAgg.anyKeyInRange(sortedKeys, mn, mx)
        case _ => true
      }
    }.map(_.path).toSet
    val candidateRel = cur.files.filter(f =>
      affectedAbs.contains(fs.makeQualified(new Path(dataRootOf(root), f)).toString))
    if (candidateRel.isEmpty) return head
    delete(spark, table,
      org.apache.spark.sql.functions.col(keyCol).isin(keys: _*),
      candidates = Some(candidateRel), checkpointInterval = checkpointInterval)
  }

  /** Roll the table back to `toVersion` as a NEW commit (never by
    * deleting history — the bad versions stay auditable and
    * time-travelable until [[expire]]). */
  def rollback(spark: SparkSession, table: String, toVersion: Long,
               checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    val head = currentVersion(spark, table)
    val target = state(spark, table, Some(toVersion))
    val cur = state(spark, table, Some(head))
    val curSet = cur.files.toSet
    val tgtSet = target.files.toSet
    // DV restore: every target file whose dead-row set differs from the
    // head's gets its TARGET set restated (replacement semantics) — a
    // delete since `toVersion` is thereby un-deleted, and a file the
    // target knew as clean is explicitly cleared.
    val dvRestate = target.files.filter { f =>
      target.dvs.getOrElse(f, Nil) != cur.dvs.getOrElse(f, Nil)
    }.map(f => f -> target.dvs.getOrElse(f, Nil))
    commit(spark, table, "rollback",
      adds = target.files.filterNot(curSet), removes = cur.files.filterNot(tgtSet),
      schemaJson = target.schemaJson, expected = head, rollbackOf = Some(toVersion),
      dvSets = dvRestate, checkpointInterval = checkpointInterval)
  }

  // ── footer-stats cache ───────────────────────────────────────────

  /** Per-(file, column) footer-stats cache. A pool file is IMMUTABLE by
    * protocol — a commit token is never reused for different data and
    * data files are never modified in place — so harvested bounds are
    * valid for the file's whole life and a maintenance loop (merge /
    * deleteByKeys / readPruned per tick) pays footer reads for NEW
    * files only, not O(version files) per call. That re-harvest was the
    * one measured per-refresh O(files) term in the steady-state JoinView
    * cycle (round-12 reconciliation). LRU-capped at 1M entries
    * (~100 MB): same driver-memory class as the pruning interval map.
    *
    * EVICTION CONTRACT: the only operations that ever delete a pool
    * file are [[expire]] and [[expireOrphans]], and both evict the
    * dropped paths from this cache (and the session `FileStatusCache`)
    * before returning — so a stale entry for a deleted file cannot
    * exist by construction, not merely because no retained manifest
    * references one. (Tokens are never reused, so a future file can
    * never take a dropped file's path either.) */
  private val footerStatsCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, StatsAgg.FileStats](1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, StatsAgg.FileStats]): Boolean =
        size() > 1000000
    })

  /** [[StatsAgg.harvest]] through the cache: only uncached (file,
    * column) pairs pay a footer read. */
  private[lake] def cachedHarvest(spark: SparkSession, paths: Seq[String],
                            column: String,
                            dt: org.apache.spark.sql.types.DataType): Seq[StatsAgg.FileStats] = {
    def key(p: String) = s"$p|$column"
    val missing = paths.filterNot(p => footerStatsCache.containsKey(key(p)))
    if (missing.nonEmpty)
      StatsAgg.harvest(spark, missing, column, dt)
        .foreach(fs => footerStatsCache.put(key(fs.path), fs))
    // a file whose harvest failed entirely (no FileStats row) maps to a
    // stats-less entry: never pruned, always scanned — sound
    paths.map(p => Option(footerStatsCache.get(key(p)))
      .getOrElse(StatsAgg.FileStats(p, 0L, None, None, None)))
  }

  /** Version-pinned stats table for [[MetastoreFileIndex]], built from
    * the per-file cache (schema comes from the SNAPSHOT, so no
    * inference pass touches footers). Output shape matches
    * [[Metastore.buildFromFooters]]: (filepath, <c>_min, <c>_max …). */
  private def cachedStatsTable(spark: SparkSession, absFiles: Seq[String],
                               schema: StructType,
                               cols: Seq[String]): DataFrame = {
    val present = cols.filter(c => schema.fieldNames.contains(c))
    val byCol = present.map(c =>
      c -> cachedHarvest(spark, absFiles, c, schema(c).dataType)
        .map(fs => fs.path -> fs).toMap).toMap
    val outSchema = StructType(
      StructField("filepath", StringType, nullable = false) +:
        present.flatMap { c =>
          val dt = schema(c).dataType
          Seq(StructField(c + "_min", dt), StructField(c + "_max", dt))
        })
    val rows = absFiles.map { p =>
      Row.fromSeq(p +: present.flatMap { c =>
        val fs = byCol(c)(p)
        Seq(fs.min.orNull, fs.max.orNull)
      })
    }
    // sliced like merge's key frame: a 10⁵-file version's stats rows in
    // one slice would ship a multi-MB single task
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 20000)), outSchema)
  }

  // ── reads ────────────────────────────────────────────────────────

  /** Table-relative path of a scanned row's file, recovered from the
    * reader's `_metadata.file_path` URI by anchoring at the LAST
    * `/data/` segment — the table's data root by construction (commit
    * tokens contain no slash, so no deeper `data/` exists). Immune to
    * URI rendering differences (`file:/…` vs `file:///…` vs
    * `hdfs://host/…`): the suffix is identical in all of them, and it
    * is the SAME expression delete-writing and delete-applying use, so
    * the DV keys match by construction. */
  private def relFileCol: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, regexp_extract}
    regexp_extract(col("_metadata.file_path"), "^.*/(data/.*)$", 1)
  }

  /** All DV rows `(file, pos)` any live file's vector set references.
    * Sound to pool across files: a row is dead for file `f` iff some DV
    * in `f`'s OWN set lists `(f, pos)`, and vector sets only ever grow
    * append-only within a history branch (rollback restores aligned
    * prefixes across every file one commit touched) — so a pooled DV's
    * `f`-rows are in the pool exactly when `f`'s set contains it. */
  private def dvRows(spark: SparkSession, root: Path, snap: Snapshot): DataFrame =
    dvRowsFromPaths(spark, root, snap.dvs.values.flatten.toSeq.distinct)

  private[lake] def dvRowsFromPaths(spark: SparkSession, root: Path,
                                    relPaths: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val paths = relPaths.map(f => new Path(dataRootOf(root), f).toString)
    spark.read.parquet(paths: _*).select(col("file"), col("pos"))
  }

  /** Hard cap on the dead-row map [[deadPositions]] will materialize on
    * the driver. [[maintain]] folds vectors at 1M dead rows, so any
    * well-kept table sits far below this; a table whose vectors grew
    * unbounded (maintenance never ran after an unqualified UPDATE /
    * DELETE trickle) gets a loud refusal instead of a driver OOM. */
  private[lake] val MaxDriverDeadRows = 4000000L

  /** The snapshot's dead positions, collected to the driver as
    * pool-relative file → SORTED position array — the executor-side
    * shape [[SnapshotCatalog]]'s row-based DV fallback scan filters
    * with. Dead-row-sized by the DV contract ([[maintain]] bounds it)
    * and CAPPED at [[MaxDriverDeadRows]]: beyond that the collect is
    * refused with the maintenance pointer — the vectorized read path
    * (`GraftExtensions`' rewrite, or the API's anti-join) never builds
    * this map at all, so only the extension-less SQL fallback can hit
    * the cap. Cached per (table, version): a version's vector set is
    * immutable. Pooling across files is sound for the same reason as
    * [[dvRows]]. */
  private[lake] def deadPositions(spark: SparkSession, root: Path,
                                  snap: Snapshot,
                                  maxRows: Long = MaxDriverDeadRows): Map[String, Array[Long]] = {
    if (snap.dvs.isEmpty) return Map.empty
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val key = fs.makeQualified(root).toString + "@" + snap.version
    val cached = deadPositionsCache.get(key)
    if (cached != null) return cached
    val rows = dvRows(spark, root, snap).limit(maxRows.toInt + 1).collect()
    if (rows.length > maxRows) throw new IllegalStateException(
      s"version ${snap.version} of $root carries more than $maxRows " +
        "deletion-vector rows — too many to apply row-based on the driver. " +
        "Run SnapshotLog.purgeDeletes/maintain to fold the vectors, or enable " +
        "spark.sql.extensions=graft.GraftExtensions, whose vectorized rewrite " +
        "applies vectors as a distributed anti-join without this map")
    val out = rows
      .groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getLong(1)).distinct.sorted }
    deadPositionsCache.put(key, out)
    out
  }

  private val deadPositionsCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Map[String, Array[Long]]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Map[String, Array[Long]]]): Boolean =
        size() > 64
    })

  /** Drop `dv`-listed rows from `scan` (which must expose `_metadata`):
    * per-file positional anti-join, broadcast — the DV side is
    * dead-row-sized (CDC contract; [[compact]] folds it to zero), so no
    * shuffle touches the data. */
  private def minusDeleted(scan: DataFrame, dv: DataFrame,
                           outCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    scan
      .withColumn("_dv_file", relFileCol)
      .withColumn("_dv_pos", col("_metadata.row_index"))
      .join(broadcast(dv),
        col("_dv_file") === dv("file") && col("_dv_pos") === dv("pos"), "left_anti")
      .select(outCols.map(col): _*)
  }

  /** Read a snapshot (default: head). The committed schema of THAT
    * version is imposed on the scan, so time travel returns the table
    * as it was — a column added later does not bleed into old versions,
    * and an empty snapshot still has its schema. Deletion vectors of
    * the version are applied merge-on-read: files without dead rows
    * scan untouched; files with them pay one broadcast positional
    * anti-join (`_metadata.row_index` keyed) and nothing is shuffled. */
  def read(spark: SparkSession, table: String, asOf: Option[Long] = None): DataFrame = {
    val snap = state(spark, table, asOf)
    readSnapshot(spark, table, snap)
  }

  /** [[read]] with row-level provenance: every row carries
    * `_commit_version` — the log version whose manifest FIRST added
    * the row's file (for a branch log, the branch-local version; a
    * fork restatement therefore credits v0 of the branch) — and
    * `_source_file`, the pool-relative path. The audit question this
    * answers ("which ingest produced this row, and from which file?")
    * is the reference's batch-provenance story
    * (lakeshack/metastore.py keys stats rows by filepath) promoted to
    * the versioned format.
    *
    * Resolution is bounded by retention: a file whose adding manifest
    * was [[expire]]d resolves to -1 (unknown-before-horizon), never to
    * a wrong version. Cost: the file→version map is one driver-side
    * replay of the retained manifests (O(log size), same class as
    * [[state]]) broadcast into a file-count-sized join — row bytes are
    * untouched, and deletion vectors apply exactly as in [[read]]. */
  def readLineage(spark: SparkSession, table: String,
                  asOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val snap = state(spark, table, asOf)
    val (fs, root) = fsOf(spark, table)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val outSchema = StructType(schema.fields ++ Seq(
      StructField("_commit_version", LongType), StructField("_source_file", StringType)))
    if (snap.files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    val listing = listLog(fs, root)
    val firstAdd = scala.collection.mutable.LinkedHashMap[String, Long]()
    for (v <- listing.manifests;
         p <- parse(readFile(fs, manifestPath(root, v))))
      p.adds.foreach(f => if (!firstAdd.contains(f)) firstAdd(f) = v)
    val verDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        snap.files.map(f => Row(f, firstAdd.getOrElse(f, -1L))), 1),
      StructType(Seq(StructField("_source_file", StringType),
        StructField("_commit_version", LongType))))
    def abs(f: String) = new Path(dataRootOf(root), f).toString
    def withProvenance(files: Seq[String]) =
      spark.read.schema(schema).parquet(files.map(abs): _*)
        .withColumn("_source_file", relFileCol)
    val clean = snap.files.filterNot(snap.dvs.contains)
    val dirty = snap.files.filter(snap.dvs.contains)
    val parts = Seq.newBuilder[DataFrame]
    if (clean.nonEmpty) parts += withProvenance(clean)
    if (dirty.nonEmpty) {
      val sub = snap.copy(dvs = snap.dvs.filter { case (f, _) => dirty.contains(f) })
      parts += minusDeleted(withProvenance(dirty), dvRows(spark, root, sub),
        schema.fieldNames.toSeq :+ "_source_file")
    }
    parts.result().reduce(_ unionByName _)
      .join(broadcast(verDf), "_source_file")
      .select(outSchema.fieldNames.map(col): _*)
  }

  /** Manifest-fed scan over a KNOWN file list: the paths come from a
    * committed manifest, so the per-call existence probe and glob pass
    * of `spark.read.parquet(paths…)` are pure waste — this constructs
    * the relation directly over an `InMemoryFileIndex` backed by the
    * session [[org.apache.spark.sql.execution.datasources.FileStatusCache]]
    * (immutable files → statuses cacheable), the same recipe as
    * [[MetastoreFileIndex.tableForFiles]] minus the pruning index. On a
    * version with 10⁵ files this turns every read construction from
    * O(files) driver FS calls into cache hits — the metadata-ops term
    * the round-12 joinview_refresh reconciliation named. */
  private[lake] def scanKnownFiles(spark: SparkSession, paths: Seq[String],
                             schema: StructType): DataFrame = {
    import org.apache.spark.sql.execution.datasources.{FileStatusCache, HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    // nullable like `spark.read.schema(…)` forces: a pre-evolution file
    // legitimately lacks a later column (null-filled by the reader), and
    // a non-nullable field would make the vectorized reader REFUSE the
    // file instead
    val readSchema = StructType(schema.fields.map(relaxNullability))
    val idx = new InMemoryFileIndex(spark, paths.map(new Path(_)),
      Map.empty[String, String], Some(readSchema),
      FileStatusCache.getOrCreate(spark), None, None)
    val rel = HadoopFsRelation(idx, StructType(Nil), readSchema, None,
      new ParquetFileFormat(), Map.empty[String, String])(spark)
    org.apache.spark.sql.GraftColumnBridge.ofRows(spark,
      LogicalRelation(rel, isStreaming = false))
  }

  /** Deep nullable relaxation (what DataFrameReader.schema applies). */
  private[lake] def relaxNullability(f: StructField): StructField = {
    import org.apache.spark.sql.types._
    def relax(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(relaxNullability))
      case a: ArrayType => a.copy(elementType = relax(a.elementType), containsNull = true)
      case m: MapType => m.copy(valueType = relax(m.valueType), valueContainsNull = true)
      case other => other
    }
    f.copy(dataType = relax(f.dataType), nullable = true)
  }

  /** [[read]] for an already-resolved snapshot (shared by merge /
    * compact / the change feed so they all see the same dead rows). */
  private[graft] def readSnapshot(spark: SparkSession, table: String,
                                  snap: Snapshot,
                                  onlyFiles: Option[Seq[String]] = None): DataFrame = {
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val files = onlyFiles.getOrElse(snap.files)
    if (files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val root = new Path(table)
    def abs(f: String) = new Path(dataRootOf(root), f).toString
    val clean = files.filterNot(snap.dvs.contains)
    val dirty = files.filter(snap.dvs.contains)
    val parts = Seq.newBuilder[DataFrame]
    if (clean.nonEmpty) parts += scanKnownFiles(spark, clean.map(abs), schema)
    if (dirty.nonEmpty) {
      val sub = snap.copy(dvs = snap.dvs.filter { case (f, _) => dirty.contains(f) })
      parts += minusDeleted(
        scanKnownFiles(spark, dirty.map(abs), schema),
        dvRows(spark, root, sub), schema.fieldNames.toSeq)
    }
    parts.result().reduce(_ unionByName _)
  }

  /** The VECTORIZED form of a DV-carrying catalog read — what
    * `GraftExtensions`' resolution rule substitutes for the row-based
    * [[graft.lake.DvScanBuilder]] fallback. Clean files scan through a
    * [[SnapshotFileIndex]] (zone-map file pruning + full parquet filter
    * pushdown + splitting + columnar batches); dirty files scan the
    * same way with their dead `(file, _metadata.row_index)` pairs
    * dropped by ONE broadcast anti-join ([[minusDeleted]]). Sound under
    * pushdown and splits because `_metadata.row_index` is INTRINSIC to
    * the row (the reader derives it from footer offsets), not a count
    * of delivered rows — row-group skipping cannot desynchronize it,
    * which is exactly what the positional-counter fallback cannot
    * claim. So one deleted row no longer devectorizes a 100 TB version:
    * the DV tax becomes O(dead rows) broadcast + the dirty files'
    * anti-join probe, with every file still pruned, split, and pushed.
    */
  private[lake] def vectorizedCatalogRead(spark: SparkSession, tablePath: String,
                                          schema: StructType, absFiles: Seq[String],
                                          dvs: Map[String, Seq[String]]): DataFrame = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    import org.apache.spark.sql.functions.col
    val root = new Path(tablePath)
    val readSchema = StructType(schema.fields.map(relaxNullability))
    def scan(paths: Seq[String]): DataFrame = {
      val idx = new SnapshotFileIndex(spark, paths, readSchema, Some(tablePath))
      val rel = HadoopFsRelation(idx, StructType(Nil), readSchema, None,
        new ParquetFileFormat(), Map.empty[String, String])(spark)
      org.apache.spark.sql.GraftColumnBridge.ofRows(spark,
        LogicalRelation(rel, isStreaming = false))
    }
    val (dirty, clean) = absFiles.partition(p =>
      dvs.contains(SnapshotTable.relOf(new Path(p).toUri.getPath)))
    val parts = Seq.newBuilder[DataFrame]
    if (clean.nonEmpty)
      parts += scan(clean).select(readSchema.fieldNames.toSeq.map(col): _*)
    if (dirty.nonEmpty)
      parts += minusDeleted(scan(dirty),
        dvRowsFromPaths(spark, root, dvs.values.flatten.toSeq.distinct),
        readSchema.fieldNames.toSeq)
    if (parts.result().isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], readSchema)
    else parts.result().reduce(_ unionByName _)
  }

  /** Time travel WITH transparent zone-map pruning: harvest footer
    * stats for the version's live files only (O(version files), KBs
    * each — never the dead versions') and serve them through a
    * [[MetastoreFileIndex]] over exactly that file set. Point/range
    * queries on `clusterColumn` then skip files at PLANNING time
    * inside any `spark.sql` over the returned frame — the lake's
    * pruning machinery applied to a pinned version. Best after
    * [[compact]] or a clustered write; an unclustered version prunes
    * nothing (sound, just unhelpful). */
  def readPruned(spark: SparkSession, table: String, clusterColumn: String,
                 optionalColumns: Seq[String] = Nil,
                 asOf: Option[Long] = None): DataFrame = {
    val snap = state(spark, table, asOf)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    if (snap.files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val root = new Path(table)
    // fs-qualified (file:/… | hdfs://…) so the harvested stats'
    // filepath keys match the FileIndex's listed URIs — a bare /tmp/x
    // key would silently match nothing and prune nothing (sound, but
    // the whole point lost)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val abs = snap.files.map(f => fs.makeQualified(new Path(dataRootOf(root), f)).toString)
    val stats = cachedStatsTable(spark, abs, schema, clusterColumn +: optionalColumns)
    val base = MetastoreFileIndex.tableForFiles(spark, abs, schema, stats)
    // DV'd version: apply the positional anti-join ON TOP of the pruned
    // relation — pruning still happens at planning time underneath
    // (zone maps of a DV'd file stay sound: may-contain), the broadcast
    // probe only ever matches rows of files that carry vectors
    if (snap.dvs.isEmpty) base
    else minusDeleted(base, dvRows(spark, root, snap), schema.fieldNames.toSeq)
  }

  /** Row-level CHANGE FEED: every insert/delete between two versions,
    * tagged `_change_type` ('insert' | 'delete') and `_commit_version`.
    * This is what makes the format a SOURCE for incremental pipelines —
    * a downstream consumer (see [[IncrementalView]]) reprocesses
    * O(changed rows) per refresh instead of re-reading a 100 TB table.
    *
    * Per-commit cost, by op:
    *  - `append`: the added files are scanned once — change volume.
    *  - `delete`: the NEW dead rows are materialized by ONE semi-join
    *    of the affected files against the commit's new DV (broadcast,
    *    positional) — affected-file volume, not table volume.
    *  - `update` ([[update]]) / `merge_into` ([[mergeInto]]): the same
    *    bounded deletes PLUS the commit's added files (updated copies /
    *    merge inserts) as inserts.
    *  - `compact`: no row change by contract (a clustering rewrite).
    *  - `merge`: multiset except-diff over the affected files only
    *    (removed-side read applies the PRIOR version's DVs, so a dead
    *    row is never re-deleted); rows the rewrite carried unchanged
    *    cancel out, so the feed shows exactly the upserted/deleted
    *    rows. Bounded by the merge's own CDC-batch contract.
    *  - `overwrite` / `rollback`: the diff is table-sized, so the feed
    *    REFUSES them unless `allowFullDiff = true` (then: full-snapshot
    *    except-diff, which also accounts for DV restates/un-deletes).
    *    Both sides must share one schema.
    *  - `purge`: no live-row change by contract (merge-on-read fold).
    *  - `publish:<name>` ([[Branches.publish]]): bounded except-diff
    *    over the AFFECTED files only — adds, removes, and DV-restated
    *    survivors, each side with its own version's vectors applied —
    *    so a WAP batch flows through the feed at O(published diff).
    *  - `fork@<v>` (v0 of a branch log): the restated live set, DVs
    *    applied, as inserts — the branch's creating commit.
    *  - any OTHER label ([[write]]'s `opLabel`): classified by shape —
    *    adds-only commits insert their added files; commits with
    *    removes or DV restates are gated behind `allowFullDiff` like
    *    `overwrite`. An unknown op is never silently skipped.
    *
    * `fromVersion` is EXCLUSIVE (pass -1 to include the creating
    * commit), `toVersion` inclusive (default: head). Rows from
    * pre-evolution versions are null-filled to the `toVersion` schema. */
  def readChanges(spark: SparkSession, table: String, fromVersion: Long,
                  toVersion: Option[Long] = None,
                  allowFullDiff: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val (fs, root) = fsOf(spark, table)
    val head = currentVersion(spark, table)
    val to = toVersion.getOrElse(head)
    require(fromVersion >= -1 && fromVersion <= to && to <= head,
      s"bad change range ($fromVersion, $to] for $table at v$head")
    val outSchema = DataType.fromJson(state(spark, table, Some(to)).schemaJson)
      .asInstanceOf[StructType]
    val outFields = outSchema.fields.toSeq
    def abs(f: String) = new Path(dataRootOf(root), f).toString

    /** Null-fill `df` to the output schema (shared by the tag step and
      * the except-diffs, whose two sides may sit on different commit
      * schemas after an evolution). */
    def align(df: DataFrame): DataFrame =
      df.select(outFields.map(f =>
          if (df.columns.contains(f.name)) col(f.name)
          else lit(null).cast(f.dataType).as(f.name)): _*)

    /** Null-fill `df` to the output schema, then tag it. */
    def conform(df: DataFrame, tpe: String, v: Long): DataFrame =
      align(df)
        .withColumn("_change_type", lit(tpe))
        .withColumn("_commit_version", lit(v))

    // v0 has no predecessor: an empty snapshot stands in (creation)
    def prevState(v: Long): Snapshot =
      if (v == 0) Snapshot(-1L, Nil, "{}") else state(spark, table, Some(v - 1))

    val parts = Seq.newBuilder[DataFrame]

    /** BOTH multiset differences in ONE aggregation —
      * `(after ∖ before, before ∖ after)` with exceptAll's exact
      * semantics (positional columns, null-equal grouping, rows
      * replicated by multiplicity). The two-exceptAll form evaluated
      * EACH side's subtree twice (each exceptAll unions both inputs),
      * so a merge diff read its affected files four times; this reads
      * each side once and signs the counts. Multiplicities materialize
      * as a sequence array per distinct row — fine for row-level
      * feeds, where whole-row duplicate counts are small. */
    def diffParts(after: DataFrame, before: DataFrame, v: Long): Unit = {
      import org.apache.spark.sql.functions.{col, explode, lit, sequence, sum}
      val names = after.columns.toSeq
      val tagged = after.withColumn("_vc", lit(1L))
        .union(before.withColumn("_vc", lit(-1L)))
      val d = tagged.groupBy(names.map(col): _*).agg(sum(col("_vc")).as("_d"))
      def side(keep: org.apache.spark.sql.Column,
               times: org.apache.spark.sql.Column) = d.where(keep)
        .withColumn("_r", explode(sequence(lit(1L), times)))
        .select(names.map(col): _*)
      parts += conform(side(col("_d") > 0, col("_d")), "insert", v)
      parts += conform(side(col("_d") < 0, -col("_d")), "delete", v)
    }
    for (v <- (fromVersion + 1) to to) {
      val p = parse(readFile(fs, manifestPath(root, v))).getOrElse(
        throw new IllegalStateException(s"torn manifest v$v in $table"))
      val schemaV = DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
      def readAdds(): DataFrame =
        spark.read.schema(schemaV).parquet(p.adds.map(abs): _*)
      p.entry.op match {
        case "append" =>
          if (p.adds.nonEmpty) parts += conform(readAdds(), "insert", v)
        case op @ ("delete" | "update" | "merge_into") =>
          // delete: the NEW dead rows only. update/merge_into: ONE
          // atomic commit = those deletes PLUS the updated copies /
          // inserts as added files — all bounded by affected-file
          // volume, never the table, so incremental views maintain
          // straight through SQL UPDATE and MERGE INTO
          val prev = prevState(v)
          val priorDv = prev.dvs.values.flatten.toSet
          val newDv = p.dvSets.flatMap(_._2).distinct.filterNot(priorDv)
          val grown = p.dvSets.collect {
            case (f, set) if set != prev.dvs.getOrElse(f, Nil) => f
          }
          if (newDv.nonEmpty && grown.nonEmpty) {
            val dvNew = spark.read.parquet(newDv.map(abs): _*).select("file", "pos")
            val scan = spark.read.schema(schemaV).parquet(grown.map(abs): _*)
              .withColumn("_dv_file", relFileCol)
              .withColumn("_dv_pos", col("_metadata.row_index"))
            val dead = scan.join(broadcast(dvNew),
                col("_dv_file") === dvNew("file") && col("_dv_pos") === dvNew("pos"),
                "left_semi")
              .select(schemaV.fieldNames.map(col): _*)
            parts += conform(dead, "delete", v)
          }
          if (op != "delete" && p.adds.nonEmpty)
            parts += conform(readAdds(), "insert", v)
        case "compact" => // clustering rewrite: same rows by contract
        case "purge" => // merge-on-read fold: same live rows by contract
        case op if op.startsWith("fork@") =>
          // branch-creating commit (v0 of a branch log): the restated
          // live set with its DVs applied IS the insert set — reachable
          // only via fromVersion = -1 on a branch, i.e. the consumer
          // asked for the creation
          parts += conform(
            readSnapshot(spark, table, state(spark, table, Some(v))), "insert", v)
        case op if op.startsWith("publish:") =>
          // WAP fast-forward (Branches.publish): ONE main commit carrying
          // a branch's net diff — adds, removes, AND DV restates on
          // surviving files. Bounded except-diff over the AFFECTED files
          // only, each side reading its own version's DVs, so new dead
          // rows surface as deletes and un-deletes as inserts. Cost is
          // O(published diff), never O(table).
          val prev = prevState(v)
          val cur = state(spark, table, Some(v))
          val prevSet = prev.files.toSet; val curSet = cur.files.toSet
          val restated = p.dvSets.map(_._1)
          val prevAffected = (p.removes ++ restated.filter(prevSet)).distinct
          val curAffected = (p.adds ++ restated.filter(curSet)).distinct
          val before = align(readSnapshot(spark, table, prev, onlyFiles = Some(prevAffected)))
          val after = align(readSnapshot(spark, table, cur, onlyFiles = Some(curAffected)))
          diffParts(after, before, v)
        case op @ ("merge" | "overwrite" | "rollback") =>
          val prev = prevState(v)
          // a merge with no affected files (pure upsert of absent keys)
          // or the table-creating overwrite: inserts, nothing diffed
          val isCreate = p.removes.isEmpty && (op == "merge" || prev.files.isEmpty)
          if (isCreate) {
            if (p.adds.nonEmpty) parts += conform(readAdds(), "insert", v)
          } else if (op == "merge") {
            // affected files only: removed side with prior DVs applied
            val removed = readSnapshot(spark, table, prev, onlyFiles = Some(p.removes))
            val added = readAdds()
            diffParts(added, removed, v)
          } else {
            require(allowFullDiff,
              s"v$v is a table-sized '$op' — the row diff is O(table); pass " +
                "allowFullDiff = true to compute it anyway, or restart the " +
                "consumer from a full read of the new version")
            val curSnap = state(spark, table, Some(v))
            require(curSnap.schemaJson == prev.schemaJson,
              s"full diff across a schema change at v$v is not supported")
            val before = readSnapshot(spark, table, prev)
            val after = readSnapshot(spark, table, curSnap)
            diffParts(after, before, v)
          }
        case other =>
          // A label [[write]]'s opLabel put on the commit (e.g. the
          // view cursors 'mv:…'/'mvj:…'). File semantics are the mode's
          // by contract, so classify by SHAPE — never silently claim
          // "no row change" for an op we don't know:
          //  - adds-only (append-shaped): the added files are exactly
          //    the new rows;
          //  - anything with removes or DV restates (overwrite-shaped):
          //    a full-snapshot except-diff, gated like 'overwrite'.
          if (p.removes.isEmpty && p.dvSets.isEmpty) {
            if (p.adds.nonEmpty) parts += conform(readAdds(), "insert", v)
          } else {
            require(allowFullDiff,
              s"v$v carries op '$other' with removes/DV restates — the row " +
                "diff cannot be bounded; pass allowFullDiff = true for a " +
                "full-snapshot except-diff, or restart the consumer from a " +
                "full read of the new version")
            val prev = prevState(v)
            val curSnap = state(spark, table, Some(v))
            val before = align(readSnapshot(spark, table, prev))
            val after = align(readSnapshot(spark, table, curSnap))
            diffParts(after, before, v)
          }
      }
    }
    val changeSchema = StructType(outFields :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", LongType, nullable = false))
    parts.result() match {
      case Seq() => spark.createDataFrame(spark.sparkContext.emptyRDD[Row], changeSchema)
      case ps => ps.reduce(_ unionByName _)
    }
  }

  /** Commit history, newest first: (version, ts_millis, op, n_adds,
    * n_removes, rollback_of). Driver-built: the log is O(commits),
    * the same class as the file listing. */
  def history(spark: SparkSession, table: String): DataFrame = {
    val (fs, root) = fsOf(spark, table)
    val rows = listLog(fs, root).manifests.flatMap { v =>
      parse(readFile(fs, manifestPath(root, v))).map { p =>
        Row(p.entry.version, p.entry.tsMillis, p.entry.op,
          p.entry.nAdds.toLong, p.entry.nRemoves.toLong,
          p.entry.rollbackOf.map(Long.box).orNull)
      }
    }.reverse
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("ts_millis", LongType, nullable = false),
        StructField("op", StringType, nullable = false),
        StructField("n_adds", LongType, nullable = false),
        StructField("n_removes", LongType, nullable = false),
        StructField("rollback_of", LongType, nullable = true))))
  }

  // ── retention ────────────────────────────────────────────────────

  /** Drop history older than the last `keepLast` versions and delete
    * the data files only they referenced. A checkpoint is first
    * written AT the new horizon so every retained version still
    * resolves without the dropped manifests. Files referenced by ANY
    * retained version survive. Throws `ConcurrentModificationException`
    * if a commit lands while expiring (single-maintainer, like
    * compaction).
    *
    * Crash mid-expire is safe for every RETAINED version (their files
    * are never in the delete set and the horizon checkpoint lands
    * before any delete); an expiring-version manifest that outlives a
    * crash may reference already-deleted files — its reads fail at
    * scan time, never silently partial — and re-running the same
    * `expire` completes the cleanup. */
  def expire(spark: SparkSession, table: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val (fs, root) = fsOf(spark, table)
    require(!isBranchRoot(root),
      s"run retention on the table root, not branch $table — the data " +
        "pool is shared and a branch-scoped expire would delete files " +
        "other refs still reference")
    val head = currentVersion(spark, table)
    val listing = listLog(fs, root)
    // a TAGGED version must stay time-travelable: retention never drops
    // below the oldest tag (contiguous retention keeps replay sound —
    // dropping an interior tagged version would need per-tag
    // checkpoints; refusing is simpler and what the tag promises)
    val tagFloor = Branches.tagVersions(spark, table).values
      .foldLeft(Long.MaxValue)(math.min)
    val retained = listing.manifests
      .filter(v => v > head - keepLast || v >= tagFloor)
    if (retained.isEmpty || retained.head == listing.manifests.head) return Nil
    val horizon = retained.head

    // checkpoint exactly AT the horizon: replaying any retained version
    // must never need a dropped manifest, and the horizon version itself
    // retains no manifests below it. A checkpoint WITHOUT the cumulative
    // token set (written before token indexing existed) counts as
    // MISSING here: dropping manifests below it would lose their batch
    // tokens forever and reopen appendBatch's replay/double-commit hole
    // on upgraded logs — so it is rewritten (delete + reclaim) with the
    // token set computed while every manifest still exists. Readers are
    // never hurt by the gap between delete and reclaim: a missing
    // checkpoint just falls back to manifest replay, and no manifest is
    // deleted until the token-carrying checkpoint is in place.
    val horizonCp = listing.checkpoints.find(_ == horizon)
      .flatMap(v => parse(readFile(fs, checkpointPath(root, v))))
    if (!horizonCp.exists(_.tokensKnown)) {
      val snap = state(spark, table, Some(horizon))
      // cumulative token set rides the horizon checkpoint so
      // appendBatch's exactly-once skip survives the manifest drop
      // below — a replayed pre-horizon batch must still be a no-op
      val tokens = tokenSetAt(fs, root, Some(horizon)).toSeq.sorted
      if (horizonCp.isDefined) fs.delete(checkpointPath(root, horizon), false)
      val e = Entry(horizon, System.currentTimeMillis(), "checkpoint",
        snap.files.size, 0, None)
      require(tryClaim(fs, checkpointPath(root, horizon),
        render(e, snap.schemaJson, snap.files, Nil, snap.dvs.toSeq,
          tokens = Some(tokens))),
        s"could not write the horizon checkpoint v$horizon for $table — " +
          "refusing to drop manifests whose tokens it must carry")
    }

    def allFiles(s: Snapshot): Seq[String] = s.files ++ s.dvs.values.flatten
    // files any BRANCH references survive main retention: a branch
    // forked from an old version keeps reading its fork state even
    // after main's manifests for that version are gone (the fork
    // commit is self-contained)
    val keepFiles = retained.flatMap(v => allFiles(state(spark, table, Some(v)))).toSet ++
      branchReferencedFiles(fs, root)
    val dropFiles = listing.manifests.filter(_ < horizon)
      .flatMap(v => allFiles(state(spark, table, Some(v))))
      .distinct.filterNot(keepFiles)

    if (currentVersion(spark, table) != head)
      throw new java.util.ConcurrentModificationException(
        s"$table advanced past v$head while expiring — re-run")

    dropFiles.foreach(f => fs.delete(new Path(root, f), false))
    listing.manifests.filter(_ < horizon).foreach(v => fs.delete(manifestPath(root, v), false))
    listing.checkpoints.filter(_ < horizon).foreach(v => fs.delete(checkpointPath(root, v), false))
    evictCaches(spark, fs, root, dropFiles)
    dropFiles
  }

  /** Drop every cached fact about the (just deleted) pool files — the
    * eviction half of the footer-stats cache's contract. Targeted for
    * the per-file caches; the session [[org.apache.spark.sql.execution
    * .datasources.FileStatusCache]] only offers invalidateAll, which is
    * the right blunt tool on a maintenance cadence (the next read
    * re-lists and re-caches). */
  private def evictCaches(spark: SparkSession, fs: FileSystem, root: Path,
                          droppedRel: Seq[String]): Unit = {
    if (droppedRel.isEmpty) return
    val absSet = droppedRel.map(f =>
      fs.makeQualified(new Path(dataRootOf(root), f)).toString).toSet
    def evict[V](m: java.util.Map[String, V], pathOf: String => String): Unit =
      m.synchronized {
        val it = m.keySet.iterator()
        while (it.hasNext) if (absSet.contains(pathOf(it.next()))) it.remove()
      }
    evict(footerStatsCache, _.takeWhile(_ != '|'))
    evict(footerRowCountCache, identity)
    org.apache.spark.sql.execution.datasources.FileStatusCache
      .getOrCreate(spark).invalidateAll()
  }

  /** Every pool-relative file path any live branch's log references
    * (adds, removes, and DV files of every branch manifest). Retention
    * on the main table must treat these as live. */
  private def branchReferencedFiles(fs: FileSystem, root: Path): Set[String] = {
    val bdir = new Path(root, Branches.BranchesDir)
    if (!fs.exists(bdir)) return Set.empty
    fs.listStatus(bdir).iterator.filter(_.isDirectory).flatMap { st =>
      val broot = st.getPath
      listLog(fs, broot).manifests.flatMap(v =>
        parse(readFile(fs, manifestPath(broot, v))).toSeq
          .flatMap(p => p.adds ++ p.removes ++ p.dvFiles))
    }.toSet
  }

  /** Reclaim token dirs no manifest (in any retained version) ever
    * references and that are older than `graceMs` — the stranded output
    * of writers that died before their commit. Grace must exceed the
    * longest write-to-commit gap, same rule as [[Vacuum]]. */
  def expireOrphans(spark: SparkSession, table: String, graceMs: Long): Seq[String] = {
    val (fs, root) = fsOf(spark, table)
    require(!isBranchRoot(root),
      s"run orphan reclamation on the table root, not branch $table")
    val dataDir = new Path(root, "data")
    if (!fs.exists(dataDir)) return Nil
    val listing = listLog(fs, root)
    // every token referenced by any manifest, committed or torn — a torn
    // head manifest's token may be about to be re-claimed; grace covers
    // it. Branch manifests count: an unpublished branch's appends live
    // in the shared pool referenced by the branch log alone.
    val referenced: Set[String] = (listing.manifests.flatMap { v =>
      parse(readFile(fs, manifestPath(root, v))).toSeq
        .flatMap(p => p.adds ++ p.removes ++ p.dvFiles)
    } ++ branchReferencedFiles(fs, root)).map(_.split('/') match {
      case Array("data", tok, _*) => tok
      case _ => ""
    }).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    val dropped = Seq.newBuilder[String]
    for (st <- fs.listStatus(dataDir) if st.isDirectory) {
      val tok = st.getPath.getName
      if (!referenced.contains(tok) && st.getModificationTime < cutoff) {
        fs.delete(st.getPath, true)
        dropped += st.getPath.toString
      }
    }
    val out = dropped.result()
    // same eviction contract as expire — a reclaimed token dir's files
    // must not survive in any per-file cache (prefix match: the caches
    // key by absolute file path, all under the deleted dir)
    if (out.nonEmpty) {
      val prefixes = out.map(d => fs.makeQualified(new Path(d)).toString + "/")
      def evict[V](m: java.util.Map[String, V], pathOf: String => String): Unit =
        m.synchronized {
          val it = m.keySet.iterator()
          while (it.hasNext) {
            val p = pathOf(it.next())
            if (prefixes.exists(p.startsWith)) it.remove()
          }
        }
      evict(footerStatsCache, _.takeWhile(_ != '|'))
      evict(footerRowCountCache, identity)
      org.apache.spark.sql.execution.datasources.FileStatusCache
        .getOrCreate(spark).invalidateAll()
    }
    out
  }
}
