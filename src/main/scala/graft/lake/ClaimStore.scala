package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/** The manifest-claim protocol — THE commit point of the snapshot log
  * ([[SnapshotLog.commit]]), extracted behind an interface so the one
  * seam a deployment target swaps is an actual seam, not a comment.
  *
  * Contract: `tryClaim(fs, p, body)` atomically publishes `body` at
  * name `p` and returns true iff THIS call created the object — under
  * any number of concurrent claimants (threads OR processes OR hosts),
  * exactly one wins and the rest see false. A reader may observe the
  * name before the body is complete only on stores whose create is a
  * name-then-stream pair (the POSIX implementation); the log's torn-
  * manifest machinery ([[SnapshotLog.nextVersionReclaiming]]) handles
  * that window. Conditional-put stores publish full-body-or-nothing.
  *
  * Selection rides the Hadoop configuration key `graft.claim.store`
  * (`posix` — default — or `conditional-put`), so two racing DRIVERS
  * resolve the same store from the same filesystem config with no
  * shared JVM state. The reference's deployment target is S3
  * (lakeshack/lakeshack.py:36-40); on S3/GCS/Azure the conditional-put
  * implementation is the native one (`If-None-Match: *`).
  */
trait ClaimStore {
  def tryClaim(fs: FileSystem, p: Path, body: String): Boolean
}

object ClaimStore {
  /** Resolve the store for a filesystem — config-keyed, never cached:
    * the same JVM may commit to a `file:` test table and an emulated
    * object store in one session. */
  def of(fs: FileSystem): ClaimStore =
    fs.getConf.get("graft.claim.store", "posix") match {
      case "conditional-put" => ConditionalPutClaimStore
      case _ => PosixExclusiveClaimStore
    }
}

/** Create-no-overwrite claim for filesystems with POSIX-or-better
  * create semantics — the default store.
  *
  * On the `file:` scheme hadoop's `create(p, overwrite = false)` is
  * CHECK-THEN-ACT (ChecksumFileSystem tests existence, then creates)
  * — two same-version claimants racing through the window both
  * "win" and the second SILENTLY OVERWRITES the first: a lost
  * commit. There the name is claimed through POSIX O_EXCL
  * (`Files.createFile`, atomic), and the body lands through the
  * normal checksummed stream over the placeholder we now own; a
  * reader of the UUID placeholder sees a torn manifest (magic check)
  * exactly like any mid-write read. HDFS `create` is atomic already
  * and takes the plain path.
  *
  * OWNERSHIP FENCE (local scheme): the placeholder carries this
  * claimant's UUID, re-verified immediately before the body
  * overwrite and the whole body re-verified after it — a claimant
  * stalled past [[SnapshotLog.TornReclaimGraceMs]] between winning the
  * name and writing the body can have its placeholder reclaimed and
  * re-claimed by another committer; without the fence the stalled
  * writer's late `create(overwrite = true)` would silently bury that
  * committer's fully-written manifest (a lost commit). With it, the
  * stalled writer sees a foreign UUID (or a foreign body) and loses
  * loudly: `false` sends the caller back through the head re-read.
  * The residual race window shrinks from the multi-second stall to
  * the microseconds between verify and write — and entering it at
  * all requires a >5 s stall inside a millisecond code path. */
object PosixExclusiveClaimStore extends ClaimStore {
  override def tryClaim(fs: FileSystem, p: Path, body: String): Boolean = {
    val localExclusive = fs.getScheme == "file"
    val raw = java.nio.file.Paths.get(p.toUri.getPath)
    val fence = java.util.UUID.randomUUID().toString
    if (localExclusive) {
      try {
        java.nio.file.Files.createFile(raw) // POSIX O_EXCL: the atomic claim
        java.nio.file.Files.write(raw, fence.getBytes(StandardCharsets.UTF_8))
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => return false
        case _: java.io.IOException => return false
      }
      // fence check: the placeholder must still carry OUR uuid — a
      // reclaimed-and-re-claimed name means another committer owns the
      // version now (we stalled past the torn-reclaim grace)
      val owned = try new String(java.nio.file.Files.readAllBytes(raw),
        StandardCharsets.UTF_8) == fence
      catch { case _: java.io.IOException => false }
      if (!owned) return false
    }
    val out =
      try fs.create(p, localExclusive) // we own the placeholder; else exclusive
      catch { case _: java.io.IOException => return false }
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (localExclusive) {
      // post-write fence: the bytes on disk must be OUR body, not a
      // concurrent re-claimant's — on mismatch the other writer won
      try new String(java.nio.file.Files.readAllBytes(raw),
        StandardCharsets.UTF_8) == body
      catch { case _: java.io.IOException => false }
    } else true
  }
}

/** Conditional-put claim: the object-store protocol (S3/GCS/Azure
  * `PUT … If-None-Match: *`, losers get HTTP 412) — the whole body
  * becomes visible ATOMICALLY or not at all, exactly one concurrent
  * putter succeeds, and no torn manifest can ever exist (a dead writer
  * leaves NOTHING at the name, so the torn-reclaim path is simply
  * never taken).
  *
  * This class exercises those semantics against a LOCAL emulation so
  * the protocol is testable without a bucket: the body lands complete
  * at a private temp name, then `link(2)` publishes it — hard-link
  * creation is atomic and fails with EEXIST when the name is taken,
  * the exact one-winner/full-body pair of a conditional PUT. A real
  * bucket deployment implements [[ClaimStore.tryClaim]] as the store's
  * native conditional request; every caller in [[SnapshotLog]] is
  * already correct under the stricter semantics (no placeholder, no
  * mid-write visibility). */
object ConditionalPutClaimStore extends ClaimStore {
  override def tryClaim(fs: FileSystem, p: Path, body: String): Boolean = {
    require(fs.getScheme == "file",
      "the conditional-put EMULATION is file:-local; a bucket deployment " +
        "implements tryClaim as the store's native conditional PUT")
    val target = java.nio.file.Paths.get(p.toUri.getPath)
    java.nio.file.Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(
      s".${target.getFileName}.put-${java.util.UUID.randomUUID()}")
    try {
      java.nio.file.Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      try { java.nio.file.Files.createLink(target, tmp); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false // HTTP 412
        case _: java.io.IOException => false
      }
    } finally {
      try { java.nio.file.Files.deleteIfExists(tmp); () }
      catch { case _: java.io.IOException => () }
    }
  }
}
