package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** CROSS-PROCESS commit-claim race: two JVMs (this test JVM + a forked
  * [[RaceWriter]] child) hammer metadata-only commits at one shared
  * table. [[ConcurrentSqlWriteSpec]] races THREADS in one JVM — enough
  * to catch check-then-act claims, but the claim protocol's
  * cross-process atomicity (and the torn-reclaim grace's behavior under
  * a genuinely separate process) only a second JVM can exercise. The
  * audit: every commit from both writers lands EXACTLY once, versions
  * are contiguous, no claim is lost or double-issued.
  *
  * Runs once per [[ClaimStore]] implementation: the POSIX O_EXCL+fence
  * default, and the conditional-put emulation (atomic hard-link publish
  * = `If-None-Match` one-winner/full-body semantics) — the seam an
  * object-store deployment swaps, raced with the same audit. */
class MultiProcessClaimSpec extends SparkSpec {
  import spark.implicits._

  private def raceTwoJvms(root: String, store: String): Unit = {
    val table = s"$root/t"
    val perWriter = 12
    val hc = spark.sparkContext.hadoopConfiguration
    val prev = Option(hc.get("graft.claim.store"))
    hc.set("graft.claim.store", store)
    try {
      SnapshotLog.write(Seq((1L, "seed")).toDF("id", "s"), table, "overwrite") // v0
      val schemaJson = SnapshotLog.state(spark, table).schemaJson

      // forked child: same classpath + the JDK17 opens Spark needs
      val javaBin = new java.io.File(
        new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
      val opens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = (Seq(javaBin) ++ opens ++ Seq(
        "-Xmx1g", "-Dspark.ui.enabled=false",
        "-cp", sys.props("java.class.path"),
        "graft.lake.RaceWriter", table, "child", perWriter.toString, store)).toList
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      val child = pb.start()

      // parent writer races in THIS JVM while the child runs
      for (i <- 0 until perWriter) {
        var committed = false
        while (!committed) {
          val head = SnapshotLog.currentVersion(spark, table)
          try {
            SnapshotLog.commit(spark, table, s"race-parent-$i", Nil, Nil,
              schemaJson, head)
            committed = true
          } catch {
            case _: java.util.ConcurrentModificationException =>
              Thread.sleep(5L + scala.util.Random.nextInt(20))
          }
        }
      }
      val rc = child.waitFor()
      assert(rc == 0, s"child writer JVM exited $rc")

      val hist = SnapshotLog.history(spark, table)
        .select("version", "op").as[(Long, String)].collect().sortBy(_._1)
      val versions = hist.map(_._1).toSeq
      assert(versions == (0L to (2L * perWriter)),
        s"versions must be contiguous 0..${2 * perWriter}, got $versions")
      val ops = hist.map(_._2).toSeq
      val expected = (0 until perWriter).map(i => s"race-parent-$i") ++
        (0 until perWriter).map(i => s"race-child-$i")
      // exactly once each: no lost commit, no double claim
      assert(ops.filter(_.startsWith("race-")).sorted == expected.sorted,
        s"ops mismatch: $ops")
      // and the head still reads
      assert(SnapshotLog.read(spark, table).count() == 1L)
    } finally prev match {
      case Some(v) => hc.set("graft.claim.store", v)
      case None => hc.unset("graft.claim.store")
    }
  }

  test("two JVMs racing one table: every commit accounted, versions contiguous") {
    raceTwoJvms(tmpDir("mpclaim"), "posix")
  }

  test("two JVMs racing through the CONDITIONAL-PUT claim store") {
    raceTwoJvms(tmpDir("mpclaim_cput"), "conditional-put")
  }

  test("maintenance races a STREAMING ingest from another JVM: every row exactly once") {
    val root = tmpDir("mpstream")
    val table = s"$root/t"
    val epochs = 10
    val per = 20
    // seed with deliberately small files so compactBin has work, and
    // rows the parent can delete so purgeDeletes has vectors to purge
    SnapshotLog.write((0 until 50).map(i => (1000000L + i, s"seed$i"))
      .toDF("id", "s").repartition(5), table, "overwrite")

    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ opens ++ Seq(
      "-Xmx1g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.lake.StreamIngestWriter", root, "t",
      epochs.toString, per.toString)).toList
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val child = pb.start()

    // the parent's maintenance loop, racing the child's micro-batch
    // epochs: DV deletes, bin-compaction, purges — every op planned
    // against a head the child keeps moving, so CMEs are EXPECTED and
    // absorbed; what may never happen is a lost or doubled row
    var deleted = 0
    var ops = 0
    try {
      while (child.isAlive) {
        try {
          if (deleted < 10) {
            SnapshotLog.delete(spark, table, col("id") === (1000000L + deleted))
            deleted += 1
          }
          SnapshotLog.compactBin(spark, table,
            targetBytes = 1L * 1024 * 1024, smallBytes = 512L * 1024)
          SnapshotLog.purgeDeletes(spark, table)
          ops += 3
        } catch {
          case _: java.util.ConcurrentModificationException => ()
          case _: java.io.FileNotFoundException => () // a racer moved the head mid-plan
        }
        Thread.sleep(50)
      }
    } finally {
      val rc = child.waitFor()
      assert(rc == 0, s"streaming-ingest child JVM exited $rc")
    }
    assert(ops >= 3, "the maintenance loop must have actually raced the ingest")

    // audit: every ingested id exactly once, surviving seeds intact
    val rows = SnapshotLog.read(spark, table)
      .select("id").as[Long].collect().toSeq
    assert(rows.size == rows.distinct.size, "no row may land twice")
    val ingested = rows.filter(_ < 1000000L).sorted
    assert(ingested == (0L until (epochs.toLong * per)).toSeq,
      s"every streamed row exactly once (got ${ingested.size} of ${epochs * per})")
    val seeds = rows.filter(_ >= 1000000L)
    assert(seeds.size == 50 - deleted,
      s"seeds must survive minus the $deleted deleted (got ${seeds.size})")
    assert(seeds.forall(id => id - 1000000L >= deleted))
    // staging accounting: maintenance ops that LOST their commit race
    // abandon their rewrite token dirs — expected debris the vacuum
    // path owns. The audit: expireOrphans reclaims them WITHOUT
    // touching any live row, and a second sweep finds nothing left
    // (streaming stage dirs all renamed into their epoch tokens — a
    // leak here would re-appear as a second-sweep orphan)
    val before = SnapshotLog.read(spark, table).count()
    SnapshotLog.expireOrphans(spark, table, graceMs = 0L)
    assert(SnapshotLog.read(spark, table).count() == before,
      "orphan reclaim must not touch live rows")
    assert(SnapshotLog.expireOrphans(spark, table, graceMs = 0L).isEmpty,
      "after one sweep the pool must hold no unreferenced dirs")
  }

  test("conditional-put one-winner semantics under a same-name thread storm") {
    val dir = tmpDir("cput_storm")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (round <- 0 until 5) {
      val p = new org.apache.hadoop.fs.Path(s"$dir/v$round.mf")
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val ts = (0 until 16).map { i =>
        new Thread(() => {
          gate.await()
          if (ConditionalPutClaimStore.tryClaim(fs, p, s"body-$i")) { wins.incrementAndGet(); () }
        })
      }
      ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join())
      assert(wins.get() == 1, s"round $round: exactly one putter must win, got ${wins.get()}")
      // full-body visibility: whatever won is a COMPLETE body, and no
      // temp names leak
      val body = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p.toUri.getPath)), "UTF-8")
      assert(body.startsWith("body-"), s"round $round: torn/empty body '$body'")
      val leaked = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.contains(".put-"))
      assert(leaked.isEmpty, s"temp names leaked: ${leaked.toSeq}")
    }
  }
}
