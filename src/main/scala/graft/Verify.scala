package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (builder-side
    // iteration aid; the driver always passes exactly two args)
    val (sfDir, outDir, only) = args match {
      case Array(sf, out)    => (sf, out, None)
      case Array(sf, out, f) => (sf, out, Some(f.split(',').toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Testdata-drift canary: name any schema drift LOUDLY before the
    // query loop — a silent dtype change cost round 8 eleven signals.
    val drifts = TestdataCanary.check(spark, sfDir)
    drifts.foreach(d => System.err.println(s"[verify] TESTDATA DRIFT: $d"))
    if (drifts.nonEmpty)
      Files.writeString(Paths.get(s"$outDir/_testdata_drift.txt"),
        drifts.mkString("", "\n", "\n"))
    var failed = List.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // A swallowed failure makes the query VANISH from the driver's
        // correctness compare (it skips absent result dirs) — write a
        // marker file so the breakage is visible in the artifact, and
        // keep a summary line at the end of the run.
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        failed ::= name
        try Files.writeString(Paths.get(s"$outDir/$name._error"),
          s"${e.getClass.getName}: ${e.getMessage}\n")
        catch { case _: Throwable => () }
      }
    }
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] ${failed.size} quer${if (failed.size == 1) "y" else "ies"} FAILED: " +
          failed.sorted.mkString(", "))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
