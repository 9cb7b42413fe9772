package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for named declared queries to
  * files — the plan evidence the optimization rounds commit under
  * `plans/<round>/`. Mirrors [[Bench]]'s session configuration so the
  * captured plan is the plan the bench executes (same shuffle
  * partitions, same extensions).
  *
  * Usage: `runMain graft.PlanDump <sfDir> <outDir> <q1,q2,...> [suffix]`
  * writes `<outDir>/<query><suffix>.txt` per query (suffix e.g.
  * "_before" / "_after").
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val suffix = if (args.length > 3) args(3) else ""
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    for (n <- names) {
      val fn = SparkEntry.queries.getOrElse(n, SparkEntry.scaleProbes(n))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.write(Paths.get(outDir, s"$n$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      System.err.println(s"[plandump] wrote $outDir/$n$suffix.txt")
    }
    spark.stop()
  }
}
