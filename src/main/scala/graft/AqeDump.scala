package graft
import org.apache.spark.sql.SparkSession

/** Dev tool ([[PlanDump]]'s executed twin): run a declared query or
  * scale probe to completion and dump its AQE FINAL plan (PlanDump
  * shows `isFinalPlan=false` pre-execution plans; skew-split /
  * coalesce evidence only exists in the executed one).
  *
  * Usage: `runMain graft.AqeDump <dataDir> <query> <outFile>`. */
object AqeDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val name = args(1); val out = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries.getOrElse(name, SparkEntry.scaleProbes(name))(spark, dir)
    val t0 = System.nanoTime()
    val n = df.collect().length
    System.err.println(f"[aqedump] $name ran in ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      df.queryExecution.executedPlan.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
