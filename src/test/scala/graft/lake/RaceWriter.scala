package graft.lake

import org.apache.spark.sql.SparkSession

/** Child-process writer for [[MultiProcessClaimSpec]]: its own JVM, its
  * own SparkSession, hammering metadata-only commits at a shared table —
  * the real deployment shape of the claim protocol (two DRIVERS racing
  * one log, where an in-JVM test can only race threads). Each commit op
  * is `race-<writer>-<i>`; the parent audits that every one landed
  * exactly once. Exit 0 = all commits claimed. */
object RaceWriter {
  def main(args: Array[String]): Unit = {
    // optional 4th arg: claim-store name ("posix" | "conditional-put")
    val (table, writerId, nStr, store) = args match {
      case Array(t, w, n)    => (t, w, n, "posix")
      case Array(t, w, n, s) => (t, w, n, s)
    }
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"race-writer-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.hadoopConfiguration.set("graft.claim.store", store)
    try {
      val schemaJson = SnapshotLog.state(spark, table).schemaJson
      for (i <- 0 until n) {
        var committed = false
        while (!committed) {
          val head = SnapshotLog.currentVersion(spark, table)
          try {
            SnapshotLog.commit(spark, table, s"race-$writerId-$i",
              Nil, Nil, schemaJson, head)
            committed = true
          } catch {
            case _: java.util.ConcurrentModificationException =>
              Thread.sleep(5L + scala.util.Random.nextInt(20))
          }
        }
      }
    } finally spark.stop()
  }
}
