package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Child-process STREAMING writer for [[MultiProcessClaimSpec]]'s
  * maintenance-vs-ingest race: its own JVM runs a real
  * `writeStream.toTable` query against a shared snapshot-catalog table,
  * feeding one micro-batch per epoch with a known id range, while the
  * parent JVM hammers `compactBin`/`delete`/`purgeDeletes` at the same
  * log. Exit 0 = every epoch committed (the stream-epoch commit path's
  * claim-retry loop absorbed every concurrent-maintenance conflict).
  * Args: table root dir, table name, epochs, rows per epoch. */
object StreamIngestWriter {
  def main(args: Array[String]): Unit = {
    val Array(root, tname, epochsStr, perStr) = args
    val epochs = epochsStr.toInt
    val per = perStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("stream-ingest-writer")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.ingchild", classOf[SnapshotCatalog].getName)
      .config("spark.sql.catalog.ingchild.root", root)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = MemoryStream[Long]
      val q = ms.toDF()
        .select(col("value").as("id"), concat(lit("s"), col("value")).as("s"))
        .writeStream
        .option("checkpointLocation", s"$root/_ckpt_child")
        .toTable(s"ingchild.$tname")
      try {
        for (e <- 0 until epochs) {
          ms.addData((e.toLong * per) until ((e + 1).toLong * per): _*)
          q.processAllAvailable()
          Thread.sleep(20) // give the parent's maintenance a window
        }
      } finally q.stop()
    } finally spark.stop()
  }
}
