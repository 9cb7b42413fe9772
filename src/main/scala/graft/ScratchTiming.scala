package graft
import org.apache.spark.sql.SparkSession
import graft.lake.Metastore
object ScratchTiming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").appName("scratch").getOrCreate()
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMING $label ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    for (pass <- 1 to 3)
      time(s"full_build_p$pass") {
        Metastore.build(spark, s"$dir/lineitem.parquet", "l_orderkey", Seq("l_shipdate")).count()
      }
    spark.stop()
  }
}
