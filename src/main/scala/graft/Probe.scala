package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}
object Probe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val d = s.read.parquet(s"$dir/documents.parquet")
    val planted = d.select(col("doc_id"), col("text"))
      .union(d.select((col("doc_id") + 100000).as("doc_id"), col("text")))
      .repartition(8, col("doc_id"))
    // exact jaccard at 0.5 on planted (df cutoff 2000 = effectively none at this scale)
    val exact = Dedup.ngramJaccard(planted, "doc_id", "text", n = 3, threshold = 0.5, maxShingleDf = 2000)
      .select("doc_a", "doc_b", "jaccard").cache()
    val nExact = exact.count()
    val mh = Dedup.minhashCandidates(planted, "doc_id", "text").cache()
    val nMh = mh.count()
    val caught = exact.join(mh, Seq("doc_a", "doc_b")).count()
    println(s"PROBE exact_j05=$nExact mh_cand=$nMh mh_caught=$caught")
    println("PROBE missed pairs (exact not in candidates):")
    exact.join(mh, Seq("doc_a", "doc_b"), "left_anti").orderBy("doc_a").show(20, false)
    // jaccard distribution of exact pairs
    exact.groupBy(floor(col("jaccard") * 10).as("jbin")).count().orderBy("jbin").show()
    // simhash: exact-dup pairs (identical normalized tokens)
    val sh = Dedup.simhashCandidates(Dedup.simhash(planted, "doc_id", "text")).cache()
    println(s"PROBE sh_cand=${sh.count()}")
    val norm = planted.select(col("doc_id"),
      md5(array_join(TextAnalysis.tokensCol(col("text")), " ")).as("m"))
    val dup = norm.as("a").join(norm.as("b"),
        col("a.m") === col("b.m") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).cache()
    val nDup = dup.count()
    val dupCaught = dup.join(sh, Seq("doc_a", "doc_b")).count()
    val dupCaught0 = dup.join(sh.where(col("hamming") === 0), Seq("doc_a", "doc_b")).count()
    println(s"PROBE exact_dups=$nDup sh_caught=$dupCaught sh_caught_h0=$dupCaught0")
    // simhash recall vs high-jaccard organic pairs
    val hi = exact.where(col("jaccard") >= 0.9)
    println(s"PROBE j09=${hi.count()} sh_j09_caught=${hi.join(sh, Seq("doc_a","doc_b")).count()}")
    s.stop()
  }
}
