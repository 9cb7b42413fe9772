package graft.streaming

import graft.SparkSpec
import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** The hash samplers are narrow, stateless column expressions, which
  * makes them streaming-safe FOR FREE — an ingest pipeline applies the
  * same mixture weights / split boundaries to a document stream with no
  * state store, and (because membership is a pure function of the key)
  * the streamed decisions are IDENTICAL to a batch re-run over the same
  * rows. This spec pins both properties so a future sampler "upgrade"
  * that sneaks in a window or an RNG fails here, not in production
  * ingest. (The positional operators — tokenBudgetSample, assignShards,
  * stratifiedSample — are deliberately NOT streaming-safe: their
  * windows need corpus totals; their streaming story is micro-batch
  * accumulation into the lake, then batch placement, like Compactor.)
  */
class SamplerStreamSpec extends SparkSpec {

  test("mixtureSample and splitAssign run unchanged on a stream, matching batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = (0L until 400L).map(i => (i, s"src${i % 4}"))
    val stream = MemoryStream[(Long, String)]
    val streamed = Sampling.splitAssign(
      Sampling.mixtureSample(stream.toDS().toDF("doc_id", "source"),
        col("doc_id"), col("source"),
        Map("src0" -> 1.0, "src1" -> 0.5), defaultFraction = 0.2),
      col("doc_id"), Seq("train" -> 0.9, "val" -> 0.1))

    val q = streamed.writeStream.format("memory")
      .queryName("sampled_stream").outputMode("append").start()
    try {
      stream.addData(rows.take(150): _*)
      q.processAllAvailable()
      stream.addData(rows.drop(150): _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sampled_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val batch = Sampling.splitAssign(
      Sampling.mixtureSample(rows.toDF("doc_id", "source"),
        col("doc_id"), col("source"),
        Map("src0" -> 1.0, "src1" -> 0.5), defaultFraction = 0.2),
      col("doc_id"), Seq("train" -> 0.9, "val" -> 0.1))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === batch, "streamed sampling must equal the batch re-derivation")
    assert(got.nonEmpty && got.size < rows.size, "the mixture actually filtered")
  }
}
