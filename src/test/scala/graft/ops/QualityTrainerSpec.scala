package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityTrainerSpec extends SparkSpec {

  import QualityTrainer._

  // a linearly separable toy corpus: fluent docs full of 'alpha', spam
  // docs full of 'spam'
  private def corpus() = {
    import spark.implicits._
    Seq(
      (1L, "alpha alpha alpha beta", 1),
      (2L, "alpha beta alpha alpha", 1),
      (3L, "alpha alpha beta beta", 1),
      (4L, "spam spam spam beta", 0),
      (5L, "spam beta spam spam", 0),
      (6L, "spam spam beta beta", 0)).toDF("doc_id", "text", "label")
  }

  test("training separates a separable corpus; loss falls; signs correct") {
    val docs = corpus()
    val r3 = train(docs, Seq("alpha", "spam"), col("label") === 1, epochs = 3, lr = 5.0)
    val r30 = train(docs, Seq("alpha", "spam"), col("label") === 1, epochs = 30, lr = 5.0)
    assert(r30.loss < r3.loss, s"loss must fall with epochs: ${r3.loss} -> ${r30.loss}")
    assert(r30.nCorrect === 6L && r30.n === 6L)
    val w = r30.lexicon.toMap
    assert(w("alpha") > 0 && w("spam") < 0,
      s"signs must track the labels: $w")
  }

  test("trained weights slot into lexiconScore unchanged") {
    val docs = corpus()
    val r = train(docs, Seq("alpha", "spam"), col("label") === 1, epochs = 10, lr = 5.0)
    // lexiconScore's sigmoid(bias + sum w(tok)/n) IS sigmoid(margin):
    // per-occurrence sum over tokens == sum_k w_k * count_k / n
    val scored = TextAnalysis.lexiconScore(docs, r.lexicon, bias = r.bias)
      .select(col("doc_id"), col("lex_score"), col("label")).collect()
    scored.foreach { row =>
      val s = row.getDouble(1)
      if (row.getInt(2) == 1) assert(s > 0.5, s"doc ${row.getLong(0)} scored $s")
      else assert(s < 0.5, s"doc ${row.getLong(0)} scored $s")
    }
  }

  test("quantized gradients make training partitioning-invariant") {
    val docs = corpus()
    val a = train(docs.repartition(1), Seq("alpha", "spam"), col("label") === 1,
      epochs = 5, lr = 5.0)
    val b = train(docs.repartition(7), Seq("alpha", "spam"), col("label") === 1,
      epochs = 5, lr = 5.0)
    assert(a.weights.toSeq === b.weights.toSeq, "weights must not depend on partitioning")
    assert(a.bias === b.bias && a.loss === b.loss)
  }

  test("local-epochs training: deterministic, sign-correct, TWO jobs for ANY epoch count") {
    val docs = corpus()
    val lex = Seq("alpha", "spam")
    val r = trainLocalEpochs(docs, lex, col("label") === 1, col("doc_id"),
      epochs = 10, lr = 5.0, shards = 3)
    // sign/classification parity with the full-batch form on the
    // separable corpus (the averaged model is NOT the full-batch
    // optimum — the local-epochs trade — but it must classify alike)
    val w = r.lexicon.toMap
    assert(w("alpha") > 0 && w("spam") < 0, s"signs must track the labels: $w")
    assert(r.nCorrect === 6L && r.n === 6L)
    // deterministic under ANY input partitioning: shards are doc-keyed
    // (doc_id % shards, never partition-derived) and per-shard gradient
    // sums are order-free quantized longs
    val r1 = trainLocalEpochs(docs.repartition(1), lex, col("label") === 1,
      col("doc_id"), epochs = 10, lr = 5.0, shards = 3)
    val r7 = trainLocalEpochs(docs.repartition(7), lex, col("label") === 1,
      col("doc_id"), epochs = 10, lr = 5.0, shards = 3)
    assert(r1.weights.toSeq === r.weights.toSeq && r7.weights.toSeq === r.weights.toSeq,
      "weights must not depend on partitioning")
    assert(r1.bias === r.bias && r7.bias === r.bias && r1.loss === r.loss)
    // THE structural claim vs train(): one training job (the keyed
    // shuffle + local epochs) + one metrics pass (AQE may stage it as
    // two jobs) — CONSTANT in epochs, where the full-batch form pays a
    // barrier per epoch. Pinned as a ratio at the same epoch count.
    def jobsOf(group: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, "job-count pin", interruptOnCancel = false)
      try body finally spark.sparkContext.clearJobGroup()
      def read: Int = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      var tries = 0
      while (read < 1 && tries < 60) { Thread.sleep(50); tries += 1 } // listener-bus lag
      Thread.sleep(200)
      read
    }
    val localJobs = jobsOf("qt_local_jobs") {
      trainLocalEpochs(docs, lex, col("label") === 1, col("doc_id"),
        epochs = 25, lr = 5.0, shards = 3); ()
    }
    val fullJobs = jobsOf("qt_full_jobs") {
      train(docs, lex, col("label") === 1, epochs = 25, lr = 5.0); ()
    }
    assert(localJobs <= 3, s"local-epochs training must stay ~2 jobs, got $localJobs")
    assert(fullJobs >= 25,
      s"full-batch pays a job per epoch ($fullJobs at 25 epochs) — the barrier " +
        s"count local epochs exists to cut (local: $localJobs)")
  }

  test("feature table: frequencies, zero-token docs, guards") {
    import spark.implicits._
    val docs = Seq((1L, "alpha alpha beta", 1), (2L, "", 0)).toDF("doc_id", "text", "label")
    val ft = featureTable(docs, Seq("alpha", "beta"), col("label") === 1)
      .orderBy(desc("y")).collect()
    assert(ft(0).getDouble(0) === 1.0)                    // y
    assert(math.abs(ft(0).getDouble(1) - 2.0 / 3) < 1e-15) // x0 = alpha freq
    assert(ft(1).getDouble(1) === 0.0 && ft(1).getDouble(2) === 0.0) // empty doc
    intercept[IllegalArgumentException](
      train(docs, Seq.empty, col("label") === 1, epochs = 1, lr = 1.0))
    intercept[IllegalArgumentException](
      train(docs, Seq("a", "a"), col("label") === 1, epochs = 1, lr = 1.0))
    intercept[IllegalArgumentException](
      train(docs, Seq("a"), col("label") === 1, epochs = 0, lr = 1.0))
    intercept[IllegalArgumentException](
      train(docs, Seq("a"), col("label") === 1, epochs = 1, lr = 0.0))
  }
}
