package graft.ops

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("a repeated word collapses to a single token after enough merges") {
    val docs = Seq.fill(10)((1L, "ab ab ab")).toDF("doc_id", "text")
    val m = Bpe.train(docs, numMerges = 10)
    // merges available: (a,b) then (ab,</w>) — then nothing repeats
    assert(m.merges.take(2) == Seq(("a", "b"), ("ab", Bpe.EndMark)))
    assert(m.encodeWord("ab") == Seq("ab" + Bpe.EndMark))
  }

  test("training prioritizes frequent pairs; ties break lexicographically") {
    val docs = (Seq.fill(20)("xy") ++ Seq.fill(3)("qr")).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val m = Bpe.train(docs, numMerges = 1)
    assert(m.merges == Seq(("x", "y")))
  }

  test("encodeWord round-trips every word (character preservation)") {
    val docs = Seq((1L, "low lower lowest newer new widest wide")).toDF("doc_id", "text")
    val m = Bpe.train(docs, numMerges = 50)
    for (w <- Seq("low", "lower", "lowest", "unseen", "wideness"))
      assert(m.decode(m.encodeWord(w)) == w, s"word $w")
  }

  test("training is deterministic") {
    val docs = Seq((1L, "peck of pickled peppers peter piper picked"),
      (2L, "picked peter piper peppers")).toDF("doc_id", "text")
    assert(Bpe.train(docs, numMerges = 30).merges ==
      Bpe.train(docs, numMerges = 30).merges)
  }

  test("zero merges yields character+marker tokens; encode DataFrame shape") {
    val docs = Seq((7L, "ab cd!")).toDF("doc_id", "text")
    val out = Bpe.encode(docs, "doc_id", "text", BpeModel(Nil))
      .as[(Long, Seq[String], Long)].collect().head
    assert(out._1 == 7L)
    assert(out._2 == Seq("a", "b", Bpe.EndMark, "c", "d", Bpe.EndMark))
    assert(out._3 == 6L)
  }

  test("encode passes through non-long id types and null text") {
    val docs = Seq(("k1", "aa bb"), ("k2", null)).toDF("k", "text")
    val m = Bpe.train(docs.where($"text".isNotNull), numMerges = 5)
    val out = Bpe.encode(docs, "k", "text", m)
      .as[(String, Seq[String], Long)].collect().map(_._1).toSet
    assert(out == Set("k1", "k2"))
    val k2 = Bpe.encode(docs, "k", "text", m)
      .where($"k" === "k2").as[(String, Seq[String], Long)].head()
    assert(k2._2.isEmpty && k2._3 == 0L)
  }

  test("merges reduce token counts, never characters") {
    val corpus = Seq(
      (1L, "training data needs training tokenizers for training runs"),
      (2L, "tokenizers tokenize training data into subword units"),
      (3L, "subword units compress the training data"))
    val docs = corpus.toDF("doc_id", "text")
    val m0 = BpeModel(Nil)
    val m = Bpe.train(docs, numMerges = 40)
    val n0 = Bpe.encode(docs, "doc_id", "text", m0)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens")).as[Long].head()
    val n1 = Bpe.encode(docs, "doc_id", "text", m)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens")).as[Long].head()
    assert(n1 < n0)
    // character preservation across the whole corpus
    val decoded = Bpe.encode(docs, "doc_id", "text", m)
      .as[(Long, Seq[String], Long)].collect()
      .map(r => r._1 -> m.decode(r._2)).toMap
    for ((id, text) <- corpus)
      assert(decoded(id) == TextAnalysis.tokenizeRaw(text).mkString(" "), s"doc $id")
  }
}
