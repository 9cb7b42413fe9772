package graft.ops

import graft.SparkSpec

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], minDocs: Int = 2,
                  minLineChars: Int = 1): Map[Long, (Long, Long, String)] =
    Dedup.lineDedup(docs.toDF("doc_id", "text"), minDocs = minDocs,
        minLineChars = minLineChars)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("a line in >= minDocs distinct docs vanishes from ALL of them; order kept") {
    val out = run(Seq(
      1L -> "alpha one\nshared footer\nalpha two",
      2L -> "beta one\nshared footer",
      3L -> "gamma only"))
    assert(out(1L) == ((3L, 1L, "alpha one\nalpha two")))
    assert(out(2L) == ((2L, 1L, "beta one")))
    assert(out(3L) == ((1L, 0L, "gamma only")))
  }

  test("within-doc repeats count ONCE toward doc frequency") {
    val out = run(Seq(
      1L -> "echo line\necho line\nunique a",
      2L -> "unique b"))
    // "echo line" appears twice but only in doc 1 -> not boilerplate
    assert(out(1L) == ((3L, 0L, "echo line\necho line\nunique a")))
  }

  test("a within-doc repeat that IS corpus-boilerplate drops every occurrence") {
    val out = run(Seq(
      1L -> "echo line\necho line\nunique a",
      2L -> "echo line\nunique b"))
    assert(out(1L) == ((3L, 2L, "unique a")))
    assert(out(2L) == ((2L, 1L, "unique b")))
  }

  test("lines shorter than minLineChars are exempt from counting AND removal") {
    val out = run(Seq(
      1L -> "aa\n\nkeep one",
      2L -> "aa\n\nkeep two"), minLineChars = 3)
    // "" and "aa" are short -> exempt everywhere despite being shared
    assert(out(1L) == ((3L, 0L, "aa\n\nkeep one")))
    assert(out(2L) == ((3L, 0L, "aa\n\nkeep two")))
  }

  test("minDocs raises the bar") {
    val docs = Seq(
      1L -> "common line\na",
      2L -> "common line\nb",
      3L -> "common line\nc")
    val loose = run(docs, minDocs = 2)
    assert(loose(1L)._2 == 1L)
    val strict = run(docs, minDocs = 4)
    assert(strict.values.forall(_._2 == 0L))
  }

  test("plan: the frequency pass shuffles hashes only; text moves at most once") {
    val docs = (1L to 40L).map(i =>
      (i, s"line one v${i % 3}\nshared footer\nline two v${i % 5}")).toDF("doc_id", "text")
    val r = Dedup.lineDedup(docs)
    r.collect()
    // the rebuild join may broadcast the per-doc drop sets (then text
    // never shuffles); the contract is the BOUND
    val bad = graft.PlanAudit.stringShuffles(r)
    assert(bad.size <= 1, s"lineDedup shuffled text ${bad.size} times: $bad")
  }

  test("a doc that is pure boilerplate cleans to the empty string") {
    val out = run(Seq(
      1L -> "shared footer",
      2L -> "shared footer",
      3L -> "real content"))
    assert(out(1L) == ((1L, 1L, "")))
    assert(out(3L) == ((1L, 0L, "real content")))
  }
}
