package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  private def docs(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "n_tok")
  }

  test("packSequences: hand-computed greedy fill") {
    val r = Packing.packSequences(
        docs((1L, "s", 4L), (2L, "s", 4L), (3L, "s", 4L), (4L, "s", 4L)),
        col("n_tok"), budget = 10L, partitionCol = "source", orderCol = "doc_id")
      .orderBy("doc_id")
      .select("tokens_before", "seq_id").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(0L, 4L, 8L, 12L))
    assert(r.map(_.getLong(1)).toSeq === Seq(0L, 0L, 0L, 1L))
  }

  test("packSequences: shards pack independently") {
    val r = Packing.packSequences(
        docs((1L, "a", 9L), (2L, "b", 9L), (3L, "a", 9L), (4L, "b", 9L)),
        col("n_tok"), budget = 10L, partitionCol = "source", orderCol = "doc_id")
      .orderBy("doc_id")
      .select("doc_id", "seq_id").collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // each shard restarts at 0: doc 3 is the second doc of shard a
    assert(r === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    val r2 = Packing.packSequences(
        docs((1L, "a", 9L), (2L, "a", 9L), (3L, "a", 9L)),
        col("n_tok"), budget = 10L, partitionCol = "source", orderCol = "doc_id")
      .orderBy("doc_id").select("seq_id").collect().map(_.getLong(0)).toSeq
    assert(r2 === Seq(0L, 0L, 1L)) // 0, 9, 18 tokens before
  }

  test("property: random corpora satisfy the packing invariants") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val docs = (1 to 2000).map(i =>
      (i.toLong, s"shard${rnd.nextInt(5)}", 1L + rnd.nextInt(500)))
      .toDF("doc_id", "source", "n_tok")
    val packed = Packing.packSequences(docs, col("n_tok"), budget = 1024L,
        partitionCol = "source", orderCol = "doc_id")
      .select("source", "doc_id", "n_tok", "tokens_before", "seq_id")
      .collect()
      .groupBy(_.getString(0))
    packed.foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      var cum = 0L
      sorted.foreach { r =>
        assert(r.getLong(3) === cum, s"$shard: tokens_before must be the shard prefix sum")
        assert(r.getLong(4) === cum / 1024L, s"$shard: seq_id = floor(before/budget)")
        cum += r.getLong(2)
      }
      // seq ids are dense and non-decreasing: no skipped sequence can
      // exceed one budget-width (an oversized doc may straddle several)
      val seqs = sorted.map(_.getLong(4))
      assert(seqs === seqs.sorted, s"$shard: seq_id must be non-decreasing in pack order")
    }
  }

  test("packSequences: oversized single doc occupies its own sequences") {
    val r = Packing.packSequences(
        docs((1L, "s", 25L), (2L, "s", 1L)),
        col("n_tok"), budget = 10L, partitionCol = "source", orderCol = "doc_id")
      .orderBy("doc_id").select("seq_id").collect().map(_.getLong(0)).toSeq
    assert(r === Seq(0L, 2L)) // doc 2 starts at token 25 -> sequence 2
    intercept[IllegalArgumentException](
      Packing.packSequences(docs((1L, "s", 1L)), col("n_tok"), 0L, "source", "doc_id"))
  }

  test("assignShards: positions are dense, 0-based, and hash-ordered per shard") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, s"src${i % 5}")).toDF("doc_id", "source")
    val out = Packing.assignShards(df, col("doc_id"), nShards = 7).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
    assert(out.length === 1000)
    assert(out.map(_._2).toSet === (0 until 7).toSet, "all shards populated")
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0 until rows.length),
        s"shard $shard positions must be dense 0-based offsets")
    }
  }

  test("assignShards: placement is deterministic and layout-independent") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, s"src${i % 5}")).toDF("doc_id", "source")
    def place(d: org.apache.spark.sql.DataFrame) =
      Packing.assignShards(d, col("doc_id"), 4).collect()
        .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3)))).toMap
    val a = place(df.coalesce(1))
    val b = place(df.repartition(11, col("source")))
    assert(a === b, "a doc's (shard, pos) depends only on its key")
    // source clustering in the input must NOT survive into shards: each
    // shard draws from all sources (the decorrelation property)
    val bySrc = Packing.assignShards(df, col("doc_id"), 4)
      .groupBy("shard_id").agg(countDistinct("source").as("n")).collect()
      .map(_.getLong(1))
    assert(bySrc.forall(_ === 5L), "every shard mixes every source")
    intercept[IllegalArgumentException](Packing.assignShards(df, col("doc_id"), 0))
  }

  test("assignShards: curriculum override orders within shards, never across") {
    import spark.implicits._
    val df = (0L until 400L).map(i => (i, (i % 7).toDouble)).toDF("doc_id", "quality")
    val cur = Packing.assignShards(df, col("doc_id"), 4,
      inShardOrder = Seq(col("quality").desc)).collect()
      .map(r => (r.getInt(2), r.getInt(3), r.getDouble(1), r.getLong(0)))
    // membership identical to the default order (hash decides shards)
    val plain = Packing.assignShards(df, col("doc_id"), 4).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(cur.map(x => x._4 -> x._1).toMap === plain)
    // inside each shard, positions walk quality non-increasing
    cur.groupBy(_._1).foreach { case (shard, rows) =>
      val qualities = rows.sortBy(_._2).map(_._3).toSeq
      assert(qualities === qualities.sorted.reverse,
        s"shard $shard must stream best-quality-first")
    }
  }

  test("shardedForWrite: identical placement to assignShards, ONE exchange total") {
    import spark.implicits._
    val df = (0L until 800L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val forWrite = Packing.shardedForWrite(df, col("doc_id"), nShards = 6)
    // same rows as the reference placement — the physical distribution
    // is the only difference
    val a = forWrite.collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3)))).toMap
    val b = Packing.assignShards(df, col("doc_id"), 6).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3)))).toMap
    assert(a === b, "write-path distribution must not change placement")
    // the claim writeShards' doc makes: the explicit repartition IS the
    // window's clustering, so the whole placement+write costs one
    // exchange of the rows — a second one here would double-shuffle
    // 100 TB on every training-set materialization
    // AQE's toString prints the final plan AND the initial plan — count
    // exchanges only in the final section or one shuffle reads as two
    val plan = forWrite.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange".r.findAllIn(plan).size === 1,
      s"shardedForWrite must shuffle exactly once, plan was:\n$plan")
    // and the partitioning is the write layout: every shard lives whole
    // in one partition (hash(shard_id) % n may co-locate two shards in
    // one task — fine, partitionBy still splits them into their own
    // dirs — but a shard SPLIT across tasks would break the
    // one-file-per-shard write)
    val parts = forWrite.select("shard_id")
      .rdd.mapPartitionsWithIndex { (pid: Int, it: Iterator[org.apache.spark.sql.Row]) =>
        it.map(_.getInt(0)).toSet.iterator.map((s: Int) => (s, pid))
      }.collect()
    assert(parts.groupBy(_._1).values.forall(_.length == 1),
      s"each shard must live in exactly one partition, got ${parts.toSeq.sorted}")
  }

  test("writeShards materializes one in-order file per shard") {
    import spark.implicits._
    val df = (0L until 600L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val out = tmpDir("graft_shards")
    Packing.writeShards(df, col("doc_id"), nShards = 5, out)
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard_id="))
    assert(dirs.map(_.getName).sorted.toSeq === (0 until 5).map(i => s"shard_id=$i"),
      "one partition directory per shard")
    assert(dirs.forall(_.listFiles().count(_.getName.endsWith(".parquet")) == 1),
      "exactly one file per shard (one task wrote its own shard)")
    val expected = Packing.assignShards(df, col("doc_id"), 5).collect()
      .map(r => (r.getInt(2), r.getInt(3), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    dirs.foreach { d =>
      val shard = d.getName.stripPrefix("shard_id=").toInt
      // file order (no sort on read) must BE the shard_pos order
      val inFile = spark.read.parquet(d.getAbsolutePath)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(inFile === expected(shard),
        s"shard $shard file order must equal the placement order")
    }
  }
}
