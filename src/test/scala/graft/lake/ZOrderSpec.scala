package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  /** Independent Morton reference: interleave bit-by-bit. */
  private def morton(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
    }

  test("mortonKey matches a bit-by-bit reference on identity-normalized inputs") {
    import spark.implicits._
    // ranges chosen so norm16 is the identity: [0, 65535]
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (12345L, 54321L),
      (65535L, 65535L), (65535L, 0L))
    val df = pairs.toDF("a", "b")
      .withColumn("z", ZOrder.mortonKey(col("a"), 0, 65535, col("b"), 0, 65535))
    val got = df.orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) => assert(z === morton(a, b), s"morton($a,$b)") }
  }

  test("mortonKey clamps out-of-range values and degenerate ranges") {
    import spark.implicits._
    val df = Seq((-5.0, 7.0), (1e12, 7.0)).toDF("a", "b")
      .withColumn("z", ZOrder.mortonKey(col("a"), 0, 100, col("b"), 7, 7))
    val zs = df.collect().map(_.getAs[Long]("z"))
    assert(zs(0) === morton(0L, 0L))     // below range -> clamp to 0; degenerate b -> 0
    assert(zs(1) === morton(65535L, 0L)) // above range -> clamp to max
  }

  test("property: 1000 random pairs match the reference; fixing one dim keeps order in the other") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // seeded: failures must reproduce
    val pairs = Seq.fill(1000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("a", "b")
      .withColumn("z", ZOrder.mortonKey(col("a"), 0, 65535, col("b"), 0, 65535))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) => assert(z === morton(a, b), s"morton($a,$b)") }
    // monotone in a for fixed b (even bits ordered, odd bits constant):
    // sorting by z within a fixed b must equal sorting by a
    val fixedB = got.head._2
    val line = (0 until 200).map(i => (i * 327L % 65536, fixedB))
    val zs = line.map { case (a, b) => (a, morton(a, b)) }
    assert(zs.sortBy(_._2).map(_._1) === zs.sortBy(_._1).map(_._1))
  }

  test("z-ordered write + metastore prunes on BOTH dimensions") {
    import spark.implicits._
    val d = tmpDir("zorder") + "/t"
    // 64k rows over a 256x256 grid: x sequential, y decorrelated
    val df = (0 until 65536).map(i => (i.toLong % 256, (i.toLong * 37) % 256, i.toLong))
      .toDF("x", "y", "payload")
    ClusteredWriter.writeZOrdered(df, d, "x", "y", nFiles = 16)
    val table = MetastoreFileIndex.table(spark, d,
      Metastore.build(spark, d, "x", Seq("y")))

    def filesRead(q: org.apache.spark.sql.DataFrame): Long = {
      q.collect()
      q.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
        .map(_.metrics("numFiles").value).sum
    }

    // a tight box in (x, y) must read a small corner of the table
    val box = table.where(col("x").between(10, 40) && col("y").between(10, 40))
    val expected = df.where(col("x").between(10, 40) && col("y").between(10, 40)).count()
    assert(box.count() === expected, "pruned result must equal the unpruned filter")
    val boxFiles = filesRead(box)
    assert(boxFiles < 16, s"two-dim box should prune some of 16 files, read $boxFiles")

    // one-dimensional band on the SECOND dimension alone must also prune —
    // the single-column clustered layout cannot do this
    val band = table.where(col("y") < 32)
    assert(band.count() === df.where(col("y") < 32).count())
    val bandFiles = filesRead(band)
    assert(bandFiles < 16, s"y-band should prune some of 16 files, read $bandFiles")
  }

  test("mortonKeyN(2 dims) is bit-identical to mortonKey") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val pairs = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("a", "b")
      .withColumn("z2", ZOrder.mortonKey(col("a"), 0, 65535, col("b"), 0, 65535))
      .withColumn("zn", ZOrder.mortonKeyN(Seq(
        (col("a"), 0.0, 65535.0), (col("b"), 0.0, 65535.0))))
      .collect()
    got.foreach(r => assert(r.getAs[Long]("zn") === r.getAs[Long]("z2")))
  }

  /** Independent k-dim Morton reference, `bits` bits per dim. */
  private def mortonN(vals: Seq[Long], bits: Int): Long = {
    val k = vals.size
    vals.zipWithIndex.foldLeft(0L) { case (acc, (v, d)) =>
      (0 until bits).foldLeft(acc)((a, i) => a | ((v >> i) & 1L) << (i * k + d))
    }
  }

  test("mortonKeyN(3 dims) matches the bit-by-bit reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 62/3 = 20 -> capped at 16 bits/dim; identity ranges
    val triples = Seq.fill(500)(
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = triples.toDF("a", "b", "c")
      .withColumn("z", ZOrder.mortonKeyN(Seq(
        (col("a"), 0.0, 65535.0), (col("b"), 0.0, 65535.0), (col("c"), 0.0, 65535.0))))
      .collect()
    got.foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getAs[Long]("z") === mortonN(Seq(a, b, c), 16), s"mortonN($a,$b,$c)")
    }
  }

  test("3-dim z-ordered write + metastore prunes on EVERY dimension") {
    import spark.implicits._
    val d = tmpDir("zorder3") + "/t"
    // 64k rows over a 64^3 grid: three mutually decorrelated coordinates
    val df = (0 until 65536).map { i =>
      (i.toLong % 64, (i.toLong * 37) % 64, (i.toLong * 101) % 64, i.toLong)
    }.toDF("x", "y", "w", "payload")
    ClusteredWriter.writeZOrderedN(df, d, Seq("x", "y", "w"), nFiles = 16)
    val table = MetastoreFileIndex.table(spark, d,
      Metastore.build(spark, d, "x", Seq("y", "w")))

    def filesRead(q: org.apache.spark.sql.DataFrame): Long = {
      q.collect()
      q.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
        .map(_.metrics("numFiles").value).sum
    }

    for (dim <- Seq("x", "y", "w")) {
      val band = table.where(col(dim) < 8)
      assert(band.count() === df.where(col(dim) < 8).count(),
        s"pruned result must equal the unpruned filter on $dim")
      val n = filesRead(band)
      assert(n < 16, s"$dim-band should prune some of 16 files, read $n")
    }
  }

  test("rank normalization prunes a heavy-tailed dimension where linear scaling cannot") {
    import spark.implicits._
    // x: 99% of rows dense in [0, 99], 1% outliers near 1e6 — linear
    // [min,max] quantization maps the whole dense region to code 0, so
    // the z-key stops varying in x and an x-filter prunes nothing
    val df = (0 until 65536).map { i =>
      val x = if (i % 100 == 0) 1000000L + i else (i % 100).toLong
      (x, (i.toLong * 37) % 256, i.toLong)
    }.toDF("x", "y", "payload")

    def filesRead(q: org.apache.spark.sql.DataFrame): Long = {
      q.collect()
      q.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
        .map(_.metrics("numFiles").value).sum
    }
    def tableAt(d: String) =
      MetastoreFileIndex.table(spark, d, Metastore.build(spark, d, "x", Seq("y")))
    val expected = df.where(col("x") < 20).count()

    val dLin = tmpDir("zorder_lin") + "/t"
    ClusteredWriter.writeZOrderedN(df, dLin, Seq("x", "y"), nFiles = 16)
    val linQ = tableAt(dLin).where(col("x") < 20)
    assert(linQ.count() === expected)
    val linFiles = filesRead(linQ)

    val dRank = tmpDir("zorder_rank") + "/t"
    ClusteredWriter.writeZOrderedRanked(df, dRank, Seq("x", "y"), nFiles = 16)
    val rankQ = tableAt(dRank).where(col("x") < 20)
    assert(rankQ.count() === expected, "rank-normalized result must equal the plain filter")
    val rankFiles = filesRead(rankQ)

    assert(rankFiles < 16, s"ranked x-band should prune some of 16 files, read $rankFiles")
    assert(rankFiles < linFiles,
      s"rank normalization must out-prune linear scaling on skew ($rankFiles vs $linFiles)")
  }
}
