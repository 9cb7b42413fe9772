package graft.ops

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {

  test("asof picks the latest right row at-or-before each left time") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 15L, 200.0), (1L, 20L, 300.0), (2L, 9L, 400.0))
      .toDF("k", "rt", "price")
    val r = AsofJoin.asof(left, right, "k", "t", "rt", Seq("rt", "price"))
      .orderBy("k", "t").collect()
    // (1,10) -> rt=5; (1,20) -> rt=20 (equal time matches); (2,5) -> none
    assert(r(0).getLong(3) === 5L && r(0).getDouble(4) === 100.0)
    assert(r(1).getLong(3) === 20L && r(1).getDouble(4) === 300.0)
    assert(r(2).isNullAt(3) && r(2).isNullAt(4))
  }

  test("asof never crosses keys and keeps all left rows") {
    import spark.implicits._
    val left = (1L to 100L).map(i => (i % 7, i, i)).toDF("k", "t", "id")
    val right = Seq((99L, 0L, 1.0)).toDF("k", "rt", "v") // key matches nothing
    val r = AsofJoin.asof(left, right, "k", "t", "rt", Seq("v"))
    assert(r.count() === 100)
    assert(r.where(org.apache.spark.sql.functions.col("v").isNotNull).count() === 0)
  }

  test("null right keys and times never match (SQL join semantics)") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val right = Seq(
      (Option.empty[Long], Option(5L), 111.0),   // null key: unjoinable
      (Option(1L), Option.empty[Long], 222.0),   // null time: sorts first without the guard
      (Option(1L), Option(4L), 333.0))           // the legitimate match
      .toDF("k", "rt", "price")
    val r = AsofJoin.asof(left, right, "k", "t", "rt", Seq("rt", "price")).collect()
    assert(r.length === 1)
    assert(r(0).getDouble(4) === 333.0,
      "null-key/null-time right rows must never supply the payload")
  }

  test("property: random inputs match a brute-force as-of computation") {
    import spark.implicits._
    val rng = new scala.util.Random(4242)
    for (round <- 1 to 3) {
      val left = Seq.fill(200)((rng.nextInt(8).toLong, rng.nextInt(1000).toLong, rng.nextInt(100)))
        .zipWithIndex.map { case ((k, t, x), i) => (i.toLong, k, t, x) }
      val right = Seq.fill(150)((rng.nextInt(8).toLong, rng.nextInt(1000).toLong, rng.nextDouble()))
        .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq // unique (k, rt): max payload wins, like the window tiebreak
      val leftDf = left.toDF("row_id", "k", "t", "x")
      val rightDf = right.toDF("k", "rt", "price")
      val got = AsofJoin.asof(leftDf, rightDf, "k", "t", "rt", Seq("rt", "price"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(4)) None else Some((r.getLong(4), r.getDouble(5))))).toMap
      for ((rowId, k, t, _) <- left) {
        val expected = right.filter(r => r._1 == k && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption.map(r => (r._2, r._3))
        assert(got(rowId) === expected,
          s"round $round row $rowId (k=$k, t=$t): got ${got(rowId)}, expected $expected")
      }
    }
  }

  test("payload name clash with left columns raises") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      AsofJoin.asof(df, df.withColumnRenamed("t", "rt"), "k", "t", "rt", Seq("v"))
    }
  }

  test("unorderable payload (MapType) drops the tiebreak instead of failing") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, Map("p" -> 1.0))).toDF("k", "rt", "m")
    val r = AsofJoin.asof(left, right, "k", "t", "rt", Seq("rt", "m"))
      .collect()
    assert(r.length === 1 && r(0).getLong(2) === 5L)
    assert(r(0).getMap[String, Double](3)("p") === 1.0)
  }

  test("reserved working-column names are refused") {
    import spark.implicits._
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "_side")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(left, right, "k", "t", "rt", Seq("v"))
    }
    assert(e.getMessage.contains("reserved"))
  }
}
