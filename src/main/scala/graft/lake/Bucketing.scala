package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hash-bucketed table layout: the shuffle-once-join-forever primitive.
  *
  * A `bucketBy(n, key)` write hash-partitions rows into `n` buckets BY
  * FILE NAME (`..._00003.c000.parquet` is bucket 3), and records the
  * bucket spec in the catalog. Every later equi-join or aggregation on
  * `key` between tables bucketed the same way needs NO Exchange: the
  * rows are already co-located per bucket, so Catalyst plans a
  * sort-merge join straight over the scans (BucketingSpec pins the
  * zero-`Exchange` plan shape, with the unbucketed twin as a ≥2-
  * exchange negative control).
  *
  * Why this is a 100 TB primitive and not a local trick: a fact-fact
  * join (lineitem ⋈ orders here; impressions ⋈ conversions in an event
  * lake) shuffles BOTH inputs every query — at 100 TB that exchange is
  * the query. Paying one clustered write at ingest amortizes that
  * shuffle across every subsequent join/groupBy on the key. The same
  * trade as [[ClusteredWriter]]'s zone-map clustering, but for join
  * locality instead of scan pruning; the two compose (bucket by join
  * key, sort by prune column).
  *
  * Sizing at scale: pick `numBuckets` so one bucket of the LARGEST
  * co-bucketed table is a task-sized unit — 128–512 MB compressed
  * (100 TB / 256 MB ≈ 400 000 buckets). Both sides must agree on
  * (key, numBuckets); Spark joins tables with differing bucket counts
  * by shuffling the smaller-bucketed side, which silently reintroduces
  * the exchange this layout exists to delete — `colocatedJoin` fails
  * loudly instead.
  *
  * The reference has no bucketing (its metastore routes point lookups
  * through zone maps, lakeshack/metastore.py:414-467); this is the
  * join-side extension of the same write-time-investment idea.
  */
object Bucketing {

  /** Write `df` as an external parquet table hash-bucketed by `key`.
    *
    * `sortCols` defaults to the bucket key: sorted buckets let the
    * sort-merge join read pre-sorted runs (and, with exactly one file
    * per bucket, drop its Sort under
    * `spark.sql.legacy.bucketedTableScan.outputOrdering`). The table is
    * EXTERNAL (data at `path`, metadata in the session catalog) so the
    * layout survives catalog loss: re-registering is one `saveAsTable`
    * away, and the files are plain parquet any reader can scan —
    * bucket awareness costs nothing when absent, it only unlocks the
    * exchange-free plan when present.
    */
  def writeBucketed(df: DataFrame, table: String, path: String, key: String,
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val sorts = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write.format("parquet").mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }

  /** Equi-join two co-bucketed catalog tables on `leftKey = rightKey`,
    * refusing mismatched layouts instead of silently shuffling.
    *
    * The merge hint pins sort-merge (a small side would otherwise
    * broadcast, which also avoids a shuffle but stops demonstrating —
    * and at scale stops surviving — the fact-fact case). The bucket-
    * count check is the loud failure for the one layout mistake
    * Catalyst papers over with a hidden exchange.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame = {
    val n = Seq(leftTable, rightTable).map { t =>
      val spec = spark.sql(s"DESCRIBE TABLE EXTENDED $t").collect()
        .find(_.getString(0) == "Num Buckets").map(_.getString(1).trim.toInt)
      spec.getOrElse(throw new IllegalArgumentException(
        s"$t is not bucketed — colocatedJoin requires a bucketBy layout on both sides"))
    }
    require(n.head == n.last,
      s"bucket counts differ (${n.head} vs ${n.last}) — Spark would shuffle the " +
        "smaller-bucketed side; rewrite one table so the layouts agree")
    // dataframe-qualified key refs, not col(...): the common layout
    // buckets both tables on the SAME column name (user_id = user_id),
    // where unqualified names are an ambiguous-attribute
    // AnalysisException
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.hint("merge").join(r, l(leftKey) === r(rightKey))
  }
}
