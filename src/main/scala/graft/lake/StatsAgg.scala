package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation pushdown into footer statistics: answer
  * `COUNT(*) / MIN(c) / MAX(c)` under a range predicate on `c` from
  * parquet footers alone for every file the range fully covers, and
  * scan ONLY the boundary files. On a clustered table (the lake's
  * native layout, [[ClusteredWriter]]) a range predicate fully covers
  * all interior files, so the answer costs a footer sweep plus a scan
  * of ~2 files — at 100 TB that is metadata-latency for the
  * dominant "how many rows in this key range" maintenance query the
  * reference answers with a full S3-Select sweep
  * (lakeshack/lakeshack.py builds per-file SELECTs for every query
  * shape, including pure aggregates).
  *
  * SOUNDNESS RULES (same may-contain discipline as [[Metastore]]):
  *  - a file is `covered` only when its footer interval lies INSIDE
  *    [lo, hi] AND its null count for `c` is footer-declared — covered
  *    contributions are `rows − nulls` (a range predicate never matches
  *    NULL) and the footer min/max themselves (exact for the
  *    numeric/temporal types admitted below; rows outside stats can't
  *    exist in a covered file);
  *  - a file with stats straddling the bound, or with ANY block whose
  *    statistics are absent/incomplete, or whose footer is unreadable,
  *    is `scanned` — never guessed;
  *  - a file whose interval is disjoint from [lo, hi] is `skipped`
  *    (zone-map semantics; NULL rows match no range predicate);
  *  - STRING columns are never answered from footers: parquet writers
  *    may truncate binary statistics, which keeps them sound for
  *    may-contain pruning but NOT for exact min/max answers — string
  *    ranges take the scan path for every overlapping file.
  *
  * The per-file classification is driver-held, one entry per file —
  * the same size class as the pruning interval map. The footer sweep
  * itself is distributed ([[Metastore.buildFromFooters]]'s mechanism).
  */
object StatsAgg {

  /** Per-file footer facts for one column. `nulls`/`min`/`max` are
    * None when any block's statistics were absent or incomplete —
    * such a file can only be scanned. */
  final case class FileStats(path: String, rows: Long, nulls: Option[Long],
                             min: Option[Any], max: Option[Any])

  /** The classification a range aggregate will execute: `covered`
    * answered from footers, `scanned` read with the predicate pushed
    * down, `skipped` not touched at all. Exposed (not just internal)
    * so specs and telemetry can pin WHAT a query cost, the same way
    * `QueryTelemetry` pins pruned file counts. */
  final case class Plan(covered: Seq[FileStats], scanned: Seq[String],
                        skipped: Seq[String])

  /** Distributed footer sweep: (path, rows, nulls, min, max) for one
    * column of every listed file. Unreadable footers yield a
    * stats-less entry (scan class) instead of failing the sweep —
    * per-file error tolerance, reference metastore.py:304-305. */
  def harvest(spark: SparkSession, paths: Seq[String], column: String,
              dt: DataType): Seq[FileStats] = {
    val confB = spark.sparkContext.broadcast(Metastore.hadoopConfKVs(spark))
    val dtB = spark.sparkContext.broadcast(dt)
    val colB = spark.sparkContext.broadcast(column)
    spark.sparkContext
      .parallelize(paths, math.max(1, math.min(paths.size, spark.sparkContext.defaultParallelism)))
      .map { p =>
        val conf = new Configuration(false)
        confB.value.foreach { case (k, v) => conf.set(k, v) }
        try {
          val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(p), conf))
          try {
            val md = reader.getFooter
            val prim = {
              var r: org.apache.parquet.schema.PrimitiveType = null
              md.getFileMetaData.getSchema.getFields.forEach { f =>
                if (f.getName == colB.value && f.isPrimitive) r = f.asPrimitiveType()
              }
              r
            }
            var rows = 0L; var nulls = 0L
            var mn: Comparable[Any] = null; var mx: Comparable[Any] = null
            var complete = prim != null
            md.getBlocks.forEach { block =>
              rows += block.getRowCount
              var seen = false
              block.getColumns.forEach { cc =>
                if (cc.getPath.toDotString == colB.value) {
                  seen = true
                  val st = cc.getStatistics
                  if (st == null || !st.isNumNullsSet) complete = false
                  else {
                    nulls += st.getNumNulls
                    if (st.hasNonNullValue) {
                      val bmn = st.genericGetMin.asInstanceOf[Comparable[Any]]
                      val bmx = st.genericGetMax.asInstanceOf[Comparable[Any]]
                      if (mn == null || bmn.compareTo(mn.asInstanceOf[Any]) < 0) mn = bmn
                      if (mx == null || bmx.compareTo(mx.asInstanceOf[Any]) > 0) mx = bmx
                    } else if (st.getNumNulls != block.getRowCount) complete = false
                  }
                }
              }
              if (!seen) complete = false
            }
            if (!complete) FileStats(p, rows, None, None, None)
            else FileStats(p, rows, Some(nulls),
              Option(Metastore.footerExternal(dtB.value, prim, mn)),
              Option(Metastore.footerExternal(dtB.value, prim, mx)))
          } finally reader.close()
        } catch { case _: Exception =>
          // rows unknown too — force the scan path with a sentinel
          FileStats(p, -1L, None, None, None)
        }
      }
      .collect().toSeq
  }

  /** Total-order comparison of two external values of one column type.
    * Numbers go through BigDecimal (footer externals and caller
    * literals may box differently — Integer vs Long); temporal types
    * are mutually Comparable within their class. */
  /** True iff any of `sorted` (ascending under [[cmp]]) falls in
    * [mn, mx] — binary search for the first key ≥ mn, then one compare
    * against mx. O(log keys) per file where the naive exists-scan was
    * O(keys). */
  private[lake] def anyKeyInRange(sorted: Array[Any], mn: Any, mx: Any): Boolean = {
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(sorted(mid), mn) < 0) lo = mid + 1 else hi = mid
    }
    lo < sorted.length && cmp(sorted(lo), mx) <= 0
  }

  private[lake] def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Number, y: Number) =>
      new java.math.BigDecimal(x.toString).compareTo(new java.math.BigDecimal(y.toString))
    case (x: java.time.Instant, y: java.time.Instant) => x.compareTo(y)
    case (x: java.time.LocalDateTime, y: java.time.LocalDateTime) => x.compareTo(y)
    case (x: java.time.LocalDate, y: java.time.LocalDate) => x.compareTo(y)
    case (x, y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
  }

  /** Classify every file of `dataPath` for `column BETWEEN lo AND hi`.
    * String columns (and files with incomplete stats) are never
    * `covered` — see the soundness rules above. */
  def plan(spark: SparkSession, dataPath: String, column: String,
           lo: Any, hi: Any): Plan = {
    val df = spark.read.parquet(dataPath)
    planFiles(spark, df.inputFiles.toSeq.map(p => new Path(p).toString),
      df.schema(column).dataType, column, lo, hi)
  }

  /** Explicit-file-set form of [[plan]] — what a versioned table uses:
    * pass a [[SnapshotLog]] snapshot's live files and the stats-only
    * aggregate works on THAT version, untouched by later commits. */
  def planFiles(spark: SparkSession, files: Seq[String], dt: DataType,
                column: String, lo: Any, hi: Any): Plan = {
    require(cmp(lo, hi) <= 0, s"empty range: lo > hi")
    val stats = harvest(spark, files, column, dt)
    val stringCol = dt == StringType
    val covered = Seq.newBuilder[FileStats]
    val scanned = Seq.newBuilder[String]
    val skipped = Seq.newBuilder[String]
    for (fsRow <- stats) fsRow match {
      case FileStats(p, _, Some(_), Some(mn), Some(mx)) =>
        if (cmp(mx, lo) < 0 || cmp(mn, hi) > 0) skipped += p // disjoint: no row can match
        else if (!stringCol && cmp(mn, lo) >= 0 && cmp(mx, hi) <= 0) covered += fsRow
        else scanned += p
      case FileStats(p, _, None, Some(mn), Some(mx)) =>
        // bounds known but null count not: can still SKIP disjoint files
        if (cmp(mx, lo) < 0 || cmp(mn, hi) > 0) skipped += p else scanned += p
      case FileStats(p, rows, Some(nulls), None, None) if nulls == rows =>
        skipped += p // every row NULL: a range predicate matches none
      case FileStats(p, _, _, _, _) => scanned += p // stats-less: must read
    }
    Plan(covered.result(), scanned.result(), skipped.result())
  }

  /** `SELECT count(*), min(column), max(column) WHERE column BETWEEN
    * lo AND hi`, answered from footers for covered files + one pushed
    * scan over boundary files. Returns one row
    * (`n_rows` BIGINT, `min_v`, `max_v` in the column's type); an
    * empty range yields (0, NULL, NULL) — same as the SQL aggregate. */
  def rangeAgg(spark: SparkSession, dataPath: String, column: String,
               lo: Any, hi: Any): DataFrame = {
    val df = spark.read.parquet(dataPath)
    rangeAggFiles(spark, df.inputFiles.toSeq.map(p => new Path(p).toString),
      df.schema, column, lo, hi)
  }

  /** Explicit-file-set form of [[rangeAgg]] (snapshot/time-travel
    * composition — see [[planFiles]]). */
  def rangeAggFiles(spark: SparkSession, files: Seq[String],
                    schema: StructType, column: String,
                    lo: Any, hi: Any): DataFrame = {
    val dt = schema(column).dataType
    val p = planFiles(spark, files, dt, column, lo, hi)
    val partSchema = StructType(Seq(
      StructField("n_rows", LongType, nullable = false),
      StructField("min_v", dt, nullable = true),
      StructField("max_v", dt, nullable = true)))
    // covered files: footer facts AS the partial aggregates (rows−nulls
    // qualify: every non-null row of a covered file is inside [lo,hi])
    val coveredRows = p.covered.map(f =>
      Row(f.rows - f.nulls.get, f.min.get, f.max.get))
    val coveredDf = spark.createDataFrame(
      spark.sparkContext.parallelize(coveredRows, 1), partSchema)
    val parts =
      if (p.scanned.isEmpty) coveredDf
      else {
        val scanDf = spark.read.schema(schema)
          .parquet(p.scanned: _*)
          .where(col(column).between(lit(lo), lit(hi)))
          .agg(count(lit(1)).as("n_rows"),
            min(col(column)).as("min_v"), max(col(column)).as("max_v"))
        coveredDf.unionByName(scanDf)
      }
    parts.agg(
      coalesce(sum(col("n_rows")), lit(0L)).as("n_rows"),
      min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
  }

  /** `SELECT count(*)` for the whole table from footers alone — zero
    * data bytes. Files whose footer is unreadable fail the call
    * (an unknown count is not a count; repair the file or scan). */
  def tableRowCount(spark: SparkSession, dataPath: String): Long = {
    val files = spark.read.parquet(dataPath).inputFiles.toSeq.map(p => new Path(p).toString)
    // block row counts only — independent of any column's statistics
    val counted = Metastore.footerRowCounts(spark, files)
      .agg(count(lit(1)), coalesce(sum(col("_footer_rows")), lit(0L))).head()
    require(counted.getLong(0) == files.size,
      s"${files.size - counted.getLong(0)} file(s) with unreadable footers; cannot count")
    counted.getLong(1)
  }
}
