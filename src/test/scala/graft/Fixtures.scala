package graft

import java.sql.Timestamp
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Port of the reference test fixture generator's SEMANTICS
  * (tests/utils.py:28-122) — not its RNG (numpy seed 812 values don't
  * transfer; SURVEY.md §5 regenerates goldens from this generator):
  *
  *  - `nFiles` files × `nRecords` rows each;
  *  - `id`: 2-hex-char strings, GLOBALLY sorted then split across files
  *    in order, so file id-ranges tile the keyspace (utils.py:50);
  *  - `timestamp`: file i covers [epoch0 + i·delta, epoch0 + i·delta +
  *    delta/2] — DISJOINT windows ~2 months apart — with the min and max
  *    endpoints present as exact rows (utils.py:53-65), which is what
  *    makes the reference's boundary-pruning counts (0/1/10) exact;
  *  - `x`: ints in [1, 500) (utils.py:51);
  *  - three variants: naive timestamp (TimestampNTZ), tz-aware
  *    (TimestampType, instants), date (DateType) — utils.py use_date /
  *    timezone params.
  *
  * Files are written one at a time (one task each) so each parquet file
  * has exactly one data window, like the reference's per-file
  * pq.write_table loop (utils.py:108-122).
  */
object Fixtures {

  val StartingEpoch = 1626365594L // 2021-07-15T12:13:14Z (utils.py:53)
  val Delta = 5356800L            // ~2 months (utils.py:54)

  sealed trait TsVariant
  case object NaiveTs extends TsVariant // timestamp[us] naive  -> TimestampNTZ
  case object ZonedTs extends TsVariant // timestamp[us, tz]    -> TimestampType
  case object DateTs extends TsVariant  // date32               -> DateType

  /** File i's timestamp window [min, max] in epoch seconds. */
  def windowOf(i: Int): (Long, Long) = {
    val mn = StartingEpoch + i * Delta
    (mn, mn + Delta / 2)
  }

  def generate(spark: SparkSession, dir: String, variant: TsVariant,
               nFiles: Int = 10, nRecords: Int = 100, seed: Long = 812L): Unit = {
    val rng = new scala.util.Random(seed)
    val hex = "0123456789abcdef"
    val nData = nFiles * nRecords
    val ids = Array.fill(nData)(s"${hex(rng.nextInt(16))}${hex(rng.nextInt(16))}").sorted
    val xs = Array.fill(nData)(rng.nextInt(499) + 1)

    val tsField = variant match {
      case NaiveTs => StructField("timestamp", TimestampNTZType)
      case ZonedTs => StructField("timestamp", TimestampType)
      case DateTs  => StructField("timestamp", DateType)
    }
    val schema = StructType(Seq(StructField("id", StringType), tsField, StructField("x", IntegerType)))

    for (i <- 0 until nFiles) {
      val (epochMin, epochMax) = windowOf(i)
      val day = 60L * 60 * 24
      // exact endpoints first/last; middles uniform with 1-day margins
      val epochs = epochMin +:
        Array.fill(nRecords - 2)(epochMin + day + math.abs(rng.nextLong()) % (epochMax - epochMin - 2 * day)) :+
        epochMax
      val rows = new java.util.ArrayList[Row](nRecords)
      for (j <- 0 until nRecords) {
        val ts: Any = variant match {
          case NaiveTs => LocalDateTime.ofEpochSecond(epochs(j), 0, ZoneOffset.UTC)
          case ZonedTs => Timestamp.from(Instant.ofEpochSecond(epochs(j)))
          case DateTs  => LocalDate.ofEpochDay(epochs(j) / day)
        }
        rows.add(Row(ids(i * nRecords + j), ts, xs(i * nRecords + j)))
      }
      // one file per window, named like the reference's part-NN
      val staging = dir + s"/_stage$i"
      spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staging)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val part = fs.globStatus(new org.apache.hadoop.fs.Path(staging + "/part-*.parquet"))(0).getPath
      fs.rename(part, new org.apache.hadoop.fs.Path(dir + f"/part-$i%02d.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    }
  }

  def read(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(dir)

  /** Query literal for the given variant at an epoch second (+ optional millis). */
  def tsLit(variant: TsVariant, epochSec: Long, millis: Int = 0): Any = variant match {
    case NaiveTs => LocalDateTime.ofEpochSecond(epochSec, millis * 1000000, ZoneOffset.UTC)
    case ZonedTs => Timestamp.from(Instant.ofEpochSecond(epochSec, millis * 1000000L))
    case DateTs  => LocalDate.ofEpochDay(epochSec / 86400)
  }
}
