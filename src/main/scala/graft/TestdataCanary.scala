package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Testdata-drift canary: asserts each driver-generated table still has
  * the schema this engine expects, and names the drifted column in the
  * failure message when it doesn't.
  *
  * Motivation: the `events.ts` column silently changed physical
  * representation between testdata generations (Parquet TIMESTAMP(NANOS)
  * → TIMESTAMP(MICROS)), which cost a full round of events-surface
  * signals before anyone saw a readable error. The reference's
  * safe-schema machinery (lakeshack/lakeshack.py:352-363,414-456) exists
  * for exactly this failure class; this is the detection half (the
  * adaptation half is [[graft.streaming.EventsStream.normalizeTs]]).
  *
  * Columns whose representation is ALLOWED to vary (timestamps readable
  * as nanos-long / NTZ / TZ) list every accepted dtype — the canary
  * checks membership, not equality, so it only fires on drift the engine
  * genuinely cannot absorb.
  */
object TestdataCanary {

  /** Accepted dtypes for a timestamp-carrying column across known
    * testdata generations (nanos-as-long requires the session flag
    * spark.sql.legacy.parquet.nanosAsLong — set before checking). */
  private val TsLike: Set[DataType] =
    Set(LongType, TimestampNTZType, TimestampType)

  /** table → (column → accepted dtypes). Column ORDER is not checked
    * (projection handles reorder); presence and dtype are. */
  val expected: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map(
      "r_regionkey" -> Set(IntegerType, LongType), "r_name" -> Set(StringType)),
    "nation" -> Map(
      "n_nationkey" -> Set(IntegerType, LongType), "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType, LongType)),
    "customer" -> Map(
      "c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType, LongType),
      "c_acctbal" -> Set(DoubleType), "c_mktsegment" -> Set(StringType)),
    "supplier" -> Map(
      "s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType, LongType), "s_acctbal" -> Set(DoubleType)),
    "part" -> Map(
      "p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType, LongType), "p_retailprice" -> Set(DoubleType)),
    "orders" -> Map(
      "o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> (TsLike + DateType), "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Map(
      "l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType, LongType),
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> (TsLike + DateType)),
    "events" -> Map(
      "event_id" -> Set(LongType), "ts" -> TsLike,
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Map(
      "doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType, IntegerType)),
    "embeddings" -> Map(
      "vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = false),
        ArrayType(DoubleType), ArrayType(DoubleType, containsNull = false)),
      "label" -> Set(IntegerType, LongType)))

  /** Returns one human-readable message per drift found under `sfDir`
    * (empty = all tables match). Footer-only reads — no data scan. */
  def check(spark: SparkSession, sfDir: String): Seq[String] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val path = s"$sfDir/$table.parquet"
      try {
        val actual = spark.read.parquet(path).schema
          .map(f => f.name -> f.dataType).toMap
        val missing = (cols.keySet -- actual.keySet).toSeq.sorted
          .map(c => s"$table.$c: MISSING (expected one of ${cols(c).mkString("/")})")
        val drifted = cols.toSeq.sortBy(_._1).collect {
          case (c, accepted) if actual.contains(c) && !accepted.contains(actual(c)) =>
            s"$table.$c: dtype drifted to ${actual(c)} " +
              s"(engine accepts ${accepted.mkString("/")})"
        }
        missing ++ drifted
      } catch {
        case e: Throwable => Seq(s"$table: unreadable at $path — ${e.getMessage}")
      }
    }
  }
}
