package graft.lake

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL-transparent access to [[SnapshotLog]] tables — the DataSource V2
  * `TableCatalog` that makes time travel a LANGUAGE feature instead of
  * an API call:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.snap", classOf[SnapshotCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.snap.root", "/data/lake")
  *   spark.sql("SELECT * FROM snap.docs")                      // head
  *   spark.sql("SELECT * FROM snap.docs VERSION AS OF 3")      // pinned
  *   spark.sql("SELECT * FROM snap.docs TIMESTAMP AS OF '…'")  // by commit ts
  * }}}
  *
  * The catalog maps `snap.<ns…>.<name>` to the snapshot table at
  * `<root>/<ns…>/<name>` and serves the RESOLVED version's live file
  * set through Spark's own `ParquetTable` with the schema committed at
  * that version — so predicate pushdown, column pruning, and row-group
  * skipping all work unchanged, and a column added later never bleeds
  * into an old version. The reference has no versioned SQL surface at
  * all (lakeshack/lakeshack.py:550-557 interpolates SQL strings over
  * one live layout); this is the Spark-native finish of its
  * query-the-lake story.
  *
  * Scope (documented, not silent):
  *  - READ-ONLY: `createTable`/`alterTable`/`dropTable`/`renameTable`
  *    throw — commits go through [[SnapshotLog]], whose claim protocol
  *    is the single writer path (one commit point, [[SnapshotLog.commit]]).
  *  - A version carrying DELETION VECTORS is refused with a pointer to
  *    `SnapshotLog.read` / `purgeDeletes`: a plain parquet scan cannot
  *    apply the positional anti-join, and silently resurrecting dead
  *    rows would be a correctness bug, not a degraded mode.
  *
  * `TIMESTAMP AS OF` resolves to the NEWEST version whose commit
  * timestamp is ≤ the asked instant (micros, as Spark hands it over) —
  * the same contract Delta/Iceberg document.
  *
  * Scale: resolution is one manifest-log listing + O(interval) small
  * reads on the driver ([[SnapshotLog.state]]); the scan itself is a
  * stock distributed parquet read over exactly the version's files.
  */
class SnapshotCatalog extends TableCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null && root.nonEmpty,
      s"catalog '$name' needs spark.sql.catalog.$name.root = <dir of snapshot tables>")
  }

  override def name(): String = catalogName

  private def spark: SparkSession =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .getOrElse(throw new IllegalStateException(
        s"catalog '$catalogName' used with no active SparkSession"))

  private def tablePath(ident: Identifier): String =
    ((root +: ident.namespace.toSeq) :+ ident.name).mkString("/")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val s = spark
    val dir = new Path((root +: namespace.toSeq).mkString("/"))
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).iterator
      .filter(st => st.isDirectory && fs.exists(new Path(st.getPath, "_log")))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    SnapshotLog.currentVersion(spark, tablePath(ident)) >= 0

  override def loadTable(ident: Identifier): Table = tableAt(ident, None)

  /** `VERSION AS OF <v>` — a committed version number, or (quoted) a
    * TAG name ([[Branches.tag]]'s immutable pins): `VERSION AS OF
    * 'march-run'` reads exactly the snapshot the March run trained on,
    * and retention never expires below a live tag, so the query stays
    * answerable until the tag is dropped. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toLong catch {
      case _: NumberFormatException =>
        Branches.tagVersions(spark, tablePath(ident)).getOrElse(version,
          throw new IllegalArgumentException(
            s"'$version' is neither a commit number nor a tag of " +
              s"$catalogName.$ident (see SnapshotLog.history / Branches.tag)"))
    }
    tableAt(ident, Some(v))
  }

  /** `TIMESTAMP AS OF <ts>` (micros): the newest version committed at
    * or before the instant. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val s = spark
    val p = tablePath(ident)
    if (SnapshotLog.currentVersion(s, p) < 0) throw new NoSuchTableException(ident)
    val tsMillis = timestampMicros / 1000L
    val v = SnapshotLog.history(s, p)
      .where(org.apache.spark.sql.functions.col("ts_millis") <= tsMillis)
      .select("version")
      .collect().map(_.getLong(0)).sorted.lastOption
      .getOrElse(throw new IllegalArgumentException(
        s"$catalogName.$ident has no version at or before ts_millis=$tsMillis " +
          "(the table was created later)"))
    tableAt(ident, Some(v))
  }

  private def tableAt(ident: Identifier, asOf: Option[Long]): Table = {
    val s = spark
    val p = tablePath(ident)
    if (SnapshotLog.currentVersion(s, p) < 0) throw new NoSuchTableException(ident)
    val snap = SnapshotLog.state(s, p, asOf)
    require(snap.dvs.isEmpty,
      s"$catalogName.$ident v${snap.version} carries deletion vectors — a SQL " +
        "parquet scan would resurrect dead rows. Read it via SnapshotLog.read " +
        "(merge-on-read) or fold the vectors first with SnapshotLog.purgeDeletes.")
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val rootP = new Path(p)
    val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    val dataRoot = SnapshotLog.dataRootOf(rootP)
    val paths = snap.files.map(f => fs.makeQualified(new Path(dataRoot, f)).toString)
    ParquetTable(s"$catalogName.${ident.toString}@v${snap.version}", s,
      CaseInsensitiveStringMap.empty(), paths, Some(schema),
      classOf[ParquetFileFormat])
  }

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"$catalogName is read-only ($op unsupported) — commit through " +
        "SnapshotLog.write/merge/delete, whose manifest claim is the one " +
        "write path with ACID semantics")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    readOnly("CREATE TABLE")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean = readOnly("DROP TABLE")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")
}
