package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSimilarity, DotProduct, GeometricMean}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`), then:
  *   SELECT cosine_similarity(a.embedding, b.embedding) FROM ...
  * DataFrame callers don't need the extension — graft.ops.Similarity
  * builds the expression directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "cosine_similarity expects exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "dot_product expects exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    // aggregate functions register the same way: the analyzer wraps a
    // returned AggregateFunction in its AggregateExpression
    // SQL UPDATE over snapshot-catalog tables: Spark has no built-in
    // UPDATE execution path for plain connectors — this routes the
    // resolved UpdateTable to SnapshotLog.update's atomic merge-on-read
    // commit (see graft.lake.ResolveSnapshotUpdate)
    ext.injectResolutionRule(session => graft.lake.ResolveSnapshotUpdate(session))
    // FILTERED aggregate pushdown: `SELECT count/min/max … WHERE c
    // BETWEEN lo AND hi / IN (…)` over a snapshot table answers covered
    // files from cached footers and scans only the boundary files
    // (graft.lake.PushFilteredAggToManifest — the SQL surface of the
    // API's StatsAgg.rangeAggFiles). MUST run before the DV vectorize
    // rule: it degrades DV-carrying files per-file to a DV-applying
    // scan, so it needs to see the raw relation; when it bails, the
    // vectorize rule right after it takes the relation in the SAME
    // fixed-point iteration
    ext.injectResolutionRule(session => graft.lake.PushFilteredAggToManifest(session))
    // vectorized SQL reads of DV-carrying snapshot versions: replaces
    // the row-based whole-version fallback scan with the pruned +
    // pushed + columnar anti-join form (graft.lake.VectorizeSnapshotDvRead)
    ext.injectResolutionRule(session => graft.lake.VectorizeSnapshotDvRead(session))
    ext.injectFunction((
      new FunctionIdentifier("geo_mean"),
      new ExpressionInfo(classOf[GeometricMean].getName, "geo_mean"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "geo_mean expects exactly 1 argument")
        GeometricMean(org.apache.spark.sql.catalyst.expressions.Cast(
          children.head, org.apache.spark.sql.types.DoubleType))
      }))
  }
}
