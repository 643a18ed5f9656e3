package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Resolve `delta.`/path`` (and `graft.`/path``) RELATIONS inside any
  * SQL statement — `SELECT * FROM delta.`/data/events``, joins,
  * subqueries — the last piece of Delta's SQL idiom (round 10, with
  * [[GraftSqlParser]]'s DDL statements). Spark's own ResolveSQLOnFile
  * only serves FileFormat providers and THROWS
  * (`UNSUPPORTED_DATASOURCE_FOR_DIRECT_QUERY`) on the V1 graft-delta
  * relation before any injected resolution rule can run — so
  * [[GraftSqlParser.parsePlan]] applies this substitution at parse
  * time, before the analyzer ever sees the unresolved node.
  *
  * Scope discipline: only two-part identifiers whose first part is
  * `delta`/`graft` AND whose second part is a directory carrying a
  * `_delta_log` substitute; everything else is left untouched for
  * Spark's resolution (catalog tables in a database named `delta`
  * keep working, and a bad path still produces Spark's own error). */
object GraftPathTableResolution {

  def resolve(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case u: UnresolvedRelation if resolvable(u) =>
        val path = u.multipartIdentifier(1)
        LogicalRelation(
          GraftDeltaRelation.relation(spark, path, DeltaLog.snapshot(path)),
          isStreaming = false)
    }

  private def resolvable(u: UnresolvedRelation): Boolean =
    !u.isStreaming && u.multipartIdentifier.length == 2 &&
      Seq("delta", "graft").exists(u.multipartIdentifier.head
        .equalsIgnoreCase) &&
      { val p = u.multipartIdentifier(1)
        DeltaLog.versions(p).nonEmpty ||
          DeltaLog.checkpointVersions(p).nonEmpty }
}
