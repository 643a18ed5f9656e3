package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{StringType, TimestampType}

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
      // WRITE-PATH GUARD: an INSERT form [[GraftSqlParser.InsertRe]]
      // does not intercept (column list used to hit this; PARTITION
      // spec, BY NAME, …) parses to Spark's own InsertIntoStatement —
      // and the substitution below would hand it a writable
      // HadoopFsRelation, so Spark would plan
      // InsertIntoHadoopFsRelationCommand: parquet written past the
      // delta log (invisible to readers, vacuumed as orphans), and a
      // static-partition OVERWRITE could delete live committed files.
      // Refuse loudly instead; bytes enter a delta table only through
      // DeltaTable.write. (transformUp rewrites the child relation
      // first, so match both the pre- and post-substitution target.)
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
          if isGraftPathTarget(i.table) =>
        throw new UnsupportedOperationException(
          "unsupported INSERT form on a delta path table (supported: " +
            "INSERT INTO | OVERWRITE delta.`/p` [(col, …)] " +
            "VALUES/SELECT/TABLE/FROM …; PARTITION specs and BY NAME " +
            "are not). Routing this through Spark's parquet insert " +
            "would write past the delta log.")
      // SQL TIME TRAVEL (round 11): `FROM delta.`/p`` VERSION AS OF n /
      // TIMESTAMP AS OF ts` — Spark's parser wraps the unresolved
      // relation in RelationTimeTravel; resolve it against the SAME
      // version/timestamp resolvers the options API uses
      // (DeltaLog.snapshot / versionAtTimestamp), so SQL and
      // `spark.read.option("versionAsOf", …)` can never diverge.
      case RelationTimeTravel(u: UnresolvedRelation, ts, ver)
          if resolvable(u) =>
        val path = u.multipartIdentifier(1)
        val versionAsOf = (ver, ts) match {
          case (Some(v), _) => v.trim.toLongOption.getOrElse(
            throw new IllegalArgumentException(
              s"VERSION AS OF '$v' on delta.`$path`: expected an " +
                "integer version"))
          case (None, Some(e)) =>
            DeltaLog.versionAtTimestamp(path, timestampMillis(path, e))
          case (None, None) => throw new IllegalArgumentException(
            s"time travel on delta.`$path`: no version or timestamp")
        }
        LogicalRelation(
          GraftDeltaRelation.relation(spark, path,
            DeltaLog.snapshot(path, Some(versionAsOf))),
          isStreaming = false)
      case u: UnresolvedRelation if resolvable(u) =>
        val path = u.multipartIdentifier(1)
        LogicalRelation(
          GraftDeltaRelation.relation(spark, path, DeltaLog.snapshot(path)),
          isStreaming = false)
    }

  /** Evaluate a parse-time TIMESTAMP AS OF expression to epoch millis:
    * a string literal goes through the option API's format
    * (`yyyy-MM-dd[ HH:mm:ss]` or epoch millis), a timestamp-typed
    * foldable expression through its micros value. */
  private def timestampMillis(path: String, e: Expression): Long = {
    require(e.foldable,
      s"TIMESTAMP AS OF on delta.`$path`: expression must be a literal")
    (e.eval(), e.dataType) match {
      case (s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        GraftDeltaSource.parseTimestampAsOf(s.toString)
      case (micros: java.lang.Long, TimestampType) => micros / 1000L
      case (v, t) => throw new IllegalArgumentException(
        s"TIMESTAMP AS OF on delta.`$path`: unsupported literal $v of " +
          s"type $t (use a 'yyyy-MM-dd[ HH:mm:ss]' string, epoch " +
          "millis, or a timestamp)")
    }
  }

  /** Is this INSERT target a graft path table — either still
    * unresolved (bare rule order) or already substituted by the
    * relation case below (bottom-up transform order)? */
  private def isGraftPathTarget(t: LogicalPlan): Boolean = t match {
    case u: UnresolvedRelation => resolvable(u)
    case lr: LogicalRelation => lr.relation match {
      case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        h.location.isInstanceOf[GraftDeltaFileIndex]
      case _ => false
    }
    case _ => false
  }

  private def resolvable(u: UnresolvedRelation): Boolean =
    !u.isStreaming && u.multipartIdentifier.length == 2 &&
      Seq("delta", "graft").exists(u.multipartIdentifier.head
        .equalsIgnoreCase) &&
      { val p = u.multipartIdentifier(1)
        DeltaLog.versions(p).nonEmpty ||
          DeltaLog.checkpointVersions(p).nonEmpty }
}
