package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.sources.GraftDeltaFileIndex

/** Metadata-only `COUNT(*)` over a graft-delta table — the capability
  * stock Delta ships as `OptimizeMetadataOnlyDeltaQuery`: a global,
  * unfiltered row count is already recorded in the transaction log
  * (every add action carries `stats.n`, the Delta paper's per-file
  * numRecords; a deletion vector's `cardinality` is the dead-row
  * count), so the answer is a log fold, not a table scan. At 100 TB
  * the difference is "read one KB-sized snapshot the driver already
  * holds" vs "schedule a cluster pass over every footer" — `SELECT
  * COUNT(*)` on a petabyte table answers in milliseconds.
  *
  * Injected through [[graft.GraftExtensions]] (the idiomatic
  * `SparkSessionExtensions.injectOptimizerRule` seam), so it runs
  * inside the operator-optimization fixed point of every session built
  * with the extension. The rewrite fires ONLY when wrong answers are
  * impossible:
  *
  *   - the aggregate is global (no grouping) and every output column
  *     is a bare `COUNT(1)` / `COUNT(*)` — non-distinct, unfiltered
  *     (`COUNT(col)` skips nulls and must scan; `count(DISTINCT …)`
  *     and `FILTER (WHERE …)` aggregates too);
  *   - the child is the untouched relation (optionally under the
  *     column-pruning `Project` of plain attributes) — any `Filter`
  *     in between disqualifies the plan, because the log count is the
  *     FULL snapshot's;
  *   - every live file in the snapshot carries a `stats.n` — one
  *     stats-less file (foreign writer, skipped collection) makes the
  *     count unknowable from metadata and the scan plan stands.
  *
  * Time travel composes for free: the relation's [[GraftDeltaFileIndex]]
  * is pinned to the snapshot being queried, so `versionAsOf` counts
  * that version's rows. DeltaSpec proves scan-vs-metadata equality
  * across appends, vectored deletes and time travel; PlanSpec asserts
  * the plan really is scan-free (a LocalRelation leaf).
  */
object MetadataOnlyCount extends Rule[LogicalPlan] {

  /** The snapshot's exact live row count, when the log can prove it. */
  private def statCount(plan: LogicalPlan): Option[Long] = plan match {
    // the column-pruning projection Dataset.count() leaves behind
    // (Project [] or a plain attribute subset) is count-preserving;
    // anything computed is not worth modeling — bail
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[Attribute]) =>
      statCount(child)
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case idx: GraftDeltaFileIndex => idx.metadataRowCount
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  /** `COUNT(*)`/`COUNT(1)` exactly: non-distinct, no FILTER clause,
    * counting a non-null literal (COUNT(col) must scan for nulls). */
  private def isCountStar(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case Count(Seq(Literal(v, _))) => v != null
        case _ => false
      }
    case _ => false
  }

  /** A literal companion column (CollapseProject folds tag projections
    * like `lit("cur").as("state")` INTO the aggregate list — the
    * common shape of `count().select(lit(tag), col("count"))`). Its
    * value is input-independent, so the rewrite just replays it. */
  private def literalValue(e: NamedExpression): Option[Any] = e match {
    case Alias(Literal(v, _), _) => Some(v)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate
        if agg.groupingExpressions.isEmpty &&
          agg.aggregateExpressions.exists(isCountStar) &&
          agg.aggregateExpressions.forall(e =>
            isCountStar(e) || literalValue(e).isDefined) =>
      statCount(agg.child) match {
        case Some(n) =>
          val values = agg.aggregateExpressions.map(e =>
            if (isCountStar(e)) n else literalValue(e).get)
          LocalRelation(agg.output, Seq(InternalRow.fromSeq(values)))
        case None => agg
      }
  }
}
