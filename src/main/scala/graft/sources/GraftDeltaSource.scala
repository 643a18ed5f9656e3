package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `format("graft-delta")` integration: the Delta-equivalent layer
  * (DeltaLog/DeltaTable) exposed through Spark's stable V1 source API,
  * so the reference's exact call shapes work verbatim against our
  * engine:
  *
  * {{{
  * df.write.format("graft-delta").mode("overwrite").save(path)
  *   // examples/example_lakesail_kerberos.py:166
  * df.write.format("graft-delta").mode("append").save(path)   // :178
  * spark.read.format("graft-delta").load(path)
  *   // examples/read_deltalake_hdfs.py:57-67
  * spark.read.format("graft-delta").option("versionAsOf", 0).load(path)
  *   // README.md:302's time-travel claim
  * }}}
  *
  * Scan strategy: `PrunedScan` — Spark hands us the required column
  * set and we delegate to the snapshot's parquet scan with exactly
  * that projection, so column pruning reaches the files; predicate
  * filters are re-applied by Spark above the scan (correct, and the
  * inner parquet read is itself a full Catalyst plan, so pushdown
  * still happens for the delegated scan). Registered via
  * META-INF/services so the short name resolves.
  */
class GraftDeltaSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-delta"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta requires a path (use .load(path)/.save(path))"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val versionAsOf = parameters.get("versionAsOf").map(_.toLong)
    GraftDeltaRelation(sqlContext, path(parameters), versionAsOf)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val p = path(parameters)
    val deltaMode = mode match {
      case SaveMode.Overwrite => "overwrite"
      case SaveMode.Append => "append"
      case SaveMode.ErrorIfExists if DeltaLog.versions(p).isEmpty => "overwrite"
      case SaveMode.ErrorIfExists => throw new IllegalStateException(
        s"graft-delta table already exists: $p")
      case SaveMode.Ignore if DeltaLog.versions(p).isEmpty => "overwrite"
      case SaveMode.Ignore => return GraftDeltaRelation(sqlContext, p, None)
    }
    DeltaTable.write(data, p, deltaMode)
    GraftDeltaRelation(sqlContext, p, None)
  }
}

case class GraftDeltaRelation(sqlContext: SQLContext, tablePath: String,
    versionAsOf: Option[Long]) extends BaseRelation with PrunedFilteredScan {

  override lazy val schema: StructType =
    DeltaTable.read(sqlContext.sparkSession, tablePath, versionAsOf).schema

  /** Filters are used ONLY for stats-based file skipping (min/max in
    * the log's add actions); declaring them all unhandled makes Spark
    * re-evaluate every predicate above this scan, so skipping can stay
    * approximate while results stay exact. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val df = DeltaTable.read(sqlContext.sparkSession, tablePath, versionAsOf,
      filters.toSeq)
    val pruned =
      if (requiredColumns.isEmpty)
        // COUNT(*)-style scan: no columns needed, keep cardinality
        df.select()
      else df.select(requiredColumns.map(org.apache.spark.sql.functions.col): _*)
    pruned.rdd
  }
}
