package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, StructType}

/** `format("graft-delta")` / `format("delta")` integration: the
  * Delta-equivalent layer (DeltaLog/DeltaTable) exposed through Spark's
  * source API, so the reference's exact call shapes work verbatim
  * against our engine:
  *
  * {{{
  * df.write.format("delta").mode("overwrite").save(path)
  *   // examples/example_lakesail_kerberos.py:166
  * df.write.format("delta").mode("append").save(path)   // :178
  * spark.read.format("delta").load(path)
  *   // examples/read_deltalake_hdfs.py:57-67
  * spark.read.format("delta").option("versionAsOf", 0).load(path)
  *   // README.md:302's time-travel claim
  * }}}
  *
  * Scan strategy: the read relation is a [[HadoopFsRelation]] over the
  * snapshot's live-file list, so planning produces a real vectorized
  * `FileSourceScanExec` — columnar batches, whole-stage codegen above
  * the scan, pushed-down parquet filters. (Round 1 used a V1
  * `PrunedFilteredScan` whose `buildScan` returned `df.rdd`: correct,
  * but the `RDD[Row]` boundary deserialized every InternalRow and
  * severed codegen right at the table-scan hot path.) Log-level
  * min/max data skipping lives in [[GraftDeltaFileIndex.listFiles]],
  * which sees the query's data filters before file listing — same
  * placement as Delta's own implementation.
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
    val spark = sqlContext.sparkSession
    val table = path(parameters)
    val snap = DeltaLog.snapshot(table, versionAsOf)
    val schema = snap.schemaJson
      .map(j => DataType.fromJson(j).asInstanceOf[StructType])
      .getOrElse(spark.read.parquet(
        snap.files.map(f => s"$table/${f.path}"): _*).schema)
    HadoopFsRelation(
      location = new GraftDeltaFileIndex(table, snap, schema),
      partitionSchema = new StructType(),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
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
      case SaveMode.Ignore =>
        return createRelation(sqlContext, parameters - "versionAsOf")
    }
    val mergeSchema = parameters.get("mergeSchema").exists(_.toBoolean)
    DeltaTable.write(data, p, deltaMode, mergeSchema)
    createRelation(sqlContext, parameters - "versionAsOf")
  }
}

/** The reference calls the format by its real short name —
  * `format("delta")` in every script (examples/example_lakesail_kerberos
  * .py:166,171,178,182, examples/read_deltalake_hdfs.py:58,64). No
  * delta-spark jar exists in this environment, so the name is free;
  * registering this alias makes those call shapes run verbatim. One
  * registered class per short name (DataSourceRegister maps 1:1), hence
  * the subclass. */
class DeltaNamedSource extends GraftDeltaSource {
  override def shortName(): String = "delta"
}

/** File listing for a graft-delta snapshot: the live files from the
  * log, minus files whose min/max stats disprove the query's pushed
  * data filters (Delta-paper data skipping). `listFiles` receives the
  * post-analysis filter expressions, so skipping happens before any
  * I/O; the parquet reader still re-applies every predicate (plus its
  * own row-group stats), so approximate skipping can never change
  * results. */
class GraftDeltaFileIndex(table: String, snap: DeltaLog.Snapshot,
    schema: StructType) extends FileIndex {

  private val tablePath = new HPath(table)

  private def status(f: DeltaLog.AddFile): FileStatus =
    new FileStatus(f.size, false, 1, 128L * 1024 * 1024, 0L,
      new HPath(tablePath, f.path))

  override def rootPaths: Seq[HPath] = Seq(tablePath)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val translated = dataFilters.flatMap(GraftDeltaFileIndex.translate)
    val live = DeltaTable.liveFilesAfterSkipping(snap, translated, schema)
    Seq(PartitionDirectory(InternalRow.empty, live.map(status).toArray))
  }

  override def inputFiles: Array[String] =
    snap.files.map(f => new HPath(tablePath, f.path).toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = snap.files.map(_.size).sum

  override def partitionSchema: StructType = new StructType()
}

object GraftDeltaFileIndex {
  import org.apache.spark.sql.catalyst.expressions.{
    And => CAnd, Attribute, EqualTo => CEq, GreaterThan => CGt,
    GreaterThanOrEqual => CGe, LessThan => CLt, LessThanOrEqual => CLe, Literal}

  /** Catalyst → sources.Filter, covering exactly the conjunctive
    * comparison shapes [[DeltaTable.liveFilesAfterSkipping]] can use
    * (Spark's own translator is `protected`). Anything else maps to
    * nothing — the file is kept and the scan re-applies the predicate,
    * so under-translation is always safe. */
  private[sources] def translate(e: Expression): Option[Filter] = e match {
    case CAnd(l, r) => (translate(l), translate(r)) match {
      case (Some(a), Some(b)) => Some(And(a, b))
      case (a, b) => a.orElse(b) // half-translated AND still prunes
    }
    case CEq(a: Attribute, Literal(v, _)) => Some(EqualTo(a.name, v))
    case CEq(Literal(v, _), a: Attribute) => Some(EqualTo(a.name, v))
    case CGt(a: Attribute, Literal(v, _)) => Some(GreaterThan(a.name, v))
    case CGt(Literal(v, _), a: Attribute) => Some(LessThan(a.name, v))
    case CGe(a: Attribute, Literal(v, _)) => Some(GreaterThanOrEqual(a.name, v))
    case CGe(Literal(v, _), a: Attribute) => Some(LessThanOrEqual(a.name, v))
    case CLt(a: Attribute, Literal(v, _)) => Some(LessThan(a.name, v))
    case CLt(Literal(v, _), a: Attribute) => Some(GreaterThan(a.name, v))
    case CLe(a: Attribute, Literal(v, _)) => Some(LessThanOrEqual(a.name, v))
    case CLe(Literal(v, _), a: Attribute) => Some(GreaterThanOrEqual(a.name, v))
    case _ => None
  }
}
