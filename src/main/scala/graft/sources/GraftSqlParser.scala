package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType, TimestampType}

/** SQL DDL surface for the Delta maintenance operations (SURVEY.md
  * §2: the reference's users speak SQL strings —
  * examples/read_deltalake_hdfs.py:100-118 — but until round 10 every
  * maintenance operation was a Scala call). Injected via
  * `GraftExtensions` (`injectParser`), this parser intercepts the
  * path-addressed Delta statements and maps them 1:1 onto the
  * existing [[DeltaTable]] API; EVERYTHING else — including the same
  * statement shapes over catalog identifiers — delegates to Spark's
  * own parser untouched.
  *
  * Table references are path-addressed, in either Delta's idiom or a
  * plain string literal:
  * {{{
  *   OPTIMIZE delta.`/data/events`
  *   OPTIMIZE '/data/events' WHERE event_date = '2024-01-01'
  *   OPTIMIZE delta.`/data/events` ZORDER BY (user_id, ts)
  *   VACUUM delta.`/data/events` RETAIN 168 HOURS
  *   DESCRIBE HISTORY delta.`/data/events`
  *   DESCRIBE DETAIL delta.`/data/events`
  *   RESTORE delta.`/data/events` TO VERSION AS OF 3
  *   ALTER TABLE delta.`/t` ADD CONSTRAINT c CHECK (amount > 0)
  *   ALTER TABLE delta.`/t` SET TBLPROPERTIES ('k' = 'v')
  *   ALTER TABLE delta.`/t` RENAME COLUMN a TO b
  *   ALTER TABLE delta.`/t` DROP COLUMN a
  *   ALTER TABLE delta.`/t` ALTER COLUMN a TYPE bigint
  * }}}
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = {
    val plan = parseGraftStatement(sqlText, delegate).getOrElse(
      delegate.parsePlan(sqlText))
    // `FROM delta.`/path``: substitute the graft-delta relation before
    // the analyzer's ResolveSQLOnFile throws on the non-FileFormat
    // provider (see GraftPathTableResolution)
    GraftPathTableResolution.resolve(session, plan)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  /** A path-addressed table reference: `delta.`/p`` / `graft.`/p`` /
    * `'/p'` / `"/p"`. Catalog identifiers deliberately do NOT match —
    * those belong to Spark's parser. */
  private val Tbl = """(?:(?:delta|graft)\s*\.\s*`([^`]+)`|'([^']+)'|"([^"]+)")"""

  private val OptimizeRe =
    ("""(?is)^\s*OPTIMIZE\s+""" + Tbl + """\s*(.*?)\s*;?\s*$""").r
  private val VacuumRe =
    ("""(?is)^\s*VACUUM\s+""" + Tbl +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS?)?\s*;?\s*$""").r
  private val DescribeRe =
    ("""(?is)^\s*DESC(?:RIBE)?\s+(HISTORY|DETAIL)\s+""" + Tbl +
      """\s*;?\s*$""").r
  private val RestoreRe =
    ("""(?is)^\s*RESTORE\s+(?:TABLE\s+)?""" + Tbl +
      """\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r
  private val AlterRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Tbl + """\s+(.+?)\s*;?\s*$""").r

  private val ZorderTail = """(?is)^ZORDER\s+BY\s+\(?\s*([^)]+?)\s*\)?$""".r
  private val WhereTail = """(?is)^WHERE\s+(.+)$""".r
  private val AddConstraintTail =
    """(?is)^ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)$""".r
  private val SetPropsTail = """(?is)^SET\s+TBLPROPERTIES\s*\((.+)\)$""".r
  private val PropPair = """'([^']+)'\s*=\s*'([^']*)'""".r
  private val RenameColTail =
    """(?is)^RENAME\s+COLUMN\s+`?(\w+)`?\s+TO\s+`?(\w+)`?$""".r
  private val DropColTail = """(?is)^DROP\s+COLUMN\s+`?(\w+)`?$""".r
  private val AlterColTail =
    """(?is)^ALTER\s+COLUMN\s+`?(\w+)`?\s+(?:SET\s+)?(?:DATA\s+)?TYPE\s+(.+)$""".r

  private def pathOf(g1: String, g2: String, g3: String): String =
    Seq(g1, g2, g3).find(_ != null).get

  private[sources] def parseGraftStatement(sqlText: String,
      delegate: ParserInterface): Option[LogicalPlan] = sqlText match {
    case OptimizeRe(a, b, c, tail) =>
      val path = pathOf(a, b, c)
      tail match {
        case "" => Some(GraftOptimize(path, None, Nil))
        case ZorderTail(cols) => Some(GraftOptimize(path, None,
          cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty).toSeq))
        case WhereTail(pred) =>
          require(!pred.toUpperCase.contains("ZORDER BY"),
            "OPTIMIZE ... WHERE ... ZORDER BY is not supported: zorder " +
              "clusters whole (unpartitioned) tables")
          // parse NOW so syntax errors surface at parse time, but carry
          // the SQL string: an Expression field on a leaf command would
          // hit CheckAnalysis as an unresolved attribute (there is no
          // child to resolve against — the predicate binds to the
          // table's partition columns inside run())
          delegate.parseExpression(pred)
          Some(GraftOptimize(path, Some(pred), Nil))
        case other => throw new IllegalArgumentException(
          s"OPTIMIZE: unrecognized clause '$other' (expected nothing, " +
            "WHERE <partition predicate>, or ZORDER BY (cols))")
      }
    case VacuumRe(a, b, c, hours) =>
      Some(GraftVacuum(pathOf(a, b, c),
        Option(hours).map(_.toLong)))
    case DescribeRe(kind, a, b, c) =>
      if (kind.equalsIgnoreCase("HISTORY"))
        Some(GraftDescribeHistory(pathOf(a, b, c)))
      else Some(GraftDescribeDetail(pathOf(a, b, c)))
    case RestoreRe(a, b, c, v) =>
      Some(GraftRestore(pathOf(a, b, c), v.toLong))
    case AlterRe(a, b, c, tail) =>
      val path = pathOf(a, b, c)
      tail match {
        case AddConstraintTail(name, expr) =>
          Some(GraftAddConstraint(path, name, expr.trim))
        case SetPropsTail(pairs) =>
          val kvs = PropPair.findAllMatchIn(pairs)
            .map(m => m.group(1) -> m.group(2)).toSeq
          require(kvs.nonEmpty,
            "SET TBLPROPERTIES needs ('key' = 'value') pairs " +
              "(single-quoted)")
          Some(GraftSetProperties(path, kvs))
        case RenameColTail(from, to) =>
          Some(GraftRenameColumn(path, from, to))
        case DropColTail(col) => Some(GraftDropColumn(path, col))
        case AlterColTail(col, tpe) =>
          Some(GraftAlterColumnType(path, col,
            delegate.parseDataType(tpe.trim)))
        case other => throw new IllegalArgumentException(
          s"ALTER TABLE on a path table: unrecognized clause '$other' " +
            "(supported: ADD CONSTRAINT, SET TBLPROPERTIES, RENAME " +
            "COLUMN, DROP COLUMN, ALTER COLUMN ... TYPE)")
      }
    case _ => None
  }
}

/** `OPTIMIZE path [WHERE pred | ZORDER BY (cols)]` → [[DeltaTable]]
  * compact / compactWhere / zorder. Returns the committed version. */
case class GraftOptimize(path: String, whereSql: Option[String],
    zorderBy: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val v = (whereSql, zorderBy) match {
      case (None, Nil) => DeltaTable.compact(session, path)
      case (None, cols) => DeltaTable.zorder(session, path, cols)
      case (Some(predSql), Nil) =>
        val pred = session.sessionState.sqlParser.parseExpression(predSql)
        val filter = GraftDeltaFileIndex.translate(pred).getOrElse(
          throw new IllegalArgumentException(
            s"OPTIMIZE WHERE: predicate '$predSql' is not a " +
              "conjunctive comparison over partition columns"))
        DeltaTable.compactWhere(session, path, Seq(filter))
      case _ => throw new IllegalStateException("unreachable: parser " +
        "refuses WHERE + ZORDER BY")
    }
    Seq(Row(v))
  }
}

/** `VACUUM path [RETAIN n HOURS]` → [[DeltaTable.vacuum]] /
  * [[DeltaTable.vacuumRetain]]. One row per deleted data file. */
case class GraftVacuum(path: String, retainHours: Option[Long])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("deleted_path", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val deleted = retainHours match {
      case Some(h) => DeltaTable.vacuumRetain(path, h * 3600L * 1000L)
      case None => DeltaTable.vacuum(path)
    }
    deleted.map(Row(_))
  }
}

/** `DESCRIBE HISTORY path` → [[DeltaTable.history]] (schema pinned to
  * its DataFrame's — GraftSqlSpec asserts equality). */
case class GraftDescribeHistory(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("timestamp", TimestampType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = true)(),
    AttributeReference("num_adds", LongType, nullable = false)(),
    AttributeReference("num_removes", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    DeltaTable.history(session, path).collect().toSeq
}

/** `DESCRIBE DETAIL path` → [[DeltaTable.detail]]. */
case class GraftDescribeDetail(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("partition_columns", StringType, nullable = false)(),
    AttributeReference("num_constraints",
      org.apache.spark.sql.types.IntegerType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    DeltaTable.detail(session, path).collect().toSeq
}

/** `RESTORE path [TO] VERSION AS OF n` → [[DeltaTable.restore]]. */
case class GraftRestore(path: String, version: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(DeltaTable.restore(path, version)))
}

/** `ALTER TABLE path ADD CONSTRAINT name CHECK (expr)`. */
case class GraftAddConstraint(path: String, name: String, expr: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(DeltaTable.addCheckConstraint(session, path, name, expr)))
}

/** `ALTER TABLE path SET TBLPROPERTIES ('k'='v', ...)` — one commit
  * per property, last committed version returned (the engine's
  * property commits are each atomic; a multi-key SET is rare and
  * idempotent on retry). */
case class GraftSetProperties(path: String, props: Seq[(String, String)])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(props.map { case (k, v) =>
      DeltaTable.setTableProperty(path, k, v) }.last))
}

/** `ALTER TABLE path RENAME COLUMN a TO b` (column mapping). */
case class GraftRenameColumn(path: String, from: String, to: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(DeltaTable.renameColumn(path, from, to)))
}

/** `ALTER TABLE path DROP COLUMN a` (column mapping). */
case class GraftDropColumn(path: String, col: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(DeltaTable.dropColumn(path, col)))
}

/** `ALTER TABLE path ALTER COLUMN a TYPE t` (type widening). */
case class GraftAlterColumnType(path: String, col: String,
    to: org.apache.spark.sql.types.DataType) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(DeltaTable.alterColumnType(path, col, to)))
}
