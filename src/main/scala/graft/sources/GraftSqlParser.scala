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
  private val DeleteRe =
    ("""(?is)^\s*DELETE\s+FROM\s+""" + Tbl + """\s*(.*?)\s*;?\s*$""").r
  // SET/WHERE split happens in code (splitOnKeyword), not here: a lazy
  // regex split at ` WHERE ` fires inside string literals too — `SET
  // note = 'as where x'` would truncate the assignment at parse time
  private val UpdateRe =
    ("""(?is)^\s*UPDATE\s+""" + Tbl + """\s+SET\s+(.+?)\s*;?\s*$""").r
  // USING/ON/WHEN boundaries are located in code (splitOnKeyword), not
  // by lazy regex groups: `USING (SELECT ... WHERE note = 'turn on x')`
  // would split at the literal's ' on ' otherwise — the same
  // quote-blindness class as the UPDATE SET/WHERE split
  private val MergeRe =
    ("""(?is)^\s*MERGE\s+INTO\s+""" + Tbl +
      """(?:\s+(?:AS\s+)?(?!USING\b)(\w+))?\s+USING\s+(.+?)\s*;?\s*$""").r
  private val UpsertWhenTail =
    """(?is)^WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+""" +
      """WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*$"""
  private val MergeSourceTbl = ("""(?is)^""" + Tbl +
    """(?:\s+(?:AS\s+)?(\w+))?$""").r
  private val MergeSourceSub =
    """(?is)^\((.+)\)(?:\s+(?:AS\s+)?(\w+))?$""".r
  private val MergeSourceIdent = """(?is)^([\w.]+)(?:\s+(?:AS\s+)?(\w+))?$""".r
  private val OnEquality =
    """(?is)^\s*(?:(\w+)\s*\.\s*)?`?(\w+)`?\s*=\s*(?:(\w+)\s*\.\s*)?`?(\w+)`?\s*$""".r
  private val Assignment =
    """(?is)^\s*`?(\w+)`?\s*=\s*(.+?)\s*$""".r
  private val VacuumRe =
    ("""(?is)^\s*VACUUM\s+""" + Tbl +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS?)?(?:\s+(DRY\s+RUN))?\s*;?\s*$""").r
  private val DescribeRe =
    ("""(?is)^\s*DESC(?:RIBE)?\s+(HISTORY|DETAIL)\s+""" + Tbl +
      """\s*;?\s*$""").r
  private val RestoreRe =
    ("""(?is)^\s*RESTORE\s+(?:TABLE\s+)?""" + Tbl +
      """\s+(?:TO\s+)?(?:VERSION\s+AS\s+OF\s+(\d+)""" +
      """|TIMESTAMP\s+AS\s+OF\s+'([^']+)')\s*;?\s*$""").r
  private val AlterRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Tbl + """\s+(.+?)\s*;?\s*$""").r
  /** `parquet.`/p`` — CONVERT's source idiom (a parquet directory, not
    * yet a delta table); the plain quoted forms also accepted. */
  private val PqTbl =
    """(?:parquet\s*\.\s*`([^`]+)`|'([^']+)'|"([^"]+)")"""
  private val ConvertRe =
    ("""(?is)^\s*CONVERT\s+TO\s+DELTA\s+""" + PqTbl +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]+)\))?\s*;?\s*$""").r
  private val CtasRe =
    ("""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+""" + Tbl +
      """(?:\s+USING\s+(?:graft[-_]?)?delta)?""" +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]+)\))?\s+AS\s+(SELECT\b.+?)\s*;?\s*$""").r
  private val CloneRe =
    ("""(?is)^\s*CREATE\s+TABLE\s+""" + Tbl + """\s+SHALLOW\s+CLONE\s+""" +
      Tbl + """(?:\s+VERSION\s+AS\s+OF\s+(\d+)""" +
      """|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?\s*;?\s*$""").r
  private val ShowPropsRe =
    ("""(?is)^\s*SHOW\s+TBLPROPERTIES\s+""" + Tbl + """\s*;?\s*$""").r
  private val InsertRe =
    ("""(?is)^\s*INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?""" + Tbl +
      """(?:\s*\(([\w`\s,]+)\))?""" +
      """\s+(VALUES\s.+?|SELECT\s.+?|TABLE\s.+?|FROM\s.+?)\s*;?\s*$""").r
  private val CopyIntoRe =
    ("""(?is)^\s*COPY\s+INTO\s+""" + Tbl + """\s+FROM\s+'([^']+)'""" +
      """(?:\s+FILEFORMAT\s*=\s*PARQUET)?\s*;?\s*$""").r

  private val ZorderTail = """(?is)^ZORDER\s+BY\s+\(?\s*([^)]+?)\s*\)?$""".r
  private val WhereTail = """(?is)^WHERE\s+(.+)$""".r
  private val AddConstraintTail =
    """(?is)^ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)$""".r
  private val SetPropsTail = """(?is)^SET\s+TBLPROPERTIES\s*\((.+)\)$""".r
  private val PropPair = """'([^']+)'\s*=\s*'([^']*)'""".r
  private val RenameColTail =
    """(?is)^RENAME\s+COLUMN\s+`?(\w+)`?\s+TO\s+`?(\w+)`?$""".r
  private val DropColTail = """(?is)^DROP\s+COLUMN\s+`?(\w+)`?$""".r
  private val DropConstraintTail =
    """(?is)^DROP\s+CONSTRAINT\s+(\w+)$""".r
  private val AlterColTail =
    """(?is)^ALTER\s+COLUMN\s+`?(\w+)`?\s+(?:SET\s+)?(?:DATA\s+)?TYPE\s+(.+)$""".r

  private def pathOf(g1: String, g2: String, g3: String): String =
    Seq(g1, g2, g3).find(_ != null).get


  /** Spark's string-literal BOUNDARIES are parser-mode-independent:
    * the lexer always consumes `\X` as one unit inside a literal —
    * `spark.sql.parser.escapedStringLiterals=true` only skips escape
    * INTERPRETATION ('a\'b' stays one literal with the backslash
    * retained in the value; a literal can never end in a bare
    * backslash in either mode — both facts pinned by GraftSqlSpec).
    * The scanners therefore skip the char after a backslash
    * unconditionally, exactly matching the lexer. */

  /** Split on `sep` at nesting depth 0, outside quotes — SQL commas in
    * function calls / string literals never split an assignment list.
    * Backslash-escaped quotes inside literals ('don\'t') do NOT end
    * the literal — Spark's default string-literal escaping. */
  private[sources] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    var depth = 0; var inS = false; var inD = false; var start = 0
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '\\' if inS || inD => i += 1 // skip the escaped char
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case '(' if !inS && !inD => depth += 1
        case ')' if !inS && !inD => depth -= 1
        case ch if ch == sep && depth == 0 && !inS && !inD =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  /** Split an ON conjunction on top-level AND (case-insensitive,
    * word-bounded, outside quotes/parens). */
  private def splitOnAnd(s: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    var depth = 0; var inS = false; var inD = false; var start = 0
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '\\' if inS || inD => i += 1 // escaped char inside literal
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case '(' if !inS && !inD => depth += 1
        case ')' if !inS && !inD => depth -= 1
        case ch if depth == 0 && !inS && !inD &&
            (ch == 'a' || ch == 'A') && i + 3 <= s.length &&
            s.substring(i, i + 3).equalsIgnoreCase("and") &&
            (i == 0 || !Character.isLetterOrDigit(s(i - 1))) &&
            (i + 3 == s.length || !Character.isLetterOrDigit(s(i + 3))) =>
          out += s.substring(start, i); start = i + 3; i += 2
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  /** Split `s` at the FIRST top-level occurrence of word `kw`
    * (case-insensitive, word-bounded, outside quotes/backticks/parens)
    * → (before, Some(after)) or (s, None). The quote-aware twin of the
    * regex `(?:\s+WHERE\s+...)` idiom, which fires inside string
    * literals — and inside backticked paths (`delta.`/data/on disk``),
    * hence the backtick tracking. */
  private[sources] def splitOnKeyword(s: String, kw: String)
      : (String, Option[String]) = {
    var depth = 0; var inS = false; var inD = false; var inB = false
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '\\' if inS || inD => i += 1 // escaped char inside literal
        case '\'' if !inD && !inB => inS = !inS
        case '"' if !inS && !inB => inD = !inD
        case '`' if !inS && !inD => inB = !inB
        case '(' if !inS && !inD && !inB => depth += 1
        case ')' if !inS && !inD && !inB => depth -= 1
        case _ if depth == 0 && !inS && !inD && !inB &&
            i + kw.length <= s.length &&
            s.substring(i, i + kw.length).equalsIgnoreCase(kw) &&
            (i == 0 || !Character.isLetterOrDigit(s(i - 1))) &&
            (i + kw.length == s.length ||
              !Character.isLetterOrDigit(s(i + kw.length))) =>
          return (s.substring(0, i).trim,
            Some(s.substring(i + kw.length).trim))
        case _ =>
      }
      i += 1
    }
    (s.trim, None)
  }

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
    case VacuumRe(a, b, c, hours, dry) =>
      Some(GraftVacuum(pathOf(a, b, c),
        Option(hours).map(_.toLong), dryRun = dry != null))
    case DeleteRe(a, b, c, tail) =>
      // parse the predicate NOW so syntax errors surface at parse time
      // (the OPTIMIZE WHERE pattern); the SQL string travels because an
      // Expression on a leaf command has no child to resolve against
      val pred = tail.trim match {
        case "" => None
        case WhereTail(p) => Some(p)
        case other => throw new IllegalArgumentException(
          s"DELETE FROM a path table: unrecognized clause '$other' " +
            "(expected nothing or WHERE <predicate>)")
      }
      pred.foreach(delegate.parseExpression)
      Some(GraftDelete(pathOf(a, b, c), pred))
    case UpdateRe(a, b, c, tail) =>
      val (sets, pred) = splitOnKeyword(tail, "WHERE")
      val assignments = splitTopLevel(sets, ',').map(_.trim).map {
        case Assignment(colName, exprSql) =>
          delegate.parseExpression(exprSql)
          colName -> exprSql
        case other => throw new IllegalArgumentException(
          s"UPDATE SET: cannot parse assignment '$other' " +
            "(expected col = expression)")
      }
      require(assignments.nonEmpty, "UPDATE needs at least one SET column")
      pred.foreach(delegate.parseExpression)
      Some(GraftUpdate(pathOf(a, b, c), assignments, pred))
    case MergeRe(a, b, c, tgtAlias, usingTail) =>
      val (source, afterOn) = splitOnKeyword(usingTail, "ON")
      val (on, afterWhen) = afterOn.map(splitOnKeyword(_, "WHEN"))
        .getOrElse(throw new IllegalArgumentException(
          "MERGE INTO needs an ON clause"))
      val whenTail = "WHEN " + afterWhen.getOrElse(
        throw new IllegalArgumentException(
          "MERGE INTO needs WHEN MATCHED/NOT MATCHED clauses"))
      require(whenTail.matches(UpsertWhenTail),
        "MERGE INTO on a path table supports the key-upsert form only: " +
          "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
          s"(got '${whenTail.trim}'). Finer clause control is the Scala " +
          "DeltaTable.delete/update API's job")
      val src = source.trim match {
        case MergeSourceTbl(sa, sb, sc, alias) =>
          MergeSource.PathTable(pathOf(sa, sb, sc), Option(alias))
        case MergeSourceSub(sub, alias) =>
          delegate.parsePlan(sub) // surface syntax errors at parse time
          MergeSource.Subquery(sub, Option(alias))
        case MergeSourceIdent(ident, alias) =>
          MergeSource.View(ident, Option(alias))
        case other => throw new IllegalArgumentException(
          s"MERGE USING: cannot parse source '$other' (expected a " +
            "delta.`path` table, a view/table identifier, or a " +
            "parenthesized subquery, each with an optional alias)")
      }
      val srcAlias = src.alias
      // Known qualifiers = declared aliases, plus the bare identifier a
      // view/table source may legitimately be referenced by when it has
      // no alias. Validated UNCONDITIONALLY: the old isEmpty escape
      // hatches accepted any bogus qualifier whenever either side
      // lacked an alias, and refused a legitimate table-name qualifier
      // when both were present.
      val aliases = Set(Option(tgtAlias), srcAlias).flatten.map(_.toLowerCase)
      val knownQualifiers = aliases ++ (src match {
        case MergeSource.View(ident, _) =>
          Set(ident.toLowerCase, ident.split('.').last.toLowerCase)
        case _ => Set.empty[String]
      })
      val keys = splitTopLevel(on, ',') match {
        case Seq(one) => splitOnAnd(one).map(_.trim).map {
          case OnEquality(q1, c1, q2, c2) =>
            for (q <- Seq(q1, q2); if q != null)
              require(knownQualifiers.contains(q.toLowerCase),
                s"MERGE ON references unknown qualifier '$q' " +
                  s"(known: ${knownQualifiers.toSeq.sorted.mkString(", ")
                  }; alias the target/source to qualify its columns)")
            require(c1.equalsIgnoreCase(c2),
              s"MERGE ON: the key-upsert form needs same-named key " +
                s"columns on both sides, got '$c1 = $c2'")
            c1
          case other => throw new IllegalArgumentException(
            s"MERGE ON: expected a conjunction of t.k = s.k equalities, " +
              s"got '$other'")
        }
        case _ => throw new IllegalArgumentException(
          "MERGE ON: expected a conjunction of equalities, not a comma")
      }
      Some(GraftMerge(pathOf(a, b, c), src, keys))
    case ConvertRe(a, b, c, partCols) =>
      Some(GraftConvertToDelta(pathOf(a, b, c),
        Option(partCols).map(splitTopLevel(_, ',').map(_.trim)
          // stock CONVERT declares `col type`; only the name gates
          // (the engine re-infers the type from the directory layout)
          .map(_.split("""\s+""")(0).stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty).toSeq)))
    case InsertRe(mode, a, b, c, cols, query) =>
      val sel =
        if (query.trim.toUpperCase.startsWith("VALUES"))
          s"SELECT * FROM $query"
        else query
      delegate.parsePlan(sel) // surface syntax errors at parse time
      val columnList = Option(cols).toSeq.flatMap(_.split(',').map(_.trim
        .stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty))
      Some(GraftInsert(pathOf(a, b, c), sel,
        overwrite = mode.equalsIgnoreCase("OVERWRITE"), columnList))
    case CopyIntoRe(a, b, c, src) =>
      Some(GraftCopyInto(pathOf(a, b, c), src))
    case CloneRe(a, b, c, sa, sb, sc, v, ts) =>
      Some(GraftShallowClone(pathOf(sa, sb, sc), pathOf(a, b, c),
        Option(v).map(_.toLong), Option(ts)))
    case CtasRe(orReplace, a, b, c, partCols, select) =>
      delegate.parsePlan(select) // surface syntax errors at parse time
      Some(GraftCreateTableAs(pathOf(a, b, c), select,
        replace = orReplace != null,
        Option(partCols).toSeq.flatMap(splitTopLevel(_, ',').map(_.trim)
          .map(_.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty))))
    case DescribeRe(kind, a, b, c) =>
      if (kind.equalsIgnoreCase("HISTORY"))
        Some(GraftDescribeHistory(pathOf(a, b, c)))
      else Some(GraftDescribeDetail(pathOf(a, b, c)))
    case RestoreRe(a, b, c, v, ts) =>
      Some(GraftRestore(pathOf(a, b, c),
        Option(v).map(_.toLong), Option(ts)))
    case ShowPropsRe(a, b, c) =>
      Some(GraftShowTblProperties(pathOf(a, b, c)))
    case AlterRe(a, b, c, tail) =>
      val path = pathOf(a, b, c)
      tail match {
        case AddConstraintTail(name, expr) =>
          Some(GraftAddConstraint(path, name, expr.trim))
        case DropConstraintTail(name) =>
          Some(GraftDropConstraint(path, name))
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
            "(supported: ADD/DROP CONSTRAINT, SET TBLPROPERTIES, RENAME " +
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

/** `VACUUM path [RETAIN n HOURS]` → [[DeltaTable.vacuumRetain]]. One
  * row per deleted data file. A bare `VACUUM` defaults to the public
  * protocol's 7-day retention (round 11) — it previously mapped to the
  * full-prune `DeltaTable.vacuum(path)`, which deletes every
  * historical data file and destroys time travel, a far more
  * destructive operation than the SQL idiom implies. The full prune
  * stays reachable, but only by saying so: `RETAIN 0 HOURS`. */
case class GraftVacuum(path: String, retainHours: Option[Long],
    dryRun: Boolean = false) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("deleted_path", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val hours = retainHours.getOrElse(7L * 24L)
    DeltaTable.vacuumRetain(path, hours * 3600L * 1000L, dryRun).map(Row(_))
  }
}

/** `ALTER TABLE path DROP CONSTRAINT name` →
  * [[DeltaTable.dropCheckConstraint]]. */
case class GraftDropConstraint(path: String, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(DeltaTable.dropCheckConstraint(path, name)))
}

/** The source clause of a path-table MERGE: another path table, a
  * registered view/table identifier, or a parenthesized subquery. */
sealed trait MergeSource { def alias: Option[String] }
object MergeSource {
  final case class PathTable(path: String, alias: Option[String])
      extends MergeSource
  final case class Subquery(sql: String, alias: Option[String])
      extends MergeSource
  final case class View(ident: String, alias: Option[String])
      extends MergeSource
}

/** `DELETE FROM path [WHERE pred]` → [[DeltaTable.delete]] ([EXT]
  * round 11: the reference's SQL idiom reaching DML). Returns the
  * committed version. */
case class GraftDelete(path: String, whereSql: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{expr, lit}
    Seq(Row(DeltaTable.delete(session, path,
      whereSql.map(expr).getOrElse(lit(true)))))
  }
}

/** `UPDATE path SET a = e1, b = e2 [WHERE pred]` →
  * [[DeltaTable.update]]. Returns the committed version. */
case class GraftUpdate(path: String, sets: Seq[(String, String)],
    whereSql: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{expr, lit}
    Seq(Row(DeltaTable.update(session, path,
      whereSql.map(expr).getOrElse(lit(true)),
      sets.map { case (c, e) => c -> expr(e) }.toMap)))
  }
}

/** `MERGE INTO path USING src ON t.k = s.k [AND …] WHEN MATCHED THEN
  * UPDATE SET * WHEN NOT MATCHED THEN INSERT *` →
  * [[DeltaTable.merge]] — the key-upsert form (matched rows replaced
  * by their source row, unmatched source rows inserted), which is
  * exactly the engine's merge contract. Other WHEN shapes refuse at
  * parse time. Returns the committed version. */
case class GraftMerge(path: String, source: MergeSource,
    keys: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val src = source match {
      case MergeSource.PathTable(p, _) => DeltaTable.read(session, p)
      case MergeSource.Subquery(sql, _) => session.sql(sql)
      case MergeSource.View(ident, _) => session.table(ident)
    }
    Seq(Row(DeltaTable.merge(session, path, src, keys)))
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
case class GraftRestore(path: String, version: Option[Long],
    timestamp: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val v = version.getOrElse(DeltaLog.versionAtTimestamp(path,
      GraftDeltaSource.parseTimestampAsOf(timestamp.get)))
    Seq(Row(DeltaTable.restore(path, v)))
  }
}

/** `SHOW TBLPROPERTIES delta.`/path`` — the committed metaData
  * configuration as (key, value) rows, sorted by key. */
case class GraftShowTblProperties(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", StringType, nullable = false)(),
    AttributeReference("value", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    DeltaLog.snapshot(path).configuration.toSeq.sortBy(_._1)
      .map { case (k, v) => Row(k, v) }
}

/** `ALTER TABLE path ADD CONSTRAINT name CHECK (expr)`. */
case class GraftAddConstraint(path: String, name: String, expr: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(DeltaTable.addCheckConstraint(session, path, name, expr)))
}

/** `ALTER TABLE path SET TBLPROPERTIES ('k'='v', ...)` — ALL pairs in
  * one atomic commit (round 11; the per-key loop could leave half the
  * properties applied on a crash or lost race mid-statement). */
case class GraftSetProperties(path: String, props: Seq[(String, String)])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(DeltaTable.setTableProperties(path, props)))
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

/** `CONVERT TO DELTA parquet.`/path` [PARTITIONED BY (col type, …)]`
  * → [[DeltaTable.convertToDelta]]: in-place adoption, zero data
  * movement (one add per existing file). The PARTITIONED BY names are
  * a cross-check against the inferred directory layout — stock
  * CONVERT's contract that a caller's partition expectation and the
  * physical layout cannot silently diverge. */
case class GraftConvertToDelta(path: String,
    declaredPartCols: Option[Seq[String]]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(DeltaTable.convertToDelta(session, path, declaredPartCols)))
}

/** `CREATE TABLE delta.`/t2` SHALLOW CLONE delta.`/t1` [VERSION AS OF
  * n]` → [[DeltaTable.shallowClone]]: metadata-only copy, one commit,
  * zero bytes moved. */
case class GraftShallowClone(source: String, target: String,
    versionAsOf: Option[Long], timestampAsOf: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val v = versionAsOf.orElse(timestampAsOf.map(ts =>
      DeltaLog.versionAtTimestamp(source,
        GraftDeltaSource.parseTimestampAsOf(ts))))
    Seq(Row(DeltaTable.shallowClone(source, target, v)))
  }
}

/** `CREATE [OR REPLACE] TABLE delta.`/path` [USING DELTA] [PARTITIONED
  * BY (cols)] AS SELECT …` → a distributed write of the SELECT's
  * result through [[DeltaTable.write]]. Plain CREATE refuses an
  * existing table (stock semantics); OR REPLACE overwrites — the
  * replaced version stays time-travelable like any overwrite. The
  * SELECT itself is Spark's own plan (parsed by the delegate), so the
  * full query surface — joins, windows, subqueries — works unchanged;
  * this command only routes the sink. */
case class GraftCreateTableAs(path: String, selectSql: String,
    replace: Boolean, partitionBy: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    require(replace || DeltaLog.versions(path).isEmpty,
      s"CREATE TABLE: $path already exists (use CREATE OR REPLACE)")
    val df = session.sql(selectSql)
    Seq(Row(DeltaTable.write(df, path, "overwrite",
      partitionBy = partitionBy)))
  }
}

/** `COPY INTO delta.`/t` FROM '/src' [FILEFORMAT = PARQUET]` →
  * [[DeltaTable.copyInto]]: exactly-once-per-source-file append, the
  * ledger riding the target's own log (per-file domainMetadata) so a
  * re-run — or a crash-and-rerun — loads nothing twice. Returns
  * (version, files_loaded). */
case class GraftCopyInto(path: String, source: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_loaded", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (v, n) = DeltaTable.copyInto(session, path, source)
    Seq(Row(v, n.toLong))
  }
}

/** `INSERT INTO | OVERWRITE delta.`/path`` [(cols)] VALUES …|SELECT …`
  * — the standard SQL write idiom, routed through [[DeltaTable.write]]
  * (the ONLY way bytes may enter a delta table; Spark's own
  * InsertIntoHadoopFsRelationCommand would write parquet past the
  * log). Without a column list, store-assignment is POSITIONAL when
  * the query's column count matches the table width (names renamed,
  * types cast — the SQL standard's INSERT semantics); a narrower/wider
  * query passes through BY NAME so the engine's schema enforcement
  * (and the identity/generated-column contracts, which require
  * omitting engine-assigned columns) decides loudly. With an explicit
  * column list, the query's columns bind to the LISTED names
  * positionally (any order); a full-width list is reordered+cast to
  * the table layout, a partial list passes through by name. */
case class GraftInsert(path: String, selectSql: String,
    overwrite: Boolean, columns: Seq[String] = Nil)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val df0 = session.sql(selectSql)
    require(columns.isEmpty || columns.length == df0.columns.length,
      s"INSERT: column list names ${columns.length} columns but the " +
        s"query produces ${df0.columns.length}")
    val df = if (columns.isEmpty) df0 else df0.toDF(columns: _*)
    val snap = DeltaLog.snapshot(path)
    val schema = snap.schemaJson
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[StructType])
      .getOrElse(throw new IllegalStateException(
        s"INSERT: $path has no committed schema"))
    import org.apache.spark.sql.functions.col
    val aligned =
      if (columns.nonEmpty && columns.length == schema.length)
        // explicit full-width list: names authoritative, table order
        df.select(schema.fields.map(f =>
          col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
      else if (columns.isEmpty && df.columns.length == schema.length)
        df.toDF(schema.fieldNames.toIndexedSeq: _*)
          .select(schema.fields.map(f =>
            col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
      else df
    // INSERT OVERWRITE replaces the DATA, not the table's layout: the
    // committed partition columns carry through (write's bare
    // overwrite would otherwise re-declare the table unpartitioned)
    Seq(Row(DeltaTable.write(aligned, path,
      if (overwrite) "overwrite" else "append",
      partitionBy = if (overwrite) snap.partitionColumns else Nil)))
  }
}
