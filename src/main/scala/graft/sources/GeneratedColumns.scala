package graft.sources

import java.time.{Instant, LocalDate, ZoneId}
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit
import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal => CatalystLiteral}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.sources.{And, EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataType, DateType, MetadataBuilder,
  StringType, StructType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Delta GENERATED COLUMNS, per the public protocol: a column whose
  * value is always `<expr>` over the row's other columns, declared by
  * the `delta.generationExpression` key in the field's schema metadata
  * and guarded by the `generatedColumns` writer feature (legacy writer
  * version 4). The write-side contract (stock Delta's):
  *
  *   - a frame that OMITS the column gets it computed — the usual flow:
  *     the user never materializes `event_date`, the table does;
  *   - a frame that PROVIDES the column is validated row-by-row against
  *     the expression (`col <=> expr`, the null-safe CHECK shape) and
  *     refused on any mismatch — silently accepting a diverging value
  *     would break every consumer that trusts the invariant;
  *   - DML maintains the invariant: UPDATE recomputes generated columns
  *     whose base columns it touches, MERGE computes them for source
  *     rows that omit them and validates provided ones.
  *
  * The read-side payoff is [[derivePartitionFilters]]: when the
  * generated column is a PARTITION column and its expression is one of
  * the recognized monotone shapes (`CAST(ts AS DATE)`, `year(ts)`,
  * `date_trunc(unit, ts)` — the shapes stock Delta's
  * OptimizeGeneratedColumn recognizes), a query filter on the BASE
  * column derives a partition-level filter on the generated one, so
  * `WHERE ts BETWEEN a AND b` prunes `event_date=...` partitions from
  * the log with zero data I/O. At 100 TB this is the difference between
  * scanning a day and scanning the table: raw event frames rarely carry
  * the partition value, and without derivation a timestamp range prunes
  * nothing.
  *
  * Reference surface: the reference partitions its demo table by a
  * column the frame computes by hand (examples/create_deltalake_hdfs
  * .py:118-148 — `partitionBy("category")`); generated columns are the
  * protocol's own way to keep such derived partitioning consistent.
  */
private[graft] object GeneratedColumns {
  /** Field-metadata key, exactly the protocol's. */
  val ExprKey = "delta.generationExpression"
  /** Writer feature name (table-features gate), exactly the protocol's. */
  val Feature = "generatedColumns"

  /** (column, generation expression) pairs of a committed schema, in
    * schema order. */
  def of(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(ExprKey) =>
        f.name -> f.metadata.getString(ExprKey)
    }

  /** Whether any field of the (JSON) schema declares a generation
    * expression — the writer-feature trigger. */
  def anyIn(schemaJson: Option[String]): Boolean =
    schemaJson.exists { j =>
      j.contains(ExprKey) &&
        of(DataType.fromJson(j).asInstanceOf[StructType]).nonEmpty
    }

  /** Annotate `gens` into the schema's field metadata (idempotent;
    * other metadata — column-mapping identity included — is merged, not
    * replaced). Fields not named in `gens` pass through untouched. */
  def annotate(schema: StructType, gens: Map[String, String]): StructType =
    StructType(schema.fields.map { f =>
      gens.get(f.name) match {
        case None => f
        case Some(e) => f.copy(metadata =
          new MetadataBuilder().withMetadata(f.metadata)
            .putString(ExprKey, e).build())
      }
    })

  /** Top-level column names a generation expression references. */
  def referencedColumns(e: String): Seq[String] =
    try CatalystSqlParser.parseExpression(e).collect {
      case a: UnresolvedAttribute => a.nameParts.head
    }.distinct
    catch { case NonFatal(_) => Seq.empty }

  /** Write-side application: compute each generated column the frame
    * omits (when its base columns are present); collect a `col <=> expr`
    * validation pair for each one the frame provides. A frame omitting
    * BOTH the generated column and its bases (a subset append) passes
    * untouched — the column reads null there, like any subset column.
    * A frame providing the column but not its bases cannot be validated
    * and is refused. */
  def applyToWrite(df: DataFrame, gens: Seq[(String, String)])
      : (DataFrame, Seq[(String, String)]) = {
    if (gens.isEmpty) return (df, Nil)
    var out = df
    val checks = Seq.newBuilder[(String, String)]
    for ((g, e) <- gens) {
      val refs = referencedColumns(e)
      if (df.columns.contains(g)) {
        require(refs.forall(df.columns.contains),
          s"generated column $g = $e arrives precomputed but base " +
            s"column(s) ${refs.filterNot(df.columns.contains).mkString(",")} " +
            "are absent — the invariant cannot be validated; provide the " +
            "base columns or omit the generated one")
        checks += (s"generated column $g" -> s"`$g` <=> ($e)")
      } else if (refs.nonEmpty && refs.forall(df.columns.contains)) {
        out = out.withColumn(g, expr(e))
      }
      // else: subset frame without g or its bases — nothing to do
    }
    (out, checks.result())
  }

  // ---------------------------------------------------------------------
  // Partition-filter derivation (the read-side optimization)
  // ---------------------------------------------------------------------

  /** A recognized MONOTONE generation shape: x <= y implies
    * f(x) <= f(y), which is what makes range-filter derivation sound.
    * `render` maps a base-column literal to the generated column's
    * PARTITION-VALUE encoding (the string Spark's partitioned write put
    * in the directory name), because derived filters are consulted
    * against `AddFile.partitionValues`. */
  private[sources] sealed trait Shape {
    def base: String
    def baseAccepts(dt: DataType): Boolean
    def render(v: Any, zone: ZoneId): Option[Any]
  }

  /** `CAST(ts AS DATE)` / `to_date(ts)` → "yyyy-MM-dd". */
  private[sources] final case class CastDate(base: String) extends Shape {
    def baseAccepts(dt: DataType): Boolean = dt == TimestampType
    def render(v: Any, zone: ZoneId): Option[Any] =
      toMicros(v).map(us => localDate(us, zone).toString)
  }

  /** `year(ts_or_date)` → integer year (numeric-compared). */
  private[sources] final case class YearOf(base: String) extends Shape {
    def baseAccepts(dt: DataType): Boolean =
      dt == TimestampType || dt == DateType
    def render(v: Any, zone: ZoneId): Option[Any] =
      toMicros(v).map(us => Int.box(localDate(us, zone).getYear))
        .orElse(toEpochDay(v).map(d =>
          Int.box(LocalDate.ofEpochDay(d.toLong).getYear)))
  }

  /** `date_trunc(unit, ts)` for second-or-coarser units →
    * "yyyy-MM-dd HH:mm:ss" (the whole-second partition-value rendering;
    * sub-second partition values never arise from these units). */
  private[sources] final case class TruncTo(unit: String, base: String)
      extends Shape {
    def baseAccepts(dt: DataType): Boolean = dt == TimestampType
    def render(v: Any, zone: ZoneId): Option[Any] = toMicros(v).map { us =>
      val zdt = Instant.EPOCH.plus(us, ChronoUnit.MICROS).atZone(zone)
      val t = unit match {
        case "second" => zdt.truncatedTo(ChronoUnit.SECONDS)
        case "minute" => zdt.truncatedTo(ChronoUnit.MINUTES)
        case "hour" => zdt.truncatedTo(ChronoUnit.HOURS)
        case "day" => zdt.truncatedTo(ChronoUnit.DAYS)
        case "week" => zdt.truncatedTo(ChronoUnit.DAYS)
          .minusDays((zdt.getDayOfWeek.getValue - 1).toLong)
        case "month" => zdt.truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1)
        case "quarter" => zdt.truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1)
          .withMonth(((zdt.getMonthValue - 1) / 3) * 3 + 1)
        case "year" => zdt.truncatedTo(ChronoUnit.DAYS).withDayOfYear(1)
      }
      t.format(TsFmt)
    }
  }

  private val TsFmt = DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss")
  private val TruncUnits = Set("second", "minute", "hour", "day", "week",
    "month", "quarter", "year")

  private def localDate(micros: Long, zone: ZoneId): LocalDate =
    Instant.EPOCH.plus(micros, ChronoUnit.MICROS).atZone(zone).toLocalDate

  /** Base-column literal → epoch micros. Longs are Catalyst-internal
    * timestamp micros (the encoding [[GraftDeltaFileIndex.translate]]
    * produces); external java.sql/java.time values come from direct
    * [[DeltaTable.read]] callers. */
  private def toMicros(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case t: java.sql.Timestamp => Some(DateTimeUtils.fromJavaTimestamp(t))
    case i: Instant => Some(DateTimeUtils.instantToMicros(i))
    case t: java.time.LocalDateTime => Some(DateTimeUtils.localDateTimeToMicros(t))
    case _ => None
  }

  private def toEpochDay(v: Any): Option[Int] = v match {
    case i: Int => Some(i)
    case d: java.sql.Date => Some(DateTimeUtils.fromJavaDate(d))
    case d: LocalDate => Some(d.toEpochDay.toInt)
    case _ => None
  }

  /** Parse a generation expression into a recognized monotone shape
    * (None for everything else — unrecognized expressions still
    * compute and validate fine; they just don't derive filters). */
  private[sources] def parseShape(e: String): Option[Shape] =
    try CatalystSqlParser.parseExpression(e) match {
      case c: Cast if c.dataType == DateType => c.child match {
        case a: UnresolvedAttribute if a.nameParts.length == 1 =>
          Some(CastDate(a.nameParts.head))
        case _ => None
      }
      case f: UnresolvedFunction =>
        (f.nameParts.map(_.toLowerCase), f.arguments) match {
          case (Seq("to_date"), Seq(a: UnresolvedAttribute))
              if a.nameParts.length == 1 =>
            Some(CastDate(a.nameParts.head))
          case (Seq("year"), Seq(a: UnresolvedAttribute))
              if a.nameParts.length == 1 =>
            Some(YearOf(a.nameParts.head))
          case (Seq("date_trunc"),
              Seq(CatalystLiteral(u: UTF8String, StringType),
                a: UnresolvedAttribute))
              if a.nameParts.length == 1 &&
                TruncUnits.contains(u.toString.toLowerCase) =>
            Some(TruncTo(u.toString.toLowerCase, a.nameParts.head))
          case _ => None
        }
      case _ => None
    } catch { case NonFatal(_) => None }

  /** Derive partition filters on generated PARTITION columns from data
    * filters on their base columns. Sound because every recognized
    * shape is monotone: `x >= L` implies `f(x) >= f(L)` (strict
    * inequalities weaken to non-strict — f collapses distinct inputs).
    * The derived values are rendered in the partition-value STRING
    * encoding, ready for the [[DeltaTable.liveFilesAfterSkipping]]
    * partition-value consult; nothing here ever reaches the parquet
    * reader. Filters referencing anything but a recognized base column
    * derive nothing (always safe — derivation only ever adds pruning).
    */
  def derivePartitionFilters(filters: Seq[Filter], schema: StructType,
      partitionCols: Seq[String], zone: ZoneId): Seq[Filter] = {
    if (filters.isEmpty || partitionCols.isEmpty) return Nil
    // The generated partition VALUES were rendered under the WRITER's
    // session zone — pinned UTC by this engine's writers. A reader in
    // any other zone would render filter literals against a different
    // calendar and silently prune partitions holding matching rows, so
    // derivation only engages under UTC (losing it costs pruning only).
    if (zone.normalized() != java.time.ZoneOffset.UTC) return Nil
    val shapes: Seq[(String, Shape)] = for {
      g <- partitionCols
      f <- schema.fields.find(_.name == g).toSeq
      if f.metadata.contains(ExprKey)
      s <- parseShape(f.metadata.getString(ExprKey)).toSeq
      b <- schema.fields.find(_.name == s.base).toSeq
      if s.baseAccepts(b.dataType)
    } yield (g, s)
    if (shapes.isEmpty) return Nil
    val zoneV = zone
    def derive(f: Filter, g: String, s: Shape): Option[Filter] = f match {
      case EqualTo(c, v) if c == s.base =>
        s.render(v, zoneV).map(EqualTo(g, _))
      case GreaterThan(c, v) if c == s.base =>
        s.render(v, zoneV).map(GreaterThanOrEqual(g, _))
      case GreaterThanOrEqual(c, v) if c == s.base =>
        s.render(v, zoneV).map(GreaterThanOrEqual(g, _))
      case LessThan(c, v) if c == s.base =>
        s.render(v, zoneV).map(LessThanOrEqual(g, _))
      case LessThanOrEqual(c, v) if c == s.base =>
        s.render(v, zoneV).map(LessThanOrEqual(g, _))
      case In(c, vs) if c == s.base && vs.nonEmpty =>
        // every value must render, else the derived IN would wrongly
        // exclude the partitions of the unrendered ones
        val rendered = vs.toSeq.map(v =>
          if (v == null) None else s.render(v, zoneV))
        if (rendered.forall(_.isDefined))
          Some(In(g, rendered.map(_.get).toArray))
        else None
      case And(l, r) => (derive(l, g, s), derive(r, g, s)) match {
        case (Some(a), Some(b)) => Some(And(a, b))
        case (a, b) => a.orElse(b)
      }
      case _ => None
    }
    filters.flatMap(f => shapes.flatMap { case (g, s) => derive(f, g, s) })
  }
}
