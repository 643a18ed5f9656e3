package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{AlwaysFalse, AlwaysTrue, And,
  EqualNullSafe, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In,
  IsNotNull, IsNull, LessThan, LessThanOrEqual, Not, Or, StringContains,
  StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

/** Delta COLUMN MAPPING (mode = "name"), per the public Delta protocol:
  * every field of the table schema carries `delta.columnMapping.id`
  * (a stable numeric identity) and `delta.columnMapping.physicalName`
  * (the column name actually stored in the data files), and the
  * metaData configuration carries `delta.columnMapping.mode` +
  * `delta.columnMapping.maxColumnId`. Once enabled:
  *
  *   - RENAME is a metadata-only commit: the logical name changes, the
  *     physical name (and every existing data file) stays put — no
  *     rewrite, which is the whole point at 100 TB;
  *   - DROP is metadata-only too: the field leaves the schema, the
  *     bytes stay in the files, readers simply never project them;
  *   - a column ADDED later gets a fresh `col-<uuid>` physical name,
  *     so re-adding a dropped column's logical name can NEVER
  *     resurrect the old bytes (the classic mapping correctness trap —
  *     the new field's physical name misses the old files entirely and
  *     reads null there, exactly like any additive column).
  *
  * Upgrade rule (stock Delta's): at enable time every EXISTING column's
  * physical name is frozen to its current logical name, because that is
  * what the already-committed parquet files contain. Mapping therefore
  * starts as the identity and only diverges through rename/drop/add —
  * every pre-mapping code path keeps working unchanged on such tables.
  *
  * This object is pure schema/DataFrame plumbing; the commit choreography
  * (enable/rename/drop, writer-side physical staging, reader-side
  * logical projection) lives in [[DeltaTable]]/[[GraftDeltaSource]].
  */
private[graft] object ColumnMapping {
  val ModeKey = "delta.columnMapping.mode"
  val MaxIdKey = "delta.columnMapping.maxColumnId"
  val FieldIdKey = "delta.columnMapping.id"
  val FieldPhysKey = "delta.columnMapping.physicalName"

  def enabled(snap: DeltaLog.Snapshot): Boolean =
    snap.configuration.get(ModeKey).contains("name")

  def maxColumnId(snap: DeltaLog.Snapshot): Long =
    snap.configuration.get(MaxIdKey).flatMap(_.toLongOption).getOrElse(0L)

  def physicalName(f: StructField): String =
    if (f.metadata.contains(FieldPhysKey)) f.metadata.getString(FieldPhysKey)
    else f.name

  /** logical → physical name map of an annotated schema (identity for
    * un-annotated fields, so it is safe on any schema). */
  def logicalToPhysical(schema: StructType): Map[String, String] =
    schema.fields.map(f => f.name -> physicalName(f)).toMap

  /** The schema as the data files see it: fields renamed to their
    * physical names; types, order, nullability untouched. Mapping
    * metadata is stripped — a physical schema describes bytes, not the
    * mapping. */
  def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      strip(f).copy(name = physicalName(f))))

  /** Rename a LOGICAL-named frame to physical names (frame's own column
    * order preserved — appends stage in arrival order). Columns outside
    * the mapping (never the case for enforced writes) pass through. */
  def toPhysical(df: DataFrame, schema: StructType): DataFrame = {
    val m = logicalToPhysical(schema)
    df.select(df.columns.map(c => col(c).as(m.getOrElse(c, c))): _*)
  }

  /** Project a PHYSICAL-named frame back to logical names, in the
    * committed schema's order — the reader-side half of the mapping. */
  def toLogical(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.map(f => col(physicalName(f)).as(f.name)): _*)

  /** Annotate every not-yet-annotated field with the next free id and
    * physicalName = its CURRENT logical name (the upgrade rule; the
    * committed files already store that name). Returns (schema, max id). */
  def annotateAsIs(schema: StructType, startId: Long): (StructType, Long) = {
    var next = startId
    val fields = schema.fields.map { f =>
      if (f.metadata.contains(FieldPhysKey)) f
      else {
        next += 1
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putLong(FieldIdKey, next).putString(FieldPhysKey, f.name).build())
      }
    }
    (StructType(fields), next)
  }

  /** Annotate genuinely NEW fields (post-enable additions): fresh id,
    * fresh `col-<uuid>` physical name — never a name any existing file
    * could contain. */
  def annotateNew(fields: Seq[StructField], startId: Long)
      : (Seq[StructField], Long) = {
    var next = startId
    val out = fields.map { f =>
      next += 1
      f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putLong(FieldIdKey, next)
        .putString(FieldPhysKey, s"col-${java.util.UUID.randomUUID()}")
        .build())
    }
    (out, next)
  }

  private def strip(f: StructField): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .remove(FieldIdKey).remove(FieldPhysKey).build())

  /** The user-facing shape of a mapped table's schema: logical names,
    * mapping metadata hidden (it is table plumbing, not data). */
  def stripMapping(schema: StructType): StructType =
    StructType(schema.fields.map(strip))

  /** Rewrite a pushdown filter's attribute names logical → physical so
    * it can be consulted against physically-keyed file stats / parquet
    * row groups. Returns None when the filter cannot be fully expressed
    * in physical names — callers must DROP such filters rather than pass
    * them through: a logical name left untranslated can collide with a
    * DIFFERENT column's physical name after a drop-then-rename chain, so
    * the pushed predicate would evaluate against the wrong column's
    * bytes and silently lose rows (pushdown false negatives are NOT
    * recovered by the Filter node above the scan). Dropping, by
    * contrast, is always safe: both parquet pushdown and stats skipping
    * are conservative, so a dropped filter only costs pruning.
    *
    * An attribute absent from the map also drops its filter — under an
    * enabled mapping every schema column is in the map, so a miss means
    * the name is not a column this snapshot knows about.
    *
    * Inside And, a single untranslatable conjunct drops alone (keeping
    * the other conjunct only weakens the filter — safe for positive
    * pushdown). Inside Not, weakening is UNSOUND (¬weaker does not imply
    * ¬original), so Not's child translates in strict mode. */
  def translateFilter(f: Filter, m: Map[String, String]): Option[Filter] =
    f match {
      case EqualTo(c, v) => m.get(c).map(EqualTo(_, v))
      case EqualNullSafe(c, v) => m.get(c).map(EqualNullSafe(_, v))
      case GreaterThan(c, v) => m.get(c).map(GreaterThan(_, v))
      case GreaterThanOrEqual(c, v) => m.get(c).map(GreaterThanOrEqual(_, v))
      case LessThan(c, v) => m.get(c).map(LessThan(_, v))
      case LessThanOrEqual(c, v) => m.get(c).map(LessThanOrEqual(_, v))
      case In(c, vs) => m.get(c).map(In(_, vs))
      case IsNull(c) => m.get(c).map(IsNull(_))
      case IsNotNull(c) => m.get(c).map(IsNotNull(_))
      case StringStartsWith(c, v) => m.get(c).map(StringStartsWith(_, v))
      case StringEndsWith(c, v) => m.get(c).map(StringEndsWith(_, v))
      case StringContains(c, v) => m.get(c).map(StringContains(_, v))
      case And(l, r) => (translateFilter(l, m), translateFilter(r, m)) match {
        case (Some(a), Some(b)) => Some(And(a, b))
        case (a, b) => a.orElse(b) // dropped conjunct weakens — safe
      }
      case Or(l, r) =>
        for (a <- translateFilter(l, m); b <- translateFilter(r, m))
          yield Or(a, b)
      case Not(c) => translateStrict(c, m).map(Not(_))
      case _: AlwaysTrue => Some(AlwaysTrue())
      case _: AlwaysFalse => Some(AlwaysFalse())
      case _ => None
    }

  /** Strict translation: any untranslatable piece ANYWHERE fails the
    * whole filter — no conjunct-weakening, because the result is about
    * to be negated. */
  private def translateStrict(f: Filter, m: Map[String, String])
      : Option[Filter] = f match {
    case And(l, r) =>
      for (a <- translateStrict(l, m); b <- translateStrict(r, m))
        yield And(a, b)
    case Or(l, r) =>
      for (a <- translateStrict(l, m); b <- translateStrict(r, m))
        yield Or(a, b)
    case Not(c) => translateStrict(c, m).map(Not(_))
    case leaf => translateFilter(leaf, m) // leaves translate exactly
  }
}
