package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{LongType, MetadataBuilder, StructField, StructType}

/** Delta IDENTITY COLUMNS, per the public protocol (the feature behind
  * legacy writer version 6 / the `identityColumns` table feature): a
  * `BIGINT GENERATED ALWAYS AS IDENTITY (START WITH s INCREMENT BY d)`
  * column whose values the ENGINE assigns — the surrogate-key
  * workhorse. Field metadata carries `delta.identity.start`,
  * `delta.identity.step` and the writer-maintained
  * `delta.identity.highWaterMark`; every assigning commit advances the
  * mark in the metaData it writes, atomically with the data.
  *
  * Semantics implemented (GENERATED ALWAYS):
  *   - frames must OMIT the column; providing values is refused loudly
  *     (that is what ALWAYS means — BY DEFAULT is the permissive
  *     variant, not implemented);
  *   - assigned values are unique, lie on the `start + k*step` lattice,
  *     and are strictly beyond the previous high-water mark; gaps are
  *     legal (the protocol's contract — aborted transactions and
  *     concurrency may skip ranges);
  *   - UPDATE may not SET an identity column; MERGE preserves the
  *     matched target row's identity and assigns fresh values to
  *     inserts (see [[DeltaTable.merge]]);
  *   - concurrent assigners are serialized by the commit race: a writer
  *     that loses the race re-reads the mark, and if another assigner
  *     advanced it, re-stages with fresh values (collision-free by
  *     construction — both writers' values are beyond the mark each
  *     observed at commit time).
  *
  * Assignment is DISTRIBUTED and two-pass: one narrow job counts rows
  * per partition (driver sees one long per partition), then the
  * staging pass itself maps each partition over its pre-computed
  * offset — no shuffle, no zipWithIndex's extra materialization, and
  * deterministic under task retry (offsets are fixed before the pass).
  */
private[graft] object IdentityColumns {
  val StartKey = "delta.identity.start"
  val StepKey = "delta.identity.step"
  val HwmKey = "delta.identity.highWaterMark"
  val Feature = "identityColumns"

  final case class Spec(col: String, start: Long, step: Long,
      hwm: Option[Long]) {
    /** The value numbering continues from (exclusive). */
    def base: Long = hwm.getOrElse(start - step)
  }

  def of(schema: StructType): Seq[Spec] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(StartKey) =>
        Spec(f.name, f.metadata.getLong(StartKey),
          f.metadata.getLong(StepKey),
          if (f.metadata.contains(HwmKey)) Some(f.metadata.getLong(HwmKey))
          else None)
    }

  def anyIn(schemaJson: Option[String]): Boolean =
    schemaJson.exists { j =>
      j.contains(StartKey) &&
        of(org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[StructType]).nonEmpty
    }

  /** Annotate (or refresh) the identity metadata of `specs`' fields —
    * other metadata merged, not replaced. The field must exist. */
  def annotate(schema: StructType, specs: Seq[Spec]): StructType = {
    val byCol = specs.map(s => s.col -> s).toMap
    StructType(schema.fields.map { f =>
      byCol.get(f.name) match {
        case None => f
        case Some(s) =>
          val b = new MetadataBuilder().withMetadata(f.metadata)
            .putLong(StartKey, s.start).putLong(StepKey, s.step)
          s.hwm.foreach(b.putLong(HwmKey, _))
          f.copy(metadata = b.build())
      }
    })
  }

  /** Assign values for `spec` to every row of `df` (which must omit
    * the column): appended as a non-null BIGINT column. Allocation is
    * an INTERLEAVED lattice — partition `p` of `N` takes
    * `base + step*(1 + p + k*N)` for its k-th row — which is
    * collision-free by construction no matter how many rows each
    * partition yields, so a non-deterministic source (or a recount
    * drifting between planning and execution) can never mint
    * duplicates, and no extra counting pass runs at all. Gaps are
    * protocol-legal. Single-partition frames get the contiguous
    * numbering (N=1 degenerates to base + step*k). The new high-water
    * mark is read back from the STAGED files' own stats after the
    * write ([[hwmFromStats]]) — the values that actually landed, not a
    * prediction. Zero-copy per row (InternalRow append via
    * [[org.apache.spark.sql.GraftSqlBridge]]). */
  def assign(df: DataFrame, spec: Spec): DataFrame = {
    require(!df.columns.contains(spec.col),
      s"identity column ${spec.col} is GENERATED ALWAYS: the engine " +
        "assigns its values; remove the column from the frame")
    val spark = df.sparkSession
    val inTypes = df.schema.fields.map(_.dataType)
    val outSchema = StructType(df.schema.fields :+
      StructField(spec.col, LongType, nullable = false))
    val rdd0 = df.queryExecution.toRdd
    val nPart = math.max(1, rdd0.getNumPartitions)
    val base = spec.base
    val step = spec.step
    val nCols = inTypes.length
    val assigned = rdd0.mapPartitionsWithIndex { (pid, it) =>
      var k = -1L
      it.map { r =>
        k += 1
        val vals = new Array[Any](nCols + 1)
        var i = 0
        while (i < nCols) { vals(i) = r.get(i, inTypes(i)); i += 1 }
        vals(nCols) = base + step * (1L + pid + k * nPart)
        new GenericInternalRow(vals): InternalRow
      }
    }
    org.apache.spark.sql.GraftSqlBridge.batchDataFrame(
      spark, assigned, outSchema)
  }

  /** The high-water mark actually LANDED for `col` across staged
    * files, from their collected stats (physically keyed under column
    * mapping — pass the physical name). None when no file carries a
    * stat for the column (empty write, or stats collection failed) —
    * the caller falls back to reading the staged bytes. */
  def hwmFromStats(stats: Seq[Map[String, String]], col: String,
      step: Long): Option[Long] = {
    val key = if (step > 0) s"max.$col" else s"min.$col"
    val vs = stats.flatMap(_.get(key)).flatMap(_.toLongOption)
    if (vs.isEmpty) None
    else Some(if (step > 0) vs.max else vs.min)
  }
}
