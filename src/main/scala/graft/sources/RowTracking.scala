package graft.sources

/** ROW TRACKING (the public Delta protocol's stable row identity,
  * writer feature `rowTracking` + its `domainMetadata` bookkeeping):
  * every live row has a table-wide unique id that survives the
  * operations that do not logically modify it.
  *
  * Mechanics (protocol-shaped):
  *   - the table's id high-water mark lives in the
  *     `delta.rowTracking` domain
  *     (`{"rowIdHighWaterMark":N}`) — a [[DeltaLog]] domainMetadata
  *     action, checkpointed with the snapshot;
  *   - every committed add carries a `baseRowId`: the FRESH id of
  *     physical row i of that file is `baseRowId + i`
  *     (`_metadata.row_index`, so deletion-vector deletes — which
  *     move no rows — keep every surviving id), plus a
  *     `defaultRowCommitVersion`;
  *   - a file REWRITTEN from others by compaction carries the
  *     surviving rows' ORIGINAL ids in the materialized [[IdCol]]
  *     column instead (physical column, never part of the committed
  *     logical schema) — so OPTIMIZE preserves identity, which is the
  *     whole point: an incremental consumer keyed on row ids is not
  *     invalidated by layout maintenance.
  *
  * Contract pinned by DeltaSpec: ids are stable across append,
  * vectored DELETE, COMPACT, and for every row a DML rewrite merely
  * COPIES (survivors of DELETE/UPDATE/MERGE file rewrites keep their
  * ids, materialized into the new files); only logically-modified
  * rows renumber — UPDATE/MERGE post-images and MERGE inserts draw
  * fresh ids.
  * Allocation happens inside each commit's optimistic-retry loop —
  * two racing writers re-derive from the freshest high-water mark,
  * so ranges never collide (DeltaStressSpec-style torture applies).
  */
object RowTracking {
  val PropKey = "delta.enableRowTracking"
  val Domain = "delta.rowTracking"

  /** Materialized row-id / row-commit-version columns carried by
    * REWRITTEN (compacted) files — physical-only, never in the
    * committed schema; the `__graft` prefix keeps them out of any
    * user namespace. */
  val IdCol = "__graft_row_id"
  val VerCol = "__graft_row_commit"

  def enabled(snap: DeltaLog.Snapshot): Boolean =
    snap.configuration.get(PropKey).contains("true")

  /** The highest row id ever allocated (-1 before any allocation). */
  def highWaterMark(snap: DeltaLog.Snapshot): Long =
    snap.domainMetadata.get(Domain)
      .flatMap(c => DeltaLog.Json.parseFlat(c)
        .get("rowIdHighWaterMark").flatMap(_.toLongOption))
      .getOrElse(-1L)

  def domainAction(hwm: Long): String =
    DeltaLog.domainMetadataAction(Domain, s"""{"rowIdHighWaterMark":$hwm}""")

  /** Allocate fresh contiguous id ranges to newly staged files, from
    * the snapshot's high-water mark: each file's range is
    * [baseRowId, baseRowId + n). Returns the annotated files plus the
    * domainMetadata action advancing the mark — both must go into the
    * SAME commit. No-op (identity, no action) when the table has not
    * opted in. */
  def assignFresh(snap: DeltaLog.Snapshot, added: Seq[DeltaLog.AddFile],
      commitVersion: Long): (Seq[DeltaLog.AddFile], Seq[String]) = {
    if (!enabled(snap) || added.isEmpty) return (added, Nil)
    var next = highWaterMark(snap) + 1
    val out = added.map { f =>
      val n = f.stats.get("n").flatMap(_.toLongOption).getOrElse(
        throw new IllegalStateException(
          s"row tracking: staged file ${f.path} lacks the row-count " +
            "stat its id range is sized by"))
      val withId = f.copy(baseRowId = Some(next),
        defaultRowCommitVersion = Some(commitVersion))
      next += n
      withId
    }
    (out, Seq(domainAction(next - 1)))
  }
}
