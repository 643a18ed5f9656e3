package graft.sources

import java.nio.ByteBuffer
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** DELETION VECTORS — the public Delta protocol's answer to the
  * point-delete-at-scale problem: a DELETE that touches a handful of
  * rows in a 128 MB file must not rewrite the file. Instead the commit
  * re-adds the SAME data file carrying a `deletionVector` descriptor
  * that points at a tiny sidecar bitmap of dead row indexes; readers
  * subtract the marked rows, and compaction eventually absorbs the
  * vector by rewriting survivors.
  *
  * The reference's Delta surface never shows DVs (its engine is an
  * opaque pip package; examples/read_deltalake_hdfs.py only reads), so
  * this is protocol-depth beyond the observable surface, shaped after
  * the published Delta deletion-vector design: remove(file) +
  * add(file, deletionVector={storageType,pathOrInlineDv,sizeInBytes,
  * cardinality}) in one commit, sidecars under the table directory,
  * vectors absorbed by OPTIMIZE.
  *
  * Sidecar wire format (`GDV1`) — deliberately trivial so the
  * independent python validator can decode it with `struct` alone, no
  * roaring dependency:
  *
  * {{{ bytes 0-3: ASCII "GDV1"; bytes 4-7: int32 big-endian count;
  *     then count int32 big-endian row indexes, strictly ascending }}}
  *
  * int32 suffices: a row index is a position within ONE parquet file,
  * and no sane file holds 2^31 rows (a 128 MB target file is ~10^6).
  * Lookup is binary search over the sorted array — O(log d) per row
  * with zero per-row allocation; the whole vector for a 1e5-row delete
  * is 400 KB, broadcast-friendly.
  *
  * Scale shape: vectors are written once per (commit, file) driver-side
  * from log-sized aggregates, read once per scan construction, and
  * never shuffle. The DML layer refuses to grow a vector past half the
  * file's rows — beyond that a rewrite is cheaper forever after, so the
  * file is rewritten instead (the same heuristic stock Delta applies).
  */
private[graft] object DeletionVectors {
  val Magic: Int = 0x47445631 // "GDV1"
  val Dir = "_deletion_vectors"

  /** delta.* table property gating the DML behavior (protocol-named). */
  val PropKey = "delta.enableDeletionVectors"

  final case class Descriptor(path: String, sizeInBytes: Long,
      cardinality: Long)

  def serialize(sortedIndexes: Array[Int]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 4 * sortedIndexes.length)
    buf.putInt(Magic)
    buf.putInt(sortedIndexes.length)
    sortedIndexes.foreach(buf.putInt)
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Int] = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.getInt() == Magic, "not a GDV1 deletion vector")
    val n = buf.getInt()
    require(bytes.length == 8 + 4L * n,
      s"deletion vector truncated: $n indexes vs ${bytes.length} bytes")
    Array.fill(n)(buf.getInt())
  }

  def contains(sorted: Array[Int], idx: Long): Boolean =
    idx <= Int.MaxValue &&
      java.util.Arrays.binarySearch(sorted, idx.toInt) >= 0

  /** Union of two sorted index arrays (a re-delete on an already
    * vectored file merges, never replaces). */
  def union(a: Array[Int], b: Array[Int]): Array[Int] =
    (a ++ b).distinct.sorted

  /** Write a vector as a table-relative sidecar (atomic move, like
    * every staged artifact) and return its add-action descriptor. */
  def write(table: String, sortedIndexes: Array[Int]): Descriptor = {
    val dir = Paths.get(table).resolve(Dir)
    Files.createDirectories(dir)
    val name = s"$Dir/dv-${java.util.UUID.randomUUID()}.bin"
    val bytes = serialize(sortedIndexes)
    val tmp = Files.createTempFile(dir, ".dv-", ".tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, Paths.get(table).resolve(name),
      StandardCopyOption.ATOMIC_MOVE)
    Descriptor(name, bytes.length.toLong, sortedIndexes.length.toLong)
  }

  def read(table: String, d: Descriptor): Array[Int] = {
    val p = Paths.get(table).resolve(d.path)
    val idx = deserialize(Files.readAllBytes(p))
    require(idx.length.toLong == d.cardinality,
      s"deletion vector ${d.path}: cardinality ${idx.length} != " +
        s"descriptor ${d.cardinality}")
    idx
  }

  /** All live vectors of a snapshot as a [[DvMap]]. Log-sized: one
    * entry per vectored file. */
  def liveVectors(table: String, snap: DeltaLog.Snapshot): DvMap = {
    val entries = snap.files.flatMap(f => f.dv.map(d =>
      f.path -> read(table, d)))
    new DvMap(
      entries.map { case (rel, v) =>
        Paths.get(table).resolve(rel).toAbsolutePath.normalize.toString -> v
      }.toMap,
      entries.map { case (rel, v) =>
        Paths.get(rel).getFileName.toString -> v }.toMap)
  }
}

/** Log-sized deletion-vector lookup for scan-side subtraction, keyed
  * by ABSOLUTE normalized path (round 10 — basenames carry only the
  * staged name's ~32-bit commitTag entropy, a birthday collision
  * around 2^16 commits, and partition directories can legitimately
  * hold same-named files) with a basename FALLBACK: the scan side
  * renders paths through `_metadata.file_path` / Hadoop `Path` /
  * `PartitionedFile`, whose URI rendering of exotic characters need
  * not match `java.nio.Path` byte-for-byte — a full-path miss falls
  * back to today's basename behavior rather than silently serving
  * deleted rows. Total size = 4 bytes per deleted row, ships once per
  * task. */
final class DvMap(byPath: Map[String, Array[Int]],
    byBase: Map[String, Array[Int]]) extends Serializable {

  def isEmpty: Boolean = byPath.isEmpty
  def nonEmpty: Boolean = byPath.nonEmpty

  /** The vector for a scan-side path render (file: URI or plain),
    * null when the file carries none. The basename fallback only
    * engages when the render carries a URI escape ('%') — for plain
    * paths the exact key is authoritative, so a same-named file in
    * another partition directory can no longer pick up a foreign
    * vector. */
  def vectorFor(fileRender: String): Array[Int] = {
    val norm =
      if (fileRender.startsWith("file:"))
        "/" + fileRender.substring(5).dropWhile(_ == '/')
      else fileRender
    byPath.get(norm).orElse(
      if (norm.indexOf('%') >= 0)
        byBase.get(norm.substring(norm.lastIndexOf('/') + 1))
      else None).orNull
  }

  /** True iff `idx` of the rendered file is marked dead. */
  def deleted(fileRender: String, idx: Long): Boolean = {
    val v = vectorFor(fileRender)
    (v ne null) && DeletionVectors.contains(v, idx)
  }
}
