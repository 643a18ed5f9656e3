package graft.operators

import java.util.concurrent.ConcurrentHashMap

/** Get-or-build for the staged-index memos (shingle, k-means, SQ8,
  * celled, BPE) that runs the build's Spark jobs OUTSIDE the
  * ConcurrentHashMap lock.
  *
  * The previous idiom ran the whole build — corpus counts, Lloyd/BPE
  * training, parquet writes — inside `compute`, holding the key's bin
  * lock for the build's full duration: concurrent consumers of a
  * VALID same-key entry (and unrelated keys hashing to the same bin)
  * blocked behind it, and the pattern would deadlock if a build path
  * ever re-entered the same cache (flagged by the round-6 review).
  * Here a valid entry is served from a plain lock-free `get`; a stale
  * or missing entry is rebuilt outside any lock and registered with a
  * brief `compute` that re-validates — if a racing builder won in the
  * meantime, its (valid) entry wins and the loser's freshly staged
  * scratch dirs are simply orphaned (Scratch dirs are
  * delete-on-exit; duplicate builds are idempotent by construction).
  *
  * The REFRESH paths (e.g. refreshShingleIndex/refreshSqIndex)
  * intentionally keep their full validate-and-stage logic under
  * `compute`: they are ordered ledger mutations whose correctness
  * depends on mutual exclusion with each other, and their delta work
  * is batch-sized, not corpus-sized. */
private[graft] object StagedCache {

  /** Count of index BUILDS actually executed (not cache hits) — the
    * bench harness snapshots this around each timed query to tell a
    * first-toucher's build-vs-serve retime asymmetry (expected,
    * classified `warm_asymmetry`) apart from genuine throttle noise
    * (`unreliable`). */
  private val built = new java.util.concurrent.atomic.AtomicLong(0L)

  def buildCount: Long = built.get()

  def getOrBuild[V <: AnyRef](cache: ConcurrentHashMap[String, V],
      pathKey: String, valid: V => Boolean, build: () => V): V = {
    val cur = cache.get(pathKey)
    if (cur != null && valid(cur)) cur
    else {
      val b = build() // Spark jobs run unlocked
      built.incrementAndGet()
      cache.compute(pathKey, (_, c) =>
        if (c != null && valid(c)) c else b)
    }
  }

  /** Content fingerprint of a source dataset path (a parquet file OR a
    * directory of part files) for cache-validity keying. The previous
    * idiom keyed on the top-level path's mtime alone, which misses an
    * in-place rewrite that lands in the same millisecond or replaces
    * part files without touching the directory entry (round-14 review:
    * q141 stacks three such caches, so one stale layer silently
    * changes results). This walks the dataset: file count + total
    * bytes + max per-file mtime — any part-file add, drop, resize, or
    * rewrite changes at least one component. Bounded by the dataset's
    * file count (a directory listing, no data read), the same
    * traversal every parquet scan's file listing already pays. */
  def fingerprint(src: java.nio.file.Path): String = {
    import java.nio.file.Files
    if (!Files.exists(src)) "absent"
    else {
      var n = 0L; var bytes = 0L; var maxM = 0L
      val it = Files.walk(src)
      try {
        it.filter(p => Files.isRegularFile(p)).forEach { p =>
          n += 1; bytes += Files.size(p)
          maxM = math.max(maxM, Files.getLastModifiedTime(p).toMillis)
        }
      } finally it.close()
      s"$n:$bytes:$maxM"
    }
  }
}
