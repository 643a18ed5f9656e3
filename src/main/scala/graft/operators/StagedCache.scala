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
}
