package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Process-scoped scratch directories. Operators that must stage an
  * intermediate relation (dedup shingle indexes, similarity bucket
  * assignments, the storage queries' self-contained table dirs) create
  * them here instead of bare `Files.createTempDirectory`, so repeated
  * bench/verify loops don't accrete unbounded /tmp garbage: every dir
  * is deleted on JVM exit, and long-lived callers (Bench, Verify) can
  * `purge()` eagerly once results are materialized.
  *
  * On a real cluster the same seam points at the job's scratch prefix
  * (e.g. an `hdfs://…/tmp/<appId>` dir the resource manager reaps);
  * only this object would change.
  */
object Scratch {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]

  Runtime.getRuntime.addShutdownHook(new Thread(() => purge()))

  /** A fresh scratch dir, deleted on JVM exit at the latest. */
  def dir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }

  /** Delete every registered dir now (idempotent; survives dirs the
    * caller already removed). One undeletable dir must not strand the
    * rest — `Files.walk`'s iterator throws UncheckedIOException if an
    * entry vanishes mid-walk, so each dir's delete is fenced. */
  def purge(): Unit = {
    var p = registered.poll()
    while (p != null) {
      try deleteRecursively(p)
      catch { case scala.util.control.NonFatal(_) => () }
      p = registered.poll()
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.iterator.asScala.toSeq.reverse.foreach(q =>
        try Files.deleteIfExists(q)
        catch { case _: java.io.IOException => () })
      finally s.close()
    }
}
