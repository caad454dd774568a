package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** The one-persisted-index-per-(session, sfDir) cache shared by the IVF
  * / PQ / dedup-IVF / BM25 index dirs: built on first use, reused by
  * every later run in the session so bench repeat passes measure
  * SERVING, not the build. Eviction of a stopped session's entry also
  * deletes its on-disk directory (the r10 advisor wart: the map forgot
  * the path but the `graft_*` temp dir lived on), and a JVM shutdown
  * hook sweeps whatever is still registered at exit, so no run leaves
  * orphaned indexes in the temp dir. */
private[queries] final class IndexCache(prefix: String) {
  private val dirs = TrieMap[(SparkSession, String), String]()
  IndexCache.register(this)

  /** The index dir for (s, d), building via `build(dir)` on first use. */
  def get(s: SparkSession, d: String)(build: String => Unit): String = {
    dirs.filterInPlace { case ((sess, _), dir) =>
      val live = !sess.sparkContext.isStopped
      if (!live) IndexCache.deleteTree(dir)
      live
    }
    // serialized: TrieMap.getOrElseUpdate may evaluate the builder
    // TWICE under concurrent first use, and the losing build's temp dir
    // would never be registered (leaks past the shutdown sweep). Builds
    // happen once per (session, sfDir), so coarse locking costs nothing.
    dirs.synchronized {
      dirs.getOrElseUpdate((s, d), {
        val dir = java.nio.file.Files.createTempDirectory(prefix).toString
        build(dir)
        dir
      })
    }
  }

  private[queries] def sweep(): Unit = {
    dirs.values.foreach(IndexCache.deleteTree)
    dirs.clear()
  }
}

private[queries] object IndexCache {
  private val all = new java.util.concurrent.ConcurrentLinkedQueue[IndexCache]()
  private lazy val hook: Unit = {
    sys.addShutdownHook(all.forEach(_.sweep())); ()
  }
  private def register(c: IndexCache): Unit = { hook; all.add(c); () }

  private def deleteTree(dir: String): Unit =
    try {
      val root = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(root)) {
        import scala.jdk.CollectionConverters._
        // children before parents
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    } catch { case scala.util.control.NonFatal(_) => () }
}
