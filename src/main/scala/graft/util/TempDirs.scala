package graft.util

import java.nio.file.{Files, Path}

/** Process-lifetime scratch directories with guaranteed cleanup: every dir
  * handed out here is recursively deleted by ONE shutdown hook (per-call
  * `deleteOnExit` cannot remove non-empty directories, and leaking a dir
  * per operator invocation grows without bound in a long-lived session —
  * the round-5 advisor flagged exactly that for the connected-components
  * checkpoints). Callers may also delete eagerly via [[release]] once the
  * contents are provably dead. */
object TempDirs {
  private val live = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  sys.addShutdownHook {
    // per-dir isolation: one dir failing to delete (a straggler task
    // still appending → DirectoryNotEmpty/NoSuchFile from the stale walk
    // snapshot) must not abort the sweep and leak every remaining dir
    live.forEach(p =>
      try AtomicTable.deleteRecursively(p)
      catch { case _: java.io.IOException => () })
  }

  /** A fresh scratch dir registered for JVM-exit deletion. */
  def scratch(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    live.add(p)
    p
  }

  /** Eagerly delete a scratch dir whose contents are no longer referenced
    * by any live plan. Safe to call more than once. */
  def release(p: Path): Unit = {
    live.remove(p)
    AtomicTable.deleteRecursively(p)
  }
}
