package graft

import java.nio.file.{Files, Path}

/** Shutdown-cleaned scratch directories. `File.deleteOnExit` on a
  * directory is a silent no-op once anything is written into it (it
  * removes only EMPTY dirs), so every per-invocation spool/scratch dir
  * that relied on it leaked a full table copy per call. This registry
  * deletes recursively, newest-first, from one shutdown hook.
  */
object TempDirs {

  private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach(deleteRecursively)
  }, "graft-tempdir-cleanup"))

  private def deleteRecursively(root: Path): Unit =
    try {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally s.close()
    } catch { case _: Throwable => () /* best effort at shutdown */ }

  /** A temp directory that is ACTUALLY removed at JVM exit. */
  def scratch(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    dirs.add(d)
    d
  }
}
