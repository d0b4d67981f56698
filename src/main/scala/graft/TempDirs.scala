package graft

/** The one recursive temp-dir delete behind the harness mains (Bench's
  * warm-up dirs, Verify's stale-gate-output removal) and the gate
  * staging (LlmQueries staged inputs / scratch indexes). One
  * definition: a fix (symlink handling, locked-file retry) cannot reach
  * some call sites and miss others. Swallows errors by design — every
  * caller treats reclamation as best-effort cleanup, never as
  * correctness. */
private[graft] object TempDirs {

  /** Exit-time reclaim registry: every harness-created temp dir (feed
    * re-lays, streaming sinks, checkpoints, staged waves) registers
    * here, so repeated bench/verify runs in one process — and the
    * process itself — never strand corpus-sized directories in the temp
    * volume. Registration is idempotent per path. */
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  sys.addShutdownHook { registered.forEach(deleteRecursively) }
  def reclaimOnExit(dir: java.nio.file.Path): java.nio.file.Path = {
    registered.add(dir)
    dir
  }

  /** Delete a registered dir NOW and drop it from the exit registry —
    * for per-invocation dirs (scratch indexes, checkpoints) whose
    * lifetime ends with the call, so the registry doesn't grow by one
    * dead path per invocation for the process lifetime. */
  def release(dir: java.nio.file.Path): Unit = {
    registered.remove(dir)
    deleteRecursively(dir)
  }

  def deleteRecursively(dir: java.nio.file.Path): Unit =
    try {
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    } catch { case _: Throwable => () }
}
