package graft.util

import java.nio.file.{Files, Path}

/** Process-wide scratch-directory registry: ONE JVM shutdown hook
  * sweeping every registered directory, instead of one hook (plus its
  * thread object) per query CONSTRUCTION — repeated conformance/bench
  * passes in a single JVM previously accumulated hooks and on-disk
  * export copies for the process lifetime (jsonl_roundtrip,
  * bpe_save_load, pack_sequences_reliable each registered their own
  * per-call hook and dir). */
object TempDirs {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach { d =>
        try Files.walk(d).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => { try Files.deleteIfExists(p) catch { case _: Throwable => () }; () })
        catch { case _: Throwable => () }
      }
    }))
  }

  /** A fresh temp directory swept at JVM exit. */
  def scratch(prefix: String): Path = {
    hookInstalled
    val d = Files.createTempDirectory(prefix)
    dirs.add(d)
    d
  }

  private val memo = new java.util.concurrent.ConcurrentHashMap[String, Path]()

  /** A memoized per-key scratch dir: however many times a query is
    * constructed in one JVM, its exports land in (and overwrite) the
    * SAME directory instead of accumulating fresh copies under /tmp. */
  def memoized(key: String, prefix: String): Path =
    memo.computeIfAbsent(key, _ => scratch(prefix))
}
