package graft

import java.nio.file.{Files, Path}

/** Temp-dir factory for queries that stage fixture layouts (CSV/JSON/
  * fixed-width renders, partitioned writes, stream inputs). Every dir is
  * registered for recursive deletion in ONE JVM shutdown hook — before
  * this, each Verify/Bench run leaked its staging trees into the system
  * temp dir (measured: ~2.8k orphan dirs / ~1 GB after a round of
  * gate+bench runs).
  */
object Staging {

  private val created =
    java.util.Collections.synchronizedList(new java.util.ArrayList[Path]())

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    created.forEach { root =>
      try {
        Files.walk(root).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { try Files.deleteIfExists(p) catch { case _: Throwable => () } })
      } catch { case _: Throwable => () }
    }))

  /** Create a fresh staging dir (deleted recursively on JVM exit). */
  def tempDir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}
