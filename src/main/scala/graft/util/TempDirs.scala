package graft.util

import java.nio.file.{Files, Path}

/** JVM-scoped temp staging dirs. Fixture queries (CSV round-trips,
  * streaming drop folders) stage corpus copies under /tmp; repeated
  * Verify/Bench invocations must not leak them, so every dir created
  * here is recursively reaped by one shutdown hook.
  */
object TempDirs {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach { p =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(p.toFile)
      }
    }))
  }

  /** Create a temp dir deleted (recursively) at JVM exit. */
  def scoped(prefix: String): Path = {
    hook
    val d = Files.createTempDirectory(prefix)
    registered.add(d)
    d
  }
}
