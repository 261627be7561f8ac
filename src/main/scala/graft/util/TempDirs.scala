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

  /** Prefer RAM-backed tmpfs for fixture state: every byte staged here
    * is ephemeral BY CONSTRUCTION (reaped at JVM exit), and the
    * streaming fixtures' checkpoint fsyncs against the VM's disk were
    * the single largest bench-variance source (the same streaming
    * query measured 9.7 s vs 60.8 s across runs on identical code —
    * disk-latency bursts, not compute). Production checkpoints need
    * durable storage; throwaway test fixtures do not. */
  private lazy val base: Option[Path] = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) Some(shm) else None
  }

  /** Create a temp dir deleted (recursively) at JVM exit. */
  def scoped(prefix: String): Path = {
    hook
    val d = base match {
      case Some(b) => Files.createTempDirectory(b, prefix)
      case None => Files.createTempDirectory(prefix)
    }
    registered.add(d)
    d
  }
}
