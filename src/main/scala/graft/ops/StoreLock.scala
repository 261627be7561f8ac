package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Loud SINGLE-WRITER enforcement for the durable parquet stores
  * (fingerprint / LSH band / cluster-table mutations in
  * [[graft.dedup.Dedup]]). Every store mutation documents a
  * single-writer contract — two concurrent ingests can both classify
  * the same novel key as accepted and append it twice, silently
  * duplicating store rows on every later probe — but a documented
  * contract nobody enforces fails silently. This makes the break
  * LOUD: a lease file taken with create-fail-if-exists (atomic on
  * HDFS and posix-local; the object-store caveat is documented below)
  * around the mutate-and-swap, so the second concurrent writer throws
  * instead of corrupting the store.
  *
  * Lease, not lock: a writer that died holding the file must not
  * brick the store, so a holder older than `ttlMs` is considered
  * stale and broken (one reclaim attempt — the rename-to-tombstone
  * makes the reclaim itself single-winner). TTL must exceed the
  * longest expected mutation; the default 30 min bounds demo-scale
  * ingests by orders of magnitude, and production passes its own.
  *
  * S3-family object stores lack atomic create-if-absent; there the
  * lease degrades to advisory (two racing creates can both "win").
  * The recommended 100 TB layout runs ingests from one scheduler
  * slot anyway — the lease is the backstop that turns an accidental
  * double-schedule into an exception instead of silent row
  * duplication.
  */
object StoreLock {

  /** Run `body` holding the lease at `<storePath>.lock`. Throws
    * [[IllegalStateException]] if another live writer holds it. */
  def withLock[T](ss: SparkSession, storePath: String,
      ttlMs: Long = 30L * 60 * 1000)(body: => T): T = {
    val lock = new Path(storePath.stripSuffix("/") + ".lock")
    val fs = lock.getFileSystem(ss.sessionState.newHadoopConf())
    acquire(fs, lock, ttlMs, reclaimTried = false)
    try body
    finally fs.delete(lock, false)
  }

  private def acquire(fs: org.apache.hadoop.fs.FileSystem, lock: Path,
      ttlMs: Long, reclaimTried: Boolean): Unit = {
    val holderNote =
      s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}\n"
    try {
      // overwrite=false: atomic create-or-throw — the mutual exclusion
      val out = fs.create(lock, false)
      try out.write(holderNote.getBytes("UTF-8")) finally out.close()
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
          _: java.io.IOException if fs.exists(lock) =>
        val ageMs = System.currentTimeMillis() -
          fs.getFileStatus(lock).getModificationTime
        if (ageMs > ttlMs && !reclaimTried) {
          // stale holder: break the lease ONCE via rename-to-tombstone
          // (single-winner — the loser's rename returns false and it
          // re-contends on the fresh lock like any other writer)
          val tomb = new Path(lock.getParent,
            "." + lock.getName + ".stale-" + java.util.UUID.randomUUID())
          if (fs.rename(lock, tomb)) fs.delete(tomb, false)
          acquire(fs, lock, ttlMs, reclaimTried = true)
        } else {
          val holder =
            try {
              val in = fs.open(lock)
              try scala.io.Source.fromInputStream(in, "UTF-8")
                .mkString.trim
              finally in.close()
            } catch { case _: Exception => "<unreadable>" }
          throw new IllegalStateException(
            s"store at ${lock.toString.stripSuffix(".lock")} is being " +
              s"mutated by another writer (lease $lock, holder " +
              s"'$holder', age ${ageMs / 1000} s, ttl ${ttlMs / 1000} s)" +
              " — the single-writer contract forbids concurrent " +
              "ingests; wait for it to finish, or delete a known-dead " +
              "holder's lease")
        }
    }
  }
}
