package graft.ops

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The lease mechanics beyond the Dedup-level contention test (which
  * lives in DedupSpec): ownership-token release, heartbeat liveness,
  * and the verified-reclaim race fix. */
class StoreLockSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fsFor(p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def writeLease(p: Path, token: String): Unit = {
    val fs = fsFor(p)
    val out = fs.create(p, true)
    try out.write((token + "\nholder-for-test\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readToken(p: Path): String = {
    val fs = fsFor(p)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .mkString.split("\n").head.trim
    finally in.close()
  }

  test("release only deletes an owned lease: a reclaimed writer " +
      "throws after success instead of deleting the new holder's lease") {
    val dir = graft.util.TempDirs.scoped("storelock-own").toString
    val store = dir + "/store"
    val lock = new Path(store + ".lock")
    val ex = intercept[IllegalStateException] {
      StoreLock.withLock(spark, store) {
        // simulate a concurrent reclaim landing mid-mutation: the
        // lease is replaced by a foreign holder's
        writeLease(lock, "foreign-token")
        42
      }
    }
    assert(ex.getMessage.contains("reclaimed while this writer"))
    // the foreign lease must NOT have been deleted on our way out
    assert(fsFor(lock).exists(lock))
    assert(readToken(lock) == "foreign-token")
    fsFor(lock).delete(lock, false)
  }

  test("release does not mask a failing body when the lease was lost") {
    val dir = graft.util.TempDirs.scoped("storelock-mask").toString
    val store = dir + "/store"
    val lock = new Path(store + ".lock")
    val ex = intercept[RuntimeException] {
      StoreLock.withLock(spark, store) {
        writeLease(lock, "foreign-token")
        throw new RuntimeException("body blew up")
      }
    }
    assert(ex.getMessage == "body blew up")
    fsFor(lock).delete(lock, false)
  }

  test("heartbeat keeps a live long-running holder's lease fresh: a " +
      "contender sees it live (no reclaim) even past the ttl") {
    val dir = graft.util.TempDirs.scoped("storelock-hb").toString
    val store = dir + "/store"
    val ttl = 2000L
    @volatile var contender: Option[Throwable] = None
    StoreLock.withLock(spark, store, ttlMs = ttl) {
      // outlive the ttl; the heartbeat (ttl/4 cadence, >= 1 s floor)
      // must refresh the mtime so the contender below cannot reclaim
      Thread.sleep(ttl + 1500)
      try StoreLock.withLock(spark, store, ttlMs = ttl) { fail("second writer acquired a live lease") }
      catch { case t: Throwable => contender = Some(t) }
      "done"
    }
    assert(contender.exists(_.getMessage.contains("another writer")),
      s"contender outcome: $contender")
    // released cleanly after the body
    assert(!fsFor(new Path(store + ".lock")).exists(new Path(store + ".lock")))
  }

  test("mutation epoch: an interleaved writer's stamp is detected at " +
      "release even when the lease read-back still looks owned") {
    val dir = graft.util.TempDirs.scoped("storelock-epoch").toString
    val store = dir + "/store"
    val lock = new Path(store + ".lock")
    val epoch = new Path(store + ".epoch")
    // the advisory-lease scenario: a second writer slipped past the
    // lease (object-store create-if-absent not atomic), stamped the
    // epoch, mutated, and restored/eventually-consistent-served OUR
    // lease bytes — only the epoch betrays the interleaving
    val ex = intercept[IllegalStateException] {
      StoreLock.withLock(spark, store) {
        val ours = readToken(lock)
        writeLease(epoch, "racing-writer-token")
        writeLease(lock, ours) // lease still reads as ours
        "mutated"
      }
    }
    assert(ex.getMessage.contains("epoch"), ex.getMessage)
    assert(ex.getMessage.contains("concurrent writer entered mid-mutation"))
    // a clean next mutation stamps its own epoch and succeeds
    assert(StoreLock.withLock(spark, store) { 7 } == 7)
    assert(readToken(epoch) != "racing-writer-token")
    fsFor(epoch).delete(epoch, false)
  }

  test("multi-TTL pause contract: a holder whose heartbeat stops (GC " +
      "pause / suspended VM) is reclaimed, and the RESUMED writer's " +
      "release fails loudly on the token+epoch mismatch") {
    val dir = graft.util.TempDirs.scoped("storelock-pause").toString
    val store = dir + "/store"
    val lock = new Path(store + ".lock")
    val epoch = new Path(store + ".epoch")
    val fs = fsFor(lock)
    @volatile var contenderRan = false
    val ex = intercept[IllegalStateException] {
      // a huge ttl puts the first heartbeat tick ~an hour away — from
      // the lease's point of view this IS a paused driver: nothing
      // refreshes the mtime while the body runs
      StoreLock.withLock(spark, store, ttlMs = 3600L * 1000) {
        // the pause has "already lasted" multi-TTL from the
        // contender's perspective: age the mtime well past ITS ttl
        fs.setTimes(lock, System.currentTimeMillis() - 100000L, -1)
        // contender treats the holder as dead, reclaims, mutates,
        // stamps the epoch with its own token, releases
        StoreLock.withLock(spark, store, ttlMs = 1000L) {
          contenderRan = true
        }
        // the paused writer now "resumes" and completes its mutation —
        // it must NOT be allowed to report clean success
        "resumed-mutation-done"
      }
    }
    assert(contenderRan, "contender should have reclaimed the stale lease")
    assert(ex.getMessage.contains("reclaimed while this writer"),
      ex.getMessage)
    // the epoch backstop ALSO caught the interleaving (either check
    // alone suffices; both firing is the belt-and-braces contract)
    assert(ex.getMessage.contains("epoch"), ex.getMessage)
    fs.delete(epoch, false)
  }

  test("verified reclaim: breaking the lease observed stale succeeds; " +
      "breaking a lease that was swapped for a fresh one restores it") {
    val dir = graft.util.TempDirs.scoped("storelock-race").toString
    val lock = new Path(dir + "/store.lock")
    val fs = fsFor(lock)
    // 1. genuine stale break: observed token == current token
    writeLease(lock, "stale-token")
    StoreLock.breakStaleLease(fs, lock, Some("stale-token"))
    assert(!fs.exists(lock), "stale lease should be broken")
    // 2. the advisory race: contender observed 'stale-token', but a
    // faster reclaimer already broke it and created a FRESH lease —
    // the slow contender's break must restore the fresh lease intact
    writeLease(lock, "fresh-token")
    StoreLock.breakStaleLease(fs, lock, Some("stale-token"))
    assert(fs.exists(lock), "fresh lease must be restored, not stolen")
    assert(readToken(lock) == "fresh-token")
    // no tombstone debris left behind
    val debris = fs.listStatus(new Path(dir))
      .map(_.getPath.getName).filter(_.contains(".stale-"))
    assert(debris.isEmpty, s"tombstone debris: ${debris.mkString(",")}")
    fs.delete(lock, false)
  }
}
