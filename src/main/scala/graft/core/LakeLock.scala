package graft.core

import java.util.concurrent.TimeUnit

/** Exclusive-create lock for lake-metadata read-modify-write cycles,
  * shared by every export format (Iceberg: `metadata/_lake.lock`;
  * Delta: `_delta_log/_graft.lock`). Same posture as the table-level
  * `_commit.lock`: loud ConcurrentModificationException on contention,
  * stale holders (> 10 min) broken for the NEXT attempt.
  *
  * Re-entrant per thread (keyed by qualified lock path) so
  * [[GraftTable.tierSnapshot]] can span one lock over publish -> commit
  * -> manifest update while the format's own commit re-acquires inside.
  * Live holders heartbeat the lock's mtime every minute, so the
  * 10-minute breaker only fires on dead holders — a long expire sweep
  * is never broken mid-delete.
  */
private[core] object LakeLock {

  def withLock[T](lockPath: String)(body: => T): T = {
    val key = WarehouseIO.qualify(lockPath)
    if (heldLocks.get.contains(key)) return body // re-entrant per thread
    val parent = lockPath.substring(0, lockPath.lastIndexOf('/'))
    WarehouseIO.mkdirs(parent)
    if (!WarehouseIO.createExclusive(lockPath)) {
      val ageMs = ageOf(lockPath)
      if (ageMs > StaleMs) breakStale(lockPath)
      throw new java.util.ConcurrentModificationException(
        s"another lake-metadata operation holds the lock $lockPath" +
          (if (ageMs > StaleMs) " (stale lock broken; retry)" else ""))
    }
    val hb = heartbeats.scheduleWithFixedDelay(
      () => WarehouseIO.touch(lockPath), 60, 60, TimeUnit.SECONDS)
    heldLocks.set(heldLocks.get + key)
    try body finally {
      heldLocks.set(heldLocks.get - key)
      hb.cancel(false)
      WarehouseIO.deleteIfExists(lockPath)
    }
  }

  private val StaleMs = 10 * 60 * 1000L

  private def ageOf(lockPath: String): Long =
    System.currentTimeMillis() -
      (try WarehouseIO.mtimeMillis(lockPath)
       catch { case _: java.io.IOException => System.currentTimeMillis() })

  /** Break a stale lock without the delete-a-live-lock TOCTOU: re-read
    * the mtime AT BREAK TIME (a contender that stalled since its first
    * read must not steal a lock a new holder just created — live
    * holders' heartbeats keep mtime under a minute old), then claim the
    * break by RENAME, which only one contender can win; the loser's
    * move throws and breaks nothing. Residual window = the milliseconds
    * between the re-read and the rename, vs the 10-minute staleness bar
    * and 60-second heartbeat — a live lock's mtime can't look stale in
    * that window unless its holder's heartbeat is already 10 minutes
    * dead.
    */
  private def breakStale(lockPath: String): Unit =
    if (ageOf(lockPath) > StaleMs) {
      val tomb = s"$lockPath.broken-${java.util.UUID.randomUUID()}"
      try {
        WarehouseIO.moveFile(lockPath, tomb)
        WarehouseIO.deleteIfExists(tomb)
        ()
      } catch { case _: java.io.IOException => () } // another breaker won
    }

  private val heldLocks = new ThreadLocal[Set[String]] {
    override def initialValue(): Set[String] = Set.empty
  }

  private lazy val heartbeats = {
    val t = new java.util.concurrent.ScheduledThreadPoolExecutor(1,
      (r: Runnable) => {
        val th = new Thread(r, "graft-lake-lock-heartbeat")
        th.setDaemon(true); th
      })
    t.setRemoveOnCancelPolicy(true)
    t
  }
}
