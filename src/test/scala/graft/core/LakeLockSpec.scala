package graft.core

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.scalatest.funsuite.AnyFunSuite

/** The format-shared lake lock: contention, staleness breaking (rename-
  * claimed, mtime re-checked at break time), and re-entrancy. No Spark
  * session needed — pure filesystem behavior.
  */
class LakeLockSpec extends AnyFunSuite {

  private def tmpLock(): String = {
    val d = Files.createTempDirectory("graft-lakelock").toString
    s"$d/_lake.lock"
  }

  test("held lock -> loud contention; released -> acquirable; re-entrant") {
    val lock = tmpLock()
    assert(LakeLock.withLock(lock) {
      LakeLock.withLock(lock) { 7 } // same thread re-enters
    } == 7)
    assert(!WarehouseIO.exists(lock)) // released
    assert(WarehouseIO.createExclusive(lock)) // someone else holds it
    val e = intercept[java.util.ConcurrentModificationException](
      LakeLock.withLock(lock) { fail("must not enter") })
    assert(e.getMessage.contains("holds the lock"))
    assert(!e.getMessage.contains("stale")) // fresh lock, not broken
    assert(WarehouseIO.exists(lock)) // a fresh lock is never deleted
    WarehouseIO.deleteIfExists(lock)
  }

  test("stale lock (mtime > 10 min) is broken for the NEXT attempt; " +
      "a fresh one never is") {
    val lock = tmpLock()
    assert(WarehouseIO.createExclusive(lock))
    Files.setLastModifiedTime(Paths.get(lock),
      FileTime.fromMillis(System.currentTimeMillis() - 11 * 60 * 1000))
    val e = intercept[java.util.ConcurrentModificationException](
      LakeLock.withLock(lock) { fail("breaker itself must not enter") })
    assert(e.getMessage.contains("stale lock broken"), e.getMessage)
    assert(!WarehouseIO.exists(lock)) // broken via rename + delete
    // the retry the message prescribes succeeds
    assert(LakeLock.withLock(lock) { 42 } == 42)
    assert(!WarehouseIO.exists(lock))
  }
}
