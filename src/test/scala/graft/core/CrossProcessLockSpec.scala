package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The commit lock's O_EXCL contract END-TO-END across PROCESS
  * boundaries: the in-process specs prove the protocol's logic, but the
  * exactly-one-winner guarantee ultimately rests on the OS honoring
  * exclusive create between independent JVMs — two forked processes race
  * 50 rendezvous'd iterations on `file:` and every iteration must have
  * exactly one winner.
  */
class CrossProcessLockSpec extends AnyFunSuite {

  test("two JVMs racing createExclusive: exactly one winner, 50/50 iterations") {
    val dir = Files.createTempDirectory("graft-xproc").toString
    val iters = 50
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    assert(cp.contains("test-classes"),
      s"forked test JVM should carry the full test classpath, got: $cp")
    def spawn(me: String, other: String): Process =
      new ProcessBuilder(javaBin, "-cp", cp, "graft.core.LockRacer",
        dir, me, other, iters.toString)
        .redirectErrorStream(true)
        .redirectOutput(ProcessBuilder.Redirect.INHERIT)
        .start()
    val a = spawn("a", "b"); val b = spawn("b", "a")
    assert(a.waitFor(120, java.util.concurrent.TimeUnit.SECONDS) &&
      b.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
      "racers did not finish in time")
    assert(a.exitValue() == 0 && b.exitValue() == 0,
      s"racer exit codes: ${a.exitValue()}, ${b.exitValue()}")
    def wins(id: String): Set[Int] =
      WarehouseIO.readString(s"$dir/won-$id").split("\n")
        .filter(_.nonEmpty).map(_.toInt).toSet
    val wa = wins("a"); val wb = wins("b")
    assert((wa & wb).isEmpty, s"both JVMs won iterations: ${(wa & wb).toSeq.sorted}")
    assert(wa ++ wb == (0 until iters).toSet,
      s"iterations without a winner: ${((0 until iters).toSet -- wa -- wb).toSeq.sorted}")
    // neither process starved completely across 50 simultaneous attempts
    assert(wa.nonEmpty && wb.nonEmpty,
      s"suspicious sweep (a=${wa.size}, b=${wb.size}): the race may not be racing")
  }
}
