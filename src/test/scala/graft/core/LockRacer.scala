package graft.core

/** Child process for the cross-JVM lock race ([[CrossProcessLockSpec]]):
  * for each iteration, rendezvous with the sibling process through ready
  * files, then race it for an exclusive create of the iteration's lock
  * file. Won iterations are recorded in `won-<id>`; args:
  * `<dir> <myId> <otherId> <iterations>`.
  */
object LockRacer {
  def main(args: Array[String]): Unit = {
    val Array(dir, me, other, itersStr) = args
    val iters = itersStr.toInt
    val won = new StringBuilder
    var i = 0
    while (i < iters) {
      WarehouseIO.rawPutBytes(s"$dir/ready-$me-$i", Array.emptyByteArray)
      val deadline = System.currentTimeMillis() + 30000
      while (!WarehouseIO.exists(s"$dir/ready-$other-$i")) {
        if (System.currentTimeMillis() > deadline) {
          System.err.println(s"$me: timed out waiting for $other at $i")
          sys.exit(2)
        }
        Thread.sleep(1)
      }
      // sub-ms jitter so neither process systematically arrives second
      // (the rendezvous otherwise favors the later arriver, who skips the
      // spin-sleep) — the exactly-one-winner property is jitter-free
      Thread.sleep(0, scala.util.Random.nextInt(800000))
      if (WarehouseIO.createExclusive(s"$dir/lock-$i")) won.append(i).append('\n')
      i += 1
    }
    WarehouseIO.atomicWriteString(s"$dir/won-$me", won.toString)
    sys.exit(0)
  }
}
