package graft.core

/** Throwaway micro-benchmark (Test/runMain graft.core.IoMicrobench):
  * WarehouseIO vs java.nio on the metadata hot ops, over a dir shaped
  * like a busy log dir (hive dirs + small files).
  */
object IoMicrobench {
  def main(args: Array[String]): Unit = {
    val root = java.nio.file.Files.createTempDirectory("io-bench").toString
    for (b <- 0 until 32; f <- 0 until 8) {
      val d = java.nio.file.Paths.get(s"$root/__bucket=$b")
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve(s"part-$f.parquet"), Array[Byte](1, 2, 3))
    }
    val mf = s"$root/_offsets.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(mf),
      "{}".getBytes("UTF-8"))

    def time(name: String, n: Int)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime()
      var i = 0; while (i < n) { body; i += 1 }
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e6 / n}%8.3f ms/op")
    }

    time("nio walk 256 files", 50) {
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try {
        val it = w.iterator(); var c = 0
        while (it.hasNext) { if (it.next().toString.endsWith(".parquet")) c += 1 }
      } finally w.close()
    }
    time("WarehouseIO.walkFiles", 50) {
      WarehouseIO.walkFiles(root).count(_.name.endsWith(".parquet"))
    }
    time("nio exists+readAllBytes", 200) {
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(mf)))
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(mf))
    }
    time("WarehouseIO.readStringIfExists", 200) {
      WarehouseIO.readStringIfExists(mf)
    }
    time("WarehouseIO.exists", 500) { WarehouseIO.exists(mf) }
    time("WarehouseIO.listDir", 200) { WarehouseIO.listDir(root) }
  }
}
