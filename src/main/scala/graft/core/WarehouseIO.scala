package graft.core

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, LocalFileSystem, Options, Path}

/** All warehouse METADATA IO — manifests, lock files, staged-file moves,
  * directory listings — behind `org.apache.hadoop.fs.FileSystem`, so the
  * warehouse can live on any Hadoop filesystem (`file:`, `hdfs:`, `s3a:`,
  * ...), not only a POSIX mount. Data files already flow through Spark's
  * own Hadoop writers; this closes the metadata path (the reference runs
  * its log over a pluggable FileSystem abstraction the same way,
  * fluss-filesystems/, RemoteLogManager.java:72).
  *
  * Atomicity contract, by scheme:
  *  - `file:` — overwrite-rename and exclusive-create are POSIX-atomic
  *    (exclusive create goes through java.nio O_EXCL).
  *  - `hdfs:` — rename is atomic; `create(overwrite=false)` is an atomic
  *    namenode operation, so manifest publishes and lock acquisition keep
  *    their exactly-one-winner semantics.
  *  - `s3a:` and other object stores — rename is copy+delete and create
  *    is not check-and-act, so the commit protocol's single-writer
  *    guarantee needs an external coordination point (a lock table / DynamoDB
  *    conditional put, as every S3-native table format requires). Readers
  *    are still safe: a torn manifest never parses, and unmanifested data
  *    files are invisible by construction. Concurrent WRITERS on raw S3
  *    must be externally serialized.
  *
  * Local paths take the RAW local filesystem (no `.crc` checksum
  * shadow-files polluting log directories).
  */
object WarehouseIO {

  /** One listing entry (file or directory). `path` is the fully-qualified
    * Hadoop path string — feed it back to Spark or to this object as-is.
    */
  final case class Entry(path: String, name: String, isDir: Boolean,
      mtimeMillis: Long, len: Long)

  // The session's Hadoop conf picks up fs.* settings (credentials,
  // endpoints); building one per call would put XML parsing on the
  // metadata hot path, so cache the first SESSION-derived conf. A bare
  // Configuration (no session on this thread — getActiveSession is
  // thread-scoped) is used transiently but never cached, so a
  // background-thread first touch cannot pin a credential-less conf
  // for the life of the JVM.
  @volatile private var cachedConf: Configuration = _
  private def conf: Configuration = {
    val c = cachedConf
    if (c != null) c
    else org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession) match {
      case Some(s) =>
        val fresh = s.sessionState.newHadoopConf()
        cachedConf = fresh
        fresh
      case None => new Configuration()
    }
  }

  private def p(s: String): Path = new Path(s)

  private def fs(s: String): FileSystem = p(s).getFileSystem(conf) match {
    case l: LocalFileSystem => l.getRaw // no .crc shadow files
    case other => other
  }

  /** Is this path on the local filesystem (no scheme or `file:`)? Local
    * paths keep java.nio's O_EXCL atomicity for exclusive creates.
    */
  private def localPathOf(s: String): Option[java.nio.file.Path] = {
    val uri = p(s).toUri
    if (uri.getScheme == null || uri.getScheme == "file")
      Some(java.nio.file.Paths.get(uri.getPath))
    else None
  }

  /** Fully-qualified form of `path` (scheme + authority), for prefix math
    * against listing results, which Hadoop always returns qualified.
    */
  def qualify(path: String): String =
    fs(path).makeQualified(p(path)).toString

  def exists(path: String): Boolean = fs(path).exists(p(path))

  def isDirectory(path: String): Boolean = {
    val f = fs(path)
    f.exists(p(path)) && f.getFileStatus(p(path)).isDirectory
  }

  def size(path: String): Long = fs(path).getFileStatus(p(path)).getLen

  def mtimeMillis(path: String): Long =
    fs(path).getFileStatus(p(path)).getModificationTime

  def readBytes(path: String): Array[Byte] = {
    val f = fs(path)
    val len = f.getFileStatus(p(path)).getLen
    require(len <= Int.MaxValue, s"metadata file too large: $path ($len bytes)")
    val in = f.open(p(path))
    try {
      val buf = new Array[Byte](len.toInt)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }

  def readString(path: String): String =
    new String(readBytes(path), StandardCharsets.UTF_8)

  def readStringIfExists(path: String): Option[String] =
    if (exists(path)) Some(readString(path)) else None

  def mkdirs(path: String): Unit = fs(path).mkdirs(p(path))

  /** Delete a file or empty directory if present; false when absent. */
  def deleteIfExists(path: String): Boolean =
    try fs(path).delete(p(path), false)
    catch { case _: java.io.FileNotFoundException => false }

  def deleteRecursively(path: String): Unit = {
    val f = fs(path)
    if (f.exists(p(path))) f.delete(p(path), true)
  }

  /** Plain (no-overwrite) file move; parents of `dst` are created. */
  def moveFile(src: String, dst: String): Unit = {
    val f = fs(dst)
    val parent = p(dst).getParent
    if (parent != null) f.mkdirs(parent)
    if (!f.rename(p(src), p(dst)))
      throw new java.io.IOException(s"rename failed: $src -> $dst")
  }

  /** Atomic overwrite-rename (HDFS: FileContext RENAME.OVERWRITE; local:
    * POSIX rename). Object stores degrade to delete+rename — see the
    * class doc's atomicity contract.
    */
  def overwriteRename(src: String, dst: String): Unit = {
    localPathOf(dst) match {
      case Some(local) =>
        java.nio.file.Files.move(java.nio.file.Paths.get(localPathOf(src).get.toString),
          local, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      case None =>
        try {
          val fc = FileContext.getFileContext(p(dst).toUri, conf)
          fc.rename(p(qualify(src)), p(qualify(dst)), Options.Rename.OVERWRITE)
        } catch {
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
            // no AbstractFileSystem binding (some object stores): not
            // atomic, acceptable per the documented S3 contract
            val f = fs(dst)
            f.delete(p(dst), false)
            if (!f.rename(p(src), p(dst)))
              throw new java.io.IOException(s"rename failed: $src -> $dst")
        }
    }
  }

  /** Write a small file then atomically move it into place. The temp
    * name is UNIQUE per call: concurrent un-locked writers (e.g. two
    * SecondaryIndex.refresh calls) must not publish each other's bytes
    * or rename a vanished temp. Crash residue (stray .tmp-*) is inert —
    * no reader ever enumerates it.
    */
  def atomicWriteString(path: String, content: String): Unit = {
    val tmp = path + ".tmp-" + java.util.UUID.randomUUID()
    val f = fs(tmp)
    val out = f.create(p(tmp), true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    overwriteRename(tmp, path)
  }

  /** Exclusive create — the lock-file primitive. True exactly when this
    * caller created the file. Local: O_EXCL; HDFS: atomic namenode
    * create(overwrite=false); object stores: best-effort (documented).
    */
  def createExclusive(path: String): Boolean = localPathOf(path) match {
    case Some(local) =>
      try { java.nio.file.Files.createFile(local); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.nio.file.NoSuchFileException => // parent vanished
          throw new java.io.FileNotFoundException(path)
      }
    case None =>
      // FileSystem.create auto-creates missing parents — but a vanished
      // parent means the table/db was dropped mid-race, and silently
      // resurrecting the directory would let the lock body run against
      // a half-deleted tree. Match the local-path contract instead.
      val parent = p(path).getParent
      if (parent != null && !fs(path).exists(parent))
        throw new java.io.FileNotFoundException(path)
      try { fs(path).create(p(path), false).close(); true }
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException |
                   _: java.nio.file.FileAlreadyExistsException => false }
  }

  /** Immediate children (files and dirs); empty for a missing dir. */
  def listDir(path: String): Seq[Entry] = {
    val f = fs(path)
    if (!f.exists(p(path))) Nil
    else f.listStatus(p(path)).toSeq.map(st => Entry(st.getPath.toString,
      st.getPath.getName, st.isDirectory, st.getModificationTime, st.getLen))
  }

  /** All FILES under `path`, recursively; empty for a missing dir. One
    * round-trip per directory level (and a single LIST on object stores).
    */
  def walkFiles(path: String): Seq[Entry] = {
    val f = fs(path)
    if (!f.exists(p(path))) Nil
    else {
      val it = f.listFiles(p(path), true)
      val buf = scala.collection.mutable.ArrayBuffer[Entry]()
      while (it.hasNext) {
        val st = it.next()
        buf += Entry(st.getPath.toString, st.getPath.getName, st.isDirectory,
          st.getModificationTime, st.getLen)
      }
      buf.toSeq
    }
  }

  /** Byte-copy one file; parents of `dst` are created. */
  def copyFile(src: String, dst: String): Unit = {
    val sf = fs(src); val df = fs(dst)
    val parent = p(dst).getParent
    if (parent != null) df.mkdirs(parent)
    org.apache.hadoop.fs.FileUtil.copy(sf, p(src), df, p(dst),
      false /* deleteSource */, true /* overwrite */, conf)
  }

  /** The warehouse root of a table directory (`<warehouse>/<db>/<table>`):
    * two path segments up. Shared by every caller that needs the
    * warehouse-scoped stores (dynamic configs, ACLs) from a table handle;
    * returns "" when the path has fewer than two separators.
    */
  def warehouseOf(tablePath: String): String = {
    val p0 = tablePath.stripSuffix("/")
    val i = p0.lastIndexOf('/', p0.lastIndexOf('/') - 1)
    if (i > 0) p0.substring(0, i) else ""
  }

  /** `child`'s path relative to `base` (both qualified first). */
  def relativize(base: String, child: String): String = {
    val b = qualify(base).stripSuffix("/") + "/"
    val c = qualify(child)
    require(c.startsWith(b), s"$child is not under $base")
    c.substring(b.length)
  }
}
