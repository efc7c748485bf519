package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files => NioFiles, Paths => NioPaths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, LocalFileSystem, Options, Path}

/** All warehouse METADATA IO — manifests, lock files, staged-file moves,
  * directory listings — behind one facade, so the warehouse can live on
  * any Hadoop filesystem (`file:`, `hdfs:`, `s3a:`, ...), not only a
  * POSIX mount. Data files already flow through Spark's own Hadoop
  * writers; this closes the metadata path (the reference runs its log
  * over a pluggable FileSystem abstraction the same way,
  * fluss-filesystems/, RemoteLogManager.java:72).
  *
  * LOCAL paths (no scheme, or `file:`) take a java.nio fast path:
  * Hadoop's RawLocalFileSystem pays per-entry permission/stat overhead
  * that measured 600x slower than nio on a 256-file log-dir walk
  * (1.25 s vs 2 ms) — intolerable on the manifest-read hot path every
  * scan planning hits. The nio branch preserves the caller's scheme
  * convention in every returned path (a `file:`-URI warehouse keeps its
  * prefix; a plain path stays plain), so downstream Spark reads resolve
  * against the right filesystem even when `fs.defaultFS` is remote.
  * Non-local schemes go through `org.apache.hadoop.fs.FileSystem` /
  * `FileContext`.
  *
  * Atomicity contract, by scheme:
  *  - `file:` — overwrite-rename and exclusive-create are POSIX-atomic
  *    (java.nio ATOMIC_MOVE / O_EXCL).
  *  - `hdfs:` — rename is atomic; `create(overwrite=false)` is an atomic
  *    namenode operation, so manifest publishes and lock acquisition keep
  *    their exactly-one-winner semantics.
  *  - `s3a:` and other object stores — rename is copy+delete and create
  *    is not check-and-act, so the commit protocol's single-writer
  *    guarantee needs an external coordination point (a lock table /
  *    DynamoDB conditional put, as every S3-native table format
  *    requires). The commit-critical primitives below ([[createExclusive]],
  *    [[overwriteRename]]) ENFORCE this: on a known non-atomic scheme
  *    they route through the scheme's registered [[CommitCoordinator]],
  *    and with none registered they REFUSE loudly instead of corrupting
  *    silently — unless the deployment asserts external serialization
  *    with the Hadoop conf `graft.commit.allow-non-atomic=true`. Readers
  *    are always safe regardless: a torn manifest never parses, and
  *    unmanifested data files are invisible by construction.
  */
object WarehouseIO {

  /** One listing entry (file or directory). `path` keeps the scheme
    * convention of the listing's base path — feed it back to Spark or to
    * this object as-is.
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
  // extra fs.* bindings applied over every conf this object hands out —
  // lets embedders (and the remote-branch spec) register filesystem
  // implementations without rebuilding the session
  private val confOverrides =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Register an extra Hadoop conf binding (e.g. `fs.<scheme>.impl`)
    * for all metadata IO, current and future confs alike.
    */
  def setConf(key: String, value: String): Unit = {
    confOverrides.put(key, value)
    val c = cachedConf
    if (c != null) c.set(key, value)
  }

  private def applyOverrides(c: Configuration): Configuration = {
    confOverrides.forEach((k, v) => c.set(k, v))
    c
  }

  private def conf: Configuration = {
    val c = cachedConf
    if (c != null) c
    else org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession) match {
      case Some(s) =>
        val fresh = applyOverrides(s.sessionState.newHadoopConf())
        cachedConf = fresh
        fresh
      case None => applyOverrides(new Configuration())
    }
  }

  private def p(s: String): Path = new Path(s)

  private def fs(s: String): FileSystem = p(s).getFileSystem(conf) match {
    case l: LocalFileSystem => l.getRaw // no .crc shadow files
    case other => other
  }

  // is a scheme-LESS path local? Only when fs.defaultFS is — on a
  // cluster whose default filesystem is hdfs://, a plain path means the
  // remote FS (Spark resolves its data IO the same way, and splitting
  // metadata/data across filesystems would be silent corruption)
  @volatile private var defaultIsLocalCache: java.lang.Boolean = _
  private def defaultIsLocal: Boolean = {
    val b = defaultIsLocalCache
    if (b != null) b.booleanValue()
    else {
      val c = conf
      val u = FileSystem.getDefaultUri(c)
      val v = u.getScheme == null || u.getScheme == "file"
      // cache only a SESSION-derived verdict: a bare pre-session
      // Configuration says file:/// regardless of what the real session
      // will configure, and pinning that would re-open the metadata/
      // data filesystem split this check exists to prevent
      if (cachedConf ne null) defaultIsLocalCache = java.lang.Boolean.valueOf(v)
      v
    }
  }

  /** The local-filesystem form of `path`, which selects the java.nio
    * fast path: an explicit `file:` scheme always; a scheme-less path
    * only when `fs.defaultFS` is local.
    */
  private def localPathOf(s: String): Option[java.nio.file.Path] = {
    val uri = p(s).toUri
    if (uri.getScheme == "file" ||
        (uri.getScheme == null && defaultIsLocal))
      Some(NioPaths.get(uri.getPath))
    else None
  }

  /** Render a child discovered under `base` (nio walk) in the CALLER's
    * scheme convention — `file:`-URI bases keep their prefix, plain
    * bases stay plain.
    */
  private def render(base: String, nioBase: java.nio.file.Path,
      child: java.nio.file.Path): String = {
    val rel = nioBase.relativize(child).toString
    if (rel.isEmpty) base else base.stripSuffix("/") + "/" + rel
  }

  /** The path's effective scheme — a scheme-less path resolves to
    * whatever `fs.defaultFS` is.
    */
  private[core] def schemeOf(path: String): String = {
    val s = p(path).toUri.getScheme
    if (s != null) s
    else {
      val d = FileSystem.getDefaultUri(conf).getScheme
      if (d == null) "file" else d
    }
  }

  /** Commit-primitive routing for a remote path: the scheme's registered
    * coordinator if any; None (= use the FS primitive directly) for
    * atomic schemes or when the deployment opted into external
    * serialization; a loud refusal otherwise.
    */
  private def coordinatorFor(path: String, primitive: String)
      : Option[CommitCoordinator] = {
    val scheme = schemeOf(path)
    CommitCoordinators.forScheme(scheme) match {
      case some @ Some(_) => some
      case None =>
        if (!CommitCoordinators.isAtomic(scheme) &&
            !conf.getBoolean("graft.commit.allow-non-atomic", false))
          throw new IllegalStateException(
            s"$primitive on '$scheme:' is not atomic: concurrent writers " +
              s"would silently corrupt $path. Register a CommitCoordinator " +
              "for the scheme (e.g. FileLeaseCommitCoordinator over a " +
              "shared atomic mount, or a lock-service implementation), or " +
              "set graft.commit.allow-non-atomic=true if all committers " +
              "are already serialized externally.")
        None
    }
  }

  /** Raw single-request PUT (create-overwrite + write + close) with no
    * coordinator routing — the publish primitive [[CommitCoordinator]]
    * implementations build on (atomic per-object on real object stores).
    */
  private[core] def rawPutBytes(path: String, bytes: Array[Byte]): Unit =
    localPathOf(path) match {
      case Some(l) =>
        val parent = l.getParent
        if (parent != null) NioFiles.createDirectories(parent)
        NioFiles.write(l, bytes); ()
      case None =>
        val out = fs(path).create(p(path), true)
        try out.write(bytes) finally out.close()
    }

  def exists(path: String): Boolean = localPathOf(path) match {
    case Some(l) => NioFiles.exists(l)
    case None => fs(path).exists(p(path))
  }

  def isDirectory(path: String): Boolean = localPathOf(path) match {
    case Some(l) => NioFiles.isDirectory(l)
    case None =>
      val f = fs(path)
      f.exists(p(path)) && f.getFileStatus(p(path)).isDirectory
  }

  def size(path: String): Long = localPathOf(path) match {
    case Some(l) => NioFiles.size(l)
    case None => fs(path).getFileStatus(p(path)).getLen
  }

  def mtimeMillis(path: String): Long = localPathOf(path) match {
    case Some(l) => NioFiles.getLastModifiedTime(l).toMillis
    case None => fs(path).getFileStatus(p(path)).getModificationTime
  }

  /** (mtimeMillis, length) as one stat, or (-1, -1) when absent — the
    * cache identity for manifest-derived caches. Mtime alone is too
    * coarse: on filesystems with 1 s granularity two commits in the same
    * second would serve stale cached stats; the length breaks the tie
    * (manifests grow monotonically within a second in practice).
    */
  def statIdentity(path: String): (Long, Long) = localPathOf(path) match {
    case Some(l) =>
      try (NioFiles.getLastModifiedTime(l).toMillis, NioFiles.size(l))
      catch { case _: java.io.IOException => (-1L, -1L) }
    case None =>
      val f = fs(path)
      try {
        val st = f.getFileStatus(p(path))
        (st.getModificationTime, st.getLen)
      } catch { case _: java.io.FileNotFoundException => (-1L, -1L) }
  }

  /** The session-derived Hadoop conf this object does its IO with —
    * shared with driver-side parquet footer reads
    * ([[graft.core.FooterStats]]) so they see the same `fs.*` bindings
    * (credentials, endpoint/scheme registrations) as every other
    * metadata read, instead of a bare `new Configuration()`.
    */
  private[core] def hadoopConf: Configuration = conf

  /** Bump a file's mtime to now (lock heartbeats). Swallows EVERY
    * non-fatal failure, not just IO: a heartbeat lambda that throws
    * (e.g. an object-store connector's UnsupportedOperationException
    * from setTimes) would permanently cancel its scheduled task and
    * make a live lock holder look stale.
    */
  def touch(path: String): Unit = try {
    localPathOf(path) match {
      case Some(l) => NioFiles.setLastModifiedTime(l,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      case None => fs(path).setTimes(p(path), System.currentTimeMillis(), -1)
    }
  } catch { case scala.util.control.NonFatal(_) => () }

  def readBytes(path: String): Array[Byte] = localPathOf(path) match {
    case Some(l) => NioFiles.readAllBytes(l)
    case None =>
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

  def mkdirs(path: String): Unit = localPathOf(path) match {
    case Some(l) => NioFiles.createDirectories(l); ()
    case None => fs(path).mkdirs(p(path)); ()
  }

  /** Delete a file or empty directory if present; false when absent. */
  def deleteIfExists(path: String): Boolean = localPathOf(path) match {
    case Some(l) => NioFiles.deleteIfExists(l)
    case None =>
      try fs(path).delete(p(path), false)
      catch { case _: java.io.FileNotFoundException => false }
  }

  def deleteRecursively(path: String): Unit = localPathOf(path) match {
    case Some(l) =>
      if (NioFiles.exists(l)) {
        import scala.jdk.CollectionConverters._
        val walk = NioFiles.walk(l)
        val all = try walk.iterator().asScala.toVector finally walk.close()
        all.reverse.foreach(NioFiles.deleteIfExists(_))
      }
    case None =>
      val f = fs(path)
      if (f.exists(p(path))) f.delete(p(path), true)
  }

  /** Plain (no-overwrite) file move; parents of `dst` are created. */
  def moveFile(src: String, dst: String): Unit =
    (localPathOf(src), localPathOf(dst)) match {
      case (Some(ls), Some(ld)) =>
        val parent = ld.getParent
        if (parent != null) NioFiles.createDirectories(parent)
        NioFiles.move(ls, ld) // throws if dst exists — same contract
        ()
      case _ =>
        val f = fs(dst)
        val parent = p(dst).getParent
        if (parent != null) f.mkdirs(parent)
        if (!f.rename(p(src), p(dst)))
          throw new java.io.IOException(s"rename failed: $src -> $dst")
    }

  /** Atomic overwrite-rename (local: POSIX rename; HDFS: FileContext
    * RENAME.OVERWRITE). Object stores degrade to delete+rename — see
    * the atomicity contract above.
    */
  def overwriteRename(src: String, dst: String): Unit = {
    localPathOf(dst) match {
      case Some(local) =>
        NioFiles.move(localPathOf(src).get, local,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      case None => coordinatorFor(dst, "overwrite-rename") match {
        case Some(c) => c.overwriteRename(src, dst)
        case None =>
          try {
            val fc = FileContext.getFileContext(p(dst).toUri, conf)
            fc.rename(p(qualify(src)), p(qualify(dst)), Options.Rename.OVERWRITE)
          } catch {
            case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
              // no AbstractFileSystem binding: not atomic — reachable
              // only for schemes that passed the atomicity gate or
              // opted in via graft.commit.allow-non-atomic
              val f = fs(dst)
              f.delete(p(dst), false)
              if (!f.rename(p(src), p(dst)))
                throw new java.io.IOException(s"rename failed: $src -> $dst")
          }
      }
    }
  }

  /** Write a small file then atomically move it into place. The temp
    * name is UNIQUE per call: concurrent un-locked writers (e.g. two
    * SecondaryIndex.refresh calls) must not publish each other's bytes
    * or rename a vanished temp. Crash residue (stray .tmp-*) is inert —
    * no reader ever enumerates it; removeOrphanFiles reclaims it.
    */
  def atomicWriteString(path: String, content: String): Unit = {
    // resolve the publish route FIRST: a non-atomic-scheme refusal must
    // fire before any temp bytes land
    if (localPathOf(path).isEmpty) coordinatorFor(path, "overwrite-rename")
    val tmp = path + ".tmp-" + java.util.UUID.randomUUID()
    localPathOf(tmp) match {
      case Some(l) =>
        // match the Hadoop create() contract: parents are created
        val parent = l.getParent
        if (parent != null) NioFiles.createDirectories(parent)
        NioFiles.write(l, content.getBytes(StandardCharsets.UTF_8)); ()
      case None =>
        val out = fs(tmp).create(p(tmp), true)
        try out.write(content.getBytes(StandardCharsets.UTF_8))
        finally out.close()
    }
    overwriteRename(tmp, path)
  }

  /** Exclusive create — the lock-file primitive. True exactly when this
    * caller created the file. Local: O_EXCL; HDFS: atomic namenode
    * create(overwrite=false); object stores: best-effort (documented).
    * A vanished parent (dropped table/db) surfaces as
    * FileNotFoundException on every scheme.
    */
  def createExclusive(path: String): Boolean = localPathOf(path) match {
    case Some(local) =>
      try { NioFiles.createFile(local); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.nio.file.NoSuchFileException => // parent vanished
          throw new java.io.FileNotFoundException(path)
      }
    case None => coordinatorFor(path, "exclusive-create") match {
      case Some(c) => c.createExclusive(path)
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
  }

  /** Immediate children (files and dirs); empty for a missing dir. */
  def listDir(path: String): Seq[Entry] = localPathOf(path) match {
    case Some(l) =>
      if (!NioFiles.isDirectory(l)) Nil
      else {
        import scala.jdk.CollectionConverters._
        val st = NioFiles.list(l)
        try st.iterator().asScala.map { c =>
          val dir = NioFiles.isDirectory(c)
          Entry(render(path, l, c), c.getFileName.toString, dir,
            NioFiles.getLastModifiedTime(c).toMillis,
            if (dir) 0L else NioFiles.size(c))
        }.toVector
        finally st.close()
      }
    case None =>
      val f = fs(path)
      if (!f.exists(p(path))) Nil
      else f.listStatus(p(path)).toSeq.map(st => Entry(st.getPath.toString,
        st.getPath.getName, st.isDirectory, st.getModificationTime, st.getLen))
  }

  /** All FILES under `path`, recursively; empty for a missing dir. */
  def walkFiles(path: String): Seq[Entry] = localPathOf(path) match {
    case Some(l) =>
      if (!NioFiles.exists(l)) Nil
      else {
        import scala.jdk.CollectionConverters._
        val walk = NioFiles.walk(l)
        try walk.iterator().asScala
          .filter(NioFiles.isRegularFile(_))
          .map(c => Entry(render(path, l, c), c.getFileName.toString,
            false, NioFiles.getLastModifiedTime(c).toMillis,
            NioFiles.size(c)))
          .toVector
        finally walk.close()
      }
    case None =>
      val f = fs(path)
      if (!f.exists(p(path))) Nil
      else {
        val it = f.listFiles(p(path), true)
        val buf = scala.collection.mutable.ArrayBuffer[Entry]()
        while (it.hasNext) {
          val st = it.next()
          buf += Entry(st.getPath.toString, st.getPath.getName,
            st.isDirectory, st.getModificationTime, st.getLen)
        }
        buf.toSeq
      }
  }

  /** Byte-copy one file; parents of `dst` are created. */
  def copyFile(src: String, dst: String): Unit =
    (localPathOf(src), localPathOf(dst)) match {
      case (Some(ls), Some(ld)) =>
        val parent = ld.getParent
        if (parent != null) NioFiles.createDirectories(parent)
        NioFiles.copy(ls, ld,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      case _ =>
        val sf = fs(src); val df = fs(dst)
        val parent = p(dst).getParent
        if (parent != null) df.mkdirs(parent)
        org.apache.hadoop.fs.FileUtil.copy(sf, p(src), df, p(dst),
          false /* deleteSource */, true /* overwrite */, conf)
        ()
    }

  /** Fully-qualified form of `path` (scheme + authority) — remote
    * schemes only; local listings render in the caller's own convention.
    */
  def qualify(path: String): String =
    fs(path).makeQualified(p(path)).toString

  /** The warehouse root of a table directory (`<warehouse>/<db>/<table>`):
    * two path segments up. Shared by every caller that needs the
    * warehouse-scoped stores (dynamic configs, ACLs) from a table handle;
    * returns "" when the path has fewer than two separators. A table
    * directly under the filesystem root ("/db/t") resolves to "/" — not
    * "" — so its warehouse-scoped configs/ACLs keep resolving.
    */
  def warehouseOf(tablePath: String): String = {
    val p0 = tablePath.stripSuffix("/")
    val i = p0.lastIndexOf('/', p0.lastIndexOf('/') - 1)
    if (i > 0) p0.substring(0, i)
    else if (i == 0) "/"
    else ""
  }

  /** `child`'s path relative to `base` — both in the same rendering
    * convention (listings guarantee this); falls back to qualified
    * comparison for remote schemes with differing qualification.
    */
  def relativize(base: String, child: String): String = {
    val b = base.stripSuffix("/") + "/"
    if (child.startsWith(b)) child.substring(b.length)
    else {
      val qb = qualify(base).stripSuffix("/") + "/"
      val qc = qualify(child)
      require(qc.startsWith(qb), s"$child is not under $base")
      qc.substring(qb.length)
    }
  }
}
