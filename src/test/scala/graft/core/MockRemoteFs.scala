package graft.core

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A NON-local Hadoop scheme backed by the local disk: `mockfs://test/x`
  * maps to local `/x`, but because the scheme is not `file:`, every
  * [[WarehouseIO]] operation takes the REMOTE branch — FileSystem-based
  * listings, `create(overwrite=false)` locks, the FileContext/
  * delete+rename publish path. This is how the hdfs/s3a code path gets
  * an end-to-end test without a cluster.
  */
class MockRemoteFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mockfs://test")
  override def getScheme: String = "mockfs"
  // RawLocalFileSystem resolves paths via toUri.getPath, so the
  // authority is carried but ignored — exactly what we want. Qualified
  // rendering keeps the mockfs://test prefix.
  override def makeQualified(path: Path): Path = {
    val q = super.makeQualified(path)
    if (q.toUri.getScheme == "mockfs") q
    else new Path("mockfs://test" + q.toUri.getPath)
  }

  // RawLocal's DeprecatedRawLocalFileStatus loads permissions LAZILY via
  // `new File(uri)`, which requires a file: URI — it explodes on mockfs
  // paths (and is also the per-entry overhead that motivated
  // WarehouseIO's local nio fast path). Return plain FileStatus with
  // default permissions instead.
  private def strip(st: org.apache.hadoop.fs.FileStatus): org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(st.getLen, st.isDirectory, 1,
      st.getBlockSize, st.getModificationTime, makeQualified(st.getPath))

  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    strip(super.getFileStatus(f))

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(strip)
}
