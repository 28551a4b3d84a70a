package graft.io

import java.io.{FileNotFoundException, IOException}
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FSInputStream, FileStatus, FileSystem, Path, PathIsNotEmptyDirectoryException}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Hadoop `FileSystem` over a registered [[BlobStore]] — the bulk-IO half
  * of an object-store root. The engine's METADATA half (manifests,
  * journals, markers, spools) routes through [[ObjectStoreFs]] via
  * [[StoreFs.registerObjectScheme]]; this class serves the SAME store to
  * Spark's parquet reader/writer and the gate tier's parquet-mr
  * direct-append path, so one registered scheme (`graftmem://…` in the
  * specs) carries the whole deployment shape end-to-end: conditional-PUT
  * commit points for the seam, plain object GET/PUT/LIST for the data.
  *
  * Semantics mirror S3A's filesystem emulation: a flat key namespace;
  * directories are implicit (any key under the prefix) plus an explicit
  * marker set for freshly-mkdir'd empty dirs (JVM-local — the in-memory
  * double is single-JVM by nature); `rename` is server-side copy+delete
  * per key and moves INTO an existing destination directory like
  * FileSystem.rename does on HDFS; `create(overwrite=false)` is a real
  * put-if-absent, not a check-then-put.
  *
  * Wire-up: `spark.hadoop.fs.<scheme>.impl = graft.io.BlobFileSystem`
  * plus `StoreFs.registerObjectScheme(<scheme>, store)` before first use.
  */
final class BlobFileSystem extends FileSystem {
  private var fsUri: URI = _
  private var schemeAuth: String = _
  private var workDir: Path = _

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setConf(conf)
    fsUri = URI.create(
      uri.getScheme + "://" + Option(uri.getAuthority).getOrElse(""))
    schemeAuth = fsUri.toString
    // fail fast on an unregistered scheme…
    store
    workDir = new Path(schemeAuth + "/")
  }

  // …but re-resolve per operation: Hadoop's FileSystem cache outlives a
  // test-scoped registry entry, and an instance pinned to the OLD store
  // after unregister/re-register would split-brain against the seam
  private def store: BlobStore =
    StoreFs.objectStoreFor(fsUri.getScheme).getOrElse(
      throw new IOException(s"no BlobStore registered for scheme " +
        s"'${fsUri.getScheme}' — call StoreFs.registerObjectScheme first"))

  override def getUri: URI = fsUri
  override def getScheme: String = fsUri.getScheme
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }

  /** Flat-namespace key of `f` — scheme://authority + normalized path,
    * the SAME spelling [[ObjectStoreFs]] callers use as path strings. */
  private def keyOf(f: Path): String = {
    val p = makeQualified(f).toUri.getPath
    schemeAuth + (if (p == "/") "" else p.stripSuffix("/"))
  }

  private def dirs = BlobFileSystem.dirMarkers
    .computeIfAbsent(schemeAuth, _ => java.util.concurrent.ConcurrentHashMap
      .newKeySet[String]())

  private def isRoot(key: String): Boolean = key == schemeAuth

  private def fileStat(key: String): Option[BlobStat] = store.stat(key)
  private def isDir(key: String): Boolean =
    isRoot(key) || dirs.contains(key) ||
      store.listPrefix(key + "/").nonEmpty

  private def blockSize: Long = 32L * 1024 * 1024

  private def statusOf(f: Path): FileStatus = {
    val key = keyOf(f)
    fileStat(key) match {
      case Some(st) =>
        new FileStatus(st.size, false, 1, blockSize, 0L, makeQualified(f))
      case None if isDir(key) =>
        new FileStatus(0L, true, 1, blockSize, 0L, makeQualified(f))
      case None => throw new FileNotFoundException(f.toString)
    }
  }

  override def getFileStatus(f: Path): FileStatus = statusOf(f)

  override def exists(f: Path): Boolean = {
    val key = keyOf(f)
    fileStat(key).isDefined || isDir(key)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val key = keyOf(f)
    if (fileStat(key).isDefined) return Array(statusOf(f))
    if (!isDir(key)) throw new FileNotFoundException(f.toString)
    val prefix = key + "/"
    val fromKeys = store.listPrefix(prefix)
      .map(_.substring(prefix.length).takeWhile(_ != '/')).distinct
    val fromMarkers = {
      import scala.jdk.CollectionConverters._
      dirs.asScala.toSeq.filter(d => d.startsWith(prefix) &&
        !d.substring(prefix.length).contains('/'))
        .map(_.substring(prefix.length))
    }
    (fromKeys ++ fromMarkers).distinct.sorted
      .map(name => statusOf(new Path(f, name))).toArray
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    var p = makeQualified(f)
    while (p != null && keyOf(p) != schemeAuth) {
      if (fileStat(keyOf(p)).isDefined)
        throw new IOException(s"mkdirs: ${p} exists as a file")
      dirs.add(keyOf(p))
      p = p.getParent
    }
    true
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val key = keyOf(f)
    val st = fileStat(key).getOrElse(throw new FileNotFoundException(f.toString))
    new FSDataInputStream(new BlobSeekableInput(store, key, st.size))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, bs: Long,
      progress: Progressable): FSDataOutputStream = {
    val key = keyOf(f)
    if (isDir(key) && !isRoot(key) && store.listPrefix(key + "/").nonEmpty)
      throw new IOException(s"create: $f is a directory")
    // spool to a local temp FILE, then stream one conditional PUT on
    // close — heap stays O(stream buffer) however large the object (the
    // same disk-block spooling S3A's default output stream does; a
    // whole-object ByteArrayOutputStream here would be exactly the
    // driver-buffering hazard the round-18 BlobStore redesign removed
    // from the seam)
    val tmp = java.nio.file.Files.createTempFile("graft_blobfs", ".spool")
    val fileOut = java.nio.file.Files.newOutputStream(tmp)
    val out = new java.io.OutputStream {
      override def write(b: Int): Unit = fileOut.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        fileOut.write(b, off, len)
      override def close(): Unit = {
        fileOut.close()
        try {
          val len = java.nio.file.Files.size(tmp)
          val cond = if (overwrite) PutCond.Always else PutCond.IfAbsent
          val ok = store.put(key,
            () => java.nio.file.Files.newInputStream(tmp), len, cond)
          if (ok.isEmpty)
            throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
          dirs.remove(key)
          ()
        } finally { java.nio.file.Files.deleteIfExists(tmp); () }
      }
    }
    new FSDataOutputStream(out, statistics)
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(
      "append is not supported on an object store")

  override def rename(src: Path, dst: Path): Boolean = {
    val sKey = keyOf(src)
    // FileSystem.rename semantics: an existing DIRECTORY destination
    // receives src INSIDE it (how S3A/HDFS behave and what
    // FileOutputCommitter's merge pass relies on)
    val dKey0 = keyOf(dst)
    val dKey =
      if (fileStat(dKey0).isEmpty && isDir(dKey0) && !isRoot(dKey0))
        dKey0 + "/" + src.getName
      else dKey0
    // the into-dir adjustment can resolve BACK to the source (renaming
    // /a/x into /a): copy-to-self + delete would destroy the object —
    // report failure like HDFS does, touch nothing
    if (dKey == sKey) return false
    // an existing FILE destination fails the rename (HDFS/S3A contract —
    // what rename-based commit protocols use to detect a lost race);
    // silently overwriting would let two writers both believe they
    // committed
    if (fileStat(dKey).isDefined) return false
    if (fileStat(sKey).isDefined) {
      if (!store.copy(sKey, dKey)) return false
      store.delete(sKey)
      dirs.remove(dKey)
      true
    } else if (isDir(sKey)) {
      val prefix = sKey + "/"
      store.listPrefix(prefix).foreach { k =>
        if (store.copy(k, dKey + "/" + k.substring(prefix.length)))
          store.delete(k)
      }
      import scala.jdk.CollectionConverters._
      dirs.asScala.toSeq.filter(d => d == sKey || d.startsWith(prefix))
        .foreach { d =>
          dirs.add(dKey + d.substring(sKey.length))
          dirs.remove(d)
        }
      dirs.add(dKey)
      true
    } else false
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val key = keyOf(f)
    val file = fileStat(key).isDefined
    val dir = !file && isDir(key) && !isRoot(key)
    if (file) { store.delete(key); true }
    else if (dir) {
      val children = store.listPrefix(key + "/")
      if (!recursive && children.nonEmpty)
        throw new PathIsNotEmptyDirectoryException(f.toString)
      children.foreach(store.delete)
      import scala.jdk.CollectionConverters._
      dirs.asScala.toSeq.filter(d => d == key || d.startsWith(key + "/"))
        .foreach(dirs.remove)
      true
    } else isRoot(key) && {
      if (!recursive && store.listPrefix(key + "/").nonEmpty)
        throw new PathIsNotEmptyDirectoryException(f.toString)
      store.listPrefix(key + "/").foreach(store.delete)
      dirs.clear()
      true
    }
  }
}

object BlobFileSystem {
  /** Explicit (empty) directory markers per scheme://authority — what
    * mkdirs creates before any key exists under the prefix. JVM-local,
    * like the in-memory store the test double serves. */
  private[io] val dirMarkers = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap.KeySetView[String, java.lang.Boolean]]()

  /** Forget every dir marker of `scheme` (all authorities) — scheme
    * unregistration hygiene; see [[StoreFs.unregisterObjectScheme]]. */
  private[io] def dropMarkersFor(scheme: String): Unit = {
    dirMarkers.keySet.removeIf(_.startsWith(scheme + "://"))
    ()
  }
}

/** Seekable read stream over one blob: range-GETs on demand, positioned
  * reads without disturbing the seek cursor — the parquet footer/page
  * access pattern. */
private final class BlobSeekableInput(store: BlobStore, key: String,
    size: Long) extends FSInputStream {
  private var pos = 0L

  override def seek(p: Long): Unit = {
    if (p < 0 || p > size) throw new java.io.EOFException(
      s"seek($p) outside [0, $size] on $key")
    pos = p
  }
  override def getPos: Long = pos
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(): Int = {
    if (pos >= size) return -1
    val b = new Array[Byte](1)
    val n = read(b, 0, 1)
    if (n <= 0) -1 else b(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= size) return -1
    val n = math.min(len.toLong, size - pos)
    if (n <= 0) return 0
    val in = store.openRange(key, pos, n)
    val got = try in.readNBytes(b, off, n.toInt) finally in.close()
    pos += got
    got
  }

  override def read(position: Long, b: Array[Byte], off: Int, len: Int): Int = {
    if (position >= size) return -1
    val n = math.min(len.toLong, size - position)
    if (n <= 0) return 0
    val in = store.openRange(key, position, n)
    try in.readNBytes(b, off, n.toInt) finally in.close()
  }
}
