package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Scheme-portable filesystem operations for the engine's STORE layer —
  * the listing/metadata/small-file half that [[CommitFs]]'s doc comment
  * names as its non-goal. Paths are plain STRINGS: a scheme-less root
  * ("/tmp/x") runs on java.nio exactly as before, while a URI root
  * ("file:/tmp/x", "hdfs://…", "s3a://…") routes every operation through
  * the Hadoop `FileSystem` API — the same abstraction Spark itself reads
  * and writes bulk parquet through, so one root string drives both the
  * job-level IO and the engine's own metadata.
  *
  * What goes through here: manifest read/publish, catalog journal
  * append, directory listings (version dirs, bucket dirs, footer-prune
  * candidates), recursive deletes, tree sizing, renames, tick marks —
  * for the CV store tier (round 16), the gate tier's stores, spools, and
  * geometry/owner stamps (round 17), and the BM25 index's generation
  * markers (round 17). What does NOT: bulk DataFrame reads/writes
  * (`spark.read.parquet` is already URI-capable; GateStore.appendLocal
  * writes parquet-mr through the Hadoop Path API, URI-capable too) and
  * executor-LOCAL shard scratch, which is node-local by design.
  *
  * Commit-point semantics per implementation mirror [[CommitFs]]:
  * local = atomic rename (+fsync for durable); Hadoop `file://` =
  * FileSystem.rename (atomic on RawLocal/HDFS); a replace-publish on a
  * no-rename object store becomes a conditional PUT — the
  * [[HadoopStoreFs.publish]] replace path documents its delete+rename
  * window, which HDFS deployments close with FileContext overwrite
  * rename and object stores close with conditional PUT.
  */
trait StoreFs {
  def exists(p: String): Boolean
  /** Child NAMES of a directory; empty when absent or not a dir. */
  def list(dir: String): Seq[String]
  def mkdirs(dir: String): Unit
  def readString(p: String): String
  /** Overwrite-write of a small control file (NOT a commit point). */
  def writeString(p: String, s: String): Unit
  /** Append one line to a journal file, creating it if absent. */
  def appendLine(p: String, line: String): Unit
  /** Housekeeping move (dir or file); atomic where the fs can. */
  def move(src: String, dest: String, replace: Boolean = false): Unit
  def deleteRecursively(p: String): Unit
  /** Total bytes of regular files under `p` (0 when absent). */
  def treeBytes(p: String): Long
  /** Atomically publish fully-written `tmp` as `dest` (THE commit point
    * for a manifest/marker swap). See [[CommitFs.publish]]. */
  def publish(tmp: String, dest: String, durable: Boolean,
      replace: Boolean = false): Unit
  /** Drop an empty marker file (`durable` fsyncs file + dirent where the
    * fs can — object/cluster stores make create-close the durability
    * point). */
  def writeMarker(p: String, durable: Boolean): Unit
  /** Size of a regular file; throws (NoSuchFile/FileNotFound) if absent. */
  def fileSize(p: String): Long
  /** Up to `len` bytes of `p` starting at `at` (shorter at EOF). */
  def readAt(p: String, at: Long, len: Int): Array[Byte]
}

object StoreFs {
  private val schemeRe = "^[a-zA-Z][a-zA-Z0-9+.-]*:".r

  /** Does this root select the Hadoop path? (A scheme prefix that is not
    * a plain absolute/relative OS path.) */
  def hasScheme(root: String): Boolean =
    !root.startsWith("/") && !root.startsWith(".") &&
      schemeRe.findPrefixOf(root).isDefined

  private val hadoopCache =
    new java.util.concurrent.ConcurrentHashMap[String, HadoopStoreFs]()

  // ---- object-store scheme registry (round 18) --------------------------
  // Opt-in routing: a scheme registered here serves its roots through
  // [[ObjectStoreFs]] (conditional-PUT commit points, segmented journals)
  // instead of the rename-emulating Hadoop path. Unregistered schemes keep
  // the Hadoop default — an `s3a://` deployment without a BlobStore
  // adapter still works through S3A's rename emulation with the documented
  // `.prev` windows. One ObjectStoreFs instance per scheme (its journal
  // next-seq cache is per-instance). [[BlobFileSystem]] resolves the SAME
  // registry so Spark's bulk parquet IO on a registered root sees the
  // same bytes the seam writes.
  private val objectSchemes =
    new java.util.concurrent.ConcurrentHashMap[String, ObjectStoreFs]()
  private val objectStores =
    new java.util.concurrent.ConcurrentHashMap[String, BlobStore]()

  /** Route every root with this URI scheme through [[ObjectStoreFs]] over
    * `store`. JVM-local (executors in forked JVMs must register too —
    * the in-memory test double is inherently single-JVM). */
  def registerObjectScheme(scheme: String, store: BlobStore): Unit = {
    objectStores.put(scheme, store)
    objectSchemes.put(scheme, new ObjectStoreFs(store))
    ()
  }

  /** Undo [[registerObjectScheme]] (spec teardown). Also drops the
    * [[BlobFileSystem]] dir markers of the scheme — a later
    * re-registration with a fresh store must not inherit phantom
    * directories (Hadoop-cached BlobFileSystem instances re-resolve the
    * store per operation, so they follow the registry either way). */
  def unregisterObjectScheme(scheme: String): Unit = {
    objectStores.remove(scheme)
    objectSchemes.remove(scheme)
    BlobFileSystem.dropMarkersFor(scheme)
    ()
  }

  /** The registered [[BlobStore]] behind `scheme`, if any — what
    * [[BlobFileSystem]] resolves its backing store from. */
  def objectStoreFor(scheme: String): Option[BlobStore] =
    Option(objectStores.get(scheme))

  /** The implementation serving `root` — java.nio for plain paths, a
    * registered [[ObjectStoreFs]] for opt-in object-store schemes, else a
    * (cached per scheme+authority) Hadoop FileSystem for URI roots. */
  def forRoot(root: String): StoreFs =
    if (!hasScheme(root)) LocalStoreFs
    else {
      val uri = java.net.URI.create(root)
      val obj = objectSchemes.get(uri.getScheme)
      if (obj != null) obj
      else {
        val key = uri.getScheme + "://" + Option(uri.getAuthority).getOrElse("")
        hadoopCache.computeIfAbsent(key, _ => new HadoopStoreFs(uri))
      }
    }
}

/** java.nio implementation — byte-for-byte the operations the store layer
  * ran before the seam existed; commit points delegate to [[LocalCommitFs]]. */
object LocalStoreFs extends StoreFs {
  override def exists(p: String): Boolean = Files.exists(Paths.get(p))

  override def list(dir: String): Seq[String] = {
    val d = Paths.get(dir).toFile
    Option(d.list()).map(_.toSeq).getOrElse(Nil)
  }

  override def mkdirs(dir: String): Unit = {
    Files.createDirectories(Paths.get(dir)); ()
  }

  override def readString(p: String): String = Files.readString(Paths.get(p))

  override def writeString(p: String, s: String): Unit = {
    Files.writeString(Paths.get(p), s); ()
  }

  override def appendLine(p: String, line: String): Unit = {
    Files.writeString(Paths.get(p), line + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    ()
  }

  override def move(src: String, dest: String, replace: Boolean): Unit = {
    // non-replace refuses an EXISTING dest explicitly: POSIX rename(2)
    // silently replaces an empty directory target, which would mask a
    // name collision during ALTER … RENAME — and the Hadoop impl must
    // refuse anyway (FileSystem.rename would nest src inside a dest dir),
    // so both impls converge on the loud failure
    if (!replace && Files.exists(Paths.get(dest)))
      throw new java.nio.file.FileAlreadyExistsException(dest)
    val opts =
      if (replace) Seq(StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      else Seq(StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(src), Paths.get(dest), opts: _*)
    ()
  }

  override def deleteRecursively(p: String): Unit = {
    val path = Paths.get(p)
    if (Files.exists(path))
      Files.walk(path).iterator().asScala.toSeq.reverse
        .foreach(q => { Files.deleteIfExists(q); () })
  }

  override def treeBytes(p: String): Long = {
    val path = Paths.get(p)
    if (!Files.exists(path)) 0L
    else Files.walk(path).iterator().asScala
      .filter(Files.isRegularFile(_)).map(Files.size).sum
  }

  override def publish(tmp: String, dest: String, durable: Boolean,
      replace: Boolean): Unit = {
    // non-replace publish REFUSES an existing destination (rename(2)
    // silently replaces a file) — put-if-absent semantics, matching the
    // Hadoop and object-store impls; every non-replace commit point
    // (generation markers, batch appends) allocates fresh names, so a
    // hit here is a protocol violation worth a loud error
    if (!replace && Files.exists(Paths.get(dest)))
      throw new java.nio.file.FileAlreadyExistsException(dest)
    CommitFs.current.publish(Paths.get(tmp), Paths.get(dest),
      durable = durable, replace = replace)
  }

  override def writeMarker(p: String, durable: Boolean): Unit =
    CommitFs.current.writeMarker(Paths.get(p), durable = durable)

  override def fileSize(p: String): Long = Files.size(Paths.get(p))

  override def readAt(p: String, at: Long, len: Int): Array[Byte] = {
    val ch = java.nio.channels.FileChannel.open(Paths.get(p),
      java.nio.file.StandardOpenOption.READ)
    try {
      val b = java.nio.ByteBuffer.allocate(len)
      var off = at
      var eof = false
      while (b.hasRemaining && !eof) {
        val n = ch.read(b, off)
        if (n < 0) eof = true else off += n
      }
      java.util.Arrays.copyOf(b.array(), b.position())
    } finally ch.close()
  }
}

/** Hadoop `FileSystem` implementation — what a `file://`-scheme root
  * (RawLocalFileSystem in the specs) or a cluster deployment
  * (`hdfs://`, `s3a://`) runs the store layer through. One private
  * FileSystem instance per (scheme, authority); checksum side-files are
  * disabled so listings stay name-clean on the checksummed local fs. */
final class HadoopStoreFs(rootUri: java.net.URI) extends StoreFs {
  import org.apache.hadoop.fs.{FileSystem, Path => HPath}

  private val fs: FileSystem = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val f = FileSystem.newInstance(rootUri, conf)
    try f.setWriteChecksum(false) catch { case _: Throwable => () }
    try f.setVerifyChecksum(false) catch { case _: Throwable => () }
    f
  }

  override def exists(p: String): Boolean = fs.exists(new HPath(p))

  override def list(dir: String): Seq[String] = {
    val d = new HPath(dir)
    if (!fs.exists(d)) Nil
    else
      try fs.listStatus(d).toSeq.map(_.getPath.getName)
      catch { case _: java.io.FileNotFoundException => Nil }
  }

  override def mkdirs(dir: String): Unit = { fs.mkdirs(new HPath(dir)); () }

  override def readString(p: String): String = {
    val in = fs.open(new HPath(p))
    try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 4096, false)
      new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  override def writeString(p: String, s: String): Unit = {
    val out = fs.create(new HPath(p), true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Journal append. `FileSystem.append` is unsupported on several
    * implementations (raw local included in some releases, object stores
    * always) — fall back to read + rewrite-through-temp + atomic publish:
    * the journal is small control metadata, correctness over efficiency.
    * The rewrite path reads the prior content from the live file OR its
    * `.prev` aside (a crash between a previous rewrite's two renames
    * leaves only the aside — see [[publish]]), so an interrupted append
    * SELF-REPAIRS instead of silently truncating the journal to one line. */
  // test seam: pretend this FileSystem refuses append() (object stores,
  // checksum-wrapped local in some releases) so specs can drive the
  // rewrite-publish path and its crash window on any box
  private[graft] var forceAppendFallback: Boolean = false

  override def appendLine(p: String, line: String): Unit = {
    val path = new HPath(p)
    val appended = !forceAppendFallback &&
      (try {
        val out = fs.append(path)
        try out.write((line + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch { case _: Throwable => false })
    if (!appended) {
      val prior =
        if (fs.exists(path)) readString(p)
        else if (fs.exists(new HPath(p + ".prev"))) readString(p + ".prev")
        else ""
      val tmp = p + ".tmp"
      writeString(tmp, prior + line + "\n")
      publish(tmp, p, durable = false, replace = true)
    }
  }

  override def move(src: String, dest: String, replace: Boolean): Unit = {
    val d = new HPath(dest)
    if (replace && fs.exists(d)) { fs.delete(d, true); () }
    else if (!replace && fs.exists(d))
      // FileSystem.rename onto an EXISTING DIRECTORY moves src INSIDE it
      // (returns true) on HDFS/RawLocal — a leftover dir at the target
      // would silently nest the tree instead of failing like java.nio
      // ATOMIC_MOVE does; match LocalStoreFs semantics loudly
      throw new java.nio.file.FileAlreadyExistsException(dest)
    if (!fs.rename(new HPath(src), d))
      throw new java.io.IOException(s"rename $src -> $dest failed")
  }

  override def deleteRecursively(p: String): Unit = {
    val path = new HPath(p)
    if (fs.exists(path)) { fs.delete(path, true); () }
  }

  override def treeBytes(p: String): Long = {
    val path = new HPath(p)
    if (!fs.exists(path)) 0L
    else fs.getContentSummary(path).getLength
  }

  // test seam: throw after the aside-rename, before the tmp-rename —
  // the replace-publish crash window readers must survive
  private[graft] var failBetweenRenames: Boolean = false

  /** `durable` is best-effort here; `FileSystem.rename` has no overwrite
    * flag, so a replace-publish runs TWO renames: dest → dest.prev
    * (aside), tmp → dest, then the aside is deleted. A crash between the
    * renames leaves no current pointer but a consistent PREVIOUS one at
    * `<dest>.prev` — readers that fall back to it (StateStore
    * .readManifest does) see the pre-publish state instead of an
    * empty-store amnesia, which is the correct loss class for an
    * uncommitted publish. HDFS deployments can close the window entirely
    * with FileContext overwrite-rename; object stores with a conditional
    * PUT (the [[CommitFs]] S3 notes). */
  override def publish(tmp: String, dest: String, durable: Boolean,
      replace: Boolean): Unit = {
    val d = new HPath(dest)
    if (replace && fs.exists(d)) {
      val aside = new HPath(dest + ".prev")
      if (fs.exists(aside)) { fs.delete(aside, true); () }
      if (!fs.rename(d, aside))
        throw new java.io.IOException(s"aside rename $dest failed")
      if (failBetweenRenames) {
        failBetweenRenames = false
        throw new java.io.IOException("failpoint: between publish renames")
      }
      if (!fs.rename(new HPath(tmp), d))
        throw new java.io.IOException(s"publish rename $tmp -> $dest failed")
      fs.delete(aside, true)
      ()
    } else move(tmp, dest, replace)
  }

  override def writeMarker(p: String, durable: Boolean): Unit = {
    // create-close IS the durability point on cluster/object stores
    fs.create(new HPath(p), true).close()
  }

  override def fileSize(p: String): Long =
    fs.getFileStatus(new HPath(p)).getLen // absent → FileNotFoundException

  override def readAt(p: String, at: Long, len: Int): Array[Byte] = {
    // no extra getFileStatus round trip: seek + read loop to EOF (a seek
    // past EOF surfaces as EOF on read, not an error, on the FS impls
    // this serves — and the caller sized `at` from fileSize anyway)
    val in = fs.open(new HPath(p))
    try {
      val buf = new Array[Byte](len)
      var off = 0
      try {
        in.seek(at)
        var n = 0
        while (off < len && n >= 0) {
          n = in.read(buf, off, len - off)
          if (n > 0) off += n
        }
      } catch { case _: java.io.EOFException => () }
      java.util.Arrays.copyOf(buf, off)
    } finally in.close()
  }
}
