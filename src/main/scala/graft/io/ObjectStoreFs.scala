package graft.io

/** The store layer's operations re-expressed for a NO-RENAME object
  * store (S3-class): every commit point becomes a CONDITIONAL PUT
  * instead of an atomic rename. [[HadoopStoreFs.publish]] documents the
  * two-rename window its replace path carries on filesystems without
  * overwrite-rename; THIS implementation closes that window by
  * construction — a single-key PUT is atomic on every real object store
  * (readers see the old object or the new one, never a torn or missing
  * one), and the conditional forms (If-None-Match / If-Match, now
  * first-class on S3) make the publish and journal-append commit points
  * safe against a concurrent writer too.
  *
  * The storage behind it is abstracted as [[BlobStore]] — four
  * operations every object store offers. The production adapter
  * implements them with real PUT/GET/LIST + conditional headers; the
  * spec suite drives the SAME [[ObjectStoreFs]] against an in-memory
  * double (StoreFsSpec/ObjectStorePublishSpec), so the commit-point
  * semantics asserted there are the adapter's contract, not an
  * implementation accident.
  *
  * Mapping of the seam's commit points:
  *  - `publish(tmp, dest, replace=false)` → put-if-absent of dest with
  *    tmp's bytes ([[BlobStore.putIf]] expected=None); a loser throws
  *    FileAlreadyExistsException like the rename impls;
  *  - `publish(tmp, dest, replace=true)` → compare-and-swap on dest's
  *    current content (etag stand-in) with bounded retries — readers
  *    NEVER observe dest absent, closing HadoopStoreFs's `.prev` window;
  *  - `appendLine` → CAS read-modify-write of the journal object — no
  *    rewrite-through-temp, no `.prev` aside, no torn-append window;
  *  - `durable` is inherent: a PUT that returned success is durable by
  *    the store's own contract.
  *
  * Directories don't exist on an object store: `mkdirs` is a no-op,
  * `list` is a prefix listing cut at the next '/', `exists` means "a
  * key, or any key under the prefix".
  */
trait BlobStore {
  /** Bytes of `key`, None when absent. */
  def get(key: String): Option[Array[Byte]]
  /** Conditional PUT: succeed iff the key's CURRENT content matches
    * `expected` (None = key must be absent — If-None-Match:*; Some(b) =
    * content/etag must equal b — If-Match). Atomic per key. */
  def putIf(key: String, bytes: Array[Byte],
      expected: Option[Array[Byte]]): Boolean
  def delete(key: String): Unit
  /** ALL keys with the given prefix (flat namespace). */
  def listPrefix(prefix: String): Seq[String]
}

final class ObjectStoreFs(store: BlobStore) extends StoreFs {
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def norm(p: String): String = p.stripSuffix("/")

  override def exists(p: String): Boolean = {
    val key = norm(p)
    store.get(key).isDefined || store.listPrefix(key + "/").nonEmpty
  }

  override def list(dir: String): Seq[String] = {
    val prefix = norm(dir) + "/"
    store.listPrefix(prefix)
      .map(_.substring(prefix.length).takeWhile(_ != '/'))
      .distinct
  }

  override def mkdirs(dir: String): Unit = () // no directories to make

  override def readString(p: String): String =
    new String(store.get(norm(p)).getOrElse(
      throw new java.io.FileNotFoundException(p)), Utf8)

  override def writeString(p: String, s: String): Unit = {
    // overwrite-write of a control file (NOT a commit point): plain
    // last-writer-wins PUT via a CAS loop, bounded like every other CAS
    // here — persistent condition failures mean a concurrent writer
    val key = norm(p)
    val bytes = s.getBytes(Utf8)
    casPut(key, bytes, s"write to $p")
  }

  /** Last-writer-wins PUT as a bounded CAS loop. */
  private def casPut(key: String, bytes: Array[Byte], what: String): Unit = {
    var tries = 0
    while (tries < 16) {
      tries += 1
      if (store.putIf(key, bytes, store.get(key))) return
    }
    throw new java.io.IOException(
      s"$what lost 16 straight CAS races — a concurrent writer is " +
        "violating the single-writer contract")
  }

  /** Journal append as one CAS read-modify-write — atomic, no torn
    * window, no `.prev` aside to fall back to. Bounded retries: losing
    * the race more than a few times means a second WRITER is live, which
    * the single-writer store contract forbids — fail loudly. */
  override def appendLine(p: String, line: String): Unit = {
    val key = norm(p)
    var tries = 0
    while (tries < 16) {
      tries += 1
      val cur = store.get(key)
      val next = cur.map(b => new String(b, Utf8)).getOrElse("") + line + "\n"
      if (store.putIf(key, next.getBytes(Utf8), cur)) return
    }
    throw new java.io.IOException(
      s"journal append to $p lost 16 straight CAS races — a concurrent " +
        "writer is violating the single-writer contract")
  }

  override def move(src: String, dest: String, replace: Boolean): Unit = {
    // object stores have no rename: copy-then-delete, key by key. NOT a
    // commit point (the seam's commit points are publish/appendLine);
    // housekeeping moves tolerate the non-atomicity.
    val s = norm(src)
    val d = norm(dest)
    if (!replace && exists(d))
      throw new java.nio.file.FileAlreadyExistsException(dest)
    if (replace) deleteRecursively(d)
    val keys = store.get(s).map(_ => Seq(s))
      .getOrElse(store.listPrefix(s + "/"))
    if (keys.isEmpty) throw new java.io.FileNotFoundException(src)
    keys.foreach { k =>
      val bytes = store.get(k).getOrElse(Array.emptyByteArray)
      val target = d + k.substring(s.length)
      casPut(target, bytes, s"move to $target")
      store.delete(k)
    }
  }

  override def deleteRecursively(p: String): Unit = {
    val key = norm(p)
    store.delete(key)
    store.listPrefix(key + "/").foreach(store.delete)
  }

  override def treeBytes(p: String): Long = {
    val key = norm(p)
    val direct = store.get(key).map(_.length.toLong).getOrElse(0L)
    direct + store.listPrefix(key + "/")
      .map(k => store.get(k).map(_.length.toLong).getOrElse(0L)).sum
  }

  /** THE commit point. Single-key PUTs are atomic on object stores, so
    * a replace-publish has NO missing-pointer window (the property
    * HadoopStoreFs approximates with its `.prev` aside); the conditional
    * forms additionally refuse a lost update against a racing writer. */
  override def publish(tmp: String, dest: String, durable: Boolean,
      replace: Boolean): Unit = {
    val src = norm(tmp)
    val d = norm(dest)
    val bytes = store.get(src).getOrElse(
      throw new java.io.FileNotFoundException(tmp))
    if (!replace) {
      if (!store.putIf(d, bytes, None))
        throw new java.nio.file.FileAlreadyExistsException(dest)
    } else {
      var tries = 0
      var done = false
      while (!done && tries < 16) {
        tries += 1
        done = store.putIf(d, bytes, store.get(d))
      }
      if (!done) throw new java.io.IOException(
        s"publish to $dest lost 16 straight CAS races — concurrent writer")
    }
    store.delete(src)
  }

  override def writeMarker(p: String, durable: Boolean): Unit =
    writeString(p, "")

  override def fileSize(p: String): Long =
    store.get(norm(p)).map(_.length.toLong).getOrElse(
      throw new java.io.FileNotFoundException(p))

  override def readAt(p: String, at: Long, len: Int): Array[Byte] = {
    val bytes = store.get(norm(p)).getOrElse(
      throw new java.io.FileNotFoundException(p))
    val from = math.min(at, bytes.length.toLong).toInt
    val to = math.min(from.toLong + len, bytes.length.toLong).toInt
    java.util.Arrays.copyOfRange(bytes, from, to)
  }
}
