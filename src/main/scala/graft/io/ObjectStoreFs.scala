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
  * The storage behind it is abstracted as [[BlobStore]] — the operation
  * set every object store offers, in the ETAG/STREAMING forms a real
  * adapter needs (round 18; the round-17 contract CAS-compared full byte
  * arrays and buffered whole objects on the driver — fine for markers,
  * a heap hazard the day a compaction shard routes through it):
  *  - `stat` = HEAD (size + opaque etag), `openRange` = ranged GET —
  *    so `fileSize`/`readAt` (the spool magic check) cost two small
  *    range reads, never a whole-object fetch;
  *  - `put` takes an InputStream SUPPLIER + a [[PutCond]] — data-sized
  *    objects stream through without materializing driver-side, and the
  *    conditional compare is the store's etag, not a byte re-read;
  *  - `copy` = server-side CopyObject, so `move` never pulls bytes
  *    through the driver at all.
  * The spec suite drives the SAME [[ObjectStoreFs]] against an
  * in-memory double (StoreFsSpec/ObjectStorePublishSpec), so the
  * commit-point semantics asserted there are the adapter's contract,
  * not an implementation accident.
  *
  * Mapping of the seam's commit points:
  *  - `publish(tmp, dest, replace=false)` → put-if-absent of dest
  *    streaming tmp's bytes ([[PutCond.IfAbsent]]); a loser throws
  *    FileAlreadyExistsException like the rename impls;
  *  - `publish(tmp, dest, replace=true)` → etag compare-and-swap on
  *    dest with bounded retries — readers NEVER observe dest absent,
  *    closing HadoopStoreFs's `.prev` window;
  *  - `appendLine` → SEGMENTED journal: each append is a put-if-absent
  *    of a fresh sequence-numbered segment object under `<p>/` (readers
  *    concatenate) — O(line) bytes per append instead of the round-17
  *    whole-journal rewrite (O(journal²) cumulative over a catalog's
  *    life), still atomic, no torn-append window, no `.prev` aside;
  *  - `durable` is inherent: a PUT that returned success is durable by
  *    the store's own contract.
  *
  * Directories don't exist on an object store: `mkdirs` is a no-op,
  * `list` is a prefix listing cut at the next '/', `exists` means "a
  * key, or any key under the prefix".
  */
final case class BlobStat(size: Long, etag: String)

/** Precondition of a conditional PUT — the three forms S3-class stores
  * offer natively. */
sealed trait PutCond
object PutCond {
  /** If-None-Match:* — succeed only when the key is absent. */
  case object IfAbsent extends PutCond
  /** If-Match — succeed only when the key's CURRENT etag equals `etag`. */
  final case class IfMatch(etag: String) extends PutCond
  /** Unconditional last-writer-wins PUT. */
  case object Always extends PutCond
}

trait BlobStore {
  /** Size + opaque etag of `key` (HEAD), None when absent. */
  def stat(key: String): Option[BlobStat]
  /** Stream over bytes [at, at+len) of `key` (shorter at EOF; the
    * caller closes it). FileNotFoundException when absent. */
  def openRange(key: String, at: Long, len: Long): java.io.InputStream
  /** Conditional streaming PUT: atomic per key; returns the new etag on
    * success, None when the condition failed. `data` may be invoked
    * more than once (adapter-internal retry). */
  def put(key: String, data: () => java.io.InputStream, len: Long,
      cond: PutCond): Option[String]
  /** Server-side copy (CopyObject): last-writer-wins on `destKey`;
    * false when `srcKey` is absent. */
  def copy(srcKey: String, destKey: String): Boolean
  def delete(key: String): Unit
  /** ALL keys with the given prefix (flat namespace), sorted. */
  def listPrefix(prefix: String): Seq[String]

  // convenience forms on the primitive ops; adapters with a cheaper
  // native call (single-round-trip GET) may override
  def get(key: String): Option[Array[Byte]] = stat(key).map { st =>
    val in = openRange(key, 0L, st.size)
    try in.readAllBytes() finally in.close()
  }
  def putBytes(key: String, bytes: Array[Byte],
      cond: PutCond): Option[String] =
    put(key, () => new java.io.ByteArrayInputStream(bytes),
      bytes.length.toLong, cond)
}

final class ObjectStoreFs(store: BlobStore) extends StoreFs {
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def norm(p: String): String = p.stripSuffix("/")

  // ---- segmented journal layout -----------------------------------------
  // appendLine(p) allocates `<p>/<%020d seq>` via put-if-absent; readers
  // concatenate the (lexicographically == numerically sorted) segments
  // after any legacy direct object at `p`. A 20-digit zero-padded name is
  // unambiguous: nothing else under the seam writes all-digit child names.
  private def isSegName(name: String): Boolean =
    name.length == 20 && name.forall(_.isDigit)
  private def segKeys(key: String): Seq[String] = {
    val pre = key + "/"
    store.listPrefix(pre)
      .filter(k => isSegName(k.substring(pre.length)))
      .sorted
  }
  // next-seq cache per journal (single-writer fast path: one putIf per
  // append, no listing); a lost race or fresh process re-lists
  private val nextSeq =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def tailSeq(key: String): Long = {
    val pre = key + "/"
    segKeys(key).lastOption
      .map(k => k.substring(pre.length).toLong + 1L).getOrElse(0L)
  }

  override def exists(p: String): Boolean = {
    val key = norm(p)
    store.stat(key).isDefined || store.listPrefix(key + "/").nonEmpty
  }

  override def list(dir: String): Seq[String] = {
    val prefix = norm(dir) + "/"
    store.listPrefix(prefix)
      .map(_.substring(prefix.length).takeWhile(_ != '/'))
      .distinct
  }

  override def mkdirs(dir: String): Unit = () // no directories to make

  override def readString(p: String): String = {
    val key = norm(p)
    val direct = store.get(key).map(new String(_, Utf8))
    val segs = segKeys(key)
    if (direct.isEmpty && segs.isEmpty)
      throw new java.io.FileNotFoundException(p)
    direct.getOrElse("") +
      segs.map(k => new String(store.get(k).getOrElse(Array.emptyByteArray),
        Utf8)).mkString
  }

  override def writeString(p: String, s: String): Unit = {
    // overwrite-write of a control file (NOT a commit point): plain
    // last-writer-wins PUT; journal segments of a previous incarnation
    // are dropped so overwrite semantics hold for appendLine-built
    // files. ORDER matters for concurrent readers: segments delete
    // HIGHEST-seq first, THEN the direct object lands — every
    // intermediate readString observes (old direct + a seq-PREFIX of
    // segments), i.e. a state the journal actually passed through, never
    // a new-content/stale-tail splice (deleting after the PUT produced
    // exactly that).
    val key = norm(p)
    val segs = segKeys(key)
    segs.sorted(Ordering[String].reverse).foreach(store.delete)
    if (segs.nonEmpty) nextSeq.remove(key)
    store.putBytes(key, s.getBytes(Utf8), PutCond.Always).getOrElse(
      throw new java.io.IOException(s"unconditional put to $p failed"))
    ()
  }

  /** Journal append: put-if-absent of one fresh sequence-numbered
    * segment — O(line) bytes, atomic, no torn window, no `.prev` aside.
    * Losing the allocation race more than a few times means a second
    * WRITER is live, which the single-writer store contract forbids —
    * fail loudly. */
  // same-PROCESS concurrent appenders are legal (one engine, many
  // threads) and serialize on a per-journal monitor — racing them through
  // the store's conditional PUT would starve whoever pays the listing
  // round trip. The bounded CAS below then only ever loses to a second
  // PROCESS, which the single-writer store contract forbids.
  private val journalLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  override def appendLine(p: String, line: String): Unit = {
    val key = norm(p)
    val bytes = (line + "\n").getBytes(Utf8)
    val lock = journalLocks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      var seq = Option(nextSeq.get(key)).map(_.longValue)
        .getOrElse(tailSeq(key))
      var tries = 0
      while (tries < 16) {
        tries += 1
        if (store.putBytes(f"$key%s/$seq%020d", bytes,
            PutCond.IfAbsent).isDefined) {
          nextSeq.put(key, seq + 1L)
          return
        }
        seq = tailSeq(key) // a FOREIGN writer took the slot: re-list
      }
      throw new java.io.IOException(
        s"journal append to $p lost 16 straight allocation races — a " +
          "concurrent writer is violating the single-writer contract")
    }
  }

  override def move(src: String, dest: String, replace: Boolean): Unit = {
    // object stores have no rename: server-side copy then delete, key by
    // key. NOT a commit point (the seam's commit points are
    // publish/appendLine); housekeeping moves tolerate the non-atomicity.
    val s = norm(src)
    val d = norm(dest)
    if (!replace && exists(d))
      throw new java.nio.file.FileAlreadyExistsException(dest)
    if (replace) deleteRecursively(d)
    val keys = store.stat(s).map(_ => Seq(s))
      .getOrElse(store.listPrefix(s + "/"))
    if (keys.isEmpty) throw new java.io.FileNotFoundException(src)
    keys.foreach { k =>
      // a key that vanished mid-move (concurrent housekeeping drop) is
      // SKIPPED — copying nothing, publishing nothing: resurrecting an
      // empty object at the destination would be silent corruption
      if (store.copy(k, d + k.substring(s.length))) store.delete(k)
    }
  }

  override def deleteRecursively(p: String): Unit = {
    val key = norm(p)
    store.delete(key)
    store.listPrefix(key + "/").foreach(store.delete)
    nextSeq.remove(key)
    ()
  }

  override def treeBytes(p: String): Long = {
    val key = norm(p)
    val direct = store.stat(key).map(_.size).getOrElse(0L)
    direct + store.listPrefix(key + "/")
      .map(k => store.stat(k).map(_.size).getOrElse(0L)).sum
  }

  /** THE commit point. Single-key PUTs are atomic on object stores, so
    * a replace-publish has NO missing-pointer window (the property
    * HadoopStoreFs approximates with its `.prev` aside); the conditional
    * forms additionally refuse a lost update against a racing writer.
    * The bytes STREAM from the source object — nothing buffers
    * driver-side regardless of object size. */
  override def publish(tmp: String, dest: String, durable: Boolean,
      replace: Boolean): Unit = {
    val src = norm(tmp)
    val d = norm(dest)
    val st = store.stat(src).getOrElse(
      throw new java.io.FileNotFoundException(tmp))
    def data() = store.openRange(src, 0L, st.size)
    if (!replace) {
      if (store.put(d, data _, st.size, PutCond.IfAbsent).isEmpty)
        throw new java.nio.file.FileAlreadyExistsException(dest)
    } else {
      var tries = 0
      var done = false
      while (!done && tries < 16) {
        tries += 1
        val cond = store.stat(d).map(c => PutCond.IfMatch(c.etag))
          .getOrElse(PutCond.IfAbsent)
        done = store.put(d, data _, st.size, cond).isDefined
      }
      if (!done) throw new java.io.IOException(
        s"publish to $dest lost 16 straight CAS races — concurrent writer")
    }
    store.delete(src)
  }

  override def writeMarker(p: String, durable: Boolean): Unit =
    writeString(p, "")

  /** Size of the direct object PLUS any [[appendLine]] segments —
    * always matching what [[readString]] returns (a legacy direct
    * journal later appended to has both). */
  override def fileSize(p: String): Long = {
    val key = norm(p)
    val direct = store.stat(key).map(_.size)
    val segs = segKeys(key)
    if (direct.isEmpty && segs.isEmpty)
      throw new java.io.FileNotFoundException(p)
    direct.getOrElse(0L) +
      segs.map(k => store.stat(k).map(_.size).getOrElse(0L)).sum
  }

  /** Ranged read of a DIRECT object (the spool magic check's shape) —
    * one range GET, never a whole-object fetch. Segmented journals are
    * read through [[readString]]; byte-offset access doesn't apply. */
  override def readAt(p: String, at: Long, len: Int): Array[Byte] = {
    val key = norm(p)
    val st = store.stat(key).getOrElse(
      throw new java.io.FileNotFoundException(p))
    val from = math.min(at, st.size)
    val n = math.min(len.toLong, st.size - from)
    if (n <= 0) return Array.emptyByteArray
    val in = store.openRange(key, from, n)
    try in.readAllBytes() finally in.close()
  }
}
