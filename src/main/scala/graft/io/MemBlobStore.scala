package graft.io

/** The reference in-memory [[BlobStore]] implementation — what the
  * object-store contract tests AND the driver-oracle object-root fixture
  * ([[graft.queries.CvQueries]] q_cv_object_restart) run the seam
  * against: a flat key→(bytes, etag) namespace whose `put` is atomic per
  * key (one lock — the stand-in for a real store's per-key conditional
  * PUT). Etags are per-key version counters, opaque to the caller like a
  * real store's. Single-JVM by nature; a cluster deployment registers a
  * real S3-class adapter instead. Optional fail-injection:
  * `failPutsOnce(n)` makes the next n put calls fail their condition
  * regardless, simulating lost CAS races (a concurrent writer) for the
  * bounded-retry assertions. */
final class MemBlobStore extends BlobStore {
  private val m = new java.util.HashMap[String, (Array[Byte], String)]()
  private var failPuts = 0
  private var puts = 0L
  private var vers = 0L

  def failPutsOnce(n: Int): Unit = synchronized { failPuts = n }
  /** Successful conditional PUTs so far (contract-test telemetry). */
  def putCount: Long = synchronized(puts)

  override def stat(key: String): Option[BlobStat] = synchronized {
    Option(m.get(key)).map { case (b, e) => BlobStat(b.length.toLong, e) }
  }

  override def openRange(key: String, at: Long, len: Long): java.io.InputStream =
    synchronized {
      val (bytes, _) = Option(m.get(key)).getOrElse(
        throw new java.io.FileNotFoundException(key))
      val from = math.min(at, bytes.length.toLong).toInt
      val to = math.min(from + len, bytes.length.toLong).toInt
      new java.io.ByteArrayInputStream(
        java.util.Arrays.copyOfRange(bytes, from, to))
    }

  override def put(key: String, data: () => java.io.InputStream, len: Long,
      cond: PutCond): Option[String] = {
    // the stream is consumed OUTSIDE the lock (a real adapter uploads
    // before/while the store applies the condition; the condition check +
    // install below is the atomic part)
    val in = data()
    val bytes = try in.readAllBytes() finally in.close()
    require(bytes.length.toLong == len,
      s"put($key): declared len $len but stream had ${bytes.length}")
    synchronized {
      if (failPuts > 0) { failPuts -= 1; return None }
      val cur = Option(m.get(key))
      val ok = cond match {
        case PutCond.Always => true
        case PutCond.IfAbsent => cur.isEmpty
        case PutCond.IfMatch(e) => cur.exists(_._2 == e)
      }
      if (!ok) None
      else {
        vers += 1
        val etag = s"v$vers"
        m.put(key, (bytes, etag))
        puts += 1
        Some(etag)
      }
    }
  }

  override def copy(srcKey: String, destKey: String): Boolean = synchronized {
    Option(m.get(srcKey)) match {
      case None => false
      case Some((b, _)) =>
        vers += 1
        m.put(destKey, (b, s"v$vers"))
        true
    }
  }

  override def delete(key: String): Unit = synchronized { m.remove(key); () }

  override def listPrefix(prefix: String): Seq[String] = synchronized {
    import scala.jdk.CollectionConverters._
    m.keySet().asScala.filter(_.startsWith(prefix)).toSeq.sorted
  }
}
