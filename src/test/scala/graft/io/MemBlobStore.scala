package graft.io

/** In-memory [[BlobStore]] double for the conditional-PUT object-store
  * contract tests: a flat key→bytes namespace whose `putIf` is atomic
  * per key (one lock — the stand-in for a real store's per-key
  * conditional PUT). Content equality plays the etag. Optional
  * fail-injection: `failPutsOnce(n)` makes the next n putIf calls
  * return false regardless of the condition, simulating lost CAS races
  * (a concurrent writer) for the bounded-retry assertions. */
final class MemBlobStore extends BlobStore {
  private val m = new java.util.HashMap[String, Array[Byte]]()
  private var failPuts = 0
  private var puts = 0L

  def failPutsOnce(n: Int): Unit = synchronized { failPuts = n }
  /** Successful conditional PUTs so far (contract-test telemetry). */
  def putCount: Long = synchronized(puts)

  override def get(key: String): Option[Array[Byte]] = synchronized {
    Option(m.get(key)).map(_.clone)
  }

  override def putIf(key: String, bytes: Array[Byte],
      expected: Option[Array[Byte]]): Boolean = synchronized {
    if (failPuts > 0) { failPuts -= 1; return false }
    val cur = Option(m.get(key))
    val ok = (expected, cur) match {
      case (None, None) => true
      case (Some(e), Some(c)) => java.util.Arrays.equals(e, c)
      case _ => false
    }
    if (ok) { m.put(key, bytes.clone); puts += 1 }
    ok
  }

  override def delete(key: String): Unit = synchronized { m.remove(key); () }

  override def listPrefix(prefix: String): Seq[String] = synchronized {
    import scala.jdk.CollectionConverters._
    m.keySet().asScala.filter(_.startsWith(prefix)).toSeq.sorted
  }
}
