package graft.sketch

import java.nio.ByteBuffer
import scala.collection.mutable

/** Filtered-Space-Saving top-k (Homem & Carvalho, public; the reference's
  * FSS — /root/reference/src/fss.c, include/fss.h:57-68): m = 3k monitored
  * slots plus h = 6m per-bucket `alpha` counters holding the unmonitored /
  * evicted mass. Each monitored element carries (count, error): count is an
  * upper bound, count−error a lower bound on true frequency.
  *
  * The alpha filter is what distinguishes FSS from classic SpaceSaving
  * (fss.c:358-402): an unmonitored arrival only displaces the minimum
  * element once its bucket has accumulated enough mass
  * (alpha + w ≥ min frequency); otherwise the weight accrues to the bucket
  * counter. An evicted element's frequency is written back to ITS bucket's
  * alpha, so evicted mass is never dropped — and merges sum the alpha
  * arrays alongside the monitored lists (FSSMerge, fss.c:472-493), keeping
  * counts partition-independent for elements monitored on every shard.
  *
  * Values are stored as canonical bytes (Hashing.bytesOf) so the sketch is
  * type-agnostic; [[topK]] returns them as (bytes, count, error) and the
  * aggregate layer re-decodes using the column type.
  */
final class SpaceSaving private (
    val k: Int, val capacity: Int, val numBuckets: Int) extends Serializable {

  import SpaceSaving.Key

  private val counts = mutable.LinkedHashMap.empty[Key, (Long, Long)] // key -> (count, error)
  private[sketch] val alpha = new Array[Long](numBuckets)

  def size: Int = counts.size

  private def bucketOf(key: Key): Int = {
    val h = Hashing.hash64(key.bytes, SpaceSaving.HashSeed)
    ((h % numBuckets).toInt + numBuckets) % numBuckets
  }

  def add(value: Any, weight: Long = 1L): Unit = addBytes(Hashing.bytesOf(value), weight)

  private def addBytes(bytes: Array[Byte], weight: Long): Unit = {
    val key = Key(bytes)
    counts.get(key) match {
      case Some((c, e)) => counts(key) = (c + weight, e)
      case None =>
        val b = bucketOf(key)
        if (counts.size < capacity) {
          // enter seeded with the bucket's accumulated unmonitored mass
          counts(key) = (alpha(b) + weight, alpha(b))
        } else {
          val (minKey, (minC, _)) =
            counts.minBy { case (kk, (c, _)) => (c, kk) }(
              Ordering.Tuple2(Ordering.Long, SpaceSaving.keyOrdering))
          if (alpha(b) + weight >= minC) {
            // the FSS filter admits: evicted mass returns to its bucket
            counts.remove(minKey)
            alpha(bucketOf(minKey)) = minC
            counts(key) = (alpha(b) + weight, alpha(b))
          } else {
            // not heavy enough yet — accrue to the bucket counter
            alpha(b) += weight
          }
        }
    }
  }

  /** FSSMerge (fss.c:472-530): alphas sum element-wise; monitored lists
    * union (sum counts/errors of common elements, insert missing verbatim);
    * keep the heaviest `capacity`.
    */
  def merge(other: SpaceSaving): SpaceSaving = {
    require(other.k == k && other.capacity == capacity &&
      other.numBuckets == numBuckets, "space-saving shape mismatch")
    var i = 0
    while (i < numBuckets) { alpha(i) += other.alpha(i); i += 1 }
    val union = mutable.HashMap.empty[Key, (Long, Long)]
    for ((kk, (c, e)) <- counts) union(kk) = (c, e)
    for ((kk, (c, e)) <- other.counts) {
      val (c0, e0) = union.getOrElse(kk, (0L, 0L))
      union(kk) = (c0 + c, e0 + e)
    }
    val byCountDesc =
      Ordering.Tuple2(Ordering.Long.reverse, SpaceSaving.keyOrdering)
        .on[(SpaceSaving.Key, (Long, Long))] { case (kk, (c, _)) => (c, kk) }
    val kept = union.toSeq.sorted(byCountDesc).take(capacity)
    counts.clear()
    for ((kk, ce) <- kept.reverse) counts(kk) = ce
    this
  }

  /** Top-k by estimated count; ties broken by unsigned-byte lexicographic
    * order of the value encoding (== UTF-8 string order for string inputs),
    * so results are deterministic and match an ORDER BY count DESC, value
    * ASC oracle.
    */
  def topK: Seq[(Array[Byte], Long, Long)] =
    counts.toSeq
      .sorted(Ordering.Tuple2(Ordering.Long.reverse, SpaceSaving.keyOrdering)
        .on[(SpaceSaving.Key, (Long, Long))] { case (kk, (c, _)) => (c, kk) })
      .take(k)
      .map { case (kk, (c, e)) => (kk.bytes, c, e) }

  /** Monitored count, or the key's bucket alpha (its unmonitored upper
    * bound) when not monitored.
    */
  def estimate(value: Any): Long = {
    val key = Key(Hashing.bytesOf(value))
    counts.get(key).map(_._1).getOrElse(alpha(bucketOf(key)))
  }

  def serialize(): Array[Byte] = {
    val entries = counts.toSeq
    val payload = entries.map { case (kk, _) => kk.bytes.length + 4 + 16 }.sum
    val buf = ByteBuffer.allocate(1 + 4 + 4 + 4 + 8 * numBuckets + 4 + payload)
    buf.put(SpaceSaving.MAGIC).putInt(k).putInt(capacity).putInt(numBuckets)
    var i = 0
    while (i < numBuckets) { buf.putLong(alpha(i)); i += 1 }
    buf.putInt(entries.size)
    for ((kk, (c, e)) <- entries) {
      buf.putInt(kk.bytes.length).put(kk.bytes).putLong(c).putLong(e)
    }
    buf.array()
  }

  def copy(): SpaceSaving = {
    val out = new SpaceSaving(k, capacity, numBuckets)
    System.arraycopy(alpha, 0, out.alpha, 0, numBuckets)
    for ((kk, ce) <- counts) out.counts(kk) = ce
    out
  }
}

object SpaceSaving {
  val DefaultK = 5
  private[sketch] val MAGIC: Byte = 'F' // FSS state (alpha-filtered)
  // Pre-FSS layout ('S'): no alpha-bucket array — states persisted by older
  // builds (CV matrel state surviving a restart) still deserialize; their
  // alphas zero-fill, which only loosens the unmonitored upper bound.
  private[sketch] val LegacyMagic: Byte = 'S'
  private[sketch] val HashSeed = 0x7a3c9d1e5b82f604L

  // canonical byte encoding wrapped for hashCode/equals
  private[sketch] final case class Key(bytes: Array[Byte]) {
    override val hashCode: Int = java.util.Arrays.hashCode(bytes)
    override def equals(o: Any): Boolean = o match {
      case Key(b) => java.util.Arrays.equals(bytes, b)
      case _ => false
    }
  }

  /** Unsigned-byte lexicographic ordering (UTF-8 order for string values). */
  private[sketch] val keyOrdering: Ordering[Key] = (a: Key, b: Key) => {
    val n = math.min(a.bytes.length, b.bytes.length)
    var i = 0
    var cmp = 0
    while (i < n && cmp == 0) {
      cmp = (a.bytes(i) & 0xff) - (b.bytes(i) & 0xff)
      i += 1
    }
    if (cmp != 0) cmp else a.bytes.length - b.bytes.length
  }

  def empty(k: Int = DefaultK, capacity: Int = 0): SpaceSaving = {
    require(k > 0, s"invalid k=$k")
    val m = if (capacity > 0) capacity else 3 * k
    // h = 6m, the reference's DEFAULT_H_FACTOR (fss.c:21-23)
    new SpaceSaving(k, m, 6 * m)
  }

  def deserialize(bytes: Array[Byte]): SpaceSaving = {
    val buf = ByteBuffer.wrap(bytes)
    val magic = buf.get()
    require(magic == MAGIC || magic == LegacyMagic, "not a space-saving state")
    val k = buf.getInt
    val cap = buf.getInt
    // legacy states carry no bucket array: rebuild with the default h = 6m
    // and all-zero alphas (estimates of unmonitored keys lose their floor,
    // monitored counts are unaffected)
    val h = if (magic == MAGIC) buf.getInt else 6 * cap
    val out = new SpaceSaving(k, cap, h)
    var i = 0
    if (magic == MAGIC) {
      while (i < h) { out.alpha(i) = buf.getLong; i += 1 }
    }
    val n = buf.getInt
    i = 0
    while (i < n) {
      val len = buf.getInt
      val b = new Array[Byte](len)
      buf.get(b)
      val c = buf.getLong
      val e = buf.getLong
      out.counts(Key(b)) = (c, e)
      i += 1
    }
    out
  }
}
