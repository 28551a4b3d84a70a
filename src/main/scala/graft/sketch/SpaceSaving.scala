package graft.sketch

import java.nio.ByteBuffer
import scala.collection.mutable

/** Filtered-Space-Saving style top-k: the classic SpaceSaving algorithm
  * (Metwally et al., public) with m = 3k monitored slots, matching the
  * reference defaults k=5, m=3k (/root/reference/src/fss.c:21-23,
  * include/fss.h:57-68). Each monitored element carries (count, error):
  * count is an upper bound, count−error a lower bound on true frequency.
  *
  * Values are stored as canonical bytes (Hashing.bytesOf) so the sketch is
  * type-agnostic; [[topK]] returns them as (bytes, count, error) and the
  * aggregate layer re-decodes using the column type.
  *
  * Merge: standard sketch union — sum counts of common elements, keep the
  * top-m of the union with min-count absorption for evicted mass.
  */
final class SpaceSaving private (val k: Int, val capacity: Int) extends Serializable {

  import SpaceSaving.Key

  private val counts = mutable.LinkedHashMap.empty[Key, (Long, Long)] // key -> (count, error)

  def size: Int = counts.size

  def add(value: Any, weight: Long = 1L): Unit = addBytes(Hashing.bytesOf(value), weight)

  private def addBytes(bytes: Array[Byte], weight: Long): Unit = {
    val key = Key(bytes)
    counts.get(key) match {
      case Some((c, e)) => counts(key) = (c + weight, e)
      case None if counts.size < capacity => counts(key) = (weight, 0L)
      case None =>
        // evict the min-count element; new element inherits its count as error
        val (minKey, (minC, _)) =
          counts.minBy { case (kk, (c, _)) => (c, kk) }(
            Ordering.Tuple2(Ordering.Long, SpaceSaving.keyOrdering))
        counts.remove(minKey)
        counts(key) = (minC + weight, minC)
    }
  }

  def merge(other: SpaceSaving): SpaceSaving = {
    require(other.k == k && other.capacity == capacity, "space-saving shape mismatch")
    // union of monitored sets with summed counts/errors…
    val union = mutable.HashMap.empty[Key, (Long, Long)]
    for ((kk, (c, e)) <- counts) union(kk) = (c, e)
    for ((kk, (c, e)) <- other.counts) {
      val (c0, e0) = union.getOrElse(kk, (0L, 0L))
      union(kk) = (c0 + c, e0 + e)
    }
    // …then keep only the heaviest `capacity`; the bound loosens by the
    // evicted mass, which standard SS union absorbs into the error term.
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

  def estimate(value: Any): Long =
    counts.get(Key(Hashing.bytesOf(value))).map(_._1).getOrElse(0L)

  def serialize(): Array[Byte] = {
    val entries = counts.toSeq
    val payload = entries.map { case (kk, _) => kk.bytes.length + 4 + 16 }.sum
    val buf = ByteBuffer.allocate(1 + 4 + 4 + 4 + payload)
    buf.put(SpaceSaving.MAGIC).putInt(k).putInt(capacity).putInt(entries.size)
    for ((kk, (c, e)) <- entries) {
      buf.putInt(kk.bytes.length).put(kk.bytes).putLong(c).putLong(e)
    }
    buf.array()
  }

  def copy(): SpaceSaving = {
    val out = new SpaceSaving(k, capacity)
    for ((kk, ce) <- counts) out.counts(kk) = ce
    out
  }
}

object SpaceSaving {
  val DefaultK = 5
  private[sketch] val MAGIC: Byte = 'S'

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
    new SpaceSaving(k, if (capacity > 0) capacity else 3 * k)
  }

  def deserialize(bytes: Array[Byte]): SpaceSaving = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.get() == MAGIC, "not a space-saving state")
    val k = buf.getInt
    val cap = buf.getInt
    val n = buf.getInt
    val out = new SpaceSaving(k, cap)
    var i = 0
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
