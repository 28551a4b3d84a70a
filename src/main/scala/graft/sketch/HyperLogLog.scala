package graft.sketch

import java.nio.ByteBuffer
import scala.collection.mutable

/** HyperLogLog cardinality sketch, default precision p=14 (16384 registers),
  * with a two-mode representation mirroring the reference engine's
  * explicit/dense encodings (/root/reference/include/hll.h:42-57, hll.c:62):
  *
  *   - EXPLICIT: the exact set of 64-bit hashes, kept while
  *     |set| ≤ m/8 (same byte budget as the dense registers). Small
  *     cardinalities — the overwhelmingly common per-group case — are
  *     therefore *exact*, not estimates.
  *   - DENSE: one byte register per bucket, pointwise-max merge, classic
  *     HLL estimator with linear counting for the low range.
  *
  * Merge is a CRDT union in both modes (set union / register max):
  * associative, commutative, idempotent — and the dense registers are a
  * pure function of the accumulated hash set, so results are independent
  * of partitioning and merge order, conversions included.
  * Serialization sorts explicit hashes → byte-stable across orderings.
  */
final class HyperLogLog private (
    val p: Int,
    private var registers: Array[Byte], // null while explicit
    private var explicitSet: mutable.LongMap[Unit]) // null once dense
    extends Serializable {

  @inline private def m: Int = 1 << p
  @inline private def explicitLimit: Int = math.max(8, m / 8)

  def isExplicit: Boolean = explicitSet != null

  def add(value: Any): Unit = addHash(Hashing.hash64(Hashing.bytesOf(value)))

  def addHash(h: Long): Unit =
    if (explicitSet != null) {
      explicitSet.update(h, ())
      if (explicitSet.size > explicitLimit) densify()
    } else denseAdd(h)

  private def denseAdd(h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val rest = h << p
    val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    val r = math.min(rank, 63).toByte
    if (registers(idx) < r) registers(idx) = r
  }

  private def densify(): Unit = {
    registers = new Array[Byte](m)
    val it = explicitSet.keysIterator
    explicitSet = null
    it.foreach(denseAdd)
  }

  def merge(other: HyperLogLog): HyperLogLog = {
    require(other.p == p, s"HLL precision mismatch: $p vs ${other.p}")
    if (other.explicitSet != null) {
      other.explicitSet.keysIterator.foreach(addHash)
    } else {
      if (explicitSet != null) densify()
      var i = 0
      while (i < m) {
        if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
        i += 1
      }
    }
    this
  }

  def cardinality: Long =
    if (explicitSet != null) explicitSet.size.toLong
    else {
      val mm = m.toDouble
      var sum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        val r = registers(i)
        sum += 1.0 / (1L << r)
        if (r == 0) zeros += 1
        i += 1
      }
      val alpha = 0.7213 / (1.0 + 1.079 / mm)
      val raw = alpha * mm * mm / sum
      val est =
        if (raw <= 2.5 * mm && zeros > 0) mm * math.log(mm / zeros) // linear counting
        else raw
      math.round(est)
    }

  def serialize(): Array[Byte] =
    if (explicitSet != null) {
      val hashes = explicitSet.keysIterator.toArray
      java.util.Arrays.sort(hashes)
      val buf = ByteBuffer.allocate(2 + 4 + hashes.length * 8)
      buf.put(HyperLogLog.MAGIC_EXPLICIT).put(p.toByte).putInt(hashes.length)
      hashes.foreach(buf.putLong)
      buf.array()
    } else {
      val buf = ByteBuffer.allocate(2 + m)
      buf.put(HyperLogLog.MAGIC_DENSE).put(p.toByte).put(registers)
      buf.array()
    }

  def copy(): HyperLogLog =
    if (explicitSet != null) new HyperLogLog(p, null, explicitSet.clone())
    else new HyperLogLog(p, registers.clone(), null)
}

object HyperLogLog {
  val DefaultP = 14
  private[sketch] val MAGIC_DENSE: Byte = 'H'
  private[sketch] val MAGIC_EXPLICIT: Byte = 'E'

  def empty(p: Int = DefaultP): HyperLogLog = {
    require(p >= 4 && p <= 18, s"HLL precision out of range: $p")
    new HyperLogLog(p, null, mutable.LongMap.empty[Unit])
  }

  def deserialize(bytes: Array[Byte]): HyperLogLog = {
    require(bytes.length >= 2, "not an HLL state")
    val buf = ByteBuffer.wrap(bytes)
    val magic = buf.get()
    val p = buf.get().toInt
    magic match {
      case MAGIC_EXPLICIT =>
        val n = buf.getInt
        val set = mutable.LongMap.empty[Unit]
        var i = 0
        while (i < n) { set.update(buf.getLong, ()); i += 1 }
        new HyperLogLog(p, null, set)
      case MAGIC_DENSE =>
        val regs = new Array[Byte](1 << p)
        buf.get(regs)
        new HyperLogLog(p, regs, null)
      case _ => throw new IllegalArgumentException("not an HLL state")
    }
  }
}
