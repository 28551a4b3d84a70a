package graft.sketch

import java.nio.ByteBuffer

/** HyperLogLog cardinality sketch, default precision p=14 (16384 registers)
  * to match the reference engine's default (/root/reference/src/hll.c:62,
  * include/hll.h:42-57 — which stores dense/sparse/explicit encodings; we
  * store dense byte registers, the steady-state representation).
  *
  * Estimator: HLL with empirical bias correction via linear counting for
  * the low range (Flajolet et al., and the HLL++ small-range correction).
  * Registers merge by pointwise max → merge is associative, commutative,
  * idempotent, making the state a CRDT suitable for partial/merge/final
  * aggregation at any re-grouping.
  */
final class HyperLogLog private (val p: Int, val registers: Array[Byte]) extends Serializable {

  @inline private def m: Int = 1 << p

  def add(value: Any): Unit = addHash(Hashing.hash64(Hashing.bytesOf(value)))

  def addHash(h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val rest = h << p
    // rank = leading zeros of the remaining bits + 1, capped by register width
    val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    val r = math.min(rank, 63).toByte
    if (registers(idx) < r) registers(idx) = r
  }

  def merge(other: HyperLogLog): HyperLogLog = {
    require(other.p == p, s"HLL precision mismatch: $p vs ${other.p}")
    var i = 0
    while (i < m) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
    this
  }

  def cardinality: Long = {
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

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(2 + m)
    buf.put(HyperLogLog.MAGIC).put(p.toByte).put(registers)
    buf.array()
  }

  def copy(): HyperLogLog = new HyperLogLog(p, registers.clone())
}

object HyperLogLog {
  val DefaultP = 14
  private[sketch] val MAGIC: Byte = 'H'

  def empty(p: Int = DefaultP): HyperLogLog = {
    require(p >= 4 && p <= 18, s"HLL precision out of range: $p")
    new HyperLogLog(p, new Array[Byte](1 << p))
  }

  def deserialize(bytes: Array[Byte]): HyperLogLog = {
    require(bytes.length >= 2 && bytes(0) == MAGIC, "not an HLL state")
    val p = bytes(1).toInt
    val regs = java.util.Arrays.copyOfRange(bytes, 2, 2 + (1 << p))
    new HyperLogLog(p, regs)
  }
}
