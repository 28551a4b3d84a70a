package graft.sketch

import java.nio.ByteBuffer

/** Bloom filter with the reference engine's defaults: target fpr p=0.02 for
  * n=16384 expected elements (/root/reference/src/bloom.c:18-19). Sizing
  * uses the standard formulas m = -n·ln p / (ln 2)², k = (m/n)·ln 2.
  * Double hashing (Kirsch–Mitzenmacher) derives the k probe positions from
  * one 128-bit hash. Union = bitwise OR (associative/commutative/idempotent);
  * intersection = bitwise AND (approximate, as in the reference).
  */
final class BloomFilter private (val numBits: Int, val numHashes: Int, val bits: Array[Long])
    extends Serializable {

  @inline private def setBit(i: Int): Unit = bits(i >>> 6) |= (1L << (i & 63))
  @inline private def getBit(i: Int): Boolean = (bits(i >>> 6) & (1L << (i & 63))) != 0L

  def add(value: Any): Unit = {
    val h = Hashing.murmur128(Hashing.bytesOf(value))
    var i = 0
    while (i < numHashes) {
      val combined = h.h1 + i.toLong * h.h2
      setBit(((combined % numBits + numBits) % numBits).toInt)
      i += 1
    }
  }

  def contains(value: Any): Boolean = {
    val h = Hashing.murmur128(Hashing.bytesOf(value))
    var i = 0
    while (i < numHashes) {
      val combined = h.h1 + i.toLong * h.h2
      if (!getBit(((combined % numBits + numBits) % numBits).toInt)) return false
      i += 1
    }
    true
  }

  def union(other: BloomFilter): BloomFilter = {
    require(other.numBits == numBits && other.numHashes == numHashes, "bloom shape mismatch")
    var i = 0
    while (i < bits.length) { bits(i) |= other.bits(i); i += 1 }
    this
  }

  def intersection(other: BloomFilter): BloomFilter = {
    require(other.numBits == numBits && other.numHashes == numHashes, "bloom shape mismatch")
    var i = 0
    while (i < bits.length) { bits(i) &= other.bits(i); i += 1 }
    this
  }

  def setBitCount: Long = {
    var c = 0L
    var i = 0
    while (i < bits.length) { c += java.lang.Long.bitCount(bits(i)); i += 1 }
    c
  }

  /** Estimated distinct insertions: n ≈ -(m/k)·ln(1 - X/m), X = set bits. */
  def cardinality: Long = {
    val x = setBitCount.toDouble
    if (x == 0) 0L
    else if (x >= numBits) Long.MaxValue
    else math.round(-(numBits.toDouble / numHashes) * math.log1p(-x / numBits))
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 4 + 4 + bits.length * 8)
    buf.put(BloomFilter.MAGIC).putInt(numBits).putInt(numHashes)
    bits.foreach(buf.putLong)
    buf.array()
  }

  def copy(): BloomFilter = new BloomFilter(numBits, numHashes, bits.clone())
}

object BloomFilter {
  val DefaultP = 0.02
  val DefaultN = 16384
  private[sketch] val MAGIC: Byte = 'B'

  def empty(p: Double = DefaultP, n: Int = DefaultN): BloomFilter = {
    require(p > 0 && p < 1 && n > 0, s"invalid bloom params p=$p n=$n")
    val ln2 = math.log(2)
    val m0 = math.ceil(-n * math.log(p) / (ln2 * ln2)).toInt
    val m = ((m0 + 63) / 64) * 64 // round up to whole words
    val k = math.max(1, math.round((m.toDouble / n) * ln2).toInt)
    new BloomFilter(m, k, new Array[Long](m / 64))
  }

  def deserialize(bytes: Array[Byte]): BloomFilter = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.get() == MAGIC, "not a bloom state")
    val m = buf.getInt
    val k = buf.getInt
    val words = new Array[Long](m / 64)
    var i = 0
    while (i < words.length) { words(i) = buf.getLong; i += 1 }
    new BloomFilter(m, k, words)
  }
}
