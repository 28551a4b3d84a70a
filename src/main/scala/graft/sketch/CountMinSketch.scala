package graft.sketch

import java.nio.ByteBuffer

/** Count-Min Sketch with the reference defaults eps=0.002, confidence=0.995
  * (/root/reference/src/cmsketch.c:21-22): width w = ⌈e/ε⌉, depth
  * d = ⌈ln(1/(1-conf))⌉. Point query returns the minimum over rows (upper
  * bound on true frequency). Merge = elementwise sum → associative and
  * commutative, so partial states combine at any re-grouping.
  */
final class CountMinSketch private (
    val depth: Int, val width: Int, val table: Array[Long], var total: Long)
    extends Serializable {

  def add(value: Any, count: Long = 1L): Unit = {
    val h = Hashing.murmur128(Hashing.bytesOf(value))
    var row = 0
    while (row < depth) {
      val combined = h.h1 + row.toLong * h.h2
      val col = ((combined % width + width) % width).toInt
      table(row * width + col) += count
      row += 1
    }
    total += count
  }

  def estimate(value: Any): Long = {
    val h = Hashing.murmur128(Hashing.bytesOf(value))
    var est = Long.MaxValue
    var row = 0
    while (row < depth) {
      val combined = h.h1 + row.toLong * h.h2
      val col = ((combined % width + width) % width).toInt
      est = math.min(est, table(row * width + col))
      row += 1
    }
    est
  }

  /** Normalized frequency in [0,1] (reference `freq_norm`). */
  def estimateNorm(value: Any): Double =
    if (total == 0) 0.0 else estimate(value).toDouble / total

  def merge(other: CountMinSketch): CountMinSketch = {
    require(other.depth == depth && other.width == width, "cms shape mismatch")
    var i = 0
    while (i < table.length) { table(i) += other.table(i); i += 1 }
    total += other.total
    this
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 4 + 4 + 8 + table.length * 8)
    buf.put(CountMinSketch.MAGIC).putInt(depth).putInt(width).putLong(total)
    table.foreach(buf.putLong)
    buf.array()
  }

  def copy(): CountMinSketch = new CountMinSketch(depth, width, table.clone(), total)
}

object CountMinSketch {
  val DefaultEps = 0.002
  val DefaultConfidence = 0.995
  private[sketch] val MAGIC: Byte = 'C'

  def empty(eps: Double = DefaultEps, confidence: Double = DefaultConfidence): CountMinSketch = {
    require(eps > 0 && eps < 1 && confidence > 0 && confidence < 1, "invalid cms params")
    val width = math.ceil(math.E / eps).toInt
    val depth = math.max(1, math.ceil(math.log(1.0 / (1.0 - confidence))).toInt)
    new CountMinSketch(depth, width, new Array[Long](depth * width), 0L)
  }

  def deserialize(bytes: Array[Byte]): CountMinSketch = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.get() == MAGIC, "not a cms state")
    val d = buf.getInt
    val w = buf.getInt
    val total = buf.getLong
    val table = new Array[Long](d * w)
    var i = 0
    while (i < table.length) { table(i) = buf.getLong; i += 1 }
    new CountMinSketch(d, w, table, total)
  }
}
