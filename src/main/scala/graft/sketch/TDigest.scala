package graft.sketch

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** Merging t-digest (Dunning's published algorithm) with the reference
  * default compression=200 (/root/reference/src/tdigest.c:23,
  * include/tdigest.h:22-35). Centroids (mean, weight) are kept sorted;
  * incoming points buffer and are folded in with a size bound
  * Δw ≤ 4·n·q(1−q)/δ, which concentrates resolution at the tails.
  * Merging two digests = merging centroid lists → associative and
  * commutative up to the (bounded, deterministic-given-order) compression.
  */
final class TDigest private (
    val compression: Double,
    private var means: ArrayBuffer[Double],
    private var weights: ArrayBuffer[Double],
    private val bufMeans: ArrayBuffer[Double],
    private val bufWeights: ArrayBuffer[Double])
    extends Serializable {

  def totalWeight: Double = {
    var s = 0.0
    means.indices.foreach(i => s += weights(i))
    bufMeans.indices.foreach(i => s += bufWeights(i))
    s
  }

  def add(x: Double, w: Double = 1.0): Unit = {
    bufMeans += x
    bufWeights += w
    if (bufMeans.length >= TDigest.BufferSize) compress()
  }

  def merge(other: TDigest): TDigest = {
    other.compress()
    var i = 0
    while (i < other.means.length) {
      bufMeans += other.means(i)
      bufWeights += other.weights(i)
      i += 1
    }
    compress()
    this
  }

  def compress(): Unit = {
    if (bufMeans.isEmpty && means.length <= compression + 8) {
      // nothing buffered and centroid list within bounds → no-op
      return
    }
    val n = means.length + bufMeans.length
    if (n == 0) return
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    var i = 0
    while (i < means.length) { ms(i) = means(i); ws(i) = weights(i); i += 1 }
    var j = 0
    while (j < bufMeans.length) { ms(i) = bufMeans(j); ws(i) = bufWeights(j); i += 1; j += 1 }
    bufMeans.clear(); bufWeights.clear()

    // sort (mean, weight) pairs by mean
    val idx = Array.range(0, n).sortBy(ms(_))
    val total = ws.sum

    // Explicit exact mode (the HLL explicit-encoding analogue,
    // hll.h:42-57): while the centroid count stays within the compression
    // budget there is no reason to merge at all — every centroid remains a
    // singleton, quantile() then interpolates the true sample, and groups
    // with ≤ δ points get EXACT quantiles (deterministic, oracle-checkable).
    if (n <= compression) {
      val outM = new ArrayBuffer[Double](n)
      val outW = new ArrayBuffer[Double](n)
      var s = 0
      while (s < n) { outM += ms(idx(s)); outW += ws(idx(s)); s += 1 }
      means = outM; weights = outW
      return
    }

    // k1 scale function: k(q) = (δ/2π)·asin(2q−1). Centroids merge while
    // their span in k-space stays ≤ 1, which bounds the centroid count by
    // ~δ and concentrates resolution at the tails.
    @inline def kScale(q: Double): Double =
      compression / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)

    val outM = new ArrayBuffer[Double](math.min(n, compression.toInt + 8))
    val outW = new ArrayBuffer[Double](math.min(n, compression.toInt + 8))
    var curM = ms(idx(0))
    var curW = ws(idx(0))
    var cum = 0.0 // weight fully emitted before cur
    var kLeft = kScale(0.0)
    var k = 1
    while (k < n) {
      val m = ms(idx(k)); val w = ws(idx(k))
      val qRightIfMerged = (cum + curW + w) / total
      if (kScale(qRightIfMerged) - kLeft <= 1.0) {
        // weighted average keeps the merged centroid's mean exact
        curM = (curM * curW + m * w) / (curW + w)
        curW += w
      } else {
        outM += curM; outW += curW; cum += curW
        kLeft = kScale(cum / total)
        curM = m; curW = w
      }
      k += 1
    }
    outM += curM; outW += curW
    means = outM; weights = outW
  }

  /** Quantile by linear interpolation between centroid means (standard
    * t-digest read-out: centroid i covers the cumulative-weight interval
    * centered at its midpoint).
    */
  def quantile(q: Double): Double = {
    compress()
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    val total = weights.sum
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < n) {
      val mid = cum + weights(i) / 2
      if (target < mid) {
        if (i == 0) return means(0)
        val prevMid = cum - weights(i - 1) / 2
        val t = (target - prevMid) / (mid - prevMid)
        return means(i - 1) + t * (means(i) - means(i - 1))
      }
      cum += weights(i)
      i += 1
    }
    means(n - 1)
  }

  /** Fraction of mass ≤ x. */
  def cdf(x: Double): Double = {
    compress()
    val n = means.length
    if (n == 0) return Double.NaN
    val total = weights.sum
    if (x < means(0)) return 0.0
    if (x >= means(n - 1)) return 1.0
    var cum = 0.0
    var i = 0
    while (i < n - 1) {
      val mid = cum + weights(i) / 2
      val nextMid = cum + weights(i) + weights(i + 1) / 2
      if (x >= means(i) && x < means(i + 1)) {
        val t = (x - means(i)) / (means(i + 1) - means(i))
        return (mid + t * (nextMid - mid)) / total
      }
      cum += weights(i)
      i += 1
    }
    1.0
  }

  def centroidCount: Int = { compress(); means.length }

  def serialize(): Array[Byte] = {
    compress()
    val n = means.length
    val buf = ByteBuffer.allocate(1 + 8 + 4 + n * 16)
    buf.put(TDigest.MAGIC).putDouble(compression).putInt(n)
    var i = 0
    while (i < n) { buf.putDouble(means(i)).putDouble(weights(i)); i += 1 }
    buf.array()
  }

  def copy(): TDigest =
    new TDigest(compression, means.clone(), weights.clone(), bufMeans.clone(), bufWeights.clone())
}

object TDigest {
  val DefaultCompression = 200.0
  private[sketch] val MAGIC: Byte = 'T'
  private val BufferSize = 2048

  def empty(compression: Double = DefaultCompression): TDigest = {
    require(compression >= 20, s"compression too small: $compression")
    new TDigest(compression, ArrayBuffer.empty, ArrayBuffer.empty, ArrayBuffer.empty, ArrayBuffer.empty)
  }

  def deserialize(bytes: Array[Byte]): TDigest = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.get() == MAGIC, "not a tdigest state")
    val compression = buf.getDouble
    val n = buf.getInt
    val ms = new ArrayBuffer[Double](n)
    val ws = new ArrayBuffer[Double](n)
    var i = 0
    while (i < n) { ms += buf.getDouble; ws += buf.getDouble; i += 1 }
    new TDigest(compression, ms, ws, ArrayBuffer.empty, ArrayBuffer.empty)
  }
}
