package graft.sketch

/** 128-bit MurmurHash3 (x64 variant), implemented from the public-domain
  * algorithm description (Austin Appleby, smhasher). The reference engine
  * hashes group keys and sketch inputs with the same public algorithm
  * (/root/reference/src/miscutils.c:97-184), so matching it keeps sketch
  * behavior comparable; we only need determinism + good dispersion.
  */
object Hashing {

  final case class H128(h1: Long, h2: Long)

  private final val C1 = 0x87c37b91114253d5L
  private final val C2 = 0x4cf5ad432745937fL

  @inline private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  /** Public 64-bit finalizer (murmur3 fmix) for fast long mixing. */
  def fmix64(k: Long): Long = fmix(k)

  @inline private def fmix(kIn: Long): Long = {
    var k = kIn
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  def murmur128(data: Array[Byte], seed: Long = 0L): H128 = {
    val len = data.length
    val nblocks = len / 16
    var h1 = seed
    var h2 = seed

    @inline def getLong(i: Int): Long = {
      var v = 0L
      var j = 7
      while (j >= 0) { v = (v << 8) | (data(i + j) & 0xffL); j -= 1 }
      v
    }

    var i = 0
    while (i < nblocks) {
      var k1 = getLong(i * 16)
      var k2 = getLong(i * 16 + 8)
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }

    val tail = nblocks * 16
    var k1 = 0L
    var k2 = 0L
    val rem = len & 15
    if (rem >= 9) {
      var j = math.min(rem, 16) - 1
      while (j >= 8) { k2 ^= (data(tail + j) & 0xffL) << ((j - 8) * 8); j -= 1 }
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem >= 1) {
      var j = math.min(rem, 8) - 1
      while (j >= 0) { k1 ^= (data(tail + j) & 0xffL) << (j * 8); j -= 1 }
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
    }

    h1 ^= len.toLong; h2 ^= len.toLong
    h1 += h2; h2 += h1
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2; h2 += h1
    H128(h1, h2)
  }

  def hash64(data: Array[Byte], seed: Long = 0L): Long = murmur128(data, seed).h1

  /** Canonical byte encoding of sketch inputs: the UTF-8 of the value's
    * string form for strings; little-endian fixed width for integral/fp
    * types. Keeps hashing stable across JVMs and input column types.
    *
    * Date/time values hash by their Catalyst-INTERNAL form (micros/days as
    * longs), because sketch aggregates run on executors over internal
    * values while the streaming gates probe driver-resident filters with
    * the external java.sql/java.time objects a collect() returns — the two
    * sides must agree bit-for-bit or stored keys probe as bloom false
    * negatives (silently admitting duplicates after a restart or regrow).
    */
  def bytesOf(v: Any): Array[Byte] = v match {
    case null => Array.emptyByteArray
    case s: String => s.getBytes("UTF-8")
    case s: org.apache.spark.unsafe.types.UTF8String => s.getBytes
    case b: Array[Byte] => b
    case i: Int => longBytes(i.toLong)
    case l: Long => longBytes(l)
    case sh: Short => longBytes(sh.toLong)
    case by: Byte => longBytes(by.toLong)
    case b: Boolean => longBytes(if (b) 1L else 0L)
    case f: Float => longBytes(java.lang.Double.doubleToLongBits(f.toDouble))
    case d: Double => longBytes(java.lang.Double.doubleToLongBits(d))
    case d: java.math.BigDecimal => d.toPlainString.getBytes("UTF-8")
    case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal.toPlainString.getBytes("UTF-8")
    case _: java.sql.Timestamp | _: java.sql.Date | _: java.time.Instant |
        _: java.time.LocalDate | _: java.time.LocalDateTime =>
      // external → internal (micros as Long / days as Int), then recurse:
      // identical canonicalization to GateStore.inSetCol's filter values
      bytesOf(org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToCatalyst(v))
    case other => other.toString.getBytes("UTF-8")
  }

  private def longBytes(v: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = ((v >>> (i * 8)) & 0xff).toByte; i += 1 }
    out
  }
}
