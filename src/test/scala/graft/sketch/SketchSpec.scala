package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {

  /** Deterministic randomized trials (stand-in for scalacheck forAll,
    * which needs the scalatestplus bridge not present offline).
    */
  private def trials(n: Int)(body: scala.util.Random => Unit): Unit = {
    val rng = new scala.util.Random(1234)
    (1 to n).foreach(_ => body(rng))
  }
  private def randList(rng: scala.util.Random): List[Int] =
    List.fill(rng.nextInt(60))(rng.nextInt(500))

  // ---------------- HyperLogLog ----------------

  test("hll: cardinality within 2% at 100k distinct") {
    val h = HyperLogLog.empty()
    (1 to 100000).foreach(i => h.add(s"item-$i"))
    val est = h.cardinality
    assert(math.abs(est - 100000) < 2000, s"estimate $est")
  }

  test("hll: small cardinalities exact via explicit mode (up to m/8)") {
    val h = HyperLogLog.empty()
    (1 to 100).foreach(i => h.add(i.toLong))
    assert(h.cardinality == 100)
    val h2 = HyperLogLog.empty()
    (1 to 2000).foreach(i => h2.add(s"u$i"))
    assert(h2.isExplicit && h2.cardinality == 2000)
    // merging explicit shards stays exact
    val a = HyperLogLog.empty(); val b = HyperLogLog.empty()
    (1 to 1000).foreach(i => a.add(i)); (500 to 1500).foreach(i => b.add(i))
    assert(a.merge(b).cardinality == 1500)
  }

  test("hll: merge == union; idempotent, commutative") {
    val a = HyperLogLog.empty(); val b = HyperLogLog.empty(); val all = HyperLogLog.empty()
    (1 to 5000).foreach { i => a.add(i); all.add(i) }
    (3000 to 8000).foreach { i => b.add(i); all.add(i) }
    val ab = a.copy().merge(b)
    val ba = b.copy().merge(a)
    assert(ab.cardinality == all.cardinality)
    assert(ba.cardinality == ab.cardinality)
    assert(ab.copy().merge(ab).cardinality == ab.cardinality) // idempotent
  }

  test("hll: serialize roundtrip") {
    val h = HyperLogLog.empty()
    (1 to 1000).foreach(i => h.add(s"x$i"))
    val h2 = HyperLogLog.deserialize(h.serialize())
    assert(h2.cardinality == h.cardinality)
    assert(java.util.Arrays.equals(h2.serialize(), h.serialize()))
  }

  test("hll: typed inputs hash consistently (int vs long same value)") {
    val a = HyperLogLog.empty(); val b = HyperLogLog.empty()
    (1 to 1000).foreach(i => a.add(i))        // Int
    (1 to 1000).foreach(i => b.add(i.toLong)) // Long
    assert(a.cardinality == b.cardinality)
  }

  // ---------------- Bloom ----------------

  test("bloom: no false negatives, fpr near target") {
    val bf = BloomFilter.empty()
    (1 to 16384).foreach(i => bf.add(s"k$i"))
    assert((1 to 16384).forall(i => bf.contains(s"k$i")))
    val fp = (1 to 10000).count(i => bf.contains(s"absent$i"))
    assert(fp < 400, s"fpr ${fp / 10000.0} too far above 0.02")
  }

  test("bloom: union is or; intersection only keeps common") {
    val a = BloomFilter.empty(); val b = BloomFilter.empty()
    (1 to 100).foreach(i => a.add(i))
    (50 to 150).foreach(i => b.add(i))
    val u = a.copy().union(b)
    assert((1 to 150).forall(u.contains))
    val inter = a.copy().intersection(b)
    assert((50 to 100).forall(inter.contains))
    assert(!(1 to 40).forall(inter.contains)) // most non-common are gone
  }

  test("bloom: cardinality estimate within 10%") {
    val bf = BloomFilter.empty()
    (1 to 10000).foreach(i => bf.add(s"v$i"))
    assert(math.abs(bf.cardinality - 10000) < 1000, s"${bf.cardinality}")
  }

  test("bloom: serialize roundtrip") {
    val bf = BloomFilter.empty()
    (1 to 500).foreach(i => bf.add(i))
    val bf2 = BloomFilter.deserialize(bf.serialize())
    assert(java.util.Arrays.equals(bf2.serialize(), bf.serialize()))
    assert((1 to 500).forall(bf2.contains))
  }

  // ---------------- Count-Min ----------------

  test("cms: default shape matches eps/confidence formulas") {
    val c = CountMinSketch.empty()
    assert(c.width == math.ceil(math.E / 0.002).toInt)
    assert(c.depth == math.ceil(math.log(1 / 0.005)).toInt)
  }

  test("cms: point estimates upper-bound truth, exact on sparse domains") {
    val c = CountMinSketch.empty()
    val truth = (1 to 50).map(i => s"k$i" -> i.toLong).toMap
    truth.foreach { case (k, n) => (1L to n).foreach(_ => c.add(k)) }
    truth.foreach { case (k, n) =>
      assert(c.estimate(k) >= n)
      assert(c.estimate(k) == n, s"collision on $k") // 50 keys in 1360 cols × 6 rows
    }
    assert(c.total == truth.values.sum)
  }

  test("cms: merge sums tables") {
    val a = CountMinSketch.empty(); val b = CountMinSketch.empty()
    (1 to 100).foreach(_ => a.add("x"))
    (1 to 50).foreach(_ => b.add("x"))
    assert(a.copy().merge(b).estimate("x") == 150)
  }

  test("cms: serialize roundtrip") {
    val c = CountMinSketch.empty()
    (1 to 200).foreach(i => c.add(i % 7))
    val c2 = CountMinSketch.deserialize(c.serialize())
    assert(java.util.Arrays.equals(c2.serialize(), c.serialize()))
  }

  // ---------------- TDigest ----------------

  test("tdigest: quantiles on uniform data within 1%") {
    val t = TDigest.empty()
    val rng = new scala.util.Random(42)
    (1 to 100000).foreach(_ => t.add(rng.nextDouble()))
    assert(math.abs(t.quantile(0.5) - 0.5) < 0.01)
    assert(math.abs(t.quantile(0.9) - 0.9) < 0.01)
    assert(math.abs(t.quantile(0.99) - 0.99) < 0.005)
    assert(math.abs(t.cdf(0.25) - 0.25) < 0.01)
  }

  test("tdigest: centroid count bounded by compression") {
    val t = TDigest.empty(200)
    val rng = new scala.util.Random(1)
    (1 to 50000).foreach(_ => t.add(rng.nextGaussian()))
    assert(t.centroidCount <= 200 + 8, s"${t.centroidCount} centroids")
  }

  test("tdigest: merge of shards ~ single digest") {
    val rng = new scala.util.Random(7)
    val data = Array.fill(40000)(rng.nextDouble() * 100)
    val whole = TDigest.empty()
    data.foreach(whole.add(_))
    val shards = data.grouped(10000).map { chunk =>
      val t = TDigest.empty(); chunk.foreach(t.add(_)); t
    }.toSeq
    val merged = shards.reduce((a, b) => a.merge(b))
    for (q <- Seq(0.1, 0.5, 0.9, 0.99))
      assert(math.abs(merged.quantile(q) - whole.quantile(q)) < 1.5,
        s"q=$q merged=${merged.quantile(q)} whole=${whole.quantile(q)}")
  }

  test("tdigest: exact on tiny inputs") {
    val t = TDigest.empty()
    Seq(1.0, 2.0, 3.0).foreach(t.add(_))
    assert(t.quantile(0.0) == 1.0)
    assert(t.quantile(1.0) == 3.0)
    assert(math.abs(t.quantile(0.5) - 2.0) < 1e-9)
  }

  test("tdigest: serialize roundtrip") {
    val t = TDigest.empty()
    (1 to 5000).foreach(i => t.add(i.toDouble))
    val t2 = TDigest.deserialize(t.serialize())
    assert(t2.quantile(0.5) == t.quantile(0.5))
    assert(java.util.Arrays.equals(t2.serialize(), t.serialize()))
  }

  // ---------------- SpaceSaving ----------------

  test("space-saving: exact when distinct ≤ capacity") {
    val s = SpaceSaving.empty(k = 5) // capacity 15
    val freqs = Map("a" -> 100L, "b" -> 50L, "c" -> 25L, "d" -> 10L, "e" -> 5L, "f" -> 1L)
    freqs.foreach { case (v, n) => (1L to n).foreach(_ => s.add(v)) }
    val top = s.topK.map { case (b, c, e) => (new String(b, "UTF-8"), c, e) }
    assert(top.map(_._1) == Seq("a", "b", "c", "d", "e"))
    assert(top.forall(_._3 == 0L)) // no evictions → zero error
    assert(top.map(t => t._1 -> t._2).toMap == freqs.view.filterKeys(_ != "f").toMap)
  }

  test("space-saving: heavy hitters survive skewed stream beyond capacity") {
    val s = SpaceSaving.empty(k = 3) // capacity 9
    val rng = new scala.util.Random(11)
    // zipf-ish: 3 heavy keys + 100 light keys
    (1 to 3000).foreach(_ => s.add(s"heavy${rng.nextInt(3)}"))
    (1 to 600).foreach(i => s.add(s"light${i % 100}"))
    val top = s.topK.map { case (b, _, _) => new String(b, "UTF-8") }.toSet
    assert(Set("heavy0", "heavy1", "heavy2").subsetOf(top))
  }

  test("space-saving: merge combines counts of shards") {
    val a = SpaceSaving.empty(k = 5); val b = SpaceSaving.empty(k = 5)
    (1 to 100).foreach(_ => a.add("x")); (1 to 30).foreach(_ => a.add("y"))
    (1 to 70).foreach(_ => b.add("x")); (1 to 40).foreach(_ => b.add("z"))
    val m = a.copy().merge(b)
    assert(m.estimate("x") == 170)
    assert(m.estimate("y") == 30)
    assert(m.estimate("z") == 40)
  }

  test("space-saving: FSS alpha filter keeps evicted mass (fss.c:358-402)") {
    val a = SpaceSaving.empty(k = 1, capacity = 4)
    (1 to 100).foreach(_ => a.add("x"))
    Seq("a", "b", "c").foreach(kk => (1 to 200).foreach(_ => a.add(kk)))
    // classic SpaceSaving would evict x (min, count 100) for this singleton;
    // the FSS filter holds the line until d's bucket accumulates enough
    a.add("d")
    assert(a.estimate("x") == 100L, "a single light arrival must not evict a heavy key")
    // push d's bucket alpha past the minimum: now x is displaced, but its
    // mass lands in its bucket's alpha instead of vanishing
    (1 to 100).foreach(_ => a.add("d"))
    assert(a.estimate("x") >= 100L,
      s"evicted mass dropped: estimate=${a.estimate("x")}")
    // alpha array survives serialization
    val a2 = SpaceSaving.deserialize(a.serialize())
    assert(a2.estimate("x") == a.estimate("x"))
    // merge sums alphas alongside monitored lists (FSSMerge, fss.c:472)
    val b = SpaceSaving.empty(k = 1, capacity = 4)
    (1 to 50).foreach(_ => b.add("x"))
    val m = a.copy().merge(b)
    assert(m.estimate("x") >= 50L)
    // sides below capacity still merge exactly
    val e1 = SpaceSaving.empty(k = 2, capacity = 8); e1.add("p"); e1.add("p")
    val e2 = SpaceSaving.empty(k = 2, capacity = 8); e2.add("p"); e2.add("q")
    val em = e1.copy().merge(e2)
    assert(em.estimate("p") == 3L && em.estimate("q") == 1L)
  }

  test("space-saving: serialize roundtrip") {
    val s = SpaceSaving.empty(k = 5)
    (1 to 200).foreach(i => s.add(s"v${i % 20}"))
    val s2 = SpaceSaving.deserialize(s.serialize())
    assert(java.util.Arrays.equals(s2.serialize(), s.serialize()))
  }

  test("space-saving: legacy 'S' states (pre-alpha layout) still deserialize") {
    val s = SpaceSaving.empty(k = 5)
    (1 to 200).foreach(i => s.add(s"v${i % 20}"))
    // rebuild the pre-FSS wire layout from the current one: magic 'S', k,
    // capacity, then entries — no bucket-alpha array
    val cur = s.serialize()
    val buf = java.nio.ByteBuffer.wrap(cur)
    buf.get()
    val k = buf.getInt; val cap = buf.getInt; val h = buf.getInt
    val tailOff = 1 + 4 + 4 + 4 + 8 * h
    val legacy = java.nio.ByteBuffer.allocate(1 + 4 + 4 + (cur.length - tailOff))
    legacy.put('S'.toByte).putInt(k).putInt(cap)
      .put(cur, tailOff, cur.length - tailOff)
    val s2 = SpaceSaving.deserialize(legacy.array())
    // monitored counts survive exactly; alphas zero-fill (only the
    // unmonitored upper bound loosens)
    assert(s2.topK.map(t => (t._1.toSeq, t._2)) ==
      s.topK.map(t => (t._1.toSeq, t._2)))
    intercept[IllegalArgumentException] {
      SpaceSaving.deserialize(Array[Byte]('X', 0, 0, 0))
    }
  }

  // ---------------- randomized merge laws ----------------

  test("law: hll merge commutative + associative (register-exact)") {
    trials(50) { rng =>
      val (xs, ys, zs) = (randList(rng), randList(rng), randList(rng))
      def mk(v: List[Int]) = { val h = HyperLogLog.empty(8); v.foreach(h.add(_)); h }
      val ab = mk(xs).merge(mk(ys))
      val ba = mk(ys).merge(mk(xs))
      assert(java.util.Arrays.equals(ab.serialize(), ba.serialize()))
      val abc1 = mk(xs).merge(mk(ys)).merge(mk(zs))
      val abc2 = mk(xs).merge(mk(ys).merge(mk(zs)))
      assert(java.util.Arrays.equals(abc1.serialize(), abc2.serialize()))
    }
  }

  test("law: bloom union commutative + associative (bit-exact)") {
    trials(50) { rng =>
      val (xs, ys) = (randList(rng), randList(rng))
      def mk(v: List[Int]) = { val b = BloomFilter.empty(0.05, 256); v.foreach(b.add(_)); b }
      val ab = mk(xs).union(mk(ys))
      val ba = mk(ys).union(mk(xs))
      assert(java.util.Arrays.equals(ab.serialize(), ba.serialize()))
    }
  }

  test("law: cms merge commutative (table-exact)") {
    trials(50) { rng =>
      val (xs, ys) = (randList(rng), randList(rng))
      def mk(v: List[Int]) = { val c = CountMinSketch.empty(0.01, 0.9); v.foreach(c.add(_)); c }
      val ab = mk(xs).merge(mk(ys))
      val ba = mk(ys).merge(mk(xs))
      assert(java.util.Arrays.equals(ab.serialize(), ba.serialize()))
    }
  }
}
