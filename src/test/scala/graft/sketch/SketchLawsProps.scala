package graft.sketch

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Merge-law properties for every sketch (SURVEY §5): at 100 TB the engine
  * leans entirely on partial states merging associatively/commutatively
  * across arbitrary partitionings — "sketch(parts in any grouping/order)
  * equals sketch(whole)" IS the correctness contract of distributed
  * aggregation, so it is checked property-style, not example-style.
  *
  * Reference behaviors mirrored: hll.c (register-max merge), bloom.c
  * (bitwise union), cmsketch.c (counter add), tdigest.c (centroid merge,
  * approximate), fss.c (monitored-list merge, exact while under capacity).
  */
object SketchLawsProps extends Properties("sketch-merge-laws") {

  private val values: Gen[List[String]] =
    Gen.listOf(Gen.chooseNum(0, 5000).map(i => s"v$i"))

  /** Random 3-way split of a list (possibly empty parts). */
  private val splitValues: Gen[(List[String], List[String], List[String])] =
    for {
      vs <- values
      i <- Gen.chooseNum(0, vs.length)
      j <- Gen.chooseNum(0, vs.length)
    } yield {
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      (vs.take(lo), vs.slice(lo, hi), vs.drop(hi))
    }

  // ---- HyperLogLog ----

  private def hllOf(vs: Seq[String]): HyperLogLog = {
    val h = HyperLogLog.empty(); vs.foreach(h.add); h
  }

  property("hll: split-merge == single sketch, any association order") =
    forAll(splitValues) { case (a, b, c) =>
      val whole = hllOf(a ++ b ++ c).cardinality
      val left = hllOf(a).merge(hllOf(b)).merge(hllOf(c)).cardinality
      val right = hllOf(a).merge(hllOf(b).merge(hllOf(c))).cardinality
      val swapped = hllOf(c).merge(hllOf(a).merge(hllOf(b))).cardinality
      left == whole && right == whole && swapped == whole
    }

  property("hll: merge with empty is identity; serde round-trips state") =
    forAll(values) { vs =>
      val h = hllOf(vs)
      val merged = hllOf(vs).merge(HyperLogLog.empty())
      val roundTrip = HyperLogLog.deserialize(h.serialize())
      merged.cardinality == h.cardinality &&
        roundTrip.cardinality == h.cardinality &&
        java.util.Arrays.equals(roundTrip.serialize(), h.serialize())
    }

  // ---- Bloom ----

  private def bloomOf(vs: Seq[String]): BloomFilter = {
    val b = BloomFilter.empty(); vs.foreach(b.add); b
  }

  property("bloom: union is bitwise-exact vs single filter; no false negatives") =
    forAll(splitValues) { case (a, b, c) =>
      val whole = bloomOf(a ++ b ++ c)
      val merged = bloomOf(a).union(bloomOf(b).union(bloomOf(c)))
      java.util.Arrays.equals(merged.serialize(), whole.serialize()) &&
        (a ++ b ++ c).forall(merged.contains)
    }

  property("bloom: intersection commutes and never drops common members") =
    forAll(values, values) { (xs, ys) =>
      val common = xs.toSet.intersect(ys.toSet)
      val i1 = bloomOf(xs).intersection(bloomOf(ys))
      val i2 = bloomOf(ys).intersection(bloomOf(xs))
      java.util.Arrays.equals(i1.serialize(), i2.serialize()) &&
        common.forall(i1.contains)
    }

  // ---- Count-Min Sketch ----

  private def cmsOf(vs: Seq[String]): CountMinSketch = {
    val s = CountMinSketch.empty(); vs.foreach(s.add(_)); s
  }

  property("cms: split-merge counters byte-equal the single sketch") =
    forAll(splitValues) { case (a, b, c) =>
      val whole = cmsOf(a ++ b ++ c)
      val merged = cmsOf(a).merge(cmsOf(b)).merge(cmsOf(c))
      java.util.Arrays.equals(merged.serialize(), whole.serialize()) &&
        (a ++ b ++ c).distinct.forall(v => merged.estimate(v) == whole.estimate(v))
    }

  // ---- SpaceSaving (FSS top-k) ----

  // Small domain (<= 9 distinct, under the capacity of 15) generated directly
  // rather than filtered with `==>`: a filter discards ~84% of the wide-domain
  // lists and makes ScalaCheck exhaust its discard budget nondeterministically.
  private val smallDomainSplit: Gen[(List[String], List[String], List[String])] =
    for {
      vs <- Gen.listOf(Gen.chooseNum(0, 8).map(i => s"v$i"))
      i <- Gen.chooseNum(0, vs.length)
      j <- Gen.chooseNum(0, vs.length)
    } yield {
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      (vs.take(lo), vs.slice(lo, hi), vs.drop(hi))
    }

  property("topk: merge exact while distinct <= capacity, any split") =
    forAll(smallDomainSplit) { case (a, b, c) =>
      val all = a ++ b ++ c
      val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      def ssOf(vs: Seq[String]) = {
        val s = SpaceSaving.empty(k = 5, capacity = 15); vs.foreach(s.add(_)); s
      }
      val merged = ssOf(a).merge(ssOf(b).merge(ssOf(c)))
      exact.forall { case (v, n) => merged.estimate(v) == n }
    }

  // ---- T-Digest (approximate: quantiles within rank tolerance) ----

  private val doubleLists: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6)).map(_.map(_.toDouble))

  property("tdigest: merged quantiles track exact ranks; serde is lossless") =
    forAll(doubleLists, Gen.chooseNum(0, 100)) { (xs, qi) =>
      val q = qi / 100.0
      def tdOf(vs: Seq[Double]) = { val t = TDigest.empty(); vs.foreach(t.add(_)); t }
      val (l, r) = xs.splitAt(xs.length / 2)
      val merged = tdOf(l).merge(tdOf(r))
      val est = merged.quantile(q)
      val sorted = xs.sorted
      // rank error bound: with ties a value occupies a rank INTERVAL
      // [count(<est), count(<=est)]/n — q must fall within 15% of it
      // (all-duplicate inputs make any single-point rank ill-defined)
      val lo = sorted.count(_ < est).toDouble / sorted.length
      val hi = sorted.count(_ <= est).toDouble / sorted.length
      val tol = 0.15 + 2.0 / sorted.length
      val dist = if (q < lo) lo - q else if (q > hi) q - hi else 0.0
      val rt = TDigest.deserialize(merged.serialize())
      dist <= tol && rt.quantile(q) == est
    }

  // guard Prop implicits usage
  private val _ = Prop
}
