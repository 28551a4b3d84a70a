package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.sketch._

/** Scalar finalizers / inspectors over serialized sketch states — the
  * read-path functions the overlay views apply (reference scalars:
  * hll_cardinality, bloom_contains, freq, dist_quantile, topk — see
  * pipelinedb--1.0.0.sql:1095-2438). These run on finalized aggregate
  * output (rows ≈ groups, not events), so CodegenFallback is fine.
  */

case class HllCardinality(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "hll_cardinality"
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HyperLogLog.deserialize(v.asInstanceOf[Array[Byte]]).cardinality
  override protected def withNewChildInternal(c: Expression): HllCardinality = copy(child = c)
}

case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "bloom_contains"
  override def dataType: DataType = BooleanType
  // A literal filter state (the streaming gates probe a driver-built bloom
  // against every row of a batch) deserializes ONCE per task instead of
  // per row — at a megabyte-scale filter and 10^5 rows the difference is
  // the whole batch wall time. Non-literal states (the common SQL surface:
  // a state column per group) keep the per-row path.
  @transient private lazy val literalState: BloomFilter = left match {
    case org.apache.spark.sql.catalyst.expressions.Literal(bytes: Array[Byte], _) =>
      BloomFilter.deserialize(bytes)
    case _ => null
  }
  override def nullSafeEval(state: Any, value: Any): Any = {
    val bf = if (literalState != null) literalState
      else BloomFilter.deserialize(state.asInstanceOf[Array[Byte]])
    bf.contains(value)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomContains =
    copy(left = l, right = r)
}

case class BloomCardinality(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "bloom_cardinality"
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    BloomFilter.deserialize(v.asInstanceOf[Array[Byte]]).cardinality
  override protected def withNewChildInternal(c: Expression): BloomCardinality = copy(child = c)
}

/** freq(cms_state, value) → estimated count (upper bound). */
case class CmsFreq(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "freq"
  override def dataType: DataType = LongType
  // literal-state memoization, same contract as BloomContains: the
  // near-dup gate's hot-bucket cap probes a driver-built CMS literal
  // against every bucket key of a batch — deserialize once per task
  @transient private lazy val literalState: CountMinSketch = left match {
    case org.apache.spark.sql.catalyst.expressions.Literal(bytes: Array[Byte], _) =>
      CountMinSketch.deserialize(bytes)
    case _ => null
  }
  override def nullSafeEval(state: Any, value: Any): Any = {
    val cms = if (literalState != null) literalState
      else CountMinSketch.deserialize(state.asInstanceOf[Array[Byte]])
    cms.estimate(value)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsFreq =
    copy(left = l, right = r)
}

case class CmsTotal(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "freq_total"
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    CountMinSketch.deserialize(v.asInstanceOf[Array[Byte]]).total
  override protected def withNewChildInternal(c: Expression): CmsTotal = copy(child = c)
}

/** freq_norm(cms_state, value) → estimated frequency in [0,1]. */
case class CmsFreqNorm(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "freq_norm"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(state: Any, value: Any): Any =
    CountMinSketch.deserialize(state.asInstanceOf[Array[Byte]]).estimateNorm(value)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsFreqNorm =
    copy(left = l, right = r)
}

/** dist_quantile(tdigest_state, q) → value at quantile q. */
case class DistQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "dist_quantile"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(state: Any, q: Any): Any =
    TDigest.deserialize(state.asInstanceOf[Array[Byte]]).quantile(SketchAgg.toDouble(q))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DistQuantile =
    copy(left = l, right = r)
}

/** dist_cdf(tdigest_state, x) → fraction of mass ≤ x. */
case class DistCdf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "dist_cdf"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(state: Any, x: Any): Any =
    TDigest.deserialize(state.asInstanceOf[Array[Byte]]).cdf(SketchAgg.toDouble(x))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DistCdf =
    copy(left = l, right = r)
}

/** topk_values(topk_state) → array<string> of the top-k values. */
case class TopKValues(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "topk_values"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val top = SpaceSaving.deserialize(v.asInstanceOf[Array[Byte]]).topK
    new GenericArrayData(top.map { case (b, _, _) => UTF8String.fromBytes(b) }.toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): TopKValues = copy(child = c)
}

/** topk_freqs(topk_state) → array<bigint> of the top-k estimated counts. */
case class TopKFreqs(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "topk_freqs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val top = SpaceSaving.deserialize(v.asInstanceOf[Array[Byte]]).topK
    new GenericArrayData(top.map(_._2).toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): TopKFreqs = copy(child = c)
}

/** topk(topk_state) → map<string, bigint> value → estimated count. */
case class TopKMap(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "topk"
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val top = SpaceSaving.deserialize(v.asInstanceOf[Array[Byte]]).topK
    new ArrayBasedMapData(
      new GenericArrayData(top.map { case (b, _, _) => UTF8String.fromBytes(b) }.toArray[Any]),
      new GenericArrayData(top.map(_._2).toArray[Any]))
  }
  override protected def withNewChildInternal(c: Expression): TopKMap = copy(child = c)
}

/** Scalar sketch mutators: <sketch>_add(state, value) — add one element to
  * a serialized state outside aggregation (reference hll_add, bloom_add,
  * freq_add, dist_add, topk_increment — sql:1095-2438). A NULL state means
  * "start from an empty sketch" (reference behavior); a NULL value returns
  * the state unchanged. The matching <sketch>_empty() constructors are
  * registered as plain binary literals of the serialized empty state.
  */
case class SketchAdd(left: Expression, right: Expression, kind: String)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = s"${kind}_add"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val state = left.eval(input)
    val value = right.eval(input)
    if (value == null && state != null) return state
    val bytes = Option(state).map(_.asInstanceOf[Array[Byte]])
    kind match {
      case "hll" =>
        val s = bytes.map(HyperLogLog.deserialize).getOrElse(HyperLogLog.empty())
        if (value != null) s.add(value)
        s.serialize()
      case "bloom" =>
        val s = bytes.map(BloomFilter.deserialize).getOrElse(BloomFilter.empty())
        if (value != null) s.add(value)
        s.serialize()
      case "freq" =>
        val s = bytes.map(CountMinSketch.deserialize).getOrElse(CountMinSketch.empty())
        if (value != null) s.add(value)
        s.serialize()
      case "dist" =>
        val s = bytes.map(TDigest.deserialize).getOrElse(TDigest.empty())
        if (value != null) s.add(SketchAgg.toDouble(value))
        s.serialize()
      case "topk" =>
        val s = bytes.map(SpaceSaving.deserialize).getOrElse(SpaceSaving.empty())
        if (value != null) s.add(value)
        s.serialize()
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SketchAdd =
    copy(left = l, right = r)
}

/** <sketch>_print(state) → compact text description (reference *_print). */
case class SketchPrint(child: Expression, kind: String)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = s"${kind}_print"
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val txt = kind match {
      case "hll" =>
        val s = HyperLogLog.deserialize(bytes)
        s"hll { cardinality: ${s.cardinality}, bytes: ${bytes.length} }"
      case "bloom" =>
        val s = BloomFilter.deserialize(bytes)
        s"bloom { cardinality: ${s.cardinality}, bytes: ${bytes.length} }"
      case "freq" =>
        val s = CountMinSketch.deserialize(bytes)
        s"cmsketch { total: ${s.total}, bytes: ${bytes.length} }"
      case "dist" =>
        val s = TDigest.deserialize(bytes)
        s"tdigest { p50: ${s.quantile(0.5)}, bytes: ${bytes.length} }"
      case "topk" =>
        val s = SpaceSaving.deserialize(bytes)
        val entries = s.topK.map { case (b, c, _) =>
          s"${new String(b, "UTF-8")}:$c"
        }.mkString(", ")
        s"topk { $entries }"
    }
    UTF8String.fromString(txt)
  }
  override protected def withNewChildInternal(c: Expression): SketchPrint = copy(child = c)
}
