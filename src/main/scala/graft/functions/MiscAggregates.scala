package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.sketch.Hashing

/** bucket_agg(x, bucket_id [, ts]) — assigns each distinct value (by 64-bit
  * hash) to the bucket of its latest timestamp (reference aggfuncs.c:462-987,
  * bucket_agg.sql). State: hash → (bucketId, ts); merge keeps the
  * lexicographically-latest (ts, bucketId) per hash, making the merge
  * associative/commutative and the result partitioning-independent.
  * Without a ts argument, the row's position is unknowable under parallel
  * merge, so callers should pass an event-time column (the reference has
  * the same caveat — combine order decides).
  */
final class BucketState extends Serializable {
  // hash → packed (ts, bucketId)
  val entries: mutable.LongMap[(Long, Int)] = mutable.LongMap.empty

  def put(hash: Long, bucketId: Int, ts: Long): Unit = {
    entries.get(hash) match {
      case Some((t0, b0)) if (t0 > ts) || (t0 == ts && b0 >= bucketId) => ()
      case _ => entries.update(hash, (ts, bucketId))
    }
  }
  def mergeWith(o: BucketState): BucketState = {
    o.entries.foreach { case (h, (ts, b)) => put(h, b, ts) }
    this
  }
  def serialize(): Array[Byte] = {
    val ks = entries.keysIterator.toArray
    java.util.Arrays.sort(ks)
    val buf = ByteBuffer.allocate(1 + 4 + ks.length * 20)
    buf.put('K'.toByte).putInt(ks.length)
    ks.foreach { k =>
      val (ts, b) = entries(k)
      buf.putLong(k).putLong(ts).putInt(b)
    }
    buf.array()
  }
  /** bucketId → distinct-value count, sorted by bucketId. */
  def cardinalities: Seq[(Int, Long)] =
    entries.values.groupBy(_._2).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
}

object BucketState {
  def deserialize(bytes: Array[Byte]): BucketState = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.get() == 'K'.toByte, "not a bucket_agg state")
    val n = buf.getInt
    val s = new BucketState
    var i = 0
    while (i < n) {
      val k = buf.getLong; val ts = buf.getLong; val b = buf.getInt
      s.entries.update(k, (ts, b))
      i += 1
    }
    s
  }
}

case class BucketAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BucketState] {
  require(children.length == 2 || children.length == 3,
    "bucket_agg(value, bucket_id [, ts])")
  override def prettyName: String = "bucket_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): BucketState = new BucketState
  override def update(b: BucketState, input: InternalRow): BucketState = {
    val v = children(0).eval(input)
    val bkt = children(1).eval(input)
    if (v != null && bkt != null) {
      val ts = if (children.length == 3) children(2).eval(input) else null
      val tsMicros = ts match {
        case null => 0L
        case l: Long => l
        case i: Int => i.toLong
        case other => other.toString.toLong
      }
      b.put(Hashing.hash64(Hashing.bytesOf(v)), bkt.toString.toDouble.toInt, tsMicros)
    }
    b
  }
  override def merge(b: BucketState, o: BucketState): BucketState = b.mergeWith(o)
  override def eval(b: BucketState): Any = b.serialize()
  override def serialize(b: BucketState): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): BucketState = BucketState.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): BucketAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BucketAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BucketAgg =
    copy(children = c)
}

/** bucket_cardinalities(state) → map<int,bigint> bucketId → distinct count. */
case class BucketCardinalities(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "bucket_cardinalities"
  override def dataType: DataType = MapType(IntegerType, LongType, valueContainsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val cards = BucketState.deserialize(v.asInstanceOf[Array[Byte]]).cardinalities
    new ArrayBasedMapData(
      new GenericArrayData(cards.map(_._1).toArray[Any]),
      new GenericArrayData(cards.map(_._2).toArray[Any]))
  }
  override protected def withNewChildInternal(c: Expression): BucketCardinalities = copy(child = c)
}

/** bucket_merge_agg(state) — merges serialized bucket_agg states (the
  * combine function that makes bucket_agg a stored-state combinable
  * aggregate inside continuous views).
  */
case class BucketMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BucketState]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  override def prettyName: String = "bucket_merge_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): BucketState = new BucketState
  override def update(b: BucketState, input: InternalRow): BucketState = {
    val v = child.eval(input)
    if (v != null) b.mergeWith(BucketState.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def merge(b: BucketState, o: BucketState): BucketState = b.mergeWith(o)
  override def eval(b: BucketState): Any = b.serialize()
  override def serialize(b: BucketState): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): BucketState = BucketState.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): BucketMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BucketMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BucketMergeAgg = copy(child = c)
}

/** json_map_merge_agg(map) — merges map<string,bigint> key-sums states (the
  * combine function for json_object_int_sum in continuous views).
  */
case class JsonMapMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KeySums]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  override def prettyName: String = "json_map_merge_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def createAggregationBuffer(): KeySums = new KeySums
  override def update(b: KeySums, input: InternalRow): KeySums = {
    val v = child.eval(input)
    if (v != null) {
      val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val ks = m.keyArray(); val vs = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        val k = ks.getUTF8String(i).toString
        b.sums(k) = b.sums.getOrElse(k, 0L) + vs.getLong(i)
        i += 1
      }
    }
    b
  }
  override def merge(b: KeySums, o: KeySums): KeySums = b.mergeWith(o)
  override def eval(b: KeySums): Any = {
    val entries = b.sums.toSeq.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(entries.map(_._2).toArray[Any]))
  }
  override def serialize(b: KeySums): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KeySums = KeySums.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): JsonMapMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): JsonMapMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): JsonMapMergeAgg = copy(child = c)
}

/** bucket_cardinality(state, bucket_id) → distinct-value count of ONE bucket
  * (reference bucket_cardinality, sql:2371-2395).
  */
case class BucketCardinalityAt(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def prettyName: String = "bucket_cardinality"
  override def dataType: DataType = LongType
  override def nullSafeEval(state: Any, id: Any): Any = {
    val target = id.toString.toDouble.toInt
    BucketState.deserialize(state.asInstanceOf[Array[Byte]])
      .cardinalities.find(_._1 == target).map(_._2).getOrElse(0L)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BucketCardinalityAt =
    copy(left = l, right = r)
}

/** bucket_ids(state) → array<int> of occupied buckets (ascending). */
case class BucketIds(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "bucket_ids"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(BucketState.deserialize(v.asInstanceOf[Array[Byte]])
      .cardinalities.map(_._1).toArray[Any])
  override protected def withNewChildInternal(c: Expression): BucketIds = copy(child = c)
}

/** Keeps the last entry per key in an array<struct<k,v>> (input should be
  * sorted so "last" is deterministic — greatest value wins per key). Feeds
  * MapFromEntries in json_object_agg: the reference json_object_agg accepts
  * duplicate keys (json.c just concatenates), whereas Spark's default
  * mapKeyDedupPolicy=EXCEPTION would make the query throw at runtime.
  */
case class DedupEntriesByKey(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "dedup_entries_by_key"
  override def dataType: DataType = child.dataType
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val elemType = child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    val keyType = elemType.fields(0).dataType
    val n = arr.numElements()
    // Input is key-sorted (always fed from SortArray), so equal keys are
    // adjacent: keep the LAST of each run, compared with the type's
    // interpreted ordering — a hash map keyed on e.get(0, type) breaks for
    // binary/struct keys, whose JVM equals is reference-based, leaving
    // duplicates for MapFromEntries to throw on.
    val ord = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(keyType)
    def keyAt(i: Int): Any = {
      val e = arr.getStruct(i, elemType.length)
      if (e == null || e.isNullAt(0)) null else e.get(0, keyType)
    }
    def sameKey(a: Any, b: Any): Boolean =
      if (a == null || b == null) a == null && b == null else ord.equiv(a, b)
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      if (i + 1 == n || !sameKey(keyAt(i), keyAt(i + 1)))
        out += arr.getStruct(i, elemType.length)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): DedupEntriesByKey = copy(child = c)
}

/** json_object_int_sum('{"k": n, …}') — sums integer values per key across
  * all input objects (reference json.c json_object_int_sum_transfn).
  * Output: map<string,bigint>.
  */
final class KeySums extends Serializable {
  val sums: mutable.HashMap[String, Long] = mutable.HashMap.empty
  def add(json: String): Unit =
    // minimal flat {"key": int} parser — reference accepts exactly this shape
    """"([^"]+)"\s*:\s*(-?\d+)""".r.findAllMatchIn(json).foreach { m =>
      sums(m.group(1)) = sums.getOrElse(m.group(1), 0L) + m.group(2).toLong
    }
  def mergeWith(o: KeySums): KeySums = {
    o.sums.foreach { case (k, v) => sums(k) = sums.getOrElse(k, 0L) + v }
    this
  }
  def serialize(): Array[Byte] = {
    val entries = sums.toSeq.sortBy(_._1)
    val payload = entries.map { case (k, _) => 4 + k.getBytes("UTF-8").length + 8 }.sum
    val buf = ByteBuffer.allocate(1 + 4 + payload)
    buf.put('J'.toByte).putInt(entries.size)
    entries.foreach { case (k, v) =>
      val kb = k.getBytes("UTF-8")
      buf.putInt(kb.length).put(kb).putLong(v)
    }
    buf.array()
  }
}
object KeySums {
  def deserialize(bytes: Array[Byte]): KeySums = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.get() == 'J'.toByte, "not a json_object_int_sum state")
    val n = buf.getInt
    val s = new KeySums
    var i = 0
    while (i < n) {
      val len = buf.getInt
      val kb = new Array[Byte](len)
      buf.get(kb)
      s.sums(new String(kb, "UTF-8")) = buf.getLong
      i += 1
    }
    s
  }
}

case class JsonIntSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KeySums]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  override def prettyName: String = "json_object_int_sum"
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def createAggregationBuffer(): KeySums = new KeySums
  override def update(b: KeySums, input: InternalRow): KeySums = {
    val v = child.eval(input)
    if (v != null) b.add(v.toString)
    b
  }
  override def merge(b: KeySums, o: KeySums): KeySums = b.mergeWith(o)
  override def eval(b: KeySums): Any = {
    val entries = b.sums.toSeq.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(entries.map(_._2).toArray[Any]))
  }
  override def serialize(b: KeySums): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KeySums = KeySums.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): JsonIntSumAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): JsonIntSumAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): JsonIntSumAgg = copy(child = c)
}
