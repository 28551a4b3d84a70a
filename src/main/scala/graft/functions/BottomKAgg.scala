package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded smallest-k buffer: a max-heap of the k smallest values seen, so
  * per-group aggregation state is O(k) at EVERY stage — update, shuffle,
  * merge — regardless of group size. This is the scale-correct backing for
  * `first_values(n)` (reference first_values / aggfuncs.c mergeable top-n)
  * and for deterministic stratified sampling: the alternative
  * `slice(sort_array(collect_list(x)), 1, k)` materializes the ENTIRE group
  * in one aggregation buffer before slicing, which for a 100-TB stratum is
  * billions of entries in memory.
  */
final class BottomKBuffer(val k: Int, val ord: Ordering[Any]) {
  // head = LARGEST of the kept k (reverse order), so cap checks are O(1)
  private val heap = new java.util.PriorityQueue[Any](math.max(1, k), ord.reverse)
  def size: Int = heap.size
  def add(v: Any): Unit =
    if (heap.size < k) heap.add(v)
    else if (k > 0 && ord.lt(v, heap.peek())) { heap.poll(); heap.add(v) }
  /** [[add]] with the (deep) copy DEFERRED until admission: once the
    * buffer is full, the common case is a one-comparison rejection, and
    * copying every candidate first (the r18 spelling) made the per-row
    * update cost a full struct copy even for the ~100% of rows the kth
    * bound rejects (round 19; the multi-top-k rank stage's dominant
    * per-row term). The uncopied value is only COMPARED, never retained,
    * so a reused backing buffer is safe. */
  def addLazy(v: Any, copy: Any => Any): Unit =
    if (heap.size < k) heap.add(copy(v))
    else if (k > 0 && ord.lt(v, heap.peek())) { heap.poll(); heap.add(copy(v)) }
  def foreach(f: Any => Unit): Unit = heap.forEach(v => f(v))
  /** Ascending order — the contract of first_values / bottom-k sampling. */
  def sortedAsc: Array[Any] = {
    val a = heap.toArray
    java.util.Arrays.sort(a, ord.asInstanceOf[java.util.Comparator[Any]])
    a
  }
}

/** bottom_k(x, k) → array of the k smallest x per group (ascending), as a
  * mergeable O(k) state. `flattenInput = true` treats the child as an array
  * whose ELEMENTS feed the buffer — the re-aggregation spelling used when
  * merging stored partial states (`combine(first_values_state)`), where each
  * input row is itself a ≤k array.
  */
case class BottomKAgg(
    child: Expression,
    k: Int,
    flattenInput: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKBuffer] with UnaryLike[Expression] {

  require(k >= 0, s"bottom_k: k must be >= 0, got $k")

  private lazy val elementType: DataType = child.dataType match {
    case ArrayType(et, _) if flattenInput => et
    case dt if flattenInput =>
      throw new IllegalArgumentException(s"bottom_k(flatten): array input required, got $dt")
    case dt => dt
  }
  // struct elements (the multi-top-k (−score, doc_id) pair) get a
  // CODEGEN'D ordering: the interpreted struct ordering boxes both sides'
  // fields per comparison, and the heap does one comparison per input row
  // (round 19). Scalar elements keep the interpreted natural ordering
  // (primitive compare — nothing to win). Semantics identical: field-wise
  // ascending, nulls first — exactly InterpretedOrdering's.
  @transient private lazy val ord: Ordering[Any] = elementType match {
    case st: StructType =>
      import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, SortOrder}
      new org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering(
        st.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
          SortOrder(BoundReference(i, f.dataType, f.nullable), Ascending)
        }).asInstanceOf[Ordering[Any]]
    case _ => TypeUtils.getInterpretedOrdering(elementType)
  }
  @transient private lazy val serProj = UnsafeProjection.create(Array(elementType))
  @transient private lazy val serRow = new UnsafeRow(1)

  override def prettyName: String = "bottom_k"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(elementType, containsNull = false)

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k, ord)

  override def update(b: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      if (flattenInput) {
        val arr = v.asInstanceOf[ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          val e = arr.get(i, elementType)
          if (e != null) b.addLazy(e, InternalRow.copyValue)
          i += 1
        }
      } else b.addLazy(v, InternalRow.copyValue)
    }
    b
  }

  override def merge(b: BottomKBuffer, o: BottomKBuffer): BottomKBuffer = {
    o.foreach(b.add); b
  }

  override def eval(b: BottomKBuffer): Any = new GenericArrayData(b.sortedAsc)

  override def serialize(b: BottomKBuffer): Array[Byte] = {
    // length-prefixed UnsafeRow bytes per element, ascending. getBytes can
    // return the projection's REUSED backing buffer, so clone per element.
    val rows = b.sortedAsc.map { v =>
      val r = serProj(InternalRow(v)); r.getBytes().clone()
    }
    val out = ByteBuffer.allocate(8 + rows.map(_.length + 4).sum)
    out.putInt(b.k).putInt(rows.length)
    rows.foreach { r => out.putInt(r.length); out.put(r) }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val in = ByteBuffer.wrap(bytes)
    val bufK = in.getInt; val n = in.getInt
    val b = new BottomKBuffer(bufK, ord)
    var i = 0
    while (i < n) {
      val len = in.getInt
      val arr = new Array[Byte](len)
      in.get(arr)
      serRow.pointTo(arr, len)
      b.add(InternalRow.copyValue(serRow.get(0, elementType)))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BottomKAgg = copy(child = c)
}
