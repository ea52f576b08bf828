package graft.functions

import java.util.Comparator

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Distinct-set aggregate with a HARD buffer bound: keeps only the
  * `limit + 1` smallest distinct values of the group (the +1 sentinel lets
  * callers detect truncation via `size(result) > limit`), sorted ascending.
  *
  * This is the scale-safe replacement for
  * `slice(sort_array(collect_set(c)), 1, K)`: that formulation bounds only
  * the OUTPUT — `collect_set`'s aggregation buffer still grows O(distinct
  * values in the group), so one hot key with 10^9 distinct `many`-edge
  * values OOMs the executor before the slice ever runs (the pattern SURVEY
  * §4 warns about, and the one the round-2 verdict flagged as the last
  * unbounded buffer in the engine). Here the buffer itself never exceeds
  * `limit + 1` elements, partial aggregation (map-side combine) works as
  * usual, and merge is a bounded set union.
  *
  * Array-typed children are flattened: each non-null ELEMENT joins the set
  * (matching the reference's per-value semantics,
  * kyepy loader.py:157-159 `explode().dropna().nunique()`); null inputs and
  * null elements are skipped like `collect_set`.
  *
  * Output order is ascending (the element type's natural ordering) —
  * bit-identical to `sort_array(collect_set(c))` whenever the group has
  * ≤ limit distinct values.
  */
case class BoundedDistinctSet(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Any]] with UnaryLike[Expression] {

  require(limit >= 1, "limit must be >= 1")

  // lazy: the child is unresolved when the Column-API constructor runs
  private lazy val elementType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case dt => dt
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (RowOrdering.isOrderable(elementType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_distinct_set requires an orderable element type, got $elementType")

  override def dataType: DataType = ArrayType(elementType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_distinct_set"

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elementType)

  override def createAggregationBuffer(): java.util.TreeSet[Any] =
    new java.util.TreeSet[Any](new Comparator[Any] {
      override def compare(a: Any, b: Any): Int = ordering.compare(a, b)
    })

  /** Insert with the capacity bound: dedup via the tree's comparator, copy
    * only on actual insert of a non-owned value (update inputs may be
    * unsafe-row-backed; merge/deserialize values were already defensively
    * copied — re-copying them would allocate per merged element on the
    * hot combine path), evict the current max when full and the newcomer
    * is smaller. */
  private def add(buf: java.util.TreeSet[Any], v: Any, owned: Boolean = false): Unit = {
    if (buf.contains(v)) return
    if (buf.size() <= limit) { // capacity limit + 1
      buf.add(if (owned) v else InternalRow.copyValue(v))
    } else if (ordering.compare(v, buf.last()) < 0) {
      buf.add(if (owned) v else InternalRow.copyValue(v))
      buf.pollLast()
    }
  }

  // plan-time property, hoisted: matching child.dataType per input row
  // would re-walk the expression tree on the aggregate hot path
  @transient private lazy val childIsArray: Boolean =
    child.dataType.isInstanceOf[ArrayType]

  override def update(buf: java.util.TreeSet[Any], input: InternalRow): java.util.TreeSet[Any] = {
    val v = child.eval(input)
    if (v != null) {
      if (childIsArray) {
        val arr = v.asInstanceOf[ArrayData]
        var i = 0
        val n = arr.numElements()
        while (i < n) {
          if (!arr.isNullAt(i)) add(buf, arr.get(i, elementType))
          i += 1
        }
      } else add(buf, v)
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[Any], other: java.util.TreeSet[Any]): java.util.TreeSet[Any] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next(), owned = true)
    buf
  }

  override def eval(buf: java.util.TreeSet[Any]): Any =
    new GenericArrayData(buf.toArray) // TreeSet iterates ascending

  @transient private lazy val proj =
    UnsafeProjection.create(Array[DataType](ArrayType(elementType, containsNull = false)))

  override def serialize(buf: java.util.TreeSet[Any]): Array[Byte] =
    proj(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      // copy: the array is backed by `bytes`, which the caller may reuse
      buf.add(InternalRow.copyValue(arr.get(i, elementType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedDistinctSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedDistinctSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedDistinctSet =
    copy(child = newChild)
}

object BoundedDistinctSet {
  /** Column API: sorted array of the group's `limit + 1` smallest distinct
    * values (scalars) or distinct non-null elements (array children). */
  def bounded_distinct_set(c: Column, limit: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      BoundedDistinctSet(
        org.apache.spark.sql.GraftExpressionBridge.expression(c), limit)
        .toAggregateExpression())
}
