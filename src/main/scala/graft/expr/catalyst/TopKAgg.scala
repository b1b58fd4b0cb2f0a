package graft.expr.catalyst

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** `topk_structs(elem, k)` — the `k` SMALLEST values of `elem` per
  * group (any orderable type; in practice a struct whose leading fields
  * are the sort key), returned as an ascending array.
  *
  * This is the aggregate that makes a top-k-per-group computation
  * STREAMING instead of enumerate-then-cap: a `row_number() <= k`
  * window must buffer (or at best partially pre-limit) the group's
  * candidate rows around a sort, whereas an aggregate folds each
  * candidate into a k-bounded buffer the moment it is produced —
  * per-group state is k values, the candidate stream is never
  * materialized, and partial aggregation (map-side combine) means a
  * shuffle carries at most k values per group per map task no matter
  * how many candidates a group has. That bound is what
  * [[graft.operators.RangeJoin.pointInIntervalTopKSweep]] rides in the
  * densification regime, where candidates per point grow with the
  * corpus (docs/SCALING.md measured the uncapped pair stream at
  * exponent 2.09).
  *
  * The buffer is a max-at-head priority queue under the element type's
  * interpreted ordering: insert while under k, then admit a candidate
  * only if it beats the current worst (one comparison per candidate —
  * no copy unless admitted). `merge` replays one buffer into the other
  * under the same bound, so partial and final aggregation keep the
  * invariant. `eval` sorts the ≤ k survivors ascending.
  *
  * Ties: the ordering is the element type's total order over ALL
  * fields, so equal sort-key prefixes fall through to the remaining
  * fields and the kept set is deterministic — stronger than a window
  * `row_number`, whose tie choice is partition-order-dependent.
  *
  * Cost note: one TypedImperativeAggregate in an aggregation forces
  * the whole aggregate to `ObjectHashAggregate`, which falls back to
  * SORT-based aggregation past
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * (default 128) distinct keys per task — the fallback is an external
  * (spillable) sort of the map-side input, so memory stays bounded
  * either way; raise the threshold when point keys per task are modest
  * and the hash path should be kept.
  */
case class TopKStructsAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]]
  with BinaryLike[Expression] {

  override def prettyName: String = "topk_structs"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!kExpr.foldable || kExpr.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable INT k, got ${kExpr.sql}")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Int] <= 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires k > 0, got ${kExpr.sql}")
    else if (!RowOrdering.isOrderable(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName element type ${child.dataType.catalogString} is not orderable")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]
  private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  // Scala's PriorityQueue dequeues the LARGEST under its ordering, so
  // head is always the current worst kept value — the eviction victim
  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    new mutable.PriorityQueue[Any]()(ordering)

  // values handed to update/deserialize may be views into reused or
  // transient buffers (UnsafeRow pointers); kept values must own bytes
  private def copyValue(v: Any): Any = v match {
    case r: InternalRow => r.copy()
    case a: ArrayData => a.copy()
    case s: UTF8String => s.clone()
    case x => x
  }

  private def insert(buf: mutable.PriorityQueue[Any], v: Any): Unit =
    if (buf.size < k) buf += copyValue(v)
    else if (ordering.lt(v, buf.head)) {
      buf.dequeue()
      buf += copyValue(v)
    }

  override def update(buf: mutable.PriorityQueue[Any],
      input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v)
    buf
  }

  override def merge(b1: mutable.PriorityQueue[Any],
      b2: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    b2.foreach(insert(b1, _)) // already copied at admission
    b1
  }

  override def eval(buf: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(ordering))

  private lazy val serProj =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: mutable.PriorityQueue[Any]): Array[Byte] =
    serProj(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, v) => insert(buf, v))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKStructsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKStructsAgg =
    copy(inputAggBufferOffset = offset)
  override def left: Expression = child
  override def right: Expression = kExpr
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TopKStructsAgg =
    copy(child = l, kExpr = r)
}
