package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: a size-k min-heap of (score, id) keeping the k
  * BEST pairs under (score desc, id asc) — the heap root is the current
  * worst survivor, evicted when a better pair arrives. O(log k) per row,
  * O(k) memory, merge = offer-all (associative + commutative). */
final class TopKHeap(val k: Int) {
  // worst-first ordering: lowest score (then largest id) at the root
  private val worstFirst = new java.util.Comparator[Array[Long]] {
    override def compare(a: Array[Long], b: Array[Long]): Int = {
      val sa = java.lang.Double.longBitsToDouble(a(0))
      val sb = java.lang.Double.longBitsToDouble(b(0))
      val c = java.lang.Double.compare(sa, sb)
      if (c != 0) c else java.lang.Long.compare(b(1), a(1))
    }
  }
  private val heap = new java.util.PriorityQueue[Array[Long]](k.max(1), worstFirst)

  def offer(score: Double, id: Long): Unit = {
    val e = Array(java.lang.Double.doubleToLongBits(score), id)
    if (heap.size < k) { heap.add(e); () }
    else if (worstFirst.compare(heap.peek(), e) < 0) { heap.poll(); heap.add(e); () }
  }

  def mergeInto(other: TopKHeap): TopKHeap = {
    val it = heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      other.offer(java.lang.Double.longBitsToDouble(e(0)), e(1))
    }
    other
  }

  /** Contents best-first: (score desc, id asc). */
  def sorted: Array[(Double, Long)] = {
    val arr = new Array[(Double, Long)](heap.size)
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      arr(i) = (java.lang.Double.longBitsToDouble(e(0)), e(1)); i += 1
    }
    arr.sortBy { case (s, id) => (-s, id) }
  }
}

/** Single-pass grouped top-k — `groupBy(g).agg(topk_by_score(score, id,
  * k))` — as a native [[TypedImperativeAggregate]].
  *
  * Why this beats the rank-window formulation (`row_number() OVER
  * (PARTITION BY g ORDER BY score DESC) <= k`) at scale: WindowExec must
  * shuffle and SORT every scored row of a group before emitting rank 1,
  * so a kNN scoring join's entire output (|queries|·|candidates| rows)
  * crosses the wire. This aggregate keeps a k-element heap per group,
  * combines map-side like any partial aggregate, and ships exactly k
  * rows per group through the exchange — O(n log k) work, O(k) state,
  * no sort. Same trick Spark's own `percentile_approx`/`collect_set`
  * family uses (TypedImperativeAggregate with a serialized buffer).
  *
  * Determinism: ties on score resolve to the smaller id, matching the
  * `(desc(score), asc(id))` window ordering everywhere else in graft —
  * results are row-identical to the window form (pinned in ScalaTest,
  * DuckDB-oracle-checked via s07). */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap]
  with BinaryLike[Expression] {

  require(k > 0, s"topk_by_score requires k > 0 (got $k)")

  override def left: Expression = score
  override def right: Expression = id
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (DOUBLE score, BIGINT id), got " +
          s"${s.catalogString} and ${i.catalogString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    // null score or id: the pair is unrankable — skip, like agg functions
    // ignore nulls, rather than poison the whole group
    if (s != null && i != null) {
      buffer.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKHeap, input: TopKHeap): TopKHeap =
    input.mergeInto(buffer)

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val items = buffer.sorted
    val bb = ByteBuffer.allocate(8 + items.length * 16)
    bb.putInt(buffer.k).putInt(items.length)
    items.foreach { case (s, i) => bb.putDouble(s).putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    (0 until n).foreach(_ => heap.offer(bb.getDouble(), bb.getLong()))
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(score = newLeft, id = newRight)
}
