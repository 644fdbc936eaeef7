package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Native h-index aggregate: over a group of LONG values, the largest
  * h such that at least h of the values are ≥ h (Hirsch's index — the
  * inner step of the iterated-h-index k-core fixpoint, Lü et al.
  * 2016).
  *
  * Why a custom aggregate instead of composed operators: the k-core
  * step needs, per node, a fold over its neighbours' current values.
  * A `collect_list` fold materializes an O(degree) row (the r11 skew
  * hazard); the two-stage count/fold rewrite bounds the row but pays
  * a SECOND exchange per step. This aggregate gets both properties at
  * once — the buffer is a sparse value→count histogram (bounded by
  * the group's DISTINCT values ≤ min(degree, O(√(2|E|))), since k
  * distinct positive values each backed by a node of degree ≥ its
  * value force Σvalues ≤ 2|E|), and because it is a regular
  * [[TypedImperativeAggregate]] it PARTIAL-aggregates map-side
  * (Spark's BloomFilterAggregate/HLL pattern): a 10⁷-degree hub's
  * same-valued spokes collapse into one histogram entry per map
  * partition before the single exchange. All-integer — exact,
  * order-free, deterministic under any partitioning.
  *
  * Nulls are ignored (SQL aggregate convention); an all-null or empty
  * group evaluates to 0 — for the k-core use every node carries at
  * least its self-row, so the 0 case never reaches the fixpoint
  * arithmetic.
  */
case class HIndexAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Long, Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"h_index expects bigint, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "h_index"

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]()

  override def update(buffer: java.util.HashMap[Long, Long],
      input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) buffer.merge(v.asInstanceOf[Long], 1L, Math.addExact _)
    buffer
  }

  override def merge(buffer: java.util.HashMap[Long, Long],
      other: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buffer.merge(e.getKey, e.getValue, Math.addExact _)
    }
    buffer
  }

  /** h = max over distinct values v (descending) of min(v, #values ≥ v)
    * — the histogram walk; only values > current h can still raise it,
    * so the walk is a simple sorted pass. */
  override def eval(buffer: java.util.HashMap[Long, Long]): Any = {
    val keys = new Array[Long](buffer.size())
    val it = buffer.keySet().iterator()
    var i = 0
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys)
    var h = 0L
    var cum = 0L
    var j = keys.length - 1
    while (j >= 0) {
      cum += buffer.get(keys(j))
      val cand = math.min(keys(j), cum)
      if (cand > h) h = cand
      j -= 1
    }
    h
  }

  override def serialize(buffer: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buffer.size())
    bb.putInt(buffer.size())
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[Long, Long](math.max(4, n * 2))
    var i = 0
    while (i < n) {
      m.put(bb.getLong, bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HIndexAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HIndexAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HIndexAgg =
    copy(child = newChild)
}
