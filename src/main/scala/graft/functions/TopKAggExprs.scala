package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a custom `TypedImperativeAggregate` — the
  * small-k fast path for per-group deterministic draws.
  *
  * [[graft.ops.Ranks.grouped]] (the two-pass rank) range-shuffles the
  * WHOLE corpus because it must rank every row. When the consumer only
  * keeps the k smallest keys per group (stratified sampling at k=20,
  * top-k per source), that is waste: a bounded heap with map-side
  * partial aggregation ships AT MOST k (key, payload) pairs per
  * (mapper, group) through the shuffle — O(partitions × groups × k)
  * wire bytes instead of the corpus. The classic
  * aggregate-vs-sort crossover: small k → this; rank-ALL semantics or
  * large k → the two-pass rank.
  *
  * Buffer: a TreeSet of (key, payload) pairs ordered lexicographically,
  * capped at k by rejecting anything not smaller than the current max
  * (same bounded-insert discipline as [[KmvSketchAgg]]). Output: the
  * ascending array<struct<k,long v,long>> — a valid per-group result
  * ANY engine replays with `row_number() OVER (ORDER BY key, payload)
  * <= k` (both columns in the order ⇒ total order ⇒ exact parity).
  * Null keys/payloads are skipped (SQL aggregate discipline) and
  * duplicate (key, payload) pairs collapse in the TreeSet — BOTH diverge
  * from `row_number` semantics, so callers that promise rank parity must
  * guard ids non-null and distinct
  * ([[graft.ops.Sampling.stratifiedTopK]] raises on null/non-castable).
  */
final case class TopKPairsAgg(
    key: Expression,
    payload: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def left: Expression = key
  override def right: Expression = payload

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  private implicit val ord: Ordering[(Long, Long)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Long)

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](ord)

  private def add(buf: java.util.TreeSet[(Long, Long)],
      e: (Long, Long)): Unit = {
    if (buf.size() < k) { buf.add(e); () }
    else if (ord.lt(e, buf.last())) {
      if (buf.add(e)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[(Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val kv = key.eval(input)
    val pv = payload.eval(input)
    if (kv != null && pv != null)
      add(buf, (kv.asInstanceOf[Long], pv.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[(Long, Long)],
      other: java.util.TreeSet[(Long, Long)])
      : java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val out = new Array[Any](buf.size())
    var i = 0
    val it = buf.iterator() // ascending
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e._1, e._2)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e._1); bb.putLong(e._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new java.util.TreeSet[(Long, Long)](ord)
    var i = 0
    while (i < n) { buf.add((bb.getLong(), bb.getLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairsAgg =
    copy(key = newLeft, payload = newRight)
}

object TopKAggExprs {
  /** Bottom-k (key, payload) pairs per group — ascending
    * array<struct<k,v>>, ≤ k pairs per (mapper, group) on the wire. */
  def topKPairs(key: Column, payload: Column, k: Int): Column =
    Shims.column(
      TopKPairsAgg(Shims.expression(key), Shims.expression(payload), k)
        .toAggregateExpression())
}
