package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._

/** HLL register aggregation as a custom `TypedImperativeAggregate`: the
  * buffer IS the m-int register array, updated in place per row and
  * merged by elementwise max. One group-keyed shuffle moving exactly one
  * m-int buffer per (mapper, group) — replaces the explode-to-
  * (group, register) formulation, which shuffled m ROWS per group twice
  * ((group, reg) max, then group reassembly). Hot groups are no longer a
  * skew concern at all: map-side partials bound the reduce fan-in by
  * partition count, not row count.
  *
  * Register semantics are BIT-IDENTICAL to the column-expression path
  * (`Sketches.regOf`/`rankOf` over the portable md5 h60): reg = low p
  * bits, rank = (61−p) − bitLength(h >>> p), so the SQL oracles that
  * replay sketch training stay valid unchanged.
  *
  * @param fromSketch false: input is an h60 hash LONG (build path);
  *                   true: input is an existing array<int> sketch
  *                   (merge path — the "union per-day sketches" agg).
  */
final case class HllRegisterAgg(
    child: Expression,
    p: Int,
    fromSketch: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  private val m = 1 << p
  private val rankCap = 61 - p

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(buf: Array[Int], input: org.apache.spark.sql.catalyst.InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      if (fromSketch) {
        val arr = v.asInstanceOf[ArrayData]
        require(arr.numElements() == m,
          s"hll union: sketch has ${arr.numElements()} registers, " +
            s"expected $m (p mismatch between build and merge)")
        var i = 0
        while (i < m) {
          val r = arr.getInt(i)
          if (r > buf(i)) buf(i) = r
          i += 1
        }
      } else {
        val h = v.asInstanceOf[Long]
        val reg = (h & (m - 1)).toInt
        val w = h >>> p
        val rank =
          if (w == 0L) rankCap
          else rankCap - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rank > buf(reg)) buf(reg) = rank
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Int]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * m)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(m)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): HllRegisterAgg = copy(child = newChild)
}

object HllAggExprs {
  /** Build a sketch from h60 hash longs — one agg, buffer-merged. */
  def hllFromHashes(hash: Column, p: Int): Column =
    Shims.column(
      HllRegisterAgg(Shims.expression(hash), p, fromSketch = false)
        .toAggregateExpression())

  /** Union existing array<int> sketches — one agg, buffer-merged. */
  def hllUnion(sketch: Column, p: Int): Column =
    Shims.column(
      HllRegisterAgg(Shims.expression(sketch), p, fromSketch = true)
        .toAggregateExpression())
}
