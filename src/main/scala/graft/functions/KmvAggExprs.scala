package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._

/** KMV (k-minimum-values / bottom-k) distinct-value sketch as a custom
  * `TypedImperativeAggregate`: the buffer is a bounded max-heap of the k
  * smallest DISTINCT hash values seen so far, updated in place per row
  * and merged by bounded union. One group-keyed shuffle moving at most
  * k longs per (mapper, group) — the fixed-size summary that replaces
  * "distinct + sort the whole group" (unbounded per-group state) for
  * set-overlap estimation between corpus sources at 100 TB.
  *
  * The sketch is EXACT-REPLAYABLE: its value is the sorted array of the
  * k smallest distinct [[Portable.h60]] hashes, which any SQL engine
  * reproduces with `row_number() OVER (ORDER BY h) <= k` over the
  * distinct hashes — so KMV-derived overlap estimates get a full DuckDB
  * value oracle, unlike probabilistic-register sketches that need
  * fixed-point replays.
  *
  * Downstream math (see `Dedup.kmvSourceOverlap`): for two sketches
  * A_k, B_k the k-th smallest of A_k ∪ B_k is a threshold τ below which
  * BOTH sets are exactly known, so |{h ∈ A_k ∩ B_k : h ≤ τ}| / k is the
  * standard unbiased Jaccard estimator (Beyer et al., SIGMOD'07).
  *
  * @param child h60 hash LONG input (build path) when `fromSketch` is
  *              false; an existing sorted array<long> sketch (union /
  *              re-merge path) when true.
  */
final case class KmvSketchAgg(
    child: Expression,
    k: Int,
    fromSketch: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(k > 0, s"kmv sketch needs k > 0, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    // bounded insert: reject anything not smaller than the current k-th
    // minimum, so the buffer never exceeds k entries (TreeSet dedups)
    if (buf.size() < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.remove(buf.last()); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: org.apache.spark.sql.catalyst.InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      if (fromSketch) {
        val arr = v.asInstanceOf[ArrayData]
        var i = 0
        val n = arr.numElements()
        while (i < n) { add(buf, arr.getLong(i)); i += 1 }
      } else add(buf, v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    var i = 0
    val it = buf.iterator() // ascending
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): KmvSketchAgg = copy(child = newChild)
}

object KmvAggExprs {
  /** Build a bottom-k sketch from h60 hash longs — one agg, bounded
    * buffers merged map-side. */
  def kmvFromHashes(hash: Column, k: Int): Column =
    Shims.column(
      KmvSketchAgg(Shims.expression(hash), k, fromSketch = false)
        .toAggregateExpression())

  /** Union existing array<long> sketches into one bottom-k sketch —
    * the "merge per-day / per-shard sketches" path. */
  def kmvUnion(sketch: Column, k: Int): Column =
    Shims.column(
      KmvSketchAgg(Shims.expression(sketch), k, fromSketch = true)
        .toAggregateExpression())
}
