package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Shims

/** Column surface over Spark's built-in bloom-filter sketch (the engine
  * uses it internally for runtime row-group filtering; the aggregate /
  * probe expressions are not SQL-registered, so this is the library
  * doorway). The sketch is a byte array: a 100 TB corpus's key set folds
  * into megabytes that broadcast to every executor — membership tests
  * then cost zero shuffles, with one-sided error (no false negatives;
  * false-positive rate set by bits/items). */
object Bloom {

  /** Aggregate a LongType column (hash your keys first — see
    * [[graft.ops.Dedup.bloomGate]]) into a serialized bloom filter. */
  def bloomAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    Shims.column(
      new BloomFilterAggregate(Shims.expression(hashed),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe: true = possibly present, false = DEFINITELY absent. */
  def mightContain(bloom: Column, hashed: Column): Column =
    Shims.column(BloomFilterMightContain(
      Shims.expression(bloom), Shims.expression(hashed)))

  /** OR new keys into a serialized sketch: deserialize, put each hash,
    * re-serialize. This is how a long-running ingest keeps ONE sketch
    * current across micro-batches — build once over history, then fold
    * in each batch's survivor hashes (a bounded driver-side array)
    * instead of re-aggregating the full key history every trigger
    * ([[graft.streaming.StreamDedup]]). The aggregate
    * ([[bloomAgg]]/`putLong`) and probe ([[mightContain]]) use the same
    * long-hash path, so updated sketches keep the no-false-negative
    * contract. */
  def update(sketch: Array[Byte], hashedKeys: Iterable[Long]): Array[Byte] = {
    import org.apache.spark.util.sketch.BloomFilter
    val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(sketch))
    hashedKeys.foreach(bf.putLong)
    serialize(bf)
  }

  /** OR two serialized sketches together (they must share the same
    * numBits/expectedItems family — both built by [[bloomAgg]] with the
    * same parameters, e.g. per-partition or per-day sketches). */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    import org.apache.spark.util.sketch.BloomFilter
    val fa = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
    val fb = BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))
    serialize(fa.mergeInPlace(fb))
  }

  private def serialize(
      bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
}
