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
}
