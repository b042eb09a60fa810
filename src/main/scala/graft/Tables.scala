package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Readers for the driver's testdata tables (TESTDATA.md).
  *
  * `events` is written with INT64 TIMESTAMP(NANOS) which Spark's parquet
  * reader rejects during schema inference, so we pin an explicit schema and
  * read `ts` as raw nanos (LongType); consumers convert with
  * `timestamp_micros(ts div 1000)`. Pinning the schema also skips footer
  * schema merging — at 100 TB that's thousands of footer reads avoided.
  */
object Tables {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos since epoch (see above)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def read(s: SparkSession, dir: String, table: String): DataFrame =
    if (table == "events")
      s.read.schema(eventsSchema).parquet(s"$dir/events.parquet")
    else
      s.read.parquet(s"$dir/$table.parquet")
}
