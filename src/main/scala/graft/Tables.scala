package graft

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the driver's testdata tables (TESTDATA.md).
  *
  * `events.ts` is an INT64 column whose epoch unit has changed across
  * testdata generations (raw nanos in early rounds, TIMESTAMP(µs) now).
  * Rather than pin an assumption, `read` derives the unit from the parquet
  * footer's logical-type annotation (one cached footer read per dataset)
  * and normalizes `ts` to **epoch microseconds** (LongType). Every consumer
  * can rely on that contract; `TestdataContractSpec` asserts it against the
  * live fixtures. Pinning the read schema also skips footer schema merging —
  * at 100 TB that's thousands of footer reads avoided.
  */
object Tables {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // raw int64; unit normalized in read()
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val tsUnitCache = TrieMap.empty[String, TimeUnit]

  /** Epoch unit of `events.ts` under `dir`, from the parquet footer.
    * A plain (unannotated) INT64 is treated as nanos — the unit the
    * driver's generator used before it switched to TIMESTAMP(µs).
    */
  private[graft] def tsUnit(s: SparkSession, dir: String): TimeUnit =
    tsUnitCache.getOrElseUpdate(dir, {
      val conf = s.sessionState.newHadoopConf()
      val p = new Path(s"$dir/events.parquet")
      val fs = p.getFileSystem(conf)
      val file =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).map(_.getPath)
            .filter(_.getName.endsWith(".parquet"))
            .minBy(_.getName.toString)
        else p
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        reader.getFooter.getFileMetaData.getSchema.getType(Seq("ts"): _*)
          .asPrimitiveType().getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit
          case _ => TimeUnit.NANOS
        }
      } finally reader.close()
    })

  def read(s: SparkSession, dir: String, table: String): DataFrame =
    if (table == "events") {
      val raw = s.read.schema(eventsSchema).parquet(s"$dir/events.parquet")
      tsUnit(s, dir) match {
        case TimeUnit.MICROS => raw
        case TimeUnit.NANOS  => raw.withColumn("ts", expr("ts div 1000"))
        case TimeUnit.MILLIS => raw.withColumn("ts", expr("ts * 1000"))
      }
    } else
      s.read.parquet(s"$dir/$table.parquet")
}
