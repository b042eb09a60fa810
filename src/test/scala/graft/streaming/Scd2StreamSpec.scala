package graft.streaming

import graft.SparkSpec
import graft.core.Cdc
import graft.merge.Scd2
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Resident-stream SCD2: [[Scd2.merge]] driven through foreachBatch
  * micro-batch boundaries must land on exactly the history the one-shot
  * [[Scd2.build]] produces over the same events — the build/merge
  * equivalence Scd2Spec proves in batch, here across real trigger
  * boundaries with a parquet-persisted history between triggers (the
  * deployment shape: history is a table, not a cached frame). */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch Scd2.merge over triggers == one-shot build") {
    val events = Seq(
      (1, 10L, "a1", Cdc.OpCreate), (2, 11L, "b1", Cdc.OpCreate),
      (1, 20L, "a2", Cdc.OpUpdate), (2, 25L, "b1", Cdc.OpDelete),
      (3, 30L, "c1", Cdc.OpCreate), (2, 40L, "b2", Cdc.OpCreate),
      (1, 45L, "a3", Cdc.OpUpdate))
    val batches = events.grouped(3).toSeq
    val dir = java.nio.file.Files
      .createTempDirectory("graft-scd2-stream").toString
    val histPath = s"$dir/history"
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Int, Long, String, String)]
    val q = mem.toDF().toDF("pk", "ver", "v", Cdc.OperationColumn)
      .writeStream
      .option("checkpointLocation", s"$dir/_ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val next =
          if (!new java.io.File(histPath).exists())
            Scd2.build(df, Seq("pk"), "ver")
          else
            Scd2.merge(spark.read.parquet(histPath), df, Seq("pk"), "ver")
        // shadow-write + swap so the read above never races the write
        next.write.mode("overwrite").parquet(s"$histPath.next")
        val (cur, nxt) = (new java.io.File(histPath),
          new java.io.File(s"$histPath.next"))
        if (cur.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
          }
          rm(cur)
        }
        assert(nxt.renameTo(cur))
        ()
      }
      .start()
    try batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    val streamed = spark.read.parquet(histPath)
      .select("pk", "valid_from", "valid_to", "is_current", "v")
      .as[(Int, Long, Option[Long], Boolean, String)].collect().toSet
    val oneShot = Scd2.build(
      events.toDF("pk", "ver", "v", Cdc.OperationColumn), Seq("pk"), "ver")
      .select("pk", "valid_from", "valid_to", "is_current", "v")
      .as[(Int, Long, Option[Long], Boolean, String)].collect().toSet
    assert(streamed == oneShot)
    assert(streamed.contains((2, 11L, Some(25L), false, "b1")))
    assert(streamed.contains((2, 40L, None, true, "b2")))
  }
}
