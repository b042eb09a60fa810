package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Source-format coverage beyond the core parquet/NDJSON.gz/Avro/JDBC
  * paths: raw-file ingestion for media payloads and ORC interchange. */
class FormatsSpec extends SparkSpec {

  test("binaryFile source ingests raw media files with metadata") {
    val dir = Files.createTempDirectory("binsrc")
    Files.write(dir.resolve("a.img"), Array[Byte](1, 2, 3, 4))
    Files.write(dir.resolve("b.img"), Array[Byte](9, 8))

    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.img")
      .load(dir.toString)
      .select(col("path"), col("length"), col("content"))
    val rows = df.collect().map(r =>
      (r.getString(0).split('/').last, r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq)).sortBy(_._1).toSeq
    assert(rows == Seq(
      ("a.img", 4L, Seq[Byte](1, 2, 3, 4)),
      ("b.img", 2L, Seq[Byte](9, 8))))
    // the shape Multimodal consumes: (id, media binary)
    val media = df.select(col("path").as("media_id"),
      col("content").as("media"))
    assert(media.schema("media").dataType.typeName == "binary")
  }

  test("ORC round-trip preserves schema and values") {
    import spark.implicits._
    val dir = Files.createTempDirectory("orcrt").toString
    val df = Seq((1L, "a", 1.5), (2L, null.asInstanceOf[String], -0.25))
      .toDF("id", "s", "v")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // ORC readers surface everything nullable — names/types round-trip
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
  }

  test("parquet zstd write option round-trips") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zstdrt").toString
    val df = (1 to 1000).map(i => (i.toLong, s"row-$i")).toDF("id", "s")
    df.write.mode("overwrite").option("compression", "zstd").parquet(dir)
    assert(Files.list(Paths.get(dir)).toArray.map(_.toString)
      .exists(_.endsWith(".zstd.parquet")))
    assert(spark.read.parquet(dir).count() == 1000)
  }
}
