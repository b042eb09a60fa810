package graft.ops

import java.util.concurrent.atomic.AtomicInteger
import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, "hello world".getBytes("UTF-8")),
    (2L, Array.fill[Byte](2048)(7)),
    (3L, null: Array[Byte])).toDF("id", "media")

  test("metadata struct: typed fields from expressions, null-safe") {
    val m = media.select(col("id"),
      Multimodal.stubMetadata(col("media")).as("meta"))
    assert(m.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSeq ==
      Multimodal.metadataSchema.fieldNames.toSeq)
    val r = m.filter(col("id") === 1).select("meta.byte_len", "meta.width",
      "meta.height", "meta.n_frames").head()
    assert(r.getLong(0) == 11L)
    assert(r.getInt(1) == 11 % 640 + 16)
    assert(r.getInt(2) == (11 / 7) % 480 + 16)
    assert(r.getInt(3) == 1)
    // null payload → null metadata fields
    assert(m.filter(col("id") === 3).select("meta.byte_len").head().isNullAt(0))
  }

  test("extractFeatures: deterministic vectors, codec opened per partition") {
    object CountingCodec extends Multimodal.MediaCodec {
      def open(): Unit = MultimodalSpec.opens.incrementAndGet()
      def close(): Unit = MultimodalSpec.closes.incrementAndGet()
      def imageDims(b: Array[Byte]) = Multimodal.StubCodec.imageDims(b)
      def resize(b: Array[Byte], w: Int, h: Int) =
        Multimodal.StubCodec.resize(b, w, h)
      def features(b: Array[Byte], d: Int) = Multimodal.StubCodec.features(b, d)
    }
    MultimodalSpec.opens.set(0); MultimodalSpec.closes.set(0)
    val in = media.repartition(2)
    val out = Multimodal.extractFeatures(in, "media", dim = 8, CountingCodec)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[collection.Seq[Float]]("features"))
      .toMap
    assert(out(1L) != null && out(1L).length == 8)
    assert(out(3L) == null)
    // determinism: same bytes → same features
    val again = Multimodal.extractFeatures(in, "media", dim = 8, CountingCodec)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[collection.Seq[Float]]("features"))
      .toMap
    assert(out(1L) == again(1L))
    // codec lifecycle: opened once per partition, not per row
    assert(MultimodalSpec.opens.get() == 4) // 2 partitions x 2 runs
  }

  test("resize rewrites the payload deterministically") {
    val out = Multimodal.resize(media, "media", 32, 24, Multimodal.StubCodec)
      .filter(col("id") === 1).select("media").head().getAs[Array[Byte]](0)
    assert(out.length == 12) // 4-byte dims header + 8-byte content hash
    assert(((out(0) & 0xff) << 8 | (out(1) & 0xff)) == 32)
    assert(((out(2) & 0xff) << 8 | (out(3) & 0xff)) == 24)
  }

  test("sampleFrames explodes every-nth frame index, no decode") {
    val frames = Multimodal.sampleFrames(
      media.filter(col("id") === 2), "id", "media", everyNth = 1)
    // 2048 bytes → n_frames = 3 → frame_idx 0,1,2
    assert(frames.select("frame_idx").as[Int].collect().toSeq == Seq(0, 1, 2))
  }

  test("repartitionBySize balances by payload bytes") {
    val parts = Multimodal.repartitionBySize(media, "media", 2)
      .rdd.getNumPartitions
    assert(parts == 2)
  }

  test("repartitionBySize spreads large payloads across partitions") {
    import spark.implicits._
    // 64 big clips + 64 small thumbnails: a range-repartition on size
    // would put ALL big payloads in one partition; the hash stripe must
    // spread bytes to within a small factor
    val skewed = ((1 to 64).map(i => (i.toLong, Array.fill(10000)(i.toByte))) ++
      (65 to 128).map(i => (i.toLong, Array.fill(10)(i.toByte))))
      .toDF("id", "media")
    val bytesPerPart = Multimodal.repartitionBySize(skewed, "media", 2)
      .rdd.mapPartitions(it =>
        Iterator(it.map(_.getAs[Array[Byte]]("media").length.toLong).sum))
      .collect()
    assert(bytesPerPart.length == 2)
    assert(bytesPerPart.min > 0)
    assert(bytesPerPart.max.toDouble / bytesPerPart.min < 3.0,
      s"byte-skewed partitions: ${bytesPerPart.toSeq}")
  }
}

object MultimodalSpec {
  val opens = new AtomicInteger(0)
  val closes = new AtomicInteger(0)
}
