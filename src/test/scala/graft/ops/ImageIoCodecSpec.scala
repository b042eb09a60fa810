package graft.ops

import java.awt.image.BufferedImage
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Value-checks for the REAL image codec ([[Multimodal.ImageIoCodec]],
  * JDK `javax.imageio`): decode, header-only dims, deterministic
  * nearest-neighbor resize, and luma-histogram features, each against
  * hand-computed goldens on real PNG/JPEG bytes — plus the Spark-side
  * round-trip query shape used by `q_x_media_imageio`.
  */
class ImageIoCodecSpec extends SparkSpec {
  import Multimodal.ImageIoCodec

  // 4×3 gray test card, pixel(x,y) = 10x + 40y:
  //   row0:  0 10  20  30
  //   row1: 40 50  60  70
  //   row2: 80 90 100 110
  private def card: Array[Byte] =
    ImageIoCodec.encodeGrayPng(4, 3, (x, y) => 10 * x + 40 * y)

  test("PNG round trip: header dims + exact pixel values") {
    val png = card
    // it really is a PNG (magic bytes), not a stub header
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
    assert(ImageIoCodec.imageDims(png) == ((4, 3, 1)))
    val img = ImageIoCodec.decode(png)
    val got = for (y <- 0 until 3; x <- 0 until 4)
      yield img.getRaster.getSample(x, y, 0)
    assert(got == Seq(0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110))
    assert(ImageIoCodec.pixelSum(png) == 660L)
  }

  test("nearest-neighbor resize golden: 4x3 -> 2x6, lossless re-encode") {
    val out = ImageIoCodec.resize(card, 2, 6)
    assert(ImageIoCodec.imageDims(out) == ((2, 6, 1)))
    val img = ImageIoCodec.decode(out)
    val got = for (y <- 0 until 6; x <- 0 until 2)
      yield img.getRaster.getSample(x, y, 0)
    // dst(x,y) = src(2x, y/2) — precomputed by hand
    assert(got == Seq(0, 20, 0, 20, 40, 60, 40, 60, 80, 100, 80, 100))
  }

  test("features golden: 8-bucket luma histogram frequencies") {
    val f = ImageIoCodec.features(card, 8)
    // buckets (luma*8/256): {0,10,20,30}->0, {40,50,60}->1, {70,80,90}->2,
    // {100,110}->3; n=12
    val want = Array(4f / 12, 3f / 12, 3f / 12, 2f / 12, 0f, 0f, 0f, 0f)
    assert(f.toSeq == want.toSeq)
  }

  test("RGB decode: channel count from header, integer BT.601 luma") {
    val img = new BufferedImage(2, 1, BufferedImage.TYPE_3BYTE_BGR)
    img.setRGB(0, 0, 0xff0000) // pure red
    img.setRGB(1, 0, 0x0000ff) // pure blue
    val png = ImageIoCodec.encodePng(img)
    assert(ImageIoCodec.imageDims(png) == ((2, 1, 3)))
    // luma(red) = 299*255/1000 = 76, luma(blue) = 114*255/1000 = 29
    assert(ImageIoCodec.pixelSum(png) == 105L)
    val f = ImageIoCodec.features(png, 8)
    // blue luma 29 → bucket 0; red luma 76 → bucket 2 (76·8/256 = 2)
    assert(f.toSeq == Seq(0.5f, 0f, 0.5f, 0f, 0f, 0f, 0f, 0f))
  }

  test("JPEG decodes too (dims only — lossy)") {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(
      ImageIoCodec.decode(ImageIoCodec.encodeGrayPng(16, 16, (x, y) => x + y)),
      "jpg", bos)
    val jpg = bos.toByteArray
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8) // JPEG SOI
    val (w, h, ch) = ImageIoCodec.imageDims(jpg)
    assert(w == 16 && h == 16 && ch == 1)
  }

  test("non-image bytes fail loudly, not silently") {
    intercept[IllegalArgumentException] {
      ImageIoCodec.imageDims("not an image".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] {
      ImageIoCodec.decode(Array[Byte](1, 2, 3))
    }
  }

  test("imageIoRoundTrip matches the closed-form oracle prediction") {
    import spark.implicits._
    val df = Seq((0L, 128L), (7L, 48L), (200L, 553L), (131L, 0L))
      .toDF("doc_id", "len")
    val got = Multimodal.imageIoRoundTrip(df, "doc_id", "len")
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4)))).toMap
    for ((id, len) <- Seq((0L, 128L), (7L, 48L), (200L, 553L), (131L, 0L))) {
      val w = (len % 32 + 8).toInt; val h = (len / 7 % 24 + 8).toInt
      val base = id % 128
      val want = w.toLong * h * base + h.toLong * w * (w - 1) / 2 +
        w.toLong * h * (h - 1) / 2
      assert(got(id) == ((w, h, 1, want)), s"id=$id")
    }
  }

  test("jpegTranscode: real lossy transcode preserves dims + gray, emits true JPEG") {
    import spark.implicits._
    val got = Multimodal.jpegTranscode(
      Seq((3L, 100L), (40L, 0L)).toDF("doc_id", "len"), "doc_id", "len")
      .collect().map(r => (r.getLong(0),
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))).toMap
    assert(got(3L) == (((100 % 48 + 8), (3 % 32 + 8), 1, true)))
    assert(got(40L) == ((8, (40 % 32 + 8), 1, true)))
  }

  test("Spark feature pass runs the real codec per partition") {
    import spark.implicits._
    val rows = Seq(
      (1L, card),
      (2L, ImageIoCodec.encodeGrayPng(8, 8, (_, _) => 200)),
      (3L, null: Array[Byte])).toDF("id", "media").repartition(2)
    val out = Multimodal.extractFeatures(rows, "media", dim = 4)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[collection.Seq[Float]]("features")).toMap
    assert(out(3L) == null)
    // constant 200 luma → bucket 200*4/256 = 3 holds everything
    assert(out(2L).toSeq == Seq(0f, 0f, 0f, 1f))
    assert(math.abs(out(1L).sum - 1f) < 1e-6f)
  }
}
