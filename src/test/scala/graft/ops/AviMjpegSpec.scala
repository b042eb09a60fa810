package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Value-checks for the real MJPEG video path
  * ([[Multimodal.AviMjpeg]] + `javax.imageio` frame decode): RIFF/AVI
  * container round trip, zero-copy frame index, REAL per-frame JPEG
  * decode with golden digests, sampled decode, loud failure on
  * garbage, and the mjpegSampleFrames operator end to end. */
class AviMjpegSpec extends SparkSpec {
  import Multimodal.{AviMjpeg, ImageIoCodec}

  private def grayJpeg(w: Int, h: Int, f: Int): Array[Byte] = {
    val png = ImageIoCodec.encodeGrayPng(w, h,
      (x, y) => (3 * x + 5 * y + 7 * f) % 256)
    ImageIoCodec.encodeJpeg(ImageIoCodec.decode(png))
  }

  private def fixture(nFrames: Int, w: Int = 32, h: Int = 24): Array[Byte] =
    AviMjpeg.synthesize((0 until nFrames).map(grayJpeg(w, h, _)),
      w, h, 40000L)

  test("synthesize → parse: real RIFF magic, header fields round-trip") {
    val avi = fixture(5)
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val info = AviMjpeg.parse(avi)
    assert(info == AviMjpeg.Info(32, 24, 5, 40000L))
    assert(info.durationMs == 200L) // 5 frames at 25 fps
  }

  test("frame index is zero-copy-exact: extracted bytes == encoded frames") {
    val frames = (0 until 4).map(grayJpeg(16, 16, _))
    val avi = AviMjpeg.synthesize(frames, 16, 16, 40000L)
    val offs = AviMjpeg.frameOffsets(avi)
    assert(offs.length == 4)
    for (i <- frames.indices)
      assert(AviMjpeg.frame(avi, offs, i).sameElements(frames(i)),
        s"frame $i bytes must survive the container byte-exactly")
    // odd-length payloads pad to even chunk boundaries without
    // corrupting the NEXT frame
    val odd = Seq(Array[Byte](1, 2, 3), Array[Byte](9, 8, 7, 6))
    val avi2 = AviMjpeg.synthesize(odd, 1, 1, 1000L)
    val offs2 = AviMjpeg.frameOffsets(avi2)
    assert(AviMjpeg.frame(avi2, offs2, 0).sameElements(odd(0)))
    assert(AviMjpeg.frame(avi2, offs2, 1).sameElements(odd(1)))
  }

  test("REAL per-frame decode: frame count + per-frame digests golden") {
    val avi = fixture(3)
    val offs = AviMjpeg.frameOffsets(avi)
    assert(offs.length == 3)
    val digests = offs.indices.map { i =>
      val img = ImageIoCodec.decode(AviMjpeg.frame(avi, offs, i))
      assert(img.getWidth == 32 && img.getHeight == 24)
      val raster = Array.tabulate(24, 32)((y, x) =>
        img.getRaster.getSample(x, y, 0).toByte)
      val md = java.security.MessageDigest.getInstance("MD5")
      raster.foreach(md.update)
      md.digest().map("%02x".format(_)).mkString
    }
    // distinct content per frame → distinct digests; decode is
    // deterministic → re-decoding reproduces them exactly
    assert(digests.distinct.length == 3, s"frames must differ: $digests")
    val again = offs.indices.map { i =>
      val img = ImageIoCodec.decode(AviMjpeg.frame(avi, offs, i))
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(24, 32)((y, x) =>
        img.getRaster.getSample(x, y, 0).toByte).foreach(md.update)
      md.digest().map("%02x".format(_)).mkString
    }
    assert(again == digests, "JPEG decode must be deterministic")
    // the decode is REAL: JPEG is lossy-but-close, so decoded pixels
    // track the encoded gradient within a small tolerance
    val img0 = ImageIoCodec.decode(AviMjpeg.frame(avi, offs, 0))
    val maxErr = (for (y <- 0 until 24; x <- 0 until 32) yield
      math.abs(img0.getRaster.getSample(x, y, 0) - (3 * x + 5 * y) % 256))
      .max
    assert(maxErr <= 96,
      s"decoded pixels too far from source (err=$maxErr) — " +
        "the 256-wrap edges are JPEG's worst case, flat regions decode close")
  }

  test("garbage and truncation fail loudly") {
    intercept[IllegalArgumentException] {
      AviMjpeg.parse("definitely not a video".getBytes("US-ASCII"))
    }
    val avi = fixture(2)
    intercept[IllegalArgumentException] {
      AviMjpeg.parse(java.util.Arrays.copyOfRange(avi, 0, 40))
    }
    // WAV is RIFF too — the AVI fourcc check must reject it
    val wav = Multimodal.WavCodec.encodePcm16(8000, 1,
      Array.tabulate(100)(_.toShort))
    intercept[IllegalArgumentException](AviMjpeg.parse(wav))
  }

  test("mjpegSampleFrames: every-nth REAL decode, cost follows sampled count") {
    import spark.implicits._
    val rows = Seq((1L, fixture(6)), (2L, fixture(3, w = 16, h = 16)),
      (3L, null.asInstanceOf[Array[Byte]]))
    val got = Multimodal.mjpegSampleFrames(
      rows.toDF("doc_id", "media"), "doc_id", "media", everyNth = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4)))
    // doc 1: frames 0,2,4; doc 2: frames 0,2; doc 3 (null) skipped
    assert(got.map(t => (t._1, t._2)).toSet ==
      Set((1L, 0), (1L, 2), (1L, 4), (2L, 0), (2L, 2)))
    assert(got.filter(_._1 == 1L).forall(t => t._3 == 32 && t._4 == 24))
    assert(got.filter(_._1 == 2L).forall(t => t._3 == 16 && t._4 == 16))
    // mean luma of the (3x+5y+7f)%256 gradient stays mid-range after
    // the lossy round trip
    assert(got.forall(t => t._5 > 30 && t._5 < 230), got.mkString(","))
  }

  test("mjpegRoundTrip matches its closed-form oracle shape") {
    import spark.implicits._
    val df = Seq((7L, 11L), (100L, 0L), (23L, 5L)).toDF("doc_id", "len")
    val got = Multimodal.mjpegRoundTrip(df, "doc_id", "len")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4), r.getInt(5), r.getInt(6)))).toMap
    for ((id, len) <- Seq((7L, 11L), (100L, 0L), (23L, 5L))) {
      val nF = (len % 6 + 2).toInt
      val w = (id % 24 + 8).toInt; val h = (len % 16 + 8).toInt
      val nS = (nF + 1) / 2
      assert(got(id) == ((nF, w, h, nF * 40L, nS, nS)),
        s"id=$id: ${got(id)}")
    }
  }
}
