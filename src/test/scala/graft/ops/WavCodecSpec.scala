package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Value-checks for the REAL audio codec ([[Multimodal.WavCodec]], JDK
  * `javax.sound.sampled`): RIFF/WAVE encode + decode against
  * hand-computed goldens, plus the Spark-side round-trip query shape
  * used by `q_x_media_wav`. */
class WavCodecSpec extends SparkSpec {
  import Multimodal.WavCodec

  test("PCM16 WAV round trip: header info + exact samples") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7)
    val wav = WavCodec.encodePcm16(16000, 1, samples)
    // a real RIFF container, not a stub header
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    assert(WavCodec.wavInfo(wav) == ((16000, 1, 16, 6L)))
    assert(WavCodec.decodePcm16(wav).toSeq == samples.toSeq)
    // 0 + 100 - 100 + 32767 - 32768 + 7 = 6
    assert(WavCodec.sampleSum(wav) == 6L)
  }

  test("stereo header info: channels and frame count") {
    // 8 samples / 2 channels = 4 frames
    val wav = WavCodec.encodePcm16(8000, 2,
      Array[Short](1, 2, 3, 4, 5, 6, 7, 8))
    assert(WavCodec.wavInfo(wav) == ((8000, 2, 16, 4L)))
    assert(WavCodec.sampleSum(wav) == 36L)
  }

  test("features golden: per-window mean |sample| / 32768") {
    // 8 samples, dim=4 → windows of 2
    val wav = WavCodec.encodePcm16(16000, 1,
      Array[Short](0, 0, 16384, 16384, -16384, -16384, 32767, -32767))
    val f = WavCodec.features(wav, 4)
    assert(f(0) == 0f)
    assert(f(1) == 0.5f && f(2) == 0.5f)
    assert(math.abs(f(3) - 32767f / 32768f) < 1e-6)
  }

  test("non-wav bytes fail loudly") {
    intercept[Exception] {
      WavCodec.wavInfo("definitely not audio".getBytes("UTF-8"))
    }
  }

  test("wavRoundTrip matches the closed-form oracle prediction") {
    import spark.implicits._
    val df = Seq((0L, 128L), (1234L, 48L), (7L, 0L))
      .toDF("doc_id", "len")
    val got = Multimodal.wavRoundTrip(df, "doc_id", "len")
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))).toMap
    for ((id, len) <- Seq((0L, 128L), (1234L, 48L), (7L, 0L))) {
      val n = (len % 1000 + 50).toInt
      val base = id % 1000
      val want = n * base + 15L * n * (n - 1) / 2
      assert(got(id) == ((16000, 1, n.toLong, want)), s"id=$id")
    }
  }
}
