package graft.ops

import graft.SparkSpec

/** Value-checks for the real ISO-BMFF metadata parser
  * ([[Multimodal.Mp4Meta]]): box-walk parse of synthesized MP4 trees,
  * 64-bit sizes, v1 mvhd, loud failure on garbage. */
class Mp4MetaSpec extends SparkSpec {
  import Multimodal.Mp4Meta

  test("synthesize → parse round trip: timescale, duration, dims, tracks") {
    val mp4 = Mp4Meta.synthesize(timescale = 1000L, duration = 6040L,
      width = 320, height = 240)
    // real container magic: box 2 is 'ftyp' at offset 4
    assert(new String(mp4.slice(4, 8), "US-ASCII") == "ftyp")
    val info = Mp4Meta.parse(mp4)
    assert(info == Mp4Meta.Info(1000L, 6040L, 320, 240, 1))
    assert(info.durationMs == 6040L)
  }

  test("durationMs converts through a non-ms timescale") {
    val mp4 = Mp4Meta.synthesize(timescale = 600L, duration = 1200L,
      width = 16, height = 16)
    assert(Mp4Meta.parse(mp4).durationMs == 2000L)
  }

  test("garbage and truncation fail loudly") {
    intercept[IllegalArgumentException] {
      Mp4Meta.parse("this is not a movie at all".getBytes("US-ASCII"))
    }
    // valid prefix, truncated mid-box
    val mp4 = Mp4Meta.synthesize(1000L, 100L, 32, 32)
    intercept[IllegalArgumentException] {
      Mp4Meta.parse(mp4.take(mp4.length - 7))
    }
    // no moov: bare ftyp parses as boxes but is not a movie
    intercept[IllegalArgumentException] {
      Mp4Meta.parse(mp4.take(24))
    }
  }

  test("mp4RoundTrip matches the closed-form oracle prediction") {
    import spark.implicits._
    val df = Seq((0L, 128L), (700L, 48L), (1000L, 0L))
      .toDF("doc_id", "len")
    val got = Multimodal.mp4RoundTrip(df, "doc_id", "len")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2),
        r.getInt(3), r.getInt(4)))).toMap
    for ((id, len) <- Seq((0L, 128L), (700L, 48L), (1000L, 0L)))
      assert(got(id) == ((len * 40 + 1000, (id % 640 + 16).toInt,
        (id % 480 + 16).toInt, 1)), s"id=$id")
  }
}
