package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) handling for training-data pipelines.
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct
  * alongside — the pattern that scales to 100 TB: Spark never interprets
  * the bytes in the row path, metadata filters prune before any decode,
  * and decode/feature-extraction runs per-partition with a reusable
  * decoder handle (the expensive native-library initialization happens
  * once per partition, not once per row — the same batch shape
  * `mapInPandas`/`mapInArrow` gives Python pipelines).
  *
  * IMAGES, AUDIO, AND VIDEO ARE REAL: [[ImageIoCodec]] (JDK
  * `javax.imageio`) is the default [[MediaCodec]] — actual
  * PNG/JPEG/GIF/BMP decode, deterministic nearest-neighbor resize,
  * integer-luma histogram features — [[WavCodec]] (JDK
  * `javax.sound.sampled`) covers RIFF/WAVE PCM, and [[AviMjpeg]]
  * covers Motion-JPEG video (real RIFF/AVI container parse + per-frame
  * JPEG decode through ImageIO), each value-checked against goldens
  * and (via [[imageIoRoundTrip]]/[[wavRoundTrip]]/[[mjpegRoundTrip]])
  * DuckDB oracles. [[StubCodec]] survives ONLY as the deterministic
  * oracle twin — queries whose "decode" arithmetic DuckDB must replay
  * byte-for-byte.
  */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  val metadataSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("duration_ms", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType)))

  /** A decoder handle with per-partition lifecycle. Implementations wrap
    * the real codec library; [[StubCodec]] is the deterministic fake. */
  trait MediaCodec extends Serializable {
    /** Called once per partition before any row (native lib init). */
    def open(): Unit
    /** (width, height, channels) of an encoded image. */
    def imageDims(bytes: Array[Byte]): (Int, Int, Int)
    /** Decode + re-encode at new dimensions. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
    /** Fixed-length feature vector for a payload. */
    def features(bytes: Array[Byte], dim: Int): Array[Float]
    def close(): Unit
  }

  /** Deterministic stand-in for a codec: dimensions are arithmetic on the
    * byte length (oracle-expressible), features are a splitmix64 stream
    * seeded from content. STUB — not a real decoder. */
  object StubCodec extends MediaCodec {
    def open(): Unit = ()
    def close(): Unit = ()

    def imageDims(bytes: Array[Byte]): (Int, Int, Int) =
      ((bytes.length % 640) + 16, ((bytes.length / 7) % 480) + 16, 3)

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      // deterministic fake: header encoding the new dims + content hash
      val h64 = contentSeed(bytes)
      Array[Byte](
        (w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte) ++
        java.nio.ByteBuffer.allocate(8).putLong(h64).array()
    }

    /** Portable content seed: Karp-Rabin fold mod 2^31-1 over the first
      * 64 bytes, seeded with the length — every intermediate < 2^52, so
      * an SQL oracle reproduces it (wrapping-overflow hashes could not
      * be, and DuckDB BIGINT arithmetic traps on overflow anyway). */
    private def contentSeed(bytes: Array[Byte]): Long = {
      val P = 2147483647L
      var h = bytes.length.toLong % P
      val n = math.min(bytes.length, 64)
      var i = 0
      while (i < n) { h = (h * 1000003L + (bytes(i) & 0xff)) % P; i += 1 }
      h
    }

    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      // Karp-Rabin rolling hash of ALL payload bytes mod 2^31-1, then one
      // multiplicative step per slot. Every intermediate stays < 2^52, and
      // the formula is portable — an SQL oracle can recompute it exactly
      // (see Queries.q_x_media_features), unlike the splitmix stream this
      // replaced.
      val P = 2147483647L
      var h = 0L
      var i = 0
      while (i < bytes.length) { h = (h * 1000003L + (bytes(i) & 0xff)) % P; i += 1 }
      val seed = h
      Array.tabulate(dim)(j => (((seed * 1000003L + j) % P).toDouble / P).toFloat)
    }

  }

  /** Real JDK-native image codec: `javax.imageio` (java.desktop module,
    * present in every JDK — zero new dependencies) decodes and encodes
    * PNG/JPEG/GIF/BMP. This is the production default for image columns;
    * [[StubCodec]] remains only where an SQL oracle must replay the
    * "decode" arithmetic (a DuckDB oracle cannot parse PNG).
    *
    * Determinism notes (a correctness property at 100 TB, where retried
    * tasks must reproduce bytes):
    *  - dims/channels come from the format HEADER via an `ImageReader`,
    *    no raster decode — metadata pruning stays cheap on multi-MB
    *    payloads;
    *  - resize is nearest-neighbor over the decoded raster implemented
    *    here (floor(x*srcW/dstW) sampling), NOT `Graphics2D` scaling —
    *    AWT interpolation is implementation-dependent, ours is bit-stable
    *    across JVMs;
    *  - features are an integer-luma histogram (BT.601 integer weights),
    *    no floating-point in the pixel loop;
    *  - re-encode is PNG (lossless), so resize(decode(png)) round-trips
    *    pixel values exactly.
    */
  object ImageIoCodec extends MediaCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    /** Disable ImageIO's disk-backed scratch cache: per-row temp files on
      * executor local disks would be a silent IO amplifier. */
    def open(): Unit = ImageIO.setUseCache(false)
    def close(): Unit = ()

    /** Header-only (no raster decode) width/height/components. */
    def imageDims(bytes: Array[Byte]): (Int, Int, Int) = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext)
          throw new IllegalArgumentException("no ImageIO reader for payload")
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          val ch = r.getImageTypes(0).next().getNumComponents
          (r.getWidth(0), r.getHeight(0), ch)
        } finally r.dispose()
      } finally iis.close()
    }

    def decode(bytes: Array[Byte]): BufferedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null)
        throw new IllegalArgumentException("no ImageIO reader for payload")
      img
    }

    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    def encodeJpeg(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

    /** Nearest-neighbor resize (deterministic), re-encoded as PNG. Gray
      * sources stay single-channel; everything else lands in 3-byte BGR. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val src = decode(bytes)
      val gray = src.getType == BufferedImage.TYPE_BYTE_GRAY
      val dst = new BufferedImage(w, h,
        if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_3BYTE_BGR)
      val sw = src.getWidth; val sh = src.getHeight
      var y = 0
      while (y < h) {
        val sy = (y.toLong * sh / h).toInt
        var x = 0
        while (x < w) {
          val sx = (x.toLong * sw / w).toInt
          if (gray)
            dst.getRaster.setSample(x, y, 0, src.getRaster.getSample(sx, sy, 0))
          else dst.setRGB(x, y, src.getRGB(sx, sy))
          x += 1
        }
        y += 1
      }
      encodePng(dst)
    }

    /** `dim`-bucket luminance histogram, normalized to frequencies.
      * Integer BT.601 luma ((299r+587g+114b)/1000); bucket = luma*dim/256. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val img = decode(bytes)
      val w = img.getWidth; val h = img.getHeight
      val hist = new Array[Long](dim)
      val gray = img.getType == BufferedImage.TYPE_BYTE_GRAY
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val luma =
            if (gray) img.getRaster.getSample(x, y, 0)
            else {
              val rgb = img.getRGB(x, y)
              (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                114 * (rgb & 0xff)) / 1000
            }
          hist(luma * dim / 256) += 1L
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      hist.map(c => if (n == 0) 0f else (c.toDouble / n).toFloat)
    }

    /** Synthesize a grayscale PNG from a pixel function (test fixtures and
      * the oracle-checkable round-trip query). */
    def encodeGrayPng(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.getRaster.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
        y += 1
      }
      encodePng(img)
    }

    /** Sum of all luma samples — the value a lossless round-trip lets an
      * SQL oracle predict in closed form. */
    def pixelSum(bytes: Array[Byte]): Long = {
      val img = decode(bytes)
      val gray = img.getType == BufferedImage.TYPE_BYTE_GRAY
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          sum +=
            (if (gray) img.getRaster.getSample(x, y, 0)
             else {
               val rgb = img.getRGB(x, y)
               (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                 114 * (rgb & 0xff)) / 1000
             })
          x += 1
        }
        y += 1
      }
      sum
    }
  }

  /** Real JDK-native AUDIO codec: `javax.sound.sampled` (java.desktop)
    * reads and writes RIFF/WAVE PCM — the second real-media binding
    * after [[ImageIoCodec]], leaving only video containers on
    * [[StubCodec]]. Same determinism discipline: header-only stream
    * info, exact 16-bit PCM decode (WAV is lossless), integer feature
    * math (per-window mean |sample|). */
  object WavCodec {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    /** Header-only (sampleRate, channels, bitsPerSample, nFrames). */
    def wavInfo(bytes: Array[Byte]): (Int, Int, Int, Long) = {
      val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
      val f = aff.getFormat
      (f.getSampleRate.toInt, f.getChannels, f.getSampleSizeInBits,
        aff.getFrameLength.toLong)
    }

    /** Decode 16-bit PCM samples (little-endian WAV, interleaved). */
    def decodePcm16(bytes: Array[Byte]): Array[Short] = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        require(f.getSampleSizeInBits == 16,
          s"expected 16-bit PCM, got ${f.getSampleSizeInBits}")
        val raw = in.readAllBytes()
        val out = new Array[Short](raw.length / 2)
        var i = 0
        while (i < out.length) {
          val lo = raw(2 * i) & 0xff
          val hi = raw(2 * i + 1).toInt
          out(i) = (if (f.isBigEndian) (lo << 8) | (hi & 0xff)
                    else (hi << 8) | lo).toShort
          i += 1
        }
        out
      } finally in.close()
    }

    /** Encode 16-bit little-endian PCM as a WAV container. */
    def encodePcm16(sampleRate: Int, channels: Int,
        samples: Array[Short]): Array[Byte] = {
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        sampleRate.toFloat, 16, channels, 2 * channels, sampleRate.toFloat,
        false)
      val raw = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt,
        samples.length.toLong / channels)
      val bos = new ByteArrayOutputStream()
      try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      finally ais.close()
      bos.toByteArray
    }

    /** Sum of all decoded samples — the closed-form oracle hook (WAV PCM
      * is lossless, like the PNG pixel sum). */
    def sampleSum(bytes: Array[Byte]): Long = {
      val s = decodePcm16(bytes)
      var sum = 0L; var i = 0
      while (i < s.length) { sum += s(i); i += 1 }
      sum
    }

    /** `dim` fixed windows of mean |sample| / 32768 — a deterministic
      * energy envelope (the audio analog of the image luma histogram). */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val s = decodePcm16(bytes)
      val out = new Array[Float](dim)
      if (s.length == 0) return out
      val w = (s.length + dim - 1) / dim
      var k = 0
      while (k < dim) {
        var sum = 0L; var i = k * w; val end = math.min(s.length, (k + 1) * w)
        while (i < end) { sum += math.abs(s(i).toInt); i += 1 }
        out(k) =
          if (end > k * w) (sum.toDouble / (end - k * w) / 32768.0).toFloat
          else 0f
        k += 1
      }
      out
    }
  }

  /** Real ISO-BMFF (MP4/MOV) metadata parser — video's header-only
    * story: the container format is just length-prefixed boxes, and
    * metadata pruning (duration/dims filters before any decode) only
    * needs `moov` — so this parses the real box structure: top-level
    * `[size:u32][type:4cc]` walk, recursing into `moov`/`trak`, reading
    * `mvhd` v0 (timescale, duration) and `tkhd` v0 (16.16 fixed-point
    * width/height). 64-bit extended sizes (size==1) honored;
    * truncated/garbage input fails loudly. Frame DECODE is real too —
    * for MJPEG payloads via [[AviMjpeg]] + `javax.imageio` (modern
    * inter-frame codecs like H.264 have no JDK decoder; their
    * container metadata still parses here). */
  object Mp4Meta {
    import java.nio.{ByteBuffer, ByteOrder}

    final case class Info(timescale: Long, duration: Long,
        width: Int, height: Int, nTracks: Int) {
      def durationMs: Long =
        if (timescale == 0) 0L else duration * 1000L / timescale
    }

    private def u32(b: ByteBuffer): Long = b.getInt.toLong & 0xffffffffL

    /** Walk boxes in [from, to); invoke f(type, payloadFrom, payloadTo). */
    private def walk(buf: ByteBuffer, from: Int, to: Int)(
        f: (String, Int, Int) => Unit): Unit = {
      var p = from
      while (p + 8 <= to) {
        buf.position(p)
        var size = u32(buf)
        val tpe = {
          val a = new Array[Byte](4); buf.get(a); new String(a, "US-ASCII")
        }
        var hdr = 8
        if (size == 1) { size = buf.getLong; hdr = 16 }
        else if (size == 0) size = (to - p).toLong // box extends to end
        if (size < hdr || p + size > to)
          throw new IllegalArgumentException(
            s"bad box '$tpe' size=$size at $p")
        f(tpe, p + hdr, p + size.toInt)
        p += size.toInt
      }
      if (p != to)
        throw new IllegalArgumentException(s"trailing garbage at $p/$to")
    }

    /** Parse moov metadata. Throws on non-BMFF payloads. */
    def parse(bytes: Array[Byte]): Info = {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      var timescale = 0L; var duration = 0L
      var w = 0; var h = 0; var tracks = 0; var sawMoov = false
      walk(buf, 0, bytes.length) { (tpe, from, to) =>
        if (tpe == "moov") {
          sawMoov = true
          walk(buf, from, to) {
            case ("mvhd", f0, _) =>
              buf.position(f0)
              val version = buf.get()
              buf.position(buf.position() + 3) // flags
              if (version == 0) {
                buf.position(buf.position() + 8) // ctime, mtime
                timescale = u32(buf); duration = u32(buf)
              } else { // v1: 64-bit times
                buf.position(buf.position() + 16)
                timescale = u32(buf); duration = buf.getLong
              }
            case ("trak", f0, t0) =>
              tracks += 1
              walk(buf, f0, t0) {
                case ("tkhd", f1, _) =>
                  buf.position(f1)
                  val version = buf.get()
                  buf.position(buf.position() + 3)
                  val skip = if (version == 0) 4 + 4 + 4 + 4 + 4 else
                    8 + 8 + 4 + 4 + 8
                  buf.position(buf.position() + skip + 8 + 2 + 2 + 2 + 2 + 36)
                  val wFix = u32(buf); val hFix = u32(buf)
                  if (wFix > 0) { w = (wFix >> 16).toInt; h = (hFix >> 16).toInt }
                case _ => ()
              }
            case _ => ()
          }
        }
      }
      if (!sawMoov)
        throw new IllegalArgumentException("no moov box: not ISO-BMFF")
      Info(timescale, duration, w, h, tracks)
    }

    // ---- deterministic synthesizer (fixtures + oracle round trip) ----

    private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length)
        .order(ByteOrder.BIG_ENDIAN)
      b.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
      b.array()
    }

    /** Minimal valid BMFF: ftyp + moov(mvhd v0 + one trak(tkhd v0)). */
    def synthesize(timescale: Long, duration: Long, width: Int,
        height: Int): Array[Byte] = {
      val mvhd = ByteBuffer.allocate(100).order(ByteOrder.BIG_ENDIAN)
      mvhd.putInt(0) // version 0 + flags
      mvhd.putInt(0).putInt(0) // ctime mtime
      mvhd.putInt(timescale.toInt).putInt(duration.toInt)
      mvhd.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      mvhd.putInt(0).putInt(0)
      // identity matrix
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        .foreach(mvhd.putInt)
      (0 until 6).foreach(_ => mvhd.putInt(0)) // pre_defined
      mvhd.putInt(2) // next track id
      val tkhd = ByteBuffer.allocate(84).order(ByteOrder.BIG_ENDIAN)
      tkhd.putInt(0) // v0 + flags
      tkhd.putInt(0).putInt(0).putInt(1).putInt(0).putInt(duration.toInt)
      tkhd.putLong(0) // reserved
      tkhd.putShort(0).putShort(0).putShort(0).putShort(0)
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        .foreach(tkhd.putInt)
      tkhd.putInt(width << 16).putInt(height << 16)
      val ftyp = box("ftyp",
        "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0) ++
          "isomiso2".getBytes("US-ASCII"))
      ftyp ++ box("moov",
        box("mvhd", mvhd.array()) ++ box("trak", box("tkhd", tkhd.array())))
    }
  }

  /** Real MJPEG video — the last StubCodec surface closed: Motion-JPEG
    * stores every frame as an ordinary JPEG inside a RIFF/AVI
    * container, so the already-wired `javax.imageio` decoder IS a real
    * video frame decoder once the container is parsed. This object
    * reads and writes the actual AVI structure (`RIFF…AVI ` with an
    * `hdrl` LIST carrying `avih`/`strh`/`strf` headers and a `movi`
    * LIST of `00dc` frame chunks, all little-endian, chunks padded to
    * even offsets — the same RIFF grammar WAV uses).
    *
    * Scale shape: [[frameOffsets]] indexes frames WITHOUT copying
    * payloads, so sampled decode (every Nth frame) slices only the
    * chosen chunks out of a multi-MB clip — decode cost follows the
    * SAMPLED frame count, not the clip length. */
  object AviMjpeg {
    import java.nio.{ByteBuffer, ByteOrder}

    final case class Info(width: Int, height: Int, nFrames: Int,
        microSecPerFrame: Long) {
      def durationMs: Long = nFrames.toLong * microSecPerFrame / 1000L
    }

    private def le(bytes: Array[Byte]): ByteBuffer =
      ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

    private def fourcc(b: ByteBuffer): String = {
      val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
    }

    private def u32(b: ByteBuffer): Long = b.getInt.toLong & 0xffffffffL

    /** Walk RIFF chunks in [from, to): f(type, payloadFrom, payloadTo).
      * LIST chunks are passed through with their list-type as `type`
      * and the inner chunk region as the payload. */
    private def walk(buf: ByteBuffer, from: Int, to: Int)(
        f: (String, Int, Int) => Unit): Unit = {
      var p = from
      while (p + 8 <= to) {
        buf.position(p)
        val tpe = fourcc(buf)
        val size = u32(buf)
        if (p + 8 + size > to)
          throw new IllegalArgumentException(
            s"bad RIFF chunk '$tpe' size=$size at $p")
        if (tpe == "LIST") {
          buf.position(p + 8)
          f(fourcc(buf), p + 12, p + 8 + size.toInt)
        } else f(tpe, p + 8, p + 8 + size.toInt)
        p += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
      }
    }

    private def requireRiffAvi(buf: ByteBuffer, n: Int): Int = {
      if (n < 12) throw new IllegalArgumentException("not a RIFF file")
      buf.position(0)
      if (fourcc(buf) != "RIFF")
        throw new IllegalArgumentException("no RIFF magic")
      val size = u32(buf)
      if (fourcc(buf) != "AVI ")
        throw new IllegalArgumentException("RIFF but not AVI")
      math.min(n, 8 + size.toInt)
    }

    /** Container metadata from the real `avih` header (no frame decode). */
    def parse(bytes: Array[Byte]): Info = {
      val buf = le(bytes)
      val end = requireRiffAvi(buf, bytes.length)
      var info: Option[Info] = None
      walk(buf, 12, end) {
        case ("hdrl", f0, t0) =>
          walk(buf, f0, t0) {
            case ("avih", f1, _) =>
              buf.position(f1)
              val microSecPerFrame = u32(buf)
              buf.position(f1 + 16)
              val totalFrames = u32(buf).toInt
              buf.position(f1 + 32)
              val w = u32(buf).toInt; val h = u32(buf).toInt
              info = Some(Info(w, h, totalFrames, microSecPerFrame))
            case _ => ()
          }
        case _ => ()
      }
      info.getOrElse(
        throw new IllegalArgumentException("no avih header: not AVI"))
    }

    /** (offset, length) of each `00dc` frame chunk's JPEG payload —
      * the zero-copy index sampled decode slices from. */
    def frameOffsets(bytes: Array[Byte]): IndexedSeq[(Int, Int)] = {
      val buf = le(bytes)
      val end = requireRiffAvi(buf, bytes.length)
      val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      walk(buf, 12, end) {
        case ("movi", f0, t0) =>
          walk(buf, f0, t0) {
            case ("00dc", f1, t1) => out += ((f1, t1 - f1))
            case _ => ()
          }
        case _ => ()
      }
      out.toIndexedSeq
    }

    /** Extract frame `i`'s JPEG bytes (one copy, one frame). */
    def frame(bytes: Array[Byte], offsets: IndexedSeq[(Int, Int)],
        i: Int): Array[Byte] = {
      val (off, len) = offsets(i)
      java.util.Arrays.copyOfRange(bytes, off, off + len)
    }

    /** Write JPEG frames into a real AVI container (MJPG fourcc,
      * even-padded `00dc` chunks, `idx1` frame index — the structure
      * any MJPEG-aware tool expects). */
    def synthesize(frames: Seq[Array[Byte]], width: Int, height: Int,
        microSecPerFrame: Long): Array[Byte] = {
      require(frames.nonEmpty, "an AVI needs at least one frame")
      def chunk(tpe: String, payload: Array[Byte]): Array[Byte] = {
        val pad = payload.length & 1
        val b = ByteBuffer.allocate(8 + payload.length + pad)
          .order(ByteOrder.LITTLE_ENDIAN)
        b.put(tpe.getBytes("US-ASCII")).putInt(payload.length).put(payload)
        b.array() // trailing pad byte is the zero the allocate left
      }
      def list(listType: String, payload: Array[Byte]): Array[Byte] =
        chunk("LIST", listType.getBytes("US-ASCII") ++ payload)
      val maxFrame = frames.map(_.length).max
      val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      avih.putInt(microSecPerFrame.toInt).putInt(0).putInt(0)
        .putInt(0x10) // AVIF_HASINDEX
        .putInt(frames.length).putInt(0).putInt(1).putInt(maxFrame)
        .putInt(width).putInt(height)
      // 4 reserved u32s stay zero
      val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      strh.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
        .putInt(0).putInt(0).putInt(0)
        .putInt(1) // dwScale
        .putInt((1000000L / math.max(1L, microSecPerFrame)).toInt) // dwRate
        .putInt(0).putInt(frames.length).putInt(maxFrame)
        .putInt(-1) // dwQuality: default
        .putInt(0)
        .putShort(0).putShort(0)
        .putShort(width.toShort).putShort(height.toShort)
      val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      strf.putInt(40).putInt(width).putInt(height)
        .putShort(1).putShort(24)
        .put("MJPG".getBytes("US-ASCII"))
        .putInt(width * height * 3).putInt(0).putInt(0).putInt(0).putInt(0)
      val hdrl = list("hdrl", chunk("avih", avih.array()) ++
        list("strl", chunk("strh", strh.array()) ++
          chunk("strf", strf.array())))
      val moviChunks = frames.map(f => chunk("00dc", f))
      val movi = list("movi", moviChunks.flatten.toArray)
      // idx1: one 16-byte entry per frame, offsets relative to the
      // movi list-type fourcc (the convention players expect)
      val idx = ByteBuffer.allocate(16 * frames.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      var off = 4 // first chunk starts right after the 'movi' fourcc
      for ((f, c) <- frames.zip(moviChunks)) {
        idx.put("00dc".getBytes("US-ASCII"))
          .putInt(0x10) // AVIIF_KEYFRAME: every MJPEG frame is one
          .putInt(off).putInt(f.length)
        off += c.length
      }
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi ++
        chunk("idx1", idx.array())
      val out = ByteBuffer.allocate(8 + body.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
      out.array()
    }
  }

  /** Real BMFF round trip, oracle-checkable: synthesize a valid MP4 box
    * tree from (id, len) — timescale 1000, duration len·40+1000 "ms",
    * dims (id%640+16, id%480+16) — and parse it back header-only. The
    * box walk is byte-exact, so DuckDB predicts every field. */
  def mp4RoundTrip(df: DataFrame, idCol: String, lenCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("doc_id", LongType), StructField("duration_ms", LongType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("n_tracks", IntegerType)))
    df.select(col(idCol).cast(LongType), col(lenCol).cast(LongType))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0); val len = r.getLong(1)
          val mp4 = Mp4Meta.synthesize(1000L, len * 40 + 1000,
            (id % 640 + 16).toInt, (id % 480 + 16).toInt)
          val info = Mp4Meta.parse(mp4)
          Row(id, info.durationMs, info.width, info.height, info.nTracks)
        }
      }(Encoders.row(out))
  }

  /** Real JPEG transcode path, oracle-checkable on the lossless fields:
    * synthesize a gray PNG (closed-form dims), TRANSCODE it to JPEG via
    * the real ImageIO writer, and read the JPEG header back. Pixel
    * values are lossy (that is what JPEG is), so the oracle checks what
    * the format preserves — dimensions, single-component gray — plus
    * that the payload really is JPEG (SOI marker) and decodes. */
  def jpegTranscode(df: DataFrame, idCol: String, lenCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("doc_id", LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("channels", IntegerType),
      StructField("is_jpeg", BooleanType)))
    df.select(col(idCol).cast(LongType), col(lenCol).cast(LongType))
      .mapPartitions { rows =>
        ImageIoCodec.open()
        registerClose(ImageIoCodec)
        rows.map { r =>
          val id = r.getLong(0); val len = r.getLong(1)
          val w = (len % 48 + 8).toInt
          val h = (id % 32 + 8).toInt
          val png = ImageIoCodec.encodeGrayPng(w, h,
            (x, y) => (x * 5 + y * 3) % 256)
          val img = ImageIoCodec.decode(png)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", bos)
          val jpg = bos.toByteArray
          val (dw, dh, ch) = ImageIoCodec.imageDims(jpg)
          Row(id, dw, dh, ch,
            (jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
        }
      }(Encoders.row(out))
  }

  /** Real WAV round trip, oracle-checkable end to end — the audio twin
    * of [[imageIoRoundTrip]]: per row, synthesize 16-bit PCM mono at
    * 16 kHz with n = len%1000+50 samples, s_i = id%1000 + 15·i (max
    * 999 + 15·1048 < 32767, no clipping), ENCODE it as a WAV container
    * and DECODE it back with `javax.sound.sampled` (header info +
    * full-stream sample sum). PCM is lossless, so DuckDB predicts the
    * sum in closed form: n·(id%1000) + 15·n(n−1)/2. */
  def wavRoundTrip(df: DataFrame, idCol: String, lenCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("doc_id", LongType), StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType), StructField("n_samples", LongType),
      StructField("sum_samples", LongType)))
    df.select(col(idCol).cast(LongType), col(lenCol).cast(LongType))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0); val len = r.getLong(1)
          val n = (len % 1000 + 50).toInt
          val base = (id % 1000).toInt
          val samples = Array.tabulate(n)(i => (base + 15 * i).toShort)
          val wav = WavCodec.encodePcm16(16000, 1, samples)
          val (rate, ch, bits, frames) = WavCodec.wavInfo(wav)
          require(bits == 16, s"round trip changed bit depth: $bits")
          Row(id, rate, ch, frames, WavCodec.sampleSum(wav))
        }
      }(Encoders.row(out))
  }

  /** Real-codec round trip, oracle-checkable end to end: per row,
    * synthesize a gray PNG whose dims and pixels are closed-form functions
    * of (id, len) — width = len%32+8, height = (len/7)%24+8, pixel(x,y) =
    * id%128 + x + y (always < 256, so no wrap) — ENCODE it with ImageIO,
    * then DECODE it back with ImageIO (header dims + full-raster pixel
    * sum). PNG is lossless, so DuckDB predicts the sum without parsing a
    * byte: w·h·(id%128) + h·w(w−1)/2 + w·h(h−1)/2. A broken decode (or a
    * lossy re-encode) breaks the equality. Runs per-partition with one
    * codec open per task, the same lifecycle every real decode pass uses. */
  def imageIoRoundTrip(df: DataFrame, idCol: String, lenCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("doc_id", LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("channels", IntegerType),
      StructField("sum_gray", LongType)))
    df.select(col(idCol).cast(LongType), col(lenCol).cast(LongType))
      .mapPartitions { rows =>
        ImageIoCodec.open()
        registerClose(ImageIoCodec)
        rows.map { r =>
          val id = r.getLong(0); val len = r.getLong(1)
          val w = (len % 32 + 8).toInt
          val h = (len / 7 % 24 + 8).toInt
          val base = (id % 128).toInt
          val png = ImageIoCodec.encodeGrayPng(w, h, (x, y) => base + x + y)
          val (dw, dh, ch) = ImageIoCodec.imageDims(png)
          Row(id, dw, dh, ch, ImageIoCodec.pixelSum(png))
        }
      }(Encoders.row(out))
  }

  /** Real MJPEG round trip, oracle-checkable on what the format
    * preserves — the video twin of [[jpegTranscode]], closing the last
    * StubCodec surface: per row, synthesize nF = len%6+2 REAL JPEG
    * frames (gray gradient pixel (3x+5y+7f)%256, dims w = id%24+8,
    * h = len%16+8) via the real ImageIO writer, pack them into a real
    * AVI at 25 fps, PARSE the container back, sample every 2nd frame,
    * and DECODE each sampled frame with the real JPEG decoder. JPEG
    * pixel values are lossy, so the oracle checks the preserved
    * fields — frame count, dims, duration, and that every sampled
    * frame decoded at the encoded dimensions. */
  def mjpegRoundTrip(df: DataFrame, idCol: String, lenCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_frames", IntegerType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("n_sampled", IntegerType),
      StructField("n_decoded_ok", IntegerType)))
    df.select(col(idCol).cast(LongType), col(lenCol).cast(LongType))
      .mapPartitions { rows =>
        ImageIoCodec.open()
        registerClose(ImageIoCodec)
        rows.map { r =>
          val id = r.getLong(0); val len = r.getLong(1)
          val nF = (len % 6 + 2).toInt
          val w = (id % 24 + 8).toInt
          val h = (len % 16 + 8).toInt
          val frames = (0 until nF).map { f =>
            val png = ImageIoCodec.encodeGrayPng(w, h,
              (x, y) => (3 * x + 5 * y + 7 * f) % 256)
            ImageIoCodec.encodeJpeg(ImageIoCodec.decode(png))
          }
          val avi = AviMjpeg.synthesize(frames, w, h, 40000L) // 25 fps
          val info = AviMjpeg.parse(avi)
          val offs = AviMjpeg.frameOffsets(avi)
          val sampled = 0 until offs.length by 2
          val ok = sampled.count { i =>
            val img = ImageIoCodec.decode(AviMjpeg.frame(avi, offs, i))
            img.getWidth == w && img.getHeight == h
          }
          Row(id, info.nFrames, info.width, info.height, info.durationMs,
            sampled.length, ok)
        }
      }(Encoders.row(out))
  }

  /** Real frame sampling over MJPEG/AVI payloads — the decode-bearing
    * twin of [[sampleFrames]]: parse the container once per row, slice
    * every Nth `00dc` chunk out of the payload ([[AviMjpeg.frame]] —
    * decode cost follows the SAMPLED count, not clip length), decode
    * it with the real JPEG decoder, and emit one row per sampled frame
    * with decoded dims + integer mean luma. Per-partition codec
    * lifecycle, null payloads skipped. */
  def mjpegSampleFrames(df: DataFrame, idCol: String, mediaCol: String,
      everyNth: Int): DataFrame = {
    require(everyNth > 0, "everyNth must be positive")
    val out = StructType(Seq(
      StructField("doc_id", LongType), StructField("frame_idx", IntegerType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("mean_luma", IntegerType)))
    df.select(col(idCol).cast(LongType), col(mediaCol))
      .mapPartitions { rows =>
        ImageIoCodec.open()
        registerClose(ImageIoCodec)
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          if (r.isNullAt(0) || bytes == null) Iterator.empty
          else {
            val id = r.getLong(0)
            val offs = AviMjpeg.frameOffsets(bytes)
            Iterator.range(0, offs.length, everyNth).map { i =>
              val fb = AviMjpeg.frame(bytes, offs, i)
              val (w, h, _) = ImageIoCodec.imageDims(fb)
              val mean =
                if (w == 0 || h == 0) 0
                else (ImageIoCodec.pixelSum(fb) / (w.toLong * h)).toInt
              Row(id, i, w, h, mean)
            }
          }
        }
      }(Encoders.row(out))
  }

  /** Column-level metadata extraction — pure expressions, no decode, so
    * filters on mime/size prune before any codec runs. The stub's dims
    * arithmetic is inlined for the oracle-checkable path. */
  def stubMetadata(media: Column_): Column_ = struct(
    lit("application/octet-stream").as("mime"),
    length(media).cast(LongType).as("byte_len"),
    (pmod(length(media), lit(640)) + 16).cast(IntegerType).as("width"),
    (pmod(length(media).cast(LongType) / 7L, lit(480)) + 16)
      .cast(IntegerType).as("height"),
    lit(3).as("channels"),
    (length(media).cast(LongType) * 20L).as("duration_ms"),
    lit(16000).as("sample_rate"),
    (length(media) / 1024 + 1).cast(IntegerType).as("n_frames"))

  private type Column_ = org.apache.spark.sql.Column

  /** Per-partition feature extraction: one codec open/close per partition,
    * rows streamed through. Output schema = input + `features
    * array<float>`. This is the real plumbing a native decoder needs —
    * swap [[StubCodec]] for the production codec binding. */
  def extractFeatures(
      df: DataFrame, mediaCol: String, dim: Int,
      codec: MediaCodec = ImageIoCodec): DataFrame = {
    val outSchema = df.schema.add("features", ArrayType(FloatType))
    val enc = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      codec.open()
      registerClose(codec)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val feats = if (bytes == null) null else codec.features(bytes, dim)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Close the codec when the TASK ends, not when the iterator drains:
    * a downstream limit/take abandons the iterator early (exhaustion-
    * based close never fires → native handle leak), and exhaustion
    * checks can double-close on repeated hasNext. Task completion fires
    * exactly once, on success, early-exit, and failure alike. */
  private def registerClose(codec: MediaCodec): Unit = {
    val ctx = org.apache.spark.TaskContext.get()
    if (ctx != null) { ctx.addTaskCompletionListener[Unit](_ => codec.close()); () }
  }

  /** Resize: per-partition decode→scale→re-encode. Same lifecycle shape. */
  def resize(
      df: DataFrame, mediaCol: String, w: Int, h: Int,
      codec: MediaCodec = ImageIoCodec): DataFrame = {
    val enc = Encoders.row(df.schema)
    val idx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      codec.open()
      registerClose(codec)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val out = if (bytes == null) null else codec.resize(bytes, w, h)
        Row.fromSeq(r.toSeq.updated(idx, out))
      }
    }(enc)
  }

  /** Frame sampling: one row per sampled frame index, frame payload
    * deferred (frame_id addresses into the source payload — decode happens
    * downstream, only for sampled frames). Pure expressions: the explode
    * multiplies rows, nothing decodes. */
  def sampleFrames(df: DataFrame, idCol: String, mediaCol: String,
      everyNth: Int): DataFrame =
    df.select(col(idCol),
        stubMetadata(col(mediaCol)).as("meta"),
        col(mediaCol))
      .select(col(idCol), col("meta"),
        explode(sequence(lit(0),
          greatest(col("meta.n_frames") - 1, lit(0)), lit(everyNth)))
          .as("frame_idx"))

  /** Balance partitions by payload BYTES before a decode pass: media rows
    * are wildly skewed (a 4 KB thumbnail vs a 40 MB clip). Rows scatter
    * by a content-prefix hash, which lands the large payloads uniformly
    * across partitions (statistically byte-balanced; exact LPT packing
    * would need a global sort). A range-repartition on the size column
    * would do the OPPOSITE of balancing — co-locate every big clip in
    * the same partition — and plain round-robin balances row counts,
    * not bytes. Hashing only a 64-byte prefix + the length keeps the
    * stripe key cheap on multi-MB payloads and deterministic across
    * retries (unlike monotonically_increasing_id). */
  def repartitionBySize(df: DataFrame, mediaCol: String,
      targetPartitions: Int): DataFrame =
    // the raw 64-bit hash feeds the partitioner (repartition re-hashes the
    // expression): pre-folding it to n residues would leave only n distinct
    // values, whose re-hash can collide into fewer partitions
    df.withColumn("__stripe",
        xxhash64(substring(col(mediaCol), 1, 64), length(col(mediaCol))))
      .repartition(targetPartitions, col("__stripe"))
      .drop("__stripe")
}
