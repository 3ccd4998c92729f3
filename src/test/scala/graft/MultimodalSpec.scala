package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("media table carries opaque binary payloads with typed metadata") {
    val m = Multimodal.mediaTable(spark, sf)
    assert(m.schema("payload").dataType.typeName == "binary")
    val row = m.head()
    assert(row.payload.nonEmpty && row.width >= 16 && Set("png", "jpg", "webp")(row.fmt))
  }

  test("batched decode produces one feature row per media record, partition-local") {
    val m = Multimodal.mediaTable(spark, sf).repartition(7)
    val f = Multimodal.decodeFeatures(m)
    assert(f.count() == m.count())
    // features bounded by byte-value range (fake decoder = chunk means)
    val bad = f.filter(col("f0") < 0 || col("f0") > 255 || col("f3") < 0 || col("f3") > 255).count()
    assert(bad == 0)
  }

  test("decoder seam: an alternate decoder runs through identical plumbing") {
    import graft.multimodal.Multimodal.{MediaFeatures, MediaRecord}
    // trivial alternate decoder: features = byte-length histogram-ish
    // constants — proves decodeFeatures is decoder-agnostic and the
    // fake is swappable without touching the pipeline
    val alt: Multimodal.Decoder = (m: MediaRecord) =>
      MediaFeatures(m.doc_id, m.fmt, m.payload.length,
        m.payload.length.toDouble, 0.0, 1.0, 2.0)
    val media = Multimodal.mediaTable(spark, sf).repartition(5)
    val fake = Multimodal.decodeFeatures(media).collect()
    val other = Multimodal.decodeFeatures(media, alt).collect()
    // same rows out, same ids/fmt/byte counts — only feature values differ
    assert(other.length == fake.length)
    val fk = fake.map(f => f.doc_id -> ((f.fmt, f.n_bytes))).toMap
    assert(other.forall(o => fk(o.doc_id) == ((o.fmt, o.n_bytes))))
    assert(other.forall(o => o.f0 == o.n_bytes.toDouble && o.f3 == 2.0))
  }

  test("real decoder: javax.imageio decodes PNG/BMP/GIF payloads to exact pixel means") {
    import graft.multimodal.Multimodal.MediaRecord
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO

    // encode a real image: left half one solid color, right half
    // another, so the expected channel means are exact rationals
    def encode(fmt: String, w: Int, h: Int, left: Int, right: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) left else right)
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"no $fmt writer in this JDK")
      bos.toByteArray
    }
    // PNG and BMP are lossless; GIF is palette-based but a 2-color
    // image fits one palette exactly — all three decode bit-exact
    val records = Seq(
      MediaRecord(1L, encode("png", 8, 4, 0xff0000, 0x0000ff), 8, 4, "png"),
      MediaRecord(2L, encode("bmp", 6, 6, 0x102030, 0x405060), 6, 6, "bmp"),
      MediaRecord(3L, encode("gif", 4, 4, 0x00ff00, 0x000000), 4, 4, "gif"))
    import spark.implicits._
    val out = Multimodal
      .decodeFeatures(spark.createDataset(records).repartition(3), Multimodal.imageIoDecoder)
      .collect().map(f => f.doc_id -> f).toMap

    // doc 1: half pure red, half pure blue -> R=G=127.5? no: half of
    // pixels red=255 -> mean R = 127.5, G = 0, B = 127.5
    assert(out(1L).f0 == 127.5 && out(1L).f1 == 0.0 && out(1L).f2 == 127.5)
    assert(out(1L).f3 == (299.0 * 127.5 + 114.0 * 127.5) / 1000.0)
    // doc 2: channel means are midpoints of the two halves' values
    assert(out(2L).f0 == (0x10 + 0x40) / 2.0)
    assert(out(2L).f1 == (0x20 + 0x50) / 2.0)
    assert(out(2L).f2 == (0x30 + 0x60) / 2.0)
    // doc 3: half green, half black. The JDK's GIF writer is NOT
    // bit-faithful on tiny images (observed: it zeroes the last row of
    // a 4x4 on this JDK), so assert structure — pure-green/black
    // palette survives (no red/blue bleed), green present — rather
    // than the exact mean the lossless formats get
    assert(out(3L).f0 == 0.0 && out(3L).f2 == 0.0)
    assert(out(3L).f1 > 0.0 && out(3L).f1 <= 127.5)
    // n_bytes is the ENCODED payload size, not the pixel count
    assert(out(1L).n_bytes == records.head.payload.length)
  }

  test("nearest-neighbor grid resize matches hand computation") {
    import graft.multimodal.Multimodal.MediaRecord
    import spark.implicits._
    // 8x8 grid of bytes 0..63; dst (r,c) samples (2r, 2c) -> idx 16r+2c
    // sum over r,c < 4 of (16r + 2c) = 64*(0+1+2+3) + 4*2*(0+1+2+3)/... = 432
    val rec = MediaRecord(7L, (0 until 64).map(_.toByte).toArray, 8, 8, "png")
    val out = Multimodal.resizeNearest(Seq(rec).toDS(), 4, 4).head()
    assert(out.pix_sum == (0 until 4).flatMap(r => (0 until 4).map(c => 16 * r + 2 * c)).sum,
      s"unexpected resize checksum ${out.pix_sum}")
    assert(out.dst_w == 4 && out.dst_h == 4 && out.fmt == "png")
  }

  test("real image resize: nearest-neighbor over a decoded PNG keeps sampled pixels") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, (x * 40) << 16 | (y * 40) << 8 | 7)
    // round-trip through a real PNG encode/decode, then resize 2x2
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", bos), "no png writer in this JDK")
    val decoded = ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    val small = Multimodal.resizeImageNearest(decoded, 2, 2)
    // dst (r,c) samples source (2r, 2c)
    for (r <- 0 until 2; c <- 0 until 2)
      assert((small.getRGB(c, r) & 0xffffff) == (img.getRGB(2 * c, 2 * r) & 0xffffff),
        s"pixel ($r,$c) diverged from source (${2 * r},${2 * c})")
  }

  test("real decoder fails loudly on an undecodable payload") {
    import graft.multimodal.Multimodal.MediaRecord
    import spark.implicits._
    val junk = spark.createDataset(Seq(
      MediaRecord(9L, Array[Byte](1, 2, 3, 4), 2, 2, "png")))
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(junk, Multimodal.imageIoDecoder).collect()
    }
    assert(ex.getMessage != null)
  }

  test("real audio decoder: javax.sound.sampled decodes WAV/PCM to exact duration and RMS") {
    import graft.multimodal.Multimodal.MediaRecord
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    def wav(fmt: AudioFormat, pcm: Array[Byte]): Array[Byte] = {
      val frames = pcm.length / fmt.getFrameSize
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new ByteArrayInputStream(pcm), fmt, frames.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    // stereo 16-bit signed little-endian, 44100 Hz, 441 frames
    // (duration exactly 0.01 s). Channel 0 is a constant +8192
    // (quarter scale -> RMS exactly 0.25); channel 1 is a +/-16384
    // square wave (half scale -> RMS exactly 0.5, peak 0.5). Constant
    // and square signals make every expected feature an exact double.
    val st = new AudioFormat(44100f, 16, 2, true, false)
    val stereoPcm = new Array[Byte](441 * 4)
    for (f <- 0 until 441) {
      val l = 8192
      val r = if (f % 2 == 0) 16384 else -16384
      stereoPcm(f * 4) = (l & 0xff).toByte
      stereoPcm(f * 4 + 1) = ((l >> 8) & 0xff).toByte
      stereoPcm(f * 4 + 2) = (r & 0xff).toByte
      stereoPcm(f * 4 + 3) = ((r >> 8) & 0xff).toByte
    }
    // mono 8-bit unsigned, 8000 Hz, 800 frames (0.1 s), constant 192:
    // centered (192-128)/128 = 0.5 exactly for RMS and peak
    val mo = new AudioFormat(8000f, 8, 1, false, false)
    val monoPcm = Array.fill[Byte](800)(192.toByte)

    val records = Seq(
      MediaRecord(1L, wav(st, stereoPcm), 0, 0, "wav"),
      MediaRecord(2L, wav(mo, monoPcm), 0, 0, "wav"))
    import spark.implicits._
    val out = Multimodal
      .decodeFeatures(spark.createDataset(records).repartition(2), Multimodal.wavDecoder)
      .collect().map(f => f.doc_id -> f).toMap

    assert(out(1L).f0 == 441.0 / 44100.0, s"stereo duration ${out(1L).f0}")
    assert(out(1L).f1 == 0.25, s"channel-0 RMS ${out(1L).f1}")
    assert(out(1L).f2 == 0.5, s"channel-1 RMS ${out(1L).f2}")
    assert(out(1L).f3 == 0.5, s"peak ${out(1L).f3}")
    assert(out(2L).f0 == 0.1, s"mono duration ${out(2L).f0}")
    // mono: first channel == last channel
    assert(out(2L).f1 == 0.5 && out(2L).f2 == 0.5 && out(2L).f3 == 0.5)
    // n_bytes is the ENCODED container size (header + PCM), not frames
    assert(out(1L).n_bytes == records.head.payload.length)
    assert(out(1L).n_bytes > stereoPcm.length)
  }

  test("real audio decoder fails loudly on a non-WAV payload") {
    import graft.multimodal.Multimodal.MediaRecord
    import spark.implicits._
    val junk = spark.createDataset(Seq(
      MediaRecord(9L, Array[Byte](82, 73, 70, 70, 0, 0), 0, 0, "wav")))
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(junk, Multimodal.wavDecoder).collect()
    }
    assert(ex.getMessage != null)
  }

  test("frame sampling emits stride-filtered frames covering the payload") {
    val frames = Multimodal.sampleFrames(Multimodal.mediaTable(spark, sf))
    val perDoc = frames.groupBy("doc_id").count().select("count").distinct().collect()
    assert(perDoc.map(_.getLong(0)).toSet == Set(4L)) // 8 frames, stride 2
    val neg = frames.filter(col("frame_len") < 0).count()
    assert(neg == 0)
  }

  test("perceptual hash: container-invariant on real images, content-sensitive") {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO
    // a gradient-ish image with clear above/below-mean structure
    def mkImage(shift: Int): BufferedImage = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = ((x + shift) * 8) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def roundTrip(img: BufferedImage, fmt: String): BufferedImage = {
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"no $fmt writer")
      ImageIO.read(new ByteArrayInputStream(bos.toByteArray))
    }
    val base = mkImage(0)
    val hPng = Multimodal.perceptualHashImage(roundTrip(base, "png"))
    val hBmp = Multimodal.perceptualHashImage(roundTrip(base, "bmp"))
    // the hash sees decoded pixels — lossless containers are invisible
    assert(hPng == hBmp, "aHash differs across lossless containers")
    assert(hPng == Multimodal.perceptualHashImage(base))
    // a shifted gradient flips above/below-mean cells -> different hash
    val hShift = Multimodal.perceptualHashImage(mkImage(16))
    assert(hShift != hPng, "aHash blind to content change")
    // 16-bit range, not degenerate all-zero/all-one
    assert(hPng >= 0L && hPng < 65536L && hPng != 0L && hPng != 65535L)
  }

  test("perceptual hash over the media table: deterministic, 16-bit, total") {
    val mt = Multimodal.mediaTable(spark, sf)
    val hashes = Multimodal.perceptualHash(mt).toDF()
    val n = mt.count()
    assert(hashes.count() == n, "hash must be total over the media table")
    val bad = hashes.filter(col("phash") < -1L || col("phash") > 65535L).count()
    assert(bad == 0L)
    // two runs agree bit for bit (pure integer pipeline)
    val a = hashes.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = Multimodal.perceptualHash(mt).toDF()
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("real video decoder: pure-JVM AVI/MJPEG container parse + per-frame JPEG decode") {
    import graft.multimodal.Multimodal.MediaRecord
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    import java.nio.{ByteBuffer, ByteOrder}

    // --- a spec-compliant AVI writer: RIFF('AVI ') > LIST(hdrl):
    // avih + LIST(strl): strh('vids'/'MJPG') + strf(BITMAPINFOHEADER)
    // > LIST(movi): one '00dc' chunk per ImageIO-encoded JPEG frame.
    // Little-endian u32 sizes, word-aligned chunk bodies — the real
    // container layout, so the decoder under test is parsing the
    // public format, not a convenient invention.
    def u32(v: Long): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v.toInt).array()
    def u16(v: Int): Array[Byte] =
      ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
      fcc(id) ++ u32(body.length.toLong) ++ body ++ pad
    }
    def list(tp: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(tp) ++ body)

    val w = 16; val h = 16; val nFrames = 5; val fps = 10
    def jpegGray(level: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val rgb = (level << 16) | (level << 8) | level
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "jpg", bos), "no jpg writer in this JDK")
      bos.toByteArray
    }
    val grays = Seq(20, 60, 100, 140, 180)
    val avih = chunk("avih",
      u32(1000000L / fps) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(nFrames.toLong) ++
        u32(0) ++ u32(1) ++ u32(0) ++ u32(w.toLong) ++ u32(h.toLong) ++
        Array.fill[Byte](16)(0))
    val strh = chunk("strh",
      fcc("vids") ++ fcc("MJPG") ++ u32(0) ++ u16(0) ++ u16(0) ++ u32(0) ++
        u32(1) ++ u32(fps.toLong) ++ u32(0) ++ u32(nFrames.toLong) ++ u32(0) ++
        u32(0xFFFFFFFFL) ++ u32(0) ++ u16(0) ++ u16(0) ++ u16(w) ++ u16(h))
    val strf = chunk("strf",
      u32(40) ++ u32(w.toLong) ++ u32(h.toLong) ++ u16(1) ++ u16(24) ++
        fcc("MJPG") ++ u32(w.toLong * h * 3) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      grays.map(g => chunk("00dc", jpegGray(g))).reduce(_ ++ _))
    val content = fcc("AVI ") ++ hdrl ++ movi
    val avi = fcc("RIFF") ++ u32(content.length.toLong) ++ content

    import spark.implicits._
    val out = Multimodal.decodeFeatures(
        spark.createDataset(Seq(MediaRecord(42L, avi, w, h, "avi"))),
        Multimodal.aviMjpegDecoder)
      .collect().head
    assert(out.f0 == nFrames.toDouble, s"frame count: ${out.f0}")
    assert(out.f1 == fps.toDouble, s"fps from avih: ${out.f1}")
    // JPEG is lossy, but a uniform-gray frame is DC-only: the decoded
    // level lands within DC quantization of the original, and for
    // R=G=B the Rec.601 luma equals the gray level
    assert(math.abs(out.f2 - grays.head) <= 3.0, s"first-frame luma: ${out.f2}")
    assert(math.abs(out.f3 - grays.last) <= 3.0, s"last-frame luma: ${out.f3}")
    assert(out.f3 - out.f2 > 100.0,
      "scene-change signal (last-first luma delta) lost in decode")
    // malformed container fails loudly — the no-silent-zeros contract
    val e = intercept[Exception] {
      Multimodal.decodeFeatures(
        spark.createDataset(Seq(MediaRecord(43L, Array[Byte](1, 2, 3, 4, 5), 0, 0, "avi"))),
        Multimodal.aviMjpegDecoder).collect()
    }
    assert(e.getMessage.contains("RIFF") || e.getMessage.contains("aviMjpeg"),
      s"unexpected failure shape: ${e.getMessage}")
  }
}
