package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Q, Tables}

/** Multimodal-column plumbing (north star): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, decoded/featurized
  * in batched partition-local passes.
  *
  * Four decoders ship behind the [[Decoder]] seam:
  *   - [[imageIoDecoder]] — a REAL image decoder over the JDK's
  *     `javax.imageio` (PNG/JPEG/BMP/GIF/WBMP, no external library),
  *     emitting per-channel pixel means. MultimodalSpec drives it over
  *     actual encoded PNG/BMP/GIF payloads.
  *   - [[wavDecoder]] — a REAL audio decoder over the JDK's
  *     `javax.sound.sampled` (WAV/PCM, no external library), emitting
  *     duration + per-channel RMS + peak. MultimodalSpec drives it
  *     over actual encoded WAV payloads with known signal shapes.
  *   - [[aviMjpegDecoder]] — a REAL video decoder for AVI/MJPEG
  *     (RIFF container walked directly — a public chunk format — and
  *     every Motion-JPEG frame is a complete JPEG `javax.imageio`
  *     decodes), emitting frame count, fps and first/last-frame
  *     luminance. MultimodalSpec drives it over a spec-compliant AVI
  *     it writes itself. Inter-frame codecs (H.26x-class) remain out
  *     of scope: THOSE need an ffmpeg-class library this sandbox
  *     doesn't have.
  *   - [[fakeDecoder]] — a clearly-marked DETERMINISTIC FAKE
  *     (chunk-mean "pixels" over the payload bytes), used by the
  *     REGISTERED queries because the `documents` fixture carries text
  *     bytes, not encoded media, and the DuckDB oracle must be able to
  *     recompute the features in SQL.
  * Everything around the seam — schema, Dataset encoders, batch shape,
  * partition balancing — is shared: [[decodeFeatures]] takes the
  * decoder as an argument, so a further codec is the same
  * one-argument swap.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long, payload: Array[Byte], width: Int, height: Int, fmt: String)

  /** Extracted features: fixed-width vector per record. Carries `fmt`
    * through the decode so downstream per-format aggregates need no
    * join back to the media table (which would re-scan it). */
  final case class MediaFeatures(
      doc_id: Long, fmt: String, n_bytes: Int,
      f0: Double, f1: Double, f2: Double, f3: Double)

  /** Batch size for the partition-local decode loop. A real decoder
    * amortizes library/context init over each batch; the value is a
    * latency/memory trade-off, not a correctness knob. */
  val decodeBatchSize = 64

  /** documents -> media table: payload = raw text bytes standing in
    * for encoded media; metadata derived deterministically.
    *
    * NULL text = a missing blob, dropped HERE (r16, found by the
    * null-injected parity corpus): every decoder dereferences
    * `payload` (MediaRecord declares it as the row's content, not an
    * Option), so a null row is an executor NPE three operators deep —
    * the contract belongs at the table boundary. All four multimodal
    * oracles mirror with the same `WHERE text IS NOT NULL`.
    *
    * NULL n_chars = missing media METADATA, dropped at the same
    * boundary (r17 verdict task 3): width/height derive from the
    * NULLABLE n_chars column — not from the non-null PK doc_id, which
    * made metadata nullability structurally impossible and left the
    * metadata-null contract battery-unprovable. A record whose
    * dimensions are unknown is undecodable in a real pipeline (the
    * resize/phash index maps dereference width/height), so the drop
    * is the contract, `MediaRecord.width/height` stay primitive Ints,
    * and all four oracles mirror with `AND n_chars IS NOT NULL` +
    * the same n_chars-derived w/h expressions. On the driver
    * fixtures n_chars is never null, so the ROW SET is unchanged —
    * but q_multimodal_resize/q_multimodal_phash VALUES intentionally
    * moved r17→r18 everywhere (their sample positions read w/h, and
    * 16+n_chars%16 ≠ 16+doc_id%16 per row; parity holds because the
    * oracles moved in lockstep — do not read that diff as a bug).
    * The null corpus (tools/make_null_fixtures.py injects
    * documents.n_chars at 10 permille) is where the DROP binds. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull && col("n_chars").isNotNull)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        (lit(16) + pmod(col("n_chars"), lit(16)).cast("int")).as("width"),
        (lit(16) + pmod(col("n_chars") * 7, lit(16)).cast("int")).as("height"),
        element_at(array(lit("png"), lit("jpg"), lit("webp")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("fmt"))
      .as[MediaRecord]
  }

  /** A decoder turns one opaque media record into its feature row.
    * The decode pipeline is parameterized on this seam so a real
    * `javax.imageio`/ffmpeg implementation is a one-argument swap —
    * the function must be serializable (it ships to executors). */
  type Decoder = MediaRecord => MediaFeatures

  /** STUB DECODER — deterministic fake. Features = mean byte value of
    * the 4 payload quarters (chunk j spans [j*n/4, (j+1)*n/4) with
    * integer floor division, so the SQL oracle can mirror it exactly).
    * A real implementation decodes `payload` per `fmt` instead. */
  val fakeDecoder: Decoder = (m: MediaRecord) => {
    val b = m.payload
    val n = b.length
    def chunkMean(j: Int): Double = {
      // Long multiply before the divide: j*n as Int wraps past ~512 MB
      // payloads, silently zeroing chunk means (the exact silent-zero
      // poison the imageIoDecoder scaladoc forbids — r14 review);
      // results are < n, so the narrowing back to Int is exact
      val start = (j.toLong * n / 4).toInt
      val end = ((j + 1).toLong * n / 4).toInt
      if (end <= start) 0.0
      else {
        var s = 0L
        var i = start
        while (i < end) { s += (b(i) & 0xff); i += 1 }
        s.toDouble / (end - start)
      }
    }
    MediaFeatures(m.doc_id, m.fmt, n,
      chunkMean(0), chunkMean(1), chunkMean(2), chunkMean(3))
  }

  /** REAL image decoder: `javax.imageio` (in the JDK — PNG, JPEG,
    * BMP, GIF, WBMP) decodes the payload to pixels; features are the
    * mean red/green/blue channel values and the mean luminance
    * (Rec.601 integer weights 299/587/114, exact in doubles for 8-bit
    * channels). Fails loudly on an undecodable payload — silently
    * emitting zeros would poison downstream aggregates. Alpha is
    * ignored: `getRGB` returns non-premultiplied sRGB, so RGB means
    * are well-defined for ARGB sources too. */
  val imageIoDecoder: Decoder = (m: MediaRecord) => {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
    require(img != null,
      s"imageIoDecoder: undecodable '${m.fmt}' payload for doc_id=${m.doc_id} " +
        s"(${m.payload.length} bytes) — javax.imageio found no matching reader")
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    MediaFeatures(m.doc_id, m.fmt, m.payload.length,
      sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
      (299L * sr + 587L * sg + 114L * sb).toDouble / (1000.0 * n))
  }

  /** REAL audio decoder: `javax.sound.sampled` (in the JDK) parses
    * the WAV container and yields raw PCM frames; features are
    *   f0 = duration in seconds (frames / frameRate),
    *   f1 = RMS amplitude of the FIRST channel,
    *   f2 = RMS amplitude of the LAST channel (== f1 for mono),
    *   f3 = peak absolute amplitude across all channels,
    * all normalized to [0, 1] by full scale. Supports the formats the
    * JDK's WAV reader emits without a codec: signed 16-bit and
    * signed/unsigned 8-bit integer PCM, any channel count, either
    * endianness. Fails loudly on an unparseable payload or a PCM
    * layout outside that set — same no-silent-zeros contract as
    * [[imageIoDecoder]]. Per-channel RMS (not a pooled mono mix) is
    * the curation signal that catches one-dead-channel recordings,
    * which a mixed RMS averages away. */
  val wavDecoder: Decoder = (m: MediaRecord) => {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(m.payload))
    try {
      val fmt = in.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      require(signed || enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
        s"wavDecoder: non-PCM encoding $enc for doc_id=${m.doc_id}")
      require(bits == 8 || bits == 16,
        s"wavDecoder: unsupported sample size $bits bits for doc_id=${m.doc_id}")
      val ch = fmt.getChannels
      val bytesPerSample = bits / 8
      val frameBytes = fmt.getFrameSize
      val raw = in.readAllBytes()
      require(raw.length % frameBytes == 0,
        s"wavDecoder: ${raw.length} PCM bytes not a frame multiple for doc_id=${m.doc_id}")
      val nFrames = raw.length / frameBytes
      require(nFrames > 0, s"wavDecoder: zero frames for doc_id=${m.doc_id}")
      val fullScale = if (bits == 16) 32768.0 else 128.0
      def sample(frame: Int, c: Int): Double = {
        val off = frame * frameBytes + c * bytesPerSample
        val v =
          if (bits == 8) {
            val b = raw(off).toInt
            if (signed) b else (b & 0xff) - 128 // center unsigned at 0
          } else {
            val (lo, hi) = if (fmt.isBigEndian) (off + 1, off) else (off, off + 1)
            ((raw(hi).toInt << 8) | (raw(lo) & 0xff)).toShort.toInt
          }
        v / fullScale
      }
      var s2First = 0.0; var s2Last = 0.0; var peak = 0.0
      var f = 0
      while (f < nFrames) {
        var c = 0
        while (c < ch) {
          val x = sample(f, c)
          val ax = math.abs(x)
          if (ax > peak) peak = ax
          if (c == 0) s2First += x * x
          if (c == ch - 1) s2Last += x * x
          c += 1
        }
        f += 1
      }
      MediaFeatures(m.doc_id, m.fmt, m.payload.length,
        nFrames / fmt.getFrameRate.toDouble,
        math.sqrt(s2First / nFrames), math.sqrt(s2Last / nFrames), peak)
    } finally in.close()
  }

  /** Rec.601 mean luminance of a decoded frame — the shared pixel
    * fold of [[imageIoDecoder]] (integer weights 299/587/114, exact
    * in doubles for 8-bit channels). */
  private def lumaMean(img: java.awt.image.BufferedImage): Double = {
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    (299L * sr + 587L * sg + 114L * sb).toDouble / (1000.0 * w.toLong * h)
  }

  /** REAL video decoder: AVI/MJPEG, pure JVM. The AVI container is a
    * public RIFF chunk format — `fourcc | u32le size | body`, bodies
    * word-aligned, `LIST` chunks nesting a type fourcc plus
    * sub-chunks — and Motion-JPEG stores every frame as a complete
    * baseline JPEG, which the JDK's `javax.imageio` decodes. So for
    * THIS codec no ffmpeg-class library is needed: the decoder walks
    * the RIFF tree, reads `avih.dwMicroSecPerFrame` from the header
    * list, collects the `##dc` frame chunks under `movi`, and decodes
    * the first and last frames. Features:
    *   f0 = frame count (parsed `##dc` chunks),
    *   f1 = frames per second (1e6 / dwMicroSecPerFrame),
    *   f2 = mean Rec.601 luminance of the FIRST frame,
    *   f3 = mean Rec.601 luminance of the LAST frame —
    * f2 vs f3 is the cheap scene-change/static-clip curation signal.
    * Fails loudly on a malformed container, a frameless stream or an
    * undecodable frame (the [[imageIoDecoder]] no-silent-zeros
    * contract). Inter-frame codecs (H.26x/VP9/AV1) remain the
    * ffmpeg-class seam documented at [[fakeDecoder]]; MJPEG is
    * intra-only, which is exactly why a container parser suffices.
    * MultimodalSpec drives this over a spec-compliant AVI it writes
    * itself (RIFF/hdrl/avih/strl/movi) with ImageIO-encoded JPEG
    * frames of known luminance. */
  val aviMjpegDecoder: Decoder = (m: MediaRecord) => {
    val b = m.payload
    def u32(off: Int): Long =
      ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    def fourcc(off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    require(b.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ",
      s"aviMjpegDecoder: not a RIFF/AVI payload for doc_id=${m.doc_id} " +
        s"(${b.length} bytes)")
    val riffEnd = math.min(b.length.toLong, 8L + u32(4)).toInt
    var microSecPerFrame = 0L
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(start: Int, end: Int, depth: Int = 0): Unit = {
      // bounded recursion: a hostile container of ~80k nested 12-byte
      // LIST headers passes every size check and would otherwise
      // StackOverflowError — which is NOT NonFatal, so Spark's
      // uncaught handler kills the whole executor JVM, not the task
      // (r14 review). Real AVI nests ~3 deep; 64 is generous.
      require(depth <= 64,
        s"aviMjpegDecoder: LIST nesting deeper than 64 at offset $start " +
          s"for doc_id=${m.doc_id} — hostile container")
      var off = start
      while (off + 8 <= end) {
        val id = fourcc(off)
        // a u32 size >= 2^31 would wrap negative as Int: sz = -8 stalls
        // the walk (off never advances) and other negatives move it
        // BACKWARDS — reject before use so a hostile container throws
        // instead of hanging the executor (fail-loudly contract)
        val szL = u32(off + 4)
        require(szL <= Int.MaxValue,
          s"aviMjpegDecoder: chunk '$id' at $off declares size $szL " +
            s"(> Int.MaxValue) for doc_id=${m.doc_id}")
        val sz = szL.toInt
        val body = off + 8
        // Long-side compare: body + sz can itself wrap Int when sz is
        // near Int.MaxValue, which would sneak past an Int comparison
        require(body.toLong + sz <= end,
          s"aviMjpegDecoder: chunk '$id' at $off overruns its parent " +
            s"(size $sz, parent end $end) for doc_id=${m.doc_id}")
        if (id == "LIST") walk(body + 4, body + sz, depth + 1) // skip the list-type fourcc
        else if (id == "avih") microSecPerFrame = u32(body)
        else if (sz > 0 && id.endsWith("dc")) frames += ((body, sz))
        off = body + sz + (sz & 1) // chunks are word-aligned
      }
    }
    walk(12, riffEnd)
    require(frames.nonEmpty,
      s"aviMjpegDecoder: no '##dc' frame chunks for doc_id=${m.doc_id}")
    def frameLuma(f: (Int, Int)): Double = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(b, f._1, f._2))
      require(img != null,
        s"aviMjpegDecoder: undecodable frame at offset ${f._1} " +
          s"(${f._2} bytes) for doc_id=${m.doc_id}")
      lumaMean(img)
    }
    val fps = if (microSecPerFrame > 0) 1.0e6 / microSecPerFrame else 0.0
    MediaFeatures(m.doc_id, m.fmt, b.length,
      frames.size.toDouble, fps, frameLuma(frames.head), frameLuma(frames.last))
  }

  /** Batched partition-local decode: the distributed shape is
    * `mapPartitions` over grouped iterators — no per-row library
    * setup, no driver collect, partition-parallel. The decoder is
    * injected (default: the labeled fake) so swapping in a real media
    * library changes this call site's argument and nothing else —
    * MultimodalSpec proves the plumbing is decoder-agnostic. */
  def decodeFeatures(media: Dataset[MediaRecord],
                     decoder: Decoder = fakeDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        // real decoders init codec context once per batch here
        batch.map(decoder)
      }
    }
  }

  /** "Video" frame sampling: split the payload into `nFrames` equal
    * byte ranges and emit one row per sampled frame (every `stride`-th
    * frame) — the explode-style fan-out a frame extractor needs. */
  def sampleFrames(media: Dataset[MediaRecord], nFrames: Int = 8, stride: Int = 2)
      : DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.toDF()
      // LONG from the start: frame_id * n_bytes in Int wraps negative
      // past ~306 MB payloads at nFrames=8, silently corrupting frame
      // offsets (r14 review); the products stay ≤ 2^34, exact in the
      // double division below
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .select(col("doc_id"), col("n_bytes"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_id"))
      .filter(pmod(col("frame_id"), lit(stride)) === 0)
      .withColumn("frame_start", (col("frame_id") * col("n_bytes") / nFrames).cast("long"))
      .withColumn("frame_len",
        (((col("frame_id") + 1) * col("n_bytes") / nFrames).cast("long") - col("frame_start")))
      .select(col("doc_id"), col("frame_id"), col("frame_start"), col("frame_len"))
  }

  /** One resized record: the checksum of the nearest-neighbor-sampled
    * pixel grid (exact integer — no float resampling kernels, so the
    * SQL oracle mirrors it digit for digit). */
  final case class ResizedMedia(
      doc_id: Long, fmt: String, dst_w: Int, dst_h: Int, pix_sum: Long)

  /** Nearest-neighbor resize over the payload-as-grid: the record's
    * typed metadata (width x height) defines a row-major byte grid
    * over the payload (index modulo payload length — the fixture's
    * text bytes are shorter than w*h, same stand-in rule as
    * [[fakeDecoder]]), and destination pixel (r, c) samples source
    * ((r*h) div dstH, (c*w) div dstW) — the standard integer
    * nearest-neighbor map. Batched `mapPartitions`, the
    * [[decodeFeatures]] distributed shape: partition-local, no
    * per-row setup, no driver collect. [[resizeImageNearest]] is the
    * same map over a REAL decoded `BufferedImage` (spec-driven). */
  /** The ONE spelling of the payload-as-grid nearest-neighbor sample
    * (r14 review: it lived copied in [[resizeNearest]] and
    * [[perceptualHash]]): destination (r, c) samples source
    * ((r*h) div dstH, (c*w) div dstW), row-major index modulo payload
    * length. Index math is LONG — claimed metadata dims near
    * Int.MaxValue would wrap `sr*width` as Int and sample garbage
    * offsets; the modulo result fits Int because the payload length
    * does. Caller guarantees a non-empty payload. */
  private def samplePixels(payload: Array[Byte], width: Int, height: Int,
                           dstW: Int, dstH: Int): Array[Long] = {
    val n = payload.length
    val px = new Array[Long](dstW * dstH)
    var r = 0
    while (r < dstH) {
      val sr = r.toLong * height / dstH
      var c = 0
      while (c < dstW) {
        val sc = c.toLong * width / dstW
        px(r * dstW + c) =
          (payload(((sr * width + sc) % n).toInt) & 0xff).toLong
        c += 1
      }
      r += 1
    }
    px
  }

  /** The aHash bit rule, shared by [[perceptualHash]] and
    * [[perceptualHashImage]]: bit i set iff vals(i) is STRICTLY above
    * the mean, compared in exact integers (v*k > sum — never a float
    * mean, so the SQL oracle mirrors it bit for bit). */
  private def bitsAboveMean(vals: Array[Long]): Long = {
    val tot = vals.sum
    val k = vals.length
    var bits = 0L
    var i = 0
    while (i < k) {
      if (vals(i) * k > tot) bits |= (1L << i)
      i += 1
    }
    bits
  }

  def resizeNearest(media: Dataset[MediaRecord], dstW: Int = 4, dstH: Int = 4)
      : Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        batch.map { m =>
          val s =
            if (m.payload.length == 0) 0L
            else samplePixels(m.payload, m.width, m.height, dstW, dstH).sum
          ResizedMedia(m.doc_id, m.fmt, dstW, dstH, s)
        }
      }
    }
  }

  /** One perceptual hash: 16-bit aHash over the 4x4 thumbnail. */
  final case class MediaHash(doc_id: Long, fmt: String, phash: Long)

  /** Perceptual (average) hash over the [[resizeNearest]] pixel grid:
    * bit i of the 16-bit hash is set iff thumbnail pixel i is STRICTLY
    * above the thumbnail mean — compared in exact integers
    * (px*16 > sum, never a float mean), so the SQL oracle mirrors it
    * bit for bit. aHash is the classic near-duplicate IMAGE
    * fingerprint (same content re-encoded PNG/BMP/JPEG-lossless hashes
    * identically because the hash sees decoded pixels, not container
    * bytes — [[perceptualHashImage]] + MultimodalSpec prove that on
    * real javax.imageio payloads). Empty payloads get sentinel -1.
    *
    * 100 TB shape: one batched partition-local pass (decode seam),
    * then dedup is hash-groupBy on the 16-bit key — the exact-dedup
    * plan class, no pair expansion. Hamming-tolerant matching would
    * band the hash (the SimHash pigeonhole pattern, Dedup.scala). */
  def perceptualHash(media: Dataset[MediaRecord], dstW: Int = 4, dstH: Int = 4)
      : Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        batch.map { m =>
          if (m.payload.length == 0) MediaHash(m.doc_id, m.fmt, -1L)
          else MediaHash(m.doc_id, m.fmt, bitsAboveMean(
            samplePixels(m.payload, m.width, m.height, dstW, dstH)))
        }
      }
    }
  }

  /** REAL-image aHash: the [[perceptualHash]] bit rule over a decoded
    * `BufferedImage` — NN-resample to dstW x dstH, per-pixel integer
    * Rec.601 luminance (299r+587g+114b, NOT divided — exact), bit set
    * iff lum*k > sum. Container-invariant by construction: PNG and BMP
    * encodings of the same pixels hash identically (spec-driven). */
  def perceptualHashImage(img: java.awt.image.BufferedImage,
                          dstW: Int = 4, dstH: Int = 4): Long = {
    val k = dstW * dstH
    val lum = new Array[Long](k)
    var r = 0
    while (r < dstH) {
      val sr = r * img.getHeight / dstH
      var c = 0
      while (c < dstW) {
        val p = img.getRGB(c * img.getWidth / dstW, sr)
        lum(r * dstW + c) =
          299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
        c += 1
      }
      r += 1
    }
    bitsAboveMean(lum)
  }

  /** REAL nearest-neighbor image resize (the [[resizeNearest]] index
    * map over a decoded `BufferedImage`) — spec-driven with
    * `javax.imageio` payloads, same seam contract as
    * [[imageIoDecoder]]. */
  def resizeImageNearest(img: java.awt.image.BufferedImage, dstW: Int, dstH: Int)
      : java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      dstW, dstH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < dstH) {
      val sr = r * img.getHeight / dstH
      var c = 0
      while (c < dstW) {
        out.setRGB(c, r, img.getRGB(c * img.getWidth / dstW, sr) & 0xffffff)
        c += 1
      }
      r += 1
    }
    out
  }

  /** Q: full decode path — media table -> balanced partitions ->
    * batched decode -> per-format feature aggregate. The oracle
    * recomputes the fake decoder's chunk means in SQL, cross-checking
    * the typed plumbing end-to-end. */
  val featuresQuery = Q(
    "q_multimodal_features",
    (spark, dir) => {
      decodeFeatures(mediaTable(spark, dir)).toDF()
        .groupBy(col("fmt"))
        .agg(count(lit(1)).as("n_media"),
             sum(col("n_bytes")).as("sum_bytes"),
             // per-doc double sum is order-fixed (f0+f1+f2+f3 left to
             // right on both engines); integer 1e-6 units before the
             // group sum keep the aggregate association-order
             // independent and decimal-representation-proof
             sum(graft.model.Money.cents(
               col("f0") + col("f1") + col("f2") + col("f3"),
               1000000.0)).as("sum_f"))
    },
    Some("""
      WITH m AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' ELSE 'webp' END AS fmt,
               length(text) AS n,
               [CAST(ascii(text[i]) AS BIGINT) for i in range(1, length(text) + 1)] AS codes
        FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
      f AS (
        SELECT doc_id, fmt, n,
               COALESCE(list_sum(codes[(0 * n) // 4 + 1 : (1 * n) // 4]), 0)::DOUBLE / greatest((1 * n) // 4 - (0 * n) // 4, 1)
             + COALESCE(list_sum(codes[(1 * n) // 4 + 1 : (2 * n) // 4]), 0)::DOUBLE / greatest((2 * n) // 4 - (1 * n) // 4, 1)
             + COALESCE(list_sum(codes[(2 * n) // 4 + 1 : (3 * n) // 4]), 0)::DOUBLE / greatest((3 * n) // 4 - (2 * n) // 4, 1)
             + COALESCE(list_sum(codes[(3 * n) // 4 + 1 : (4 * n) // 4]), 0)::DOUBLE / greatest((4 * n) // 4 - (3 * n) // 4, 1) AS sum_f
        FROM m)
      -- COALESCE mirrors the decoder's 0.0 for an empty quarter chunk
      -- (docs shorter than 4 bytes); character==byte here because the
      -- documents fixture is all-ASCII — a binary-true formulation
      -- would need DuckDB blob indexing
      SELECT fmt, count(*) AS n_media, CAST(sum(n) AS BIGINT) AS sum_bytes,
             CAST(sum(CAST(floor((sum_f) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_f
      FROM f
      GROUP BY fmt
    """))

  /** Q: frame-sampling fan-out totals per frame id. */
  val framesQuery = Q(
    "q_multimodal_frames",
    (spark, dir) => {
      sampleFrames(mediaTable(spark, dir))
        .groupBy(col("frame_id"))
        .agg(count(lit(1)).as("n_frames"),
             sum(col("frame_len")).as("sum_len"))
    },
    Some("""
      SELECT frame_id, count(*) AS n_frames, CAST(sum(frame_len) AS BIGINT) AS sum_len
      FROM (
        SELECT doc_id, frame_id,
               ((frame_id + 1) * length(text)) // 8 - (frame_id * length(text)) // 8 AS frame_len
        FROM documents, (SELECT unnest(range(0, 8)) AS frame_id)
        WHERE frame_id % 2 = 0 AND text IS NOT NULL AND n_chars IS NOT NULL)
      GROUP BY frame_id
    """))

  /** Q: resize fan-in — nearest-neighbor 4x4 thumbnails of every
    * media record, rolled up per format. The oracle replays the exact
    * integer index map over the text-byte grid (16 fixed sample
    * positions per record). */
  val resizeQuery = Q(
    "q_multimodal_resize",
    (spark, dir) => {
      resizeNearest(mediaTable(spark, dir)).toDF()
        .groupBy(col("fmt"))
        .agg(count(lit(1)).as("n_media"),
             sum(col("pix_sum")).as("sum_pix"))
    },
    Some("""
      -- length(text)/ascii(...) mirror payload BYTES only because the
      -- documents fixture is all-ASCII (character == byte); a non-ASCII
      -- fixture regeneration breaks this parity — same assumption as
      -- the features oracle above
      WITH m AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' ELSE 'webp' END AS fmt,
               CAST(16 + n_chars % 16 AS BIGINT) AS w,
               CAST(16 + (n_chars * 7) % 16 AS BIGINT) AS h,
               CAST(length(text) AS BIGINT) AS n, text
        FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
      r AS (
        SELECT fmt,
               CASE WHEN n = 0 THEN 0 ELSE
                 list_sum([CAST(ascii(text[
                     CAST(((((i // 4) * h) // 4) * w + (((i % 4) * w) // 4)) % n + 1 AS BIGINT)
                   ]) AS BIGINT) for i in range(0, 16)])
               END AS pix_sum
        FROM m)
      SELECT fmt, count(*) AS n_media, CAST(sum(pix_sum) AS BIGINT) AS sum_pix
      FROM r
      GROUP BY fmt
    """))

  /** Q: perceptual-hash image dedup profile — every media record
    * aHashed ([[perceptualHash]]), then the bucket-size histogram of
    * the 16-bit hash space: how many hash buckets hold 1, 2, 3…
    * records. Bucket size > 1 = perceptual near-duplicate group (the
    * image twin of exact content dedup; same-hash grouping, no pair
    * expansion). The oracle replays the 16 sampled bytes and the
    * integer bit rule in SQL. */
  val phashQuery = Q(
    "q_multimodal_phash",
    (spark, dir) => {
      perceptualHash(mediaTable(spark, dir)).toDF()
        .groupBy(col("phash"))
        .agg(count(lit(1)).as("n_media"))
        .groupBy(col("n_media").as("bucket_size"))
        .agg(count(lit(1)).as("n_buckets"),
             min(col("phash")).as("min_phash"),
             max(col("phash")).as("max_phash"))
    },
    Some("""
      -- character==byte because the documents fixture is all-ASCII
      -- (same assumption as the features/resize oracles; pinned by
      -- FormatsSpec's fixture-contract test)
      WITH m AS (
        SELECT doc_id,
               CAST(16 + n_chars % 16 AS BIGINT) AS w,
               CAST(16 + (n_chars * 7) % 16 AS BIGINT) AS h,
               CAST(length(text) AS BIGINT) AS n, text
        FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
      v AS (
        SELECT doc_id, n,
               [CAST(ascii(text[
                   CAST(((((i // 4) * h) // 4) * w + (((i % 4) * w) // 4)) % n + 1 AS BIGINT)
                 ]) AS BIGINT) for i in range(0, 16)] AS px
        FROM m WHERE n > 0),
      hashed AS (
        SELECT doc_id,
               CAST(list_sum([CASE WHEN px[i + 1] * 16 > list_sum(px)
                         THEN 1 << i ELSE 0 END for i in range(0, 16)]) AS BIGINT) AS phash
        FROM v
        UNION ALL
        SELECT doc_id, CAST(-1 AS BIGINT) AS phash FROM m WHERE n = 0),
      buckets AS (
        SELECT phash, CAST(count(*) AS BIGINT) AS n_media
        FROM hashed GROUP BY phash)
      SELECT n_media AS bucket_size, count(*) AS n_buckets,
             min(phash) AS min_phash, max(phash) AS max_phash
      FROM buckets GROUP BY 1
    """))

  def all: Seq[Q] = Seq(featuresQuery, framesQuery, resizeQuery, phashQuery)
}
