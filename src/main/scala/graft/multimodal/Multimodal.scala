package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * travel as opaque `binary` columns with *typed* metadata structs, and
  * the compute-heavy steps (decode, resize, frame-sample) run as
  * partition-wise batch transforms.
  *
  * The IMAGE leg is REAL: [[JvmImageCodec]] decodes/encodes PNG (and
  * decodes JPEG/BMP/GIF) through the JDK's own `javax.imageio` — no
  * external libraries needed — with integer-exact nearest-neighbor
  * resize and luma histogram features, all oracle-checkable closed-form
  * (PNG is lossless, the arithmetic is integral). AUDIO is real too
  * ([[JvmAudioCodec]]: WAV/AIFF/AU via `javax.sound.sampled`), and the
  * VIDEO story now has three real legs: multi-frame GIF animation
  * ([[JvmGifCodec]]), MJPEG-in-AVI ([[JvmAviCodec]] — hand-written
  * RIFF container walk + per-frame JDK JPEG decode), and raw YUV4MPEG2
  * ([[JvmY4mCodec]] — the uncompressed FFmpeg/x264 interchange
  * format, luma-exact). Only inter-frame-
  * predicted codecs (H.264-class) remain the declared [[StubCodec]]:
  * deterministic fake properties stand in, while everything around
  * them is real and load-bearing at scale — the schema contract, the
  * `mapPartitions` batch shape (one codec init per partition, not per
  * row — exactly how a JNI/FFmpeg binding must be amortized), and the
  * repartition-by-size guard that keeps any single task from holding
  * too many large blobs.
  */
final case class MediaMeta(mimeType: String, width: Int, height: Int, durationMs: Long)
final case class MediaRecord(mediaId: Long, kind: String, content: Array[Byte])
final case class DecodedMedia(mediaId: Long, kind: String, content: Array[Byte],
    meta: MediaMeta, features: Array[Float])

object Multimodal {

  // javax.imageio defaults to DISK-backed stream caches: every
  // ImageIO.read/write spins up a temp-file-cached stream, so a
  // per-frame MJPEG encode/decode pays a filesystem round-trip per
  // frame (guide §1.2 "per-task work" — m8 measured ~1.6 s CPU per
  // 64-frame clip, mostly cache-file churn). Memory-cached streams
  // produce byte-identical codec output; this is pure IO plumbing.
  javax.imageio.ImageIO.setUseCache(false)

  /** STUB — replace with a real codec binding. Deterministic: properties
    * are pure functions of the blob bytes. */
  object StubCodec {
    def sniffMime(bytes: Array[Byte]): String =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "image/jpeg"
      else if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "image/png"
      else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') "image/gif"
      else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == 'F' && bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I') "video/x-msvideo"
      else if (bytes.length >= 9 && new String(bytes, 0, 9, "US-ASCII") == "YUV4MPEG2")
        "video/x-yuv4mpeg"
      else "application/octet-stream"

    def decodeMeta(bytes: Array[Byte]): MediaMeta = {
      val h = java.util.Arrays.hashCode(bytes)
      MediaMeta(sniffMime(bytes), 16 + math.abs(h % 1024), 16 + math.abs((h / 1024) % 1024),
        bytes.length.toLong)
    }

    /** Fake feature extractor: 8-dim byte-histogram-ish embedding. */
    def features(bytes: Array[Byte]): Array[Float] = {
      val f = new Array[Float](8)
      var i = 0
      while (i < bytes.length) { f((bytes(i) & 0xff) % 8) += 1f; i += 1 }
      if (bytes.length > 0) { var j = 0; while (j < 8) { f(j) /= bytes.length; j += 1 } }
      f
    }

    /** Fake resize: truncation keeping a deterministic prefix. */
    def resize(bytes: Array[Byte], maxBytes: Int): Array[Byte] =
      if (bytes.length <= maxBytes) bytes else java.util.Arrays.copyOfRange(bytes, 0, maxBytes)

    /** Fake frame sampler: every nth 1KiB slice as a "frame". */
    def sampleFrames(bytes: Array[Byte], everyN: Int): Seq[Array[Byte]] =
      bytes.grouped(1024).zipWithIndex.collect { case (b, i) if i % everyN == 0 => b }.toSeq
  }

  /** REAL image codec on the JDK's built-in `javax.imageio` — decodes
    * PNG/JPEG/BMP/GIF, encodes PNG (lossless, so a synthesize→encode→
    * decode round trip is pixel-exact and closed-form oracle-checkable).
    * Resize is explicit integer nearest-neighbor (sx = x·srcW / dstW)
    * rather than Graphics2D interpolation, and features are integer
    * luma histograms — no floating point, no platform variance. */
  object JvmImageCodec {

    def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }

    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    def meta(bytes: Array[Byte]): Option[MediaMeta] =
      decodeImage(bytes).map(img =>
        MediaMeta(StubCodec.sniffMime(bytes), img.getWidth, img.getHeight, 0L))

    /** Integer nearest-neighbor: destination (x, y) samples source
      * (x·srcW / dstW, y·srcH / dstH) — floor division, exactly
      * reproducible in SQL. */
    def resizeNearest(img: java.awt.image.BufferedImage, dstW: Int, dstH: Int): java.awt.image.BufferedImage = {
      val out = new java.awt.image.BufferedImage(dstW, dstH,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < dstH) {
        var x = 0
        while (x < dstW) {
          out.setRGB(x, y, img.getRGB(x * img.getWidth / dstW, y * img.getHeight / dstH))
          x += 1
        }
        y += 1
      }
      out
    }

    /** 64-bit difference hash (dHash, the standard perceptual image
      * fingerprint): nearest-neighbor resize to 9×8, integer luma, bit
      * Y·8+X set iff luma(X+1,Y) > luma(X,Y). Every step is integral
      * (the [[resizeNearest]]/luma kernels), so the hash is bit-stable
      * across platforms and closed-form-predictable for synthesized
      * rasters. */
    def dHash(img: java.awt.image.BufferedImage): Long = {
      val g = resizeNearest(img, 9, 8)
      def luma(x: Int, y: Int): Int = {
        val rgb = g.getRGB(x, y)
        (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
      }
      var h = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (luma(x + 1, y) > luma(x, y)) h |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      h
    }

    /** Integer luma histogram: luma = (299·R + 587·G + 114·B) / 1000
      * (floor), bucket = luma · nBuckets / 256. */
    def lumaHistogram(img: java.awt.image.BufferedImage, nBuckets: Int): Array[Long] = {
      val h = new Array[Long](nBuckets)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
            + 114 * (rgb & 0xff)) / 1000
          h(luma * nBuckets / 256) += 1L
          x += 1
        }
        y += 1
      }
      h
    }
  }

  /** REAL audio codec on the JDK's built-in `javax.sound.sampled` —
    * parses WAV/AIFF/AU headers and PCM frames without external
    * libraries. Features are integer (sum of |sample|, peak), so a
    * synthesize→encode→decode round trip is closed-form
    * oracle-checkable like the image leg. */
  object JvmAudioCodec {

    final case class AudioMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
        nFrames: Long, durationMs: Long)

    /** Little-endian s16 PCM mono → a complete RIFF/WAVE blob (the
      * encoder side; deterministic byte-for-byte). */
    def encodeWavS16Mono(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val out = new java.io.ByteArrayOutputStream(44 + dataLen)
      def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
      def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      out.write("RIFF".getBytes); le32(36 + dataLen); out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); le32(16); le16(1) // PCM
      le16(1); le32(sampleRate); le32(sampleRate * 2); le16(2); le16(16)
      out.write("data".getBytes); le32(dataLen)
      samples.foreach(s => le16(s & 0xffff))
      out.toByteArray
    }

    /** REAL decode through AudioSystem: header → format + frame count,
      * stream → PCM bytes. None on non-audio bytes. */
    def decode(bytes: Array[Byte]): Option[(AudioMeta, Array[Byte])] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          val pcm = in.readAllBytes()
          val frames = in.getFrameLength
          Some((AudioMeta(f.getSampleRate.toInt, f.getChannels,
            f.getSampleSizeInBits, frames,
            frames * 1000L / f.getSampleRate.toInt), pcm))
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Integer features over little-endian s16 mono PCM: (Σ|sample|,
      * max |sample|) — closed-form reproducible in SQL. */
    def s16Features(pcm: Array[Byte]): (Long, Long) = {
      var sum = 0L
      var peak = 0L
      var i = 0
      while (i + 1 < pcm.length) {
        val s = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort.toInt
        val a = math.abs(s.toLong)
        sum += a
        if (a > peak) peak = a
        i += 2
      }
      (sum, peak)
    }
  }

  /** REAL multi-frame (animation) codec on `javax.imageio`'s GIF
    * sequence writer/reader — the frame-enumeration and frame-sampling
    * leg of the video story on a format the JDK genuinely ships.
    * Caveat, measured: GIF palette quantization is pixel-exact for
    * frames of uniform (or few) colors but NOT for arbitrary
    * multi-color rasters — so pipelines oracle frame counts, dims and
    * uniform-frame stats, and real video codecs (H.264-class) remain
    * the declared stub. */
  object JvmGifCodec {

    def encodeAnimatedGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
      ios.close()
      writer.dispose()
      out.toByteArray
    }

    /** All frames of a multi-frame GIF, in order; None on non-GIF. */
    def decodeFrames(bytes: Array[Byte]): Option[Seq[java.awt.image.BufferedImage]] =
      try {
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        reader.setInput(javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
        try {
          val n = reader.getNumImages(true)
          if (n <= 0) None else Some((0 until n).map(reader.read))
        } finally reader.dispose()
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Every `everyN`-th frame starting at 0 — the frame-sampling
      * primitive a video pipeline runs before feature extraction. */
    def sampleFrames[A](frames: Seq[A], everyN: Int): Seq[A] =
      frames.zipWithIndex.collect { case (f, i) if i % everyN == 0 => f }
  }

  final case class AviMeta(width: Int, height: Int, nFrames: Long,
      usecPerFrame: Long, durationMs: Long)

  /** REAL video-container codec: MJPEG-in-AVI, parseable with pure JVM
    * — the RIFF walk is hand-written against the public AVI layout
    * (RIFF('AVI ' LIST(hdrl avih LIST(strl strh strf)) LIST(movi 00dc…)
    * idx1)) and each frame payload is a genuine JPEG decoded by
    * `javax.imageio`. This retires the former video `StubCodec` leg for
    * the container + per-frame-decode half of the story; only
    * inter-frame-predicted codecs (H.264-class) remain out of JVM
    * reach. Measured: the JDK JPEG round-trips UNIFORM-gray frames
    * pixel-exactly at every value 0..255 and at non-multiple-of-8
    * dims — the regime m5's closed-form oracle uses (arbitrary rasters
    * are lossy, like any JPEG). */
  object JvmAviCodec {

    private def fourCC(s: String): Array[Byte] = s.getBytes("US-ASCII")

    private def le32(v: Long): Array[Byte] =
      Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

    private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)

    private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length % 2 // RIFF chunks are word-aligned
      val out = new java.io.ByteArrayOutputStream()
      out.write(fourCC(id)); out.write(le32(body.length.toLong))
      out.write(body); if (pad == 1) out.write(0)
      out.toByteArray
    }

    private def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(fourCC("LIST")); out.write(le32(body.length.toLong + 4))
      out.write(fourCC(kind)); out.write(body)
      out.toByteArray
    }

    /** Encode frames as an MJPEG AVI: each frame JPEG-compressed by the
      * JDK encoder into a `00dc` chunk, plus a standard idx1 index. */
    def encodeMjpegAvi(frames: Seq[java.awt.image.BufferedImage], fps: Int): Array[Byte] = {
      require(frames.nonEmpty && fps > 0, "need at least one frame and fps > 0")
      val w = frames.head.getWidth
      val h = frames.head.getHeight
      val jpegs = frames.map { f =>
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(f, "jpg", out)
        out.toByteArray
      }
      val usecPerFrame = 1000000L / fps
      val maxJpeg = jpegs.map(_.length).max.toLong
      val avih = {
        val b = new java.io.ByteArrayOutputStream()
        b.write(le32(usecPerFrame)); b.write(le32(maxJpeg * fps))
        b.write(le32(0)); b.write(le32(0x10)) // AVIF_HASINDEX
        b.write(le32(jpegs.length.toLong)); b.write(le32(0))
        b.write(le32(1)); b.write(le32(maxJpeg))
        b.write(le32(w.toLong)); b.write(le32(h.toLong))
        (0 until 4).foreach(_ => b.write(le32(0)))
        b.toByteArray
      }
      val strh = {
        val b = new java.io.ByteArrayOutputStream()
        b.write(fourCC("vids")); b.write(fourCC("MJPG"))
        b.write(le32(0)); b.write(le16(0)); b.write(le16(0))
        b.write(le32(0)); b.write(le32(1)); b.write(le32(fps.toLong)) // scale=1, rate=fps
        b.write(le32(0)); b.write(le32(jpegs.length.toLong))
        b.write(le32(maxJpeg)); b.write(le32(0xffffffffL)) // quality = default
        b.write(le32(0))
        b.write(le16(0)); b.write(le16(0)); b.write(le16(w)); b.write(le16(h))
        b.toByteArray
      }
      val strf = {
        val b = new java.io.ByteArrayOutputStream()
        b.write(le32(40)); b.write(le32(w.toLong)); b.write(le32(h.toLong))
        b.write(le16(1)); b.write(le16(24)); b.write(fourCC("MJPG"))
        b.write(le32((w * h * 3).toLong)); b.write(le32(0)); b.write(le32(0))
        b.write(le32(0)); b.write(le32(0))
        b.toByteArray
      }
      val hdrl = list("hdrl", chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val moviBody = new java.io.ByteArrayOutputStream()
      val offsets = jpegs.map { j =>
        val off = moviBody.size() + 4 // offsets count from the 'movi' fourCC
        moviBody.write(chunk("00dc", j))
        off
      }
      val movi = list("movi", moviBody.toByteArray)
      val idx1 = {
        val b = new java.io.ByteArrayOutputStream()
        jpegs.zip(offsets).foreach { case (j, off) =>
          b.write(fourCC("00dc")); b.write(le32(0x10)) // AVIIF_KEYFRAME
          b.write(le32(off.toLong)); b.write(le32(j.length.toLong))
        }
        b.toByteArray
      }
      val riffBody = fourCC("AVI ") ++ hdrl ++ movi ++ chunk("idx1", idx1)
      val out = new java.io.ByteArrayOutputStream()
      out.write(fourCC("RIFF")); out.write(le32(riffBody.length.toLong))
      out.write(riffBody)
      out.toByteArray
    }

    private def rdLe32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

    private def cc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    /** RIFF walk + per-frame JPEG decode. Returns None on anything that
      * is not a well-formed AVI (truncated chunks included) — decoder
      * totality like the pcap readers, never an exception. */
    def decodeMjpegAvi(bytes: Array[Byte]): Option[(AviMeta, Seq[java.awt.image.BufferedImage])] =
      try {
        if (bytes.length < 12 || cc(bytes, 0) != "RIFF" || cc(bytes, 8) != "AVI ") return None
        val end = math.min(bytes.length.toLong, 8 + rdLe32(bytes, 4))
        var meta: Option[AviMeta] = None
        val frames = Seq.newBuilder[java.awt.image.BufferedImage]
        var pos = 12L
        // top-level chunk walk; LIST(hdrl) is scanned for avih, and
        // LIST(movi)'s sub-walk decodes every 00dc/00db payload
        while (pos + 8 <= end) {
          val id = cc(bytes, pos.toInt)
          val sz = rdLe32(bytes, pos.toInt + 4)
          val body = pos + 8
          if (body + sz > end) return None // truncated chunk
          if (id == "LIST" && sz >= 4) {
            val kind = cc(bytes, body.toInt)
            if (kind == "hdrl") {
              // scan hdrl's immediate chunks for avih
              var p = body + 4
              val hEnd = body + sz
              while (p + 8 <= hEnd && meta.isEmpty) {
                val cid = cc(bytes, p.toInt)
                val csz = rdLe32(bytes, p.toInt + 4)
                if (cid == "avih" && csz >= 40 && p + 8 + csz <= hEnd) {
                  val a = p.toInt + 8
                  val usec = rdLe32(bytes, a)
                  val nf = rdLe32(bytes, a + 16)
                  meta = Some(AviMeta(rdLe32(bytes, a + 32).toInt,
                    rdLe32(bytes, a + 36).toInt, nf, usec, nf * usec / 1000))
                }
                p += 8 + csz + (csz % 2)
              }
            } else if (kind == "movi") {
              var p = body + 4
              val mEnd = body + sz
              while (p + 8 <= mEnd) {
                val cid = cc(bytes, p.toInt)
                val csz = rdLe32(bytes, p.toInt + 4)
                if (p + 8 + csz > mEnd) return None
                if (cid.endsWith("dc") || cid.endsWith("db")) {
                  val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
                    bytes, p.toInt + 8, csz.toInt))
                  if (img == null) return None
                  frames += img
                }
                p += 8 + csz + (csz % 2)
              }
            }
          }
          pos = body + sz + (sz % 2)
        }
        meta.map(m => (m, frames.result())).filter(_._2.nonEmpty)
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  final case class Y4mMeta(width: Int, height: Int, nFrames: Long,
      fpsNum: Int, fpsDen: Int, durationMs: Long)

  /** REAL raw-video codec: YUV4MPEG2 (`.y4m` — the uncompressed
    * interchange format every FFmpeg/x264 toolchain reads and writes;
    * the format mjpegtools defined publicly). The stream is a plain
    * ASCII header (`YUV4MPEG2 W… H… F<num>:<den> … C<space>`) followed
    * by `FRAME`-delimited raw planes — fully parseable on the JVM with
    * no compression in the way.
    *
    * Rasterization is LUMA-ONLY by design: every perceptual kernel
    * downstream (dHash, quality spread, frame signatures) consumes
    * integer luma exclusively, so chroma planes are sized and skipped,
    * never interpolated — no float YUV→RGB conversion exists to drift.
    * The encoder writes `Cmono` with the dHash luma kernel as the Y
    * plane; for GRAY rasters (r==g==b, luma ≡ v since
    * 299+587+114 = 1000) the encode→decode round trip is pixel-exact
    * and closed-form oracle-checkable, the m5 discipline. Decode
    * accepts Cmono / C444 / C422 / C420(jpeg|mpeg2|paldv) and returns
    * None on anything malformed (decoder totality, like the pcap
    * readers). */
  object JvmY4mCodec {

    /** Encode frames as YUV4MPEG2 Cmono: one Y plane per frame, each
      * byte the integer luma of the pixel. */
    def encodeY4mMono(frames: Seq[java.awt.image.BufferedImage],
        fpsNum: Int, fpsDen: Int): Array[Byte] = {
      require(frames.nonEmpty && fpsNum > 0 && fpsDen > 0,
        "need at least one frame and a positive frame rate")
      val w = frames.head.getWidth
      val h = frames.head.getHeight
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 Cmono\n"
        .getBytes("US-ASCII"))
      frames.foreach { f =>
        out.write("FRAME\n".getBytes("US-ASCII"))
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = f.getRGB(x, y)
            out.write((299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
              114 * (rgb & 0xff)) / 1000)
            x += 1
          }
          y += 1
        }
      }
      out.toByteArray
    }

    /** Bytes of one frame's planes for a given colourspace tag, or -1
      * for an unsupported tag. Chroma sizes use ceil halving (odd dims
      * are legal in mono/444). */
    private def frameBytes(c: String, w: Int, h: Int): Long = {
      val cw = (w + 1L) / 2
      val ch = (h + 1L) / 2
      c match {
        case "Cmono" => w.toLong * h
        case "C444" => 3L * w * h
        case "C422" => w.toLong * h + 2L * cw * h
        case "C420" | "C420jpeg" | "C420mpeg2" | "C420paldv" =>
          w.toLong * h + 2L * cw * ch
        case _ => -1L
      }
    }

    /** Header + FRAME walk + luma-plane rasterization. */
    def decodeY4m(bytes: Array[Byte]): Option[(Y4mMeta, Seq[java.awt.image.BufferedImage])] =
      try {
        val hEnd = bytes.indexOf('\n'.toByte)
        if (hEnd < 9) return None
        val header = new String(bytes, 0, hEnd, "US-ASCII")
        val toks = header.split(" ").filter(_.nonEmpty)
        if (toks.isEmpty || toks.head != "YUV4MPEG2") return None
        def tok(p: Char): Option[String] =
          toks.tail.find(_.headOption.contains(p)).map(_.drop(1))
        val w = tok('W').map(_.toInt).getOrElse(return None)
        val h = tok('H').map(_.toInt).getOrElse(return None)
        if (w <= 0 || h <= 0) return None
        val (fn, fd) = tok('F') match {
          case Some(f) =>
            val Array(n, d) = f.split(":"); (n.toInt, d.toInt)
          case None => (25, 1)
        }
        if (fn <= 0 || fd <= 0) return None
        // the spec's default colourspace when no C tag is present
        val cTag = toks.tail.find(_.startsWith("C")).getOrElse("C420jpeg")
        val fb = frameBytes(cTag, w, h)
        if (fb < 0) return None
        val frames = Seq.newBuilder[java.awt.image.BufferedImage]
        var n = 0L
        var pos = hEnd + 1L
        while (pos < bytes.length) {
          // FRAME line (optional parameters up to the newline)
          var nl = pos
          while (nl < bytes.length && bytes(nl.toInt) != '\n'.toByte) nl += 1
          if (nl >= bytes.length) return None
          val line = new String(bytes, pos.toInt, (nl - pos).toInt, "US-ASCII")
          if (line != "FRAME" && !line.startsWith("FRAME ")) return None
          val body = nl + 1
          if (body + fb > bytes.length) return None // truncated planes
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = bytes((body + y.toLong * w + x).toInt) & 0xff
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          frames += img
          n += 1
          pos = body + fb
        }
        if (n == 0) None
        else Some((Y4mMeta(w, h, n, fn, fd, n * 1000L * fd / fn), frames.result()))
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode + featurize, one codec init per partition (the batch shape a
    * real binding needs). */
  def decode(ds: Dataset[MediaRecord])(implicit e: org.apache.spark.sql.Encoder[DecodedMedia]): Dataset[DecodedMedia] =
    ds.mapPartitions { it =>
      // real impl: initialize the native codec HERE, once per partition
      it.map(r => DecodedMedia(r.mediaId, r.kind, r.content,
        StubCodec.decodeMeta(r.content), StubCodec.features(r.content)))
    }

  /** Cap blob-per-task memory: repartition so a task holds roughly
    * `targetBytesPerTask` of content. At 100 TB this is what keeps
    * executors from OOMing on skewed media sizes. */
  def repartitionBySize(df: DataFrame, totalBytes: Long, targetBytesPerTask: Long): DataFrame = {
    val parts = math.max(1, (totalBytes / math.max(1L, targetBytesPerTask)).toInt)
    df.repartition(parts)
  }

  /** Column-level helpers usable without the typed API. */
  def contentLength = (c: org.apache.spark.sql.Column) => length(c)
  def contentHash = (c: org.apache.spark.sql.Column) => md5(c)
}
