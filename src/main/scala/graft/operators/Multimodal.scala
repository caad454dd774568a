package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (SURVEY.md §2.11).
  *
  * Media payloads are opaque `BINARY` columns + typed metadata, the
  * Spark-native layout for a 100 TB media lake: parquet stores the bytes
  * with the rest of the row, scans prune the binary column unless a
  * stage actually touches it, and partitioning by `media_id` keeps
  * decode work co-located with the metadata it produces.
  *
  * Codecs are function parameters, decoupled from the dataflow. For
  * IMAGES a REAL codec is provided ([[imageIoProbe]],
  * [[imageHistogramFeatures]]): the JDK's `javax.imageio` decodes
  * PNG/JPEG/BMP/GIF with no external libraries. For AUDIO likewise
  * ([[audioProbe]], [[audioRmsFeatures]]): `javax.sound.sampled` ships
  * WAV/AIFF/AU codecs. Both decode paths are genuinely exercised
  * end-to-end (MultimodalSpec round-trips real PNG and real WAV
  * bytes). For VIDEO the JDK ships no codec, but UNCOMPRESSED AVI is
  * pure byte work: [[synthAvi]]/[[aviProbe]] write and re-walk a real
  * RIFF/AVI chunk tree (validated magic, header dims, counted movi
  * frames), so the container path is genuinely exercised (q100), and
  * MJPEG — JPEG-compressed frame chunks inside that container — gets
  * REAL per-frame pixel decode through the JDK's JPEG codec
  * ([[synthMjpegAvi]]/[[mjpegProbe]], q106); only bitstream codecs the
  * JDK lacks (H.264 etc.) stay on [[stubProbe]] (deterministic fake
  * derived from the byte content) so the Spark-side contract — schema,
  * batching, partition shape, null behavior — is still real and
  * tested, and a native codec drops in without touching the dataflow. The PySpark twin would be
  * `mapInPandas` with Arrow batches; the Scala-native form is
  * `mapPartitions`, which likewise amortizes per-batch codec setup.
  */
object Multimodal {

  case class Media(media_id: Long, media_type: String, content: Array[Byte])
  case class Decoded(media_id: Long, media_type: String, width: Int,
                     height: Int, n_frames: Int, ok: Boolean)

  /** STUB codec: "decodes" deterministic fake dimensions from the first
    * payload bytes. Replace with a real image/video probe. */
  def stubProbe(m: Media): Decoded = {
    val b = m.content
    if (b == null || b.length < 4) Decoded(m.media_id, m.media_type, 0, 0, 0, ok = false)
    else Decoded(m.media_id, m.media_type,
      width = 16 * (1 + (b(0) & 0x3f)), height = 16 * (1 + (b(1) & 0x3f)),
      n_frames = 1 + (b(2) & 0x7f), ok = true)
  }

  /** REAL image probe on the JDK's `javax.imageio` — no external
    * libraries: decodes PNG/JPEG/BMP/GIF payloads to their true pixel
    * dimensions (`n_frames` = 1: ImageIO reads stills). Undecodable or
    * empty payloads come back `ok = false`, same contract as the stub.
    * Drop-in `probe` argument for [[decode]]. */
  def imageIoProbe(m: Media): Decoded = {
    if (m.content == null || m.content.isEmpty)
      Decoded(m.media_id, m.media_type, 0, 0, 0, ok = false)
    else try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(m.content))
      if (img == null) Decoded(m.media_id, m.media_type, 0, 0, 0, ok = false)
      else Decoded(m.media_id, m.media_type, img.getWidth, img.getHeight,
        n_frames = 1, ok = true)
    } catch {
      // NonFatal, not just IOException: JDK image readers throw
      // RuntimeExceptions (IllegalArgument, ArrayIndexOutOfBounds) on
      // malformed/exotic payloads, and the contract is ok=false — a
      // poison row must not kill the query
      case scala.util.control.NonFatal(_) =>
        Decoded(m.media_id, m.media_type, 0, 0, 0, ok = false)
    }
  }

  case class AudioMeta(media_id: Long, media_type: String,
                       sample_rate: Int, channels: Int, n_frames: Long,
                       ok: Boolean)

  /** REAL audio probe on the JDK's `javax.sound.sampled` — no external
    * libraries: the JDK ships WAV/AIFF/AU codecs, so a WAV payload
    * decodes to its true sample rate, channel count, and frame length.
    * Undecodable or empty payloads come back `ok = false` (the
    * UnsupportedAudioFileException path), mirroring [[imageIoProbe]]'s
    * contract. Video remains genuinely environment-blocked: the JDK
    * has no video codec, so that media type stays on [[stubProbe]]. */
  def audioProbe(m: Media): AudioMeta = {
    if (m.content == null || m.content.isEmpty)
      AudioMeta(m.media_id, m.media_type, 0, 0, 0L, ok = false)
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.content))
      try {
        val fmt = ais.getFormat
        AudioMeta(m.media_id, m.media_type, fmt.getSampleRate.toInt,
          fmt.getChannels, ais.getFrameLength, ok = true)
      } finally ais.close()
    } catch {
      case scala.util.control.NonFatal(_) =>
        AudioMeta(m.media_id, m.media_type, 0, 0, 0L, ok = false)
    }
  }

  /** Audio decode pass — same per-partition streaming shape as
    * [[decode]], typed to the audio metadata contract. */
  def decodeAudio(media: Dataset[Media],
                  probe: Media => AudioMeta = audioProbe): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map(probe))
  }

  /** Deterministic synthetic WAV (16-bit signed PCM mono sine),
    * round-tripped through the JDK's own encoder — REAL container
    * bytes, reproducible from the arguments alone. This is how the
    * real audio codec gets under the driver's oracle gate (q80): each
    * row synthesizes a WAV from its key, [[audioProbe]] REALLY parses
    * it back, and the oracle predicts the recovered metadata
    * arithmetically — an unfaithful codec round-trip mismatches.
    * MultimodalSpec uses the same generator. */
  def synthWav(sampleRate: Float, nFrames: Int, amplitude: Double = 0.5,
               freq: Double = 440.0): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = (math.sin(2 * math.Pi * freq * i / sampleRate) *
        amplitude * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte // little-endian lo
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio feature extractor (JDK-only): per-segment RMS energy
    * over the decoded 16-bit PCM frames — a genuine content-derived
    * `ARRAY<FLOAT>` embedding (the audio twin of
    * [[imageHistogramFeatures]]). The payload is decoded ONCE per row
    * inside the partition stream; undecodable or non-16-bit payloads
    * yield the zero vector. */
  def audioRmsFeatures(media: Dataset[Media], dims: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val v = new Array[Float](dims)
        val samples: Array[Double] =
          if (m.content == null || m.content.isEmpty) null
          else try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(m.content))
            try {
              val fmt = ais.getFormat
              if (fmt.getSampleSizeInBits != 16 ||
                  fmt.getEncoding !=
                    javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) null
              else {
                val bytes = ais.readAllBytes()
                val n = bytes.length / 2
                val out = new Array[Double](n)
                var i = 0
                while (i < n) {
                  val lo = bytes(2 * i) & 0xff
                  val hi = bytes(2 * i + 1).toInt
                  out(i) =
                    (if (fmt.isBigEndian) (bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xff)
                     else (hi << 8) | lo) / 32768.0
                  i += 1
                }
                out
              }
            } finally ais.close()
          } catch { case scala.util.control.NonFatal(_) => null }
        if (samples != null && samples.length > 0) {
          val seg = math.max(1, samples.length / dims)
          var d = 0
          while (d < dims) {
            val from = d * seg
            val to = math.min(samples.length, from + seg)
            if (from < to) {
              var s = 0.0
              var i = from
              while (i < to) { s += samples(i) * samples(i); i += 1 }
              v(d) = math.sqrt(s / (to - from)).toFloat
            }
            d += 1
          }
        }
        (m.media_id, v)
      }
    }.toDF("media_id", "embedding")
  }

  /** REAL image feature extractor (JDK-only): normalized 16-bin
    * luminance histogram over the decoded pixels — a genuine
    * content-derived `ARRAY<FLOAT>` embedding that feeds the
    * [[Similarity]] ops. Undecodable payloads yield the zero vector.
    * Same per-partition streaming shape as [[features]]. */
  /** Deterministic synthetic grayscale PNG — a REAL JDK PNG encode of
    * a w×h pattern (the q80/q100 synth-under-the-gate move for STILL
    * images). PNG is lossless, so the decoded pixels equal the planted
    * pattern exactly and an oracle can predict every downstream pixel
    * computation arithmetically. */
  def synthPatternPng(width: Int, height: Int,
                      pattern: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = pattern(x, y) & 0xff
        img.setRGB(x, y, (p << 16) | (p << 8) | p)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Perceptual DIFFERENCE hash (dHash, Krawetz's 64-bit variant):
    * bit(x, y) = 1 iff lum(x+1, y) > lum(x, y) over the top-left 9×8
    * luminance grid — REAL ImageIO decode per row (the per-partition
    * codec tier), integer BT.601 luminance (identical to
    * [[imageHistogramFeatures]]'s). Gradient signs are invariant to
    * uniform brightness shifts — the property that makes dHash a
    * PERCEPTUAL signature where a byte hash is not (MultimodalSpec
    * pins it). Inputs are expected pre-resized ([[imageResize]]) to
    * ≥ 9×8; smaller images hash their available prefix grid.
    * Returns (media_id, dhash, ok). */
  def dHash64(media: Dataset[Media]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val img =
          if (m.content == null || m.content.isEmpty) null
          else try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.content))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) (m.media_id, 0L, false)
        else {
          val w = math.min(img.getWidth, 9)
          val h = math.min(img.getHeight, 8)
          def lum(px: Int): Int =
            (((px >> 16) & 0xff) * 299 + ((px >> 8) & 0xff) * 587 +
              (px & 0xff) * 114) / 1000
          var hash = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x + 1 < w) {
              if (lum(img.getRGB(x + 1, y)) > lum(img.getRGB(x, y)))
                hash |= 1L << (y * 8 + x)
              x += 1
            }
            y += 1
          }
          (m.media_id, hash, true)
        }
      }
    }.toDF("media_id", "dhash", "ok")
  }

  def imageHistogramFeatures(media: Dataset[Media], bins: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val v = new Array[Float](bins)
        val img =
          if (m.content == null || m.content.isEmpty) null
          else try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.content))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img != null) {
          val (w, h) = (img.getWidth, img.getHeight)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 +
                ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
              v((lum * bins) / 256) += 1f
              x += 1
            }
            y += 1
          }
          val n = (w * h).toFloat
          var i = 0
          while (i < bins) { v(i) /= n; i += 1 }
        }
        (m.media_id, v)
      }
    }.toDF("media_id", "embedding")
  }

  /** Deterministic synthetic uncompressed AVI (RIFF container, 24-bit
    * DIB frames), hand-assembled pure-JDK bytes — the video twin of
    * [[synthWav]]. This is how the VIDEO container path gets under the
    * oracle gate (q100): each row synthesizes a real RIFF/AVI from its
    * key, [[aviProbe]] REALLY walks the chunk tree back, and the
    * oracle predicts the recovered dimensions and frame count
    * arithmetically — a parser that mis-walks the container (or a
    * broken binary round trip) hash-mismatches. Compressed video stays
    * genuinely env-blocked (the JDK ships no codec); [[stubProbe]]
    * remains the documented fallback for those payloads.
    *
    * Layout written (all sizes little-endian):
    *   RIFF('AVI '
    *     LIST('hdrl' avih(56) LIST('strl' strh(56) strf(40)))
    *     LIST('movi' '00db'(frame) × nFrames))
    * Frame payload is a bottom-up 24bpp DIB with 4-byte-aligned rows,
    * pixel bytes deterministic in (x, y, frame index). */
  def synthAvi(width: Int, height: Int, nFrames: Int): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0, "positive dims")
    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def fcc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val rowBytes = ((width * 3 + 3) / 4) * 4 // DIB rows pad to 4 bytes
    val frameSize = rowBytes * height
    val aviHdrSz = 4 + (8 + 56) // 'hdrl' + avih chunk
    val strlSz = 4 + (8 + 56) + (8 + 40) // 'strl' + strh + strf
    val hdrlListSz = aviHdrSz + 8 + strlSz
    val moviSz = 4 + nFrames * (8 + frameSize)
    val riffSz = 4 + (8 + hdrlListSz) + (8 + moviSz)
    fcc("RIFF"); u32(riffSz); fcc("AVI ")
    fcc("LIST"); u32(hdrlListSz); fcc("hdrl")
    fcc("avih"); u32(56)
    u32(33333); u32(0); u32(0); u32(0) // usec/frame, maxBps, pad, flags
    u32(nFrames); u32(0); u32(1); u32(frameSize) // total, initial, streams, bufSz
    u32(width); u32(height); u32(0); u32(0); u32(0); u32(0) // dims + reserved
    fcc("LIST"); u32(strlSz); fcc("strl")
    fcc("strh"); u32(56)
    fcc("vids"); fcc("DIB "); u32(0); u16(0); u16(0) // type, handler, flags, prio, lang
    u32(0); u32(1); u32(30); u32(0); u32(nFrames) // initial, scale, rate, start, length
    u32(frameSize); u32(0); u32(0) // bufSz, quality, sampleSize
    u16(0); u16(0); u16(width); u16(height) // rcFrame
    fcc("strf"); u32(40) // BITMAPINFOHEADER
    u32(40); u32(width); u32(height); u16(1); u16(24)
    u32(0); u32(frameSize); u32(0); u32(0); u32(0); u32(0)
    fcc("LIST"); u32(moviSz); fcc("movi")
    var f = 0
    while (f < nFrames) {
      fcc("00db"); u32(frameSize)
      var y = 0
      while (y < height) {
        var xb = 0
        while (xb < rowBytes) {
          bos.write((xb + y + f) & 0xff)
          xb += 1
        }
        y += 1
      }
      f += 1
    }
    bos.toByteArray
  }

  /** Uniform-gray single-component JPEG, encoded by the JDK's own
    * `javax.imageio` writer at compression quality 1.0. At quality 1.0
    * the quantization tables are all ones and a CONSTANT image has
    * only a DC coefficient, so the decode round-trip reproduces the
    * gray value EXACTLY (verified for all 256 values across
    * non-multiple-of-8 dims; MultimodalSpec pins it) — which is what
    * lets a genuinely compressed frame sit under an arithmetic oracle
    * (q106). */
  private[graft] def jpegGray(width: Int, height: Int, v: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.getRaster.setSample(x, y, 0, v & 0xff); x += 1 }
      y += 1
    }
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    wr.dispose(); ios.close()
    bos.toByteArray
  }

  /** Deterministic synthetic MJPEG AVI: the same RIFF container layout
    * as [[synthAvi]], but each movi chunk is `00dc` holding a REAL
    * JPEG ([[jpegGray]], frame f uniform at `(base + 17·f) mod 256`) —
    * a genuinely COMPRESSED video payload the JDK can actually decode,
    * one step past q100's uncompressed containers. Chunk sizes vary
    * per frame (JPEG entropy coding), so the movi walk exercises real
    * variable-size chunk arithmetic including odd-size padding. */
  def synthMjpegAvi(width: Int, height: Int, nFrames: Int,
                    base: Int): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0, "positive dims")
    val frames = (0 until nFrames)
      .map(f => jpegGray(width, height, (base + 17 * f) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def fcc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val aviHdrSz = 4 + (8 + 56)
    val strlSz = 4 + (8 + 56) + (8 + 40)
    val hdrlListSz = aviHdrSz + 8 + strlSz
    val moviSz = 4 + frames.map(fr => 8 + fr.length + (fr.length & 1)).sum
    val riffSz = 4 + (8 + hdrlListSz) + (8 + moviSz)
    fcc("RIFF"); u32(riffSz); fcc("AVI ")
    fcc("LIST"); u32(hdrlListSz); fcc("hdrl")
    fcc("avih"); u32(56)
    u32(33333); u32(0); u32(0); u32(0)
    u32(nFrames); u32(0); u32(1); u32(frames.map(_.length).max)
    u32(width); u32(height); u32(0); u32(0); u32(0); u32(0)
    fcc("LIST"); u32(strlSz); fcc("strl")
    fcc("strh"); u32(56)
    fcc("vids"); fcc("MJPG"); u32(0); u16(0); u16(0)
    u32(0); u32(1); u32(30); u32(0); u32(nFrames)
    u32(frames.map(_.length).max); u32(0); u32(0)
    u16(0); u16(0); u16(width); u16(height)
    fcc("strf"); u32(40)
    u32(40); u32(width); u32(height); u16(1); u16(24)
    fcc("MJPG") // biCompression: the MJPEG fourcc
    u32(0); u32(0); u32(0); u32(0); u32(0)
    fcc("LIST"); u32(moviSz); fcc("movi")
    frames.foreach { fr =>
      fcc("00dc"); u32(fr.length)
      bos.write(fr)
      if ((fr.length & 1) == 1) bos.write(0) // RIFF pads to even
    }
    bos.toByteArray
  }

  case class VideoStats(media_id: Long, media_type: String, width: Int,
                        height: Int, n_frames: Int, pix_sum: Long,
                        ok: Boolean)

  /** Walk an MJPEG AVI and decode every frame chunk as a JPEG —
    * the shared core of [[mjpegProbe]] and [[videoFrameFeatures]].
    * Returns None when the container is malformed, a frame fails to
    * decode, frame dims disagree with the avih header, or counted
    * frames ≠ declared (the [[aviProbe]] lying-header discipline).
    * One media's frames are held at once — bounded by frame count ×
    * frame size, the per-row working set of any video codec. */
  private def decodeMjpegFrames(
      b: Array[Byte]): Option[(Int, Int, Seq[java.awt.image.BufferedImage])] = {
    if (b == null || b.length < 24) return None
    def u32(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def fcc(off: Int): String = new String(b, off, 4, "US-ASCII")
    try {
      if (fcc(0) != "RIFF" || fcc(8) != "AVI ") return None
      val end = math.min(b.length.toLong, 8L + u32(4))
      var width, height, declared = -1
      var seenMovi = false
      val frames = Seq.newBuilder[java.awt.image.BufferedImage]
      var counted = 0
      var off = 12L
      while (off + 8 <= end) {
        val id = fcc(off.toInt)
        val sz = u32(off.toInt + 4).toLong & 0xffffffffL
        if (off + 8 + sz > end) return None
        if (id == "LIST") {
          val listType = fcc(off.toInt + 8)
          val lend = off + 8 + sz
          if (listType == "hdrl") {
            var o2 = off + 12
            while (o2 + 8 <= lend && declared < 0) {
              val cid = fcc(o2.toInt)
              val csz = u32(o2.toInt + 4).toLong & 0xffffffffL
              if (o2 + 8 + csz > lend) return None
              if (cid == "avih" && csz >= 40) {
                declared = u32(o2.toInt + 8 + 16)
                width = u32(o2.toInt + 8 + 32)
                height = u32(o2.toInt + 8 + 36)
              }
              o2 += 8 + csz + (csz & 1)
            }
          } else if (listType == "movi") {
            seenMovi = true
            var o2 = off + 12
            while (o2 + 8 <= lend) {
              val cid = fcc(o2.toInt)
              val csz = u32(o2.toInt + 4).toLong & 0xffffffffL
              if (o2 + 8 + csz > lend) return None
              if (cid.endsWith("dc") || cid.endsWith("db")) {
                counted += 1
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(
                    b, (o2 + 8).toInt, csz.toInt))
                if (img == null) return None
                if (img.getWidth != width || img.getHeight != height)
                  return None // frame disagrees with the container header
                frames += img
              }
              o2 += 8 + csz + (csz & 1)
            }
          }
        }
        off += 8 + sz + (sz & 1)
      }
      if (width <= 0 || height <= 0 || !seenMovi || counted != declared)
        None
      else Some((width, height, frames.result()))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** REAL MJPEG decode: walks the RIFF/AVI chunk tree like
    * [[aviProbe]], then decodes EVERY `00dc` frame chunk as a JPEG via
    * `javax.imageio` and sums EVERY decoded pixel sample into
    * `pix_sum` — per-frame pixel decode of a genuinely compressed
    * container, not just header walking. ok = false on the
    * [[decodeMjpegFrames]] failure conditions. */
  def mjpegProbe(m: Media): VideoStats =
    decodeMjpegFrames(m.content) match {
      case None =>
        VideoStats(m.media_id, m.media_type, 0, 0, 0, 0L, ok = false)
      case Some((w, h, frames)) =>
        var pixSum = 0L
        frames.foreach { img =>
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { pixSum += raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
        }
        VideoStats(m.media_id, m.media_type, w, h, frames.length, pixSum,
          ok = true)
    }

  /** Per-FRAME feature extraction: decode every MJPEG frame and emit a
    * normalized luminance histogram per (media, frame) — the video
    * member of the embedding extractors ([[imageHistogramFeatures]] /
    * [[audioRmsFeatures]]), completing the video → embedding pipeline
    * that feeds the [[Similarity]] ops. DOUBLE bins so exact values
    * (a uniform frame is exactly 1.0 in one bin) survive the engine
    * boundary for the q112 oracle. Undecodable payloads yield no rows
    * (the frame grain has no place for a zero-vector sentinel). */
  def videoFrameFeatures(media: Dataset[Media], bins: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        decodeMjpegFrames(m.content) match {
          case None => Iterator.empty
          case Some((w, h, frames)) =>
            frames.iterator.zipWithIndex.map { case (img, f) =>
              val v = new Array[Double](bins)
              // single-band (grayscale) frames read the raster sample
              // directly: TYPE_BYTE_GRAY is a LINEAR color space and
              // getRGB would gamma-convert to sRGB, so the rec601 fold
              // of getRGB is NOT the stored gray value
              val gray = img.getRaster.getNumBands == 1
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val lum =
                    if (gray) img.getRaster.getSample(x, y, 0)
                    else {
                      val rgb = img.getRGB(x, y)
                      (((rgb >> 16) & 0xff) * 299 +
                        ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
                    }
                  v((lum * bins) / 256) += 1d
                  x += 1
                }
                y += 1
              }
              val n = (w * h).toDouble
              var i = 0
              while (i < bins) { v(i) /= n; i += 1 }
              (m.media_id, f.toLong, v)
            }
        }
      }
    }.toDF("media_id", "frame_idx", "embedding")
  }

  /** Video decode pass — same per-partition streaming shape as
    * [[decode]], typed to the per-frame pixel-stats contract. */
  def decodeVideo(media: Dataset[Media],
                  probe: Media => VideoStats = mjpegProbe): Dataset[VideoStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map(probe))
  }

  /** REAL uncompressed-AVI probe: walks the RIFF chunk tree with no
    * libraries at all — validates the RIFF/'AVI ' magic, reads
    * width/height/declared frame count from the `avih` header, then
    * walks the `movi` LIST counting actual frame chunks
    * (`00db`/`00dc`). The counted frames must equal the declared
    * count (a container whose index lies comes back `ok = false`, as
    * do truncated or structurally invalid payloads). Drop-in `probe`
    * argument for [[decode]], completing the image/audio/video codec
    * triple for uncompressed input. */
  def aviProbe(m: Media): Decoded = {
    val b = m.content
    def bad = Decoded(m.media_id, m.media_type, 0, 0, 0, ok = false)
    if (b == null || b.length < 24) return bad
    def u32(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def fcc(off: Int): String =
      new String(b, off, 4, "US-ASCII")
    try {
      if (fcc(0) != "RIFF" || fcc(8) != "AVI ") return bad
      val end = math.min(b.length.toLong, 8L + u32(4))
      var width, height, declared = -1
      var counted = 0
      var seenMovi = false
      var off = 12L
      while (off + 8 <= end) {
        val id = fcc(off.toInt)
        val sz = u32(off.toInt + 4).toLong & 0xffffffffL
        if (off + 8 + sz > end) return bad // truncated chunk
        if (id == "LIST") {
          val listType = fcc(off.toInt + 8)
          if (listType == "hdrl") {
            // first avih inside hdrl carries the main header
            var o2 = off + 12
            val lend = off + 8 + sz
            while (o2 + 8 <= lend && declared < 0) {
              val cid = fcc(o2.toInt)
              val csz = u32(o2.toInt + 4).toLong & 0xffffffffL
              // same bound discipline as the movi walk: a declared size
              // overrunning the list would otherwise read ADJACENT
              // in-array bytes as header fields (in-bounds misread, no
              // exception to catch)
              if (o2 + 8 + csz > lend) return bad
              if (cid == "avih" && csz >= 40) {
                declared = u32(o2.toInt + 8 + 16)
                width = u32(o2.toInt + 8 + 32)
                height = u32(o2.toInt + 8 + 36)
              }
              o2 += 8 + csz + (csz & 1) // RIFF chunks pad to even
            }
          } else if (listType == "movi") {
            seenMovi = true
            var o2 = off + 12
            val lend = off + 8 + sz
            while (o2 + 8 <= lend) {
              val cid = fcc(o2.toInt)
              val csz = u32(o2.toInt + 4).toLong & 0xffffffffL
              if (o2 + 8 + csz > lend) return bad
              if (cid.endsWith("db") || cid.endsWith("dc")) counted += 1
              o2 += 8 + csz + (csz & 1)
            }
          }
        }
        off += 8 + sz + (sz & 1)
      }
      if (width <= 0 || height <= 0 || !seenMovi || counted != declared) bad
      else Decoded(m.media_id, m.media_type, width, height, counted, ok = true)
    } catch {
      case scala.util.control.NonFatal(_) => bad
    }
  }

  /** Decode pass: one codec instance per partition (the expensive part
    * of real decoders), streaming through rows without materializing
    * the partition. */
  def decode(media: Dataset[Media],
             probe: Media => Decoded = stubProbe): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codec: initialize native library here, once per partition
      rows.map(probe)
    }
  }

  /** Feature extraction: payload bytes → fixed-dim float vector.
    * STUB: per-stripe rolling hashes, deterministic in the content.
    * Real version: model inference per batch. Output feeds the
    * Similarity ops (embedding column contract: ARRAY<FLOAT>). */
  def features(media: Dataset[Media], dims: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val b = if (m.content == null) Array.empty[Byte] else m.content
        val v = new Array[Float](dims)
        var i = 0
        while (i < b.length) {
          val d = i % dims
          v(d) = v(d) * 31.0f + (b(i) & 0xff)
          v(d) = v(d) % 65536.0f
          i += 1
        }
        (m.media_id, v)
      }
    }.toDF("media_id", "embedding")
  }

  /** Resize pass: recompute target dimensions preserving aspect ratio.
    * STUB: the pixel transform is a no-op on bytes (a real resizer
    * re-encodes `content`); the metadata contract — every row gets
    * target dims ≤ maxSide with the aspect ratio kept — is real and
    * tested. Runs as a pure column transform: no bytes are shuffled,
    * and the scan can prune `content` when callers only read dims. */
  def resizeMeta(decoded: Dataset[Decoded], maxSide: Int): DataFrame = {
    import org.apache.spark.sql.functions.{greatest => fGreatest}
    decoded.toDF()
      .filter(col("ok"))
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / fGreatest(col("width"), col("height"))))
      .select(col("media_id"), col("width"), col("height"),
        round(col("width") * col("scale")).cast("int").as("out_width"),
        round(col("height") * col("scale")).cast("int").as("out_height"))
  }

  case class Resized(media_id: Long, out_width: Int, out_height: Int,
                     content: Array[Byte], ok: Boolean)

  /** REAL pixel resize on the pure JDK (AWT `Graphics2D` bilinear draw
    * + ImageIO PNG re-encode — no external libraries), completing the
    * decode / feature-extract / RESIZE triple with an actual pixel
    * transform where [[resizeMeta]] computes only the metadata. Aspect
    * ratio preserved, longest side ≤ `maxSide`, never upscales.
    * Same per-partition codec dataflow as [[decode]]: binary column
    * in, re-encoded binary column out; undecodable or empty payloads
    * come back `ok = false` with empty content (poison rows must not
    * kill the pass). */
  def imageResize(media: Dataset[Media], maxSide: Int): Dataset[Resized] = {
    import media.sparkSession.implicits._
    require(maxSide > 0, "maxSide must be positive")
    media.mapPartitions { it =>
      it.map { m =>
        try {
          val img =
            if (m.content == null || m.content.isEmpty) null
            else javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(m.content))
          if (img == null)
            Resized(m.media_id, 0, 0, Array.emptyByteArray, ok = false)
          else {
            val s = math.min(1.0,
              maxSide.toDouble / math.max(img.getWidth, img.getHeight))
            val w = math.max(1, math.round(img.getWidth * s).toInt)
            val h = math.max(1, math.round(img.getHeight * s).toInt)
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Resized(m.media_id, w, h, bos.toByteArray, ok = true)
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            Resized(m.media_id, 0, 0, Array.emptyByteArray, ok = false)
        }
      }
    }
  }

  /** Frame sampling: every `stride`-th frame index of decoded media —
    * pure relational explode, no bytes touched (scan prunes the binary
    * column entirely). */
  def sampleFrames(decoded: Dataset[Decoded], stride: Int): DataFrame =
    decoded.toDF()
      .filter(col("ok") && col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
}
