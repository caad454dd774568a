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
  * bytes). Video frame extraction has no JDK codec — it defaults to a
  * STUB (deterministic fake derived from the byte content) so the
  * Spark-side contract — schema, batching, partition shape, null
  * behavior — is still real and tested, and a native codec drops in
  * without touching the dataflow. The PySpark twin would be
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
