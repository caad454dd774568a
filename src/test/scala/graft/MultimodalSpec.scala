package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{Decoded, Media}

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val media = Seq(
    Media(1L, "image", Array[Byte](3, 7, 9, 1, 100, 50)),
    Media(2L, "video", Array[Byte](1, 1, 11, 0, 42)),
    Media(3L, "image", Array[Byte](1)) // too short → decode fails cleanly
  ).toDS()

  test("decode produces deterministic metadata and flags bad payloads") {
    val got = Multimodal.decode(media).collect().map(d => d.media_id -> d).toMap
    assert(got(1L) == Decoded(1L, "image", 16 * 4, 16 * 8, 10, ok = true))
    assert(!got(3L).ok)
  }

  test("features yields fixed-dim deterministic vectors") {
    val v = Multimodal.features(media, dims = 4)
      .as[(Long, Seq[Float])].collect().toMap
    assert(v(1L).size == 4)
    assert(v(1L) == Multimodal.features(media, dims = 4)
      .as[(Long, Seq[Float])].collect().toMap.apply(1L)) // reproducible
  }

  test("resizeMeta caps the long side and keeps aspect ratio") {
    val r = Multimodal.resizeMeta(Multimodal.decode(media), maxSide = 64)
      .as[(Long, Int, Int, Int, Int)].collect()
      .map(x => x._1 -> (x._4, x._5)).toMap
    // media 1 decodes to 64x128 → halved to 32x64
    assert(r(1L) == (32, 64))
    assert(!r.contains(3L)) // failed decode excluded
  }

  test("sampleFrames explodes every stride-th frame without bytes") {
    val frames = Multimodal.sampleFrames(Multimodal.decode(media), stride = 4)
      .as[(Long, Int)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(frames(1L) == Seq(0, 4, 8)) // n_frames=10, stride 4
    assert(!frames.contains(3L))
  }

  /** Real PNG bytes rendered via the JDK (no external libs). */
  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("imageIoProbe decodes REAL PNG payloads to true dimensions through the same dataflow") {
    val real = Seq(
      Media(10L, "image", pngBytes(40, 25, 0xffffff)),
      Media(11L, "image", pngBytes(8, 8, 0x000000)),
      Media(12L, "image", Array[Byte](1, 2, 3)) // not an image → ok=false
    ).toDS()
    val got = Multimodal.decode(real, Multimodal.imageIoProbe)
      .collect().map(d => d.media_id -> d).toMap
    assert(got(10L) == Decoded(10L, "image", 40, 25, 1, ok = true))
    assert(got(11L) == Decoded(11L, "image", 8, 8, 1, ok = true))
    assert(!got(12L).ok)
    // and the downstream metadata ops run unchanged on real decodes
    val r = Multimodal.resizeMeta(
        Multimodal.decode(real, Multimodal.imageIoProbe), maxSide = 20)
      .as[(Long, Int, Int, Int, Int)].collect()
      .map(x => x._1 -> (x._4, x._5)).toMap
    assert(r(10L) == (20, 13)) // 40x25 capped to 20, ratio kept (round)
  }

  /** Real WAV bytes via the shared deterministic generator. */
  private def wavBytes(sampleRate: Float, nFrames: Int,
                       amplitude: Double = 0.5, freq: Double = 440.0): Array[Byte] =
    Multimodal.synthWav(sampleRate, nFrames, amplitude, freq)

  test("audioProbe decodes REAL WAV payloads to true rate/channels/frames through the same dataflow") {
    val real = Seq(
      Media(30L, "audio", wavBytes(8000f, 8000)),  // 1 s @ 8 kHz
      Media(31L, "audio", wavBytes(44100f, 2205)), // 50 ms @ 44.1 kHz
      Media(32L, "audio", Array[Byte](9, 9, 9)),   // not audio → ok=false
      Media(33L, "audio", null)
    ).toDS()
    val got = Multimodal.decodeAudio(real)
      .collect().map(a => a.media_id -> a).toMap
    assert(got(30L) == Multimodal.AudioMeta(30L, "audio", 8000, 1, 8000L, ok = true))
    assert(got(31L) == Multimodal.AudioMeta(31L, "audio", 44100, 1, 2205L, ok = true))
    assert(!got(32L).ok && !got(33L).ok)
  }

  test("aviProbe decodes REAL synthesized RIFF/AVI containers through the decode dataflow") {
    val good = Multimodal.synthAvi(16, 12, 5)
    // header lies about the frame count → the counted movi chunks
    // disagree with avih.dwTotalFrames → ok=false.
    // Layout: RIFF(12) LIST-hdr(12) avih-hdr(8) → avih data at 32;
    // dwTotalFrames at data+16 = byte 48.
    val lying = good.clone(); lying(48) = (lying(48) + 1).toByte
    val badMagic = good.clone(); badMagic(2) = 'X'.toByte
    val truncated = good.take(good.length - 7)
    val real = Seq(
      Media(50L, "video/avi", good),
      Media(51L, "video/avi", Multimodal.synthAvi(8, 6, 1)),
      Media(52L, "video/avi", lying),
      Media(53L, "video/avi", badMagic),
      Media(54L, "video/avi", truncated),
      Media(55L, "video/avi", null)
    ).toDS()
    val got = Multimodal.decode(real, Multimodal.aviProbe)
      .collect().map(d => d.media_id -> d).toMap
    assert(got(50L) == Decoded(50L, "video/avi", 16, 12, 5, ok = true))
    assert(got(51L) == Decoded(51L, "video/avi", 8, 6, 1, ok = true))
    assert(!got(52L).ok && !got(53L).ok && !got(54L).ok && !got(55L).ok)
  }

  test("jpegGray round-trips every gray value exactly at quality 1.0") {
    // The q106 oracle's premise: a quality-1.0 uniform-gray JPEG
    // decodes to EXACTLY the encoded value (all-ones quantization
    // tables + constant block = DC-only spectrum). Pin it for all 256
    // values on a non-multiple-of-8 frame size.
    (0 until 256).foreach { v =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.jpegGray(12, 10, v)))
      assert(img.getWidth == 12 && img.getHeight == 10)
      (0 until 10).foreach { y =>
        (0 until 12).foreach { x =>
          assert(img.getRaster.getSample(x, y, 0) == v,
            s"value $v broke at ($x,$y)")
        }
      }
    }
  }

  test("mjpegProbe REALLY decodes compressed frame pixels through the decode dataflow") {
    // 3 frames at base 100 → uniform values 100, 117, 134; pix_sum is
    // the exact sum of EVERY decoded pixel sample
    val good = Multimodal.synthMjpegAvi(16, 12, 3, base = 100)
    val expectedSum = 16L * 12L * (100L + 117L + 134L)
    // same lying-header byte as the aviProbe spec: dwTotalFrames at 48
    val lying = good.clone(); lying(48) = (lying(48) + 1).toByte
    val badMagic = good.clone(); badMagic(2) = 'X'.toByte
    val truncated = good.take(good.length - 7)
    // corrupt a frame's JPEG entropy payload: find the first 00dc
    // chunk and zero 16 bytes mid-frame → ImageIO must fail or the
    // uniform premise break, never silently pass
    val corrupt = good.clone()
    val movi = {
      var i = 0; var at = -1
      while (at < 0 && i < corrupt.length - 4) {
        if (corrupt(i) == '0'.toByte && corrupt(i + 1) == '0'.toByte &&
            corrupt(i + 2) == 'd'.toByte && corrupt(i + 3) == 'c'.toByte) at = i
        i += 1
      }
      at
    }
    assert(movi > 0)
    // chunk size sits at fourcc+4 (little-endian); the entropy-coded
    // scan lives at the END of the JPEG — stomp 16 bytes just before
    // the EOI marker so the pixel data itself is damaged (the header
    // region contains APP0/table bytes that can be pixel-neutral)
    val csz = (corrupt(movi + 4) & 0xff) | ((corrupt(movi + 5) & 0xff) << 8) |
      ((corrupt(movi + 6) & 0xff) << 16) | ((corrupt(movi + 7) & 0xff) << 24)
    (0 until 16).foreach(k => corrupt(movi + 8 + csz - 20 + k) = 0x55.toByte)
    val real = Seq(
      Media(60L, "video/x-msvideo", good),
      Media(61L, "video/x-msvideo", Multimodal.synthMjpegAvi(8, 6, 1, 0)),
      Media(62L, "video/x-msvideo", lying),
      Media(63L, "video/x-msvideo", badMagic),
      Media(64L, "video/x-msvideo", truncated),
      Media(65L, "video/x-msvideo", null)
    ).toDS()
    val got = Multimodal.decodeVideo(real).collect()
      .map(d => d.media_id -> d).toMap
    assert(got(60L) == Multimodal.VideoStats(60L, "video/x-msvideo",
      16, 12, 3, expectedSum, ok = true))
    assert(got(61L) == Multimodal.VideoStats(61L, "video/x-msvideo",
      8, 6, 1, 8L * 6L * 0L, ok = true))
    assert(!got(62L).ok && !got(63L).ok && !got(64L).ok && !got(65L).ok)
    // the corrupted-entropy frame must not produce the clean sum
    val c = Multimodal.mjpegProbe(Media(66L, "video/x-msvideo", corrupt))
    assert(!c.ok || c.pix_sum != expectedSum)
  }

  test("videoFrameFeatures emits one-hot luminance histograms per decoded frame") {
    // frames uniform at 100, 117, 134 → bins 6, 7, 8 exactly (raster
    // samples, not gamma-converted getRGB — the linear-gray trap)
    val good = Multimodal.synthMjpegAvi(16, 12, 3, base = 100)
    val rows = Multimodal.videoFrameFeatures(
        Seq(Media(70L, "video/x-msvideo", good)).toDS())
      .orderBy($"frame_idx")
      .as[(Long, Long, Seq[Double])].collect()
    assert(rows.map(r => (r._1, r._2)).toSeq ==
      Seq((70L, 0L), (70L, 1L), (70L, 2L)))
    val expectBins = Seq(100 / 16, 117 / 16, 134 / 16)
    rows.zip(expectBins).foreach { case ((_, _, emb), bin) =>
      assert(emb.length == 16)
      assert(emb(bin) == 1.0, s"bin $bin not hot: $emb")
      assert(emb.sum == 1.0)
    }
    // malformed container → no rows, not a poison exception
    val broken = good.take(good.length - 5)
    assert(Multimodal.videoFrameFeatures(
      Seq(Media(71L, "video/x-msvideo", broken)).toDS()).count() == 0L)
  }

  test("audioRmsFeatures extracts content-derived segment energies") {
    val loud = wavBytes(8000f, 4000, amplitude = 0.9)
    val quiet = wavBytes(8000f, 4000, amplitude = 0.05)
    val real = Seq(
      Media(40L, "audio", loud),
      Media(41L, "audio", quiet),
      Media(42L, "audio", Array[Byte](1, 2, 3)) // undecodable → zeros
    ).toDS()
    val v = Multimodal.audioRmsFeatures(real, dims = 8)
      .as[(Long, Seq[Float])].collect().toMap
    // a steady sine's RMS is amplitude/sqrt(2) in every segment
    assert(v(40L).forall(x => math.abs(x - 0.9 / math.sqrt(2)) < 0.02))
    assert(v(41L).forall(x => math.abs(x - 0.05 / math.sqrt(2)) < 0.02))
    assert(v(40L).zip(v(41L)).forall { case (l, q) => l > q })
    assert(v(42L).forall(_ == 0f))
    // deterministic in the content
    assert(v(40L) == Multimodal.audioRmsFeatures(real, dims = 8)
      .as[(Long, Seq[Float])].collect().toMap.apply(40L))
  }

  test("dHash64 is invariant to uniform brightness shifts, flips one " +
       "bit per local gradient inversion, and real-decodes the PNGs") {
    // pattern in [0, 200] so +50 shifts without mod-256 wraparound
    def pat(x: Int, y: Int): Int = (x * x * 3 + y * 7 + (x + y) % 11) % 200
    val media = Seq(
      Media(1L, "image/png", Multimodal.synthPatternPng(9, 8, pat)),
      // brightness-shifted copy: gradient SIGNS unchanged -> same hash
      Media(2L, "image/png",
        Multimodal.synthPatternPng(9, 8, (x, y) => pat(x, y) + 50)),
      // one inverted local gradient: pixel (1,0) pushed below (0,0)
      // and above... only the (0,0)->(1,0) and (1,0)->(2,0) compares
      // can change -> hamming <= 2, >= 1
      Media(3L, "image/png", Multimodal.synthPatternPng(9, 8, (x, y) =>
        if (x == 1 && y == 0) 0 else pat(x, y) + 50)),
      Media(4L, "image/png", Array[Byte](1, 2, 3)) // undecodable
    ).toDS()
    val got = Multimodal.dHash64(media)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L)._2 && got(2L)._2 && got(3L)._2 && !got(4L)._2)
    assert(got(1L)._1 == got(2L)._1,
      "uniform brightness shift must not change dHash")
    val ham = java.lang.Long.bitCount(got(2L)._1 ^ got(3L)._1)
    assert(ham >= 1 && ham <= 2, s"local inversion flipped $ham bits")
    // the byte-hash CONTROL: the shifted copy's PNG bytes differ, so a
    // byte fingerprint splits what the perceptual hash unifies
    assert(!java.util.Arrays.equals(
      media.collect()(0).content, media.collect()(1).content))
  }

  test("imageHistogramFeatures extracts content-derived luminance histograms") {
    val real = Seq(
      Media(20L, "image", pngBytes(10, 10, 0xffffff)), // all white → top bin
      Media(21L, "image", pngBytes(10, 10, 0x000000)), // all black → bottom bin
      Media(22L, "image", null)                        // null → zero vector
    ).toDS()
    val v = Multimodal.imageHistogramFeatures(real, bins = 16)
      .as[(Long, Seq[Float])].collect().toMap
    assert(v(20L)(15) == 1.0f && v(20L).take(15).forall(_ == 0f))
    assert(v(21L)(0) == 1.0f && v(21L).drop(1).forall(_ == 0f))
    assert(v(22L).forall(_ == 0f))
  }

  test("imageResize REALLY rescales pixels: output re-decodes at target dims") {
    val real = Seq(
      Media(30L, "image", pngBytes(32, 16, 0x4080c0)), // downscale 2:1
      Media(31L, "image", pngBytes(5, 3, 0xffffff)),   // already small: kept
      Media(32L, "image", Array[Byte](9, 9, 9))        // garbage → ok=false
    ).toDS()
    val got = Multimodal.imageResize(real, maxSide = 16)
      .collect().map(r => r.media_id -> r).toMap
    assert(got(30L).ok && got(30L).out_width == 16 && got(30L).out_height == 8)
    assert(got(31L).ok && got(31L).out_width == 5 && got(31L).out_height == 3)
    assert(!got(32L).ok && got(32L).content.isEmpty)
    // the bytes are a REAL re-encoded image, not pass-through metadata:
    // decoding them yields the target dimensions and the same color
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(got(30L).content))
    assert(back.getWidth == 16 && back.getHeight == 8)
    assert((back.getRGB(8, 4) & 0xffffff) == 0x4080c0) // solid fill survives
  }
}
