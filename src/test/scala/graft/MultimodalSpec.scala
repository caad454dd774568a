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
}
