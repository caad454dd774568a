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
  * The actual codecs (JPEG/PNG decode, audio resample, video frame
  * extraction) are NOT implemented — this container has no media
  * libraries. Every op below takes the codec as a function parameter
  * with a STUB default (deterministic fake derived from the byte
  * content) so the Spark-side contract — schema, batching, partition
  * shape, null behavior — is real and tested, and a real codec drops in
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
