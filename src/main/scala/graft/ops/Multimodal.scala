package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing — north-star operators.
  *
  * Media travel as opaque `binary` columns beside typed metadata, the only
  * layout that scales: the bytes stay columnar-compressed in parquet, the
  * metadata stays prunable, and decode happens once, partition-local, next
  * to the data.
  *
  * The decode kernels themselves are STUBS (clearly marked): this
  * container ships no image/audio libraries, so `decodeStub` produces a
  * deterministic fake feature vector from the bytes. The Spark-side
  * contract — schema, batch iteration via mapPartitions, partition sizing,
  * output shape — is real and tested; swapping the stub for a JNI/ffmpeg/
  * turbojpeg call changes one function.
  */
object Multimodal {

  /** Canonical media row: id + opaque payload + typed metadata. */
  final case class Media(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      width: Int, // images/video; 0 otherwise
      height: Int,
      sample_rate: Int, // audio; 0 otherwise
      n_frames: Int) // video; 1 for images

  /** Decoded features: fixed-dim embedding per media item (or per frame). */
  final case class MediaFeatures(
      media_id: Long,
      frame: Int,
      features: Array[Double])

  /** STUB decode kernel: deterministic bytes → feature vector. Replace with
    * a real decoder (libjpeg/ffmpeg) in production; everything downstream
    * is indifferent. Deterministic so tests and reruns are stable.
    * Per-byte contributions are b/256 — exact dyadic doubles, so every sum
    * over them (bucket totals, cross-row aggregates) is order-independent
    * and bit-exact: the whole fake-feature pipeline hash-gates against an
    * integer-arithmetic oracle (q_multimodal).
    */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    var h = 1125899906842597L // FNV-ish rolling hash
    var i = 0
    while (i < bytes.length) {
      h = h * 31 + bytes(i)
      out(math.abs((h % dim).toInt)) += (bytes(i) & 0xff) / 256.0
      i += 1
    }
    out
  }

  /** Batch feature extraction: one decoder instance per partition (the
    * expensive init happens once per task, not per row — the mapPartitions
    * shape every real codec needs), one output row per sampled frame.
    *
    * `frameStride` implements frame-sampling for video: frames
    * 0, stride, 2·stride… of n_frames. Images (n_frames=1) yield one row.
    */
  def extractFeatures(
      spark: SparkSession,
      media: Dataset[Media],
      dim: Int = 64,
      frameStride: Int = 1): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: initialize the native decoder HERE, once per partition
      it.flatMap { m =>
        val frames = 0 until math.max(1, m.n_frames) by math.max(1, frameStride)
        frames.map { f =>
          // real impl: decode frame f of m.bytes; stub mixes the frame index
          val salted = m.bytes ++ Array(f.toByte)
          MediaFeatures(m.media_id, f, decodeStub(salted, dim))
        }
      }
    }
  }

  /** "Resize" metadata transform: at scale resizing is a per-row kernel; the
    * plumbing (new dims recorded in metadata, bytes re-encoded) is what the
    * engine owns. Stub re-encode = identity bytes.
    */
  def resize(spark: SparkSession, media: Dataset[Media], w: Int, h: Int): Dataset[Media] = {
    import spark.implicits._
    media.map(m => m.copy(width = w, height = h /* stub: bytes unchanged */ ))
  }

  /** Attach media features to a relational frame for downstream similarity
    * search (Ann.ivfTopK over the feature column). */
  def withFeatureColumn(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF().select(col("media_id"), col("frame"),
      col("features").as("embedding"))
}
