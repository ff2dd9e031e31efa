package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (driver mandate): image/audio/video travel as
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * resize run as partition-batched functions over those bytes.
  *
  * The media codecs themselves are STUBBED — this container has no
  * image/audio libraries — with a deterministic fake (byte-histogram
  * "features", size-based "dimensions"). Everything Spark-side is real and
  * load-bearing: the schema (content binary + metadata struct), the
  * mapPartitions batch shape (decode amortized per partition, not per
  * row), the partition sizing, and the downstream aggregation. Swapping
  * the stub for a real codec changes one function body.
  */
object Multimodal {

  /** STUB decode: stands in for an image/audio decoder. Deterministic:
    * 16-bin byte histogram normalized to [0,1] as the "feature vector",
    * byte-length-derived "width/height". Replace with a real codec call
    * (e.g. javax.imageio / ffmpeg bindings) in production.
    */
  private[operators] def fakeDecode(bytes: Array[Byte])
  : (Int, Int, Array[Float]) = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 4) += 1f
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    (bytes.length % 640, bytes.length % 480, hist)
  }

  /** STUB resize: stands in for an image resize — deterministically
    * re-bins the feature histogram to `bins` buckets (a real impl would
    * resample pixels; the contract — fixed-size output regardless of
    * input size — is the same).
    */
  private[operators] def fakeResize(feat: Array[Float], bins: Int)
  : Array[Float] = {
    val out = new Array[Float](bins)
    var i = 0
    while (i < feat.length) {
      out(i * bins / feat.length) += feat(i)
      i += 1
    }
    out
  }

  /** STUB frame-sample: stands in for video frame extraction — takes
    * `frames` evenly spaced fixed-width byte windows from the blob.
    */
  private[operators] def fakeFrameSample(bytes: Array[Byte], frames: Int,
                                         width: Int = 16)
  : Seq[Array[Byte]] = {
    if (bytes.length <= width) Seq(bytes)
    else (0 until frames).map { f =>
      val start = (bytes.length - width).toLong * f / math.max(frames - 1, 1)
      java.util.Arrays.copyOfRange(bytes, start.toInt, start.toInt + width)
    }
  }

  /** Build a multimodal table from `documents`: the text bytes stand in
    * for encoded media content; metadata is a typed struct. At scale this
    * is the schema a binary-file datasource (or a webhook with base64
    * payloads) would produce.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id".as("media_id"),
        encode($"text", "UTF-8").as("content"),
        struct($"source".as("origin"), $"lang".as("codec_hint"),
          $"n_chars".as("content_length")).as("meta"))
  }

  /** Decode + featurize each media blob (partition-batched), then roll up
    * mean feature energy per origin. Feature extraction never leaves the
    * executor: only (origin, 16 floats) cross the shuffle.
    */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val decoded = mediaTable(s, dir)
      .select($"media_id", $"content", $"meta.origin".as("origin"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // one decoder "session" per partition — the batch shape real
        // codecs need (model/codec init amortized across the partition)
        it.map { case (id, bytes, origin) =>
          val (w, h, feat) = fakeDecode(bytes)
          (id, origin, w, h, feat)
        }
      }
      .toDF("media_id", "origin", "width", "height", "features")
    decoded
      .select($"origin", $"media_id",
        aggregate($"features", lit(0.0f),
          (acc, x) => acc + x * x).as("energy"))
      .groupBy($"origin")
      .agg(count(lit(1)).as("n_media"),
        round(avg($"energy"), 4).as("avg_energy"))
      .orderBy($"origin")
  }
}
