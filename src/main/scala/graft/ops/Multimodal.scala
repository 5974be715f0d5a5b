package graft.ops

import graft.core.Fnv
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque bytes + typed metadata (the multimodal column
  * convention — media as `binary`, metadata as typed columns).
  */
case class MediaRow(
    media_id: Long,
    media_type: String, // "image" | "audio" | "video"
    media: Array[Byte],
    width: Int,
    height: Int,
    duration_ms: Long)

case class MediaFeatures(
    media_id: Long,
    media_type: String,
    feature_dim: Int,
    features: Array[Float],
    decode_ok: Boolean)

/** Multimodal (image/audio/video) processing plumbing.
  *
  * The Spark side is real: schema, partition-preserving batch iteration,
  * feature output shape, and the decode seam. The codec itself is a
  * clearly-marked deterministic STUB — this container has no image/audio
  * libraries, so `decodeStub` derives a fake feature vector from the bytes
  * (splitmix64 rolling) where a production deployment would call the real
  * decoder (e.g. via JNI/javacv) inside the same `mapPartitions` batch
  * loop. Swapping the stub does not change any Spark plumbing.
  */
object Multimodal {

  /** STUB decode: deterministic fake features from the raw bytes. A real
    * implementation replaces only this function.
    */
  def decodeStub(media: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = Fnv.fnv1a(media, 0)
    var i = 0
    while (i < dim) {
      h = Fnv.splitmix64(h)
      out(i) = ((h >>> 40).toInt.toFloat / (1 << 24).toFloat) - 0.5f
      i += 1
    }
    out
  }

  /** Feature extraction over a media table: `mapPartitions` so a real
    * decoder amortizes model/codec init once per partition (the same
    * batch shape `mapInPandas` would give a Python UDF).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init point for a real codec/model goes here
      it.map { m =>
        val ok = m.media != null && m.media.nonEmpty
        val feats = if (ok) decodeStub(m.media, dim) else Array.empty[Float]
        MediaFeatures(m.media_id, m.media_type, if (ok) dim else 0, feats, ok)
      }
    }
  }

  /** Deterministic frame sampling for video rows: every `everyMs`
    * millisecond offset (metadata-driven; the decode of each frame is the
    * same stub seam). Emits (media_id, frame_ts_ms, frame_features).
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.media_type == "video").flatMap { m =>
      val n = math.min(m.duration_ms / everyMs, 64L).toInt // cap frames/row
      (0 until n).map { f =>
        val ts = f * everyMs
        // stub frame decode: seed the fake features by (bytes, frame ts)
        val feats = decodeStub(m.media ++ java.nio.ByteBuffer.allocate(8).putLong(ts).array(), dim)
        (m.media_id, ts, feats)
      }
    }.toDF("media_id", "frame_ts_ms", "frame_features")
  }

  /** Deterministic synthetic media table (for tests/bench — the decode is
    * a stub anyway; what matters is byte volume + partitioning).
    */
  def syntheticMedia(spark: SparkSession, n: Long, partitions: Int,
                     bytesPerRow: Int = 4096, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val bytes = new Array[Byte](bytesPerRow)
      var h = seed ^ i
      var j = 0
      while (j < bytesPerRow) {
        h = Fnv.splitmix64(h)
        bytes(j) = h.toByte
        j += 1
      }
      MediaRow(i, kind, bytes, 64 + (i % 512).toInt, 64 + (i % 256).toInt, 1000L + (i % 60000L))
    }
  }
}
