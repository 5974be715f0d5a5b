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

/** Multimodal (image/audio/video) processing over binary media columns.
  *
  * The decode path is REAL for the formats a JVM can parse without
  * external codec libraries (see [[MediaCodecs]]): compressed JPEG / PNG
  * / GIF / BMP images via the JDK's own `javax.imageio` (the formats a
  * real web crawl is actually made of), P6 PPM images, PCM16-mono WAV
  * audio, and a GVID raw-frame motion container for video — header
  * parsing, per-frame seeking, and feature math (channel means, luma
  * std, thumbnails, RMS/zero-crossing/energy bins) all run on the
  * decoded pixels/samples. Compressed VIDEO codecs (H.264…) and
  * compressed audio (Opus/MP3) are the remaining seam — the JDK ships no
  * decoder for them — and they would slot into the same per-partition
  * decode loop without touching any Spark plumbing. Malformed media
  * surfaces as `decode_ok = false`, never a task failure.
  *
  * Scale shape: `mapPartitions` batch iteration (the same batch shape
  * `mapInPandas` gives a Python UDF) so a heavy decoder amortizes its
  * init once per partition; feature output is a fixed-width
  * `Array[Float]` column ready for the ANN/dedup operators
  * ([[Similarity]], [[Dedup.embeddingNearDupPairs]]).
  */
object Multimodal {

  /** Real decode dispatch: parse by declared type, extract features from
    * the decoded representation. Returns None when the bytes do not parse
    * as the declared format.
    */
  def decode(mediaType: String, media: Array[Byte], dim: Int): Option[Array[Float]] =
    mediaType match {
      case "image" => MediaCodecs.decodeImage(media).map(MediaCodecs.imageFeatures(_, dim))
      case "audio" => MediaCodecs.decodeAudio(media).map { case (_, s) => MediaCodecs.audioFeatures(s, dim) }
      case "video" =>
        // video-level features = first frame's image features + frame count
        MediaCodecs.decodeGvidFrame(media, 0).map { img =>
          val f = MediaCodecs.imageFeatures(img, dim)
          if (dim > 0) f(dim - 1) = MediaCodecs.gvidFrameCount(media).getOrElse(0).toFloat
          f
        }
      case _ => None
    }

  /** Feature extraction over a media table: `mapPartitions` so a real
    * decoder amortizes codec/model init once per partition.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init point for a heavyweight codec/model goes here
      it.map { m =>
        val feats =
          if (m.media == null || m.media.isEmpty) None
          else decode(m.media_type, m.media, dim)
        MediaFeatures(m.media_id, m.media_type,
          feats.map(_ => dim).getOrElse(0),
          feats.getOrElse(Array.empty[Float]),
          feats.isDefined)
      }
    }
  }

  /** Resize every image row to `w`×`h` (decode → nearest-neighbor resize
    * → re-encode PPM); non-image rows pass through untouched, malformed
    * images keep their original bytes with `resized = false`. The
    * model-input normalization step of a multimodal training pipeline.
    */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        if (m.media_type != "image") (m.media_id, m.media_type, m.media, m.width, m.height, false)
        else MediaCodecs.decodeImage(m.media) match {
          case Some(img) =>
            val r = MediaCodecs.resize(img, w, h)
            (m.media_id, m.media_type, MediaCodecs.encodePpm(r.width, r.height, r.rgb), w, h, true)
          case None => (m.media_id, m.media_type, m.media, m.width, m.height, false)
        }
      }
    }.toDF("media_id", "media_type", "media", "width", "height", "resized")
  }

  /** Deterministic frame sampling for video rows: every `everyMs`
    * millisecond offset per the duration metadata; each sampled timestamp
    * seeks and decodes its nearest contained frame (container frames are
    * spread uniformly over the duration). Emits
    * (media_id, frame_ts_ms, frame_features).
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.media_type == "video").flatMap { m =>
      val n = math.min(m.duration_ms / everyMs, 64L).toInt // cap frames/row
      val contained = MediaCodecs.gvidFrameCount(m.media).getOrElse(0)
      (0 until n).map { f =>
        val ts = f * everyMs
        val frameIdx = if (contained == 0) -1
          else math.min((ts * contained / math.max(m.duration_ms, 1L)).toInt, contained - 1)
        val feats = MediaCodecs.decodeGvidFrame(m.media, frameIdx)
          .map(MediaCodecs.imageFeatures(_, dim))
          .getOrElse(new Array[Float](dim))
        (m.media_id, ts, feats)
      }
    }.toDF("media_id", "frame_ts_ms", "frame_features")
  }

  /** Deterministic synthetic media table: VALID media bytes per type —
    * P6 PPM (image), PCM16 WAV (audio), GVID-of-PPM-frames (video) — with
    * deterministic pixel/sample content, so the decode path in tests and
    * benchmarks is the real parser, not a pass-through.
    */
  def syntheticMedia(spark: SparkSession, n: Long, partitions: Int,
                     seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val w = 32 + (i % 8).toInt * 4
      val h = 24 + (i % 6).toInt * 4
      val durationMs = 1000L + (i % 60000L)
      def rgb(frameSeed: Long, fw: Int, fh: Int): Array[Byte] = {
        val px = new Array[Byte](fw * fh * 3)
        var hh = seed ^ frameSeed
        var j = 0
        while (j < px.length) { hh = Fnv.splitmix64(hh); px(j) = hh.toByte; j += 1 }
        px
      }
      val bytes = kind match {
        case "image" => MediaCodecs.encodePpm(w, h, rgb(i, w, h))
        case "audio" =>
          val nSamples = math.min(durationMs, 8192L).toInt // 1 kHz synthetic rate
          val samples = new Array[Short](nSamples)
          var hh = seed ^ i
          var j = 0
          while (j < nSamples) { hh = Fnv.splitmix64(hh); samples(j) = (hh >>> 16).toShort; j += 1 }
          MediaCodecs.encodeWav(1000, samples)
        case _ =>
          val frames = math.min(durationMs / 1000L, 16L).toInt.max(1)
          MediaCodecs.encodeGvid((0 until frames).map(f =>
            MediaCodecs.encodePpm(16, 12, rgb(i * 1000 + f, 16, 12))))
      }
      MediaRow(i, kind, bytes, w, h, durationMs)
    }
  }

  /** Deterministic smooth RGB gradient pattern. Smooth (unlike the noise
    * pattern above) so JPEG's DCT quantization reconstructs it closely —
    * the right content for exercising a lossy codec.
    */
  def patternRgb(key: Long, w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    val phase = (Fnv.splitmix64(key) & 0xff).toInt
    // triangle wave: ramps 0..255..0 with no 255→0 cliff (a sawtooth's
    // wrap edge would put DCT ringing into a lossy codec's output)
    def tri(t: Int): Byte = { val m = t & 0x1ff; (if (m < 256) m else 511 - m).toByte }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val d = (y * w + x) * 3
        px(d) = tri(x * 3 + y * 2 + phase)
        px(d + 1) = tri(x * 2 + y * 3 + phase * 2)
        px(d + 2) = tri(x + y + phase * 3)
        x += 1
      }
      y += 1
    }
    px
  }

  /** Deterministic synthetic table of REAL compressed images: rows cycle
    * PNG → JPEG → PPM → corrupt (a PNG with its magic byte zeroed, which
    * no `ImageIO` reader claims). Every PNG/JPEG row holds genuine
    * JDK-encoded compressed bytes, so decoding them downstream exercises
    * the real `javax.imageio` entropy decode, not a pass-through.
    */
  def syntheticCompressedMedia(spark: SparkSession, n: Long, partitions: Int,
                               seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val w = 16 + (i % 5).toInt * 8
      val h = 12 + (i % 4).toInt * 8
      val rgb = patternRgb(seed ^ i, w, h)
      val bytes = (i % 4) match {
        case 0 => MediaCodecs.encodePng(w, h, rgb)
        case 1 => MediaCodecs.encodeJpeg(w, h, rgb)
        case 2 => MediaCodecs.encodePpm(w, h, rgb)
        case _ =>
          val b = MediaCodecs.encodePng(w, h, rgb)
          b(0) = 0 // break the \x89PNG magic: no reader claims it
          b
      }
      MediaRow(i, "image", bytes, w, h, 0L)
    }
  }
}
