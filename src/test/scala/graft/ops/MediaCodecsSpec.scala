package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class MediaCodecsSpec extends AnyFunSuite {

  private def rgbOf(w: Int, h: Int, f: Int => Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => f(i).toByte)

  test("PPM P6 round-trip; malformed headers rejected") {
    val rgb = rgbOf(32, 24, i => i * 7)
    val bytes = MediaCodecs.encodePpm(32, 24, rgb)
    val img = MediaCodecs.decodePpm(bytes).get
    assert(img.width == 32 && img.height == 24)
    assert(img.rgb.toSeq == rgb.toSeq)

    assert(MediaCodecs.decodePpm("P5\n2 2\n255\n1234".getBytes).isEmpty) // wrong magic
    assert(MediaCodecs.decodePpm("P6\n2 2\n255\nab".getBytes).isEmpty) // truncated body
    assert(MediaCodecs.decodePpm("P6\nxx 2\n255\n".getBytes).isEmpty) // non-numeric
    assert(MediaCodecs.decodePpm(Array[Byte]()).isEmpty)
  }

  test("WAV PCM16 mono round-trip; wrong format rejected") {
    val samples = Array.tabulate(1000)(i => (math.sin(i * 0.1) * 20000).toShort)
    val bytes = MediaCodecs.encodeWav(8000, samples)
    val (rate, got) = MediaCodecs.decodeWav(bytes).get
    assert(rate == 8000 && got.toSeq == samples.toSeq)

    assert(MediaCodecs.decodeWav(bytes.take(40)).isEmpty) // truncated header
    val stereoish = bytes.clone(); stereoish(22) = 2 // channels=2
    assert(MediaCodecs.decodeWav(stereoish).isEmpty)
    assert(MediaCodecs.decodeWav("not a wav at all, just text padding...........".getBytes).isEmpty)
  }

  test("GVID container: frame count, per-frame seek-decode, corrupt rejected") {
    val frames = (0 until 5).map(f => MediaCodecs.encodePpm(8, 6, rgbOf(8, 6, i => i + f * 31)))
    val vid = MediaCodecs.encodeGvid(frames)
    assert(MediaCodecs.gvidFrameCount(vid).contains(5))
    for (f <- 0 until 5) {
      val img = MediaCodecs.decodeGvidFrame(vid, f).get
      assert(img.width == 8 && img.height == 6)
      assert(img.rgb(0) == (f * 31).toByte) // the right frame, not just any
    }
    assert(MediaCodecs.decodeGvidFrame(vid, 5).isEmpty)
    assert(MediaCodecs.decodeGvidFrame(vid, -1).isEmpty)
    assert(MediaCodecs.gvidFrameCount("XVID".getBytes ++ vid.drop(4)).isEmpty)
    assert(MediaCodecs.decodeGvidFrame(vid.take(20), 2).isEmpty) // truncated mid-container
  }

  test("feature math: image means/thumbnail and audio rms/zcr are real, not hashes") {
    // solid red image -> meanR max, meanG/meanB min
    val red = MediaCodecs.Image(8, 8, Array.tabulate(8 * 8 * 3)(i => if (i % 3 == 0) 255.toByte else 0.toByte))
    val f = MediaCodecs.imageFeatures(red, 16)
    assert(math.abs(f(0) - 0.5f) < 1e-3) // meanR = 255 -> +0.5
    assert(math.abs(f(1) + 0.5f) < 1e-3 && math.abs(f(2) + 0.5f) < 1e-3)

    // constant-amplitude square wave: rms = amplitude, zcr ~ 1/period
    val sq = Array.tabulate(4000)(i => if ((i / 4) % 2 == 0) 16384.toShort else (-16384).toShort)
    val af = MediaCodecs.audioFeatures(sq, 8)
    assert(math.abs(af(0) - 0.5f) < 1e-3) // 16384/32768
    assert(math.abs(af(1) - 0.25f) < 0.01) // crossing every 4 samples
  }

  test("extractFeatures marks malformed media decode_ok=false without failing the task") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "image", MediaCodecs.encodePpm(4, 4, rgbOf(4, 4, identity)), 4, 4, 0L),
      MediaRow(2L, "image", "garbage-not-a-ppm".getBytes, 0, 0, 0L),
      MediaRow(3L, "audio", Array[Byte](1, 2, 3), 0, 0, 100L),
      MediaRow(4L, "video", MediaCodecs.encodeGvid(Seq(MediaCodecs.encodePpm(4, 4, rgbOf(4, 4, identity)))), 4, 4, 2000L),
      MediaRow(5L, "weird", Array[Byte](9), 0, 0, 0L))
    val got = Multimodal.extractFeatures(rows.toDS(), 8).collect().map(r => r.media_id -> r.decode_ok).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true, 5L -> false))
  }
}
