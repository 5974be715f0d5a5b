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
    // adversarial dimensions: w*h*3 wraps negative / to zero in Int — must
    // reject, not crash or fabricate an empty-pixel "valid" image
    assert(MediaCodecs.decodePpm("P6\n46341 46341\n255\n....".getBytes).isEmpty)
    assert(MediaCodecs.decodePpm("P6\n65536 65536\n255\n....".getBytes).isEmpty)
    assert(MediaCodecs.decodePpm("P6\n2147483647 3\n255\n..".getBytes).isEmpty)
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
    // adversarial frame-length prefix near Int.MaxValue: off += 4 + len
    // would overflow negative and slip past the bounds checks — must
    // return None, never throw (never-throw contract on untrusted bytes)
    val evil = vid.clone()
    val lb = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(Int.MaxValue - 2).array()
    System.arraycopy(lb, 0, evil, 8, 4) // frame 0's length prefix
    assert(MediaCodecs.decodeGvidFrame(evil, 2).isEmpty)
    assert(MediaCodecs.decodeGvidFrame(evil, 0).isEmpty)
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

  test("resize: nearest-neighbor preserves solid regions; round-trips through PPM") {
    // left half red, right half blue, 16x8 -> 4x2
    val rgb = Array.tabulate(16 * 8 * 3) { i =>
      val px = i / 3
      val x = px % 16
      (if (x < 8) { if (i % 3 == 0) 255 else 0 } else { if (i % 3 == 2) 255 else 0 }).toByte
    }
    val small = MediaCodecs.resize(MediaCodecs.Image(16, 8, rgb), 4, 2)
    assert(small.width == 4 && small.height == 2)
    // first two columns red, last two blue in each row
    for (y <- 0 until 2; x <- 0 until 4) {
      val p = (y * 4 + x) * 3
      if (x < 2) assert((small.rgb(p) & 0xff) == 255 && small.rgb(p + 2) == 0)
      else assert(small.rgb(p) == 0 && (small.rgb(p + 2) & 0xff) == 255)
    }
    val re = MediaCodecs.decodePpm(MediaCodecs.encodePpm(4, 2, small.rgb)).get
    assert(re.rgb.toSeq == small.rgb.toSeq)

    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val media = Multimodal.syntheticMedia(spark, 30, 4)
    val resized = Multimodal.resizeImages(media, 8, 8)
    import org.apache.spark.sql.functions._
    assert(resized.filter(col("media_type") === "image" && !col("resized")).count() == 0)
    assert(resized.filter(col("media_type") =!= "image" && col("resized")).count() == 0)
    val oneBlob = resized.filter(col("resized")).select(col("media"))
      .head.getAs[Array[Byte]](0)
    val img = MediaCodecs.decodePpm(oneBlob).get
    assert(img.width == 8 && img.height == 8)
  }

  test("ImageIO: PNG/BMP/GIF round-trip exact pixels; JPEG decodes close; corrupt bytes return None") {
    val w = 24; val h = 16
    val rgb = Multimodal.patternRgb(7L, w, h)

    // PNG is lossless: decode must reproduce the EXACT pixels
    val png = MediaCodecs.encodePng(w, h, rgb)
    assert(png.length >= 8 && (png(0) & 0xff) == 0x89 && png(1) == 'P') // real PNG magic
    val backPng = MediaCodecs.decodeImage(png).get
    assert(backPng.width == w && backPng.height == h)
    assert(backPng.rgb.toSeq == rgb.toSeq)

    // BMP + GIF via the same JDK writer registry: decode through decodeImage
    for (fmt <- Seq("bmp", "gif")) {
      val out = new java.io.ByteArrayOutputStream()
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val s = (y * w + x) * 3
        img.setRGB(x, y, ((rgb(s) & 0xff) << 16) | ((rgb(s + 1) & 0xff) << 8) | (rgb(s + 2) & 0xff))
      }
      assert(javax.imageio.ImageIO.write(img, fmt, out))
      val back = MediaCodecs.decodeImage(out.toByteArray)
      assert(back.isDefined, fmt)
      assert(back.get.width == w && back.get.height == h, fmt)
      // BMP is lossless; GIF palettizes — our gradient may exceed 256 colors,
      // so only assert exactness for BMP
      if (fmt == "bmp") assert(back.get.rgb.toSeq == rgb.toSeq)
    }

    // JPEG is lossy: dims exact, pixels close on smooth content
    val jpg = MediaCodecs.encodeJpeg(w, h, rgb)
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8) // SOI marker
    val backJpg = MediaCodecs.decodeImage(jpg).get
    assert(backJpg.width == w && backJpg.height == h)
    val meanAbsErr = rgb.indices.map(i => math.abs((rgb(i) & 0xff) - (backJpg.rgb(i) & 0xff))).sum.toDouble / rgb.length
    assert(meanAbsErr < 8.0, s"JPEG mean abs err $meanAbsErr")

    // corrupt / truncated / foreign bytes: None, never a throw
    val brokenMagic = png.clone(); brokenMagic(0) = 0
    assert(MediaCodecs.decodeImage(brokenMagic).isEmpty)
    assert(MediaCodecs.decodeImage(png.take(20)).isEmpty) // truncated before IDAT
    assert(MediaCodecs.decodeImage(Array[Byte]()).isEmpty)
    val noise = Array.tabulate[Byte](512)(i => (i * 37 + 11).toByte)
    assert(MediaCodecs.decodeImage(noise).isEmpty)
    // deterministic corrupt-header fuzz over the JPEG: flip each of the
    // first 24 header bytes; decode must return an Option, never throw
    for (i <- 0 until math.min(24, jpg.length)) {
      val mut = jpg.clone(); mut(i) = (mut(i) ^ 0x5a).toByte
      MediaCodecs.decodeImage(mut) // no assertion on value — no-throw contract
    }
  }

  test("extractFeatures and resize run on real compressed PNG/JPEG rows") {
    val spark = graft.SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val media = Multimodal.syntheticCompressedMedia(spark, 40, 4)
    val feats = Multimodal.extractFeatures(media, 16).collect()
    val byCls = feats.groupBy(f => (f.media_id % 4).toInt)
    assert(byCls(0).forall(_.decode_ok), "png")
    assert(byCls(1).forall(_.decode_ok), "jpeg")
    assert(byCls(2).forall(_.decode_ok), "ppm")
    assert(byCls(3).forall(!_.decode_ok), "corrupt")
    val resized = Multimodal.resizeImages(media, 8, 8)
    assert(resized.filter(col("media_id") % 4 < 3 && !col("resized")).count() == 0)
    assert(resized.filter(col("media_id") % 4 === 3 && col("resized")).count() == 0)
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

  test("GVID with compressed frames: MJPEG-class video decodes end-to-end") {
    val w = 24; val h = 16
    def rgb(seed: Long) = Multimodal.patternRgb(seed, w, h)
    // mixed container: PNG, JPEG and raw P6 frames side by side
    val gvid = MediaCodecs.encodeGvid(Seq(
      MediaCodecs.encodePng(w, h, rgb(1L)),
      MediaCodecs.encodeJpeg(w, h, rgb(2L)),
      MediaCodecs.encodePpm(w, h, rgb(3L))))
    assert(MediaCodecs.gvidFrameCount(gvid).contains(3))
    // PNG frame: exact pixels back
    val f0 = MediaCodecs.decodeGvidFrame(gvid, 0).get
    assert(f0.width == w && f0.height == h)
    assert(java.util.Arrays.equals(f0.rgb, rgb(1L)))
    // JPEG frame: decodes with right dimensions (lossy pixels)
    val f1 = MediaCodecs.decodeGvidFrame(gvid, 1).get
    assert(f1.width == w && f1.height == h)
    // raw frame still on the zero-copy fast path
    assert(java.util.Arrays.equals(MediaCodecs.decodeGvidFrame(gvid, 2).get.rgb, rgb(3L)))
    // corrupt compressed frame fails cleanly
    val broken = MediaCodecs.encodeGvid(Seq({
      val b = MediaCodecs.encodePng(w, h, rgb(4L)); b(0) = 0; b
    }))
    assert(MediaCodecs.decodeGvidFrame(broken, 0).isEmpty)
  }

  test("AudioSystem leg: stereo WAV downmixes exactly; canonical stays on the fast path") {
    val n = 500
    val l = Array.tabulate(n)(i => ((i * 37) % 20000 - 10000).toShort)
    val r = Array.tabulate(n)(i => ((i * 53) % 18000 - 9000).toShort)
    val stereo = MediaCodecs.encodeWavStereo(8000, l, r)
    // the direct parser must NOT claim stereo; decodeAudio must
    assert(MediaCodecs.decodeWav(stereo).isEmpty)
    val Some((rate, mono)) = MediaCodecs.decodeAudio(stereo)
    assert(rate == 8000 && mono.length == n)
    // truncating channel average, computed independently here
    (0 until n).foreach { i =>
      assert(mono(i) == ((l(i) + r(i)) / 2).toShort, s"frame $i")
    }
    // identical channels: downmix is the identity
    val same = MediaCodecs.encodeWavStereo(8000, l, l)
    assert(MediaCodecs.decodeAudio(same).get._2.toSeq == l.toSeq)
    // canonical mono PCM16 still decodes (fast path) byte-exactly
    val monoWav = MediaCodecs.encodeWav(8000, l)
    assert(MediaCodecs.decodeAudio(monoWav).get._2.toSeq == l.toSeq)
  }

  test("AudioSystem leg: PCM8 WAV widens within one 8-bit step; corrupt audio fails clean") {
    val u = Array.tabulate(300)(i => ((i * 7) % 256).toByte) // unsigned content
    val wav8 = MediaCodecs.encodeWavPcm8(11025, u)
    assert(MediaCodecs.decodeWav(wav8).isEmpty) // not the canonical format
    val Some((rate, s)) = MediaCodecs.decodeAudio(wav8)
    assert(rate == 11025 && s.length == 300)
    // the JDK converter scales ~32767/127 rather than <<8; accept any
    // widening within one 8-bit quantization step of the nominal value,
    // anchored exactly at zero
    (0 until 300).foreach { i =>
      val nominal = ((u(i) & 0xff) - 128) << 8
      assert(math.abs(s(i) - nominal) <= 256, s"sample $i: ${s(i)} vs $nominal")
      if ((u(i) & 0xff) == 128) assert(s(i) == 0, s"sample $i: zero not preserved")
    }
    // corrupt: bad magic, truncated header, truncated data, random bytes
    val broken = wav8.clone(); broken(0) = 'X'.toByte
    assert(MediaCodecs.decodeAudio(broken).isEmpty)
    assert(MediaCodecs.decodeAudio(wav8.take(20)).isEmpty)
    assert(MediaCodecs.decodeAudio(Array.tabulate(200)(i =>
      graft.core.Fnv.splitmix64(i.toLong).toByte)).isEmpty)
    assert(MediaCodecs.decodeAudio(Array.empty[Byte]).isEmpty)
  }

  test("AudioSystem leg: AIFF (big-endian JDK writer) round-trips through decodeAudio") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val samples = Array.tabulate(400)(i => ((i * 91) % 30000 - 15000).toShort)
    val bytes = new Array[Byte](samples.length * 2)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    samples.foreach(bb.putShort)
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 16000f, 16, 1, 2, 16000f, true)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length),
      AudioFileFormat.Type.AIFF, out)
    val Some((rate, got)) = MediaCodecs.decodeAudio(out.toByteArray)
    assert(rate == 16000 && got.toSeq == samples.toSeq)
  }
}
