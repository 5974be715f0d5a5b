package graft.ops

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pure-JVM codecs for the multimodal pipeline: real parsers/decoders for
  * the formats the JDK can handle with zero external dependencies.
  *
  *  - image: compressed JPEG / PNG / GIF / BMP via the JDK's own
  *    `javax.imageio` ([[decodeImageIO]] — the readers ship in
  *    `java.desktop`, no codec jars), plus binary PPM (P6) —
  *    `"P6\n{w} {h}\n255\n"` + w·h·3 RGB bytes — as the uncompressed
  *    interchange format; [[decodeImage]] dispatches on the magic bytes.
  *    Real web crawls are overwhelmingly JPEG/PNG, so this is the path a
  *    real corpus takes;
  *  - audio: canonical WAV, PCM16 mono little-endian (44-byte RIFF
  *    header + samples);
  *  - video: a GVID container — MJPEG-style motion format of raw P6
  *    frames: `"GVID" | frameCount:int32 LE | frames...`, each frame a
  *    length-prefixed P6 image. Compressed video codecs (H.264 etc.)
  *    remain out of scope (the JDK ships no video decoder); the
  *    container parsing, frame indexing and per-frame decode are real.
  *
  * Every parse failure returns None (malformed media rows surface as
  * `decode_ok = false`, never an exception inside a task).
  */
object MediaCodecs {

  // Executors are headless JVMs; ImageIO must never try to touch a
  // display, and its default per-stream disk cache would add a temp-file
  // round-trip to every decoded row.
  System.setProperty("java.awt.headless", "true")
  javax.imageio.ImageIO.setUseCache(false)

  final case class Image(width: Int, height: Int, rgb: Array[Byte])

  // ---------------- PPM (P6) ----------------

  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, s"rgb length ${rgb.length} != $width x $height x 3")
    val header = s"P6\n$width $height\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  def decodePpm(bytes: Array[Byte]): Option[Image] = decodePpm(bytes, 0, bytes.length)

  private def decodePpm(bytes: Array[Byte], off: Int, len: Int): Option[Image] = {
    // header: magic, whitespace-separated width/height/maxval, one ws byte
    var i = off
    val end = off + len
    def token(): Option[String] = {
      while (i < end && (bytes(i) == ' ' || bytes(i) == '\n' || bytes(i) == '\t' || bytes(i) == '\r')) i += 1
      val s = i
      while (i < end && bytes(i) > ' ') i += 1
      if (i > s) Some(new String(bytes, s, i - s, StandardCharsets.US_ASCII)) else None
    }
    try {
      if (token().contains("P6")) {
        for {
          w <- token().map(_.toInt)
          h <- token().map(_.toInt)
          maxv <- token().map(_.toInt)
          // dimension sanity BEFORE any size arithmetic: a corrupt header
          // like 46341x46341 overflows w*h*3 in Int (wraps negative or to
          // 0), which would either crash copyOfRange or fabricate an
          // empty-pixel "valid" image — both violate the never-throw
          // contract on untrusted web bytes. 2^14 per side caps the body
          // at 0.75 GiB, far beyond any real row.
          if maxv == 255 && w > 0 && h > 0 && w <= (1 << 14) && h <= (1 << 14)
          _ = { i += 1 } // single whitespace after maxval per spec
          if (end - i).toLong >= w.toLong * h * 3
        } yield Image(w, h, java.util.Arrays.copyOfRange(bytes, i, i + w * h * 3))
      } else None
    } catch { case _: NumberFormatException => None }
  }

  // ---------------- compressed images (JDK javax.imageio) ----------------

  /** Decode JPEG/PNG/GIF/BMP bytes with the JDK's built-in readers to the
    * library's packed-RGB [[Image]]. Any color model (palette, grayscale,
    * ARGB) is converted through the image's own `getRGB` color space;
    * alpha is composited over black. Same dimension sanity bound as the
    * PPM parser; any reader failure (no reader claims the magic bytes,
    * truncated stream, corrupt entropy data) returns None.
    */
  def decodeImageIO(bytes: Array[Byte]): Option[Image] = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) None
        else {
          val rgb = new Array[Byte](w * h * 3)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val p = row(x)
              val d = (y * w + x) * 3
              rgb(d) = ((p >> 16) & 0xff).toByte
              rgb(d + 1) = ((p >> 8) & 0xff).toByte
              rgb(d + 2) = (p & 0xff).toByte
              x += 1
            }
            y += 1
          }
          Some(Image(w, h, rgb))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Image decode dispatch by magic bytes: P6 → the PPM parser,
    * everything else → [[decodeImageIO]] (whose reader registry itself
    * dispatches JPEG/PNG/GIF/BMP on their magics).
    */
  def decodeImage(bytes: Array[Byte]): Option[Image] =
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else decodeImageIO(bytes)

  private def toBufferedImage(width: Int, height: Int, rgb: Array[Byte]): java.awt.image.BufferedImage = {
    require(rgb.length == width * height * 3, s"rgb length ${rgb.length} != $width x $height x 3")
    val img = new java.awt.image.BufferedImage(width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](width)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val s = (y * width + x) * 3
        row(x) = ((rgb(s) & 0xff) << 16) | ((rgb(s + 1) & 0xff) << 8) | (rgb(s + 2) & 0xff)
        x += 1
      }
      img.setRGB(0, y, width, 1, row, 0, width)
      y += 1
    }
    img
  }

  private def encodeImageIO(width: Int, height: Int, rgb: Array[Byte], format: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(toBufferedImage(width, height, rgb), format, out)
    require(ok, s"no JDK ImageIO writer for format '$format'")
    out.toByteArray
  }

  /** Lossless PNG encode (JDK writer): decode gives back the exact pixels. */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] =
    encodeImageIO(width, height, rgb, "png")

  /** Lossy JPEG encode (JDK writer, default quality). */
  def encodeJpeg(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] =
    encodeImageIO(width, height, rgb, "jpg")

  // ---------------- WAV (PCM16 mono LE) ----------------

  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataLen)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
      .put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
      .put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Returns (sampleRate, samples) for a canonical PCM16-mono WAV. */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = { val a = new Array[Byte](n); buf.get(a); new String(a, StandardCharsets.US_ASCII) }
    if (ascii(4) != "RIFF") return None
    buf.getInt // riff size
    if (ascii(4) != "WAVE" || ascii(4) != "fmt ") return None
    val fmtLen = buf.getInt
    val audioFormat = buf.getShort
    val channels = buf.getShort
    val sampleRate = buf.getInt
    buf.getInt; buf.getShort // byte rate, block align
    val bits = buf.getShort
    if (audioFormat != 1 || channels != 1 || bits != 16 || fmtLen != 16) return None
    if (ascii(4) != "data") return None
    val dataLen = buf.getInt
    if (dataLen < 0 || dataLen > buf.remaining()) return None
    val samples = new Array[Short](dataLen / 2)
    var i = 0
    while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
    Some((sampleRate, samples))
  }

  /** Stereo PCM16 WAV encoder (interleaved L/R) — the non-canonical
    * fixture real crawls are full of; exercised by the AudioSystem path.
    */
  def encodeWavStereo(sampleRate: Int, left: Array[Short], right: Array[Short]): Array[Byte] = {
    require(left.length == right.length, "channel length mismatch")
    val dataLen = left.length * 4
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataLen)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
      .put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(1) // PCM
      .putShort(2) // stereo
      .putInt(sampleRate)
      .putInt(sampleRate * 4) // byte rate
      .putShort(4) // block align
      .putShort(16) // bits/sample
      .put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
    var i = 0
    while (i < left.length) { buf.putShort(left(i)); buf.putShort(right(i)); i += 1 }
    buf.array()
  }

  /** Mono PCM8 WAV encoder (8-bit samples are UNSIGNED per the WAV spec). */
  def encodeWavPcm8(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
    val dataLen = samples.length
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataLen)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
      .put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate) // byte rate
      .putShort(1) // block align
      .putShort(8) // bits/sample
      .put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
    buf.put(samples)
    buf.array()
  }

  /** General audio decode to the library's PCM16-mono contract: the
    * canonical PCM16-mono-LE WAV takes the fast direct parser
    * ([[decodeWav]]); every other format the JDK understands — stereo /
    * PCM8 / PCM24/32 / float WAV, WAVs with extra LIST/fact chunks, AIFF,
    * AU — goes through `javax.sound.sampled.AudioSystem` (ships in
    * `java.desktop`, zero external codec jars), is converted to 16-bit
    * signed PCM at the source rate and channel count, then downmixed to
    * mono by truncating channel average `(sum / channels)`. Compressed
    * audio (MP3/Opus) stays the documented seam — the JDK ships no
    * decoder. Any failure returns None (`decode_ok = false`), never a
    * task exception.
    */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    decodeWav(bytes).orElse(decodeAudioSystem(bytes))

  /** The `AudioSystem` leg of [[decodeAudio]]. */
  def decodeAudioSystem(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val src = in.getFormat
        val ch = src.getChannels
        val rate = math.round(src.getSampleRate)
        if (ch <= 0 || ch > 8 || rate <= 0) return None
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, ch, ch * 2, src.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, in)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = pcm.read(buf)
        // bound the decoded size BEFORE buffering it: ~2^26 frames ≈
        // 256 MB of stereo PCM — far beyond any real crawled row
        while (n > 0 && out.size() <= (1 << 27)) { out.write(buf, 0, n); n = pcm.read(buf) }
        if (out.size() > (1 << 27)) return None
        val data = out.toByteArray
        val frames = data.length / (2 * ch)
        val mono = new Array[Short](frames)
        val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
        var f = 0
        while (f < frames) {
          var acc = 0
          var c = 0
          while (c < ch) { acc += bb.getShort(); c += 1 }
          mono(f) = (acc / ch).toShort // truncating channel average
          f += 1
        }
        Some((rate, mono))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ---------------- GVID (raw-frame motion container) ----------------

  def encodeGvid(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 8 + frames.map(f => 4 + f.length).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("GVID".getBytes(StandardCharsets.US_ASCII)).putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  def gvidFrameCount(bytes: Array[Byte]): Option[Int] = {
    if (bytes.length < 8 || bytes(0) != 'G' || bytes(1) != 'V' || bytes(2) != 'I' || bytes(3) != 'D') None
    else {
      val n = ByteBuffer.wrap(bytes, 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      if (n >= 0) Some(n) else None
    }
  }

  /** Decode frame `idx` without materializing the other frames (seek by
    * length prefixes — the point of the container format). Frames
    * dispatch through [[decodeImage]], so a GVID container of JPEG
    * frames IS the MJPEG class of motion formats, decoded end-to-end by
    * the JDK; only interframe codecs (H.264…) remain out of scope.
    */
  def decodeGvidFrame(bytes: Array[Byte], idx: Int): Option[Image] = {
    val count = gvidFrameCount(bytes)
    if (count.isEmpty || idx < 0 || idx >= count.get) return None
    var off = 8
    var f = 0
    while (f < idx) {
      if (off + 4 > bytes.length) return None
      val len = ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      // adversarial length prefixes near Int.MaxValue would overflow
      // `off + 4 + len` into a negative offset that slips past the bounds
      // checks — reject any frame extending past the buffer BEFORE
      // advancing (also exits early instead of walking garbage)
      if (len < 0 || len > bytes.length - off - 4) return None
      off += 4 + len
      f += 1
    }
    if (off + 4 > bytes.length) return None
    val len = ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    if (len < 0 || len > bytes.length - off - 4) return None
    if (len >= 2 && bytes(off + 4) == 'P' && bytes(off + 5) == '6')
      decodePpm(bytes, off + 4, len) // zero-copy fast path for raw frames
    else decodeImageIO(java.util.Arrays.copyOfRange(bytes, off + 4, off + 4 + len))
  }

  /** Nearest-neighbor resize on decoded pixels (the standard cheap
    * thumbnail/model-input-shape step; bilinear would slot in the same
    * seam).
    */
  def resize(img: Image, w: Int, h: Int): Image = {
    require(w > 0 && h > 0, s"bad target size ${w}x$h")
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val sy = y * img.height / h
      var x = 0
      while (x < w) {
        val sx = x * img.width / w
        val s = (sy * img.width + sx) * 3
        val d = (y * w + x) * 3
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    Image(w, h, out)
  }

  // ---------------- feature extraction (real math over decoded media) ----

  /** Image features: [meanR, meanG, meanB, stdLuma, then an 8×8 grayscale
    * thumbnail] padded/truncated to `dim`, all in [-0.5, 0.5].
    */
  def imageFeatures(img: Image, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val n = img.width * img.height
    var (sr, sg, sb) = (0L, 0L, 0L)
    var sl = 0.0
    var sl2 = 0.0
    var i = 0
    while (i < n) {
      val r = img.rgb(i * 3) & 0xff
      val g = img.rgb(i * 3 + 1) & 0xff
      val b = img.rgb(i * 3 + 2) & 0xff
      sr += r; sg += g; sb += b
      val luma = 0.299 * r + 0.587 * g + 0.114 * b
      sl += luma; sl2 += luma * luma
      i += 1
    }
    if (dim > 0) out(0) = (sr.toFloat / n / 255f) - 0.5f
    if (dim > 1) out(1) = (sg.toFloat / n / 255f) - 0.5f
    if (dim > 2) out(2) = (sb.toFloat / n / 255f) - 0.5f
    if (dim > 3) out(3) = (math.sqrt(math.max(sl2 / n - (sl / n) * (sl / n), 0.0)) / 255.0).toFloat
    // 8x8 nearest-neighbor grayscale thumbnail into the remaining slots
    var t = 0
    while (t < 64 && 4 + t < dim) {
      val tx = (t % 8) * img.width / 8
      val ty = (t / 8) * img.height / 8
      val p = (ty * img.width + tx) * 3
      val luma = 0.299 * (img.rgb(p) & 0xff) + 0.587 * (img.rgb(p + 1) & 0xff) + 0.114 * (img.rgb(p + 2) & 0xff)
      out(4 + t) = (luma / 255.0).toFloat - 0.5f
      t += 1
    }
    out
  }

  /** Audio features: [rms, zero-crossing rate, then per-window RMS energy
    * bins] padded/truncated to `dim`.
    */
  def audioFeatures(samples: Array[Short], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (samples.isEmpty) return out
    var s2 = 0.0
    var zc = 0
    var i = 0
    while (i < samples.length) {
      val v = samples(i).toDouble / 32768.0
      s2 += v * v
      if (i > 0 && (samples(i) ^ samples(i - 1)) < 0) zc += 1
      i += 1
    }
    if (dim > 0) out(0) = math.sqrt(s2 / samples.length).toFloat
    if (dim > 1) out(1) = zc.toFloat / samples.length
    val bins = dim - 2
    if (bins > 0) {
      val win = math.max(samples.length / bins, 1)
      var b = 0
      while (b < bins) {
        val from = b * win
        val to = math.min(from + win, samples.length)
        if (from < to) {
          var e = 0.0
          var j = from
          while (j < to) { val v = samples(j).toDouble / 32768.0; e += v * v; j += 1 }
          out(2 + b) = math.sqrt(e / (to - from)).toFloat
        }
        b += 1
      }
    }
    out
  }
}
