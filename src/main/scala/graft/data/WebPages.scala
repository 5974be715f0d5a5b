package graft.data

import graft.core.Fnv
import org.apache.spark.sql.{Dataset, SparkSession}

/** A Common-Crawl-style web page row — the north-rule input shape:
  * `(url string, warc_ts timestamp, html binary, text string, lang string)`.
  */
case class WebPage(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic web-page corpus generator + text extractor.
  *
  * Pure function of `(seed, rowId)` via splitmix64 — no wall clock, no
  * unseeded RNG — so every test and both parallelism levels see the same
  * bytes (FIXTURES.md §1 contract).
  *
  * Per-row invariant (BASELINE.json input_hint): `extractText(html(i))` is
  * byte-identical to `text(i)` — the html is a fixed wrapper around the
  * text, and the extractor strips exactly that wrapper.
  */
object WebPages {
  final val DefaultSeed = 42L

  /** Zipf-skewed language distribution: en ≫ rest — exercises hot-key
    * salting in group-by sketches.
    */
  final val Langs: Array[String] =
    Array("en", "de", "fr", "es", "zh", "ru", "ja", "pt", "it", "nl")
  // Zipf(1.0) cumulative weights over ranks 1..10
  private val zipfCum: Array[Double] = {
    val w = (1 to Langs.length).map(r => 1.0 / r).toArray
    val total = w.sum
    w.scanLeft(0.0)(_ + _).tail.map(_ / total)
  }

  /** Fixed 1024-word vocabulary, itself derived deterministically. */
  val Vocab: Array[String] = {
    val letters = "abcdefghijklmnopqrstuvwxyz"
    (0 until 1024).map { i =>
      var h = Fnv.splitmix64(0xB0CAB1E5L | i.toLong << 32)
      val len = 3 + (Math.floorMod(h, 6L)).toInt // 3..8 letters
      val sb = new StringBuilder(len)
      var j = 0
      while (j < len) {
        h = Fnv.splitmix64(h)
        sb.append(letters(Math.floorMod(h, 26L).toInt))
        j += 1
      }
      sb.toString
    }.toArray
  }

  private final val HtmlPrefixA = "<html><head><title>"
  private final val HtmlPrefixB = "</title></head><body><p>"
  private final val HtmlSuffix = "</p></body></html>"
  private final val EpochMillis = 1704067200000L // 2024-01-01T00:00:00Z

  def lang(seed: Long, i: Long): String = {
    val u = (Fnv.splitmix64(seed ^ (i * 31 + 1)) >>> 11).toDouble / (1L << 53).toDouble
    var r = 0
    while (r < zipfCum.length - 1 && u > zipfCum(r)) r += 1
    Langs(r)
  }

  def url(seed: Long, i: Long, dupEvery: Int = 0): String = {
    // a configurable fraction of duplicate urls for distinct-count testing
    val id = if (dupEvery > 0 && i % 97 < dupEvery) i - (i % 10) else i
    val h = Fnv.splitmix64(seed ^ (id * 31 + 2)) & 0xffffL
    s"https://site-$h.example/${lang(seed, id)}/page/$id"
  }

  def text(seed: Long, i: Long): String = {
    var h = Fnv.splitmix64(seed ^ (i * 31 + 3))
    // long-tailed length: mostly short, occasionally long documents
    val base = 8 + Math.floorMod(h, 40L).toInt
    h = Fnv.splitmix64(h)
    val nWords = if (Math.floorMod(h, 20L) == 0L) base * 16 else base
    val sb = new StringBuilder(nWords * 6)
    var j = 0
    while (j < nWords) {
      h = Fnv.splitmix64(h)
      if (j > 0) sb.append(' ')
      sb.append(Vocab(Math.floorMod(h, 1024L).toInt))
      j += 1
    }
    sb.toString
  }

  def html(u: String, t: String): Array[Byte] =
    (HtmlPrefixA + u + HtmlPrefixB + t + HtmlSuffix)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Strip the fixed wrapper; byte-identity with the generating text is the
    * per-row invariant tested for every row of the fixture.
    */
  def extractText(htmlBytes: Array[Byte]): String = {
    val s = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
    val start = s.indexOf(HtmlPrefixB)
    val end = s.lastIndexOf(HtmlSuffix)
    require(start >= 0 && end >= start, "not a graft-generated page")
    s.substring(start + HtmlPrefixB.length, end)
  }

  def page(seed: Long, i: Long, dupEvery: Int = 0): WebPage = {
    val u = url(seed, i, dupEvery)
    val t = text(seed, i)
    WebPage(u, new java.sql.Timestamp(EpochMillis + i * 1000L), html(u, t), t, lang(seed, i))
  }

  /** Distributed deterministic corpus: row i is `page(seed, i)` regardless
    * of partitioning, so any two parallelism levels generate identical data.
    */
  def dataset(spark: SparkSession, n: Long, partitions: Int,
              seed: Long = DefaultSeed, dupEvery: Int = 0): Dataset[WebPage] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => page(seed, i, dupEvery))
  }
}
