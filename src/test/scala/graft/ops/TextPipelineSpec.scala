package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ccnet-style normalization, paragraph boilerplate removal, and
  * Gopher-style repetition signals.
  */
class TextPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("normalizeForDedup: case/punctuation/digit variants collapse; word content preserved") {
    val rows = Seq(
      (1L, "Hello, World! Call 555-1234."),
      (2L, "HELLO WORLD call 999 0000"),
      (3L, "a completely different document")).toDF("id", "t")
    val norm = rows.select($"id", TextOps.normalizeForDedup($"t").as("n"))
      .as[(Long, String)].collect().toMap
    assert(norm(1L) == "hello world call 000 0000")
    assert(norm(2L) == "hello world call 000 0000")
    assert(norm(3L) == "a completely different document")
  }

  test("dup fractions: empty, no-dup, all-dup edge cases") {
    val rows = Seq(
      (1L, ""),
      (2L, "one\ntwo\nthree"),
      (3L, "same\nsame\nsame\nsame"),
      (4L, "x x x x")).toDF("id", "t")
    val got = rows.select($"id",
      TextOps.dupLineFraction($"t").as("l"), TextOps.dupWordFraction($"t").as("w"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((0.0, 0.0)))
    assert(got(2L)._1 == 0.0)
    assert(got(3L)._1 == 0.75) // 4 lines, 1 distinct
    assert(got(4L)._2 == 0.75) // 4 words, 1 distinct
  }

  test("canonicalizeUrl: case/port/fragment/tracking/param-order variants collapse") {
    val urls = Seq(
      (1L, "HTTP://Example.COM:80/a?b=2&a=1&utm_source=x#frag"),
      (2L, "http://example.com/a?a=1&b=2"),
      (3L, "https://Example.com:443/"),
      (4L, "https://example.com"),
      (5L, "https://example.com:8443/x?gclid=123&z=9"),
      (6L, "http://example.com/a?a=1&b=3")).toDF("id", "u")
    val canon = urls.select($"id", TextOps.canonicalizeUrl($"u").as("c"))
      .as[(Long, String)].collect().toMap
    assert(canon(1L) == canon(2L), s"${canon(1L)} vs ${canon(2L)}")
    assert(canon(1L) == "http://example.com/a?a=1&b=2")
    assert(canon(3L) == canon(4L) && canon(3L) == "https://example.com/")
    assert(canon(5L) == "https://example.com:8443/x?z=9") // non-default port kept
    assert(canon(6L) != canon(2L)) // different param VALUE stays distinct
  }

  test("canonicalizeUrl: schemeless inputs pass through; '?' inside a fragment is not a query") {
    val urls = Seq(
      (1L, "example.com/a"),
      (2L, "//cdn.example.com/b"),
      (3L, "mailto:someone"),
      (4L, "http://example.com/page#sec?tab=2"),
      (5L, "http://example.com/page")).toDF("id", "u")
    val canon = urls.select($"id", TextOps.canonicalizeUrl($"u").as("c"))
      .as[(Long, String)].collect().toMap
    // no-scheme rows keep their original form — never collapse onto one key
    assert(canon(1L) == "example.com/a" && canon(2L) == "//cdn.example.com/b"
      && canon(3L) == "mailto:someone")
    // fragment stripped whole: the '?' inside it is fragment content
    assert(canon(4L) == "http://example.com/page")
    assert(canon(4L) == canon(5L))
  }

  test("null-text robustness: every curation op survives null/empty text without task failure") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "a normal document with several words in it"),
      (2L, null), (3L, ""), (4L, "   "),
      (5L, "a normal document with several words in it")).toDF("id", "text")
    assert(Dedup.exactGroups(df, "id", "text").count() >= 3) // null fp groups separately, no crash
    assert(Dedup.minHashPairs(df, "id", "text", 64, 16, 3, 0.9).count() >= 1) // 1-5 pair found
    assert(Dedup.simHashPairs(df, "id", "text", 3).count() >= 1)
    assert(Dedup.paragraphDedup(df, "id", "text", 100).count() == 5) // all rows survive
    val stats = df.select(
      TextOps.dupLineFraction($"text"), TextOps.dupWordFraction($"text"),
      TextOps.normalizeForDedup($"text"), TextOps.canonicalizeUrl($"text")).collect()
    assert(stats.length == 5) // null in -> null out, never a throw
  }

  test("dedupByUrl: keeps one row per canonical URL, smallest id wins") {
    val rows = Seq(
      (3L, "HTTP://A.com:80/x?b=2&a=1"),
      (1L, "http://a.com/x?a=1&b=2&utm_source=z"),
      (2L, "http://a.com/y"),
      (4L, "not a url at all")).toDF("id", "url")
    val kept = Dedup.dedupByUrl(rows, "id", "url").select($"id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 4L)) // 3 is a canonical duplicate of 1
  }

  test("minhash sparse docs: a subset pair must NOT get est_jaccard 1.0") {
    // 3 tokens vs 4 tokens at w=3: shingle sets {s} vs {s,t}, J = 0.5 —
    // the OPH bin trick could collapse these; the classic sparse path
    // must keep them apart
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma delta")).toDF("id", "text")
    val pairs = Dedup.minHashPairs(docs, "id", "text", 64, 16, 3, 0.9)
    assert(pairs.count() == 0, "subset pair must not look identical")
    val loose = Dedup.minHashPairs(docs, "id", "text", 64, 16, 3, 0.25)
      .select($"est_jaccard").collect()
    loose.foreach { r =>
      val est = r.getDouble(0)
      assert(est < 0.95 && est > 0.2, s"est=$est should be near true J=0.5")
    }
  }

  test("paragraphDedup: hot paragraphs drop everywhere, order preserved, empty doc survives as empty") {
    val docs = (0 until 60).map { i =>
      (i.toLong, s"COOKIE BANNER\nunique paragraph $i alpha\nCOOKIE BANNER\nunique paragraph $i beta")
    } :+ (999L, "COOKIE BANNER")
    val out = Dedup.paragraphDedup(docs.toDF("id", "text"), "id", "text", maxDocFreq = 50)
      .as[(Long, String)].collect().toMap
    assert(out(3L) == "unique paragraph 3 alpha\nunique paragraph 3 beta")
    assert(out(999L) == "") // all paragraphs were boilerplate
    assert(out.size == 61)
    // a paragraph under the doc-frequency threshold is untouched
    val rare = (0 until 10).map(i => (i.toLong, s"rare shared line\nbody $i"))
    val kept = Dedup.paragraphDedup(rare.toDF("id", "text"), "id", "text", 50)
      .as[(Long, String)].collect().toMap
    assert(kept(0L) == "rare shared line\nbody 0")
  }

  test("paragraphDedup: blank lines are never boilerplate — paragraph separation survives") {
    // every doc has a blank separator line; it must NOT enter the hot set
    // even though its doc frequency is far over the threshold
    val docs = (0 until 60).map { i =>
      (i.toLong, s"HOT FOOTER\npara $i one\n\npara $i two")
    }
    val out = Dedup.paragraphDedup(docs.toDF("id", "text"), "id", "text", maxDocFreq = 50)
      .as[(Long, String)].collect().toMap
    assert(out(7L) == "para 7 one\n\npara 7 two",
      s"blank separator must survive, got '${out(7L)}'")
  }

  test("minhash hybrid boundary: straddling pairs above threshold still collide (t > 2/3)") {
    // At k=64, t=0.7 the old k/8 cutoff (classic for s<8) silently lost
    // pairs like 7-vs-8 shingles (J up to 7/8 > t) across the path
    // boundary. With the threshold-derived cutoff (classic for s<=2),
    // both docs take the OPH path and the pair must be found.
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9" // 7 shingles at w=3
    val b = a + " w10" // 8 shingles, superset: J = 7/8 = 0.875
    val docs = Seq((1L, a), (2L, b)).toDF("id", "text")
    val pairs = Dedup.minHashPairs(docs, "id", "text", 64, 16, 3, 0.7)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L)), s"straddling near-dup pair lost: ${pairs.toSeq}")
    // and a straddling pair that the boundary CAN hide is provably below
    // threshold: s_a=2, s_b=3 has J <= 2/3 < 0.7 — absence is correct
    val tiny = Seq((1L, "t1 t2 t3 t4"), (2L, "t1 t2 t3 t4 t5")).toDF("id", "text")
    val est = Dedup.minHashPairs(tiny, "id", "text", 64, 16, 3, 0.25)
      .select($"est_jaccard").as[Double].collect()
    est.foreach(e => assert(e < 0.95, s"classic sparse path must not collapse subset pair, est=$e"))
  }
}
