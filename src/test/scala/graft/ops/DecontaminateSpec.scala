package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val W = 8
  private val S = 2

  // local oracle: the same distinct character shingling, in plain Scala
  // (bench side is stride 1 by the operator's contract)
  private def sh(t: String, step: Int = S): Set[String] = {
    val n = math.max(t.length - (W - 1), 1)
    (1 to n by step).map(p => t.substring(p - 1, math.min(p - 1 + W, t.length))).toSet
  }

  private def mkDocs(rows: Seq[(Long, String)]) = rows.toDF("id", "text")

  test("overlapStats matches a per-document set-intersection oracle") {
    val benchTexts = Seq("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs")
    val docTexts = Seq(
      0L -> "a clean document about nothing in particular whatsoever",
      1L -> "contains the quick brown fox jumps over the lazy dog verbatim",
      2L -> "pack my box with five dozen liquor jugs and more text after",
      3L -> "tiny",
      4L -> "the quick brown fox jumps over the lazy dog") // full overlap
    val bench = benchTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("bid", "btext")
    val benchSh = benchTexts.map(sh(_, 1)).reduce(_ ++ _)

    val got = Decontaminate.overlapStats(mkDocs(docTexts), "id", "text",
        bench, "btext", W, S)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap

    docTexts.foreach { case (id, t) =>
      val mine = sh(t)
      val hits = (mine & benchSh).size.toLong
      val (ngrams, contaminated, frac) = got(id)
      assert(ngrams == mine.size.toLong, s"doc $id ngrams")
      assert(contaminated == hits, s"doc $id hits")
      assert(frac == hits.toDouble / math.max(mine.size, 1), s"doc $id frac")
    }
    // sanity on the fixture itself: mixed outcomes, incl. 100% and 0%
    assert(got(4L)._3 == 1.0)
    assert(got(0L)._2 == 0L)
    assert(got(1L)._2 > 0L)
  }

  test("flag applies minHits and minFrac thresholds") {
    val bench = Seq((0L, "abcdefghijklmnopqrstuvwxyz0123456789")).toDF("bid", "btext")
    val docs = mkDocs(Seq(
      0L -> "abcdefghijklmnopqrstuvwxyz0123456789", // fully contaminated
      1L -> "zzzzzzzz unrelated content here zzzzzzzz"))
    val f = Decontaminate.flag(docs, "id", "text", bench, "btext", W, S,
        minHits = 3L, minFrac = 1.0)
      .select("id", "flagged").as[(Long, Boolean)].collect().toMap
    assert(f(0L) && !f(1L))
    // high hit floor + frac floor of 1.0: doc 0 still flags via frac
    val f2 = Decontaminate.flag(docs, "id", "text", bench, "btext", W, S,
        minHits = 1000000L, minFrac = 1.0)
      .select("id", "flagged").as[(Long, Boolean)].collect().toMap
    assert(f2(0L) && !f2(1L))
  }

  test("Bloom path: no false negatives, near-exact at low fpp, map-only plan") {
    val benchTexts = (0 until 40).map(i => s"benchmark question number $i with some shared phrasing")
    val bench = benchTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("bid", "btext")
    val docs = mkDocs((0 until 200).map { i =>
      val t = if (i % 3 == 0) s"benchmark question number ${i % 40} with some shared phrasing plus trailing junk $i"
      else s"wholly original text body number $i nothing shared at all $i"
      (i.toLong, t)
    })
    val blob = Decontaminate.buildBenchFilter(bench, "btext", W,
      expectedNgrams = 100000L, fpp = 0.0001f)
    val exact = Decontaminate.overlapStats(docs, "id", "text", bench, "btext", W, S)
      .select(col("id"), col("contaminated").as("e"))
    val bloom = Decontaminate.overlapStatsBloom(docs, "id", "text", blob, W, S)
    // plan shape: the Bloom pass is map-only — no shuffle anywhere
    val shuffles = bloom.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty, "Bloom contamination pass must not shuffle")

    val both = bloom.select(col("id"), col("contaminated").as("b"))
      .join(exact, Seq("id")).select("id", "b", "e")
      .as[(Long, Long, Long)].collect()
    assert(both.length == 200)
    both.foreach { case (id, b, e) =>
      assert(b >= e, s"doc $id: Bloom count $b below exact $e (false negative)")
    }
    // at fpp 1e-4 over ~2e4 clean shingles, expected inflation << 1 per doc
    val inflated = both.count { case (_, b, e) => b != e }
    assert(inflated <= 2, s"too many Bloom-inflated docs: $inflated")
  }

  test("fused NgramBloomStats == declarative HOF chain, incl. multibyte text") {
    import graft.pipeline.ShardedBloom
    import org.apache.spark.sql.GraftSqlBridge
    val bench = Seq((0L, "héllo wörld ünïcode bénchmark téxt — 日本語のテキストです"),
      (1L, "plain ascii benchmark text for the filter")).toDF("bid", "btext")
    val docs = mkDocs(Seq(
      0L -> "contains héllo wörld ünïcode bénchmark téxt inside",
      1L -> "日本語のテキストです and more",
      2L -> "nothing shared at all here",
      3L -> "x", // shorter than width
      4L -> "plain ascii benchmark text for the filter"))
    val blob = Decontaminate.buildBenchFilter(bench, "btext", W, 1000L, 0.001f)
    // the original declarative spelling, evaluated for comparison
    val bcast = spark.sparkContext.broadcast(Array(blob))
    val shs = Decontaminate.shingles("text", W, S)
    val hof = docs.select(col("id"),
        size(shs).cast("long").as("ngrams"),
        size(filter(shs, sh => ShardedBloom.mightContain(bcast, sh)))
          .cast("long").as("contaminated"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fused = Decontaminate.overlapStatsBloom(docs, "id", "text", blob, W, S)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fused == hof)
    assert(fused(0L)._2 > 0L && fused(2L)._2 == 0L)
    // and the fused plan participates in whole-stage codegen (range-based
    // input — a LocalRelation would eagerly collapse to LocalTableScan)
    val rangeDocs = spark.range(50).select(col("id"),
      concat(lit("document body with héllo wörld "), col("id")).as("text"))
    val plan = Decontaminate.overlapStatsBloom(rangeDocs, "id", "text", blob, W, S)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen stage in plan:\n$plan")
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[graft.expr.NgramBloomStats]))
  }

  test("bloom and exact stats agree on ngram totals and row coverage") {
    val bench = Seq((0L, "some held out evaluation text")).toDF("bid", "btext")
    val docs = mkDocs((0 until 50).map(i => (i.toLong, s"document body $i")))
    val blob = Decontaminate.buildBenchFilter(bench, "btext", W, 1000L, 0.001f)
    val e = Decontaminate.overlapStats(docs, "id", "text", bench, "btext", W, S)
      .select("id", "ngrams").as[(Long, Long)].collect().toMap
    val b = Decontaminate.overlapStatsBloom(docs, "id", "text", blob, W, S)
      .select("id", "ngrams").as[(Long, Long)].collect().toMap
    assert(e == b)
    assert(e.size == 50)
  }
}
