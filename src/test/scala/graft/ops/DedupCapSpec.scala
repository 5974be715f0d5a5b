package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hot-bucket frequency caps for the LSH banding joins — the guard that
  * keeps a boilerplate class of F identical docs from exploding into an
  * F²/2-row band join — plus the exact-route-first scaled pipeline.
  */
class DedupCapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 120 distinct docs + one pathological class of 80 identical copies
  private def corpus = {
    val distinct = (0 until 120).map(i =>
      (i.toLong, s"unique document number $i with its own content body ${i * 7} and trailing text ${i * 13}"))
    val boiler = (0 until 80).map(i =>
      (1000L + i, "standard cookie banner accept our terms and conditions privacy policy"))
    (distinct ++ boiler).toDF("id", "text")
  }

  test("minhash cap collapses the pathological class; uncapped finds its F^2/2 pairs") {
    val uncapped = Dedup.minHashPairs(corpus, "id", "text", 64, 16, 3, 0.9)
    val capped = Dedup.minHashPairs(corpus, "id", "text", 64, 16, 3, 0.9, maxBandFreq = 10L)
    val un = uncapped.count()
    val cp = capped.count()
    assert(un >= 80L * 79 / 2, s"uncapped should see every boiler pair, got $un")
    assert(cp <= 200, s"capped should stay ~linear, got $cp")
  }

  test("simhash chunk cap: same guard") {
    val uncapped = Dedup.simHashPairs(corpus, "id", "text", 3)
    val capped = Dedup.simHashPairs(corpus, "id", "text", 3, maxChunkFreq = 10L)
    assert(uncapped.count() >= 80L * 79 / 2)
    assert(capped.count() <= 200)
  }

  test("nearDupPairsScaled: exact route finds every duplicate pair with the cap engaged") {
    val edges = Dedup.nearDupPairsScaled(corpus, "id", "text", 64, 16, 3, 0.9,
      maxBandFreq = 10L).cache()
    val exact = edges.filter(col("kind") === "exact")
    // 80 copies -> 79 star edges to the kept (minimum) id
    assert(exact.count() == 79)
    assert(exact.agg(min(col("id_a")), max(col("id_a"))).head.toSeq == Seq(1000L, 1000L))
    assert(exact.filter(col("est_jaccard") =!= 1.0).count() == 0)
    // the banding stage only ever saw one rep per distinct content
    val near = edges.filter(col("kind") === "near")
    assert(near.filter(col("id_a") >= 1000L && col("id_b") >= 1000L).count() == 0,
      "no intra-class pairs may reach the banding stage")
    edges.unpersist()
  }

  test("capped minhash still finds near (not exact) duplicate pairs") {
    // two near-identical docs (one token differs) + the hot class
    val near = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"))
    val df = near.toDF("id", "text").unionAll(corpus.filter(col("id") >= 1000))
    val pairs = Dedup.minHashPairs(df, "id", "text", 64, 16, 3, 0.5, maxBandFreq = 10L)
      .filter(col("id_a") === 1L && col("id_b") === 2L)
    assert(pairs.count() == 1, "near-dup pair must survive the cap")
  }

  test("signature materialization: minhash evaluates ONCE per doc (default Cache), parquet store too, recompute amplifies") {
    import graft.expr.MinHashSignature
    val docs = (0 until 200).map(i =>
      (i.toLong, s"document body number $i sharing words alpha beta gamma delta epsilon ${i % 7}")).toDF("id", "text")
    MinHashSignature.countProbes = true
    try {
      // default (Cache): one signature eval per doc across all ~5 consumers
      spark.catalog.clearCache()
      MinHashSignature.probeCount.set(0)
      Dedup.minHashPairs(docs, "id", "text", maxBandFreq = 50L).collect()
      val cached = MinHashSignature.probeCount.get()
      assert(cached == 200, s"expected one signature eval per doc with Store.Cache, got $cached")

      // durable parquet store: also exactly once (consumers read the files)
      val dir = java.nio.file.Files.createTempDirectory("sigstore").toString
      spark.catalog.clearCache()
      MinHashSignature.probeCount.set(0)
      Dedup.minHashPairs(docs, "id", "text", maxBandFreq = 50L,
        sigStore = Dedup.Store.Parquet(dir + "/sig")).collect()
      val parq = MinHashSignature.probeCount.get()
      assert(parq == 200, s"expected one signature eval per doc with Store.Parquet, got $parq")

      // opt-out recomputes per consumer (the old behavior)
      spark.catalog.clearCache()
      MinHashSignature.probeCount.set(0)
      Dedup.minHashPairs(docs, "id", "text", maxBandFreq = 50L,
        sigStore = Dedup.Store.Recompute).collect()
      val recomputed = MinHashSignature.probeCount.get()
      assert(recomputed > 200, s"Recompute should amplify (>200), got $recomputed")
    } finally {
      MinHashSignature.countProbes = false
      spark.catalog.clearCache()
    }
  }

  test("embedding near-dup bucket cap bounds the self-join") {
    val vecs = (0 until 50).map(i =>
        (i.toLong, Array.tabulate(8)(d => math.sin(i * (d + 1) + 0.5).toFloat))) ++
      (0 until 60).map(i => (100L + i, Array.fill(8)(1.0f))) // identical class
    val df = vecs.toDF("id", "v")
    val uncapped = Dedup.embeddingNearDupPairs(df, "id", "v", 0.9999, 4)
    val capped = Dedup.embeddingNearDupPairs(df, "id", "v", 0.9999, 4, maxBucketFreq = 20L)
    assert(uncapped.count() >= 60L * 59 / 2)
    assert(capped.count() < 60L * 59 / 2)
  }
}
