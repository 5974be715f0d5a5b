package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfPqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // clustered synthetic corpus: 8 well-separated directions in 16 dims
  private def corpus = {
    val rnd = new scala.util.Random(7)
    (0 until 400).map { i =>
      val c = i % 8
      val base = Array.tabulate(16)(d => math.sin(c * 3 + d * 1.7).toFloat * 2f)
      (i.toLong, base.map(x => x + rnd.nextFloat() * 0.3f))
    }.toDF("id", "v")
  }

  test("model: codes in range; ADC score tracks exact cosine ordering") {
    val sample = corpus.as[(Long, Seq[Float])].collect().map(_._2.toArray)
    val model = IvfPq.train(sample, nCentroids = 8, m = 4, ks = 16)
    assert(model.codebooks.length == 4 && model.codebooks.head.length == 16)

    val q = model.normalize(sample(5))
    val table = model.adcTable(q)
    // ADC approximation vs exact cosine over 100 candidates: the top
    // exact neighbor must land in the ADC top-5
    val scored = sample.take(100).zipWithIndex.map { case (v, i) =>
      val vn = model.normalize(v)
      val (cell, code) = model.encode(vn)
      val adc = model.adcScore(table, model.coarseDot(q, cell), code)
      var exact = 0.0
      for (d <- q.indices) exact += q(d).toDouble * vn(d)
      (i, adc, exact)
    }
    val exactTop = scored.maxBy(_._3)._1
    val adcTop5 = scored.sortBy(-_._2).take(5).map(_._1).toSet
    assert(adcTop5.contains(exactTop), s"exact top $exactTop not in ADC top-5 $adcTop5")
    // ADC error is bounded: mean |adc - exact| small in normalized space
    val meanErr = scored.map(s => math.abs(s._2 - s._3)).sum / scored.length
    assert(meanErr < 0.15, s"mean ADC error $meanErr")
  }

  test("encoded corpus is m bytes per vector; topK recall vs brute force") {
    val q = corpus.filter($"id" % 40 === 0)
    val sample = corpus.as[(Long, Seq[Float])].collect().map(_._2.toArray)
    val model = IvfPq.train(sample, 8, 4, 16)
    val encoded = IvfPq.encode(corpus, "id", "v", model)
    assert(encoded.count() == 400)
    assert(encoded.select(max(length($"code"))).head.getInt(0) == 4) // m bytes

    val brute = Similarity.bruteForceTopK(corpus, q, "id", "v", 5)
      .select($"query_id", $"neighbor_id")
    // within-cluster neighbors are near-ties in cosine, so the ADC stage
    // needs a deep candidate pool for the exact refine to re-rank from
    val pq = IvfPq.topK(corpus, q, "id", "v", 5, nCentroids = 8, nProbe = 4, m = 4, ks = 16,
      refineFactor = 10)
      .select($"query_id", $"neighbor_id")
    val total = brute.count()
    val hits = pq.join(brute, Seq("query_id", "neighbor_id"), "left_semi").count()
    assert(hits.toDouble / total >= 0.6, s"recall ${hits.toDouble / total}")
    // output contract: exactly k rows per query after refine
    val perQ = pq.groupBy($"query_id").count().select(min($"count"), max($"count")).head
    assert(perQ.getLong(0) == 5 && perQ.getLong(1) == 5)
  }

  test("model serde: byte round-trip is exact; saveIndex/loadModel/searchIndex serve from disk") {
    val sample = corpus.as[(Long, Seq[Float])].collect().map(_._2.toArray)
    val model = IvfPq.train(sample, 8, 4, 16)
    // byte-level round trip
    val rt = IvfPq.deserializeModel(IvfPq.serializeModel(model))
    assert(rt.dim == model.dim && rt.m == model.m && rt.ks == model.ks)
    assert(rt.coarse.map(_.toSeq).toSeq == model.coarse.map(_.toSeq).toSeq)
    assert(rt.codebooks.map(_.map(_.toSeq).toSeq).toSeq == model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    // serialization is byte-stable (pure function of the model)
    assert(IvfPq.serializeModel(rt).toSeq == IvfPq.serializeModel(model).toSeq)
    // corrupt magic refuses
    val bad = IvfPq.serializeModel(model); bad(0) = (bad(0) ^ 0x55).toByte
    intercept[IllegalArgumentException](IvfPq.deserializeModel(bad))

    // full persisted-index serving path: fresh read of model + codes
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-idx").toString + "/index"
    IvfPq.saveIndex(corpus, "id", "v", model, dir)
    val q = corpus.filter($"id" % 40 === 0)
    val fromDisk = IvfPq.searchIndex(spark, dir, q, "id", "v", k = 20, nProbe = 8)
    val inMemory = IvfPq.searchEncoded(IvfPq.encode(corpus, "id", "v", model),
      q, "id", "v", model, k = 20, nProbe = 8)
    // identical answers: the persisted index IS the in-memory one
    assert(fromDisk.orderBy($"query_id", $"rank").collect().toSeq ==
      inMemory.orderBy($"query_id", $"rank").collect().toSeq)
  }

  test("chunked ADC broadcasts: many queries in small batches == one batch, bit-identical") {
    val sample = corpus.as[(Long, Seq[Float])].collect().map(_._2.toArray)
    val model = IvfPq.train(sample, 8, 4, 16)
    val encoded = IvfPq.encode(corpus, "id", "v", model).cache()
    try {
      val q = corpus.filter($"id" < 100) // 100 queries
      val one = IvfPq.searchEncoded(encoded, q, "id", "v", model, k = 5, nProbe = 4,
        maxQueriesPerBatch = Int.MaxValue)
      val chunked = IvfPq.searchEncoded(encoded, q, "id", "v", model, k = 5, nProbe = 4,
        maxQueriesPerBatch = 7) // 15 bounded broadcasts
      assert(chunked.orderBy($"query_id", $"rank").collect().toSeq ==
        one.orderBy($"query_id", $"rank").collect().toSeq)
    } finally encoded.unpersist()
  }

  test("searchEncoded on a persisted codes table (deployment shape)") {
    val sample = corpus.as[(Long, Seq[Float])].collect().map(_._2.toArray)
    val model = IvfPq.train(sample, 8, 4, 16)
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq").toString
    IvfPq.encode(corpus, "id", "v", model).write.mode("overwrite").parquet(tmp)
    val persisted = spark.read.parquet(tmp)
    val q = corpus.filter($"id" === 3L)
    val res = IvfPq.searchEncoded(persisted, q, "id", "v", model, k = 10, nProbe = 8)
    assert(res.count() == 10)
    // probing ALL cells makes ADC exhaustive: its top hit should be a
    // same-cluster neighbor (ids ≡ 3 mod 8)
    val top = res.orderBy($"rank").select($"neighbor_id").head.getLong(0)
    assert(top % 8 == 3, s"top ADC neighbor $top not in query's cluster")
  }
}
