package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** docs: 3 clusters of near-dups + unrelated singletons. */
  private lazy val docs = {
    val base1 = "the quick brown fox jumps over the lazy dog while rain falls on the quiet hill and birds sing"
    val base2 = "machine learning systems require large curated datasets with careful deduplication and quality filtering stages"
    val base3 = "el rapido zorro marron salta sobre el perro perezoso mientras llueve en la colina tranquila"
    Seq(
      (1L, base1), (2L, base1), // exact dup
      (3L, base1.replace("rain", "snow")), // near dup of 1
      (4L, base2), (5L, base2.replace("careful", "rigorous")), // near dup pair
      (6L, base3),
      (7L, "completely unrelated short text about cooking pasta with tomatoes basil and olive oil for dinner tonight"),
      (8L, "another document on astronomy telescopes observing distant galaxies and the expansion of the universe")
    ).toDF("doc_id", "text")
  }

  test("exact dedup: keeps min id per content, drops exact dups") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text").select($"doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L, 6L, 7L, 8L))
    val groups = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(groups.find(_.getAs[Long]("keep_id") == 1L).get.getAs[Long]("dup_count") == 2L)
  }

  test("minhash LSH finds near-dup pairs, not unrelated ones") {
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text",
      numHashes = 128, bands = 32, shingleWidth = 2, threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"exact dup missed: $pairs")
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)), s"near dup missed: $pairs")
    assert(pairs.contains((4L, 5L)), s"near dup missed: $pairs")
    assert(!pairs.exists(p => p._1 >= 6L), s"false pair among unrelated: $pairs")
  }

  test("simhash finds near-dups within hamming distance") {
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxDistance = 6)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((7L, 8L)))
    // exact dups must have hamming 0
    val d12 = Dedup.simHashPairs(docs, "doc_id", "text", maxDistance = 0)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(d12.contains((1L, 2L)))
  }

  test("ngram jaccard pairs match a brute-force oracle") {
    val width = 12; val step = 3
    def shingles(t: String): Set[String] =
      (1 to math.max(t.length - (width - 1), 1) by step).map(p => t.slice(p - 1, p - 1 + width)).toSet
    val rows = docs.as[(Long, String)].collect()
    val expected = (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      sa = shingles(ta); sb = shingles(tb)
      common = (sa & sb).size; uni = (sa | sb).size
      if common * 2 >= uni
    } yield (ia, ib, common.toLong, uni.toLong)).toSet
    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", width, step, 1, 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("brute-force cosine top-k matches a local oracle on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    val got = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // local oracle
    val all = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val qs = all.filter(_._1 < 5)
    qs.foreach { case (qid, qv) =>
      val expect = all.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSeq
      assert(got(qid) == expect, s"query $qid: got ${got(qid)} expect $expect")
    }
  }

  test("lsh top-k: same schema, sane recall vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5, planes = 6, tables = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.25, s"recall=$recall") // 8 OR-ed tables of 64 buckets
    assert(approx.nonEmpty)
    // id-only candidate exchange: the dedup aggregate (the only Aggregate
    // in the plan) must carry ids only — vectors re-join AFTER the dedup,
    // never ride the ×tables bucket explode or the dedup shuffle
    val agg = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5)
      .queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
    assert(agg.nonEmpty)
    agg.foreach { a =>
      val outs = a.output.map(_.name).toSet
      assert(outs.subsetOf(Set("query_id", "neighbor_id")),
        s"candidate dedup carries non-id columns: $outs")
    }
  }

  test("quantized corpus: ANN reads struct(scale,q) directly; exchange still ids-only") {
    import graft.functions.vec_quantize_int8
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val quant = emb.select($"vec_id", vec_quantize_int8($"embedding").as("embedding"))
    val queries = quant.filter($"vec_id" < 20)
    // the quantized column feeds the search with NO caller-side dequantize;
    // recall vs the float-path brute-force oracle stays usable (the
    // documented <=2% cosine fidelity loses only borderline pairs)
    val exact = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 20),
        "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(quant, queries, "vec_id", "embedding", 5,
        planes = 6, tables = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.25, s"quantized recall=$recall")
    // the id-only candidate-exchange discipline survives quantization:
    // dequantize runs INSIDE bucketing/scoring, so the dedup aggregate
    // still carries ids only and the int8 bytes never ride the shuffle
    val agg = Similarity.lshTopK(quant, queries, "vec_id", "embedding", 5)
      .queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
    assert(agg.nonEmpty)
    agg.foreach { a =>
      val outs = a.output.map(_.name).toSet
      assert(outs.subsetOf(Set("query_id", "neighbor_id")),
        s"candidate dedup carries non-id columns: $outs")
    }
    // embeddingNearDupPairs accepts the quantized corpus too and agrees
    // with the float path on the pairs it reports (same buckets, scores
    // within the quantization fidelity)
    val pf = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", threshold = 0.95)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val pq = Dedup.embeddingNearDupPairs(quant, "vec_id", "embedding", threshold = 0.95)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // borderline pairs may differ; the overlap must dominate both sides
    if (pf.nonEmpty) {
      val agree = (pf & pq).size.toDouble
      assert(agree / pf.size >= 0.8 && (pq.isEmpty || agree / pq.size >= 0.8),
        s"float ${pf.size} vs quant ${pq.size}, agree $agree")
    }
  }

  test("snapshotOverlap: exact below nominalK; ~1.6% band above it") {
    // exact mode: fewer distinct contents than nominalK -> KMV keeps
    // every hash, the estimates ARE the true counts
    val snapA = (0 until 1000).map(i => (i.toLong, s"document body number $i")).toDF("id", "text")
    val snapB = (500 until 1500).map(i => (i.toLong, s"document body number $i")).toDF("id", "text")
    val r = Dedup.snapshotOverlap(snapA, snapB, "text").collect()(0)
    assert(r.getAs[Long]("est_a") == 1000L)
    assert(r.getAs[Long]("est_b") == 1000L)
    assert(r.getAs[Long]("est_intersect") == 500L)
    assert(r.getAs[Long]("est_union") == 1500L)
    assert(math.abs(r.getAs[Double]("jaccard") - 500.0 / 1500.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("dup_frac_b") - 0.5) < 1e-12)
    // duplicate ROWS don't inflate the distinct-content estimates
    val withDups = snapB.unionAll(snapB)
    val r2 = Dedup.snapshotOverlap(snapA, withDups, "text").collect()(0)
    assert(r2.getAs[Long]("est_b") == 1000L)
    assert(math.abs(r2.getAs[Double]("dup_frac_b") - 0.5) < 1e-12)
    // estimation mode: 60k distinct per side, 50% overlap — the gate
    // number lands inside a few standard errors of truth
    val bigA = spark.range(60000).select($"id", concat(lit("page-"), $"id").as("text"))
    val bigB = spark.range(30000, 90000).select($"id", concat(lit("page-"), $"id").as("text"))
    val rb = Dedup.snapshotOverlap(bigA.toDF, bigB.toDF, "text").collect()(0)
    assert(math.abs(rb.getAs[Double]("dup_frac_b") - 0.5) < 0.08,
      s"dup_frac_b=${rb.getAs[Double]("dup_frac_b")}")
    assert(math.abs(rb.getAs[Double]("jaccard") - 1.0 / 3.0) < 0.05)
  }

  test("token counting matches a local oracle incl. edge cases") {
    val df = Seq((1L, "a b  c"), (2L, ""), (3L, "   "), (4L, "single"), (5L, "x\ty \n z")).toDF("id", "t")
    val got = df.select($"id", TextOps.tokenCount($"t").as("n")).as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 3))
  }

  test("language id picks the stopword-dominant language") {
    val df = Seq(
      (1L, "the cat and the dog of the house is that good for all"),
      (2L, "der hund und die katze ist nicht mit dem ball von haus zu haus"),
      (3L, "el perro que corre por la casa con los ninos para una fiesta"),
      (4L, "zzz qqq www")).toDF("id", "t")
    val got = df.select($"id", TextOps.langId($"t").as("l")).as[(Long, String)].collect().toMap
    assert(got(1L) == "en"); assert(got(2L) == "de"); assert(got(3L) == "es"); assert(got(4L) == "und")
  }

  test("quality stats + score behave on clean vs junk text") {
    val df = Seq(
      (1L, "this is a perfectly normal sentence with reasonable words and structure for a test"),
      (2L, "!!! ??? *** $$$ %%% ### @@@ &&& ^^^ ((()))"),
      (3L, "12345 67890 11111 22222 33333 44444")).toDF("id", "t")
    val got = df.select($"id", TextOps.qualityScore($"t").as("q")).as[(Long, Double)].collect().toMap
    assert(got(1L) > 0.8, s"clean text scored ${got(1L)}")
    assert(got(2L) < 0.4, s"punct junk scored ${got(2L)}")
    assert(got(3L) < got(1L), s"digit junk scored ${got(3L)}")
  }

  test("multimodal: feature extraction is deterministic with real plumbing; frame sampling caps") {
    val media = Multimodal.syntheticMedia(spark, 60, 4)
    val f1 = Multimodal.extractFeatures(media, 32).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 60, 7), 32).collect().sortBy(_.media_id)
    assert(f1.length == 60)
    assert(f1.forall(r => r.decode_ok && r.feature_dim == 32 && r.features.length == 32))
    f1.zip(f2).foreach { case (a, b) => assert(a.features.toSeq == b.features.toSeq, s"media ${a.media_id}") }
    val frames = Multimodal.sampleFrames(media, everyMs = 1000, dim = 8)
    assert(frames.count() > 0)
    val perVid = frames.groupBy($"media_id").count().agg(max($"count")).head.getLong(0)
    assert(perVid <= 64)
  }
}
