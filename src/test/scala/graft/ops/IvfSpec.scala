package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("ivf top-k: deterministic, recall rises with nProbe, full probe = exact") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 25 === 0)
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id")).cache()
    val total = brute.count
    def recall(nProbe: Int): Double = {
      val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5, 8, nProbe)
        .select(col("query_id"), col("neighbor_id"))
      ivf.join(brute, Seq("query_id", "neighbor_id"), "left_semi").count.toDouble / total
    }
    val r2 = recall(2)
    val r8 = recall(8) // probing ALL cells must reproduce brute-force exactly
    assert(r8 == 1.0, s"full-probe recall=$r8")
    assert(r2 <= r8)
    // determinism: same parameters -> same result set
    val a = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5, 8, 3)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5, 8, 3)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    brute.unpersist()
  }

  test("ngram pairs: stop-shingle cap only prunes, never adds pairs") {
    import spark.implicits._
    val docs = (0 until 40).map(i => (i.toLong, s"common header boilerplate text here unique-$i-body with words $i end"))
      .toDF("doc_id", "text")
    val all = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 8, 2, 1, 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 8, 2, 1, 4, maxShingleFreq = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(all), s"capped added pairs: ${capped -- all}")
    assert(capped.size < all.size) // the shared boilerplate pairs got pruned
  }
}
