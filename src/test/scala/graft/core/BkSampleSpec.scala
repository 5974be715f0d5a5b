package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Bottom-k-by-hash distinct sample: bitwise parallelism invariance,
  * distinct-uniformity, duplication independence, serde, Spark UDAF.
  */
class BkSampleSpec extends AnyFunSuite {

  private def keys(n: Int): IndexedSeq[String] = (0 until n).map(i => s"key$i")

  test("fills to min(k, distinct); duplicates never change the sample") {
    val s = BkSample.empty(50)
    keys(20).foreach(s.add)
    assert(s.size == 20)
    val before = s.values.toSeq
    keys(20).foreach(s.add) // duplicates
    keys(20).reverse.foreach(s.add)
    assert(s.values.toSeq == before)
    assert(s.totalAdds == 60) // sample unchanged, fold count honest
  }

  test("bitwise identical under any partitioning and merge order") {
    val xs = keys(5000)
    val serial = BkSample.empty(100)
    xs.foreach(serial.add)
    val golden = serial.serialize()
    for (chunks <- Seq(7, 64)) {
      val parts = xs.grouped(xs.size / chunks + 1).map { c =>
        val p = BkSample.empty(100); c.foreach(p.add); p.serialize()
      }.toVector
      for (order <- Seq(parts, parts.reverse)) {
        val merged = order.map(BkSample.deserialize)
          .reduceLeft((a, b) => a.mergeInPlace(b))
        assert(java.util.Arrays.equals(merged.serialize(), golden),
          s"chunks=$chunks not bitwise invariant")
      }
    }
  }

  test("uniform over distinct keys: sampling fraction tracks k/distinct") {
    // 10k distinct; k=1000 -> every key in with prob ~0.1 by hash rank.
    // Check the sampled set is exactly the k smallest priorities (the
    // defining property) and spot-check a decile spread over key index.
    val xs = keys(10000)
    val s = BkSample.empty(1000)
    xs.foreach(s.add)
    val sampled = s.values.toSet
    assert(sampled.size == 1000)
    val expected = xs.sortBy(k => (BkSample.testPriority(k), k))(
      Ordering.Tuple2(Ordering.fromLessThan[Long](java.lang.Long.compareUnsigned(_, _) < 0), Ordering.String))
      .take(1000).toSet
    assert(sampled == expected)
    // crude uniformity: each 1000-key index block contributes 100 +- 50
    (0 until 10).foreach { b =>
      val inBlock = (b * 1000 until (b + 1) * 1000).count(i => sampled(s"key$i"))
      assert(inBlock > 50 && inBlock < 150, s"block $b skewed: $inBlock")
    }
  }

  test("serde round-trip and foreign-blob refusal") {
    val s = BkSample.empty(32)
    keys(100).foreach(s.add)
    val blob = s.serialize()
    val back = BkSample.deserialize(blob)
    assert(back.k == 32 && back.values.toSeq == s.values.toSeq)
    assert(java.util.Arrays.equals(back.serialize(), blob))
    intercept[IllegalArgumentException] { BkSample.deserialize(MgSketch.empty(4).serialize()) }
  }

  test("spark UDAF: per-group samples, bitwise invariant across partitionings; SQL bk_merge") {
    val spark = graft.SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import graft.functions.{bottomk_sample, bk_values}
    val df = spark.range(3000).select(
      (col("id") % 3).cast("string").as("g"), concat(lit("doc"), col("id")).as("k"))
    def blobs(parts: Int): Map[String, Array[Byte]] =
      df.repartition(parts).groupBy("g").agg(bottomk_sample(col("k"), 25).as("b"))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val a = blobs(2)
    val b = blobs(32)
    assert(a.keySet == Set("0", "1", "2"))
    a.foreach { case (g, blob) => assert(java.util.Arrays.equals(blob, b(g))) }
    val vals = spark.range(1).select(bk_values(lit(a("0"))).as("v")).head.getSeq[String](0)
    assert(vals.length == 25 && vals.forall(_.startsWith("doc")))
    // every sampled key really is in group 0
    assert(vals.forall(v => v.stripPrefix("doc").toLong % 3 == 0))
    // SQL: two half-builds re-merged == direct build, bitwise
    df.createOrReplaceTempView("bk_in")
    graft.functions.register(spark)
    val remerged = spark.sql(
      """SELECT g, bk_merge(b) AS b FROM (
        |  SELECT g, pmod(fnv1a_hash(k), 4) AS h, bottomk_sample(k, 25) AS b
        |  FROM bk_in GROUP BY 1, 2) GROUP BY g""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    remerged.foreach { case (g, blob) => assert(java.util.Arrays.equals(blob, a(g))) }
  }
}
