package graft.agg

import graft.SparkTestSession
import graft.core.{BloomSketch, CmsSketch, HllSketch}
import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end Spark tests: distributed sketch build == serial build,
  * probes, SQL registration, group-by sketches, accuracy vs exact
  * aggregates.
  */
class SketchAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def keysDf(n: Int, parts: Int) =
    spark.range(0, n, 1, parts).select($"id".cast("string").as("key"))

  test("bloom_sketch: distributed build == serial build, bit for bit, at any partitioning") {
    val serial = BloomSketch.empty(50000, 0.01f)
    (0 until 5000).foreach(i => serial.add(i.toString))
    for (parts <- Seq(1, 4, 13)) {
      val blob = keysDf(5000, parts).agg(bloom_sketch($"key", 50000, 0.01f)).head.getAs[Array[Byte]](0)
      assert(blob.toSeq == serial.serialize().toSeq, s"parts=$parts")
    }
  }

  test("bloom_sketch blob reproduces reference MD5 golden via Spark") {
    val blob = keysDf(5000, 4).agg(bloom_sketch($"key", 50000, 0.01f)).head.getAs[Array[Byte]](0)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(blob).map(x => f"${x & 0xff}%02x").mkString
    assert(md5 == "dff430adaf230fe3579d658c1fd3b457")
  }

  test("bloom_might_contain: zero false negatives, FPR within bound") {
    val blob = keysDf(50000, 4).agg(bloom_sketch($"key", 50000, 0.01f)).head.getAs[Array[Byte]](0)
    val known = keysDf(50000, 4).filter(bloom_might_contain(lit(blob), $"key")).count()
    assert(known == 50000) // no false negatives
    val unknown = spark.range(50000, 51000).select($"id".cast("string").as("key"))
      .filter(bloom_might_contain(lit(blob), $"key")).count()
    assert(unknown == 5) // the reference's exact FP golden (testsuite.c:186-202)
  }

  test("bloom scalar fns over blob: estimate/bits/fpr/hex round-trip") {
    val df = keysDf(5000, 4).agg(bloom_sketch($"key", 50000, 0.01f).as("sk"))
      .select(
        bloom_estimate_elements($"sk").as("est"),
        bloom_elements_added($"sk").as("added"),
        bloom_bits_set($"sk").as("bits"),
        bloom_from_hex(bloom_to_hex($"sk")).as("rt"),
        $"sk")
    val serial = BloomSketch.empty(50000, 0.01f)
    (0 until 5000).foreach(i => serial.add(i.toString))
    val row = df.head
    assert(row.getAs[Long]("est") == 4872)
    assert(row.getAs[Long]("added") == 5000)
    assert(row.getAs[Long]("bits") == serial.countSetBits)
    assert(row.getAs[Array[Byte]]("rt").toSeq == row.getAs[Array[Byte]]("sk").toSeq)
  }

  test("bloom_union/intersect/jaccard via SQL (reference set-op semantics)") {
    val y = keysDf(250, 2).agg(bloom_sketch($"key", 500, 0.01f)).head.getAs[Array[Byte]](0)
    val z = spark.range(100, 350, 1, 2).select($"id".cast("string").as("key"))
      .agg(bloom_sketch($"key", 500, 0.01f)).head.getAs[Array[Byte]](0)
    val yv = BloomSketch.deserialize(y)
    val zv = BloomSketch.deserialize(z)
    assert(yv.union(zv).estimateElements == 358)
    assert(yv.intersect(zv).estimateElements == 168)
    spark.range(1).select(lit(y).as("y"), lit(z).as("z")).createOrReplaceTempView("blobs")
    val r = spark.sql(
      """SELECT bloom_estimate_elements(bloom_union(y, z)) AS u,
        |       bloom_estimate_elements(bloom_intersect(y, z)) AS i,
        |       bloom_jaccard(y, z) AS j FROM blobs""".stripMargin).head
    assert(r.getAs[Long]("u") == 358)
    assert(r.getAs[Long]("i") == 168)
    // 150-key overlap of 350 total: bit-level jaccard ≈ 0.54 (cf. the
    // reference staircase mid-step range, testsuite.c:739-792)
    assert(r.getAs[Double]("j") > 0.45 && r.getAs[Double]("j") < 0.65)
  }

  test("group-by sketches: per-group bloom equals per-group serial build") {
    val df = spark.range(0, 3000, 1, 4)
      .select(($"id" % 3).cast("string").as("g"), $"id".cast("string").as("key"))
    val rows = df.groupBy($"g").agg(bloom_sketch($"key", 5000, 0.01f).as("sk")).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val g = r.getAs[String]("g").toInt
      val serial = BloomSketch.empty(5000, 0.01f)
      (0 until 3000).filter(_ % 3 == g).foreach(i => serial.add(i.toString))
      assert(r.getAs[Array[Byte]]("sk").toSeq == serial.serialize().toSeq, s"group $g")
    }
  }

  test("hll_sketch: estimate within 4-sigma of exact count distinct; invariant to partitioning") {
    val df = spark.range(0, 40000, 1, 8).select(($"id" % 17389).cast("string").as("key"))
    val blob1 = df.agg(hll_sketch($"key", 12)).head.getAs[Array[Byte]](0)
    val blob2 = df.repartition(3).agg(hll_sketch($"key", 12)).head.getAs[Array[Byte]](0)
    assert(blob1.toSeq == blob2.toSeq) // register-max monoid => partitioning-invariant
    val est = HllSketch.deserialize(blob1).estimate
    val exact = 17389.0
    assert(math.abs(est - exact) / exact <= 4 * 1.04 / math.sqrt(4096.0), s"est=$est")
  }

  test("cms_sketch: never underestimates exact group counts") {
    val df = spark.range(0, 30000, 1, 6).select(($"id" % 100).cast("string").as("key"))
    val blob = df.agg(cms_sketch($"key", 0.001, 0.01)).head.getAs[Array[Byte]](0)
    val cms = CmsSketch.deserialize(blob)
    assert(cms.totalCount == 30000)
    (0 until 100).foreach { k =>
      assert(cms.estimateCount(k.toString) >= 300, s"key $k")
      assert(cms.estimateCount(k.toString) <= 300 + (0.001 * 30000).toLong + 1)
    }
  }

  test("tdigest/kll quantiles vs exact percentile on lineitem prices") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_extendedprice".as("x"))
    val row = li.agg(
      tdigest_sketch($"x", 100).as("td"),
      kll_sketch($"x", 200).as("kll"),
      expr("percentile(x, array(0.1, 0.5, 0.99))").as("exact"),
      count(lit(1)).as("n")).head
    val exact = row.getSeq[Double](row.fieldIndex("exact"))
    val n = row.getAs[Long]("n")
    val xs = li.as[Double].collect().sorted
    def rankOf(v: Double): Double = xs.count(_ <= v).toDouble / n
    for (((q, e), i) <- Seq(0.1, 0.5, 0.99).zip(exact).zipWithIndex) {
      val td = graft.core.TDigestSketch.deserialize(row.getAs[Array[Byte]]("td")).quantile(q)
      val kq = graft.core.KllSketch.deserialize(row.getAs[Array[Byte]]("kll")).quantile(q)
      assert(math.abs(rankOf(td) - q) <= 0.02, s"tdigest q=$q got=$td exact=$e")
      assert(math.abs(rankOf(kq) - q) <= 0.02, s"kll q=$q got=$kq exact=$e")
    }
  }

  test("sql aggregate + probe functions end-to-end") {
    keysDf(1000, 4).createOrReplaceTempView("keys")
    val blobRow = spark.sql("SELECT bloom_sketch(key, 1000, CAST(0.01 AS DOUBLE)) AS sk FROM keys").head
    val blob = blobRow.getAs[Array[Byte]]("sk")
    assert(BloomSketch.deserialize(blob).elementsAdded == 1000)
    val r = spark.sql(
      "SELECT hll_estimate(hll_sketch(key, 12)) AS d, cms_query(cms_sketch(key, CAST(0.01 AS DOUBLE), CAST(0.01 AS DOUBLE)), '7') AS c FROM keys").head
    assert(math.abs(r.getAs[Long]("d") - 1000L) <= 60)
    assert(r.getAs[Long]("c") >= 1)
  }

  test("counting bloom agg: additive merge, cbf_count probe") {
    val df = spark.range(0, 5000, 1, 5).select(($"id" % 500).cast("string").as("key"))
    val blob = df.agg(counting_bloom_sketch($"key", 2000, 0.01f)).head.getAs[Array[Byte]](0)
    val cb = graft.core.CountingBloomSketch.deserialize(blob)
    assert(cb.elementsAdded == 5000)
    (0 until 500).foreach(k => assert(cb.estimateCount(k.toString) >= 10))
    val probed = spark.range(0, 10).select($"id".cast("string").as("k"))
      .select(cbf_count(lit(blob), $"k").as("c")).as[Int].collect()
    probed.foreach(c => assert(c >= 10))
  }

  test("fnv1a_hash expression matches core golden") {
    val r = spark.range(1).select(fnv1a_hash(lit("foo"), 0).as("h")).head
    assert(r.getAs[Long]("h") == java.lang.Long.parseUnsignedLong("15902901984413996407"))
  }

  test("mg_sketch_weighted: non-positive weights are skipped, never abort") {
    import spark.implicits._
    val df = Seq(("a", 5L), ("a", -3L), ("b", 0L), ("b", 2L), ("c", -1L))
      .toDF("k", "w")
    val blob = df.agg(mg_sketch_weighted(col("k"), col("w"), 8))
      .head.getAs[Array[Byte]](0)
    val mg = graft.core.MgSketch.deserialize(blob)
    // only the positive-weight rows count: a=5, b=2, c absent
    assert(mg.totalCount == 7L)
    assert(mg.estimate("a") == 5L && mg.estimate("b") == 2L && mg.estimate("c") == 0L)
  }
}
