package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries summary: published-bound properties (Misra & Gries 1982;
  * Agarwal et al., "Mergeable summaries", PODS 2012 §3.1), merge behavior,
  * serde round-trip, and the Spark UDAF end-to-end.
  */
class MgSketchSpec extends AnyFunSuite {

  /** Deterministic skewed stream: key i appears with Zipf-ish multiplicity
    * derived from splitmix64 (no wall clock, no RNG state).
    */
  private def skewedStream(n: Int, seed: Long = 7L): IndexedSeq[String] =
    (0 until n).map { i =>
      val h = Fnv.splitmix64(seed + i)
      val r = java.lang.Long.remainderUnsigned(h, 100L)
      if (r < 30) "hot0" else if (r < 50) "hot1" else if (r < 62) "hot2"
      else s"cold${java.lang.Long.remainderUnsigned(h >>> 8, 997L)}"
    }

  private def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("corrupt blob with entry count > k fails fast instead of looping") {
    val mg = MgSketch.empty(4)
    Seq("a", "b", "c", "d").foreach(mg.add(_))
    val blob = mg.serialize()
    // patch numEntries (offset 24 after magic/k/totalCount/delta) to k+1
    val bad = blob.clone()
    java.nio.ByteBuffer.wrap(bad, 24, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(5)
    val e = intercept[IllegalArgumentException](MgSketch.deserialize(bad))
    assert(e.getMessage.contains("exceeds k"))
  }

  test("exact mode: distinct keys <= k means zero error") {
    val mg = MgSketch.empty(16)
    val xs = (0 until 1000).map(i => s"k${i % 10}")
    xs.foreach(mg.add(_))
    assert(mg.errorBound == 0L)
    assert(mg.totalCount == 1000L)
    (0 until 10).foreach(i => assert(mg.estimate(s"k$i") == 100L))
    assert(mg.estimate("absent") == 0L)
  }

  test("published bound: true - delta <= est <= true, delta <= n/(k+1)") {
    val xs = skewedStream(50000)
    val exact = exactCounts(xs)
    for (k <- Seq(8, 32, 128)) {
      val mg = MgSketch.empty(k)
      xs.foreach(mg.add(_))
      assert(mg.numCounters <= k)
      assert(mg.errorBound <= mg.totalCount / (k + 1),
        s"k=$k delta=${mg.errorBound} > n/(k+1)")
      exact.foreach { case (key, cnt) =>
        val est = mg.estimate(key)
        assert(est <= cnt, s"k=$k overestimate on $key")
        assert(est >= cnt - mg.errorBound, s"k=$k bound violated on $key")
      }
      // presence guarantee: every key with freq > n/(k+1) is retained
      val thr = mg.totalCount / (k + 1)
      exact.filter(_._2 > thr).keys.foreach { key =>
        assert(mg.estimate(key) > 0, s"k=$k heavy key $key evicted")
      }
    }
  }

  test("merge: 8-way partitioned build preserves the bound, any order") {
    val xs = skewedStream(40000, seed = 99L)
    val exact = exactCounts(xs)
    val k = 24
    val parts = xs.grouped(5000).map { chunk =>
      val s = MgSketch.empty(k); chunk.foreach(s.add(_)); s.serialize()
    }.toVector
    // left fold and reversed fold (merge sets may differ; bounds must hold)
    for (order <- Seq(parts, parts.reverse)) {
      val m = order.map(MgSketch.deserialize)
        .reduceLeft((a, b) => a.mergeInPlace(b))
      assert(m.totalCount == 40000L)
      assert(m.numCounters <= k)
      assert(m.errorBound <= m.totalCount / (k + 1))
      exact.foreach { case (key, cnt) =>
        val est = m.estimate(key)
        assert(est <= cnt && est >= cnt - m.errorBound, s"merge bound on $key")
      }
    }
  }

  test("weighted add behaves as repeated add in the bound") {
    val mg = MgSketch.empty(4)
    mg.add("a", 100); mg.add("b", 50); mg.add("c", 10)
    mg.add("d", 5); mg.add("e", 3) // forces a compress
    assert(mg.totalCount == 168L)
    assert(mg.numCounters <= 4)
    assert(mg.estimate("a") >= 100L - mg.errorBound && mg.estimate("a") <= 100L)
  }

  test("topK ordering: count desc, key asc tiebreak") {
    val mg = MgSketch.empty(8)
    Seq.fill(5)("x").foreach(mg.add(_))
    Seq.fill(5)("a").foreach(mg.add(_))
    Seq.fill(9)("z").foreach(mg.add(_))
    assert(mg.topK(3).toSeq == Seq("z", "a", "x"))
    assert(mg.topK(99).length == 3)
  }

  test("serde round-trip is lossless and key-sorted deterministic") {
    val xs = skewedStream(20000, seed = 5L)
    val mg = MgSketch.empty(32)
    xs.foreach(mg.add(_))
    val blob = mg.serialize()
    val back = MgSketch.deserialize(blob)
    assert(back.k == 32 && back.totalCount == mg.totalCount &&
      back.errorBound == mg.errorBound)
    assert(back.entries.toSeq == mg.entries.toSeq)
    assert(java.util.Arrays.equals(back.serialize(), blob))
    // versioned magic: refuse foreign blobs
    intercept[IllegalArgumentException] {
      MgSketch.deserialize(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    }
  }

  test("spark UDAF: partitioned agg matches serial build guarantees (DF + SQL)") {
    val spark = graft.SparkTestSession.spark
    import org.apache.spark.sql.functions.col
    import graft.functions.{mg_sketch, mg_estimate, mg_error_bound, mg_total_count, mg_topk}
    val xs = skewedStream(30000, seed = 11L)
    val exact = exactCounts(xs)
    val df = spark.createDataset(xs)(org.apache.spark.sql.Encoders.STRING)
      .toDF("key").repartition(32)
    val blob = df.agg(mg_sketch(col("key"), 16)).head.getAs[Array[Byte]](0)
    val mg = MgSketch.deserialize(blob)
    assert(mg.totalCount == 30000L)
    assert(mg.errorBound <= 30000L / 17)
    Seq("hot0", "hot1", "hot2").foreach { key =>
      val cnt = exact(key)
      assert(mg.estimate(key) <= cnt && mg.estimate(key) >= cnt - mg.errorBound)
    }
    assert(mg.topK(3).toSet == Set("hot0", "hot1", "hot2"))
    // scalar surface over the blob
    import org.apache.spark.sql.functions.lit
    val row = spark.range(1).select(
      mg_estimate(lit(blob), lit("hot0")).as("e"),
      mg_error_bound(lit(blob)).as("d"),
      mg_total_count(lit(blob)).as("n"),
      mg_topk(lit(blob), 3).as("top")).head
    assert(row.getAs[Long]("e") == mg.estimate("hot0"))
    assert(row.getAs[Long]("d") == mg.errorBound)
    assert(row.getAs[Long]("n") == 30000L)
    assert(row.getAs[Seq[String]]("top").toSet == Set("hot0", "hot1", "hot2"))
    // SQL path + blob re-aggregation (mg_merge) across groups
    df.createOrReplaceTempView("mg_in")
    graft.functions.register(spark)
    val merged = spark.sql(
      """SELECT mg_estimate(m, 'hot0') AS e, mg_total_count(m) AS n FROM (
        |  SELECT mg_merge(b) AS m FROM (
        |    SELECT pmod(fnv1a_hash(key), 8) AS g, mg_sketch(key, 16) AS b
        |    FROM mg_in GROUP BY 1))""".stripMargin).head
    assert(merged.getAs[Long]("n") == 30000L)
    val cnt0 = exact("hot0")
    assert(merged.getAs[Long]("e") <= cnt0 && merged.getAs[Long]("e") >= cnt0 - 30000L / 17)
  }

  test("weighted UDAF: heavy-by-weight bound with W = total weight") {
    val spark = graft.SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import graft.functions.mg_sketch_weighted
    // key i in 0..99; weight = 1 + i%7; three hot keys get weight 500
    val df = spark.range(20000).select(
      concat(lit("k"), col("id") % 100).as("key"),
      when(col("id") % 100 < 3, lit(500L)).otherwise(lit(1L) + col("id") % 7).as("w"))
    val blob = df.agg(mg_sketch_weighted(col("key"), col("w"), 12))
      .head.getAs[Array[Byte]](0)
    val mg = MgSketch.deserialize(blob)
    val exact = df.groupBy("key").agg(sum("w").as("wt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = exact.values.sum
    assert(mg.totalCount == w)
    assert(mg.errorBound <= w / 13)
    Seq("k0", "k1", "k2").foreach { key => // 100k weight each, far above W/13
      val est = mg.estimate(key)
      assert(est > 0 && est <= exact(key) && est >= exact(key) - mg.errorBound)
    }
    assert(mg.topK(3).toSet == Set("k0", "k1", "k2"))

    // pure-SQL heavy-hitter read: explode(mg_entries(blob)) brackets exact
    val rows = spark.range(1)
      .select(explode(graft.functions.mg_entries(lit(blob))).as("e"))
      .select(col("e.key"), col("e.cnt_lo"), col("e.cnt_hi"))
      .collect()
    assert(rows.length == mg.numCounters)
    rows.foreach { r =>
      val (key, lo, hi) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(hi - lo == mg.errorBound)
      exact.get(key).foreach(t => assert(lo <= t && t <= hi))
    }
    // ordering: count desc, key asc
    assert(rows.map(_.getLong(1)).toSeq == rows.map(_.getLong(1)).sortBy(-_).toSeq)
  }

  test("numeric keys need no cast; blob identical to the string-key build") {
    val spark = graft.SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import graft.functions.mg_sketch
    val df = spark.range(10000).select((col("id") % 50).as("key"))
    val numBlob = df.agg(mg_sketch(col("key"), 64)).head.getAs[Array[Byte]](0)
    val strBlob = df.select(col("key").cast("string").as("key"))
      .agg(mg_sketch(col("key"), 64)).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(numBlob, strBlob),
      "numeric keys must canonicalize to the same blob as their string form")
    val mg = MgSketch.deserialize(numBlob)
    assert(mg.totalCount == 10000L && mg.estimate("7") == 200L)
  }

  test("binary keys count by raw bytes: invalid-UTF8 keys never collapse") {
    val spark = graft.SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import graft.functions.{mg_estimate, mg_sketch}
    import spark.implicits._
    // 0xFF and 0xFE both lossy-decode to U+FFFD; raw-byte counting must
    // keep them distinct (3 vs 2), and the probe must see the same bytes
    val rows = Seq.fill(3)(Array(0xff.toByte)) ++ Seq.fill(2)(Array(0xfe.toByte))
    val df = rows.toDF("key")
    val blob = df.agg(mg_sketch(col("key"), 8)).head.getAs[Array[Byte]](0)
    val mg = MgSketch.deserialize(blob)
    assert(mg.totalCount == 5L && mg.numCounters == 2)
    assert(mg.estimate(Array(0xff.toByte)) == 3L)
    assert(mg.estimate(Array(0xfe.toByte)) == 2L)
    // binary probe via the expression surface
    val got = spark.range(1)
      .select(mg_estimate(lit(blob), lit(Array(0xff.toByte))).as("e")).head
    assert(got.getAs[Long]("e") == 3L)
  }

  test("bottom-k sample: binary keys stay distinct; string/binary blob parity") {
    val spark = graft.SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import graft.functions.bottomk_sample
    import spark.implicits._
    val bin = (Seq.fill(4)(Array(0xff.toByte)) ++ Seq.fill(3)(Array(0xfe.toByte))).toDF("key")
    val blob = bin.agg(bottomk_sample(col("key"), 10)).head.getAs[Array[Byte]](0)
    val s = BkSample.deserialize(blob)
    assert(s.size == 2 && s.totalAdds == 7L) // two distinct binary keys
    // string inputs produce the same blob as their UTF-8 binary form
    val strDf = spark.range(100).select(col("id").cast("string").as("key"))
    val binDf = spark.range(100).select(encode(col("id").cast("string"), "UTF-8").as("key"))
    val a = strDf.agg(bottomk_sample(col("key"), 16)).head.getAs[Array[Byte]](0)
    val b = binDf.agg(bottomk_sample(col("key"), 16)).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }
}
