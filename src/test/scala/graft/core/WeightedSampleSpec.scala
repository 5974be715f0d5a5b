package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Efraimidis-Spirakis A-Res weighted distinct sample: reference-local
  * bottom-k agreement, exact-monoid merge determinism, max-weight
  * duplicate semantics, weight-sensitive inclusion, serde, Spark UDAF.
  */
class WeightedSampleSpec extends AnyFunSuite {

  private def keys(n: Int): Seq[String] = (0 until n).map(i => s"key$i")

  test("sample equals local bottom-k of the A-Res priorities") {
    val ws = WeightedSample.empty(20)
    val items = keys(500).zipWithIndex.map { case (k, i) => (k, 1L + (i % 13)) }
    items.foreach { case (k, w) => ws.add(k, w) }
    val expect = items
      .sortBy { case (k, w) => (WeightedSample.testPriority(k, w), k) }
      .take(20).map(_._1)
    assert(ws.values.toSeq == expect)
    assert(ws.totalAdds == 500L)
  }

  test("priority-colliding weights: max weight wins regardless of add order") {
    // adjacent huge weights whose -ln(u)/w priorities round to the SAME
    // double (relative gap < 2^-53) — the stored weight must still be
    // the max observed, not whichever arrived first
    val key = "collide"
    // above ~9.2e15 the relative weight gap 1/w drops under the double
    // ulp and adjacent priorities collide within a few steps; the scan is
    // bounded so a contract change fails fast instead of hanging
    val w0 = Iterator.iterate(9200000000000000L)(_ + 1).take(5000000).find(w =>
      WeightedSample.testPriority(key, w) == WeightedSample.testPriority(key, w + 1))
      .getOrElse(fail("no adjacent-weight priority collision found in 5M steps"))
    val (lo, hi) = (w0, w0 + 1)
    assert(WeightedSample.testPriority(key, lo) == WeightedSample.testPriority(key, hi))
    val a = WeightedSample.empty(4); a.add(key, lo); a.add(key, hi)
    val b = WeightedSample.empty(4); b.add(key, hi); b.add(key, lo)
    assert(a.entries.toSeq == Seq((key, hi)))
    assert(b.entries.toSeq == Seq((key, hi)))
    assert(java.util.Arrays.equals(a.serialize(), b.serialize()))
    // same collision through the merge path
    val p1 = WeightedSample.empty(4); p1.add(key, lo)
    val p2 = WeightedSample.empty(4); p2.add(key, hi)
    val m1 = WeightedSample.deserialize(p1.serialize()).mergeInPlace(WeightedSample.deserialize(p2.serialize()))
    val m2 = WeightedSample.deserialize(p2.serialize()).mergeInPlace(WeightedSample.deserialize(p1.serialize()))
    assert(m1.entries.toSeq == Seq((key, hi)) && m2.entries.toSeq == Seq((key, hi)))
  }

  test("java serialization round-trip: index survives and keeps deduping") {
    val ws = WeightedSample.empty(8)
    keys(20).foreach(k => ws.add(k, 5L))
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(ws); oos.close()
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
    val back = ois.readObject().asInstanceOf[WeightedSample]
    assert(java.util.Arrays.equals(back.serialize(), ws.serialize()))
    // the content-keyed index still dedups on the revived object
    back.values.foreach(k => back.add(k, 50L))
    assert(back.size == ws.size) // no duplicate entries crept in
    assert(back.entries.forall(_._2 == 50L)) // weights improved in place
  }

  test("merge: any partition/order yields the bitwise-identical blob") {
    val items = keys(2000).zipWithIndex.map { case (k, i) => (k, 1L + (i * 7) % 97) }
    val serial = WeightedSample.empty(64)
    items.foreach { case (k, w) => serial.add(k, w) }
    val golden = serial.serialize()
    for (chunkSize <- Seq(100, 333, 999)) {
      val parts = items.grouped(chunkSize).map { c =>
        val p = WeightedSample.empty(64); c.foreach { case (k, w) => p.add(k, w) }; p.serialize()
      }.toVector
      for (order <- Seq(parts, parts.reverse)) {
        val merged = order.map(WeightedSample.deserialize)
          .reduceLeft((a, b) => a.mergeInPlace(b))
        assert(java.util.Arrays.equals(merged.serialize(), golden),
          s"chunk=$chunkSize order mismatch")
      }
    }
  }

  test("duplicate keys take the MAX weight; non-positive weights skipped") {
    val a = WeightedSample.empty(8)
    a.add("x", 3L); a.add("x", 7L); a.add("x", 5L)
    a.add("y", -2L); a.add("z", 0L)
    val b = WeightedSample.empty(8)
    b.add("x", 7L)
    assert(a.values.toSeq == b.values.toSeq)
    assert(a.entries.toMap == Map("x" -> 7L)) // y/z never entered
    assert(a.totalAdds == 5L && b.totalAdds == 1L)
    // max-weight is merge-order invariant too
    val c = WeightedSample.empty(8); c.add("x", 3L)
    val d = WeightedSample.empty(8); d.add("x", 7L)
    c.mergeInPlace(d)
    assert(c.entries.toMap == Map("x" -> 7L))
  }

  test("inclusion scales with weight: heavy keys dominate the sample") {
    val ws = WeightedSample.empty(50)
    keys(500).foreach(k => ws.add(s"heavy-$k", 100L))
    keys(500).foreach(k => ws.add(s"light-$k", 1L))
    val got = ws.values
    val heavy = got.count(_.startsWith("heavy-"))
    // E[heavy] ≈ 50·(100·500)/(100·500+500) ≈ 49.5; deterministic given
    // the hash — wide margin so the generator can never flake
    assert(heavy >= 40, s"only $heavy of 50 sampled keys are heavy")
    // a single overwhelming key is effectively certain to be present
    ws.add("whale", 1000000000L)
    assert(ws.values.contains("whale"))
  }

  test("serde round-trip and foreign-blob refusal") {
    val ws = WeightedSample.empty(16)
    keys(200).zipWithIndex.foreach { case (k, i) => ws.add(k, 1L + i % 9) }
    val blob = ws.serialize()
    val back = WeightedSample.deserialize(blob)
    assert(back.k == 16 && back.totalAdds == 200L)
    assert(back.values.toSeq == ws.values.toSeq)
    assert(back.entries.toSeq == ws.entries.toSeq)
    assert(java.util.Arrays.equals(back.serialize(), blob))
    intercept[IllegalArgumentException] {
      WeightedSample.deserialize(MgSketch.empty(4).serialize())
    }
  }

  test("spark UDAF: partitioning-invariant blobs, SQL surface, ws_entries") {
    val spark = graft.SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import graft.functions.{weighted_sample, ws_entries, ws_values}
    val df = spark.range(3000).select(
      concat(lit("d"), col("id") % 600).as("key"),
      (lit(1L) + col("id") % 50).as("w"))
    val a = df.agg(weighted_sample(col("key"), col("w"), 32)).head.getAs[Array[Byte]](0)
    val b = df.repartition(17, col("key"))
      .agg(weighted_sample(col("key"), col("w"), 32)).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
    val ws = WeightedSample.deserialize(a)
    assert(ws.size == 32 && ws.totalAdds == 3000L)
    // scalar surface
    val row = spark.range(1).select(
      size(ws_values(lit(a))).as("n"),
      ws_entries(lit(a)).getItem(0).getField("weight").as("w0")).head
    assert(row.getAs[Int]("n") == 32)
    assert(row.getAs[Long]("w0") >= 1L)
    // SQL path incl. two-level ws_merge re-aggregation
    graft.functions.register(spark)
    df.createOrReplaceTempView("ws_in")
    val merged = spark.sql(
      """SELECT ws_values(ws_merge(b)) AS v FROM (
        |  SELECT pmod(fnv1a_hash(key), 8) AS g, weighted_sample(key, w, 32) AS b
        |  FROM ws_in GROUP BY 1)""".stripMargin).head.getSeq[String](0)
    assert(merged == WeightedSample.deserialize(a).values.toSeq)
  }
}
