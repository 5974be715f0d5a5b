package graft.expr

import graft.SparkTestSession
import graft.core.{BloomSketch, Poly31BloomHasher}
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 optimization equivalence nets: every fast path must be
  * bit-identical to the composition / decoded path it replaced.
  */
class FastPathSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- BloomSketch.containsSerialized == deserialize().contains ----

  test("containsSerialized matches the decoded probe (default hasher)") {
    val sk = BloomSketch.empty(1000, 0.01f)
    (0 until 500).foreach(i => sk.add(s"key$i"))
    val blob = sk.serialize()
    val dec = BloomSketch.deserialize(blob)
    (0 until 1500).foreach { i =>
      val k = s"key$i".getBytes("UTF-8")
      assert(BloomSketch.containsSerialized(blob, k) == dec.contains(k), s"key$i")
    }
  }

  test("containsSerialized matches the decoded probe (tagged custom hasher)") {
    val sk = BloomSketch.empty(500, 0.02f, Poly31BloomHasher)
    (0 until 200).foreach(i => sk.add(s"k$i"))
    val blob = sk.serialize()
    val dec = BloomSketch.deserialize(blob)
    (0 until 600).foreach { i =>
      val k = s"k$i".getBytes("UTF-8")
      assert(BloomSketch.containsSerialized(blob, k) == dec.contains(k), s"k$i")
    }
  }

  test("bloom_might_contain over a per-row blob COLUMN (join shape) equals the literal path") {
    import graft.functions._
    // two shard blobs, keys routed by parity — the ShardedBloom.semiJoin
    // shape hands the expression a fresh blob copy every row, exercising
    // the direct serialized probe branch
    val even = BloomSketch.empty(100, 0.01f)
    val odd = BloomSketch.empty(100, 0.01f)
    (0 until 100 by 2).foreach(i => even.add(s"id$i"))
    (1 until 100 by 2).foreach(i => odd.add(s"id$i"))
    val parts = Seq((0, even.serialize()), (1, odd.serialize())).toDF("par", "blob")
    val probes = spark.range(200).select(col("id"),
      concat(lit("id"), col("id")).as("k"), (col("id") % 2).cast("int").as("par"))
    val got = probes.join(parts, "par")
      .filter(bloom_might_contain(col("blob"), col("k")))
      .select("id").as[Long].collect().toSet
    val wantEven = spark.range(200).select(col("id"), concat(lit("id"), col("id")).as("k"))
      .filter(col("id") % 2 === 0 && bloom_might_contain(lit(even.serialize()), col("k")))
      .select("id").as[Long].collect().toSet
    val wantOdd = spark.range(200).select(col("id"), concat(lit("id"), col("id")).as("k"))
      .filter(col("id") % 2 === 1 && bloom_might_contain(lit(odd.serialize()), col("k")))
      .select("id").as[Long].collect().toSet
    assert(got == (wantEven ++ wantOdd))
    assert(got.intersect((0L until 100L).toSet) == (0L until 100L).toSet,
      "zero false negatives through the column path")
  }

  // ---- HyperplaneBucket == the former built-in composition ----

  /** The pre-round-6 hyperplane bucket, verbatim, as the equivalence
    * reference (chained xxhash64 sign per (seed, plane, dim) element).
    */
  private def oldBucket(v: org.apache.spark.sql.Column, planes: Int, seed: Long) = {
    def signOf(plane: Int, dimIdx: org.apache.spark.sql.Column) =
      when(pmod(xxhash64(lit(seed), lit(plane), dimIdx), lit(2)) === 0, lit(1.0))
        .otherwise(lit(-1.0))
    val bits = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x.cast("double") * signOf(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  test("fused hyperplane bucket is bit-identical to the old composition") {
    for (planes <- Seq(1, 4, 8); seed <- Seq(42L, 7919L)) {
      val vecs = spark.range(300).select(col("id"),
        transform(sequence(lit(0), lit(63)),
          i => (sin(col("id") * i.cast("double") + lit(seed.toDouble)) * 3.0).cast("float"))
          .as("v"))
      val rows = vecs.select(col("id"),
        Similarity.hyperplaneBucket(col("v"), planes, seed).as("fused"),
        oldBucket(col("v"), planes, seed).as("old")).collect()
      rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
        s"planes=$planes seed=$seed id=${r.getLong(0)}"))
    }
  }

  test("fused hyperplane bucket corner cases match the old composition") {
    val df = Seq(
      (1L, Some(Seq(Some(1.0f), Some(-2.0f), Some(0.5f)))),
      (2L, Some(Seq.empty[Option[Float]])), // empty -> bucket 0
      (3L, Some(Seq(Some(1.0f), None, Some(2.0f)))), // null element -> bits clear
      (4L, None), // null vector -> bucket 0
      (5L, Some(Seq(Some(Float.NaN), Some(1.0f)))) // NaN dot -> bits SET (Spark orders NaN above every double)
    ).toDF("id", "v")
    val rows = df.select(col("id"),
      Similarity.hyperplaneBucket(col("v"), 6, 42L).as("fused"),
      oldBucket(col("v"), 6, 42L).as("old")).collect()
    rows.foreach { r =>
      val old = if (r.isNullAt(2)) 0L else r.getLong(2)
      assert(r.getLong(1) == old, s"id=${r.getLong(0)}")
    }
  }

  // ---- t-digest flush index sort == the boxed sortBy it replaced ----

  test("TDigestSketch.sortedIndices is the stable sortBy order, bitwise") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 50) {
      val n = 1 + rnd.nextInt(700)
      val keys = Array.fill(n) {
        rnd.nextInt(6) match {
          case 0 => 0.0
          case 1 => -0.0 // Double.compare orders -0.0 < 0.0; ties must match
          case 2 => rnd.nextInt(5).toDouble // heavy ties
          case _ => rnd.nextDouble() * 1000 - 500
        }
      }
      val want = Array.range(0, n).sortBy(keys(_)).toSeq
      val got = graft.core.TDigestSketch.sortedIndices(keys, n).toSeq
      assert(got == want, s"trial $trial n=$n")
    }
  }

  test("t-digest quantile sanity net over a large build (order equivalence is the unit test above)") {
    // the bit-identity claim is carried by the sortedIndices order test
    // above; this is an end-to-end accuracy net over a 200k-point build
    val sk = graft.core.TDigestSketch.empty(100.0)
    val rnd = new scala.util.Random(7)
    (0 until 200000).foreach(_ => sk.add(rnd.nextGaussian() * 10 + 50))
    val qs = Seq(0.01, 0.1, 0.5, 0.9, 0.99).map(sk.quantile)
    // rank sanity: quantiles monotone and near the normal-distribution values
    assert(qs == qs.sorted)
    assert(math.abs(qs(2) - 50.0) < 0.5)
    assert(math.abs(qs(1) - (50 - 12.8)) < 1.0 && math.abs(qs(3) - (50 + 12.8)) < 1.0)
  }

  // ---- pre-quantized dot == quantizedDot ----

  test("quantizeForDot + quantizedDotPre equals quantizedDot bitwise") {
    val df = spark.range(200).select(col("id"),
      transform(sequence(lit(0), lit(31)),
        i => (cos(col("id") + i.cast("double")) * 2.5).cast("float")).as("a"),
      transform(sequence(lit(0), lit(31)),
        i => (sin(col("id") * 2 + i.cast("double")) * 1.5).cast("float")).as("b"))
    val rows = df.select(
      Similarity.quantizedDot(col("a"), col("b")).as("direct"),
      Similarity.quantizedDotPre(
        Similarity.quantizeForDot(col("a")), Similarity.quantizeForDot(col("b"))).as("pre"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
