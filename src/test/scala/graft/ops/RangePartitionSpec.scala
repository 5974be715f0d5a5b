package graft.ops

import graft.core.{Fnv, KllSketch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KLL-driven equi-depth partitioning: balance within the published rank
  * error on uniform AND heavily skewed value distributions, heavy-atom
  * collapse, codegen'd bucket assignment, occupancy report.
  */
class RangePartitionSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  test("bucket assignment: binary-search semantics at the cut points") {
    val b = graft.expr.RangeBucket(
      org.apache.spark.sql.catalyst.expressions.Literal(0.0), Array(10.0, 20.0, 30.0))
    assert(b.probe(5.0) == 0)
    assert(b.probe(10.0) == 1) // boundary value closes the bucket below
    assert(b.probe(15.0) == 1)
    assert(b.probe(30.0) == 3)
    assert(b.probe(99.0) == 3)
  }

  test("uniform values: all buckets within 2x the published rank error") {
    import spark.implicits._
    val n = 100000
    val p = 16
    val df = spark.range(n).select(
      (col("id") * 2654435761L % 1000003L).cast("double").as("v"))
    val bounds = RangePartition.boundaries(df, "v", p, kllK = 400)
    assert(bounds.length == p - 1)
    assert(bounds.sliding(2).forall(w => w(0) < w(1)))
    val eps = 1.75 / 400
    val counts = df.select(RangePartition.bucketColumn(col("v"), bounds).as("b"))
      .groupBy("b").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keys.max == p - 1 && counts.keys.min == 0)
    counts.values.foreach { c =>
      assert(math.abs(c.toDouble / n - 1.0 / p) <= 2 * eps,
        s"bucket fraction ${c.toDouble / n} off target ${1.0 / p}")
    }
  }

  test("zipf-skewed values stay balanced; a heavy atom collapses its cuts") {
    import spark.implicits._
    // 50% of rows are the single value 7.0 (an atom heavier than any
    // bucket), the rest spread over [0, 1e6)
    val n = 40000
    val df = spark.range(n).select(
      when(col("id") % 2 === 0, lit(7.0))
        .otherwise((abs(hash(col("id"))) % 1000000).cast("double")).as("v"))
    val p = 8
    val bounds = RangePartition.boundaries(df, "v", p, kllK = 400)
    // the atom swallows ~4 of 7 cuts -> strictly increasing survivors only
    assert(bounds.length < p - 1)
    assert(bounds.sliding(2).forall(w => w(0) < w(1)))
    val occ = RangePartition.occupancy(df, "v", bounds).collect()
    // every realized bucket except the atom's own stays near target;
    // the atom's bucket holds ~50% and is visibly reported
    val atomBucket = occ.maxBy(_.getAs[Long]("cnt"))
    assert(atomBucket.getAs[Long]("cnt") >= n / 2 - n / 100)
    assert(atomBucket.getAs[Double]("lo") <= 7.0 && 7.0 <= atomBucket.getAs[Double]("hi"))
  }

  test("boundariesFromBlob is zero-scan driver math and matches direct build") {
    import spark.implicits._
    val df = spark.range(20000).select((col("id") % 9973).cast("double").as("v"))
    val blob = df.agg(graft.functions.kll_sketch(col("v"), 300)).head.getAs[Array[Byte]](0)
    val fromBlob = RangePartition.boundariesFromBlob(blob, 10)
    val sk = KllSketch.deserialize(blob)
    assert(fromBlob.toSeq == (1 until 10).map(i => sk.quantile(i / 10.0)).distinct)
  }

  test("repartitionBalanced: one shuffle, no sampling job, rows preserved") {
    import spark.implicits._
    val df = spark.range(10000).select((col("id") * 31 % 997).cast("double").as("v"))
    val out = RangePartition.repartitionBalanced(df, "v", 32)
    assert(out.count() == 10000)
    assert(!out.columns.contains("__graft_bucket"))
  }

  test("NaN buckets to NULL, never the top bucket; nulls stay null") {
    import spark.implicits._
    val bounds = Array(10.0, 20.0)
    val df = Seq(Some(5.0), Some(Double.NaN), Some(25.0), None).toDF("v")
    val got = df.select(RangePartition.bucketColumn(col("v"), bounds).as("b"))
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
    assert(got == Seq(0, -1, 2, -1), got.toString)
  }

  test("SQL surface: kll_boundaries over a maintained sketch blob") {
    import spark.implicits._
    graft.functions.register(spark)
    spark.range(5000).select((col("id") % 1000).cast("double").as("v"))
      .createOrReplaceTempView("rp_in")
    val bounds = spark.sql(
      "SELECT kll_boundaries(kll_sketch(v, 200), 4) FROM rp_in")
      .head.getSeq[Double](0)
    assert(bounds.length == 3)
    // quartile cuts of uniform 0..999 land near 250/500/750
    bounds.zip(Seq(250.0, 500.0, 750.0)).foreach { case (b, t) =>
      assert(math.abs(b - t) <= 1000 * 2 * (1.75 / 200), s"cut $b far from $t")
    }
  }
}
