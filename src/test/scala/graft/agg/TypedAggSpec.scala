package graft.agg

import graft.SparkTestSession
import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TypedAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def keys(n: Int) = (0 until n).map(_.toString)

  test("typed Aggregator facades produce the same blobs as the Catalyst UDAFs") {
    val ds = spark.createDataset(keys(5000)).repartition(4)
    val typedBloom = ds.select(BloomAgg(50000L, 0.01f).toColumn).head
    val untypedBloom = ds.toDF("k").agg(bloom_sketch(col("k"), 50000L, 0.01f))
      .head.getAs[Array[Byte]](0)
    assert(typedBloom.sameElements(untypedBloom))

    val typedHll = ds.select(HllAgg(12).toColumn).head
    val untypedHll = ds.toDF("k").agg(hll_sketch(col("k"), 12)).head.getAs[Array[Byte]](0)
    assert(typedHll.sameElements(untypedHll))

    val typedCms = ds.select(CmsAgg(0.01, 0.01).toColumn).head
    val untypedCms = ds.toDF("k").agg(cms_sketch(col("k"), 0.01, 0.01)).head.getAs[Array[Byte]](0)
    assert(typedCms.sameElements(untypedCms))
  }

  test("typed groupByKey aggregation: per-group HLL within bound") {
    val ds = spark.createDataset((0 until 4000).map(i => (s"g${i % 4}", s"k$i")))
      .repartition(8)
    val perGroup = ds.groupByKey(_._1).mapValues(_._2).agg(HllAgg(14).toColumn).collect()
    assert(perGroup.length == 4)
    perGroup.foreach { case (_, blob) =>
      val est = graft.core.HllSketch.deserialize(blob).estimateLong
      assert(math.abs(est - 1000L) <= 30, s"est=$est")
    }
  }

  test("cross-oracle: HLL estimate agrees with DataSketches on the same stream") {
    val ks = keys(100000)
    val ours = graft.core.HllSketch.empty(14)
    val theirs = new org.apache.datasketches.hll.HllSketch(14)
    ks.foreach { k => ours.add(k); theirs.update(k) }
    val a = ours.estimate
    val b = theirs.getEstimate
    // independent implementations, same published algorithm family: both
    // must sit within a few std errors (1.04/sqrt(2^14) ~ 0.81%) of truth
    assert(math.abs(a - 100000) / 100000.0 <= 0.025, s"ours=$a")
    assert(math.abs(b - 100000) / 100000.0 <= 0.025, s"datasketches=$b")
    assert(math.abs(a - b) / 100000.0 <= 0.04)
  }

  test("cross-oracle: KLL quantiles agree with DataSketches within rank error") {
    val xs = (0 until 50000).map(i => graft.core.Fnv.splitmix64(i.toLong).toDouble)
    val ours = graft.core.KllSketch.empty(200)
    val theirs = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200)
    xs.foreach { x => ours.add(x); theirs.update(x) }
    val sorted = xs.sorted
    for (q <- Seq(0.05, 0.25, 0.5, 0.75, 0.95)) {
      def rankOf(v: Double) = sorted.count(_ <= v).toDouble / sorted.size
      assert(math.abs(rankOf(ours.quantile(q)) - q) <= 0.02, s"ours q=$q")
      assert(math.abs(rankOf(theirs.getQuantile(q)) - q) <= 0.02, s"datasketches q=$q")
    }
  }
}
