package graft.agg

import graft.SparkTestSession
import graft.core.ThetaSketch
import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ThetaAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("theta_sketch UDAF: estimate within bound, parallelism-invariant blob, SQL surface") {
    val df = (0 until 50000).map(i => s"url-${i % 30000}").toDF("k")
    val b8 = df.repartition(8).agg(theta_sketch(col("k"), 1024)).head.getAs[Array[Byte]](0)
    val b2 = df.repartition(2).agg(theta_sketch(col("k"), 1024)).head.getAs[Array[Byte]](0)
    assert(b8.sameElements(b2), "theta blob must be identical at any parallelism")
    val est = ThetaSketch.deserialize(b8).estimate
    assert(math.abs(est - 30000) / 30000.0 <= 4.0 / math.sqrt(1023.0), s"est=$est")

    df.createOrReplaceTempView("theta_keys")
    val viaSql = spark.sql(
      "SELECT theta_estimate(theta_sketch(k, 1024)) FROM theta_keys").head.getLong(0)
    assert(viaSql == ThetaSketch.deserialize(b8).estimateLong)
  }

  test("set algebra over blobs: intersection of two key populations") {
    val a = (0 until 40000).map(i => s"u$i").toDF("k")
      .agg(theta_sketch(col("k"), 2048)).head.getAs[Array[Byte]](0)
    val b = (30000 until 90000).map(i => s"u$i").toDF("k")
      .agg(theta_sketch(col("k"), 2048)).head.getAs[Array[Byte]](0)
    val r = spark.range(1).select(
      theta_estimate(theta_intersect(lit(a), lit(b))).as("inter"),
      theta_estimate(theta_a_not_b(lit(a), lit(b))).as("diff"),
      theta_estimate(graft.functions.theta_union(lit(a), lit(b))).as("uni")).head
    val (inter, diff, uni) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(math.abs(inter - 10000) / 10000.0 <= 0.9, s"inter=$inter") // |A∪B|/|A∩B| = 9x RSE amplification
    assert(math.abs(diff - 30000) / 30000.0 <= 0.3, s"diff=$diff")
    assert(math.abs(uni - 90000) / 90000.0 <= 0.1, s"uni=$uni")
  }

  test("theta_merge re-aggregates salted partials to the identical blob") {
    val df = (0 until 30000).map(i => s"k$i").toDF("k")
    val direct = df.agg(theta_sketch(col("k"), 512)).head.getAs[Array[Byte]](0)
    val twoLevel = df
      .groupBy(pmod(xxhash64(col("k")), lit(16)).as("salt"))
      .agg(theta_sketch(col("k"), 512).as("part"))
      .agg(theta_merge(col("part"))).head.getAs[Array[Byte]](0)
    assert(twoLevel.sameElements(direct))
  }
}
