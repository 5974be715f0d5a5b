package graft.agg

import graft.SparkTestSession
import graft.core.CountingBloomSketch
import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CbfSubtractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("batch removal: subtract a sketched key set, membership follows") {
    val all = (0 until 3000).map(i => s"k$i")
    val removed = (0 until 1000).map(i => s"k$i")
    val aBlob = all.toDF("k").agg(counting_bloom_sketch(col("k"), 5000L, 0.01f))
      .head.getAs[Array[Byte]](0)
    val rBlob = removed.toDF("k").agg(counting_bloom_sketch(col("k"), 5000L, 0.01f))
      .head.getAs[Array[Byte]](0)
    val diff = spark.range(1).select(cbf_subtract(lit(aBlob), lit(rBlob)))
      .head.getAs[Array[Byte]](0)
    val sk = CountingBloomSketch.deserialize(diff)
    assert(sk.elementsAdded == 2000)
    // kept keys still present (no false negatives for non-removed keys)
    (1000 until 3000).foreach(i => assert(sk.contains(s"k$i"), s"lost k$i"))
    // removed keys mostly gone (some may survive as counter collisions —
    // the same FP behavior the reference's per-key remove has)
    val survivors = (0 until 1000).count(i => sk.contains(s"k$i"))
    assert(survivors <= 30, s"survivors=$survivors")
    // SQL surface
    graft.functions.register(spark)
    val viaSql = spark.sql(
      s"SELECT cbf_count(cbf_subtract(a, b), 'k5') AS c FROM (SELECT ${"X'" + aBlob.map("%02x".format(_)).mkString + "'"} AS a, ${"X'" + rBlob.map("%02x".format(_)).mkString + "'"} AS b)")
      .head.getInt(0)
    assert(viaSql == 0 || viaSql <= 1)
  }
}
