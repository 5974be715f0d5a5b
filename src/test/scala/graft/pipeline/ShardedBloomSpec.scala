package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShardedBloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sharded bloom: zero false negatives, bounded FPR, probe routes correctly") {
    val members = (0 until 20000).map(i => s"key-$i")
    val df = members.toDF("k")
    val parts = ShardedBloom.build(df, "k", 20000L, 0.01f, 16)
    assert(parts.count() == 16) // all buckets populated at this size
    val shards = ShardedBloom.collectShards(parts, 20000L, 0.01f, 16)
    assert(shards.length == 16)

    // zero false negatives across every shard boundary
    val fn = df.filter(!ShardedBloom.mightContain(shards, col("k"))).count()
    assert(fn == 0)

    // false positives bounded near p on held-out keys
    val unknown = (0 until 10000).map(i => s"other-$i").toDF("k")
    val fp = unknown.filter(ShardedBloom.mightContain(shards, col("k"))).count()
    assert(fp <= 10000 * 0.02, s"fp=$fp") // 2x slack on p=0.01

    // empty buckets are legal: tiny input leaves holes, probes still work
    val sparse = Seq("a", "b").toDF("k")
    val sparseShards = ShardedBloom.collectShards(
      ShardedBloom.build(sparse, "k", 1000L, 0.01f, 16), 1000L, 0.01f, 16)
    assert(sparse.filter(!ShardedBloom.mightContain(sparseShards, col("k"))).count() == 0)
  }
}
