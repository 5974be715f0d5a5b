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

  test("large-B probe path: bucket-equi-join against the distributed parts table == broadcast path") {
    val members = (0 until 20000).map(i => s"key-$i")
    val df = members.toDF("k")
    val parts = ShardedBloom.build(df, "k", 20000L, 0.01f, 16)
    val shards = ShardedBloom.collectShards(parts, 20000L, 0.01f, 16)

    val probes = ((0 until 5000).map(i => s"key-${i * 4}") ++
      (0 until 5000).map(i => s"miss-$i")).toDF("k")
    val viaBroadcast = probes.filter(ShardedBloom.mightContain(shards, col("k")))
      .as[String].collect().toSet
    val viaJoin = ShardedBloom.semiJoin(probes, "k", parts, 16)
      .as[String].collect().toSet
    assert(viaJoin == viaBroadcast, "the two probe paths must answer identically")
    // zero false negatives through the join path too
    assert((0 until 5000).map(i => s"key-${i * 4}").toSet.subsetOf(viaJoin))

    // empty buckets: probes whose bucket has no part row are dropped by the
    // inner join (an empty shard contains nothing) — never a crash
    val sparseParts = ShardedBloom.build(Seq("a").toDF("k"), "k", 1000L, 0.01f, 64)
    val res = ShardedBloom.semiJoin(Seq("a", "zzz-not-there").toDF("k"), "k", sparseParts, 64)
      .as[String].collect().toSet
    assert(res.contains("a"))
  }

  test("large-B degradation: semiJoin stays correct when broadcast is disabled (shuffle join path)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = (0 until 8000).map(i => s"key-$i").toDF("k")
      val parts = ShardedBloom.build(df, "k", 8000L, 0.01f, 16)
      val probes = ((0 until 2000).map(i => s"key-${i * 3}") ++
        (0 until 2000).map(i => s"nope-$i")).toDF("k")
      val res = ShardedBloom.semiJoin(probes, "k", parts, 16)
      val plan = res.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), s"broadcast still chosen:\n$plan")
      val got = res.as[String].collect().toSet
      assert((0 until 2000).map(i => s"key-${i * 3}").toSet.subsetOf(got))
      assert(got.count(_.startsWith("nope")) <= 2000 * 0.02)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("broadcast probe: plan does not embed shard blobs as literals") {
    val df = (0 until 5000).map(i => s"key-$i").toDF("k")
    val shards = ShardedBloom.collectShards(
      ShardedBloom.build(df, "k", 5000L, 0.01f, 8), 5000L, 0.01f, 8)
    val probed = df.filter(ShardedBloom.mightContain(shards, col("k")))
    // a literal array of 8 blobs would put ~8x1.2KB of hex into the plan
    // string; the broadcast-handle plan stays small
    val planLen = probed.queryExecution.executedPlan.toString.length
    assert(planLen < 5000, s"plan unexpectedly large ($planLen chars) — blobs inlined?")
    assert(probed.count() == 5000)
  }
}

/** Generic checkpoint/resume over a non-Bloom sketch (HLL): kill-mid-job
  * resume produces the same blob as a direct build.
  */
class GenericCheckpointSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.functions._

  test("checkpointed HLL battery resumes to the direct-build blob") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-gck").toString
    (0 until 5000).map(i => s"k$i").toDF("k").repartition(6)
      .write.mode("overwrite").parquet(s"$tmp/src")
    val files = new java.io.File(s"$tmp/src").listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq.sorted
    def build(df: org.apache.spark.sql.DataFrame) = df.agg(hll_sketch(col("k"), 12).as("sketch"))
    def merge(parts: org.apache.spark.sql.DataFrame) =
      parts.agg(hll_merge_agg(col("sketch"))).head.getAs[Array[Byte]](0)
    val direct = build(spark.read.parquet(files: _*)).head.getAs[Array[Byte]](0)
    val failed = scala.util.Try(SketchPipeline.buildCheckpointed(
      spark, files, build, merge, s"$tmp/ckpt", 3, simulateFailureAfter = 1))
    assert(failed.isFailure)
    val resumed = SketchPipeline.buildCheckpointed(spark, files, build, merge, s"$tmp/ckpt", 3)
    assert(resumed.sameElements(direct))
  }
}
