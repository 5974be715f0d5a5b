package graft.streaming

import graft.SparkTestSession
import graft.core.BloomSketch
import graft.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streamed bloom over micro-batches == one batch build, per group") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val updates = StreamingSketch.bloomPerGroup(input.toDS(), 5000L, 0.01f)
    val query = updates.writeStream
      .format("memory").queryName("bloom_updates").outputMode("update").start()
    try {
      val batch1 = (0 until 300).map(i => (s"g${i % 2}", s"k$i"))
      val batch2 = (300 until 500).map(i => (s"g${i % 2}", s"k$i"))
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()

      // latest state per group from the update stream
      val latest = spark.table("bloom_updates")
        .groupBy($"group").agg(max(struct($"elementsAdded", $"sketch")).as("s"))
        .select($"group", $"s.sketch", $"s.elementsAdded")
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap

      // batch reference: same rows in one aggregation
      val all = (batch1 ++ batch2).toDF("group", "k")
      val ref = all.groupBy($"group").agg(bloom_sketch($"k", 5000L, 0.01f).as("sketch"))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap

      assert(latest.keySet == ref.keySet)
      latest.foreach { case (g, blob) =>
        assert(blob.sameElements(ref(g)), s"group $g stream != batch")
        val sk = BloomSketch.deserialize(blob)
        (if (g == "g0") 0 until 500 by 2 else 1 until 500 by 2)
          .foreach(i => assert(sk.contains(s"k$i")))
      }
    } finally query.stop()
  }

  test("streamed hll estimate converges per batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val updates = StreamingSketch.hllPerGroup(input.toDS(), 14)
    val query = updates.writeStream
      .format("memory").queryName("hll_updates").outputMode("update").start()
    try {
      input.addData((0 until 1000).map(i => ("g", s"k$i")): _*)
      query.processAllAvailable()
      input.addData((500 until 1500).map(i => ("g", s"k$i")): _*)
      query.processAllAvailable()
      val ests = spark.table("hll_updates").select($"elementsAdded")
        .collect().map(_.getLong(0)).sorted
      assert(ests.length == 2)
      assert(math.abs(ests(0) - 1000L) <= 25, s"batch1 est=${ests(0)}")
      assert(math.abs(ests(1) - 1500L) <= 40, s"batch2 est=${ests(1)}")
    } finally query.stop()
  }
}
