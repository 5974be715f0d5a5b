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

  test("streamed bottom-k sample == batch build, bitwise (exact monoid)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val updates = StreamingSketch.bottomKPerGroup(input.toDS(), 15)
    val query = updates.writeStream
      .format("memory").queryName("bk_updates").outputMode("update").start()
    try {
      val batch1 = (0 until 400).map(i => (s"g${i % 3}", s"url$i"))
      val batch2 = (400 until 900).map(i => (s"g${i % 3}", s"url$i"))
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
      val latest = spark.table("bk_updates")
        .groupBy($"group").agg(max(struct($"elementsAdded", $"sketch")).as("s"))
        .select($"group", $"s.sketch").collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
      val ref = (batch1 ++ batch2).toDF("group", "k")
        .groupBy($"group").agg(graft.functions.bottomk_sample($"k", 15).as("sketch"))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
      assert(latest.keySet == ref.keySet)
      latest.foreach { case (g, blob) => assert(blob.toSeq == ref(g).toSeq, s"group $g not bitwise") }
    } finally query.stop()
  }

  test("streamed Misra-Gries heavy hitters: bound holds over micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val updates = StreamingSketch.mgPerGroup(input.toDS(), 8)
    val query = updates.writeStream
      .format("memory").queryName("mg_updates").outputMode("update").start()
    try {
      // one group; hot key = 40% of rows, 200 cold keys force compress
      def mk(lo: Int, hi: Int) = (lo until hi).map { i =>
        ("g", if (i % 5 < 2) "hot" else s"cold${i % 200}")
      }
      input.addData(mk(0, 600): _*)
      query.processAllAvailable()
      input.addData(mk(600, 1500): _*)
      query.processAllAvailable()
      val blob = spark.table("mg_updates")
        .orderBy($"elementsAdded".desc).head.getAs[Array[Byte]]("sketch")
      val mg = graft.core.MgSketch.deserialize(blob)
      assert(mg.totalCount == 1500L)
      assert(mg.errorBound <= 1500L / 9)
      val hotTrue = (0 until 1500).count(_ % 5 < 2)
      assert(mg.estimate("hot") <= hotTrue && mg.estimate("hot") >= hotTrue - mg.errorBound)
      assert(mg.topK(1).head == "hot")
    } finally query.stop()
  }

  test("streamed weighted sample == batch build, bitwise (exact monoid)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Long)]
    val updates = StreamingSketch.weightedSamplePerGroup(input.toDS(), 12)
    val query = updates.writeStream
      .format("memory").queryName("ws_updates").outputMode("update").start()
    try {
      def mk(lo: Int, hi: Int) = (lo until hi).map(i =>
        (s"g${i % 2}", s"dom$i", 1L + (i % 37).toLong))
      input.addData(mk(0, 500): _*)
      query.processAllAvailable()
      input.addData(mk(500, 1200): _*)
      query.processAllAvailable()
      val latest = spark.table("ws_updates")
        .groupBy($"group").agg(max(struct($"elementsAdded", $"sketch")).as("s"))
        .select($"group", $"s.sketch").collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
      val ref = mk(0, 1200).toDF("group", "k", "w")
        .groupBy($"group").agg(graft.functions.weighted_sample($"k", $"w", 12).as("sketch"))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
      assert(latest.keySet == ref.keySet && latest.keySet == Set("g0", "g1"))
      latest.foreach { case (g, blob) => assert(blob.toSeq == ref(g).toSeq, s"group $g not bitwise") }
    } finally query.stop()
  }
}
