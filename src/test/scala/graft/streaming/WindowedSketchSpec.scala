package graft.streaming

import graft.SparkTestSession
import graft.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketch UDAFs drop directly into watermarked windowed streaming
  * aggregation: TypedImperativeAggregate buffers serialize into the state
  * store like any aggregation buffer, so
  * `readStream.withWatermark(...).groupBy(window(...)).agg(hll_sketch(...))`
  * works unchanged.
  */
class WindowedSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("watermarked windowed hll_sketch aggregation over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val windowed = input.toDF().toDF("ts", "key")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(hll_sketch(col("key"), 12).as("sk"), count(lit(1)).as("rows"))
      .select(col("window.start").as("w"), hll_estimate(col("sk")).as("est"), col("rows"))
    val query = windowed.writeStream
      .format("memory").queryName("win_hll").outputMode("update").start()
    try {
      def ts(minute: Int, sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")
      // window 10:00: 300 distinct keys; window 10:01: 150 distinct keys
      input.addData((0 until 300).map(i => (ts(0, i % 60), s"a$i")): _*)
      input.addData((0 until 150).map(i => (ts(1, i % 60), s"b$i")): _*)
      query.processAllAvailable()
      val byWindow = spark.table("win_hll")
        .groupBy($"w").agg(max(struct($"rows", $"est")).as("s"))
        .select($"w", $"s.est", $"s.rows").collect()
        .map(r => r.getTimestamp(0).toString -> (r.getLong(1), r.getLong(2))).toMap
      assert(byWindow.size == 2, byWindow)
      val (est0, rows0) = byWindow("2024-01-01 10:00:00.0")
      val (est1, rows1) = byWindow("2024-01-01 10:01:00.0")
      assert(rows0 == 300 && rows1 == 150)
      assert(math.abs(est0 - 300) <= 12, s"est0=$est0")
      assert(math.abs(est1 - 150) <= 8, s"est1=$est1")
    } finally query.stop()
  }

  test("windowed theta_sketch stream: per-window blobs support cross-window set algebra") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val windowed = input.toDF().toDF("ts", "key")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(theta_sketch(col("key"), 1024).as("sk"), count(lit(1)).as("rows"))
      .select(col("window.start").as("w"), col("sk"), col("rows"))
    val query = windowed.writeStream
      .format("memory").queryName("win_theta").outputMode("update").start()
    try {
      def ts(minute: Int, sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 11:$minute%02d:$sec%02d")
      // window 0: keys u0..u399; window 1: keys u200..u699 -> overlap 200
      input.addData((0 until 400).map(i => (ts(0, i % 60), s"u$i")): _*)
      input.addData((200 until 700).map(i => (ts(1, i % 60), s"u$i")): _*)
      query.processAllAvailable()
      val blobs = spark.table("win_theta")
        .groupBy($"w").agg(max(struct($"rows", $"sk")).as("s"))
        .select($"w", $"s.sk").collect()
        .map(r => r.getTimestamp(0).toString -> r.getAs[Array[Byte]](1)).toMap
      val a = graft.core.ThetaSketch.deserialize(blobs("2024-01-01 11:00:00.0"))
      val b = graft.core.ThetaSketch.deserialize(blobs("2024-01-01 11:01:00.0"))
      // all below k -> exact set algebra across streaming windows
      assert(a.estimateLong == 400 && b.estimateLong == 500)
      assert(a.intersect(b).estimateLong == 200)
      assert(b.aNotB(a).estimateLong == 300)
      assert(a.union(b).estimateLong == 700)
    } finally query.stop()
  }
}
