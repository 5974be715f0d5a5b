package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsWithDups: (Seq[(Long, String)], Seq[(Long, String)]) = {
    val b1 = (0 until 100).map(i => (i.toLong, s"document body number ${i % 40} stable content"))
    val b2 = (100 until 160).map(i => (i.toLong, s"document body number ${i % 40} stable content"))
    (b1, b2) // 40 distinct contents total; dups within AND across batches
  }

  test("exact streaming dedup: one survivor per distinct content across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingDedup.firstSeenExact(input.toDS())
    val query = out.writeStream
      .format("memory").queryName("dedup_exact").outputMode("update").start()
    try {
      val (b1, b2) = docsWithDups
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      val survivors = spark.table("dedup_exact").as[(Long, String)].collect()
      // exactly one row per distinct content, all from the FIRST batch
      assert(survivors.length == 40, s"got ${survivors.length}")
      assert(survivors.map(_._2).distinct.length == 40)
      assert(survivors.forall(_._1 < 40), "survivor must be the first-seen occurrence")
    } finally query.stop()
  }

  test("bloom streaming dedup: no duplicate ever passes; unique drop rate bounded by p") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingDedup.firstSeenBloom(input.toDS(), shards = 4, nPerShard = 2000L, p = 0.01f)
    val query = out.writeStream
      .format("memory").queryName("dedup_bloom").outputMode("update").start()
    try {
      val distinct = (0 until 3000).map(i => (i.toLong, s"unique content $i with enough words to matter"))
      val dups = (3000 until 3500).map(i => (i.toLong, s"unique content ${i % 200} with enough words to matter"))
      input.addData(distinct: _*)
      query.processAllAvailable()
      input.addData(dups: _*)
      query.processAllAvailable()
      val survivors = spark.table("dedup_bloom").as[(Long, String)].collect()
      // zero false negatives in the filter => no duplicate content twice
      assert(survivors.map(_._2).distinct.length == survivors.length, "a duplicate passed")
      // every second-batch row duplicates batch-1 content => none survive
      assert(survivors.forall(_._1 < 3000))
      // wrongly-dropped uniques bounded by ~p (generous 3x slack)
      val dropped = 3000 - survivors.length
      assert(dropped <= 3000 * 0.03, s"dropped $dropped of 3000 uniques")
    } finally query.stop()
  }
}
