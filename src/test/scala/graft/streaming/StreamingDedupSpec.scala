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

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("exact TTL dedup: state expires with the event-time watermark; content re-admitted after TTL") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = StreamingDedup.firstSeenExactTtl(input.toDS(), "0 seconds", ttlMs = 10000L)
    val query = out.writeStream
      .format("memory").queryName("dedup_exact_ttl").outputMode("update").start()
    try {
      val X = "recurring content alpha beta gamma"
      input.addData((1L, X, ts(1000)))               // first sighting: passes
      query.processAllAvailable()
      input.addData((2L, X, ts(5000)), (3L, "other content Y", ts(30000)))
      query.processAllAvailable()                    // X within TTL: dropped
      input.addData((4L, "other content Z", ts(31000)))
      query.processAllAvailable()                    // watermark=30s > X expiry 15s: X state removed
      input.addData((5L, X, ts(32000)))
      query.processAllAvailable()                    // re-admitted after expiry
      val got = spark.table("dedup_exact_ttl").as[(Long, String)].collect().toSet
      assert(got.map(_._1) == Set(1L, 3L, 4L, 5L), s"got $got")
      // X passed exactly twice: once per TTL epoch
      assert(got.count(_._2 == X) == 2)
    } finally query.stop()
  }

  test("bloom TTL dedup: generational rotation re-admits after 2 windows, drops dups inside one") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = StreamingDedup.firstSeenBloomTtl(input.toDS(),
      shards = 2, nPerShard = 1000L, p = 0.01f, "0 seconds", ttlMs = 10000L)
    val query = out.writeStream
      .format("memory").queryName("dedup_bloom_ttl").outputMode("update").start()
    try {
      def contents(idBase: Long, t: Long) =
        (0 until 50).map(i => (idBase + i, s"rotating corpus item $i stable words", ts(t)))
      input.addData(contents(0, 1000): _*)    // window 0: all pass
      query.processAllAvailable()
      input.addData(contents(100, 12000): _*) // window 1: rotated to prev, still seen -> dropped
      query.processAllAvailable()
      input.addData(contents(200, 25000): _*) // window 2: last insert 2 windows old -> re-admitted
      query.processAllAvailable()
      val got = spark.table("dedup_bloom_ttl").as[(Long, String)].collect()
      assert(got.count(_._1 < 100) == 50, "window-0 batch must fully pass")
      assert(!got.exists(r => r._1 >= 100 && r._1 < 200), "within-TTL dups must be dropped")
      assert(got.count(_._1 >= 200) == 50, "post-2-window batch must be re-admitted")
    } finally query.stop()
  }
}
