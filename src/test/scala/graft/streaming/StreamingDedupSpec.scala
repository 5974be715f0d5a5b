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

  test("incremental clusters: stream mapping == batch resolveClusters on a growing edge stream") {
    implicit val sqlCtx = spark.sqlContext
    // growing graph exercising every merge shape: chains extending,
    // a star growing leaf-by-leaf, two old components bridged by a later
    // edge, a NEW smaller id taking over an existing cluster's rep, and
    // batches with only-redundant edges
    val batches: Seq[Seq[(Long, Long)]] = Seq(
      Seq((1L, 2L), (10L, 11L), (20L, 21L)),
      Seq((2L, 3L), (11L, 12L), (30L, 31L)), // chains extend, new comp
      Seq((3L, 10L)),                        // bridge comps {1..3} and {10..12}
      Seq((1L, 2L), (10L, 11L)),             // redundant only: no-op batch
      Seq((0L, 31L)),                        // new SMALLER id takes over comp {30,31}
      Seq((40L, 41L), (41L, 42L), (42L, 40L), (20L, 40L)) // cycle + merge into {20,21}
    )
    val state = new IncrementalClusters()
    val input = MemoryStream[(Long, Long)]
    val query = input.toDS().toDF("id_a", "id_b").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        state.update(batch); ()
      }.start()
    try {
      var seen = Seq.empty[(Long, Long)]
      batches.foreach { b =>
        input.addData(b: _*)
        query.processAllAvailable()
        seen ++= b
        val streamMap = state.mapping.get.as[(Long, Long)].collect().sorted.toSeq
        val batchMap = graft.ops.Dedup.resolveClusters(seen.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().sorted.toSeq
        assert(streamMap == batchMap,
          s"after ${seen.size} edges: stream $streamMap vs batch $batchMap")
      }
      // spot-check the final shape: one cluster {1,2,3,10,11,12}, one
      // {0,30,31}, one {20,21,40,41,42}
      val reps = state.mapping.get.as[(Long, Long)].collect().toMap
      assert(reps(12L) == 1L && reps(3L) == 1L)
      assert(reps(30L) == 0L && reps(31L) == 0L && reps(0L) == 0L)
      assert(reps(42L) == 20L && reps(21L) == 20L)
    } finally query.stop()
  }
}
