package graft.pipeline

import graft.expr.ShardedBloomProbe
import graft.functions._
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded Bloom filter — the 10^12-key deployment shape.
  *
  * One monolithic filter at n=10^12, p=0.01 is ~1.2 TB of bits: it fits no
  * executor, and every partial buffer would be that size. The standard
  * scale-out (partitioned Bloom filter) shards the key space by a stable
  * hash into B independent filters of capacity n/B:
  *
  *  - '''build''' = one `groupBy(bucket)` aggregation — B buffers of
  *    (n/B)-capacity spread across the cluster, each task holding only the
  *    buffers of its buckets;
  *  - '''probe''' = route the key to its bucket's filter — same FPR math
  *    per bucket, zero false negatives overall;
  *  - '''storage''' = a (bucket, sketch) parts table.
  *
  * Probe paths by shard-set size (all three produce identical answers —
  * tested shard-for-shard in ShardedBloomSpec and q26/q29):
  *
  *  1. '''medium B (all blobs fit one executor's memory — up to a few GB)''':
  *     [[mightContain]] ships the blobs ONCE per executor as a real Spark
  *     broadcast variable read by a codegen'd custom expression
  *     ([[graft.expr.ShardedBloomProbe]]). The plan and each serialized
  *     task stay small — never a literal array of blobs in the plan.
  *  2. '''large B (the parts table itself is TB-scale)''': [[semiJoin]]
  *     keeps the parts table distributed and probes via a bucket-equi-join:
  *     the probe side is hashed on its bucket (one shuffle — or zero, see
  *     below), each reduce task holds only its buckets' blobs, and the
  *     codegen'd `bloom_might_contain` filters in place.
  *
  * The bucket function is `pmod(xxhash64(key), B)` — the same stable
  * hash family as [[graft.data.TableIO.urlBucket]], so a table already
  * bucket-partitioned by key probes its co-located shard without any
  * shuffle (Spark reuses the existing hash partitioning; with `buckets` a
  * multiple of the table's bucket count the join is storage-co-located).
  */
object ShardedBloom {

  def bucketOf(key: Column, buckets: Int): Column =
    pmod(xxhash64(key), lit(buckets))

  /** Build B shard filters, each sized n/B. Returns (bucket, sketch). */
  def build(df: DataFrame, keyCol: String, totalN: Long, p: Float, buckets: Int): DataFrame = {
    val perShard = math.max(totalN / buckets, 1L)
    df.select(col(keyCol).cast("string").as("__k"))
      .groupBy(bucketOf(col("__k"), buckets).as("bucket"))
      .agg(bloom_sketch(col("__k"), perShard, p).as("sketch"))
  }

  /** Collect a (medium-B) parts table into a probe-ready array: index i =
    * bucket i's blob (empty-filter blob for buckets with no rows). The
    * array is sized B × blob bytes on the driver — use [[semiJoin]] when
    * that no longer fits.
    */
  def collectShards(parts: DataFrame, totalN: Long, p: Float, buckets: Int): Array[Array[Byte]] = {
    val perShard = math.max(totalN / buckets, 1L)
    val m = parts.collect().map(r => r.getLong(0).toInt -> r.getAs[Array[Byte]](1)).toMap
    val empty = graft.core.BloomSketch.empty(perShard, p).serialize()
    Array.tabulate(buckets)(b => m.getOrElse(b, empty))
  }

  // One broadcast per distinct shard-array CONTENT, bounded: probe columns
  // are often constructed per query in a long-lived session, and each
  // broadcast pins B × blob bytes on every executor until unpersisted.
  // Identity-weak caching is unreliable for reclamation (the cached
  // Broadcast reaches the shard array, so a weak entry may never clear);
  // instead the cache keys by an MD5 content digest (equal shard arrays
  // share one broadcast even across re-collects) and evicts LRU beyond
  // MaxCachedBroadcasts with `unpersist()` — executors drop their copies
  // immediately, and once the evicted handle is unreferenced Spark's
  // ContextCleaner completes the cleanup. For deterministic lifecycle
  // (`destroy()` after the last probe) use the Broadcast-taking overload.
  private val MaxCachedBroadcasts = 4
  private val broadcastCache =
    new java.util.LinkedHashMap[String, Broadcast[Array[Array[Byte]]]](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Broadcast[Array[Array[Byte]]]]): Boolean = {
        val evict = size() > MaxCachedBroadcasts
        if (evict) e.getValue.unpersist(false)
        evict
      }
    }

  private def contentDigest(shards: Array[Array[Byte]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val lenBuf = java.nio.ByteBuffer.allocate(4)
    shards.foreach { b =>
      lenBuf.clear(); lenBuf.putInt(b.length)
      md.update(lenBuf.array()); md.update(b)
    }
    java.util.Base64.getEncoder.encodeToString(md.digest())
  }

  /** Probe column: routes `key` to its shard and probes it. The shard
    * array becomes ONE broadcast variable (torrent-distributed, one copy
    * per executor, memoized by content digest across calls, LRU-bounded)
    * read by a codegen'd expression — the plan carries only the broadcast
    * handle, so task size is independent of B × blob bytes. For explicit
    * lifecycle control (`destroy()` after the last probe), use the
    * `Broadcast`-taking overload below.
    */
  def mightContain(shards: Array[Array[Byte]], key: Column): Column = {
    val digest = contentDigest(shards)
    val bc = broadcastCache.synchronized {
      val cached = broadcastCache.get(digest)
      if (cached != null) cached
      else {
        val b = SparkSession.active.sparkContext.broadcast(shards)
        broadcastCache.put(digest, b)
        b
      }
    }
    mightContain(bc, key)
  }

  /** As [[mightContain]] with a caller-managed broadcast (reuse one
    * broadcast across many probe queries; `destroy()` it when done).
    */
  def mightContain(shards: Broadcast[Array[Array[Byte]]], key: Column): Column = {
    val k = key.cast("string")
    val bucket = bucketOf(k, shards.value.length)
    GraftSqlBridge.column(ShardedBloomProbe(
      GraftSqlBridge.expression(bucket), GraftSqlBridge.expression(k), shards))
  }

  /** Large-B probe path: rows of `df` whose key might be in the sharded
    * filter, via a bucket-equi-join against the DISTRIBUTED parts table —
    * no blob ever reaches the driver or the plan.
    *
    * Plan shape: `df` exchanges on `bucket` (the ONLY shuffle — zero if
    * `df` is already bucket-partitioned by the same hash), joins its one
    * part row, and the codegen'd `bloom_might_contain` filters in place.
    * Empty buckets have no part row, so the inner join correctly drops
    * their probes (an empty shard contains nothing). With a small parts
    * table Spark's own size estimate turns this into a broadcast-hash
    * join automatically — i.e. path 1's data movement with path 2's code.
    */
  def semiJoin(df: DataFrame, keyCol: String, parts: DataFrame, buckets: Int): DataFrame = {
    val in = df.withColumn("__gb", bucketOf(col(keyCol).cast("string"), buckets))
    in.join(parts.withColumnRenamed("bucket", "__gb"), Seq("__gb"))
      .filter(bloom_might_contain(col("sketch"), col(keyCol).cast("string")))
      .drop("__gb", "sketch")
  }
}
