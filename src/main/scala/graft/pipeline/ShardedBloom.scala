package graft.pipeline

import graft.functions._
import org.apache.spark.sql.{Column, DataFrame}
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
  *  - '''storage''' = a (bucket, sketch) parts table; small B fits in a
  *    driver/broadcast array, large B stays distributed and probes become
  *    a bucket-equi-join against the parts table.
  *
  * The bucket function is `pmod(xxhash64(key), B)` — the same stable
  * hash family as [[graft.data.TableIO.urlBucket]], so a table already
  * bucket-partitioned by key probes its co-located shard without any
  * shuffle.
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

  /** Collect a (small-B) parts table into a probe-ready array: index i =
    * bucket i's blob (empty-filter blob for buckets with no rows).
    */
  def collectShards(parts: DataFrame, totalN: Long, p: Float, buckets: Int): Array[Array[Byte]] = {
    val perShard = math.max(totalN / buckets, 1L)
    val m = parts.collect().map(r => r.getLong(0).toInt -> r.getAs[Array[Byte]](1)).toMap
    val empty = graft.core.BloomSketch.empty(perShard, p).serialize()
    Array.tabulate(buckets)(b => m.getOrElse(b, empty))
  }

  /** Probe column: routes `key` to its shard and probes it. `shards` is
    * the [[collectShards]] array (becomes one broadcast literal; each
    * task deserializes only the shards it actually probes, memoized).
    */
  def mightContain(shards: Array[Array[Byte]], key: Column): Column = {
    val arr = array(shards.map(lit(_)): _*)
    bloom_might_contain(
      element_at(arr, (bucketOf(key.cast("string"), shards.length) + 1).cast("int")),
      key.cast("string"))
  }
}
