package graft.data

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Thin table-layout seam: Iceberg-style partitioned parquet.
  *
  * The north-rule input is an Iceberg table of web pages; no Iceberg
  * runtime jar is available offline, so this seam reproduces the layout
  * Iceberg's `bucket(N, url)` + identity(`lang`) partition transform would
  * give — `lang=<v>/url_bucket=<b>/` parquet directories — and documents
  * the swap point: with an Iceberg catalog on the classpath, `write` maps
  * to `df.writeTo(table).partitionedBy(bucket(N, $"url"), $"lang")` and
  * `read`/`readLang` to `spark.table(table)` (+ the same filters); nothing
  * else in the library changes, since every operator consumes a plain
  * `DataFrame`.
  *
  * Scale notes:
  *  - `url_bucket` is a *stable* hash bucket (positive mod of xxhash64),
  *    so re-writes and incremental appends land in the same partitions and
  *    two tables bucketed the same way can be joined per-bucket without a
  *    full shuffle;
  *  - `lang` identity-partitioning gives partition pruning for the
  *    per-language sketch queries (`readLang` scans only `lang=<v>/`);
  *  - partition-dir count = |langs| × buckets — keep buckets O(100s–1000s)
  *    at 10^12 rows so files stay ≥ 100 MB.
  */
object TableIO {

  final val DefaultBuckets = 16

  /** Stable bucket column: `pmod(xxhash64(url), buckets)` — the parquet
    * stand-in for Iceberg's `bucket(buckets, url)` transform.
    */
  def urlBucket(buckets: Int) = pmod(xxhash64(col("url")), lit(buckets))

  def write(pages: Dataset[WebPage], dir: String, buckets: Int = DefaultBuckets,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    pages.withColumn("url_bucket", urlBucket(buckets))
      .write.mode(mode)
      .partitionBy("lang", "url_bucket")
      .parquet(dir)

  /** Full-table read; Catalyst prunes `lang`/`url_bucket` dirs when the
    * query filters on them.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Partition-pruned single-language read (only `lang=<v>` dirs are
    * listed/scanned — verify with `.explain`: PartitionFilters).
    */
  def readLang(spark: SparkSession, dir: String, lang: String): DataFrame =
    read(spark, dir).filter(col("lang") === lang)

  /** Point lookup by url through the STABLE bucket: recomputes
    * `url_bucket` from the lookup value, so partition pruning reads one
    * bucket directory per language (1/buckets of the table) and the exact
    * url filter rides the parquet scan — no sidecar index needed; this is
    * what the bucketed layout buys. `buckets` must match the write.
    */
  def readUrl(spark: SparkSession, dir: String, url: String,
              buckets: Int = DefaultBuckets): DataFrame =
    read(spark, dir).filter(
      col("url_bucket") === pmod(xxhash64(lit(url)), lit(buckets)) &&
        col("url") === url)
}
