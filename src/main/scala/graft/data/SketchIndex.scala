package graft.data

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{bloom_sketch, bloom_might_contain}

/** Per-file sketch sidecar index — data skipping ("zone maps + Bloom")
  * for parquet tables, built from this library's own sketches.
  *
  * The sidecar lives at `<table>/_graft_index/<key>` (underscore-prefixed,
  * so normal parquet reads never see it) with ONE ROW PER DATA FILE:
  * `(file, nrows, min_key, max_key, bloom blob)`. A point/in-list lookup
  * probes the index first and reads only the files whose Bloom (or range)
  * can match — the same skip strategy Iceberg/Delta stats files and
  * parquet bloom column-index metadata implement, here as a first-class
  * operator over the reference Bloom geometry (`bloom.c:92-139` add/check).
  *
  * Scale shape (100 TB ≈ O(10^5) files ≥ 100 MB each):
  *  - BUILD is one scan with map-side partial aggregation: rows group by
  *    `input_file_name()`, which is clustered within each task by
  *    construction, so each task emits a handful of partially-built blobs
  *    and the shuffle moves O(files) rows, not O(rows);
  *  - the index itself is parquet, ~0.1% of table size at fpp=1%; it is
  *    NEVER collected wholesale — PRUNE filters it distributed with the
  *    codegen'd [[graft.expr.BloomMightContain]] probe and collects only
  *    the surviving file paths (a bounded string list, ≤ O(10^5));
  *  - the final exact filter stays on the pruned scan, so Bloom false
  *    positives cost an extra file read, never a wrong row.
  */
object SketchIndex {

  final val IndexDirName = "_graft_index"

  /** Default Bloom capacity per data file: sized for the ~1M-row files a
    * well-laid-out 100 MB–1 GB parquet table produces. Oversizing only
    * costs sidecar bytes (index stays ~1.2 MB/file at 1% fpp).
    */
  final val DefaultKeysPerFile = 1L << 20

  private def indexPath(tableDir: String, keyCol: String): String =
    new Path(new Path(tableDir, IndexDirName), keyCol).toString

  /** Build (or rebuild) the sidecar for `keyCol`. Keys are indexed as
    * their string form (`CAST(key AS STRING)` — matching [[prunedFiles]]'s
    * probe side exactly, byte for byte).
    *
    * Returns the number of data files indexed.
    */
  def build(spark: SparkSession, tableDir: String, keyCol: String,
            keysPerFile: Long = DefaultKeysPerFile,
            fpp: Float = 0.01f): Long = {
    val df = spark.read.parquet(tableDir)
    val idx = df
      .select(input_file_name().as("file"), col(keyCol).cast("string").as("__k"))
      .groupBy(col("file"))
      .agg(
        count(lit(1)).as("nrows"),
        min(col("__k")).as("min_key"),
        max(col("__k")).as("max_key"),
        bloom_sketch(col("__k"), keysPerFile, fpp).as("bloom"))
    idx.write.mode(SaveMode.Overwrite).parquet(indexPath(tableDir, keyCol))
    spark.read.parquet(indexPath(tableDir, keyCol)).count()
  }

  /** Load the sidecar for `keyCol` (throws if [[build]] never ran). */
  def load(spark: SparkSession, tableDir: String, keyCol: String): DataFrame =
    spark.read.parquet(indexPath(tableDir, keyCol))

  /** Incremental [[build]] for append-only tables: scan ONLY data files
    * not yet in the sidecar and union their rows into it. A daily append
    * to a 100-TB table re-indexes the day's files, not the table — the
    * full-rebuild scan is exactly the cost this sidecar exists to avoid.
    *
    * File identity is the scan-time path ([[org.apache.spark.sql.functions.input_file_name]]
    * on both sides), so rewritten/compacted files re-index under their new
    * names; stale rows for DELETED files are dropped on the way through.
    *
    * Returns (files newly indexed, files total after refresh).
    */
  def refresh(spark: SparkSession, tableDir: String, keyCol: String,
              keysPerFile: Long = DefaultKeysPerFile,
              fpp: Float = 0.01f): (Long, Long) = {
    val out = indexPath(tableDir, keyCol)
    val fs = new Path(out).getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(out))) {
      val n = build(spark, tableDir, keyCol, keysPerFile, fpp)
      return (n, n)
    }

    val df = spark.read.parquet(tableDir)
    // file listing straight off the FileIndex — no Spark job; formatted
    // identically to the scan-time input_file_name() the sidecar stores
    val current = df.inputFiles.toSet
    val old = load(spark, tableDir, keyCol)
    val known = old.select("file").collect().map(_.getString(0)).toSet
    val newFiles = (current -- known).toSeq.sorted
    // semi-join, not isin: at O(100k) files an isin literal list is a
    // 100k-node expression tree; the file list broadcasts as one small table
    import spark.implicits._
    val kept = old.join(
      broadcast(current.toSeq.toDF("file")), Seq("file"), "left_semi")

    val refreshed =
      if (newFiles.isEmpty) kept
      else {
        val newRows = spark.read.option("basePath", tableDir)
          .parquet(newFiles: _*)
          .select(input_file_name().as("file"), col(keyCol).cast("string").as("__k"))
          .groupBy(col("file"))
          .agg(
            count(lit(1)).as("nrows"),
            min(col("__k")).as("min_key"),
            max(col("__k")).as("max_key"),
            bloom_sketch(col("__k"), keysPerFile, fpp).as("bloom"))
        kept.unionByName(newRows)
      }
    // stage then swap: the sidecar is its own source, so never overwrite in
    // place. Aside-then-rename (not delete-then-rename, ADVICE r5): the old
    // index moves ASIDE first, so a crash between the two renames leaves
    // either the old or the new index recoverable on disk — never a window
    // with no sidecar at all; the aside copy is deleted only after the new
    // index is in place.
    val tmp = out + ".staging"
    val aside = out + ".old"
    refreshed.write.mode(SaveMode.Overwrite).parquet(tmp)
    fs.delete(new Path(aside), true) // clear any stale aside from a prior crash
    require(fs.rename(new Path(out), new Path(aside)), s"sidecar aside failed: $out -> $aside")
    val swapped = fs.rename(new Path(tmp), new Path(out))
    if (!swapped) {
      // roll the old index back rather than leaving no sidecar
      fs.rename(new Path(aside), new Path(out))
      throw new java.io.IOException(s"sidecar swap failed: $tmp -> $out (old index restored)")
    }
    fs.delete(new Path(aside), true)
    (newFiles.size.toLong, load(spark, tableDir, keyCol).count())
  }

  /** Data files whose `[min_key, max_key]` zone overlaps `[lo, hi]`
    * (string collation — exact for fixed-width key renderings, superset
    * otherwise; the exact filter downstream keeps results right).
    */
  def prunedFilesRange(spark: SparkSession, tableDir: String, keyCol: String,
                       lo: String, hi: String): Seq[String] =
    load(spark, tableDir, keyCol)
      .filter(col("min_key") <= hi && col("max_key") >= lo)
      .select(col("file")).collect().map(_.getString(0)).toSeq.sorted

  /** Range scan through the zone maps: read only overlapping files, then
    * the exact range filter on the ORIGINAL column type.
    */
  def readRange(spark: SparkSession, tableDir: String, keyCol: String,
                lo: String, hi: String): DataFrame = {
    val files = prunedFilesRange(spark, tableDir, keyCol, lo, hi)
    val df =
      if (files.isEmpty) spark.read.parquet(tableDir).limit(0)
      else spark.read.option("basePath", tableDir).parquet(files: _*)
    df.filter(col(keyCol).cast("string") >= lo && col(keyCol).cast("string") <= hi)
  }

  /** Data files whose index row can match ANY of `values`: Bloom probe
    * OR'd per value, cheap range check (`min_key <= v <= max_key`, string
    * collation — exact for fixed-width key renderings) applied first so
    * the Bloom only arbitrates in-range files. Collects file paths only.
    *
    * Sized for point/in-list lookups (values up to O(100s) — each value is
    * one probe expression per index row); a bulk probe set belongs in a
    * Bloom-semi-join against the data itself, not the file index.
    */
  def prunedFiles(spark: SparkSession, tableDir: String, keyCol: String,
                  values: Seq[String]): Seq[String] = {
    require(values.nonEmpty, "prunedFiles needs at least one lookup value")
    val idx = load(spark, tableDir, keyCol)
    val anyMatch = values.map { v =>
      col("min_key") <= v && col("max_key") >= v &&
        bloom_might_contain(col("bloom"), lit(v))
    }.reduce(_ || _)
    idx.filter(anyMatch).select(col("file"))
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** Point/in-list lookup through the index: read only surviving files
    * (with `basePath` set, so partition directory columns survive), then
    * apply the EXACT filter — false positives never surface.
    *
    * Returns an empty-but-schema-correct frame when no file can match.
    */
  def readPruned(spark: SparkSession, tableDir: String, keyCol: String,
                 values: Seq[String]): DataFrame = {
    val files = prunedFiles(spark, tableDir, keyCol, values)
    val base = spark.read.option("basePath", tableDir)
    val df =
      if (files.isEmpty)
        spark.read.parquet(tableDir).limit(0)
      else base.parquet(files: _*)
    df.filter(col(keyCol).cast("string").isin(values: _*))
  }

  /** Skip-rate observability: (files total, files a lookup would read). */
  def pruneStats(spark: SparkSession, tableDir: String, keyCol: String,
                 values: Seq[String]): (Long, Long) = {
    val total = load(spark, tableDir, keyCol).count()
    (total, prunedFiles(spark, tableDir, keyCol, values).size.toLong)
  }
}
