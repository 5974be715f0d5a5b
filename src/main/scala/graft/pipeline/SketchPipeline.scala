package graft.pipeline

import graft.core.BloomSketch
import graft.functions._
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One partial sketch with per-partition lineage + metrics (north-rule
  * requirement: per-partition lineage and update-count metrics, plus
  * checkpoint/resume of partial states).
  */
case class SketchPart(
    partition_id: Int,
    input_files: Seq[String],
    update_count: Long,
    build_millis: Long,
    sketch: Array[Byte])

/** Production pipeline patterns around the sketch aggregates:
  *
  *  - '''Salted two-level aggregation''' for hot-key skew (Zipf `lang`/
  *    `url` distributions at web scale): stage 1 groups by
  *    `(key, hash(value) mod S)` so a hot key's rows spread over S reducer
  *    tasks; stage 2 merges the S partial blobs per key. Lossless because
  *    the sketch merges are exact monoids (SURVEY §2.6) — asserted equal to
  *    the unsalted build in tests.
  *
  *  - '''Per-partition partial sketches with lineage''': `mapPartitions`
  *    emitting `(partitionId, inputFiles, updateCount, buildMillis, blob)` —
  *    the observability/metrics table for a 10^12-row run.
  *
  *  - '''Checkpoint/resume''': the input file list is split into groups;
  *    each group's partial sketch is written to its own parquet dir
  *    (atomic per group via overwrite + `_SUCCESS`). A killed job re-runs
  *    only missing groups; the final merge is a blob re-aggregation.
  *    Replays are safe: re-running a group overwrites its own output
  *    deterministically, so additive counters never double-count.
  */
object SketchPipeline {

  /** Stage-1/stage-2 salted group-by sketch: equivalent to
    * `df.groupBy(groupCol).agg(agg)` but immune to hot groups.
    *
    * @param saltBuckets number of salt partitions per group; size so that
    *   (hottest-group rows / saltBuckets) fits one task comfortably.
    */
  def saltedGroupByBloom(df: DataFrame, groupCol: String, keyCol: String,
                         n: Long, p: Float, saltBuckets: Int): DataFrame = {
    df.groupBy(col(groupCol), pmod(xxhash64(col(keyCol)), lit(saltBuckets)).as("__salt"))
      .agg(bloom_sketch(col(keyCol), n, p).as("__partial"))
      .groupBy(col(groupCol))
      .agg(bloom_merge(col("__partial")).as("sketch"))
  }

  /** Same shape for any sketch aggregate + its merge aggregate. */
  def saltedGroupBy(df: DataFrame, groupCol: String, keyCol: String, saltBuckets: Int,
                    agg: Column => Column, merge: Column => Column): DataFrame = {
    df.groupBy(col(groupCol), pmod(xxhash64(col(keyCol)), lit(saltBuckets)).as("__salt"))
      .agg(agg(col(keyCol)).as("__partial"))
      .groupBy(col(groupCol))
      .agg(merge(col("__partial")).as("sketch"))
  }

  /** Per-partition partial Bloom sketches with lineage + metrics. Input
    * rows must carry the key in `keyCol` (string).
    */
  def partialBloomSketches(df: DataFrame, keyCol: String, n: Long, p: Float): Dataset[SketchPart] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("k"), input_file_name().as("f"))
      .as[(String, String)]
      .mapPartitions { it =>
        val t0 = System.nanoTime()
        val sketch = BloomSketch.empty(n, p)
        val files = scala.collection.mutable.LinkedHashSet.empty[String]
        var count = 0L
        it.foreach { case (k, f) =>
          if (k != null) { sketch.add(k); count += 1 }
          if (f != null && f.nonEmpty) files += f
        }
        val ms = (System.nanoTime() - t0) / 1000000L
        Iterator.single(SketchPart(TaskContext.getPartitionId(), files.toSeq, count, ms, sketch.serialize()))
      }
  }

  /** Merge a parts table (or dataset of partial blobs) into one filter. */
  def mergeParts(parts: DataFrame, blobCol: String = "sketch"): Array[Byte] =
    parts.agg(bloom_merge(col(blobCol)).as("sketch")).head.getAs[Array[Byte]]("sketch")

  /** Checkpointed, resumable Bloom build over a set of parquet files.
    *
    * The file list is split into `numGroups` deterministic groups; each
    * group is aggregated and its partial written to
    * `checkpointDir/group=<i>/`. On resume, groups whose `_SUCCESS` marker
    * exists are skipped. Returns the final merged blob.
    *
    * @param simulateFailureAfter test hook — throw after N groups, as a
    *   stand-in for a mid-job kill.
    */
  def buildBloomCheckpointed(
      spark: SparkSession,
      inputFiles: Seq[String],
      keyCol: String,
      n: Long,
      p: Float,
      checkpointDir: String,
      numGroups: Int,
      simulateFailureAfter: Int = Int.MaxValue): Array[Byte] =
    buildCheckpointed(spark, inputFiles,
      df => df.agg(bloom_sketch(col(keyCol).cast("string"), n, p).as("sketch")),
      parts => mergeParts(parts),
      checkpointDir, numGroups, simulateFailureAfter)

  /** Generic checkpoint/resume: any sketch build (or battery of builds) as
    * the per-group aggregation, any blob re-aggregation as the final merge
    * — e.g. `df => df.agg(hll_sketch(...).as("sketch"))` with
    * `parts => parts.agg(hll_merge_agg(col("sketch"))).head.getAs[...]`.
    * Group outputs are written atomically (overwrite + `_SUCCESS`); resume
    * skips completed groups, so replays never double-count (each group's
    * rows contribute to exactly one part file, rewritten whole).
    */
  def buildCheckpointed[A](
      spark: SparkSession,
      inputFiles: Seq[String],
      buildGroup: DataFrame => DataFrame,
      mergeGroups: DataFrame => A,
      checkpointDir: String,
      numGroups: Int,
      simulateFailureAfter: Int = Int.MaxValue): A = {
    require(inputFiles.nonEmpty, "no input files")
    val hconf = spark.sparkContext.hadoopConfiguration
    val groups = inputFiles.sorted.zipWithIndex.groupMap(_._2 % numGroups)(_._1).toSeq.sortBy(_._1)
    var processed = 0
    groups.foreach { case (gid, files) =>
      val dir = new org.apache.hadoop.fs.Path(s"$checkpointDir/group=$gid")
      val fs = dir.getFileSystem(hconf)
      val done = fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))
      if (!done) {
        if (processed >= simulateFailureAfter)
          throw new RuntimeException(s"simulated failure before group $gid")
        buildGroup(spark.read.parquet(files: _*))
          .withColumn("group_id", lit(gid))
          .write.mode(SaveMode.Overwrite).parquet(dir.toString)
        processed += 1
      }
    }
    // explicit per-group paths (not a glob): robust against partial/foreign
    // dirs under the checkpoint root
    val groupDirs = groups.map { case (gid, _) => s"$checkpointDir/group=$gid" }
    mergeGroups(spark.read.parquet(groupDirs: _*))
  }
}
