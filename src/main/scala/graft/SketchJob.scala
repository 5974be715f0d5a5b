package graft

import graft.functions._
import graft.pipeline.SketchPipeline
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The spark-submit entry point: build the full sketch battery over a
  * parquet/Iceberg-layout table of web pages, with optional per-group
  * sketches, salted two-level aggregation for hot keys, and per-partition
  * lineage/metrics output.
  *
  * {{{
  *   spark-submit --class graft.SketchJob \
  *     --master spark://... (or local[N]) \
  *     bloomspark.jar \
  *     --input  /data/webpages \
  *     --output /data/sketches \
  *     --key url --numeric-key len:text --group lang \
  *     --n 1000000000 --p 0.01 --salt 64 [--hasher poly31-mix64]
  * }}}
  *
  * Output layout:
  *   `<output>/sketches/`  one row per group (or one global row):
  *       group key, bloom, hll, cms, tdigest, kll blobs + exact row count
  *   `<output>/lineage/`   per-partition build metrics
  *       (partition_id, input_files, update_count, build_millis)
  *
  * On a cluster the same jar + `--conf spark.sql.extensions=graft.GraftExtensions`
  * also registers every sketch function for pure-SQL use.
  */
object SketchJob {

  private case class Args(
      input: String = null,
      output: String = null,
      key: String = "url",
      numericKey: String = "len:text", // "len:<col>" or "col:<col>"
      group: Option[String] = None,
      n: Long = 1000000L,
      p: Float = 0.01f,
      salt: Int = 0,
      hasher: String = graft.core.FnvBloomHasher.id)

  private def parse(argv: Array[String]): Args = {
    var a = Args()
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "--input" => a = a.copy(input = argv(i + 1)); i += 2
        case "--output" => a = a.copy(output = argv(i + 1)); i += 2
        case "--key" => a = a.copy(key = argv(i + 1)); i += 2
        case "--numeric-key" => a = a.copy(numericKey = argv(i + 1)); i += 2
        case "--group" => a = a.copy(group = Some(argv(i + 1))); i += 2
        case "--n" => a = a.copy(n = argv(i + 1).toDouble.toLong); i += 2
        case "--p" => a = a.copy(p = argv(i + 1).toFloat); i += 2
        case "--salt" => a = a.copy(salt = argv(i + 1).toInt); i += 2
        case "--hasher" => a = a.copy(hasher = argv(i + 1)); i += 2
        case other => throw new IllegalArgumentException(s"unknown arg: $other")
      }
    }
    require(a.input != null && a.output != null, "--input and --output are required")
    a
  }

  private def numericCol(spec: String): Column = spec.split(":", 2) match {
    case Array("len", c) => length(col(c)).cast("double")
    case Array("col", c) => col(c).cast("double")
    case _ => throw new IllegalArgumentException(s"bad --numeric-key: $spec (want len:<col> or col:<col>)")
  }

  def main(argv: Array[String]): Unit = {
    val a = parse(argv)
    val spark = SparkSession.builder().appName("graft-sketch-job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.register(spark)

    val df = spark.read.parquet(a.input)
    val key = col(a.key).cast("string")
    val num = numericCol(a.numericKey)

    // `--hasher <id>`: the reference's set_hash_function at job level
    // (built-ins: fnv1a-seeded, poly31-mix64; custom ids need
    // BloomHasher.register on every executor via a library jar)
    val bloomHasher = graft.core.BloomHasher.lookup(a.hasher)

    def battery(kc: Column): Seq[Column] = Seq(
      bloom_sketch(kc, a.n, a.p, bloomHasher).as("bloom"),
      hll_sketch(kc, 14).as("hll"),
      theta_sketch(kc, 4096).as("theta"), // distinct WITH set algebra across runs/groups
      cms_sketch(kc, 0.0001, 0.01).as("cms"),
      mg_sketch(kc, 64).as("mg"), // hot keys + counts, single pass, no groupBy
      bottomk_sample(kc, 100).as("bk"), // uniform audit sample of distinct keys
      // weighted audit sample: inclusion scales with the numeric metric
      weighted_sample(kc, greatest(num.cast("long"), lit(1L)), 100).as("ws"),

      tdigest_sketch(num, 100.0).as("tdigest"),
      kll_sketch(num, 200).as("kll"),
      count(lit(1)).as("rows"))

    val sketches: DataFrame = (a.group, a.salt) match {
      case (None, _) =>
        df.coalesce(spark.sparkContext.defaultParallelism)
          .agg(battery(key).head, battery(key).tail: _*)
      case (Some(g), 0) =>
        df.groupBy(col(g)).agg(battery(key).head, battery(key).tail: _*)
      case (Some(g), s) =>
        // salted two-level: hot groups spread over s reducers in stage 1,
        // exact blob re-merge in stage 2 (lossless — merge monoids)
        val stage1 = df
          .groupBy(col(g), pmod(xxhash64(key), lit(s)).as("__salt"))
          .agg(battery(key).head, battery(key).tail: _*)
        stage1.groupBy(col(g)).agg(
          bloom_merge(col("bloom")).as("bloom"),
          hll_merge_agg(col("hll")).as("hll"),
          theta_merge(col("theta")).as("theta"),
          cms_merge(col("cms")).as("cms"),
          mg_merge(col("mg")).as("mg"),
          bk_merge(col("bk")).as("bk"),
          ws_merge(col("ws")).as("ws"),
          tdigest_merge(col("tdigest")).as("tdigest"),
          kll_merge(col("kll")).as("kll"),
          sum(col("rows")).as("rows"))
    }
    sketches.write.mode(SaveMode.Overwrite).parquet(s"${a.output}/sketches")

    // per-partition lineage + update-count metrics (north-rule observability)
    SketchPipeline.partialBloomSketches(df, a.key, a.n, a.p)
      .drop("sketch")
      .write.mode(SaveMode.Overwrite).parquet(s"${a.output}/lineage")

    val out = spark.read.parquet(s"${a.output}/sketches")
    println(s"[graft] wrote ${out.count} sketch row(s) to ${a.output}/sketches")
    spark.stop()
  }
}
