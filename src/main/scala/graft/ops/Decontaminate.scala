package graft.ops

import graft.functions._
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents whose character
  * n-grams overlap a held-out evaluation set (the standard n-gram
  * contamination check of the GPT-3 / PaLM / Llama training reports:
  * Brown et al. 2020 app. C, Touvron et al. 2023 §5).
  *
  * Shingling is the library's standard character n-gram transform (width
  * `w`, stride `s`, distinct per document) — identical to
  * [[Dedup.ngramJaccardPairs]], so contamination stats compose with the
  * near-dup machinery over the same fingerprint space. The BENCHMARK side
  * always shingles at stride 1 regardless of the corpus stride: a strided
  * probe set only collides with corpus shingles whose offsets agree
  * modulo the stride (a verbatim quote shifted by one character would
  * vanish), while a stride-1 bench set catches every corpus shingle of
  * any contiguous overlap ≥ `w + s - 1` chars. The eval suite is tiny, so
  * the denser bench set costs nothing; the corpus keeps its `1/s` shingle
  * discount — exactly where the volume is.
  *
  * Two probe paths, same stats:
  *
  *  - '''exact''' ([[overlapStats]]): the benchmark's distinct shingle set
  *    (benchmarks are MB-scale — tiny next to the corpus) broadcast-joins
  *    the exploded document shingles. One narrow `(id, count)` shuffle
  *    with map-side combine; the corpus is scanned once, column-pruned.
  *  - '''Bloom''' ([[overlapStatsBloom]]): a Bloom filter over the
  *    benchmark shingles rides a broadcast variable into a codegen'd
  *    per-row probe — `size(filter(shingles, probe))` — so the corpus
  *    pass is MAP-ONLY: no join, no explode, no shuffle at all. This is
  *    the 100-TB path. No false negatives (every truly contaminated
  *    n-gram is counted); false positives inflate a document's
  *    contaminated count by ≤ fpp per clean n-gram in expectation, so
  *    thresholded verdicts are a superset of the exact verdicts.
  */
object Decontaminate {

  /** Distinct character shingles of column `textCol` — width `w`, stride
    * `s`; the same transform as the n-gram dedup family (engine-portable:
    * the DuckDB oracle mirrors it verbatim).
    */
  def shingles(textCol: String, width: Int, step: Int): Column =
    array_distinct(expr(
      s"transform(sequence(1, greatest(length($textCol) - ${width - 1}, 1), $step), " +
        s"p -> substring($textCol, p, $width))"))

  /** Exact per-document contamination stats vs the benchmark set:
    * `(id, ngrams, contaminated, contamination_frac)` — one row per input
    * document (zero-overlap documents included with `contaminated = 0`).
    *
    * Plan shape: benchmark shingles are deduplicated and broadcast (an
    * eval suite is MBs, never corpus-scale); the document side explodes
    * its distinct shingles, semi-joins the broadcast map-side, and
    * aggregates `(id)` with partial counts — the only exchange is the
    * narrow `(id, n, hits)` stream.
    */
  def overlapStats(docs: DataFrame, idCol: String, textCol: String,
                   bench: DataFrame, benchTextCol: String,
                   width: Int = 16, step: Int = 4): DataFrame = {
    val benchSh = bench
      .select(explode(shingles(benchTextCol, width, 1)).as("sh"))
      .distinct()
    val withArr = docs.select(col(idCol).as("id"),
      shingles(textCol, width, step).as("__shs"))
    val exploded = withArr.select(col("id"), size(col("__shs")).as("n"),
      explode(col("__shs")).as("sh"))
    val hits = exploded
      .join(broadcast(benchSh), Seq("sh"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("hits"))
    withArr.select(col("id"), size(col("__shs")).cast("long").as("ngrams"))
      .join(hits, Seq("id"), "left_outer")
      .select(col("id"), col("ngrams"),
        coalesce(col("hits"), lit(0L)).as("contaminated"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          greatest(col("ngrams"), lit(1L)).cast("double")).as("contamination_frac"))
  }

  /** [[overlapStats]] plus a contamination verdict: flagged when at least
    * `minHits` benchmark n-grams appear OR the contaminated fraction
    * reaches `minFrac`.
    */
  def flag(docs: DataFrame, idCol: String, textCol: String,
           bench: DataFrame, benchTextCol: String,
           width: Int = 16, step: Int = 4,
           minHits: Long = 8L, minFrac: Double = 1.0): DataFrame =
    overlapStats(docs, idCol, textCol, bench, benchTextCol, width, step)
      .withColumn("flagged",
        col("contaminated") >= minHits || col("contamination_frac") >= minFrac)

  /** Build the benchmark-shingle Bloom filter blob (driver-side bytes —
    * an eval suite's distinct shingles are ~10^6-10^7 keys, a few MB of
    * filter). Feed it to [[overlapStatsBloom]] — or persist it and reuse
    * across every training corpus the benchmark must be checked against.
    */
  def buildBenchFilter(bench: DataFrame, benchTextCol: String,
                       width: Int = 16,
                       expectedNgrams: Long = 1000000L,
                       fpp: Float = 0.001f): Array[Byte] =
    bench.select(explode(shingles(benchTextCol, width, 1)).as("sh"))
      .distinct()
      .agg(bloom_sketch(col("sh"), expectedNgrams, fpp))
      .head.getAs[Array[Byte]](0)

  /** Map-only contamination stats at corpus scale: the benchmark filter
    * rides a real Spark broadcast into the fused
    * [[graft.expr.NgramBloomStats]] expression — one codegen'd pass per
    * document (distinct shingles + Bloom probes, no array
    * materialization); the plan has NO join, NO explode and NO shuffle.
    * Guarantees: `contaminated` here ≥ the exact count (no false
    * negatives), exceeding it only by Bloom false positives (≤ fpp per
    * clean n-gram in expectation).
    */
  def overlapStatsBloom(docs: DataFrame, idCol: String, textCol: String,
                        benchBlob: Array[Byte],
                        width: Int = 16, step: Int = 4): DataFrame = {
    val bcast = docs.sparkSession.sparkContext.broadcast(Array(benchBlob))
    val st = GraftSqlBridge.column(graft.expr.NgramBloomStats(
      GraftSqlBridge.expression(col(textCol)), width, step, bcast))
    docs.withColumn("__graft_nbs", st)
      .select(col(idCol).as("id"),
        col("__graft_nbs.ngrams").as("ngrams"),
        col("__graft_nbs.hits").as("contaminated"),
        (col("__graft_nbs.hits").cast("double") /
          greatest(col("__graft_nbs.ngrams"), lit(1L)).cast("double"))
          .as("contamination_frac"))
  }
}
