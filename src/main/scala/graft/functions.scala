package graft

import graft.agg._
import graft.expr._
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.DoubleType

/** Public DataFrame/Column API of the graft sketch library.
  *
  * {{{
  *   import graft.functions._
  *   pages.agg(bloom_sketch($"url", 1000000L, 0.01f).as("sk"))
  *   pages.groupBy($"lang").agg(hll_sketch($"url", 14).as("distinct_urls"))
  *   df.filter(bloom_might_contain(lit(blob), $"url"))
  * }}}
  */
object functions {

  private def col(e: Expression): Column = GraftSqlBridge.column(e)
  private def ex(c: Column): Expression = GraftSqlBridge.expression(c)

  // ----- aggregates -----

  /** Bloom filter over a string/binary column; reference geometry `(n, p)`. */
  def bloom_sketch(c: Column, estimatedElements: Long, fpp: Float): Column =
    col(BloomSketchAgg(ex(c), estimatedElements, fpp).toAggregateExpression())

  /** Bloom filter under a custom hash family — the UDAF surface of the
    * reference's `set_hash_function`. The family must be registered
    * ([[graft.core.BloomHasher.register]]) in every JVM that deserializes
    * the blobs; the two built-ins ("fnv1a-seeded", "poly31-mix64") always
    * are. From SQL: `bloom_sketch(col, n, p, 'poly31-mix64')`.
    */
  def bloom_sketch(c: Column, estimatedElements: Long, fpp: Float, hasher: graft.core.BloomHasher): Column =
    col(BloomSketchAgg(ex(c), estimatedElements, fpp, hasher).toAggregateExpression())

  /** Counting Bloom filter (supports removal / frequency floors). */
  def counting_bloom_sketch(c: Column, estimatedElements: Long, fpp: Float): Column =
    col(CountingBloomSketchAgg(ex(c), estimatedElements, fpp).toAggregateExpression())

  /** HyperLogLog distinct-count sketch; `m = 2^precision` registers. */
  def hll_sketch(c: Column, precision: Int = 14): Column =
    col(HllSketchAgg(ex(c), precision).toAggregateExpression())

  /** Count-min frequency sketch; `est <= true + eps*N` w.p. `1-delta`. */
  def cms_sketch(c: Column, eps: Double = 0.0001, delta: Double = 0.01): Column =
    col(CmsSketchAgg(ex(c), eps, delta).toAggregateExpression())

  /** Theta/KMV distinct sketch — supports set algebra (intersection /
    * difference) downstream, which HLL cannot; RSE ≈ 1/sqrt(k-1).
    */
  def theta_sketch(c: Column, nominalK: Int = 4096): Column =
    col(ThetaSketchAgg(ex(c), nominalK).toAggregateExpression())

  /** t-digest quantile sketch over a numeric column. */
  def tdigest_sketch(c: Column, compression: Double = 100.0): Column =
    col(TDigestSketchAgg(ex(c.cast(DoubleType)), compression).toAggregateExpression())

  /** KLL quantile sketch over a numeric column. */
  def kll_sketch(c: Column, k: Int = 200): Column =
    col(KllSketchAgg(ex(c.cast(DoubleType)), k).toAggregateExpression())

  /** Misra-Gries mergeable top-k frequency summary — single-pass heavy
    * hitters (the candidate keys live inside the blob, so no second scan).
    * Every key with frequency > N/(k+1) is guaranteed retained.
    */
  def mg_sketch(c: Column, k: Int = 64): Column =
    col(MgSketchAgg(ex(c), k).toAggregateExpression())

  /** Weighted Misra-Gries: heavy hitters by total weight (bytes per
    * domain, tokens per url); key with weight > W/(k+1) guaranteed kept.
    */
  def mg_sketch_weighted(c: Column, weight: Column, k: Int = 64): Column =
    col(MgWeightedSketchAgg(ex(c), ex(weight.cast("long")), k).toAggregateExpression())

  /** Bottom-k-by-hash distinct sample — mergeable uniform sample over the
    * distinct keys that RETAINS the values; bitwise deterministic at any
    * parallelism ("k example documents per group, one pass").
    */
  def bottomk_sample(c: Column, k: Int = 100): Column =
    col(BkSampleAgg(ex(c), k).toAggregateExpression())

  /** Efraimidis-Spirakis (IPL 2006, A-Res) weighted distinct sample: k
    * keys with inclusion probability scaling with weight, mergeable and
    * bitwise deterministic at any parallelism ("k example domains,
    * weighted by bytes"). Duplicates of a key take its MAX observed
    * weight — NOT the sum (summing would break mergeability: an evicted
    * key's partial weight would be lost); for per-key-constant weights
    * max IS the weight, and for "weight = total over rows" pre-aggregate
    * first ([[graft.ops.Sampling.weightedSampleByTotal]] does exactly
    * that). Non-positive weights are skipped.
    */
  def weighted_sample(c: Column, weight: Column, k: Int = 100): Column =
    col(WeightedSampleAgg(ex(c), ex(weight.cast("long")), k).toAggregateExpression())

  // ----- blob re-aggregation (stage 2 of salted / checkpointed builds) -----

  def bloom_merge(blob: Column): Column = col(SketchMergeAgg(ex(blob), BloomOps).toAggregateExpression())
  def theta_merge(blob: Column): Column = col(SketchMergeAgg(ex(blob), ThetaOps).toAggregateExpression())
  def counting_bloom_merge(blob: Column): Column = col(SketchMergeAgg(ex(blob), CountingBloomOps).toAggregateExpression())
  def hll_merge_agg(blob: Column): Column = col(SketchMergeAgg(ex(blob), HllOps).toAggregateExpression())
  def cms_merge(blob: Column): Column = col(SketchMergeAgg(ex(blob), CmsOps).toAggregateExpression())
  def tdigest_merge(blob: Column): Column = col(SketchMergeAgg(ex(blob), TDigestOps).toAggregateExpression())
  def kll_merge(blob: Column): Column = col(SketchMergeAgg(ex(blob), KllOps).toAggregateExpression())
  def mg_merge(blob: Column): Column = col(SketchMergeAgg(ex(blob), MgOps).toAggregateExpression())
  def bk_merge(blob: Column): Column = col(SketchMergeAgg(ex(blob), BkOps).toAggregateExpression())
  def ws_merge(blob: Column): Column = col(SketchMergeAgg(ex(blob), WsOps).toAggregateExpression())

  // ----- scalar probes -----

  def fnv1a_hash(c: Column, seed: Int = 0): Column = col(Fnv1aHash(ex(c), seed))

  def bloom_might_contain(blob: Column, key: Column): Column = col(BloomMightContain(ex(blob), ex(key)))
  def bloom_estimate_elements(blob: Column): Column = col(BloomEstimateElements(ex(blob)))
  def bloom_elements_added(blob: Column): Column = col(BloomElementsAdded(ex(blob)))
  def bloom_current_fpr(blob: Column): Column = col(BloomCurrentFpr(ex(blob)))
  def bloom_bits_set(blob: Column): Column = col(BloomBitsSet(ex(blob)))
  def bloom_to_hex(blob: Column): Column = col(BloomToHex(ex(blob)))
  def bloom_from_hex(hex: Column): Column = col(BloomFromHex(ex(hex)))
  def bloom_stats(blob: Column): Column = col(BloomStats(ex(blob)))
  def bloom_union(a: Column, b: Column): Column = col(BloomUnionExpr(ex(a), ex(b)))
  def bloom_intersect(a: Column, b: Column): Column = col(BloomIntersectExpr(ex(a), ex(b)))
  def bloom_jaccard(a: Column, b: Column): Column = col(BloomJaccard(ex(a), ex(b)))
  def bloom_union_bits(a: Column, b: Column): Column = col(BloomUnionBits(ex(a), ex(b)))
  def bloom_intersect_bits(a: Column, b: Column): Column = col(BloomIntersectBits(ex(a), ex(b)))

  def cbf_count(blob: Column, key: Column): Column = col(CbfCount(ex(blob), ex(key)))
  def cbf_subtract(a: Column, b: Column): Column = col(CbfSubtract(ex(a), ex(b)))

  def hll_estimate(blob: Column): Column = col(HllEstimate(ex(blob)))
  def hll_merge(a: Column, b: Column): Column = col(HllMergeExpr(ex(a), ex(b)))

  def theta_estimate(blob: Column): Column = col(ThetaEstimate(ex(blob)))
  def theta_union(a: Column, b: Column): Column = col(ThetaUnionExpr(ex(a), ex(b)))
  def theta_intersect(a: Column, b: Column): Column = col(ThetaIntersectExpr(ex(a), ex(b)))
  def theta_a_not_b(a: Column, b: Column): Column = col(ThetaANotB(ex(a), ex(b)))
  def theta_jaccard(a: Column, b: Column): Column = col(ThetaJaccard(ex(a), ex(b)))

  def cms_query(blob: Column, key: Column): Column = col(CmsQuery(ex(blob), ex(key)))

  /** Count-min probe against a blob held in a REAL broadcast variable —
    * use instead of `cms_query(lit(blob), key)` whenever the blob is
    * large (≥ ~100 KB): the plan/task binaries stay bytes-sized while
    * each executor torrent-fetches one blob copy.
    */
  def cms_query_broadcast(blob: org.apache.spark.broadcast.Broadcast[Array[Byte]],
                          key: Column): Column =
    col(CmsQueryBroadcast(ex(key), blob))
  def cms_total_count(blob: Column): Column = col(CmsTotalCount(ex(blob)))

  def tdigest_quantile(blob: Column, q: Double): Column =
    col(TDigestQuantile(ex(blob), Literal(q)))
  def kll_quantile(blob: Column, q: Double): Column = col(KllQuantile(ex(blob), Literal(q)))
  def kll_rank(blob: Column, x: Column): Column = col(KllRank(ex(blob), ex(x.cast(DoubleType))))

  def kll_boundaries(blob: Column, numBuckets: Int): Column =
    col(KllBoundaries(ex(blob), Literal(numBuckets)))

  def mg_estimate(blob: Column, key: Column): Column = col(MgEstimate(ex(blob), ex(key)))
  def mg_error_bound(blob: Column): Column = col(MgErrorBound(ex(blob)))
  def mg_total_count(blob: Column): Column = col(MgTotalCount(ex(blob)))
  def mg_topk(blob: Column, j: Int): Column = col(MgTopK(ex(blob), Literal(j)))
  def mg_entries(blob: Column): Column = col(MgEntries(ex(blob)))
  def bk_values(blob: Column): Column = col(BkValues(ex(blob)))
  def ws_values(blob: Column): Column = col(WsValues(ex(blob)))
  def ws_entries(blob: Column): Column = col(WsEntries(ex(blob)))

  // ----- embedding storage quantization -----

  /** Symmetric per-vector int8 quantization of an `array<float>` column:
    * 4× residency cut, reconstruction error ≤ scale/2 per component.
    */
  def vec_quantize_int8(v: Column): Column = col(VecQuantizeInt8(ex(v)))

  /** Inverse of [[vec_quantize_int8]]: `q_i * scale` per component. */
  def vec_dequantize_int8(sq: Column): Column = col(VecDequantizeInt8(ex(sq)))

  // ----- text sketches (dedup / fingerprinting) -----

  def minhash_signature(c: Column, numHashes: Int = 64, shingleWidth: Int = 3,
                        classicMaxShingles: Int = -1): Column =
    col(MinHashSignature(ex(c), numHashes, shingleWidth, classicMaxShingles))
  def simhash64(c: Column): Column = col(SimHash64(ex(c)))
  def hamming64(a: Column, b: Column): Column = col(Hamming64(ex(a), ex(b)))
  def doc_fingerprint(c: Column): Column = col(DocFingerprint(ex(c)))

  // ----- SQL registration -----

  // SQL-side numeric inputs are cast to double like the Scala API does
  // (a bigint column fed to kll_sketch should just work).
  private def asDouble(e: Expression): Expression =
    if (e.dataType == org.apache.spark.sql.types.DoubleType) e
    else org.apache.spark.sql.catalyst.expressions.Cast(e, org.apache.spark.sql.types.DoubleType)

  // SQL-side sketch params must be constants; fold them at resolution time
  // (handles plain literals, decimal literals, and CAST-wrapped constants).
  private def constVal(e: Expression, what: String): Any = {
    if (!e.foldable) throw new IllegalArgumentException(s"$what must be a constant, got $e")
    e.eval(null)
  }
  private def intLit(e: Expression, what: String): Int = constVal(e, what) match {
    case v: Int => v
    case v: Long => v.toInt
    case v: Short => v.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer constant, got $other")
  }
  private def longLit(e: Expression, what: String): Long = constVal(e, what) match {
    case v: Int => v.toLong
    case v: Long => v
    case other => throw new IllegalArgumentException(s"$what must be a long constant, got $other")
  }
  private def doubleLit(e: Expression, what: String): Double = constVal(e, what) match {
    case v: Double => v
    case v: Float => v.toDouble
    case v: org.apache.spark.sql.types.Decimal => v.toDouble
    case v: Int => v.toDouble
    case v: Long => v.toDouble
    case other => throw new IllegalArgumentException(s"$what must be a numeric constant, got $other")
  }

  private[graft] val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "bloom_sketch" -> ((es: Seq[Expression]) =>
      BloomSketchAgg(es(0), longLit(es(1), "n"), doubleLit(es(2), "p").toFloat,
        if (es.length > 3) graft.core.BloomHasher.lookup(String.valueOf(constVal(es(3), "hasher")))
        else graft.core.FnvBloomHasher).toAggregateExpression()),
    "counting_bloom_sketch" -> ((es: Seq[Expression]) =>
      CountingBloomSketchAgg(es(0), longLit(es(1), "n"), doubleLit(es(2), "p").toFloat).toAggregateExpression()),
    "hll_sketch" -> ((es: Seq[Expression]) =>
      HllSketchAgg(es(0), if (es.length > 1) intLit(es(1), "precision") else 14).toAggregateExpression()),
    "cms_sketch" -> ((es: Seq[Expression]) =>
      CmsSketchAgg(es(0), doubleLit(es(1), "eps"), doubleLit(es(2), "delta")).toAggregateExpression()),
    "tdigest_sketch" -> ((es: Seq[Expression]) =>
      TDigestSketchAgg(asDouble(es(0)), if (es.length > 1) doubleLit(es(1), "compression") else 100.0).toAggregateExpression()),
    "kll_sketch" -> ((es: Seq[Expression]) =>
      KllSketchAgg(asDouble(es(0)), if (es.length > 1) intLit(es(1), "k") else 200).toAggregateExpression()),
    "theta_sketch" -> ((es: Seq[Expression]) =>
      ThetaSketchAgg(es(0), if (es.length > 1) intLit(es(1), "k") else 4096).toAggregateExpression()),
    "theta_merge" -> ((es: Seq[Expression]) => SketchMergeAgg(es(0), ThetaOps).toAggregateExpression()),
    "theta_estimate" -> ((es: Seq[Expression]) => ThetaEstimate(es(0))),
    "theta_union" -> ((es: Seq[Expression]) => ThetaUnionExpr(es(0), es(1))),
    "theta_intersect" -> ((es: Seq[Expression]) => ThetaIntersectExpr(es(0), es(1))),
    "theta_a_not_b" -> ((es: Seq[Expression]) => ThetaANotB(es(0), es(1))),
    "theta_jaccard" -> ((es: Seq[Expression]) => ThetaJaccard(es(0), es(1))),
    "bloom_merge" -> ((es: Seq[Expression]) => SketchMergeAgg(es(0), BloomOps).toAggregateExpression()),
    "counting_bloom_merge" -> ((es: Seq[Expression]) => SketchMergeAgg(es(0), CountingBloomOps).toAggregateExpression()),
    "hll_merge_agg" -> ((es: Seq[Expression]) => SketchMergeAgg(es(0), HllOps).toAggregateExpression()),
    "cms_merge" -> ((es: Seq[Expression]) => SketchMergeAgg(es(0), CmsOps).toAggregateExpression()),
    "tdigest_merge" -> ((es: Seq[Expression]) => SketchMergeAgg(es(0), TDigestOps).toAggregateExpression()),
    "kll_merge" -> ((es: Seq[Expression]) => SketchMergeAgg(es(0), KllOps).toAggregateExpression()),
    "fnv1a_hash" -> ((es: Seq[Expression]) =>
      Fnv1aHash(es(0), if (es.length > 1) intLit(es(1), "seed") else 0)),
    "bloom_might_contain" -> ((es: Seq[Expression]) => BloomMightContain(es(0), es(1))),
    "bloom_estimate_elements" -> ((es: Seq[Expression]) => BloomEstimateElements(es(0))),
    "bloom_elements_added" -> ((es: Seq[Expression]) => BloomElementsAdded(es(0))),
    "bloom_current_fpr" -> ((es: Seq[Expression]) => BloomCurrentFpr(es(0))),
    "bloom_bits_set" -> ((es: Seq[Expression]) => BloomBitsSet(es(0))),
    "bloom_to_hex" -> ((es: Seq[Expression]) => BloomToHex(es(0))),
    "bloom_from_hex" -> ((es: Seq[Expression]) => BloomFromHex(es(0))),
    "bloom_stats" -> ((es: Seq[Expression]) => BloomStats(es(0))),
    "bloom_union" -> ((es: Seq[Expression]) => BloomUnionExpr(es(0), es(1))),
    "bloom_intersect" -> ((es: Seq[Expression]) => BloomIntersectExpr(es(0), es(1))),
    "bloom_jaccard" -> ((es: Seq[Expression]) => BloomJaccard(es(0), es(1))),
    "bloom_union_bits" -> ((es: Seq[Expression]) => BloomUnionBits(es(0), es(1))),
    "bloom_intersect_bits" -> ((es: Seq[Expression]) => BloomIntersectBits(es(0), es(1))),
    "cbf_count" -> ((es: Seq[Expression]) => CbfCount(es(0), es(1))),
    "cbf_subtract" -> ((es: Seq[Expression]) => CbfSubtract(es(0), es(1))),
    "hll_estimate" -> ((es: Seq[Expression]) => HllEstimate(es(0))),
    "hll_merge" -> ((es: Seq[Expression]) => HllMergeExpr(es(0), es(1))),
    "cms_query" -> ((es: Seq[Expression]) => CmsQuery(es(0), es(1))),
    "cms_total_count" -> ((es: Seq[Expression]) => CmsTotalCount(es(0))),
    "tdigest_quantile" -> ((es: Seq[Expression]) => TDigestQuantile(es(0), asDouble(es(1)))),
    "kll_quantile" -> ((es: Seq[Expression]) => KllQuantile(es(0), asDouble(es(1)))),
    "kll_rank" -> ((es: Seq[Expression]) => KllRank(es(0), asDouble(es(1)))),
    "mg_sketch" -> ((es: Seq[Expression]) =>
      MgSketchAgg(es(0), if (es.length > 1) intLit(es(1), "k") else 64).toAggregateExpression()),
    "mg_merge" -> ((es: Seq[Expression]) => SketchMergeAgg(es(0), MgOps).toAggregateExpression()),
    "mg_estimate" -> ((es: Seq[Expression]) => MgEstimate(es(0), es(1))),
    "mg_error_bound" -> ((es: Seq[Expression]) => MgErrorBound(es(0))),
    "mg_total_count" -> ((es: Seq[Expression]) => MgTotalCount(es(0))),
    "mg_topk" -> ((es: Seq[Expression]) => MgTopK(es(0), es(1))),
    "mg_entries" -> ((es: Seq[Expression]) => MgEntries(es(0))),
    "kll_boundaries" -> ((es: Seq[Expression]) => KllBoundaries(es(0), es(1))),
    "bottomk_sample" -> ((es: Seq[Expression]) =>
      BkSampleAgg(es(0), if (es.length > 1) intLit(es(1), "k") else 100).toAggregateExpression()),
    "bk_merge" -> ((es: Seq[Expression]) => SketchMergeAgg(es(0), BkOps).toAggregateExpression()),
    "bk_values" -> ((es: Seq[Expression]) => BkValues(es(0))),
    "mg_sketch_weighted" -> ((es: Seq[Expression]) =>
      MgWeightedSketchAgg(es(0),
        if (es(1).dataType == org.apache.spark.sql.types.LongType) es(1)
        else org.apache.spark.sql.catalyst.expressions.Cast(es(1), org.apache.spark.sql.types.LongType),
        if (es.length > 2) intLit(es(2), "k") else 64).toAggregateExpression()),
    "weighted_sample" -> ((es: Seq[Expression]) =>
      WeightedSampleAgg(es(0),
        if (es(1).dataType == org.apache.spark.sql.types.LongType) es(1)
        else org.apache.spark.sql.catalyst.expressions.Cast(es(1), org.apache.spark.sql.types.LongType),
        if (es.length > 2) intLit(es(2), "k") else 100).toAggregateExpression()),
    "ws_merge" -> ((es: Seq[Expression]) => SketchMergeAgg(es(0), WsOps).toAggregateExpression()),
    "ws_values" -> ((es: Seq[Expression]) => WsValues(es(0))),
    "ws_entries" -> ((es: Seq[Expression]) => WsEntries(es(0))),
    "vec_quantize_int8" -> ((es: Seq[Expression]) => VecQuantizeInt8(es(0))),
    "vec_dequantize_int8" -> ((es: Seq[Expression]) => VecDequantizeInt8(es(0))))

  /** Register all graft functions in a session's catalog for SQL use. */
  def register(spark: SparkSession): Unit = sqlFunctions.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
  }
}

/** `SparkSessionExtensions` hook — for cluster deployment via
  * `spark.sql.extensions=graft.GraftExtensions` (spark-submit path).
  * Injects the SQL functions plus the [[graft.plans.RuntimeBloomJoin]]
  * optimizer rule (off until `spark.graft.runtimeBloomJoin.enabled`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    functions.sqlFunctions.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (es: Seq[Expression]) => builder(es)))
    }
    e.injectPreCBORule(graft.plans.RuntimeBloomJoin)
  }
}
