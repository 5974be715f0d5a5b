package graft.ops

import graft.core.CmsSketch
import graft.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CMS-driven heavy hitters: all keys with frequency ≥ phi·N, EXACTLY.
  *
  * The 100-TB problem: an exact `groupBy(key).count` over 10^12 rows with
  * billions of distinct keys shuffles everything. The count-min sketch's
  * one-sided error (`true ≤ est ≤ true + eps·N` w.p. 1-δ, Cormode &
  * Muthukrishnan 2005) makes the CMS candidate set a GUARANTEED superset
  * of the true heavy hitters, so:
  *
  *  1. one aggregation builds the CMS (small, broadcastable blob);
  *  2. a map-side codegen'd `cms_query` filter keeps only rows whose key
  *     *might* be heavy — with `eps < phi - maxLightFreq/N` the surviving
  *     fraction is ~the heavy mass, so the groupBy shuffle moves a sliver
  *     of the corpus;
  *  3. an exact count over the survivors drops the CMS false positives.
  *
  * The filter is a pure function of the key, so every row of a candidate
  * key survives and the final counts are EXACT — the result equals
  * `GROUP BY key HAVING count(*) >= ceil(phi*N)` (the oracle query),
  * never an approximation. N comes from the blob's own totalCount
  * (no extra count job).
  */
object HeavyHitters {

  /** Keys of `df(keyCol)` with exact frequency ≥ ceil(phi·N), as
    * (key, cnt) with exact counts. `eps` trades sketch size against the
    * false-candidate fraction; keep `eps ≤ phi/10` so light keys rarely
    * clear the threshold.
    *
    * Broadcast lifetime: each call broadcasts the ~1 MB CMS blob (at the
    * default accuracy) and ties its lifetime to the RETURNED plan — the
    * executors' copies are reclaimed when the DataFrame is garbage, so a
    * long-lived session holding many results holds that many megabytes.
    * Callers that fully consume the result in one pass should prefer
    * [[exactMaterialized]], which collects the (small — heavy keys only)
    * result eagerly and destroys the broadcast before returning.
    */
  def exact(df: DataFrame, keyCol: String, phi: Double,
            eps: Double = 1e-4, delta: Double = 0.01): DataFrame =
    exactWithBroadcast(df, keyCol, phi, eps, delta)._1

  private def exactWithBroadcast(df: DataFrame, keyCol: String, phi: Double,
      eps: Double, delta: Double):
      (DataFrame, org.apache.spark.broadcast.Broadcast[Array[Byte]]) = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1), got $phi")
    // The input is scanned TWICE (CMS build, then the filtered exact
    // count). A nondeterministic source (rand()-derived key, unseeded
    // sample) would give the sketch a DIFFERENT row set than the count
    // sees, voiding the one-sided superset guarantee — refuse outright,
    // same policy as graft.plans.RuntimeBloomJoin's build side.
    // (optimizedPlan, not analyzed: a cached input shows up here as an
    // InMemoryRelation leaf — the documented remedy — while the analyzed
    // plan would still carry the original rand() and refuse it)
    require(df.queryExecution.optimizedPlan
        .find(n => n.expressions.exists(!_.deterministic)).isEmpty,
      "HeavyHitters.exact requires a deterministic input: the plan is " +
        "executed twice (CMS build + exact count) and a nondeterministic " +
        "source voids the candidate-superset guarantee. Materialize the " +
        "input (cache/checkpoint/write) first.")
    val key = col(keyCol)
    val blob = df.agg(cms_sketch(key, eps, delta)).head.getAs[Array[Byte]](0)
    val n = CmsSketch.deserialize(blob).totalCount
    val thresh = math.ceil(phi * n).toLong
    // the blob rides a REAL broadcast variable, not a plan literal: at the
    // default accuracy it is ~1 MB, and a lit() would embed it in every
    // serialized task binary of the probe stage ("Broadcasting large task
    // binary" warnings); the broadcast handle keeps tasks bytes-sized and
    // each executor fetches one copy
    val bcast = df.sparkSession.sparkContext.broadcast(blob)
    (df.filter(cms_query_broadcast(bcast, key) >= thresh)
      .groupBy(key)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thresh), bcast)
  }

  /** [[exact]] with an eager, bounded-lifetime broadcast: the heavy-key
    * result (≤ 1/phi rows by definition) is materialized driver-side, the
    * CMS broadcast destroyed, and the rows returned as a fresh local
    * DataFrame — the right call for one-shot consumers on a long-lived
    * session, where [[exact]]'s plan-tied broadcast would pin ~1 MB per
    * call until the caller drops the DataFrame.
    */
  def exactMaterialized(df: DataFrame, keyCol: String, phi: Double,
                        eps: Double = 1e-4, delta: Double = 0.01): DataFrame = {
    val (lazyResult, bcast) = exactWithBroadcast(df, keyCol, phi, eps, delta)
    val rows = lazyResult.collect().toIndexedSeq
    val out = df.sparkSession.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, lazyResult.schema)
    bcast.destroy()
    out
  }

  /** ONE-scan approximate heavy hitters via the Misra-Gries summary
    * ([[graft.core.MgSketch]]): the candidate keys and their bounded
    * counts live inside one small blob, so unlike [[exact]] there is no
    * second pass — the right call when the input is a stream, a
    * nondeterministic view, or when a second 100-TB scan is the cost that
    * matters.
    *
    * Returns `(key, cnt_lo, cnt_hi)` for every retained key whose upper
    * bound clears `phi·N`, with `cnt_lo ≤ true ≤ cnt_hi` and
    * `cnt_hi − cnt_lo = Δ ≤ N/(k+1)`. GUARANTEED to include every truly
    * phi-heavy key whenever `k ≥ 1/phi` (then `Δ ≤ N/(k+1) < phi·N ≤
    * true`, so a heavy key survives eviction AND its upper bound clears
    * the threshold); may also return near-heavy keys within Δ of the line
    * — the one-scan trade. Size `k` a few times `1/phi` to thin those.
    */
  def approx(df: DataFrame, keyCol: String, phi: Double, k: Int = 256): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1), got $phi")
    require(k >= math.ceil(1 / phi),
      s"k=$k cannot guarantee phi=$phi heavy hitters: need k >= ceil(1/phi)=${math.ceil(1 / phi).toInt}")
    val spark = df.sparkSession
    // no cast: the aggregate's byte path canonicalizes any hashable type
    val blob = df.agg(mg_sketch(col(keyCol), k))
      .head.getAs[Array[Byte]](0)
    val mg = graft.core.MgSketch.deserialize(blob)
    val thresh = phi * mg.totalCount
    val rows = mg.entries.toSeq.collect {
      case (key, lo) if lo + mg.errorBound >= thresh => (key, lo, lo + mg.errorBound)
    }
    import spark.implicits._
    rows.toDF(keyCol, "cnt_lo", "cnt_hi").orderBy(col("cnt_lo").desc, col(keyCol))
  }
}
