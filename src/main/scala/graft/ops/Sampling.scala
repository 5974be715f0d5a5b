package graft.ops

import graft.functions.{bk_values, bottomk_sample, weighted_sample, ws_entries, ws_values}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audit sampling built on the bottom-k-by-hash sample
  * ([[graft.core.BkSample]]): "show me k example rows (per group)" as a
  * deterministic, mergeable, one-pass-plus-semi-join operator.
  *
  * Scale shape: pass 1 aggregates ids into one tiny blob per group (the
  * only shuffle is blobs); the sampled id set (≤ k·groups strings) then
  * drives a broadcast LEFT SEMI join that pulls the full rows — the big
  * table is scanned, never shuffled. Determinism: the same input multiset
  * yields the same sample at any parallelism, so audits are reproducible
  * across reruns and cluster sizes.
  */
object Sampling {

  /** ~`k` uniformly-sampled full rows per distinct value of `groupCol`
    * (or exactly min(k, distinct ids) ids' worth of rows; rows whose id
    * appears multiple times all return — sample by id, not by row).
    *
    * The per-group semi-join is keyed on BOTH (group, id): an id value
    * shared by several groups is an independent sampling decision in each
    * group, and only the (group, id) combinations actually sampled pull
    * their rows — never "sampled anywhere → returned everywhere".
    * The group key joins null-safely, so a NULL group samples like any
    * other group.
    */
  def exampleRows(df: DataFrame, idCol: String, k: Int,
                  groupCol: Option[String] = None): DataFrame = {
    val id = col(idCol).cast("string").as("__graft_id")
    groupCol match {
      case Some(g) =>
        val sampled = df.select(col(g).as("__graft_g"), id)
          .groupBy(col("__graft_g"))
          .agg(bk_values(bottomk_sample(col("__graft_id"), k)).as("__graft_vals"))
        val ids = sampled.select(col("__graft_g"),
          explode(col("__graft_vals")).as("__graft_id"))
        df.join(broadcast(ids.distinct()),
          col(idCol).cast("string") === col("__graft_id") &&
            df(g) <=> col("__graft_g"), "left_semi")
      case None =>
        val sampled = df.select(id)
          .agg(bk_values(bottomk_sample(col("__graft_id"), k)).as("__graft_vals"))
        val ids = sampled.select(explode(col("__graft_vals")).as("__graft_id"))
        df.join(broadcast(ids.distinct()),
          col(idCol).cast("string") === col("__graft_id"), "left_semi")
    }
  }

  /** Weighted [[exampleRows]]: ids sampled with probability scaling with
    * `weightCol` (Efraimidis-Spirakis A-Res — "show me k example
    * documents per language, weighted by token count"). Same plan shape:
    * one blob pass, then a broadcast semi-join keyed on (group, id).
    *
    * Duplicate-id contract: an id appearing on several rows takes its
    * MAX observed weight — NOT the sum (accumulating duplicate weights
    * would break the sample's mergeability: an evicted key's partial
    * weight would be lost). For per-id-constant weights (the common
    * case: one weight per document) max IS the weight; to sample by
    * TOTAL weight across rows, use [[weightedSampleByTotal]].
    * Rows with non-positive weight never sample.
    */
  def exampleRowsWeighted(df: DataFrame, idCol: String, weightCol: String, k: Int,
                          groupCol: Option[String] = None): DataFrame = {
    val id = col(idCol).cast("string").as("__graft_id")
    val w = col(weightCol).cast("long").as("__graft_w")
    groupCol match {
      case Some(g) =>
        val sampled = df.select(col(g).as("__graft_g"), id, w)
          .groupBy(col("__graft_g"))
          .agg(ws_values(weighted_sample(col("__graft_id"), col("__graft_w"), k)).as("__graft_vals"))
        val ids = sampled.select(col("__graft_g"),
          explode(col("__graft_vals")).as("__graft_id"))
        df.join(broadcast(ids.distinct()),
          col(idCol).cast("string") === col("__graft_id") &&
            df(g) <=> col("__graft_g"), "left_semi")
      case None =>
        val sampled = df.select(id, w)
          .agg(ws_values(weighted_sample(col("__graft_id"), col("__graft_w"), k)).as("__graft_vals"))
        val ids = sampled.select(explode(col("__graft_vals")).as("__graft_id"))
        df.join(broadcast(ids.distinct()),
          col(idCol).cast("string") === col("__graft_id"), "left_semi")
    }
  }

  /** A-Res sample of up to `k` distinct keys weighted by their TOTAL
    * weight across all rows — "sample k domains by total bytes" when the
    * weight is per-ROW, not per-key. This is the sum-semantics
    * complement to [[graft.functions.weighted_sample]]'s distinct-key
    * MAX contract: a pre-aggregation (`groupBy(key).sum(w)` — partial-
    * aggregating, one shuffle of narrow (key, partial-sum) rows) makes
    * each key's weight its exact total, then the deterministic weighted
    * sample runs over the per-key totals.
    *
    * Returns `(keyCol string, total_weight long)` in priority order.
    * Rows with null/non-positive total never sample.
    */
  def weightedSampleByTotal(df: DataFrame, keyCol: String, weightCol: String,
                            k: Int): DataFrame = {
    val totals = df
      .select(col(keyCol).cast("string").as("__graft_k"),
        col(weightCol).cast("long").as("__graft_w"))
      .groupBy(col("__graft_k"))
      .agg(sum(col("__graft_w")).as("__graft_tw"))
    totals
      .agg(ws_entries(weighted_sample(col("__graft_k"), col("__graft_tw"), k)).as("__graft_e"))
      .select(explode(col("__graft_e")).as("__graft_e"))
      .select(col("__graft_e.key").as(keyCol),
        col("__graft_e.weight").as("total_weight"))
  }
}
