package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental transitive near-dup cluster maintenance over a GROWING
  * edge stream — the online counterpart of
  * [[graft.ops.Dedup.resolveClusters]], with the same min-id
  * representative contract: after any sequence of [[update]] calls the
  * [[mapping]] is row-for-row equal to a batch `resolveClusters` over the
  * union of all edges seen so far.
  *
  * Per micro-batch the star rounds run on the DELTA subgraph only: each
  * new edge's endpoints are first rewritten to their current
  * representatives (a join against the mapping — unseen nodes stay
  * themselves), so the graph handed to the resolver contains one node per
  * TOUCHED component plus the genuinely new ids, never the full
  * accumulated edge set. Untouched components cost nothing beyond the
  * endpoint-rewrite join. The only full-mapping pass is the rep-remap
  * join applying component merges — a narrow (id, rep) hash join that a
  * broadcast covers whenever the batch touched few components.
  *
  * Intended wiring is `foreachBatch` (cluster resolution is join-shaped —
  * per-key `mapGroupsWithState` cannot express a component merge):
  *
  * {{{
  * val state = new IncrementalClusters(spark)
  * edgeStream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
  *   state.update(batch)
  * }.start()
  * }}}
  *
  * The mapping is pinned (checkpoint when the session has a checkpoint
  * dir, localCheckpoint otherwise — same policy as the batch resolver)
  * so lineage stays one batch deep; the previous state's blocks are
  * released after each update. Not thread-safe: `foreachBatch` calls
  * arrive serially, which is exactly the contract.
  */
final class IncrementalClusters(idACol: String = "id_a", idBCol: String = "id_b") {

  private var state: Option[DataFrame] = None

  private def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)

  /** The current (id, rep_id) mapping over every node seen in any edge so
    * far; None before the first batch.
    */
  def mapping: Option[DataFrame] = state

  /** Fold one micro-batch of edges into the mapping; returns the updated
    * mapping (also available as [[mapping]]).
    */
  def update(newEdges: DataFrame): DataFrame = {
    val e = newEdges
      .filter(col(idACol).isNotNull && col(idBCol).isNotNull)
      .select(col(idACol).as("a"), col(idBCol).as("b"))
    val next = state match {
      case None => pin(Dedup.resolveClusters(e, "a", "b"))
      case Some(m) =>
        // endpoints → current representatives; unseen nodes stand for
        // themselves. An edge whose endpoints already share a rep
        // collapses here and costs nothing downstream.
        val ra = m.select(col("id").as("a"), col("rep_id").as("__ra"))
        val rb = m.select(col("id").as("b"), col("rep_id").as("__rb"))
        val repEdges = e
          .join(ra, Seq("a"), "left").join(rb, Seq("b"), "left")
          .select(coalesce(col("__ra"), col("a")).as("id_a"),
            coalesce(col("__rb"), col("b")).as("id_b"))
        // delta resolve: nodes are touched-component reps + new ids only.
        // Min-id reps compose: the min over merged components' reps IS
        // the min over their member union, so the incremental rep equals
        // the batch rep.
        val delta = Dedup.resolveClusters(repEdges)
        val remap = delta.select(col("id").as("rep_id"), col("rep_id").as("__new_rep"))
        val updatedOld = m.join(remap, Seq("rep_id"), "left")
          .select(col("id"), coalesce(col("__new_rep"), col("rep_id")).as("rep_id"))
        val newNodes = delta.join(m.select(col("id")), Seq("id"), "left_anti")
          .select(col("id"), col("rep_id"))
        pin(updatedOld.unionByName(newNodes))
    }
    state.foreach(_.unpersist())
    state = Some(next)
    next
  }
}
