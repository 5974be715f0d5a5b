package graft.streaming

import graft.core.BloomSketch
import graft.expr.TextShingles
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication over a document stream — the online
  * counterpart of [[graft.ops.Dedup.exactDedup]], keyed by the SAME
  * 64-bit content fingerprint ([[TextShingles.fingerprint]]) so stream
  * and batch agree on what "duplicate content" means.
  *
  * Two state regimes for the 10^12-document deployment:
  *
  *  - [[firstSeenExact]]: state = one boolean per distinct fingerprint
  *    (Spark's state store shards it by the group key). Exact: every
  *    duplicate is dropped, every first occurrence passes. State grows
  *    with distinct content — right when distinct volume is bounded or
  *    state-store backed by disk.
  *  - [[firstSeenBloom]]: state = one Bloom filter per fingerprint shard
  *    (`pmod(fp, shards)` groups). Bounded state (shards × filter bytes,
  *    configured for the expected distinct count). Zero false negatives
  *    in the filter ⇒ NO duplicate ever passes; the trade is the Bloom
  *    false-positive rate: ~p of genuinely-new documents are wrongly
  *    dropped as "seen" — the standard bounded-memory streaming-dedup
  *    trade, and the reason the filter's `p` is configurable per shard.
  *
  * Both emit the surviving (id, text) rows per micro-batch.
  */
object StreamingDedup {

  /** Exact first-seen pass-through; state = seen-marker per fingerprint. */
  def firstSeenExact(docs: Dataset[(Long, String)]): Dataset[(Long, String)] = {
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val stEnc = Encoders.scalaBoolean
    implicit val keyEnc = Encoders.scalaLong
    docs.groupByKey { case (_, text) => TextShingles.fingerprint(text) }
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, String)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // several copies can arrive in ONE batch: keep the first
            rows.take(1)
          }
      }
  }

  /** Bounded-state first-seen pass-through; state = one Bloom filter per
    * fingerprint shard. `nPerShard`/`p` size each shard filter for the
    * expected distinct count (total state = shards × shard filter bytes).
    */
  def firstSeenBloom(docs: Dataset[(Long, String)], shards: Int,
                     nPerShard: Long, p: Float): Dataset[(Long, String)] = {
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val stEnc = Encoders.BINARY
    implicit val keyEnc = Encoders.scalaLong
    docs.groupByKey { case (_, text) =>
        java.lang.Math.floorMod(TextShingles.fingerprint(text), shards.toLong)
      }
      .flatMapGroupsWithState[Array[Byte], (Long, String)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, String)], state: GroupState[Array[Byte]]) =>
          val filter = state.getOption.map(BloomSketch.deserialize)
            .getOrElse(BloomSketch.empty(nPerShard, p))
          val out = rows.filter { case (_, text) =>
            val fpBytes = java.nio.ByteBuffer.allocate(8)
              .putLong(TextShingles.fingerprint(text)).array()
            val seen = filter.contains(fpBytes)
            if (!seen) filter.add(fpBytes)
            !seen
          }.toVector
          state.update(filter.serialize())
          out.iterator
      }
  }
}
