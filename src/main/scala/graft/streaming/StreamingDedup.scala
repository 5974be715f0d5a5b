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

  /** Event-time-TTL'd exact first-seen: a fingerprint's "seen" marker
    * expires `ttlMs` after its LATEST sighting's event time (watermark-
    * driven, so expiry is deterministic and replay-safe — no wall-clock
    * dependence), after which the same content is re-admitted once. This
    * is the standard bounded deployment knob for [[firstSeenExact]]:
    * state holds only the fingerprints seen within the trailing TTL
    * window instead of growing with all-time distinct volume.
    *
    * Rows are (id, text, eventTime); `watermarkDelay` is how much event-
    * time lateness the stream tolerates (a `withWatermark` delay string,
    * e.g. "10 seconds").
    */
  def firstSeenExactTtl(docs: Dataset[(Long, String, java.sql.Timestamp)],
                        watermarkDelay: String, ttlMs: Long): Dataset[(Long, String)] = {
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val stEnc = Encoders.scalaBoolean
    implicit val keyEnc = Encoders.scalaLong
    docs.withWatermark("_3", watermarkDelay)
      .groupByKey { case (_, text, _) => TextShingles.fingerprint(text) }
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[(Long, String, java.sql.Timestamp)], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toVector
            val maxTs = batch.iterator.map(_._3.getTime).max
            val seen = state.exists
            state.update(true)
            // expiry rides the latest sighting; clamp above the current
            // watermark (setting a timeout at-or-below it is illegal)
            state.setTimeoutTimestamp(
              math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            if (seen) Iterator.empty
            else batch.iterator.take(1).map(r => (r._1, r._2))
          }
      }
  }

  /** Bounded-state first-seen pass-through; state = one Bloom filter per
    * fingerprint shard. `nPerShard`/`p` size each shard filter for the
    * expected distinct count (total state = shards × shard filter bytes).
    *
    * Sizing: the state store round-trips one shard blob per micro-batch
    * per active shard, so prefer MANY SMALL shards — keep `nPerShard` at
    * ~10^6 (≈1.2 MB at p=0.01) and scale out via `shards`; a single
    * nPerShard=10^8 shard would serde ~120 MB every batch for the same
    * capacity. A shard whose batch admits nothing skips the state write
    * entirely (the filter is unchanged), so duplicate-heavy steady state
    * pays no serde at all.
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
          var added = false
          val out = rows.filter { case (_, text) =>
            val fpBytes = java.nio.ByteBuffer.allocate(8)
              .putLong(TextShingles.fingerprint(text)).array()
            val seen = filter.contains(fpBytes)
            if (!seen) { filter.add(fpBytes); added = true }
            !seen
          }.toVector
          if (added) state.update(filter.serialize())
          out.iterator
      }
  }

  /** Event-time-TTL'd bounded-state dedup via TWO-GENERATION Bloom
    * rotation: each shard's state is (window, prevGen, currGen); a
    * fingerprint counts as seen if EITHER generation contains it, and
    * inserts go to the current generation. Every `ttlMs` of event time
    * the generations rotate (curr→prev, fresh curr), so content is
    * remembered for between ttl and 2·ttl after its last insertion and
    * then re-admitted — while shard state stays ≤ 2 filter blobs no
    * matter how long the stream runs (vs [[firstSeenBloom]], whose
    * filters only ever fill). Shards idle for ≥ 2 windows are dropped by
    * an event-time timeout and rebuilt empty on next use.
    *
    * Guarantees: duplicates within 1·ttl of the first sighting NEVER
    * pass (both-generation check, zero false negatives); genuinely-new
    * content is wrongly dropped with probability ≤ the filters' p.
    */
  def firstSeenBloomTtl(docs: Dataset[(Long, String, java.sql.Timestamp)],
                        shards: Int, nPerShard: Long, p: Float,
                        watermarkDelay: String, ttlMs: Long): Dataset[(Long, String)] = {
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val stEnc =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY, Encoders.BINARY)
    implicit val keyEnc = Encoders.scalaLong
    docs.withWatermark("_3", watermarkDelay)
      .groupByKey { case (_, text, _) =>
        java.lang.Math.floorMod(TextShingles.fingerprint(text), shards.toLong)
      }
      .flatMapGroupsWithState[(Long, Array[Byte], Array[Byte]), (Long, String)](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[(Long, Array[Byte], Array[Byte])]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            def fresh() = BloomSketch.empty(nPerShard, p)
            var (win, prev, curr) = state.getOption
              .map { case (w, pb, cb) =>
                (w, BloomSketch.deserialize(pb), BloomSketch.deserialize(cb))
              }
              .getOrElse((Long.MinValue, fresh(), fresh()))
            val out = rows.filter { case (_, text, ts) =>
              val w = java.lang.Math.floorDiv(ts.getTime, ttlMs)
              if (win == Long.MinValue) win = w
              if (w > win) {
                // rotate once per elapsed window; a gap ≥ 2 clears both
                if (w == win + 1) { prev = curr; curr = fresh() }
                else { prev = fresh(); curr = fresh() }
                win = w
              }
              // late rows (w < win) just check membership — never rotate
              // backwards (rotation is monotone in event time)
              val fpb = java.nio.ByteBuffer.allocate(8)
                .putLong(TextShingles.fingerprint(text)).array()
              val seen = prev.contains(fpb) || curr.contains(fpb)
              if (!seen) curr.add(fpb)
              !seen
            }.toVector
            state.update((win, prev.serialize(), curr.serialize()))
            // idle-shard cleanup: both generations are stale once the
            // watermark passes the end of window win+1
            state.setTimeoutTimestamp(
              math.max((win + 2) * ttlMs, state.getCurrentWatermarkMs() + 1))
            out.iterator.map(r => (r._1, r._2))
          }
      }
  }
}
