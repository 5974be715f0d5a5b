package graft.streaming

import graft.core.{BloomSketch, HllSketch}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental sketch maintenance over Structured Streaming.
  *
  * The batch merge monoid drops into `flatMapGroupsWithState` unchanged
  * (SURVEY §2.10): per group, the state is the serialized sketch blob;
  * each micro-batch folds its rows into the deserialized state and emits
  * the updated blob. Because the fold is the same `add`/`mergeInPlace`
  * used by the batch UDAFs, a stream processed in any micro-batch split
  * produces the same final Bloom/HLL blob as one batch build — asserted
  * in `StreamingSketchSpec` with `MemoryStream`.
  *
  * State size per group = one blob (m/8 bytes for Bloom, 2^p for HLL);
  * at 10^12-row scale keep per-group capacity bounded and group count
  * moderate, or checkpoint partials to a parts table instead (batch path).
  */
object StreamingSketch {

  /** One updated row per (group, micro-batch). */
  case class SketchUpdate(group: String, sketch: Array[Byte], elementsAdded: Long)

  /** Fold a keyed string stream into per-group Bloom filters.
    * Input: (group, key). Output stream of [[SketchUpdate]] per batch.
    */
  def bloomPerGroup(keyed: Dataset[(String, String)], n: Long, p: Float): Dataset[SketchUpdate] = {
    implicit val updEnc = Encoders.product[SketchUpdate]
    implicit val strEnc = Encoders.STRING
    implicit val binEnc = Encoders.BINARY
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Byte], SketchUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (group: String, rows: Iterator[(String, String)], state: GroupState[Array[Byte]]) =>
          val sketch = state.getOption.map(BloomSketch.deserialize)
            .getOrElse(BloomSketch.empty(n, p))
          rows.foreach { case (_, k) => if (k != null) sketch.add(k) }
          val blob = sketch.serialize()
          state.update(blob)
          Iterator.single(SketchUpdate(group, blob, sketch.elementsAdded))
      }
  }

  /** Generic per-group sketch fold — the same `flatMapGroupsWithState`
    * shape for ANY graft sketch: `empty` builds the fresh per-group
    * state, `add` folds one key, serde round-trips the state-store blob,
    * `metric` is the per-batch emitted observability number. All five
    * must be serializable closures (plain function literals are).
    */
  def sketchPerGroup[S](keyed: Dataset[(String, String)],
                        empty: () => S,
                        add: (S, String) => Unit,
                        ser: S => Array[Byte],
                        deser: Array[Byte] => S,
                        metric: S => Long): Dataset[SketchUpdate] = {
    implicit val updEnc = Encoders.product[SketchUpdate]
    implicit val strEnc = Encoders.STRING
    implicit val binEnc = Encoders.BINARY
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Byte], SketchUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (group: String, rows: Iterator[(String, String)], state: GroupState[Array[Byte]]) =>
          val sketch = state.getOption.map(deser).getOrElse(empty())
          rows.foreach { case (_, k) => if (k != null) add(sketch, k) }
          val blob = ser(sketch)
          state.update(blob)
          Iterator.single(SketchUpdate(group, blob, metric(sketch)))
      }
  }

  /** Streaming heavy hitters: per-group Misra-Gries summaries folded per
    * micro-batch — the one-scan [[graft.ops.HeavyHitters.approx]]
    * semantics over an unbounded stream (bounded state: k counters +
    * delta per group).
    */
  def mgPerGroup(keyed: Dataset[(String, String)], k: Int): Dataset[SketchUpdate] =
    sketchPerGroup[graft.core.MgSketch](keyed,
      () => graft.core.MgSketch.empty(k), (s, key) => s.add(key),
      _.serialize(), graft.core.MgSketch.deserialize, _.totalCount)

  /** Streaming audit sample: per-group bottom-k distinct samples. The
    * fold is the same exact monoid as the batch build, so the streamed
    * blob equals the batch blob over the same rows, bitwise.
    */
  def bottomKPerGroup(keyed: Dataset[(String, String)], k: Int): Dataset[SketchUpdate] =
    sketchPerGroup[graft.core.BkSample](keyed,
      () => graft.core.BkSample.empty(k), (s, key) => s.add(key),
      _.serialize(), graft.core.BkSample.deserialize, _.totalAdds)

  /** Streaming weighted audit sample: per-group Efraimidis-Spirakis
    * samples folded per micro-batch. Input: (group, key, weight). The
    * fold is the batch exact monoid, so the streamed blob equals the
    * batch blob over the same rows, bitwise.
    */
  def weightedSamplePerGroup(keyed: Dataset[(String, String, Long)], k: Int): Dataset[SketchUpdate] = {
    implicit val updEnc = Encoders.product[SketchUpdate]
    implicit val strEnc = Encoders.STRING
    implicit val binEnc = Encoders.BINARY
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Byte], SketchUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (group: String, rows: Iterator[(String, String, Long)], state: GroupState[Array[Byte]]) =>
          val sketch = state.getOption.map(graft.core.WeightedSample.deserialize)
            .getOrElse(graft.core.WeightedSample.empty(k))
          rows.foreach { case (_, key, w) => if (key != null) sketch.add(key, w) }
          val blob = sketch.serialize()
          state.update(blob)
          Iterator.single(SketchUpdate(group, blob, sketch.totalAdds))
      }
  }

  /** Same shape for HLL distinct-count sketches. */
  def hllPerGroup(keyed: Dataset[(String, String)], precision: Int = 14): Dataset[SketchUpdate] = {
    implicit val updEnc = Encoders.product[SketchUpdate]
    implicit val strEnc = Encoders.STRING
    implicit val binEnc = Encoders.BINARY
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Byte], SketchUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (group: String, rows: Iterator[(String, String)], state: GroupState[Array[Byte]]) =>
          val sketch = state.getOption.map(HllSketch.deserialize)
            .getOrElse(HllSketch.empty(precision))
          rows.foreach { case (_, k) => if (k != null) sketch.add(k) }
          val blob = sketch.serialize()
          state.update(blob)
          Iterator.single(SketchUpdate(group, blob, sketch.estimateLong))
      }
  }
}
