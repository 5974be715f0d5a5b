package graft.agg

import graft.core._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Dataset` facades over the same sketch monoids (SURVEY §2.8):
  *
  * {{{
  *   pages.map(_.url).select(BloomAgg(n, p).toColumn)
  *   pages.groupByKey(_.lang).agg(HllAgg(14).toColumn)
  * }}}
  *
  * The Catalyst `TypedImperativeAggregate` path (`graft.functions`) stays
  * the primary surface — object buffers, serialized only at shuffle
  * boundaries — these facades serve typed pipelines and
  * `KeyValueGroupedDataset.agg`, where an `Aggregator` is the idiomatic
  * (and only) option. Buffers ride the generic Kryo encoder; outputs are
  * the same reference-compatible blobs as the untyped API.
  */
final case class BloomAgg(n: Long, p: Float)
    extends Aggregator[String, BloomSketch, Array[Byte]] {
  def zero: BloomSketch = BloomSketch.empty(n, p)
  def reduce(b: BloomSketch, a: String): BloomSketch = { if (a != null) b.add(a); b }
  def merge(x: BloomSketch, y: BloomSketch): BloomSketch = x.mergeInPlace(y)
  def finish(b: BloomSketch): Array[Byte] = b.serialize()
  def bufferEncoder: Encoder[BloomSketch] = Encoders.kryo[BloomSketch]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

final case class CountingBloomAgg(n: Long, p: Float)
    extends Aggregator[String, CountingBloomSketch, Array[Byte]] {
  def zero: CountingBloomSketch = CountingBloomSketch.empty(n, p)
  def reduce(b: CountingBloomSketch, a: String): CountingBloomSketch = { if (a != null) b.add(a); b }
  def merge(x: CountingBloomSketch, y: CountingBloomSketch): CountingBloomSketch = x.mergeInPlace(y)
  def finish(b: CountingBloomSketch): Array[Byte] = b.serialize()
  def bufferEncoder: Encoder[CountingBloomSketch] = Encoders.kryo[CountingBloomSketch]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

final case class HllAgg(precision: Int = 14)
    extends Aggregator[String, HllSketch, Array[Byte]] {
  def zero: HllSketch = HllSketch.empty(precision)
  def reduce(b: HllSketch, a: String): HllSketch = { if (a != null) b.add(a); b }
  def merge(x: HllSketch, y: HllSketch): HllSketch = x.mergeInPlace(y)
  def finish(b: HllSketch): Array[Byte] = b.serialize()
  def bufferEncoder: Encoder[HllSketch] = Encoders.kryo[HllSketch]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

final case class CmsAgg(eps: Double = 0.0001, delta: Double = 0.01)
    extends Aggregator[String, CmsSketch, Array[Byte]] {
  def zero: CmsSketch = CmsSketch.empty(eps, delta)
  def reduce(b: CmsSketch, a: String): CmsSketch = { if (a != null) b.add(a); b }
  def merge(x: CmsSketch, y: CmsSketch): CmsSketch = x.mergeInPlace(y)
  def finish(b: CmsSketch): Array[Byte] = b.serialize()
  def bufferEncoder: Encoder[CmsSketch] = Encoders.kryo[CmsSketch]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

final case class TDigestAgg(compression: Double = 100.0)
    extends Aggregator[Double, TDigestSketch, Array[Byte]] {
  def zero: TDigestSketch = TDigestSketch.empty(compression)
  def reduce(b: TDigestSketch, a: Double): TDigestSketch = { b.add(a); b }
  def merge(x: TDigestSketch, y: TDigestSketch): TDigestSketch = x.mergeInPlace(y)
  def finish(b: TDigestSketch): Array[Byte] = b.serialize()
  def bufferEncoder: Encoder[TDigestSketch] = Encoders.kryo[TDigestSketch]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

final case class KllAgg(k: Int = 200)
    extends Aggregator[Double, KllSketch, Array[Byte]] {
  def zero: KllSketch = KllSketch.empty(k)
  def reduce(b: KllSketch, a: Double): KllSketch = { b.add(a); b }
  def merge(x: KllSketch, y: KllSketch): KllSketch = x.mergeInPlace(y)
  def finish(b: KllSketch): Array[Byte] = b.serialize()
  def bufferEncoder: Encoder[KllSketch] = Encoders.kryo[KllSketch]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
