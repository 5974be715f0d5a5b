package graft.agg

import graft.core._
import org.apache.spark.sql.catalyst.InternalRow
import graft.expr.GraftTypeCheck
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst `TypedImperativeAggregate`s for the graft sketches.
  *
  * Execution shape (the distributed analog of the reference's OpenMP build,
  * `bloom_multi_thread.c`): per-partition `update` into an object buffer →
  * `serialize` only at the shuffle boundary → `merge` on the reduce side →
  * `eval` emits the sketch blob in its reference-compatible byte layout.
  * Runs on the `ObjectHashAggregateExec` path, so the buffer lives as a
  * JVM object between rows — no per-row serde.
  *
  * All sketch parameters are constructor (literal) params, so every buffer
  * of one aggregate shares geometry and merges are structurally compatible
  * (the reference's `__check_if_union_or_intersection_ok`, `bloom.c:414-423`,
  * is enforced by construction).
  */
abstract class SketchAgg[S >: Null <: AnyRef] extends TypedImperativeAggregate[S]
    with UnaryLike[Expression] with GraftTypeCheck {
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  /** Extract the input value as UTF-8 bytes (strings hash by their UTF-8
    * bytes — the library hash contract; see [[graft.core.Fnv]]).
    */
  protected final def keyBytes(input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) null
    else child.dataType match {
      case StringType => v.asInstanceOf[UTF8String].getBytes
      case BinaryType => v.asInstanceOf[Array[Byte]]
      case _ => UTF8String.fromString(v.toString).getBytes
    }
  }
}

/** `bloom_sketch(col, n, p [, hasher])` — reference-semantics Bloom filter
  * build. Merge = bit-OR + additive insert counter (exact vs a serial build
  * at any parallelism, the ported `bloom_multi_thread.c:64-78` invariance).
  *
  * `hasher` is the UDAF surface of the reference's
  * `bloom_filter_set_hash_function` (`bloom.c:89-91`): every buffer of
  * this aggregate is created with the family, partial-buffer blobs carry
  * it through the shuffle via the hasher tag (see [[BloomSketch]]), and
  * hash identity participates in merge compatibility — merging blobs
  * built under different families throws, as the C pointer-equality
  * check does (`bloom.c:419`).
  */
case class BloomSketchAgg(
    child: Expression,
    estimatedElements: Long,
    fpp: Float,
    hasher: BloomHasher = FnvBloomHasher,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchAgg[BloomSketch] {

  override def prettyName: String = "bloom_sketch"
  override protected def expectedTypes = Seq(GraftTypeCheck.stringOrBinary)

  override def createAggregationBuffer(): BloomSketch = BloomSketch.empty(estimatedElements, fpp, hasher)

  override def update(b: BloomSketch, input: InternalRow): BloomSketch = {
    val k = keyBytes(input)
    if (k != null) b.add(k)
    b
  }

  override def merge(b: BloomSketch, o: BloomSketch): BloomSketch = b.mergeInPlace(o)
  override def eval(b: BloomSketch): Any = b.serialize()
  override def serialize(b: BloomSketch): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): BloomSketch = BloomSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomSketchAgg = copy(child = c)
}

/** `counting_bloom_sketch(col, n, p)` — counting variant; merge = counter add. */
case class CountingBloomSketchAgg(
    child: Expression,
    estimatedElements: Long,
    fpp: Float,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchAgg[CountingBloomSketch] {

  override def prettyName: String = "counting_bloom_sketch"
  override protected def expectedTypes = Seq(GraftTypeCheck.stringOrBinary)

  override def createAggregationBuffer(): CountingBloomSketch = CountingBloomSketch.empty(estimatedElements, fpp)

  override def update(b: CountingBloomSketch, input: InternalRow): CountingBloomSketch = {
    val k = keyBytes(input)
    if (k != null) b.add(k)
    b
  }

  override def merge(b: CountingBloomSketch, o: CountingBloomSketch): CountingBloomSketch = b.mergeInPlace(o)
  override def eval(b: CountingBloomSketch): Any = b.serialize()
  override def serialize(b: CountingBloomSketch): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): CountingBloomSketch = CountingBloomSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CountingBloomSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountingBloomSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CountingBloomSketchAgg = copy(child = c)
}

/** `hll_sketch(col, precision)` — HyperLogLog; merge = register max (exact
  * monoid: bit-identical to a serial build at any tree).
  * Integral inputs hash their 64-bit value directly; strings/binary hash
  * UTF-8 bytes. Both via splitmix64 finalization (see [[HllSketch]]).
  */
case class HllSketchAgg(
    child: Expression,
    precision: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchAgg[HllSketch] {

  override def prettyName: String = "hll_sketch"
  override protected def expectedTypes = Seq(GraftTypeCheck.hashable)

  override def createAggregationBuffer(): HllSketch = HllSketch.empty(precision)

  override def update(b: HllSketch, input: InternalRow): HllSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case StringType => b.add(v.asInstanceOf[UTF8String].getBytes)
      case BinaryType => b.add(v.asInstanceOf[Array[Byte]])
      case _ => b.addLong(v.asInstanceOf[Number].longValue())
    }
    b
  }

  override def merge(b: HllSketch, o: HllSketch): HllSketch = b.mergeInPlace(o)
  override def eval(b: HllSketch): Any = b.serialize()
  override def serialize(b: HllSketch): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): HllSketch = HllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllSketchAgg = copy(child = c)
}

/** `cms_sketch(col, eps, delta)` — count-min; merge = counter add (exact monoid). */
case class CmsSketchAgg(
    child: Expression,
    eps: Double,
    delta: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchAgg[CmsSketch] {

  override def prettyName: String = "cms_sketch"
  override protected def expectedTypes = Seq(GraftTypeCheck.stringOrBinary ++ Seq(LongType, IntegerType))

  override def createAggregationBuffer(): CmsSketch = CmsSketch.empty(eps, delta)

  override def update(b: CmsSketch, input: InternalRow): CmsSketch = {
    val k = keyBytes(input)
    if (k != null) b.add(k, 1L)
    b
  }

  override def merge(b: CmsSketch, o: CmsSketch): CmsSketch = b.mergeInPlace(o)
  override def eval(b: CmsSketch): Any = b.serialize()
  override def serialize(b: CmsSketch): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): CmsSketch = CmsSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CmsSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsSketchAgg = copy(child = c)
}

/** `theta_sketch(col, k)` — KMV/theta distinct sketch; merge = union
  * (k smallest of the combined sample below min θ — deterministic, exact
  * monoid). Unlike HLL, the blob supports intersection/difference
  * estimates downstream (`theta_intersect`, `theta_a_not_b`).
  */
case class ThetaSketchAgg(
    child: Expression,
    nominalK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchAgg[ThetaSketch] {

  override def prettyName: String = "theta_sketch"
  override protected def expectedTypes = Seq(GraftTypeCheck.hashable)

  override def createAggregationBuffer(): ThetaSketch = ThetaSketch.empty(nominalK)

  override def update(b: ThetaSketch, input: InternalRow): ThetaSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case StringType => b.add(v.asInstanceOf[UTF8String].getBytes)
      case BinaryType => b.add(v.asInstanceOf[Array[Byte]])
      case _ => b.addLong(v.asInstanceOf[Number].longValue())
    }
    b
  }

  override def merge(b: ThetaSketch, o: ThetaSketch): ThetaSketch = b.mergeInPlace(o)
  override def eval(b: ThetaSketch): Any = b.serialize()
  override def serialize(b: ThetaSketch): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): ThetaSketch = ThetaSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg = copy(child = c)
}

/** `tdigest_sketch(col, compression)` — quantiles via merging t-digest. */
case class TDigestSketchAgg(
    child: Expression,
    compression: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchAgg[TDigestSketch] {

  override def prettyName: String = "tdigest_sketch"
  override protected def expectedTypes = Seq(GraftTypeCheck.double)

  override def createAggregationBuffer(): TDigestSketch = TDigestSketch.empty(compression)

  override def update(b: TDigestSketch, input: InternalRow): TDigestSketch = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }

  override def merge(b: TDigestSketch, o: TDigestSketch): TDigestSketch = b.mergeInPlace(o)
  override def eval(b: TDigestSketch): Any = b.serialize()
  override def serialize(b: TDigestSketch): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): TDigestSketch = TDigestSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TDigestSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TDigestSketchAgg = copy(child = c)
}

/** `kll_sketch(col, k)` — quantiles via KLL compactors. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchAgg[KllSketch] {

  override def prettyName: String = "kll_sketch"
  override protected def expectedTypes = Seq(GraftTypeCheck.double)

  override def createAggregationBuffer(): KllSketch = KllSketch.empty(k)

  override def update(b: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }

  override def merge(b: KllSketch, o: KllSketch): KllSketch = b.mergeInPlace(o)
  override def eval(b: KllSketch): Any = b.serialize()
  override def serialize(b: KllSketch): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KllSketch = KllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg = copy(child = c)
}

/** `mg_sketch(col, k)` — Misra-Gries mergeable top-k frequency summary.
  *
  * Single-pass heavy hitters: unlike the CMS path
  * ([[graft.ops.HeavyHitters]], which needs a second scan to enumerate
  * candidate keys), the Misra-Gries summary carries its candidate keys,
  * so `df.agg(mg_sketch(col, k))` is one scan + one blob-per-partition
  * shuffle. Guarantee: every key with frequency > totalCount/(k+1) is
  * retained, with `true - errorBound <= estimate <= true`.
  *
  * Keys enter by their RAW BYTES (strings as UTF-8, binary verbatim,
  * numerics via their canonical string form — the same identity contract
  * as the hash-based sketches, `SketchAgg.keyBytes`): no per-row `String`
  * materialization in the hot loop, and distinct binary keys never
  * collapse through a lossy charset decode.
  */
case class MgSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchAgg[MgSketch] {

  override def prettyName: String = "mg_sketch"
  override protected def expectedTypes = Seq(GraftTypeCheck.hashable)

  override def createAggregationBuffer(): MgSketch = MgSketch.empty(k)

  override def update(b: MgSketch, input: InternalRow): MgSketch = {
    val kb = keyBytes(input)
    if (kb != null) b.add(kb)
    b
  }

  override def merge(b: MgSketch, o: MgSketch): MgSketch = b.mergeInPlace(o)
  override def eval(b: MgSketch): Any = b.serialize()
  override def serialize(b: MgSketch): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): MgSketch = MgSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MgSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MgSketchAgg = copy(child = c)
}

/** `bottomk_sample(col, k)` — mergeable uniform sample of DISTINCT keys
  * that retains the values (Beyer et al. SIGMOD 2007 bottom-k synopsis).
  * Deterministic by construction: any partitioning/merge order yields the
  * bitwise-identical blob — "k random example values per group, one pass,
  * mergeable across days".
  */
case class BkSampleAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchAgg[BkSample] {

  override def prettyName: String = "bottomk_sample"
  override protected def expectedTypes = Seq(GraftTypeCheck.hashable)

  override def createAggregationBuffer(): BkSample = BkSample.empty(k)

  override def update(b: BkSample, input: InternalRow): BkSample = {
    val kb = keyBytes(input)
    if (kb != null) b.add(kb)
    b
  }

  override def merge(b: BkSample, o: BkSample): BkSample = b.mergeInPlace(o)
  override def eval(b: BkSample): Any = b.serialize()
  override def serialize(b: BkSample): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): BkSample = BkSample.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BkSampleAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BkSampleAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BkSampleAgg = copy(child = c)
}

/** `weighted_sample(col, weight, k)` — Efraimidis-Spirakis A-Res weighted
  * distinct sample ([[graft.core.WeightedSample]]): k keys with
  * inclusion probability scaling with weight, deterministic and
  * bitwise merge-order-invariant (the weighted sibling of
  * [[BkSampleAgg]]). Duplicates of a key take its MAXIMUM observed
  * weight (distinct-key semantics — see the core scaladoc); non-positive
  * weights are skipped like nulls.
  */
case class WeightedSampleAgg(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[WeightedSample]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] with GraftTypeCheck {

  override def prettyName: String = "weighted_sample"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override protected def expectedTypes =
    Seq(GraftTypeCheck.hashable, Seq(LongType, IntegerType))

  override def createAggregationBuffer(): WeightedSample = WeightedSample.empty(k)

  override def update(b: WeightedSample, input: InternalRow): WeightedSample = {
    val key = left.eval(input)
    val w = right.eval(input)
    if (key != null && w != null) {
      val kb = left.dataType match {
        case StringType => key.asInstanceOf[UTF8String].getBytes
        case BinaryType => key.asInstanceOf[Array[Byte]]
        case _ => UTF8String.fromString(key.toString).getBytes
      }
      b.add(kb, w.asInstanceOf[Number].longValue())
    }
    b
  }

  override def merge(b: WeightedSample, o: WeightedSample): WeightedSample = b.mergeInPlace(o)
  override def eval(b: WeightedSample): Any = b.serialize()
  override def serialize(b: WeightedSample): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): WeightedSample = WeightedSample.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): WeightedSampleAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WeightedSampleAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WeightedSampleAgg =
    copy(left = l, right = r)
}

/** `mg_sketch_weighted(col, weight, k)` — weighted Misra-Gries: heavy
  * hitters by TOTAL WEIGHT (bytes per domain, tokens per url) rather than
  * row count. Same published guarantees with n = total weight W:
  * every key with weight > W/(k+1) retained; `true − Δ ≤ est ≤ true`,
  * `Δ ≤ W/(k+1)` (the weighted insert is the SpaceSaving-style
  * generalization the PODS 2012 merge proof covers).
  */
case class MgWeightedSketchAgg(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSketch]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] with GraftTypeCheck {

  override def prettyName: String = "mg_sketch_weighted"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override protected def expectedTypes =
    Seq(GraftTypeCheck.hashable, Seq(LongType, IntegerType))

  override def createAggregationBuffer(): MgSketch = MgSketch.empty(k)

  override def update(b: MgSketch, input: InternalRow): MgSketch = {
    val key = left.eval(input)
    val w = right.eval(input)
    if (key != null && w != null) {
      // Non-positive weights are SKIPPED like nulls (policy, documented):
      // Misra-Gries counters only support non-negative increments, and a
      // single stray negative row must not abort a 10^12-row job at the
      // executor. Rows a caller wants excluded should be filtered anyway.
      val weight = w.asInstanceOf[Number].longValue()
      if (weight > 0) {
        val kb = left.dataType match {
          case StringType => key.asInstanceOf[UTF8String].getBytes
          case BinaryType => key.asInstanceOf[Array[Byte]]
          case _ => UTF8String.fromString(key.toString).getBytes
        }
        b.add(kb, weight)
      }
    }
    b
  }

  override def merge(b: MgSketch, o: MgSketch): MgSketch = b.mergeInPlace(o)
  override def eval(b: MgSketch): Any = b.serialize()
  override def serialize(b: MgSketch): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): MgSketch = MgSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MgWeightedSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgWeightedSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MgWeightedSketchAgg =
    copy(left = l, right = r)
}
