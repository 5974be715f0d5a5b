package graft.expr

import graft.core._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scalar expressions over serialized sketch blobs.
  *
  * Deserialization caching: probing expressions are used with a constant
  * (literal / broadcast) blob against millions of rows — e.g. the
  * Bloom-semi-join pre-filter. Each expression instance memoizes the last
  * deserialized sketch by blob reference identity, so a constant blob is
  * deserialized once per task, not per row (the distributed analog of the
  * reference's hash-once/probe-many `*_alt` API, `bloom.h:119-126`).
  */
private[graft] final class SketchCache[S <: AnyRef] extends Serializable {
  // fast path: the single-blob case (one broadcast filter)
  @transient private var blobRef: Array[Byte] = _
  @transient private var sketch: S = _
  // sharded case (e.g. ShardedBloom.mightContain): rows alternate between
  // the shards of one broadcast array-of-blobs, whose element references
  // are stable per task — memoize by identity, bounded (a fresh literal
  // per row can never wedge the cache)
  @transient private var map: java.util.IdentityHashMap[Array[Byte], S] = _

  def get(blob: Array[Byte], parse: Array[Byte] => S): S = {
    if (sketch != null && (blobRef eq blob)) return sketch
    if (map == null) map = new java.util.IdentityHashMap[Array[Byte], S]
    var s = map.get(blob)
    if (s == null) {
      if (map.size >= 1024) map.clear()
      s = parse(blob)
      map.put(blob, s)
    }
    blobRef = blob
    sketch = s
    s
  }
}

/** `fnv1a_hash(col, seed)` — the reference hash (`bloom.c:499-508`) as a
  * debuggable scalar function. Codegen'd (no per-row boxing): the
  * generated code calls [[hash]] directly on the referenced instance, so
  * the enclosing whole-stage pipeline stays unboxed.
  */
case class Fnv1aHash(child: Expression, seed: Int)
    extends UnaryExpression with GraftTypeCheck {
  override def prettyName: String = "fnv1a_hash"
  override def dataType: DataType = LongType
  override protected def expectedTypes = Seq(GraftTypeCheck.stringOrBinary)
  def hash(v: UTF8String): Long = Fnv.fnv1a(v.getBytes, seed)
  def hash(v: Array[Byte]): Long = Fnv.fnv1a(v, seed)
  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => hash(v.asInstanceOf[UTF8String])
    case BinaryType => hash(v.asInstanceOf[Array[Byte]])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("fnv1a", this, classOf[Fnv1aHash].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.hash($v);")
  }
  override protected def withNewChildInternal(c: Expression): Fnv1aHash = copy(child = c)
}

// NB deliberately NOT CodegenFallback: WholeStageCodegen excludes any
// expression that IS-A CodegenFallback (type test, not method dispatch),
// which would push the whole Filter stage out of codegen.
private[graft] trait BloomBinaryKeyProbe extends BinaryExpression with GraftTypeCheck {
  @transient protected lazy val cache = new SketchCache[BloomSketch]
  override protected def expectedTypes = Seq(GraftTypeCheck.binary, GraftTypeCheck.stringOrBinary)
  protected final def keyOf(v: Any): Array[Byte] = right.dataType match {
    case StringType => v.asInstanceOf[UTF8String].getBytes
    case BinaryType => v.asInstanceOf[Array[Byte]]
  }
  protected final def sketchOf(blob: Any): BloomSketch =
    cache.get(blob.asInstanceOf[Array[Byte]], BloomSketch.deserialize)
}

/** `bloom_might_contain(blob, key)` — AND over k bit probes with early exit
  * (semantics `bloom.c:186-202`). Zero false negatives; FP rate bounded by
  * the filter's configured p.
  *
  * `saturationThreshold < 1.0` arms a fill-ratio guard for the
  * runtime-filter use ([[graft.plans.RuntimeBloomJoin]]): a filter built
  * with far more keys than its capacity saturates (bits_set/m → 1, FPR →
  * 1) and probing it is pure per-row overhead. With the guard armed, the
  * first probe of each blob checks the fill ratio once (memoized per
  * task) and, above the threshold, the expression returns `true` for
  * every key — semantically identical (a pass-through filter), skipping
  * the k hash probes. Never armed on the user-facing SQL function, whose
  * reference semantics must probe exactly.
  */
case class BloomMightContain(left: Expression, right: Expression,
                             saturationThreshold: Double = 1.0) extends BloomBinaryKeyProbe {
  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType
  // per-task memoized saturation verdict, keyed by blob identity (the
  // runtime-filter blob is one scalar-subquery result per plan)
  @transient private var satBlobRef: Array[Byte] = _
  @transient private var satVerdict: Boolean = false
  private def saturated(blob: Array[Byte]): Boolean = {
    if (!(satBlobRef eq blob)) {
      val s = sketchOf(blob)
      satVerdict = s.countSetBits.toDouble / s.numberBits.toDouble > saturationThreshold
      satBlobRef = blob
      if (satVerdict) {
        BloomMightContain.saturationEngaged.incrementAndGet()
        BloomMightContain.warnOnce(s.numberBits)
      }
    }
    satVerdict
  }
  // Constant-blob fast path: the first blob identity seen by this task is
  // deserialized once and probed in decoded form (the literal/broadcast
  // semi-join pre-filter — one blob, millions of rows). Any OTHER blob
  // identity means the blob is a per-row COLUMN value (e.g. the sharded
  // semi-join joins each row to its shard's blob, handing the expression
  // a fresh byte-array copy every row): identity caching can never hit
  // there, and deserializing per row copies the whole bit array and
  // churns the heap — probe the serialized bytes in place instead
  // (guide §2.3: same verdict, footer + k probed bytes per row).
  @transient private var firstRef: Array[Byte] = _
  @transient private var firstSketch: BloomSketch = _
  private def guarded(blob: Array[Byte], key: Array[Byte]): Boolean = {
    if (saturationThreshold < 1.0 && saturated(blob)) return true
    if (firstRef eq blob) return firstSketch.contains(key)
    if (firstRef == null) {
      firstSketch = BloomSketch.deserialize(blob)
      firstRef = blob
      return firstSketch.contains(key)
    }
    BloomSketch.containsSerialized(blob, key)
  }
  def probe(blob: Array[Byte], key: UTF8String): Boolean = guarded(blob, key.getBytes)
  def probe(blob: Array[Byte], key: Array[Byte]): Boolean = guarded(blob, key)
  override def nullSafeEval(blob: Any, key: Any): Any =
    guarded(blob.asInstanceOf[Array[Byte]], keyOf(key))
  // real codegen (overrides the trait's CodegenFallback): the probe is the
  // per-row hot path of the Bloom-semi-join pattern, so keep the
  // surrounding filter/scan stage unboxed; the blob deserialization stays
  // memoized per task via SketchCache
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bmc", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (blob, key) => s"${ev.value} = $self.probe($blob, $key);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain = copy(l, r)
}

object BloomMightContain {
  /** Observability for the saturation guard (tests + local-mode ops):
    * bumped once per (task, blob) when the guard disables probing.
    */
  private[graft] val saturationEngaged = new java.util.concurrent.atomic.AtomicLong
  @volatile private var warned = false
  private def warnOnce(m: Long): Unit = if (!warned) {
    warned = true
    System.err.println(s"[graft] runtime Bloom filter (m=$m bits) is saturated; " +
      "probe disabled for this blob — size spark.graft.runtimeBloomJoin.estimatedKeys " +
      "to the build side's distinct keys (or provide table stats)")
  }
}

/** `sharded_bloom_probe(bucket, key)` over a REAL broadcast variable of
  * shard blobs — the medium-B probe path of [[graft.pipeline.ShardedBloom]].
  *
  * The broadcast handle rides the expression into each task; tasks read
  * `.value` (one torrent-fetched copy per executor), so the PLAN carries
  * ~nothing — unlike a literal array of blobs, which embeds B × blob bytes
  * in every serialized task (the scale failure this replaces). Per-shard
  * deserialization is memoized by blob identity via [[SketchCache]]
  * (broadcast element references are stable per executor).
  * Codegen'd — this is the per-row hot path of a sharded semi-join.
  */
case class ShardedBloomProbe(left: Expression, right: Expression,
    shards: org.apache.spark.broadcast.Broadcast[Array[Array[Byte]]])
    extends BinaryExpression with GraftTypeCheck {
  @transient private lazy val cache = new SketchCache[BloomSketch]
  override def prettyName: String = "sharded_bloom_probe"
  override def dataType: DataType = BooleanType
  override protected def expectedTypes = Seq(Seq(LongType), GraftTypeCheck.stringOrBinary)
  private def probeBlob(bucket: Long, key: Array[Byte]): Boolean = {
    val blob = shards.value(bucket.toInt)
    cache.get(blob, BloomSketch.deserialize).contains(key)
  }
  def probe(bucket: Long, key: UTF8String): Boolean = probeBlob(bucket, key.getBytes)
  def probe(bucket: Long, key: Array[Byte]): Boolean = probeBlob(bucket, key)
  override def nullSafeEval(bucket: Any, key: Any): Any = {
    val k = right.dataType match {
      case StringType => key.asInstanceOf[UTF8String].getBytes
      case BinaryType => key.asInstanceOf[Array[Byte]]
    }
    probeBlob(bucket.asInstanceOf[Long], k)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sbp", this, classOf[ShardedBloomProbe].getName)
    nullSafeCodeGen(ctx, ev, (b, key) => s"${ev.value} = $self.probe($b, $key);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ShardedBloomProbe = copy(l, r)
}

private[graft] abstract class BloomUnaryFn extends UnaryExpression with CodegenFallback with GraftTypeCheck {
  @transient protected lazy val cache = new SketchCache[BloomSketch]
  override protected def expectedTypes = Seq(GraftTypeCheck.binary)
  protected final def sketchOf(blob: Any): BloomSketch =
    cache.get(blob.asInstanceOf[Array[Byte]], BloomSketch.deserialize)
}

/** `bloom_estimate_elements(blob)` (`bloom.c:317-325`). */
case class BloomEstimateElements(child: Expression) extends BloomUnaryFn {
  override def prettyName: String = "bloom_estimate_elements"
  override def dataType: DataType = LongType
  override def nullSafeEval(blob: Any): Any = sketchOf(blob).estimateElements
  override protected def withNewChildInternal(c: Expression): BloomEstimateElements = copy(c)
}

/** `bloom_elements_added(blob)` — the insert counter from the blob footer. */
case class BloomElementsAdded(child: Expression) extends BloomUnaryFn {
  override def prettyName: String = "bloom_elements_added"
  override def dataType: DataType = LongType
  override def nullSafeEval(blob: Any): Any = sketchOf(blob).elementsAdded
  override protected def withNewChildInternal(c: Expression): BloomElementsAdded = copy(c)
}

/** `bloom_current_fpr(blob)` (`bloom.c:204-209`, computed wide). */
case class BloomCurrentFpr(child: Expression) extends BloomUnaryFn {
  override def prettyName: String = "bloom_current_fpr"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(blob: Any): Any = sketchOf(blob).currentFalsePositiveRate.toDouble
  override protected def withNewChildInternal(c: Expression): BloomCurrentFpr = copy(c)
}

/** `bloom_bits_set(blob)` (`bloom.c:309-315`). */
case class BloomBitsSet(child: Expression) extends BloomUnaryFn {
  override def prettyName: String = "bloom_bits_set"
  override def dataType: DataType = LongType
  override def nullSafeEval(blob: Any): Any = sketchOf(blob).countSetBits
  override protected def withNewChildInternal(c: Expression): BloomBitsSet = copy(c)
}

/** `bloom_to_hex(blob)` — reference hex format (`bloom.c:254-270`). */
case class BloomToHex(child: Expression) extends BloomUnaryFn {
  override def prettyName: String = "bloom_to_hex"
  override def dataType: DataType = StringType
  override def nullSafeEval(blob: Any): Any = UTF8String.fromString(sketchOf(blob).toHexString)
  override protected def withNewChildInternal(c: Expression): BloomToHex = copy(c)
}

/** `bloom_from_hex(str)` — parse reference hex to a blob (`bloom.c:272-303`). */
case class BloomFromHex(child: Expression)
    extends UnaryExpression with CodegenFallback with GraftTypeCheck {
  override def prettyName: String = "bloom_from_hex"
  override def dataType: DataType = BinaryType
  override protected def expectedTypes = Seq(GraftTypeCheck.string)
  override def nullSafeEval(hex: Any): Any =
    BloomSketch.fromHexString(hex.asInstanceOf[UTF8String].toString).serialize()
  override protected def withNewChildInternal(c: Expression): BloomFromHex = copy(c)
}

/** `bloom_stats(blob)` — the exact 11-line report (`bloom.c:122-143`). */
case class BloomStats(child: Expression) extends BloomUnaryFn {
  override def prettyName: String = "bloom_stats"
  override def dataType: DataType = StringType
  override def nullSafeEval(blob: Any): Any = UTF8String.fromString(sketchOf(blob).statsString)
  override protected def withNewChildInternal(c: Expression): BloomStats = copy(c)
}

private[graft] abstract class BloomSetOp extends BinaryExpression with CodegenFallback with GraftTypeCheck {
  @transient protected lazy val cacheL = new SketchCache[BloomSketch]
  @transient protected lazy val cacheR = new SketchCache[BloomSketch]
  override protected def expectedTypes = Seq(GraftTypeCheck.binary, GraftTypeCheck.binary)
  protected final def sketches(a: Any, b: Any): (BloomSketch, BloomSketch) = (
    cacheL.get(a.asInstanceOf[Array[Byte]], BloomSketch.deserialize),
    cacheR.get(b.asInstanceOf[Array[Byte]], BloomSketch.deserialize))
}

/** `bloom_union(a, b)` — reference semantics: bit-OR, counter := estimate
  * (`bloom.c:327-338`).
  */
case class BloomUnionExpr(left: Expression, right: Expression) extends BloomSetOp {
  override def prettyName: String = "bloom_union"
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = sketches(a, b); x.union(y).serialize()
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomUnionExpr = copy(l, r)
}

/** `bloom_intersect(a, b)` (`bloom.c:352-363`). */
case class BloomIntersectExpr(left: Expression, right: Expression) extends BloomSetOp {
  override def prettyName: String = "bloom_intersect"
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = sketches(a, b); x.intersect(y).serialize()
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomIntersectExpr = copy(l, r)
}

/** `bloom_jaccard(a, b)` (`bloom.c:382-392`); float in the reference,
  * surfaced as double.
  */
case class BloomJaccard(left: Expression, right: Expression) extends BloomSetOp {
  override def prettyName: String = "bloom_jaccard"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = sketches(a, b); x.jaccardIndex(y).toDouble
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomJaccard = copy(l, r)
}

/** `bloom_union_bits(a, b)` — popcount of the OR without materializing it
  * (`bloom.c:340-350`).
  */
case class BloomUnionBits(left: Expression, right: Expression) extends BloomSetOp {
  override def prettyName: String = "bloom_union_bits"
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = sketches(a, b); x.countUnionBitsSet(y)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomUnionBits = copy(l, r)
}

/** `bloom_intersect_bits(a, b)` — popcount of the AND (`bloom.c:370-380`). */
case class BloomIntersectBits(left: Expression, right: Expression) extends BloomSetOp {
  override def prettyName: String = "bloom_intersect_bits"
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = sketches(a, b); x.countIntersectionBitsSet(y)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomIntersectBits = copy(l, r)
}

/** `cbf_subtract(a, b)` — floored counter subtraction: removal of a batch
  * of keys (sketched as `b` with the same geometry) from `a`.
  */
case class CbfSubtract(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with GraftTypeCheck {
  @transient private lazy val cacheL = new SketchCache[CountingBloomSketch]
  @transient private lazy val cacheR = new SketchCache[CountingBloomSketch]
  override def prettyName: String = "cbf_subtract"
  override def dataType: DataType = BinaryType
  override protected def expectedTypes = Seq(GraftTypeCheck.binary, GraftTypeCheck.binary)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = CountingBloomSketch.deserialize(a.asInstanceOf[Array[Byte]]) // fresh copy: subtract mutates
    val y = cacheR.get(b.asInstanceOf[Array[Byte]], CountingBloomSketch.deserialize)
    x.subtractInPlace(y).serialize()
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CbfSubtract = copy(l, r)
}

/** `cbf_count(blob, key)` — counting-Bloom frequency-floor probe.
  * Codegen'd (NOT CodegenFallback — see the IS-A exclusion note above): a
  * `cbf_count(lit(blob), col)` filter/select is a per-row hot path.
  */
case class CbfCount(left: Expression, right: Expression)
    extends BinaryExpression with GraftTypeCheck {
  @transient private lazy val cache = new SketchCache[CountingBloomSketch]
  override def prettyName: String = "cbf_count"
  override def dataType: DataType = IntegerType
  override protected def expectedTypes = Seq(GraftTypeCheck.binary, GraftTypeCheck.stringOrBinary)
  private def sketchOf(blob: Array[Byte]): CountingBloomSketch =
    cache.get(blob, CountingBloomSketch.deserialize)
  def probe(blob: Array[Byte], key: UTF8String): Int = sketchOf(blob).estimateCount(key.getBytes)
  def probe(blob: Array[Byte], key: Array[Byte]): Int = sketchOf(blob).estimateCount(key)
  override def nullSafeEval(blob: Any, key: Any): Any = {
    val k = right.dataType match {
      case StringType => key.asInstanceOf[UTF8String].getBytes
      case BinaryType => key.asInstanceOf[Array[Byte]]
    }
    sketchOf(blob.asInstanceOf[Array[Byte]]).estimateCount(k)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("cbfc", this, classOf[CbfCount].getName)
    nullSafeCodeGen(ctx, ev, (blob, key) => s"${ev.value} = $self.probe($blob, $key);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CbfCount = copy(l, r)
}

/** `hll_estimate(blob)` — HLL cardinality estimate, rounded to Long.
  * Codegen'd: typically fed per-group blobs (e.g. the flagship per-lang
  * query) where it sits inside a project over many groups.
  */
case class HllEstimate(child: Expression)
    extends UnaryExpression with GraftTypeCheck {
  @transient private lazy val cache = new SketchCache[HllSketch]
  override def prettyName: String = "hll_estimate"
  override def dataType: DataType = LongType
  override protected def expectedTypes = Seq(GraftTypeCheck.binary)
  def probe(blob: Array[Byte]): Long = cache.get(blob, HllSketch.deserialize).estimateLong
  override def nullSafeEval(blob: Any): Any = probe(blob.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hlle", this, classOf[HllEstimate].getName)
    nullSafeCodeGen(ctx, ev, blob => s"${ev.value} = $self.probe($blob);")
  }
  override protected def withNewChildInternal(c: Expression): HllEstimate = copy(c)
}

/** `hll_merge(a, b)` — register-max union of two HLL blobs. */
case class HllMergeExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with GraftTypeCheck {
  override def prettyName: String = "hll_merge"
  override def dataType: DataType = BinaryType
  override protected def expectedTypes = Seq(GraftTypeCheck.binary, GraftTypeCheck.binary)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = HllSketch.deserialize(a.asInstanceOf[Array[Byte]])
    x.mergeInPlace(HllSketch.deserialize(b.asInstanceOf[Array[Byte]])).serialize()
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HllMergeExpr = copy(l, r)
}

/** `theta_estimate(blob)` — distinct estimate from a theta sketch blob
  * (also of intersection/difference result blobs). Codegen'd.
  */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with GraftTypeCheck {
  @transient private lazy val cache = new SketchCache[ThetaSketch]
  override def prettyName: String = "theta_estimate"
  override def dataType: DataType = LongType
  override protected def expectedTypes = Seq(GraftTypeCheck.binary)
  def probe(blob: Array[Byte]): Long = cache.get(blob, ThetaSketch.deserialize).estimateLong
  override def nullSafeEval(blob: Any): Any = probe(blob.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("the", this, classOf[ThetaEstimate].getName)
    nullSafeCodeGen(ctx, ev, blob => s"${ev.value} = $self.probe($blob);")
  }
  override protected def withNewChildInternal(c: Expression): ThetaEstimate = copy(c)
}

private[graft] abstract class ThetaSetOp extends BinaryExpression with CodegenFallback with GraftTypeCheck {
  @transient protected lazy val cacheL = new SketchCache[ThetaSketch]
  @transient protected lazy val cacheR = new SketchCache[ThetaSketch]
  override def dataType: DataType = BinaryType
  override protected def expectedTypes = Seq(GraftTypeCheck.binary, GraftTypeCheck.binary)
  protected final def sketches(a: Any, b: Any): (ThetaSketch, ThetaSketch) = (
    cacheL.get(a.asInstanceOf[Array[Byte]], ThetaSketch.deserialize),
    cacheR.get(b.asInstanceOf[Array[Byte]], ThetaSketch.deserialize))
}

/** `theta_union(a, b)` — sample union, min-θ semantics. */
case class ThetaUnionExpr(left: Expression, right: Expression) extends ThetaSetOp {
  override def prettyName: String = "theta_union"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = sketches(a, b); x.union(y).serialize()
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaUnionExpr = copy(l, r)
}

/** `theta_intersect(a, b)` — the set op HLL cannot do. */
case class ThetaIntersectExpr(left: Expression, right: Expression) extends ThetaSetOp {
  override def prettyName: String = "theta_intersect"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = sketches(a, b); x.intersect(y).serialize()
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaIntersectExpr = copy(l, r)
}

/** `theta_jaccard(a, b)` — estimated Jaccard index of the two key sets:
  * `estimate(A ∩ B) / estimate(A ∪ B)` (1.0 when both sets are empty —
  * the reference's `bloom_filter_jaccard_index` convention,
  * `bloom.c:382-392`, lifted from bit-space to KMV sample space).
  */
case class ThetaJaccard(left: Expression, right: Expression) extends ThetaSetOp {
  override def prettyName: String = "theta_jaccard"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = sketches(a, b)
    val u = x.union(y).estimate
    if (u <= 0.0) 1.0 else x.intersect(y).estimate / u
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaJaccard = copy(l, r)
}

/** `theta_a_not_b(a, b)` — difference estimate sketch. */
case class ThetaANotB(left: Expression, right: Expression) extends ThetaSetOp {
  override def prettyName: String = "theta_a_not_b"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = sketches(a, b); x.aNotB(y).serialize()
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaANotB = copy(l, r)
}

/** `cms_query(blob, key)` — count-min point query (never underestimates).
  * Codegen'd: `cms_query(lit(blob), col)` in a heavy-hitter filter/select
  * is a per-row hot path; keep the stage in whole-stage codegen.
  */
case class CmsQuery(left: Expression, right: Expression)
    extends BinaryExpression with GraftTypeCheck {
  @transient private lazy val cache = new SketchCache[CmsSketch]
  override def prettyName: String = "cms_query"
  override def dataType: DataType = LongType
  override protected def expectedTypes = Seq(GraftTypeCheck.binary, GraftTypeCheck.stringOrBinary)
  private def sketchOf(blob: Array[Byte]): CmsSketch = cache.get(blob, CmsSketch.deserialize)
  def probe(blob: Array[Byte], key: UTF8String): Long = sketchOf(blob).estimateCount(key.getBytes)
  def probe(blob: Array[Byte], key: Array[Byte]): Long = sketchOf(blob).estimateCount(key)
  override def nullSafeEval(blob: Any, key: Any): Any = {
    val k = right.dataType match {
      case StringType => key.asInstanceOf[UTF8String].getBytes
      case BinaryType => key.asInstanceOf[Array[Byte]]
    }
    sketchOf(blob.asInstanceOf[Array[Byte]]).estimateCount(k)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("cmsq", this, classOf[CmsQuery].getName)
    nullSafeCodeGen(ctx, ev, (blob, key) => s"${ev.value} = $self.probe($blob, $key);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsQuery = copy(l, r)
}

/** `cms_query` over a REAL broadcast variable holding the blob — the
  * ShardedBloomProbe pattern generalized to count-min probes.
  *
  * Why: a CMS at production accuracy (eps=1e-4, delta=0.01) serializes to
  * ~1 MB, and `cms_query(lit(blob), key)` embeds that megabyte in EVERY
  * serialized task binary of the probing stage (Spark's "Broadcasting
  * large task binary" warning). Holding a `Broadcast` handle instead
  * ships the plan in bytes; each executor torrent-fetches one copy and
  * the per-task deserialization is memoized via [[SketchCache]].
  * Codegen'd — the heavy-hitter candidate filter is a per-row hot path.
  */
case class CmsQueryBroadcast(child: Expression,
    blob: org.apache.spark.broadcast.Broadcast[Array[Byte]])
    extends UnaryExpression with GraftTypeCheck {
  @transient private lazy val cache = new SketchCache[CmsSketch]
  override def prettyName: String = "cms_query_broadcast"
  override def dataType: DataType = LongType
  override protected def expectedTypes = Seq(GraftTypeCheck.stringOrBinary)
  private def sketch: CmsSketch = cache.get(blob.value, CmsSketch.deserialize)
  def probe(key: UTF8String): Long = sketch.estimateCount(key.getBytes)
  def probe(key: Array[Byte]): Long = sketch.estimateCount(key)
  override def nullSafeEval(key: Any): Any = child.dataType match {
    case StringType => probe(key.asInstanceOf[UTF8String])
    case BinaryType => probe(key.asInstanceOf[Array[Byte]])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("cmsqb", this, classOf[CmsQueryBroadcast].getName)
    nullSafeCodeGen(ctx, ev, key => s"${ev.value} = $self.probe($key);")
  }
  override protected def withNewChildInternal(c: Expression): CmsQueryBroadcast = copy(child = c)
}

/** `cms_total_count(blob)` — stream length N of a CMS blob. */
case class CmsTotalCount(child: Expression)
    extends UnaryExpression with CodegenFallback with GraftTypeCheck {
  override def prettyName: String = "cms_total_count"
  override def dataType: DataType = LongType
  override protected def expectedTypes = Seq(GraftTypeCheck.binary)
  override def nullSafeEval(blob: Any): Any =
    CmsSketch.deserialize(blob.asInstanceOf[Array[Byte]]).totalCount
  override protected def withNewChildInternal(c: Expression): CmsTotalCount = copy(c)
}

/** `tdigest_quantile(blob, q)` — t-digest quantile estimate. Codegen'd:
  * per-group blobs in a select (quantiles per lang/source group) are a
  * per-row path.
  */
case class TDigestQuantile(left: Expression, right: Expression)
    extends BinaryExpression with GraftTypeCheck {
  @transient private lazy val cache = new SketchCache[TDigestSketch]
  override def prettyName: String = "tdigest_quantile"
  override def dataType: DataType = DoubleType
  override protected def expectedTypes = Seq(GraftTypeCheck.binary, GraftTypeCheck.double)
  def probe(blob: Array[Byte], q: Double): Double =
    cache.get(blob, TDigestSketch.deserialize).quantile(q)
  override def nullSafeEval(blob: Any, q: Any): Any =
    probe(blob.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tdq", this, classOf[TDigestQuantile].getName)
    nullSafeCodeGen(ctx, ev, (b, q) => s"${ev.value} = $self.probe($b, $q);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TDigestQuantile = copy(l, r)
}

/** `kll_quantile(blob, q)` — KLL quantile estimate. Codegen'd. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with GraftTypeCheck {
  @transient private lazy val cache = new SketchCache[KllSketch]
  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType
  override protected def expectedTypes = Seq(GraftTypeCheck.binary, GraftTypeCheck.double)
  def probe(blob: Array[Byte], q: Double): Double =
    cache.get(blob, KllSketch.deserialize).quantile(q)
  override def nullSafeEval(blob: Any, q: Any): Any =
    probe(blob.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("klq", this, classOf[KllQuantile].getName)
    nullSafeCodeGen(ctx, ev, (b, q) => s"${ev.value} = $self.probe($b, $q);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllQuantile = copy(l, r)
}

/** `kll_rank(blob, x)` — normalized rank of a value. Codegen'd: ranking a
  * whole column against one broadcast sketch is a per-row hot path.
  */
case class KllRank(left: Expression, right: Expression)
    extends BinaryExpression with GraftTypeCheck {
  @transient private lazy val cache = new SketchCache[KllSketch]
  override def prettyName: String = "kll_rank"
  override def dataType: DataType = DoubleType
  override protected def expectedTypes = Seq(GraftTypeCheck.binary, GraftTypeCheck.double)
  def probe(blob: Array[Byte], x: Double): Double =
    cache.get(blob, KllSketch.deserialize).rank(x)
  override def nullSafeEval(blob: Any, x: Any): Any =
    probe(blob.asInstanceOf[Array[Byte]], x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("klr", this, classOf[KllRank].getName)
    nullSafeCodeGen(ctx, ev, (b, x) => s"${ev.value} = $self.probe($b, $x);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllRank = copy(l, r)
}

/** `mg_estimate(blob, key)` — Misra-Gries lower-bound frequency estimate
  * (`true - mg_error_bound <= est <= true`; 0 for non-retained keys).
  * Codegen'd: probing a key column against one broadcast summary is a
  * per-row hot path.
  */
case class MgEstimate(left: Expression, right: Expression)
    extends BinaryExpression with GraftTypeCheck {
  @transient private lazy val cache = new SketchCache[MgSketch]
  override def prettyName: String = "mg_estimate"
  override def dataType: DataType = LongType
  override protected def expectedTypes = Seq(GraftTypeCheck.binary, GraftTypeCheck.stringOrBinary)
  def probe(blob: Array[Byte], key: UTF8String): Long =
    cache.get(blob, MgSketch.deserialize).estimate(key.getBytes)
  def probe(blob: Array[Byte], key: Array[Byte]): Long =
    cache.get(blob, MgSketch.deserialize).estimate(key)
  override def nullSafeEval(blob: Any, key: Any): Any = right.dataType match {
    case StringType => probe(blob.asInstanceOf[Array[Byte]], key.asInstanceOf[UTF8String])
    case BinaryType => probe(blob.asInstanceOf[Array[Byte]], key.asInstanceOf[Array[Byte]])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("mge", this, classOf[MgEstimate].getName)
    nullSafeCodeGen(ctx, ev, (b, k) => s"${ev.value} = $self.probe($b, $k);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MgEstimate = copy(l, r)
}

/** `mg_error_bound(blob)` — the summary's total decrement Δ: every
  * estimate underestimates its true frequency by at most Δ, and
  * Δ <= totalCount/(k+1), so any key with true frequency above that is
  * guaranteed retained.
  */
case class MgErrorBound(child: Expression)
    extends UnaryExpression with CodegenFallback with GraftTypeCheck {
  override def prettyName: String = "mg_error_bound"
  override def dataType: DataType = LongType
  override protected def expectedTypes = Seq(GraftTypeCheck.binary)
  // header-only read (fixed offset): q42/q45 evaluate this per OUTPUT row
  // against a literal blob — never materialize the k entries here
  override def nullSafeEval(blob: Any): Any =
    MgSketch.headerErrorBound(blob.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): MgErrorBound = copy(c)
}

/** `mg_total_count(blob)` — stream length N of a Misra-Gries blob. */
case class MgTotalCount(child: Expression)
    extends UnaryExpression with CodegenFallback with GraftTypeCheck {
  override def prettyName: String = "mg_total_count"
  override def dataType: DataType = LongType
  override protected def expectedTypes = Seq(GraftTypeCheck.binary)
  // header-only read — same rationale as MgErrorBound
  override def nullSafeEval(blob: Any): Any =
    MgSketch.headerTotalCount(blob.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): MgTotalCount = copy(c)
}

/** `mg_topk(blob, j)` — top-`j` retained keys by estimated count
  * (count desc, key asc). Evaluated once per summary blob (not a row-wise
  * hot path), so plain eval is the right cost model.
  */
case class MgTopK(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with GraftTypeCheck {
  @transient private lazy val cache = new SketchCache[MgSketch]
  override def prettyName: String = "mg_topk"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def expectedTypes = Seq(GraftTypeCheck.binary, Seq(IntegerType))
  override def nullSafeEval(blob: Any, j: Any): Any = {
    val keys = cache.get(blob.asInstanceOf[Array[Byte]], MgSketch.deserialize)
      .topK(j.asInstanceOf[Int])
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      keys.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MgTopK = copy(l, r)
}

/** `kll_boundaries(blob, p)` — equi-depth cut points (quantiles at
  * `i/p`, duplicates collapsed) from a KLL blob: the sketch-side half of
  * [[graft.ops.RangePartition]], exposed to SQL so a maintained sketch
  * state can be turned into a partitioning spec without leaving the
  * query layer.
  */
case class KllBoundaries(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with GraftTypeCheck {
  override def prettyName: String = "kll_boundaries"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def expectedTypes = Seq(GraftTypeCheck.binary, Seq(IntegerType))
  override def nullSafeEval(blob: Any, p: Any): Any = {
    val bounds = graft.ops.RangePartition.boundariesFromBlob(
      blob.asInstanceOf[Array[Byte]], p.asInstanceOf[Int])
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      bounds.map(java.lang.Double.valueOf).asInstanceOf[Array[Any]])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllBoundaries = copy(l, r)
}

/** `range_bucket(value, bounds)` — equi-depth bucket id: the number of
  * boundaries <= value (binary search). Codegen'd — this sits on every
  * row of a repartition/write, the hottest possible path.
  */
case class RangeBucket(child: Expression, bounds: Array[Double])
    extends UnaryExpression with GraftTypeCheck {
  require(bounds.nonEmpty && (bounds.length == 1 || bounds.sliding(2).forall(w => w(0) < w(1))),
    "bounds must be non-empty and strictly increasing")
  override def prettyName: String = "range_bucket"
  override def dataType: DataType = IntegerType
  override protected def expectedTypes = Seq(GraftTypeCheck.double)
  def probe(v: Double): Int = {
    val i = java.util.Arrays.binarySearch(bounds, v)
    if (i >= 0) i + 1 // boundary value belongs to the bucket below the cut
    else -(i + 1)
  }
  override def nullSafeEval(v: Any): Any = probe(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("rb", this, classOf[RangeBucket].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.probe($v);")
  }
  // Array-valued ctor param: structural equality/hash so plan canonicalization
  // treats equal-bounds instances as equal
  override def equals(o: Any): Boolean = o match {
    case r: RangeBucket => child == r.child && java.util.Arrays.equals(bounds, r.bounds)
    case _ => false
  }
  override def hashCode(): Int = child.hashCode * 31 + java.util.Arrays.hashCode(bounds)
  override protected def withNewChildInternal(c: Expression): RangeBucket = copy(child = c)
}

/** `bk_values(blob)` — the bottom-k sample's keys in priority order
  * (deterministic). Per-blob, not per-row — plain eval.
  */
case class BkValues(child: Expression)
    extends UnaryExpression with CodegenFallback with GraftTypeCheck {
  override def prettyName: String = "bk_values"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def expectedTypes = Seq(GraftTypeCheck.binary)
  override def nullSafeEval(blob: Any): Any = {
    val vs = BkSample.deserialize(blob.asInstanceOf[Array[Byte]]).values
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      vs.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(c: Expression): BkValues = copy(c)
}

/** `ws_values(blob)` — the weighted sample's keys in priority order
  * (deterministic). Per-blob, not per-row — plain eval.
  */
case class WsValues(child: Expression)
    extends UnaryExpression with CodegenFallback with GraftTypeCheck {
  override def prettyName: String = "ws_values"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def expectedTypes = Seq(GraftTypeCheck.binary)
  override def nullSafeEval(blob: Any): Any = {
    val vs = WeightedSample.deserialize(blob.asInstanceOf[Array[Byte]]).values
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      vs.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(c: Expression): WsValues = copy(c)
}

/** `ws_entries(blob)` — (key, weight) structs of a weighted sample in
  * priority order.
  */
case class WsEntries(child: Expression)
    extends UnaryExpression with CodegenFallback with GraftTypeCheck {
  override def prettyName: String = "ws_entries"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("weight", LongType, nullable = false))), containsNull = false)
  override protected def expectedTypes = Seq(GraftTypeCheck.binary)
  override def nullSafeEval(blob: Any): Any = {
    val es = WeightedSample.deserialize(blob.asInstanceOf[Array[Byte]]).entries
    val rows: Array[Any] = es.map { case (k, w) =>
      org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(k), w)
    }.toArray[Any]
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
  override protected def withNewChildInternal(c: Expression): WsEntries = copy(c)
}

/** `mg_entries(blob)` — every retained (key, cnt_lo, cnt_hi) of a
  * Misra-Gries summary as an array of structs, count-desc/key-asc: the
  * pure-SQL heavy-hitter read (`... LATERAL VIEW explode(mg_entries(m))`)
  * with both bound ends materialized (`cnt_hi − cnt_lo` = the summary's
  * decrement total).
  */
case class MgEntries(child: Expression)
    extends UnaryExpression with CodegenFallback with GraftTypeCheck {
  override def prettyName: String = "mg_entries"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("cnt_lo", LongType, nullable = false),
    StructField("cnt_hi", LongType, nullable = false))), containsNull = false)
  override protected def expectedTypes = Seq(GraftTypeCheck.binary)
  override def nullSafeEval(blob: Any): Any = {
    val mg = MgSketch.deserialize(blob.asInstanceOf[Array[Byte]])
    val delta = mg.errorBound
    val rows: Array[Any] = mg.entries
      .sortBy { case (k, lo) => (-lo, k) }
      .map { case (k, lo) =>
        org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(k), lo, lo + delta)
      }.toArray[Any]
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
  override protected def withNewChildInternal(c: Expression): MgEntries = copy(c)
}
