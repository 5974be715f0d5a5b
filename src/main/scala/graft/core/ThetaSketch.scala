package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Theta (KMV) sketch — distinct counting WITH set algebra, from scratch
  * per Beyer, Haas, Reinwald, Sismanis, Gemulla, "On Synopses for
  * Distinct-Value Estimation Under Multiset Operations" (SIGMOD 2007) and
  * the theta-sketch framework of Dasgupta, Lang, Rhodes, Thaler
  * ("A Framework for Estimating Stream Expression Cardinalities", 2016).
  *
  * Why it exists next to [[HllSketch]]: HLL merges by register-max, so it
  * supports UNION only — intersections/differences (e.g. "distinct urls
  * seen in BOTH crawls", "new urls this snapshot") have no sound HLL
  * estimator. A theta sketch retains an actual uniform hash sample of the
  * key space (the k smallest 63-bit hashes, threshold θ), so set
  * operations act on the samples themselves and keep an unbiased
  * estimator: `est = retained / (θ / 2^63)`, relative standard error
  * ≈ `1/sqrt(k-1)` for build/union (intersection error scales with the
  * union-to-intersection ratio — documented, checked in tests).
  *
  * Merge/union is deterministic (k smallest of the union below min θ),
  * hence associative and commutative — a legal Spark aggregation monoid
  * with the library's parallelism-invariance property (same blob at any
  * partitioning).
  *
  * Hash: the library family — seeded FNV-1a finalized with splitmix64
  * (`bloom.c:499-508` lineage), mapped to [0, 2^63).
  */
final class ThetaSketch private (
    val nominalK: Int,
    private var _theta: Long,
    private val entries: java.util.TreeSet[java.lang.Long]
) extends Serializable {

  def theta: Long = _theta
  def retained: Int = entries.size
  def isEstimationMode: Boolean = _theta != Long.MaxValue

  private def hash63(key: Array[Byte]): Long = Fnv.splitmix64(Fnv.fnv1a(key, 0)) >>> 1

  def add(key: String): Unit = add(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def add(key: Array[Byte]): Unit = addHash(hash63(key))

  def addLong(v: Long): Unit = addHash(Fnv.splitmix64(v) >>> 1)

  def addHash(h: Long): Unit = {
    if (h < _theta && entries.add(h) && entries.size > nominalK) {
      // evict the largest; θ becomes that value (exclusive bound), so the
      // retained set is exactly the nominalK smallest hashes < θ
      _theta = entries.pollLast()
    }
  }

  /** Unbiased distinct estimate: exact below capacity, `n/(θ/2^63)` after. */
  def estimate: Double =
    if (!isEstimationMode) entries.size.toDouble
    else entries.size.toDouble * (Long.MaxValue.toDouble + 1.0) / _theta.toDouble

  def estimateLong: Long = math.rint(estimate).toLong

  /** RSE bound `1/sqrt(k-1)` (KMV, Beyer 2007 §4). */
  def standardError: Double = 1.0 / math.sqrt(math.max(nominalK - 1, 1).toDouble)

  /** Union in place — the aggregation merge. Deterministic: k smallest of
    * the combined sample below min(θa, θb).
    */
  def mergeInPlace(other: ThetaSketch): ThetaSketch = {
    require(nominalK == other.nominalK, s"incompatible theta k: $nominalK vs ${other.nominalK}")
    if (other._theta < _theta) {
      _theta = other._theta
      // drop own entries no longer below the tightened threshold
      while (!entries.isEmpty && entries.last() >= _theta) entries.pollLast()
    }
    val it = other.entries.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (h < _theta && entries.add(h) && entries.size > nominalK) _theta = entries.pollLast()
    }
    // tightening θ by eviction may strand entries ≥ θ added earlier? No:
    // eviction sets θ to the evicted (largest) value, so all remaining
    // entries are < θ by construction.
    this
  }

  /** Enforce `retained ≤ k` on a set-op result whose operands had
    * different nominal k: keep the k smallest and tighten θ to the first
    * evicted value — the estimator stays unbiased, only the sample (and
    * thus the reported standard error) shrinks to the smaller k's. With
    * equal-k operands (the common case) this is a no-op.
    */
  private def trimTo(k: Int, t0: Long, out: java.util.TreeSet[java.lang.Long]): ThetaSketch = {
    var t = t0
    while (out.size > k) t = out.pollLast()
    new ThetaSketch(k, t, out)
  }

  /** Intersection estimate sketch: sample = A∩B below min θ. */
  def intersect(other: ThetaSketch): ThetaSketch = {
    val t = math.min(_theta, other._theta)
    val out = new java.util.TreeSet[java.lang.Long]()
    val it = entries.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (h < t && other.entries.contains(h)) out.add(h)
    }
    trimTo(math.min(nominalK, other.nominalK), t, out)
  }

  /** Difference (A \ B) estimate sketch. */
  def aNotB(other: ThetaSketch): ThetaSketch = {
    val t = math.min(_theta, other._theta)
    val out = new java.util.TreeSet[java.lang.Long]()
    val it = entries.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (h < t && !other.entries.contains(h)) out.add(h)
    }
    trimTo(math.min(nominalK, other.nominalK), t, out)
  }

  def union(other: ThetaSketch): ThetaSketch = copy().mergeInPlace(other)

  def copy(): ThetaSketch =
    new ThetaSketch(nominalK, _theta, new java.util.TreeSet[java.lang.Long](entries))

  /** `k:int32 | θ:int64 | n:int32 | n × hash:int64` (LE, hashes ascending). */
  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(16 + entries.size * 8).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(nominalK)
    buf.putLong(_theta)
    buf.putInt(entries.size)
    val it = entries.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }

  override def toString: String =
    s"ThetaSketch(k=$nominalK,retained=${entries.size},theta=${_theta},est=$estimateLong)"
}

object ThetaSketch {
  def empty(nominalK: Int = 4096): ThetaSketch = {
    require(nominalK >= 16, s"theta nominal k must be >= 16, got $nominalK")
    new ThetaSketch(nominalK, Long.MaxValue, new java.util.TreeSet[java.lang.Long]())
  }

  def deserialize(bytes: Array[Byte]): ThetaSketch = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val k = buf.getInt
    val theta = buf.getLong
    val n = buf.getInt
    require(bytes.length == 16 + n * 8, s"corrupt theta blob: ${bytes.length} for n=$n")
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { set.add(buf.getLong); i += 1 }
    new ThetaSketch(k, theta, set)
  }
}
