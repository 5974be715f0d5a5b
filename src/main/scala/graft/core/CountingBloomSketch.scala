package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Counting Bloom filter: the reference family's counting variant (barrust
  * maintains it in pyprobables; design per Fan, Cao, Almeida, Broder,
  * "Summary Cache: A Scalable Wide-Area Web Cache Sharing Protocol", 2000).
  *
  * Same geometry and hashing as [[BloomSketch]] (reference
  * `bloom.c:397-408,490-508`), but each bit is a 32-bit counter, which
  * supports `remove` and exact frequency-floor queries. The merge is
  * element-wise counter addition — associative and commutative, so it is a
  * legal Spark aggregation monoid at any merge-tree shape.
  */
final class CountingBloomSketch private (
    val estimatedElements: Long,
    val falsePositiveRate: Float,
    val numberHashes: Int,
    val numberBits: Long, // number of counters
    val counters: Array[Int],
    private var _elementsAdded: Long
) extends Serializable {

  def elementsAdded: Long = _elementsAdded

  private def indices(key: String): Array[Int] =
    indices(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def indices(key: Array[Byte]): Array[Int] = {
    val out = new Array[Int](numberHashes)
    var i = 0
    while (i < numberHashes) {
      out(i) = java.lang.Long.remainderUnsigned(Fnv.fnv1a(key, i), numberBits).toInt
      i += 1
    }
    out
  }

  def add(key: String): Unit =
    add(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Byte-path hot loop (the UDAF update path): seeded FNV passes computed
    * inline on the UTF-8 bytes — no String materialization per row.
    */
  def add(key: Array[Byte]): Unit = {
    var i = 0
    while (i < numberHashes) {
      val j = java.lang.Long.remainderUnsigned(Fnv.fnv1a(key, i), numberBits).toInt
      if (counters(j) != Int.MaxValue) counters(j) += 1
      i += 1
    }
    _elementsAdded += 1
  }

  /** Decrement the key's counters (floor at 0). No-op semantics if the key
    * was never added — counting blooms cannot detect that; callers own it.
    */
  def remove(key: String): Unit = {
    val idx = indices(key)
    var i = 0
    while (i < idx.length) {
      val j = idx(i)
      if (counters(j) > 0) counters(j) -= 1
      i += 1
    }
    if (_elementsAdded > 0) _elementsAdded -= 1
  }

  def contains(key: String): Boolean =
    contains(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def contains(key: Array[Byte]): Boolean = {
    var i = 0
    while (i < numberHashes) {
      if (counters(java.lang.Long.remainderUnsigned(Fnv.fnv1a(key, i), numberBits).toInt) == 0) return false
      i += 1
    }
    true
  }

  /** Upper bound on the key's insert count: min over its k counters. */
  def estimateCount(key: String): Int =
    estimateCount(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def estimateCount(key: Array[Byte]): Int = {
    var mn = Int.MaxValue
    var i = 0
    while (i < numberHashes) {
      val v = counters(java.lang.Long.remainderUnsigned(Fnv.fnv1a(key, i), numberBits).toInt)
      if (v < mn) mn = v
      i += 1
    }
    mn
  }

  def countSetCounters: Long = counters.count(_ > 0).toLong

  def compatibleWith(other: CountingBloomSketch): Boolean =
    numberHashes == other.numberHashes && numberBits == other.numberBits

  /** Element-wise floored counter subtract — batch removal at scale: build
    * a counting filter over the removed keys with the same geometry, then
    * subtract it (the distributed analog of per-key `remove`, which is the
    * reference family's decrement).
    *
    * '''Hazard (same caveat as the reference family's `remove`)''': this is
    * only clean when every subtracted key was actually added to the
    * receiver and no counter saturated. Subtracting a batch containing
    * never-added keys decrements whatever buckets those keys hash to —
    * colliding counters of OTHER keys — and can introduce false negatives
    * for keys that remain. The filter cannot detect misuse (the 0-floor
    * hides the underflow); callers own the add⊇remove discipline. The
    * returned [[flooredBuckets]] count from the last subtract is an
    * observable signal: a nonzero floor count means the subtraction was
    * not clean (some bucket would have gone negative).
    */
  def subtractInPlace(other: CountingBloomSketch): CountingBloomSketch = {
    require(compatibleWith(other), "incompatible counting blooms")
    var floored = 0L
    var i = 0
    while (i < counters.length) {
      val d = counters(i) - other.counters(i)
      if (d < 0) { counters(i) = 0; floored += 1 } else counters(i) = d
      i += 1
    }
    _flooredBuckets = floored
    _elementsAdded = math.max(0L, _elementsAdded - other._elementsAdded)
    this
  }

  /** Buckets floored at 0 by the LAST [[subtractInPlace]] — nonzero means
    * the subtracted batch contained keys (or counts) never added here.
    */
  def flooredBuckets: Long = _flooredBuckets
  @transient private var _flooredBuckets: Long = 0L

  /** Element-wise saturating counter add — the aggregation merge. */
  def mergeInPlace(other: CountingBloomSketch): CountingBloomSketch = {
    require(compatibleWith(other), "incompatible counting blooms")
    var i = 0
    while (i < counters.length) {
      val s = counters(i).toLong + other.counters(i).toLong
      counters(i) = if (s > Int.MaxValue) Int.MaxValue else s.toInt
      i += 1
    }
    _elementsAdded += other._elementsAdded
    this
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(counters.length * 4 + 20).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < counters.length) { buf.putInt(counters(i)); i += 1 }
    buf.putLong(estimatedElements)
    buf.putLong(_elementsAdded)
    buf.putFloat(falsePositiveRate)
    buf.array()
  }

  override def toString: String =
    s"CountingBloomSketch(n=$estimatedElements,p=$falsePositiveRate,k=$numberHashes,m=$numberBits,added=${_elementsAdded})"
}

object CountingBloomSketch {
  def empty(n: Long, p: Float): CountingBloomSketch = {
    val (m, k, _) = BloomSketch.geometry(n, p)
    require(m <= Int.MaxValue - 8, s"counting bloom too large for one JVM sketch: $m counters")
    new CountingBloomSketch(n, p, k, m, new Array[Int](m.toInt), 0L)
  }

  def deserialize(bytes: Array[Byte]): CountingBloomSketch = {
    val buf = ByteBuffer.wrap(bytes, bytes.length - 20, 20).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getLong
    val added = buf.getLong
    val p = buf.getFloat
    val (m, k, _) = BloomSketch.geometry(n, p)
    require(bytes.length - 20 == m * 4, s"corrupt counting bloom blob: ${bytes.length}")
    val arr = new Array[Int](m.toInt)
    val body = ByteBuffer.wrap(bytes, 0, arr.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < arr.length) { arr(i) = body.getInt; i += 1 }
    new CountingBloomSketch(n, p, k, m, arr, added)
  }
}
