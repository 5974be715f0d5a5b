package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Primitive KMV entry store: an open-addressed long hash set (O(1)
  * contains/add, no boxing) paired with a binary max-heap over the same
  * values (O(log k) evict-largest). The UDAF hot loop is `addHash` —
  * millions of calls per partition — so the store allocates nothing per
  * operation; `java.util.TreeSet[java.lang.Long]` here cost a box + tree
  * node per add and O(log k) pointer-chasing per contains (measured ~3×
  * slower on the update loop).
  *
  * Hash values are 63-bit non-negative, so `Long.MinValue` (EMPTY) and
  * `Long.MinValue + 1` (TOMBSTONE, left by evictions) are free sentinels.
  * The heap array always holds exactly the live set, so when tombstones
  * accumulate past half the live count the table is rebuilt from the heap
  * in O(k) — amortized O(1) per eviction.
  */
private[core] final class LongKmvStore(initialCap: Int) {
  import LongKmvStore._

  private var tab: Array[Long] = {
    var c = 16
    while (c < initialCap * 2) c <<= 1
    Array.fill(c)(EMPTY)
  }
  private var heap = new Array[Long](math.max(initialCap, 16))
  private var n = 0
  private var tombstones = 0

  def size: Int = n
  def isEmpty: Boolean = n == 0

  /** Max value (heap root); undefined when empty. */
  def max: Long = heap(0)

  /** Iterate live values in heap order (NOT sorted). */
  def foreach(f: Long => Unit): Unit = {
    var i = 0
    while (i < n) { f(heap(i)); i += 1 }
  }

  /** Live values, ascending (for serialization). */
  def sortedValues: Array[Long] = {
    val out = java.util.Arrays.copyOf(heap, n)
    java.util.Arrays.sort(out)
    out
  }

  private def mix(h: Long): Int = {
    // splitmix-style finalizer for the probe start (values are already
    // well-distributed hashes, one xorshift-multiply suffices)
    val z = h ^ (h >>> 31)
    (z * 0x7fb5d329728ea185L >>> 40).toInt
  }

  def contains(v: Long): Boolean = {
    val mask = tab.length - 1
    var i = mix(v) & mask
    while (true) {
      val e = tab(i)
      if (e == v) return true
      if (e == EMPTY) return false
      i = (i + 1) & mask
    }
    false
  }

  /** Add if absent; returns true when the value was new. */
  def add(v: Long): Boolean = {
    val mask = tab.length - 1
    var i = mix(v) & mask
    var slot = -1
    while (true) {
      val e = tab(i)
      if (e == v) return false
      if (e == EMPTY) {
        tab(if (slot >= 0) slot else i) = v
        if (slot >= 0) tombstones -= 1
        heapPush(v)
        n += 1
        if (2L * (n + tombstones) > tab.length) grow()
        return true
      }
      if (e == TOMBSTONE && slot < 0) slot = i
      i = (i + 1) & mask
    }
    false
  }

  /** Remove and return the largest value. */
  def removeMax(): Long = {
    val m = heap(0)
    n -= 1
    heap(0) = heap(n)
    siftDown(0)
    // lazy-delete from the table; rebuild when tombstones dominate
    val mask = tab.length - 1
    var i = mix(m) & mask
    while (tab(i) != m) i = (i + 1) & mask
    tab(i) = TOMBSTONE
    tombstones += 1
    if (tombstones > math.max(8, n / 2)) rebuild()
    m
  }

  private def heapPush(v: Long): Unit = {
    if (n == heap.length) heap = java.util.Arrays.copyOf(heap, heap.length * 2)
    var i = n
    heap(i) = v
    while (i > 0) {
      val p = (i - 1) >> 1
      if (heap(p) >= heap(i)) return
      val t = heap(p); heap(p) = heap(i); heap(i) = t
      i = p
    }
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      if (l >= n) return
      var c = l
      if (l + 1 < n && heap(l + 1) > heap(l)) c = l + 1
      if (heap(i) >= heap(c)) return
      val t = heap(i); heap(i) = heap(c); heap(c) = t
      i = c
    }
  }

  private def grow(): Unit = {
    val bigger = Array.fill(tab.length * 2)(EMPTY)
    reinsert(bigger)
  }

  private def rebuild(): Unit = {
    java.util.Arrays.fill(tab, EMPTY)
    reinsert(tab)
  }

  private def reinsert(target: Array[Long]): Unit = {
    if (!(target eq tab)) java.util.Arrays.fill(target, EMPTY)
    val mask = target.length - 1
    var j = 0
    while (j < n) {
      val v = heap(j)
      var i = mix(v) & mask
      while (target(i) != EMPTY) i = (i + 1) & mask
      target(i) = v
      j += 1
    }
    tab = target
    tombstones = 0
  }

  def copyOf(): LongKmvStore = {
    val c = new LongKmvStore(16)
    c.tab = tab.clone()
    c.heap = heap.clone()
    c.n = n
    c.tombstones = tombstones
    c
  }
}

private[core] object LongKmvStore {
  final val EMPTY = Long.MinValue
  final val TOMBSTONE = Long.MinValue + 1
}

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
  * partitioning). The entry store is primitive ([[LongKmvStore]]) — the
  * per-row aggregation path allocates nothing; final state and
  * serialized bytes are identical to the earlier tree-based
  * implementation (eviction order is a pure function of the value set).
  *
  * Hash: the library family — seeded FNV-1a finalized with splitmix64
  * (`bloom.c:499-508` lineage), mapped to [0, 2^63).
  */
final class ThetaSketch private (
    val nominalK: Int,
    private var _theta: Long,
    private val entries: LongKmvStore
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
      _theta = entries.removeMax()
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
      while (!entries.isEmpty && entries.max >= _theta) entries.removeMax()
    }
    other.entries.foreach { h =>
      if (h < _theta && entries.add(h) && entries.size > nominalK) _theta = entries.removeMax()
    }
    // tightening θ by eviction may strand entries ≥ θ added earlier? No:
    // eviction sets θ to the evicted (largest) value, so all remaining
    // entries are < θ by construction.
    this
  }

  /** Enforce `retained ≤ k` on a set-op result whose operands had
    * different nominal k: keep the k smallest (input is ASCENDING) and
    * tighten θ to the first dropped value — the estimator stays unbiased,
    * only the sample (and thus the reported standard error) shrinks to
    * the smaller k's. With equal-k operands (the common case) this is a
    * no-op.
    */
  private def fromAscending(k: Int, t0: Long, asc: Array[Long], len: Int): ThetaSketch = {
    val keep = math.min(k, len)
    val t = if (len > k) asc(k) else t0
    val store = new LongKmvStore(math.max(keep, 16))
    var i = 0
    while (i < keep) { store.add(asc(i)); i += 1 }
    new ThetaSketch(k, t, store)
  }

  /** Intersection estimate sketch: sample = A∩B below min θ. */
  def intersect(other: ThetaSketch): ThetaSketch = {
    val t = math.min(_theta, other._theta)
    val mine = entries.sortedValues
    val out = new Array[Long](mine.length)
    var n = 0
    var i = 0
    while (i < mine.length) {
      val h = mine(i)
      if (h < t && other.entries.contains(h)) { out(n) = h; n += 1 }
      i += 1
    }
    fromAscending(math.min(nominalK, other.nominalK), t, out, n)
  }

  /** Difference (A \ B) estimate sketch. */
  def aNotB(other: ThetaSketch): ThetaSketch = {
    val t = math.min(_theta, other._theta)
    val mine = entries.sortedValues
    val out = new Array[Long](mine.length)
    var n = 0
    var i = 0
    while (i < mine.length) {
      val h = mine(i)
      if (h < t && !other.entries.contains(h)) { out(n) = h; n += 1 }
      i += 1
    }
    fromAscending(math.min(nominalK, other.nominalK), t, out, n)
  }

  def union(other: ThetaSketch): ThetaSketch = copy().mergeInPlace(other)

  def copy(): ThetaSketch = new ThetaSketch(nominalK, _theta, entries.copyOf())

  /** `k:int32 | θ:int64 | n:int32 | n × hash:int64` (LE, hashes ascending). */
  def serialize(): Array[Byte] = {
    val asc = entries.sortedValues
    val buf = ByteBuffer.allocate(16 + asc.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(nominalK)
    buf.putLong(_theta)
    buf.putInt(asc.length)
    var i = 0
    while (i < asc.length) { buf.putLong(asc(i)); i += 1 }
    buf.array()
  }

  override def toString: String =
    s"ThetaSketch(k=$nominalK,retained=${entries.size},theta=${_theta},est=$estimateLong)"
}

object ThetaSketch {
  def empty(nominalK: Int = 4096): ThetaSketch = {
    require(nominalK >= 16, s"theta nominal k must be >= 16, got $nominalK")
    new ThetaSketch(nominalK, Long.MaxValue, new LongKmvStore(math.min(nominalK + 1, 1024)))
  }

  def deserialize(bytes: Array[Byte]): ThetaSketch = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val k = buf.getInt
    val theta = buf.getLong
    val n = buf.getInt
    require(bytes.length == 16 + n * 8, s"corrupt theta blob: ${bytes.length} for n=$n")
    val store = new LongKmvStore(math.max(n, 16))
    var i = 0
    while (i < n) { store.add(buf.getLong); i += 1 }
    new ThetaSketch(k, theta, store)
  }
}
