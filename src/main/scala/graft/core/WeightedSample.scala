package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/** Weighted distinct sample: a mergeable, DETERMINISTIC sample of k keys
  * where a key's inclusion probability scales with its weight (bytes per
  * domain, quality score per document — "show me k example domains,
  * weighted by volume").
  *
  * Published basis: Efraimidis & Spirakis, "Weighted random sampling with
  * a reservoir" (IPL 2006, algorithm A-Res): draw `u ~ U(0,1]` per key,
  * keep the k largest `u^(1/w)` — equivalently the k SMALLEST
  * `-ln(u)/w`, which is the bottom-k shape this library's samples share
  * ([[BkSample]]). Here `u` is a fixed deterministic hash of the key
  * (the library hash contract), so:
  *
  *   - **deterministic**: the same input multiset yields the bitwise-
  *     identical summary at any parallelism/merge order;
  *   - **exact monoid**: per-key priority is min-merged (a key's priority
  *     only ever improves as larger weights are observed), then global
  *     bottom-k — associative + commutative, eviction-safe (an entry is
  *     only evicted when k strictly-better entries exist, and entries
  *     never worsen);
  *   - **distinct-key semantics**: duplicates of a key do NOT accumulate;
  *     the key's effective weight is the MAXIMUM weight observed for it
  *     (for the usual per-key-constant weights this is exactly A-Res over
  *     the distinct key set). Accumulating duplicate weights would break
  *     mergeability — an evicted key's partial weight would be lost.
  *
  * Serialization (LE, magic-versioned): magic, k, totalAdds, numEntries,
  * then entries in (priority, key) order: priority f64 bits, weight i64,
  * keyLen, key bytes.
  */
final class WeightedSample private (
    val k: Int,
    // (priority, key bytes, weight) ordered by (priority asc, key)
    private val entries0: java.util.TreeSet[(Double, Array[Byte], Long)],
    // content-keyed index of the same entries (key-level dedup); the key
    // wrapper is Serializable (unlike ByteBuffer) so a driver-built
    // sample survives closure/Encoder serialization intact
    private val index: java.util.HashMap[WeightedSample.BytesKey, (Double, Array[Byte], Long)],
    private var _adds: Long
) extends Serializable {

  def size: Int = entries0.size

  /** Rows folded in (duplicates included) — additive across merges. */
  def totalAdds: Long = _adds

  def add(key: String, weight: Long): Unit = add(key.getBytes(UTF_8), weight)

  /** Non-positive weights are skipped (a zero-weight key has inclusion
    * probability 0; negatives are undefined under A-Res).
    */
  def add(key: Array[Byte], weight: Long): Unit = {
    _adds += 1
    if (weight <= 0) return
    offer(key, weight, WeightedSample.priority(key, weight), copyOnInsert = true)
  }

  /** Insert/improve an entry; maintains bottom-k. */
  private def offer(key: Array[Byte], weight: Long, p: Double,
                    copyOnInsert: Boolean): Unit = {
    val wrapped = new WeightedSample.BytesKey(key)
    val cur = index.get(wrapped)
    if (cur != null) {
      // larger weight observed: priority improves. The weight tie-break
      // covers priority COLLISIONS (two distinct weights whose -ln(u)/w
      // rounds to the same double — relative weight gap < ~2^-53): the
      // stored weight must still be the max observed, independent of
      // merge order, or ws_entries output becomes partitioning-dependent.
      if (p < cur._1 || (p == cur._1 && weight > cur._3)) {
        entries0.remove(cur)
        val e = (p, cur._2, weight)
        entries0.add(e)
        index.put(new WeightedSample.BytesKey(cur._2), e)
      }
      return
    }
    if (entries0.size < k || WeightedSample.ord.compare(
        (p, key, weight), entries0.last()) < 0) {
      val kb = if (copyOnInsert) key.clone() else key
      val e = (p, kb, weight)
      entries0.add(e)
      index.put(new WeightedSample.BytesKey(kb), e)
      if (entries0.size > k) {
        val worst = entries0.last()
        entries0.remove(worst)
        index.remove(new WeightedSample.BytesKey(worst._2))
      }
    }
  }

  /** Sampled keys in priority order (deterministic), UTF-8 decoded. */
  def values: Array[String] = {
    val out = new Array[String](entries0.size)
    val it = entries0.iterator()
    var i = 0
    while (it.hasNext) { out(i) = new String(it.next()._2, UTF_8); i += 1 }
    out
  }

  /** (key, weight) pairs in priority order. */
  def entries: Array[(String, Long)] = {
    val out = new Array[(String, Long)](entries0.size)
    val it = entries0.iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); out(i) = (new String(e._2, UTF_8), e._3); i += 1 }
    out
  }

  def mergeInPlace(other: WeightedSample): WeightedSample = {
    require(k == other.k, s"incompatible weighted-sample capacities: $k vs ${other.k}")
    _adds += other._adds
    val it = other.entries0.iterator()
    while (it.hasNext) {
      val e = it.next()
      // other's arrays are owned by other (discarded after merge) — safe to share
      offer(e._2, e._3, e._1, copyOnInsert = false)
    }
    this
  }

  def serialize(): Array[Byte] = {
    val vs = new Array[(Double, Array[Byte], Long)](entries0.size)
    entries0.toArray(vs.asInstanceOf[Array[Object]])
    val size = 4 + 4 + 8 + 4 + vs.map(_._2.length + 20).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(WeightedSample.Magic)
    bb.putInt(k)
    bb.putLong(_adds)
    bb.putInt(vs.length)
    var i = 0
    while (i < vs.length) {
      bb.putLong(java.lang.Double.doubleToRawLongBits(vs(i)._1))
      bb.putLong(vs(i)._3)
      bb.putInt(vs(i)._2.length)
      bb.put(vs(i)._2)
      i += 1
    }
    bb.array()
  }
}

object WeightedSample {
  /** 'W''S' + format version 1. */
  private[core] val Magic: Int = 0x57530001

  /** Serializable content-keyed wrapper for the index map (ByteBuffer's
    * content equals/hashCode without its non-Serializable baggage).
    */
  private[core] final class BytesKey(val bytes: Array[Byte]) extends Serializable {
    override def hashCode(): Int = java.util.Arrays.hashCode(bytes)
    override def equals(o: Any): Boolean = o match {
      case that: BytesKey => java.util.Arrays.equals(bytes, that.bytes)
      case _ => false
    }
  }

  /** A-Res key: `-ln(u)/w` with deterministic `u ∈ (0,1)` from the key
    * hash (seed 1 — independent of [[BkSample]]'s unweighted priority).
    * Doubles merge bitwise across partitions because the same (key, w)
    * always produces the identical priority.
    */
  private[core] def priority(key: Array[Byte], weight: Long): Double = {
    val h = Fnv.splitmix64(Fnv.fnv1a(key, 1))
    val u = ((h >>> 11) + 0.5) / (1L << 53).toDouble // (0,1)
    -math.log(u) / weight.toDouble
  }

  /** Test hook. */
  private[graft] def testPriority(key: String, weight: Long): Double =
    priority(key.getBytes(UTF_8), weight)

  private[core] val ord: java.util.Comparator[(Double, Array[Byte], Long)] =
    new java.util.Comparator[(Double, Array[Byte], Long)] with Serializable {
      override def compare(a: (Double, Array[Byte], Long), b: (Double, Array[Byte], Long)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else MgSketch.byteOrder.compare(a._2, b._2)
      }
    }

  def empty(k: Int): WeightedSample = {
    require(k >= 1, "k must be >= 1")
    new WeightedSample(k,
      new java.util.TreeSet[(Double, Array[Byte], Long)](ord),
      new java.util.HashMap[BytesKey, (Double, Array[Byte], Long)](k * 2), 0L)
  }

  def deserialize(bytes: Array[Byte]): WeightedSample = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt()
    require(magic == Magic, f"not a weighted-sample blob (magic 0x$magic%08x)")
    val k = bb.getInt()
    val adds = bb.getLong()
    val n = bb.getInt()
    val s = empty(k)
    var i = 0
    while (i < n) {
      val p = java.lang.Double.longBitsToDouble(bb.getLong())
      val w = bb.getLong()
      val len = bb.getInt()
      val kb = new Array[Byte](len)
      bb.get(kb)
      s.offer(kb, w, p, copyOnInsert = false)
      i += 1
    }
    s._adds = adds
    s
  }
}
