package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/** Misra-Gries top-k frequency summary, from scratch per Misra & Gries,
  * "Finding repeated elements" (Sci. Comput. Program. 1982), with the
  * mergeable extension of Agarwal, Cormode, Huang, Phillips, Wei & Yi,
  * "Mergeable summaries" (PODS 2012, §3.1).
  *
  * Complements the CMS heavy-hitter path ([[graft.ops.HeavyHitters]]):
  * CMS + candidate-join needs a second scan of the input; Misra-Gries is
  * single-pass and carries the candidate keys *inside* the summary, so a
  * groupBy-free `df.agg(mg_sketch(col, k))` yields heavy hitters in one
  * shuffle of one small blob per partition.
  *
  * State: at most `k` (key, count) counters plus a running decrement total
  * `delta`. Guarantees, with `n = totalCount`:
  *   - `estimate(x) <= true(x)` (counts are only ever decremented);
  *   - `estimate(x) >= true(x) - delta` where `delta <= n / (k + 1)`;
  *   - therefore any key with `true(x) > n / (k + 1)` is present.
  *
  * Merge (PODS 2012): sum counters key-wise, add the two deltas, then if
  * more than `k` counters remain subtract the (k+1)-th largest count from
  * all and drop the non-positive — the combined bound `delta1 + delta2 +
  * d` still satisfies `delta <= n / (k + 1)`. Associative + commutative in
  * the guarantee (the retained-counter *set* can differ by merge order for
  * keys below the bound, as published — callers get order-invariant
  * answers for every key above the bound).
  *
  * Serialization (LE, versioned like CMS `CmsSketch` blobs): magic,
  * k, totalCount, delta, numEntries, then entries sorted by key
  * (deterministic blob for a given counter state): keyLen, utf8 bytes,
  * count.
  */
final class MgSketch private (
    val k: Int,
    private val counters: java.util.HashMap[String, java.lang.Long],
    private var _totalCount: Long,
    private var _delta: Long
) extends Serializable {

  def totalCount: Long = _totalCount

  /** Total decrement applied — the per-key underestimate bound. */
  def errorBound: Long = _delta

  def numCounters: Int = counters.size

  def add(key: String, weight: Long = 1L): Unit = {
    require(weight >= 0, "negative weights not supported")
    if (weight == 0) return
    val cur = counters.get(key)
    if (cur != null) counters.put(key, java.lang.Long.valueOf(cur.longValue() + weight))
    else {
      counters.put(key, java.lang.Long.valueOf(weight))
      if (counters.size > k) compress()
    }
    _totalCount += weight
  }

  /** Subtract the (k+1)-th largest count from every counter and drop the
    * non-positive, restoring `size <= k`. Each unit subtracted here is
    * matched by >= k other units subtracted in the same step, which is
    * what keeps `delta <= n / (k + 1)`.
    */
  private def compress(): Unit = {
    val m = counters.size
    val vals = new Array[Long](m)
    val it = counters.values.iterator()
    var i = 0
    while (it.hasNext) { vals(i) = it.next().longValue(); i += 1 }
    java.util.Arrays.sort(vals)
    val d = vals(m - (k + 1)) // (k+1)-th largest
    val entries = counters.entrySet().iterator()
    while (entries.hasNext) {
      val e = entries.next()
      val nv = e.getValue.longValue() - d
      if (nv <= 0) entries.remove() else e.setValue(java.lang.Long.valueOf(nv))
    }
    _delta += d
  }

  /** Lower-bound frequency estimate: `true - errorBound <= est <= true`. */
  def estimate(key: String): Long = {
    val v = counters.get(key)
    if (v == null) 0L else v.longValue()
  }

  /** Top-`j` retained keys, ordered by (count desc, key asc). */
  def topK(j: Int): Array[String] = {
    val entries = new java.util.ArrayList(counters.entrySet())
    entries.sort { (a: java.util.Map.Entry[String, java.lang.Long], b: java.util.Map.Entry[String, java.lang.Long]) =>
      val c = java.lang.Long.compare(b.getValue.longValue(), a.getValue.longValue())
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val n = math.min(j, entries.size)
    val out = new Array[String](n)
    var i = 0
    while (i < n) { out(i) = entries.get(i).getKey; i += 1 }
    out
  }

  /** All retained (key, lower-bound count) pairs, key-sorted. */
  def entries: Array[(String, Long)] = {
    val ks = counters.keySet().toArray(new Array[String](0))
    java.util.Arrays.sort(ks.asInstanceOf[Array[Object]])
    ks.map(key => (key, counters.get(key).longValue()))
  }

  def mergeInPlace(other: MgSketch): MgSketch = {
    require(k == other.k, s"incompatible Misra-Gries capacities: $k vs ${other.k}")
    val it = other.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counters.get(e.getKey)
      counters.put(e.getKey, if (cur == null) e.getValue else java.lang.Long.valueOf(cur.longValue() + e.getValue.longValue()))
    }
    _totalCount += other._totalCount
    _delta += other._delta
    if (counters.size > k) compress()
    this
  }

  def serialize(): Array[Byte] = {
    val ks = counters.keySet().toArray(new Array[String](0))
    java.util.Arrays.sort(ks.asInstanceOf[Array[Object]])
    val keyBytes = ks.map(_.getBytes(UTF_8))
    val size = 4 + 4 + 8 + 8 + 4 + keyBytes.map(_.length + 12).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(MgSketch.Magic)
    bb.putInt(k)
    bb.putLong(_totalCount)
    bb.putLong(_delta)
    bb.putInt(ks.length)
    var i = 0
    while (i < ks.length) {
      bb.putInt(keyBytes(i).length)
      bb.put(keyBytes(i))
      bb.putLong(counters.get(ks(i)).longValue())
      i += 1
    }
    bb.array()
  }
}

object MgSketch {
  /** 'M''G' + format version 1. */
  private[core] val Magic: Int = 0x4d470001

  def empty(k: Int): MgSketch = {
    require(k >= 1, "k must be >= 1")
    new MgSketch(k, new java.util.HashMap[String, java.lang.Long](k * 2), 0L, 0L)
  }

  /** Header-only read of `totalCount` (fixed offset 8) — no entry
    * materialization; the per-row path of `mg_total_count`.
    */
  def headerTotalCount(bytes: Array[Byte]): Long = {
    checkMagic(bytes)
    ByteBuffer.wrap(bytes, 8, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
  }

  /** Header-only read of the decrement total Δ (fixed offset 16). */
  def headerErrorBound(bytes: Array[Byte]): Long = {
    checkMagic(bytes)
    ByteBuffer.wrap(bytes, 16, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
  }

  private def checkMagic(bytes: Array[Byte]): Unit = {
    require(bytes.length >= 24, "truncated Misra-Gries blob")
    val magic = ByteBuffer.wrap(bytes, 0, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    require(magic == Magic, f"not a Misra-Gries blob (magic 0x$magic%08x)")
  }

  def deserialize(bytes: Array[Byte]): MgSketch = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt()
    require(magic == Magic, f"not a Misra-Gries blob (magic 0x$magic%08x)")
    val k = bb.getInt()
    val total = bb.getLong()
    val delta = bb.getLong()
    val n = bb.getInt()
    val m = new java.util.HashMap[String, java.lang.Long](k * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val kb = new Array[Byte](len)
      bb.get(kb)
      m.put(new String(kb, UTF_8), java.lang.Long.valueOf(bb.getLong()))
      i += 1
    }
    new MgSketch(k, m, total, delta)
  }
}
