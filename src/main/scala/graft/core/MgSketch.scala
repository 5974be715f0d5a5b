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
  * Store: an open-addressed linear-probe table of RAW KEY BYTES and
  * primitive counts — the UDAF hot loop ([[graft.agg.MgSketchAgg]])
  * upserts without boxing a `java.lang.Long` or materializing a `String`
  * per row, and BINARY keys are counted by their exact bytes (two
  * distinct non-UTF8 byte strings never collapse, unlike a
  * lossy-decoding String map). String keys enter as their UTF-8 bytes —
  * the same identity contract as the hash-based sketches
  * ([[graft.core.Fnv]]). `entries`/`topK` decode keys back via UTF-8 for
  * display (lossless for any key that entered as a string; a non-UTF8
  * binary key's *display form* is lossy but its counting never is).
  *
  * Serialization (LE, versioned like CMS `CmsSketch` blobs): magic,
  * k, totalCount, delta, numEntries, then entries sorted by unsigned
  * byte-lexicographic key order (deterministic blob for a given counter
  * state; identical to the previous String-order blobs for ASCII keys):
  * keyLen, key bytes, count.
  */
final class MgSketch private (
    val k: Int,
    // open-addressed linear-probe table: null slot = empty
    private var tkeys: Array[Array[Byte]],
    private var tcounts: Array[Long],
    private var mask: Int,
    private var _size: Int,
    private var _totalCount: Long,
    private var _delta: Long
) extends Serializable {

  def totalCount: Long = _totalCount

  /** Total decrement applied — the per-key underestimate bound. */
  def errorBound: Long = _delta

  def numCounters: Int = _size

  private def hashOf(key: Array[Byte]): Int = {
    val h = Fnv.splitmix64(Fnv.fnv1a(key, 0))
    (h ^ (h >>> 32)).toInt
  }

  /** Slot of `key`, or the empty slot where it would insert. */
  private def slotOf(key: Array[Byte]): Int = {
    var i = hashOf(key) & mask
    while (tkeys(i) != null && !java.util.Arrays.equals(tkeys(i), key))
      i = (i + 1) & mask
    i
  }

  def add(key: String, weight: Long = 1L): Unit = add(key.getBytes(UTF_8), weight)

  def add(key: Array[Byte], weight: Long): Unit = {
    require(weight >= 0, "negative weights not supported")
    if (weight == 0) return
    val i = slotOf(key)
    if (tkeys(i) != null) tcounts(i) += weight
    else {
      // defensive copy ON INSERT ONLY (not per row): the caller's array
      // may be a shared/reused buffer (UTF8String.getBytes can return its
      // backing array), and the table OWNS its keys
      tkeys(i) = key.clone()
      tcounts(i) = weight
      _size += 1
      if (_size > k) compress()
    }
    _totalCount += weight
  }

  def add(key: Array[Byte]): Unit = add(key, 1L)

  /** Subtract the (k+1)-th largest count from every counter and drop the
    * non-positive, restoring `size <= k`. Each unit subtracted here is
    * matched by >= k other units subtracted in the same step, which is
    * what keeps `delta <= n / (k + 1)`. Rare (at most once per k distinct
    * arrivals), so the rebuild below is off the hot path.
    */
  private def compress(): Unit = {
    val m = _size
    val vals = new Array[Long](m)
    var i = 0
    var j = 0
    while (i < tkeys.length) {
      if (tkeys(i) != null) { vals(j) = tcounts(i); j += 1 }
      i += 1
    }
    java.util.Arrays.sort(vals)
    val d = vals(m - (k + 1)) // (k+1)-th largest
    // rebuild (open addressing cannot tombstone-free delete in place)
    val ok = tkeys
    val oc = tcounts
    tkeys = new Array[Array[Byte]](ok.length)
    tcounts = new Array[Long](ok.length)
    _size = 0
    i = 0
    while (i < ok.length) {
      if (ok(i) != null && oc(i) > d) {
        val s = slotOf(ok(i))
        tkeys(s) = ok(i)
        tcounts(s) = oc(i) - d
        _size += 1
      }
      i += 1
    }
    _delta += d
  }

  /** Lower-bound frequency estimate: `true - errorBound <= est <= true`. */
  def estimate(key: Array[Byte]): Long = {
    val i = slotOf(key)
    if (tkeys(i) == null) 0L else tcounts(i)
  }

  def estimate(key: String): Long = estimate(key.getBytes(UTF_8))

  /** Top-`j` retained keys, ordered by (count desc, key asc). */
  def topK(j: Int): Array[String] = {
    val es = entries
    java.util.Arrays.sort(es, new java.util.Comparator[(String, Long)] {
      override def compare(a: (String, Long), b: (String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    es.take(math.min(j, es.length)).map(_._1)
  }

  /** All retained (key, lower-bound count) pairs, key-sorted. */
  def entries: Array[(String, Long)] = {
    val out = new Array[(String, Long)](_size)
    var i = 0
    var j = 0
    while (i < tkeys.length) {
      if (tkeys(i) != null) { out(j) = (new String(tkeys(i), UTF_8), tcounts(i)); j += 1 }
      i += 1
    }
    java.util.Arrays.sort(out, new java.util.Comparator[(String, Long)] {
      override def compare(a: (String, Long), b: (String, Long)): Int = a._1.compareTo(b._1)
    })
    out
  }

  def mergeInPlace(other: MgSketch): MgSketch = {
    require(k == other.k, s"incompatible Misra-Gries capacities: $k vs ${other.k}")
    // upsert the other's counters WITHOUT per-insert compression: the
    // table is sized for the transient 2k occupancy, and PODS 2012's
    // merge is one combined compress step at the end
    var i = 0
    while (i < other.tkeys.length) {
      if (other.tkeys(i) != null) {
        val s = slotOf(other.tkeys(i))
        if (tkeys(s) != null) tcounts(s) += other.tcounts(i)
        else {
          tkeys(s) = other.tkeys(i)
          tcounts(s) = other.tcounts(i)
          _size += 1
        }
      }
      i += 1
    }
    _totalCount += other._totalCount
    _delta += other._delta
    if (_size > k) compress()
    this
  }

  def serialize(): Array[Byte] = {
    val ks = new Array[Array[Byte]](_size)
    var i = 0
    var j = 0
    while (i < tkeys.length) {
      if (tkeys(i) != null) { ks(j) = tkeys(i); j += 1 }
      i += 1
    }
    java.util.Arrays.sort(ks, MgSketch.byteOrder)
    val size = 4 + 4 + 8 + 8 + 4 + ks.map(_.length + 12).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(MgSketch.Magic)
    bb.putInt(k)
    bb.putLong(_totalCount)
    bb.putLong(_delta)
    bb.putInt(ks.length)
    i = 0
    while (i < ks.length) {
      bb.putInt(ks(i).length)
      bb.put(ks(i))
      bb.putLong(tcounts(slotOf(ks(i))))
      i += 1
    }
    bb.array()
  }
}

object MgSketch {
  /** 'M''G' + format version 1. */
  private[core] val Magic: Int = 0x4d470001

  /** Unsigned byte-lexicographic key order (blob determinism). */
  private[core] val byteOrder: java.util.Comparator[Array[Byte]] =
    new java.util.Comparator[Array[Byte]] with Serializable {
      override def compare(a: Array[Byte], b: Array[Byte]): Int = {
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n) {
          val c = (a(i) & 0xff) - (b(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        a.length - b.length
      }
    }

  /** Table capacity: pow2 ≥ 4·(k+1), so load stays ≤ ~0.5 even at the
    * transient 2k occupancy inside a merge.
    */
  private def capacityFor(k: Int): Int = {
    var c = 8
    while (c < 4 * (k + 1)) c <<= 1
    c
  }

  def empty(k: Int): MgSketch = {
    require(k >= 1, "k must be >= 1")
    val cap = capacityFor(k)
    new MgSketch(k, new Array[Array[Byte]](cap), new Array[Long](cap), cap - 1, 0, 0L, 0L)
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
    // a compressed summary never carries more than k entries; without
    // this bound a corrupt blob with n > capacity fills every table slot
    // and the next slotOf() probe loops forever instead of failing fast
    require(n >= 0 && n <= k, s"corrupt Misra-Gries blob: $n entries exceeds k=$k")
    val s = empty(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val kb = new Array[Byte](len)
      bb.get(kb)
      val c = bb.getLong()
      // direct table insert — counts are already final (no compress or
      // totalCount bump); the companion reaches the private table
      val slot = s.slotOf(kb)
      s.tkeys(slot) = kb
      s.tcounts(slot) = c
      s._size += 1
      i += 1
    }
    s._totalCount = total
    s._delta = delta
    s
  }
}
