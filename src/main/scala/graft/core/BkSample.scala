package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/** Bottom-k-by-hash distinct sample: a mergeable uniform sample over the
  * DISTINCT keys of a stream that retains the key VALUES (the one thing
  * [[ThetaSketch]]'s KMV store deliberately throws away). Published
  * basis: the KMV/bottom-k synopsis of Beyer et al., "On synopses for
  * distinct-value estimation under multiset operations" (SIGMOD 2007) —
  * same sample semantics, value-carrying store.
  *
  * Each key's priority is a fixed deterministic hash (seeded FNV-1a
  * finalized with splitmix64, the library hash contract); the summary
  * keeps the k smallest priorities. Properties:
  *
  *   - **uniform over distinct keys**: a key's presence depends only on
  *     its own hash rank, never on duplication count or arrival order;
  *   - **exact monoid**: merge = set union + keep-k-smallest, so any
  *     partition/merge tree yields the BITWISE-identical summary — the
  *     parallelism-invariance contract the Bloom/theta sketches have;
  *   - **pipeline use**: "give me ~k random example documents per group,
  *     one pass, mergeable across days" — the audit-sample operator.
  *
  * Keys are RAW BYTES (strings enter as UTF-8 — the library identity
  * contract): two distinct binary keys are distinct sample members even
  * when both are invalid UTF-8, and the hot loop never materializes a
  * `String` per row. [[values]] decodes via UTF-8 for display (lossless
  * for string-sourced keys).
  *
  * Ties: priority collisions between distinct keys (~2^-64) break on the
  * key bytes (unsigned lexicographic), keeping determinism unconditional.
  *
  * Serialization (LE, magic-versioned): magic, k, totalAdds, numEntries,
  * then entries in (priority, key) order: priority u64, keyLen, key
  * bytes. `totalAdds` (rows folded, duplicates included) is additive
  * across merges, so blob identity still only depends on the input
  * multiset, never on partitioning.
  */
final class BkSample private (
    val k: Int,
    // (unsigned priority, key bytes) ordered set, size <= k
    private val entries0: java.util.TreeSet[(Long, Array[Byte])],
    private var _adds: Long
) extends Serializable {

  def size: Int = entries0.size

  /** Rows folded into this sample (duplicates included) — additive across
    * merges, so it equals the serial count at any partitioning.
    */
  def totalAdds: Long = _adds

  def add(key: String): Unit = add(key.getBytes(UTF_8))

  def add(key: Array[Byte]): Unit = {
    _adds += 1
    val p = BkSample.priority(key)
    // defensive copy ON ADMISSION ONLY (rare after warmup): the caller's
    // array may be a shared/reused buffer, and the sample OWNS its keys
    if (entries0.size < k) { entries0.add((p, key.clone())); () }
    else {
      val e = (p, key)
      val last = entries0.last()
      if (BkSample.ord.compare(e, last) < 0 && !entries0.contains(e)) {
        entries0.add((p, key.clone()))
        if (entries0.size > k) entries0.remove(entries0.last())
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

  def mergeInPlace(other: BkSample): BkSample = {
    require(k == other.k, s"incompatible bottom-k capacities: $k vs ${other.k}")
    _adds += other._adds
    val it = other.entries0.iterator()
    while (it.hasNext) {
      entries0.add(it.next())
      if (entries0.size > k) entries0.remove(entries0.last())
    }
    // a smaller incoming entry can displace while duplicates collapse via
    // set semantics; trim any residual overflow
    while (entries0.size > k) entries0.remove(entries0.last())
    this
  }

  def serialize(): Array[Byte] = {
    val vs = new Array[(Long, Array[Byte])](entries0.size)
    entries0.toArray(vs.asInstanceOf[Array[Object]])
    val size = 4 + 4 + 8 + 4 + vs.map(_._2.length + 12).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(BkSample.Magic)
    bb.putInt(k)
    bb.putLong(_adds)
    bb.putInt(vs.length)
    var i = 0
    while (i < vs.length) {
      bb.putLong(vs(i)._1)
      bb.putInt(vs(i)._2.length)
      bb.put(vs(i)._2)
      i += 1
    }
    bb.array()
  }
}

object BkSample {
  /** 'B''K' + format version 1. */
  private[core] val Magic: Int = 0x424b0001

  /** Unsigned-first ordering on (priority, key bytes). */
  private[core] val ord: java.util.Comparator[(Long, Array[Byte])] =
    new java.util.Comparator[(Long, Array[Byte])] with Serializable {
      override def compare(a: (Long, Array[Byte]), b: (Long, Array[Byte])): Int = {
        val c = java.lang.Long.compareUnsigned(a._1, b._1)
        if (c != 0) c else MgSketch.byteOrder.compare(a._2, b._2)
      }
    }

  private[core] def priority(key: Array[Byte]): Long =
    Fnv.splitmix64(Fnv.fnv1a(key, 0))

  /** Test hook: the sampling priority of a key (unsigned order decides). */
  private[graft] def testPriority(key: String): Long = priority(key.getBytes(UTF_8))

  def empty(k: Int): BkSample = {
    require(k >= 1, "k must be >= 1")
    new BkSample(k, new java.util.TreeSet[(Long, Array[Byte])](ord), 0L)
  }

  def deserialize(bytes: Array[Byte]): BkSample = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt()
    require(magic == Magic, f"not a bottom-k sample blob (magic 0x$magic%08x)")
    val k = bb.getInt()
    val adds = bb.getLong()
    val n = bb.getInt()
    val s = new java.util.TreeSet[(Long, Array[Byte])](ord)
    var i = 0
    while (i < n) {
      val p = bb.getLong()
      val len = bb.getInt()
      val kb = new Array[Byte](len)
      bb.get(kb)
      s.add((p, kb))
      i += 1
    }
    new BkSample(k, s, adds)
  }
}
