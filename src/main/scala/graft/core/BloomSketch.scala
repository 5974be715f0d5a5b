package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pluggable hash strategy — the reference's `hash_function` pointer
  * (`bloom.h:42,54`, swapped via `bloom_filter_set_hash_function`,
  * `bloom.c:89-91`). Hash identity participates in merge compatibility
  * exactly like the C pointer-equality check (`bloom.c:414-423`).
  *
  * Serialization: the C file format does not carry the hasher (import
  * installs the default, `bloom.c:442-458`) — and default-hasher blobs
  * here stay byte-identical to it. A NON-default hasher would silently
  * resume with the wrong hash family after any round-trip (every Spark
  * shuffle of partial buffers serializes), so custom-hasher blobs append a
  * hasher-id tag *outside* the reference 20-byte footer; [[BloomSketch
  * .deserialize]] detects the tag and re-installs the registered hasher
  * (loud failure if the id is unknown in this JVM). The hex format stays
  * pure C-interchange: [[BloomSketch.fromHexString]] installs the default,
  * as the reference does.
  */
trait BloomHasher extends Serializable {
  def id: String
  def hashes(key: Array[Byte], k: Int): Array[Long]
  final def hashes(key: String, k: Int): Array[Long] =
    hashes(key.getBytes(StandardCharsets.UTF_8), k)
}

object BloomHasher {
  private val registry = new scala.collection.concurrent.TrieMap[String, BloomHasher]
  register(FnvBloomHasher)
  register(Poly31BloomHasher)

  /** Register a custom family so tagged blobs can round-trip in this JVM
    * (call on every executor — e.g. from a singleton init — before
    * deserializing tagged blobs).
    */
  def register(h: BloomHasher): Unit = registry.put(h.id, h)

  def lookup(id: String): BloomHasher = registry.getOrElse(id,
    throw new IllegalArgumentException(
      s"unknown bloom hasher id '$id' — register it via BloomHasher.register before deserializing"))
}

/** Default: the reference's seeded FNV-1a family (`bloom.c:490-508`). */
object FnvBloomHasher extends BloomHasher {
  val id = "fnv1a-seeded"
  def hashes(key: Array[Byte], k: Int): Array[Long] = Fnv.hashes(key, k)
}

/** Alternate built-in family (demonstrates `set_hash_function` end-to-end
  * through the UDAF/SQL surface): seeded 31-polynomial over the key bytes,
  * splitmix64-finalized per seed. Deliberately NOT the FNV family — two
  * filters built with different families set different bits and refuse to
  * merge (hash id participates in [[BloomSketch.compatibleWith]]).
  */
object Poly31BloomHasher extends BloomHasher {
  val id = "poly31-mix64"
  def hashes(key: Array[Byte], k: Int): Array[Long] = {
    // one pass over the bytes; per-seed finalization like the reference's
    // seeded-FNV shape (hash_i = finalize(base ^ seed_i))
    var h = 1125899906842597L
    var j = 0
    while (j < key.length) { h = 31L * h + (key(j) & 0xffL); j += 1 }
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = Fnv.splitmix64(h ^ (i.toLong * 0x9e3779b97f4a7c15L)); i += 1 }
    out
  }
}

/** Bloom filter sketch with reference-compatible geometry, bit layout and
  * serialized formats (semantics from `/root/reference/src/bloom.c`, studied
  * not translated — this implementation is a JVM bit-array with word-level
  * set operations for Spark aggregation buffers).
  *
  * Geometry (`bloom.c:397-408`): `p` is float32 (part of the contract — the
  * sizing math runs on the float-rounded value), and
  * {{{
  *   m = ceil(-n * ln(p) / LOG_TWO_SQUARED)
  *   k = round(LOG_TWO * m / n)
  *   bloomLength = ceil(m / 8) bytes
  * }}}
  * with the reference's exact literal constants.
  *
  * Bit layout (`bloom.c:24-25,171-181`): bit index `h mod m` (unsigned),
  * byte `idx/8`, LSB-first within the byte — part of the on-wire format.
  *
  * Serialized binary form (`bloom.c:426-439`): `bloomLength` raw bytes,
  * then little-endian footer `estimatedElements:u64 | elementsAdded:u64 |
  * p:f32` (20 bytes). Hex form (`bloom.c:254-270`): lowercase `%02x` bytes
  * then *textual big-endian* `%016x`,`%016x`,`%08x` metadata.
  *
  * Two merge flavours:
  *  - [[mergeInPlace]]: bit-OR + additive `elementsAdded` — the Spark
  *    aggregation monoid. Reproduces a serial build bit-for-bit at any
  *    parallelism/merge-tree (union is associative, commutative; counters
  *    add exactly), which is the ported `bloom_multi_thread.c:64-78`
  *    invariance property.
  *  - [[union]]/[[intersect]]: reference set-op semantics — result's
  *    `elementsAdded` is set to the cardinality estimate
  *    (`bloom.c:327-368`).
  */
final class BloomSketch private (
    val estimatedElements: Long,
    val falsePositiveRate: Float,
    val numberHashes: Int,
    val numberBits: Long,
    val bits: Array[Byte],
    private var _elementsAdded: Long,
    val hasher: BloomHasher
) extends Serializable {

  def elementsAdded: Long = _elementsAdded
  def bloomLength: Int = bits.length

  def hashes(key: String): Array[Long] = hasher.hashes(key, numberHashes)
  def hashes(key: Array[Byte]): Array[Long] = hasher.hashes(key, numberHashes)

  def add(key: String): Unit = add(key.getBytes(StandardCharsets.UTF_8))

  /** Hot path: hash-and-set without materializing the hash vector (the
    * k seeded FNV passes are computed inline; identical bits to
    * [[addHashes]] — only the allocation is gone). Non-default hashers
    * fall back to the vector API.
    */
  def add(key: Array[Byte]): Unit = {
    if (hasher eq FnvBloomHasher) {
      var i = 0
      while (i < numberHashes) {
        val bitIdx = java.lang.Long.remainderUnsigned(Fnv.fnv1a(key, i), numberBits)
        val byteIdx = (bitIdx >>> 3).toInt
        bits(byteIdx) = (bits(byteIdx) | (1 << (bitIdx & 7L).toInt)).toByte
        i += 1
      }
      _elementsAdded += 1
    } else addHashes(hashes(key))
  }

  /** Set the k bits for a precomputed hash vector (`bloom.c:165-183`). */
  def addHashes(hs: Array[Long]): Unit = {
    require(hs.length >= numberHashes, "not enough hashes passed in")
    var i = 0
    while (i < numberHashes) {
      val bitIdx = java.lang.Long.remainderUnsigned(hs(i), numberBits)
      val byteIdx = (bitIdx >>> 3).toInt
      bits(byteIdx) = (bits(byteIdx) | (1 << (bitIdx & 7L).toInt)).toByte
      i += 1
    }
    _elementsAdded += 1
  }

  def contains(key: String): Boolean = contains(key.getBytes(StandardCharsets.UTF_8))

  /** Hot path: incremental hash-then-probe with early exit — on a miss at
    * probe i the remaining k-i-1 FNV passes are never computed (the
    * reference computes all k hashes before probing, `bloom.c:153-158`;
    * same bits probed, same result, strictly less work — most rows of a
    * semi-join pre-filter miss early).
    */
  def contains(key: Array[Byte]): Boolean = {
    if (hasher eq FnvBloomHasher) {
      var i = 0
      while (i < numberHashes) {
        val bitIdx = java.lang.Long.remainderUnsigned(Fnv.fnv1a(key, i), numberBits)
        if ((bits((bitIdx >>> 3).toInt) & (1 << (bitIdx & 7L).toInt)) == 0) return false
        i += 1
      }
      true
    } else containsHashes(hashes(key))
  }

  /** AND over k bit probes with early exit (`bloom.c:186-202`). */
  def containsHashes(hs: Array[Long]): Boolean = {
    require(hs.length >= numberHashes, "not enough hashes passed in")
    var i = 0
    while (i < numberHashes) {
      val bitIdx = java.lang.Long.remainderUnsigned(hs(i), numberBits)
      if ((bits((bitIdx >>> 3).toInt) & (1 << (bitIdx & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }

  def clear(): Unit = {
    java.util.Arrays.fill(bits, 0.toByte)
    _elementsAdded = 0
  }

  // Unaligned little-endian 64-bit window over a byte array (HotSpot
  // compiles HeapByteBuffer.get/putLong to single unaligned loads/stores),
  // so the hot set-op loops below run word-wise, not byte-wise — the bit
  // LAYOUT stays the reference's LSB-first byte array; only the stride of
  // the loops changes.
  @inline private def leView(a: Array[Byte]): java.nio.ByteBuffer =
    java.nio.ByteBuffer.wrap(a).order(java.nio.ByteOrder.LITTLE_ENDIAN)

  def countSetBits: Long = {
    val va = leView(bits)
    var res = 0L
    var i = 0
    val n8 = bits.length & ~7
    while (i < n8) { res += java.lang.Long.bitCount(va.getLong(i)); i += 8 }
    while (i < bits.length) { res += Integer.bitCount(bits(i) & 0xff); i += 1 }
    res
  }

  /** `⌊-(m/k)·ln(1 - X/m)⌋` (`bloom.c:317-325`), cast-truncated like C. */
  def estimateElements: Long = BloomSketch.estimateElementsByValues(numberBits, countSetBits, numberHashes)

  /** `(1 - e^{-(k·a)/m})^k` (`bloom.c:204-209`). Deliberate deviation from
    * the reference: computed in wide arithmetic — the C version multiplies
    * `k·a` in a 32-bit int and overflows past ~2^31 (documented quirk).
    */
  def currentFalsePositiveRate: Float = {
    val d = -(numberHashes.toDouble * _elementsAdded.toDouble) / numberBits.toDouble
    math.pow(1d - math.exp(d), numberHashes.toDouble).toFloat
  }

  /** After a set op the reference replaces the counter with the estimate
    * (`bloom.c:365-368`).
    */
  def setElementsToEstimated(): Unit = _elementsAdded = estimateElements

  def compatibleWith(other: BloomSketch): Boolean =
    numberHashes == other.numberHashes && numberBits == other.numberBits &&
      hasher.id == other.hasher.id

  private def requireCompatible(other: BloomSketch): Unit =
    require(compatibleWith(other), s"incompatible filters: (m=$numberBits,k=$numberHashes,h=${hasher.id}) vs (m=${other.numberBits},k=${other.numberHashes},h=${other.hasher.id})")

  /** Spark aggregation merge: bit-OR, counters add. Exact w.r.t. a serial
    * build — see class doc.
    */
  def mergeInPlace(other: BloomSketch): BloomSketch = {
    requireCompatible(other)
    val va = leView(bits)
    val vb = leView(other.bits)
    var i = 0
    val n8 = bits.length & ~7
    while (i < n8) { va.putLong(i, va.getLong(i) | vb.getLong(i)); i += 8 }
    while (i < bits.length) { bits(i) = (bits(i) | other.bits(i)).toByte; i += 1 }
    _elementsAdded += other._elementsAdded
    this
  }

  /** Reference union semantics (`bloom.c:327-338`). */
  def union(other: BloomSketch): BloomSketch = {
    requireCompatible(other)
    val res = copy()
    val vr = leView(res.bits)
    val vb = leView(other.bits)
    var i = 0
    val n8 = bits.length & ~7
    while (i < n8) { vr.putLong(i, vr.getLong(i) | vb.getLong(i)); i += 8 }
    while (i < bits.length) { res.bits(i) = (bits(i) | other.bits(i)).toByte; i += 1 }
    res.setElementsToEstimated()
    res
  }

  /** Reference intersect semantics (`bloom.c:352-363`). */
  def intersect(other: BloomSketch): BloomSketch = {
    requireCompatible(other)
    val res = copy()
    val vr = leView(res.bits)
    val vb = leView(other.bits)
    var i = 0
    val n8 = bits.length & ~7
    while (i < n8) { vr.putLong(i, vr.getLong(i) & vb.getLong(i)); i += 8 }
    while (i < bits.length) { res.bits(i) = (bits(i) & other.bits(i)).toByte; i += 1 }
    res.setElementsToEstimated()
    res
  }

  def countUnionBitsSet(other: BloomSketch): Long = {
    requireCompatible(other)
    val va = leView(bits)
    val vb = leView(other.bits)
    var res = 0L
    var i = 0
    val n8 = bits.length & ~7
    while (i < n8) { res += java.lang.Long.bitCount(va.getLong(i) | vb.getLong(i)); i += 8 }
    while (i < bits.length) { res += Integer.bitCount((bits(i) | other.bits(i)) & 0xff); i += 1 }
    res
  }

  def countIntersectionBitsSet(other: BloomSketch): Long = {
    requireCompatible(other)
    val va = leView(bits)
    val vb = leView(other.bits)
    var res = 0L
    var i = 0
    val n8 = bits.length & ~7
    while (i < n8) { res += java.lang.Long.bitCount(va.getLong(i) & vb.getLong(i)); i += 8 }
    while (i < bits.length) { res += Integer.bitCount((bits(i) & other.bits(i)) & 0xff); i += 1 }
    res
  }

  /** `|A∩B bits| / |A∪B bits|`; 1.0 when the union is empty
    * (`bloom.c:382-392`).
    */
  def jaccardIndex(other: BloomSketch): Float = {
    val u = countUnionBitsSet(other).toFloat
    if (u == 0f) 1.0f else countIntersectionBitsSet(other).toFloat / u
  }

  /** Exact `serialize().length`: the C-format bytes, plus the hasher tag
    * for non-default families (see [[serialize]]).
    */
  def serializedSize: Long = {
    val tag = if (hasher eq FnvBloomHasher) 0L
      else hasher.id.getBytes(StandardCharsets.UTF_8).length.toLong + 8L
    bits.length.toLong + 20L + tag
  }

  /** Reference binary layout (`bloom.c:426-439`): array then LE footer.
    * Default-hasher blobs are byte-identical to the C format; non-default
    * hashers append `idBytes | idLen:int32 | "GFHH"` after the footer so
    * the hash family survives round-trips (see [[BloomHasher]] doc). The
    * tag is unambiguous: a valid C blob's last 4 bytes are the float32 `p`
    * in (0,1), whose bit pattern can never equal the magic.
    */
  def serialize(): Array[Byte] = {
    val tagged = hasher ne FnvBloomHasher
    val idb = if (tagged) hasher.id.getBytes(StandardCharsets.UTF_8) else null
    val extra = if (tagged) idb.length + 8 else 0
    val buf = ByteBuffer.allocate(bits.length + 20 + extra).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(bits)
    buf.putLong(estimatedElements)
    buf.putLong(_elementsAdded)
    buf.putFloat(falsePositiveRate)
    if (tagged) {
      buf.put(idb)
      buf.putInt(idb.length)
      buf.put(BloomSketch.HasherTagMagic)
    }
    buf.array()
  }

  /** Reference hex layout (`bloom.c:254-270`): lowercase bytes, then
    * textual `%016x` est, `%016x` added, `%08x` IEEE-754 bits of p.
    */
  def toHexString: String = {
    val sb = new java.lang.StringBuilder(bits.length * 2 + 40)
    val hexDigits = "0123456789abcdef"
    var i = 0
    while (i < bits.length) {
      val b = bits(i) & 0xff
      sb.append(hexDigits(b >>> 4)).append(hexDigits(b & 0xf))
      i += 1
    }
    sb.append(f"$estimatedElements%016x")
    sb.append(f"${_elementsAdded}%016x")
    sb.append(f"${java.lang.Float.floatToIntBits(falsePositiveRate)}%08x")
    sb.toString
  }

  def copy(): BloomSketch =
    new BloomSketch(estimatedElements, falsePositiveRate, numberHashes, numberBits, bits.clone(), _elementsAdded, hasher)

  /** Exact 11-line report format of `bloom_filter_stats`
    * (`bloom.c:122-143`), golden-tested by the reference
    * (`testsuite.c:823-834`).
    */
  def statsString: String = {
    f"""BloomFilter
    bits: $numberBits%d
    estimated elements: $estimatedElements%d
    number hashes: $numberHashes%d
    max false positive rate: ${falsePositiveRate.toDouble}%f
    bloom length (8 bits): ${bits.length}%d
    elements added: ${_elementsAdded}%d
    estimated elements added: $estimateElements%d
    current false positive rate: ${currentFalsePositiveRate.toDouble}%f
    export size (bytes): $serializedSize%d
    number bits set: $countSetBits%d
    is on disk: no
"""
  }

  override def toString: String =
    s"BloomSketch(n=$estimatedElements,p=$falsePositiveRate,k=$numberHashes,m=$numberBits,added=${_elementsAdded})"
}

object BloomSketch {
  /** Library version. Reference quirk, not silently "fixed": the C header
    * comment says 1.9.0 (`bloom.h:8`) while the `bloom_filter_get_version`
    * macro returns "1.8.2" (`bloom.h:32,40`) — we report our own version
    * and record the reference macro value alongside.
    */
  final val Version: String = "0.1.0"
  final val ReferenceVersionMacro: String = "1.8.2"

  /** Exact reference constants (`bloom.c:31-33`) — required for geometry
    * fidelity (float32 `p` + these literals reproduce the golden k/m).
    */
  final val LogTwoSquared: Double = 0.480453013918201388143813800
  final val LogTwo: Double = 0.693147180559945286226764000

  /** `(m, k, bloomLength)` per `__calculate_optimal_hashes`
    * (`bloom.c:397-408`).
    */
  def geometry(n: Long, p: Float): (Long, Int, Int) = {
    require(n > 0, s"estimated elements must be > 0, got $n")
    require(p > 0f && p < 1f, s"false positive rate must be in (0,1), got $p")
    val m = math.ceil(-n.toDouble * math.log(p.toDouble) / LogTwoSquared).toLong
    val k = math.round(LogTwo * m.toDouble / n.toDouble).toInt
    val len = math.ceil(m / 8.0).toLong
    require(len <= Int.MaxValue - 8, s"bloom bit array too large for a single JVM sketch: $len bytes; shard the filter (see ShardedBloom docs)")
    (m, k, len.toInt)
  }

  def empty(n: Long, p: Float): BloomSketch = empty(n, p, FnvBloomHasher)

  def empty(n: Long, p: Float, hasher: BloomHasher): BloomSketch = {
    val (m, k, len) = geometry(n, p)
    new BloomSketch(n, p, k, m, new Array[Byte](len), 0L, hasher)
  }

  /** `⌊-(m/k)·ln(1 - X/m)⌋` (`bloom.c:321-325`). */
  def estimateElementsByValues(m: Long, setBits: Long, k: Int): Long = {
    val logN = math.log(1d - setBits.toDouble / m.toDouble)
    (-(m.toDouble / k.toDouble) * logN).toLong
  }

  private[core] val HasherTagMagic: Array[Byte] = Array('G', 'F', 'H', 'H')

  /** Inverse of [[BloomSketch.serialize]] (`bloom.c:442-458`): footer from
    * the tail, geometry recomputed from `(n, p)`. Tagged (custom-hasher)
    * blobs re-install the registered hasher by id — never a silent switch
    * to the default family.
    */
  /** Shared tail parse for [[deserialize]] and [[containsSerialized]]:
    * detects the optional hasher tag (see [[BloomSketch.serialize]]) and
    * returns (end-of-C-blob offset, hasher) — ONE place owns the tag/
    * footer layout, so the in-place probe can never diverge from the
    * decoded path.
    */
  private def parseTail(bytes: Array[Byte]): (Int, BloomHasher) = {
    require(bytes.length > 20, s"serialized bloom too short: ${bytes.length}")
    if (bytes.length > 28 &&
        bytes(bytes.length - 4) == HasherTagMagic(0) && bytes(bytes.length - 3) == HasherTagMagic(1) &&
        bytes(bytes.length - 2) == HasherTagMagic(2) && bytes(bytes.length - 1) == HasherTagMagic(3)) {
      val idLen = ByteBuffer.wrap(bytes, bytes.length - 8, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      require(idLen > 0 && bytes.length - 8 - idLen > 20, s"corrupt bloom hasher tag: idLen=$idLen")
      val id = new String(bytes, bytes.length - 8 - idLen, idLen, StandardCharsets.UTF_8)
      (bytes.length - 8 - idLen, BloomHasher.lookup(id))
    } else (bytes.length, FnvBloomHasher)
  }

  def deserialize(bytes: Array[Byte]): BloomSketch = {
    val (end, hasher) = parseTail(bytes)
    deserializeBody(bytes, end, hasher)
  }

  private def deserializeBody(bytes: Array[Byte], end: Int, hasher: BloomHasher): BloomSketch = {
    val buf = ByteBuffer.wrap(bytes, end - 20, 20).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getLong
    val added = buf.getLong
    val p = buf.getFloat
    val (m, k, len) = geometry(n, p)
    require(len == end - 20, s"corrupt bloom blob: expected array of $len bytes, got ${end - 20}")
    val arr = java.util.Arrays.copyOfRange(bytes, 0, len)
    new BloomSketch(n, p, k, m, arr, added, hasher)
  }

  /** Probe a SERIALIZED blob in place — identical verdict to
    * `deserialize(bytes).contains(key)` with no bit-array copy and no
    * allocation (footer parse + k bit probes directly on the blob bytes).
    *
    * Why it exists (optimization guide §2.3/§4): the distributed
    * sharded-Bloom probe ([[graft.pipeline.ShardedBloom.semiJoin]]) joins
    * each probe row to its shard's blob COLUMN, so every row hands the
    * expression a fresh byte-array copy — identity-keyed deserialization
    * caching can never hit, and a full `deserialize` per row copies the
    * entire bit array (KBs-MBs) and churns the heap. The direct probe
    * reads only the 20-byte footer plus k probed bytes per row.
    */
  def containsSerialized(bytes: Array[Byte], key: Array[Byte]): Boolean = {
    val (end, hasher) = parseTail(bytes)
    val buf = ByteBuffer.wrap(bytes, end - 20, 20).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getLong
    buf.getLong // elementsAdded — not needed for a probe
    val p = buf.getFloat
    val (m, k, len) = geometry(n, p)
    require(len == end - 20, s"corrupt bloom blob: expected array of $len bytes, got ${end - 20}")
    if (hasher eq FnvBloomHasher) {
      var i = 0
      while (i < k) {
        val bitIdx = java.lang.Long.remainderUnsigned(Fnv.fnv1a(key, i), m)
        if ((bytes((bitIdx >>> 3).toInt) & (1 << (bitIdx & 7L).toInt)) == 0) return false
        i += 1
      }
      true
    } else {
      val hs = hasher.hashes(key, k)
      var i = 0
      while (i < k) {
        val bitIdx = java.lang.Long.remainderUnsigned(hs(i), m)
        if ((bytes((bitIdx >>> 3).toInt) & (1 << (bitIdx & 7L).toInt)) == 0) return false
        i += 1
      }
      true
    }
  }

  /** Inverse of [[BloomSketch.toHexString]] (`bloom.c:272-303`). Like the
    * reference, only odd length is rejected.
    */
  def fromHexString(hex: String): BloomSketch = {
    require(hex.length % 2 == 0, "unable to parse hex: odd length")
    require(hex.length >= 40, "unable to parse hex: too short")
    val n = java.lang.Long.parseUnsignedLong(hex.substring(hex.length - 40, hex.length - 24), 16)
    val added = java.lang.Long.parseUnsignedLong(hex.substring(hex.length - 24, hex.length - 8), 16)
    val p = java.lang.Float.intBitsToFloat(java.lang.Integer.parseUnsignedInt(hex.substring(hex.length - 8), 16))
    val (m, k, len) = geometry(n, p)
    val arr = new Array[Byte](len)
    var i = 0
    while (i < len && i * 2 + 2 <= hex.length) {
      arr(i) = java.lang.Integer.parseInt(hex.substring(i * 2, i * 2 + 2), 16).toByte
      i += 1
    }
    new BloomSketch(n, p, k, m, arr, added, FnvBloomHasher)
  }
}
