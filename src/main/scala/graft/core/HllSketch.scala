package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** HyperLogLog distinct-count sketch, from scratch per Flajolet, Fusy,
  * Gandouet, Meunier, "HyperLogLog: the analysis of a near-optimal
  * cardinality estimation algorithm" (AofA 2007); 64-bit register update
  * per Heule, Nunkesser, Hall, "HyperLogLog in Practice" (EDBT 2013);
  * estimation via Ertl's improved raw estimator (2017) — see [[estimate]]
  * — which subsumes linear counting and needs no large-range correction
  * at 64 bits.
  *
  * Registers: `m = 2^precision` bytes. Register update takes the max — the
  * merge (element-wise register max) is associative, commutative AND
  * idempotent, so distributed aggregation is exactly equivalent to a serial
  * build at any merge tree (same invariance property the reference proves
  * for Bloom union, `bloom_multi_thread.c:64-78`).
  *
  * Published error bound: relative standard error `1.04 / sqrt(m)`.
  *
  * Hashing: FNV-1a (reference hash family, `bloom.c:499-508`) finalized
  * with a splitmix64 avalanche — FNV alone has poor high-bit diffusion on
  * short keys, which HLL register indexing is sensitive to.
  */
final class HllSketch private (
    val precision: Int,
    val registers: Array[Byte]
) extends Serializable {

  def m: Int = registers.length

  def add(key: String): Unit =
    addHash(Fnv.splitmix64(Fnv.fnv1a(key, 0)))

  def add(key: Array[Byte]): Unit =
    addHash(Fnv.splitmix64(Fnv.fnv1a(key, 0)))

  def addLong(v: Long): Unit = addHash(Fnv.splitmix64(v))

  def addHash(h: Long): Unit = {
    val idx = (h >>> (64 - precision)).toInt
    val w = h << precision
    val rho = (if (w == 0L) 64 - precision else java.lang.Long.numberOfLeadingZeros(w)) + 1
    val r = math.min(rho, 64 - precision + 1).toByte
    if (registers(idx) < r) registers(idx) = r
  }

  /** Cardinality estimate via Ertl's improved raw estimator ("New
    * cardinality estimation algorithms for HyperLogLog sketches", 2017,
    * arXiv:1702.01284, Algorithm 6): the σ-corrected zero-register term
    * subsumes linear counting and the τ term corrects register
    * saturation, giving an estimator free of the classic bias hump at
    * the raw/linear-counting crossover (n ≈ 2.5m, where the 2013
    * Flajolet+linear-counting switch shows ~+2.5% mean bias — measured
    * 3.65% worst-case here, over the 3% q05 gate; Ertl measured
    * ≤ 0.5% mean, ≤ 2.6% worst-case at 8 trials in the same sweep).
    * Closed-form — no empirically fitted bias tables — and valid over
    * the whole range, so the estimate stays a pure function of the
    * registers (merge-then-estimate == estimate invariance unaffected).
    */
  def estimate: Double = {
    val q = 64 - precision
    val counts = new Array[Int](q + 2)
    var i = 0
    while (i < registers.length) { counts(registers(i)) += 1; i += 1 }
    val mm = m.toDouble
    // Horner: z = Σ_{k=1..q} C_k·2^{-k} + m·τ(1 - C_{q+1}/m)·2^{-q}
    var z = mm * HllSketch.tau(1.0 - counts(q + 1) / mm)
    var k = q
    while (k >= 1) { z = 0.5 * (z + counts(k)); k -= 1 }
    z += mm * HllSketch.sigma(counts(0) / mm)
    HllSketch.AlphaInf * mm * mm / z
  }

  def estimateLong: Long = math.rint(estimate).toLong

  /** Relative standard error bound `1.04/sqrt(m)`. */
  def standardError: Double = 1.04 / math.sqrt(m.toDouble)

  def mergeInPlace(other: HllSketch): HllSketch = {
    require(precision == other.precision, s"incompatible HLL precisions: $precision vs ${other.precision}")
    var i = 0
    while (i < registers.length) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
    this
  }

  def copy(): HllSketch = new HllSketch(precision, registers.clone())

  /** Wire format, chosen per blob by content (deterministic, so the
    * parallelism-invariance property — same registers ⇒ same bytes — is
    * preserved):
    *
    *  - '''dense''' `[p:1B][m register bytes]` — the v1 format, emitted
    *    whenever the sketch is reasonably full;
    *  - '''sparse''' `[p|0x80:1B][count:int32][count × int32 (idx<<6|val)]`
    *    — emitted when `4·nz + 4 < m` (nz = non-zero registers). A
    *    per-group sketch over millions of small groups is almost all
    *    zeros (16 KB of them at p=14); the partial-aggregate shuffle and
    *    the stored per-group blobs shrink by up to ~1000× for tiny
    *    groups. idx ≤ 2^18 and val ≤ 61 pack into one int32.
    *
    * The 0x80 bit on the leading precision byte is the format version
    * marker (dense precisions are 4–18, so the bit is never ambiguous) —
    * same discipline as the CMS format magic. In-memory stays dense
    * always; sparse is purely a wire encoding, so merge/estimate logic is
    * untouched and sparse/dense blobs interoperate transparently.
    */
  def serialize(): Array[Byte] = {
    var nz = 0
    var i = 0
    while (i < registers.length) { if (registers(i) != 0) nz += 1; i += 1 }
    if (4 * nz + 4 < m) {
      val buf = ByteBuffer.allocate(5 + 4 * nz).order(ByteOrder.LITTLE_ENDIAN)
      buf.put((precision | 0x80).toByte)
      buf.putInt(nz)
      i = 0
      while (i < registers.length) {
        if (registers(i) != 0) buf.putInt((i << 6) | registers(i))
        i += 1
      }
      buf.array()
    } else {
      val buf = ByteBuffer.allocate(1 + registers.length).order(ByteOrder.LITTLE_ENDIAN)
      buf.put(precision.toByte)
      buf.put(registers)
      buf.array()
    }
  }

  override def toString: String = s"HllSketch(p=$precision,est=${estimateLong})"
}

object HllSketch {
  /** `1 / (2 ln 2)` — the asymptotic alpha of Ertl's estimator. */
  final val AlphaInf: Double = 1.0 / (2.0 * math.log(2.0))

  /** `σ(x) = x + Σ_{k≥1} x^(2^k)·2^(k-1)` (Ertl 2017, eq. 13) — the
    * expected zero-register mass; diverges at x=1 (empty sketch → 0).
    */
  private[core] def sigma(x0: Double): Double = {
    if (x0 == 1.0) return Double.PositiveInfinity
    var x = x0
    var y = 1.0
    var z = x
    var zPrev = 0.0
    while ({ zPrev = z; x = x * x; z += x * y; y += y; z != zPrev }) ()
    z
  }

  /** `τ(x) = (1/3)(1 - x - Σ_{k≥1} (1 - x^(2^-k))²·2^-k)` (Ertl 2017,
    * eq. 14) — the saturated-register correction.
    */
  private[core] def tau(x0: Double): Double = {
    if (x0 == 0.0 || x0 == 1.0) return 0.0
    var x = x0
    var y = 1.0
    var z = 1.0 - x
    var zPrev = 0.0
    while ({ zPrev = z; x = math.sqrt(x); y *= 0.5; val d = 1.0 - x; z -= d * d * y; z != zPrev }) ()
    z / 3.0
  }

  def empty(precision: Int): HllSketch = {
    require(precision >= 4 && precision <= 18, s"HLL precision must be in [4,18], got $precision")
    new HllSketch(precision, new Array[Byte](1 << precision))
  }

  def deserialize(bytes: Array[Byte]): HllSketch = {
    val b0 = bytes(0) & 0xff
    if ((b0 & 0x80) != 0) {
      // sparse: [p|0x80][count:int32][count × int32 (idx<<6|val)]
      val precision = b0 & 0x7f
      require(precision >= 4 && precision <= 18, s"corrupt sparse HLL blob: p=$precision")
      val buf = ByteBuffer.wrap(bytes, 1, bytes.length - 1).order(ByteOrder.LITTLE_ENDIAN)
      val n = buf.getInt
      require(bytes.length == 5 + 4 * n, s"corrupt sparse HLL blob: ${bytes.length} for n=$n")
      val registers = new Array[Byte](1 << precision)
      var i = 0
      while (i < n) {
        val e = buf.getInt
        registers(e >>> 6) = (e & 0x3f).toByte
        i += 1
      }
      new HllSketch(precision, registers)
    } else {
      val precision = b0
      require(bytes.length == 1 + (1 << precision), s"corrupt HLL blob: ${bytes.length}")
      new HllSketch(precision, java.util.Arrays.copyOfRange(bytes, 1, bytes.length))
    }
  }
}
