package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** HyperLogLog distinct-count sketch, from scratch per Flajolet, Fusy,
  * Gandouet, Meunier, "HyperLogLog: the analysis of a near-optimal
  * cardinality estimation algorithm" (AofA 2007), with the 64-bit-hash
  * small-range correction of Heule, Nunkesser, Hall, "HyperLogLog in
  * Practice" (EDBT 2013) — linear counting below the crossover, no
  * large-range correction needed at 64 bits.
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

  /** Bias-corrected raw estimate + linear-counting small-range correction. */
  def estimate: Double = {
    val mm = m.toDouble
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / mm)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < registers.length) {
      sum += java.lang.Double.longBitsToDouble((1023L - registers(i)) << 52) // 2^-reg
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * mm * mm / sum
    if (raw <= 2.5 * mm && zeros > 0) mm * math.log(mm / zeros) // linear counting
    else raw
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

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + registers.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(precision.toByte)
    buf.put(registers)
    buf.array()
  }

  override def toString: String = s"HllSketch(p=$precision,est=${estimateLong})"
}

object HllSketch {
  def empty(precision: Int): HllSketch = {
    require(precision >= 4 && precision <= 18, s"HLL precision must be in [4,18], got $precision")
    new HllSketch(precision, new Array[Byte](1 << precision))
  }

  def deserialize(bytes: Array[Byte]): HllSketch = {
    val precision = bytes(0).toInt
    require(bytes.length == 1 + (1 << precision), s"corrupt HLL blob: ${bytes.length}")
    new HllSketch(precision, java.util.Arrays.copyOfRange(bytes, 1, bytes.length))
  }
}
