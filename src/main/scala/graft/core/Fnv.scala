package graft.core

/** Seeded FNV-1a 64-bit hashing, semantics per the reference
  * (`/root/reference/src/bloom.c:490-508`): offset basis
  * `14695981039346656037 + 31*seed`, prime `1099511628211`, byte-wise.
  *
  * Contract: hashing operates on the UTF-8 bytes of the string. The C
  * library hashes the raw `char*` bytes; for ASCII inputs (all reference
  * goldens) the two coincide, and UTF-8 is the defined contract here.
  *
  * All arithmetic is on `Long` with two's-complement wraparound, which is
  * bit-identical to C `uint64_t` modular arithmetic.
  */
object Fnv {
  /** 14695981039346656037 as a signed Long (same 64 bits). */
  final val OffsetBasis: Long = -3750763034362895579L
  final val Prime: Long = 1099511628211L

  def fnv1a(key: Array[Byte], seed: Int): Long = {
    var h = OffsetBasis + 31L * seed
    var i = 0
    val n = key.length
    while (i < n) {
      h ^= (key(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  def fnv1a(key: String, seed: Int): Long =
    fnv1a(key.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  /** k independent hashes `h_i = fnv1a(key, i)` (`bloom.c:490-497`). */
  def hashes(key: Array[Byte], k: Int): Array[Long] = {
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = fnv1a(key, i); i += 1 }
    out
  }

  def hashes(key: String, k: Int): Array[Long] =
    hashes(key.getBytes(java.nio.charset.StandardCharsets.UTF_8), k)

  /** splitmix64 — deterministic PRNG step for generators / minhash seeds.
    * Public-domain algorithm (Steele, Lea, Flood 2014).
    */
  def splitmix64(x0: Long): Long = {
    var x = x0 + -7046029254386353131L // 0x9E3779B97F4A7C15
    x = (x ^ (x >>> 30)) * -4658895280553007687L // 0xBF58476D1CE4E5B9
    x = (x ^ (x >>> 27)) * -7723592293110705685L // 0x94D049BB133111EB
    x ^ (x >>> 31)
  }
}
