package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Count-min sketch, from scratch per Cormode & Muthukrishnan, "An improved
  * data stream summary: the count-min sketch and its applications"
  * (J. Algorithms 2005).
  *
  * Geometry: `width = ceil(e / eps)`, `depth = ceil(ln(1 / delta))`.
  * Point-query guarantee: `true <= est <= true + eps * N` with probability
  * `>= 1 - delta`, where N is the total count. Estimates never
  * underestimate, which makes CMS-driven heavy-hitter candidate sets a
  * guaranteed superset of the true heavy hitters.
  *
  * Row hashing: seeded FNV-1a (the reference's hash family,
  * `bloom.c:490-508`) finalized with splitmix64 for row-independence.
  * Merge = element-wise counter add — associative + commutative, a legal
  * Spark aggregation monoid.
  */
final class CmsSketch private (
    val eps: Double,
    val delta: Double,
    val depth: Int,
    val width: Int,
    val table: Array[Long], // depth * width, row-major
    private var _totalCount: Long
) extends Serializable {

  def totalCount: Long = _totalCount

  // Double-hashing row family: bucket_i = (h1 + i*h2) mod width. h1 and h2
  // come from two INDEPENDENTLY seeded FNV-1a passes (seeds 0 and 1 — the
  // reference's seed family, `bloom.c:490-508`), so the pair is 128 bits:
  // two keys only merge in all rows if they collide on both passes
  // (birthday ~n^2/2^129, negligible at 10^12 keys). Deriving h2 from h1
  // (e.g. splitmix64(h1)) would make any full h1 collision a full-table
  // collision — expected at ~2^32.5 keys. Two passes over the key bytes
  // total, instead of `depth` passes for per-row seeded hashing.
  private def baseHash(key: Array[Byte]): Long = Fnv.fnv1a(key, 0)
  private def rowBucket(h1: Long, h2: Long, row: Int): Int =
    java.lang.Long.remainderUnsigned(h1 + row.toLong * h2, width.toLong).toInt

  def add(key: String, count: Long = 1L): Unit = add(key.getBytes(java.nio.charset.StandardCharsets.UTF_8), count)

  def add(key: Array[Byte], count: Long): Unit = {
    require(count >= 0, "negative counts not supported")
    val h1 = baseHash(key)
    val h2 = Fnv.fnv1a(key, 1) | 1L
    var row = 0
    while (row < depth) {
      table(row * width + rowBucket(h1, h2, row)) += count
      row += 1
    }
    _totalCount += count
  }

  def estimateCount(key: String): Long = estimateCount(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def estimateCount(key: Array[Byte]): Long = {
    val h1 = baseHash(key)
    val h2 = Fnv.fnv1a(key, 1) | 1L
    var mn = Long.MaxValue
    var row = 0
    while (row < depth) {
      val v = table(row * width + rowBucket(h1, h2, row))
      if (v < mn) mn = v
      row += 1
    }
    mn
  }

  /** Published additive error bound at the current stream length. */
  def errorBound: Double = eps * _totalCount

  def compatibleWith(other: CmsSketch): Boolean =
    depth == other.depth && width == other.width

  def mergeInPlace(other: CmsSketch): CmsSketch = {
    require(compatibleWith(other), "incompatible CMS geometries")
    var i = 0
    while (i < table.length) { table(i) += other.table(i); i += 1 }
    _totalCount += other._totalCount
    this
  }

  /** Leads with a format+hash-family magic: the bucket placement depends
    * on the row-hash family, so a blob from a different revision must
    * fail LOUDLY on deserialize — silently recomputing buckets under a
    * new family reads the wrong cells and can underestimate, breaking
    * CMS's one-sided guarantee (and cms_merge would merge old/new-family
    * tables into nonsense).
    */
  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 + 8 + 4 + 4 + 8 + table.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(CmsSketch.FormatMagic)
    buf.putDouble(eps)
    buf.putDouble(delta)
    buf.putInt(depth)
    buf.putInt(width)
    buf.putLong(_totalCount)
    var i = 0
    while (i < table.length) { buf.putLong(table(i)); i += 1 }
    buf.array()
  }

  override def toString: String = s"CmsSketch(eps=$eps,delta=$delta,d=$depth,w=$width,N=${_totalCount})"
}

object CmsSketch {
  def empty(eps: Double, delta: Double): CmsSketch = {
    require(eps > 0 && eps < 1, s"eps must be in (0,1), got $eps")
    require(delta > 0 && delta < 1, s"delta must be in (0,1), got $delta")
    val width = math.ceil(math.E / eps).toInt
    val depth = math.ceil(math.log(1.0 / delta)).toInt.max(1)
    require(depth.toLong * width <= (Int.MaxValue - 8) / 8, s"CMS table too large: $depth x $width")
    new CmsSketch(eps, delta, depth, width, new Array[Long](depth * width), 0L)
  }

  /** Format magic: 'C','M','S' + family revision. Rev 2 = double-hashing
    * rows with h1 = fnv1a(key,0), h2 = fnv1a(key,1)|1 (rev 1, never
    * released, derived h2 from splitmix64(h1)).
    */
  final val FormatMagic: Int = 0x434D5302

  def deserialize(bytes: Array[Byte]): CmsSketch = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == FormatMagic,
      f"not a CMS blob of this format/hash-family revision (magic 0x$magic%08x, want 0x$FormatMagic%08x) — rebuild the sketch; mixed-revision blobs must never merge silently")
    val eps = buf.getDouble
    val delta = buf.getDouble
    val depth = buf.getInt
    val width = buf.getInt
    val total = buf.getLong
    val table = new Array[Long](depth * width)
    var i = 0
    while (i < table.length) { table(i) = buf.getLong; i += 1 }
    new CmsSketch(eps, delta, depth, width, table, total)
  }
}
