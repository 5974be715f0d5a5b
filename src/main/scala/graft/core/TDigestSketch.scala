package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Merging t-digest quantile sketch, from scratch per Dunning & Ertl,
  * "Computing Extremely Accurate Quantiles Using t-Digests" (2019), scale
  * function k1: `k(q) = (δ / 2π) · asin(2q − 1)`.
  *
  * Buffered design: incoming points accumulate in a buffer; on overflow
  * (or query/serialize) the buffer is sorted together with the existing
  * centroids and merged in a single left-to-right pass, fusing neighbours
  * while the k1 span stays ≤ 1. Cluster sizes are thus bounded by
  * `q(1−q)`-proportional mass, giving high tail accuracy.
  *
  * Merge of two digests = feed the other digest's centroids through the
  * same pass. t-digest is only approximately merge-order-independent
  * (documented deviation from a perfect monoid): different merge trees give
  * slightly different centroids but the same published accuracy bound.
  * Tests check determinism at a fixed tree and accuracy at any tree.
  */
final class TDigestSketch private (
    val compression: Double,
    private var centroidMeans: Array[Double],
    private var centroidWeights: Array[Double],
    private var nCentroids: Int,
    private val bufMeans: Array[Double],
    private val bufWeights: Array[Double],
    private var nBuf: Int,
    private var _totalWeight: Double,
    private var _min: Double,
    private var _max: Double
) extends Serializable {

  def totalWeight: Double = { flush(); _totalWeight }
  def min: Double = _min
  def max: Double = _max
  def centroidCount: Int = { flush(); nCentroids }

  def add(x: Double, w: Double = 1.0): Unit = {
    require(!x.isNaN, "NaN not supported")
    if (nBuf == bufMeans.length) flush()
    bufMeans(nBuf) = x
    bufWeights(nBuf) = w
    nBuf += 1
    if (x < _min) _min = x
    if (x > _max) _max = x
  }

  def mergeInPlace(other: TDigestSketch): TDigestSketch = {
    require(compression == other.compression, "incompatible t-digest compressions")
    other.flush()
    var i = 0
    while (i < other.nCentroids) {
      add(other.centroidMeans(i), other.centroidWeights(i))
      i += 1
    }
    if (other._min < _min) _min = other._min
    if (other._max > _max) _max = other._max
    this
  }

  private def k1(q: Double): Double =
    compression / (2.0 * math.Pi) * math.asin(2.0 * q - 1.0)

  /** Sort centroids+buffer and re-cluster in one pass (the merging
    * algorithm of the paper, §3.2).
    */
  private def flush(): Unit = {
    if (nBuf == 0) return
    val n = nCentroids + nBuf
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    System.arraycopy(centroidMeans, 0, ms, 0, nCentroids)
    System.arraycopy(centroidWeights, 0, ws, 0, nCentroids)
    System.arraycopy(bufMeans, 0, ms, nCentroids, nBuf)
    System.arraycopy(bufWeights, 0, ws, nCentroids, nBuf)
    nBuf = 0
    // sort (mean, weight) pairs by mean — index sort keeps pairs together.
    // Stable primitive merge sort: the former boxed `sortBy` allocated an
    // Integer per element per flush (~20M boxed ints over a 15M-row
    // build); same comparator (java.lang.Double.compare) and stability,
    // so the order — hence every centroid — is bit-identical.
    val order = TDigestSketch.sortedIndices(ms, n)
    val total = {
      var s = 0.0; var i = 0
      while (i < n) { s += ws(i); i += 1 }
      s
    }
    _totalWeight = total
    val outM = new Array[Double](n)
    val outW = new Array[Double](n)
    var out = 0
    var curM = ms(order(0))
    var curW = ws(order(0))
    var wSoFar = 0.0
    var kLeft = k1(0.0)
    var i = 1
    while (i < n) {
      val m = ms(order(i))
      val w = ws(order(i))
      val qRight = (wSoFar + curW + w) / total
      if (k1(qRight) - kLeft <= 1.0) {
        // fuse into current cluster (weighted mean)
        curM += (m - curM) * w / (curW + w)
        curW += w
      } else {
        outM(out) = curM; outW(out) = curW; out += 1
        wSoFar += curW
        kLeft = k1(wSoFar / total)
        curM = m; curW = w
      }
      i += 1
    }
    outM(out) = curM; outW(out) = curW; out += 1
    centroidMeans = java.util.Arrays.copyOf(outM, out)
    centroidWeights = java.util.Arrays.copyOf(outW, out)
    nCentroids = out
  }

  /** Quantile estimate with linear interpolation between centroid means;
    * exact at the tracked min/max endpoints.
    */
  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"q must be in [0,1], got $q")
    flush()
    if (nCentroids == 0) return Double.NaN
    if (nCentroids == 1) return centroidMeans(0)
    val total = _totalWeight
    val target = q * total
    if (target <= centroidWeights(0) / 2.0) {
      // below first centroid midpoint: interpolate from min
      val w0 = centroidWeights(0) / 2.0
      return _min + (centroidMeans(0) - _min) * (target / w0).min(1.0)
    }
    var cum = 0.0
    var i = 0
    while (i < nCentroids - 1) {
      val mid = cum + centroidWeights(i) / 2.0
      val nextMid = cum + centroidWeights(i) + centroidWeights(i + 1) / 2.0
      if (target < nextMid) {
        val frac = (target - mid) / (nextMid - mid)
        return centroidMeans(i) + frac * (centroidMeans(i + 1) - centroidMeans(i))
      }
      cum += centroidWeights(i)
      i += 1
    }
    val lastMid = cum + centroidWeights(nCentroids - 1) / 2.0
    val span = total - lastMid
    if (span <= 0) _max
    else {
      val frac = ((target - lastMid) / span).min(1.0)
      centroidMeans(nCentroids - 1) + frac * (_max - centroidMeans(nCentroids - 1))
    }
  }

  def serialize(): Array[Byte] = {
    flush()
    val buf = ByteBuffer.allocate(8 + 8 + 8 + 8 + 4 + nCentroids * 16).order(ByteOrder.LITTLE_ENDIAN)
    buf.putDouble(compression)
    buf.putDouble(_min)
    buf.putDouble(_max)
    buf.putDouble(_totalWeight)
    buf.putInt(nCentroids)
    var i = 0
    while (i < nCentroids) {
      buf.putDouble(centroidMeans(i))
      buf.putDouble(centroidWeights(i))
      i += 1
    }
    buf.array()
  }

  override def toString: String = { flush(); s"TDigestSketch(δ=$compression,n=${_totalWeight},centroids=$nCentroids)" }
}

object TDigestSketch {
  /** Stable index sort by `keys` under `java.lang.Double.compare` order —
    * exactly the order (and tie behavior, including -0.0 < 0.0) of
    * `Array.range(0, n).sortBy(keys(_))`, without boxing an Integer per
    * element. Bottom-up-free simple recursive merge; ties take the left
    * half first (stability by induction).
    */
  private[graft] def sortedIndices(keys: Array[Double], n: Int): Array[Int] = {
    val idx = new Array[Int](n)
    var i = 0
    while (i < n) { idx(i) = i; i += 1 }
    if (n < 2) return idx
    val tmp = new Array[Int](n)
    def merge(lo: Int, mid: Int, hi: Int): Unit = {
      System.arraycopy(idx, lo, tmp, lo, mid - lo)
      var l = lo
      var r = mid
      var o = lo
      while (l < mid && r < hi) {
        if (java.lang.Double.compare(keys(tmp(l)), keys(idx(r))) <= 0) {
          idx(o) = tmp(l); l += 1
        } else {
          idx(o) = idx(r); r += 1
        }
        o += 1
      }
      while (l < mid) { idx(o) = tmp(l); l += 1; o += 1 }
      // right-half leftovers are already in place
    }
    def sort(lo: Int, hi: Int): Unit = if (hi - lo > 1) {
      val mid = (lo + hi) >>> 1
      sort(lo, mid)
      sort(mid, hi)
      merge(lo, mid, hi)
    }
    sort(0, n)
    idx
  }

  def empty(compression: Double): TDigestSketch = {
    require(compression >= 10, s"compression must be >= 10, got $compression")
    val bufCap = math.max(32, (5 * compression).toInt)
    new TDigestSketch(compression, new Array[Double](0), new Array[Double](0), 0,
      new Array[Double](bufCap), new Array[Double](bufCap), 0,
      0.0, Double.PositiveInfinity, Double.NegativeInfinity)
  }

  def deserialize(bytes: Array[Byte]): TDigestSketch = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val compression = buf.getDouble
    val mn = buf.getDouble
    val mx = buf.getDouble
    val total = buf.getDouble
    val n = buf.getInt
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    var i = 0
    while (i < n) { ms(i) = buf.getDouble; ws(i) = buf.getDouble; i += 1 }
    val bufCap = math.max(32, (5 * compression).toInt)
    new TDigestSketch(compression, ms, ws, n,
      new Array[Double](bufCap), new Array[Double](bufCap), 0, total, mn, mx)
  }
}
