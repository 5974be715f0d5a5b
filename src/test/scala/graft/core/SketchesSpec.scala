package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Accuracy-vs-oracle and monoid-property tests for the non-Bloom sketches.
  * Oracles are exact computations on deterministic fixed-seed data; bounds
  * are each algorithm's published error bound (BASELINE.md).
  */
class SketchesSpec extends AnyFunSuite {

  /** Deterministic pseudo-random stream via splitmix64 (no wall clock). */
  private def stream(n: Int, seed: Long = 42L): IndexedSeq[Long] =
    (0 until n).map(i => Fnv.splitmix64(seed + i))

  // ---------------- Counting Bloom ----------------

  test("counting bloom: add/remove/contains/estimateCount") {
    val cb = CountingBloomSketch.empty(5000, 0.01f)
    (0 until 1000).foreach(i => cb.add(i.toString))
    assert((0 until 1000).forall(i => cb.contains(i.toString)))
    cb.add("7"); cb.add("7")
    assert(cb.estimateCount("7") >= 3) // min-counter is an upper bound >= true
    cb.remove("7"); cb.remove("7"); cb.remove("7")
    assert(cb.estimateCount("7") >= 0)
    (0 until 1000).filter(_ != 7).foreach(i => assert(cb.contains(i.toString)))
    cb.remove("999")
    assert(!cb.contains("999") || cb.estimateCount("999") >= 0)
  }

  test("counting bloom: merge additivity == serial build") {
    val serial = CountingBloomSketch.empty(2000, 0.01f)
    (0 until 2000).foreach(i => serial.add((i % 500).toString))
    val parts = (0 until 4).map { p =>
      val s = CountingBloomSketch.empty(2000, 0.01f)
      (0 until 2000).filter(_ % 4 == p).foreach(i => s.add((i % 500).toString))
      s
    }
    val merged = parts.reduceLeft(_ mergeInPlace _)
    assert(merged.counters.toSeq == serial.counters.toSeq)
    assert(merged.elementsAdded == serial.elementsAdded)
    assert(merged.serialize().toSeq == serial.serialize().toSeq)
  }

  test("counting bloom: serde round-trip") {
    val cb = CountingBloomSketch.empty(1000, 0.05f)
    (0 until 300).foreach(i => cb.add(i.toString))
    val r = CountingBloomSketch.deserialize(cb.serialize())
    assert(r.counters.toSeq == cb.counters.toSeq)
    assert(r.elementsAdded == 300)
    assert(r.numberHashes == cb.numberHashes)
  }

  // ---------------- HLL ----------------

  test("hll: estimate within published bound (1.04/sqrt(m), 4 sigma)") {
    for (p <- Seq(10, 12, 14); n <- Seq(100, 10000, 200000)) {
      val h = HllSketch.empty(p)
      (0 until n).foreach(i => h.add(s"key-$i"))
      val err = math.abs(h.estimate - n) / n.toDouble
      val bound = 4 * 1.04 / math.sqrt((1 << p).toDouble)
      assert(err <= bound, s"p=$p n=$n est=${h.estimate} err=$err bound=$bound")
    }
  }

  test("hll: no bias hump at the raw/linear-counting crossover (n = 1.5m..5m)") {
    // The classic 2013 estimator (raw + linear-counting switch at 2.5m)
    // shows ~+2.5% mean bias at n≈2.5m (Heule 2013 §5; measured +2.51%
    // mean / 3.65% max here before the fix — over the 3% q05 gate).
    // Ertl's estimator must keep the whole sweep inside the gate, with
    // near-zero mean bias.
    val p = 14
    val m = 1 << p
    for (mult <- Seq(1.5, 2.0, 2.5, 3.0, 4.0, 5.0)) {
      val n = (mult * m).toLong
      val errs = (0 until 6).map { trial =>
        val h = HllSketch.empty(p)
        var i = 0L
        while (i < n) { h.addLong(i * 2654435761L + trial * 1000000007L); i += 1 }
        (h.estimate - n) / n
      }
      val mean = errs.sum / errs.length
      assert(errs.map(math.abs).max <= 0.03, s"n=${mult}m errs=$errs")
      assert(math.abs(mean) <= 0.012, s"n=${mult}m mean bias $mean")
    }
  }

  test("hll: duplicates don't change estimate (idempotent adds)") {
    val a = HllSketch.empty(12)
    val b = HllSketch.empty(12)
    (0 until 5000).foreach(i => a.add(s"k$i"))
    (0 until 5000).foreach { i => b.add(s"k$i"); b.add(s"k$i"); b.add(s"k$i") }
    assert(a.registers.toSeq == b.registers.toSeq)
  }

  test("hll: merge == serial build bit-for-bit (any tree)") {
    val serial = HllSketch.empty(12)
    (0 until 20000).foreach(i => serial.add(s"k$i"))
    val parts = (0 until 8).map { p =>
      val s = HllSketch.empty(12)
      (0 until 20000).filter(_ % 8 == p).foreach(i => s.add(s"k$i"))
      s
    }
    // two different merge trees
    val left = parts.map(_.copy()).reduceLeft(_ mergeInPlace _)
    val pairwise = parts.map(_.copy()).grouped(2).map(g => g.reduceLeft(_ mergeInPlace _)).reduceLeft(_ mergeInPlace _)
    assert(left.registers.toSeq == serial.registers.toSeq)
    assert(pairwise.registers.toSeq == serial.registers.toSeq)
  }

  test("hll: serde round-trip") {
    val h = HllSketch.empty(11)
    (0 until 1000).foreach(i => h.add(s"x$i"))
    val r = HllSketch.deserialize(h.serialize())
    assert(r.precision == 11 && r.registers.toSeq == h.registers.toSeq)
  }

  test("hll sparse wire format: tiny groups shrink ~1000x, round-trip exact, mixed merge bitwise-invariant") {
    // 3 elements at p=14: dense would be 16385 bytes of mostly zeros
    val tiny = HllSketch.empty(14)
    Seq("a", "b", "c").foreach(tiny.add)
    val blob = tiny.serialize()
    assert((blob(0) & 0x80) != 0, "tiny sketch must pick the sparse encoding")
    assert(blob.length < (1 + (1 << 14)) / 100,
      s"sparse blob ${blob.length}B should be <1% of dense ${1 + (1 << 14)}B")
    val rt = HllSketch.deserialize(blob)
    assert(rt.precision == 14 && rt.registers.toSeq == tiny.registers.toSeq)
    assert(rt.estimateLong == tiny.estimateLong)

    // a full sketch stays dense (v1 bytes unchanged)
    val full = HllSketch.empty(8)
    (0 until 5000).foreach(i => full.add(s"k$i"))
    val denseBlob = full.serialize()
    assert((denseBlob(0) & 0x80) == 0 && denseBlob.length == 1 + (1 << 8))

    // transparent promotion: the same sketch's encoding flips dense as it
    // fills, and every intermediate round-trips exactly
    val grow = HllSketch.empty(10)
    var sawSparse = false; var sawDense = false
    (0 until 2000).foreach { i =>
      grow.add(s"g$i")
      if (i % 200 == 0) {
        val b = grow.serialize()
        if ((b(0) & 0x80) != 0) sawSparse = true else sawDense = true
        assert(HllSketch.deserialize(b).registers.toSeq == grow.registers.toSeq)
      }
    }
    assert(sawSparse && sawDense, "growth must cross the sparse->dense boundary")

    // sparse/dense interop: merging a sparse-round-tripped partial into a
    // dense one equals the serial build bit-for-bit
    val serial = HllSketch.empty(12)
    (0 until 10000).foreach(i => serial.add(s"m$i"))
    val big = HllSketch.empty(12)
    (0 until 9990).foreach(i => big.add(s"m$i"))
    val small = HllSketch.empty(12)
    (9990 until 10000).foreach(i => small.add(s"m$i"))
    val smallRt = HllSketch.deserialize(small.serialize()) // sparse wire hop
    assert((small.serialize()(0) & 0x80) != 0)
    val merged = HllSketch.deserialize(big.serialize()).mergeInPlace(smallRt)
    assert(merged.registers.toSeq == serial.registers.toSeq)
    assert(merged.serialize().toSeq == serial.serialize().toSeq)
  }

  // ---------------- CMS ----------------

  test("cms: never underestimates; within eps*N with prob 1-delta") {
    val eps = 0.001
    val cms = CmsSketch.empty(eps, 0.01)
    // zipf-ish: key j appears 10000/(j+1) times
    val trueCounts = (0 until 200).map(j => j.toString -> (10000 / (j + 1))).toMap
    trueCounts.foreach { case (k, c) => (0 until c).foreach(_ => cms.add(k)) }
    val n = cms.totalCount
    var violations = 0
    trueCounts.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"CMS underestimated $k: $est < $c")
      if (est > c + eps * n) violations += 1
    }
    assert(violations <= math.max(1, (0.01 * trueCounts.size).toInt * 3), s"$violations bound violations")
  }

  test("cms: merge additivity == serial build") {
    val serial = CmsSketch.empty(0.01, 0.01)
    (0 until 10000).foreach(i => serial.add((i % 100).toString))
    val parts = (0 until 4).map { p =>
      val s = CmsSketch.empty(0.01, 0.01)
      (0 until 10000).filter(_ % 4 == p).foreach(i => s.add((i % 100).toString))
      s
    }
    val merged = parts.reduceLeft(_ mergeInPlace _)
    assert(merged.table.toSeq == serial.table.toSeq)
    assert(merged.totalCount == serial.totalCount)
  }

  test("cms: serde round-trip") {
    val cms = CmsSketch.empty(0.005, 0.02)
    (0 until 500).foreach(i => cms.add(s"k${i % 37}"))
    val r = CmsSketch.deserialize(cms.serialize())
    assert(r.table.toSeq == cms.table.toSeq && r.totalCount == cms.totalCount)
    assert(r.depth == cms.depth && r.width == cms.width)
    // a blob from a different format/hash-family revision fails LOUDLY —
    // silently recomputing buckets under a new family would break the
    // one-sided guarantee
    val wrongMagic = cms.serialize()
    wrongMagic(0) = (wrongMagic(0) ^ 0x01).toByte
    assertThrows[IllegalArgumentException](CmsSketch.deserialize(wrongMagic))
  }

  // ---------------- t-digest ----------------

  private def exactQuantile(sorted: Array[Double], q: Double): Double =
    sorted(math.min(sorted.length - 1, math.max(0, math.ceil(q * sorted.length).toInt - 1)))

  private def rankOf(sorted: Array[Double], v: Double): Double = {
    var lo = 0; var hi = sorted.length
    while (lo < hi) { val mid = (lo + hi) >>> 1; if (sorted(mid) <= v) lo = mid + 1 else hi = mid }
    lo.toDouble / sorted.length
  }

  test("t-digest: rank error small at mid-quantiles, tiny at tails (δ=100)") {
    val n = 100000
    val data = stream(n).map(x => java.lang.Double.longBitsToDouble((x >>> 12) | 0x3ff0000000000000L) - 1.0).toArray // U[0,1)
    val td = TDigestSketch.empty(100)
    data.foreach(td.add(_))
    val sorted = data.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = td.quantile(q)
      val rankErr = math.abs(rankOf(sorted, est) - q)
      val tol = if (q <= 0.01 || q >= 0.99) 0.005 else 0.02
      assert(rankErr <= tol, s"q=$q est=$est rankErr=$rankErr")
    }
    assert(td.quantile(0.0) == td.min && td.quantile(1.0) == sorted.last)
  }

  test("t-digest: merged digest keeps accuracy (any tree)") {
    val n = 80000
    val data = stream(n, 7L).map(x => (x % 1000000L).toDouble).toArray
    val parts = (0 until 8).map { p =>
      val td = TDigestSketch.empty(100)
      data.indices.filter(_ % 8 == p).foreach(i => td.add(data(i)))
      td
    }
    val merged = parts.reduceLeft(_ mergeInPlace _)
    val sorted = data.sorted
    for (q <- Seq(0.05, 0.5, 0.95)) {
      val rankErr = math.abs(rankOf(sorted, merged.quantile(q)) - q)
      assert(rankErr <= 0.03, s"q=$q rankErr=$rankErr")
    }
    assert(math.abs(merged.totalWeight - n) < 1e-6)
  }

  test("t-digest: serde round-trip preserves quantiles exactly") {
    val td = TDigestSketch.empty(50)
    stream(5000, 3L).foreach(x => td.add((x % 10000L).toDouble))
    val r = TDigestSketch.deserialize(td.serialize())
    for (q <- Seq(0.1, 0.5, 0.9)) assert(r.quantile(q) == td.quantile(q))
    assert(r.totalWeight == td.totalWeight)
  }

  // ---------------- KLL ----------------

  test("kll: rank error within published bound (k=200 → ~0.9% @ 99%)") {
    val n = 100000
    val data = stream(n, 11L).map(x => (x % 1000000L).toDouble).toArray
    val kll = KllSketch.empty(200)
    data.foreach(kll.add)
    val sorted = data.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = kll.quantile(q)
      val rankErr = math.abs(rankOf(sorted, est) - q)
      assert(rankErr <= 2.5 * kll.normalizedRankError, s"q=$q est=$est rankErr=$rankErr bound=${kll.normalizedRankError}")
    }
    assert(kll.quantile(0.0) == sorted.head && kll.quantile(1.0) == sorted.last)
    assert(kll.count == n)
  }

  test("kll: merged sketch keeps accuracy; count exact") {
    val n = 60000
    val data = stream(n, 13L).map(x => (x % 500000L).toDouble).toArray
    val parts = (0 until 6).map { p =>
      val s = KllSketch.empty(200)
      data.indices.filter(_ % 6 == p).foreach(i => s.add(data(i)))
      s
    }
    val merged = parts.reduceLeft(_ mergeInPlace _)
    assert(merged.count == n)
    val sorted = data.sorted
    for (q <- Seq(0.05, 0.5, 0.95)) {
      val rankErr = math.abs(rankOf(sorted, merged.quantile(q)) - q)
      assert(rankErr <= 0.03, s"q=$q rankErr=$rankErr")
    }
  }

  test("kll: serde round-trip preserves state exactly") {
    val kll = KllSketch.empty(128)
    stream(20000, 17L).foreach(x => kll.add((x % 99991L).toDouble))
    val r = KllSketch.deserialize(kll.serialize())
    assert(r.count == kll.count)
    for (q <- Seq(0.1, 0.5, 0.9)) assert(r.quantile(q) == kll.quantile(q))
    // continuing to add after round-trip behaves identically
    r.add(1.0); kll.add(1.0)
    assert(r.quantile(0.5) == kll.quantile(0.5))
  }
}
