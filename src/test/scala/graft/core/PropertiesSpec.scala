package graft.core

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties beyond the reference's golden suite (FIXTURES §4):
  * structural guarantees that must hold for ALL inputs, not just the
  * decimal-string fixtures — no false negatives over arbitrary unicode,
  * merge algebra (associative / commutative / idempotent), serde and hex
  * round-trips, and estimator one-sided/bounded error.
  */
class PropertiesSpec extends AnyFunSuite {

  /** scalatestplus is not on the offline classpath; drive scalacheck
    * directly and fail the scalatest test on any falsified property.
    */
  private def check(prop: Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(50)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private val keyGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr.filter(_.nonEmpty),
    Gen.identifier,
    Gen.nonEmptyListOf(Gen.oneOf[String]("√", "ß", "中", "я", "🚀", "a", "0")).map(_.mkString))
  private val keysGen: Gen[List[String]] = Gen.nonEmptyListOf(keyGen)

  private def bloomOf(keys: Seq[String], n: Long = 2000, p: Float = 0.01f): BloomSketch = {
    val b = BloomSketch.empty(n, p)
    keys.foreach(b.add)
    b
  }

  test("bloom: no false negatives for arbitrary unicode keys") {
    check(Prop.forAll(keysGen) { keys =>
      val b = bloomOf(keys)
      keys.forall(b.contains)
    })
  }

  test("bloom: merge is associative, commutative, idempotent on the bit array") {
    check(Prop.forAll(keysGen, keysGen, keysGen) { (xs, ys, zs) =>
      def bits(s: BloomSketch) = s.serialize().dropRight(20).toSeq
      val (a1, b1, c1) = (bloomOf(xs), bloomOf(ys), bloomOf(zs))
      val ab_c = bloomOf(xs).mergeInPlace(bloomOf(ys)).mergeInPlace(bloomOf(zs))
      val a_bc = bloomOf(xs).mergeInPlace(bloomOf(ys).mergeInPlace(bloomOf(zs)))
      val ba = bloomOf(ys).mergeInPlace(bloomOf(xs))
      val aa = bloomOf(xs).mergeInPlace(bloomOf(xs))
      bits(ab_c) == bits(a_bc) &&
        bits(ba) == bits(bloomOf(xs).mergeInPlace(bloomOf(ys))) &&
        bits(aa) == bits(a1) && bits(b1) == bits(b1) && bits(c1) == bits(c1)
    })
  }

  test("bloom: serialize∘deserialize = id and fromHex∘toHex = id") {
    check(Prop.forAll(keysGen) { keys =>
      val b = bloomOf(keys)
      val viaBin = BloomSketch.deserialize(b.serialize())
      val viaHex = BloomSketch.fromHexString(b.toHexString)
      viaBin.serialize().toSeq == b.serialize().toSeq &&
        viaHex.serialize().toSeq == b.serialize().toSeq &&
        viaBin.elementsAdded == b.elementsAdded
    })
  }

  test("bloom: union ⊇ both sides, intersect ⊆ both sides (bit-wise)") {
    check(Prop.forAll(keysGen, keysGen) { (xs, ys) =>
      val (a, b) = (bloomOf(xs), bloomOf(ys))
      val u = a.union(b)
      val i = a.intersect(b)
      val okU = xs.forall(u.contains) && ys.forall(u.contains)
      val okBits = a.countUnionBitsSet(b) >= math.max(a.countSetBits, b.countSetBits) &&
        a.countIntersectionBitsSet(b) <= math.min(a.countSetBits, b.countSetBits)
      val okJ = { val j = a.jaccardIndex(b); j >= 0f && j <= 1f }
      okU && okBits && okJ && i.countSetBits <= u.countSetBits
    })
  }

  test("counting bloom: count >= true frequency; remove restores") {
    check(Prop.forAll(keysGen) { keys =>
      val c = CountingBloomSketch.empty(2000, 0.01f)
      keys.foreach(c.add)
      val freq = keys.groupBy(identity).view.mapValues(_.size).toMap
      freq.forall { case (k, f) => c.estimateCount(k) >= f }
    })
  }

  test("cms: estimate >= true count (one-sided error), merge additive") {
    check(Prop.forAll(keysGen, keysGen) { (xs, ys) =>
      val a = CmsSketch.empty(0.01, 0.01)
      val b = CmsSketch.empty(0.01, 0.01)
      xs.foreach(a.add(_))
      ys.foreach(b.add(_))
      a.mergeInPlace(b)
      val freq = (xs ++ ys).groupBy(identity).view.mapValues(_.size).toMap
      freq.forall { case (k, f) => a.estimateCount(k) >= f }
    })
  }

  test("hll: merged estimate equals estimate of concatenated stream") {
    check(Prop.forAll(keysGen, keysGen) { (xs, ys) =>
      val a = HllSketch.empty(12)
      val b = HllSketch.empty(12)
      val c = HllSketch.empty(12)
      xs.foreach(a.add)
      ys.foreach(b.add)
      (xs ++ ys).foreach(c.add)
      a.mergeInPlace(b)
      a.serialize().toSeq == c.serialize().toSeq
    })
  }

  test("kll: quantile of merged sketch within rank bound of exact") {
    val xsGen = Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))
    check(Prop.forAll(xsGen, xsGen) { (xs, ys) =>
      val a = KllSketch.empty(200)
      val b = KllSketch.empty(200)
      xs.foreach(a.add)
      ys.foreach(b.add)
      a.mergeInPlace(b)
      val all = (xs ++ ys).sorted
      Seq(0.25, 0.5, 0.75).forall { q =>
        val est = a.quantile(q)
        // tie-aware: with duplicated values the achievable ranks jump, so
        // the estimate is correct if q is bracketed by the strict/non-strict
        // rank of est within the sketch's rank error
        val eps = 0.05 + 1.0 / all.size
        val lo = all.count(_ < est).toDouble / all.size
        val hi = all.count(_ <= est).toDouble / all.size
        q >= lo - eps && q <= hi + eps
      }
    })
  }

  test("tdigest: quantiles monotone and within data range") {
    val xsGen = Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))
    check(Prop.forAll(xsGen) { xs =>
      val t = TDigestSketch.empty(100.0)
      xs.foreach(t.add(_))
      val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99).map(t.quantile)
      qs.zip(qs.tail).forall { case (lo, hi) => lo <= hi } &&
        qs.head >= xs.min && qs.last <= xs.max
    })
  }

  // ---------------- Misra-Gries (round 3) ----------------

  test("mg: bound holds for arbitrary streams, capacities and splits") {
    val streamGen = for {
      keys <- keysGen
      reps <- Gen.listOfN(keys.length, Gen.choose(1, 30))
    } yield keys.zip(reps).flatMap { case (k, r) => List.fill(r)(k) }
    check(Prop.forAll(streamGen, Gen.choose(1, 40), Gen.choose(1, 7)) { (xs, k, chunks) =>
      val parts = xs.grouped(math.max(1, xs.size / chunks)).map { c =>
        val m = MgSketch.empty(k); c.foreach(m.add(_)); m
      }.toList
      val mg = parts.reduceLeft((a, b) => a.mergeInPlace(b))
      val exact = xs.groupBy(identity).map { case (key, v) => key -> v.size.toLong }
      mg.totalCount == xs.size.toLong &&
        mg.numCounters <= k &&
        mg.errorBound <= mg.totalCount / (k + 1) &&
        exact.forall { case (key, t) =>
          val e = mg.estimate(key); e <= t && e >= t - mg.errorBound
        }
    })
  }

  test("mg: serde round-trip preserves every estimate and the bound") {
    check(Prop.forAll(keysGen, Gen.choose(1, 20)) { (xs, k) =>
      val m = MgSketch.empty(k); xs.foreach(m.add(_))
      val back = MgSketch.deserialize(m.serialize())
      back.totalCount == m.totalCount && back.errorBound == m.errorBound &&
        back.entries.toSeq == m.entries.toSeq
    })
  }

  // ---------------- bottom-k sample (round 3) ----------------

  test("bk: partition/merge-order invariance is bitwise, for all inputs") {
    check(Prop.forAll(keysGen, Gen.choose(1, 25), Gen.choose(1, 6)) { (xs, k, chunks) =>
      val serial = BkSample.empty(k); xs.foreach(serial.add)
      val golden = serial.serialize().toSeq
      val parts = xs.grouped(math.max(1, xs.size / chunks))
        .map { c => val b = BkSample.empty(k); c.foreach(b.add); b.serialize() }.toList
      def fold(ps: List[Array[Byte]]) =
        ps.map(BkSample.deserialize).reduceLeft((a, b) => a.mergeInPlace(b)).serialize().toSeq
      fold(parts) == golden && fold(parts.reverse) == golden
    })
  }

  test("weighted sample: partition/merge-order invariance, bottom-k law, max-weight dup semantics") {
    val wGen = Gen.choose(1L, 1000L)
    val itemsGen = Gen.nonEmptyListOf(Gen.zip(keyGen, wGen))
    check(Prop.forAll(itemsGen, Gen.choose(1, 20), Gen.choose(1, 6)) { (items, k, chunks) =>
      val serial = WeightedSample.empty(k)
      items.foreach { case (key, w) => serial.add(key, w) }
      val golden = serial.serialize()
      // any chunking, forward and reverse merge order → bitwise identical
      val parts = items.grouped(math.max(1, items.size / chunks)).map { c =>
        val p = WeightedSample.empty(k); c.foreach { case (key, w) => p.add(key, w) }; p
      }.toVector
      val fwd = parts.map(p => WeightedSample.deserialize(p.serialize()))
        .reduceLeft((a, b) => a.mergeInPlace(b)).serialize()
      val rev = parts.reverse.map(p => WeightedSample.deserialize(p.serialize()))
        .reduceLeft((a, b) => a.mergeInPlace(b)).serialize()
      // bottom-k law: sample = k smallest A-Res priorities over per-key MAX weight
      val perKeyMax = items.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val expect = perKeyMax.toSeq
        .sortBy { case (key, w) => (WeightedSample.testPriority(key, w), key) }
        .take(k).map(_._1).toSet
      java.util.Arrays.equals(fwd, golden) && java.util.Arrays.equals(rev, golden) &&
        serial.values.toSet == expect
    })
  }

  test("mg sketch byte-key store: string and UTF-8-byte adds are interchangeable, bound holds") {
    check(Prop.forAll(keysGen, Gen.choose(1, 16)) { (xs, k) =>
      val a = MgSketch.empty(k)
      val b = MgSketch.empty(k)
      xs.foreach(x => a.add(x))
      xs.foreach(x => b.add(x.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      java.util.Arrays.equals(a.serialize(), b.serialize()) &&
        a.errorBound <= a.totalCount / (k + 1) &&
        exact.forall { case (key, cnt) =>
          val est = a.estimate(key); est <= cnt && est >= cnt - a.errorBound
        }
    })
  }
}

/** Pluggable-hasher seam (bloom.h:42,54; swap = bloom.c:89-91): a custom
  * hash family works end to end, and hash identity participates in merge
  * compatibility like the C pointer-equality check (bloom.c:414-423).
  */
class BloomHasherSpec extends AnyFunSuite {
  private object SplitmixHasher extends BloomHasher {
    val id = "splitmix-test"
    def hashes(key: Array[Byte], k: Int): Array[Long] = {
      var h = Fnv.fnv1a(key, 0)
      Array.fill(k) { h = Fnv.splitmix64(h); h }
    }
  }

  test("custom hasher: no false negatives, different bit pattern, merge-incompatible with default") {
    val keys = (0 until 2000).map(_.toString)
    val custom = BloomSketch.empty(5000, 0.01f, SplitmixHasher)
    val default = BloomSketch.empty(5000, 0.01f)
    keys.foreach { k => custom.add(k); default.add(k) }
    assert(keys.forall(custom.contains))
    assert(!custom.bits.sameElements(default.bits))
    assertThrows[IllegalArgumentException](custom.mergeInPlace(default))
    assertThrows[IllegalArgumentException](custom.union(default))
    // same custom hasher on both sides merges fine
    val other = BloomSketch.empty(5000, 0.01f, SplitmixHasher)
    other.add("extra")
    assert(custom.mergeInPlace(other).contains("extra"))
  }
}

/** KLL at scale: the compactor must conserve weight exactly (every
  * compaction promotes an even count; odd leftovers stay at their level),
  * so rank(max)=1 exactly and rank error stays within bound at 10^6-item
  * streams — regression for a drift where odd-length keep-odd compactions
  * silently dropped one item-weight each.
  */
class KllScaleSpec extends AnyFunSuite {
  test("kll: weight conserved and rank error < 1.5% over 1M skewed values") {
    val sk = KllSketch.empty(200)
    val xs = new Array[Double](1000000)
    var h = 42L
    var i = 0
    while (i < xs.length) {
      h = Fnv.splitmix64(h)
      // lognormal-ish skew, like price/length columns
      val u = (h >>> 11).toDouble / (1L << 53).toDouble
      xs(i) = math.exp(3.0 * u) * 1000.0
      sk.add(xs(i))
      i += 1
    }
    assert(sk.rank(sk.max) == 1.0, s"weight drift: rank(max)=${sk.rank(sk.max)}")
    val sorted = xs.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = sk.quantile(q)
      val rank = {
        var lo = 0; var hi = sorted.length
        while (lo < hi) { val m = (lo + hi) >>> 1; if (sorted(m) <= est) lo = m + 1 else hi = m }
        lo.toDouble / sorted.length
      }
      assert(math.abs(rank - q) <= 0.015, f"q=$q rank=$rank%.4f err=${math.abs(rank - q)}%.4f")
    }
  }

  test("kll: merged 8-way rank error < 2% over 800k values") {
    val parts = (0 until 8).map { p =>
      val s = KllSketch.empty(200)
      var h = 1000L + p
      (0 until 100000).foreach { _ =>
        h = Fnv.splitmix64(h)
        s.add(((h >>> 11).toDouble / (1L << 53).toDouble) * 1e6)
      }
      s
    }
    val merged = parts.reduce(_ mergeInPlace _)
    assert(merged.count == 800000L)
    assert(merged.rank(merged.max) == 1.0)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = merged.quantile(q)
      // uniform on [0,1e6]: exact rank of est ≈ est/1e6
      assert(math.abs(est / 1e6 - q) <= 0.02, s"q=$q est=$est")
    }
  }
}

/** Same at-scale regression net for the other estimators. */
class EstimatorScaleSpec extends AnyFunSuite {
  test("tdigest: rank error < 1% mid / 0.3% tails over 1M skewed values") {
    val td = TDigestSketch.empty(100.0)
    val xs = new Array[Double](1000000)
    var h = 7L
    var i = 0
    while (i < xs.length) {
      h = Fnv.splitmix64(h)
      xs(i) = math.exp(3.0 * ((h >>> 11).toDouble / (1L << 53).toDouble)) * 1000.0
      td.add(xs(i))
      i += 1
    }
    val sorted = xs.sorted
    def rankOf(v: Double): Double = {
      var lo = 0; var hi = sorted.length
      while (lo < hi) { val m = (lo + hi) >>> 1; if (sorted(m) <= v) lo = m + 1 else hi = m }
      lo.toDouble / sorted.length
    }
    for ((q, tol) <- Seq(0.01 -> 0.003, 0.25 -> 0.01, 0.5 -> 0.01, 0.75 -> 0.01, 0.99 -> 0.003)) {
      val err = math.abs(rankOf(td.quantile(q)) - q)
      assert(err <= tol, f"q=$q err=$err%.5f")
    }
  }

  test("hll: relative error < 2% at 1M distinct keys (p=14)") {
    val hll = HllSketch.empty(14)
    var i = 0
    while (i < 1000000) { hll.add(s"key-$i"); i += 1 }
    val est = hll.estimate
    assert(math.abs(est - 1000000.0) / 1000000.0 <= 0.02, s"est=$est")
  }

  test("cms: one-sided error within eps*N at 1M updates") {
    val cms = CmsSketch.empty(0.0001, 0.01)
    val keys = (0 until 50).map(i => s"k$i")
    var h = 99L
    var i = 0
    val exact = new Array[Long](keys.length)
    while (i < 1000000) {
      h = Fnv.splitmix64(h)
      // Zipf-ish: low indices much more frequent
      val idx = (keys.length * math.pow((h >>> 11).toDouble / (1L << 53).toDouble, 3.0)).toInt.min(keys.length - 1)
      cms.add(keys(idx))
      exact(idx) += 1
      i += 1
    }
    keys.indices.foreach { j =>
      val est = cms.estimateCount(keys(j))
      assert(est >= exact(j), s"undercount at $j")
      assert(est <= exact(j) + math.ceil(0.0001 * 1000000).toLong + 1, s"overcount at $j: est=$est exact=${exact(j)}")
    }
  }
}
