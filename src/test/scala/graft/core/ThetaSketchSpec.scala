package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ThetaSketchSpec extends AnyFunSuite {

  private def build(keys: Iterable[String], k: Int = 1024): ThetaSketch = {
    val s = ThetaSketch.empty(k)
    keys.foreach(s.add)
    s
  }

  test("exact below capacity, within 4-sigma RSE above") {
    val small = build((0 until 500).map(i => s"k$i"))
    assert(small.estimateLong == 500 && !small.isEstimationMode)

    for (n <- Seq(5000, 50000, 300000)) {
      val s = build((0 until n).map(i => s"key-$n-$i"))
      val err = math.abs(s.estimate - n) / n
      val bound = 4 * s.standardError
      assert(err <= bound, s"n=$n est=${s.estimate} err=$err bound=$bound")
    }
  }

  test("duplicates don't change the sketch") {
    val a = build((0 until 20000).map(i => s"k$i"))
    val b = ThetaSketch.empty(1024)
    (0 until 20000).foreach { i => b.add(s"k$i"); b.add(s"k$i") }
    assert(a.serialize().sameElements(b.serialize()))
  }

  test("union merge is order-independent and equals a serial build bitwise") {
    val keys = (0 until 60000).map(i => s"key-$i")
    val serial = build(keys)
    val parts = keys.grouped(7000).map(build(_)).toVector
    val leftFold = parts.reduceLeft((a, b) => a.copy().mergeInPlace(b))
    val rightFold = parts.reduceRight((a, b) => b.copy().mergeInPlace(a))
    assert(leftFold.serialize().sameElements(serial.serialize()))
    assert(rightFold.serialize().sameElements(serial.serialize()))
  }

  test("intersection and difference estimates vs exact on overlapping ranges") {
    // A = [0, 60000), B = [40000, 120000): |A∩B| = 20000, |A\B| = 40000,
    // |A∪B| = 120000
    val a = build((0 until 60000).map(i => s"u$i"), 4096)
    val b = build((40000 until 120000).map(i => s"u$i"), 4096)
    val inter = a.intersect(b)
    val diff = a.aNotB(b)
    val u = a.union(b)
    // intersection RSE scales by |A∪B|/|A∩B| (sample thinned by min θ)
    val interBound = 4 * a.standardError * (120000.0 / 20000.0)
    assert(math.abs(inter.estimate - 20000) / 20000.0 <= interBound,
      s"inter est ${inter.estimate}")
    assert(math.abs(diff.estimate - 40000) / 40000.0 <= 4 * a.standardError * (120000.0 / 40000.0),
      s"diff est ${diff.estimate}")
    assert(math.abs(u.estimate - 120000) / 120000.0 <= 4 * a.standardError, s"union est ${u.estimate}")
    // inclusion-exclusion coherence on the samples themselves
    assert(inter.retained + diff.retained == a.intersect(a).retained ||
      math.abs((inter.estimate + diff.estimate) - a.estimate) / a.estimate < 0.1)
  }

  test("disjoint sets intersect to zero; serde round-trip") {
    val a = build((0 until 30000).map(i => s"a$i"))
    val b = build((0 until 30000).map(i => s"b$i"))
    assert(a.intersect(b).estimateLong == 0)
    val r = ThetaSketch.deserialize(a.serialize())
    assert(r.serialize().sameElements(a.serialize()))
    assert(r.estimateLong == a.estimateLong && r.theta == a.theta && r.retained == a.retained)
  }

  test("cross-k set ops keep retained <= result k (invariant survives further ops)") {
    val big = build((0 until 50000).map(i => s"x$i"), 4096)
    val tiny = build((40000 until 50000).map(i => s"x$i"), 64)
    for (r <- Seq(big.aNotB(tiny), big.intersect(tiny))) {
      assert(r.nominalK == 64 && r.retained <= 64, s"k=${r.nominalK} retained=${r.retained}")
      r.addHash(1L) // must not corrupt state
      assert(r.retained <= 64 + 1 && r.theta > 0)
    }
    // estimates still track exact values after the trim (k=64 sample:
    // RSE ~12.6%; sanity window rather than a tight σ bound — the diff
    // sample passes through two thinning steps)
    val est = big.aNotB(tiny).estimate
    assert(est >= 40000 * 0.4 && est <= 40000 * 1.6, s"est=$est")
  }

  test("incompatible k refuses to merge") {
    val a = ThetaSketch.empty(1024)
    val b = ThetaSketch.empty(2048)
    a.add("x"); b.add("x")
    assertThrows[IllegalArgumentException](a.mergeInPlace(b))
  }

  test("theta_jaccard estimates |A∩B|/|A∪B| within sampling error; empty→1.0") {
    val spark = graft.SparkTestSession.spark
    import org.apache.spark.sql.functions.lit
    def blobOf(lo: Int, hi: Int): Array[Byte] = {
      val s = ThetaSketch.empty(4096)
      (lo until hi).foreach(i => s.add(s"k$i"))
      s.serialize()
    }
    // |A|=60k, |B|=60k, overlap 20k: J = 20k/100k = 0.2
    val a = blobOf(0, 60000)
    val b = blobOf(40000, 100000)
    val j = spark.range(1)
      .select(graft.functions.theta_jaccard(lit(a), lit(b)).as("j"))
      .head.getDouble(0)
    assert(math.abs(j - 0.2) <= 0.03, s"jaccard est $j far from 0.2")
    // identical sets → ~1; disjoint → ~0; both empty → exactly 1.0
    val j2 = spark.range(1).select(
      graft.functions.theta_jaccard(lit(a), lit(a)).as("s"),
      graft.functions.theta_jaccard(lit(blobOf(0, 1000)), lit(blobOf(5000, 6000))).as("d"),
      graft.functions.theta_jaccard(lit(blobOf(0, 0)), lit(blobOf(0, 0))).as("e")).head
    assert(j2.getDouble(0) == 1.0)
    assert(j2.getDouble(1) == 0.0)
    assert(j2.getDouble(2) == 1.0)
  }
}
