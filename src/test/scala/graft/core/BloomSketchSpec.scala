package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden-value port of the reference unit suite
  * (`/root/reference/tests/testsuite.c`) — values are hash-deterministic
  * and must reproduce exactly (FIXTURES.md §3).
  */
class BloomSketchSpec extends AnyFunSuite {

  private def fresh = BloomSketch.empty(50000, 0.01f)
  private def keys(r: Range): Seq[String] = r.map(_.toString)

  test("setup: geometry goldens (testsuite.c:34-44)") {
    val b = fresh
    assert(b.estimatedElements == 50000)
    assert(b.falsePositiveRate == 0.01f)
    assert(b.numberHashes == 7)
    assert(b.bloomLength == 59907)
    assert(b.numberBits == 479253)
    assert(b.elementsAdded == 0)
  }

  test("setup: invalid params rejected (testsuite.c:46-52)") {
    assertThrows[IllegalArgumentException](BloomSketch.empty(0, 0.01f))
    assertThrows[IllegalArgumentException](BloomSketch.empty(50000, 1.01f))
    assertThrows[IllegalArgumentException](BloomSketch.empty(50000, -0.01f))
  }

  test("hashes golden (testsuite.c:92-96)") {
    val expected = Array(
      java.lang.Long.parseUnsignedLong("15902901984413996407"),
      java.lang.Long.parseUnsignedLong("13757982394814800524"),
      java.lang.Long.parseUnsignedLong("14025518860217559917"),
      java.lang.Long.parseUnsignedLong("5646210032526140290"),
      java.lang.Long.parseUnsignedLong("6127913770875964707"))
    assert(Fnv.hashes("foo", 5).toSeq == expected.toSeq)
  }

  test("hash seed divergence (testsuite.c:99-109, pyprobables#62)") {
    val a = Fnv.hashes("gMPflVXtwGDXbIhP73TX", 5)
    val b = Fnv.hashes("LtHf1prlU1bCeYZEdqWf", 5)
    assert(a(0) == b(0))
    (1 until 5).foreach(i => assert(a(i) != b(i)))
  }

  test("add + check, no false negatives (testsuite.c:115-178)") {
    val b = fresh
    keys(0 until 3000).foreach(b.add)
    assert(b.elementsAdded == 3000)
    assert(keys(0 until 3000).forall(b.contains))
  }

  test("exact false positive count (testsuite.c:186-202)") {
    val b = fresh
    keys(0 until 50000).foreach(b.add)
    val fps = keys(50000 until 51000).count(b.contains)
    assert(fps == 5)
  }

  test("check with too few hashes fails (testsuite.c:204-208)") {
    val b = fresh
    assertThrows[IllegalArgumentException](b.containsHashes(Fnv.hashes("three", 3)))
  }

  test("clear (testsuite.c:213-232)") {
    val b = fresh
    keys(0 until 5000).foreach(b.add)
    b.clear()
    assert(b.elementsAdded == 0)
    assert(b.countSetBits == 0)
  }

  test("current FPR in (0.0099, 0.0101) at capacity (testsuite.c:271-289)") {
    val b = fresh
    assert(b.currentFalsePositiveRate == 0.0f)
    keys(0 until 50000).foreach(b.add)
    val fpr = b.currentFalsePositiveRate
    assert(fpr > 0.0099f && fpr < 0.0101f, s"fpr=$fpr")
  }

  test("count set bits golden 32931 (testsuite.c:291-304)") {
    val b = fresh
    assert(b.countSetBits == 0)
    b.add("a")
    assert(b.countSetBits == b.numberHashes)
    keys(0 until 5000).foreach(b.add)
    assert(b.countSetBits == 32931)
  }

  test("export sizes (testsuite.c:306-327)") {
    assert(fresh.serializedSize == 59927)
    assert(BloomSketch.empty(100000, 0.5f).serializedSize == 18054)
    assert(BloomSketch.empty(100000, 0.1f).serializedSize == 59927)
    assert(BloomSketch.empty(100000, 0.05f).serializedSize == 77961)
    assert(BloomSketch.empty(100000, 0.01f).serializedSize == 119834)
    assert(BloomSketch.empty(100000, 0.001f).serializedSize == 179740)
  }

  test("estimate elements goldens 4872/9792 (testsuite.c:331-347)") {
    val b = fresh
    keys(0 until 5000).foreach(b.add)
    assert(b.elementsAdded == 5000)
    assert(b.estimateElements == 4872)
    keys(5000 until 10000).foreach(b.add)
    assert(b.elementsAdded == 10000)
    assert(b.estimateElements == 9792)
  }

  test("export MD5 golden (testsuite.c:410-425)") {
    val b = fresh
    keys(0 until 5000).foreach(b.add)
    val bytes = b.serialize()
    assert(bytes.length == 59927)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(x => f"${x & 0xff}%02x").mkString
    assert(md5 == "dff430adaf230fe3579d658c1fd3b457")
  }

  test("binary round-trip (testsuite.c:427-470 semantics)") {
    val b = fresh
    keys(0 until 5000).foreach(b.add)
    val r = BloomSketch.deserialize(b.serialize())
    assert(r.estimatedElements == 50000)
    assert(r.falsePositiveRate == 0.01f)
    assert(r.numberHashes == 7)
    assert(r.elementsAdded == 5000)
    assert(r.bits.toSeq == b.bits.toSeq)
    assert(keys(0 until 5000).forall(r.contains))
  }

  test("hex export goldens (testsuite.c:526-547)") {
    val b = fresh
    keys(0 until 5000).foreach(b.add)
    val hex = b.toHexString
    assert(hex.length == 119854)
    assert(hex.take(80) == "80202010000000008008068000001000800800000200800080220000200000000000002002000002")
    assert(hex.takeRight(80) == "1000000004021000000200601000000040020100000000000000c35000000000000013883c23d70a")
  }

  test("hex import (testsuite.c:549-586)") {
    val bo = BloomSketch.empty(500, 0.1f)
    keys(0 until 250).foreach(bo.add)
    val bf = BloomSketch.fromHexString(bo.toHexString)
    assert(bf.estimatedElements == 500)
    assert(bf.falsePositiveRate == 0.1f)
    assert(bf.numberHashes == 3)
    assert(bf.bloomLength == 300)
    assert(bf.elementsAdded == 250)
    assert(keys(0 until 250).forall(bf.contains))
    assertThrows[IllegalArgumentException](BloomSketch.fromHexString("aaa"))
  }

  test("merge incompatibility (testsuite.c:591-624)") {
    val a = BloomSketch.empty(500, 0.01f)
    val b = BloomSketch.empty(500, 0.1f) // differing p => differing k
    val c = BloomSketch.empty(1000, 0.01f) // differing n => differing m
    assertThrows[IllegalArgumentException](a.union(b))
    assertThrows[IllegalArgumentException](a.intersect(c))
    assertThrows[IllegalArgumentException](a.jaccardIndex(b))
  }

  test("union golden: estimate 358 (testsuite.c:638-669)") {
    val y = BloomSketch.empty(500, 0.01f)
    val z = BloomSketch.empty(500, 0.01f)
    (0 until 250).foreach { i => y.add(i.toString); z.add((i + 100).toString) }
    val x = y.union(z)
    assert(keys(0 until 350).forall(x.contains))
    assert(x.estimateElements == 358)
    assert(x.elementsAdded >= 350 && x.elementsAdded <= 360)
  }

  test("intersect golden: estimate 168 (testsuite.c:671-702)") {
    val y = BloomSketch.empty(500, 0.01f)
    val z = BloomSketch.empty(500, 0.01f)
    (0 until 250).foreach { i => y.add(i.toString); z.add((i + 100).toString) }
    val x = y.intersect(z)
    assert(x.estimateElements == 168)
    assert(x.elementsAdded >= 160 && x.elementsAdded <= 170)
  }

  test("intersect at 16M geometry: estimate 150, m=230041400 (testsuite.c:704-737)") {
    val y = BloomSketch.empty(16000000, 0.001f)
    val z = BloomSketch.empty(16000000, 0.001f)
    (0 until 250).foreach { i => y.add(i.toString); z.add((i + 100).toString) }
    val x = y.intersect(z)
    assert(x.estimateElements == 150)
    assert(x.elementsAdded >= 145 && x.elementsAdded <= 165)
    assert(x.bloomLength == 28755175)
    assert(x.numberBits == 230041400)
  }

  test("jaccard staircase (testsuite.c:739-792)") {
    val y = BloomSketch.empty(500, 0.1f)
    val z = BloomSketch.empty(500, 0.1f)
    assert(y.jaccardIndex(z) == 1.0f) // both empty
    (0 until 400).foreach(i => y.add(i.toString))
    assert(y.jaccardIndex(z) == 0.0f)
    (0 until 100).foreach(i => z.add(i.toString))
    val j1 = y.jaccardIndex(z); assert(j1 >= 0.24f && j1 <= 0.32f, s"j1=$j1")
    (100 until 200).foreach(i => z.add(i.toString))
    val j2 = y.jaccardIndex(z); assert(j2 >= 0.49f && j2 <= 0.59f, s"j2=$j2")
    (200 until 300).foreach(i => z.add(i.toString))
    val j3 = y.jaccardIndex(z); assert(j3 >= 0.70f && j3 <= 0.85f, s"j3=$j3")
    (300 until 400).foreach(i => z.add(i.toString))
    assert(y.jaccardIndex(z) == 1.0f)
  }

  test("stats string exact golden (testsuite.c:797-835)") {
    val b = fresh
    keys(0 until 400).foreach(b.add)
    val expected = "BloomFilter\n" +
      "    bits: 479253\n" +
      "    estimated elements: 50000\n" +
      "    number hashes: 7\n" +
      "    max false positive rate: 0.010000\n" +
      "    bloom length (8 bits): 59907\n" +
      "    elements added: 400\n" +
      "    estimated elements added: 397\n" +
      "    current false positive rate: 0.000000\n" +
      "    export size (bytes): 59927\n" +
      "    number bits set: 2776\n" +
      "    is on disk: no\n"
    assert(b.statsString == expected)
  }

  test("mergeInPlace reproduces a serial build bit-for-bit (bloom_multi_thread.c:64-78 property)") {
    val serial = BloomSketch.empty(5000, 0.01f)
    keys(0 until 5000).foreach(serial.add)
    // simulate 8 partitions merged in arbitrary tree order
    val parts = (0 until 8).map { p =>
      val s = BloomSketch.empty(5000, 0.01f)
      (0 until 5000).filter(_ % 8 == p).foreach(i => s.add(i.toString))
      s
    }
    val merged = parts.reduceLeft((a, b) => a.mergeInPlace(b))
    assert(merged.bits.toSeq == serial.bits.toSeq)
    assert(merged.elementsAdded == serial.elementsAdded)
    assert(merged.serialize().toSeq == serial.serialize().toSeq)
  }
}
