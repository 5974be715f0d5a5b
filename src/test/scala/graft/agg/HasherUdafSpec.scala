package graft.agg

import graft.SparkTestSession
import graft.core._
import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `set_hash_function` through the UDAF/SQL surface (reference
  * `bloom.c:89-91`; hash identity in merge compat, `bloom.c:419`): a
  * custom family flows from the aggregate through shuffled partial
  * buffers (via the hasher tag) to the emitted blob, probes re-install
  * the family on deserialize, and cross-family merges throw.
  */
class HasherUdafSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def keys = (0 until 5000).map(i => s"key-$i")

  test("bloom_sketch with poly31 hasher: different bits than FNV, zero false negatives end to end") {
    val df = keys.toDF("k").repartition(7) // force shuffled partial buffers
    val custom = df.agg(bloom_sketch(col("k"), 10000L, 0.01f, Poly31BloomHasher))
      .head.getAs[Array[Byte]](0)
    val default = df.agg(bloom_sketch(col("k"), 10000L, 0.01f))
      .head.getAs[Array[Byte]](0)

    // tagged blob: longer than the C-format blob, deserialize restores family
    assert(custom.length > default.length)
    val restored = BloomSketch.deserialize(custom)
    assert(restored.hasher.id == Poly31BloomHasher.id)
    val bitsLen = default.length - 20
    assert(!java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(custom, 0, bitsLen),
      java.util.Arrays.copyOfRange(default, 0, bitsLen)),
      "different hash families must set different bits")

    // probing the tagged blob through the expression uses the custom family
    val fn = df.filter(!bloom_might_contain(lit(custom), col("k"))).count()
    assert(fn == 0, s"false negatives under custom hasher: $fn")
    // FPR sane under the custom family too
    val fp = (10000 until 20000).map(i => s"other-$i").toDF("k")
      .filter(bloom_might_contain(lit(custom), col("k"))).count()
    assert(fp <= 200, s"fp=$fp")
  }

  test("SQL surface: bloom_sketch(col, n, p, 'poly31-mix64')") {
    keys.toDF("k").createOrReplaceTempView("hasher_keys")
    val blob = spark.sql(
      "SELECT bloom_sketch(k, 10000, 0.01, 'poly31-mix64') FROM hasher_keys")
      .head.getAs[Array[Byte]](0)
    assert(BloomSketch.deserialize(blob).hasher.id == "poly31-mix64")
    assertThrows[IllegalArgumentException](
      spark.sql("SELECT bloom_sketch(k, 10000, 0.01, 'no-such-family') FROM hasher_keys").head)
  }

  test("cross-family merge throws; tagged serde round-trips; unknown tag is loud") {
    val a = BloomSketch.empty(1000, 0.01f, Poly31BloomHasher)
    val b = BloomSketch.empty(1000, 0.01f)
    a.add("x"); b.add("x")
    assertThrows[IllegalArgumentException](a.mergeInPlace(b))

    val rt = BloomSketch.deserialize(a.serialize())
    assert(rt.hasher.id == Poly31BloomHasher.id)
    assert(rt.contains("x") && java.util.Arrays.equals(rt.serialize(), a.serialize()))

    // default-hasher blob stays exactly the C format (no tag)
    assert(b.serialize().length == b.bloomLength + 20)

    // a tag naming an unregistered family fails loudly, never silently FNV
    object Weird extends BloomHasher {
      val id = "unregistered-family"
      def hashes(key: Array[Byte], k: Int): Array[Long] = Fnv.hashes(key, k)
    }
    val w = BloomSketch.empty(100, 0.01f, Weird)
    w.add("y")
    assertThrows[IllegalArgumentException](BloomSketch.deserialize(w.serialize()))
  }
}
