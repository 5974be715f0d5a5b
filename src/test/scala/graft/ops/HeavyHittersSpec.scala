package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exact heavy hitters: equals plain GROUP BY/HAVING, CMS filter only prunes") {
    // 2 heavy keys (10% and 5%) over ~2000 light keys, 40k rows
    val rows = (0 until 40000).map { i =>
      if (i % 10 == 0) "hot-a"
      else if (i % 20 == 1) "hot-b"
      else s"light-${i % 2000}"
    }
    val df = rows.toDF("key")
    val got = HeavyHitters.exact(df, "key", 0.03, 1e-3, 0.01)
      .as[(String, Long)].collect().toMap
    val thresh = math.ceil(0.03 * 40000).toLong
    val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= thresh).toMap
    assert(got == want)
    assert(got.keySet == Set("hot-a", "hot-b"))
    // exact counts, not estimates
    assert(got("hot-a") == 4000L && got("hot-b") == 2000L)
  }

  test("exactMaterialized: same rows as exact, broadcast destroyed eagerly") {
    val rows = (0 until 20000).map { i =>
      if (i % 10 == 0) "hot-a" else s"light-${i % 1000}"
    }
    val df = rows.toDF("key")
    val want = HeavyHitters.exact(df, "key", 0.05, 1e-3, 0.01)
      .as[(String, Long)].collect().toMap
    val got = HeavyHitters.exactMaterialized(df, "key", 0.05, 1e-3, 0.01)
    assert(got.as[(String, Long)].collect().toMap == want)
    assert(got.schema.fieldNames.toSeq == Seq("key", "cnt"))
    // the result is a local relation — re-collectable after the
    // broadcast is gone
    assert(got.count() == want.size)
  }

  test("exact: the CMS blob rides a broadcast handle, never a plan literal") {
    // range-based input: a LocalRelation would eagerly collapse the
    // probe filter before the plan could be inspected
    val df = spark.range(20000).select(
      when(col("id") % 8 === 0, lit("hot"))
        .otherwise(concat(lit("l"), col("id") % 500)).as("key"))
    // production-sized sketch: eps=1e-4 serializes to ~1 MB
    val plan = HeavyHitters.exact(df, "key", 0.05, 1e-4, 0.01)
      .queryExecution.optimizedPlan
    val probes = plan.collect { case p => p }.flatMap(_.expressions)
      .flatMap(_.collect { case e: graft.expr.CmsQueryBroadcast => e })
    assert(probes.nonEmpty, "probe must be a CmsQueryBroadcast expression")
    // no megabyte binary literal anywhere in the probing plan
    val bigLits = plan.collect { case p => p }.flatMap(_.expressions)
      .flatMap(_.collect {
        case l: org.apache.spark.sql.catalyst.expressions.Literal
          if l.value.isInstanceOf[Array[Byte]] &&
            l.value.asInstanceOf[Array[Byte]].length > 64 * 1024 => l
      })
    assert(bigLits.isEmpty, s"plan still embeds ${bigLits.size} large blob literal(s)")
    // and the result is still the exact GROUP BY/HAVING answer
    val got = HeavyHitters.exact(df, "key", 0.05, 1e-4, 0.01)
      .as[(String, Long)].collect().toMap
    assert(got == Map("hot" -> 2500L))
  }

  test("no heavy hitters -> empty result, not an error") {
    val df = (0 until 5000).map(i => s"k${i % 1000}").toDF("key")
    assert(HeavyHitters.exact(df, "key", 0.01, 1e-3, 0.01).count() == 0)
  }

  test("approx (Misra-Gries, one scan): includes every true heavy, brackets exact") {
    val rows = (0 until 40000).map { i =>
      if (i % 10 == 0) "hot-a"
      else if (i % 20 == 1) "hot-b"
      else s"light-${i % 2000}"
    }
    val df = rows.toDF("key").repartition(16)
    val got = HeavyHitters.approx(df, "key", 0.03, k = 64)
      .as[(String, Long, Long)].collect()
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val heavy = exact.filter(_._2 >= 0.03 * 40000).keySet
    assert(heavy.subsetOf(got.map(_._1).toSet)) // no heavy key missed
    got.foreach { case (k, lo, hi) =>
      val t = exact(k)
      assert(lo <= t && t <= hi, s"$k: true $t outside [$lo,$hi]")
      assert(hi - lo <= 40000 / 65, "delta over the published bound")
    }
    // one scan: unlike exact(), a nondeterministic source is acceptable
    val nd = spark.range(40000).select(concat(lit("k"), (rand(7) * 5).cast("int")).as("key"))
    assert(HeavyHitters.approx(nd, "key", 0.05, 64).count() >= 5)
    // k too small for the phi guarantee is refused
    intercept[IllegalArgumentException] { HeavyHitters.approx(df, "key", 0.001, 64) }
  }

  test("nondeterministic input is refused (double-scan superset guarantee)") {
    // rand()-derived key: the CMS build and the exact count would see
    // DIFFERENT row sets — the operator must refuse, not silently lie.
    // Range base: a LocalRelation would eagerly collapse the projection.
    val nd = spark.range(1000).select(concat(lit("k"), (rand(7) * 10).cast("int")).as("key"))
    val ex = intercept[IllegalArgumentException] {
      HeavyHitters.exact(nd, "key", 0.05)
    }
    assert(ex.getMessage.contains("deterministic"))
    // the documented remedy — materialize first — is accepted (a FRESH
    // derivation: nd's own memoized queryExecution predates the cache)
    val mat = nd.cache()
    try {
      mat.count() // pin the row set
      assert(HeavyHitters.exact(mat.select($"key"), "key", 0.01).count() >= 1)
    } finally mat.unpersist()
  }
}
