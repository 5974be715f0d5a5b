package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The auto-injected runtime Bloom pre-filter rule: rewrites qualifying
  * joins, never changes results, and is idempotent/gated.
  */
class RuntimeBloomJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withRule[A](confs: (String, String)*)(f: => A): A = {
    val rule = RuntimeBloomJoin(spark)
    spark.experimental.extraOptimizations = spark.experimental.extraOptimizations :+ rule
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
      confs.foreach { case (k, _) => spark.conf.unset(k) }
    }
  }

  private def probe: DataFrame =
    (0 until 20000).map(i => (i.toLong, s"v$i")).toDF("k", "payload")
  private def build: DataFrame =
    (0 until 500).map(i => (i.toLong * 7, i)).toDF("bk", "extra")

  private def optimizedString(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("qualifying inner equi-join gets the bloom pre-filter; results unchanged") {
    val plain = probe.join(build, $"k" === $"bk").agg(count(lit(1)), sum($"k")).collect()
    withRule("spark.graft.runtimeBloomJoin.enabled" -> "true") {
      val df = probe.join(build, $"k" === $"bk")
      val plan = optimizedString(df)
      assert(plan.contains("bloom_might_contain"), s"no rewrite in:\n$plan")
      assert(plan.contains(RuntimeBloomJoin.MarkerAlias))
      assert(df.agg(count(lit(1)), sum($"k")).collect().toSeq == plain.toSeq)
      // the filter prunes: fewer rows reach the join than the probe has
      assert(df.count() == 500) // every build key 0,7,..,3493 < 20000 exists in probe
    }
  }

  test("left-semi join qualifies; idempotent under the fixpoint batch") {
    withRule("spark.graft.runtimeBloomJoin.enabled" -> "true") {
      val df = probe.join(build.select($"bk".as("k")), Seq("k"), "left_semi")
      val plan = optimizedString(df)
      // fixpoint batch re-applies the rule; the marker must keep it at ONE filter
      assert(plan.split("bloom_might_contain").length - 1 == 1,
        s"rewrite not idempotent:\n$plan")
      assert(df.count() == 500)
    }
  }

  test("gating: disabled, oversized build side, or non-equi join -> no rewrite") {
    // disabled (default)
    val rule = RuntimeBloomJoin(spark)
    spark.experimental.extraOptimizations = spark.experimental.extraOptimizations :+ rule
    try {
      assert(!optimizedString(probe.join(build, $"k" === $"bk")).contains("bloom_might_contain"))
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq rule)

    // enabled but build side over the byte ceiling
    withRule("spark.graft.runtimeBloomJoin.enabled" -> "true",
      "spark.graft.runtimeBloomJoin.maxBuildBytes" -> "1") {
      assert(!optimizedString(probe.join(build, $"k" === $"bk")).contains("bloom_might_contain"))
    }

    // enabled but non-equi condition
    withRule("spark.graft.runtimeBloomJoin.enabled" -> "true") {
      val df = probe.join(build, $"k" < $"bk")
      assert(!optimizedString(df).contains("bloom_might_contain"))
    }

    // probe side not sufficiently larger than build side -> no rewrite
    withRule("spark.graft.runtimeBloomJoin.enabled" -> "true",
      "spark.graft.runtimeBloomJoin.minSizeRatio" -> "1000000") {
      assert(!optimizedString(probe.join(build, $"k" === $"bk")).contains("bloom_might_contain"))
    }

    // nondeterministic build side -> no rewrite (it would execute twice
    // with different rows; the filter could drop genuine matches).
    // Range base: a LocalRelation would eagerly evaluate the filter away
    // before our rule ever saw it.
    withRule("spark.graft.runtimeBloomJoin.enabled" -> "true") {
      val nd = spark.range(500).select(($"id" * 7).as("bk"))
        .filter(rand(42) < 0.999999)
      assert(!optimizedString(probe.join(nd, $"k" === $"bk")).contains("bloom_might_contain"))
      // same shape WITHOUT the nondeterministic filter does rewrite
      val det = spark.range(500).select(($"id" * 7).as("bk"))
      assert(optimizedString(probe.join(det, $"k" === $"bk")).contains("bloom_might_contain"))
    }
  }

  test("mirrored orientation: small LEFT build side pre-filters the right (Inner only)") {
    // build (small) on the LEFT, probe (large) on the RIGHT — without the
    // mirror this orientation never rewrites
    val plain = build.join(probe, $"bk" === $"k").agg(count(lit(1)), sum($"k")).collect()
    withRule("spark.graft.runtimeBloomJoin.enabled" -> "true") {
      val df = build.join(probe, $"bk" === $"k")
      val plan = optimizedString(df)
      assert(plan.contains("bloom_might_contain"), s"mirror did not fire:\n$plan")
      // idempotent under the fixpoint batch: exactly one probe
      assert(plan.split("bloom_might_contain").length - 1 == 1, s"not idempotent:\n$plan")
      assert(df.agg(count(lit(1)), sum($"k")).collect().toSeq == plain.toSeq)
      assert(df.count() == 500)
    }
    // LeftSemi must NOT mirror (the left side is the output side): small
    // left + large right semi-join stays unrewritten
    withRule("spark.graft.runtimeBloomJoin.enabled" -> "true") {
      val df = build.select($"bk".as("k")).join(probe.select($"k"), Seq("k"), "left_semi")
      assert(!optimizedString(df).contains("bloom_might_contain"))
      assert(df.count() == 500)
    }
  }

  test("join chain: EACH eligible join gets its own filter (markers are per-key)") {
    withRule("spark.graft.runtimeBloomJoin.enabled" -> "true") {
      val fact = (0 until 20000).map(i => (i.toLong, (i % 700).toLong)).toDF("k1", "k2")
      val dim1 = (0 until 500).map(i => i.toLong * 7).toDF("d1")
      val dim2 = (0 until 100).map(i => i.toLong * 3).toDF("d2")
      val df = fact.join(dim1, $"k1" === $"d1").join(dim2, $"k2" === $"d2")
      val plan = optimizedString(df)
      val probes = plan.split("bloom_might_contain").length - 1
      assert(probes == 2, s"expected a probe per join, got $probes:\n$plan")
      // results still exact
      val expect = fact.collect().count { case org.apache.spark.sql.Row(k1: Long, k2: Long) =>
        k1 % 7 == 0 && k1 / 7 < 500 && k2 % 3 == 0 && k2 / 3 < 100
      }
      assert(df.count() == expect)
    }
  }

  test("serializedSize equals serialize().length for tagged custom-hasher blobs") {
    val s = graft.core.BloomSketch.empty(1000, 0.01f, graft.core.Poly31BloomHasher)
    s.add("x")
    assert(s.serializedSize == s.serialize().length)
    val d = graft.core.BloomSketch.empty(1000, 0.01f)
    d.add("x")
    assert(d.serializedSize == d.serialize().length) // C format untouched
  }

  test("saturation guard: overfull filter short-circuits to pass-through, exact results") {
    import graft.expr.BloomMightContain
    import org.apache.spark.sql.GraftSqlBridge
    // a filter sized for 100 keys fed 20k: bits_set/m ≈ 1, FPR ≈ 1 —
    // probing it is pure overhead with no pruning
    val f = graft.core.BloomSketch.empty(100, 0.01f)
    (0 until 20000).foreach(i => f.add(s"k$i"))
    assert(f.countSetBits.toDouble / f.numberBits > 0.9, "test premise: saturated")
    val blob = f.serialize()
    val keys = spark.range(1000).select(concat(lit("absent-"), $"id").as("u"))
    val before = BloomMightContain.saturationEngaged.get()
    // guard armed (as the rule arms it): every row passes without probing
    val armed = keys.filter(GraftSqlBridge.column(
      BloomMightContain(GraftSqlBridge.expression(lit(blob)),
        GraftSqlBridge.expression($"u"), 0.7)))
    assert(armed.count() == 1000)
    assert(BloomMightContain.saturationEngaged.get() > before,
      "guard did not engage on a saturated blob")

    // end-to-end through the rule with absent/undersized stats: capacity
    // falls back to estimatedKeys=64, the build side has 20k distinct keys
    // -> the injected filter saturates, the guard neutralizes it, and the
    // join answer stays exact
    withRule("spark.graft.runtimeBloomJoin.enabled" -> "true",
      "spark.graft.runtimeBloomJoin.estimatedKeys" -> "64",
      "spark.graft.runtimeBloomJoin.maxBuildBytes" -> (256L << 20).toString,
      "spark.graft.runtimeBloomJoin.minSizeRatio" -> "0") {
      val bigProbe = (0 until 30000).map(i => (i.toLong, i)).toDF("k", "x")
      val bigBuild = (0 until 20000).map(i => i.toLong).toDF("bk")
      val df = bigProbe.join(bigBuild, $"k" === $"bk")
      assert(optimizedString(df).contains("bloom_might_contain"))
      assert(df.count() == 20000)
    }
  }

  test("build-side distinct-count stats size the filter when available") {
    // range gives the optimizer a rowCount; the capacity must then come
    // from stats, not the (tiny) estimatedKeys fallback — so the filter
    // is NOT saturated and really prunes
    withRule("spark.graft.runtimeBloomJoin.enabled" -> "true",
      "spark.graft.runtimeBloomJoin.estimatedKeys" -> "64",
      "spark.graft.runtimeBloomJoin.minSizeRatio" -> "0") {
      val p = (0 until 30000).map(i => (i.toLong, i)).toDF("k", "x")
      val b = spark.range(5000).select(($"id" * 2).as("bk"))
      val df = p.join(b, $"k" === $"bk")
      assert(optimizedString(df).contains("bloom_might_contain"))
      assert(df.count() == 5000)
    }
  }

  test("compound key: the rule blooms the most-distinct conjunct, not the first") {
    // first conjunct is a 2-value column — blooming it passes ~half the
    // probe side no matter what; the rule must rank conjuncts by
    // build-side distinct count and pick the selective one. CBO on so
    // Project propagates the Range id's column stats through the alias.
    // default minSizeRatio: the 30000-row probe vs 2500-row build fires
    // the preferred orientation only (the mirror stays size-ineligible,
    // so exactly ONE conjunct gets bloomed and the assertion is clean)
    withRule("spark.graft.runtimeBloomJoin.enabled" -> "true",
      "spark.sql.cbo.enabled" -> "true") {
      val p = (0 until 30000).map(i => (i.toLong % 2, i.toLong)).toDF("plo", "phi")
      // bhi: bare alias of range id -> distinctCount 2500 propagates;
      // blo: derived 2-value column, no stats -> ranks below any counted key
      val b = spark.range(2500).select(($"id" % 2).as("blo"), $"id".as("bhi"))
      val df = p.join(b, $"plo" === $"blo" && $"phi" === $"bhi")
      val plan = optimizedString(df)
      assert(plan.contains("bloom_might_contain"), s"no rewrite:\n$plan")
      assert(plan.contains("cast(phi"), s"did not bloom the selective conjunct:\n$plan")
      assert(!plan.contains("cast(plo"), s"bloomed the 2-value conjunct:\n$plan")
      // results exact: join matches are phi in 0..2499 with matching parity
      assert(df.count() == 2500)
    }
  }

  test("rewritten join answers a string-key query identically (cast path)") {
    val p = (0 until 5000).map(i => (s"url-$i", i)).toDF("u", "x")
    val b = (0 until 100).map(i => s"url-${i * 31}").toDF("u")
    val plain = p.join(b, Seq("u"), "left_semi").orderBy($"u").collect().toSeq
    withRule("spark.graft.runtimeBloomJoin.enabled" -> "true") {
      val df = p.join(b, Seq("u"), "left_semi")
      assert(optimizedString(df).contains("bloom_might_contain"))
      assert(df.orderBy($"u").collect().toSeq == plain)
    }
  }
}
