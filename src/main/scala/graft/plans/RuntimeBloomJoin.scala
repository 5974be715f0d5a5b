package graft.plans

import graft.agg.BloomSketchAgg
import graft.expr.BloomMightContain
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Auto-injected runtime Bloom pre-filter for selective joins — the
  * optimizer-`Rule` surface of the Bloom-semi-join pattern (q02), using
  * this library's reference-semantics filter. Spark's own
  * `InjectRuntimeFilter` is the design precedent; this rule exists so the
  * graft sketch (FNV-1a family, reference geometry, export-compatible
  * blob) is the one doing the filtering, and as the SURVEY §4.3 stretch
  * deliverable (custom `Rule[LogicalPlan]` via `SparkSessionExtensions`).
  *
  * Rewrite: for an Inner/LeftSemi equi-join whose build (right) side is
  * small and whose probe (left) side is ≥ `minSizeRatio` × larger,
  *
  * {{{ Join(L, R, k_L = k_R)  ⇒  Join(Filter(bloom_might_contain(<scalar-subquery: agg bloom_sketch(k_R) over R>, k_L), L), R, …) }}}
  *
  * Semantics are unchanged: the Bloom probe has zero false negatives, so
  * the filter only removes L rows that cannot join; false positives pass
  * through to the exact join. The build side runs as a scalar subquery
  * (planned, optimized and column-pruned independently — only the key
  * column is scanned); the blob is evaluated once and probed row-parallel
  * inside whole-stage codegen.
  *
  * Off by default (`spark.graft.runtimeBloomJoin.enabled`); sizing knobs:
  * `.maxBuildBytes` (build-side stats ceiling, default 64 MB),
  * `.minSizeRatio` (probe/build size ratio floor, default 3),
  * `.estimatedKeys` (filter capacity when row-count stats are absent,
  * default 1M), `.fpp` (default 0.01).
  *
  * Deployment: `spark.sql.extensions=graft.GraftExtensions` (injected
  * pre-CBO, runs once) or
  * `spark.experimental.extraOptimizations ++= Seq(RuntimeBloomJoin(spark))`
  * (fixpoint batch — the structural marker check makes the rewrite
  * idempotent there).
  */
case class RuntimeBloomJoin(spark: SparkSession) extends Rule[LogicalPlan] {

  private def flag(k: String, dflt: String): String =
    conf.getConfString(s"spark.graft.runtimeBloomJoin.$k", dflt)

  private def enabled = flag("enabled", "false").toBoolean
  private def maxBuildBytes = flag("maxBuildBytes", (64L << 20).toString).toLong
  private def minSizeRatio = flag("minSizeRatio", "3").toDouble
  private def estimatedKeys = flag("estimatedKeys", "1000000").toLong
  private def fpp = flag("fpp", "0.01").toFloat
  private def saturationThreshold = flag("saturationThreshold", "0.7").toDouble

  // key types whose string form is injective on equal values (safe to
  // bloom on CAST(key AS STRING) for keys the analyzer already coerced
  // to a common type)
  private def supportedKeyType(t: DataType): Boolean = t match {
    case StringType | LongType | IntegerType | ShortType | ByteType | DateType => true
    case _ => false
  }

  /** All left↔right equi-pairs from the join condition's conjuncts, in
    * condition order.
    */
  private def findEquiKeys(cond: Expression, left: LogicalPlan, right: LogicalPlan): Seq[(Expression, Expression)] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    conjuncts(cond).collect {
      case EqualTo(a, b)
          if a.deterministic && b.deterministic && supportedKeyType(a.dataType) &&
            a.references.nonEmpty && a.references.subsetOf(left.outputSet) &&
            b.references.nonEmpty && b.references.subsetOf(right.outputSet) => (a, b)
      case EqualTo(b, a)
          if a.deterministic && b.deterministic && supportedKeyType(a.dataType) &&
            a.references.nonEmpty && a.references.subsetOf(left.outputSet) &&
            b.references.nonEmpty && b.references.subsetOf(right.outputSet) => (a, b)
    }
  }

  /** Distinct-count stat of `key` on `plan` (bare attributes with CBO
    * column stats only).
    */
  private def distinctOf(plan: LogicalPlan, key: Expression): Option[Long] = key match {
    case a: Attribute =>
      plan.stats.attributeStats.collectFirst {
        case (attr, s) if attr.semanticEquals(a) => s.distinctCount
      }.flatten.map(_.toLong)
    case _ => None
  }

  /** The conjunct whose BUILD-side key carries the highest distinct
    * count — the filter's whole selectivity lives in that choice: on a
    * compound key `a.x = b.x AND a.y = b.y`, blooming the 2-value `x`
    * passes ~half the probe side no matter how selective `y` is.
    * Stats-less keys rank below any counted key; ties and the no-stats
    * case keep condition order (`maxBy` keeps the first maximum).
    */
  private def strongest(pairs: Seq[(Expression, Expression)],
                        buildPlan: LogicalPlan,
                        buildKey: ((Expression, Expression)) => Expression): (Expression, Expression) =
    pairs.maxBy(p => distinctOf(buildPlan, buildKey(p)).getOrElse(-1L))

  /** Structural idempotence marker: an injected filter carries a
    * `BloomMightContain` over a `ScalarSubquery` whose root aggregate is
    * aliased [[RuntimeBloomJoin.MarkerAlias]]. The check is scoped to THIS
    * join's probe key and only looks through the Filter/Project spine at
    * the top of `left` — a marker belonging to a lower join in a join
    * chain (a different key) must NOT suppress this join's rewrite, but a
    * fixpoint re-run over an already-rewritten join must.
    */
  private def alreadyInjected(left: LogicalPlan, lk: Expression): Boolean = {
    val expectedKey = Cast(lk, StringType)
    def isOurProbe(c: Expression): Boolean = c.exists {
      case BloomMightContain(s: ScalarSubquery, probeKey, _) => (s.plan match {
        case agg: Aggregate => agg.aggregateExpressions.exists {
          case a: Alias => a.name == RuntimeBloomJoin.MarkerAlias
          case _ => false
        }
        case _ => false
      }) && probeKey.semanticEquals(expectedKey)
      case _ => false
    }
    def spine(p: LogicalPlan): Boolean = p match {
      case Filter(c, child) => isOurProbe(c) || spine(child)
      case Project(_, child) => spine(child)
      case _ => false
    }
    spine(left)
  }

  /** Can `build` feed a runtime filter applied to `probe`? The build side
    * executes TWICE (subquery + join input): a nondeterministic build
    * (rand(), sample without seed) would build the filter from a DIFFERENT
    * row set than the join sees — false negatives, wrong results. Refuse
    * the rewrite outright.
    */
  private def eligible(probe: LogicalPlan, build: LogicalPlan): Boolean = {
    def planDeterministic(p: LogicalPlan): Boolean =
      p.find(n => n.expressions.exists(!_.deterministic)).isEmpty
    val bs = build.stats.sizeInBytes
    val ps = probe.stats.sizeInBytes
    bs <= maxBuildBytes && BigDecimal(ps) >= BigDecimal(bs) * minSizeRatio &&
      planDeterministic(build)
  }

  /** The injected probe predicate: a scalar-subquery Bloom build over
    * `build(buildKey)`, probed against `probeKey`. Capacity, best stat
    * first: the key's distinct count (what a Bloom filter actually holds)
    * > build row count > the configured fallback. Undersizing is no
    * longer silent either way — the probe's fill-ratio guard disables a
    * saturated filter at runtime instead of paying FPR→1 probe overhead.
    */
  private def probePredicate(build: LogicalPlan, buildKey: Expression,
                             probeKey: Expression): Expression = {
    val distinctKeys = buildKey match {
      case a: Attribute =>
        build.stats.attributeStats.collectFirst {
          case (attr, s) if attr.semanticEquals(a) => s.distinctCount
        }.flatten.map(_.toLong)
      case _ => None
    }
    // No row stats? Bound rows by sizeInBytes/8 (a serialized build row
    // is never under 8 bytes, so this OVER-estimates rows — the safe
    // direction), capped at the configured fallback. This right-sizes the
    // blob the scalar subquery materializes into every task binary: the
    // blind 1M-key fallback is a ~1.2 MB blob ("Broadcasting large task
    // binary") even when the build side holds a few thousand rows.
    val sizeBound = {
      val s = build.stats.sizeInBytes / 8
      if (s.isValidLong) math.min(estimatedKeys, s.toLong) else estimatedKeys
    }
    val n = distinctKeys.orElse(build.stats.rowCount.map(_.toLong))
      .getOrElse(sizeBound).max(1024L)
    val agg = Aggregate(Nil,
      Seq(Alias(BloomSketchAgg(Cast(buildKey, StringType), n, fpp).toAggregateExpression(),
        RuntimeBloomJoin.MarkerAlias)()),
      build)
    BloomMightContain(ScalarSubquery(agg), Cast(probeKey, StringType),
      saturationThreshold)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(left, right, jt, Some(cond), _) if jt == Inner || jt == LeftSemi =>
        val pairs = findEquiKeys(cond, left, right)
        if (pairs.isEmpty) j // no usable equi-key
        else {
          // Preferred orientation: build on the right (works for both
          // Inner and LeftSemi). MIRROR for Inner only: an inner join
          // is symmetric, so a small deterministic LEFT side can just
          // as well pre-filter a large right side — without the mirror
          // a selective left build never triggers the rule. The two
          // orientations are mutually exclusive by the size ratio
          // (p >= ratio·b cannot hold both ways for ratio > 1). Each
          // orientation picks ITS OWN strongest conjunct — the build
          // side differs, so the most-distinct key can too.
          val (lkR, rkR) = strongest(pairs, right, _._2)
          if (eligible(left, right) && !alreadyInjected(left, lkR))
            j.copy(left = Filter(probePredicate(right, rkR, lkR), left))
          else if (jt == Inner) {
            val (lkL, rkL) = strongest(pairs, left, _._1)
            if (eligible(right, left) && !alreadyInjected(right, rkL))
              j.copy(right = Filter(probePredicate(left, lkL, rkL), right))
            else j
          } else j
        }
    }
}

object RuntimeBloomJoin {
  /** Alias of the injected build aggregate — the idempotence marker. */
  val MarkerAlias = "graft_runtime_bloom"
}
