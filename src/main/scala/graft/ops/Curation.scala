package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget curation — keep the best documents whose cumulative token
  * count fits a global budget, exactly as if the corpus had been globally
  * sorted by `(score DESC, id ASC)` and the greedy prefix taken — but
  * WITHOUT the global sort.
  *
  * The straightforward plan (`sum(tokens) OVER (ORDER BY score DESC)`) is
  * a single-ordering window: Spark range-partitions on the sort key, but
  * the running sum is inherently sequential and the final ordering is a
  * full-corpus exchange. At 100 TB that is the single most expensive
  * operation a pipeline can run. This operator spends the library's KLL
  * sketch instead:
  *
  *  1. one KLL build over `score` (a few-KB blob; one column-pruned scan),
  *  2. equi-depth boundaries bucket every row MAP-SIDE
  *     ([[RangePartition.bucketColumn]] — codegen'd binary search),
  *  3. a tiny `(bucket → sum(tokens), count)` aggregate (≤ `numBuckets`
  *     rows) lets the driver find the one '''boundary bucket''' where the
  *     budget runs out,
  *  4. buckets above it are accepted by a map-only filter; only the
  *     boundary bucket — ~`1/numBuckets` of the corpus, equi-depth by
  *     construction — pays an exact prefix sum, computed DISTRIBUTED via
  *     a two-phase scheme (range-partition by the global order →
  *     per-partition subtotals to the driver → broadcast offsets →
  *     per-partition running sums): no single task ever sees more than
  *     `sliver/P` rows.
  *
  * Equivalence to the global sort is exact, not approximate: every row in
  * a higher bucket has score strictly greater than every row in a lower
  * bucket (bucket id = count of boundaries ≤ value, so equal scores always
  * share a bucket), per-bucket token sums are exact longs, and the
  * boundary bucket resolves `(score DESC, id ASC)` ties exactly as the
  * global sort would. Rows with NULL/NaN score are never selected (they
  * carry no defined rank) — route them explicitly upstream if they matter.
  */
object Curation {

  /** Rows of `df` the global greedy budget prefix keeps, in their original
    * schema. `idCol` must be unique (the deterministic tie-break);
    * `tokensCol` is cast to long; `budget` is the inclusive cumulative
    * cap (a row is kept iff the running total THROUGH it stays ≤ budget —
    * the first over-budget document is dropped, matching
    * `cum <= budget` over the sorted prefix).
    */
  def selectWithinBudget(df: DataFrame, idCol: String, scoreCol: String,
                         tokensCol: String, budget: Long,
                         numBuckets: Int = 128, kllK: Int = 400): DataFrame = {
    require(budget >= 0L, "budget must be non-negative")
    val spark = df.sparkSession
    if (budget == 0L) return df.limit(0)

    val score = col(scoreCol).cast("double")
    val toks = col(tokensCol).cast("long")
    // KLL rejects NaN by contract; unrankable rows are out of the running
    // anyway, so the boundary build sees only ranked scores
    val ranked = df.filter(score.isNotNull && !isnan(score))
    val bounds = RangePartition.boundaries(ranked, scoreCol, numBuckets, kllK)
    // NULL bucket (NaN / NULL score) drops out of every comparison below
    val bucketed = df.withColumn("__graft_cb",
      RangePartition.bucketColumn(score, bounds))

    // tiny aggregate: one row per realized bucket
    val perBucket = bucketed
      .filter(col("__graft_cb").isNotNull)
      .groupBy(col("__graft_cb")).agg(sum(toks).as("t"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(-_._1) // highest score bucket first

    // walk down: buckets that fit wholesale, then the boundary bucket
    var cum = 0L
    var boundaryBucket = -1
    var remaining = 0L
    val fullyAccepted = scala.collection.mutable.ArrayBuffer.empty[Int]
    val it = perBucket.iterator
    var done = false
    while (it.hasNext && !done) {
      val (b, t) = it.next()
      if (cum + t <= budget) { fullyAccepted += b; cum += t }
      else { boundaryBucket = b; remaining = budget - cum; done = true }
    }

    val acceptedSet = fullyAccepted.toSet
    val accepted =
      if (acceptedSet.isEmpty) bucketed.limit(0)
      else bucketed.filter(col("__graft_cb").isInCollection(acceptedSet))

    val out =
      if (boundaryBucket < 0) accepted
      else {
        // Exact prefix sum over the single equi-depth sliver only —
        // DISTRIBUTED (guide §2.5): the former `Window.orderBy` with no
        // partitionBy funneled the whole sliver (~1/numBuckets of the
        // corpus, ~1 TB at the 100-TB design point) through ONE task.
        // Two-phase instead: range-partition the sliver by the global
        // order, per-partition token subtotals to the driver (≤ P rows),
        // broadcast the cumulative offsets back as a map literal, and a
        // per-partition running sum completes the exact global prefix
        // sum. Every partition works in parallel; ties across a
        // partition split stay exact because the range partitioner
        // splits on the same (score DESC, id ASC) total order the
        // running sum uses.
        val P = math.max(1, spark.sessionState.conf.numShufflePartitions)
        // persisted so the subtotal pass and the running-sum pass share
        // one computation of the sliver (bounded: the sliver is one
        // equi-depth bucket; MEMORY_AND_DISK spills rather than evicts).
        // Lifetime follows the library's Store.Cache convention (see
        // graft.ops.Dedup): blocks live until session end or
        // `clearCache()` — callers running MANY budget selections in one
        // session should clear between them. Recompute-safe:
        // repartitionByRange samples deterministically, so
        // spark_partition_id is stable for a given input.
        val sliver = bucketed.filter(col("__graft_cb") === boundaryBucket)
          .repartitionByRange(P, score.desc, col(idCol).asc)
          .withColumn("__graft_pid", spark_partition_id())
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val subTotals = sliver.groupBy(col("__graft_pid")).agg(sum(toks).as("__t"))
          .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
        var running = 0L
        val offsets: Map[Int, Long] = subTotals.map { case (pid, t) =>
          val o = pid -> running; running += t; o
        }.toMap
        // every pid of the persisted sliver appears in `offsets` by
        // construction (the subtotals were computed from the SAME cached
        // data the window pass reads), so the lookup cannot miss; under
        // Spark's default ANSI mode a structurally-impossible miss would
        // fail loudly rather than silently corrupt the prefix sum
        val offset =
          if (offsets.isEmpty) lit(0L)
          else element_at(typedLit(offsets), col("__graft_pid"))
        val w = Window.partitionBy(col("__graft_pid"))
          .orderBy(score.desc, col(idCol).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val kept = sliver
          .withColumn("__graft_cum", sum(toks).over(w) + offset)
          .filter(col("__graft_cum") <= remaining)
          .drop("__graft_cum", "__graft_pid")
        accepted.unionByName(kept)
      }
    out.drop("__graft_cb")
  }

  /** Per-group budgets: within EACH group (language, source, domain
    * tier), keep the `(score DESC, id ASC)` greedy prefix under
    * `budgetPerGroup` tokens — "2B tokens per language" curation.
    *
    * Plan shape differs from the global variant on purpose: a window
    * partitioned by the group column distributes groups across tasks, so
    * the prefix sums run fully parallel with NO driver step and no KLL
    * pass — the right plan while every single group fits a task. A group
    * so large it dominates the corpus degenerates to the global problem:
    * run [[selectWithinBudget]] on that group's slice instead (same
    * selection, boundary-bucket plan). NULL/NaN scores are excluded, as
    * in the global variant.
    */
  def selectWithinBudgetPerGroup(df: DataFrame, groupCol: String, idCol: String,
                                 scoreCol: String, tokensCol: String,
                                 budgetPerGroup: Long): DataFrame = {
    require(budgetPerGroup >= 0L, "budget must be non-negative")
    val score = col(scoreCol).cast("double")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(score.desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(score.isNotNull && !isnan(score))
      .withColumn("__graft_cum", sum(col(tokensCol).cast("long")).over(w))
      .filter(col("__graft_cum") <= budgetPerGroup)
      .drop("__graft_cum")
  }

  /** [[selectWithinBudget]] with the budget given as a fraction of the
    * corpus total (integer floor of `total * num / den` — exact long
    * arithmetic, engine-portable). One extra tiny aggregate for the total.
    */
  def selectWithinBudgetFraction(df: DataFrame, idCol: String, scoreCol: String,
                                 tokensCol: String, num: Long, den: Long,
                                 numBuckets: Int = 128, kllK: Int = 400): DataFrame = {
    require(den > 0 && num >= 0, "fraction must be non-negative")
    val total = df.agg(sum(col(tokensCol).cast("long"))).head.getLong(0)
    val budget = (BigInt(total) * num / den).toLong // overflow-safe; driver-side once
    selectWithinBudget(df, idCol, scoreCol, tokensCol, budget, numBuckets, kllK)
  }
}
