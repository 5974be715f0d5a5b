package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic corpus: scores with heavy ties, tokens varied
  private def corpus(n: Int): DataFrame =
    spark.range(n).select(col("id"),
      ((col("id") * 37 % 101).cast("double") / 101.0).as("score"),
      (col("id") % 50 + 1).cast("long").as("tokens"))

  // the global-sort oracle, locally
  private def oracle(rows: Seq[(Long, Double, Long)], budget: Long): Set[Long] = {
    var cum = 0L
    rows.sortBy { case (id, s, _) => (-s, id) }.flatMap { case (id, _, t) =>
      cum += t
      if (cum <= budget) Some(id) else None
    }.toSet
  }

  private def selected(df: DataFrame, budget: Long, buckets: Int = 16): Set[Long] =
    Curation.selectWithinBudget(df, "id", "score", "tokens", budget, buckets)
      .select("id").as[Long].collect().toSet

  test("matches the global (score DESC, id) greedy prefix at many budgets") {
    val df = corpus(3000).cache()
    val rows = df.as[(Long, Double, Long)].collect().toSeq
    val total = rows.map(_._3).sum
    for (budget <- Seq(0L, 1L, 57L, total / 10, total / 3, total - 1, total, total + 99)) {
      assert(selected(df, budget) == oracle(rows, budget), s"budget $budget")
    }
    df.unpersist()
  }

  test("exact under heavy score atoms (ties heavier than one bucket)") {
    // only 3 distinct scores over 2000 rows: boundary collapse forces a
    // mega-bucket; within-tie order must be by id
    val df = spark.range(2000).select(col("id"),
      (col("id") % 3).cast("double").as("score"),
      lit(7L).as("tokens"))
    val rows = df.as[(Long, Double, Long)].collect().toSeq
    for (budget <- Seq(70L, 7L * 666, 7L * 1500)) {
      assert(selected(df, budget, buckets = 8) == oracle(rows, budget), s"budget $budget")
    }
  }

  test("deterministic across partitionings and bucket counts") {
    val df = corpus(4000)
    val budget = 4000L * 10
    val a = selected(df, budget, buckets = 4)
    val b = selected(df.repartition(23), budget, buckets = 128)
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("NULL and NaN scores are never selected") {
    val df = spark.range(100).select(col("id"),
      when(col("id") % 10 === 0, lit(Double.NaN))
        .when(col("id") % 10 === 1, lit(null).cast("double"))
        .otherwise(col("id").cast("double")).as("score"),
      lit(1L).as("tokens"))
    val got = selected(df, 1000L)
    assert(got.forall(id => id % 10 >= 2))
    assert(got.size == 80) // every ranked row fits the budget
  }

  test("no unpartitioned Window at ANY budget (boundary prefix sum is distributed)") {
    val df = corpus(3000)
    val rows = df.as[(Long, Double, Long)].collect().toSeq
    val total = rows.map(_._3).sum
    for (budget <- Seq(1L, 57L, total / 10, total / 3, total - 1)) {
      val out = Curation.selectWithinBudget(df, "id", "score", "tokens", budget, 16)
      out.count() // execute so the final (AQE-resolved) plan exists
      val unpartitioned = out.queryExecution.executedPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(unpartitioned.isEmpty,
        s"budget $budget: boundary bucket must never funnel through one task")
    }
  }

  test("ties across the partition split stay exact (two-phase prefix sum)") {
    // ONE score atom over many rows with a tiny shuffle-partition count:
    // the boundary sliver IS the tie class and must split across several
    // range partitions; selection must still equal the global greedy
    // prefix (within-tie order strictly by id)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try {
      val df = spark.range(4000).select(col("id"),
        lit(1.0).as("score"), (col("id") % 13 + 1).cast("long").as("tokens"))
      val rows = df.as[(Long, Double, Long)].collect().toSeq
      val total = rows.map(_._3).sum
      for (budget <- Seq(total / 7, total / 2, total - 5)) {
        assert(selected(df, budget, buckets = 8) == oracle(rows, budget), s"budget $budget")
      }
      // and with distinct scores whose boundary bucket spans partitions
      val df2 = corpus(5000)
      val rows2 = df2.as[(Long, Double, Long)].collect().toSeq
      val total2 = rows2.map(_._3).sum
      for (budget <- Seq(total2 / 5, total2 / 2))
        assert(selected(df2, budget, buckets = 4) == oracle(rows2, budget), s"budget $budget")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("budget covering the whole corpus takes a window-free plan") {
    val df = corpus(500)
    val out = Curation.selectWithinBudget(df, "id", "score", "tokens", Long.MaxValue, 16)
    val windows = out.queryExecution.executedPlan.collect { case w: WindowExec => w }
    assert(windows.isEmpty, "full acceptance must not sort anything")
    assert(out.count() == 500)
  }

  test("per-group budgets: each group independently matches its greedy prefix") {
    val df = spark.range(3000).select(col("id"),
      (col("id") % 7).cast("string").as("g"),
      ((col("id") * 31 % 97).cast("double") / 97.0).as("score"),
      (col("id") % 40 + 1).cast("long").as("tokens"))
    val rows = df.as[(Long, String, Double, Long)].collect().toSeq
    val budget = 600L
    val want = rows.groupBy(_._2).flatMap { case (_, grp) =>
      var cum = 0L
      grp.sortBy { case (id, _, s, _) => (-s, id) }.flatMap { case (id, _, _, t) =>
        cum += t
        if (cum <= budget) Some(id) else None
      }
    }.toSet
    val got = Curation.selectWithinBudgetPerGroup(df, "g", "id", "score", "tokens", budget)
      .select("id").as[Long].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
    // schema preserved
    assert(Curation.selectWithinBudgetPerGroup(df, "g", "id", "score", "tokens", budget)
      .columns.toSeq == df.columns.toSeq)
  }

  test("fraction helper floors total * num / den exactly") {
    val df = corpus(1000).cache()
    val rows = df.as[(Long, Double, Long)].collect().toSeq
    val total = rows.map(_._3).sum
    val got = Curation.selectWithinBudgetFraction(df, "id", "score", "tokens", 2, 5)
      .select("id").as[Long].collect().toSet
    assert(got == oracle(rows, total * 2 / 5))
    df.unpersist()
  }

  test("original schema is preserved, zero budget selects nothing") {
    val df = corpus(100).withColumn("extra", concat(lit("x"), col("id")))
    val out = Curation.selectWithinBudget(df, "id", "score", "tokens", 0L)
    assert(out.columns.toSeq == df.columns.toSeq)
    assert(out.count() == 0)
    val out2 = Curation.selectWithinBudget(df, "id", "score", "tokens", 500L)
    assert(out2.columns.toSeq == df.columns.toSeq)
  }
}
