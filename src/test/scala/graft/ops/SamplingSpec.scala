package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exampleRows: k full rows, deterministic across partitionings") {
    val df = spark.range(5000).select(
      col("id"), concat(lit("body-"), col("id")).as("text"))
    val a = Sampling.exampleRows(df, "id", 50)
    assert(a.count() == 50)
    assert(a.columns.toSeq == Seq("id", "text")) // full original schema
    // by-id sample: the sampled id always brings its whole row
    a.collect().foreach(r => assert(r.getString(1) == s"body-${r.getLong(0)}"))
    val b = Sampling.exampleRows(df.repartition(17), "id", 50)
    assert(a.select("id").as[Long].collect().sorted.toSeq ==
      b.select("id").as[Long].collect().sorted.toSeq)
  }

  test("exampleRows per group: ~k per group; duplicate ids return all their rows") {
    val df = spark.range(3000).select(
      (col("id") % 3).cast("string").as("g"), (col("id") % 600).as("id"))
    // every id appears 5 times (dup rows); sample by id per group
    val got = Sampling.exampleRows(df, "id", 10, Some("g"))
    val perGroup = got.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 10 ids per group x 5 duplicate rows each
    assert(perGroup.values.forall(_ == 50), perGroup.toString)
    assert(perGroup.keySet == Set("0", "1", "2"))
  }

  test("exampleRows per group: an id spanning groups only returns where sampled") {
    // OVERLAPPING per-group id domains: group a holds ids 0..39, group b
    // ids 20..59 — ids 20..39 exist in BOTH groups. The contract is that
    // an id sampled for one group must NOT drag its rows out of the other
    // group (the sample is a per-(group, id) decision).
    val aIds = (0L until 40L).toSeq
    val bIds = (20L until 60L).toSeq
    val df = (aIds.map(("a", _)) ++ bIds.map(("b", _))).toDF("g", "id")
    // expected per-group sample straight from the core sampler
    def bottom(ids: Seq[Long], k: Int): Set[Long] = // unsigned-priority order
      ids.sortBy(i => (graft.core.BkSample.testPriority(i.toString) ^ Long.MinValue, i))
        .take(k).toSet
    val expected = bottom(aIds, 5).map(("a", _)) ++ bottom(bIds, 5).map(("b", _))
    // the generator must actually arm the trap: some id sampled in exactly
    // one group while present in both (otherwise this test proves nothing)
    val aOnly = bottom(aIds, 5) -- bottom(bIds, 5)
    val bOnly = bottom(bIds, 5) -- bottom(aIds, 5)
    assert((aOnly.exists(_ >= 20) || bOnly.exists(_ < 40)),
      "test generator ineffective: no cross-group id is single-sampled")
    val got = Sampling.exampleRows(df, "id", 5, Some("g")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected, s"got $got expected $expected")
  }

  test("exampleRowsWeighted: heavy ids dominate; deterministic; group-keyed") {
    val df = spark.range(400).select(
      (col("id") % 2).cast("string").as("g"), col("id"),
      when(col("id") % 100 === 0, lit(100000L)).otherwise(lit(1L)).as("w"))
    val got = Sampling.exampleRowsWeighted(df, "id", "w", 4, Some("g")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // 4 rows per group, and the overwhelming-weight ids (0,100,200,300 —
    // two per parity group) are effectively certain to be sampled
    assert(got.length == 8)
    val ids = got.map(_._2).toSet
    assert(Set(0L, 100L, 200L, 300L).subsetOf(ids), ids.toString)
    // deterministic across partitionings
    val again = Sampling.exampleRowsWeighted(df.repartition(13), "id", "w", 4, Some("g"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == got.toSet)
  }
}
