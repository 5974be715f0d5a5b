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
}
