package graft.expr

import graft.SparkTestSession
import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Whole-stage codegen coverage for the per-row probe expressions: a probe
  * used in a filter/select hot path must NOT fall back to interpreted
  * evaluation. Spark excludes anything that IS-A CodegenFallback from
  * WholeStageCodegen by TYPE TEST (even with doGenCode overridden), so
  * these expressions override doGenCode and do not extend the trait.
  */
class CodegenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def codegenPlanOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("cms_query filter stays inside WholeStageCodegen") {
    val keys = (0 until 500).map(i => s"k${i % 17}").toDF("k")
    val blob = keys.agg(cms_sketch(col("k"), 0.01, 0.01)).head.getAs[Array[Byte]](0)
    val probed = spark.range(100).select(concat(lit("k"), col("id") % 17).as("k"))
      .filter(cms_query(lit(blob), col("k")) > 0L)
    val plan = codegenPlanOf(probed)
    assert(plan.contains("*("), s"no codegen stage in plan:\n$plan")
    assert(!plan.split("\n").exists(l => l.contains("Filter") && !l.trim.startsWith("*") && !l.trim.startsWith("+- *")),
      s"Filter fell out of codegen:\n$plan")
    assert(probed.count() == 100) // every key was added
  }

  test("cbf_count and hll_estimate evaluate correctly under codegen") {
    val keys = (0 until 300).map(i => s"k${i % 10}").toDF("k")
    val agg = keys.agg(
      counting_bloom_sketch(col("k"), 1000L, 0.01f).as("cbf"),
      hll_sketch(col("k"), 12).as("hll")).head
    val cbf = agg.getAs[Array[Byte]]("cbf")
    val hll = agg.getAs[Array[Byte]]("hll")
    val r = spark.range(10).select(concat(lit("k"), col("id")).as("k"))
      .select(cbf_count(lit(cbf), col("k")).as("c"), hll_estimate(lit(hll)).as("e"))
    val rows = r.collect()
    assert(rows.forall(_.getAs[Int]("c") >= 30)) // every key added 30 times
    assert(rows.forall(x => math.abs(x.getAs[Long]("e") - 10L) <= 1L))
    val plan = codegenPlanOf(r)
    assert(plan.contains("*("), s"no codegen stage:\n$plan")
  }

  test("probe expressions are not CodegenFallback instances") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val e = org.apache.spark.sql.catalyst.expressions.Literal(Array[Byte](1))
    assert(!CmsQuery(e, e).isInstanceOf[CodegenFallback])
    assert(!CbfCount(e, e).isInstanceOf[CodegenFallback])
    assert(!HllEstimate(e).isInstanceOf[CodegenFallback])
    assert(!BloomMightContain(e, e).isInstanceOf[CodegenFallback])
    assert(!MgEstimate(e, e).isInstanceOf[CodegenFallback])
    assert(!RangeBucket(e, Array(1.0)).isInstanceOf[CodegenFallback])
    assert(!CmsQueryBroadcast(e, null).isInstanceOf[CodegenFallback])
  }

  test("cms_query_broadcast filter stays inside WholeStageCodegen") {
    val keys = (0 until 500).map(i => s"k${i % 17}").toDF("k")
    val blob = keys.agg(cms_sketch(col("k"), 0.01, 0.01)).head.getAs[Array[Byte]](0)
    val bcast = spark.sparkContext.broadcast(blob)
    val probed = spark.range(100).select(concat(lit("k"), col("id") % 17).as("k"))
      .filter(cms_query_broadcast(bcast, col("k")) > 0L)
    val plan = codegenPlanOf(probed)
    assert(plan.contains("*("), s"no codegen stage in plan:\n$plan")
    assert(probed.count() == 100)
    // identical answers to the literal-blob probe
    val both = spark.range(50).select(concat(lit("k"), col("id") % 17).as("k"))
      .select(cms_query(lit(blob), col("k")).as("a"),
        cms_query_broadcast(bcast, col("k")).as("b"))
    assert(both.collect().forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("mg_estimate filter and range_bucket select stay inside WholeStageCodegen") {
    val keys = (0 until 400).map(i => s"k${i % 9}").toDF("k")
    val blob = keys.agg(mg_sketch(col("k"), 16)).head.getAs[Array[Byte]](0)
    val probed = spark.range(50).select(concat(lit("k"), col("id") % 9).as("k"))
      .filter(mg_estimate(lit(blob), col("k")) > 0L)
    val plan = codegenPlanOf(probed)
    assert(plan.contains("*("), s"no codegen stage:\n$plan")
    assert(probed.count() == 50)

    val bucketed = spark.range(1000)
      .select(graft.ops.RangePartition.bucketColumn(col("id"), Array(250.0, 500.0, 750.0)).as("b"))
    val plan2 = codegenPlanOf(bucketed)
    assert(plan2.contains("*("), s"no codegen stage:\n$plan2")
    assert(bucketed.groupBy("b").count().count() == 4)
  }
}
