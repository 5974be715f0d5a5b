package graft.expr

import graft.SparkTestSession
import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** int8 embedding quantization: error bound, degenerate vectors, codegen,
  * SQL surface, and cosine fidelity after the 4x storage cut.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecsDf(n: Int, dim: Int) = {
    val rows = (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim) { d =>
        val h = graft.core.Fnv.splitmix64(i.toLong * 131 + d)
        (h % 2000L).toFloat / 1000f // in [-2, 2)
      })
    }
    rows.toDF("id", "v")
  }

  test("round-trip: per-component error <= scale/2, length preserved, idempotent") {
    val df = vecsDf(200, 24)
    val got = df.select($"id", $"v",
        vec_quantize_int8($"v").as("sq"))
      .withColumn("back", vec_dequantize_int8($"sq"))
      .select($"id", $"v", $"back", $"sq.scale".as("scale"),
        (vec_quantize_int8($"back") === $"sq").as("idem"))
      .collect()
    got.foreach { r =>
      val v = r.getSeq[Float](1)
      val back = r.getSeq[Float](2)
      val scale = r.getFloat(3)
      assert(back.length == v.length)
      v.zip(back).foreach { case (a, b) =>
        assert(math.abs(a - b) <= scale / 2 + 1e-6, s"id=${r.getLong(0)}")
      }
      assert(r.getBoolean(4), s"requantize not exact for id=${r.getLong(0)}")
    }
  }

  test("degenerate vectors: all-zero and empty quantize cleanly; nulls pass through") {
    val df = Seq(
      (1L, Some(Array(0f, 0f, 0f))),
      (2L, Some(Array.empty[Float])),
      (3L, None)).toDF("id", "v")
    val got = df.select($"id", vec_dequantize_int8(vec_quantize_int8($"v")).as("back"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Float](1))).toMap
    assert(got(1L) == Seq(0f, 0f, 0f))
    assert(got(2L) == Seq.empty[Float])
    assert(got(3L) == null)
  }

  test("cosine fidelity: int8 round-trip preserves cosine within 2%") {
    val df = vecsDf(50, 64)
    val rows = df.select(
      graft.ops.Similarity.cosineColumn($"v",
        vec_dequantize_int8(vec_quantize_int8($"v"))).as("c")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) <= 0.02))
  }

  test("codegen: quantize/dequantize select stays in WholeStageCodegen; SQL works") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val lit0 = org.apache.spark.sql.catalyst.expressions.Literal(Array[Byte](1))
    assert(!VecQuantizeInt8(lit0).isInstanceOf[CodegenFallback])
    assert(!VecDequantizeInt8(lit0).isInstanceOf[CodegenFallback])
    // range-based input: a LocalRelation would collapse the projection
    // at optimization time and leave nothing to inspect
    val df = spark.range(100).select(expr(
      "transform(sequence(0, 7), d -> cast((pmod(xxhash64(id, d), 2000) - 1000) / 1000.0 as float)) AS v"))
    val plan = df.select(vec_dequantize_int8(vec_quantize_int8($"v")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen stage:\n$plan")
    graft.functions.register(spark)
    vecsDf(10, 4).createOrReplaceTempView("vq_in")
    val n = spark.sql(
      "SELECT size(vec_dequantize_int8(vec_quantize_int8(v))) AS n FROM vq_in")
      .collect().map(_.getInt(0))
    assert(n.forall(_ == 4))
  }
}
