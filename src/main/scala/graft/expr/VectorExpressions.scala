package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Embedding storage quantization: symmetric per-vector int8.
  *
  * At 10^11 × 64-dim float32 vectors the embedding column alone is
  * ~26 TB; per-vector symmetric int8 (`scale = max|v|/127`,
  * `q_i = round(v_i/scale)`) stores the same vectors in ~1/4 the bytes
  * with a reconstruction error bounded by `scale/2` per component — the
  * standard serving-residency trade (the coarse cousin of the IVF-PQ
  * codes in [[graft.ops.IvfPq]], which compress harder but need a
  * trained codebook; int8 needs none and decodes with one multiply).
  *
  * Both directions are real codegen'd expressions — quantize sits on the
  * corpus write path, dequantize on every scoring read.
  */

/** `vec_quantize_int8(array<float>) -> struct(scale float, q binary)`.
  * All-zero (or empty) vectors quantize to scale=0 with zero codes and
  * dequantize back to exact zeros. Null elements are treated as 0.
  */
case class VecQuantizeInt8(child: Expression)
    extends UnaryExpression with GraftTypeCheck {
  override def prettyName: String = "vec_quantize_int8"
  override def dataType: DataType = StructType(Seq(
    StructField("scale", FloatType, nullable = false),
    StructField("q", BinaryType, nullable = false)))
  override protected def expectedTypes = Seq(GraftTypeCheck.floatArray)

  def quantize(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var maxAbs = 0f
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val a = math.abs(arr.getFloat(i))
        if (a > maxAbs) maxAbs = a
      }
      i += 1
    }
    val scale = maxAbs / 127f
    val q = new Array[Byte](n)
    if (scale > 0f) {
      i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val r = math.round(arr.getFloat(i) / scale)
          q(i) = math.max(-127, math.min(127, r)).toByte
        }
        i += 1
      }
    }
    InternalRow(scale, q)
  }

  override def nullSafeEval(v: Any): Any = quantize(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("vq8", this, classOf[VecQuantizeInt8].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.quantize($v);")
  }
  override protected def withNewChildInternal(c: Expression): VecQuantizeInt8 = copy(c)
}

/** `vec_dequantize_int8(struct(scale, q)) -> array<float>`:
  * `q_i * scale`, one multiply per component.
  */
case class VecDequantizeInt8(child: Expression)
    extends UnaryExpression with GraftTypeCheck {
  override def prettyName: String = "vec_dequantize_int8"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  // structural check (field TYPES, any names/nullability — a parquet
  // round-trip relaxes both), so the trait's positional list is bypassed
  override protected def expectedTypes = Seq(Seq.empty)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StructType(Array(a, b)) if a.dataType == FloatType && b.dataType == BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires struct<float, binary>, got ${t.simpleString}")
    }

  def dequantize(row: InternalRow): ArrayData = {
    val scale = row.getFloat(0)
    val q = row.getBinary(1)
    val out = new Array[Any](q.length)
    var i = 0
    while (i < q.length) { out(i) = q(i) * scale; i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = dequantize(v.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("vdq8", this, classOf[VecDequantizeInt8].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.dequantize($v);")
  }
  override protected def withNewChildInternal(c: Expression): VecDequantizeInt8 = copy(c)
}
