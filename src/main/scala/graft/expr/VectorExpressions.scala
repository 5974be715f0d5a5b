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

/** `hyperplane_bucket(vec, planes, seed)` — the random-hyperplane LSH
  * bucket (Charikar 2002) as ONE fused expression.
  *
  * Replaces the former `functions._` composition (per plane: `aggregate(
  * zip_with(v, sequence(0, size(v)-1), (x,i) => x * sign(xxhash64(seed,
  * plane, i))))`), which evaluated a chained xxhash64 PER ELEMENT PER
  * PLANE PER ROW and allocated a sequence + zipped array per plane — the
  * map-side hot loop of every LSH ANN/near-dup operator (guide §1.2 step
  * 2: per-task work). The signs depend only on `(seed, plane, dimIdx)`,
  * so they are precomputed ONCE per task (grown lazily to the observed
  * dimensionality, via the SAME Catalyst `xxhash64` evaluation) and the
  * bucket is a single pass over the vector with zero per-row allocation.
  *
  * Bit-exactness with the old composition (asserted in OpsSpec):
  *  - per plane, `dot = ((0.0 + v0·s0) + v1·s1) + …` in index order —
  *    identical IEEE-754 sequence;
  *  - bit set iff `dot >= 0` under SPARK's ordering (NaN sorts above
  *    every double ⇒ a NaN dot sets the bit; any-null-element ⇒ bit
  *    clear, as with the old null-propagating aggregate);
  *  - empty and NULL vectors map to bucket 0 (the old `sequence(0,-1)` /
  *    null-propagation corner semantics).
  */
case class HyperplaneBucket(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression with GraftTypeCheck {
  require(planes > 0 && planes <= 62, s"planes in (0,62], got $planes")
  override def prettyName: String = "hyperplane_bucket"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override protected def expectedTypes = Seq(
    GraftTypeCheck.floatArray ++ Seq(
      ArrayType(DoubleType, containsNull = true), ArrayType(DoubleType, containsNull = false)))
  // NULL vector → bucket 0 (the old composition's `when(null >= 0)`
  // collapse), so the expression is not null-propagating
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else probe(v.asInstanceOf[ArrayData])
  }

  @transient private var isFloat: Boolean = _
  @transient private var typeResolved: Boolean = false
  // signs(p)(i) = ±1.0 from pmod(xxhash64(seed, p, i), 2), exactly the
  // Catalyst evaluation the old composition ran per row — computed once
  // per task and grown geometrically to the observed dimensionality
  @transient private var signs: Array[Array[Double]] = _
  @transient private var signDims: Int = 0

  private def ensureSigns(dim: Int): Unit = if (dim > signDims) {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val newDim = math.max(dim, math.max(64, signDims * 2))
    val next = Array.ofDim[Double](planes, newDim)
    var p = 0
    while (p < planes) {
      var i = 0
      while (i < newDim) {
        val h = new XxHash64(Seq(Literal(seed), Literal(p), Literal(i)))
          .eval(null).asInstanceOf[Long]
        val pm = ((h % 2) + 2) % 2
        next(p)(i) = if (pm == 0) 1.0 else -1.0
        i += 1
      }
      p += 1
    }
    signs = next
    signDims = newDim
  }

  def probe(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    if (!typeResolved) {
      isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
      typeResolved = true
    }
    ensureSigns(n)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val s = signs(p)
      var dot = 0.0
      var anyNull = false
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) { anyNull = true; i = n }
        else {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          dot += x * s(i)
          i += 1
        }
      }
      // Spark SQL orders NaN above every double, so the old composition's
      // `dot >= 0` was TRUE for a NaN dot — mirror that, not Java's NaN
      if (!anyNull && (dot >= 0 || java.lang.Double.isNaN(dot))) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val self = ctx.addReferenceObj("hpb", this, classOf[HyperplaneBucket].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L : $self.probe(${c.value});""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): HyperplaneBucket = copy(child = c)
}
