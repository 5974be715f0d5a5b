package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** Manual input-type validation. (Spark's `ExpectsInputTypes` /
  * `TypeCollection` are `private[sql]`, so library expressions outside the
  * Spark namespace validate via `checkInputDataTypes()` directly.)
  */
private[graft] trait GraftTypeCheck { self: Expression =>
  /** Allowed types per child, positionally. */
  protected def expectedTypes: Seq[Seq[DataType]]

  override def checkInputDataTypes(): TypeCheckResult = {
    children.zip(expectedTypes).zipWithIndex.collectFirst {
      case ((c, allowed), i) if !allowed.contains(c.dataType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName argument ${i + 1} requires ${allowed.map(_.simpleString).mkString(" or ")}, got ${c.dataType.simpleString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }
}

private[graft] object GraftTypeCheck {
  val stringOrBinary: Seq[DataType] = Seq(StringType, BinaryType)
  val binary: Seq[DataType] = Seq(BinaryType)
  val string: Seq[DataType] = Seq(StringType)
  val double: Seq[DataType] = Seq(DoubleType)
  val hashable: Seq[DataType] =
    Seq(StringType, BinaryType, LongType, IntegerType, ShortType, ByteType, DateType, TimestampType)
  val floatArray: Seq[DataType] =
    Seq(ArrayType(FloatType, containsNull = true), ArrayType(FloatType, containsNull = false))
}
