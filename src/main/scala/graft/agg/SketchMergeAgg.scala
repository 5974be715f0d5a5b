package graft.agg

import graft.core._
import graft.expr.GraftTypeCheck
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Serializable merge strategy per sketch kind — lets one generic aggregate
  * re-aggregate serialized sketch blobs. This is the second-level operator
  * of the salted two-level aggregation and of checkpoint/resume: stage 1
  * emits partial blobs, stage 2 is `groupBy(key).agg(<kind>_merge(blob))`.
  */
sealed trait SketchOps extends Serializable {
  type S >: Null <: AnyRef
  def name: String
  def deserialize(b: Array[Byte]): S
  def serialize(s: S): Array[Byte]
  /** Merge b into a (may mutate and return a). Aggregation-monoid flavour:
    * additive counters for bloom/counting/cms, register max for HLL,
    * stream merge for the quantile sketches.
    */
  def merge(a: S, b: S): S
}

object BloomOps extends SketchOps {
  type S = BloomSketch
  val name = "bloom"
  def deserialize(b: Array[Byte]): S = BloomSketch.deserialize(b)
  def serialize(s: S): Array[Byte] = s.serialize()
  def merge(a: S, b: S): S = a.mergeInPlace(b)
}
object CountingBloomOps extends SketchOps {
  type S = CountingBloomSketch
  val name = "counting_bloom"
  def deserialize(b: Array[Byte]): S = CountingBloomSketch.deserialize(b)
  def serialize(s: S): Array[Byte] = s.serialize()
  def merge(a: S, b: S): S = a.mergeInPlace(b)
}
object HllOps extends SketchOps {
  type S = HllSketch
  val name = "hll"
  def deserialize(b: Array[Byte]): S = HllSketch.deserialize(b)
  def serialize(s: S): Array[Byte] = s.serialize()
  def merge(a: S, b: S): S = a.mergeInPlace(b)
}
object CmsOps extends SketchOps {
  type S = CmsSketch
  val name = "cms"
  def deserialize(b: Array[Byte]): S = CmsSketch.deserialize(b)
  def serialize(s: S): Array[Byte] = s.serialize()
  def merge(a: S, b: S): S = a.mergeInPlace(b)
}
object ThetaOps extends SketchOps {
  type S = ThetaSketch
  val name = "theta"
  def deserialize(b: Array[Byte]): S = ThetaSketch.deserialize(b)
  def serialize(s: S): Array[Byte] = s.serialize()
  def merge(a: S, b: S): S = a.mergeInPlace(b)
}
object TDigestOps extends SketchOps {
  type S = TDigestSketch
  val name = "tdigest"
  def deserialize(b: Array[Byte]): S = TDigestSketch.deserialize(b)
  def serialize(s: S): Array[Byte] = s.serialize()
  def merge(a: S, b: S): S = a.mergeInPlace(b)
}
object BkOps extends SketchOps {
  type S = BkSample
  val name = "bk"
  def deserialize(b: Array[Byte]): S = BkSample.deserialize(b)
  def serialize(s: S): Array[Byte] = s.serialize()
  def merge(a: S, b: S): S = a.mergeInPlace(b)
}
object WsOps extends SketchOps {
  type S = WeightedSample
  val name = "ws"
  def deserialize(b: Array[Byte]): S = WeightedSample.deserialize(b)
  def serialize(s: S): Array[Byte] = s.serialize()
  def merge(a: S, b: S): S = a.mergeInPlace(b)
}
object MgOps extends SketchOps {
  type S = MgSketch
  val name = "mg"
  def deserialize(b: Array[Byte]): S = MgSketch.deserialize(b)
  def serialize(s: S): Array[Byte] = s.serialize()
  def merge(a: S, b: S): S = a.mergeInPlace(b)
}
object KllOps extends SketchOps {
  type S = KllSketch
  val name = "kll"
  def deserialize(b: Array[Byte]): S = KllSketch.deserialize(b)
  def serialize(s: S): Array[Byte] = s.serialize()
  def merge(a: S, b: S): S = a.mergeInPlace(b)
}

/** Mutable holder so an "empty so far" buffer is representable (serialized
  * as a 0-byte payload).
  */
final class MergeBuf(var sketch: AnyRef) extends Serializable

/** `<kind>_merge(blobCol)` — aggregate that merges already-serialized
  * sketch blobs of one kind. All blobs must share geometry (guaranteed when
  * they come from one stage-1 aggregate).
  */
case class SketchMergeAgg(
    child: Expression,
    ops: SketchOps,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MergeBuf] with UnaryLike[Expression] with GraftTypeCheck {

  override def prettyName: String = s"${ops.name}_merge"
  override def nullable: Boolean = true // no input blobs -> null
  override def dataType: DataType = BinaryType
  override protected def expectedTypes = Seq(GraftTypeCheck.binary)

  override def createAggregationBuffer(): MergeBuf = new MergeBuf(null)

  override def update(buf: MergeBuf, input: InternalRow): MergeBuf = {
    val v = child.eval(input)
    if (v != null) {
      val blob = v.asInstanceOf[Array[Byte]]
      if (blob.nonEmpty) mergeBlob(buf, blob)
    }
    buf
  }

  private def mergeBlob(buf: MergeBuf, blob: Array[Byte]): Unit = {
    val s = ops.deserialize(blob)
    if (buf.sketch == null) buf.sketch = s
    else buf.sketch = ops.merge(buf.sketch.asInstanceOf[ops.S], s.asInstanceOf[ops.S])
  }

  override def merge(buf: MergeBuf, other: MergeBuf): MergeBuf = {
    if (other.sketch != null) {
      if (buf.sketch == null) buf.sketch = other.sketch
      else buf.sketch = ops.merge(buf.sketch.asInstanceOf[ops.S], other.sketch.asInstanceOf[ops.S])
    }
    buf
  }

  override def eval(buf: MergeBuf): Any =
    if (buf.sketch == null) null else ops.serialize(buf.sketch.asInstanceOf[ops.S])

  override def serialize(buf: MergeBuf): Array[Byte] =
    if (buf.sketch == null) Array.emptyByteArray else ops.serialize(buf.sketch.asInstanceOf[ops.S])

  override def deserialize(bytes: Array[Byte]): MergeBuf =
    if (bytes.isEmpty) new MergeBuf(null) else new MergeBuf(ops.deserialize(bytes))

  override def withNewMutableAggBufferOffset(o: Int): SketchMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SketchMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SketchMergeAgg = copy(child = c)
}
