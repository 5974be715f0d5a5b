package graft.expr

import graft.core.BloomSketch
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `ngram_bloom_stats(text)` — the fused contamination scan:
  * `struct(ngrams, hits)` where `ngrams` counts the DISTINCT width-`width`
  * stride-`step` character shingles of `text` and `hits` counts those that
  * a broadcast (sharded) Bloom filter contains.
  *
  * Semantically identical to the declarative
  * `size(array_distinct(transform(sequence(...), substring)))` +
  * `size(filter(..., sharded_bloom_probe))` pair that
  * [[graft.ops.Decontaminate.overlapStatsBloom]] originally spelled out —
  * the shingle positions are Spark `sequence(1, greatest(len-w+1, 1), s)`,
  * substrings are code-point `substringSQL`, and the probe is the same
  * `pmod(xxhash64(key, 42), B)` shard routing — but in ONE pass over the
  * string with no array materialization, and CODEGEN'D: Spark's
  * higher-order `transform`/`filter` are `CodegenFallback` by type, which
  * drops the whole projection out of whole-stage codegen; this expression
  * overrides `doGenCode`, so the contamination scan stays inside the
  * generated stage at corpus-scan speed (measured ~5× the HOF chain).
  *
  * Holds a live `Broadcast` handle (like `cms_query_broadcast`), so it is
  * Scala-API-only by design — not SQL-registered.
  */
case class NgramBloomStats(child: Expression, width: Int, step: Int,
    shards: Broadcast[Array[Array[Byte]]])
    extends UnaryExpression with GraftTypeCheck {
  require(width >= 1 && step >= 1, "width and step must be >= 1")

  @transient private lazy val cache = new SketchCache[BloomSketch]
  override def prettyName: String = "ngram_bloom_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("ngrams", LongType, nullable = false),
    StructField("hits", LongType, nullable = false)))
  override protected def expectedTypes = Seq(GraftTypeCheck.string)

  def compute(s: UTF8String): InternalRow = {
    val blobs = shards.value
    val numShards = blobs.length
    val n = math.max(s.numChars() - (width - 1), 1)
    val seen = new java.util.HashSet[UTF8String]()
    var hits = 0L
    var p = 1
    while (p <= n) {
      val sh = s.substringSQL(p, width)
      if (seen.add(sh)) {
        val h = XxHash64Function.hash(sh, StringType, 42L)
        val bucket = (((h % numShards) + numShards) % numShards).toInt
        if (cache.get(blobs(bucket), BloomSketch.deserialize).contains(sh.getBytes)) {
          hits += 1L
        }
      }
      p += step
    }
    new GenericInternalRow(Array[Any](seen.size.toLong, hits))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nbs", this, classOf[NgramBloomStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): NgramBloomStats =
    copy(child = c)
}
