package graft.ops

import graft.core.Fnv
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: the brute-force path is the correctness baseline (O(Q·N)
  * — fine for small query sets, exact answers). The scale path buckets by
  * random-hyperplane LSH so each query only scans its bucket; recall<1 is
  * the documented trade. All arithmetic is in SQL expressions (codegen'd,
  * no UDFs), so Catalyst prunes to the two needed columns at the scan.
  */
object Similarity {

  /** Embedding-column reader shared by every ANN operator: accepts either
    * a raw `array<float>` column or the int8-quantized
    * `struct(scale float, q binary)` form written by
    * [[graft.functions.vec_quantize_int8]] (field names/nullability free
    * — a parquet round-trip relaxes both), dequantizing INSIDE the
    * consuming stage. A corpus stored at the quantizer's 4× residency is
    * therefore searchable directly: the scan reads the 4×-smaller stored
    * bytes, the candidate exchanges still ship ids only, and the decode
    * is one codegen'd multiply per component exactly where the vector is
    * consumed (bucketing or scoring) — never a materialized float copy
    * of the corpus.
    */
  private[ops] def vecRead(df: DataFrame, vecCol: String): Column =
    vecDecode(df.schema(vecCol).dataType, col(vecCol))

  /** [[vecRead]] for an already-projected column of known type — used
    * where the stored (possibly quantized) form is materialized/cached
    * at its 4× smaller width and decoded per CONSUMER.
    */
  private[ops] def vecDecode(dt: org.apache.spark.sql.types.DataType, c: Column): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case StructType(Array(a, b))
          if a.dataType == FloatType && b.dataType == BinaryType =>
        graft.functions.vec_dequantize_int8(c)
      case _ => c
    }
  }

  /** Cosine similarity of two `array<float/double>` columns, computed in
    * double via `zip_with` + `aggregate` (both codegen-friendly built-ins).
    */
  def cosineColumn(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")), lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")), lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Integer-quantized dot product: `sum(floor(a_i*1000)*floor(b_i*1000))`.
    * Bit-exact across engines (floor of an exact float→double product), so
    * oracle comparisons hash-match — used by the verification queries.
    */
  def quantizedDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => floor(x.cast("double") * 1000d).cast("long") * floor(y.cast("double") * 1000d).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Per-row half of [[quantizedDot]]: `floor(x*1000)` as `array<long>`,
    * computed ONCE per vector so a cross join scores with
    * [[quantizedDotPre]] instead of re-quantizing both sides per pair.
    * `quantizedDotPre(quantizeForDot(a), quantizeForDot(b))` is
    * bit-identical to `quantizedDot(a, b)` (same longs, same products,
    * same in-order sum).
    */
  def quantizeForDot(a: Column): Column =
    transform(a, x => floor(x.cast("double") * 1000d).cast("long"))

  /** Dot product of two pre-quantized `array<long>` columns. */
  def quantizedDotPre(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Random-hyperplane LSH bucket (Charikar 2002): sign bit per plane,
    * planes derived deterministically from (seed, planeIdx, dimIdx) via
    * the Catalyst xxhash64 — reproducible across runs, no stored model.
    *
    * One fused codegen'd expression ([[graft.expr.HyperplaneBucket]]):
    * the former built-in composition re-evaluated a chained xxhash64 per
    * element per plane per row; the fused form precomputes the ±1 sign
    * table once per task and walks the vector once per plane with zero
    * per-row allocation — bit-identical buckets (OpsSpec asserts the
    * equivalence against the old composition, including the empty/null/
    * NaN corners).
    */
  def hyperplaneBucket(v: Column, planes: Int, seed: Long): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.expr.HyperplaneBucket(
      org.apache.spark.sql.GraftSqlBridge.expression(v), planes, seed))

  /** Exact brute-force cosine top-k: every query row against every corpus
    * row. Correctness baseline; cost O(Q·N) — keep Q small or use
    * [[lshTopK]]. Broadcast the query side (it is the small side).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), vecRead(corpus, vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), vecRead(queries, vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosineColumn(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF (inverted-file) approximate top-k — the other standard ANN scale
    * path beside LSH: a coarse quantizer of `nCentroids` Voronoi cells;
    * each query scans only its `nProbe` nearest cells.
    *
    * The quantizer is trained driver-side with Lloyd iterations on a
    * deterministic sample (rows with the smallest `xxhash64(id)` — stable
    * across runs and partitionings), which is the realistic deployment
    * shape: coarse quantizers are small and trained once on a sample,
    * while ASSIGNMENT and SEARCH stay distributed. Cell assignment runs in
    * `mapPartitions` (an argmin over nCentroids dot products per row — a
    * genuine per-row imperative loop; centroids ride the closure like a
    * broadcast). Recall < 1 is the documented trade, rising with nProbe.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4, iters: Int = 5,
              sampleSize: Int = 4096): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val typed = corpus.select(col(idCol).cast("long").as("_id"), vecRead(corpus, vecCol).as("_v"))
      .as[(Long, Seq[Float])]
    val sample = trainingSample(typed.toDF("_id", "_v"), sampleSize)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    var centroids = sample.take(nCentroids)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        val c = nearestCell(v, centroids)
        counts(c) += 1
        var d = 0
        while (d < dim) { sums(c)(d) += v(d); d += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else Array.tabulate(dim)(d => (sums(c)(d) / counts(c)).toFloat)
      }.toArray
      it += 1
    }
    val cs = centroids // stable reference for the closures below
    val assigned = typed.map { case (id, v) => (id, v, nearestCell(v.toArray, cs)) }
      .toDF("neighbor_id", "cv", "cell")
    val q = queries.select(col(idCol).cast("long").as("query_id"), vecRead(queries, vecCol).as("qv"))
      .as[(Long, Seq[Float])]
      .flatMap { case (id, v) =>
        nearestCells(v.toArray, cs, nProbe).map(c => (id, v, c))
      }.toDF("query_id", "qv", "cell")
    val scored = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosineColumn(col("qv"), col("cv")).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic training sample WITHOUT a full-corpus sort: a count
    * (parquet answers from row-group metadata) sizes a hash-threshold
    * filter that passes ~2× sampleSize rows in one narrow scan; the
    * tie-break sort runs over only those survivors (TakeOrdered on
    * ~2·sampleSize rows). Sample = smallest xxhash64(_id) ranks — stable
    * across runs and partitionings. (A plain orderBy(hash).limit would
    * shuffle/partially-sort the WHOLE corpus to pick 4096 rows — a scale
    * killer at 10^11 vectors.) Expects columns (_id: long, _v: seq float).
    */
  private[graft] def trainingSample(df: DataFrame, sampleSize: Int): Array[Array[Float]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val total = df.count()
    val granularity = 1L << 20
    val cut = if (total <= sampleSize) granularity
      else math.min(granularity, granularity * 2L * sampleSize / total + 1L)
    df.filter(pmod(xxhash64(col("_id")), lit(granularity)) < lit(cut))
      .orderBy(pmod(xxhash64(col("_id")), lit(granularity)), xxhash64(col("_id")), col("_id"))
      .limit(sampleSize)
      .as[(Long, Seq[Float])].collect().map(_._2.toArray)
  }

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))
  private[ops] def nearestCell(v: Array[Float], cs: Array[Array[Float]]): Int =
    nearestCells(v, cs, 1).head
  private[ops] def nearestCells(v: Array[Float], cs: Array[Array[Float]], n: Int): Seq[Int] = {
    val nv = norm(v)
    cs.indices
      .sortBy(c => (-(dot(v, cs(c)) / (nv * norm(cs(c)) + 1e-12)), c))
      .take(n)
  }

  /** Multi-table LSH approximate top-k (standard OR-amplification:
    * `tables` independent bucketings; a corpus row is a candidate if it
    * collides with the query in ANY table). Per-table bucket count is
    * `2^planes`; recall rises with `tables`, cost with both.
    * Candidates are deduped before exact scoring, so each (query,
    * neighbor) pair is scored once.
    *
    * Id-only candidate exchange (the [[Dedup.minHashPairs]] /
    * [[Dedup.embeddingNearDupPairs]] discipline): the bucket join and the
    * candidate dedup ship ONLY (query_id, neighbor_id) — never the
    * dim×4-byte vectors, which at 10^11 corpus vectors × `tables`
    * bucketings would widen the exchange ~50×. Vectors re-join the
    * (deduped, tiny) candidate set afterwards for exact scoring; the
    * query side is broadcast both times (it is the small side by
    * contract).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              planes: Int = 6, tables: Int = 8, seed: Long = 42L): DataFrame = {
    def bucketsOf(v: Column): Column = array((0 until tables).map(t =>
      struct(lit(t).as("t"), hyperplaneBucket(v, planes, seed + 7919L * t).as("b"))): _*)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      explode(bucketsOf(vecRead(corpus, vecCol))).as("bk"))
    val q = queries.select(col(idCol).as("query_id"),
      explode(bucketsOf(vecRead(queries, vecCol))).as("bk"))
    val candidates = c.join(broadcast(q), Seq("bk"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = candidates
      .join(corpus.select(col(idCol).as("neighbor_id"), vecRead(corpus, vecCol).as("cv")),
        Seq("neighbor_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"), vecRead(queries, vecCol).as("qv"))),
        Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosineColumn(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
