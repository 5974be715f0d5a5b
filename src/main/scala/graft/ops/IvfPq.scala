package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ approximate nearest neighbor — the compressed-residency ANN
  * scale path (Jégou, Douze, Schmid, "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011).
  *
  * Why it matters at 10^11 vectors: [[Similarity.ivfTopK]] still keeps
  * full float vectors resident (dim × 4 bytes/vector — 51 TB at 10^11 ×
  * 128-dim). IVF-PQ encodes each vector as a coarse cell id + `m`
  * subspace codebook indices (`m` bytes at ks ≤ 256): 128-dim float32 →
  * 8–16 bytes, a 30–60× residency shrink, with search cost per candidate
  * a table lookup per subspace instead of a dim-length dot product.
  *
  * Structure (all training driver-side on the deterministic hash sample,
  * all encoding/search distributed):
  *  - vectors are L2-normalized so inner product = cosine (the library's
  *    similarity metric);
  *  - coarse quantizer: Lloyd k-means, `nCentroids` cells; vectors store
  *    the RESIDUAL `v − c(v)` encoding (standard IVF-PQ — residuals have
  *    much lower variance than raw vectors, so the same codebook bits buy
  *    more precision);
  *  - product quantizer: `m` subspaces × `ks` centroids each, Euclidean
  *    Lloyd per subspace over sample residuals;
  *  - ADC search: per query, ONE `m × ks` lookup table of
  *    `q_sub · codebook` partial dots (codebooks are shared across cells,
  *    so the table is cell-independent) + a per-cell scalar `q · c_cell`;
  *    each candidate scores as `q·c_cell + Σ_j table(j)(code_j)` —
  *    `m` byte-indexed lookups. The tables for the whole query set ride
  *    one small broadcast;
  *  - optional exact refine: the top `k × refineFactor` ADC candidates
  *    join back to their full vectors (a broadcast semi-join of a tiny id
  *    set against the corpus) and the final top-k is exact-cosine ranked —
  *    the standard recall-recovery step.
  */
object IvfPq {

  final case class Model(
      coarse: Array[Array[Float]], // nCentroids × dim (unit-normalized space)
      codebooks: Array[Array[Array[Float]]], // m × ks × (dim/m), residual space
      m: Int, ks: Int, dim: Int) extends Serializable {
    def subDim: Int = dim / m

    def normalize(v: Array[Float]): Array[Float] = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0) v else { val o = new Array[Float](v.length); i = 0; while (i < v.length) { o(i) = (v(i) / n).toFloat; i += 1 }; o }
    }

    def nearestCoarse(v: Array[Float]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < coarse.length) {
        var d = 0.0; var i = 0
        while (i < v.length) { val x = v(i) - coarse(c)(i); d += x * x; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    def nearestCoarseN(v: Array[Float], n: Int): Seq[Int] = {
      val ds = coarse.indices.map { c =>
        var d = 0.0; var i = 0
        while (i < v.length) { val x = v(i) - coarse(c)(i); d += x * x; i += 1 }
        (d, c)
      }
      ds.sorted.take(n).map(_._2)
    }

    /** PQ code of the residual of a (normalized) vector. */
    def encode(vn: Array[Float]): (Int, Array[Byte]) = {
      val cell = nearestCoarse(vn)
      val code = new Array[Byte](m)
      var j = 0
      while (j < m) {
        val off = j * subDim
        var best = 0; var bestD = Double.MaxValue; var t = 0
        while (t < ks) {
          var d = 0.0; var i = 0
          while (i < subDim) {
            val x = (vn(off + i) - coarse(cell)(off + i)) - codebooks(j)(t)(i)
            d += x * x; i += 1
          }
          if (d < bestD) { bestD = d; best = t }
          t += 1
        }
        code(j) = best.toByte
        j += 1
      }
      (cell, code)
    }

    /** ADC lookup table for a (normalized) query: m × ks partial dots. */
    def adcTable(qn: Array[Float]): Array[Array[Float]] = {
      Array.tabulate(m) { j =>
        val off = j * subDim
        Array.tabulate(ks) { t =>
          var s = 0.0; var i = 0
          while (i < subDim) { s += qn(off + i).toDouble * codebooks(j)(t)(i); i += 1 }
          s.toFloat
        }
      }
    }

    def coarseDot(qn: Array[Float], cell: Int): Float = {
      var s = 0.0; var i = 0
      while (i < qn.length) { s += qn(i).toDouble * coarse(cell)(i); i += 1 }
      s.toFloat
    }

    def adcScore(table: Array[Array[Float]], qDotCell: Float, code: Array[Byte]): Float = {
      var s = qDotCell.toDouble
      var j = 0
      while (j < m) { s += table(j)(code(j) & 0xff); j += 1 }
      s.toFloat
    }
  }

  private def lloydEuclidean(points: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    if (points.isEmpty) return Array.fill(k)(new Array[Float](0))
    val dim = points.head.length
    // deterministic init: spread over the sample
    var cents = Array.tabulate(math.min(k, points.length))(i => points(i * points.length / math.min(k, points.length)).clone())
    if (cents.length < k) cents = cents ++ Array.fill(k - cents.length)(cents.head.clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      points.foreach { p =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) { val x = p(i) - cents(c)(i); d += x * x; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c)
        else Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat))
      it += 1
    }
    cents
  }

  /** Train on a (normalized) sample: coarse cells + residual codebooks. */
  def train(sample: Array[Array[Float]], nCentroids: Int, m: Int, ks: Int, iters: Int = 5): Model = {
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"PQ subspaces m=$m must divide dim=$dim")
    val preModel = Model(Array.empty, Array.empty, m, ks, dim)
    val normed = sample.map(preModel.normalize)
    val coarse = lloydEuclidean(normed, nCentroids, iters)
    val withCoarse = Model(coarse, Array.empty, m, ks, dim)
    val residuals = normed.map { v =>
      val c = coarse(withCoarse.nearestCoarse(v))
      Array.tabulate(dim)(i => v(i) - c(i))
    }
    val subDim = dim / m
    val codebooks = Array.tabulate(m) { j =>
      val subs = residuals.map(r => java.util.Arrays.copyOfRange(r, j * subDim, (j + 1) * subDim))
      lloydEuclidean(subs, ks, iters)
    }
    Model(coarse, codebooks, m, ks, dim)
  }

  /** Encode a corpus to its compressed (cell, code) representation —
    * the table you would persist at 10^11-vector scale (id + cell + m
    * bytes per vector).
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col(idCol).cast("long").as("_id"), Similarity.vecRead(corpus, vecCol).as("_v"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        it.map { case (id, v) =>
          val (cell, code) = model.encode(model.normalize(v.toArray))
          (id, cell, code)
        }
      }.toDF("neighbor_id", "cell", "code")
  }

  /** Approximate top-k by ADC over the encoded corpus, exact-cosine
    * refined. `queries`/`corpus` carry full vectors; the encoded corpus
    * is produced internally (pass a pre-encoded frame via [[searchEncoded]]
    * to model the persisted-codes deployment).
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
           k: Int, nCentroids: Int = 16, nProbe: Int = 4, m: Int = 8, ks: Int = 16,
           refineFactor: Int = 4, sampleSize: Int = 4096, iters: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample = Similarity.trainingSample(
      corpus.select(col(idCol).cast("long").as("_id"), Similarity.vecRead(corpus, vecCol).as("_v")), sampleSize)
    val model = train(sample, nCentroids, m, ks, iters)
    val encoded = encode(corpus, idCol, vecCol, model)
    val approx = searchEncoded(encoded, queries, idCol, vecCol, model, k * refineFactor, nProbe)
    // exact refine: tiny candidate set joins back to full vectors
    val cands = approx.select(col("query_id"), col("neighbor_id"))
    val withVecs = cands
      .join(corpus.select(col(idCol).cast("long").as("neighbor_id"), Similarity.vecRead(corpus, vecCol).as("cv")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(idCol).cast("long").as("query_id"), Similarity.vecRead(queries, vecCol).as("qv"))), Seq("query_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosineColumn(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    withVecs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** ADC search over an already-encoded corpus: the queries' ADC tables
    * ride broadcasts of BOUNDED size — the query set is chunked into
    * `maxQueriesPerBatch` groups, each with its own broadcast of
    * `batch × (m·ks·4B table + nProbe cell dots)` (~2 MB at the
    * defaults), so a large query set costs a loop of small broadcasts
    * instead of one unbounded multi-GB one. Scoring is m byte-indexed
    * lookups per candidate row; per-batch top-k unions into the result
    * (query ids never cross batches, so the union IS the global answer).
    */
  def searchEncoded(encoded: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                    model: Model, k: Int, nProbe: Int,
                    maxQueriesPerBatch: Int = 4096): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    require(maxQueriesPerBatch > 0, "maxQueriesPerBatch must be positive")
    // driver-side: per-query table + probed cells (+ per-cell coarse dot)
    val qRows = queries.select(col(idCol).cast("long").as("_id"), Similarity.vecRead(queries, vecCol).as("_v"))
      .as[(Long, Seq[Float])].collect()
    val batches = qRows.grouped(maxQueriesPerBatch).map { batch =>
      val qInfo: Map[Long, (Array[Array[Float]], Map[Int, Float])] = batch.map { case (qid, qv) =>
        val qn = model.normalize(qv.toArray)
        val cells = model.nearestCoarseN(qn, nProbe)
        qid -> (model.adcTable(qn), cells.map(c => c -> model.coarseDot(qn, c)).toMap)
      }.toMap
      val bc = spark.sparkContext.broadcast(qInfo)
      val probes = batch.flatMap { case (qid, _) => bc.value(qid)._2.keys.map(c => (qid, c)) }
        .toSeq.toDF("query_id", "cell")
      val scored = encoded.join(broadcast(probes), Seq("cell"))
        .select(col("query_id"), col("neighbor_id"), col("cell"), col("code"))
        .as[(Long, Long, Int, Array[Byte])]
        .mapPartitions { it =>
          val info = bc.value
          it.map { case (qid, nid, cell, code) =>
            val (table, cellDots) = info(qid)
            (qid, nid, model.adcScore(table, cellDots(cell), code).toDouble)
          }
        }.toDF("query_id", "neighbor_id", "adc_score")
        .filter(col("query_id") =!= col("neighbor_id"))
        .dropDuplicates("query_id", "neighbor_id")
      val w = Window.partitionBy(col("query_id")).orderBy(col("adc_score").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    }.toSeq
    batches.reduce(_ unionAll _)
  }

  // ---------------- persistence (train once, serve many) ----------------

  /** Version magic of the model wire format ("GPQ1"). */
  final val ModelMagic = 0x47505131

  /** `magic | dim | m | ks | nCoarse | nCoarse×dim float32 | m×ks×subDim
    * float32` (LE) — a pure function of the model, byte-stable across
    * JVMs.
    */
  def serializeModel(model: Model): Array[Byte] = {
    val subDim = model.subDim
    val size = 20 + 4 * model.coarse.length * model.dim + 4 * model.m * model.ks * subDim
    val buf = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(ModelMagic).putInt(model.dim).putInt(model.m).putInt(model.ks)
    buf.putInt(model.coarse.length)
    model.coarse.foreach(c => c.foreach(buf.putFloat))
    model.codebooks.foreach(_.foreach(_.foreach(buf.putFloat)))
    buf.array()
  }

  def deserializeModel(bytes: Array[Byte]): Model = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt == ModelMagic, "not a graft IVF-PQ model blob")
    val dim = buf.getInt; val m = buf.getInt; val ks = buf.getInt
    val nCoarse = buf.getInt
    val subDim = dim / m
    val coarse = Array.fill(nCoarse)(Array.fill(dim)(buf.getFloat))
    val codebooks = Array.fill(m)(Array.fill(ks)(Array.fill(subDim)(buf.getFloat)))
    Model(coarse, codebooks, m, ks, dim)
  }

  /** Persist a trained index: `dir/model.bin` (versioned binary via the
    * Hadoop FS API — local/HDFS/object-store alike) + `dir/codes`
    * (parquet of (neighbor_id, cell, code) — id + cell + m bytes per
    * vector, the compressed residency table). Train once, serve many.
    */
  def saveIndex(corpus: DataFrame, idCol: String, vecCol: String, model: Model, dir: String): Unit = {
    encode(corpus, idCol, vecCol, model).write.mode("overwrite").parquet(s"$dir/codes")
    val spark = corpus.sparkSession
    val path = new org.apache.hadoop.fs.Path(s"$dir/model.bin")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(serializeModel(model)) finally out.close()
  }

  def loadModel(spark: org.apache.spark.sql.SparkSession, dir: String): Model = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/model.bin")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    try {
      val len = fs.getFileStatus(path).getLen.toInt
      val bytes = new Array[Byte](len)
      in.readFully(0, bytes)
      deserializeModel(bytes)
    } finally in.close()
  }

  /** ANN top-k purely from a persisted index — the serving path: no
    * training, no full vectors except the query side (and optionally the
    * refine join the CALLER adds if exact re-ranking is wanted).
    */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, dir: String, queries: DataFrame,
                  idCol: String, vecCol: String, k: Int, nProbe: Int = 4,
                  maxQueriesPerBatch: Int = 4096): DataFrame = {
    val model = loadModel(spark, dir)
    val encoded = spark.read.parquet(s"$dir/codes")
    searchEncoded(encoded, queries, idCol, vecCol, model, k, nProbe, maxQueriesPerBatch)
  }
}
