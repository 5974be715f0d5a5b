package graft

import graft.functions._
import graft.ops.{Curation, Decontaminate, Dedup, Html, MediaCodecs, Multimodal, Pii, Sampling, Similarity, TextOps}
import graft.pipeline.SketchPipeline
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator family
  * (SURVEY.md §2 + the training-data ops), each paired with an `oracleSql`
  * that DuckDB runs over the same parquet tables.
  *
  * Oracle-compare design rules (the driver hash-compares values after
  * sorting columns by name):
  *  - aggregate outputs are integer-exact (BIGINT counts, integral-double
  *    sums cast to BIGINT, cents via round(x*100)) — never order-dependent
  *    float accumulations;
  *  - sketch estimates are verified as `ok` BOOLEAN columns (within the
  *    algorithm's published bound vs the exact value that the oracle also
  *    computes) anchored by exact BIGINT columns, since DuckDB cannot
  *    evaluate the sketches themselves;
  *  - reference golden values (FNV-1a hashes, export MD5/size, hex
  *    prefix/suffix, estimator goldens from `tests/testsuite.c`) appear as
  *    literals on the oracle side — they come from the C reference suite,
  *    not from this library, so the comparison is independent;
  *  - both sides ORDER BY the key columns.
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** documents ∪ shifted copies of every 10th doc — deterministic duplicate
    * injection used by the dedup queries (expressed identically in the
    * oracle SQL, so both engines see the same corpus).
    */
  private def dupDocs(s: SparkSession, dir: String): DataFrame = {
    val d = T(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionAll(
      d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
  }
  private val dupDocsSql =
    """d AS (SELECT doc_id, text FROM documents
      | UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)""".stripMargin

  /** q28's injected boilerplate class — the pathological duplicate text. */
  private val BoilerText =
    "the quick brown fox jumps over the lazy dog again and again and again"

  /** Flagship: per-language HLL distinct-doc estimates over the sf0.001
    * documents table (scan → prune → partial agg → shuffle → merge → eval).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = T(spark, "/root/testdata/sf0.001", "documents")
    d.groupBy(col("lang"))
      .agg(hll_sketch(col("doc_id").cast("string"), 12).as("sk"),
        count(lit(1)).as("docs"))
      .select(col("lang"), col("docs"), hll_estimate(col("sk")).as("distinct_est"))
  }

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational composition over the sketch-library session ---
    "q01_pricing_agg" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("revenue_cents"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Bloom-accelerated semi-join: sketch the small (filtered orders) side,
    // broadcast the blob as a pre-filter on lineitem, exact semi-join after
    // — final result is exact regardless of Bloom false positives.
    "q02_bloom_semijoin" -> ((s, dir) => {
      val hi = T(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      val blob = hi.agg(bloom_sketch(col("o_orderkey").cast("string"), 100000L, 0.01f))
        .head.getAs[Array[Byte]](0)
      val li = T(s, dir, "lineitem")
      li.filter(bloom_might_contain(lit(blob), col("l_orderkey").cast("string")))
        .join(hi.select(col("o_orderkey")), li("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // --- hashing layer: reference goldens (testsuite.c:92-96) ---
    "q03_fnv_golden" -> ((s, _) => {
      (0 until 5).map { i =>
        s.range(1).select(lit("foo").as("key"), lit(i).as("seed"),
          fnv1a_hash(lit("foo"), i).as("hash"))
      }.reduce(_ unionAll _).orderBy(col("seed"))
    }),

    // --- serde: byte-compat with the C library (testsuite.c:410-425,526-547)
    "q04_bloom_golden_serde" -> ((s, _) => {
      val blob = s.range(0, 5000).select(col("id").cast("string").as("k"))
        .agg(bloom_sketch(col("k"), 50000L, 0.01f)).head.getAs[Array[Byte]](0)
      s.range(1)
        .select(lit(blob).as("b"), bloom_to_hex(lit(blob)).as("hex"))
        .select(
          md5(col("b")).as("md5_hex"),
          lit(blob.length).as("export_size"),
          length(col("hex")).cast("int").as("hex_len"),
          substring(col("hex"), 1, 80).as("hex_head"),
          substring(col("hex"), -80, 80).as("hex_tail"),
          bloom_elements_added(bloom_from_hex(col("hex"))).as("elements_added"))
    }),

    // --- HLL accuracy vs exact distinct (bound: 3σ of 1.04/√2^14 ≈ 2.4%) ---
    "q05_hll_accuracy" -> ((s, dir) => {
      // NB: never mix a TypedImperativeAggregate with a distinct aggregate
      // in one agg — Spark's distinct rewrite would build one sketch
      // buffer per (group, distinct-key) pair. ONE scan instead of the
      // former two-scan+join shape (guide §2.4): dedup (flag, orderkey)
      // first, then build the sketch over the distinct keys — HLL inserts
      // are idempotent (register max), so the sketch over distinct keys is
      // bit-identical to the sketch over all rows, and count(*) of the
      // distinct pairs IS the exact distinct count.
      val li = T(s, dir, "lineitem")
      // NULL keys excluded so count(*) over distinct pairs is EXACTLY the
      // former countDistinct (which ignores NULLs; so does hll_sketch)
      val dk = li.select(col("l_returnflag"), col("l_orderkey"))
        .filter(col("l_orderkey").isNotNull).distinct()
      dk.groupBy(col("l_returnflag"))
        .agg(hll_sketch(col("l_orderkey").cast("string"), 14).as("sk"),
          count(lit(1)).as("exact_distinct"))
        .select(col("l_returnflag"), col("exact_distinct"),
          (abs(hll_estimate(col("sk")) - col("exact_distinct")).cast("double")
            <= lit(0.03) * col("exact_distinct").cast("double")).as("ok"))
        .orderBy(col("l_returnflag"))
    }),

    // --- CMS accuracy: exact ≤ est ≤ exact + eps·N w.p. 1-δ ---
    "q06_cms_accuracy" -> ((s, dir) => {
      val ord = T(s, dir, "orders")
      val n = ord.count()
      val blob = ord.agg(cms_sketch(col("o_orderpriority"), 0.001, 0.01))
        .head.getAs[Array[Byte]](0)
      val slack = math.ceil(0.001 * n).toLong
      ord.groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
        .select(col("o_orderpriority"), col("cnt"),
          (cms_query(lit(blob), col("o_orderpriority")) >= col("cnt") &&
            cms_query(lit(blob), col("o_orderpriority")) <= col("cnt") + lit(slack)).as("ok"),
          (cms_total_count(lit(blob)) === lit(n)).as("total_ok"))
        .orderBy(col("o_orderpriority"))
    }),

    // --- quantile sketches vs exact ranks (two jobs total: sketch build +
    // ONE aggregation computing every rank check; quantile/rank evals on
    // the driver-held blobs are local math, not jobs) ---
    "q07_quantiles" -> ((s, dir) => {
      import s.implicits._
      val x = T(s, dir, "lineitem").select(col("l_extendedprice").as("x"))
      val agg = x.agg(tdigest_sketch(col("x"), 100.0).as("td"),
        kll_sketch(col("x"), 200).as("kl"), count(lit(1)).as("n")).head
      val (td, kl, n) = (agg.getAs[Array[Byte]]("td"), agg.getAs[Array[Byte]]("kl"), agg.getAs[Long]("n"))
      val tdS = graft.core.TDigestSketch.deserialize(td)
      val klS = graft.core.KllSketch.deserialize(kl)
      val evals = Seq(0.1, 0.5, 0.9, 0.99).map(q => (q, tdS.quantile(q), klS.quantile(q)))
      val rankCols = evals.zipWithIndex.flatMap { case ((_, tq, kq), i) =>
        Seq(sum(when(col("x") <= tq, 1L).otherwise(0L)).as(s"t$i"),
          sum(when(col("x") <= kq, 1L).otherwise(0L)).as(s"k$i"))
      }
      val r = x.agg(rankCols.head, rankCols.tail: _*).head
      val rows = evals.zipWithIndex.map { case ((q, _, kq), i) =>
        val rankT = r.getAs[Long](s"t$i").toDouble / n
        val rankK = r.getAs[Long](s"k$i").toDouble / n
        (q, n, math.abs(rankT - q) <= 0.02, math.abs(rankK - q) <= 0.025,
          math.abs(klS.rank(kq) - rankK) <= 0.025)
      }
      rows.toDF("q", "n", "ok_tdigest", "ok_kll", "ok_kll_rank").orderBy(col("q"))
    }),

    // --- theta sketch set algebra: distinct-intersection/difference
    // estimates (the set ops HLL cannot do) vs exact, one pass for both
    // sketches via conditional inputs (nulls skip the aggregate) ---
    "q33_theta_setops" -> ((s, dir) => {
      import s.implicits._
      val ord = T(s, dir, "orders")
        .select(col("o_orderkey").cast("string").as("k"), col("o_totalprice").as("p"))
      // o_orderkey is unique per row, so conditional counts are exact
      // distinct counts without a distinct aggregate (never mix a
      // TypedImperativeAggregate with a distinct rewrite: Spark's rewrite
      // would build one sketch buffer per (group, distinct-key) pair)
      val r = ord.agg(
        theta_sketch(when(col("p") > 150000.0, col("k")), 4096).as("ta"),
        theta_sketch(when(col("p") < 250000.0, col("k")), 4096).as("tb"),
        sum(when(col("p") > 150000.0, 1L).otherwise(0L)).as("ea"),
        sum(when(col("p") < 250000.0, 1L).otherwise(0L)).as("eb"),
        sum(when(col("p") > 150000.0 && col("p") < 250000.0, 1L).otherwise(0L)).as("ei"),
        count(lit(1)).as("eu")).head
      val ta = graft.core.ThetaSketch.deserialize(r.getAs[Array[Byte]]("ta"))
      val tb = graft.core.ThetaSketch.deserialize(r.getAs[Array[Byte]]("tb"))
      val (ea, eb, ei, eu) = (r.getAs[Long]("ea"), r.getAs[Long]("eb"), r.getAs[Long]("ei"), r.getAs[Long]("eu"))
      // intersection/difference error amplifies by |A∪B|/|result| (the
      // sample thins at min θ); 8% of the union + slack is ~5x RSE@k=4096
      val slack = math.ceil(0.08 * eu).toLong + 10
      def ok(est: Double, exact: Long, bound: Long): Boolean = math.abs(est - exact) <= bound
      Seq((ea, eb, ei,
        ok(ta.estimate, ea, math.ceil(0.0625 * ea).toLong + 10),
        ok(tb.estimate, eb, math.ceil(0.0625 * eb).toLong + 10),
        ok(ta.intersect(tb).estimate, ei, slack),
        ok(ta.aNotB(tb).estimate, ea - ei, slack),
        ok(ta.union(tb).estimate, eu, math.ceil(0.0625 * eu).toLong + 10)))
        .toDF("exact_a", "exact_b", "exact_inter", "ok_a", "ok_b", "ok_inter", "ok_diff", "ok_union")
    }),

    // --- counting Bloom: per-key counter ≥ exact frequency ---
    "q08_counting_bloom" -> ((s, dir) => {
      val ord = T(s, dir, "orders")
      val blob = ord.agg(counting_bloom_sketch(col("o_orderpriority"), 1000L, 0.01f))
        .head.getAs[Array[Byte]](0)
      ord.groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
        .select(col("o_orderpriority"), col("cnt"),
          (cbf_count(lit(blob), col("o_orderpriority")).cast("long") >= col("cnt")).as("ok"))
        .orderBy(col("o_orderpriority"))
    }),

    // --- set ops: union/intersect/jaccard + zero-false-negative probes ---
    "q09_bloom_setops" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
        .select(col("l_orderkey").cast("string").as("k"), (col("l_orderkey") % 2).as("par"))
      val evens = li.filter(col("par") === 0)
      val odds = li.filter(col("par") === 1)
      def build(df: DataFrame): Array[Byte] =
        df.agg(bloom_sketch(col("k"), 100000L, 0.01f)).head.getAs[Array[Byte]](0)
      val (a, b, all) = (build(evens), build(odds), build(li))
      val u = s.range(1).select(bloom_union(lit(a), lit(b)).as("u")).head.getAs[Array[Byte]]("u")
      val evCnt = evens.select(col("k")).distinct.count
      val odCnt = odds.select(col("k")).distinct.count
      val fnA = evens.filter(!bloom_might_contain(lit(a), col("k"))).count
      val fnU = li.filter(!bloom_might_contain(lit(u), col("k"))).count
      val jSelf = s.range(1).select(bloom_jaccard(lit(a), lit(a)).as("j")).head.getAs[Double]("j")
      val bitsEq = u.dropRight(20).sameElements(all.dropRight(20))
      import s.implicits._
      Seq((evCnt, odCnt, jSelf, fnA, fnU, bitsEq))
        .toDF("evens", "odds", "jaccard_self", "fn_a", "fn_union", "union_bits_equal")
    }),

    // --- exact dedup by 64-bit content fingerprint ---
    "q10_dedup_exact" -> ((s, dir) => {
      Dedup.exactGroups(dupDocs(s, dir), "doc_id", "text")
        .agg(count(lit(1)).as("groups"),
          sum(when(col("dup_count") > 1, 1L).otherwise(0L)).cast("long").as("dup_groups"),
          sum(col("dup_count")).cast("long").as("total"))
    }),

    // --- MinHash-LSH candidates, exact-verified (equals SQL self-join) ---
    "q11_dedup_minhash" -> ((s, dir) => {
      val d = dupDocs(s, dir)
      val cand = Dedup.minHashPairs(d, "doc_id", "text", 64, 16, 3, 0.9)
      cand.join(d.select(col("doc_id").as("id_a"), col("text").as("ta")), Seq("id_a"))
        .join(d.select(col("doc_id").as("id_b"), col("text").as("tb")), Seq("id_b"))
        .filter(col("ta") === col("tb"))
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // --- SimHash candidates (hamming ≤ 3), exact-verified ---
    "q12_dedup_simhash" -> ((s, dir) => {
      val d = dupDocs(s, dir)
      val cand = Dedup.simHashPairs(d, "doc_id", "text", 3)
      cand.join(d.select(col("doc_id").as("id_a"), col("text").as("ta")), Seq("id_a"))
        .join(d.select(col("doc_id").as("id_b"), col("text").as("tb")), Seq("id_b"))
        .filter(col("ta") === col("tb"))
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // --- pathological-duplicate corpus: the hot-bucket cap keeps LSH
    // banding linear while the exact route finds every duplicate (the
    // first failure a real Common-Crawl dedup run hits: one boilerplate
    // class of F copies is an F²/2-row band join without the cap) ---
    "q28_dedup_pathological" -> ((s, dir) => {
      import s.implicits._
      val base = T(s, dir, "documents").select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 2 === 0)
      val boiler = s.range(0, 300).select((col("id") + 5000000L).as("doc_id"),
        lit(BoilerText).as("text"))
      val d = base.unionAll(boiler)
      val edges = Dedup.nearDupPairsScaled(d, "doc_id", "text", 64, 16, 3, 0.9,
        maxBandFreq = 20L)
      // one aggregation job per pair table instead of cache + two counts
      // (guide §1.2 step 1: fewer passes — conditional counts are exact)
      val exactStats = edges.filter(col("kind") === "exact")
        .agg(count(lit(1)).as("c"), count(when(col("id_a") >= 5000000L, 1)).as("b")).head
      val (exactCnt, boilerCnt) = (exactStats.getAs[Long]("c"), exactStats.getAs[Long]("b"))
      // uncapped banding over JUST the boilerplate class shows the F^2/2
      // blowup (300 copies -> 44850 candidate pairs) without paying a
      // full-corpus uncapped pass; the capped full run must contain zero
      // boiler-boiler pairs (all their band buckets are over the cap)
      val uncappedBoiler = Dedup.minHashPairs(boiler, "doc_id", "text", 64, 16, 3, 0.9).count()
      val cappedStats = Dedup.minHashPairs(d, "doc_id", "text", 64, 16, 3, 0.9, 20L)
        .agg(count(lit(1)).as("c"),
          count(when(col("id_a") >= 5000000L && col("id_b") >= 5000000L, 1)).as("b")).head
      val (cappedCnt, cappedBoiler) = (cappedStats.getAs[Long]("c"), cappedStats.getAs[Long]("b"))
      val docs = d.count()
      Seq((exactCnt, boilerCnt, uncappedBoiler >= 40000L && cappedBoiler == 0L, cappedCnt <= docs))
        .toDF("exact_edges", "boiler_edges", "cap_engaged", "near_linear")
    }),

    // --- n-gram Jaccard pairs: integer-exact, oracle runs it verbatim ---
    "q13_dedup_ngram" -> ((s, dir) => {
      val d = dupDocs(s, dir).filter(col("doc_id") % 5 === 0)
      Dedup.ngramJaccardPairs(d, "doc_id", "text", 16, 4, 1, 2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // --- brute-force ANN baseline: integer-quantized dot, exact top-3 ---
    "q14_embed_knn" -> ((s, dir) => {
      // quantize each vector ONCE per row before the cross join instead of
      // per (query, neighbor) pair inside it (guide §1.2 step 2): the
      // floor(x*1000) longs are identical either way, so products and the
      // in-order sum — hence qdot and the ranking — are bit-identical
      val emb = T(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), Similarity.quantizeForDot(col("embedding")).as("qv"))
      val c = emb.select(col("vec_id").as("neighbor_id"), Similarity.quantizeForDot(col("embedding")).as("cv"))
      val scored = c.crossJoin(broadcast(q))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          Similarity.quantizedDotPre(col("qv"), col("cv")).as("qdot"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("qdot").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 3)
        .orderBy(col("query_id"), col("rank"))
    }),

    // --- LSH ANN vs brute-force: recall property + exact anchors ---
    "q15_lsh_recall" -> ((s, dir) => {
      import s.implicits._
      val emb = T(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 100 === 0)
      val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id")).cache()
      val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding", 10, 4, 16)
        .select(col("query_id"), col("neighbor_id"))
      val total = brute.count
      val hits = lsh.join(brute, Seq("query_id", "neighbor_id"), "left_semi").count
      brute.unpersist()
      Seq((q.count, 10, total, hits.toDouble / total >= 0.6))
        .toDF("queries", "k", "brute_pairs", "recall_ok")
    }),

    // --- IVF ANN vs brute-force: recall property + exact anchors ---
    "q27_ivf_recall" -> ((s, dir) => {
      import s.implicits._
      val emb = T(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 100 === 0)
      val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id")).cache()
      val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 10, 8, 4)
        .select(col("query_id"), col("neighbor_id"))
      val total = brute.count
      val hits = ivf.join(brute, Seq("query_id", "neighbor_id"), "left_semi").count
      brute.unpersist()
      Seq((q.count, 10, total, hits.toDouble / total >= 0.5))
        .toDF("queries", "k", "brute_pairs", "recall_ok")
    }),

    // --- IVF-PQ ANN (compressed codes + ADC + exact refine) vs brute ---
    "q32_ivfpq_recall" -> ((s, dir) => {
      import s.implicits._
      val emb = T(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 100 === 0)
      val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id")).cache()
      val pq = graft.ops.IvfPq.topK(emb, q, "vec_id", "embedding", 10,
          nCentroids = 8, nProbe = 4, m = 8, ks = 16, refineFactor = 8)
        .select(col("query_id"), col("neighbor_id"))
      val total = brute.count
      val hits = pq.join(brute, Seq("query_id", "neighbor_id"), "left_semi").count
      brute.unpersist()
      Seq((q.count, 10, total, hits.toDouble / total >= 0.5))
        .toDF("queries", "k", "brute_pairs", "recall_ok")
    }),

    // --- text analysis: token counts (whitespace + subword estimate) ---
    "q16_text_stats" -> ((s, dir) => {
      T(s, dir, "documents").select(col("doc_id"),
        length(col("text")).cast("long").as("chars"),
        TextOps.tokenCount(col("text")).cast("long").as("tokens"),
        TextOps.subwordTokenEstimate(col("text")).cast("long").as("subword_tokens"))
        .orderBy(col("doc_id"))
    }),

    // --- language-ID voting, mirrored verbatim by the oracle SQL ---
    "q17_langid" -> ((s, dir) => {
      val sfx = TextOps.Stopwords.toSeq.sortBy(_._1).map { case (l, ws) =>
        (l, ws.take(3).mkString(" "))
      }
      val sfxCol = sfx.foldLeft(lit("")) { case (acc, (l, w)) =>
        when(col("lang") === l, lit(w)).otherwise(acc)
      }
      T(s, dir, "documents")
        .withColumn("t2", concat(col("text"), lit(" "), sfxCol))
        .select(col("doc_id"), TextOps.langId(col("t2")).as("pred"))
        .orderBy(col("doc_id"))
    }),

    // --- quality scoring, mirrored verbatim by the oracle SQL ---
    "q18_quality" -> ((s, dir) => {
      val st = TextOps.qualityStats(col("text"))
      T(s, dir, "documents").select(col("doc_id"),
        st.getField("chars").cast("long").as("chars"),
        st.getField("tokens").cast("long").as("tokens"),
        st.getField("mean_token_len").as("mean_token_len"),
        st.getField("punct_ratio").as("punct_ratio"),
        st.getField("digit_ratio").as("digit_ratio"),
        st.getField("upper_ratio").as("upper_ratio"),
        TextOps.qualityScore(col("text")).as("score"))
        .orderBy(col("doc_id"))
    }),

    // --- ccnet-style canonical normalization before dedup: copies that
    // differ only in case/punctuation collapse to one normalized form ---
    "q34_normalized_dedup" -> ((s, dir) => {
      val docs = T(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
      val copies = docs.filter(col("lang") === "en" && col("doc_id") % 5 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(upper(col("text")), lit("!!!")).as("text"))
      docs.select(col("doc_id"), col("text")).unionAll(copies)
        .agg(count(lit(1)).as("total"),
          countDistinct(col("text")).as("raw_distinct"),
          countDistinct(TextOps.normalizeForDedup(col("text"))).as("norm_distinct"))
    }),

    // --- paragraph-level boilerplate removal (ccnet/RefinedWeb step):
    // a paragraph in >= 50 distinct docs is dropped everywhere, order
    // preserved — full 500-row text output hash-matched vs the oracle ---
    "q35_paragraph_dedup" -> ((s, dir) => {
      val d = T(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 2 === 0,
          concat(lit("SHARED BOILERPLATE LINE\n"), col("text")))
          .otherwise(col("text")).as("text"))
      Dedup.paragraphDedup(d, "doc_id", "text", 50L).orderBy(col("doc_id"))
    }),

    // --- Gopher-style repetition signals (dup-line / dup-word fractions) ---
    "q36_repetition_stats" -> ((s, dir) => {
      val d = T(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 2 === 1, concat_ws("\n", col("text"), col("text")))
          .otherwise(col("text")).as("t2"))
      d.select(col("doc_id"),
        TextOps.dupLineFraction(col("t2")).as("dup_line_frac"),
        TextOps.dupWordFraction(col("t2")).as("dup_word_frac"))
        .orderBy(col("doc_id"))
    }),

    // --- URL canonicalization (crawl-level dedup key): scheme/host case,
    // default ports, fragments, tracking params, param order all collapse ---
    "q38_url_canonical" -> ((s, dir) => {
      val d = T(s, dir, "documents").select(col("doc_id"),
        concat(lit("HTTP://Example"), col("doc_id") % 50, lit(".COM:80/path/"), col("doc_id"),
          when(col("doc_id") % 2 === 0, lit("?utm_source=feed&b=2&a=1#frag"))
            .otherwise(lit("?a=1&b=2"))).as("url"))
      d.select(col("doc_id"), TextOps.canonicalizeUrl(col("url")).as("canon"))
        .orderBy(col("doc_id"))
    }),

    // --- salted two-level aggregation == unsalted (hot-key skew defuse) ---
    "q19_salted_group" -> ((s, dir) => {
      val d = T(s, dir, "documents")
        .select(col("lang"), col("doc_id").cast("string").as("k"))
      val salted = SketchPipeline.saltedGroupBy(d, "lang", "k", 8,
        c => bloom_sketch(c, 10000L, 0.01f), bloom_merge)
      val unsalted = d.groupBy(col("lang"))
        .agg(bloom_sketch(col("k"), 10000L, 0.01f).as("direct"))
      val probes = d.join(salted, "lang").groupBy(col("lang"))
        .agg(count(lit(1)).as("cnt"),
          sum(when(bloom_might_contain(col("sketch"), col("k")), 0L).otherwise(1L)).as("fn"))
      salted.join(unsalted, "lang").join(probes, "lang")
        .select(col("lang"), col("cnt"), col("fn"),
          (bloom_to_hex(col("sketch")) === bloom_to_hex(col("direct"))).as("bits_equal"))
        .orderBy(col("lang"))
    }),

    // --- checkpoint/resume: kill-mid-job replay equals the direct build ---
    "q20_checkpoint_resume" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
      val src = s"$tmp/src"
      T(s, dir, "documents").select(col("doc_id").cast("string").as("k"))
        .repartition(8).write.mode("overwrite").parquet(src)
      val files = new java.io.File(src).listFiles
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq.sorted
      val direct = s.read.parquet(files: _*)
        .agg(bloom_sketch(col("k"), 10000L, 0.01f)).head.getAs[Array[Byte]](0)
      val failed = scala.util.Try(SketchPipeline.buildBloomCheckpointed(
        s, files, "k", 10000L, 0.01f, s"$tmp/ckpt", 4, simulateFailureAfter = 2))
      val resumed = SketchPipeline.buildBloomCheckpointed(
        s, files, "k", 10000L, 0.01f, s"$tmp/ckpt", 4)
      val keys = s.read.parquet(files: _*)
      val fn = keys.filter(!bloom_might_contain(lit(resumed), col("k"))).count
      Seq((keys.count, 4, failed.isFailure, resumed.sameElements(direct), fn))
        .toDF("keys", "groups", "first_run_killed", "resumed_equals_direct", "fn")
    }),

    // --- parallelism invariance (port of bloom_multi_thread.c:64-78) ---
    "q21_parallelism_invariance" -> ((s, dir) => {
      import s.implicits._
      val li = T(s, dir, "lineitem").select(col("l_orderkey").cast("string").as("k"))
      def blooms(parts: Int) = li.repartition(parts)
        .agg(bloom_sketch(col("k"), 100000L, 0.01f).as("b"), hll_sketch(col("k"), 14).as("h")).head
      val (r2, r32) = (blooms(2), blooms(32))
      Seq((li.count,
        r2.getAs[Array[Byte]]("b").sameElements(r32.getAs[Array[Byte]]("b")),
        r2.getAs[Array[Byte]]("h").sameElements(r32.getAs[Array[Byte]]("h"))))
        .toDF("n_rows", "bloom_equal", "hll_equal")
    }),

    // --- multimodal plumbing: decode-stub features + frame sampling ---
    "q22_multimodal" -> ((s, _) => {
      import s.implicits._
      val media = Multimodal.syntheticMedia(s, 200, 8)
      val feats = Multimodal.extractFeatures(media, 64).cache()
      val byType = feats.groupBy(col("media_type")).count.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val decoded = feats.filter(col("decode_ok") && col("feature_dim") === 64).count
      val frames = Multimodal.sampleFrames(media, 500, 16).count
      feats.unpersist()
      Seq((200L, byType("image"), byType("audio"), byType("video"), decoded, frames))
        .toDF("n", "images", "audio", "video", "decoded", "frames")
    }),

    // --- windowed running aggregate over the events stream table ---
    "q24_window_running" -> ((s, dir) => {
      val ev = T(s, dir, "events").filter(col("user_id") % 100 === 0)
        .select(col("user_id"), col("event_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.select(col("user_id"), col("event_id"),
        sum(col("cents")).over(w).as("running_cents"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // --- rollup (grouping sets come free once the UDAFs exist, §2.7) ---
    "q25_rollup" -> ((s, dir) => {
      T(s, dir, "documents")
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).cast("long").as("chars"))
        .select(coalesce(col("lang"), lit("<all>")).as("lang"),
          coalesce(col("source"), lit("<all>")).as("source"),
          col("cnt"), col("chars"))
        .orderBy(col("lang"), col("source"))
    }),

    // --- sharded Bloom semi-join (the 10^12-key deployment shape) ---
    "q26_sharded_bloom_semijoin" -> ((s, dir) => {
      import graft.pipeline.ShardedBloom
      val hi = T(s, dir, "orders").filter(col("o_totalprice") > 250000.0)
      val parts = ShardedBloom.build(hi, "o_orderkey", 100000L, 0.01f, 16)
      val shards = ShardedBloom.collectShards(parts, 100000L, 0.01f, 16)
      val li = T(s, dir, "lineitem")
      li.filter(ShardedBloom.mightContain(shards, col("l_orderkey")))
        .join(hi.select(col("o_orderkey")), li("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // --- sharded Bloom, large-B probe path: the parts table stays
    // DISTRIBUTED and probes run as a bucket-equi-join — same answer as
    // q26's broadcast-variable path, no blob on the driver or in the plan ---
    "q29_sharded_bloom_join" -> ((s, dir) => {
      import graft.pipeline.ShardedBloom
      val hi = T(s, dir, "orders").filter(col("o_totalprice") > 250000.0)
      val parts = ShardedBloom.build(hi, "o_orderkey", 100000L, 0.01f, 16)
      val li = T(s, dir, "lineitem")
      ShardedBloom.semiJoin(li, "l_orderkey", parts, 16)
        .join(hi.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // --- embedding near-dup pairs, exact-verified: LSH buckets identical
    // vectors together by construction, so candidates ⊇ all exact-equal
    // pairs; the vector-equality filter makes the result oracle-exact ---
    "q30_embed_neardup" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val d = emb.unionAll(emb.filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      val cand = Dedup.embeddingNearDupPairs(d, "vec_id", "embedding", 0.999999, 8, 42L)
      cand.join(d.select(col("vec_id").as("id_a"), col("embedding").as("va")), Seq("id_a"))
        .join(d.select(col("vec_id").as("id_b"), col("embedding").as("vb")), Seq("id_b"))
        .filter(col("va") === col("vb"))
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // --- CMS heavy hitters: skewed key (one hot key at ~10% among ~10k
    // light keys), candidate superset via map-side cms_query filter, exact
    // counts after — result is exact, oracle is plain GROUP BY/HAVING ---
    "q31_heavy_hitters" -> ((s, dir) => {
      val li = T(s, dir, "lineitem").select(
        when(col("l_orderkey") % 10 === 0, lit("hot"))
          .otherwise(concat(lit("k"), col("l_orderkey") % 10000)).as("key"))
      graft.ops.HeavyHitters.exact(li, "key", 0.01, 1e-4, 0.01)
        .orderBy(col("key"))
    }),

    // --- auto-injected runtime Bloom pre-filter (RuntimeBloomJoin rule):
    // the rewritten join must answer exactly like the plain join (zero
    // false negatives in the filter; FPs fall to the exact join) ---
    "q37_runtime_bloom_join" -> ((s, dir) => {
      import s.implicits._
      val rule = graft.plans.RuntimeBloomJoin(s)
      s.experimental.extraOptimizations = s.experimental.extraOptimizations :+ rule
      s.conf.set("spark.graft.runtimeBloomJoin.enabled", "true")
      try {
        val li = T(s, dir, "lineitem")
        val hi = T(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
          .select(col("o_orderkey"))
        val j = li.join(hi, li("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).cast("long").as("sum_qty"))
          .orderBy(col("l_returnflag"))
        val rewritten = j.queryExecution.optimizedPlan.toString.contains("bloom_might_contain")
        // collect while the rule is active so the EXECUTED plan is the
        // rewritten one; re-emit as a local result
        j.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), rewritten)).toSeq
          .toDF("l_returnflag", "cnt", "sum_qty", "rewritten")
      } finally {
        s.conf.unset("spark.graft.runtimeBloomJoin.enabled")
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations.filterNot(_ eq rule)
      }
    }),

    // --- real compressed-image decode (JDK javax.imageio, zero new deps):
    // PNG rows must round-trip to the EXACT original pixels, JPEG rows
    // must decode with exact dimensions, magic-corrupted rows must fail
    // cleanly, and resize must run on compressed inputs ---
    "q39_imageio_decode" -> ((s, _) => {
      import s.implicits._
      val n = 240L
      val media = Multimodal.syntheticCompressedMedia(s, n, 8)
      val per = media.map { m =>
        val dec = MediaCodecs.decodeImage(m.media)
        val cls = (m.media_id % 4).toInt
        val dimsOk = dec.exists(d => d.width == m.width && d.height == m.height)
        val exact = dimsOk && dec.exists(d => java.util.Arrays.equals(
          d.rgb, Multimodal.patternRgb(42L ^ m.media_id, m.width, m.height)))
        (cls, dec.isDefined, dimsOk, exact)
      }.toDF("cls", "ok", "dims_ok", "exact")
      val resized = Multimodal.resizeImages(
        media.filter(col("media_id") % 4 < 2), 8, 8)
        .filter(col("resized")).count
      per.agg(
        count(when(col("cls") === 0 && col("exact"), 1)).as("png_exact"),
        count(when(col("cls") === 1 && col("dims_ok"), 1)).as("jpeg_ok"),
        count(when(col("cls") === 2 && col("exact"), 1)).as("ppm_exact"),
        count(when(col("cls") === 3 && !col("ok"), 1)).as("corrupt_failed"))
        .withColumn("resized", lit(resized))
    }),

    // --- HLL sparse wire format: per-ORDER sketches are thousands of
    // tiny groups — the sparse encoding must kick in (every blob < 100 B
    // vs 16 KB dense at p=14), estimates must stay within bound, and the
    // shuffle that carries the partial blobs shrinks ~500x ---
    "q40_hll_sparse_groups" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      // two aggregations + join: never mix a TypedImperativeAggregate
      // with a distinct aggregate in one agg (buffer-per-distinct-key)
      val sk = li.groupBy(col("l_orderkey"))
        .agg(hll_sketch(col("l_partkey").cast("string"), 14).as("sk"))
      val ex = li.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_partkey")).as("exact"))
      sk.join(ex, "l_orderkey")
        .select(col("l_orderkey"),
          hll_estimate(col("sk")).as("est"), col("exact"), length(col("sk")).as("blob"))
        .agg(
          count(lit(1)).as("n_groups"),
          (sum(when(abs(col("est") - col("exact")).cast("double")
            > lit(1.0) + lit(0.03) * col("exact").cast("double"), 1).otherwise(0)) === 0).as("all_ok"),
          (max(col("blob")) < 100).as("blobs_tiny"))
    }),

    // --- IVF-PQ persisted index: train once, save (versioned model blob
    // + parquet codes), then SERVE purely from the files — chunked ADC
    // broadcasts (batch=3 forces many bounded broadcasts), exact refine,
    // recall vs brute force; the reloaded model must be byte-identical ---
    "q41_ivfpq_persist" -> ((s, dir) => {
      import s.implicits._
      val emb = T(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 100 === 0)
      val sample = Similarity.trainingSample(
        emb.select(col("vec_id").cast("long").as("_id"), col("embedding").as("_v")), 4096)
      val model = graft.ops.IvfPq.train(sample, 8, 8, 16)
      val idxDir = java.nio.file.Files.createTempDirectory("graft_q41").toString + "/index"
      graft.ops.IvfPq.saveIndex(emb, "vec_id", "embedding", model, idxDir)
      val modelOk = java.util.Arrays.equals(
        graft.ops.IvfPq.serializeModel(graft.ops.IvfPq.loadModel(s, idxDir)),
        graft.ops.IvfPq.serializeModel(model))
      val served = graft.ops.IvfPq.searchIndex(s, idxDir, q, "vec_id", "embedding",
        k = 80, nProbe = 4, maxQueriesPerBatch = 3)
      val withVecs = served.select(col("query_id"), col("neighbor_id"))
        .join(emb.select(col("vec_id").cast("long").as("neighbor_id"),
          col("embedding").as("cv")), Seq("neighbor_id"))
        .join(broadcast(q.select(col("vec_id").cast("long").as("query_id"),
          col("embedding").as("qv"))), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          Similarity.cosineColumn(col("qv"), col("cv")).as("cosine"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      val pq = withVecs.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10).select(col("query_id"), col("neighbor_id"))
      val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id")).cache()
      val total = brute.count
      val hits = pq.join(brute, Seq("query_id", "neighbor_id"), "left_semi").count
      brute.unpersist()
      Seq((q.count, 10, total, hits.toDouble / total >= 0.5, modelOk))
        .toDF("queries", "k", "brute_pairs", "recall_ok", "model_roundtrip_ok")
    }),

    // --- Misra-Gries single-pass heavy hitters (vs the CMS path q31,
    // which needs a second scan for candidates): every key with frequency
    // > n/(k+1) is guaranteed retained; estimates bracket the exact count
    // from below by the summary's decrement total. The derived key is
    // deliberately skewed (5 hot event types on 2/3 of rows, ~cold
    // per-user keys on the rest) so compress() actually engages, and the
    // emitted columns are merge-order-invariant: the bound booleans hold
    // for ANY partial-aggregation order (PODS 2012), and the top-5 set
    // equality holds because min(hot est) >= hot - n/(k+1) > max cold
    // count at every SF of this generator ---
    "q42_mg_heavyhitters" -> ((s, dir) => {
      val ev = T(s, dir, "events")
        .select(when(col("event_id") % 3 =!= 0, col("event_type"))
          .otherwise(concat(lit("u"), col("user_id"))).as("key"))
      val agg = ev.agg(mg_sketch(col("key"), 16).as("m"), count(lit(1)).as("n")).head
      val (blob, n) = (agg.getAs[Array[Byte]]("m"), agg.getAs[Long]("n"))
      val thr = n / 17 // guaranteed-presence threshold n/(k+1)
      // grouped counts feed BOTH the exact top-5 and the output rows —
      // materialize them once instead of re-scanning events per consumer.
      // The returned plan reads the cache, so it cannot unpersist here;
      // blocks are tiny (one row per distinct key) and the harness clears
      // the cache between queries (Store.Cache lifetime convention)
      val grouped = ev.groupBy(col("key")).agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val exactTop5 = grouped
        .orderBy(col("cnt").desc, col("key").asc).limit(5)
        .collect().map(_.getString(0)).toSet
      val topOk = graft.core.MgSketch.deserialize(blob).topK(5).toSet == exactTop5
      val est = mg_estimate(lit(blob), col("key"))
      grouped
        .filter(col("cnt") > lit(thr))
        .select(col("key"), col("cnt"),
          (est <= col("cnt") && est >= col("cnt") - mg_error_bound(lit(blob)) &&
            est > lit(0L)).as("ok"),
          (mg_error_bound(lit(blob)) * lit(17L) <= lit(n)).as("bound_ok"),
          (mg_total_count(lit(blob)) === lit(n)).as("total_ok"),
          lit(topOk).as("top5_ok"))
        .orderBy(col("key"))
    }),

    // --- KLL-driven equi-depth range partitioning: sketch-derived cut
    // points put every bucket within 2x the published rank error
    // (1.75/k) of the n/p target, with no planning-time sample job —
    // the explicit skew-defusing repartition spec, derivable from
    // already-checkpointed sketch states at scale ---
    "q43_kll_range_partition" -> ((s, dir) => {
      val li = T(s, dir, "lineitem").select(col("l_extendedprice").cast("double").as("v"))
      val p = 8
      val kllK = 400
      // sketch + row count in ONE scan (guide §1.2 step 1; the former
      // boundaries() + count() shape scanned lineitem twice)
      val (bounds, n) = graft.ops.RangePartition.boundariesAndCount(li, "v", p, kllK)
      val tol = 2.0 * (1.75 / kllK)
      li.select(graft.ops.RangePartition.bucketColumn(col("v"), bounds).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
        .select(col("bucket"),
          (abs(col("cnt").cast("double") / lit(n.toDouble) - lit(1.0 / p))
            <= lit(tol)).as("ok"),
          lit(bounds.length == p - 1).as("cuts_ok"))
        .orderBy(col("bucket"))
    }),

    // --- bottom-k-by-hash distinct sample: per-group uniform example
    // sample that retains values, bitwise deterministic at any
    // partitioning (the audit-sample operator). Emitted facts are
    // invariant: exact sample size, cross-partitioning blob equality,
    // membership of every sampled key in its group ---
    "q44_bottomk_sample" -> ((s, dir) => {
      val d = T(s, dir, "documents").select(col("lang"), col("doc_id").cast("string").as("k"))
      val b1 = d.groupBy(col("lang")).agg(bottomk_sample(col("k"), 10).as("b"))
      val b2 = d.repartition(7, col("k"))
        .groupBy(col("lang")).agg(bottomk_sample(col("k"), 10).as("b2"))
      val membersOk = b1.select(col("lang"), explode(bk_values(col("b"))).as("k"))
        .join(d, Seq("lang", "k"), "left_anti").count() == 0
      b1.join(b2, "lang")
        .select(col("lang"), size(bk_values(col("b"))).as("sample_size"),
          (col("b") === col("b2")).as("deterministic"),
          lit(membersOk).as("members_ok"))
        .orderBy(col("lang"))
    }),

    // --- weighted distinct sample (Efraimidis-Spirakis A-Res): k keys
    // per group with inclusion probability scaling with weight,
    // mergeable + bitwise deterministic at any partitioning. Emitted
    // facts are invariant: sample size, cross-partitioning blob
    // equality, membership of every sampled key in its group ---
    "q48_weighted_sample" -> ((s, dir) => {
      val d = T(s, dir, "documents").select(col("lang"),
        concat(lit("d"), col("doc_id")).as("k"),
        (col("n_chars") + 1).cast("long").as("w"))
      val b1 = d.groupBy(col("lang")).agg(weighted_sample(col("k"), col("w"), 10).as("b"))
      val b2 = d.repartition(7, col("k"))
        .groupBy(col("lang")).agg(weighted_sample(col("k"), col("w"), 10).as("b2"))
      val membersOk = b1.select(col("lang"), explode(ws_values(col("b"))).as("k"))
        .join(d, Seq("lang", "k"), "left_anti").count() == 0
      b1.join(b2, "lang")
        .select(col("lang"), size(ws_values(col("b"))).as("sample_size"),
          (col("b") === col("b2")).as("deterministic"),
          lit(membersOk).as("members_ok"))
        .orderBy(col("lang"))
    }),

    // --- weighted Misra-Gries heavy hitters: heavy by TOTAL WEIGHT
    // (bytes per domain, tokens per url — the pipeline ask), same
    // guarantees with n = total weight W. floor(value) keeps the weight
    // derivation Spark/DuckDB-exact ---
    "q45_mg_weighted" -> ((s, dir) => {
      val ev = T(s, dir, "events")
        .select(when(col("event_id") % 3 =!= 0, col("event_type"))
          .otherwise(concat(lit("u"), col("user_id"))).as("key"),
          floor(col("value")).cast("long").as("w"))
      val agg = ev.agg(mg_sketch_weighted(col("key"), col("w"), 16).as("m"),
        sum(col("w")).as("tw")).head
      val (blob, tw) = (agg.getAs[Array[Byte]]("m"), agg.getAs[Long]("tw"))
      val thr = tw / 17
      val est = mg_estimate(lit(blob), col("key"))
      ev.groupBy(col("key")).agg(sum(col("w")).as("wt"))
        .filter(col("wt") > lit(thr))
        .select(col("key"), col("wt"),
          (est <= col("wt") && est >= col("wt") - mg_error_bound(lit(blob)) &&
            est > lit(0L)).as("ok"),
          (mg_error_bound(lit(blob)) * lit(17L) <= lit(tw)).as("bound_ok"),
          (mg_total_count(lit(blob)) === lit(tw)).as("total_ok"))
        .orderBy(col("key"))
    }),

    // --- near-dup cluster resolution (large-star/small-star, SoCC 2014):
    // transitive chains A~B~C with A!~C must collapse to ONE min-id rep.
    // Deterministic corpus: 4 chains of 5 sliding 180-char windows over a
    // non-repeating digit tape, stride 44 — consecutive windows share
    // 31/53 n-gram Jaccard (edge at threshold 1/2), skip-one windows
    // 20/64 (no edge), chains occupy disjoint tape regions. The oracle
    // recomputes the identical edge set relationally and resolves
    // components with a recursive CTE ---
    "q46_neardup_clusters" -> ((s, dir) => {
      val base = "array_join(transform(sequence(0, 1099), i -> lpad(cast(i as string), 4, '0')), '')"
      val docs = s.range(20).select(col("id"),
        expr(s"substring($base, cast((id div 5) * 1000 + (id % 5) * 44 + 1 as int), 180)").as("t"))
      val edges = Dedup.ngramJaccardPairs(docs, "id", "t", 16, 4, 1, 2)
        .select(col("id_a"), col("id_b"))
      val mapping = Dedup.resolveClusters(edges)
      docs.select(col("id"))
        .join(mapping, Seq("id"), "left")
        .select(col("id"), coalesce(col("rep_id"), col("id")).as("rep_id"))
        .withColumn("survivor", col("id") === col("rep_id"))
        .orderBy(col("id"))
    }),

    // --- non-canonical audio decode via the JDK's own javax.sound.sampled
    // (the audio analog of q39's imageio move, zero new jars): stereo
    // PCM16 downmixes by the exact truncating channel average, PCM8
    // widens within one 8-bit step (zero-anchored), canonical mono PCM16
    // stays byte-exact on the fast path, corrupt bytes fail cleanly ---
    "q47_audio_decode" -> ((s, _) => {
      import s.implicits._
      val n = 200L
      val per = s.range(0, n, 1, 8).map { i =>
        val cls = (i % 4).toInt
        val len = 300 + (i % 50).toInt
        def samples(seed: Long): Array[Short] = Array.tabulate(len) { j =>
          (graft.core.Fnv.splitmix64(seed * 4096 + j) % 28000L).toShort
        }
        val l = samples(i * 2 + 1)
        val r = samples(i * 2 + 2)
        cls match {
          case 0 =>
            val dec = MediaCodecs.decodeAudio(MediaCodecs.encodeWavStereo(8000, l, r))
            val want = Array.tabulate(len)(j => ((l(j) + r(j)) / 2).toShort)
            (cls, dec.exists(d => d._1 == 8000 && java.util.Arrays.equals(d._2, want)))
          case 1 =>
            val u = Array.tabulate(len)(j =>
              (graft.core.Fnv.splitmix64(i * 4096 + j) & 0xff).toByte)
            val dec = MediaCodecs.decodeAudio(MediaCodecs.encodeWavPcm8(11025, u))
            val ok = dec.exists { case (rate, sd) =>
              rate == 11025 && sd.length == len && sd.indices.forall { j =>
                val nominal = ((u(j) & 0xff) - 128) << 8
                math.abs(sd(j) - nominal) <= 256 && ((u(j) & 0xff) != 128 || sd(j) == 0)
              }
            }
            (cls, ok)
          case 2 =>
            val dec = MediaCodecs.decodeAudio(MediaCodecs.encodeWav(16000, l))
            (cls, dec.exists(d => d._1 == 16000 && java.util.Arrays.equals(d._2, l)))
          case _ =>
            val b = MediaCodecs.encodeWavStereo(8000, l, r)
            b(0) = 'X'.toByte
            (cls, MediaCodecs.decodeAudio(b).isEmpty)
        }
      }.toDF("cls", "ok")
      per.agg(
        count(when(col("cls") === 0 && col("ok"), 1)).as("stereo_exact"),
        count(when(col("cls") === 1 && col("ok"), 1)).as("pcm8_ok"),
        count(when(col("cls") === 2 && col("ok"), 1)).as("mono_exact"),
        count(when(col("cls") === 3 && col("ok"), 1)).as("corrupt_failed"))
    }),

    // --- int8 embedding quantization: 4x storage residency with
    // reconstruction error <= scale/2 per component, exact idempotent
    // re-quantization, length preservation — all verified per vector ---
    // --- quantized-corpus ANN read path: the int8 struct column feeds
    // lshTopK directly (dequantize runs INSIDE the bucketing/scoring
    // stages — the candidate exchange still ships ids only), and the
    // quantized search loses at most a few borderline pairs vs the float
    // path (the documented ≤2% cosine fidelity) ---
    "q50_quantized_ann" -> ((s, dir) => {
      import s.implicits._
      val emb = T(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 100 === 0)
      val quant = emb.select(col("vec_id"),
        vec_quantize_int8(col("embedding")).as("embedding"))
      val quantQ = quant.filter(col("vec_id") % 100 === 0)
      val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id")).cache()
      val total = brute.count
      val hitsF = Similarity.lshTopK(emb, q, "vec_id", "embedding", 10, 4, 16)
        .select(col("query_id"), col("neighbor_id"))
        .join(brute, Seq("query_id", "neighbor_id"), "left_semi").count
      val hitsQ = Similarity.lshTopK(quant, quantQ, "vec_id", "embedding", 10, 4, 16)
        .select(col("query_id"), col("neighbor_id"))
        .join(brute, Seq("query_id", "neighbor_id"), "left_semi").count
      brute.unpersist()
      // quantized recall within 5 points of the float path AND usable
      Seq((q.count, 10, total,
        hitsQ.toDouble / total >= hitsF.toDouble / total - 0.05,
        hitsQ.toDouble / total >= 0.55))
        .toDF("queries", "k", "brute_pairs", "recall_close_to_float", "recall_ok")
    }),

    // --- sum-weight sampling: weightedSampleByTotal pre-aggregates
    // per-key totals (groupBy.sum — the sum-semantics complement to the
    // sample's max-weight contract), k > #langs returns EVERY lang with
    // its exact total (deterministic, oracle-checkable); the small-k
    // property (bottom-k by A-Res priority over the totals) is verified
    // against a local oracle and returned as a boolean ---
    "q51_weighted_total" -> ((s, dir) => {
      import s.implicits._
      val d = T(s, dir, "documents")
        .select(col("lang"), (col("n_chars") + 1).cast("long").as("w"))
      val all = Sampling.weightedSampleByTotal(d, "lang", "w", 1000)
      val totals = all.as[(String, Long)].collect()
      val wantSmall = totals
        .sortBy { case (k, w) => (graft.core.WeightedSample.testPriority(k, w), k) }
        .take(3).map(_._1).toSet
      val gotSmall = Sampling.weightedSampleByTotal(d, "lang", "w", 3)
        .as[(String, Long)].collect().map(_._1).toSet
      all.withColumn("small_k_ok", lit(gotSmall == wantSmall))
        .orderBy(col("lang"))
    }),

    // --- cross-snapshot duplicate-mass pre-flight: theta sketches of the
    // content fingerprints, KMV set algebra on the two blobs. nominalK
    // 16384 > distinct contents at every test SF -> exact mode, so every
    // estimate is the true distinct count and the ratios divide exactly
    // the same integers the oracle divides ---
    "q52_snapshot_overlap" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val snapA = docs.filter(col("doc_id") % 2 === 0)
      val snapB = docs.filter(col("doc_id") % 3 === 0)
      Dedup.snapshotOverlap(snapA, snapB, "text", 16384)
    }),

    // --- benchmark decontamination: every 97th doc plays the held-out
    // eval set; the exact path (bench shingles broadcast, stride-1 on the
    // bench side so no alignment is ever missed) is the oracle row set,
    // and the map-only Bloom path is verified as a no-false-negative
    // superset of it in the same query ---
    "q53_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val all = T(s, dir, "documents")
      val bench = all.filter(col("doc_id") % 97 === 0)
      val docs = all.filter(col("doc_id") % 97 =!= 0)
      val exact = Decontaminate.flag(docs, "doc_id", "text", bench, "text",
        width = 16, step = 4, minHits = 8L, minFrac = 0.5)
      val blob = Decontaminate.buildBenchFilter(bench, "text", 16, 100000L, 0.0001f)
      val bloomHits = Decontaminate.overlapStatsBloom(docs, "doc_id", "text", blob, 16, 4)
        .select(col("id"), col("contaminated").as("b"))
      val fn = exact.join(bloomHits, Seq("id"))
        .filter(col("b") < col("contaminated")).count()
      exact.withColumn("bloom_no_false_neg", lit(fn == 0L)).orderBy(col("id"))
    }),

    // --- token-budget curation: keep the global (score DESC, id) greedy
    // prefix at 2/5 of the corpus tokens, computed KLL-bucketed — only the
    // single boundary bucket pays a sort; the oracle runs the full
    // windowed prefix sum and must select the identical document set ---
    "q54_token_budget" -> ((s, dir) => {
      val d = T(s, dir, "documents").select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("score"),
        TextOps.tokenCount(col("text")).cast("long").as("tokens"))
      Curation.selectWithinBudgetFraction(d, "doc_id", "score", "tokens", 2, 5,
          numBuckets = 64)
        .select(col("doc_id").as("id"), col("tokens"))
        .orderBy(col("id"))
    }),

    // --- per-group token budgets ("2k tokens per language"): windowed
    // prefix sum partitioned by group — groups parallelize across tasks;
    // the oracle runs the identical per-lang window ---
    "q56_budget_per_group" -> ((s, dir) => {
      val d = T(s, dir, "documents").select(col("doc_id"), col("lang"),
        TextOps.qualityScore(col("text")).as("score"),
        TextOps.tokenCount(col("text")).cast("long").as("tokens"))
      Curation.selectWithinBudgetPerGroup(d, "lang", "doc_id", "score", "tokens", 2000L)
        .select(col("lang"), col("doc_id").as("id"), col("tokens"))
        .orderBy(col("lang"), col("id"))
    }),

    // --- PII scrubbing: deterministic synthetic PII (email / phone / SSN
    // / card / IP) appended to every even doc, the map-only regex chain
    // redacts it, and per-class counts come off the scrubbed text; the
    // oracle applies the IDENTICAL pattern constants (interpolated from
    // Pii.*Pattern — Java-regex ∩ RE2 by design) in DuckDB ---
    "q55_pii_scrub" -> ((s, dir) => {
      val d4 = lpad((col("doc_id") % 10000).cast("string"), 4, "0")
      val withPii = T(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 2 === 0, concat(col("text"),
          lit(" Contact user"), (col("doc_id") % 100).cast("string"),
          lit("@example.com or +1 555 123 "), d4,
          lit(" ssn 123-45-"), d4,
          lit(" card 4111 1111 1111 "), d4,
          lit(" ip 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."), (col("doc_id") % 100).cast("string")))
          .otherwise(col("text")).as("t"))
      val scrubbed = withPii.select(col("doc_id").as("id"),
        Pii.scrub(col("t")).as("scrubbed"))
      scrubbed.select(col("id"), col("scrubbed"),
          Pii.stats(col("scrubbed")).as("st"))
        .select(col("id"), col("scrubbed"),
          col("st.emails").as("emails"), col("st.ips").as("ips"),
          col("st.ssns").as("ssns"), col("st.cards").as("cards"),
          col("st.phones").as("phones"))
        .orderBy(col("id"))
    }),

    // --- HTML → text extraction: deterministic synthetic pages wrap every
    // doc's text (title/style/script/comment/blocks/entities/anchors), the
    // map-only regex chain extracts readable text + title + links, and the
    // oracle applies the IDENTICAL pattern constants (Java-regex ∩ RE2 by
    // design, the q55 contract) in DuckDB ---
    "q57_html_extract" -> ((s, dir) => {
      val idStr = col("doc_id").cast("string")
      val pages = T(s, dir, "documents").select(col("doc_id"), concat(
        lit("<html><head><title> Doc "), idStr, lit(" &amp; friends </title>"),
        lit("<style type=\"text/css\">body { color: #fff; }</style></head>"),
        lit("<body><!-- secret "), idStr,
        lit(" --><script>if (1 < 2) { alert(\"x&y\"); }</script>"),
        lit("<h1>Heading "), idStr, lit("</h1><p>"), col("text"), lit("</p>"),
        lit("<div>Tail &lt;b&gt; &quot;q&quot; &#39;a&#39;&nbsp;end</div>"),
        lit("<ul><li>item one</li><li>item two</li></ul>"),
        lit("<a href=\"https://example.com/p?id="), idStr,
        lit("&amp;ref=home\">first</a> <br/>"),
        lit("<a href=\"/rel/"), idStr, lit(".html\">second</a></body></html>"))
        .as("html"))
      val links = Html.htmlLinks(col("html"))
      pages.select(col("doc_id").as("id"),
          Html.htmlTitle(col("html")).as("title"),
          Html.htmlToText(col("html")).as("text"),
          size(links).cast("long").as("n_links"),
          element_at(links, 1).as("first_link"))
        .orderBy(col("id"))
    }),

    // --- WARC sink + source round trip: every doc becomes a crawl record
    // (deterministic ids), the V2 source reads it back (one task per file,
    // payload-level column pruning), and per-lang counts + UTF-8 byte
    // totals + exact-content verdicts check against the parquet originals;
    // the oracle recomputes the same aggregates straight off documents ---
    "q58_warc_roundtrip" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_warc_q58").toString
      val docs = T(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
      graft.data.Warc.save(docs.repartition(4).select(
        concat(lit("https://example.com/d/"), col("doc_id")).as("url"),
        encode(col("text"), "UTF-8").as("content"),
        lit("text/plain; charset=utf-8").as("content_type")), tmp)
      val crawl = s.read.format("warc").load(tmp).select(
        regexp_extract(col("url"), "/d/(\\d+)$", 1).cast("long").as("doc_id"),
        col("content_length"),
        decode(col("content"), "UTF-8").as("rt"))
      crawl.join(docs, "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("content_length")).as("bytes"),
          (sum(when(col("rt") === col("text"), 0).otherwise(1)) === 0).as("exact"))
        .orderBy(col("lang"))
    }),

    // --- per-file sketch sidecar (data skipping): range-layout the docs
    // into 8 parquet files, index doc_id (Bloom + min/max per file), and
    // point-look-up through the index — the result must equal a straight
    // filter (false positives only cost file reads) AND the prune must
    // have skipped files; the oracle is the straight filter ---
    "q59_sketch_index_prune" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_q59").toString
      T(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
        .repartitionByRange(8, col("doc_id"))
        .write.mode("overwrite").parquet(tmp)
      graft.data.SketchIndex.build(s, tmp, "doc_id")
      val keys = Seq("3", "44", "250", "499")
      val (total, read) = graft.data.SketchIndex.pruneStats(s, tmp, "doc_id", keys)
      graft.data.SketchIndex.readPruned(s, tmp, "doc_id", keys)
        .select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("text_len"),
          lit(read < total).as("pruned"))
        .orderBy(col("doc_id"))
    }),

    // --- HTTP envelope splitters over synthetic response payloads: build
    // the exact HTTP message a crawl's WARC response record carries, then
    // recover status / header / body with the codegen'd built-in chains;
    // the oracle recomputes the status rule and asserts exact recovery ---
    "q60_warc_http" -> ((s, dir) => {
      val docs = T(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
      val payload = concat(
        lit("HTTP/1.1 "),
        when(col("doc_id") % 7 === 0, lit("404 Not Found")).otherwise(lit("200 OK")),
        lit("\r\nContent-Type: text/plain; charset=utf-8\r\nX-Lang: "), col("lang"),
        lit("\r\n\r\n"), col("text"))
      docs.select(col("doc_id"), col("lang"), col("text"),
          encode(payload, "UTF-8").as("content"))
        .select(
          graft.data.Warc.httpStatus(col("content")).as("status"),
          (graft.data.Warc.httpHeader(col("content"), "x-lang") === col("lang")).as("hdr_ok"),
          (decode(graft.data.Warc.httpBody(col("content")), "UTF-8") === col("text")).as("body_ok"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("cnt"),
          (sum(when(col("hdr_ok"), 0).otherwise(1)) === 0).as("hdr_exact"),
          (sum(when(col("body_ok"), 0).otherwise(1)) === 0).as("body_exact"))
        .orderBy(col("status"))
    }),

    // --- sidecar zone-map range scan + incremental refresh: zero-padded
    // keys (string collation == numeric order), a no-op refresh on an
    // unchanged table must index nothing, and the range read must equal
    // the straight BETWEEN filter the oracle runs ---
    "q61_sidecar_range" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_q61").toString
      T(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
        .withColumn("key", format_string("d%07d", col("doc_id")))
        .repartitionByRange(8, col("key"))
        .write.mode("overwrite").parquet(tmp)
      graft.data.SketchIndex.build(s, tmp, "key")
      val (fresh, total) = graft.data.SketchIndex.refresh(s, tmp, "key")
      graft.data.SketchIndex.readRange(s, tmp, "key", "d0000100", "d0000199")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("cnt"),
          sum(length(col("text")).cast("long")).as("chars"))
        .withColumn("refresh_noop", lit(fresh == 0L && total == 8L))
        .orderBy(col("lang"))
    }),

    "q49_vec_quantize" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.select(col("vec_id"), col("embedding"),
          vec_quantize_int8(col("embedding")).as("sq"))
        .withColumn("back", vec_dequantize_int8(col("sq")))
      val checks = q.select(
        (size(col("back")) === size(col("embedding"))).as("len_ok"),
        aggregate(zip_with(col("embedding"), col("back"),
            (a, b) => abs(a.cast("double") - b.cast("double"))),
          lit(0.0), (acc, x) => greatest(acc, x)).as("max_err"),
        col("sq.scale").cast("double").as("scale"),
        (vec_quantize_int8(col("back")) === col("sq")).as("idem_ok"))
      checks.agg(count(lit(1)).as("n_vecs"),
        (sum(when(col("len_ok"), 0).otherwise(1)) === 0).as("len_all_ok"),
        (sum(when(col("max_err") <= col("scale") * 0.5 + 1e-6, 0).otherwise(1)) === 0)
          .as("err_within_half_scale"),
        (sum(when(col("idem_ok"), 0).otherwise(1)) === 0).as("requantize_exact"))
    }),

    // --- estimator goldens (testsuite.c:186-202,291-347) ---
    "q23_bloom_estimators" -> ((s, _) => {
      import s.implicits._
      def keys(a: Long, b: Long) = s.range(a, b).select(col("id").cast("string").as("k"))
      def build(df: DataFrame): Array[Byte] =
        df.agg(bloom_sketch(col("k"), 50000L, 0.01f)).head.getAs[Array[Byte]](0)
      val b5k = build(keys(0, 5000))
      val b10k = build(keys(0, 10000))
      val bA5k = build(keys(0, 5000).unionAll(Seq("a").toDF("k")))
      val b50k = build(keys(0, 50000))
      val stats = s.range(1).select(
        bloom_estimate_elements(lit(b5k)).as("e5"),
        bloom_estimate_elements(lit(b10k)).as("e10"),
        bloom_bits_set(lit(bA5k)).as("bs"),
        bloom_current_fpr(lit(b50k)).as("fpr")).head
      val fp = keys(50000, 51000).filter(bloom_might_contain(lit(b50k), col("k"))).count
      val fn = keys(0, 50000).filter(!bloom_might_contain(lit(b50k), col("k"))).count
      Seq((stats.getAs[Long]("e5"), stats.getAs[Long]("e10"), stats.getAs[Long]("bs"),
        stats.getAs[Double]("fpr") > 0.0099 && stats.getAs[Double]("fpr") < 0.0101, fp, fn))
        .toDF("est_5000", "est_10000", "bits_set", "fpr_ok", "fp_count", "fn")
    }))

  // ------------------------------------------------------------- oracle SQL

  private def langidOracle: String = {
    val langs = TextOps.Stopwords.toSeq.sortBy(_._1)
    val sfxCase = langs.map { case (l, ws) =>
      s"WHEN '$l' THEN '${ws.take(3).mkString(" ")}'"
    }.mkString("CASE lang ", " ", " ELSE '' END")
    val scoreSelects = langs.map { case (l, ws) =>
      val list = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"SELECT doc_id, '$l' AS lang, len(list_intersect(list_distinct(w), $list)) AS score FROM words"
    }.mkString("\n UNION ALL ")
    s"""WITH base AS (SELECT doc_id, concat(text, ' ', $sfxCase) AS t2 FROM documents),
       |words AS (SELECT doc_id, regexp_split_to_array(lower(trim(t2)), '\\s+') AS w FROM base),
       |scores AS ($scoreSelects),
       |best AS (SELECT doc_id, lang, score,
       |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn FROM scores)
       |SELECT doc_id, CASE WHEN score <= 0 THEN 'und' ELSE lang END AS pred
       |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  /** The q18 quality-score pipeline as shared CTEs (`sc`: doc_id, chars,
    * tokens, ratios, score) — single source of truth for every oracle that
    * ranks by the library's quality score (q18, q54).
    */
  private val qualityScoreCtes =
    """t AS (SELECT doc_id, trim(text) AS tt, text FROM documents),
      |m AS (SELECT doc_id,
      |  CAST(length(tt) AS BIGINT) AS chars,
      |  CAST(CASE WHEN length(tt) = 0 THEN 0
      |    ELSE len(regexp_split_to_array(tt, '\s+')) END AS BIGINT) AS tokens,
      |  CAST(length(tt) AS DOUBLE) AS lend,
      |  greatest(CAST(length(tt) AS DOUBLE), CAST(1.0 AS DOUBLE)) AS safelen,
      |  CAST(length(regexp_replace(tt, '[^[:punct:]]', '', 'g')) AS DOUBLE) AS punct,
      |  CAST(length(regexp_replace(tt, '[^0-9]', '', 'g')) AS DOUBLE) AS digit,
      |  CAST(length(regexp_replace(tt, '[^A-Z]', '', 'g')) AS DOUBLE) AS upper
      | FROM t),
      |r AS (SELECT doc_id, chars, tokens,
      |  lend / greatest(CAST(tokens AS DOUBLE), CAST(1.0 AS DOUBLE)) AS mean_token_len,
      |  punct / safelen AS punct_ratio, digit / safelen AS digit_ratio,
      |  upper / safelen AS upper_ratio FROM m),
      |sc AS (SELECT doc_id, chars, tokens, mean_token_len, punct_ratio,
      |  digit_ratio, upper_ratio,
      | greatest(CAST(0.0 AS DOUBLE),
      |   (CASE WHEN tokens < 5 THEN CAST(0.2 AS DOUBLE)
      |         WHEN tokens > 10000 THEN CAST(0.5 AS DOUBLE)
      |         ELSE CAST(1.0 AS DOUBLE) END)
      |   * (CAST(1.0 AS DOUBLE)
      |      - least(punct_ratio * 4.0, CAST(1.0 AS DOUBLE)) * 0.7
      |      - least(digit_ratio * 4.0, CAST(1.0 AS DOUBLE)) * 0.7)) AS score
      | FROM r)""".stripMargin

  /** q55's synthetic-PII corpus, shared verbatim by the Spark query. */
  private val piiCorpusCte =
    """p AS (SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN text ||
      |    ' Contact user' || CAST(doc_id % 100 AS VARCHAR) ||
      |    '@example.com or +1 555 123 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      |    ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      |    ' card 4111 1111 1111 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      |    ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR)
      |  ELSE text END AS t FROM documents)""".stripMargin
  // NOTE: interpolated into an outer .stripMargin — no line above may
  // start with '|' after this val's own margin strip

  /** DuckDB rendering of [[Html.Entities]] decode (same order, `&amp;`
    * last); the apostrophe value goes through chr(39) to dodge SQL quoting.
    */
  private def duckEntityDecode(x: String): String =
    Html.Entities.foldLeft(x) { case (acc, (e, ch)) =>
      val rep = if (ch == "'") "chr(39)" else s"'$ch'"
      s"replace($acc, '$e', $rep)"
    }

  /** DuckDB rendering of the whitespace collapse in [[Html.htmlToText]]. */
  private def duckCollapseWs(x: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($x, " +
      s"'${Html.HSpacePattern}', ' ', 'g'), " +
      s"'${Html.NlClusterPattern}', chr(10), 'g'), " +
      s"'${Html.EdgePattern}', '', 'g')"

  /** q57's synthetic page corpus, shared verbatim by the Spark query. */
  private val htmlCorpusCte =
    """h AS (SELECT doc_id,
      |  '<html><head><title> Doc ' || CAST(doc_id AS VARCHAR) || ' &amp; friends </title>' ||
      |  '<style type="text/css">body { color: #fff; }</style></head>' ||
      |  '<body><!-- secret ' || CAST(doc_id AS VARCHAR) ||
      |  ' --><script>if (1 < 2) { alert("x&y"); }</script>' ||
      |  '<h1>Heading ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text || '</p>' ||
      |  '<div>Tail &lt;b&gt; &quot;q&quot; &#39;a&#39;&nbsp;end</div>' ||
      |  '<ul><li>item one</li><li>item two</li></ul>' ||
      |  '<a href="https://example.com/p?id=' || CAST(doc_id AS VARCHAR) ||
      |  '&amp;ref=home">first</a> <br/>' ||
      |  '<a href="/rel/' || CAST(doc_id AS VARCHAR) || '.html">second</a></body></html>' AS html
      | FROM documents)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        | CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q02_bloom_semijoin" ->
      """SELECT l_returnflag, count(*) AS cnt, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q03_fnv_golden" ->
      """SELECT 'foo' AS key, 0 AS seed, CAST(-2543842089295555209 AS BIGINT) AS hash
        |UNION ALL SELECT 'foo', 1, CAST(-4688761678894751092 AS BIGINT)
        |UNION ALL SELECT 'foo', 2, CAST(-4421225213491991699 AS BIGINT)
        |UNION ALL SELECT 'foo', 3, CAST(5646210032526140290 AS BIGINT)
        |UNION ALL SELECT 'foo', 4, CAST(6127913770875964707 AS BIGINT)
        |ORDER BY seed""".stripMargin,

    "q04_bloom_golden_serde" ->
      """SELECT 'dff430adaf230fe3579d658c1fd3b457' AS md5_hex, 59927 AS export_size,
        | 119854 AS hex_len,
        | '80202010000000008008068000001000800800000200800080220000200000000000002002000002' AS hex_head,
        | '1000000004021000000200601000000040020100000000000000c35000000000000013883c23d70a' AS hex_tail,
        | CAST(5000 AS BIGINT) AS elements_added""".stripMargin,

    "q05_hll_accuracy" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_distinct, true AS ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q06_cms_accuracy" ->
      """SELECT o_orderpriority, count(*) AS cnt, true AS ok, true AS total_ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q07_quantiles" ->
      """SELECT CAST(q AS DOUBLE) AS q, (SELECT count(*) FROM lineitem) AS n,
        | true AS ok_tdigest, true AS ok_kll, true AS ok_kll_rank
        |FROM (VALUES (0.1), (0.5), (0.9), (0.99)) t(q) ORDER BY q""".stripMargin,

    "q08_counting_bloom" ->
      """SELECT o_orderpriority, count(*) AS cnt, true AS ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q33_theta_setops" ->
      """SELECT
        | CAST(sum(CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END) AS BIGINT) AS exact_a,
        | CAST(sum(CASE WHEN o_totalprice < 250000.0 THEN 1 ELSE 0 END) AS BIGINT) AS exact_b,
        | CAST(sum(CASE WHEN o_totalprice > 150000.0 AND o_totalprice < 250000.0 THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter,
        | true AS ok_a, true AS ok_b, true AS ok_inter, true AS ok_diff, true AS ok_union
        |FROM orders""".stripMargin,

    "q09_bloom_setops" ->
      """SELECT CAST(count(DISTINCT l_orderkey) FILTER (WHERE l_orderkey % 2 = 0) AS BIGINT) AS evens,
        | CAST(count(DISTINCT l_orderkey) FILTER (WHERE l_orderkey % 2 = 1) AS BIGINT) AS odds,
        | CAST(1.0 AS DOUBLE) AS jaccard_self, CAST(0 AS BIGINT) AS fn_a,
        | CAST(0 AS BIGINT) AS fn_union, true AS union_bits_equal
        |FROM lineitem""".stripMargin,

    "q10_dedup_exact" ->
      s"""WITH $dupDocsSql,
         |g AS (SELECT text, count(*) AS c FROM d GROUP BY 1)
         |SELECT count(*) AS groups,
         | CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_groups,
         | CAST(sum(c) AS BIGINT) AS total FROM g""".stripMargin,

    "q11_dedup_minhash" ->
      s"""WITH $dupDocsSql
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM d a JOIN d b
         |ON a.text = b.text AND a.doc_id < b.doc_id ORDER BY 1, 2""".stripMargin,

    "q12_dedup_simhash" ->
      s"""WITH $dupDocsSql
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM d a JOIN d b
         |ON a.text = b.text AND a.doc_id < b.doc_id ORDER BY 1, 2""".stripMargin,

    "q13_dedup_ngram" ->
      s"""WITH $dupDocsSql,
         |dd AS (SELECT * FROM d WHERE doc_id % 5 = 0),
         |sh AS (SELECT doc_id AS id,
         |  unnest(list_distinct(list_transform(range(1, greatest(length(text) - 15, 1) + 1, 4),
         |    p -> substring(text, CAST(p AS INT), 16)))) AS sh FROM dd),
         |sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
         |pairs AS (SELECT x.id AS id_a, y.id AS id_b, count(*) AS common
         |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.id < y.id GROUP BY 1, 2)
         |SELECT id_a, id_b, CAST(common AS BIGINT) AS common,
         | CAST(sa.n + sb.n - common AS BIGINT) AS uni
         |FROM pairs JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
         |WHERE common * 2 >= (sa.n + sb.n - common) * 1 ORDER BY 1, 2""".stripMargin,

    "q28_dedup_pathological" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
         |boiler AS (SELECT 5000000 + i AS doc_id, '$BoilerText' AS text FROM range(300) t(i)),
         |d AS (SELECT * FROM base UNION ALL SELECT * FROM boiler),
         |g AS (SELECT text, count(*) AS c, min(doc_id) AS keeper FROM d GROUP BY 1)
         |SELECT CAST(sum(c - 1) AS BIGINT) AS exact_edges,
         | CAST(sum(CASE WHEN keeper >= 5000000 THEN c - 1 ELSE 0 END) AS BIGINT) AS boiler_edges,
         | true AS cap_engaged, true AS near_linear
         |FROM g""".stripMargin,

    "q29_sharded_bloom_join" ->
      """SELECT l_returnflag, count(*) AS cnt, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 250000.0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q30_embed_neardup" ->
      """WITH d AS (SELECT vec_id, embedding FROM embeddings
        | UNION ALL SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 50 = 0)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM d a JOIN d b
        |ON a.embedding = b.embedding AND a.vec_id < b.vec_id ORDER BY 1, 2""".stripMargin,

    "q14_embed_knn" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
        |s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
        |  CAST(list_sum(list_transform(range(1, len(e.embedding) + 1), i ->
        |    CAST(floor(CAST(q.qv[i] AS DOUBLE) * 1000) AS BIGINT)
        |    * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS qdot
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id)
        |SELECT query_id, neighbor_id, qdot, CAST(rank AS INT) AS rank FROM
        | (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, neighbor_id ASC) AS rank FROM s)
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "q15_lsh_recall" ->
      """SELECT CAST(count(*) AS BIGINT) AS queries, 10 AS k,
        | CAST(count(*) * 10 AS BIGINT) AS brute_pairs, true AS recall_ok
        |FROM embeddings WHERE vec_id % 100 = 0""".stripMargin,

    "q27_ivf_recall" ->
      """SELECT CAST(count(*) AS BIGINT) AS queries, 10 AS k,
        | CAST(count(*) * 10 AS BIGINT) AS brute_pairs, true AS recall_ok
        |FROM embeddings WHERE vec_id % 100 = 0""".stripMargin,

    "q32_ivfpq_recall" ->
      """SELECT CAST(count(*) AS BIGINT) AS queries, 10 AS k,
        | CAST(count(*) * 10 AS BIGINT) AS brute_pairs, true AS recall_ok
        |FROM embeddings WHERE vec_id % 100 = 0""".stripMargin,

    "q16_text_stats" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS chars,
        | CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |   ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS tokens,
        | CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |   ELSE coalesce(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
        |     w -> greatest(1, CAST(ceil(length(w) / 4.0) AS INT)))), 0) END AS BIGINT) AS subword_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q17_langid" -> langidOracle,

    "q18_quality" ->
      s"""WITH $qualityScoreCtes
        |SELECT doc_id, chars, tokens, mean_token_len, punct_ratio, digit_ratio,
        | upper_ratio, score
        |FROM sc ORDER BY doc_id""".stripMargin,

    "q38_url_canonical" ->
      """WITH d AS (SELECT doc_id, 'HTTP://Example' || CAST(doc_id % 50 AS VARCHAR)
        |  || '.COM:80/path/' || CAST(doc_id AS VARCHAR)
        |  || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&b=2&a=1#frag' ELSE '?a=1&b=2' END AS url
        | FROM documents),
        |m AS (SELECT doc_id,
        |  lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
        |  lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS hostraw,
        |  regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$', 1) AS pathqf FROM d),
        |m2 AS (SELECT doc_id, scheme,
        |  CASE WHEN scheme = 'http' THEN regexp_replace(hostraw, ':80$', '')
        |       WHEN scheme = 'https' THEN regexp_replace(hostraw, ':443$', '')
        |       ELSE hostraw END AS host,
        |  regexp_extract(regexp_extract(pathqf, '^([^#]*)', 1), '^([^?]*)', 1) AS path,
        |  regexp_extract(regexp_extract(pathqf, '^([^#]*)', 1), '\?(.*)$', 1) AS query FROM m),
        |m3 AS (SELECT doc_id, scheme, host, path,
        |  array_to_string(list_sort(list_filter(string_split(query, '&'),
        |    p -> length(p) > 0 AND NOT starts_with(p, 'utm_')
        |         AND NOT starts_with(p, 'gclid=') AND NOT starts_with(p, 'fbclid='))), '&') AS cq
        | FROM m2)
        |SELECT doc_id, scheme || '://' || host
        |  || (CASE WHEN path = '' THEN '/' ELSE path END)
        |  || (CASE WHEN cq = '' THEN '' ELSE '?' || cq END) AS canon
        |FROM m3 ORDER BY doc_id""".stripMargin,

    "q34_normalized_dedup" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        | UNION ALL SELECT doc_id + 3000000, upper(text) || '!!!'
        |   FROM documents WHERE lang = 'en' AND doc_id % 5 = 0)
        |SELECT count(*) AS total, count(DISTINCT text) AS raw_distinct,
        | count(DISTINCT trim(regexp_replace(regexp_replace(regexp_replace(
        |   lower(text), '[0-9]', '0', 'g'), '[^a-z0 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_distinct
        |FROM d""".stripMargin,

    "q35_paragraph_dedup" ->
      """WITH d AS (SELECT doc_id, CASE WHEN doc_id % 2 = 0
        |   THEN 'SHARED BOILERPLATE LINE' || chr(10) || text ELSE text END AS text FROM documents),
        |hot AS (SELECT para FROM (SELECT DISTINCT doc_id, unnest(string_split(text, chr(10))) AS para FROM d)
        |  WHERE length(trim(para)) > 0 GROUP BY para HAVING count(*) >= 50),
        |hl AS (SELECT coalesce(list(para), []) AS ps FROM hot)
        |SELECT doc_id, array_to_string(list_filter(string_split(text, chr(10)),
        |  p -> NOT list_contains(hl.ps, p)), chr(10)) AS text
        |FROM d, hl ORDER BY doc_id""".stripMargin,

    "q36_repetition_stats" ->
      """WITH t AS (SELECT doc_id, CASE WHEN doc_id % 2 = 1
        |   THEN text || chr(10) || text ELSE text END AS t2 FROM documents),
        |m AS (SELECT doc_id,
        |  list_filter(list_transform(string_split(t2, chr(10)), l -> trim(l)), l -> length(l) > 0) AS lines,
        |  CASE WHEN length(trim(t2)) = 0 THEN [] ELSE regexp_split_to_array(trim(t2), '\s+') END AS words
        | FROM t)
        |SELECT doc_id,
        | CASE WHEN len(lines) = 0 THEN 0.0 ELSE CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines) END AS dup_line_frac,
        | CASE WHEN len(words) = 0 THEN 0.0 ELSE CAST(len(words) - len(list_distinct(words)) AS DOUBLE) / len(words) END AS dup_word_frac
        |FROM m ORDER BY doc_id""".stripMargin,

    "q19_salted_group" ->
      """SELECT lang, count(*) AS cnt, CAST(0 AS BIGINT) AS fn, true AS bits_equal
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q20_checkpoint_resume" ->
      """SELECT CAST(count(*) AS BIGINT) AS keys, 4 AS groups, true AS first_run_killed,
        | true AS resumed_equals_direct, CAST(0 AS BIGINT) AS fn FROM documents""".stripMargin,

    "q21_parallelism_invariance" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows, true AS bloom_equal, true AS hll_equal
        |FROM lineitem""".stripMargin,

    "q22_multimodal" ->
      """SELECT CAST(200 AS BIGINT) AS n,
        | CAST(count(*) FILTER (WHERE i % 3 = 0) AS BIGINT) AS images,
        | CAST(count(*) FILTER (WHERE i % 3 = 1) AS BIGINT) AS audio,
        | CAST(count(*) FILTER (WHERE i % 3 = 2) AS BIGINT) AS video,
        | CAST(200 AS BIGINT) AS decoded,
        | CAST(sum(CASE WHEN i % 3 = 2 THEN least((1000 + i % 60000) // 500, 64) ELSE 0 END) AS BIGINT) AS frames
        |FROM range(200) t(i)""".stripMargin,

    "q39_imageio_decode" ->
      """SELECT CAST(count(*) FILTER (WHERE i % 4 = 0) AS BIGINT) AS png_exact,
        | CAST(count(*) FILTER (WHERE i % 4 = 1) AS BIGINT) AS jpeg_ok,
        | CAST(count(*) FILTER (WHERE i % 4 = 2) AS BIGINT) AS ppm_exact,
        | CAST(count(*) FILTER (WHERE i % 4 = 3) AS BIGINT) AS corrupt_failed,
        | CAST(count(*) FILTER (WHERE i % 4 < 2) AS BIGINT) AS resized
        |FROM range(240) t(i)""".stripMargin,

    "q40_hll_sparse_groups" ->
      """SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_groups,
        | true AS all_ok, true AS blobs_tiny
        |FROM lineitem""".stripMargin,

    "q41_ivfpq_persist" ->
      """SELECT CAST(count(*) AS BIGINT) AS queries, 10 AS k,
        | CAST(count(*) * 10 AS BIGINT) AS brute_pairs,
        | true AS recall_ok, true AS model_roundtrip_ok
        |FROM embeddings WHERE vec_id % 100 = 0""".stripMargin,

    "q42_mg_heavyhitters" ->
      """WITH ev AS (SELECT CASE WHEN event_id % 3 <> 0 THEN event_type
        |  ELSE 'u' || CAST(user_id AS VARCHAR) END AS key FROM events),
        |tot AS (SELECT count(*) AS n FROM ev)
        |SELECT key, count(*) AS cnt, true AS ok, true AS bound_ok,
        |  true AS total_ok, true AS top5_ok
        |FROM ev, tot GROUP BY key, tot.n HAVING count(*) > n // 17
        |ORDER BY key""".stripMargin,

    "q43_kll_range_partition" ->
      """SELECT CAST(i AS INT) AS bucket, true AS ok, true AS cuts_ok
        |FROM range(0, 8) t(i) ORDER BY bucket""".stripMargin,

    "q44_bottomk_sample" ->
      """SELECT lang, CAST(least(10, count(DISTINCT doc_id)) AS INT) AS sample_size,
        |  true AS deterministic, true AS members_ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q50_quantized_ann" ->
      """SELECT CAST(count(*) AS BIGINT) AS queries, 10 AS k,
        | CAST(count(*) * 10 AS BIGINT) AS brute_pairs,
        | true AS recall_close_to_float, true AS recall_ok
        |FROM embeddings WHERE vec_id % 100 = 0""".stripMargin,

    "q51_weighted_total" ->
      """SELECT lang, CAST(sum(n_chars + 1) AS BIGINT) AS total_weight,
        | true AS small_k_ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q52_snapshot_overlap" ->
      """WITH a AS (SELECT DISTINCT text FROM documents WHERE doc_id % 2 = 0),
        | b AS (SELECT DISTINCT text FROM documents WHERE doc_id % 3 = 0),
        | n AS (SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS na,
        |   CAST((SELECT count(*) FROM b) AS BIGINT) AS nb,
        |   CAST((SELECT count(*) FROM a JOIN b USING (text)) AS BIGINT) AS ni)
        |SELECT na AS est_a, nb AS est_b, ni AS est_intersect,
        | na + nb - ni AS est_union,
        | CAST(ni AS DOUBLE) / CAST(na + nb - ni AS DOUBLE) AS jaccard,
        | CAST(ni AS DOUBLE) / (CASE WHEN nb > 1 THEN CAST(nb AS DOUBLE) ELSE 1.0 END) AS dup_frac_b
        |FROM n""".stripMargin,

    "q53_decontaminate" ->
      """WITH bench AS (SELECT text FROM documents WHERE doc_id % 97 = 0),
        |docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
        |bsh AS (SELECT DISTINCT unnest(list_distinct(list_transform(
        |    range(1, greatest(length(text) - 15, 1) + 1, 1),
        |    p -> substring(text, CAST(p AS INT), 16)))) AS sh FROM bench),
        |dsh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(length(text) - 15, 1) + 1, 4),
        |    p -> substring(text, CAST(p AS INT), 16)))) AS sh FROM docs),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ngrams FROM dsh GROUP BY 1),
        |hits AS (SELECT d.doc_id, CAST(count(*) AS BIGINT) AS contaminated
        |  FROM dsh d JOIN bsh USING (sh) GROUP BY 1)
        |SELECT s.doc_id AS id, s.ngrams,
        |  CAST(coalesce(h.contaminated, 0) AS BIGINT) AS contaminated,
        |  CAST(coalesce(h.contaminated, 0) AS DOUBLE)
        |    / CAST(greatest(s.ngrams, 1) AS DOUBLE) AS contamination_frac,
        |  (coalesce(h.contaminated, 0) >= 8
        |   OR CAST(coalesce(h.contaminated, 0) AS DOUBLE)
        |      / CAST(greatest(s.ngrams, 1) AS DOUBLE) >= 0.5) AS flagged,
        |  true AS bloom_no_false_neg
        |FROM sizes s LEFT JOIN hits h ON h.doc_id = s.doc_id ORDER BY id""".stripMargin,

    "q54_token_budget" ->
      s"""WITH $qualityScoreCtes,
        |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt FROM sc),
        |w AS (SELECT doc_id, tokens,
        |  sum(tokens) OVER (ORDER BY score DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM sc)
        |SELECT doc_id AS id, CAST(tokens AS BIGINT) AS tokens
        |FROM w, tot WHERE cum <= tt * 2 // 5 ORDER BY id""".stripMargin,

    "q56_budget_per_group" ->
      s"""WITH $qualityScoreCtes,
        |sl AS (SELECT sc.doc_id, sc.tokens, sc.score, d.lang
        |  FROM sc JOIN documents d ON d.doc_id = sc.doc_id),
        |w AS (SELECT lang, doc_id, tokens,
        |  sum(tokens) OVER (PARTITION BY lang ORDER BY score DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM sl)
        |SELECT lang, doc_id AS id, CAST(tokens AS BIGINT) AS tokens
        |FROM w WHERE cum <= 2000 ORDER BY lang, id""".stripMargin,

    "q55_pii_scrub" ->
      s"""WITH $piiCorpusCte,
        |s AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    t, '${Pii.EmailPattern}', '[EMAIL]', 'g'),
        |    '${Pii.IpPattern}', '[IP]', 'g'),
        |    '${Pii.SsnPattern}', '[SSN]', 'g'),
        |    '${Pii.CardPattern}', '[CARD]', 'g'),
        |    '${Pii.PhonePattern}', '[PHONE]', 'g') AS scrubbed FROM p)
        |SELECT doc_id AS id, scrubbed,
        |  CAST((length(scrubbed) - length(replace(scrubbed, '[EMAIL]', ''))) // 7 AS BIGINT) AS emails,
        |  CAST((length(scrubbed) - length(replace(scrubbed, '[IP]', ''))) // 4 AS BIGINT) AS ips,
        |  CAST((length(scrubbed) - length(replace(scrubbed, '[SSN]', ''))) // 5 AS BIGINT) AS ssns,
        |  CAST((length(scrubbed) - length(replace(scrubbed, '[CARD]', ''))) // 6 AS BIGINT) AS cards,
        |  CAST((length(scrubbed) - length(replace(scrubbed, '[PHONE]', ''))) // 7 AS BIGINT) AS phones
        |FROM s ORDER BY id""".stripMargin,

    "q57_html_extract" ->
      s"""WITH $htmlCorpusCte,
        |s1 AS (SELECT doc_id, html,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |    '${Html.ScriptPattern}', ' ', 'g'),
        |    '${Html.StylePattern}', ' ', 'g'),
        |    '${Html.CommentPattern}', ' ', 'g'),
        |    '${Html.BlockClosePattern}', chr(10), 'g'),
        |    '${Html.TagPattern}', ' ', 'g') AS x FROM h),
        |s2 AS (SELECT doc_id, html, ${duckCollapseWs(duckEntityDecode("x"))} AS text FROM s1),
        |lk AS (SELECT doc_id, html, text,
        |  regexp_extract_all(html, '${Html.HrefPattern}', 1) AS rl FROM s2)
        |SELECT doc_id AS id,
        |  ${duckCollapseWs(duckEntityDecode(s"regexp_extract(html, '${Html.TitlePattern}', 1)"))} AS title,
        |  text, CAST(len(rl) AS BIGINT) AS n_links,
        |  list_transform(rl, l -> ${duckEntityDecode("l")})[1] AS first_link
        |FROM lk ORDER BY id""".stripMargin,

    "q58_warc_roundtrip" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
        | CAST(sum(strlen(text)) AS BIGINT) AS bytes, true AS exact
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q59_sketch_index_prune" ->
      """SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS text_len,
        | true AS pruned
        |FROM documents WHERE doc_id IN (3, 44, 250, 499)
        |ORDER BY doc_id""".stripMargin,

    "q60_warc_http" ->
      """SELECT CAST(CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS INTEGER) AS status,
        | CAST(count(*) AS BIGINT) AS cnt, true AS hdr_exact, true AS body_exact
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q61_sidecar_range" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
        | CAST(sum(length(text)) AS BIGINT) AS chars, true AS refresh_noop
        |FROM documents WHERE doc_id BETWEEN 100 AND 199
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q49_vec_quantize" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_vecs, true AS len_all_ok,
        | true AS err_within_half_scale, true AS requantize_exact
        |FROM embeddings""".stripMargin,

    "q48_weighted_sample" ->
      """SELECT lang, CAST(least(10, count(DISTINCT doc_id)) AS INT) AS sample_size,
        |  true AS deterministic, true AS members_ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q45_mg_weighted" ->
      """WITH ev AS (SELECT CASE WHEN event_id % 3 <> 0 THEN event_type
        |  ELSE 'u' || CAST(user_id AS VARCHAR) END AS key,
        |  CAST(floor(value) AS BIGINT) AS w FROM events),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM ev)
        |SELECT key, CAST(sum(w) AS BIGINT) AS wt, true AS ok,
        |  true AS bound_ok, true AS total_ok
        |FROM ev, tot GROUP BY key, tot.tw HAVING CAST(sum(w) AS BIGINT) > tw // 17
        |ORDER BY key""".stripMargin,

    "q47_audio_decode" ->
      """SELECT CAST(count(*) FILTER (WHERE i % 4 = 0) AS BIGINT) AS stereo_exact,
        | CAST(count(*) FILTER (WHERE i % 4 = 1) AS BIGINT) AS pcm8_ok,
        | CAST(count(*) FILTER (WHERE i % 4 = 2) AS BIGINT) AS mono_exact,
        | CAST(count(*) FILTER (WHERE i % 4 = 3) AS BIGINT) AS corrupt_failed
        |FROM range(200) t(i)""".stripMargin,

    "q46_neardup_clusters" ->
      """WITH RECURSIVE
        |base AS (SELECT string_agg(lpad(CAST(i AS VARCHAR), 4, '0'), '' ORDER BY i) AS s
        |  FROM range(1100) t(i)),
        |docs AS (SELECT CAST(i AS BIGINT) AS id,
        |  substring(base.s, CAST((i // 5) * 1000 + (i % 5) * 44 + 1 AS INT), 180) AS t
        |  FROM range(20) r(i), base),
        |sh AS (SELECT id, unnest(list_distinct(list_transform(
        |    range(1, greatest(length(t) - 15, 1) + 1, 4),
        |    p -> substring(t, CAST(p AS INT), 16)))) AS sh FROM docs),
        |sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (SELECT x.id AS id_a, y.id AS id_b, count(*) AS common
        |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.id < y.id GROUP BY 1, 2),
        |edges AS (SELECT id_a AS a, id_b AS b
        |  FROM pairs p JOIN sizes sa ON sa.id = p.id_a JOIN sizes sb ON sb.id = p.id_b
        |  WHERE common * 2 >= (sa.n + sb.n - common) * 1),
        |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM docs
        |  UNION
        |  SELECT s2.b, reach.r FROM reach JOIN sym s2 ON s2.a = reach.id),
        |rep AS (SELECT id, min(r) AS rep_id FROM reach GROUP BY id)
        |SELECT id, rep_id, id = rep_id AS survivor FROM rep ORDER BY id""".stripMargin,

    "q26_sharded_bloom_semijoin" ->
      """SELECT l_returnflag, count(*) AS cnt, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 250000.0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q24_window_running" ->
      """SELECT user_id, event_id,
        | CAST(sum(CAST(round(value * 100) AS BIGINT))
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
        |FROM events WHERE user_id % 100 = 0 ORDER BY user_id, event_id""".stripMargin,

    "q25_rollup" ->
      """SELECT coalesce(lang, '<all>') AS lang, coalesce(source, '<all>') AS source,
        | count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY ROLLUP (lang, source) ORDER BY 1, 2""".stripMargin,

    "q31_heavy_hitters" ->
      """WITH t AS (SELECT CASE WHEN l_orderkey % 10 = 0 THEN 'hot'
        |  ELSE 'k' || CAST(l_orderkey % 10000 AS VARCHAR) END AS key FROM lineitem),
        |n AS (SELECT ceil(0.01 * count(*)) AS thresh FROM t)
        |SELECT key, count(*) AS cnt FROM t GROUP BY 1
        |HAVING count(*) >= (SELECT thresh FROM n) ORDER BY key""".stripMargin,

    "q37_runtime_bloom_join" ->
      """SELECT l_returnflag, count(*) AS cnt, CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        | true AS rewritten
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000.0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q23_bloom_estimators" ->
      """SELECT CAST(4872 AS BIGINT) AS est_5000, CAST(9792 AS BIGINT) AS est_10000,
        | CAST(32931 AS BIGINT) AS bits_set, true AS fpr_ok,
        | CAST(5 AS BIGINT) AS fp_count, CAST(0 AS BIGINT) AS fn""".stripMargin)
}
