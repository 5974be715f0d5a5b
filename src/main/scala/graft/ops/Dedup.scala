package graft.ops

import graft.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus deduplication operators for training-data pipelines.
  *
  * Scale notes (10^12-row design):
  *  - exact dedup is one hash-shuffle on the fingerprint (64-bit + full
  *    text only for in-bucket confirmation);
  *  - minhash-LSH cost is rows × signature (cheap, map-side) + a shuffle
  *    per band keyed on (band, bandHash) — candidate pairs are generated
  *    only within buckets, never via cross join;
  *  - simhash uses the pigeonhole banding trick: distance ≤ 3 of 64 bits ⇒
  *    at least one of 4 16-bit chunks is equal, so an equi-join on chunks
  *    finds all candidates;
  *  - recomputation: the capped minhash path consumes its signature
  *    table SEVERAL times (hot-bucket count, both sides of the banding
  *    join, and the two candidate-scoring re-joins — ~5 consumers; the
  *    embedding path similarly re-derives buckets/vectors per consumer).
  *    Spark recomputes lineage per consumer, so the operators materialize
  *    the derived table ONCE by default ([[Dedup.Store.Cache]] — spill-
  *    safe MEMORY_AND_DISK) and feed every consumer from it; pass
  *    [[Dedup.Store.Parquet]] to checkpoint it durably (survives executor
  *    loss, frees the block store — the 100-TB setting), or
  *    [[Dedup.Store.Recompute]] to opt out where the input scan is
  *    cheaper than the cache.
  */
object Dedup {

  /** How a dedup operator holds its derived per-doc table (signatures /
    * fingerprints / vectors) across its multiple consumers.
    */
  sealed trait Store
  object Store {
    /** No materialization: each consumer recomputes the lineage. */
    case object Recompute extends Store
    /** `persist(MEMORY_AND_DISK)`: computed once, spills rather than
      * evicts. Blocks live until session end or `clearCache()` — the
      * right default up to what the cluster's block store holds.
      */
    case object Cache extends Store
    /** Durable parquet checkpoint: written once, every consumer reads the
      * files. Survives executor loss and frees the block store — use at
      * corpus scale. The caller owns the directory's lifecycle.
      */
    final case class Parquet(dir: String) extends Store
  }

  private def materialize(df: DataFrame, store: Store): DataFrame = store match {
    case Store.Recompute => df
    case Store.Cache =>
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    case Store.Parquet(dir) =>
      df.write.mode("overwrite").parquet(dir)
      df.sparkSession.read.parquet(dir)
  }

  /** Exact duplicate groups by content fingerprint: one row per distinct
    * content, with the kept (minimum) id and the duplicate count.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(doc_fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Rows surviving exact dedup (keep the smallest id per content). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Crawl-level URL dedup: keep one row (smallest id) per CANONICAL URL
    * ([[TextOps.canonicalizeUrl]] — case/port/fragment/tracking-param/
    * param-order variants collapse). One hash shuffle on the canonical
    * key, same shape as [[exactDedup]].
    */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val keep = df
      .groupBy(TextOps.canonicalizeUrl(col(urlCol)).as("__canon"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Scale guard shared by the LSH banding joins: drop (band-)buckets with
    * more than `cap` members before the self-join. A bucket shared by F
    * docs emits F²/2 join rows — on web corpora, boilerplate/empty
    * documents produce identical signatures, so ONE hot bucket at F=10⁶
    * is a 5·10¹¹-row join. The hot set (only buckets OVER the cap) is
    * tiny, so the anti-join broadcasts. Recall note: members of a dropped
    * bucket can still pair through their other (non-hot) bands/chunks;
    * exact-duplicate classes — the usual cause of hot buckets — should be
    * routed through [[exactGroups]] first (see [[nearDupPairsScaled]]),
    * which finds them with zero recall loss and keeps banding linear.
    */
  private def dropHotBuckets(banded: DataFrame, keyCols: Seq[String], cap: Long): DataFrame =
    if (cap == Long.MaxValue) banded
    else {
      val ks = keyCols.map(col)
      val hot = banded.groupBy(ks: _*).agg(count(lit(1)).as("f"))
        .filter(col("f") > cap).select(ks: _*)
      banded.join(broadcast(hot), keyCols, "left_anti")
    }

  /** MinHash + LSH near-duplicate candidate pairs.
    *
    * Signature of `numHashes` minhashes split into `bands` bands of
    * `numHashes/bands` rows each; docs sharing any band bucket become a
    * candidate pair; pairs are then scored by full-signature agreement
    * (estimated Jaccard) and filtered at `threshold`.
    *
    * `maxBandFreq` caps band-bucket membership (see [[dropHotBuckets]]) —
    * REQUIRED at web scale; the uncapped default keeps small-corpus runs
    * exact. Returns (id_a, id_b, est_jaccard) with id_a < id_b, distinct.
    *
    * Hybrid-path boundary: the signature expression routes tiny docs
    * through classic minhash and the rest through OPH, and the two
    * signature kinds are incomparable (a straddling pair never collides
    * — see [[graft.expr.MinHashSignature]]). For `threshold > 2/3` the
    * classic cutoff is derived from the threshold (`ceil(t/(1-t)) - 1`,
    * floored at 2 for sparse-estimate quality, capped at the k/8 cost
    * rule), which makes any straddling pair's Jaccard provably below
    * `threshold` — the boundary cannot hide a reportable pair. For
    * looser thresholds (≤ 2/3) the k/8 rule is kept and a DOCUMENTED
    * recall hole remains for straddling pairs with J in
    * [threshold, c/(c+1)]: shrinking further would trade the classic
    * path's sparse-doc estimate fidelity for it.
    */
  def minHashPairs(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 64, bands: Int = 16, shingleWidth: Int = 3,
                   threshold: Double = 0.7, maxBandFreq: Long = Long.MaxValue,
                   sigStore: Store = Store.Cache): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val rowsPerBand = numHashes / bands
    // threshold-safe classic cutoff c: a straddling pair has J <= c/(c+1),
    // and c = ceil(t/(1-t)) - 1 gives c/(c+1) < t exactly
    val classicMax =
      if (threshold > 2.0 / 3 && threshold < 1.0)
        math.max(2, math.min((numHashes - 1) / 8,
          math.ceil(threshold / (1.0 - threshold)).toInt - 1))
      else (numHashes - 1) / 8
    // materialized (Cache default): the table below feeds the hot-bucket
    // count, both banding sides and the two scoring re-joins — ~5
    // consumers, each of which would otherwise re-run the signature
    // expression over the whole corpus
    val sigs = materialize(df.select(col(idCol).as("id"),
      minhash_signature(col(textCol), numHashes, shingleWidth, classicMax).as("sig")), sigStore)
    // one row per (doc, band), carrying ONLY (band, bucket, id): the
    // banding exchange must never ship the numHashes×8-byte signatures —
    // at 10^6 docs that alone is ~8 GB per join side vs ~0.4 GB of id
    // rows (measured ~2× end-to-end). Signatures re-join the (tiny,
    // distinct) candidate set afterwards for scoring.
    val banded0 = sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val banded = dropHotBuckets(banded0, Seq("band", "bucket"), maxBandFreq)
    val cand = banded.as("x").join(banded.as("y"), Seq("band", "bucket"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cand
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / lit(numHashes.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** SimHash near-duplicate pairs at Hamming distance ≤ maxDistance (≤ 15),
    * via 4×16-bit chunk banding (pigeonhole: any pair within distance 3
    * shares at least one exact chunk; for larger distances recall decays —
    * documented trade, standard practice).
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDistance: Int = 3, maxChunkFreq: Long = Long.MaxValue): DataFrame = {
    val h = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sh"))
    val chunked0 = h.select(col("id"), col("sh"),
        posexplode(array((0 until 4).map(i =>
          shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "ck")
    val chunked = dropHotBuckets(chunked0, Seq("chunk", "ck"), maxChunkFreq)
    val a = chunked.select(col("chunk"), col("ck"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = chunked.select(col("chunk"), col("ck"), col("id").as("id_b"), col("sh").as("sh_b"))
    // hamming before distinct (pure function of the pair): filters early
    // and dedups narrow (id_a, id_b, hamming) rows
    a.join(b, Seq("chunk", "ck"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming64(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= maxDistance)
      .distinct()
  }

  /** Exact character n-gram Jaccard similar pairs, fully relational (no
    * per-row sketch): shingle → explode → self-equi-join → integer
    * cross-multiplied threshold. Shingles are `width` chars every `step`
    * chars, so the shuffle volume is |text|/step rows per doc.
    *
    * Returns (id_a, id_b, common, uni) where common/uni >= threshold,
    * integer-exact (same arithmetic is expressible in any SQL engine —
    * the DuckDB oracle runs this verbatim).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        width: Int = 16, step: Int = 4,
                        thresholdNum: Int = 1, thresholdDen: Int = 2,
                        maxShingleFreq: Long = Long.MaxValue,
                        shingleStore: Store = Store.Cache): DataFrame = {
    // the (exploded) shingle table feeds the per-doc sizes and BOTH sides
    // of the self-equi-join — materialized once by default
    val shAll = materialize(df.select(col(idCol).as("id"), col(textCol).as("t"))
      .select(col("id"), explode(array_distinct(expr(
        s"transform(sequence(1, greatest(length(t) - ${width - 1}, 1), $step), p -> substring(t, p, $width))"))).as("sh")),
      shingleStore)
    // Scale guard: a shingle shared by F docs yields F^2/2 join rows — at
    // web scale boilerplate shingles (headers, templates) blow the
    // self-join up quadratically. maxShingleFreq drops shingles above the
    // cap (standard "stop-shingle" filtering; biases Jaccard DOWN only for
    // pairs whose overlap is dominated by boilerplate, which is the
    // intended dedup semantics). Default: uncapped (exact, oracle-equal).
    val sh =
      if (maxShingleFreq == Long.MaxValue) shAll
      else {
        val hot = shAll.groupBy(col("sh")).agg(count(lit(1)).as("f"))
          .filter(col("f") > maxShingleFreq).select(col("sh"))
        shAll.join(broadcast(hot), Seq("sh"), "left_anti")
      }
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val pairs = sh.as("x").join(sh.as("y"), col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
      .withColumn("uni", col("na") + col("nb") - col("common"))
      .filter(col("common") * thresholdDen >= col("uni") * thresholdNum)
      .select(col("id_a"), col("id_b"), col("common"), col("uni"))
  }

  /** The web-scale near-dup pipeline: exact duplicates routed through
    * content fingerprints FIRST, MinHash-LSH banding (with the hot-bucket
    * cap engaged) only over the distinct-content representatives.
    *
    * Why this shape survives 100 TB: exact-duplicate classes are exactly
    * what makes band buckets hot (identical text ⇒ identical signature ⇒
    * every band collides), and a class of F copies would emit F²/2 join
    * rows through EVERY band. Routing them through [[exactGroups]] finds
    * the same duplicates as one linear hash-shuffle (star edges to the
    * kept id, F-1 rows per class), and banding then runs on one
    * representative per distinct content — the cap only ever drops
    * genuinely-adversarial near-(but-not-exact-)dup signature classes.
    *
    * Returns (id_a, id_b, est_jaccard, kind) with id_a < id_b;
    * kind ∈ ('exact', 'near'); exact edges carry est_jaccard = 1.0.
    */
  def nearDupPairsScaled(df: DataFrame, idCol: String, textCol: String,
                         numHashes: Int = 64, bands: Int = 16, shingleWidth: Int = 3,
                         threshold: Double = 0.7, maxBandFreq: Long = 1000L,
                         sigStore: Store = Store.Cache): DataFrame = {
    // fingerprints feed the class grouping AND the star-edge join — one
    // materialized scan instead of two corpus fingerprint passes
    val ids = materialize(
      df.select(col(idCol).as("id"), doc_fingerprint(col(textCol)).as("fp")),
      sigStore match { case Store.Parquet(dir) => Store.Parquet(dir + "/fp"); case s => s })
    val keep = ids.groupBy(col("fp")).agg(min(col("id")).as("keep_id"))
    // star edges: every non-kept member pairs with its class keeper
    // (keeper is the min id, so keep_id < id always ⇒ ordered pairs)
    val exactEdges = ids.join(keep, "fp")
      .filter(col("id") =!= col("keep_id"))
      .select(col("keep_id").as("id_a"), col("id").as("id_b"),
        lit(1.0).as("est_jaccard"), lit("exact").as("kind"))
    // banding over one representative per distinct content only
    val reps = df.join(keep.select(col("keep_id").as(idCol)), Seq(idCol), "left_semi")
    val nearEdges = minHashPairs(reps, idCol, textCol, numHashes, bands,
        shingleWidth, threshold, maxBandFreq,
        sigStore match { case Store.Parquet(dir) => Store.Parquet(dir + "/sig"); case s => s })
      .withColumn("kind", lit("near"))
    exactEdges.unionAll(nearEdges)
  }

  /** Transitive near-dup cluster resolution: turn a PAIR list (the output
    * of [[minHashPairs]]/[[simHashPairs]]/[[ngramJaccardPairs]]/
    * [[nearDupPairsScaled]]) into `(id, rep_id)` where `rep_id` is the
    * MINIMUM id of each connected component — the last step a real dedup
    * pipeline needs before "keep one doc per cluster".
    *
    * Algorithm: alternating large-star / small-star min-label rounds
    * (Kiveris, Lattanzi, Mirrokni, Rastogi & Vassilvitskii, "Connected
    * Components in MapReduce and Beyond", SoCC 2014) — each round is two
    * node-keyed partial-aggregation passes over the edge table (see
    * [[largeStar]]'s skew contract), NEVER a driver-side union-find, so a
    * component larger than any single machine's memory
    * (the web-boilerplate case) still resolves. Converges in O(log n)
    * rounds on real graphs (paper bound O(log² n)); each round's edge
    * table is persisted and the previous one released, so the only
    * steady-state footprint is two edge tables.
    *
    *   - large-star: every node connects its LARGER neighbors to the
    *     minimum of its closed neighborhood;
    *   - small-star: every node connects its smaller-or-equal neighbors
    *     (and itself) to that minimum.
    *
    * At the fixpoint the edge set is a disjoint union of stars centered
    * on component minima; the returned mapping covers every node that
    * appeared in an edge (center rows map to themselves). Ids may be any
    * orderable type (numeric, string, date); null ids are dropped.
    */
  def resolveClusters(edges: DataFrame, idACol: String = "id_a",
                      idBCol: String = "id_b", maxIterations: Int = 50): DataFrame =
    resolveClustersInternal(edges, idACol, idBCol, maxIterations)._1

  /** [[resolveClusters]] + the number of star rounds run (test surface for
    * the O(log n) convergence claim).
    */
  /** One large-star round: symmetrize, then per node `a` connect each
    * LARGER neighbor `b` to `m = min(N(a) ∪ {a})`; `m <= a < b` keeps
    * edges canonical (u < v, distinct).
    *
    * Skew contract: the neighborhood minimum is a partial-aggregating
    * `groupBy(a).min` joined back to the edges — NEVER a
    * `Window.partitionBy(a)`. A window funnels ALL rows of a partition
    * key through one task with no map-side combine, so a mega-star (the
    * web-template cluster: 10^8 near-identical pages) would serialize
    * its entire adjacency through a single straggler every round. The
    * groupBy collapses the hot key to one row per input partition before
    * its shuffle, and the join-back is a JOIN — AQE skew-split applies.
    */
  private[graft] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u").as("a"), col("v").as("b"))
      .unionAll(e.select(col("v").as("a"), col("u").as("b")))
    val mins = sym.groupBy(col("a")).agg(least(min(col("b")), col("a")).as("m"))
    sym.join(mins, "a")
      .filter(col("b") > col("a"))
      .select(col("m").as("u"), col("b").as("v"))
      .distinct()
  }

  /** One small-star round on canonical edges (u < v): per node `v`
    * connect each smaller neighbor `u` (and `v` itself) to `m` = min of
    * v's smaller neighborhood; emitted edges (m, x) with m < x stay
    * canonical. Same groupBy+join-back skew contract as [[largeStar]].
    */
  private[graft] def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy(col("v")).agg(min(col("u")).as("m"))
    val wm = e.join(mins, "v")
    wm.filter(col("u") =!= col("m"))
      .select(col("m").as("u"), col("u").as("v"))
      .unionAll(wm.select(col("m").as("u"), col("v")))
      .distinct()
  }

  private[graft] def resolveClustersInternal(edges: DataFrame, idACol: String,
      idBCol: String, maxIterations: Int): (DataFrame, Int) = {
    // Materialize AND truncate lineage each round: a plain persist keeps
    // the full logical plan, and every round references the previous
    // round's plan ~5× (sym union, window, except) — the analysis tree
    // would grow exponentially with rounds. Reliable checkpoint when the
    // session has a checkpoint dir (the cluster deployment: survives
    // executor loss); localCheckpoint (block-store backed) otherwise.
    def pin(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)

    var e = pin(edges
      .filter(col(idACol).isNotNull && col(idBCol).isNotNull)
      .select(least(col(idACol), col(idBCol)).as("u"),
        greatest(col(idACol), col(idBCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    // one pass per table: (row count, order-invariant 64-bit checksum).
    // Unequal stats ⇒ definitely-different edge sets, so the common
    // still-converging rounds skip the exceptAll confirmation jobs
    // entirely; equal stats get CONFIRMED exactly below (a checksum
    // collision can cost one extra confirmation scan, never correctness).
    def stats(df: DataFrame): (Long, Long) = {
      // bit_xor: order-invariant, overflow-free (ANSI-safe) over the
      // DISTINCT edge table — duplicate-cancellation cannot bite
      val r = df.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var eStats = stats(e)
    var iters = 0
    var converged = eStats._1 == 0L
    // exact set equality for two DISTINCT equal-stats tables: empty
    // difference + equal counts ⇒ equal sets (one narrow anti-join)
    def confirm(a: DataFrame, b: DataFrame): Boolean =
      a.exceptAll(b).limit(1).count() == 0L
    while (!converged) {
      if (iters >= maxIterations)
        throw new IllegalStateException(
          s"resolveClusters did not converge in $maxIterations rounds " +
            "(theoretical bound O(log^2 n) — raise maxIterations)")
      val ls = pin(largeStar(e))
      val lsStats = stats(ls)
      val e2 = pin(smallStar(ls))
      val e2Stats = stats(e2)
      // converged only when BOTH transforms are at their own fixpoint —
      // exactly the disjoint-min-star terminal state of SoCC 2014 (a
      // composition-only check could accept an oscillating non-star set)
      converged = eStats == lsStats && lsStats == e2Stats &&
        confirm(ls, e) && confirm(e2, ls)
      e = e2
      eStats = e2Stats
      iters += 1
    }
    // stars: leaves map to their center, centers to themselves
    val mapping = e.select(col("v").as("id"), col("u").as("rep_id"))
      .unionAll(e.select(col("u").as("id"), col("u").as("rep_id")))
      .distinct()
    (mapping, iters)
  }

  /** The end-to-end near-dedup VERDICT (RefinedWeb/SlimPajama style):
    * exact-first scaled pair generation ([[nearDupPairsScaled]]) →
    * transitive cluster resolution ([[resolveClusters]]) → keep exactly
    * ONE representative (the minimum id) per connected near-dup cluster;
    * rows in no cluster pass through untouched.
    *
    * Scale shape: everything before the final anti-join is the documented
    * scaled pipeline; the drop list is one narrow (id) column of
    * `rows - clusters` entries, and the final anti-join is one hash
    * shuffle of ids (or a broadcast when the drop list is small).
    */
  def nearDedup(df: DataFrame, idCol: String, textCol: String,
                numHashes: Int = 64, bands: Int = 16, shingleWidth: Int = 3,
                threshold: Double = 0.7, maxBandFreq: Long = 1000L,
                sigStore: Store = Store.Cache): DataFrame =
    nearDedupFromEdges(df, idCol,
      nearDupPairsScaled(df, idCol, textCol, numHashes, bands,
        shingleWidth, threshold, maxBandFreq, sigStore))

  /** [[nearDedup]] with an explicit keep policy: per transitive cluster
    * keep the row MAXIMIZING `scoreCol` (ties → smallest id) — the
    * RefinedWeb-style "keep the longest / highest-quality document"
    * verdict instead of the min-id default. Rows in no cluster pass
    * through untouched.
    *
    * Scale shape: identical to [[nearDedup]] plus one window over the
    * CLUSTERED rows only (`clusters ≪ corpus` rows shuffle on rep_id).
    */
  def nearDedupKeepBest(df: DataFrame, idCol: String, textCol: String,
                        scoreCol: Column,
                        numHashes: Int = 64, bands: Int = 16, shingleWidth: Int = 3,
                        threshold: Double = 0.7, maxBandFreq: Long = 1000L,
                        sigStore: Store = Store.Cache): DataFrame =
    nearDedupFromEdges(df, idCol,
      nearDupPairsScaled(df, idCol, textCol, numHashes, bands,
        shingleWidth, threshold, maxBandFreq, sigStore),
      Keep.Best(scoreCol))

  /** Per-cluster survivor policy for [[nearDedupFromEdges]]. */
  sealed trait Keep
  object Keep {
    /** Keep the row with the MINIMUM id per cluster (the default —
      * deterministic, needs no extra column).
      */
    case object MinId extends Keep

    /** Keep the row MAXIMIZING `score` per cluster, ties → smallest id —
      * the RefinedWeb-style "keep the longest / highest-quality document"
      * verdict. `score` must be an expression over the input DataFrame's
      * columns.
      */
    final case class Best(score: Column) extends Keep
  }

  /** The near-dedup VERDICT over an ARBITRARY pair source: resolve the
    * `edges` (any DataFrame of id pairs — [[minHashPairs]],
    * [[simHashPairs]], [[ngramJaccardPairs]], [[embeddingNearDupPairs]],
    * [[nearDupPairsScaled]], or a caller's own) into transitive clusters
    * and keep exactly ONE row per cluster by `keep` policy; rows in no
    * cluster pass through untouched. This is what makes every pair
    * source in the library compose into an end-to-end dedup without
    * hand-wiring the resolve + anti-join.
    *
    * Ids are expected unique per row (the dedup contract — same as
    * [[graft.ops.Sampling.exampleRows]]'s sample-by-id); duplicate-id
    * rows share one keep/drop verdict.
    *
    * Scale shape: [[resolveClusters]] on the edges; the drop list is one
    * narrow id column of `clustered − clusters` entries; the final
    * anti-join is one hash shuffle of ids (or a broadcast when the drop
    * list is small). The `Keep.Best` scoring runs over CLUSTERED rows
    * only and uses partial-aggregating groupBys end-to-end — per-cluster
    * max score, then min id among the ties — never a per-cluster Window,
    * so a mega-cluster's rows collapse map-side instead of funnelling
    * through one task (same skew contract as [[largeStar]]).
    */
  def nearDedupFromEdges(df: DataFrame, idCol: String, edges: DataFrame,
                         keep: Keep = Keep.MinId,
                         idACol: String = "id_a", idBCol: String = "id_b"): DataFrame = {
    val mapping = resolveClusters(edges.select(col(idACol), col(idBCol)), idACol, idBCol)
    val drop = keep match {
      case Keep.MinId =>
        mapping.filter(col("id") =!= col("rep_id")).select(col("id").as(idCol))
      case Keep.Best(score) =>
        val m = mapping.select(col("id").as("__graft_cid"), col("rep_id").as("__graft_rep"))
        val clustered = df.join(m, df(idCol) === col("__graft_cid"))
          .select(col("__graft_cid"), col("__graft_rep"), score.as("__graft_score"))
        val bestScore = clustered.groupBy(col("__graft_rep"))
          .agg(max(col("__graft_score")).as("__graft_best"))
        // null-safe: an all-null-score cluster still keeps its min id
        val keptIds = clustered.join(bestScore, Seq("__graft_rep"))
          .filter(col("__graft_score") <=> col("__graft_best"))
          .groupBy(col("__graft_rep"))
          .agg(min(col("__graft_cid")).as("__graft_keep"))
          .select(col("__graft_keep"))
        m.select(col("__graft_cid"))
          .join(keptIds, col("__graft_cid") === col("__graft_keep"), "left_anti")
          .select(col("__graft_cid").as(idCol))
    }
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Paragraph-level boilerplate removal (the ccnet/RefinedWeb pipeline
    * step): a paragraph appearing in ≥ `maxDocFreq` DISTINCT documents is
    * boilerplate (nav bars, cookie banners, footers) and is dropped from
    * every document; paragraph order inside each document is preserved.
    *
    * Scale shape: one explode + one aggregation to find the hot
    * paragraphs (a tiny set — only those over the threshold), broadcast
    * anti-join to drop them, one groupBy to reassemble. The hot set is
    * the ONLY thing that concentrates; documents never pairwise join.
    *
    * Returns (idCol, textCol) with the filtered text (documents whose
    * every paragraph was boilerplate keep an empty string).
    */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
                     maxDocFreq: Long): DataFrame = {
    // null text is normalized to "" up front so every document yields at
    // least one paragraph row — the single reassembly groupBy below then
    // emits EVERY doc id (all-boilerplate docs keep an empty string), so
    // the operator never silently drops rows and needs no distinct-ids +
    // outer-join re-attach pass (guide §2.4: two shuffles removed vs the
    // former anti-join + re-attach shape)
    val paras = df.select(col(idCol).as("__id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n")).as(Seq("__idx", "__para")))
    // blank/whitespace-only lines are structure, not boilerplate: nearly
    // every real document contains one, so admitting them to hot-set
    // candidacy would strip paragraph separation corpus-wide the moment
    // maxDocFreq documents share a blank line (ccnet dedups content
    // paragraphs only). They still flow through reassembly untouched.
    val hot = paras.select(col("__id"), col("__para")).distinct()
      .filter(length(trim(col("__para"))) > 0)
      .groupBy(col("__para")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= maxDocFreq)
      .select(col("__para"))
    // mark-and-drop in the reassembly aggregate instead of an anti-join:
    // the broadcast left join keeps every paragraph row (so every doc id
    // reaches the groupBy) and hot rows are filtered INSIDE the
    // collect_list transform — same rebuilt text, one shuffle on __id
    paras.join(broadcast(hot.withColumn("__hot", lit(true))), Seq("__para"), "left")
      .groupBy(col("__id"))
      .agg(concat_ws("\n",
        transform(
          filter(array_sort(collect_list(struct(col("__idx"), col("__para"), col("__hot")))),
            x => x.getField("__hot").isNull),
          x => x.getField("__para"))).as(textCol))
      .select(col("__id").as(idCol), col(textCol))
  }

  /** Embedding near-duplicate pairs by cosine ≥ threshold, LSH-bucketed:
    * random-hyperplane sign bits (Charikar 2002) bucket the vectors; only
    * same-bucket pairs are compared exactly. `planes` controls the
    * recall/cost trade (more planes = smaller buckets = cheaper + lower
    * recall for borderline pairs).
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double = 0.95, planes: Int = 8,
                            seed: Long = 42L, maxBucketFreq: Long = Long.MaxValue,
                            vecStore: Store = Store.Cache): DataFrame = {
    // vectors feed the bucketing AND both scoring re-joins (3 consumers).
    // The STORED form is what materializes — an int8-quantized corpus
    // caches at its 4× smaller width and decodes per consumer (one
    // codegen'd multiply per component at bucketing/scoring time)
    val vdt = df.schema(vecCol).dataType
    def rd(c: Column): Column = Similarity.vecDecode(vdt, c)
    val vecs = materialize(df.select(col(idCol).as("id"), col(vecCol).as("v")), vecStore)
    // bucket join on ids only (same discipline as minHashPairs: never
    // ship the vectors through the self-join exchange); vectors re-join
    // the candidate pairs for exact scoring
    val bucketed0 = vecs.select(col("id"),
      Similarity.hyperplaneBucket(rd(col("v")), planes, seed).as("bucket"))
    val bucketed = dropHotBuckets(bucketed0, Seq("bucket"), maxBucketFreq)
    // no distinct needed: each id has exactly ONE bucket row, so the
    // self-join emits each ordered pair at most once (unlike the
    // multi-band minhash join)
    val cand = bucketed.as("x").join(bucketed.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
    cand
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosineColumn(rd(col("va")), rd(col("vb"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Cross-snapshot duplicate-mass pre-flight: estimate how much of
    * snapshot `b` already exists in snapshot `a` BEFORE committing a full
    * dedup run — the cheap gate a 100-TB operator wants ("is this crawl
    * 3% new or 60% new?"). One theta sketch of the content fingerprints
    * per snapshot (single scan each, partial-aggregated UDAF — the only
    * exchange is `shuffle.partitions` sketch blobs per side), then
    * constant-time KMV set algebra on the two blobs.
    *
    * Returns one row: `est_a`/`est_b` (distinct contents per snapshot),
    * `est_intersect`/`est_union`, `jaccard`, and `dup_frac_b` = the
    * estimated fraction of `b`'s distinct contents already in `a` — the
    * number to gate on. Standard error ~1/sqrt(nominalK-1) (≈1.6% at the
    * default 4096); exact below `nominalK` distinct contents.
    */
  def snapshotOverlap(a: DataFrame, b: DataFrame, textCol: String,
                      nominalK: Int = 4096): DataFrame = {
    def sk(df: DataFrame, name: String): DataFrame =
      df.agg(theta_sketch(doc_fingerprint(col(textCol)), nominalK).as(name))
    sk(a, "__ta").crossJoin(sk(b, "__tb"))
      .select(
        theta_estimate(col("__ta")).as("est_a"),
        theta_estimate(col("__tb")).as("est_b"),
        theta_estimate(theta_intersect(col("__ta"), col("__tb"))).as("est_intersect"),
        theta_estimate(graft.functions.theta_union(col("__ta"), col("__tb"))).as("est_union"),
        theta_jaccard(col("__ta"), col("__tb")).as("jaccard"),
        (theta_estimate(theta_intersect(col("__ta"), col("__tb"))) /
          greatest(theta_estimate(col("__tb")), lit(1.0))).as("dup_frac_b"))
  }
}
