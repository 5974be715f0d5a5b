package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Transitive near-dup cluster resolution (large-star/small-star, SoCC
  * 2014): component-exact vs a local union-find oracle, O(log n) round
  * convergence on a path graph, and the end-to-end nearDedup verdict.
  */
class DedupClusterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Local union-find oracle (test-side only — the operator under test
    * must never do this driver-side).
    */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("random graph: mapping equals union-find components, rep = component min") {
    // deterministic pseudo-random graph: 300 nodes, ~400 edges
    val edges = (0 until 400).map { i =>
      val h = graft.core.Fnv.splitmix64(1234L + i)
      val a = java.lang.Long.remainderUnsigned(h, 300L)
      val b = java.lang.Long.remainderUnsigned(h >>> 20, 300L)
      (a, b)
    }.filter(e => e._1 != e._2)
    val want = ufComponents(edges)
    val got = Dedup.resolveClusters(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    // rep is the minimum of its component
    got.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.keys.min == rep)
    }
  }

  test("path graph: single cluster resolved in O(log n) star rounds") {
    val n = 64
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (mapping, iters) = Dedup.resolveClustersInternal(edges, "id_a", "id_b", 50)
    val got = mapping.as[(Long, Long)].collect().toMap
    assert(got == (0L until n.toLong).map(_ -> 0L).toMap)
    // the worst case for label propagation (diameter n); star rounds
    // contract it logarithmically — a propagation-style O(n) loop would
    // need ~63 rounds here
    assert(iters <= 2 + 2 * (math.log(n.toDouble) / math.log(2)).ceil.toInt,
      s"took $iters rounds for a $n-node path")
  }

  test("5k-node graph with giant + medium + singleton components matches union-find") {
    // one giant chain of 2000 nodes (worst-case diameter), 100 medium
    // 10-node rings, plus pseudo-random cross edges inside each block
    val chain = (0L until 1999L).map(i => (i, i + 1))
    val rings = (0 until 100).flatMap { r =>
      val base = 10000L + r * 10
      (0 until 10).map(i => (base + i, base + (i + 1) % 10))
    }
    val extra = (0 until 500).map { i =>
      val h = graft.core.Fnv.splitmix64(77L + i)
      val a = java.lang.Long.remainderUnsigned(h, 2000L)
      val b = java.lang.Long.remainderUnsigned(h >>> 17, 2000L)
      (a, b)
    }.filter(e => e._1 != e._2)
    val edges = chain ++ rings ++ extra
    val want = ufComponents(edges)
    val (mapping, iters) = Dedup.resolveClustersInternal(
      edges.toDF("id_a", "id_b").repartition(16), "id_a", "id_b", 50)
    val got = mapping.as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(got.values.toSet.size == 101) // giant + 100 rings
    assert(iters <= 2 + 2 * (math.log(2000.0) / math.log(2)).ceil.toInt,
      s"took $iters rounds")
  }

  test("chained A~B~C with A!~C: one transitive cluster, min-id rep") {
    // the defining transitivity case: only consecutive pairs are edges
    val edges = Seq((10L, 20L), (20L, 30L), (50L, 60L)).toDF("id_a", "id_b")
    val got = Dedup.resolveClusters(edges).as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 50L -> 50L, 60L -> 50L))
  }

  test("string ids, reversed/duplicate/self/null edges all normalize") {
    val edges = Seq(
      ("b", "a"), ("a", "b"), ("b", "c"), ("x", "x"), (null, "z"), ("q", null))
      .toDF("id_a", "id_b")
    val got = Dedup.resolveClusters(edges).as[(String, String)].collect().toMap
    // x only had a self-loop, z/q only null edges -> none of them appear
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a"))
  }

  test("empty edge set -> empty mapping with the right schema") {
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val m = Dedup.resolveClusters(edges)
    assert(m.columns.toSeq == Seq("id", "rep_id"))
    assert(m.count() == 0)
  }

  test("nearDedupKeepBest keeps the argmax-score row per cluster, not the min id") {
    val words = (0 until 80).map(i => s"w${graft.core.Fnv.splitmix64(i.toLong) & 0xffff}")
    def windowText(start: Int, extra: Int): String =
      (words.slice(start, start + 40) ++ Seq.fill(extra)("pad")).mkString(" ")
    val rows = Seq(
      // near chain where the LONGEST doc has the LARGEST id
      (1L, windowText(0, 0)), (2L, windowText(1, 0)), (3L, windowText(2, 3)),
      // exact class: all texts identical, equal scores -> min id tiebreak
      (10L, "same page " * 10), (11L, "same page " * 10),
      (20L, "unrelated solitary document about nothing"))
      .toDF("doc_id", "text")
    val kept = Dedup.nearDedupKeepBest(rows, "doc_id", "text",
        length(col("text")), threshold = 0.6)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 10L, 20L), kept.toString) // 3 = longest in its cluster
    // schema preserved, one row per survivor
    val full = Dedup.nearDedupKeepBest(rows, "doc_id", "text",
      length(col("text")), threshold = 0.6)
    assert(full.columns.toSeq == Seq("doc_id", "text"))
    assert(full.count() == 3)
  }

  test("hot star: 100k-leaf mega-star resolves, star rounds plan has NO Window node") {
    // the web-template shape the skew contract exists for: one node with
    // 100k neighbors, plus a ring and a chain so multiple components mix
    val star = spark.range(1L, 100001L)
      .select(lit(0L).as("id_a"), col("id").as("id_b"))
    val ring = spark.range(0L, 10L).select(
      (col("id") + 500000L).as("id_a"),
      ((col("id") + 1L) % 10L + 500000L).as("id_b"))
    val chain = spark.range(0L, 99L).select(
      (col("id") + 600000L).as("id_a"), (col("id") + 600001L).as("id_b"))
    val edges = star.unionAll(ring).unionAll(chain)
    val (mapping, iters) = Dedup.resolveClustersInternal(edges, "id_a", "id_b", 50)
    val reps = mapping.groupBy("rep_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(reps == Map(0L -> 100001L, 500000L -> 10L, 600000L -> 100L))
    // O(log n) bound: the 100-node chain dominates the round count (the
    // star itself is near-terminal); 2·log2(100) ≈ 13 with slack
    assert(iters <= 13, s"expected O(log n) rounds, took $iters")
    // the skew contract itself: neighborhood minima come from a
    // partial-aggregating groupBy+join-back, never a per-node Window
    // (which would funnel the mega-star's adjacency through one task)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (round <- Seq(Dedup.largeStar(edges.select(
        least(col("id_a"), col("id_b")).as("u"),
        greatest(col("id_a"), col("id_b")).as("v"))),
      Dedup.smallStar(edges.select(
        least(col("id_a"), col("id_b")).as("u"),
        greatest(col("id_a"), col("id_b")).as("v"))))) {
      val windows = round.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(windows.isEmpty, "star round must not contain a Window node")
    }
  }

  test("nearDedupFromEdges composes with simHashPairs edges + Keep policies") {
    val words = (0 until 80).map(i => s"w${graft.core.Fnv.splitmix64(i.toLong) & 0xffff}")
    def windowText(start: Int, extra: Int): String =
      (words.slice(start, start + 40) ++ Seq.fill(extra)("pad")).mkString(" ")
    val rows = Seq(
      (1L, windowText(0, 0)), (2L, windowText(0, 0)), (3L, windowText(1, 5)),
      (20L, "a completely unrelated solitary document"))
      .toDF("doc_id", "text")
    val edges = Dedup.simHashPairs(rows, "doc_id", "text", maxDistance = 12)
    // the composition is checked against whatever pairs simhash ACTUALLY
    // found, via the union-find oracle — with the floor that the exact
    // dup (1,2) must be an edge (hamming 0) so a real cluster exists
    val edgeSeq = edges.select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    assert(edgeSeq.contains((1L, 2L)), s"premise: exact dup must pair, got $edgeSeq")
    val comp = ufComponents(edgeSeq)
    val allIds = Set(1L, 2L, 3L, 20L)
    val wantMin = allIds.filter(id => comp.get(id).forall(_ == id))
    val keptMin = Dedup.nearDedupFromEdges(rows, "doc_id", edges)
      .select($"doc_id").as[Long].collect().toSet
    assert(keptMin == wantMin, s"got $keptMin want $wantMin (edges $edgeSeq)")
    assert(!keptMin.contains(2L) && keptMin.contains(20L))
    // keep-best: the longest text wins its cluster (doc 3 carries 5 pad
    // words, so IF it clustered with 1/2 it must be the survivor; the
    // {1,2} tie breaks to min id)
    val lens = Map(1L -> windowText(0, 0).length, 2L -> windowText(0, 0).length,
      3L -> windowText(1, 5).length, 20L -> 40)
    val byCluster = allIds.groupBy(id => comp.getOrElse(id, id))
    val wantBest = byCluster.values.map(m => m.toSeq.sortBy(id => (-lens(id), id)).head).toSet
    val keptBest = Dedup.nearDedupFromEdges(rows, "doc_id", edges,
        Dedup.Keep.Best(length(col("text"))))
      .select($"doc_id").as[Long].collect().toSet
    assert(keptBest == wantBest, s"got $keptBest want $wantBest (edges $edgeSeq)")
    assert(Dedup.nearDedupFromEdges(rows, "doc_id", edges).columns.toSeq ==
      Seq("doc_id", "text"))
  }

  test("nearDedupFromEdges Keep.Best: null scores fall back to min id, ties break by id") {
    val rows = Seq(
      (1L, "x", Option.empty[Int]), (2L, "x", Option.empty[Int]), // all-null cluster
      (10L, "y", Some(5)), (11L, "y", Some(5)), (12L, "y", Some(3)), // tie at 5
      (30L, "z", Some(1))) // singleton, no edges
      .toDF("doc_id", "grp", "score")
    val edges = Seq((1L, 2L), (10L, 11L), (11L, 12L)).toDF("id_a", "id_b")
    val kept = Dedup.nearDedupFromEdges(rows, "doc_id", edges,
        Dedup.Keep.Best(col("score")))
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 10L, 30L), kept.toString)
  }

  test("nearDedup end-to-end: exact classes + near chains each keep ONE min-id rep") {
    val words = (0 until 80).map(i => s"w${graft.core.Fnv.splitmix64(i.toLong) & 0xffff}")
    def windowText(start: Int): String = words.slice(start, start + 40).mkString(" ")
    val rows =
      // near-dup chain: 3 sliding windows (consecutive overlap ~ 39/41)
      Seq((1L, windowText(0)), (2L, windowText(1)), (3L, windowText(2)),
        // exact-dup class
        (10L, "identical boilerplate page " * 5), (11L, "identical boilerplate page " * 5),
        (12L, "identical boilerplate page " * 5),
        // unrelated singletons
        (20L, words.reverse.mkString(" ")), (21L, "completely different tiny doc"))
    val df = rows.toDF("doc_id", "text")
    val kept = Dedup.nearDedup(df, "doc_id", "text", threshold = 0.6)
      .select($"doc_id").as[Long].collect().toSet
    // one survivor per cluster (the min id), singletons untouched
    assert(kept.contains(1L) && !kept.contains(2L) && !kept.contains(3L))
    assert(kept.contains(10L) && !kept.contains(11L) && !kept.contains(12L))
    assert(kept.contains(20L) && kept.contains(21L))
  }
}
