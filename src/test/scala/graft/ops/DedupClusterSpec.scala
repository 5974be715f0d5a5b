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
