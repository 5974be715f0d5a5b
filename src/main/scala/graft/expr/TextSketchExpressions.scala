package graft.expr

import graft.core.Fnv
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row text-sketch expressions for near-duplicate detection at corpus
  * scale (Broder 1997 minhash/shingling; Charikar 2002 simhash; the LSH
  * banding scheme of Leskovec-Rajaraman-Ullman, "Mining of Massive
  * Datasets" ch.3). Hashing derives from the library's FNV-1a family
  * (reference `bloom.c:499-508`) finalized with splitmix64.
  */
private[graft] object TextShingles {
  /** Whitespace tokens (the library-wide tokenizer contract). */
  def tokens(s: String): Array[String] = {
    val t = s.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** 64-bit content fingerprint: FNV-1a rolled over the whitespace-
    * normalized tokens, splitmix-finalized. Shared by the
    * `doc_fingerprint` expression and the streaming dedup operators so
    * stream and batch agree on what "same content" means.
    */
  def fingerprint(s: String): Long = {
    val ts = tokens(s)
    var h = Fnv.OffsetBasis
    var i = 0
    while (i < ts.length) {
      val bytes = ts(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var j = 0
      while (j < bytes.length) { h ^= (bytes(j) & 0xffL); h *= Fnv.Prime; j += 1 }
      h ^= ' '.toLong; h *= Fnv.Prime // token boundary
      i += 1
    }
    Fnv.splitmix64(h)
  }

  /** 64-bit simhash over whitespace tokens (Charikar 2002). */
  def simhash(s: String): Long = {
    val ts = tokens(s)
    val votes = new Array[Int](64)
    var i = 0
    while (i < ts.length) {
      val h = Fnv.splitmix64(Fnv.fnv1a(ts(i), 0))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Hashes of word w-shingles (w consecutive tokens), one pass.
    *
    * Each token is hashed once (FNV-1a over its UTF-8 bytes); a shingle's
    * hash is an order-sensitive FNV-style combine of its tokens' hashes,
    * splitmix-finalized. No per-shingle string/byte materialization — the
    * per-document cost is O(tokens) hashing + O(shingles) mixing, which
    * is the map-side hot loop of minhash dedup at corpus scale (the
    * previous per-shingle StringBuilder+getBytes dominated the profile).
    * Equal token sequences ⇒ equal hashes, unchanged.
    */
  def shingleHashes(s: String, w: Int): Array[Long] = {
    val ts = tokens(s)
    if (ts.isEmpty) return Array.empty
    val th = new Array[Long](ts.length)
    var i = 0
    while (i < ts.length) {
      th(i) = Fnv.fnv1a(ts(i).getBytes(java.nio.charset.StandardCharsets.UTF_8), 0)
      i += 1
    }
    if (ts.length < w) {
      var h = th(0)
      var j = 1
      while (j < ts.length) { h = h * Fnv.Prime ^ th(j); j += 1 }
      Array(Fnv.splitmix64(h))
    } else {
      val out = new Array[Long](ts.length - w + 1)
      i = 0
      while (i + w <= ts.length) {
        var h = th(i)
        var j = 1
        while (j < w) { h = h * Fnv.Prime ^ th(i + j); j += 1 }
        out(i) = Fnv.splitmix64(h)
        i += 1
      }
      out
    }
  }
}

/** `minhash_signature(text, k, shingleWidth)` → `array<bigint>` of k
  * minhash values over word shingles. Signature agreement fraction is an
  * unbiased estimator of shingle-set Jaccard similarity (Broder 1997).
  *
  * Implementation is hybrid by shingle count:
  *  - '''dense docs (shingles ≥ k)''' — ONE-PERMUTATION HASHING (Li,
  *    Owen, Zhang, NIPS 2012) with rotation densification over the
  *    ORIGINAL bin occupancy (Shrivastava & Li, UAI 2014): each shingle
  *    is hashed once and routed to one of k bins; the signature is the
  *    per-bin minimum; empty bins borrow (cyclically, re-mixed with the
  *    distance) from the next originally-non-empty bin. O(shingles + k)
  *    per document instead of classic minhash's O(k × shingles) — the
  *    map-side hot loop of LSH dedup at corpus scale;
  *  - '''tiny docs (shingles ≤ classicMaxShingles)''' — classic per-seed
  *    minhash (Broder's estimator exactly). OPH degrades specifically
  *    here: a subset pair A ⊂ B with u extra shingles gets an IDENTICAL
  *    signature with probability ≈ (s/k)^u/2^u (every extra shingle
  *    must land in an occupied bin without winning the min), and for a
  *    subset to be a genuine non-near-dup (J = s/(s+u) well below
  *    threshold) u must be a large fraction of s — only plausible when
  *    s is a handful (e.g. s=1, u=1: J=0.5, collapse prob ~1/2k...
  *    measured est 1.0). At s ≥ k/8 a harmful collapse needs u ≥ s/3
  *    extras ALL colliding — probability (s/k)^(s/3), negligible —
  *    while one-extra-shingle collapses (est 1.0 vs true J = s/(s+1) ≥
  *    0.89) are above any dedup threshold anyway. Classic costs only
  *    O(k × s) on these docs, so the hybrid keeps the exact estimator
  *    where it matters and the O(s + k) path for real pages (median web
  *    doc here: ~27 shingles ≥ 64/8).
  *
  * '''Cross-path comparability.''' Signatures from the two paths are NOT
  * comparable: a pair straddling the cutoff gets ~random signature
  * agreement and will never collide in any band. A straddling pair
  * (s_a ≤ c < s_b at cutoff c) has Jaccard ≤ s_a/s_b ≤ c/(c+1), so the
  * boundary is HARMLESS for any dedup threshold t > c/(c+1) — callers
  * that know their threshold (e.g. [[graft.ops.Dedup.minHashPairs]])
  * pass `classicMaxShingles = ceil(t/(1-t)) - 1` (then c/(c+1) < t
  * exactly) and the boundary can only hide pairs already below
  * threshold. The default `-1` keeps the cost/quality rule
  * `s ≤ (k-1)/8`, whose boundary (c/(c+1) = 7/8 at k=64) is only safe
  * for t > 7/8; at looser thresholds prefer the explicit cutoff.
  *
  * Identical texts always produce identical signatures (exact-duplicate
  * classes collide in every band). Deterministic across runs/partitions.
  */
case class MinHashSignature(child: Expression, numHashes: Int, shingleWidth: Int,
                            classicMaxShingles: Int = -1)
    extends UnaryExpression with GraftTypeCheck {
  require(numHashes > 0 && numHashes <= 1024, s"numHashes in (0,1024], got $numHashes")
  require(shingleWidth > 0, s"shingleWidth > 0, got $shingleWidth")

  /** Effective classic-path cutoff: docs with `shingles <= cutoff` take
    * the classic path. Sentinel -1 = the k/8 cost rule.
    */
  private val classicCutoff: Int =
    if (classicMaxShingles >= 0) classicMaxShingles else (numHashes - 1) / 8

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def expectedTypes = Seq(GraftTypeCheck.string)

  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => Fnv.splitmix64(0x5EED0000L + 2L * i + 1L))

  def probe(v: UTF8String): ArrayData = {
    if (MinHashSignature.countProbes) MinHashSignature.probeCount.incrementAndGet()
    val hs = TextShingles.shingleHashes(v.toString, shingleWidth)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    if (hs.length <= classicCutoff) {
      // classic path for tiny docs (exact Broder estimator, cheap here)
      var i = 0
      while (i < numHashes) {
        var mn = Long.MaxValue
        var j = 0
        while (j < hs.length) {
          val h = Fnv.splitmix64(hs(j) ^ seeds(i))
          if (h < mn) mn = h
          j += 1
        }
        sig(i) = mn
        i += 1
      }
    } else {
      var j = 0
      while (j < hs.length) {
        val h = hs(j)
        // bin from the high bits, compared value an independent mix of
        // the full hash — bin and value stay uncorrelated
        val b = java.lang.Long.remainderUnsigned(h >>> 32, numHashes.toLong).toInt
        val vmix = Fnv.splitmix64(h)
        if (vmix < sig(b)) sig(b) = vmix
        j += 1
      }
      // rotation densification over a SNAPSHOT of original occupancy —
      // borrowing must come from an originally-filled bin, never from a
      // bin itself filled by densification (chained borrows would make
      // densified values scan-order artifacts, distorting the per-bin
      // collision probability)
      val filled = new Array[Boolean](numHashes)
      var i = 0
      while (i < numHashes) { filled(i) = sig(i) != Long.MaxValue; i += 1 }
      i = 0
      while (i < numHashes) {
        if (!filled(i)) {
          var t = 1
          while (t < numHashes && !filled((i + t) % numHashes)) t += 1
          sig(i) = Fnv.splitmix64(sig((i + t) % numHashes) + t.toLong)
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }
  override def nullSafeEval(v: Any): Any = probe(v.asInstanceOf[UTF8String])
  // codegen'd (not CodegenFallback): the signature is computed once per
  // corpus row — the map-side hot path of LSH dedup at web scale
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("mhs", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.probe($v);")
  }
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

object MinHashSignature {
  /** Test-only observability: when armed, every signature evaluation bumps
    * the counter — [[graft.ops.Dedup]] specs use it to prove signature
    * materialization kills the per-consumer lineage recompute (local mode
    * shares one JVM). A volatile read per row when disarmed; never armed
    * in production.
    */
  @volatile private[graft] var countProbes = false
  private[graft] val probeCount = new java.util.concurrent.atomic.AtomicLong
}

/** `simhash64(text)` → 64-bit simhash over whitespace tokens (Charikar
  * 2002): each token's hash votes ±1 per bit position weighted by its term
  * frequency; the sign vector is the fingerprint. Near-duplicates have
  * small Hamming distance.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with GraftTypeCheck {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override protected def expectedTypes = Seq(GraftTypeCheck.string)

  def probe(v: UTF8String): Long = TextShingles.simhash(v.toString)
  override def nullSafeEval(v: Any): Any = probe(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sh64", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.probe($v);")
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** `hamming64(a, b)` — Hamming distance between two 64-bit fingerprints.
  * Codegen emits the popcount inline (no method call).
  */
case class Hamming64(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with GraftTypeCheck {
  override def prettyName: String = "hamming64"
  override def dataType: DataType = IntegerType
  override protected def expectedTypes = Seq(Seq(LongType), Seq(LongType))
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Hamming64 = copy(l, r)
}

/** `doc_fingerprint(text)` — 64-bit content fingerprint: FNV-1a over the
  * whitespace-normalized text (rolling over tokens), splitmix-finalized.
  * Equal fingerprints ⇔ equal normalized content (up to hash collision).
  */
case class DocFingerprint(child: Expression)
    extends UnaryExpression with GraftTypeCheck {
  override def prettyName: String = "doc_fingerprint"
  override def dataType: DataType = LongType
  override protected def expectedTypes = Seq(GraftTypeCheck.string)
  def probe(v: UTF8String): Long = TextShingles.fingerprint(v.toString)
  override def nullSafeEval(v: Any): Any = probe(v.asInstanceOf[UTF8String])
  // codegen'd: exact dedup fingerprints every corpus row map-side
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("dfp", this, classOf[DocFingerprint].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.probe($v);")
  }
  override protected def withNewChildInternal(c: Expression): DocFingerprint = copy(child = c)
}
