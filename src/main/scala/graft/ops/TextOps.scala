package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data curation: token counting,
  * language identification, quality scoring. All pure `functions._`
  * compositions — codegen'd end to end, no UDFs in the hot path.
  */
object TextOps {

  /** Whitespace token count (0 for empty/blank strings). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword token estimate: word-boundary pieces plus an extra
    * token per 4 chars of long words (the standard ~4-chars/token
    * heuristic), all in integer arithmetic.
    */
  def subwordTokenEstimate(text: Column): Column = {
    val words = when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))
    aggregate(words, lit(0),
      (acc, w) => acc + greatest(lit(1), ceil(length(w).cast("double") / 4.0).cast("int")))
  }

  /** ccnet-style canonical form for deduplication (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data",
    * 2020 — lowercase, strip punctuation, unify digits, collapse
    * whitespace): two pages differing only in case/punctuation/numbers
    * fingerprint identically. Pure built-ins (codegen'd); ASCII character
    * classes so the exact transform is engine-portable (the DuckDB oracle
    * runs the same regexes).
    */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(text), "[0-9]", "0"),
        "[^a-z0 ]", " "),
      " +", " "))

  /** Gopher-style repetition signals (Rae et al., "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", 2021,
    * A1.1): fraction of duplicated non-blank lines and duplicated words —
    * high values flag boilerplate/machine-generated pages. Integer counts
    * + one double division; SQL-mirrorable exactly.
    */
  def dupLineFraction(text: Column): Column = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)
    when(size(lines) === 0, lit(0.0))
      .otherwise((size(lines) - size(array_distinct(lines))).cast("double") /
        size(lines).cast("double"))
  }

  def dupWordFraction(text: Column): Column = {
    val words = when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))
    when(size(words) === 0, lit(0.0))
      .otherwise((size(words) - size(array_distinct(words))).cast("double") /
        size(words).cast("double"))
  }

  /** Canonical URL form for crawl-level dedup (the standard web-pipeline
    * normalization; cf. RFC 3986 §6 syntax-based normalization):
    * lowercase scheme+host, drop the default port (80/443 per scheme),
    * drop the fragment, drop tracking parameters (`utm_*`, `gclid`,
    * `fbclid`), sort the remaining query parameters, and make the empty
    * path `/`. Two crawls of the same page with reordered/tracking
    * params then fingerprint identically. Pure built-in expressions
    * (regex + array ops — codegen'd), mirrored verbatim by the oracle.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostRaw, ":443$", ""))
      .otherwise(hostRaw)
    val pathQf = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1)
    // strip the fragment FIRST: a '?' inside a fragment (SPA routes like
    // "#sec?tab=2") is fragment content, not a query string
    val preFrag = regexp_extract(pathQf, "^([^#]*)", 1)
    val path = regexp_extract(preFrag, "^([^?]*)", 1)
    val query = regexp_extract(preFrag, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"), p =>
      length(p) > 0 && !p.startsWith("utm_") && !p.startsWith("gclid=") && !p.startsWith("fbclid=")))
    val canonQuery = array_join(params, "&")
    // schemeless / relative / malformed input has no canonical absolute
    // form — pass it through unchanged rather than collapsing every such
    // row onto one ":///" dedup key
    when(scheme === "", url).otherwise(
      concat(scheme, lit("://"), host,
        when(path === "", lit("/")).otherwise(path),
        when(canonQuery === "", lit("")).otherwise(concat(lit("?"), canonQuery))))
  }

  /** Stopword lists per language for the n-gram/stopword language-ID
    * heuristic. Small fixed lists (deterministic; public common words).
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with", "for", "was"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "dans", "que", "une", "pour"),
    "es" -> Seq("el", "la", "que", "los", "del", "las", "por", "una", "para", "con"),
    "it" -> Seq("il", "di", "che", "la", "per", "una", "sono", "del", "con", "non"),
    "pt" -> Seq("de", "que", "em", "para", "com", "uma", "dos", "mais", "como", "mas"),
    "nl" -> Seq("de", "het", "een", "van", "en", "dat", "niet", "met", "voor", "zijn"),
    "ru" -> Seq("и", "в", "не", "на", "что", "с", "это", "как", "по", "его"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不", "这", "他"),
    "ja" -> Seq("の", "に", "は", "を", "が", "と", "た", "して", "です", "ます"))

  /** Language-ID by stopword-hit voting: argmax over per-language stopword
    * hit counts, `und` (undetermined) when no list scores. Deterministic
    * tie-break by language code.
    */
  def langId(text: Column): Column = {
    val words = split(lower(trim(text)), "\\s+")
    val scored = Stopwords.toSeq.sortBy(_._1).map { case (langCode, sw) =>
      struct(size(array_intersect(words, lit(sw.toArray))).as("score"),
        lit(langCode).as("lang"))
    }
    // argmax: sort by (score desc, lang asc) => take struct max with
    // inverted lang not needed: array_max on struct orders by first field
    // then second, so negate nothing and break ties by *max* lang; make the
    // tie-break deterministic-ascending by comparing on (score, reversed code)
    val best = array_max(array(scored: _*))
    when(best.getField("score") <= 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Quality signals: length, token stats, punctuation/digit/uppercase
    * ratios, mean word length — the standard cheap web-text filters.
    * Returns a struct column.
    */
  def qualityStats(text: Column): Column = {
    val t = trim(text)
    val len = length(t).cast("double")
    val safeLen = greatest(len, lit(1.0))
    val toks = tokenCount(text)
    struct(
      length(t).as("chars"),
      toks.as("tokens"),
      (len / greatest(toks.cast("double"), lit(1.0))).as("mean_token_len"),
      (length(regexp_replace(t, "[^\\p{Punct}]", "")).cast("double") / safeLen).as("punct_ratio"),
      (length(regexp_replace(t, "[^0-9]", "")).cast("double") / safeLen).as("digit_ratio"),
      (length(regexp_replace(t, "[^A-Z]", "")).cast("double") / safeLen).as("upper_ratio"))
  }

  /** Scalar quality score in [0,1]: penalizes extreme punct/digit ratios
    * and degenerate token lengths. Heuristic, deterministic.
    */
  def qualityScore(text: Column): Column = {
    val s = qualityStats(text)
    val punctPenalty = least(s.getField("punct_ratio") * 4.0, lit(1.0))
    val digitPenalty = least(s.getField("digit_ratio") * 4.0, lit(1.0))
    val lenScore = when(s.getField("tokens") < 5, lit(0.2))
      .when(s.getField("tokens") > 10000, lit(0.5))
      .otherwise(lit(1.0))
    greatest(lit(0.0), lenScore * (lit(1.0) - punctPenalty * 0.7 - digitPenalty * 0.7))
  }
}
