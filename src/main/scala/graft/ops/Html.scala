package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the first step of every webtext pipeline:
  * turn a crawled page body into the plain text the rest of the library
  * (dedup fingerprints, quality scores, token budgets, PII scrub)
  * operates on.
  *
  * Strictly map-only: a fixed chain of built-in `regexp_replace` /
  * `replace` calls, fully inside whole-stage codegen — no UDF, no DOM, no
  * shuffle. At 100 TB the extraction runs at scan speed and composes into
  * the same stage as the fingerprint/score expressions that consume it.
  *
  * Like [[Pii]], every pattern lives in the Java-regex ∩ RE2 common
  * subset (inline `(?is)` flags, lazy `.*?`, no lookaround/backrefs) so
  * the SAME constants drive the Spark expressions and the DuckDB oracle.
  *
  * This is deliberately a tag-structure extractor, not a browser: CDATA,
  * conditional comments, and malformed-nesting recovery are out of scope
  * (a crawl pipeline treats those pages as low-quality, and the quality
  * score downstream does exactly that). `<script>`/`<style>` payloads and
  * comments are REMOVED (their text is code, not prose); block-level
  * closers become newlines so paragraph structure survives for
  * [[Dedup.paragraphDedup]]; remaining tags become spaces; the five
  * ubiquitous HTML entities decode (`&amp;` last, so double-escaped
  * entities stay escaped — the lossless order); whitespace collapses.
  */
object Html {

  /** Script/style elements with their payload (flags inline: case-insensitive,
    * dot-matches-newline; lazy body so adjacent elements never fuse).
    */
  val ScriptPattern = "(?is)<script[^>]*>.*?</script>"
  val StylePattern = "(?is)<style[^>]*>.*?</style>"

  /** HTML comments (lazy — adjacent comments never fuse). */
  val CommentPattern = "(?s)<!--.*?-->"

  /** Closing tags of block-level elements, plus `<br>`: replaced by a
    * newline so paragraph/line structure survives extraction.
    */
  val BlockClosePattern =
    "(?i)</(p|div|h[1-6]|li|tr|table|ul|ol|blockquote|pre|section|article|header|footer)>|(?i)<br[^>]*>"

  /** Any remaining tag (opening, closing, self-closing): becomes a space. */
  val TagPattern = "<[^>]*>"

  /** The `<title>` payload. */
  val TitlePattern = "(?is)<title[^>]*>(.*?)</title>"

  /** Double-quoted `href` of an anchor tag. */
  val HrefPattern = "(?i)<a\\s[^>]*href=\"([^\"]*)\""

  /** Whitespace normalization: horizontal runs → one space, then
    * newline clusters (with attached spaces) → one newline, then strip
    * leading/trailing whitespace entirely.
    */
  val HSpacePattern = "[ \\t\\r]+"
  val NlClusterPattern = " ?\\n[\\n ]*"
  val EdgePattern = "^[\\n ]+|[\\n ]+$"

  /** The five entities worth decoding without an entity table, in the
    * lossless order (`&amp;` strictly last).
    */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  private def decodeEntities(c: Column): Column =
    Entities.foldLeft(c) { case (x, (e, ch)) => replace(x, lit(e), lit(ch)) }

  private def collapseWs(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, HSpacePattern, " "),
        NlClusterPattern, "\n"),
      EdgePattern, "")

  /** Extract readable text from an HTML column (see object doc for the
    * exact contract). NULL html → NULL out.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, ScriptPattern, " ")
    val noStyle = regexp_replace(noScript, StylePattern, " ")
    val noComment = regexp_replace(noStyle, CommentPattern, " ")
    val blocks = regexp_replace(noComment, BlockClosePattern, "\n")
    val noTags = regexp_replace(blocks, TagPattern, " ")
    collapseWs(decodeEntities(noTags))
  }

  /** The page title (entity-decoded, whitespace-collapsed; empty string
    * when the page has no `<title>`).
    */
  def htmlTitle(html: Column): Column =
    collapseWs(decodeEntities(regexp_extract(html, TitlePattern, 1)))

  /** All double-quoted anchor hrefs, in document order, entities decoded
    * (href values escape `&` as `&amp;` in valid HTML). Feed through
    * [[TextOps.canonicalizeUrl]] for crawl-frontier dedup.
    */
  def htmlLinks(html: Column): Column =
    transform(regexp_extract_all(html, lit(HrefPattern), lit(1)), decodeEntities(_))
}
