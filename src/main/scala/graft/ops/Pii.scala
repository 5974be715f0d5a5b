package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing — redact personally-identifiable spans (emails, IP
  * addresses, SSNs, payment-card numbers, phone numbers) from a text
  * column before training-data release.
  *
  * Strictly map-only: a fixed chain of built-in `regexp_replace` calls,
  * fully inside whole-stage codegen — no UDF, no shuffle, no state. At
  * 100 TB the scrub runs at scan speed and composes with any downstream
  * operator (dedup fingerprints, quality scores) in the same stage.
  *
  * The patterns deliberately live in the Java-regex ∩ RE2 common subset
  * (no backreferences, no lookaround) so the SAME pattern strings drive
  * both the Spark expressions and external engines (the DuckDB oracle
  * interpolates these constants verbatim). They are recall-leaning by
  * design: version strings can scrub as IPs, 13–16-digit order numbers as
  * cards — the standard trade for a release gate, where a missed SSN
  * costs more than an over-redacted token.
  *
  * Replacement order matters and is fixed: EMAIL → IP → SSN → CARD →
  * PHONE. Emails go first (their local parts may contain digit runs), the
  * dotted-quad before phones (dot-separated digit groups), SSNs before
  * cards and phones (shorter grouped-digit spans), cards before phones
  * (longest digit runs win).
  */
object Pii {

  /** RFC-casual email matcher. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (no octet-range check — recall-leaning). */
  val IpPattern = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** US SSN in the canonical 3-2-4 grouping. */
  val SsnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Payment-card shapes: 4-4-4-(1..4) groupings (13–16 digits, covering
    * contiguous runs too) or the Amex 4-6-5, each group optionally
    * space/dash-separated. Grouped — not "any 13–16 digits with
    * separators" — so two adjacent phone numbers never fuse into a
    * phantom card across the space between them. A 17+-digit contiguous
    * run matches nowhere in the run (bounded tail + trailing boundary).
    */
  val CardPattern =
    "\\b(\\d{4}[ -]?\\d{4}[ -]?\\d{4}[ -]?\\d{1,4}|\\d{4}[ -]?\\d{6}[ -]?\\d{5})\\b"

  /** Phone numbers: optional +CC, then 3-3-4 with separators or a
    * parenthesised area code. Separator-free digit runs never match (no
    * collision with ids / card remnants).
    */
  val PhonePattern = "(\\+\\d{1,2} )?(\\(\\d{3}\\) ?|\\d{3}[ .-])\\d{3}[ .-]\\d{4}\\b"

  val EmailTag = "[EMAIL]"
  val IpTag = "[IP]"
  val SsnTag = "[SSN]"
  val CardTag = "[CARD]"
  val PhoneTag = "[PHONE]"

  /** The ordered scrub chain — each entry `(pattern, replacementTag)`. */
  val Chain: Seq[(String, String)] = Seq(
    EmailPattern -> EmailTag,
    IpPattern -> IpTag,
    SsnPattern -> SsnTag,
    CardPattern -> CardTag,
    PhonePattern -> PhoneTag)

  /** Redact all five PII classes from `text` (fixed chain order). */
  def scrub(text: Column): Column =
    Chain.foldLeft(text) { case (c, (pat, tag)) => regexp_replace(c, pat, tag) }

  /** Occurrences of `tag` in an (already scrubbed) string — exact,
    * replace-based, engine-portable. Counts are inflated if the ORIGINAL
    * text already contained the literal tag; at release-gate scale that
    * is noise, and the scrubbed text itself stays correct regardless.
    */
  def tagCount(scrubbed: Column, tag: String): Column =
    ((length(scrubbed) - length(replace(scrubbed, lit(tag), lit("")))) /
      tag.length).cast("long")

  /** Per-class redaction counts as a struct — run over [[scrub]] output.
    * `struct(emails, ips, ssns, cards, phones)`.
    */
  def stats(scrubbed: Column): Column = struct(
    tagCount(scrubbed, EmailTag).as("emails"),
    tagCount(scrubbed, IpTag).as("ips"),
    tagCount(scrubbed, SsnTag).as("ssns"),
    tagCount(scrubbed, CardTag).as("cards"),
    tagCount(scrubbed, PhoneTag).as("phones"))
}
