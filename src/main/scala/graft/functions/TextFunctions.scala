package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text operations — the reference's per-document Python string
  * munging (sheaswauger/dissertation-data-pipeline
  * scripts/legislation/normalize_corpus.py:117-131 normalize_plain_text,
  * text_processor.py:119-131 search_keywords) re-expressed as compositions of
  * `org.apache.spark.sql.functions._` so every operation stays inside
  * whole-stage codegen — no UDFs, no Python, nothing driver-side.
  *
  * Each function documents its exact DuckDB-SQL equivalent; oracle SQL in the
  * operator files must mirror these expressions verbatim (same regexes, same
  * guard order) so results hash-match.
  */
object TextFunctions {

  /** The exact character set Java's regex `\s` matches (no UNICODE flag):
    * space, tab, newline, vertical tab, form feed, carriage return. The
    * translate/trim forms below are defined over this set so they are
    * bit-identical to the regex forms they replaced (r16: the regex
    * char-class scans were the dominant per-row cost of the quality/stats
    * family — translate is a plain table lookup per char, no NFA). */
  private val wsChars = " \t\n\u000B\f\r"

  /** Strip leading/trailing whitespace of ALL kinds. SQL `trim()` (Spark and
    * DuckDB alike) removes only spaces — Python's `.strip()`/`.split()`
    * semantics in the reference need tabs/newlines stripped too.
    * Implementation: `trim(BOTH <\s charset> FROM c)` — identical to the
    * previous regexp_replace(c, "^\\s+|\\s+$", "") on every string, ~10×
    * cheaper. DuckDB oracle form stays regexp_replace(x, '^\s+|\s+$', '', 'g'). */
  def wsTrim(c: Column): Column =
    trim(c, wsChars)

  /** The reference's normalize_plain_text chain (normalize_corpus.py:117):
    * lowercase → HTML-entity decode → strip numeric-only lines → collapse
    * spaces/tabs → collapse 3+ newlines → trim.
    * DuckDB: regexp_replace(...,'g') chain with the same patterns. */
  def normalizeText(c: Column): Column = {
    val n0 = lower(c)
    // literal entity decodes: replace() (plain substring scan) — identical
    // to regexp_replace on a metachar-free literal pattern, regex-free
    val n1 = replace(n0, lit("&amp;"), lit("&"))
    val n2 = replace(n1, lit("&nbsp;"), lit(" "))
    val n3 = regexp_replace(n2, "(?m)^\\s*\\d+\\s*$", "")
    val n4 = regexp_replace(n3, "[ \\t]+", " ")
    val n5 = regexp_replace(n4, "\\n{3,}", "\n\n")
    wsTrim(n5)
  }

  /** Whitespace-token count (normalize_corpus.py:176 `len(raw_text.split())`).
    * DuckDB: CASE WHEN length(<wsTrim>)=0 THEN 0 ELSE
    * array_length(regexp_split_to_array(<wsTrim>,'\s+')) END. */
  def wordCount(c: Column): Column =
    when(length(wsTrim(c)) === 0, lit(0L))
      .otherwise(size(split(wsTrim(c), "\\s+")).cast("long"))

  /** Count of non-overlapping occurrences of literal `marker` (length-delta
    * trick; exact, codegen'd). DuckDB:
    * (length(x)-length(replace(x,m,'')))/length(m) — double on both sides. */
  def occurrences(c: Column, marker: String): Column =
    (length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(marker), ""))) /
      lit(marker.length)

  /** Characters remaining after dropping everything not in [a-z]: counted
    * as length minus length-after-deleting-[a-z] via `translate` (char
    * table lookup) — identical to length(regexp_replace(c, "[^a-z]", ""))
    * at a fraction of the per-char cost. Oracle form stays the regex. */
  def alphaCount(c: Column): Column =
    (length(c) - length(translate(c, "abcdefghijklmnopqrstuvwxyz", "")))
      .cast("long")

  /** Count of sentence punctuation characters (translate form — identical
    * to the regexp_replace char-class count). */
  def punctCount(c: Column): Column =
    length(c) - length(translate(c, ".,!?;:", ""))

  /** Non-whitespace character count (translate over the Java `\s` set —
    * identical to length(regexp_replace(c, "\\s", ""))). */
  def nonSpaceCount(c: Column): Column =
    length(translate(c, wsChars, "")).cast("long")

  /** Distinct k-word shingles of a whitespace-tokenized text, as an array
    * column. Empty array when the text has fewer than k tokens.
    * Built from split + transform + slice — fully codegen'd, no UDF. */
  def wordShingles(c: Column, k: Int): Column = {
    val toks = split(wsTrim(c), "\\s+")
    val n = size(toks)
    array_distinct(
      when(n < k, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), n - lit(k)),
          i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
  }
}
