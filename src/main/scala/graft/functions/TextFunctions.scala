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

  /** Strip leading/trailing whitespace of ALL kinds. SQL `trim()` (Spark and
    * DuckDB alike) removes only spaces — Python's `.strip()`/`.split()`
    * semantics in the reference need tabs/newlines stripped too.
    * DuckDB: regexp_replace(x, '^\s+|\s+$', '', 'g'). */
  def wsTrim(c: Column): Column =
    regexp_replace(c, "^\\s+|\\s+$", "")

  /** The reference's normalize_plain_text chain (normalize_corpus.py:117):
    * lowercase → HTML-entity decode → strip numeric-only lines → collapse
    * spaces/tabs → collapse 3+ newlines → trim.
    * DuckDB: regexp_replace(...,'g') chain with the same patterns. */
  def normalizeText(c: Column): Column = {
    val n0 = lower(c)
    val n1 = regexp_replace(n0, "&amp;", "&")
    val n2 = regexp_replace(n1, "&nbsp;", " ")
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

  /** Characters remaining after dropping everything not in [a-z]. */
  def alphaCount(c: Column): Column =
    length(regexp_replace(c, "[^a-z]", "")).cast("long")

  /** Count of sentence punctuation characters. */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[.,!?;:]", ""))

  /** Non-whitespace character count. */
  def nonSpaceCount(c: Column): Column =
    length(regexp_replace(c, "\\s", "")).cast("long")

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
