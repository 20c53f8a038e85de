package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's corpus pipeline (sheaswauger/dissertation-data-pipeline)
  * re-expressed over the `documents` table:
  *
  *  - corpus_normalize        ← normalize_corpus.py:160-227 normalize_bill
  *  - corpus_keyword_match    ← text_processor.py:119-131 search_keywords
  *  - corpus_amendment_flag   ← normalize_corpus.py:60-77 detect_amendment
  *  - corpus_build            ← build_corpus.py:63-97 (key derive, filter, dedup)
  *  - corpus_summary          ← build_corpus.py:110-124 summary aggregations
  *  - corpus_merge_sources    ← build_master_corpus.py:118-140 priority dedup
  *  - corpus_status_normalize ← build_master_corpus.py:51 normalize_status
  *
  * All per-document work is codegen'd column expressions (no UDFs), so at
  * 100 TB each operator is a single scan, optionally followed by exactly one
  * shuffle (the groupBy/window key). Dedup windows partition on a content
  * hash — uniformly distributed, so no skew handling needed.
  */
object Corpus {

  private val keywords = Seq("spark", "join", "filter", "window", "hash", "stream")
  private val amendmentSignals = Seq("merge", "window", "stream")

  /** Per-document normalization + decisions-log word counts. */
  def corpusNormalize(s: SparkSession, d: String): DataFrame = {
    val doc = Tables.documents(s, d)
    val normalized = normalizeText(col("text"))
    doc.select(
        col("doc_id"),
        normalized.as("normalized_text"),
        wordCount(col("text")).as("raw_word_count"),
        wordCount(normalized).as("normalized_word_count"))
      .withColumn("words_removed_pct",
        when(col("raw_word_count") > 0,
          round((col("raw_word_count") - col("normalized_word_count")).cast("double")
            * 100.0 / col("raw_word_count").cast("double"), 2))
          .otherwise(lit(0.0)))
      .orderBy("doc_id")
  }

  // The SQL mirrors normalizeText / wordCount expression-for-expression.
  private val normChainSql =
    """regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |  lower(text), '&amp;', '&', 'g'), '&nbsp;', ' ', 'g'),
      |  '(?m)^\s*\d+\s*$', '', 'g'), '[ \t]+', ' ', 'g'), '\n{3,}', e'\n\n', 'g'),
      |  '^\s+|\s+$', '', 'g')""".stripMargin

  private def wcSql(x: String) = {
    val t = "regexp_replace(" + x + ", '^\\s+|\\s+$', '', 'g')"
    "CASE WHEN length(" + t + ") = 0 THEN 0 ELSE array_length(regexp_split_to_array(" + t + ", '\\s+')) END"
  }

  private val corpusNormalizeSql =
    s"""WITH n AS (
       |  SELECT doc_id, $normChainSql AS normalized_text,
       |    ${wcSql("text")} AS raw_word_count
       |  FROM documents
       |), m AS (
       |  SELECT doc_id, normalized_text, raw_word_count,
       |    ${wcSql("normalized_text")} AS normalized_word_count
       |  FROM n
       |)
       |SELECT doc_id, normalized_text, raw_word_count, normalized_word_count,
       |  CASE WHEN raw_word_count > 0
       |    THEN round((raw_word_count - normalized_word_count) * 100.0 / raw_word_count, 2)
       |    ELSE 0.0 END AS words_removed_pct
       |FROM m ORDER BY doc_id""".stripMargin

  /** Case-insensitive multi-keyword search, exploded to (doc, keyword). */
  def corpusKeywordMatch(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        explode(array(keywords.map(lit): _*)).as("keyword"))
      .filter(contains(lower(col("text")), col("keyword")))
      .select("doc_id", "keyword")
      .orderBy("doc_id", "keyword")

  private val corpusKeywordMatchSql =
    s"""SELECT doc_id, keyword
       |FROM documents
       |CROSS JOIN (VALUES ${keywords.map(k => s"('$k')").mkString(", ")}) k(keyword)
       |WHERE contains(lower(text), keyword)
       |ORDER BY doc_id, keyword""".stripMargin

  /** Amendment-detection heuristic: any signal substring present. */
  def corpusAmendmentFlag(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        amendmentSignals.map(sig => contains(lower(col("text")), lit(sig)))
          .reduce(_ || _).as("is_amendment"))
      .orderBy("doc_id")

  private val corpusAmendmentFlagSql =
    s"""SELECT doc_id,
       |  (${amendmentSignals.map(sig => s"contains(lower(text), '$sig')").mkString(" OR ")}) AS is_amendment
       |FROM documents ORDER BY doc_id""".stripMargin

  /** build_corpus.py semantics: derive key, filter, content-hash dedup
    * keeping the smallest id. */
  def corpusBuild(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id").asc)
    Tables.documents(s, d)
      .filter(col("n_chars") > 50 && length(col("lang")) === 2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        concat_ws("_", col("lang"), col("doc_id").cast("string")).as("doc_key"),
        col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  private val corpusBuildSql =
    """WITH ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |  FROM documents
      |  WHERE n_chars > 50 AND length(lang) = 2
      |)
      |SELECT lang || '_' || CAST(doc_id AS VARCHAR) AS doc_key,
      |  doc_id, lang, source, n_chars
      |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** Corpus summary aggregations (counts, nunique, value_counts idioms). */
  def corpusSummary(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        round(avg(col("n_chars").cast("double")), 2).as("avg_chars"),
        sum("n_chars").as("total_chars"))
      .orderBy("lang")

  private val corpusSummarySql =
    """SELECT lang, count(*) AS n_docs, count(DISTINCT source) AS n_sources,
      |  round(avg(n_chars * 1.0), 2) AS avg_chars,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** build_master_corpus.py: provenance-priority dedup across merged sources.
    * src0–src9 model the manually-curated source (priority 1), the rest the
    * API pipeline (priority 2); merge key buckets collide on doc_id % 250. */
  def corpusMergeSources(s: SparkSession, d: String): DataFrame = {
    val prio = when(length(col("source")) <= 4, lit(1L)).otherwise(lit(2L))
    val keyed = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), prio.as("priority"),
        (col("doc_id") % 250).as("merge_key"))
    val w = Window.partitionBy("merge_key").orderBy(col("priority").asc, col("doc_id").asc)
    keyed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("merge_key", "doc_id", "source", "priority")
      .orderBy("merge_key")
  }

  private val corpusMergeSourcesSql =
    """WITH keyed AS (
      |  SELECT doc_id, source,
      |    CASE WHEN length(source) <= 4 THEN 1 ELSE 2 END AS priority,
      |    doc_id % 250 AS merge_key
      |  FROM documents
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY merge_key ORDER BY priority, doc_id) AS rn
      |  FROM keyed
      |)
      |SELECT merge_key, doc_id, source, CAST(priority AS BIGINT) AS priority
      |FROM ranked WHERE rn = 1 ORDER BY merge_key""".stripMargin

  /** normalize_status: CASE-on-contains canonicalization, over orders. */
  def corpusStatusNormalize(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        when(col("o_orderstatus") === "F", "Fulfilled")
          .when(col("o_orderstatus") === "O", "Open")
          .otherwise("Other").as("status_norm"),
        when(contains(col("o_orderpriority"), lit("URGENT")), "Urgent")
          .when(contains(col("o_orderpriority"), lit("HIGH")), "High")
          .otherwise("Normal").as("priority_class"),
        col("o_totalprice"))
      .groupBy("status_norm", "priority_class")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("status_norm", "priority_class")

  private val corpusStatusNormalizeSql =
    """SELECT
      |  CASE WHEN o_orderstatus = 'F' THEN 'Fulfilled'
      |       WHEN o_orderstatus = 'O' THEN 'Open'
      |       ELSE 'Other' END AS status_norm,
      |  CASE WHEN contains(o_orderpriority, 'URGENT') THEN 'Urgent'
      |       WHEN contains(o_orderpriority, 'HIGH') THEN 'High'
      |       ELSE 'Normal' END AS priority_class,
      |  count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY status_norm, priority_class""".stripMargin

  /** Enrichment fill — legiscan_enricher.py's fill-missing-fields semantics:
    * deterministically mask lang on doc_id % 7 = 0 (simulating collection
    * gaps), derive each source's majority lang (rank with lexicographic
    * tie-break, NOT mode() — mode tie-breaking is engine-arbitrary), and
    * coalesce the gap from the lookup. The lookup is tiny → broadcast. */
  def corpusEnrich(s: SparkSession, d: String): DataFrame = {
    val masked = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("lang")).as("lang_raw"))
    val wr = Window.partitionBy("source").orderBy(col("cnt").desc, col("lang_raw").asc)
    val majority = masked.filter(col("lang_raw").isNotNull)
      .groupBy("source", "lang_raw").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") === 1)
      .select(col("source").as("m_source"), col("lang_raw").as("majority_lang"))
    masked.join(broadcast(majority), col("source") === col("m_source"), "left")
      .select(
        col("doc_id"), col("source"),
        coalesce(col("lang_raw"), col("majority_lang")).as("lang_filled"),
        col("lang_raw").isNull.as("was_filled"))
      .orderBy("doc_id")
  }

  private val corpusEnrichSql =
    """WITH masked AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang_raw
      |  FROM documents
      |), counts AS (
      |  SELECT source, lang_raw, count(*) AS cnt
      |  FROM masked WHERE lang_raw IS NOT NULL
      |  GROUP BY source, lang_raw
      |), majority AS (
      |  SELECT source AS m_source, lang_raw AS majority_lang
      |  FROM (SELECT *, row_number() OVER (PARTITION BY source ORDER BY cnt DESC, lang_raw) AS rn
      |        FROM counts)
      |  WHERE rn = 1
      |)
      |SELECT doc_id, source,
      |  coalesce(lang_raw, majority_lang) AS lang_filled,
      |  lang_raw IS NULL AS was_filled
      |FROM masked LEFT JOIN majority ON source = m_source
      |ORDER BY doc_id""".stripMargin

  /** HTML → text with strikethrough removal — the reference's most
    * distinctive transformation (normalize_corpus.py:80-114
    * remove_strikethrough_html: <s>/<strike>/<del> content is *deleted
    * statutory text* and must be dropped from the NLP copy, with the removed
    * char count logged; then script/style removal and tag stripping,
    * text_processor.py:52-72 html_to_text).
    *
    * Documents aren't stored as HTML here, so each doc is deterministically
    * wrapped in an HTML envelope (incl. a struck clause + a style block) and
    * then extracted — asserting the full pipeline: strikethrough content gone
    * and counted, markup stripped, entities decoded, whitespace collapsed.
    * Alternation pattern, not backreferences: RE2 (DuckDB) has no \1. */
  def corpusHtmlExtract(s: SparkSession, d: String): DataFrame = {
    val html = concat(
      lit("<html><body><h1>"), upper(col("lang")),
      lit("</h1><p>"), col("text"),
      lit("</p><s>struck clause "), col("doc_id").cast("string"),
      lit("</s><style>p{color:red}</style></body></html>"))
    val noStrike = regexp_replace(html, "<s>.*?</s>|<strike>.*?</strike>|<del>.*?</del>", "")
    val noBlocks = regexp_replace(noStrike, "<script>.*?</script>|<style>.*?</style>", "")
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    val decoded = regexp_replace(regexp_replace(noTags, "&amp;", "&"), "&nbsp;", " ")
    val cleaned = wsTrim(regexp_replace(decoded, "\\s+", " "))
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        cleaned.as("extracted_text"),
        (length(html) - length(noStrike)).cast("long").as("strike_chars_removed"),
        (length(html) > length(noStrike)).as("strikethrough_detected"),
        wordCount(cleaned).as("extracted_word_count"))
      .orderBy("doc_id")
  }

  private val corpusHtmlExtractSql =
    """WITH h AS (
      |  SELECT doc_id,
      |    '<html><body><h1>' || upper(lang) || '</h1><p>' || text ||
      |    '</p><s>struck clause ' || CAST(doc_id AS VARCHAR) ||
      |    '</s><style>p{color:red}</style></body></html>' AS html
      |  FROM documents
      |), st AS (
      |  SELECT doc_id, html,
      |    regexp_replace(html, '<s>.*?</s>|<strike>.*?</strike>|<del>.*?</del>', '', 'g') AS no_strike
      |  FROM h
      |), ex AS (
      |  SELECT doc_id, html, no_strike,
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      no_strike,
      |      '<script>.*?</script>|<style>.*?</style>', '', 'g'),
      |      '<[^>]+>', ' ', 'g'),
      |      '&amp;', '&', 'g'), '&nbsp;', ' ', 'g'),
      |      '\s+', ' ', 'g') AS sp
      |  FROM st
      |)
      |SELECT doc_id,
      |  regexp_replace(sp, '^\s+|\s+$', '', 'g') AS extracted_text,
      |  length(html) - length(no_strike) AS strike_chars_removed,
      |  length(html) > length(no_strike) AS strikethrough_detected,
      |  CASE WHEN length(regexp_replace(regexp_replace(sp, '^\s+|\s+$', '', 'g'), '^\s+|\s+$', '', 'g')) = 0 THEN 0
      |       ELSE array_length(regexp_split_to_array(regexp_replace(sp, '^\s+|\s+$', '', 'g'), '\s+')) END AS extracted_word_count
      |FROM ex ORDER BY doc_id""".stripMargin

  /** Base64 document payload decode — text_processor.py:23-40
    * decode_bill_text: base64 → bytes → extension by mime type. Encode side
    * is synthesized (deterministic by source), decode side is the real op. */
  def corpusDecodeRoundtrip(s: SparkSession, d: String): DataFrame = {
    val mime = when(col("source").isin("src0", "src1", "src2"), "text/html")
      .when(col("source").isin("src3", "src4"), "application/pdf")
      .otherwise("text/plain")
    val payload = base64(col("text").cast("binary"))
    val decoded = decode(unbase64(payload), "UTF-8")
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        mime.as("mime_type"),
        when(mime === "text/html", ".html")
          .when(mime === "application/pdf", ".pdf")
          .otherwise(".txt").as("ext"),
        // byte length of the DECODED payload, not the base64 string — Spark's
        // base64 inserts MIME line breaks, DuckDB's doesn't
        length(unbase64(payload)).cast("long").as("decoded_bytes"),
        (decoded === col("text")).as("roundtrip_ok"))
      .orderBy("doc_id")
  }

  private val corpusDecodeRoundtripSql =
    """SELECT doc_id,
      |  CASE WHEN source IN ('src0','src1','src2') THEN 'text/html'
      |       WHEN source IN ('src3','src4') THEN 'application/pdf'
      |       ELSE 'text/plain' END AS mime_type,
      |  CASE WHEN source IN ('src0','src1','src2') THEN '.html'
      |       WHEN source IN ('src3','src4') THEN '.pdf'
      |       ELSE '.txt' END AS ext,
      |  octet_length(from_base64(to_base64(encode(text)))) AS decoded_bytes,
      |  decode(from_base64(to_base64(encode(text)))) = text AS roundtrip_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Extension-dispatched text extraction — text_processor.py:81-97
    * extract_text_from_bytes: '.html' → html_to_text, '.pdf' → pdf_to_text,
    * else utf-8 decode.
    *
    * Payloads are synthesized per arm (documents aren't stored as raw files
    * here): an HTML envelope with a script block, a REAL one-page
    * uncompressed PDF (catalog → pages → page → content stream with the
    * text in an escaped BT..ET literal string, correct /Length), or the
    * plain text. The HTML and plain arms stay fully declarative/codegen'd.
    * The PDF arm runs functions/PdfText — a genuine pure-JVM PDF
    * content-stream scanner (PyPDF2's role, text_processor.py:65-79):
    * object/stream framing, BT..ET text objects, literal-string escapes
    * incl. octal, hex strings, TJ arrays. Byte scanning is imperative, so
    * that one arm rides a mapPartitions stage (the decode-rung exception to
    * the no-UDF rule, same as Multimodal.decodeStub); the declarative arms
    * are computed BEFORE the map so they keep whole-stage codegen.
    *
    * The shown string is prefixed with literal `()\` so every row forces
    * the escape decoder; the oracle recomputes all three arms from first
    * principles — for PDF that's the prefix + original text, so the hash
    * match proves the synthesize→escape→frame→scan→unescape round trip is
    * lossless on all 3 escape classes. Streams with /Filter fail closed to
    * "" like the reference's except-branch (spec-tested). */
  def corpusDecodeDispatch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ext = when(col("source").isin("src0", "src1", "src2"), ".html")
      .when(col("source").isin("src3", "src4"), ".pdf")
      .otherwise(".txt")
    def htmlToText(c: org.apache.spark.sql.Column) = {
      val noBlocks = regexp_replace(c, "<script>.*?</script>|<style>.*?</style>", "")
      val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
      val decoded = regexp_replace(regexp_replace(noTags, "&amp;", "&"), "&nbsp;", " ")
      wsTrim(regexp_replace(decoded, "\\s+", " "))
    }
    // PDF literal-string escaping: \ ( ) — then a literal `()\` prefix so
    // the unescape path is exercised even when the text has none of them
    val escaped = regexp_replace(regexp_replace(regexp_replace(col("text"),
      "\\\\", "\\\\\\\\"), "\\(", "\\\\("), "\\)", "\\\\)")
    val shown = concat(lit("\\(\\)\\\\"), escaped)
    val content = concat(lit("BT /F1 12 Tf 72 720 Td ("), shown, lit(") Tj ET"))
    val pdfPayload = concat(
      lit("%PDF-1.4\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
        "4 0 obj\n<< /Length "),
      octet_length(content).cast("string"),
      lit(" >>\nstream\n"), content,
      lit("\nendstream\nendobj\ntrailer\n<< /Root 1 0 R >>\n%%EOF"))
    val payload = when(ext === ".html",
        concat(lit("<html><body><p>"), col("text"),
          lit("</p><script>var x=1;</script></body></html>")))
      .when(ext === ".pdf", pdfPayload)
      .otherwise(col("text"))
    // declarative arms extracted BEFORE the imperative stage (codegen'd)
    val preExtracted = when(ext === ".html", htmlToText(payload))
      .when(ext === ".pdf", lit(null).cast("string"))
      .otherwise(payload)
    val staged = Tables.documents(s, d)
      .select(col("doc_id"), ext.as("ext"), payload.as("payload"),
        preExtracted.as("pre"))
    val extractedDf = staged
      .as[(Long, String, String, Option[String])]
      .mapPartitions(_.map { case (id, e, pl, pre) =>
        val t =
          if (e == ".pdf")
            graft.functions.PdfText.extractText(
              pl.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          else pre.getOrElse("")
        (id, e, t)
      })
      .toDF("doc_id", "ext", "extracted_text")
    extractedDf
      .select(
        col("doc_id"), col("ext"),
        when(col("ext") === ".html", "html_strip")
          .when(col("ext") === ".pdf", "pdf_text")
          .otherwise("plain_decode").as("method"),
        col("extracted_text"),
        length(col("extracted_text")).cast("long").as("extracted_chars"),
        (length(col("extracted_text")) > 0).as("extract_ok"))
      .orderBy("doc_id")
  }

  private val corpusDecodeDispatchSql =
    """WITH base AS (
      |  SELECT doc_id,
      |    CASE WHEN source IN ('src0','src1','src2') THEN '.html'
      |         WHEN source IN ('src3','src4') THEN '.pdf'
      |         ELSE '.txt' END AS ext,
      |    text
      |  FROM documents
      |), framed AS (
      |  SELECT doc_id, ext, text,
      |    CASE ext
      |      WHEN '.html' THEN '<html><body><p>' || text ||
      |        '</p><script>var x=1;</script></body></html>'
      |      ELSE text END AS payload
      |  FROM base
      |), ex AS (
      |  SELECT doc_id, ext,
      |    CASE ext
      |      WHEN '.html' THEN regexp_replace(regexp_replace(regexp_replace(
      |        regexp_replace(regexp_replace(regexp_replace(payload,
      |        '<script>.*?</script>|<style>.*?</style>', '', 'g'),
      |        '<[^>]+>', ' ', 'g'),
      |        '&amp;', '&', 'g'), '&nbsp;', ' ', 'g'),
      |        '\s+', ' ', 'g'), '^\s+|\s+$', '', 'g')
      |      -- first-principles truth for the REAL PDF scanner: the payload
      |      -- frames `()\` || text (escaped) inside a BT..ET literal string,
      |      -- so a correct synthesize->scan->unescape round trip yields
      |      -- exactly this, and the hash proves the extractor lossless
      |      WHEN '.pdf' THEN '()' || chr(92) || text
      |      ELSE payload END AS extracted_text
      |  FROM framed
      |)
      |SELECT doc_id, ext,
      |  CASE ext WHEN '.html' THEN 'html_strip' WHEN '.pdf' THEN 'pdf_text'
      |    ELSE 'plain_decode' END AS method,
      |  extracted_text,
      |  length(extracted_text) AS extracted_chars,
      |  length(extracted_text) > 0 AS extract_ok
      |FROM ex ORDER BY doc_id""".stripMargin

  /** Deterministic stratified sampling — the reproducible alternative to
    * random reservoir sampling at 100 TB: rank by a content-derived hash
    * (md5, available in both engines) within each stratum and keep the
    * bottom-k. Same rows on every run, every engine, any partitioning —
    * dedoose_sample in build_corpus.py:100 is the reference's (manual)
    * sampling step. */
  /** Temperature-balanced domain mixture (T = 2 ⇒ weight ∝ count^(1/2)) —
    * the domain-temperature step of assembling a pretraining mix, upweighting
    * small domains relative to proportional sampling. Budget = 20% of the
    * corpus, allocated ∝ √count across sources.
    *
    * Engine-exact weight derivation: sqrt is IEEE-correctly-rounded in both
    * engines, and round(√c·1000) can never land on a .5 boundary (it would
    * need (2k+1)² = 4·10⁶·c — odd = even), so the quantized weights, the
    * integer quota div, and the md5-rank selection are all deterministic.
    *
    * At 100 TB: per-source counts are one narrow aggregate, quotas broadcast;
    * the per-source md5-rank window would become a hash-threshold filter
    * (md5 < scaled quota fraction) to avoid the per-source sort. */
  def corpusSampleTemperature(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d).groupBy("source")
      .agg(count(lit(1)).as("n_src"))
      .withColumn("s_m", round(sqrt(col("n_src")) * 1000, 0).cast("long"))
    val tot = counts.agg(sum("s_m").as("s_tot"), sum("n_src").as("n_tot"))
    val quotas = counts.crossJoin(broadcast(tot))
      .withColumn("quota",
        expr("(2 * (n_tot div 5) * s_m + s_tot) div (2 * s_tot)"))
      .select("source", "n_src", "quota")
    val rankHash = md5(concat(lit("graft-temp-1"), col("doc_id").cast("string")))
    val w = Window.partitionBy("source").orderBy(rankHash.asc, col("doc_id").asc)
    Tables.documents(s, d)
      .join(broadcast(quotas), "source")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= col("quota"))
      .select("source", "rk", "doc_id", "lang", "quota", "n_src")
      .orderBy("source", "rk")
  }

  private val corpusSampleTemperatureSql =
    """WITH counts AS (
      |  SELECT source, count(*) AS n_src,
      |    CAST(round(sqrt(count(*)) * 1000) AS BIGINT) AS s_m
      |  FROM documents GROUP BY source
      |), tot AS (
      |  SELECT CAST(sum(s_m) AS BIGINT) AS s_tot,
      |    CAST(sum(n_src) AS BIGINT) AS n_tot
      |  FROM counts
      |), quotas AS (
      |  SELECT source, n_src,
      |    (2 * (n_tot // 5) * s_m + s_tot) // (2 * s_tot) AS quota
      |  FROM counts CROSS JOIN tot
      |), ranked AS (
      |  SELECT d.source, d.doc_id, d.lang, q.quota, q.n_src,
      |    CAST(row_number() OVER (PARTITION BY d.source
      |      ORDER BY md5('graft-temp-1' || CAST(d.doc_id AS VARCHAR)), d.doc_id)
      |      AS BIGINT) AS rk
      |  FROM documents d JOIN quotas q USING (source)
      |)
      |SELECT source, rk, doc_id, lang, quota, n_src
      |FROM ranked WHERE rk <= quota
      |ORDER BY source, rk""".stripMargin

  /** Inverted-index construction: token → (df, cf, capped posting list) —
    * the index-build step behind BM25/keyword retrieval (text_bm25 scores
    * with term statistics; this materializes them). One scan → per-(token,
    * doc) counts (ONE hash-aggregate, map-side partial) → per-token rollup.
    * Postings are the first 20 doc ids ascending, comma-joined (bounded
    * output; at 100 TB the full posting lists would go to a bucketed sink
    * keyed by token instead of a capped preview). Restricted to tokens with
    * df ≥ 20 and reported top-100 by df — deterministic, oracle-friendly. */
  def corpusInvertedIndex(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(split(normalizeText(col("text")), "\\s+")).as("tok"))
      .groupBy("tok", "doc_id").agg(count(lit(1)).as("cnt"))
    val idx = pairs.groupBy("tok").agg(
      count(lit(1)).as("df"),
      sum("cnt").as("cf"),
      expr("array_join(transform(slice(sort_array(collect_list(doc_id)), 1, 20), " +
        "x -> cast(x as string)), ',')").as("postings"))
    val w = Window.orderBy(col("df").desc, col("tok").asc)
    idx.filter(col("df") >= 20)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 100)
      .select("rk", "tok", "df", "cf", "postings")
      .orderBy("rk")
  }

  private val corpusInvertedIndexSql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(regexp_split_to_array(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      regexp_replace(regexp_replace(lower(text), '&amp;', '&', 'g'),
      |      '&nbsp;', ' ', 'g'), '(?m)^\s*\d+\s*$', '', 'g'), '[ \t]+', ' ', 'g'),
      |      '\n{3,}', e'\n\n', 'g'), '^\s+|\s+$', '', 'g'), '\s+')) AS tok
      |  FROM documents
      |), pairs AS (
      |  SELECT tok, doc_id, count(*) AS cnt FROM toks GROUP BY tok, doc_id
      |), idx AS (
      |  SELECT tok, count(*) AS df, CAST(sum(cnt) AS BIGINT) AS cf,
      |    array_to_string(list_transform(list_sort(list(doc_id))[1:20],
      |      x -> CAST(x AS VARCHAR)), ',') AS postings
      |  FROM pairs GROUP BY tok
      |)
      |SELECT CAST(row_number() OVER (ORDER BY df DESC, tok) AS BIGINT) AS rk,
      |  tok, df, cf, postings
      |FROM idx WHERE df >= 20
      |ORDER BY df DESC, tok
      |LIMIT 100""".stripMargin

  /** corpus_sample_weighted — WEIGHTED sampling without replacement by the
    * Efraimidis–Spirakis A-Res key (2006): each doc gets key u^(1/w) with
    * u deterministic from the portable md5 hash and w = n_chars, and the
    * global top-k by key IS an exact weighted sample — here length-
    * weighted, i.e. UNIFORM OVER TOKENS rather than over documents (the
    * sampling a token-budgeted training-mix estimate actually needs; the
    * uniform corpus_sample over-represents short docs token-wise). The
    * standard distributed weighted sampler: one scan, one top-k, no
    * per-partition rejection loops.
    *
    * Exactness: ranking uses ln(key) = ln(u)/w, computed as ONE double
    * expression from the exact integer (hash+1, w) pair, quantized to
    * micro — identical on both engines; quantization ties break by doc_id,
    * so the selected set is deterministic. Top-k is a rank-filter window
    * (WindowGroupLimit — distributed top-k, never a global sort). */
  def corpusSampleWeighted(s: SparkSession, d: String): DataFrame = {
    val hSql = "CAST(conv(substring(md5(concat('graft-wseed-1', " +
      "CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    val w = Window.orderBy(col("lnkey_micro").desc, col("doc_id").asc)
    Tables.documents(s, d)
      .withColumn("lnkey_micro", expr(
        s"CAST(round(1000000 * (ln(($hSql + 1)" +
          " / 1152921504606846976.0) / n_chars)) AS BIGINT)"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 50)
      .select("rk", "doc_id", "lang", "source", "n_chars", "lnkey_micro")
      .orderBy("rk")
  }

  private val corpusSampleWeightedSql = {
    val h = (0 until 15).map { j =>
      s"(strpos('0123456789abcdef', substr(h, ${j + 1}, 1)) - 1) * ${BigInt(16).pow(14 - j)}"
    }.mkString(" + ")
    s"""WITH hx AS (
       |  SELECT doc_id, lang, source, n_chars,
       |    md5('graft-wseed-1' || CAST(doc_id AS VARCHAR)) AS h
       |  FROM documents
       |), keyed AS (
       |  SELECT doc_id, lang, source, n_chars,
       |    CAST(round(1000000 * (ln(($h + 1)
       |      / 1152921504606846976.0) / n_chars)) AS BIGINT) AS lnkey_micro
       |  FROM hx
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (ORDER BY lnkey_micro DESC, doc_id)
       |    AS BIGINT) AS rk
       |  FROM keyed
       |)
       |SELECT rk, doc_id, lang, source, n_chars, lnkey_micro
       |FROM ranked WHERE rk <= 50
       |ORDER BY rk""".stripMargin
  }

  /** corpus_schema_evolution — SCHEMA-EVOLUTION mergeSchema round trip:
    * generation 1 of a dataset (even doc_ids: doc_id, lang) and generation
    * 2 (odd doc_ids: + an `extra_chars` column added later) land as two
    * parquet batches in one dataset directory; the merged read
    * (mergeSchema=true) must surface gen-1 rows with NULL in the new
    * column and gen-2 rows with values — the additive-column evolution
    * every long-lived 100 TB dataset goes through (the reference's corpora
    * grew columns across pipeline versions the same way;
    * legiscan_normalizer.py's fuzzy column mapping is the messy cousin).
    * The per-language aggregate proves both the null surfacing and the
    * value pass-through; the oracle recomputes the SAME aggregate directly
    * from `documents` (both generations derive from it), so the round trip
    * is hash-checked end to end. Staged via Staging.dir (per-JVM unique,
    * idempotent overwrite), cleaned after. */
  def corpusSchemaEvolution(s: SparkSession, d: String): DataFrame = {
    val dir = graft.sources.Staging.dir("schemaevo", d)
    val base = Tables.documents(s, d)
    base.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(col("doc_id"), col("lang"))
      .write.mode("overwrite").parquet(s"$dir/gen=1")
    base.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id"), col("lang"), col("n_chars").as("extra_chars"))
      .write.mode("overwrite").parquet(s"$dir/gen=2")
    val merged = s.read.option("mergeSchema", "true").parquet(dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        count("extra_chars").as("n_with_extra"),
        sum(coalesce(col("extra_chars"), lit(0L))).as("sum_extra"))
      .orderBy("lang")
    // BOUNDED driver collect, deliberate: the collected relation is the
    // per-language aggregate (≤ |langs| rows, metadata-scale), and
    // materializing it lets the staging dir be deleted EAGERLY instead of
    // leaking until session end. The data-grain work above stays
    // distributed.
    val out = merged.collect()
    graft.sources.Staging.deleteRecursively(new java.io.File(dir))
    s.createDataFrame(java.util.Arrays.asList(out: _*), merged.schema)
      .orderBy("lang")
  }

  private val corpusSchemaEvolutionSql =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_with_extra,
      |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END) AS BIGINT)
      |    AS sum_extra
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** corpus_token_budget — EXACT TOKEN-BUDGET APPORTIONMENT by the
    * largest-remainder (Hamilton) method: given a 1M-token training
    * budget, allocate per source proportionally to its token mass with
    * floor quotas, then hand the leftover tokens one each to the largest
    * fractional remainders — Σ alloc = budget EXACTLY (naive
    * round(B·wᵢ) over- or under-shoots, and at 10k sources the drift is
    * thousands of tokens). The integer apportionment step downstream of
    * corpus_mix_weights' mixture design: weights decide the ratios, this
    * turns them into per-source token counts a sampler can actually
    * draw. Everything exact integers: quota = (B·nᵢ) div N, remainder =
    * (B·nᵢ) mod N, leftover = B − Σ quota handed out by a
    * (remainder desc, source asc) rank over the ≤|sources| grid. */
  def corpusTokenBudget(s: SparkSession, d: String): DataFrame = {
    val budget = 1000000L
    val perSrc = Tables.documents(s, d)
      .select(col("source"),
        size(split(col("text"), "\\s+")).cast("long").as("toks"))
      .groupBy("source").agg(sum("toks").as("n_tokens"))
      .cache()
    val tot = broadcast(perSrc.agg(sum("n_tokens").as("n")))
    val wr = Window.orderBy(col("rem").desc, col("source").asc)
    val quotas = perSrc.crossJoin(tot)
      .withColumn("quota", expr(s"($budget * n_tokens) div n"))
      .withColumn("rem", expr(s"($budget * n_tokens) % n"))
      .withColumn("rk", row_number().over(wr).cast("long"))
    val leftover = broadcast(quotas.agg(
      (lit(budget) - sum("quota")).as("left")))
    quotas.crossJoin(leftover)
      .select(col("source"), col("n_tokens"),
        expr("(10000 * n_tokens) div n").as("share_bp"),
        (col("quota") + when(col("rk") <= col("left"), 1L).otherwise(0L))
          .as("alloc_tokens"),
        (col("rk") <= col("left")).as("got_extra"))
      .orderBy("source")
  }

  private val corpusTokenBudgetSql =
    """WITH ps AS (
      |  SELECT source,
      |    CAST(sum(array_length(regexp_split_to_array(text, '\s+')))
      |      AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source
      |), tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS n FROM ps
      |), q AS (
      |  SELECT p.source, p.n_tokens, t.n,
      |    (1000000 * p.n_tokens) // t.n AS quota,
      |    (1000000 * p.n_tokens) % t.n AS rem
      |  FROM ps p CROSS JOIN tot t
      |), ranked AS (
      |  SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, source)
      |    AS BIGINT) AS rk
      |  FROM q
      |), lo AS (SELECT 1000000 - CAST(sum(quota) AS BIGINT) AS lefto FROM q)
      |SELECT r.source, r.n_tokens,
      |  CAST((10000 * r.n_tokens) // r.n AS BIGINT) AS share_bp,
      |  CAST(r.quota + CASE WHEN r.rk <= l.lefto THEN 1 ELSE 0 END AS BIGINT)
      |    AS alloc_tokens,
      |  r.rk <= l.lefto AS got_extra
      |FROM ranked r CROSS JOIN lo l
      |ORDER BY r.source""".stripMargin

  def corpusSample(s: SparkSession, d: String): DataFrame = {
    val rankHash = md5(concat(lit("graft-seed-1"), col("doc_id").cast("string")))
    val w = Window.partitionBy("lang").orderBy(rankHash.asc, col("doc_id").asc)
    Tables.documents(s, d)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 20)
      .select("lang", "rk", "doc_id", "source", "n_chars")
      .orderBy("lang", "rk")
  }

  private val corpusSampleSql =
    """WITH ranked AS (
      |  SELECT lang, doc_id, source, n_chars,
      |    CAST(row_number() OVER (
      |      PARTITION BY lang
      |      ORDER BY md5('graft-seed-1' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
      |  FROM documents
      |)
      |SELECT lang, rk, doc_id, source, n_chars
      |FROM ranked WHERE rk <= 20
      |ORDER BY lang, rk""".stripMargin

  /** Token frequency top-k per language — the word-count classic, the shape
    * of vocabulary building. Explode → count (two-level partial agg) →
    * rank-limit per group (Spark pushes the limit into the window via
    * WindowGroupLimit — no full sort of the vocabulary). */
  def corpusTopTokens(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("tok").asc)
    Tables.documents(s, d)
      .select(col("lang"), explode(split(normalizeText(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 10)
      .orderBy("lang", "rk")
  }

  private val corpusTopTokensSql = {
    val norm =
      """regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      lower(text), '&amp;', '&', 'g'), '&nbsp;', ' ', 'g'),
        |      '(?m)^\s*\d+\s*$', '', 'g'), '[ \t]+', ' ', 'g'), '\n{3,}', e'\n\n', 'g'),
        |      '^\s+|\s+$', '', 'g')""".stripMargin
    s"""WITH toks AS (
       |  SELECT lang, unnest(regexp_split_to_array($norm, '\\s+')) AS tok
       |  FROM documents
       |), counts AS (
       |  SELECT lang, tok, count(*) AS cnt FROM toks
       |  WHERE length(tok) > 0
       |  GROUP BY lang, tok
       |), ranked AS (
       |  SELECT lang, tok, cnt,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS BIGINT) AS rk
       |  FROM counts
       |)
       |SELECT lang, tok, cnt, rk FROM ranked WHERE rk <= 10
       |ORDER BY lang, rk""".stripMargin
  }

  /** Heavy hitters via the custom SpaceSaving TypedImperativeAggregate
    * (functions/ApproxTopK) — same answer as corpus_top_tokens but computed
    * in BOUNDED memory (512 counters per partial) instead of materializing
    * the full vocabulary table. Capacity exceeds this corpus's vocabulary,
    * so counts are exact and the exact-top-k SQL is a valid oracle. */
  def corpusHeavyHitters(s: SparkSession, d: String): DataFrame = {
    import graft.functions.ApproxTopK.approxTopK
    Tables.documents(s, d)
      .select(col("lang"), explode(split(normalizeText(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("lang")
      .agg(approxTopK(col("tok"), 10, 512).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("idx", "t")))
      .select(col("lang"), col("t.token").as("tok"), col("t.cnt").as("cnt"),
        (col("idx") + 1).cast("long").as("rk"))
      .orderBy("lang", "rk")
  }

  /** Multi-theme regex rules, mirroring tag_metadata.py:7-22 THEME_RULES
    * (theme → pattern list; a doc gets the theme when ANY pattern matches,
    * case-insensitive). Patterns stay within the RE2 ∩ Java-regex subset
    * (alternation, \w — no backreferences) so the oracle matches. */
  private val themeRules: Seq[(String, Seq[String])] = Seq(
    "performance" -> Seq("fast", "slow", "benchmark\\w*"),
    "relational"  -> Seq("join", "agg\\w*", "group"),
    "storage"     -> Seq("table", "column", "scan"),
    "streaming"   -> Seq("stream", "batch", "window"))

  /** Theme tagging — the final stage of the reference's demo DAG
    * (tag_metadata.py tag_row + Snakefile `tag_demo` rule): per document,
    * the sorted list of every theme with ≥1 matching pattern. The basis
    * column mirrors tag_metadata.py:31-33's concat of title/summary/text
    * columns; `documents` has exactly one such column (`text`).
    *
    * The tag list is emitted as a ';'-joined string, not ArrayType: the
    * driver's oracle compare sorts result columns in pandas, which cannot
    * sort array cells (round-3 failure). Inside a pipeline the array form
    * is one `split` away; at the comparison boundary strings are the
    * portable representation.
    *
    * Pure per-row column expressions (rlike → when → array_compact →
    * array_sort → array_join): single scan, no shuffle, no UDF — at 100 TB
    * this is embarrassingly parallel and whole-stage codegen'd (array_sort
    * is evaluated on ≤4-element arrays, far off the hot-loop HOF trap). */
  def corpusTagThemes(s: SparkSession, d: String): DataFrame = {
    val tagCols = themeRules.map { case (theme, pats) =>
      when(pats.map(p => col("text").rlike("(?i)" + p)).reduce(_ || _), lit(theme))
    }
    Tables.documents(s, d)
      .select(col("doc_id"),
        array_join(array_sort(array_compact(array(tagCols: _*))), ";").as("tags"))
      .orderBy("doc_id")
  }

  private val corpusTagThemesSql = {
    val themeValues = themeRules
      .map { case (t, ps) => s"('$t', '${ps.mkString("|")}')" }.mkString(", ")
    s"""SELECT d.doc_id,
       |  coalesce(array_to_string(list_sort(list(t.theme)
       |    FILTER (WHERE regexp_matches(d.text, t.pat, 'i'))), ';'),
       |    '') AS tags
       |FROM documents d
       |CROSS JOIN (VALUES $themeValues) t(theme, pat)
       |GROUP BY d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Stratified quota sampling / domain-mixture construction: each source
    * stratum keeps an EXACT per-mille quota of its documents (the "domain
    * weights" step of assembling a pretraining mix — e.g. upsample curated
    * sources, downsample crawl). Deterministic and shuffle-cheap:
    *  - rank within stratum by md5(seed || doc_id) — a content-addressed
    *    uniform order, reproducible across engines and runs, no RNG state;
    *  - quota = (n_src * permille) div 1000 in exact integer arithmetic;
    *  - one shuffle on `source` for the two window functions, then a filter.
    * At 100 TB the rank-window shuffles each stratum once — same cost class
    * as any per-key window; skewed strata split by AQE. No collect, no
    * global sort (final ORDER BY is presentation-only).
    *
    * Weights: src ending 0/4/8 keep 100%, 1/5/9 keep 50%, 2/6 keep 25%,
    * else 10% — a stand-in for a named domain-weight table, which at scale
    * would be a broadcast-joined config relation. */
  def corpusSampleStratified(s: SparkSession, d: String): DataFrame = {
    val srcNum = regexp_extract(col("source"), "(\\d+)$", 1).cast("long")
    val permille = when(pmod(srcNum, lit(4)) === 0, 1000L)
      .when(pmod(srcNum, lit(4)) === 1, 500L)
      .when(pmod(srcNum, lit(4)) === 2, 250L)
      .otherwise(100L)
    val rankHash = md5(concat(lit("graft-mix-1"), col("doc_id").cast("string")))
    val w = Window.partitionBy("source").orderBy(rankHash.asc, col("doc_id").asc)
    Tables.documents(s, d)
      .withColumn("permille", permille)
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy("source")).cast("long"))
      .withColumn("quota", expr("(n_src * permille) div 1000"))
      .filter(col("rk") <= col("quota"))
      .select("source", "rk", "doc_id", "lang", "quota", "n_src")
      .orderBy("source", "rk")
  }

  private val corpusSampleStratifiedSql =
    """WITH base AS (
      |  SELECT *, CASE CAST(regexp_extract(source, '(\d+)$', 1) AS BIGINT) % 4
      |      WHEN 0 THEN 1000 WHEN 1 THEN 500 WHEN 2 THEN 250 ELSE 100 END AS permille
      |  FROM documents
      |), ranked AS (
      |  SELECT source, doc_id, lang, permille,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY md5('graft-mix-1' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk,
      |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
      |  FROM base
      |)
      |SELECT source, rk, doc_id, lang,
      |  CAST((n_src * permille) // 1000 AS BIGINT) AS quota, n_src
      |FROM ranked WHERE rk <= (n_src * permille) // 1000
      |ORDER BY source, rk""".stripMargin

  /** Corpus SNAPSHOT DIFF — dataset versioning's core primitive (the
    * reference's decisions-log / re-fetch change detection generalized):
    * classify every doc across two corpus versions as added / removed /
    * modified by doc_id presence + content hash. The versions are
    * deterministic slices of `documents` (v1 lacks doc_id%17==3 — "added
    * later"; v2 drops doc_id%13==5 — "removed" — and rewrites the text of
    * doc_id%7==2 — "modified"), so the diff is fully oracle-able.
    *
    * Plan: ONE full outer join of two narrow (doc_id, md5) projections —
    * both sides hash-partitioned on doc_id (at 100 TB: co-bucketed snapshot
    * layouts make it exchange-free); unchanged docs (the overwhelming mass
    * at scale) are filtered before the output sort. */
  def corpusSnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val v1 = docs.filter(col("doc_id") % 17 =!= 3)
      .select(col("doc_id"), md5(col("text")).as("h1"))
    val v2 = docs.filter(col("doc_id") % 13 =!= 5)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 7 === 2, concat(col("text"), lit(" rev2")))
          .otherwise(col("text"))).as("h2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .withColumn("change",
        when(col("h1").isNull, lit("added"))
          .when(col("h2").isNull, lit("removed"))
          .when(col("h1") =!= col("h2"), lit("modified")))
      .filter(col("change").isNotNull)
      .select("doc_id", "change")
      .orderBy("doc_id")
  }

  private val corpusSnapshotDiffSql =
    """WITH v1 AS (
      |  SELECT doc_id, md5(text) AS h1 FROM documents WHERE doc_id % 17 <> 3
      |), v2 AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 7 = 2 THEN text || ' rev2' ELSE text END) AS h2
      |  FROM documents WHERE doc_id % 13 <> 5
      |), j AS (
      |  SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
      |    CASE WHEN v1.doc_id IS NULL THEN 'added'
      |         WHEN v2.doc_id IS NULL THEN 'removed'
      |         WHEN h1 <> h2 THEN 'modified' END AS change
      |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
      |)
      |SELECT doc_id, change FROM j WHERE change IS NOT NULL
      |ORDER BY doc_id""".stripMargin

  /** ORC interop round trip: documents staged once as ORC (the other
    * columnar warehouse format — Hive/Trino ecosystems), read back through
    * Spark's vectorized ORC reader, and aggregated. The oracle runs over
    * the ORIGINAL parquet, so the hash match proves the format conversion
    * is value-lossless (string/long/timestamp fidelity) — the same
    * layout-invisible contract as the bucketed/Z-order variants. Filter
    * pushdown and column pruning work identically on the ORC scan. */
  /** Staged ORC copy of documents (ensureDir: latched against the orphan
    * sweep, memo self-heals) — split out for Bench's pre-stage registry. */
  private[graft] def stagedOrcDir(s: SparkSession, d: String): String =
    graft.sources.Staging.ensureDir(s,
      s"graft_documents_orc_${d.replaceAll(".*/", "").replaceAll("[^a-zA-Z0-9]", "_")}")(
      p => Tables.documents(s, d).write.mode("overwrite").orc(p))

  def corpusOrcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = stagedOrcDir(s, d)
    s.read.orc(path)
      .filter(col("n_chars") > 0)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("total_chars"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("lang", "source")
  }


  private val corpusOrcRoundtripSql =
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM documents
      |WHERE n_chars > 0
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  /** MERGE INTO (upsert-apply) semantics — the write-side sibling of
    * corpus_snapshot_diff and the batch core of every CDC pipeline:
    * a change feed (inserts, updates, deletes) applied to a base snapshot
    * in ONE full outer join on the key.
    *   WHEN MATCHED AND op='D' THEN DELETE
    *   WHEN MATCHED AND op='U' THEN UPDATE
    *   WHEN NOT MATCHED AND op='I' THEN INSERT
    *   (no change row → keep the base row)
    * Base and feed derive from the same deterministic version rules as the
    * diff operator, so the post-merge state is fully oracle-able; `rev`
    * marks which rows the merge touched and `h16` carries the content hash
    * prefix, so the oracle proves VALUES, not just membership. At 100 TB
    * the join runs exchange-free over key-bucketed snapshot layouts and the
    * untouched mass streams through unmodified. */
  def corpusUpsertMerge(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val base = docs.filter(col("doc_id") % 17 =!= 3)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val v2hash = md5(when(col("doc_id") % 7 === 2, concat(col("text"), lit(" rev2")))
      .otherwise(col("text")))
    val feed = docs
      .withColumn("op",
        when(col("doc_id") % 13 === 5 && col("doc_id") % 17 =!= 3, lit("D"))
          .when(col("doc_id") % 17 === 3 && col("doc_id") % 13 =!= 5, lit("I"))
          .when(col("doc_id") % 7 === 2, lit("U")))
      .filter(col("op").isNotNull)
      .select(col("doc_id"), col("op"), v2hash.as("h2"))
    base.join(feed, Seq("doc_id"), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "D")
      .filter(col("h").isNotNull || col("op") === "I") // guard: U/D of a ghost key
      .select(col("doc_id"),
        when(col("op").isNotNull, 1L).otherwise(0L).as("rev"),
        substring(coalesce(col("h2"), col("h")), 1, 16).as("h16"))
      .orderBy("doc_id")
  }

  private val corpusUpsertMergeSql =
    """WITH base AS (
      |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 17 <> 3
      |), feed AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 5 AND doc_id % 17 <> 3 THEN 'D'
      |         WHEN doc_id % 17 = 3 AND doc_id % 13 <> 5 THEN 'I'
      |         WHEN doc_id % 7 = 2 THEN 'U' END AS op,
      |    md5(CASE WHEN doc_id % 7 = 2 THEN text || ' rev2' ELSE text END) AS h2
      |  FROM documents
      |  WHERE doc_id % 13 = 5 OR doc_id % 17 = 3 OR doc_id % 7 = 2
      |)
      |SELECT coalesce(base.doc_id, feed.doc_id) AS doc_id,
      |  CAST(CASE WHEN op IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS rev,
      |  substr(coalesce(h2, h), 1, 16) AS h16
      |FROM base FULL OUTER JOIN feed ON base.doc_id = feed.doc_id
      |WHERE coalesce(op, '') <> 'D' AND (h IS NOT NULL OR op = 'I')
      |ORDER BY doc_id""".stripMargin

  /** Hive-partitioned layout in the oracle-checked path: documents staged
    * once partitioned BY LANG (sources/Sinks.writePartitioned), then read
    * with a lang predicate — the scan lists only the matching partition
    * directories (partition pruning: the dominant I/O saver for any
    * time/tenant-partitioned 100 TB table; SinksSpec asserts the pruned
    * file listing, this query proves result parity). Layout invisible:
    * oracle = the same filter over the plain table. */
  /** Staged lang-partitioned copy of documents (ensureDir: latched against
    * the orphan sweep, memo self-heals) — split out for Bench's pre-stage
    * registry. */
  private[graft] def stagedByLangDir(s: SparkSession, d: String): String =
    graft.sources.Staging.ensureDir(s,
      s"graft_documents_bylang_${d.replaceAll(".*/", "").replaceAll("[^a-zA-Z0-9]", "_")}")(
      p => graft.sources.Sinks.writePartitioned(Tables.documents(s, d), p, "lang"))

  def corpusPartitionedScan(s: SparkSession, d: String): DataFrame = {
    val path = stagedByLangDir(s, d)
    s.read.parquet(path)
      .filter(col("lang").isin("en", "de"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("lang", "source")
  }


  private val corpusPartitionedScanSql =
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents
      |WHERE lang IN ('en', 'de')
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  /** Tolerant multi-format date canonicalization — legiscan_normalizer.py:
    * 172-216 `parse_date`: try 8 formats in order, assume 2000s for 2-digit
    * years, empty string when nothing matches. The reference's per-row
    * try/except loop over strptime formats becomes ONE codegen'd
    * coalesce(try_to_timestamp(...)) chain — a single scan, no UDF, no
    * shuffle; embarrassingly parallel at 100 TB.
    *
    * Fixture: each order's real date is RENDERED into the format selected by
    * o_orderkey % 9 (8 = unparseable garbage), then recovered by the parse
    * chain. The oracle recomputes both the rendered string (strftime) and
    * the expected canonical date from first principles — identity for
    * 4-digit formats, +100 years for the two 2-digit-year formats (Spark's
    * `yy` maps 92 → 2092, exactly the reference's "assume 2000s" fix-up),
    * '' for garbage — so the hash proves rendering AND parsing both ways. */
  def corpusParseDates(s: SparkSession, d: String): DataFrame = {
    val fmts = Seq("yyyy-MM-dd", "MM/dd/yyyy", "MM/dd/yy", "yyyy/MM/dd",
      "MM-dd-yyyy", "MM-dd-yy", "MMMM d, yyyy", "MMM d, yyyy")
    val fmtId = col("o_orderkey") % 9
    val dateStr = fmts.zipWithIndex.foldLeft(when(fmtId === 8, lit("n/a"))) {
      case (acc, (f, i)) => acc.when(fmtId === i, date_format(col("o_orderdate"), f))
    }
    val withStr = Tables.orders(s, d)
      .select(col("o_orderkey").as("okey"), dateStr.as("date_str"))
    val parsedRaw = coalesce(
      fmts.map(f => expr(s"try_to_timestamp(date_str, '$f')").cast("date")): _*)
    // the reference's 2-digit-year fix-up (year < 100 → +2000); Spark's `yy`
    // pattern already resolves into 2000-2099 so this is the documented
    // no-op guard, kept so the rule survives a future pattern change
    val parsed = when(year(parsedRaw) < 100, add_months(parsedRaw, 24000))
      .otherwise(parsedRaw)
    withStr.select(
        col("okey"), col("date_str"),
        coalesce(date_format(parsed, "yyyy-MM-dd"), lit("")).as("parsed_date"),
        parsed.isNotNull.as("parse_ok"))
      .orderBy("okey")
  }

  private val corpusParseDatesSql =
    """WITH base AS (
      |  SELECT o_orderkey AS okey, o_orderdate, o_orderkey % 9 AS fmt_id FROM orders
      |)
      |SELECT okey,
      |  CASE fmt_id
      |    WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
      |    WHEN 1 THEN strftime(o_orderdate, '%m/%d/%Y')
      |    WHEN 2 THEN strftime(o_orderdate, '%m/%d/%y')
      |    WHEN 3 THEN strftime(o_orderdate, '%Y/%m/%d')
      |    WHEN 4 THEN strftime(o_orderdate, '%m-%d-%Y')
      |    WHEN 5 THEN strftime(o_orderdate, '%m-%d-%y')
      |    WHEN 6 THEN strftime(o_orderdate, '%B %-d, %Y')
      |    WHEN 7 THEN strftime(o_orderdate, '%b %-d, %Y')
      |    ELSE 'n/a' END AS date_str,
      |  CASE WHEN fmt_id = 8 THEN ''
      |       WHEN fmt_id IN (2, 5) THEN strftime(make_date(
      |         2000 + year(o_orderdate) % 100, month(o_orderdate), day(o_orderdate)), '%Y-%m-%d')
      |       ELSE strftime(o_orderdate, '%Y-%m-%d') END AS parsed_date,
      |  fmt_id <> 8 AS parse_ok
      |FROM base ORDER BY okey""".stripMargin

  /** Duplicate-merge with FIELD-LEVEL fill — legiscan_normalizer.py:263-343
    * `merge_duplicates`: within each dup group, order by (last-action date
    * DESC, completeness DESC), keep the first row, then fill each of its
    * missing fields from the best remaining row that has one. The
    * reference's per-group Python loop becomes per-column
    * first(col, ignoreNulls) over the priority-ordered window — the SAME
    * single merge-key shuffle as plain keep-first dedup (corpus_merge_
    * sources), no iteration, no extra pass per column.
    *
    * Fixture: doc_id % 200 dup groups with a pseudo action-day and
    * deterministic per-field null masks (% 3 / % 4 / % 5), so groups
    * genuinely conflict and the winner's gaps genuinely fill from losers;
    * n_filled in the output proves the fill has teeth. */
  def corpusMergeFill(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(
      col("doc_id"),
      (col("doc_id") % 200).as("merge_key"),
      ((col("doc_id") * 37) % 1000).as("action_day"),
      when(col("doc_id") % 3 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("title_"), col("doc_id"))).as("title"),
      when(col("doc_id") % 4 === 0, lit(null).cast("string"))
        .otherwise(col("lang")).as("status"),
      when(col("doc_id") % 5 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("url/"), col("source"))).as("url"))
    val completeness =
      when(col("title").isNotNull, 1L).otherwise(0L) +
        when(col("status").isNotNull, 1L).otherwise(0L) +
        when(col("url").isNotNull, 1L).otherwise(0L)
    val ord = Window.partitionBy("merge_key")
      .orderBy(col("action_day").desc, col("completeness").desc, col("doc_id").asc)
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val grp = Window.partitionBy("merge_key")
    def filled(c: String) = first(col(c), ignoreNulls = true).over(full)
    base.withColumn("completeness", completeness)
      .withColumn("rn", row_number().over(ord))
      .withColumn("n_dups", count(lit(1)).over(grp))
      .withColumn("title_f", filled("title"))
      .withColumn("status_f", filled("status"))
      .withColumn("url_f", filled("url"))
      .filter(col("rn") === 1)
      .select(
        col("merge_key"),
        col("doc_id").as("keeper_id"),
        col("n_dups"),
        coalesce(col("title_f"), lit("")).as("title_filled"),
        coalesce(col("status_f"), lit("")).as("status_filled"),
        coalesce(col("url_f"), lit("")).as("url_filled"),
        (when(col("title").isNull && col("title_f").isNotNull, 1L).otherwise(0L) +
          when(col("status").isNull && col("status_f").isNotNull, 1L).otherwise(0L) +
          when(col("url").isNull && col("url_f").isNotNull, 1L).otherwise(0L)).as("n_filled"))
      .orderBy("merge_key")
  }

  private val corpusMergeFillSql =
    """WITH base AS (
      |  SELECT doc_id, doc_id % 200 AS merge_key, (doc_id * 37) % 1000 AS action_day,
      |    CASE WHEN doc_id % 3 = 0 THEN NULL ELSE 'title_' || doc_id END AS title,
      |    CASE WHEN doc_id % 4 = 0 THEN NULL ELSE lang END AS status,
      |    CASE WHEN doc_id % 5 = 0 THEN NULL ELSE 'url/' || source END AS url
      |  FROM documents
      |), c AS (
      |  SELECT *,
      |    (CASE WHEN title IS NOT NULL THEN 1 ELSE 0 END
      |     + CASE WHEN status IS NOT NULL THEN 1 ELSE 0 END
      |     + CASE WHEN url IS NOT NULL THEN 1 ELSE 0 END) AS completeness
      |  FROM base
      |), win AS (
      |  SELECT *,
      |    row_number() OVER ord AS rn,
      |    count(*) OVER (PARTITION BY merge_key) AS n_dups,
      |    first_value(title IGNORE NULLS) OVER ordf AS title_f,
      |    first_value(status IGNORE NULLS) OVER ordf AS status_f,
      |    first_value(url IGNORE NULLS) OVER ordf AS url_f
      |  FROM c
      |  WINDOW
      |    ord AS (PARTITION BY merge_key ORDER BY action_day DESC, completeness DESC, doc_id),
      |    ordf AS (PARTITION BY merge_key ORDER BY action_day DESC, completeness DESC, doc_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |)
      |SELECT merge_key, doc_id AS keeper_id, n_dups,
      |  coalesce(title_f, '') AS title_filled,
      |  coalesce(status_f, '') AS status_filled,
      |  coalesce(url_f, '') AS url_filled,
      |  CAST(CASE WHEN title IS NULL AND title_f IS NOT NULL THEN 1 ELSE 0 END
      |   + CASE WHEN status IS NULL AND status_f IS NOT NULL THEN 1 ELSE 0 END
      |   + CASE WHEN url IS NULL AND url_f IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS n_filled
      |FROM win WHERE rn = 1 ORDER BY merge_key""".stripMargin

  /** Static-dim mapping with a coverage-gap report — build_master_corpus.py:
    * 20-100 (STATE_ABBREV forward dim + the derived reverse dict) and
    * :144-157 (the "missing states" anti-join summary), plus the :126-139
    * both-sources provenance tag. The dim here is a language code↔name
    * table with entries the corpus does NOT cover, so the gap rows are
    * real. The manual slice (short sources) joins the dim forward
    * (code→name); the API slice round-trips THROUGH the reverse lookup
    * (code→name→code, the reference's abbrev_to_name dict) so a broken
    * reverse map visibly changes the counts. Keys held by both slices are
    * tagged Both (provenance), and dim entries with no docs report zeros —
    * the coverage gap. Both joins broadcast: the dim is bounded metadata. */
  def corpusDimCoverage(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dim = Seq(
      "de" -> "German", "en" -> "English", "es" -> "Spanish",
      "fr" -> "French", "zh" -> "Chinese",
      "ja" -> "Japanese", "ko" -> "Korean", "pt" -> "Portuguese"
    ).toDF("code", "name")
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"), (col("doc_id") % 125).as("bkt"))
    val manual = docs.filter(length(col("source")) <= 4)
      .select(col("lang").as("code"), col("bkt"))
    // API slice goes code → name → code through the dim (reverse lookup)
    val apiNamed = docs.filter(length(col("source")) > 4)
      .join(broadcast(dim), docs("lang") === dim("code"))
      .select(col("name"), col("bkt"))
    val api = apiNamed
      .join(broadcast(dim.select(col("name").as("r_name"), col("code"))),
        apiNamed("name") === col("r_name"))
      .select(col("code"), col("bkt"))
    val keys = manual.select(col("code"), col("bkt"), lit(1L).as("m"), lit(0L).as("a"))
      .unionAll(api.select(col("code"), col("bkt"), lit(0L).as("m"), lit(1L).as("a")))
      .groupBy("code", "bkt")
      .agg(max("m").as("has_m"), max("a").as("has_a"))
    val perCode = keys.groupBy("code").agg(
      count(lit(1)).as("n_keys"),
      count(when(col("has_m") === 1 && col("has_a") === 0, 1)).as("n_manual_only"),
      count(when(col("has_m") === 0 && col("has_a") === 1, 1)).as("n_api_only"),
      count(when(col("has_m") === 1 && col("has_a") === 1, 1)).as("n_both"))
    dim.join(perCode, Seq("code"), "left")
      .select(
        col("code"), col("name"),
        coalesce(col("n_keys"), lit(0L)).as("n_keys"),
        coalesce(col("n_manual_only"), lit(0L)).as("n_manual_only"),
        coalesce(col("n_api_only"), lit(0L)).as("n_api_only"),
        coalesce(col("n_both"), lit(0L)).as("n_both"),
        col("n_keys").isNotNull.as("covered"))
      .orderBy("code")
  }

  private val corpusDimCoverageSql =
    """WITH dim(code, name) AS (VALUES
      |  ('de','German'),('en','English'),('es','Spanish'),('fr','French'),
      |  ('zh','Chinese'),('ja','Japanese'),('ko','Korean'),('pt','Portuguese')
      |), docs AS (
      |  SELECT doc_id, lang, source, doc_id % 125 AS bkt FROM documents
      |), manual AS (
      |  SELECT lang AS code, bkt FROM docs WHERE length(source) <= 4
      |), api_named AS (
      |  SELECT dim.name, bkt FROM docs JOIN dim ON docs.lang = dim.code
      |  WHERE length(source) > 4
      |), api AS (
      |  SELECT dim.code, bkt FROM api_named JOIN dim ON api_named.name = dim.name
      |), keys AS (
      |  SELECT code, bkt, max(m) AS has_m, max(a) AS has_a FROM (
      |    SELECT code, bkt, 1 AS m, 0 AS a FROM manual
      |    UNION ALL SELECT code, bkt, 0 AS m, 1 AS a FROM api
      |  ) GROUP BY code, bkt
      |), per_code AS (
      |  SELECT code,
      |    count(*) AS n_keys,
      |    count(*) FILTER (WHERE has_m = 1 AND has_a = 0) AS n_manual_only,
      |    count(*) FILTER (WHERE has_m = 0 AND has_a = 1) AS n_api_only,
      |    count(*) FILTER (WHERE has_m = 1 AND has_a = 1) AS n_both
      |  FROM keys GROUP BY code
      |)
      |SELECT dim.code, dim.name,
      |  coalesce(n_keys, 0) AS n_keys,
      |  coalesce(n_manual_only, 0) AS n_manual_only,
      |  coalesce(n_api_only, 0) AS n_api_only,
      |  coalesce(n_both, 0) AS n_both,
      |  n_keys IS NOT NULL AS covered
      |FROM dim LEFT JOIN per_code ON dim.code = per_code.code
      |ORDER BY dim.code""".stripMargin

  /** URL canonicalization + same-URL dedup — the reference's normalize_url
    * (legiscan_normalizer.py:218-222) grown to what a crawl pipeline needs
    * before URL-level dedup (the step before any content dedup at 100 TB):
    * lowercase scheme+host, strip default ports and www., drop fragments
    * and utm_* tracking params, trim trailing '/' and dangling '?'. One
    * codegen'd regex chain per row — single scan — then one canonical-URL
    * window for the dup groups (uniform hash-like key ⇒ no skew).
    *
    * Fixture: five deterministic mess profiles (doc_id % 5) over the real
    * source/doc_id values — uppercase host+scheme, :443/:80 ports, www.,
    * utm params leading/trailing, fragments, trailing slashes — so every
    * cleanup rule fires on 20% of rows and the oracle recomputes the same
    * chain. Profiles 0/1 collapse to the SAME canonical URL (path+id
    * match), so the dedup has real duplicate groups. */
  def corpusUrlNormalize(s: SparkSession, d: String): DataFrame = {
    // profiles 0 and 1 live on a shared CDN host with a div-5 path seed, so
    // each (5k, 5k+1) pair canonicalizes to the SAME URL — real dup groups
    val cdnPath = expr("doc_id div 5") % 97
    val cdnQid = expr("doc_id div 5") % 13
    val path = col("doc_id") % 97
    val raw = when(col("doc_id") % 5 === 0,
        concat(lit("HTTPS://WWW.CDN.Example.ORG:443/docs/"),
          cdnPath, lit("/?utm_source=feed&utm_campaign=x&id="), cdnQid, lit("#section-2")))
      .when(col("doc_id") % 5 === 1,
        concat(lit("https://www.cdn.example.org/docs/"),
          cdnPath, lit("?id="), cdnQid))
      .when(col("doc_id") % 5 === 2,
        concat(lit("http://"), col("source"), lit(".example.org:80/docs/"), path, lit("/")))
      .when(col("doc_id") % 5 === 3,
        concat(lit("https://"), col("source"), lit(".EXAMPLE.org/docs/"),
          path, lit("?utm_medium=a")))
      .otherwise(concat(lit("https://"), col("source"), lit(".example.org/docs/"), path))
    // canonicalization chain (identical regexes both engines; no group refs
    // in replacements — Spark uses $1, DuckDB \1, so none are used)
    val noFrag = regexp_replace(raw, "#.*$", "")
    val pre = regexp_extract(noFrag, "^[a-zA-Z]+://[^/?]+", 0)
    val rest = substring(noFrag, length(pre) + 1, lit(1 << 24))
    val preLc = regexp_replace(regexp_replace(lower(pre), ":(443|80)$", ""),
      "://www\\.", "://")
    val restClean = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(
        rest, "utm_[a-z]+=[^&]*&", ""), // param followed by another (Spark
      "[?&]utm_[a-z]+=[^&]*$", ""),     //  regexp_replace is global already)
      "/+\\?", "?"),                    // slash(es) before the query string
      "/+$", ""),                       // trailing slash(es)
      "\\?$", "")                       // dangling ?
    val canon = concat(preLc, restClean)
    val host = regexp_extract(canon, "^[a-z]+://([^/:?]+)", 1)
    val dupW = Window.partitionBy("url_canon")
    Tables.documents(s, d)
      .select(col("doc_id"), canon.as("url_canon"), host.as("host"),
        regexp_extract(host, "([^.]+\\.[^.]+)$", 1).as("domain"))
      .withColumn("n_same_url", count(lit(1)).over(dupW))
      .withColumn("is_keeper",
        col("doc_id") === min("doc_id").over(dupW))
      .orderBy("doc_id")
  }

  private val corpusUrlNormalizeSql =
    """WITH raw AS (
      |  SELECT doc_id,
      |    CASE doc_id % 5
      |      WHEN 0 THEN 'HTTPS://WWW.CDN.Example.ORG:443/docs/'
      |        || ((doc_id // 5) % 97) || '/?utm_source=feed&utm_campaign=x&id=' || ((doc_id // 5) % 13) || '#section-2'
      |      WHEN 1 THEN 'https://www.cdn.example.org/docs/'
      |        || ((doc_id // 5) % 97) || '?id=' || ((doc_id // 5) % 13)
      |      WHEN 2 THEN 'http://' || source || '.example.org:80/docs/' || (doc_id % 97) || '/'
      |      WHEN 3 THEN 'https://' || source || '.EXAMPLE.org/docs/' || (doc_id % 97) || '?utm_medium=a'
      |      ELSE 'https://' || source || '.example.org/docs/' || (doc_id % 97)
      |    END AS u
      |  FROM documents
      |), pieces AS (
      |  SELECT doc_id,
      |    regexp_extract(regexp_replace(u, '#.*$', ''), '^[a-zA-Z]+://[^/?]+', 0) AS pre,
      |    regexp_replace(u, '#.*$', '') AS nofrag
      |  FROM raw
      |), canon AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(lower(pre), ':(443|80)$', ''), '://www\.', '://')
      |    || regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |       regexp_replace(
      |         substr(nofrag, length(pre) + 1),
      |         'utm_[a-z]+=[^&]*&', '', 'g'),
      |         '[?&]utm_[a-z]+=[^&]*$', ''),
      |         '/+\?', '?', 'g'),
      |         '/+$', ''),
      |         '\?$', '') AS url_canon
      |  FROM pieces
      |)
      |SELECT doc_id, url_canon,
      |  regexp_extract(url_canon, '^[a-z]+://([^/:?]+)', 1) AS host,
      |  regexp_extract(regexp_extract(url_canon, '^[a-z]+://([^/:?]+)', 1),
      |    '([^.]+\.[^.]+)$', 1) AS domain,
      |  count(*) OVER (PARTITION BY url_canon) AS n_same_url,
      |  doc_id = min(doc_id) OVER (PARTITION BY url_canon) AS is_keeper
      |FROM canon ORDER BY doc_id""".stripMargin

  /** The reference's WHOLE pipeline as ONE composed Catalyst DAG — the
    * switchability statement: where the reference runs five separate pandas
    * scripts materializing CSVs between stages (normalize_corpus →
    * detect_amendment → build_corpus dedup/filter → tag_metadata →
    * summary), here the stages are column expressions chained into a single
    * lazy plan: one parquet scan, one md5-dedup shuffle, one lang
    * aggregate. Catalyst pushes the build-stage filters below everything
    * and fuses all per-row stages into one codegen'd pass — the
    * between-stage materialization cost (the dominant cost of script
    * pipelines at 100 TB) simply does not exist. Every stage reuses the
    * exact operator semantics oracled individually above, and the composed
    * oracle chains the same SQL fragments, so the hash match proves the
    * COMPOSITION, not just the parts. */
  def corpusPipelineE2e(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id").asc)
    val built = Tables.documents(s, d)
      .filter(col("n_chars") > 50 && length(col("lang")) === 2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val ntext = normalizeText(col("text"))
    val isAmend = amendmentSignals
      .map(sig => contains(lower(col("text")), lit(sig))).reduce(_ || _)
    val nThemes = themeRules.map { case (_, pats) =>
      when(pats.map(p => col("text").rlike("(?i)" + p)).reduce(_ || _), 1L)
        .otherwise(0L)
    }.reduce(_ + _)
    built
      .select(col("doc_id"), col("lang"), col("source"),
        wordCount(col("text")).as("raw_wc"), wordCount(ntext).as("norm_wc"),
        isAmend.as("is_amendment"), nThemes.as("n_themes"))
      .withColumn("removed_bp",
        when(col("raw_wc") > 0,
          expr("(2 * 10000 * (raw_wc - norm_wc) + raw_wc) div (2 * raw_wc)"))
          .otherwise(0L))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("is_amendment"), 1L).otherwise(0L)).as("n_amendments"),
        countDistinct("source").as("n_sources"),
        expr("(2 * sum(removed_bp) + count(1)) div (2 * count(1))")
          .as("mean_removed_bp"),
        sum(when(col("n_themes") > 0, 1L).otherwise(0L)).as("n_themed"),
        sum("n_themes").as("total_themes"))
      .orderBy("lang")
  }

  private val corpusPipelineE2eSql = {
    val amend = amendmentSignals
      .map(sig => s"contains(lower(text), '$sig')").mkString(" OR ")
    val themes = themeRules.map { case (_, ps) =>
      s"CASE WHEN regexp_matches(text, '${ps.mkString("|")}', 'i') THEN 1 ELSE 0 END"
    }.mkString(" + ")
    s"""WITH ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |  FROM documents WHERE n_chars > 50 AND length(lang) = 2
       |), built AS (
       |  SELECT doc_id, lang, source, text, $normChainSql AS ntext
       |  FROM ranked WHERE rn = 1
       |), staged AS (
       |  SELECT doc_id, lang, source,
       |    ${wcSql("text")} AS raw_wc,
       |    ${wcSql("ntext")} AS norm_wc,
       |    ($amend) AS is_amendment,
       |    ($themes) AS n_themes
       |  FROM built
       |), bp AS (
       |  SELECT *, CASE WHEN raw_wc > 0
       |    THEN CAST((2 * 10000 * (raw_wc - norm_wc) + raw_wc) // (2 * raw_wc) AS BIGINT)
       |    ELSE 0 END AS removed_bp
       |  FROM staged
       |)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN is_amendment THEN 1 ELSE 0 END) AS BIGINT) AS n_amendments,
       |  count(DISTINCT source) AS n_sources,
       |  CAST((2 * sum(removed_bp) + count(*)) // (2 * count(*)) AS BIGINT) AS mean_removed_bp,
       |  CAST(sum(CASE WHEN n_themes > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_themed,
       |  CAST(sum(n_themes) AS BIGINT) AS total_themes
       |FROM bp GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------------
  // corpus_mix_weights — DATA-MIXTURE weights (the DoReMi/Pile-style
  // domain-mixing step): given per-source token masses, compute the
  // sampling weight that moves each source toward a UNIFORM target share,
  // capped at 3× (the standard don't-repeat-any-source-more-than-~3-epochs
  // rule), and account for the tokens the capped mixture actually yields.
  // weight_bp = total·10000 / (n_sources·tokens_s): >10000 upsamples a
  // rare source, <10000 downsamples a dominant one. One corpus scan →
  // per-source aggregate → broadcast 1-row totals; all integer.
  // ---------------------------------------------------------------------

  def corpusMixWeights(s: SparkSession, d: String): DataFrame = {
    val perSource = Tables.documents(s, d)
      .select(col("source"),
        size(split(graft.functions.TextFunctions.wsTrim(col("text")), "\\s+"))
          .cast("long").as("n_toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
    val totals = perSource.agg(sum("n_tokens").as("t_tok"),
      count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("share_bp", expr("n_tokens * 10000 div t_tok"))
      .withColumn("raw_weight_bp", expr("t_tok * 10000 div (n_sources * n_tokens)"))
      .withColumn("weight_bp", least(col("raw_weight_bp"), lit(30000L)))
      .withColumn("capped", col("raw_weight_bp") > 30000L)
      .withColumn("expected_tokens", expr("n_tokens * weight_bp div 10000"))
      .select("source", "n_docs", "n_tokens", "share_bp", "weight_bp",
        "capped", "expected_tokens")
      .orderBy("source")
  }

  private val corpusMixWeightsSql =
    """WITH per_source AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(array_length(regexp_split_to_array(
      |      regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))) AS BIGINT)
      |      AS n_tokens
      |  FROM documents GROUP BY source
      |), totals AS (
      |  SELECT CAST(sum(n_tokens) AS BIGINT) AS t_tok,
      |    CAST(count(*) AS BIGINT) AS n_sources
      |  FROM per_source
      |)
      |SELECT source, n_docs, n_tokens,
      |  CAST(n_tokens * 10000 // t_tok AS BIGINT) AS share_bp,
      |  CAST(LEAST(t_tok * 10000 // (n_sources * n_tokens), 30000)
      |    AS BIGINT) AS weight_bp,
      |  t_tok * 10000 // (n_sources * n_tokens) > 30000 AS capped,
      |  CAST(n_tokens * LEAST(t_tok * 10000 // (n_sources * n_tokens), 30000)
      |    // 10000 AS BIGINT) AS expected_tokens
      |FROM per_source CROSS JOIN totals
      |ORDER BY source""".stripMargin

  /** Deterministic HASH-SHARD assignment with a balance audit: documents
    * route to 16 shards by a Knuth multiplicative hash of doc_id (splitter-
    * friendly — NOT doc_id % 16, which would stripe correlated neighbors
    * into the same shard), and the audit reports each shard's row/char
    * mass plus its deviation from the ideal 1/16 share in basis points —
    * the check a 100 TB writer runs before committing a layout. One scan,
    * one 16-row aggregate; the hash is plain integer arithmetic so the
    * oracle is hash-exact. */
  def corpusShardAssign(s: SparkSession, d: String): DataFrame = {
    val sharded = Tables.documents(s, d)
      .select(col("doc_id"), length(col("text")).cast("long").as("chars"))
      .withColumn("shard", expr("pmod((doc_id * 2654435761) div 65536, 16)"))
    val totals = broadcast(sharded.agg(
      count(lit(1)).as("n_total"), sum("chars").as("chars_total")))
    sharded.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("chars").as("chars"))
      .crossJoin(totals)
      .select(col("shard"), col("n_docs"), col("chars"),
        expr("(10000 * n_docs * 16) div n_total - 10000").as("row_skew_bp"),
        expr("(10000 * chars * 16) div chars_total - 10000").as("char_skew_bp"))
      .orderBy("shard")
  }

  private val corpusShardAssignSql =
    """WITH sh AS (
      |  SELECT (doc_id * 2654435761 // 65536) % 16 AS shard,
      |    CAST(length(text) AS BIGINT) AS chars
      |  FROM documents
      |), tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_total,
      |    CAST(sum(chars) AS BIGINT) AS chars_total
      |  FROM sh
      |)
      |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(chars) AS BIGINT) AS chars,
      |  CAST((10000 * count(*) * 16) // t.n_total - 10000 AS BIGINT) AS row_skew_bp,
      |  CAST((10000 * sum(chars) * 16) // t.chars_total - 10000 AS BIGINT)
      |    AS char_skew_bp
      |FROM sh CROSS JOIN tot t
      |GROUP BY shard, t.n_total, t.chars_total
      |ORDER BY shard""".stripMargin

  val all: Seq[Q] = Seq(
    Q("corpus_shard_assign", corpusShardAssign, Some(corpusShardAssignSql)),
    Q("corpus_mix_weights", corpusMixWeights, Some(corpusMixWeightsSql)),
    Q("corpus_pipeline_e2e", corpusPipelineE2e, Some(corpusPipelineE2eSql)),
    Q("corpus_url_normalize", corpusUrlNormalize, Some(corpusUrlNormalizeSql)),
    Q("corpus_parse_dates", corpusParseDates, Some(corpusParseDatesSql)),
    Q("corpus_merge_fill", corpusMergeFill, Some(corpusMergeFillSql)),
    Q("corpus_dim_coverage", corpusDimCoverage, Some(corpusDimCoverageSql)),
    Q("corpus_partitioned_scan", corpusPartitionedScan, Some(corpusPartitionedScanSql)),
    Q("corpus_upsert_merge", corpusUpsertMerge, Some(corpusUpsertMergeSql)),
    Q("corpus_orc_roundtrip", corpusOrcRoundtrip, Some(corpusOrcRoundtripSql)),
    Q("corpus_snapshot_diff", corpusSnapshotDiff, Some(corpusSnapshotDiffSql)),
    Q("corpus_sample_stratified", corpusSampleStratified, Some(corpusSampleStratifiedSql)),
    Q("corpus_tag_themes", corpusTagThemes, Some(corpusTagThemesSql)),
    Q("corpus_heavy_hitters", corpusHeavyHitters, Some(corpusTopTokensSql)),
    Q("corpus_inverted_index", corpusInvertedIndex, Some(corpusInvertedIndexSql)),
    Q("corpus_sample_temperature", corpusSampleTemperature, Some(corpusSampleTemperatureSql)),
    Q("corpus_sample", corpusSample, Some(corpusSampleSql)),
    Q("corpus_sample_weighted", corpusSampleWeighted, Some(corpusSampleWeightedSql)),
    Q("corpus_schema_evolution", corpusSchemaEvolution, Some(corpusSchemaEvolutionSql)),
    Q("corpus_token_budget", corpusTokenBudget, Some(corpusTokenBudgetSql)),
    Q("corpus_top_tokens", corpusTopTokens, Some(corpusTopTokensSql)),
    Q("corpus_html_extract", corpusHtmlExtract, Some(corpusHtmlExtractSql)),
    Q("corpus_decode_roundtrip", corpusDecodeRoundtrip, Some(corpusDecodeRoundtripSql)),
    Q("corpus_decode_dispatch", corpusDecodeDispatch, Some(corpusDecodeDispatchSql)),
    Q("corpus_enrich", corpusEnrich, Some(corpusEnrichSql)),
    Q("corpus_normalize", corpusNormalize, Some(corpusNormalizeSql)),
    Q("corpus_keyword_match", corpusKeywordMatch, Some(corpusKeywordMatchSql)),
    Q("corpus_amendment_flag", corpusAmendmentFlag, Some(corpusAmendmentFlagSql)),
    Q("corpus_build", corpusBuild, Some(corpusBuildSql)),
    Q("corpus_summary", corpusSummary, Some(corpusSummarySql)),
    Q("corpus_merge_sources", corpusMergeSources, Some(corpusMergeSourcesSql)),
    Q("corpus_status_normalize", corpusStatusNormalize, Some(corpusStatusNormalizeSql))
  )
}
