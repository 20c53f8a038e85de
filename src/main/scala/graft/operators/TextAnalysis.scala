package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis for LLM-training-data pipelines: token stats, quality
  * scoring, n-gram-heuristic language ID, content fingerprinting. Extends the
  * reference's word-count/decisions-log idioms (normalize_corpus.py:176-186)
  * into the operators a 100 TB pretraining-data pipeline needs.
  *
  * Everything is a single-scan projection of codegen'd expressions — at scale
  * these run at parquet read speed with no shuffle (the ORDER BY here is only
  * for oracle determinism; a production pipeline would drop it).
  */
object TextAnalysis {

  /** Per-language marker words (space-padded to approximate word boundaries —
    * the n-gram heuristic). Scores are exact occurrence counts. */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and "),
    "de" -> Seq(" der ", " und "),
    "es" -> Seq(" los ", " que "),
    "fr" -> Seq(" les ", " est "),
    "zh" -> Seq("的"))

  /** Token counting + shape stats. */
  def textTokenStats(s: SparkSession, d: String): DataFrame = {
    val doc = Tables.documents(s, d)
    doc.select(
        col("doc_id"),
        wordCount(col("text")).as("n_tokens"),
        length(col("text")).cast("long").as("len_chars"),
        nonSpaceCount(col("text")).as("n_nonspace"),
        punctCount(col("text")).cast("long").as("n_punct"))
      .withColumn("avg_token_len",
        when(col("n_tokens") > 0,
          round(col("n_nonspace").cast("double") / col("n_tokens").cast("double"), 4))
          .otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(col("len_chars") > 0,
          round(col("n_punct").cast("double") / col("len_chars").cast("double"), 6))
          .otherwise(lit(0.0)))
      .orderBy("doc_id")
  }

  private val textTokenStatsSql =
    """WITH b AS (
      |  SELECT doc_id,
      |    CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
      |         ELSE array_length(regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END AS n_tokens,
      |    length(text) AS len_chars,
      |    length(regexp_replace(text, '\s', '', 'g')) AS n_nonspace,
      |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct
      |  FROM documents
      |)
      |SELECT doc_id, n_tokens, len_chars, n_nonspace, n_punct,
      |  CASE WHEN n_tokens > 0 THEN round(n_nonspace * 1.0 / n_tokens, 4) ELSE 0.0 END AS avg_token_len,
      |  CASE WHEN len_chars > 0 THEN round(n_punct * 1.0 / len_chars, 6) ELSE 0.0 END AS punct_ratio
      |FROM b ORDER BY doc_id""".stripMargin

  /** Quality scoring: length / alpha-ratio / punctuation composite with a
    * bucket label, the filter a pretraining pipeline applies before training.
    * The bucket is derived from the ROUNDED score so both engines agree at
    * threshold boundaries. */
  def textQuality(s: SparkSession, d: String): DataFrame = {
    val doc = Tables.documents(s, d)
    val base = doc.select(
      col("doc_id"),
      wordCount(col("text")).as("n_tokens"),
      length(col("text")).cast("long").as("len_chars"),
      alphaCount(lower(col("text"))).as("n_alpha"),
      punctCount(col("text")).cast("long").as("n_punct"))
    // score = 0.5*min(nt,100)/100 + 0.3*n_alpha/len + 0.2*(len-n_punct)/len,
    // quantized to 4 decimals ENTIRELY in integer arithmetic: float sums
    // differ between engines in the last ulp, and even on identical doubles
    // Spark (exact BigDecimal HALF_UP) and DuckDB (scaled multiply) round
    // boundary values differently (seen at sf0.1). Integer round-half-up
    // basis points — floor((20000·I + D) / 2D) — are engine-independent;
    // the single /10000.0 at the end is one exact IEEE op.
    val minT = least(col("n_tokens"), lit(100L))
    val len = col("len_chars")
    val numer = minT * len + lit(60L) * col("n_alpha") + lit(40L) * (len - col("n_punct"))
    val denom = lit(200L) * len
    base
      .withColumn("qn", numer)
      .withColumn("qd", denom)
      // SQL `div` is true integer division (Column./ goes through doubles
      // and can mis-floor at integer boundaries)
      .withColumn("bp", when(len > 0, expr("(20000 * qn + qd) div (2 * qd)"))
        .otherwise(minT * 50L + 2000L))
      .withColumn("quality_score", col("bp").cast("double") / 10000.0)
      .withColumn("quality_bucket",
        when(col("quality_score") >= 0.8, "high")
          .when(col("quality_score") >= 0.5, "medium")
          .otherwise("low"))
      .select("doc_id", "n_tokens", "quality_score", "quality_bucket")
      .orderBy("doc_id")
  }

  private val textQualitySql =
    """WITH b AS (
      |  SELECT doc_id,
      |    CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
      |         ELSE array_length(regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END AS n_tokens,
      |    length(text) AS len_chars,
      |    length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
      |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct
      |  FROM documents
      |), scored AS (
      |  SELECT doc_id, n_tokens,
      |    (CASE WHEN len_chars > 0 THEN
      |       (20000 * (least(n_tokens, 100) * len_chars + 60 * n_alpha
      |                 + 40 * (len_chars - n_punct)) + 200 * len_chars)
      |       // (2 * 200 * len_chars)
      |     ELSE least(n_tokens, 100) * 50 + 2000 END) * 1.0 / 10000.0 AS quality_score
      |  FROM b
      |)
      |SELECT doc_id, n_tokens, quality_score,
      |  CASE WHEN quality_score >= 0.8 THEN 'high'
      |       WHEN quality_score >= 0.5 THEN 'medium'
      |       ELSE 'low' END AS quality_bucket
      |FROM scored ORDER BY doc_id""".stripMargin

  /** Language ID by marker-word frequency, argmax with a fixed priority order
    * (en > de > es > fr > zh on ties) so prediction is deterministic. */
  def textLangid(s: SparkSession, d: String): DataFrame = {
    val doc = Tables.documents(s, d)
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    def score(markers: Seq[String]): Column =
      markers.map(m => occurrences(padded, m)).reduce(_ + _).cast("long")
    val scored = doc.select(
      (Seq(col("doc_id"), col("lang").as("actual_lang")) ++
        langMarkers.map { case (l, ms) => score(ms).as(s"s_$l") }): _*)
    val langs = langMarkers.map(_._1)
    // argmax with fixed tie priority: first lang whose score >= max of the rest
    val predicted = langs.init.zipWithIndex.foldRight(lit(langs.last)) {
      case ((l, i), elseCol) =>
        val rest = langs.drop(i + 1).map(r => col(s"s_$r"))
        val restMax = if (rest.size == 1) rest.head else greatest(rest: _*)
        when(col(s"s_$l") >= restMax, lit(l)).otherwise(elseCol)
    }
    scored
      .withColumn("predicted_lang", predicted)
      .withColumn("lang_match", col("predicted_lang") === col("actual_lang"))
      .orderBy("doc_id")
  }

  private val textLangidSql = {
    def occ(m: String) =
      s"CAST((length(p.pad) - length(replace(p.pad, '$m', ''))) / ${m.length} AS BIGINT)"
    val scores = langMarkers.map { case (l, ms) =>
      ms.map(occ).mkString("(", " + ", s") AS s_$l")
    }.mkString(",\n    ")
    val langs = langMarkers.map(_._1)
    val caseArms = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1).map(r => s"s_$r")
      val restMax = if (rest.size == 1) rest.head else s"greatest(${rest.mkString(", ")})"
      s"WHEN s_$l >= $restMax THEN '$l'"
    }.mkString("\n    ")
    s"""WITH p AS (
       |  SELECT doc_id, lang AS actual_lang, ' ' || lower(text) || ' ' AS pad
       |  FROM documents
       |), scored AS (
       |  SELECT doc_id, actual_lang,
       |    $scores
       |  FROM p
       |)
       |SELECT doc_id, actual_lang, ${langs.map(l => s"s_$l").mkString(", ")},
       |  CASE $caseArms ELSE '${langs.last}' END AS predicted_lang,
       |  (CASE $caseArms ELSE '${langs.last}' END) = actual_lang AS lang_match
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  /** Content fingerprinting: md5 digest + 64-bit hex prefix, the identity a
    * dedup pipeline carries instead of the full text. */
  def textFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        md5(col("text")).as("fp"),
        substring(md5(col("text")), 1, 16).as("fp64"))
      .orderBy("doc_id")

  private val textFingerprintSql =
    """SELECT doc_id, md5(text) AS fp, substr(md5(text), 1, 16) AS fp64
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Fuzzy entity matching — the reference's bill-number canonicalization +
    * fuzzy column/record matching (build_master_corpus.py:46-52
    * normalize_bill_number, legiscan_normalizer.py:84-109
    * find_best_column_match) as a scaled record-linkage operator: canonicalize
    * (strip non-alphanumerics, uppercase), block on p_brand (never n² across
    * blocks), then Levenshtein ≤ 2 within the block. */
  def textFuzzyMatch(s: SparkSession, d: String): DataFrame = {
    val canon = upper(regexp_replace(col("p_name"), "[^a-zA-Z0-9]", ""))
    val p = Tables.part(s, d)
      .select(col("p_partkey"), col("p_brand"), col("p_name"), canon.as("canon"))
    // Dedupe-before-distance: entity strings repeat heavily (20k parts share
    // 64 names at sf0.1), so compute Levenshtein once per DISTINCT
    // (brand, canon) pair — 160× fewer O(n·m) calls — then fan matching name
    // pairs back out to key pairs. |len(a)-len(b)| <= 2 lower-bounds the edit
    // distance and short-circuits before levenshtein runs.
    val names = p.select("p_brand", "canon").distinct()
    val namePairs = names.as("na").join(names.as("nb"),
        col("na.p_brand") === col("nb.p_brand") &&
          col("na.canon") < col("nb.canon") &&
          abs(length(col("na.canon")) - length(col("nb.canon"))) <= 2)
      .select(col("na.p_brand").as("brand"),
        col("na.canon").as("ca"), col("nb.canon").as("cb"),
        levenshtein(col("na.canon"), col("nb.canon")).cast("long").as("edit_dist"))
      .filter(col("edit_dist") <= 2)
    namePairs
      .join(p.as("x"), col("x.p_brand") === col("brand") && col("x.canon") === col("ca"))
      .join(p.as("y"), col("y.p_brand") === col("brand") && col("y.canon") === col("cb"))
      .select(
        least(col("x.p_partkey"), col("y.p_partkey")).as("key_a"),
        greatest(col("x.p_partkey"), col("y.p_partkey")).as("key_b"),
        when(col("x.p_partkey") < col("y.p_partkey"), col("x.p_name"))
          .otherwise(col("y.p_name")).as("name_a"),
        when(col("x.p_partkey") < col("y.p_partkey"), col("y.p_name"))
          .otherwise(col("x.p_name")).as("name_b"),
        col("edit_dist"))
      .orderBy("key_a", "key_b")
  }

  private val textFuzzyMatchSql =
    """WITH p AS (
      |  SELECT p_partkey, p_brand, p_name,
      |    upper(regexp_replace(p_name, '[^a-zA-Z0-9]', '', 'g')) AS canon
      |  FROM part
      |)
      |SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
      |  a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.canon, b.canon) AS BIGINT) AS edit_dist
      |FROM p a JOIN p b
      |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey AND a.canon <> b.canon
      |  AND abs(length(a.canon) - length(b.canon)) <= 2
      |WHERE levenshtein(a.canon, b.canon) <= 2
      |ORDER BY key_a, key_b""".stripMargin

  val all: Seq[Q] = Seq(
    Q("text_fuzzy_match", textFuzzyMatch, Some(textFuzzyMatchSql)),
    Q("text_token_stats", textTokenStats, Some(textTokenStatsSql)),
    Q("text_quality", textQuality, Some(textQualitySql)),
    Q("text_langid", textLangid, Some(textLangidSql)),
    Q("text_fingerprint", textFingerprint, Some(textFingerprintSql))
  )
}
