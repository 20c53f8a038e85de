package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Fuzzy schema normalization + union of heterogeneous tabular sources — the
  * reference's spreadsheet-combining stage (legiscan_normalizer.py:58-109:
  * COLUMN_PATTERNS, normalize_column_name, find_best_column_match) as a
  * reusable Spark source component.
  *
  * Column-name resolution is driver-side metadata work (schemas are tiny);
  * the DATA never leaves executors — `conform` is a pure projection and
  * `unionConform` is unionByName over projections, so Catalyst still prunes
  * and pushes down through it.
  */
object SchemaNormalizer {

  /** Canonical column → name patterns, tried exact-first then all-words
    * substring (mirrors find_best_column_match's two passes). */
  val columnPatterns: Seq[(String, Seq[String])] = Seq(
    "state" -> Seq("state"),
    "bill_number" -> Seq("bill number", "bill no", "billno", "number", "bill"),
    "title" -> Seq("title"),
    "status" -> Seq("status"),
    "last_action_date" -> Seq("last action date", "last action", "action date", "last date", "date"),
    "url" -> Seq("url", "link", "page"))

  /** Lowercase, collapse runs of non-alphanumerics to single spaces. */
  def normalizeColumnName(c: String): String =
    c.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim

  /** Resolve each canonical column to the best-matching actual column. */
  def findMapping(columns: Seq[String]): Map[String, String] = {
    val normalized = columns.map(c => normalizeColumnName(c) -> c)
    val used = scala.collection.mutable.Set[String]()
    columnPatterns.flatMap { case (canonical, patterns) =>
      val exact = patterns.iterator
        .flatMap(p => normalized.find { case (n, orig) =>
          n == normalizeColumnName(p) && !used.contains(orig) })
        .map(_._2).nextOption()
      val hit = exact.orElse {
        patterns.iterator.flatMap { p =>
          val words = normalizeColumnName(p).split(" ")
          normalized.find { case (n, orig) =>
            words.forall(n.contains) && !used.contains(orig) }
        }.map(_._2).nextOption()
      }
      hit.foreach(used.add)
      hit.map(canonical -> _)
    }.toMap
  }

  /** Project a source onto the canonical schema: mapped columns renamed and
    * cast to string (spreadsheet semantics), unmapped canonicals → NULL. */
  def conform(df: DataFrame, provenance: String): DataFrame = {
    val mapping = findMapping(df.columns.toSeq)
    val cols = columnPatterns.map { case (canonical, _) =>
      mapping.get(canonical) match {
        case Some(actual) => trim(col(s"`$actual`").cast(StringType)).as(canonical)
        case None => lit(null).cast(StringType).as(canonical)
      }
    } :+ lit(provenance).as("collection_method")
    df.select(cols: _*)
  }

  /** Union heterogeneous sources into one canonical table. */
  def unionConform(sources: Seq[(DataFrame, String)]): DataFrame =
    sources.map { case (df, prov) => conform(df, prov) }
      .reduce(_.unionByName(_))

  /** Read a CSV with header into the canonical schema. */
  def readCsv(s: SparkSession, path: String, provenance: String): DataFrame =
    conform(s.read.option("header", "true").csv(path), provenance)

  /** Read .xlsx file(s) into the canonical schema — the reference unions
    * *.csv with *.xlsx and *.xls through the same column mapping
    * (legiscan_normalizer.py:123-137); Xlsx.read is the pandas.read_excel
    * analog (JDK-only parser, per-file executor parallelism). */
  def readXlsx(s: SparkSession, path: String, provenance: String): DataFrame =
    conform(Xlsx.read(s, path), provenance)
}
