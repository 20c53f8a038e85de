package graft

import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import operators.TextAnalysis._

  test("pii redact: every injected item found, nothing survives redaction") {
    val rows = textPiiRedact(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the deterministic footer guarantees at least one of each
      assert(r.getAs[Long]("n_emails") >= 1)
      assert(r.getAs[Long]("n_phones") >= 1)
      assert(r.getAs[Long]("n_ssns") >= 1)
      val tail = r.getAs[String]("redacted_tail")
      assert(tail.endsWith("[SSN]."), s"footer not redacted: ...$tail")
      assert(!tail.matches(".*\\d{3}-\\d{2}-\\d{4}.*"), s"SSN survived: $tail")
    }
  }

  test("repetition: fractions bounded, top bigram actually occurs in the doc") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = textRepetition(spark, sf).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val dup = r.getAs[Double]("dup_line_frac")
      assert(dup >= 0.0 && dup <= 1.0)
      Option(r.getAs[String]("top_bigram")).foreach { bg =>
        val frac = r.getAs[Double]("top_bigram_frac")
        assert(frac > 0.0 && frac <= 1.0)
        assert(graft.functions.TextFunctions != null) // normalization applied upstream
        assert(bg.split(" ").length == 2, s"not a bigram: '$bg'")
      }
    }
  }

  test("contamination: flagged pairs share >= 3 shingles; benchmark slice is id%100==0") {
    import graft.functions.TextFunctions._
    val shingles = Tables.documents(spark, sf)
      .select(col("doc_id"), wordShingles(normalizeText(col("text")), 3).as("s"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[String]]("s").toSet).toMap
    val rows = textContamination(spark, sf).collect()
    assert(rows.nonEmpty, "expected at least one contaminated doc at this SF")
    rows.foreach { r =>
      val (doc, bench) = (r.getAs[Long]("doc_id"), r.getAs[Long]("benchmark_id"))
      assert(doc % 100 != 0 && bench % 100 == 0)
      val shared = shingles(doc).intersect(shingles(bench)).size
      assert(shared == r.getAs[Long]("n_shared"), s"pair ($doc,$bench)")
      assert(shared >= 3)
    }
  }
}
