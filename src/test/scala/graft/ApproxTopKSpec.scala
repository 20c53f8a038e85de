package graft

import org.apache.spark.sql.functions._
import graft.functions.ApproxTopK.approxTopK
import graft.functions.TextFunctions._

class ApproxTopKSpec extends SparkSpec {

  private def tokens = Tables.documents(spark, sf)
    .select(col("lang"), explode(split(normalizeText(col("text")), "\\s+")).as("tok"))
    .filter(length(col("tok")) > 0)

  test("with capacity above the vocabulary, sketch equals exact top-k") {
    val sketch = operators.Corpus.corpusHeavyHitters(spark, sf).collect()
    val exact = operators.Corpus.corpusTopTokens(spark, sf).collect()
    assert(sketch.length == exact.length && sketch.nonEmpty)
    sketch.zip(exact).foreach { case (a, b) =>
      assert(a.getAs[String]("tok") == b.getAs[String]("tok") &&
        a.getAs[Long]("cnt") == b.getAs[Long]("cnt"), s"\n$a\n$b")
    }
  }

  test("under eviction pressure, items above the N/capacity threshold survive") {
    // the actual SpaceSaving theorem: any value with true frequency
    // > N/capacity is present in the full sketch. (Being in the top-k BY
    // ESTIMATE is not guaranteed for near-uniform data, so don't assert it.)
    val capacity = 8
    val sketch = tokens.groupBy("lang").agg(approxTopK(col("tok"), capacity, capacity).as("top"))
      .select(col("lang"), explode(col("top")).as("t"))
      .select(col("lang"), col("t.token").as("tok"))
      .collect()
      .groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.map(_.getAs[String]("tok")).toSet).toMap
    val counts = tokens.groupBy("lang", "tok").count().collect()
    val totals = counts.groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.map(_.getAs[Long]("count")).sum).toMap
    val guaranteed = counts.filter(r =>
      r.getAs[Long]("count") > totals(r.getAs[String]("lang")).toDouble / capacity)
    guaranteed.foreach { r =>
      val (lang, tok) = (r.getAs[String]("lang"), r.getAs[String]("tok"))
      assert(sketch(lang).contains(tok), s"guaranteed heavy hitter '$tok' missing for $lang")
    }
  }

  test("sketch counts never under-estimate the true count") {
    val est = tokens.groupBy("lang").agg(approxTopK(col("tok"), 5, 8).as("top"))
      .select(col("lang"), explode(col("top")).as("t"))
      .select(col("lang"), col("t.token").as("tok"), col("t.cnt").as("cnt"))
      .collect()
    val exact = tokens.groupBy("lang", "tok").count().collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("tok")) -> r.getAs[Long]("count"))
      .toMap
    est.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[String]("tok"))
      assert(r.getAs[Long]("cnt") >= exact.getOrElse(key, 0L),
        s"under-estimate for $key")
    }
  }
}
