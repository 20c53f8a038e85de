package graft

import org.apache.spark.sql.functions._

class CsvSpec extends SparkSpec {

  test("csv roundtrip: aggregates equal the direct parquet computation") {
    val got = sources.CsvSource.csvRoundtrip(spark, sf).collect()
    val want = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("total_cents"),
        sum(conv(substring(md5(col("props")), 1, 8), 16, 10).cast("long"))
          .as("props_checksum"))
      .orderBy("event_type").collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getAs[String]("event_type") == w.getAs[String]("event_type"))
      assert(g.getAs[Long]("n_events") == w.getAs[Long]("n_events"))
      assert(g.getAs[Long]("n_users") == w.getAs[Long]("n_users"))
      assert(g.getAs[Long]("total_cents") == w.getAs[Long]("total_cents"))
      // the checksum is the quoting-survival proof: every props JSON string
      // (embedded commas/quotes/braces) must come back byte-identical
      assert(g.getAs[Long]("props_checksum") == w.getAs[Long]("props_checksum"))
    }
  }

  test("csv staging really exercises quoting: props embed double quotes") {
    // embedded quotes inside quoted fields are the hard case of RFC-4180:
    // the writer must escape them and the reader must unescape them, or
    // the checksum in the roundtrip test cannot match
    val props = Tables.events(spark, sf).select("props").limit(200).collect()
      .map(_.getAs[String]("props"))
    assert(props.exists(_.contains("\"")),
      "fixture must contain embedded quotes or the test proves nothing")
  }
}
