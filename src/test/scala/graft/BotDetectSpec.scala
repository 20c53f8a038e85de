package graft

import operators.BotDetect

/** Cadence-regularity screening invariants on sf0.001. */
class BotDetectSpec extends SparkSpec {

  test("histogram partitions every user with ≥2 events; buckets within [0, 15]") {
    import org.apache.spark.sql.functions._
    val rows = BotDetect.qBotRegularity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) <= 15))
    val nUsers = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).count()
    assert(rows.map(_.getLong(1)).sum == nUsers)
    // gap count = events − 1 per counted user
    val nEvents = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).agg(sum("n")).head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == nEvents - nUsers)
  }

  test("a metronomic cadence lands in bucket 0 by construction") {
    // perfectly regular gaps → MAD = 0 → ratio 0 → bucket 0; sanity-check
    // the arithmetic the query applies, on a hand-built relation
    import org.apache.spark.sql.functions._
    val gaps = spark.range(10).select(lit(5000L).as("gap"))
    val mean = gaps.agg(expr("sum(gap) div count(1)")).head.getLong(0)
    val mad = gaps.agg(expr(s"sum(abs(gap - $mean)) div count(1)")).head.getLong(0)
    assert(mean == 5000L && mad == 0L)
  }
}
