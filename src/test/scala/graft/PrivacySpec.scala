package graft

import operators.Privacy

/** k-anonymity / l-diversity audit invariants on sf0.001. */
class PrivacySpec extends SparkSpec {

  test("k-anonymity report is monotone in k and accounts all rows at most once per threshold") {
    val rows = Privacy.qKanonymity(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 5L, 10L, 20L))
    val total = Tables.customer(spark, sf).count()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) <= b.getLong(1)) // groups_below monotone
      assert(a.getLong(2) <= b.getLong(2)) // rows_below monotone
    }
    rows.foreach { r =>
      assert(r.getLong(2) <= total)
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000)
    }
  }

  test("t-closeness: t = 0 iff the group's distribution is identical to the global one") {
    import SparkSpec.spark.implicits._
    // group 0 mirrors the global MIX exactly after pooling with group 1's
    // identical shape scaled 2x — both then sit AT the global distribution
    // (t = 0); group 2 is fully concentrated on the LAST of three ordered
    // segments while the pool is uniform-ish, so its t must be large.
    val uniform = Seq(
      (0L, 0L, "a", 10L), (0L, 0L, "b", 10L), (0L, 0L, "c", 10L),
      (1L, 0L, "a", 20L), (1L, 0L, "b", 20L), (1L, 0L, "c", 20L))
    val sameDist = uniform
      .toDF("nation", "bal_bucket", "segment", "n_gs")
    val scores0 = operators.Privacy.tclosenessScores(sameDist)
      .select("nation", "t_milli").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores0 == Map(0L -> 0L, 1L -> 0L))
    // concentrate group 2 on segment c: global shifts, so groups 0/1 move
    // OFF zero and group 2 scores strictly larger than both
    val skewed = (uniform :+ (2L, 0L, "c", 60L))
      .toDF("nation", "bal_bucket", "segment", "n_gs")
    val scores1 = operators.Privacy.tclosenessScores(skewed)
      .select("nation", "t_milli").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores1(2L) > scores1(0L) && scores1(2L) > scores1(1L))
    assert(scores1(0L) > 0L) // identical-to-each-other ≠ identical-to-global
    // hand check: pool = (30,30,90)/150; group 2 = (0,0,60)/60.
    // |P1−Q1| = 1/5, |P2−Q2| = 2/5 → t = (1/2)(1/5+2/5) = 3/10 → 300 milli
    assert(scores1(2L) == 300L)
  }

  test("t-closeness histogram accounts every customer row; buckets within [0,10]") {
    val rows = operators.Privacy.qTcloseness(spark, sf).collect()
    val total = Tables.customer(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 10)
      assert(r.getLong(3) <= 1000)
    }
  }

  test("l-diversity distribution partitions all rows; l bounded by the segment vocabulary") {
    import org.apache.spark.sql.functions._
    val rows = Privacy.qLDiversity(spark, sf).collect()
    val nSegs = Tables.customer(spark, sf)
      .agg(countDistinct("c_mktsegment")).head.getLong(0)
    assert(rows.forall(r => r.getLong(0) >= 1 && r.getLong(0) <= nSegs))
    val total = Tables.customer(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total)
  }
}
