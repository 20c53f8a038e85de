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
