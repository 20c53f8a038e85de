package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import operators.Relational._

  test("q1 groups by (returnflag, linestatus) with positive sums") {
    val rows = q1PricingSummary(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
    }
  }

  test("q3 returns at most 10 rows sorted by revenue desc") {
    val rows = q3TopOrders(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("rollup grand total equals sum of region subtotals") {
    val rows = qRollup(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val regionLevel = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(regionLevel.map(_.getAs[Long]("n_customers")).sum ==
      grand.head.getAs[Long]("n_customers"))
    // and equals the raw count
    assert(grand.head.getAs[Long]("n_customers") ==
      Tables.customer(spark, sf).count())
  }

  test("semi/anti partition: no_orders + customers-with-orders = all customers") {
    val tagged = qSemiAnti(spark, sf)
    val noOrders = tagged.filter(col("tag") === "no_orders").count()
    val withOrders = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(noOrders + withOrders == Tables.customer(spark, sf).count())
  }

  test("top customer per nation: rank within 1..3 and descending spend") {
    val rows = qTopCustomerPerNation(spark, sf).collect()
    rows.groupBy(_.getAs[String]("n_name")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to sorted.length).toSeq)
      val spends = sorted.map(_.getAs[Double]("spend"))
      assert(spends.sameElements(spends.sortBy(-_)))
    }
  }
}
