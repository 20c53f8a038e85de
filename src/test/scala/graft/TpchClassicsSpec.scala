package graft

import org.apache.spark.sql.functions._

/** Semantic teeth for the TPC-H-classic shapes: each test hand-recomputes
  * the query's defining invariant from the raw tables (the DuckDB oracle
  * proves cross-engine parity; these prove the SEMANTICS are the intended
  * ones, independent of the SQL restatement). */
class TpchClassicsSpec extends SparkSpec {
  import operators.TpchClassics._

  test("q4: counts sum to exactly the distinct late-order count") {
    val rows = q4OrderPriority(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("order_count")).sum
    // hand recompute: distinct 1997 orders having a >30-day-late line
    val o = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1997-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
    val expected = Tables.lineitem(spark, sf)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .select("o_orderkey").distinct().count()
    assert(total == expected)
  }

  test("q12: high+low partition the late lines exactly; high matches a direct filter") {
    val rows = q12ShipPriority(spark, sf).collect()
    assert(rows.nonEmpty)
    val late = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
    // the two CASE measures partition the joined relation with nothing dropped
    val totalHighLow = rows.map(r =>
      r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
    assert(totalHighLow == late.count())
    // and "high" agrees with an independent direct-filter recompute
    val highDirect = late
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("high_line_count") ==
        highDirect.getOrElse(r.getAs[String]("l_returnflag"), 0L))
    }
  }

  test("q11: every kept part clears the threshold; every dropped part does not") {
    val kept = q11ImportantParts(spark, sf).collect()
      .map(r => r.getAs[Long]("l_partkey") -> r.getAs[Long]("value_cents")).toMap
    // rebuild the full per-part relation (kept ∪ dropped) and the total
    val perPart = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf)
          .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
          .join(Tables.region(spark, sf).filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey"),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey")
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")).as("v"))
      .collect().map(r => r.getAs[Long]("l_partkey") -> r.getAs[Long]("v")).toMap
    val total = perPart.values.sum
    perPart.foreach { case (pk, v) =>
      assert((v * 1000 > total) == kept.contains(pk),
        s"part $pk: value $v vs total $total, kept=${kept.contains(pk)}")
    }
    kept.foreach { case (pk, v) => assert(perPart(pk) == v) }
  }

  test("q13: distribution covers every customer exactly once, zero bucket real") {
    val rows = q13CountDistribution(spark, sf).collect()
    val totalCustomers = rows.map(_.getAs[Long]("custdist")).sum
    assert(totalCustomers == Tables.customer(spark, sf).count())
    // weighted count-sum equals the number of non-urgent orders
    val weighted = rows.map(r =>
      r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum
    val nonUrgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT").count()
    assert(weighted == nonUrgent)
  }

  test("q14: promo share in [0,10000] bp and components reconcile") {
    val r = q14PromoRevenue(spark, sf).collect().head
    val promo = r.getAs[Long]("promo_cents")
    val totalC = r.getAs[Long]("total_cents")
    val bp = r.getAs[Long]("promo_bp")
    assert(promo >= 0 && promo <= totalC)
    assert(bp == promo * 10000 / totalC)
  }

  test("q16: denylisted suppliers never counted") {
    val denied = Tables.supplier(spark, sf)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
      .collect().map(_.getLong(0)).toSet
    // max possible distinct suppliers per bucket excludes the denylist
    val maxCnt = q16SupplierCnt(spark, sf).collect()
      .map(_.getAs[Long]("supplier_cnt")).max
    val supTotal = Tables.supplier(spark, sf).count()
    assert(maxCnt <= supTotal - denied.size)
  }

  test("q18: exactly the orders whose hand-summed quantity exceeds 250") {
    val got = q18LargeOrders(spark, sf).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Long]("sum_qty")).toMap
    val expected = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey")
      .agg(round(sum("l_quantity")).cast("long").as("q"))
      .filter(col("q") > 250)
      .collect().map(r => r.getAs[Long]("l_orderkey") -> r.getAs[Long]("q")).toMap
    assert(got == expected)
  }

  test("q19: revenue equals the brute-force disjunction sum") {
    val r = q19Disjunctive(spark, sf).collect().head
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(20, 35) &&
          col("l_quantity").between(20, 30)))
      .agg(coalesce(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")), lit(0L)), count(lit(1)))
      .collect().head
    assert(r.getAs[Long]("revenue_cents") == expected.getLong(0))
    assert(r.getAs[Long]("matched_lines") == expected.getLong(1))
  }

  test("q21: a flagged supplier is the unique late supplier of each counted order") {
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")
    val lo = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), late.as("is_late"))
      .collect()
    val byOrder = lo.groupBy(_.getLong(0))
    val expected = byOrder.toSeq.flatMap { case (_, ls) =>
      val supps = ls.map(_.getLong(1)).toSet
      val lateSupps = ls.filter(_.getBoolean(2)).map(_.getLong(1)).toSet
      if (supps.size >= 2 && lateSupps.size == 1) Some(lateSupps.head) else None
    }.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val supName = Tables.supplier(spark, sf).collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[String]("s_name")).toMap
    val got = q21WaitingSupplier(spark, sf).collect()
      .map(r => r.getAs[String]("s_name") -> r.getAs[Long]("numwait")).toMap
    assert(got == expected.map { case (k, v) => supName(k) -> v })
    assert(got.nonEmpty)
  }

  test("q6: revenue equals the brute-force filtered sum") {
    val r = q6ForecastRevenue(spark, sf).collect().head
    val exp = Tables.lineitem(spark, sf).collect().filter { row =>
      val sd = row.getAs[java.time.LocalDateTime]("l_shipdate").toString
      val disc = row.getAs[Double]("l_discount")
      sd >= "1997-01-01" && sd < "1998-01-01" &&
        disc >= 0.05 && disc <= 0.07 && row.getAs[Double]("l_quantity") < 24
    }
    assert(r.getAs[Long]("n_lines") == exp.length)
    assert(r.getAs[Long]("revenue_cents") == exp.map(row =>
      math.round(row.getAs[Double]("l_extendedprice") * row.getAs[Double]("l_discount") * 100)).sum)
  }

  test("q7: symmetric pair only, both directions present, never same-nation") {
    // sf0.001's 100 suppliers rarely cover both directions — assert at sf0.01
    val rows = q7NationVolume(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r =>
      (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"))).toSet
    pairs.foreach { case (a, b) => assert(a != b) }
    assert(pairs.map(_._1).subsetOf(Set("NATION_3", "NATION_7")))
    assert(pairs.map(_._2).subsetOf(Set("NATION_3", "NATION_7")))
    assert(pairs.size == 2, "both shipping directions must appear")
  }

  test("q10: exactly the top-20 hand-ranked lost-revenue customers") {
    val got = q10ReturnedItems(spark, sf).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[Long]("lost_cents"))
    assert(got.length <= 20 && got.nonEmpty)
    val lost = Tables.lineitem(spark, sf).filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, sf)
          .filter(col("o_orderdate") >= lit("1997-07-01") &&
            col("o_orderdate") < lit("1997-10-01")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")).as("v"))
      .collect().map(r => r.getAs[Long]("o_custkey") -> r.getAs[Long]("v"))
    val expTop = lost.sortBy { case (k, v) => (-v, k) }.take(20)
    assert(got.toSeq == expTop.toSeq)
  }

  test("q15: returned suppliers all carry exactly the hand-computed max revenue") {
    val rows = q15TopSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val rev = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1997-04-01"))
      .groupBy("l_suppkey")
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")).as("v"))
      .collect().map(r => r.getAs[Long]("l_suppkey") -> r.getAs[Long]("v")).toMap
    val mx = rev.values.max
    val expect = rev.collect { case (k, v) if v == mx => k }.toSet
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet == expect)
    rows.foreach(r => assert(r.getAs[Long]("total_cents") == mx))
  }

  test("q20: a supplier appears iff it shipped a hot part in 1997") {
    val got = q20ExcessSuppliers(spark, sf).collect()
      .map(_.getAs[Long]("s_suppkey")).toSet
    val l97 = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select("l_partkey", "l_suppkey", "l_quantity").collect()
    val hot = l97.groupBy(_.getAs[Long]("l_partkey"))
      .collect { case (pk, rs)
        if math.round(rs.map(_.getAs[Double]("l_quantity")).sum) > 290 => pk }.toSet
    val expect = l97.filter(r => hot.contains(r.getAs[Long]("l_partkey")))
      .map(_.getAs[Long]("l_suppkey")).toSet
    assert(got == expect)
    assert(got.nonEmpty && got.size < Tables.supplier(spark, sf).count(),
      "threshold must exclude at least one supplier")
  }

  test("q9: profit reconciles against the hand-joined measure; negatives occur") {
    val rows = q9ProductProfit(spark, sf).collect()
    assert(rows.nonEmpty)
    // full per-(nation, year) reconciliation against a hand-built join
    val nation = Tables.nation(spark, sf).collect()
      .map(r => r.getAs[Int]("n_nationkey") -> r.getAs[String]("n_name")).toMap
    val supNation = Tables.supplier(spark, sf).collect()
      .map(r => r.getAs[Long]("s_suppkey") -> nation(r.getAs[Int]("s_nationkey"))).toMap
    val retail = Tables.part(spark, sf)
      .filter(col("p_name").contains("ring")).collect()
      .map(r => r.getAs[Long]("p_partkey") -> r.getAs[Double]("p_retailprice")).toMap
    val orderYear = Tables.orders(spark, sf).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        r.getAs[java.time.LocalDateTime]("o_orderdate").getYear.toLong).toMap
    val expected = Tables.lineitem(spark, sf).collect()
      .filter(r => retail.contains(r.getAs[Long]("l_partkey")))
      .groupBy(r => (supNation(r.getAs[Long]("l_suppkey")),
        orderYear(r.getAs[Long]("l_orderkey"))))
      .view.mapValues(_.map { r =>
        math.round(r.getAs[Double]("l_extendedprice") *
          (1.0 - r.getAs[Double]("l_discount")) * 100) -
          math.round(retail(r.getAs[Long]("l_partkey")) *
            r.getAs[Double]("l_quantity") * 10)
      }.sum).toMap
    val got = rows.map(r => (r.getAs[String]("n_name"), r.getAs[Long]("o_year")) ->
      r.getAs[Long]("profit_cents")).toMap
    assert(got == expected)
  }

  test("q17: every counted line is below 20% of its part's average quantity") {
    val r = q17SmallQuantity(spark, sf).collect().head
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), round(col("l_quantity")).cast("long").as("q"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("net")).collect()
    val pp = li.groupBy(_.getAs[Long]("l_partkey"))
      .view.mapValues(rs => (rs.map(_.getAs[Long]("q")).sum, rs.length.toLong)).toMap
    val sel = li.filter { row =>
      val (s, c) = pp(row.getAs[Long]("l_partkey"))
      row.getAs[Long]("q") * 5 * c < s
    }
    assert(r.getAs[Long]("n_lines") == sel.length)
    assert(r.getAs[Long]("revenue_cents") == sel.map(_.getAs[Long]("net")).sum)
  }

  test("q22: every counted customer is above-average balance with no recent order") {
    val rows = q22DormantProspects(spark, sf).collect()
    assert(rows.nonEmpty)
    val cust = Tables.customer(spark, sf).collect()
    val pos = cust.filter(_.getAs[Double]("c_acctbal") > 0)
      .map(r => math.round(r.getAs[Double]("c_acctbal") * 100))
    val (sumC, cnt) = (pos.sum, pos.length.toLong)
    val recent = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1999-01-01"))
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val nationName = Tables.nation(spark, sf).collect()
      .map(r => r.getAs[Int]("n_nationkey") -> r.getAs[String]("n_name")).toMap
    val expected = cust.filter { r =>
      val bal = math.round(r.getAs[Double]("c_acctbal") * 100)
      bal * cnt > sumC && !recent.contains(r.getAs[Long]("c_custkey"))
    }.groupBy(r => nationName(r.getAs[Int]("c_nationkey")))
      .map { case (n, g) => n -> g.length.toLong }
    val got = rows.map(r => r.getAs[String]("n_name") -> r.getAs[Long]("numcust")).toMap
    assert(got == expected)
  }
}
