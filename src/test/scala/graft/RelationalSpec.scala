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

  test("q2: every kept row is a true per-part minimum; ties all kept") {
    val rows = qMinCostRows()
    assert(rows.nonEmpty)
    // hand-recompute each part's regional min from raw lineitem
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val sup = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey")
    val trueMin = Tables.lineitem(spark, sf)
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey").agg(min(cents).as("m"))
      .collect().map(r => r.getAs[Long]("l_partkey") -> r.getAs[Long]("m")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("min_cost") == trueMin(r.getAs[Long]("p_partkey")))
    }
    // join-back keeps ties: row count per part >= 1 and all rows share min
    val perPart = rows.groupBy(_.getAs[Long]("p_partkey"))
    perPart.values.foreach { g =>
      assert(g.map(_.getAs[Long]("min_cost")).distinct.length == 1)
    }
  }
  private def qMinCostRows() = q2MinCostSupplier(spark, sf).collect()

  test("portable HLL estimate is within the m=64 sketch error envelope") {
    // standard error 1.04/sqrt(64) = 13%; allow 3 sigma for small groups
    qApproxDistinct(spark, sf).collect().foreach { r =>
      val exact = r.getAs[Long]("exact_orders").toDouble
      val est = r.getAs[Long]("hll_orders").toDouble
      assert(est > 0 && math.abs(est - exact) / exact <= 0.39,
        s"hll=$est exact=$exact")
      assert(r.getAs[Long]("err_bp") ==
        (math.abs(est - exact) * 10000 / exact).floor.toLong)
    }
  }

  test("percentiles are monotone and inside the min/max range") {
    val stats = Tables.orders(spark, sf)
      .groupBy("o_orderstatus")
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    qPercentiles(spark, sf).collect().foreach { r =>
      val (lo, hi) = stats(r.getAs[String]("o_orderstatus"))
      val ps = Seq("p25", "p50", "p75", "p95").map(r.getAs[Double])
      assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
      assert(ps.head >= lo - 0.01 && ps.last <= hi + 0.01)
    }
  }

  test("range join: band membership is symmetric (total close-count is even)") {
    // every qualifying pair (a,b) contributes once to a.n_close and once to
    // b.n_close, so the global count must be even and the gap sum double-counted
    val rows = qRangeJoinBinned(spark, sf).collect()
    val totalClose = rows.map(_.getAs[Long]("n_close")).sum
    assert(totalClose > 0 && totalClose % 2 == 0, s"asymmetric band join: $totalClose")
    assert(rows.map(_.getAs[Long]("sum_gap_cents")).sum % 2 == 0)
  }

  test("window_time_range: trailing frame includes self and never shrinks below 1") {
    val rows = qWindowTimeRange(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("ev_cnt_10m") >= 1L))
  }

  test("cube: all four grouping levels present and internally consistent") {
    val rows = qCube(spark, sf).collect()
    def lvl(rf: Boolean, ls: Boolean) = rows.filter(r =>
      (r.getAs[String]("l_returnflag") != null) == rf &&
        (r.getAs[String]("l_linestatus") != null) == ls)
    val (base, byRf, byLs, grand) = (lvl(true, true), lvl(true, false), lvl(false, true), lvl(false, false))
    assert(grand.length == 1 && base.nonEmpty && byRf.nonEmpty && byLs.nonEmpty)
    val total = base.map(_.getAs[Long]("n_items")).sum
    assert(grand.head.getAs[Long]("n_items") == total)
    assert(byRf.map(_.getAs[Long]("n_items")).sum == total)
    assert(byLs.map(_.getAs[Long]("n_items")).sum == total)
    assert(grand.head.getAs[Long]("sum_qty") == base.map(_.getAs[Long]("sum_qty")).sum)
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

  test("robust stats: recomputes by hand from the raw cents") {
    val cents = Tables.orders(spark, sf)
      .select(col("o_orderstatus"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    def med2(xs: Array[Long]): Long = {
      val n = xs.length
      if (n % 2 == 1) xs(n / 2) * 2 else xs(n / 2 - 1) + xs(n / 2)
    }
    qRobustStats(spark, sf).collect().foreach { r =>
      val xs = cents(r.getAs[String]("status"))
      val m2 = med2(xs)
      assert(r.getAs[Long]("med_halfcents") == m2)
      val devs = xs.map(x => math.abs(x * 2 - m2)).sorted
      val m4 = med2(devs)
      assert(r.getAs[Long]("mad_qcents") == m4)
      val out = devs.count(d => d * 20000L > m4 * 44478L).toLong
      assert(r.getAs[Long]("n_outliers") == out)
      assert(r.getAs[Long]("n") == xs.length.toLong)
    }
  }

  test("histogram quantile sketch: within one bin width of the exact quantile") {
    // exact reference + the sketch's own bin width per group
    val exact = Tables.orders(spark, sf)
      .groupBy("o_orderstatus")
      .agg(
        expr("percentile(round(o_totalprice * 100), 0.5)").as("e50"),
        expr("percentile(round(o_totalprice * 100), 0.9)").as("e90"),
        expr("percentile(round(o_totalprice * 100), 0.99)").as("e99"),
        ((max(round(col("o_totalprice") * 100)) -
          min(round(col("o_totalprice") * 100))) / 64 + 1).as("w"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val rows = qHistogramQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e50, e90, e99, w) = exact(r.getAs[String]("status"))
      def check(colName: String, e: Double): Unit = {
        val got = r.getAs[Long](colName).toDouble
        assert(math.abs(got - e) <= w + 1,
          s"$colName=$got vs exact=$e exceeds bin width $w")
      }
      check("p50_cents", e50); check("p90_cents", e90); check("p99_cents", e99)
      assert(r.getAs[Long]("p50_cents") <= r.getAs[Long]("p90_cents"))
      assert(r.getAs[Long]("p90_cents") <= r.getAs[Long]("p99_cents"))
    }
  }

  test("grouping sets: every level re-aggregates consistently to the grand total") {
    val rows = qGroupingSets(spark, sf).collect()
    def level(id: Long) = rows.filter(_.getAs[Long]("grp_id") == id)
    val grand = level(7L)
    assert(grand.length == 1)
    val total = grand.head.getAs[Long]("n_orders")
    assert(total == Tables.orders(spark, sf).count())
    // each level partitions the same orders: counts sum to the grand total
    for (id <- Seq(1L, 3L, 4L)) {
      assert(level(id).map(_.getAs[Long]("n_orders")).sum == total, s"level $id")
      assert(level(id).map(_.getAs[Long]("total_cents")).sum ==
        grand.head.getAs[Long]("total_cents"), s"level $id cents")
    }
    // (nation, year) refines (nation): per-nation sums agree across levels
    val byNation = level(1L).groupBy(_.getAs[String]("n_name"))
      .view.mapValues(_.map(_.getAs[Long]("n_orders")).sum).toMap
    level(3L).foreach { r =>
      assert(byNation(r.getAs[String]("n_name")) == r.getAs[Long]("n_orders"))
    }
  }

  test("window distribution: pr/cd endpoints and monotonicity per segment") {
    val rows = qWindowDistribution(spark, sf).collect()
    rows.groupBy(_.getAs[String]("c_mktsegment")).foreach { case (seg, rs) =>
      val sorted = rs.sortBy(r => (r.getAs[Long]("bal_cents"), r.getAs[Long]("c_custkey")))
      assert(sorted.head.getAs[Long]("pr_bp") == 0L, s"$seg first pr")
      assert(sorted.last.getAs[Long]("pr_bp") == 10000L, s"$seg last pr")
      assert(sorted.last.getAs[Long]("cd_bp") == 10000L, s"$seg last cd")
      val prs = sorted.map(_.getAs[Long]("pr_bp"))
      assert(prs.zip(prs.tail).forall { case (a, b) => a < b }, s"$seg pr not strict")
      val n = sorted.length
      // cume_dist of the k-th row (unique ordering) is exactly k/n
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("cd_bp") ==
          math.round((i + 1).toDouble / n * 10000), s"$seg row $i cd")
      }
    }
  }
  test("skyline: agrees with the naive O(n^2) domination check") {
    val rows = qSkyline(spark, sf).collect()
    assert(rows.nonEmpty)
    // naive reference computed locally over the full point set
    val pts = Tables.part(spark, sf).select(
        col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("price_cents"),
        col("p_size").cast("long").as("size")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val naive = pts.filter { case (_, p1, s1) =>
      !pts.exists { case (_, p2, s2) =>
        p2 <= p1 && s2 <= s1 && (p2 < p1 || s2 < s1) }
    }.map(_._1).toSet
    assert(rows.map(_.getAs[Long]("p_partkey")).toSet == naive)
    // the frontier is strictly decreasing in size as price increases
    // (between distinct price levels)
    val frontier = rows.map(r => (r.getAs[Long]("price_cents"), r.getAs[Long]("size")))
    frontier.sliding(2).foreach {
      case Array((pa, sa), (pb, sb)) =>
        if (pa < pb) assert(sb < sa, "more expensive frontier point must be smaller")
      case _ =>
    }
  }

  test("decile lift: covers all customers, shares are monotone to 10000") {
    val rows = operators.Relational.qDecileLift(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val nCust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    // equal-frequency: sizes differ by at most 1
    val sizes = rows.map(_.getAs[Long]("n_customers"))
    assert(sizes.max - sizes.min <= 1)
    // top decile concentrates the most revenue; cumulative share ends at 100%
    val cents = rows.map(_.getAs[Long]("decile_cents"))
    assert(cents.head == cents.max)
    val shares = rows.map(_.getAs[Long]("cum_share_bp"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(shares.last == 10000L)
  }

  test("benford: digit shares recompute and the generator visibly fails the law") {
    import org.apache.spark.sql.functions.{col, round => rnd}
    val rows = operators.Relational.qBenford(spark, sf).collect()
    val digits = Tables.orders(spark, sf)
      .select(rnd(col("o_totalprice")).cast("long")).collect()
      .map(_.getLong(0).toString.head.asDigit.toLong).filter(_ >= 1)
    val byD = digits.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.map(_.getAs[Long]("digit")).toSet == byD.keySet)
    val n = digits.length.toLong
    val pm = Map(1L -> 301L, 2L -> 176L, 3L -> 125L, 4L -> 97L, 5L -> 79L,
      6L -> 67L, 7L -> 58L, 8L -> 51L, 9L -> 46L)
    rows.foreach { r =>
      val d = r.getAs[Long]("digit")
      assert(r.getAs[Long]("n_obs") == byD(d))
      assert(r.getAs[Long]("obs_bp") == 10000L * byD(d) / n)
      assert(r.getAs[Long]("benford_bp") == pm(d) * 10)
      val diff = 1000L * byD(d) - n * pm(d)
      assert(r.getAs[Long]("chi2_contrib_milli") == diff * diff / (n * pm(d)))
    }
    // the narrow-band generator must NOT follow Benford: χ² far above the
    // 5%-level critical value for 8 df (15.51 ⇒ 15510 milli)
    val chi2 = rows.map(_.getAs[Long]("chi2_contrib_milli")).sum
    assert(chi2 > 15510L, s"audit has no teeth: chi2_milli=$chi2")
  }

  test("analyze stats: NDV/min/max/octiles recompute from raw column values") {
    import org.apache.spark.sql.functions.{col, round => rnd}
    val rows = operators.Relational.qAnalyzeStats(spark, sf).collect()
      .map(r => ((r.getAs[String]("col_name"), r.getAs[String]("stat")),
        r.getAs[Long]("v"))).toMap
    val data = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long"),
        rnd(col("l_extendedprice")).cast("long"),
        rnd(col("l_discount") * 1000).cast("long"),
        rnd(col("l_tax") * 1000).cast("long"))
      .collect()
    val cols = Map(
      "qty" -> data.map(_.getLong(0)), "price" -> data.map(_.getLong(1)),
      "disc" -> data.map(_.getLong(2)), "tax" -> data.map(_.getLong(3)))
    assert(rows.size == 4 * 11, "4 columns x (4 summary + 7 octiles)")
    cols.foreach { case (name, vs) =>
      val n = vs.length.toLong
      assert(rows((name, "n")) == n)
      assert(rows((name, "ndv")) == vs.distinct.length.toLong)
      assert(rows((name, "min")) == vs.min)
      assert(rows((name, "max")) == vs.max)
      val sorted = vs.sorted
      (1 to 7).foreach { k =>
        // discrete octile: smallest v with 8*rank >= k*n
        val idx = ((k * n + 7) / 8 - 1).toInt // ceil(k*n/8), 0-based
        assert(rows((name, s"oct_$k")) == sorted(idx), s"$name oct_$k")
      }
      // octiles are monotone and inside [min, max]
      val octs = (1 to 7).map(k => rows((name, s"oct_$k")))
      assert(octs.zip(octs.tail).forall { case (a, b) => a <= b })
      assert(octs.head >= vs.min && octs.last <= vs.max)
    }
  }
}
