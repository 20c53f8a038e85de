package graft

import org.apache.spark.sql.functions._

class StatTestsSpec extends SparkSpec {
  import operators.StatTests._

  private lazy val pts: Array[(Long, Long, String)] =
    Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long"),
        round(col("l_extendedprice") * 100).cast("long"), col("l_returnflag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  test("mannwhitney: U from the count grid equals the brute-force rank-sum U") {
    val rows = qMannwhitney(spark, sf).collect()
    val flags = pts.map(_._3).distinct.sorted
    assert(rows.length == flags.combinations(2).size)
    rows.foreach { r =>
      val (g1, g2) = (r.getAs[String]("g1"), r.getAs[String]("g2"))
      val s1 = pts.filter(_._3 == g1).map(_._1)
      val s2 = pts.filter(_._3 == g2).map(_._1)
      assert(r.getAs[Long]("n1") == s1.length.toLong)
      assert(r.getAs[Long]("n2") == s2.length.toLong)
      // brute force in doubled units over the value grid (not pairs — n²
      // pairs would be 4e8 — but the same identity on an independent path)
      val vs = (s1 ++ s2).distinct.sorted
      val c1 = vs.map(v => s1.count(_ == v).toLong)
      val c2 = vs.map(v => s2.count(_ == v).toLong)
      val c2cum = c2.scanLeft(0L)(_ + _)
      val u1x2 = vs.indices.map(i => c1(i) * (2 * c2cum(i) + c2(i))).sum
      assert(r.getAs[Long]("u1_x2") == u1x2, s"U for ($g1,$g2)")
      // z-score recompute (same formula, double)
      val (n1, n2) = (s1.length.toDouble, s2.length.toDouble)
      val n = n1 + n2
      val tie3 = vs.indices.map(i => { val t = c1(i) + c2(i); t * t * t - t }).sum
      val z = 100.0 * ((u1x2 - n1 * n2) / 2.0) /
        math.sqrt((n1 * n2 / 12.0) * ((n + 1) - tie3 / (n * (n - 1.0))))
      assert(math.abs(r.getAs[Long]("z_centi") - math.round(z)) <= 1,
        s"z for ($g1,$g2)")
      // U1 + U2 = n1*n2 (doubled: u1x2 + u2x2 = 2*n1*n2) — sanity identity
      // (U2 credits s2's wins: s1 values BELOW v, i.e. C1(<v))
      val c1cum = c1.scanLeft(0L)(_ + _)
      val u2x2 = vs.indices.map { i =>
        c2(i) * (2 * c1cum(i) + c1(i))
      }.sum
      assert(u1x2 + u2x2 == 2 * s1.length.toLong * s2.length,
        s"U1+U2 identity for ($g1,$g2)")
    }
  }

  private lazy val bal: Array[(String, Long)] =
    Tables.customer(spark, sf)
      .select(col("c_mktsegment"), round(col("c_acctbal")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

  test("welch ttest: t and df recompute from raw balances for every pair") {
    val rows = qWelchTtest(spark, sf).collect()
    val segs = bal.map(_._1).distinct.sorted
    assert(rows.length == segs.combinations(2).size)
    rows.foreach { r =>
      val (g1, g2) = (r.getAs[String]("g1"), r.getAs[String]("g2"))
      val s1 = bal.filter(_._1 == g1).map(_._2)
      val s2 = bal.filter(_._1 == g2).map(_._2)
      assert(r.getAs[Long]("n1") == s1.length.toLong)
      assert(r.getAs[Long]("n2") == s2.length.toLong)
      assert(r.getAs[Long]("mean1_units") == s1.sum / s1.length)
      val (n1, n2) = (s1.length.toDouble, s2.length.toDouble)
      def varOf(v: Array[Long]): Double = {
        val n = v.length.toDouble
        (n * v.map(x => x * x).sum - v.sum.toDouble * v.sum) / (n * (n - 1.0))
      }
      val (va, vb) = (varOf(s1) / n1, varOf(s2) / n2)
      val t = 1000 * ((s1.sum / n1 - s2.sum / n2) / math.sqrt(va + vb))
      assert(math.abs(r.getAs[Long]("t_milli") - math.round(t)) <= 1,
        s"t for ($g1,$g2)")
      val df = 100 * ((va + vb) * (va + vb) /
        (va * va / (n1 - 1.0) + vb * vb / (n2 - 1.0)))
      assert(math.abs(r.getAs[Long]("df_centi") - math.round(df)) <= 1,
        s"df for ($g1,$g2)")
      // Welch df is bounded by min(n1,n2)-1 below and n1+n2-2 above
      assert(r.getAs[Long]("df_centi") >= 100 * (math.min(n1, n2) - 1).toLong)
      assert(r.getAs[Long]("df_centi") <= 100 * (n1 + n2 - 2).toLong)
    }
  }

  test("anova: F recomputes from raw balances; eta2 consistent with SSB/SSW") {
    val rows = qAnova(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val groups = bal.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(r.getAs[Long]("k_groups") == groups.size.toLong)
    assert(r.getAs[Long]("n_total") == bal.length.toLong)
    // same centi-unit path as the operator: per-group 100·s² product in
    // DOUBLE (BIGINT would overflow below sf1) rounded to centi, then
    // integer sums
    val bss = groups.values
      .map(v => math.round(100 * (v.sum.toDouble * v.sum) / v.length)).sum
    val sAll = bal.map(_._2).sum
    val qAll = bal.map(x => x._2 * x._2).sum
    val ssb = bss - math.round(100 * (sAll.toDouble * sAll) / bal.length)
    val ssw = 100L * qAll - bss
    assert(r.getAs[Long]("ssb_centi") == ssb)
    assert(r.getAs[Long]("ssw_centi") == ssw)
    val k = groups.size.toDouble
    val f = 100 * ((ssb / (k - 1.0)) / (ssw / (bal.length - k)))
    assert(math.abs(r.getAs[Long]("f_centi") - math.round(f)) <= 1)
    assert(r.getAs[Long]("eta2_bp") == 10000L * ssb / (ssb + ssw))
  }

  test("bootstrap ci: resample means recompute from the portable hash weights") {
    val rows = qBootstrapCi(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val base = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber").cast("long"),
        round(col("l_discount") * 1000).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def nib(s0: String): Long = {
      val h = md.digest(s0.getBytes("UTF-8"))
      ((h(0) >> 4) & 0xf).toLong % 4
    }
    val point = 1000000L * base.map(_._3).sum / base.length
    assert(r.getAs[Long]("point_micro") == point)
    assert(r.getAs[Long]("n_boot") == 32L)
    val means = (1 to 32).map { b =>
      var sw = 0L; var swv = 0L
      base.foreach { case (ok, ln, v) =>
        val m = nib(s"graft-boot-$b:$ok-$ln")
        val w = if (m == 0) 0L else if (m == 3) 2L else 1L
        sw += w; swv += w * v
      }
      1000000L * swv / sw
    }.sorted
    assert(r.getAs[Long]("lo_micro") == means(1), "2nd order statistic")
    assert(r.getAs[Long]("hi_micro") == means(30), "31st order statistic")
    assert(r.getAs[Long]("lo_micro") <= point && point <= r.getAs[Long]("hi_micro"),
      "CI brackets the point estimate")
  }

  test("ks binned: sup of binned CDF gap matches a local recompute") {
    val rows = qKsBinned(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val a = pts.filter(_._3 == "A").map(_._2)
    val b = pts.filter(_._3 == "R").map(_._2)
    val all0 = a ++ b
    val (lo, hi) = (all0.min, all0.max)
    def bucket(c: Long): Long = ((c - lo) * 4096) / (hi - lo + 1)
    val ba = a.map(bucket)
    val bb = b.map(bucket)
    val (n1, n2) = (a.length.toLong, b.length.toLong)
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    val buckets = (ba ++ bb).distinct.sorted
    assert(r.getAs[Long]("n_buckets") == buckets.length.toLong)
    val gaps = buckets.map { t =>
      val cA = ba.count(_ <= t).toLong
      val cB = bb.count(_ <= t).toLong
      (t, math.abs(cA * n2 - cB * n1))
    }
    val dmax = gaps.map(_._2).max
    assert(r.getAs[Long]("d_bp") == 10000L * dmax / (n1 * n2))
    assert(r.getAs[Long]("at_bucket") == gaps.filter(_._2 == dmax).map(_._1).min)
    // KS distance is a genuine sup: every bucket's gap is <= the reported one
    gaps.foreach { case (_, g) => assert(g <= dmax) }
  }

  test("cuped: matches an exact local integer recompute of theta and means") {
    val rows = qCuped(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("arm")).toSeq == Seq(0L, 1L))
    val ev = Tables.events(spark, sf)
      .withColumn("ms", graft.functions.TimeFunctions.nsToMs("ts"))
      .select(col("user_id"),
        ((col("ms") - pmod(col("ms"), lit(86400000L))) / 86400000L)
          .cast("long").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day"), r.getAs[Long]("cents")))
    val mid = (ev.map(_._2).min + ev.map(_._2).max + 1) / 2
    val pu = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.filter(_._2 < mid).map(_._3).sum / 100,
        es.filter(_._2 >= mid).map(_._3).sum / 100)
    }.toSeq
    val n = pu.size.toLong
    val sx = pu.map(_._2).sum; val sy = pu.map(_._3).sum
    val sxy = pu.map(p => p._2 * p._3).sum; val sxx = pu.map(p => p._2 * p._2).sum
    val theta = ((n * sxy - sx * sy) * 1000L) / (n * sxx - sx * sx)
    rows.foreach { r =>
      val arm = r.getAs[Long]("arm")
      val grp = pu.filter(_._1 % 2 == arm)
      val (na, xa, ya) = (grp.size.toLong, grp.map(_._2).sum, grp.map(_._3).sum)
      assert(r.getAs[Long]("n_users") == na)
      assert(r.getAs[Long]("x_units") == xa && r.getAs[Long]("y_units") == ya)
      assert(r.getAs[Long]("theta_milli") == theta)
      assert(r.getAs[Long]("mean_y_milli") == 1000L * ya / na)
      assert(r.getAs[Long]("mean_yadj_milli") ==
        (1000L * n * ya - theta * (n * xa - na * sx)) / (n * na))
    }
  }

  test("ols multi: Cramer solve matches a local least-squares recompute") {
    import org.apache.spark.sql.functions.col
    val rows = qOlsMulti(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val data = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long"),
        round(col("l_discount") * 1000).cast("long"),
        round(col("l_extendedprice")).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val n = data.length.toDouble
    assert(r.getAs[Long]("n") == data.length.toLong)
    val (s1, s2, sy) = (data.map(_._1).sum.toDouble,
      data.map(_._2).sum.toDouble, data.map(_._3).sum.toDouble)
    val c11 = n * data.map(x => x._1 * x._1).sum - s1 * s1
    val c22 = n * data.map(x => x._2 * x._2).sum - s2 * s2
    val c12 = n * data.map(x => x._1 * x._2).sum - s1 * s2
    val c1y = n * data.map(x => x._1 * x._3).sum - s1 * sy
    val c2y = n * data.map(x => x._2 * x._3).sum - s2 * sy
    val cyy = n * data.map(x => x._3 * x._3).sum - sy * sy
    val det = c11 * c22 - c12 * c12
    val b1 = (c1y * c22 - c2y * c12) / det
    val b2 = (c2y * c11 - c1y * c12) / det
    assert(math.abs(r.getAs[Long]("b1_micro") - math.round(1e6 * b1)) <= 2)
    assert(math.abs(r.getAs[Long]("b2_micro") - math.round(1e6 * b2)) <= 2)
    assert(math.abs(r.getAs[Long]("b0_centi")
      - math.round(100 * ((sy - b1 * s1 - b2 * s2) / n))) <= 2)
    val r2 = (b1 * c1y + b2 * c2y) / cyy
    assert(r2 >= 0 && r2 <= 1, s"R2 out of range: $r2")
    assert(math.abs(r.getAs[Long]("r2_bp") - math.round(10000 * r2)) <= 2)
  }

  test("corr matrix: every pair matches a local Pearson recompute") {
    val rows = qCorrMatrix(spark, sf).collect()
    assert(rows.length == 6)
    val data = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long"),
        round(col("l_extendedprice")).cast("long"),
        round(col("l_discount") * 1000).cast("long"),
        round(col("l_tax") * 1000).cast("long"))
      .collect().map(r => Map("qty" -> r.getLong(0), "price" -> r.getLong(1),
        "disc" -> r.getLong(2), "tax" -> r.getLong(3)))
    val n = data.length.toDouble
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("col_a"), r.getAs[String]("col_b"))
      assert(a < b, "pairs are lexicographically ordered")
      val (xs, ys) = (data.map(_(a)), data.map(_(b)))
      val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
      val rr = 1000 * ((n * xs.zip(ys).map { case (x, y) => x * y }.sum - sx * sy)
        / math.sqrt((n * xs.map(x => x * x).sum - sx * sx)
          * (n * ys.map(y => y * y).sum - sy * sy)))
      assert(math.abs(r.getAs[Long]("r_milli") - math.round(rr)) <= 1,
        s"r for ($a,$b)")
      assert(math.abs(r.getAs[Long]("r_milli")) <= 1000)
    }
  }

  test("srm check: chi2 identity recomputes from distinct user arms") {
    val rows = qSrmCheck(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val users = Tables.events(spark, sf).select("user_id").distinct()
      .collect().map(_.getLong(0))
    val (n0, n1) = (users.count(_ % 2 == 0).toLong, users.count(_ % 2 == 1).toLong)
    assert(r.getAs[Long]("n_users") == users.length.toLong)
    assert(r.getAs[Long]("n_arm0") == n0)
    assert(r.getAs[Long]("n_arm1") == n1)
    val chi2 = 1000L * (n0 - n1) * (n0 - n1) / users.length
    assert(r.getAs[Long]("chi2_milli") == chi2)
    assert(r.getAs[Boolean]("srm_flag") == (chi2 > 3841L))
  }
}
