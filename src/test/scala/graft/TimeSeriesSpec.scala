package graft

import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import operators.TimeSeries._

  /** Local zero-filled (t, type, y) series at the given grain, recomputed
    * straight from the raw events — independent of the operators' spine. */
  private def localSeries(grainMs: Long): Map[String, Seq[(Long, Long)]] = {
    val ms = functions.TimeFunctions.nsToMs("ts")
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), (ms / grainMs).cast("long").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val lo = raw.map(_._2).min
    val hi = raw.map(_._2).max
    val types = raw.map(_._1).distinct
    val counts = raw.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    types.map { et =>
      et -> (lo to hi).map(t => (t, counts.getOrElse((et, t), 0L))).toSeq
    }.toMap
  }

  test("trend fit: OLS closed form matches a local recompute; fit tracks the data") {
    val rows = qTrendFit(spark, sf).collect()
    val series = localSeries(86400000L)
    assert(rows.length == series.size)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val ys = series(et).map(_._2)
      val n = ys.length.toLong
      val xs = ys.indices.map(_.toLong)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val sxx = xs.map(x => x * x).sum
      val slope = (1000000L * (n * sxy - sx * sy)) / (n * sxx - sx * sx)
      val icept = (1000000L * sy - slope * sx) / n
      val mae = xs.zip(ys)
        .map { case (x, y) => math.abs(1000000L * y - (slope * x + icept)) }
        .sum / n
      assert(r.getAs[Long]("n_days") == n, s"n for $et")
      assert(r.getAs[Long]("slope_micro") == slope, s"slope for $et")
      assert(r.getAs[Long]("intercept_micro") == icept, s"intercept for $et")
      assert(r.getAs[Long]("mae_micro") == mae, s"mae for $et")
      // sanity: the fitted line at the mean x is within MAE+1 of the mean y
      val fitMid = slope * (sx.toDouble / n) + icept
      assert(math.abs(fitMid - 1000000.0 * sy / n) <= mae + 1000000.0)
    }
  }

  test("autocorr: expanded integer form equals the naive centered ACF") {
    val rows = qAutocorr(spark, sf).collect()
    val series = localSeries(3600000L)
    assert(rows.length == series.size * 3)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val k = r.getAs[Long]("lag").toInt
      val ys = series(et).map(_._2)
      val n = ys.length
      assert(r.getAs[Long]("n_hours") == n.toLong)
      // exact recompute of the expanded integer form in BigInt (BigInt `/`
      // truncates toward zero, same as Spark div / DuckDB //)
      val bn = BigInt(n)
      val s0 = BigInt(ys.sum)
      val q0 = ys.map(y => BigInt(y) * y).sum
      val p = (0 until n - k).map(t => BigInt(ys(t)) * ys(t + k)).sum
      val a = BigInt(ys.take(n - k).sum)
      val b = BigInt(ys.drop(k).sum)
      val nk = bn * bn * p - bn * s0 * (a + b) + (bn - k) * s0 * s0
      val dk = bn * bn * q0 - bn * s0 * s0
      val expect = ((BigInt(10000) * nk) / dk).toLong
      val got = r.getAs[Long]("acf_bp")
      assert(got == expect, s"acf($et, $k): got $got expect $expect")
      // cross-check the expansion against the naive centered ACF in doubles
      val m = ys.sum.toDouble / n
      val num = (0 until n - k).map(t => (ys(t) - m) * (ys(t + k) - m)).sum
      val den = ys.map(y => (y - m) * (y - m)).sum
      assert(math.abs(10000.0 * num / den - got) <= 1.5,
        s"expanded form diverges from naive ACF for ($et, $k)")
    }
    // hourly arrival counts are positively autocorrelated at lag 1 for at
    // least one type OR the data is near-white — just assert bounds
    rows.foreach(r => assert(math.abs(r.getAs[Long]("acf_bp")) <= 10000L))
  }

  test("cusum: window identity equals the max(0, C+x) recursion; alarms honest") {
    val rows = qCusumChangepoint(spark, sf).collect()
    val series = localSeries(3600000L)
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("t"))
      val ys = series(et).map(_._2)
      assert(sorted.length == ys.length)
      val n = ys.length
      val mu = (1000000L * ys.sum) / n
      val mad = ys.map(y => math.abs(1000000L * y - mu)).sum / n
      var c = 0L
      sorted.zip(ys).foreach { case (r, y) =>
        assert(r.getAs[Long]("y") == y)
        c = math.max(0L, c + (1000000L * y - mu))
        assert(r.getAs[Long]("cusum_micro") == c,
          s"cusum at ${r.getAs[Long]("t")} for $et")
        assert(r.getAs[Long]("alarm") == (if (c > 5 * mad) 1L else 0L))
      }
    }
  }

  test("psi drift: shares and contributions recompute; PSI is non-negative") {
    val rows = qPsiDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val ms = functions.TimeFunctions.nsToMs("ts")
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), ms.as("ms")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val mid = (raw.map(_._2).min + raw.map(_._2).max) / 2
    val na = raw.filter(_._2 < mid).groupBy(_._1).map { case (k, v) => (k, v.length + 1L) }
    val nb = raw.filter(_._2 >= mid).groupBy(_._1).map { case (k, v) => (k, v.length + 1L) }
    val types = raw.map(_._1).distinct
    val ta = types.map(t => na.getOrElse(t, 1L)).sum
    val tb = types.map(t => nb.getOrElse(t, 1L)).sum
    assert(rows.length == types.length)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val (a, b) = (na.getOrElse(et, 1L), nb.getOrElse(et, 1L))
      assert(r.getAs[Long]("n_a") == a && r.getAs[Long]("n_b") == b)
      assert(r.getAs[Long]("p_a_bp") == 10000L * a / ta)
      assert(r.getAs[Long]("p_b_bp") == 10000L * b / tb)
      val psi = math.round(1000000.0 * (a.toDouble / ta - b.toDouble / tb) *
        math.log((a.toDouble * tb) / (b.toDouble * ta)))
      assert(r.getAs[Long]("psi_micro") == psi, s"psi for $et")
      assert(r.getAs[Long]("psi_micro") >= 0L, "(p-q) and ln(p/q) share sign")
    }
  }

  test("week agg: conserves orders/revenue and matches a local ISO recompute") {
    val rows = operators.TimeSeries.qWeekAgg(spark, sf).collect()
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("timestamp").as("d"), col("o_totalprice"))
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("d").toLocalDateTime.toLocalDate,
        math.round(r.getAs[Double]("o_totalprice") * 100)))
    assert(rows.map(_.getAs[Long]("n_orders")).sum == orders.length)
    assert(rows.map(_.getAs[Long]("revenue_cents")).sum == orders.map(_._2).sum)
    val wf = java.time.temporal.WeekFields.ISO
    val local = orders.groupBy { case (d, _) =>
      (d.get(wf.weekBasedYear()).toLong, d.get(wf.weekOfWeekBasedYear()).toLong)
    }.map { case (k, os) => k -> (os.size.toLong, os.map(_._2).sum) }
    rows.foreach { r =>
      val k = (r.getAs[Long]("iso_year"), r.getAs[Long]("iso_week"))
      assert(local(k) == ((r.getAs[Long]("n_orders"), r.getAs[Long]("revenue_cents"))),
        s"ISO bucket $k")
    }
  }

  test("stl: components recompute locally and the additive identity holds") {
    val rows = qStlDecompose(spark, sf).collect()
    // local daily revenue series (zero-filled)
    val ms = functions.TimeFunctions.nsToMs("ts")
    val raw = Tables.events(spark, sf)
      .select((ms / 86400000L).cast("long").as("day"),
        round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = raw.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val days = (raw.map(_._1).min to raw.map(_._1).max).toArray
    val y = days.map(d => byDay.getOrElse(d, 0L))
    assert(rows.length == days.length)
    // trend: centered 7-day MA, full windows only (truncating div)
    val trend = days.indices.map { i =>
      if (i >= 3 && i <= days.length - 4)
        Some((i - 3 to i + 3).map(y).sum / 7)
      else None
    }
    val detr = days.indices.map(i => trend(i).map(y(i) - _))
    val prof = days.indices.flatMap(i => detr(i).map(v => (days(i) % 7, v)))
      .groupBy(_._1).view
      .mapValues(vs => vs.map(_._2).sum / vs.length).toMap
    val adj = prof.values.sum / prof.size
    val seasonal = prof.view.mapValues(_ - adj).toMap
    rows.foreach { r =>
      val i = (r.getAs[Long]("day") - days.head).toInt
      assert(Option(r.getAs[Any]("trend_cents")).map(_.asInstanceOf[Long])
        == trend(i), s"trend at day index $i")
      assert(r.getAs[Long]("seasonal_cents") == seasonal(days(i) % 7))
      if (trend(i).isDefined) {
        // additive identity: y = trend + seasonal + remainder, exactly
        assert(r.getAs[Long]("trend_cents") + r.getAs[Long]("seasonal_cents")
          + r.getAs[Long]("remainder_cents") == y(i))
      } else assert(r.isNullAt(r.fieldIndex("remainder_cents")))
    }
    // seasonal profile is centered: |Σ seasonal over dows| < 7 (truncation)
    assert(math.abs(seasonal.values.sum) < 7)
  }

  test("seasonality strength: FPP3 variance ratios recompute from STL components") {
    val rows = qSeasonalityStrength(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val comp = qStlDecompose(spark, sf).collect()
      .filter(!_.isNullAt(3)) // trend_cents present
      .map(x => (x.getAs[Long]("seasonal_cents") + x.getAs[Long]("remainder_cents"),
        x.getAs[Long]("trend_cents") + x.getAs[Long]("remainder_cents"),
        x.getAs[Long]("remainder_cents")))
    val n = comp.length.toDouble
    assert(r.getAs[Long]("n_days") == comp.length.toLong)
    def cvar(xs: Array[Long]): Double =
      n * xs.map(x => x * x).sum - xs.sum.toDouble * xs.sum
    val vs = 10000 * (1 - cvar(comp.map(_._3)) / cvar(comp.map(_._1)))
    val vt = 10000 * (1 - cvar(comp.map(_._3)) / cvar(comp.map(_._2)))
    assert(math.abs(r.getAs[Long]("seasonal_strength_bp")
      - math.max(0L, math.round(vs))) <= 1)
    assert(math.abs(r.getAs[Long]("trend_strength_bp")
      - math.max(0L, math.round(vt))) <= 1)
    // bounds
    Seq("seasonal_strength_bp", "trend_strength_bp").foreach { c =>
      assert(r.getAs[Long](c) >= 0 && r.getAs[Long](c) <= 10000)
    }
  }
}
