package graft

import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {

  test("interval overlap: binned join equals the naive theta join exactly") {
    val rows = operators.Sessionize.qIntervalOverlap(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // rebuild the session spans and count concurrency the O(n²) way
    val order = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ms").asc, col("event_id").asc)
    val run = order.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val sess = Tables.events(spark, sf)
      .withColumn("ms", graft.functions.TimeFunctions.nsToMs("ts"))
      .withColumn("prev_ms", lag(col("ms"), 1).over(order))
      .withColumn("is_new", when(col("prev_ms").isNull ||
        col("ms") - col("prev_ms") > 30L * 60 * 1000, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(run))
      .groupBy("user_id", "session_id")
      .agg(min("ms").as("s"), max("ms").as("e"))
    val naive = sess.alias("a").join(sess.alias("b"),
        col("a.user_id") =!= col("b.user_id") &&
          col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .groupBy(col("a.user_id").as("u"), col("a.session_id").as("sid"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("sid")) -> r.getAs[Long]("n"))
      .toMap
    rows.foreach { r =>
      val key = (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"))
      assert(naive(key) == r.getAs[Long]("n_concurrent"),
        s"binned count diverges from naive at $key")
    }
    // the top-1 really is the global max of the naive relation
    assert(rows.head.getAs[Long]("n_concurrent") == naive.values.max)
  }
  import operators.Sessionize._

  test("sessionize conserves events and sessions are ordered per user") {
    val sess = eventsSessionize(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(sess.map(_.getAs[Long]("n_events")).sum == total)
    sess.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("session_id"))
      assert(ordered.map(_.getAs[Long]("session_id")).toSeq ==
        (1L to ordered.length).toSeq)
      // sessions don't overlap: each starts after the previous ends + gap
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_ms") - a.getAs[Long]("end_ms") > 30 * 60 * 1000)
        case _ =>
      }
    }
  }

  test("session bounds: start <= end within every session") {
    eventsSessionize(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("start_ms") <= r.getAs[Long]("end_ms"))
    }
  }

  test("tumbling windows conserve event count and bucket to hour boundaries") {
    val rows = eventsTumbling(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.events(spark, sf).count())
    rows.foreach(r => assert(r.getAs[Long]("hour_ms") % 3600000L == 0))
  }

  test("incremental aggregate merge is indistinguishable from full recompute") {
    val full = Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("val_cents"),
        min("cents").as("min_cents"), max("cents").as("max_cents"))
      .orderBy("event_type").collect()
    val incr = qIncrAgg(spark, sf).collect()
    assert(incr.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq,
      "snapshot + delta must equal the full aggregate exactly")
    // and the snapshot really is reused: a second call must not restage
    val again = qIncrAgg(spark, sf).collect()
    assert(again.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
  }

  test("hopping windows: every event counted exactly twice, 30-min aligned starts") {
    val rows = eventsHopping(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == 2 * total,
      "window/slide = 2 ⇒ each event lands in exactly 2 windows")
    rows.foreach(r => assert(r.getAs[Long]("win_ms") % 1800000L == 0))
    // each hopping window's count equals the sum of its two half-hour slots
    val tumbling30 = Tables.events(spark, sf)
      .groupBy({
        val ms = graft.functions.TimeFunctions.nsToMs("ts")
        (ms - pmod(ms, lit(1800000L))).as("slot")
      }, col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Long]("slot"), r.getAs[String]("event_type")) -> r.getAs[Long]("n"))
      .toMap
    rows.foreach { r =>
      val (w, t) = (r.getAs[Long]("win_ms"), r.getAs[String]("event_type"))
      val expected = tumbling30.getOrElse((w, t), 0L) + tumbling30.getOrElse((w + 1800000L, t), 0L)
      assert(r.getAs[Long]("n") == expected, s"window $w/$t")
    }
  }

  test("attribution conserves purchases and channels are touch types or organic") {
    val rows = eventsAttribution(spark, sf).collect()
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == purchases,
      "every purchase must land in exactly one channel")
    val channels = rows.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(Set("click", "view", "organic")))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_purchases"))
    }
  }

  test("attribution: a purchase with no preceding touch in window is organic") {
    // hand-check one user: earliest purchase before any click/view → organic
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        graft.functions.TimeFunctions.nsToMs("ts").as("ms"))
      .collect()
    val byUser = ev.groupBy(_.getAs[Long]("user_id"))
    val lookback = 24L * 3600 * 1000
    // recompute expected channel totals naively on the driver (sf0.001 only)
    val expected = byUser.values.flatMap { rs =>
      val sorted = rs.sortBy(r => (r.getAs[Long]("ms"), r.getAs[Long]("event_id")))
      sorted.zipWithIndex.collect {
        case (r, i) if r.getAs[String]("event_type") == "purchase" =>
          val touch = sorted.take(i).reverse.find(p =>
            Set("click", "view")(p.getAs[String]("event_type")))
          touch match {
            case Some(t) if r.getAs[Long]("ms") - t.getAs[Long]("ms") <= lookback =>
              t.getAs[String]("event_type")
            case _ => "organic"
          }
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = eventsAttribution(spark, sf).collect()
      .map(r => r.getAs[String]("channel") -> r.getAs[Long]("n_purchases")).toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("json extract: every event has k, so no missing values") {
    val rows = eventsJsonExtract(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.events(spark, sf).count())
    rows.foreach(r => assert(r.getAs[Long]("n_missing") == 0))
  }

  test("retention: day-0 row equals cohort size and bounds every later offset") {
    val rows = eventsRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[Long]("cohort_day"))
    byCohort.foreach { case (c, rs) =>
      val day0 = rs.find(_.getAs[Long]("day_offset") == 0L)
      assert(day0.isDefined, s"cohort $c missing its day-0 row")
      val size = day0.get.getAs[Long]("n_users")
      rs.foreach { r =>
        assert(r.getAs[Long]("day_offset") >= 0L)
        assert(r.getAs[Long]("n_users") <= size,
          s"cohort $c retains more users than it has")
      }
    }
    // every user appears in exactly one cohort: day-0 totals = user count
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_.getAs[Long]("day_offset") == 0L)
      .get.getAs[Long]("n_users")).sum == users)
  }

  test("scd2: one row per user; probe resolves consistently with event history") {
    val probe = 1705363200000L
    val rows = qScd2Lookup(spark, sf).collect()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.length.toLong == users, "one lookup row per user")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_versions")
      val ver = r.getAs[Long]("ver_at_probe")
      val from = r.getAs[Long]("valid_from_ms")
      assert(n >= 1L)
      assert(ver >= 0L && ver <= n)
      if (ver == 0L) {
        // sentinel: the user's history starts after the probe
        assert(r.getAs[String]("attr_at_probe") == "none" && from == -1L)
      } else {
        assert(from <= probe, "version in force must have started by the probe")
      }
    }
    // at least some users on each side of the probe at this SF
    assert(rows.exists(_.getAs[Long]("ver_at_probe") > 0L))
  }

  test("event transitions: rows normalize to ~10000 bp per from_type") {
    val rows = qEventTransitions(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    val events = Tables.events(spark, sf).count()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(total == events - users, "one transition per event except each user's last")
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (ft, rs) =>
      val bp = rs.map(_.getAs[Long]("p_bp")).sum
      // each row rounds independently: sum within ±(rows/2) of 10000
      assert(math.abs(bp - 10000L) <= rs.length, s"$ft rows sum to $bp bp")
    }
  }
  test("cohort ltv: triangle recomputes from raw events; cumulative monotone") {
    val rows = qCohortLtv(spark, sf).collect()
    assert(rows.nonEmpty)
    val ms = functions.TimeFunctions.nsToMs("ts")
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        (ms / 86400000L).cast("long").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val cohort = ev.groupBy(_._1).map { case (u, es) => (u, es.map(_._3).min) }
    val tri = ev.filter(_._2 == "purchase")
      .groupBy(e => (cohort(e._1), e._3 - cohort(e._1)))
      .map { case (k, es) => (k, es.map(_._4).sum) }
    assert(rows.length == tri.size)
    rows.groupBy(_.getAs[Long]("cohort_day")).foreach { case (cd, rs) =>
      var cum = 0L
      rs.sortBy(_.getAs[Long]("day_offset")).foreach { r =>
        val off = r.getAs[Long]("day_offset")
        assert(r.getAs[Long]("rev_cents") == tri((cd, off)), s"rev at ($cd,$off)")
        cum += r.getAs[Long]("rev_cents")
        assert(r.getAs[Long]("cum_rev_cents") == cum)
        val users = cohort.values.count(_ == cd).toLong
        assert(r.getAs[Long]("cohort_users") == users)
        assert(r.getAs[Long]("ltv_cents_per_user") == cum / users)
      }
    }
  }

  test("funnel time: latency stats recompute from first-touch pairs") {
    val rows = qFunnelTime(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val ms = functions.TimeFunctions.nsToMs("ts")
    val ft = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"), col("event_type")).agg(min(ms).as("f"))
      .collect().map(x => ((x.getLong(0), x.getString(1)), x.getLong(2))).toMap
    val lats = ft.keys.map(_._1).toSeq.distinct.flatMap { u =>
      for {
        v <- ft.get((u, "view")); p <- ft.get((u, "purchase")) if v < p
      } yield p - v
    }.sorted
    assert(r.getAs[Long]("n_converted") == lats.length.toLong)
    assert(r.getAs[Long]("mean_ms") == lats.sum / lats.length)
    def pct(q: Double): Double = {
      val idx = q * (lats.length - 1)
      val i = idx.toInt
      val frac = idx - i
      val raw = if (i + 1 < lats.length) lats(i) + frac * (lats(i + 1) - lats(i))
      else lats(i).toDouble
      math.rint(raw * 100) / 100
    }
    assert(math.abs(r.getAs[Double]("p50_ms") - pct(0.5)) < 0.011)
    assert(math.abs(r.getAs[Double]("p90_ms") - pct(0.9)) < 0.011)
  }

  test("seasonal baseline: profile means and residuals recompute by hand") {
    val rows = qSeasonalBaseline(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getAs[String]("event_type"), r.getAs[Long]("moh")))
      .foreach { case (_, rs) =>
        val base = (1000000L * rs.map(_.getAs[Long]("cnt")).sum) / rs.length
        rs.foreach { r =>
          assert(r.getAs[Long]("baseline_micro") == base)
          assert(r.getAs[Long]("resid_micro") ==
            r.getAs[Long]("cnt") * 1000000L - base)
          assert(r.getAs[Long]("moh") == (r.getAs[Long]("minute_ms") / 60000L) % 60L)
        }
      }
    // residuals of a profile group sum to ~0 (truncation leaves < n micro)
    rows.groupBy(r => (r.getAs[String]("event_type"), r.getAs[Long]("moh")))
      .foreach { case (k, rs) =>
        val tot = rs.map(_.getAs[Long]("resid_micro")).sum
        assert(tot >= 0 && tot < rs.length, s"residual sum for $k is $tot")
      }
  }

  test("time decay: gap-aware weights recompute by hand; gaps decay harder") {
    val rows = qTimeDecay(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("minute_ms"))
      val series = sorted.map(r => (r.getAs[Long]("minute_ms"), r.getAs[Long]("cnt")))
      sorted.foreach { r =>
        val t = r.getAs[Long]("minute_ms")
        val frame = series.filter { case (m, _) => m >= t - 900000L && m <= t }
        val num = frame.map { case (m, c) => c << (15L - (t - m) / 60000L).toInt }.sum
        val den = frame.map { case (m, _) => 1L << (15L - (t - m) / 60000L).toInt }.sum
        assert(r.getAs[Long]("ewma_micro") == 1000000L * num / den,
          s"ewma at $t")
      }
    }
  }

  test("anomaly mad: hampel flag matches a hand rolling median/MAD recompute") {
    val rows = qAnomalyMad(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute per type from the minute counts alone
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("minute_ms"))
      val cnts = sorted.map(_.getAs[Long]("cnt"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val frame = cnts.slice(math.max(0, i - 3), math.min(cnts.length, i + 4)).sorted
        val n = frame.length
        val med2 = frame((n - 1) / 2) + frame(n / 2)
        assert(r.getAs[Long]("med2") == med2, s"med2 at row $i")
        val devs = frame.map(x => math.abs(2 * x - med2)).sorted
        val m2d = devs((n - 1) / 2) + devs(n / 2)
        assert(r.getAs[Long]("m2d") == m2d, s"m2d at row $i")
        assert(r.getAs[Boolean]("is_anomaly") ==
          (math.abs(2 * cnts(i) - med2) * 2 > 3 * m2d), s"flag at row $i")
      }
    }
  }

  test("rolling wau: matches a naive per-day 7-day distinct recount") {
    val rows = qRollingWau(spark, sf).collect()
    assert(rows.nonEmpty)
    val ud = Tables.events(spark, sf)
      .withColumn("ms", graft.functions.TimeFunctions.nsToMs("ts"))
      .select(col("user_id"),
        ((col("ms") - pmod(col("ms"), lit(86400000L))) / 86400000L)
          .cast("long").as("day"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")))
    val byDay = ud.groupBy(_._2)
    rows.foreach { r =>
      val day = r.getAs[Long]("day")
      val wantDau = byDay(day).size
      val wantWau = ud.filter { case (_, d) => d >= day - 6 && d <= day }
        .map(_._1).distinct.size
      assert(r.getAs[Long]("dau") == wantDau, s"dau at $day")
      assert(r.getAs[Long]("wau") == wantWau, s"wau at $day")
      assert(r.getAs[Long]("stick_bp") == 10000L * wantDau / wantWau)
    }
    // every observed day reports
    assert(rows.map(_.getAs[Long]("day")).toSet == byDay.keySet)
  }

  test("windowed funnel: matches a local greedy chain and bounds the open funnel") {
    val rows = qFunnelWindowed(spark, sf).collect()
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("1_view", "2_click_1h", "3_purchase_1h"))
    val Array(n1, n2, n3) = rows.map(_.getAs[Long]("n_users"))
    assert(n1 >= n2 && n2 >= n3)
    assert(rows.head.getAs[Long]("conv_bp") == 10000L)
    // local greedy recompute
    val ev = Tables.events(spark, sf)
      .withColumn("ms", graft.functions.TimeFunctions.nsToMs("ts"))
      .select("user_id", "event_type", "ms").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"), r.getAs[Long]("ms")))
    val byUser = ev.groupBy(_._1)
    var (c1, c2, c3) = (0L, 0L, 0L)
    byUser.values.foreach { es =>
      val vs = es.filter(_._2 == "view").map(_._3)
      if (vs.nonEmpty) {
        c1 += 1
        val v = vs.min
        val cs = es.filter(e => e._2 == "click" && e._3 >= v && e._3 <= v + 3600000L).map(_._3)
        if (cs.nonEmpty) {
          c2 += 1
          val c = cs.min
          if (es.exists(e => e._2 == "purchase" && e._3 >= c && e._3 <= v + 3600000L)) c3 += 1
        }
      }
    }
    assert((n1, n2, n3) == ((c1, c2, c3)))
    // the 1h window can only lose users vs the open funnel
    val open = eventsFunnel(spark, sf).collect().map(_.getAs[Long]("n_users"))
    assert(n2 <= open(1) && n3 <= open(2))
  }

  test("user lifespan: bands conserve users and churn matches a local recount") {
    val rows = qUserLifespan(spark, sf).collect()
    val ud = Tables.events(spark, sf)
      .withColumn("ms", graft.functions.TimeFunctions.nsToMs("ts"))
      .select(col("user_id"),
        ((col("ms") - pmod(col("ms"), lit(86400000L))) / 86400000L)
          .cast("long").as("day"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")))
    val perUser = ud.groupBy(_._1).map { case (u, ds) =>
      (u, ds.map(_._2).min, ds.map(_._2).max) }.toSeq
    val maxDay = perUser.map(_._3).max
    assert(rows.map(_.getAs[Long]("n_users")).sum == perUser.size)
    assert(rows.map(_.getAs[Long]("n_churned")).sum ==
      perUser.count(p => maxDay - p._3 > 7))
    rows.foreach { r =>
      val b = r.getAs[Long]("band")
      val want = perUser.filter { case (_, f, l) =>
        val span = l - f + 1
        java.lang.Long.toBinaryString(span).length - 1 == b
      }
      assert(r.getAs[Long]("n_users") == want.size, s"band $b size")
      assert(r.getAs[Long]("min_days") == want.map(p => p._3 - p._2 + 1).min)
      assert(r.getAs[Long]("max_days") == want.map(p => p._3 - p._2 + 1).max)
    }
  }

  test("gap histogram: buckets are powers of two and conserve gap count") {
    val rows = qGapHistogram(spark, sf).collect()
    assert(rows.nonEmpty)
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    val nEvents = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_gaps")).sum == nEvents - nUsers,
      "one gap per consecutive event pair per user")
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val lo = (1L << b) - 1 // gap_s+1 in [2^b, 2^(b+1)) → gap_s ≥ 2^b − 1
      val hi = (1L << (b + 1)) - 2
      assert(r.getAs[Long]("min_gap_s") >= lo && r.getAs[Long]("max_gap_s") <= hi,
        s"bucket $b bounds")
    }
  }

  test("survival km: curve recomputes from per-user durations; monotone") {
    val rows = operators.Sessionize.qSurvivalKm(spark, sf).collect()
    val ms = functions.TimeFunctions.nsToMs("ts")
    val ev = Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"),
        (ms / 86400000L).cast("long").as("day"),
        org.apache.spark.sql.functions.col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val mx = ev.map(_._2).max
    val durs = ev.groupBy(_._1).values.map { es =>
      val fd = es.map(_._2).min
      val errs = es.filter(_._3 == "error").map(_._2)
      if (errs.nonEmpty) (errs.min - fd, 1L) else (mx - fd, 0L)
    }.toArray
    val n = durs.length.toLong
    val deathTimes = durs.filter(_._2 == 1).map(_._1).distinct.sorted
    assert(rows.map(_.getAs[Long]("t_days")).toSeq == deathTimes.toSeq)
    var logsurv = 0.0
    var prevBp = 10000L
    rows.foreach { r =>
      val t = r.getAs[Long]("t_days")
      val nRisk = durs.count(_._1 >= t).toLong
      val d = durs.count(x => x._1 == t && x._2 == 1).toLong
      val c = durs.count(x => x._1 == t && x._2 == 0).toLong
      assert(r.getAs[Long]("n_risk") == nRisk, s"n_risk at $t")
      assert(r.getAs[Long]("n_events") == d, s"d at $t")
      assert(r.getAs[Long]("n_censored") == c, s"c at $t")
      if (d < nRisk) {
        logsurv += math.round(1000 * math.log((nRisk - d).toDouble / nRisk))
        assert(math.abs(r.getAs[Long]("logsurv_milli") - logsurv) <= 1)
        val bp = r.getAs[Long]("surv_bp")
        assert(bp <= prevBp, s"survival not monotone at $t")
        prevBp = bp
      } else assert(r.getAs[Long]("surv_bp") == 0L)
    }
  }

  test("freshness audit: lags recompute from raw per-type max timestamps") {
    import org.apache.spark.sql.functions.col
    val rows = operators.Sessionize.qFreshnessAudit(spark, sf).collect()
    val ms = functions.TimeFunctions.nsToMs("ts")
    val ev = Tables.events(spark, sf).select(col("event_type"), ms.as("ms"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = ev.groupBy(_._1)
    assert(rows.map(_.getAs[String]("event_type")).toSet == byType.keySet)
    val mx = ev.map(_._2).max
    rows.foreach { r =>
      val g = byType(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") == g.length.toLong)
      val last = g.map(_._2).max
      assert(r.getAs[Long]("last_ms") == last)
      assert(r.getAs[Long]("lag_minutes") == (mx - last) / 60000)
      assert(r.getAs[Boolean]("stale") == (mx - last > 3600000L))
    }
    // at least one type is the global max => lag 0, not stale
    assert(rows.exists(r => r.getAs[Long]("lag_minutes") == 0L
      && !r.getAs[Boolean]("stale")))
  }

  test("peak concurrency: sweep-line equals a naive minute-by-minute recount") {
    import org.apache.spark.sql.functions.col
    val rows = operators.Sessionize.qPeakConcurrency(spark, sf).collect()
    val ms = functions.TimeFunctions.nsToMs("ts")
    val ev = Tables.events(spark, sf).select(col("user_id"), ms.as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // naive sessions per user (30-min gap), then per-minute active recount
    val sessions = ev.groupBy(_._1).values.toSeq.flatMap { g =>
      val ts = g.map(_._2).sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = ts.head; var prev = ts.head
      ts.tail.foreach { t =>
        if (t - prev > 1800000L) { out += ((start / 60000, prev / 60000)); start = t }
        prev = t
      }
      out += ((start / 60000, prev / 60000))
      out.toSeq
    }
    val lo = sessions.map(_._1).min / 1440
    val hi = sessions.map(_._2).max / 1440
    val naive = (lo to hi).map { day =>
      val minutes = (day * 1440) until ((day + 1) * 1440)
      val counts = minutes.map(m => (m, sessions.count(s => s._1 <= m && m <= s._2)))
      val peak = counts.map(_._2).max
      (day, peak.toLong, counts.find(_._2 == peak).get._1 % 1440)
    }.filter(_._2 > 0)
    assert(rows.length == naive.length)
    rows.zip(naive).foreach { case (r, (day, peak, atMin)) =>
      assert(r.getAs[Long]("day") == day)
      assert(r.getAs[Long]("peak_active") == peak, s"peak for day $day")
      assert(r.getAs[Long]("at_minute_of_day") == atMin, s"argmin for day $day")
    }
  }
}
