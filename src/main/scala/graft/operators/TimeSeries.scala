package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics over the event stream: trend estimation,
  * autocorrelation, sequential changepoint detection, and distribution
  * drift — the metric-monitoring layer every production pipeline runs on
  * top of its windowed aggregates (reference: the progress-tracking series
  * in scripts/analysis/progress_report.py, generalized to the standard
  * monitoring toolkit).
  *
  * All four operators share one scale shape: ONE hash-aggregate collapses
  * event-grain data to a (grain × event_type) series — after that every
  * regression/window/drift step runs on calendar-bounded metadata (720
  * hours × 5 types), so 100 TB of events costs exactly the one aggregate
  * scan. The series is ZERO-FILLED on a generated calendar spine (same
  * pattern as q_gap_fill): lag/prefix arithmetic is wall-clock-correct, and
  * the spine scales with the calendar, never the data.
  */
object TimeSeries {

  private val hourMs = 3600000L

  /** Zero-filled (t, event_type, y) hourly count series: one aggregate of
    * events, then a generated global [min..max] hour spine × the observed
    * type set, left-join + zero-fill. `t` is the epoch-hour index. */
  private def hourlySeries(s: SparkSession, d: String): DataFrame = {
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val hourly = Tables.events(s, d)
      .groupBy(((ms - pmod(ms, lit(hourMs))) / hourMs).cast("long").as("t"),
        col("event_type"))
      .agg(count(lit(1)).as("y"))
      .cache()
    val spine = hourly.agg(min("t").as("lo"), max("t").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("t"))
      .crossJoin(hourly.select("event_type").distinct())
    spine.join(hourly, Seq("t", "event_type"), "left")
      .select(col("t"), col("event_type"), coalesce(col("y"), lit(0L)).as("y"))
  }

  /** Shared oracle prefix: the identical hourly series in DuckDB SQL. */
  private val hourlySeriesSql =
    """WITH cnt AS (
      |  SELECT epoch_ms(ts) // 3600000 AS t, event_type,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2
      |), spine AS (
      |  SELECT unnest(generate_series((SELECT min(t) FROM cnt),
      |                                (SELECT max(t) FROM cnt))) AS t
      |), series AS (
      |  SELECT g.t, g.event_type, CAST(coalesce(c.y, 0) AS BIGINT) AS y
      |  FROM (SELECT s.t, e.event_type FROM spine s
      |        CROSS JOIN (SELECT DISTINCT event_type FROM cnt) e) g
      |  LEFT JOIN cnt c ON g.t = c.t AND g.event_type = c.event_type
      |)""".stripMargin

  // ---------------------------------------------------------------------
  // q_trend_fit — per-series ORDINARY LEAST SQUARES trend (slope/intercept
  // in events-per-day micro-units) over the zero-filled DAILY count series,
  // plus the mean absolute residual as the fit-quality number. The
  // capacity-planning / drift-direction primitive.
  //
  // Exactness: closed-form OLS on integer sums — slope = (nΣxy − ΣxΣy) /
  // (nΣx² − (Σx)²) with x = day − min_day (centering keeps every product
  // far inside BIGINT), evaluated as one truncating `div` in micro-units;
  // intercept and MAE derive from it with the same integer arithmetic.
  // Truncation toward zero is identical in Spark `div` and DuckDB `//`
  // (both C-style, verified on negatives).
  //
  // Scale shape: one events aggregate → (days × types) rows; the five OLS
  // sums are a second tiny aggregate; the residual pass re-joins the
  // 1-row-per-type parameters back by broadcast. Nothing after the first
  // aggregate touches event-grain data.
  // ---------------------------------------------------------------------
  def qTrendFit(s: SparkSession, d: String): DataFrame = {
    val dayMs = 86400000L
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val daily = Tables.events(s, d)
      .groupBy(((ms - pmod(ms, lit(dayMs))) / dayMs).cast("long").as("t"),
        col("event_type"))
      .agg(count(lit(1)).as("y"))
      .cache()
    val spine = daily.agg(min("t").as("lo"), max("t").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("t"),
        col("lo"))
      .crossJoin(daily.select("event_type").distinct())
    val series = spine.join(daily, Seq("t", "event_type"), "left")
      .select(col("event_type"), (col("t") - col("lo")).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
      .cache()
    val fit = series.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n").as("n_days"),
        expr("(1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)")
          .as("slope_micro"),
        col("n"), col("sx"), col("sy"))
      .withColumn("intercept_micro",
        expr("(1000000 * sy - slope_micro * sx) div n"))
      .drop("n", "sx", "sy")
    series.join(broadcast(fit), "event_type")
      .groupBy(col("event_type"), col("n_days"), col("slope_micro"),
        col("intercept_micro"))
      .agg(expr(
        "sum(abs(1000000 * y - (slope_micro * x + intercept_micro))) div count(1)")
        .as("mae_micro"))
      .orderBy("event_type")
  }

  private val qTrendFitSql =
    """WITH cnt AS (
      |  SELECT epoch_ms(ts) // 86400000 AS t, event_type,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2
      |), spine AS (
      |  SELECT unnest(generate_series((SELECT min(t) FROM cnt),
      |                                (SELECT max(t) FROM cnt))) AS t
      |), series AS (
      |  SELECT g.event_type, g.t - (SELECT min(t) FROM cnt) AS x,
      |    CAST(coalesce(c.y, 0) AS BIGINT) AS y
      |  FROM (SELECT s.t, e.event_type FROM spine s
      |        CROSS JOIN (SELECT DISTINCT event_type FROM cnt) e) g
      |  LEFT JOIN cnt c ON g.t = c.t AND g.event_type = c.event_type
      |), sums AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM series GROUP BY event_type
      |), fit AS (
      |  SELECT event_type, n AS n_days, sx, sy, n,
      |    CAST((1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
      |      AS BIGINT) AS slope_micro
      |  FROM sums
      |), fit2 AS (
      |  SELECT event_type, n_days, slope_micro,
      |    CAST((1000000 * sy - slope_micro * sx) // n AS BIGINT)
      |      AS intercept_micro
      |  FROM fit
      |)
      |SELECT f.event_type, f.n_days, f.slope_micro, f.intercept_micro,
      |  CAST(sum(abs(1000000 * s.y - (f.slope_micro * s.x + f.intercept_micro)))
      |    // count(*) AS BIGINT) AS mae_micro
      |FROM series s JOIN fit2 f ON s.event_type = f.event_type
      |GROUP BY 1, 2, 3, 4
      |ORDER BY f.event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q_autocorr — sample AUTOCORRELATION at lags 1..3 of the zero-filled
  // hourly series, in basis points. The seasonality/burstiness detector:
  // acf(24) high = daily cycle, acf(1) high = bursty arrivals. Standard
  // ACF (full-series mean, full-series variance denominator).
  //
  // Exactness: the centered products are expanded so everything is integer
  // — with S = Σy, A_k = Σ_{t≤n−k} y_t, B_k = Σ_{t>k} y_t, P_k = Σ y_t·y_{t+k}:
  //   acf_k = N_k / D,  N_k = n²P_k − nS(A_k+B_k) + (n−k)S²,
  //                     D   = n²Σy² − nS²
  // and acf_bp = (10000·N_k) div D. All BIGINT through sf1 (documented
  // headroom: 10⁴·n²·Σy² needs < 2⁶³ ⇒ fine to ~10⁸ events/month; beyond
  // that, aggregate at day grain or lift to DECIMAL(38,0)).
  //
  // Scale shape: lead() windows over the (hours × types) series — bounded
  // metadata after the single event-grain aggregate.
  // ---------------------------------------------------------------------
  def qAutocorr(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("t")
    val led = hourlySeries(s, d)
      .withColumn("y1", lead("y", 1).over(w))
      .withColumn("y2", lead("y", 2).over(w))
      .withColumn("y3", lead("y", 3).over(w))
    val sums = led.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("y").as("s"),
        sum(col("y") * col("y")).as("q"),
        sum(col("y") * col("y1")).as("p1"),
        sum(col("y") * col("y2")).as("p2"),
        sum(col("y") * col("y3")).as("p3"),
        sum(when(col("y1").isNotNull, col("y"))).as("a1"),
        sum(when(col("y2").isNotNull, col("y"))).as("a2"),
        sum(when(col("y3").isNotNull, col("y"))).as("a3"),
        sum("y1").as("b1"), sum("y2").as("b2"), sum("y3").as("b3"))
    val lagged = (1 to 3).map { k =>
      sums.select(col("event_type"), lit(k.toLong).as("lag"),
        col("n").as("n_hours"),
        expr(s"""(10000 * (n * n * p$k - n * s * (a$k + b$k) + (n - $k) * s * s))
                 div (n * n * q - n * s * s)""").as("acf_bp"))
    }
    lagged.reduce(_ unionAll _).orderBy("event_type", "lag")
  }

  private val qAutocorrSql =
    hourlySeriesSql +
      """, led AS (
      |  SELECT event_type, y,
      |    lead(y, 1) OVER (PARTITION BY event_type ORDER BY t) AS y1,
      |    lead(y, 2) OVER (PARTITION BY event_type ORDER BY t) AS y2,
      |    lead(y, 3) OVER (PARTITION BY event_type ORDER BY t) AS y3
      |  FROM series
      |), sums AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS q,
      |    CAST(sum(y * y1) AS BIGINT) AS p1,
      |    CAST(sum(y * y2) AS BIGINT) AS p2,
      |    CAST(sum(y * y3) AS BIGINT) AS p3,
      |    CAST(sum(y) FILTER (WHERE y1 IS NOT NULL) AS BIGINT) AS a1,
      |    CAST(sum(y) FILTER (WHERE y2 IS NOT NULL) AS BIGINT) AS a2,
      |    CAST(sum(y) FILTER (WHERE y3 IS NOT NULL) AS BIGINT) AS a3,
      |    CAST(sum(y1) AS BIGINT) AS b1, CAST(sum(y2) AS BIGINT) AS b2,
      |    CAST(sum(y3) AS BIGINT) AS b3
      |  FROM led GROUP BY event_type
      |), lags AS (
      |  SELECT event_type, CAST(k AS BIGINT) AS lag, n AS n_hours,
      |    CAST((10000 * (n * n * (CASE k WHEN 1 THEN p1 WHEN 2 THEN p2 ELSE p3 END)
      |          - n * s * ((CASE k WHEN 1 THEN a1 WHEN 2 THEN a2 ELSE a3 END)
      |                   + (CASE k WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END))
      |          + (n - k) * s * s))
      |      // (n * n * q - n * s * s) AS BIGINT) AS acf_bp
      |  FROM sums CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)
      |)
      |SELECT event_type, lag, n_hours, acf_bp
      |FROM lags ORDER BY event_type, lag""".stripMargin

  // ---------------------------------------------------------------------
  // q_cusum_changepoint — one-sided CUSUM level-shift detection over the
  // hourly series: C_t = max(0, C_{t−1} + (y_t − μ)), alarm when C_t
  // exceeds 5× the series' mean absolute deviation. The sequential
  // changepoint detector (Page 1954) behind rate-spike alerting.
  //
  // The recursion is NOT directly expressible as a window aggregate — but
  // the classic identity C_t = S_t − min(0, min_{τ≤t} S_τ) over the prefix
  // sums S_t of (y_t − μ) linearizes it into two stacked window passes,
  // keeping the whole computation declarative (no UDAF, no driver loop).
  //
  // Exactness: μ and the MAD threshold are truncating-div micro-units;
  // prefix sums are BIGINT micro-units; the alarm flag is an integer
  // comparison. Deterministic under the spine's unique (type, t) ordering.
  //
  // Scale shape: the two window passes run on the (hours × types) series.
  // ---------------------------------------------------------------------
  def qCusumChangepoint(s: SparkSession, d: String): DataFrame = {
    val series = hourlySeries(s, d).cache()
    val mu = series.groupBy("event_type")
      .agg(expr("(1000000 * sum(y)) div count(1)").as("mu_micro"))
    val withMu = series.join(broadcast(mu), "event_type")
      .withColumn("x", col("y") * lit(1000000L) - col("mu_micro"))
    val mad = withMu.groupBy("event_type")
      .agg(expr("sum(abs(x)) div count(1)").as("mad_micro"))
    val w = Window.partitionBy("event_type").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withMu
      .withColumn("ps", sum("x").over(w))
      .withColumn("runmin", least(lit(0L), min(col("ps")).over(w)))
      .withColumn("cusum_micro", col("ps") - col("runmin"))
      .join(broadcast(mad), "event_type")
      .select(col("event_type"), col("t"), col("y"), col("cusum_micro"),
        (col("cusum_micro") > col("mad_micro") * 5).cast("long").as("alarm"))
      .orderBy("event_type", "t")
  }

  private val qCusumChangepointSql =
    hourlySeriesSql +
      """, mu AS (
      |  SELECT event_type,
      |    CAST((1000000 * sum(y)) // count(*) AS BIGINT) AS mu_micro
      |  FROM series GROUP BY event_type
      |), x AS (
      |  SELECT s.event_type, s.t, s.y,
      |    s.y * 1000000 - m.mu_micro AS x
      |  FROM series s JOIN mu m ON s.event_type = m.event_type
      |), mad AS (
      |  SELECT event_type, CAST(sum(abs(x)) // count(*) AS BIGINT) AS mad_micro
      |  FROM x GROUP BY event_type
      |), pre AS (
      |  SELECT event_type, t, y,
      |    CAST(sum(x) OVER (PARTITION BY event_type ORDER BY t
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ps
      |  FROM x
      |), cus AS (
      |  SELECT event_type, t, y, ps,
      |    least(CAST(0 AS BIGINT), CAST(min(ps) OVER (PARTITION BY event_type
      |      ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)) AS runmin
      |  FROM pre
      |)
      |SELECT c.event_type, c.t, c.y, c.ps - c.runmin AS cusum_micro,
      |  CAST(c.ps - c.runmin > m.mad_micro * 5 AS BIGINT) AS alarm
      |FROM cus c JOIN mad m ON c.event_type = m.event_type
      |ORDER BY c.event_type, c.t""".stripMargin

  // ---------------------------------------------------------------------
  // q_psi_drift — POPULATION STABILITY INDEX between the first and second
  // half of the time range, per event-type bucket: the standard
  // train/serve distribution-drift monitor (PSI = Σ (p−q)·ln(p/q); > 0.2
  // conventionally "significant shift"). Laplace +1 smoothing dodges
  // empty buckets.
  //
  // Determinism: shares are exact integers (basis points via truncating
  // div); each bucket's PSI contribution is ONE double expression —
  // (p−q)·ln(p·T_q/(q·T_p)) — evaluated in the same operand order on both
  // engines and quantized once to micro-units (the text_bm25 / text_pmi
  // precedent: a 1-ulp libm divergence cannot flip a micro rounding).
  //
  // Scale shape: one conditional-sum aggregate over events (the midpoint
  // is a broadcast 1-row bound), then 5 metadata rows.
  // ---------------------------------------------------------------------
  def qPsiDrift(s: SparkSession, d: String): DataFrame = {
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val ev = Tables.events(s, d).select(col("event_type"), ms.as("ms"))
    val mid = ev.agg(expr("(min(ms) + max(ms)) div 2").as("mid"))
    val counts = ev.crossJoin(broadcast(mid))
      .groupBy("event_type")
      .agg((sum(when(col("ms") < col("mid"), 1L).otherwise(0L)) + 1L).as("n_a"),
        (sum(when(col("ms") >= col("mid"), 1L).otherwise(0L)) + 1L).as("n_b"))
    val tot = counts.agg(sum("n_a").as("ta"), sum("n_b").as("tb"))
    counts.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_a"), col("n_b"),
        expr("(10000 * n_a) div ta").as("p_a_bp"),
        expr("(10000 * n_b) div tb").as("p_b_bp"),
        expr("""CAST(round(1000000 * (n_a / ta - n_b / tb) *
                ln((n_a * tb) / (n_b * ta))) AS BIGINT)""").as("psi_micro"))
      .orderBy("event_type")
  }

  private val qPsiDriftSql =
    """WITH ev AS (
      |  SELECT event_type, epoch_ms(ts) AS ms FROM events
      |), mid AS (
      |  SELECT (min(ms) + max(ms)) // 2 AS mid FROM ev
      |), counts AS (
      |  SELECT event_type,
      |    CAST(sum(CASE WHEN ms < (SELECT mid FROM mid) THEN 1 ELSE 0 END) + 1
      |      AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN ms >= (SELECT mid FROM mid) THEN 1 ELSE 0 END) + 1
      |      AS BIGINT) AS n_b
      |  FROM ev GROUP BY event_type
      |), tot AS (
      |  SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb
      |  FROM counts
      |)
      |SELECT c.event_type, c.n_a, c.n_b,
      |  (10000 * c.n_a) // t.ta AS p_a_bp,
      |  (10000 * c.n_b) // t.tb AS p_b_bp,
      |  CAST(round(1000000 * (c.n_a / t.ta - c.n_b / t.tb) *
      |    ln((c.n_a * t.tb) / (c.n_b * t.ta))) AS BIGINT) AS psi_micro
      |FROM counts c CROSS JOIN tot t
      |ORDER BY c.event_type""".stripMargin

  /** ISO-8601 calendar rollup: order revenue by (ISO year, ISO week) —
    * the week-boundary semantics both engines implement per the standard
    * (week 1 = the week containing the first Thursday; the Dec-29→Jan-3
    * days belong to the NEIGHBORING iso year, which naive
    * year(date)+weekofyear(date) silently mis-buckets). Exact integer
    * cents; one aggregate, grain = calendar weeks. */
  def qWeekAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(
        expr("extract(YEAROFWEEK FROM o_orderdate)").cast("long").as("iso_year"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_week"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("revenue_cents"))
      .orderBy("iso_year", "iso_week")

  private val qWeekAggSql =
    """SELECT CAST(isoyear(o_orderdate) AS BIGINT) AS iso_year,
      |  CAST(week(o_orderdate) AS BIGINT) AS iso_week,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS revenue_cents
      |FROM orders
      |GROUP BY 1, 2 ORDER BY iso_year, iso_week""".stripMargin

  // ---------------------------------------------------------------------
  // q_stl_decompose — CLASSICAL ADDITIVE SEASONAL-TREND DECOMPOSITION of
  // the daily revenue series with weekly period: trend = centered 7-day
  // moving average (full windows only), seasonal = mean detrended value
  // per day-of-week RE-CENTERED to sum≈0, remainder = y − trend −
  // seasonal. The decomposition every seasonality-aware monitor
  // (q_seasonal_baseline, q_anomaly_mad) implicitly assumes — here it is
  // materialized so each component can be alerted on separately
  // (Cleveland et al.'s STL, the moving-average classical form that is
  // closed-form and oracle-able; loess replaced by the centered MA).
  //
  // Exactness: everything is integer cents with truncating division
  // (Spark `div` = DuckDB `//`, both toward zero — the q_trend_fit
  // precedent); no float appears anywhere.
  //
  // Scale shape: ONE events aggregate collapses to the zero-filled daily
  // grid (calendar-sized — the q_gap_fill spine); the 7-row MA window and
  // the 7-row seasonal profile run on that bounded metadata, and the
  // profile joins back by broadcast. The unpartitioned ORDER BY day
  // window is over calendar days, never data grain.
  // ---------------------------------------------------------------------
  def qStlDecompose(s: SparkSession, d: String): DataFrame = {
    val dayMs = 86400000L
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val daily0 = Tables.events(s, d)
      .groupBy(((ms - pmod(ms, lit(dayMs))) / dayMs).cast("long").as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("y_cents"))
      .cache()
    val spine = daily0.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val daily = spine.join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("y_cents"), lit(0L)).as("y_cents"))
    val w7 = Window.orderBy("day").rowsBetween(-3, 3)
    val trended = daily
      .withColumn("trend_cents",
        when(count(lit(1)).over(w7) === 7,
          expr("sum(y_cents) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING"
            + " AND 3 FOLLOWING) div 7")))
      .withColumn("dow", pmod(col("day"), lit(7L)).cast("long"))
      .withColumn("detr", col("y_cents") - col("trend_cents"))
      .cache()
    val prof = trended.filter(col("detr").isNotNull)
      .groupBy("dow").agg(sum("detr").as("sd"), count("detr").as("cd"))
      .withColumn("s_raw", expr("sd div cd"))
    val adj = broadcast(prof.agg(
      expr("sum(s_raw) div count(1)").as("adj")))
    val seasonal = broadcast(prof.crossJoin(adj)
      .select(col("dow"), (col("s_raw") - col("adj")).as("seasonal_cents")))
    trended.join(seasonal, Seq("dow"), "left")
      .select(col("day"), col("dow"), col("y_cents"), col("trend_cents"),
        col("seasonal_cents"),
        (col("y_cents") - col("trend_cents") - col("seasonal_cents"))
          .as("remainder_cents"))
      .orderBy("day")
  }

  private val qStlDecomposeSql =
    """WITH cnt AS (
      |  SELECT epoch_ms(ts) // 86400000 AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y_cents
      |  FROM events GROUP BY 1
      |), spine AS (
      |  SELECT unnest(generate_series((SELECT min(day) FROM cnt),
      |                                (SELECT max(day) FROM cnt))) AS day
      |), daily AS (
      |  SELECT s.day, CAST(coalesce(c.y_cents, 0) AS BIGINT) AS y_cents
      |  FROM spine s LEFT JOIN cnt c ON s.day = c.day
      |), trended AS (
      |  SELECT day, day % 7 AS dow, y_cents,
      |    CASE WHEN count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
      |        AND 3 FOLLOWING) = 7
      |      THEN CAST(CAST(sum(y_cents) OVER (ORDER BY day ROWS BETWEEN 3
      |        PRECEDING AND 3 FOLLOWING) AS BIGINT) // 7 AS BIGINT)
      |    END AS trend_cents
      |  FROM daily
      |), detr AS (
      |  SELECT *, y_cents - trend_cents AS detr FROM trended
      |), prof AS (
      |  SELECT dow, CAST(CAST(sum(detr) AS BIGINT) // count(detr) AS BIGINT)
      |    AS s_raw
      |  FROM detr WHERE detr IS NOT NULL GROUP BY dow
      |), season AS (
      |  SELECT dow, CAST(s_raw - (SELECT CAST(sum(s_raw) AS BIGINT)
      |    // count(*) FROM prof) AS BIGINT) AS seasonal_cents
      |  FROM prof
      |)
      |SELECT t.day, CAST(t.dow AS BIGINT) AS dow, t.y_cents, t.trend_cents,
      |  se.seasonal_cents,
      |  CAST(t.y_cents - t.trend_cents - se.seasonal_cents AS BIGINT)
      |    AS remainder_cents
      |FROM trended t LEFT JOIN season se ON t.dow = se.dow
      |ORDER BY t.day""".stripMargin

  // ---------------------------------------------------------------------
  // q_seasonality_strength — STL DIAGNOSTICS (Hyndman & Athanasopoulos,
  // FPP3 §4.3): seasonal strength 1 − Var(R)/Var(S+R) and trend strength
  // 1 − Var(R)/Var(T+R) over q_stl_decompose's components — the two
  // numbers that decide whether q_seasonal_baseline-style deseasonalizing
  // (strong S) or q_trend_fit-style detrending (strong T) is worth its
  // cost for a given metric, instead of eyeballing the decomposition.
  //
  // Exactness: variances enter only as the ratio of centered second
  // moments, each computed from EXACT integer component sums
  // (n·Σx² − (Σx)²), with ONE shared double division + bp rounding per
  // strength; floor at 0 per the textbook definition (a ratio > 1 means
  // the component removed nothing). Composes the cached STL grid — the
  // whole query re-costs one events aggregate + calendar-grid math.
  // ---------------------------------------------------------------------
  def qSeasonalityStrength(s: SparkSession, d: String): DataFrame = {
    qStlDecompose(s, d)
      .filter(col("trend_cents").isNotNull)
      .select(
        (col("seasonal_cents") + col("remainder_cents")).as("sr"),
        (col("trend_cents") + col("remainder_cents")).as("tr"),
        col("remainder_cents").as("r"))
      .agg(count(lit(1)).as("n_days"),
        sum("sr").as("s1"), sum(expr("sr * sr")).as("s2"),
        sum("tr").as("t1"), sum(expr("tr * tr")).as("t2"),
        sum("r").as("r1"), sum(expr("r * r")).as("r2"))
      .select(col("n_days"),
        expr("""greatest(0L, CAST(round(10000 * (1 -
                (CAST(n_days AS DOUBLE) * r2 - CAST(r1 AS DOUBLE) * r1)
                / (CAST(n_days AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)))
                AS BIGINT))""").as("seasonal_strength_bp"),
        expr("""greatest(0L, CAST(round(10000 * (1 -
                (CAST(n_days AS DOUBLE) * r2 - CAST(r1 AS DOUBLE) * r1)
                / (CAST(n_days AS DOUBLE) * t2 - CAST(t1 AS DOUBLE) * t1)))
                AS BIGINT))""").as("trend_strength_bp"))
  }

  private val qSeasonalityStrengthSql =
    s"""WITH stl AS (
       |${qStlDecomposeSql.linesIterator.map("  " + _).mkString("\n")}
       |), comp AS (
       |  SELECT seasonal_cents + remainder_cents AS sr,
       |    trend_cents + remainder_cents AS tr,
       |    remainder_cents AS r
       |  FROM stl WHERE trend_cents IS NOT NULL
       |), mom AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_days,
       |    CAST(sum(sr) AS BIGINT) AS s1, CAST(sum(sr * sr) AS BIGINT) AS s2,
       |    CAST(sum(tr) AS BIGINT) AS t1, CAST(sum(tr * tr) AS BIGINT) AS t2,
       |    CAST(sum(r) AS BIGINT) AS r1, CAST(sum(r * r) AS BIGINT) AS r2
       |  FROM comp
       |)
       |SELECT n_days,
       |  greatest(0, CAST(round(10000 * (1 -
       |    (CAST(n_days AS DOUBLE) * r2 - CAST(r1 AS DOUBLE) * r1)
       |    / (CAST(n_days AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)))
       |    AS BIGINT)) AS seasonal_strength_bp,
       |  greatest(0, CAST(round(10000 * (1 -
       |    (CAST(n_days AS DOUBLE) * r2 - CAST(r1 AS DOUBLE) * r1)
       |    / (CAST(n_days AS DOUBLE) * t2 - CAST(t1 AS DOUBLE) * t1)))
       |    AS BIGINT)) AS trend_strength_bp
       |FROM mom""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_week_agg", qWeekAgg, Some(qWeekAggSql)),
    Q("q_stl_decompose", qStlDecompose, Some(qStlDecomposeSql)),
    Q("q_seasonality_strength", qSeasonalityStrength,
      Some(qSeasonalityStrengthSql)),
    Q("q_trend_fit", qTrendFit, Some(qTrendFitSql)),
    Q("q_autocorr", qAutocorr, Some(qAutocorrSql)),
    Q("q_cusum_changepoint", qCusumChangepoint, Some(qCusumChangepointSql)),
    Q("q_psi_drift", qPsiDrift, Some(qPsiDriftSql)))
}
