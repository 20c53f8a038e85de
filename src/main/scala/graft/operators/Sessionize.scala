package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log operators over the `events` table: gap-based sessionization,
  * tumbling-window aggregation, and JSON property extraction — the log-style
  * capabilities the reference's progress/cache tracking
  * (scripts/legislation/utils.py:14-60 ProgressTracker) implies, generalized
  * to the shapes a web-scale event pipeline needs.
  *
  * Scale: sessionize is ONE shuffle on user_id, then two window passes and a
  * partial aggregate, all within the same partitioning — Catalyst reuses the
  * exchange. Timestamps are compared/emitted as epoch-milliseconds BIGINTs via
  * TimeFunctions.nsToMs, whose floor semantics match DuckDB's epoch_ms for
  * ALL inputs (a plain integer div truncates and diverges pre-1970).
  */
object Sessionize {

  private val gapMs = 30L * 60 * 1000

  /** Gap-based sessionization (30-min inactivity) + per-session aggregates. */
  def eventsSessionize(s: SparkSession, d: String): DataFrame = {
    // order by the derived epoch-ms (not raw ts) so Spark (µs) and DuckDB
    // (ns) sort identically; event_id breaks same-millisecond ties
    val order = Window.partitionBy("user_id").orderBy(col("ms").asc, col("event_id").asc)
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("ms", graft.functions.TimeFunctions.nsToMs("ts"))
      .withColumn("prev_ms", lag(col("ms"), 1).over(order))
      .withColumn("is_new",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(run))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"),
        min("ms").as("start_ms"),
        max("ms").as("end_ms"))
      .orderBy("user_id", "session_id")
  }

  private val eventsSessionizeSql =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, value, epoch_ms(ts) AS ms,
       |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
       |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > $gapMs
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
       |), sess AS (
       |  SELECT user_id, value, ms,
       |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
       |                      ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM flagged
       |)
       |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       |  count(*) AS n_events, round(sum(value), 2) AS total_value,
       |  min(ms) AS start_ms, max(ms) AS end_ms
       |FROM sess GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  /** Tumbling one-hour window aggregation per event type. */
  def eventsTumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(
        {
          val ms = graft.functions.TimeFunctions.nsToMs("ts")
          (ms - pmod(ms, lit(3600000L))).as("hour_ms")
        },
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum("value"), 2).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("hour_ms", "event_type")

  private val eventsTumblingSql =
    """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
      |  count(*) AS n, round(sum(value), 2) AS total_value,
      |  count(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour_ms, event_type""".stripMargin

  /** Incremental VIEW MAINTENANCE of an aggregate: a per-type (count, cents,
    * min, max) snapshot over history is staged ONCE (one-time cost, like the
    * bucketed/Z-order layouts), and the query merges it with an aggregate of
    * only the DELTA slice (ts ≥ cut, pushed to the parquet scan) — the
    * mergeable-aggregate algebra (partial states combine by sum/min/max)
    * that lets a 100 TB daily pipeline pay for one day, not the whole
    * history. Only decomposable aggregates participate (a count-distinct
    * would need a sketch — q_kmv_distinct is that operator). Oracle = the
    * full-table aggregate: snapshot + delta must be indistinguishable from
    * recomputation.
    *
    * The snapshot is staged through Staging.ensureTable — latched and
    * cataloged like every other staged relation, so the session-start
    * orphan sweep can never mistake it for dead-JVM litter (a private
    * parquet dir + local memo here was exactly the r11 regression: the
    * sweep deleted the live dir and the stale memo kept reading it). */
  private val incrCutNs = 1705968000000L * 1000000L // 2024-01-23T00:00Z, mid-range at every SF

  private def incrPartial(df: DataFrame): DataFrame = df
    .select(col("event_type"), col("ts"),
      round(col("value") * 100).cast("long").as("cents"))
    .groupBy("event_type")
    .agg(count(lit(1)).as("n"), sum("cents").as("val_cents"),
      min("cents").as("min_cents"), max("cents").as("max_cents"))

  /** The staged pre-cut aggregate snapshot (metadata-sized: one row per
    * event_type, small buckets) — split out so Bench's pre-stage registry
    * (graft.Layouts) can derive the layout directly. */
  private[graft] def stagedAggSnapshot(s: SparkSession, d: String): String =
    graft.sources.Staging.ensureTable(s, "events_aggsnap",
      d, "events.parquet", "event_type", 4, Some("event_type"))(
      incrPartial(Tables.events(s, d).filter(col("ts") < incrCutNs)))._1

  def qIncrAgg(s: SparkSession, d: String): DataFrame = {
    val cutNs = incrCutNs
    val partial = (df: DataFrame) => incrPartial(df)
    val snap = stagedAggSnapshot(s, d)
    s.table(snap)
      .unionByName(partial(Tables.events(s, d).filter(col("ts") >= cutNs)))
      .groupBy("event_type")
      .agg(sum("n").as("n"), sum("val_cents").as("val_cents"),
        min("min_cents").as("min_cents"), max("max_cents").as("max_cents"))
      .orderBy("event_type")
  }

  private val qIncrAggSql =
    """WITH e AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(cents) AS BIGINT) AS val_cents,
      |  min(cents) AS min_cents, max(cents) AS max_cents
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Hopping (sliding) window aggregation: 1 h windows every 30 min, so each
    * event lands in exactly window/slide = 2 overlapping windows — the
    * smoothing shape behind moving KPIs and rate alerting. Spark's `window`
    * with a slide handles the replication declaratively (a codegen'd
    * explode, no self-join); values in exact integer cents so overlap
    * accumulation is order-independent cross-engine. */
  def eventsHopping(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("ets",
        timestamp_millis(graft.functions.TimeFunctions.nsToMs("ts")))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy(window(col("ets"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("cents").as("val_cents"))
      .select(unix_millis(col("window.start")).as("win_ms"),
        col("event_type"), col("n"), col("val_cents"))
      .orderBy("win_ms", "event_type")

  /** Each event belongs to the windows starting at its 30-min slot and the
    * slot before — the same replicate-by-offset identity Spark's slide
    * implements. */
  private val eventsHoppingSql =
    """WITH e AS (
      |  SELECT epoch_ms(ts) AS ms, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), rep AS (
      |  SELECT (ms // 1800000) * 1800000 - k.off AS win_ms, event_type, cents
      |  FROM e CROSS JOIN (VALUES (0), (1800000)) AS k(off)
      |)
      |SELECT win_ms, event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(cents) AS BIGINT) AS val_cents
      |FROM rep GROUP BY win_ms, event_type
      |ORDER BY win_ms, event_type""".stripMargin

  /** Cumulative distinct users per day (the growth curve): a windowed
    * COUNT(DISTINCT) is unbounded state, so it's rewritten as first-touch
    * cohorts — each user counts once on their first-activity day, and the
    * running Σ of cohort sizes IS the cumulative distinct count. One
    * user-grain aggregate + a days-sized window; the rewrite is the
    * standard trick that makes "uniques to date" linear at 100 TB. */
  def eventsCumulativeUsers(s: SparkSession, d: String): DataFrame = {
    val dayMs = 86400000L
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val firstDay = Tables.events(s, d)
      .groupBy("user_id")
      .agg(min(((ms - pmod(ms, lit(dayMs))) / dayMs).cast("long")).as("day"))
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    firstDay.groupBy("day").agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum("new_users").over(w))
      .orderBy("day")
  }

  private val eventsCumulativeUsersSql =
    """WITH fd AS (
      |  SELECT user_id, min(epoch_ms(ts) // 86400000) AS day
      |  FROM events GROUP BY user_id
      |), coh AS (
      |  SELECT day, count(*) AS new_users FROM fd GROUP BY day
      |)
      |SELECT day, new_users,
      |  CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |    AS cum_users
      |FROM coh ORDER BY day""".stripMargin

  /** Calendar-spine GAP FILLING: daily per-type activity re-gridded onto a
    * complete day spine (min..max day GENERATED with sequence+explode — a
    * dimension the data doesn't contain), missing days zero-filled via LEFT
    * JOIN + coalesce. The time-series-regularization step every downstream
    * window/forecast needs (a rows-frame over raw days silently skips
    * gaps). The spine is days × types — tiny even at 100 TB (it scales
    * with the calendar, not the data), so the join broadcasts the grain
    * aggregate side or the spine, never re-shuffles the fact table. */
  def eventsGapFill(s: SparkSession, d: String): DataFrame = {
    val dayMs = 86400000L
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val daily = Tables.events(s, d)
      .groupBy(((ms - pmod(ms, lit(dayMs))) / dayMs).cast("long").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .cache() // consumed by the spine bounds AND the fill join
    val types = daily.select("event_type").distinct()
    val spine = daily.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      .crossJoin(types)
    spine.join(daily, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("day", "event_type")
  }

  private val eventsGapFillSql =
    """WITH daily AS (
      |  SELECT epoch_ms(ts) // 86400000 AS day, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2
      |), spine AS (
      |  SELECT unnest(generate_series((SELECT min(day) FROM daily),
      |                                (SELECT max(day) FROM daily))) AS day
      |), grid AS (
      |  SELECT s.day, t.event_type
      |  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM daily) t
      |)
      |SELECT g.day, g.event_type, CAST(coalesce(d.n, 0) AS BIGINT) AS n
      |FROM grid g LEFT JOIN daily d ON g.day = d.day AND g.event_type = d.event_type
      |ORDER BY g.day, g.event_type""".stripMargin

  /** Trailing moving average + spike screen over the hourly event series:
    * per type, each hour's count against the mean of the last 3 OBSERVED
    * hours (rows-frame semantics — deterministic under gaps), spike when
    * count > 2× that mean, tested by exact integer cross-multiplication
    * (count·3 > 2·trailing_sum) so there is no float boundary. The
    * time-series smoothing/alerting shape on top of the tumbling windows;
    * one tiny (hours × types) window after the grain aggregate. */
  def eventsMovingAvg(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(
        {
          val ms = graft.functions.TimeFunctions.nsToMs("ts")
          (ms - pmod(ms, lit(3600000L))).as("hour_ms")
        },
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("hour_ms").rowsBetween(-2, 0)
    hourly
      .withColumn("trail_n", count(lit(1)).over(w))
      .withColumn("trail_sum", sum("n").over(w))
      .withColumn("is_spike",
        col("trail_n") === 3 && col("n") * 3 > col("trail_sum") * 2)
      .select("hour_ms", "event_type", "n", "trail_sum", "is_spike")
      .orderBy("hour_ms", "event_type")
  }

  private val eventsMovingAvgSql =
    """WITH hourly AS (
      |  SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT hour_ms, event_type, n,
      |  CAST(sum(n) OVER w AS BIGINT) AS trail_sum,
      |  (count(*) OVER w = 3 AND n * 3 > sum(n) OVER w * 2) AS is_spike
      |FROM hourly
      |WINDOW w AS (PARTITION BY event_type ORDER BY hour_ms
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY hour_ms, event_type""".stripMargin

  /** JSON property extraction (regex-based so it stays codegen'd; at scale
    * prefer from_json with an explicit schema for nested payloads). */
  def eventsJsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("k").cast("double")), 4).as("avg_k"),
        max("k").as("max_k"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_missing"))
      .orderBy("event_type")

  private val eventsJsonExtractSql =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS BIGINT) AS k
      |  FROM events
      |)
      |SELECT event_type, count(*) AS n,
      |  round(avg(k * 1.0), 4) AS avg_k, max(k) AS max_k,
      |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  /** SCD Type-2 dimension versioning from a change feed: each user's event
    * stream becomes a version history with [valid_from, valid_to) intervals
    * (lead() closes each version; NULL = current), then a POINT-IN-TIME
    * lookup resolves the version in force at a fixed probe instant — the
    * slowly-changing-dimension pattern every warehouse needs for
    * time-travel joins against mutable dimensions (the reference's
    * status-history updates imply exactly this).
    *
    * Intervals per user partition the timeline (zero-length tie intervals
    * can never match from ≤ T < to), so the probe resolves to AT MOST one
    * version — users whose history starts after the probe get the explicit
    * (0, 'none', −1) sentinel instead of nulls. One user_id shuffle serves
    * the window, the version count, and the lookup. */
  def qScd2Lookup(s: SparkSession, d: String): DataFrame = {
    val probe = 1705363200000L // 2024-01-16T00:00Z, mid-range at every SF
    val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), graft.functions.TimeFunctions.nsToMs("ts").as("ms"))
    val w = Window.partitionBy("user_id").orderBy(col("ms").asc, col("event_id").asc)
    // cached: the version window (user_id shuffle + sort) feeds both the
    // version count and the point-in-time lookup
    val hist = ev.select(col("user_id"), col("event_type"), col("ms"),
      row_number().over(w).cast("long").as("version"),
      lead("ms", 1).over(w).as("valid_to"))
      .cache()
    val nv = hist.groupBy("user_id").agg(max("version").as("n_versions"))
    val at = hist
      .filter(col("ms") <= probe &&
        (col("valid_to").isNull || col("valid_to") > probe))
      .select(col("user_id"), col("version").as("ver_at_probe"),
        col("event_type").as("attr_at_probe"), col("ms").as("valid_from_ms"))
    nv.join(at, Seq("user_id"), "left")
      .select(col("user_id"), col("n_versions"),
        coalesce(col("ver_at_probe"), lit(0L)).as("ver_at_probe"),
        coalesce(col("attr_at_probe"), lit("none")).as("attr_at_probe"),
        coalesce(col("valid_from_ms"), lit(-1L)).as("valid_from_ms"))
      .orderBy("user_id")
  }

  private val qScd2LookupSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events
      |), hist AS (
      |  SELECT user_id, event_type, ms,
      |    CAST(row_number() OVER w AS BIGINT) AS version,
      |    lead(ms) OVER w AS valid_to
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
      |), nv AS (
      |  SELECT user_id, max(version) AS n_versions FROM hist GROUP BY user_id
      |), at AS (
      |  SELECT user_id, version AS ver_at_probe, event_type AS attr_at_probe,
      |    ms AS valid_from_ms
      |  FROM hist
      |  WHERE ms <= 1705363200000
      |    AND (valid_to IS NULL OR valid_to > 1705363200000)
      |)
      |SELECT nv.user_id, n_versions,
      |  coalesce(ver_at_probe, 0) AS ver_at_probe,
      |  coalesce(attr_at_probe, 'none') AS attr_at_probe,
      |  coalesce(valid_from_ms, -1) AS valid_from_ms
      |FROM nv LEFT JOIN at USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** First-order Markov transition matrix over each user's event sequence:
    * counts and basis-point probabilities for every (from_type → to_type)
    * step — the behavioral-sequence summary behind next-action prediction
    * and anomaly screens. One user_id window (reusing sessionize's exchange
    * shape) then a tiny (types × types) aggregate; probabilities as exact
    * integer div so the row-normalized matrix is cross-engine stable. */
  def qEventTransitions(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), graft.functions.TimeFunctions.nsToMs("ts").as("ms"))
    val w = Window.partitionBy("user_id").orderBy(col("ms").asc, col("event_id").asc)
    val trans = ev
      .select(col("event_type").as("from_type"),
        lead("event_type", 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    trans
      .withColumn("n_from",
        sum("n").over(Window.partitionBy("from_type")))
      .withColumn("p_bp", expr("(2 * 10000 * n + n_from) div (2 * n_from)"))
      .select("from_type", "to_type", "n", "p_bp")
      .orderBy("from_type", "to_type")
  }

  private val qEventTransitionsSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events
      |), tr AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS to_type
      |  FROM ev
      |), counts AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT from_type, to_type, n,
      |  CAST((2 * 10000 * n + sum(n) OVER (PARTITION BY from_type))
      |    // (2 * sum(n) OVER (PARTITION BY from_type)) AS BIGINT) AS p_bp
      |FROM counts
      |ORDER BY from_type, to_type""".stripMargin

  /** Ordered funnel: view → click → purchase, each stage's first occurrence
    * strictly at-or-after the previous stage's. Stage frontiers are tiny
    * per-user aggregates, so each step is a broadcast-joinable reduction —
    * no event-grain self-join. */
  def eventsFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        graft.functions.TimeFunctions.nsToMs("ts").as("ms"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ms").as("v_ms"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(views, "user_id")
      .filter(col("ms") >= col("v_ms"))
      .groupBy("user_id").agg(min("ms").as("c_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(clicks, "user_id")
      .filter(col("ms") >= col("c_ms"))
      .groupBy("user_id").agg(min("ms").as("p_ms"))
    views.agg(lit("1_view").as("stage"), count(lit(1)).as("n_users"))
      .unionByName(clicks.agg(lit("2_click_after_view").as("stage"), count(lit(1)).as("n_users")))
      .unionByName(purchases.agg(lit("3_purchase_after_click").as("stage"), count(lit(1)).as("n_users")))
      .orderBy("stage")
  }

  private val eventsFunnelSql =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events
      |), views AS (
      |  SELECT user_id, min(ms) AS v_ms FROM ev WHERE event_type = 'view' GROUP BY user_id
      |), clicks AS (
      |  SELECT e.user_id, min(ms) AS c_ms
      |  FROM ev e JOIN views USING (user_id)
      |  WHERE event_type = 'click' AND ms >= v_ms GROUP BY e.user_id
      |), purchases AS (
      |  SELECT e.user_id, min(ms) AS p_ms
      |  FROM ev e JOIN clicks USING (user_id)
      |  WHERE event_type = 'purchase' AND ms >= c_ms GROUP BY e.user_id
      |)
      |SELECT '1_view' AS stage, count(*) AS n_users FROM views
      |UNION ALL SELECT '2_click_after_view', count(*) FROM clicks
      |UNION ALL SELECT '3_purchase_after_click', count(*) FROM purchases
      |ORDER BY stage""".stripMargin

  /** Cohort retention matrix: users grouped by their first-activity day,
    * counted on each later active day — the product-analytics classic. Two
    * aggregations over the SAME distinct (user, day) relation (cohort = min
    * day per user, then count per (cohort, offset)); both shuffles key on
    * user_id/cohort so the exchange is reused. Exact integer day arithmetic
    * (floor-division via x − pmod(x, m), matching DuckDB // on all inputs). */
  def eventsRetention(s: SparkSession, d: String): DataFrame = {
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val dayMs = 86400000L
    val days = Tables.events(s, d)
      .select(col("user_id"),
        ((ms - pmod(ms, lit(dayMs))) / dayMs).cast("long").as("day"))
      .distinct()
    val cohorts = days.groupBy("user_id").agg(min("day").as("cohort_day"))
    days.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users")) // (user, day) is distinct → count = users
      .orderBy("cohort_day", "day_offset")
  }

  private val eventsRetentionSql =
    """WITH d AS (
      |  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events
      |), c AS (
      |  SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id
      |)
      |SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM d JOIN c ON d.user_id = c.user_id
      |GROUP BY c.cohort_day, d.day - c.cohort_day
      |ORDER BY cohort_day, day_offset""".stripMargin

  /** Last-touch marketing attribution: each purchase is credited to the most
    * recent preceding click/view by the same user within a 24 h lookback —
    * the standard attribution shape (and the same-table sibling of the as-of
    * join). One user_id shuffle + one window pass: `last(..., ignoreNulls)`
    * over a 1-PRECEDING frame carries the latest touch forward, so there is
    * no event-grain self-join to blow up on a hot user. The touch ms and
    * type come from the SAME carried row (both last() calls skip exactly the
    * non-touch rows), so the pair is always consistent. */
  def eventsAttribution(s: SparkSession, d: String): DataFrame = {
    val lookbackMs = 24L * 3600 * 1000
    val order = Window.partitionBy("user_id").orderBy(col("ms").asc, col("event_id").asc)
    val before = order.rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin("click", "view")
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        graft.functions.TimeFunctions.nsToMs("ts").as("ms"))
      .withColumn("touch_ms", last(when(isTouch, col("ms")), ignoreNulls = true).over(before))
      .withColumn("touch_type", last(when(isTouch, col("event_type")), ignoreNulls = true).over(before))
      .filter(col("event_type") === "purchase")
      .withColumn("channel",
        when(col("touch_ms").isNotNull && col("ms") - col("touch_ms") <= lookbackMs,
          col("touch_type")).otherwise(lit("organic")))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        round(sum("value"), 2).as("revenue"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("channel")
  }

  private val eventsAttributionSql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ms FROM events
      |), touched AS (
      |  SELECT *,
      |    last_value(CASE WHEN event_type IN ('click','view') THEN ms END IGNORE NULLS)
      |      OVER w AS touch_ms,
      |    last_value(CASE WHEN event_type IN ('click','view') THEN event_type END IGNORE NULLS)
      |      OVER w AS touch_type
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |), attributed AS (
      |  SELECT CASE WHEN touch_ms IS NOT NULL AND ms - touch_ms <= 86400000
      |              THEN touch_type ELSE 'organic' END AS channel,
      |    value, user_id
      |  FROM touched WHERE event_type = 'purchase'
      |)
      |SELECT channel, count(*) AS n_purchases, round(sum(value), 2) AS revenue,
      |  count(DISTINCT user_id) AS n_users
      |FROM attributed GROUP BY channel ORDER BY channel""".stripMargin

  // ---------------------------------------------------------------------
  // q_interval_overlap — INTERVAL × INTERVAL overlap join (session
  // concurrency): for every user session, count other users' sessions
  // live at the same time. The missing join primitive next to as-of
  // (point→latest interval) and range-binned (point→range): both sides
  // are intervals, and the naive theta join (a.s ≤ b.e AND b.s ≤ a.e) is
  // O(n²). The scale plan BINS time into gap-width buckets, explodes each
  // interval over the buckets it touches, equi-joins on the bucket, dedups
  // the multi-bucket pairs, then verifies true overlap — an overlapping
  // pair always shares the bucket of any common instant, so recall is
  // exact by construction. Bin width trades fan-out (intervals span ≤ 2-3
  // buckets at the session gap) against per-bucket n²; hot buckets split
  // under AQE skew handling.
  //
  // The DuckDB oracle IS the naive theta join (its IEJoin makes it cheap
  // at test SF) — the hash match proves the binned strategy is exactly
  // equivalent to the quadratic definition.
  // ---------------------------------------------------------------------

  def qIntervalOverlap(s: SparkSession, d: String): DataFrame = {
    val binW = gapMs // 30-min buckets: a session spans ≤ duration/gap + 1
    val order = Window.partitionBy("user_id").orderBy(col("ms").asc, col("event_id").asc)
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = Tables.events(s, d)
      .withColumn("ms", graft.functions.TimeFunctions.nsToMs("ts"))
      .withColumn("prev_ms", lag(col("ms"), 1).over(order))
      .withColumn("is_new",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(run))
      .groupBy("user_id", "session_id")
      .agg(min("ms").as("start_ms"), max("ms").as("end_ms"))
      .cache()
    val binned = sess.select(col("user_id"), col("session_id"),
      col("start_ms"), col("end_ms"),
      explode(expr(s"sequence(start_ms div $binW, end_ms div $binW)")).as("bin"))
    val pairs = binned.alias("a").join(binned.alias("b"),
        col("a.bin") === col("b.bin") && col("a.user_id") =!= col("b.user_id"))
      .select(col("a.user_id").as("ua"), col("a.session_id").as("sa"),
        col("a.start_ms").as("astart"), col("a.end_ms").as("aend"),
        col("b.user_id").as("ub"), col("b.session_id").as("sb"),
        col("b.start_ms").as("bstart"), col("b.end_ms").as("bend"))
      .distinct() // a pair can meet in several buckets — count it once
      .filter(col("astart") <= col("bend") && col("bstart") <= col("aend"))
    val counts = pairs.groupBy(col("ua").as("user_id"), col("sa").as("session_id"))
      .agg(count(lit(1)).as("n_concurrent"))
    val w = Window.orderBy(col("n_concurrent").desc, col("user_id").asc,
      col("session_id").asc)
    counts.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 100)
      .select(col("rk"), col("user_id"),
        col("session_id").cast("long").as("session_id"), col("n_concurrent"))
      .orderBy("rk")
  }

  private val qIntervalOverlapSql =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
       |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
       |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > $gapMs
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
       |), sess AS (
       |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       |    min(ms) AS start_ms, max(ms) AS end_ms
       |  FROM (SELECT user_id, ms,
       |          sum(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
       |                            ROWS UNBOUNDED PRECEDING) AS session_id
       |        FROM flagged)
       |  GROUP BY user_id, session_id
       |), counts AS (
       |  SELECT a.user_id, a.session_id, CAST(count(*) AS BIGINT) AS n_concurrent
       |  FROM sess a JOIN sess b
       |    ON a.user_id <> b.user_id
       |   AND a.start_ms <= b.end_ms AND b.start_ms <= a.end_ms
       |  GROUP BY a.user_id, a.session_id
       |)
       |SELECT CAST(row_number() OVER (ORDER BY n_concurrent DESC, user_id,
       |    session_id) AS BIGINT) AS rk,
       |  user_id, session_id, n_concurrent
       |FROM counts
       |ORDER BY rk
       |LIMIT 100""".stripMargin

  /** q_anomaly_mad — robust TIME-SERIES ANOMALY DETECTION: per event type,
    * minute-bucket counts screened against a ±3-bucket rolling median/MAD
    * (the Hampel filter — the standard ops/monitoring outlier rule, robust
    * where a rolling mean/stddev is itself dragged by the spike it should
    * flag). Flag when |x − med| > 3·MAD.
    *
    * Exact integer arithmetic end to end via DOUBLED units (the
    * q_robust_stats trick, here over a rolling frame): med2 = 2·median of
    * the ≤7-value frame (sum of the two middle order statistics — an exact
    * BIGINT whether the frame is odd or even), deviations d_i = |2·x_i −
    * med2| = 2·|x_i − med|, m2d = 2·median(d_i) = 4·MAD, and the flag
    * |x − med| > 3·MAD cross-multiplies to 2·d > 3·m2d. No engine's
    * float quantile interpolation is ever consulted.
    *
    * Scale shape: one hash-aggregate to minute grain (the only shuffle of
    * event-grain data), then rolling windows partitioned BY EVENT TYPE over
    * minute-grain rows — bounded series per partition, codegen'd
    * sort_array/transform/aggregate HOFs, no UDFs, no self-join. At 100 TB
    * the minute grid is ~525k rows/type/year — still window-friendly;
    * partition by (type, day) with a 3-row halo if a single series ever
    * outgrows an executor. */
  def qAnomalyMad(s: SparkSession, d: String): DataFrame = {
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val perMin = Tables.events(s, d)
      .groupBy(col("event_type"),
        (ms - pmod(ms, lit(60000L))).as("minute_ms"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("minute_ms")
      .rowsBetween(-3, 3)
    // med2(sorted a) = a[(n-1)/2] + a[n/2]  (0-based; = 2·median, exact)
    def med2Of(arrCol: Column): Column = {
      val a = sort_array(arrCol)
      val n = size(a)
      element_at(a, floor((n - 1) / lit(2)).cast("int") + 1) +
        element_at(a, floor(n / lit(2)).cast("int") + 1)
    }
    perMin
      .withColumn("frame", collect_list("cnt").over(w))
      .withColumn("med2", med2Of(col("frame")))
      .withColumn("m2d", med2Of(transform(col("frame"),
        x => abs(x * 2 - col("med2")))))
      .withColumn("is_anomaly",
        (abs(col("cnt") * 2 - col("med2")) * 2) > col("m2d") * 3)
      .select(col("event_type"), col("minute_ms"), col("cnt"),
        col("med2"), col("m2d"), col("is_anomaly"))
      .orderBy("event_type", "minute_ms")
  }

  private val qAnomalyMadSql =
    """WITH permin AS (
      |  SELECT event_type,
      |    epoch_ms(ts) - epoch_ms(ts) % 60000 AS minute_ms,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events
      |  GROUP BY 1, 2
      |), framed AS (
      |  SELECT event_type, minute_ms, cnt,
      |    list_sort(list(cnt) OVER (PARTITION BY event_type ORDER BY minute_ms
      |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS f
      |  FROM permin
      |), med AS (
      |  SELECT event_type, minute_ms, cnt, f,
      |    f[(len(f) - 1) // 2 + 1] + f[len(f) // 2 + 1] AS med2
      |  FROM framed
      |), dev AS (
      |  SELECT event_type, minute_ms, cnt, med2,
      |    list_sort(list_transform(f, x -> abs(x * 2 - med2))) AS df
      |  FROM med
      |)
      |SELECT event_type, minute_ms, cnt, med2,
      |  df[(len(df) - 1) // 2 + 1] + df[len(df) // 2 + 1] AS m2d,
      |  abs(cnt * 2 - med2) * 2 > (df[(len(df) - 1) // 2 + 1] + df[len(df) // 2 + 1]) * 3 AS is_anomaly
      |FROM dev
      |ORDER BY event_type, minute_ms""".stripMargin

  /** q_seasonal_baseline — SEASONAL-PROFILE anomaly screening: per event
    * type, the minute-of-hour seasonal baseline (mean count over every
    * observed minute bucket sharing that minute-of-hour) and each minute's
    * residual against it. The de-seasonalization step every ops/metrics
    * pipeline runs before thresholding — a raw spike at an always-busy
    * minute is normal; the same count at a quiet minute is the anomaly.
    *
    * Integer exactness: baseline_micro = (1e6·Σcnt) div n_buckets;
    * resid_micro = 1e6·cnt − baseline_micro. Truncating BIGINT division on
    * both engines; no float means.
    *
    * Scale shape: one hash-aggregate to minute grain, one re-aggregate to
    * the (type × 60)-row profile — driver-scale metadata that BROADCASTS
    * back onto the minute relation (map-side join, no second shuffle of
    * the big side). At 100 TB the profile is still ≤ types×60 rows. */
  def qSeasonalBaseline(s: SparkSession, d: String): DataFrame = {
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val perMin = Tables.events(s, d)
      .groupBy(col("event_type"),
        (ms - pmod(ms, lit(60000L))).as("minute_ms"))
      .agg(count(lit(1)).as("cnt"))
    val profile = perMin
      .withColumn("moh", pmod(floor(col("minute_ms") / lit(60000L)), lit(60L)))
      .groupBy("event_type", "moh")
      .agg(expr("(1000000 * sum(cnt)) div count(1)").as("baseline_micro"))
    perMin
      .withColumn("moh", pmod(floor(col("minute_ms") / lit(60000L)), lit(60L)))
      .join(broadcast(profile), Seq("event_type", "moh"))
      .select(col("event_type"), col("minute_ms"), col("moh"), col("cnt"),
        col("baseline_micro"),
        (col("cnt") * lit(1000000L) - col("baseline_micro")).as("resid_micro"))
      .orderBy("event_type", "minute_ms")
  }

  private val qSeasonalBaselineSql =
    """WITH permin AS (
      |  SELECT event_type,
      |    epoch_ms(ts) - epoch_ms(ts) % 60000 AS minute_ms,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events
      |  GROUP BY 1, 2
      |), withmoh AS (
      |  SELECT *, (minute_ms // 60000) % 60 AS moh FROM permin
      |), profile AS (
      |  SELECT event_type, moh,
      |    CAST((1000000 * sum(cnt)) // count(*) AS BIGINT) AS baseline_micro
      |  FROM withmoh GROUP BY event_type, moh
      |)
      |SELECT w.event_type, w.minute_ms, w.moh, w.cnt, p.baseline_micro,
      |  w.cnt * 1000000 - p.baseline_micro AS resid_micro
      |FROM withmoh w JOIN profile p
      |  ON w.event_type = p.event_type AND w.moh = p.moh
      |ORDER BY w.event_type, w.minute_ms""".stripMargin

  /** q_time_decay — gap-aware EXPONENTIALLY-DECAYED rolling average
    * (half-life = 1 minute) over per-minute event counts: the trend
    * smoother behind rate limiting, trending-topics, and decayed feature
    * aggregation. Weight of a bucket k minutes back is 2^(15−k) (15 =
    * oldest minute in the 16-minute horizon), so the decay follows WALL
    * TIME — a bucket after a 5-minute gap is decayed 32×, where a ROWS
    * frame would wrongly treat it as adjacent.
    *
    * Integer exactness: weights are powers of two in BIGINT; ewma_micro =
    * (1e6·Σ cnt·w) div Σ w, where Σw is over the minutes actually present
    * (ragged starts and gaps contribute nothing). No float exponentials.
    *
    * Scale shape: the decayed sum is a RANGE-frame window partitioned by
    * event type over MINUTE-GRAIN rows (one hash-aggregate of event-grain
    * data, then bounded ≤16-element frames). The frame is a codegen'd
    * transform/aggregate HOF pair — no self-join of the minute grid, no
    * UDF. At 100 TB: partition by (type, day) with a 15-minute halo. */
  def qTimeDecay(s: SparkSession, d: String): DataFrame = {
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val perMin = Tables.events(s, d)
      .groupBy(col("event_type"),
        (ms - pmod(ms, lit(60000L))).as("minute_ms"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("minute_ms")
      .rangeBetween(-15L * 60000L, 0L)
    val decayed = perMin
      .withColumn("frame", collect_list(struct(col("minute_ms").as("m"),
        col("cnt").as("c"))).over(w))
      .withColumn("num", aggregate(
        transform(col("frame"), x =>
          x.getField("c") * call_function("shiftleft", lit(1L),
            (lit(15L) - floor((col("minute_ms") - x.getField("m")) / lit(60000L)))
              .cast("int"))),
        lit(0L), (acc, v) => acc + v))
      .withColumn("den", aggregate(
        transform(col("frame"), x =>
          call_function("shiftleft", lit(1L),
            (lit(15L) - floor((col("minute_ms") - x.getField("m")) / lit(60000L)))
              .cast("int"))),
        lit(0L), (acc, v) => acc + v))
    decayed
      .select(col("event_type"), col("minute_ms"), col("cnt"),
        expr("(1000000 * num) div den").as("ewma_micro"))
      .orderBy("event_type", "minute_ms")
  }

  private val qTimeDecaySql =
    """WITH permin AS (
      |  SELECT event_type,
      |    epoch_ms(ts) - epoch_ms(ts) % 60000 AS minute_ms,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events
      |  GROUP BY 1, 2
      |), framed AS (
      |  SELECT event_type, minute_ms, cnt,
      |    list({'m': minute_ms, 'c': cnt}) OVER (
      |      PARTITION BY event_type ORDER BY minute_ms
      |      RANGE BETWEEN 900000 PRECEDING AND CURRENT ROW) AS frame
      |  FROM permin
      |)
      |SELECT event_type, minute_ms, cnt,
      |  CAST((1000000 * list_sum(list_transform(frame,
      |      x -> x.c * (CAST(1 AS BIGINT) << CAST(15 - (minute_ms - x.m) // 60000 AS INTEGER))))) //
      |    list_sum(list_transform(frame,
      |      x -> CAST(1 AS BIGINT) << CAST(15 - (minute_ms - x.m) // 60000 AS INTEGER)))
      |    AS BIGINT) AS ewma_micro
      |FROM framed
      |ORDER BY event_type, minute_ms""".stripMargin

  /** q_cohort_ltv — the LTV TRIANGLE: per acquisition cohort (first-activity
    * day), purchase revenue by days-since-acquisition and its running
    * cumulative — the lifetime-value curve marketing reads cohort payback
    * from; the revenue sibling of q_events_retention's user counts.
    *
    * Exactness: revenue in integer cents (round once per event, sum
    * integers); the cumulative is a rows-frame window over each cohort's
    * observed offsets (sparse offsets — the curve is read at observed
    * points; a zero-revenue day adds nothing to a cumulative).
    *
    * Scale shape: first-touch cohorts from one (user, day) distinct, the
    * cohort join shuffles on user_id, then the triangle aggregate is
    * (cohort × offset) metadata; the window runs on that metadata. */
  def qCohortLtv(s: SparkSession, d: String): DataFrame = {
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val dayMs = 86400000L
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        ((ms - pmod(ms, lit(dayMs))) / dayMs).cast("long").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
    val cohorts = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    val sizes = cohorts.groupBy("cohort_day").agg(count(lit(1)).as("cohort_users"))
    val tri = ev.filter(col("event_type") === "purchase")
      .join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(sum("cents").as("rev_cents"))
    val w = Window.partitionBy("cohort_day").orderBy("day_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tri.withColumn("cum_rev_cents", sum("rev_cents").over(w))
      .join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("rev_cents"),
        col("cum_rev_cents"), col("cohort_users"),
        expr("cum_rev_cents div cohort_users").as("ltv_cents_per_user"))
      .orderBy("cohort_day", "day_offset")
  }

  private val qCohortLtvSql =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_ms(ts) // 86400000 AS day,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), cohorts AS (
      |  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id
      |), sizes AS (
      |  SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_users
      |  FROM cohorts GROUP BY cohort_day
      |), tri AS (
      |  SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
      |    CAST(sum(e.cents) AS BIGINT) AS rev_cents
      |  FROM ev e JOIN cohorts c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase'
      |  GROUP BY 1, 2
      |), cum AS (
      |  SELECT cohort_day, day_offset, rev_cents,
      |    CAST(sum(rev_cents) OVER (PARTITION BY cohort_day ORDER BY day_offset
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev_cents
      |  FROM tri
      |)
      |SELECT t.cohort_day, t.day_offset, t.rev_cents, t.cum_rev_cents,
      |  s.cohort_users, t.cum_rev_cents // s.cohort_users AS ltv_cents_per_user
      |FROM cum t JOIN sizes s ON t.cohort_day = s.cohort_day
      |ORDER BY t.cohort_day, t.day_offset""".stripMargin

  /** q_funnel_time — CONVERSION LATENCY distribution: for users whose first
    * view precedes their first purchase, the view→purchase latency, reported
    * as exact interpolated percentiles (p50/p90) plus mean — the "how long
    * does conversion take" number next to q_events_funnel's "how many
    * convert". Percentile idiom = q_percentiles' matched
    * percentile/quantile_cont pair on integer-ms latencies, rounded once.
    *
    * Scale shape: one (user × type) first-touch aggregate (user_id
    * shuffle), a self-join per user bounded by the two types involved,
    * then ONE global aggregate over user-grain latencies. */
  def qFunnelTime(s: SparkSession, d: String): DataFrame = {
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val ft = Tables.events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(ms).as("fms"))
    val lat = ft.filter(col("event_type") === "view")
      .select(col("user_id"), col("fms").as("vms"))
      .join(ft.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("fms").as("pms")), "user_id")
      .filter(col("vms") < col("pms"))
      .select((col("pms") - col("vms")).as("lat_ms"))
    lat.agg(count(lit(1)).as("n_converted"),
        expr("sum(lat_ms) div count(1)").as("mean_ms"),
        round(expr("percentile(lat_ms, 0.5)"), 2).as("p50_ms"),
        round(expr("percentile(lat_ms, 0.9)"), 2).as("p90_ms"))
  }

  private val qFunnelTimeSql =
    """WITH ft AS (
      |  SELECT user_id, event_type, min(epoch_ms(ts)) AS fms
      |  FROM events WHERE event_type IN ('view', 'purchase')
      |  GROUP BY 1, 2
      |), lat AS (
      |  SELECT p.fms - v.fms AS lat_ms
      |  FROM (SELECT user_id, fms FROM ft WHERE event_type = 'view') v
      |  JOIN (SELECT user_id, fms FROM ft WHERE event_type = 'purchase') p
      |    ON v.user_id = p.user_id
      |  WHERE v.fms < p.fms
      |)
      |SELECT CAST(count(*) AS BIGINT) AS n_converted,
      |  CAST(sum(lat_ms) // count(*) AS BIGINT) AS mean_ms,
      |  round(CAST(quantile_cont(lat_ms, 0.5) AS DOUBLE), 2) AS p50_ms,
      |  round(CAST(quantile_cont(lat_ms, 0.9) AS DOUBLE), 2) AS p90_ms
      |FROM lat""".stripMargin

  /** Rolling 7-day active users (WAU) per day, with DAU and the DAU/WAU
    * stickiness ratio in basis points. A COUNT(DISTINCT) over a trailing
    * range window is unbounded per-day state, so it is rewritten as the
    * CONTRIBUTION-EXPLODE pattern: each distinct (user, active-day) row
    * contributes to the 7 report days [day, day+6] via sequence+explode,
    * then one distinct-aggregate at (report_day, user) grain counts each
    * user once per window. Linear in events, a bounded 7× fan-out on the
    * user-day relation (≪ events), and no range join — the shape that
    * holds at 100 TB where a per-day self-join over a week of history
    * re-reads 7× the data. Report days are semi-joined to observed days so
    * the grid never extends past the data. */
  def qRollingWau(s: SparkSession, d: String): DataFrame = {
    val dayMs = 86400000L
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val ud = Tables.events(s, d)
      .select(col("user_id"),
        ((ms - pmod(ms, lit(dayMs))) / dayMs).cast("long").as("day"))
      .distinct()
    val days = ud.select("day").distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("day"))
      .join(days, Seq("day"), "left_semi")
      .distinct() // same user active on 2 days of one window counts once
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .withColumn("stick_bp", expr("(10000 * dau) div wau"))
      .select("day", "dau", "wau", "stick_bp")
      .orderBy("day")
  }

  private val qRollingWauSql =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events
      |), days AS (
      |  SELECT DISTINCT day FROM ud
      |), contrib AS (
      |  SELECT DISTINCT ud.user_id, ud.day + g.o AS day
      |  FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o) g
      |  WHERE ud.day + g.o IN (SELECT day FROM days)
      |), wau AS (
      |  SELECT day, CAST(count(*) AS BIGINT) AS wau FROM contrib GROUP BY day
      |), dau AS (
      |  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day
      |)
      |SELECT dau.day, dau.dau, wau.wau,
      |  CAST((10000 * dau.dau) // wau.wau AS BIGINT) AS stick_bp
      |FROM dau JOIN wau ON dau.day = wau.day
      |ORDER BY dau.day""".stripMargin

  /** Inter-event gap distribution on power-of-two second bands — the
    * diagnostic a pipeline runs BEFORE choosing a sessionization gap
    * threshold. The log2 bucket is computed exactly in integers as
    * `length(bin(gap_s + 1)) - 1` (bit length, never floating log). One
    * shuffle on user_id for the lead window, then a tiny (≤40 buckets)
    * aggregate. */
  def qGapHistogram(s: SparkSession, d: String): DataFrame = {
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val w = Window.partitionBy("user_id").orderBy(col("ms").asc, col("event_id").asc)
    val gaps = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), ms.as("ms"))
      .withColumn("next_ms", lead("ms", 1).over(w))
      .filter(col("next_ms").isNotNull)
      .withColumn("gap_s", expr("(next_ms - ms) div 1000"))
    gaps
      .withColumn("bucket", (length(bin(col("gap_s") + 1)) - 1).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_gaps"),
        min("gap_s").as("min_gap_s"),
        max("gap_s").as("max_gap_s"))
      .orderBy("bucket")
  }

  private val qGapHistogramSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events
      |), g AS (
      |  SELECT (lead(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) - ms)
      |    // 1000 AS gap_s
      |  FROM ev
      |)
      |SELECT CAST(length(bin(gap_s + 1)) - 1 AS BIGINT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_gaps,
      |  min(gap_s) AS min_gap_s, max(gap_s) AS max_gap_s
      |FROM g WHERE gap_s IS NOT NULL
      |GROUP BY 1 ORDER BY bucket""".stripMargin

  /** TIME-CONSTRAINED funnel (the ClickHouse windowFunnel semantic, greedy
    * first-anchor variant): the chain view → click → purchase must
    * COMPLETE within 1 hour of the user's first view — unlike
    * q_events_funnel, where any-time later stages count. Deterministic
    * greedy semantics: anchor = first view; each stage = first qualifying
    * event at-or-after the previous stage and within the anchor window.
    * Same tiny per-user frontier aggregates as q_events_funnel (no
    * event-grain self-join), plus per-stage conversion from stage 1 in
    * basis points. */
  def qFunnelWindowed(s: SparkSession, d: String): DataFrame = {
    val winMs = 3600000L
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        graft.functions.TimeFunctions.nsToMs("ts").as("ms"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ms").as("v_ms"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(views, "user_id")
      .filter(col("ms") >= col("v_ms") && col("ms") <= col("v_ms") + winMs)
      .groupBy("user_id").agg(min("ms").as("c_ms"), min("v_ms").as("v_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(clicks, "user_id")
      .filter(col("ms") >= col("c_ms") && col("ms") <= col("v_ms") + winMs)
      .groupBy("user_id").agg(min("ms").as("p_ms"))
    val stages = views.agg(lit("1_view").as("stage"), count(lit(1)).as("n_users"))
      .unionByName(clicks.agg(lit("2_click_1h").as("stage"), count(lit(1)).as("n_users")))
      .unionByName(purchases.agg(lit("3_purchase_1h").as("stage"), count(lit(1)).as("n_users")))
    stages
      .withColumn("base", max(when(col("stage") === "1_view", col("n_users")))
        .over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("stage"), col("n_users"),
        expr("(10000 * n_users) div base").as("conv_bp"))
      .orderBy("stage")
  }

  private val qFunnelWindowedSql =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events
      |), views AS (
      |  SELECT user_id, min(ms) AS v_ms FROM ev WHERE event_type = 'view' GROUP BY user_id
      |), clicks AS (
      |  SELECT e.user_id, min(ms) AS c_ms, min(v_ms) AS v_ms
      |  FROM ev e JOIN views USING (user_id)
      |  WHERE event_type = 'click' AND ms >= v_ms AND ms <= v_ms + 3600000
      |  GROUP BY e.user_id
      |), purchases AS (
      |  SELECT e.user_id, min(ms) AS p_ms
      |  FROM ev e JOIN clicks USING (user_id)
      |  WHERE event_type = 'purchase' AND ms >= c_ms AND ms <= v_ms + 3600000
      |  GROUP BY e.user_id
      |), stages AS (
      |  SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM views
      |  UNION ALL SELECT '2_click_1h', count(*) FROM clicks
      |  UNION ALL SELECT '3_purchase_1h', count(*) FROM purchases
      |)
      |SELECT stage, n_users,
      |  CAST((10000 * n_users)
      |    // max(CASE WHEN stage = '1_view' THEN n_users END) OVER () AS BIGINT)
      |    AS conv_bp
      |FROM stages ORDER BY stage""".stripMargin

  /** User LIFESPAN distribution with churn split: per-user active span in
    * days (first→last activity) bucketed on power-of-two bands, each band
    * split into still-active vs churned (no activity in the trailing 7
    * days of the dataset) — the retention-health histogram next to
    * q_events_retention's cohort matrix. One user-grain aggregate, then a
    * ≤16-row summary; the churn cutoff is a broadcast scalar. */
  def qUserLifespan(s: SparkSession, d: String): DataFrame = {
    val dayMs = 86400000L
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val perUser = Tables.events(s, d)
      .select(col("user_id"),
        ((ms - pmod(ms, lit(dayMs))) / dayMs).cast("long").as("day"))
      .groupBy("user_id")
      .agg(min("day").as("first_day"), max("day").as("last_day"))
    val cutoff = broadcast(perUser.agg(max("last_day").as("max_day")))
    perUser.crossJoin(cutoff)
      .withColumn("lifespan_days", col("last_day") - col("first_day") + 1)
      .withColumn("band", (length(bin(col("lifespan_days"))) - 1).cast("long"))
      .withColumn("churned", col("max_day") - col("last_day") > 7)
      .groupBy("band")
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("churned"), 1L).otherwise(0L)).as("n_churned"),
        min("lifespan_days").as("min_days"),
        max("lifespan_days").as("max_days"))
      .orderBy("band")
  }

  private val qUserLifespanSql =
    """WITH pu AS (
      |  SELECT user_id, min(epoch_ms(ts) // 86400000) AS first_day,
      |    max(epoch_ms(ts) // 86400000) AS last_day
      |  FROM events GROUP BY user_id
      |), cut AS (
      |  SELECT max(last_day) AS max_day FROM pu
      |), b AS (
      |  SELECT last_day - first_day + 1 AS lifespan_days,
      |    (SELECT max_day FROM cut) - last_day > 7 AS churned
      |  FROM pu
      |)
      |SELECT CAST(length(bin(lifespan_days)) - 1 AS BIGINT) AS band,
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
      |  min(lifespan_days) AS min_days, max(lifespan_days) AS max_days
      |FROM b GROUP BY 1 ORDER BY band""".stripMargin

  // ---------------------------------------------------------------------
  // q_survival_km — KAPLAN–MEIER SURVIVAL CURVE for time-to-first-error:
  // per user, the duration in days from their first event to their first
  // `error` event; users who never error are RIGHT-CENSORED at the end of
  // the observation window. The product-limit estimator (Kaplan & Meier
  // 1958) handles the censoring correctly where a naive "mean time to
  // error over erroring users" is biased — the churn/reliability analysis
  // next to q_user_lifespan's raw lifespan bands.
  //
  // Exactness: Ŝ(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) is an order-dependent float
  // product, so it rides the text_ngram_entropy ln-quantization identity:
  // each per-step factor ln((nᵢ−dᵢ)/nᵢ) is milli-nat-quantized to an
  // INTEGER before the cumulative sum (order-independent), and surv_bp
  // re-exponentiates the already-integer log. dᵢ=nᵢ (everyone left dies)
  // yields Ŝ=0: logsurv NULL, surv_bp 0, by the same CASE on both engines.
  //
  // Scale shape: one user-grain aggregate (shuffle on user_id) → duration
  // rows → one grid aggregate to ≤|calendar days| rows; the at-risk
  // cumulative window runs over that bounded duration grid, never a data
  // sort. N and max-day are broadcast one-row aggregates.
  // ---------------------------------------------------------------------
  def qSurvivalKm(s: SparkSession, d: String): DataFrame = {
    val dayMs = 86400000L
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val ev = Tables.events(s, d)
      .select(col("user_id"),
        ((ms - pmod(ms, lit(dayMs))) / dayMs).cast("long").as("day"),
        col("event_type"))
    val mx = broadcast(ev.agg(max("day").as("mx")))
    val users = ev.groupBy("user_id")
      .agg(min("day").as("fd"),
        min(when(col("event_type") === "error", col("day"))).as("ed"))
    val dur = users.crossJoin(mx)
      .select(
        when(col("ed").isNotNull, col("ed") - col("fd"))
          .otherwise(col("mx") - col("fd")).as("t"),
        when(col("ed").isNotNull, lit(1L)).otherwise(lit(0L)).as("e"))
    val n = broadcast(dur.agg(count(lit(1)).as("n_total")))
    val grid = dur.groupBy("t")
      .agg(count(lit(1)).as("n_all"), sum("e").as("d_t"))
    val wc = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val steps = grid.crossJoin(n)
      .withColumn("n_risk",
        col("n_total") - (sum("n_all").over(wc) - col("n_all")))
      .filter(col("d_t") > 0)
      .withColumn("factor_milli",
        when(col("d_t") < col("n_risk"),
          expr("CAST(round(1000 * ln(CAST(n_risk - d_t AS DOUBLE) / n_risk))"
            + " AS BIGINT)")))
      .withColumn("logsurv_milli", sum("factor_milli").over(wc))
    steps.select(col("t").as("t_days"), col("n_risk"),
        col("d_t").as("n_events"),
        (col("n_all") - col("d_t")).as("n_censored"),
        when(col("d_t") === col("n_risk"), lit(null).cast("long"))
          .otherwise(col("logsurv_milli")).as("logsurv_milli"),
        when(col("d_t") === col("n_risk"), lit(0L))
          .otherwise(expr(
            "CAST(round(10000 * exp(logsurv_milli / 1000.0)) AS BIGINT)"))
          .as("surv_bp"))
      .orderBy("t_days")
  }

  private val qSurvivalKmSql =
    """WITH ev AS (
      |  SELECT user_id, epoch_ms(ts) // 86400000 AS day, event_type
      |  FROM events
      |), mx AS (SELECT max(day) AS mx FROM ev
      |), u AS (
      |  SELECT user_id, min(day) AS fd,
      |    min(CASE WHEN event_type = 'error' THEN day END) AS ed
      |  FROM ev GROUP BY user_id
      |), dur AS (
      |  SELECT CASE WHEN ed IS NOT NULL THEN ed - fd
      |    ELSE (SELECT mx FROM mx) - fd END AS t,
      |    CASE WHEN ed IS NOT NULL THEN 1 ELSE 0 END AS e
      |  FROM u
      |), grid AS (
      |  SELECT t, CAST(count(*) AS BIGINT) AS n_all,
      |    CAST(sum(e) AS BIGINT) AS d_t
      |  FROM dur GROUP BY t
      |), cum AS (
      |  SELECT t, n_all, d_t,
      |    CAST((SELECT count(*) FROM dur)
      |      - (CAST(sum(n_all) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
      |           AS BIGINT) - n_all) AS BIGINT) AS n_risk
      |  FROM grid
      |), steps AS (
      |  SELECT t, n_risk, d_t, n_all,
      |    CASE WHEN d_t < n_risk THEN
      |      CAST(round(1000 * ln(CAST(n_risk - d_t AS DOUBLE) / n_risk))
      |        AS BIGINT) END AS factor_milli
      |  FROM cum WHERE d_t > 0
      |), ls AS (
      |  SELECT t, n_risk, d_t, n_all,
      |    CAST(sum(factor_milli) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS logsurv_milli
      |  FROM steps
      |)
      |SELECT t AS t_days, n_risk, d_t AS n_events,
      |  CAST(n_all - d_t AS BIGINT) AS n_censored,
      |  CASE WHEN d_t = n_risk THEN NULL ELSE logsurv_milli END
      |    AS logsurv_milli,
      |  CASE WHEN d_t = n_risk THEN 0
      |    ELSE CAST(round(10000 * exp(logsurv_milli / 1000.0)) AS BIGINT) END
      |    AS surv_bp
      |FROM ls ORDER BY t_days""".stripMargin

  // ---------------------------------------------------------------------
  // q_freshness_audit — PER-STREAM DATA FRESHNESS: each event type's last
  // seen timestamp, its lag behind the newest event anywhere, and a
  // staleness flag at 60 minutes — the first dashboard any ingest
  // pipeline ships (a silently-dead upstream shows up here hours before
  // it shows up as a wrong aggregate; the reference polls its API sources
  // with exactly this recency bookkeeping in the tracker,
  // utils.py ProcessingTracker). Exact integer ms/minute arithmetic;
  // multiply-form flag. One conditional aggregate per type + one
  // broadcast global max — a single scan.
  // ---------------------------------------------------------------------
  def qFreshnessAudit(s: SparkSession, d: String): DataFrame = {
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val perType = Tables.events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), max(ms).as("last_ms"))
    val mx = broadcast(perType.agg(max("last_ms").as("mx")))
    perType.crossJoin(mx)
      .select(col("event_type"), col("n_events"), col("last_ms"),
        expr("(mx - last_ms) div 60000").as("lag_minutes"),
        (col("mx") - col("last_ms") > 3600000L).as("stale"))
      .orderBy("event_type")
  }

  private val qFreshnessAuditSql =
    """WITH pt AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(max(epoch_ms(ts)) AS BIGINT) AS last_ms
      |  FROM events GROUP BY event_type
      |), mx AS (SELECT max(last_ms) AS mx FROM pt)
      |SELECT p.event_type, p.n_events, p.last_ms,
      |  CAST((m.mx - p.last_ms) // 60000 AS BIGINT) AS lag_minutes,
      |  m.mx - p.last_ms > 3600000 AS stale
      |FROM pt p CROSS JOIN mx m
      |ORDER BY p.event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q_peak_concurrency — PEAK CONCURRENT SESSIONS per day via the
  // sweep-line (+1/−1) identity: 30-min-gap sessions become interval
  // [start_min, end_min] rows, each contributes +1 at its start minute
  // and −1 after its end minute, and the running sum over the MINUTE grid
  // is exactly the number of simultaneously-open sessions — the capacity
  // number (connection pools, executor counts, rate limits) that
  // avg-sessions-per-day can miss by an order of magnitude.
  //
  // Scale design: the naive formulation sorts all interval endpoints
  // globally; here deltas hash-aggregate to the BOUNDED minute grid
  // (calendar-sized — ~43k rows/month regardless of data volume), with a
  // zero-delta day-start spine so sessions spanning midnight carry their
  // count into the next day's max, and the one cumulative window runs on
  // that grid. Session building is the standard per-user lag window
  // (partitioned by user — data-grain but user-parallel).
  // ---------------------------------------------------------------------
  def qPeakConcurrency(s: SparkSession, d: String): DataFrame = {
    val gapMs = 1800000L
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val wUser = Window.partitionBy("user_id").orderBy("ms")
    val sess = Tables.events(s, d)
      .select(col("user_id"), ms.as("ms"))
      .withColumn("prev", lag("ms", 1).over(wUser))
      .withColumn("new_sess",
        when(col("prev").isNull || col("ms") - col("prev") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("new_sess").over(wUser))
      .groupBy("user_id", "sid")
      .agg(expr("min(ms) div 60000").as("m0"),
        expr("max(ms) div 60000").as("m1"))
      .cache()
    val deltas = sess.select(col("m0").as("m"), lit(1L).as("delta"))
      .unionByName(sess.select((col("m1") + 1).as("m"), lit(-1L).as("delta")))
    // zero-delta spine at each day start: carries midnight-spanning counts
    val spine = sess.agg(min("m0").as("lo"), max("m1").as("hi"))
      .select(explode(sequence(expr("lo div 1440"), expr("hi div 1440")))
        .as("day"))
      .select((col("day") * 1440).as("m"), lit(0L).as("delta"))
    val wc = Window.orderBy("m")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val act = deltas.unionByName(spine)
      .groupBy("m").agg(sum("delta").as("d"))
      .withColumn("active", sum("d").over(wc))
      .withColumn("day", expr("m div 1440"))
    val peaks = act.groupBy("day").agg(max("active").as("peak_active"))
    act.join(peaks, Seq("day"))
      .filter(col("active") === col("peak_active"))
      .groupBy("day", "peak_active")
      .agg(min(pmod(col("m"), lit(1440L))).as("at_minute_of_day"))
      .orderBy("day")
  }

  private val qPeakConcurrencySql =
    """WITH ev AS (
      |  SELECT user_id, epoch_ms(ts) AS ms FROM events
      |), lagged AS (
      |  SELECT user_id, ms,
      |    lag(ms) OVER (PARTITION BY user_id ORDER BY ms) AS prev
      |  FROM ev
      |), marked AS (
      |  SELECT user_id, ms,
      |    CASE WHEN prev IS NULL OR ms - prev > 1800000 THEN 1 ELSE 0 END
      |      AS new_sess
      |  FROM lagged
      |), sids AS (
      |  SELECT user_id, ms,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      |  FROM marked
      |), sess AS (
      |  SELECT user_id, sid, min(ms) // 60000 AS m0, max(ms) // 60000 AS m1
      |  FROM sids GROUP BY user_id, sid
      |), deltas AS (
      |  SELECT m0 AS m, 1 AS delta FROM sess
      |  UNION ALL SELECT m1 + 1 AS m, -1 AS delta FROM sess
      |  UNION ALL
      |  SELECT unnest(generate_series(
      |      (SELECT min(m0) // 1440 FROM sess),
      |      (SELECT max(m1) // 1440 FROM sess))) * 1440 AS m, 0 AS delta
      |), act AS (
      |  SELECT m, m // 1440 AS day,
      |    CAST(sum(d) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |      AS active
      |  FROM (SELECT m, CAST(sum(delta) AS BIGINT) AS d FROM deltas
      |        GROUP BY m)
      |), peaks AS (
      |  SELECT day, max(active) AS peak_active FROM act GROUP BY day
      |)
      |SELECT a.day, p.peak_active,
      |  CAST(min(a.m % 1440) AS BIGINT) AS at_minute_of_day
      |FROM act a JOIN peaks p ON a.day = p.day AND a.active = p.peak_active
      |GROUP BY a.day, p.peak_active
      |ORDER BY a.day""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_survival_km", qSurvivalKm, Some(qSurvivalKmSql)),
    Q("q_freshness_audit", qFreshnessAudit, Some(qFreshnessAuditSql)),
    Q("q_peak_concurrency", qPeakConcurrency, Some(qPeakConcurrencySql)),
    Q("q_user_lifespan", qUserLifespan, Some(qUserLifespanSql)),
    Q("q_funnel_windowed", qFunnelWindowed, Some(qFunnelWindowedSql)),
    Q("q_rolling_wau", qRollingWau, Some(qRollingWauSql)),
    Q("q_gap_histogram", qGapHistogram, Some(qGapHistogramSql)),
    Q("q_cohort_ltv", qCohortLtv, Some(qCohortLtvSql)),
    Q("q_funnel_time", qFunnelTime, Some(qFunnelTimeSql)),
    Q("q_seasonal_baseline", qSeasonalBaseline, Some(qSeasonalBaselineSql)),
    Q("q_time_decay", qTimeDecay, Some(qTimeDecaySql)),
    Q("q_anomaly_mad", qAnomalyMad, Some(qAnomalyMadSql)),
    Q("q_interval_overlap", qIntervalOverlap, Some(qIntervalOverlapSql)),
    Q("q_event_attribution", eventsAttribution, Some(eventsAttributionSql)),
    Q("q_events_retention", eventsRetention, Some(eventsRetentionSql)),
    Q("q_events_funnel", eventsFunnel, Some(eventsFunnelSql)),
    Q("q_scd2_lookup", qScd2Lookup, Some(qScd2LookupSql)),
    Q("q_event_transitions", qEventTransitions, Some(qEventTransitionsSql)),
    Q("q_events_sessionize", eventsSessionize, Some(eventsSessionizeSql)),
    Q("q_events_tumbling", eventsTumbling, Some(eventsTumblingSql)),
    Q("q_events_hopping", eventsHopping, Some(eventsHoppingSql)),
    Q("q_incr_agg", qIncrAgg, Some(qIncrAggSql)),
    Q("q_moving_avg", eventsMovingAvg, Some(eventsMovingAvgSql)),
    Q("q_gap_fill", eventsGapFill, Some(eventsGapFillSql)),
    Q("q_cumulative_users", eventsCumulativeUsers, Some(eventsCumulativeUsersSql)),
    Q("q_events_json_extract", eventsJsonExtract, Some(eventsJsonExtractSql))
  )
}
