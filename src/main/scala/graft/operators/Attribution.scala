package graft.operators

import graft.{Q, Tables}
import graft.functions.TimeFunctions.nsToMs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov removal-effect attribution — the data-driven alternative to the
  * positional credit rules `q_event_attribution` (last-touch) covers:
  * model user journeys as an absorbing Markov chain over touch states,
  * compute the conversion probability from START, then re-compute it with
  * each channel REMOVED from the graph; a channel's credit is how much
  * conversion collapses without it (Anderl et al.'s removal effect — the
  * standard churn/attribution construction).
  *
  * Scale design: the only data-grain work is journey extraction — one
  * user-partitioned window pass over events (linear, one shuffle). The
  * chain itself lives on the (state × state) TRANSITION relation, bounded
  * by the event-type vocabulary (~6×6 rows here, ≤ a few hundred for any
  * real taxonomy) — so the removal variants (×|channels|) and the K
  * absorption iterations all run on metadata-scale relations, never
  * touching events again. At 100 TB the journey pass is the same single
  * linear scan; everything after it is constant-size.
  *
  * Exact cross-engine parity: transition probabilities and absorption
  * values are quantized to integer MICRO-units and every division is a
  * floor `div` — all arithmetic after the count aggregate is integer, so
  * Spark and DuckDB agree bit-for-bit (no float summation-order risk
  * through the K=8 iteration pipeline).
  */
object Attribution {

  private val K = 64 // absorption iterations: measured fixed point in micro
  // units for this journey-length distribution (p_start identical at K=48
  // vs K=64 for every variant but one, which moves 12 micro); identical on
  // both sides, so parity holds at any K — K only sets semantic accuracy
  private val M = 1000000L // micro-unit scale

  /** Bounded (variant, from, to, pm) transition relation: counts from the
    * journey pass, expanded per removal variant, floor-renormalized to
    * micro-probabilities within (variant, from). */
  private[graft] def transitionsForTest(s: SparkSession, d: String): DataFrame =
    transitions(s, d)

  private def transitions(s: SparkSession, d: String): DataFrame = {
    val ms = nsToMs("ts")
    val ev = Tables.events(s, d)
      .select(col("user_id"), ms.as("t"), col("event_id"), col("event_type"))
    val wUser = Window.partitionBy("user_id").orderBy("t", "event_id")
    // journey id = number of purchases strictly before this event; journey
    // j converts iff the user has a (j+1)-th purchase, i.e. a purchase row
    // whose own journey id equals j
    val marked = ev
      .withColumn("is_p", (col("event_type") === "purchase").cast("long"))
      .withColumn("j", sum("is_p").over(wUser) - col("is_p"))
    val touches = marked.filter(col("is_p") === 0)
    val wj = Window.partitionBy("user_id", "j").orderBy("t", "event_id")
    val seq = touches
      .withColumn("nxt", lead("event_type", 1).over(wj))
      .withColumn("pos", row_number().over(wj))
    val converts = marked.filter(col("is_p") === 1)
      .select(col("user_id"), col("j")).distinct()
      .withColumn("conv", lit(true))
    // start → first touch
    val startEdges = seq.filter(col("pos") === 1)
      .select(lit("start").as("from"), col("event_type").as("to"))
    // touch → next touch
    val midEdges = seq.filter(col("nxt").isNotNull)
      .select(col("event_type").as("from"), col("nxt").as("to"))
    // last touch → conv / null
    val endEdges = seq.filter(col("nxt").isNull)
      .join(converts, Seq("user_id", "j"), "left")
      .select(col("event_type").as("from"),
        when(col("conv"), "conv").otherwise("null").as("to"))
    // touchless converting journeys (purchase with no preceding touches in
    // its journey): start → conv
    val directEdges = converts.drop("conv")
      .join(seq.select("user_id", "j").distinct(), Seq("user_id", "j"),
        "left_anti")
      .select(lit("start").as("from"), lit("conv").as("to"))
    val counts = startEdges.unionByName(midEdges).unionByName(endEdges)
      .unionByName(directEdges)
      .groupBy("from", "to").agg(count(lit(1)).as("c"))
    // expand per removal variant and floor-renormalize; 'none' = full graph
    val variants = counts.select(col("from").as("v")).distinct()
      .filter(col("v") =!= "start")
      .unionByName(s.range(1).select(lit("none").as("v")))
    val kept = counts.crossJoin(broadcast(variants))
      .filter(col("from") =!= col("v") && col("to") =!= col("v"))
    val tot = kept.groupBy("v", "from").agg(sum("c").as("tc"))
    kept.join(tot, Seq("v", "from"))
      .select(col("v"), col("from"), col("to"),
        expr(s"($M * c) div tc").as("pm"))
  }

  /** Driver-contract query: per removed channel, the full-graph and
    * removed-graph conversion probabilities from START (micro-units after
    * K=64 exact-integer absorption iterations) and the removal effect in
    * milli-units.
    *
    * The chain solve COLLECTS the transition relation and iterates on
    * driver arrays — the bounded-metadata-collect pattern (like the Lloyd
    * centroid collect): |rows| ≤ |removal variants| · |states|², i.e. the
    * event-type TAXONOMY cubed, not data — ~300 rows here, a few million
    * even for a thousand-channel taxonomy. The data-grain journey pass
    * stays fully distributed; integer micro-arithmetic (floor div per
    * step, order-independent sums) keeps the driver loop bit-identical to
    * the oracle's recursive CTE. */
  def qAttributionMarkov(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rows = transitions(s, d)
      .select("v", "from", "to", "pm")
      .as[(String, String, String, Long)]
      .collect()
    val results = rows.groupBy(_._1).toSeq.flatMap { case (v, rs) =>
      val states = (rs.map(_._2).distinct :+ "conv")
      val idx = states.zipWithIndex.toMap
      val edges = rs.map { case (_, f, t, pm) => (idx(f), idx.get(t), pm) }
      val p = Array.fill(states.length)(0L)
      p(idx("conv")) = M
      for (_ <- 1 to K) {
        val acc = Array.fill(states.length)(0L)
        edges.foreach { case (fi, ti, pm) =>
          ti.foreach(t => acc(fi) += pm * p(t)) // 'null'/dead targets: 0
        }
        var i = 0
        while (i < p.length) { p(i) = acc(i) / M; i += 1 }
        p(idx("conv")) = M
      }
      // A variant whose removal strips EVERY start-edge has no 'start'
      // state; the oracle's p_start CTE yields no row for it, so omit it
      // here too (oracle parity on skewed data, instead of a crash).
      idx.get("start").map(si => (v, p(si)))
    }
    val pFull = results.find(_._1 == "none").map(_._2).getOrElse(0L)
    val out = results.filterNot(_._1 == "none").sortBy(_._1)
      .map { case (v, pr) =>
        val rm = if (pFull > 0) 1000L - (1000L * pr) / pFull else 0L
        (v, pFull, pr, rm)
      }
    out.toDF("channel", "p_full", "p_removed", "removal_milli")
      .orderBy("channel")
  }

  // The oracle restates the same journey window pass; the K=64 iteration
  // runs as a recursive CTE whose working set is one iteration's
  // (variant, state, p) rows — the same exact-integer update rule.
  private val qAttributionMarkovSql = {
    s"""WITH RECURSIVE ev AS (
       |  SELECT user_id, epoch_ms(ts) AS t, event_id, event_type,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
       |  FROM events
       |), marked AS (
       |  SELECT *, CAST(sum(is_p) OVER (PARTITION BY user_id
       |      ORDER BY t, event_id) - is_p AS BIGINT) AS j
       |  FROM ev
       |), touches AS (
       |  SELECT user_id, j, event_type, t, event_id,
       |    lead(event_type) OVER (PARTITION BY user_id, j
       |      ORDER BY t, event_id) AS nxt,
       |    row_number() OVER (PARTITION BY user_id, j
       |      ORDER BY t, event_id) AS pos
       |  FROM marked WHERE is_p = 0
       |), converts AS (
       |  SELECT DISTINCT user_id, j FROM marked WHERE is_p = 1
       |), edges AS (
       |  SELECT 'start' AS "from", event_type AS "to"
       |  FROM touches WHERE pos = 1
       |  UNION ALL
       |  SELECT event_type, nxt FROM touches WHERE nxt IS NOT NULL
       |  UNION ALL
       |  SELECT tc.event_type,
       |    CASE WHEN cv.user_id IS NOT NULL THEN 'conv' ELSE 'null' END
       |  FROM touches tc LEFT JOIN converts cv
       |    ON cv.user_id = tc.user_id AND cv.j = tc.j
       |  WHERE tc.nxt IS NULL
       |  UNION ALL
       |  SELECT 'start', 'conv' FROM converts cv
       |  WHERE NOT EXISTS (SELECT 1 FROM touches tc
       |    WHERE tc.user_id = cv.user_id AND tc.j = cv.j)
       |), counts AS MATERIALIZED (
       |  SELECT "from", "to", CAST(count(*) AS BIGINT) AS c
       |  FROM edges GROUP BY 1, 2
       |), variants AS (
       |  SELECT DISTINCT "from" AS v FROM counts WHERE "from" <> 'start'
       |  UNION ALL SELECT 'none'
       |), kept AS (
       |  SELECT vr.v, c."from", c."to", c.c
       |  FROM counts c CROSS JOIN variants vr
       |  WHERE c."from" <> vr.v AND c."to" <> vr.v
       |), trans AS MATERIALIZED (
       |  SELECT v, "from", "to",
       |    CAST(($M * c) // (sum(c) OVER (PARTITION BY v, "from"))
       |      AS BIGINT) AS pm
       |  FROM kept
       |), states AS MATERIALIZED (
       |  SELECT DISTINCT v, "from" AS state FROM trans
       |  UNION SELECT DISTINCT v, 'conv' FROM trans
       |), pit AS (
       |  SELECT v, state,
       |    CAST(CASE WHEN state = 'conv' THEN $M ELSE 0 END AS BIGINT) AS p,
       |    0 AS it
       |  FROM states
       |  UNION ALL
       |  SELECT st.v, st.state,
       |    CAST(CASE WHEN st.state = 'conv' THEN $M
       |      ELSE coalesce(sum(t.pm * w.p), 0) // $M END AS BIGINT) AS p,
       |    max(w.it) + 1 AS it
       |  FROM states st JOIN pit w ON w.v = st.v
       |  LEFT JOIN trans t
       |    ON t.v = st.v AND t."from" = st.state AND t."to" = w.state
       |  WHERE w.it < $K
       |  GROUP BY st.v, st.state
       |), p_start AS (
       |  SELECT v, p AS p_conv FROM pit WHERE it = $K AND state = 'start'
       |), full_p AS (
       |  SELECT p_conv AS p_full FROM p_start WHERE v = 'none'
       |)
       |SELECT ps.v AS channel, fp.p_full, ps.p_conv AS p_removed,
       |  CAST(CASE WHEN fp.p_full > 0
       |    THEN 1000 - ((1000 * ps.p_conv) // fp.p_full)
       |    ELSE 0 END AS BIGINT) AS removal_milli
       |FROM p_start ps CROSS JOIN full_p fp
       |WHERE ps.v <> 'none'
       |ORDER BY channel""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Shapley-value attribution (Zhao et al. 2018 simplified-Shapley form):
  // the characteristic value v(S) of a coalition is the conversion rate of
  // journeys whose OBSERVED touch set is exactly S; each channel's credit
  // is its exact Shapley value over the 2^4 subset lattice.
  //
  // Scale design: the only data-grain work is the same one-window journey
  // pass + a per-journey collect_set — linear, one shuffle. Everything
  // after runs on the ≤2^|channels| coalition relation (16 rows). All
  // arithmetic is exact integer: v quantized to micro-units by floor div,
  // Shapley weights s!(n-1-s)!/n! carried ×24 so the coefficients
  // {6,2,2,6} are integers — credits emit in micro×24 units and the
  // telescoping identity Σφ = 24·(v(full)-v(∅)) holds EXACTLY (spec).
  // The channel taxonomy is configuration (as in any real attribution
  // setup), pinned to the four touch types.
  // ---------------------------------------------------------------------

  private val channels = Seq("click", "error", "signup", "view") // sorted

  /** Per-coalition observed conversion: (cset, n_journeys, v_micro). */
  private def coalitions(s: SparkSession, d: String): DataFrame = {
    val ms = nsToMs("ts")
    val ev = Tables.events(s, d)
      .select(col("user_id"), ms.as("t"), col("event_id"), col("event_type"))
    val wUser = Window.partitionBy("user_id").orderBy("t", "event_id")
    val marked = ev
      .withColumn("is_p", (col("event_type") === "purchase").cast("long"))
      .withColumn("j", sum("is_p").over(wUser) - col("is_p"))
    val touches = marked.filter(col("is_p") === 0)
    val converts = marked.filter(col("is_p") === 1)
      .select(col("user_id"), col("j")).distinct()
      .withColumn("conv", lit(true))
    val journeySets = touches.groupBy("user_id", "j")
      .agg(array_join(array_sort(collect_set("event_type")), ",").as("cset"))
      .join(converts, Seq("user_id", "j"), "left")
      .select(col("cset"), when(col("conv"), 1L).otherwise(0L).as("c"))
    val directJourneys = converts
      .join(touches.select("user_id", "j").distinct(),
        Seq("user_id", "j"), "left_anti")
      .select(lit("").as("cset"), lit(1L).as("c"))
    journeySets.unionByName(directJourneys)
      .groupBy("cset")
      .agg(count(lit(1)).as("n"),
        expr(s"($M * sum(c)) div count(1)").as("v"))
  }

  /** Driver-contract query: exact-integer Shapley credit per channel in
    * micro×24 units, alongside the grand-coalition and empty-coalition
    * values the telescoping identity closes over. */
  def qAttributionShapley(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vObs = coalitions(s, d)
    // the full 16-row subset lattice; unobserved coalitions carry v = 0
    val masks = s.range(16).toDF("m")
      .withColumn("cset", concat_ws(",",
        channels.zipWithIndex.map { case (c, i) =>
          when(expr(s"(m >> $i) & 1") === 1, c)
        }: _*))
      .join(vObs.select("cset", "v"), Seq("cset"), "left")
      .select(col("m"), coalesce(col("v"), lit(0L)).as("v"))
    val chanIdx = channels.zipWithIndex
      .map { case (c, i) => (c, i.toLong) }
      .toDF("channel", "i")
    // rows (channel, S without channel): coef(|S|)·(v(S ∪ {i}) − v(S));
    // coef = 24·|S|!(3−|S|)!/4! = {6,2,2,6}
    val pairs = chanIdx.crossJoin(masks.withColumnRenamed("v", "v_s"))
      .filter(expr("(m >> i) & 1") === 0)
      .withColumn("bc", expr(
        "((m>>0)&1) + ((m>>1)&1) + ((m>>2)&1) + ((m>>3)&1)"))
      .withColumn("coef", expr(
        "CASE bc WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END"))
      .withColumn("m_with", expr("m + (1 << i)"))
      .join(masks.select(col("m").as("m_with"), col("v").as("v_si")), "m_with")
    val phi = pairs.groupBy("channel")
      .agg(sum(expr("coef * (v_si - v_s)")).as("phi_u24"))
    val bounds = masks.agg(
      max(when(col("m") === 15, col("v"))).as("v_full"),
      max(when(col("m") === 0, col("v"))).as("v_empty"))
    phi.crossJoin(broadcast(bounds))
      .select(col("channel"), col("phi_u24"), col("v_full"), col("v_empty"))
      .orderBy("channel")
  }

  private val qAttributionShapleySql =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_ms(ts) AS t, event_id, event_type,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
       |  FROM events
       |), marked AS (
       |  SELECT *, CAST(sum(is_p) OVER (PARTITION BY user_id
       |      ORDER BY t, event_id) - is_p AS BIGINT) AS j
       |  FROM ev
       |), touches AS (
       |  SELECT user_id, j, event_type FROM marked WHERE is_p = 0
       |), converts AS (
       |  SELECT DISTINCT user_id, j FROM marked WHERE is_p = 1
       |), journey_sets AS (
       |  SELECT t.user_id, t.j,
       |    array_to_string(array_sort(array_agg(DISTINCT t.event_type)), ',')
       |      AS cset
       |  FROM touches t GROUP BY 1, 2
       |), journeys AS (
       |  SELECT js.cset,
       |    CASE WHEN cv.user_id IS NOT NULL THEN 1 ELSE 0 END AS c
       |  FROM journey_sets js LEFT JOIN converts cv
       |    ON cv.user_id = js.user_id AND cv.j = js.j
       |  UNION ALL
       |  SELECT '' AS cset, 1 AS c
       |  FROM converts cv
       |  WHERE NOT EXISTS (SELECT 1 FROM touches t
       |    WHERE t.user_id = cv.user_id AND t.j = cv.j)
       |), v_obs AS MATERIALIZED (
       |  SELECT cset, CAST(($M * sum(c)) // count(*) AS BIGINT) AS v
       |  FROM journeys GROUP BY cset
       |), masks AS MATERIALIZED (
       |  SELECT t.m, coalesce(vo.v, 0) AS v
       |  FROM (
       |    SELECT r.range AS m, concat_ws(',',
       |      CASE WHEN (r.range >> 0) & 1 = 1 THEN 'click' END,
       |      CASE WHEN (r.range >> 1) & 1 = 1 THEN 'error' END,
       |      CASE WHEN (r.range >> 2) & 1 = 1 THEN 'signup' END,
       |      CASE WHEN (r.range >> 3) & 1 = 1 THEN 'view' END) AS cset
       |    FROM range(0, 16) r
       |  ) t LEFT JOIN v_obs vo ON vo.cset = t.cset
       |), chan AS (
       |  SELECT * FROM (VALUES ('click', 0), ('error', 1),
       |    ('signup', 2), ('view', 3)) AS c(channel, i)
       |), pairs AS (
       |  SELECT ch.channel,
       |    CASE ((ms.m>>0)&1) + ((ms.m>>1)&1) + ((ms.m>>2)&1) + ((ms.m>>3)&1)
       |      WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END AS coef,
       |    ms.v AS v_s, mw.v AS v_si
       |  FROM chan ch
       |  JOIN masks ms ON (ms.m >> ch.i) & 1 = 0
       |  JOIN masks mw ON mw.m = ms.m + (1 << ch.i)
       |)
       |SELECT p.channel,
       |  CAST(sum(p.coef * (p.v_si - p.v_s)) AS BIGINT) AS phi_u24,
       |  CAST((SELECT v FROM masks WHERE m = 15) AS BIGINT) AS v_full,
       |  CAST((SELECT v FROM masks WHERE m = 0) AS BIGINT) AS v_empty
       |FROM pairs p GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // Position-based (U-shaped) attribution — the rule-based member of the
  // family (last-touch / markov / shapley / position): converting
  // journeys credit 40% to the first touch, 40% to the last, and split
  // the remaining 20% evenly across middle touches. Exact integer
  // micro-units: single touch = 1e6, two touches = 5e5 each, n ≥ 3 =
  // 4e5 / (2e5 div (n−2)) / 4e5 — the floor remainder of the middle
  // split is dropped identically in both engines, so per-journey credit
  // sums to ≤ 1e6 with a deficit < n−2 micro. One window pass, one
  // hash-aggregate — linear, one shuffle.
  // ---------------------------------------------------------------------

  /** Driver-contract query: per channel, total U-shaped credit (micro)
    * and the touch count it accrued over, converting journeys only. */
  def qAttributionPosition(s: SparkSession, d: String): DataFrame = {
    val ms = nsToMs("ts")
    val ev = Tables.events(s, d)
      .select(col("user_id"), ms.as("t"), col("event_id"), col("event_type"))
    val wUser = Window.partitionBy("user_id").orderBy("t", "event_id")
    val marked = ev
      .withColumn("is_p", (col("event_type") === "purchase").cast("long"))
      .withColumn("j", sum("is_p").over(wUser) - col("is_p"))
    val touches = marked.filter(col("is_p") === 0)
    val converts = marked.filter(col("is_p") === 1)
      .select(col("user_id"), col("j")).distinct()
    val wj = Window.partitionBy("user_id", "j").orderBy("t", "event_id")
    touches
      .join(converts, Seq("user_id", "j"), "left_semi")
      .withColumn("pos", row_number().over(wj))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id", "j")))
      .withColumn("credit", expr(
        """CASE WHEN n = 1 THEN 1000000L
          |     WHEN n = 2 THEN 500000L
          |     WHEN pos = 1 OR pos = n THEN 400000L
          |     ELSE 200000L div (n - 2) END""".stripMargin))
      .groupBy(col("event_type").as("channel"))
      .agg(sum("credit").as("credit_micro"),
        count(lit(1)).as("n_touches"))
      .orderBy("channel")
  }

  private val qAttributionPositionSql =
    """WITH ev AS (
      |  SELECT user_id, epoch_ms(ts) AS t, event_id, event_type,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      |  FROM events
      |), marked AS (
      |  SELECT *, CAST(sum(is_p) OVER (PARTITION BY user_id
      |      ORDER BY t, event_id) - is_p AS BIGINT) AS j
      |  FROM ev
      |), converts AS (
      |  SELECT DISTINCT user_id, j FROM marked WHERE is_p = 1
      |), touches AS (
      |  SELECT m.user_id, m.j, m.event_type,
      |    row_number() OVER (PARTITION BY m.user_id, m.j
      |      ORDER BY m.t, m.event_id) AS pos,
      |    count(*) OVER (PARTITION BY m.user_id, m.j) AS n
      |  FROM marked m
      |  WHERE m.is_p = 0 AND EXISTS (SELECT 1 FROM converts cv
      |    WHERE cv.user_id = m.user_id AND cv.j = m.j)
      |)
      |SELECT event_type AS channel,
      |  CAST(sum(CASE WHEN n = 1 THEN 1000000
      |    WHEN n = 2 THEN 500000
      |    WHEN pos = 1 OR pos = n THEN 400000
      |    ELSE 200000 // (n - 2) END) AS BIGINT) AS credit_micro,
      |  CAST(count(*) AS BIGINT) AS n_touches
      |FROM touches GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_attribution_markov", qAttributionMarkov, Some(qAttributionMarkovSql)),
    Q("q_attribution_shapley", qAttributionShapley, Some(qAttributionShapleySql)),
    Q("q_attribution_position", qAttributionPosition, Some(qAttributionPositionSql))
  )
}
