package graft.operators

import graft.{Q, Tables}
import graft.plans.{AsOfJoin, AsOfJoinStrategy}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-preceding-event) join, the temporal join every event
  * pipeline eventually needs: for each purchase, the user's most recent
  * click at-or-before it.
  *
  * Two implementations with identical semantics:
  *  - `asofJoinComposed` (q_asof_join): union + tag-ordered window
  *    last(ignoreNulls) carry-forward — pure built-ins, oracle-checked
  *    against DuckDB's native ASOF LEFT JOIN.
  *  - `AsOf.join` (q_asof_custom): the custom AsOfJoinExec physical operator
  *    (plans/AsOfJoinPlan.scala) — co-partitioned sort-merge two-pointer,
  *    O(n+m) per partition, constant memory. AsOfSpec asserts both return
  *    byte-identical results.
  *
  * Clicks are deduplicated to one per (user, ms) first — ASOF tie-breaking
  * among equal timestamps is engine-arbitrary otherwise.
  */
object AsOf {

  /** Generic as-of join through the custom operator. Keys/times are resolved
    * by NAME against each side's analyzed output (a lazily-resolved Column
    * would reach the executor as an unevaluable ColumnNodeExpression). The
    * right side's columns must not share names/ids with the left (alias
    * them). */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = CatalystBridge.planOf(left)
    val rPlan = CatalystBridge.planOf(right)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lt, rt) = (attr(lPlan, leftTime), attr(rPlan, rightTime))
    // the exec orders RIGHT rows with the LEFT side's ordering — types must
    // match exactly or executors die mid-job with ClassCastException
    require(lk.dataType == rk.dataType,
      s"as-of key types differ: ${lk.dataType.sql} vs ${rk.dataType.sql}")
    require(lt.dataType == rt.dataType,
      s"as-of time types differ: ${lt.dataType.sql} vs ${rt.dataType.sql}")
    CatalystBridge.ofRows(spark, AsOfJoin(lPlan, rPlan, lk, rk, lt, rt))
  }

  private def purchases(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        graft.functions.TimeFunctions.nsToMs("ts").as("pms"))

  /** One click per (user, ms), keeping the largest event_id. */
  private def dedupedClicks(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user_id"), graft.functions.TimeFunctions.nsToMs("ts").as("cms"))
      .agg(max("event_id").as("click_id"))

  /** Built-ins composition: tag both sides, sort (user, ms, tag) so clicks
    * at the same ms precede purchases, carry the last click forward. */
  def asofJoinComposed(s: SparkSession, d: String): DataFrame = {
    val p = purchases(s, d)
      .select(col("user_id"), col("pms").as("ms"), lit(1).as("tag"),
        col("purchase_id"), lit(null).cast("long").as("click_id"),
        lit(null).cast("long").as("click_ms"))
    val c = dedupedClicks(s, d)
      .select(col("c_user_id").as("user_id"), col("cms").as("ms"), lit(0).as("tag"),
        lit(null).cast("long").as("purchase_id"), col("click_id"),
        col("cms").as("click_ms"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ms").asc, col("tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(c)
      .withColumn("last_click_id", last("click_id", ignoreNulls = true).over(w))
      .withColumn("last_click_ms", last("click_ms", ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(
        col("purchase_id"), col("user_id"), col("ms").as("purchase_ms"),
        col("last_click_id").as("click_id"), col("last_click_ms").as("click_ms"),
        (col("ms") - col("last_click_ms")).as("gap_ms"))
      .orderBy("purchase_id")
  }

  private val asofJoinSql =
    """WITH clicks AS (
      |  SELECT user_id, epoch_ms(ts) AS ms, max(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_ms(ts)
      |), purchases AS (
      |  SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS pms
      |  FROM events WHERE event_type = 'purchase'
      |)
      |SELECT p.purchase_id, p.user_id, p.pms AS purchase_ms,
      |  c.click_id, c.ms AS click_ms, p.pms - c.ms AS gap_ms
      |FROM purchases p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND c.ms <= p.pms
      |ORDER BY purchase_id""".stripMargin

  /** Same query through the custom physical operator. Oracled with the SAME
    * DuckDB ASOF SQL as q_asof_join: AsOfSpec proves the two formulations
    * byte-identical, and the hash compare now re-proves it per round. */
  def asofJoinCustom(s: SparkSession, d: String): DataFrame =
    join(
      purchases(s, d), dedupedClicks(s, d),
      "user_id", "c_user_id", "pms", "cms")
      .select(
        col("purchase_id"), col("user_id"), col("pms").as("purchase_ms"),
        col("click_id"), col("cms").as("click_ms"),
        (col("pms") - col("cms")).as("gap_ms"))
      .orderBy("purchase_id")

  /** NEAREST-direction as-of join (pandas merge_asof direction='nearest'
    * with tolerance — the sensor-fusion/alignment semantic, vs the
    * backward-only q_asof_join): each purchase matches its closest click
    * within ±1 h, ties broken toward the PRECEDING click. Same sort-carry
    * shape as the composed join run in BOTH directions over one union sort
    * — two window passes on the same (user, ms, tag) ordering, so Catalyst
    * reuses the exchange and sort; no self-join, no range join. */
  def asofNearest(s: SparkSession, d: String): DataFrame = {
    val tolMs = 3600000L
    val p = purchases(s, d)
      .select(col("user_id"), col("pms").as("ms"), lit(1).as("tag"),
        col("purchase_id"), lit(null).cast("long").as("click_id"),
        lit(null).cast("long").as("click_ms"))
    val c = dedupedClicks(s, d)
      .select(col("c_user_id").as("user_id"), col("cms").as("ms"), lit(0).as("tag"),
        lit(null).cast("long").as("purchase_id"), col("click_id"),
        col("cms").as("click_ms"))
    val ord = Window.partitionBy("user_id").orderBy(col("ms").asc, col("tag").asc)
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    p.unionByName(c)
      .withColumn("b_id", last("click_id", ignoreNulls = true).over(wb))
      .withColumn("b_ms", last("click_ms", ignoreNulls = true).over(wb))
      .withColumn("f_id", first("click_id", ignoreNulls = true).over(wf))
      .withColumn("f_ms", first("click_ms", ignoreNulls = true).over(wf))
      .filter(col("tag") === 1)
      .select(col("purchase_id"), col("user_id"), col("ms"),
        col("b_id"), col("b_ms"), col("f_id"), col("f_ms"))
      .withColumn("pick", expr(
        s"""CASE
           |  WHEN b_ms IS NOT NULL AND ms - b_ms <= $tolMs
           |   AND (f_ms IS NULL OR f_ms - ms > $tolMs OR ms - b_ms <= f_ms - ms)
           |  THEN 'backward'
           |  WHEN f_ms IS NOT NULL AND f_ms - ms <= $tolMs THEN 'forward'
           |  ELSE 'none' END""".stripMargin))
      .select(col("purchase_id"), col("user_id"), col("ms").as("purchase_ms"),
        expr("CASE pick WHEN 'backward' THEN b_id WHEN 'forward' THEN f_id END")
          .as("click_id"),
        expr("CASE pick WHEN 'backward' THEN b_ms - ms WHEN 'forward' THEN f_ms - ms END")
          .as("offset_ms"),
        col("pick").as("direction"))
      .orderBy("purchase_id")
  }

  private val asofNearestSql =
    """WITH clicks AS (
      |  SELECT user_id, epoch_ms(ts) AS ms, max(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_ms(ts)
      |), u AS (
      |  SELECT user_id, epoch_ms(ts) AS ms, 1 AS tag, event_id AS purchase_id,
      |    CAST(NULL AS BIGINT) AS click_id, CAST(NULL AS BIGINT) AS click_ms
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, ms, 0 AS tag, NULL, click_id, ms FROM clicks
      |), carried AS (
      |  SELECT user_id, ms, tag, purchase_id,
      |    last_value(click_id IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY ms, tag ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b_id,
      |    last_value(click_ms IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY ms, tag ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b_ms,
      |    first_value(click_id IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY ms, tag ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f_id,
      |    first_value(click_ms IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY ms, tag ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f_ms
      |  FROM u
      |), picked AS (
      |  SELECT purchase_id, user_id, ms,
      |    b_id, b_ms, f_id, f_ms,
      |    CASE
      |      WHEN b_ms IS NOT NULL AND ms - b_ms <= 3600000
      |       AND (f_ms IS NULL OR f_ms - ms > 3600000 OR ms - b_ms <= f_ms - ms)
      |      THEN 'backward'
      |      WHEN f_ms IS NOT NULL AND f_ms - ms <= 3600000 THEN 'forward'
      |      ELSE 'none' END AS pick
      |  FROM carried WHERE tag = 1
      |)
      |SELECT purchase_id, user_id, ms AS purchase_ms,
      |  CASE pick WHEN 'backward' THEN b_id WHEN 'forward' THEN f_id END AS click_id,
      |  CASE pick WHEN 'backward' THEN b_ms - ms WHEN 'forward' THEN f_ms - ms END
      |    AS offset_ms,
      |  pick AS direction
      |FROM picked ORDER BY purchase_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_asof_nearest", asofNearest, Some(asofNearestSql)),
    Q("q_asof_join", asofJoinComposed, Some(asofJoinSql)),
    Q("q_asof_custom", asofJoinCustom, Some(asofJoinSql))
  )
}
