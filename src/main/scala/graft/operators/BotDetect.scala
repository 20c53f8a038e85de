package graft.operators

import graft.{Q, Tables}
import graft.functions.TimeFunctions.nsToMs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Automation/bot cadence screening — the traffic-hygiene gate a web-scale
  * corpus pipeline runs before events (or crawled pages) feed training
  * aggregates: scripted clients beat human traffic on REGULARITY, so the
  * per-user dispersion of inter-event gaps (MAD/mean, the integer cousin
  * of the coefficient of variation) separates metronomic automation
  * (ratio → 0) from organic arrivals (exponential gaps read ~700-1000
  * milli). The report is the full distribution, not a point flag, so the
  * screening threshold stays a downstream decision.
  *
  * Scale shape: one user-partitioned window pass for gaps, a per-user
  * aggregate for the mean, one join back for absolute deviations, and a
  * final bounded 16-bucket histogram — linear, two user-grain shuffles,
  * output fixed-size. No data-grain windows beyond the per-user lag.
  */
object BotDetect {

  /** Driver-contract query: histogram of per-user cadence-regularity
    * ratios (milli MAD/mean, bucketed by 100 milli, capped at bucket 15)
    * with user and gap counts per bucket. */
  def qBotRegularity(s: SparkSession, d: String): DataFrame = {
    val ms = nsToMs("ts")
    val ev = Tables.events(s, d)
      .select(col("user_id"), ms.as("t"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy("t", "event_id")
    val gaps = ev
      .withColumn("gap", col("t") - lag("t", 1).over(w))
      .filter(col("gap").isNotNull)
      .select("user_id", "gap")
    val means = gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"), sum("gap").as("sg"))
      .withColumn("mean_gap", expr("sg div n_gaps"))
    val users = gaps.join(means, "user_id")
      .groupBy("user_id")
      .agg(expr("sum(abs(gap - mean_gap)) div max(n_gaps)").as("mad"),
        max("mean_gap").as("mean_gap"), max("n_gaps").as("n_gaps"))
      .withColumn("ratio", expr(
        "CASE WHEN mean_gap > 0 THEN (1000 * mad) div mean_gap ELSE 0 END"))
      .withColumn("bucket", least(expr("ratio div 100"), lit(15L)))
    users.groupBy("bucket")
      .agg(count(lit(1)).as("n_users"), sum("n_gaps").as("n_gaps"))
      .orderBy("bucket")
  }

  private val qBotRegularitySql =
    """WITH ev AS (
      |  SELECT user_id, epoch_ms(ts) AS t, event_id FROM events
      |), gaps AS (
      |  SELECT user_id, gap FROM (
      |    SELECT user_id, t - lag(t) OVER (PARTITION BY user_id
      |      ORDER BY t, event_id) AS gap
      |    FROM ev
      |  ) WHERE gap IS NOT NULL
      |), means AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
      |    CAST(sum(gap) // count(*) AS BIGINT) AS mean_gap
      |  FROM gaps GROUP BY user_id
      |), users AS (
      |  SELECT g.user_id,
      |    CAST(sum(abs(g.gap - m.mean_gap)) // max(m.n_gaps) AS BIGINT) AS mad,
      |    max(m.mean_gap) AS mean_gap, max(m.n_gaps) AS n_gaps
      |  FROM gaps g JOIN means m ON m.user_id = g.user_id
      |  GROUP BY g.user_id
      |), ratios AS (
      |  SELECT least(CASE WHEN mean_gap > 0
      |      THEN ((1000 * mad) // mean_gap) // 100 ELSE 0 END, 15) AS bucket,
      |    n_gaps
      |  FROM users
      |)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(n_gaps) AS BIGINT) AS n_gaps
      |FROM ratios GROUP BY bucket ORDER BY bucket""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_bot_regularity", qBotRegularity, Some(qBotRegularitySql))
  )
}
