package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-aware joins. AQE's skew-join handling covers sort-merge joins at
  * runtime; explicit salting is the deterministic plan-level tool when one
  * key dominates (the classic 100 TB failure mode: one hot user/key pins a
  * single reducer for hours).
  *
  * `saltedJoin` splits each hot fact key across `saltFactor` reducers and
  * replicates the (small) dim side per salt — result is identical to the
  * plain join, verified both by the DuckDB oracle (plain SQL join) and
  * SkewSpec.
  */
object Skew {

  /** Inner-join fact to a small dim with the fact side salted.
    * The salt must depend only on intra-row data (here: a hash of the fact's
    * whole key + a rotating component) so it's deterministic and uniform. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      saltFactor: Int,
      saltSource: Column): DataFrame = {
    val salted = fact.withColumn("_salt", pmod(xxhash64(saltSource), lit(saltFactor)))
    val replicated = dim.withColumn("_salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated,
      salted(factKey) === replicated(dimKey) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** events ⋈ customer on user_id via the salted path, then aggregate.
    * Must produce exactly what the plain join produces (the oracle IS the
    * plain join). */
  def qSaltedJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"))
    saltedJoin(ev, cust, "user_id", "c_custkey", 8, col("event_id"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("c_mktsegment")
  }

  private val qSaltedJoinSql =
    """SELECT c_mktsegment,
      |  count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users,
      |  round(sum(value), 2) AS total_value
      |FROM events
      |JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Two-phase SALTED AGGREGATION: the skew tool for aggregates (salted
    * joins fix joins; a hot GROUP BY key still pins one reducer during the
    * final aggregate). Phase 1 aggregates on (key, salt) — the hot key's
    * rows spread over `saltFactor` reducers; phase 2 re-aggregates the tiny
    * per-salt partials by key. Orders' o_orderstatus is 3-valued, the
    * worst-case skew shape. Every aggregate here re-composes exactly
    * (count→sum, sum→sum, min→min); value sums in exact integer cents.
    * Oracle = the plain single-phase GROUP BY. */
  def qSaltedAgg(s: SparkSession, d: String): DataFrame = {
    val saltFactor = 16
    Tables.orders(s, d)
      .withColumn("_salt", pmod(xxhash64(col("o_orderkey")), lit(saltFactor)))
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .groupBy(col("o_orderstatus"), col("_salt"))
      .agg(count(lit(1)).as("pn"), sum("cents").as("ps"), min("cents").as("pm"))
      .groupBy("o_orderstatus")
      .agg(sum("pn").as("n_orders"), sum("ps").as("total_cents"),
        min("pm").as("min_cents"))
      .orderBy("o_orderstatus")
  }

  private val qSaltedAggSql =
    """SELECT o_orderstatus,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
      |  CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_cents
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_salted_join", qSaltedJoin, Some(qSaltedJoinSql)),
    Q("q_salted_agg", qSaltedAgg, Some(qSaltedAggSql))
  )
}
