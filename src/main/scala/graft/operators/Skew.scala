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

  /** Bloom-filter SEMI-JOIN REDUCTION: prune the fact side against a compact
    * membership summary of the dim keys BEFORE the join — the classic
    * distributed-join optimization (runtime filters in warehouses; Spark's
    * own InjectRuntimeFilter) made explicit and engine-portable. The "bloom
    * filter" is k=4 bit positions per key over a 2^16-bit space, derived
    * from md5 nibbles; it is represented RELATIONALLY as the broadcast
    * distinct-positions set, and a fact key survives iff all 4 of its
    * positions are set (exactly a Bloom membership test, false positives
    * included). Survivors are then EXACTLY verified against the dim, so the
    * result is precise and oracled against the plain semi-join SQL.
    *
    * Scale story: the bloom test runs on the DISTINCT fact keys (narrow)
    * against a broadcast position set, so the wide fact shuffle happens only
    * for keys that pass — at 100 TB that is the difference between shuffling
    * the whole fact table and shuffling the selective slice. SkewSpec
    * asserts the pruning actually bites (candidates ≪ distinct keys). */
  def qBloomSemiPrune(s: SparkSession, d: String): DataFrame = {
    def positions(key: Column): Column = array((0 until 4).map(j =>
      pmod(conv(substring(md5(key.cast("string")), 4 * j + 1, 4), 16, 10)
        .cast("long"), lit(65536L))): _*)
    val dim = Tables.supplier(s, d)
      .filter(col("s_nationkey") < 5).select(col("s_suppkey"))
    val dimPos = dim
      .select(explode(positions(col("s_suppkey"))).as("pos")).distinct()
    val factKeys = Tables.lineitem(s, d).select(col("l_suppkey")).distinct()
    val candidates = factKeys
      .select(col("l_suppkey"), posexplode(positions(col("l_suppkey")))
        .as(Seq("j", "pos")))
      .join(broadcast(dimPos), "pos")
      .groupBy("l_suppkey").agg(count(lit(1)).as("hits"))
      .filter(col("hits") === 4)
    // exact verification of the bloom survivors, then the pruned fact join
    val verified = candidates
      .join(broadcast(dim), col("l_suppkey") === col("s_suppkey"))
      .select("l_suppkey")
    Tables.lineitem(s, d)
      .join(broadcast(verified), "l_suppkey")
      .groupBy(year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("rev_cents"))
      .orderBy("ship_year")
  }

  private val qBloomSemiPruneSql =
    """SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
      |  count(*) AS n_items,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      |FROM lineitem
      |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
      |GROUP BY 1 ORDER BY ship_year""".stripMargin


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
    Q("q_bloom_semi_prune", qBloomSemiPrune, Some(qBloomSemiPruneSql)),
    Q("q_salted_agg", qSaltedAgg, Some(qSaltedAggSql))
  )
}
