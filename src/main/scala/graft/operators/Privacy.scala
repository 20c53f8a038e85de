package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-governance / re-identification-risk audits — the release gate a
  * training-data pipeline runs before shipping a corpus that carries user
  * attributes (the reference handles sensitive legislative-actor data;
  * sheaswauger/dissertation-data-pipeline scripts/legislation/utils.py
  * normalizes it — these queries are the corresponding disclosure audit).
  *
  * Scale shape: both audits are one hash-aggregate to quasi-identifier
  * group grain followed by arithmetic on a BOUNDED summary (threshold
  * rows / the distinct-count domain) — no windows over data, no joins
  * back to row grain, linear in input and flat in output. At 100 TB the
  * QI aggregate is the same single shuffle any groupBy-count pays.
  */
object Privacy {

  /** QI groups over customer: (nation, market segment, coarse balance
    * bucket) — the classic quasi-identifier shape (location × category ×
    * binned numeric). The +100000 offset keeps the bucket argument
    * non-negative so Spark's truncating `div` and DuckDB's flooring `//`
    * agree (acctbal goes negative). */
  private def qiGroups(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_nationkey").as("nation"),
        col("c_mktsegment").as("segment"),
        expr("(CAST(round(c_acctbal) AS BIGINT) + 100000) div 100").as("bal_bucket"))
      .agg(count(lit(1)).as("gsize"))

  /** Driver-contract query: k-anonymity risk report — for each k
    * threshold, how many QI groups and rows sit in groups smaller than k
    * (re-identifiable at that k), with the row share in milli-units. */
  def qKanonymity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val groups = qiGroups(s, d)
    val total = groups.agg(sum("gsize").as("total_rows"))
    val ks = Seq(2L, 5L, 10L, 20L).toDF("k")
    groups.crossJoin(broadcast(ks))
      .groupBy("k")
      .agg(
        sum(when(col("gsize") < col("k"), 1L).otherwise(0L)).as("groups_below"),
        sum(when(col("gsize") < col("k"), col("gsize")).otherwise(0L))
          .as("rows_below"))
      .crossJoin(broadcast(total))
      .select(col("k"), col("groups_below"), col("rows_below"),
        expr("(1000 * rows_below) div total_rows").as("risk_milli"))
      .orderBy("k")
  }

  private val qKanonymitySql =
    """WITH groups AS MATERIALIZED (
      |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
      |    (CAST(round(c_acctbal) AS BIGINT) + 100000) // 100 AS bal_bucket,
      |    CAST(count(*) AS BIGINT) AS gsize
      |  FROM customer GROUP BY 1, 2, 3
      |), total AS (SELECT CAST(sum(gsize) AS BIGINT) AS total_rows FROM groups)
      |SELECT CAST(k.k AS BIGINT) AS k,
      |  CAST(sum(CASE WHEN g.gsize < k.k THEN 1 ELSE 0 END)
      |    AS BIGINT) AS groups_below,
      |  CAST(sum(CASE WHEN g.gsize < k.k THEN g.gsize ELSE 0 END)
      |    AS BIGINT) AS rows_below,
      |  CAST((1000 * sum(CASE WHEN g.gsize < k.k THEN g.gsize ELSE 0 END))
      |    // any_value(t.total_rows) AS BIGINT) AS risk_milli
      |FROM groups g
      |CROSS JOIN (SELECT * FROM (VALUES (2), (5), (10), (20)) AS v(k)) k
      |CROSS JOIN total t
      |GROUP BY k.k ORDER BY k.k""".stripMargin

  /** Driver-contract query: l-diversity distribution — with (nation,
    * balance bucket) as the QI and market segment as the sensitive
    * attribute, the distribution of per-group distinct sensitive values
    * (groups at l = 1 leak the attribute outright). */
  def qLDiversity(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d)
      .groupBy(col("c_nationkey").as("nation"),
        expr("(CAST(round(c_acctbal) AS BIGINT) + 100000) div 1000").as("bal_bucket"))
      .agg(countDistinct("c_mktsegment").as("l"),
        count(lit(1)).as("n"))
      .groupBy("l")
      .agg(count(lit(1)).as("n_groups"), sum("n").as("n_rows"))
      .orderBy("l")
  }

  private val qLDiversitySql =
    """WITH groups AS (
      |  SELECT c_nationkey, (CAST(round(c_acctbal) AS BIGINT) + 100000) // 1000
      |      AS bal_bucket,
      |    CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM customer GROUP BY 1, 2
      |)
      |SELECT l, CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(sum(n) AS BIGINT) AS n_rows
      |FROM groups GROUP BY l ORDER BY l""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_kanonymity", qKanonymity, Some(qKanonymitySql)),
    Q("q_l_diversity", qLDiversity, Some(qLDiversitySql))
  )
}
