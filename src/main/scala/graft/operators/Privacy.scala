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

  /** Driver-contract query: t-closeness distribution — the third member of
    * the governance trio (k-anonymity bounds group SIZE, l-diversity bounds
    * sensitive-value VARIETY; t-closeness bounds how far a group's
    * sensitive-attribute DISTRIBUTION sits from the global one, the leak
    * the first two miss when a group's values are diverse but skewed).
    * Same QI as l-diversity ((nation, coarse balance bucket)), sensitive =
    * market segment over its ORDERED ≤|segments| vocabulary (alphabetical),
    * distance = the ordered-attribute Earth Mover's Distance of Li et al.
    * 2007: EMD(p, q) = (1/(m−1)) · Σ_{j<m} |P_j − Q_j| over cumulative
    * shares. Computed in EXACT integers by cross-multiplying the cumulative
    * counts (|cum_g·N − Cum·n_g| summed, then ONE flooring division into
    * milli-units), so the DuckDB oracle is hash-exact.
    *
    * Scale shape: one hash-aggregate to (QI, segment) grain, a broadcast
    * of the m-row segment vocabulary (carrying the global cumulative counts
    * and totals — metadata-sized), a per-group window over ≤m grid rows,
    * and a final bounded histogram aggregate — linear in input, one
    * data-grain shuffle, no joins back to row grain. Integer headroom: the
    * cross-multiplied terms are ≤ n_g·N; at populations ≥ ~3·10⁹ the
    * product approaches Long range and the shares would move to
    * per-million scaling — the audit grain, not the plan, changes. */
  def qTcloseness(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.customer(s, d)
      .groupBy(col("c_nationkey").as("nation"),
        expr("(CAST(round(c_acctbal) AS BIGINT) + 100000) div 1000").as("bal_bucket"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_gs"))
    tclosenessScores(counts)
      .groupBy(expr("t_milli div 100").as("t_bucket"))
      .agg(count(lit(1)).as("n_groups"), sum("n_g").as("n_rows"),
        max("t_milli").as("max_t_milli"))
      .orderBy("t_bucket")
  }

  /** Per-QI-group t score in milli-units over a (nation, bal_bucket,
    * segment, n_gs) count relation — split from qTcloseness so the spec
    * can assert the t = 0 ⟺ identical-distribution endpoint on synthetic
    * distributions. */
  private[graft] def tclosenessScores(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ordered segment vocabulary with global cumulative counts + totals:
    // ≤|segments| rows, broadcast — every per-group comparison reads it
    val bySeg = Window.orderBy("segment")
      .rowsBetween(Window.unboundedPreceding, 0)
    val vocab = counts.groupBy("segment").agg(sum("n_gs").as("c_seg"))
      .select(col("segment"),
        sum(col("c_seg")).over(bySeg).as("cum_global"),
        row_number().over(Window.orderBy("segment")).as("pos"))
      .crossJoin(counts.agg(sum("n_gs").cast("long").as("n_total"),
        countDistinct("segment").as("m")))
    val groups = counts.groupBy("nation", "bal_bucket")
      .agg(sum("n_gs").as("n_g"))
    val byPos = Window.partitionBy("nation", "bal_bucket").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, 0)
    groups.crossJoin(broadcast(vocab))
      .join(counts, Seq("nation", "bal_bucket", "segment"), "left")
      .withColumn("cum_g",
        sum(coalesce(col("n_gs"), lit(0L))).over(byPos))
      // the j = m term is identically zero (both cumulatives hit their
      // totals); excluding it matches the Σ_{j<m} form exactly
      .filter(col("pos") < col("m"))
      .groupBy("nation", "bal_bucket", "n_g", "n_total", "m")
      .agg(sum(abs(col("cum_g") * col("n_total") -
        col("cum_global") * col("n_g"))).as("emd_num"))
      .withColumn("t_milli",
        when(col("m") > 1,
          expr("(1000 * emd_num) div (n_g * n_total * (m - 1))"))
          .otherwise(lit(0L)))
  }

  private val qTclosenessSql =
    """WITH counts AS MATERIALIZED (
      |  SELECT c_nationkey AS nation,
      |    (CAST(round(c_acctbal) AS BIGINT) + 100000) // 1000 AS bal_bucket,
      |    c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_gs
      |  FROM customer GROUP BY 1, 2, 3
      |), vocab AS (
      |  SELECT segment,
      |    CAST(sum(sum(n_gs)) OVER (ORDER BY segment
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_global,
      |    CAST(row_number() OVER (ORDER BY segment) AS BIGINT) AS pos
      |  FROM counts GROUP BY segment
      |), tot AS (
      |  SELECT CAST(sum(n_gs) AS BIGINT) AS n_total,
      |    CAST(count(DISTINCT segment) AS BIGINT) AS m
      |  FROM counts
      |), groups AS (
      |  SELECT nation, bal_bucket, CAST(sum(n_gs) AS BIGINT) AS n_g
      |  FROM counts GROUP BY 1, 2
      |), grid AS (
      |  SELECT g.nation, g.bal_bucket, g.n_g, t.n_total, t.m, v.pos,
      |    v.cum_global,
      |    CAST(sum(coalesce(c.n_gs, 0)) OVER (PARTITION BY g.nation,
      |      g.bal_bucket ORDER BY v.pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_g
      |  FROM groups g CROSS JOIN vocab v CROSS JOIN tot t
      |  LEFT JOIN counts c ON c.nation = g.nation
      |    AND c.bal_bucket = g.bal_bucket AND c.segment = v.segment
      |), pergroup AS (
      |  SELECT nation, bal_bucket, n_g, n_total, m,
      |    CAST(sum(abs(cum_g * n_total - cum_global * n_g)) AS BIGINT)
      |      AS emd_num
      |  FROM grid WHERE pos < m
      |  GROUP BY nation, bal_bucket, n_g, n_total, m
      |), scored AS (
      |  SELECT nation, bal_bucket, n_g,
      |    CASE WHEN m > 1
      |      THEN (1000 * emd_num) // (n_g * n_total * (m - 1))
      |      ELSE 0 END AS t_milli
      |  FROM pergroup
      |)
      |SELECT CAST(t_milli // 100 AS BIGINT) AS t_bucket,
      |  CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(sum(n_g) AS BIGINT) AS n_rows,
      |  CAST(max(t_milli) AS BIGINT) AS max_t_milli
      |FROM scored GROUP BY 1 ORDER BY t_bucket""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_kanonymity", qKanonymity, Some(qKanonymitySql)),
    Q("q_l_diversity", qLDiversity, Some(qLDiversitySql)),
    Q("q_tcloseness", qTcloseness, Some(qTclosenessSql))
  )
}
