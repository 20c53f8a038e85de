package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relational-derived graphs. Complements the
  * connected-components core in Dedup (pointer-jumping): PageRank is the
  * other canonical "iterate a join-aggregate to fixpoint" shape, here run a
  * fixed 3 rounds so the result is closed-form and fully oracle-able as
  * unrolled SQL.
  *
  * Graph: part co-purchase — parts sharing an order are linked (the
  * item-item graph behind "customers also bought" and a stand-in for any
  * entity-cooccurrence graph a corpus pipeline derives, e.g. doc-link or
  * citation graphs).
  *
  * Scale design: edges come from a DISTINCT self-join co-partitioned on the
  * order key (per-order fanout is basket²  — bounded, ~tens — never table²);
  * the edge relation is cached and every iteration is one shuffle-join +
  * hash-aggregate on it. Ranks are integer micro-units with truncating
  * division — deterministic on both engines (all values positive), no float
  * accumulation order to diverge. At 100 TB you would bucket the edge table
  * by src so the per-iteration join is exchange-free, and checkpoint ranks
  * every ~10 rounds (3 rounds needs neither).
  */
object Graph {

  private val iters = 3

  def qPagerankCopurchase(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    // symmetric distinct co-purchase edges (both directions via p <> p)
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") =!= col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst")).distinct()
      .cache()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).cache()
    // r0 = 1.0 in micro-units; damping 0.85 as integer 850/1000
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      ranks = edges
        .join(deg, "src")
        .join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst")
        .agg(sum("c").as("sc"))
        .select(col("dst").as("node"),
          expr("150000 + (850 * sc) div 1000").as("r"))
    }
    val w = Window.orderBy(col("r").desc, col("node").asc)
    ranks.join(deg, col("node") === col("src"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 100)
      .select(col("rk"), col("node").as("p_partkey"), col("deg").as("degree"),
        col("r").as("rank_micro"))
      .orderBy("rk")
  }

  private val qPagerankCopurchaseSql: String = {
    val iterCtes = (1 to iters).map { i =>
      s"""it$i AS (
         |  SELECT e.dst AS node,
         |    CAST(150000 + (850 * sum(r.r // d.deg)) // 1000 AS BIGINT) AS r
         |  FROM e JOIN deg d ON e.src = d.src JOIN it${i - 1} r ON e.src = r.node
         |  GROUP BY e.dst
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
       |), e AS (
       |  SELECT DISTINCT a.p AS src, b.p AS dst
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.p <> b.p
       |), deg AS (
       |  SELECT src, count(*) AS deg FROM e GROUP BY src
       |), it0 AS (
       |  SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg
       |), $iterCtes
       |SELECT CAST(row_number() OVER (ORDER BY r DESC, node) AS BIGINT) AS rk,
       |  node AS p_partkey, deg AS degree, r AS rank_micro
       |FROM it$iters JOIN deg ON node = src
       |ORDER BY r DESC, node
       |LIMIT 100""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q_pagerank_copurchase", qPagerankCopurchase, Some(qPagerankCopurchaseSql)))
}
