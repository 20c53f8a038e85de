package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining classic TPC-H plan shapes, adapted to the driver's trimmed
  * star schema (no partsupp / commitdate / receiptdate / phone / container —
  * each query keeps its canonical JOIN/decorrelation pattern on the columns
  * that exist). Together with Relational.scala's Q1/Q2/Q3/Q5/Q8-alikes this
  * completes the TPC-H-class coverage of the relational core.
  *
  * Design rule throughout: the SPARK side uses the scale-optimal
  * decorrelation (aggregate-rewrite instead of per-row correlated EXISTS,
  * broadcast for dims, one shuffle per fact key), while the DUCKDB oracle
  * uses the textbook correlated formulation — a hash match is then an
  * equivalence proof for the rewrite, not just a number check.
  *
  * Money is exact integer cents everywhere (round(x*100) cast long), ratios
  * are integer basis points, and every DuckDB aggregate-derived output column
  * is CAST AS BIGINT (HUGEINT→float64 dtype trap — see ContractSpec lint).
  */
object TpchClassics {

  private def cents(c: Column): Column = round(c * 100).cast("long")
  private val netCents: Column =
    round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long")

  // ---------------------------------------------------------------------
  // q4_order_priority — TPC-H Q4: EXISTS(late line) semi-join, count by
  // priority. The semi join is an equi-join on the order key with a
  // NON-EQUI residual (l_shipdate > o_orderdate + 30 days), so the late
  // test runs inside the join without materializing matches — no
  // duplicate-order inflation, no distinct needed.
  // ---------------------------------------------------------------------

  def q4OrderPriority(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
    val l = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  private val q4Sql =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q11_important_parts — TPC-H Q11's shape (partsupp value → per-part
  // line revenue): per-part value HAVING > 1/1000 of the global total. The
  // global total is a 1-row aggregate of the ALREADY-AGGREGATED per-part
  // relation (cached), broadcast back as a cross join — the fact table is
  // scanned once, and the threshold compare is the multiply form
  // (value*1000 > total) so both engines stay in exact integers with no
  // division-semantics trap.
  // ---------------------------------------------------------------------

  def q11ImportantParts(s: SparkSession, d: String): DataFrame = {
    val supAsia = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey")
    val perPart = Tables.lineitem(s, d)
      .join(broadcast(supAsia), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey")
      .agg(sum(netCents).as("value_cents"))
      .cache()
    val total = perPart.agg(sum("value_cents").as("total_cents"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value_cents") * 1000 > col("total_cents"))
      .select("l_partkey", "value_cents")
      .orderBy(col("value_cents").desc, col("l_partkey").asc)
  }

  private val q11Sql =
    """WITH per_part AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT)
      |      AS value_cents
      |  FROM lineitem
      |  WHERE EXISTS (
      |    SELECT 1 FROM supplier
      |    JOIN nation ON s_nationkey = n_nationkey
      |    JOIN region ON n_regionkey = r_regionkey
      |    WHERE r_name = 'ASIA' AND s_suppkey = l_suppkey)
      |  GROUP BY l_partkey
      |)
      |SELECT l_partkey, value_cents
      |FROM per_part
      |WHERE value_cents * 1000 > (SELECT sum(value_cents) FROM per_part)
      |ORDER BY value_cents DESC, l_partkey""".stripMargin

  // ---------------------------------------------------------------------
  // q13_count_distribution — TPC-H Q13: customer LEFT JOIN orders (with an
  // ON-clause filter on the RIGHT side — which is why it cannot collapse
  // to an inner join), count per customer including the zero bucket, then
  // the distribution of counts. Two hash aggregations; the second input is
  // one row per customer, so the second shuffle is tiny.
  // ---------------------------------------------------------------------

  def q13CountDistribution(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    Tables.customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q13Sql =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer
      |  LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey
      |) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------------
  // q14_promo_revenue — TPC-H Q14: conditional-aggregate ratio (share of
  // one month's revenue from PROMO parts), in integer basis points. One
  // lineitem scan (month filter pushed to parquet), part broadcast, both
  // sums in the same partial aggregate — no second pass for the ratio.
  // ---------------------------------------------------------------------

  def q14PromoRevenue(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-03-01") &&
        col("l_shipdate") < lit("1997-04-01"))
    l.join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", netCents).otherwise(lit(0L)))
          .as("promo_cents"),
        sum(netCents).as("total_cents"))
      .select(col("promo_cents"), col("total_cents"),
        expr("promo_cents * 10000 div total_cents").as("promo_bp"))
  }

  private val q14Sql =
    """WITH m AS (
      |  SELECT CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS net_cents,
      |    p_type
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      |)
      |SELECT
      |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN net_cents ELSE 0 END) AS BIGINT) AS promo_cents,
      |  CAST(sum(net_cents) AS BIGINT) AS total_cents,
      |  CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN net_cents ELSE 0 END) AS BIGINT) * 10000
      |    // CAST(sum(net_cents) AS BIGINT) AS BIGINT) AS promo_bp
      |FROM m""".stripMargin

  // ---------------------------------------------------------------------
  // q16_supplier_cnt — TPC-H Q16: how many distinct suppliers can furnish
  // each (brand, type, size) bucket, EXCLUDING a supplier denylist (the
  // negative-balance suppliers stand in for the canonical complaint
  // filter). The part/supplier pairing comes from lineitem (no partsupp in
  // this schema) deduplicated BEFORE the part join; the denylist is a tiny
  // broadcast anti join; count-distinct at the end is over the already-
  // distinct pairs so the final aggregate is a plain count.
  // ---------------------------------------------------------------------

  def q16SupplierCnt(s: SparkSession, d: String): DataFrame = {
    val denied = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val pairs = Tables.lineitem(s, d)
      .select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(denied), col("l_suppkey") === col("s_suppkey"), "left_anti")
    val p = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#45" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49))
    pairs.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)
  }

  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---------------------------------------------------------------------
  // q18_large_orders — TPC-H Q18: orders whose total quantity exceeds a
  // threshold, enriched with customer. The HAVING runs on the FIRST
  // aggregate (map-side partial sums shrink the shuffle), and only the
  // surviving handful of orderkeys join back — orders/customer join after
  // the filter, not before, so the big-side join input is tiny.
  // ---------------------------------------------------------------------

  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(round(sum(col("l_quantity"))).cast("long").as("sum_qty"))
      .filter(col("sum_qty") > 250)
    big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), cents(col("o_totalprice")).as("total_cents"),
        col("sum_qty"))
      .orderBy(col("total_cents").desc, col("o_orderkey").asc)
  }

  private val q18Sql =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
      |  CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents, sum_qty
      |FROM (
      |  SELECT l_orderkey, CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 250
      |) big
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_cents DESC, o_orderkey""".stripMargin

  // ---------------------------------------------------------------------
  // q19_disjunctive — TPC-H Q19: OR-of-ANDs predicate spanning both join
  // sides. The per-side implications are extracted by hand the way
  // Catalyst's disjunction-CNF pass would: part prunes to the three brands
  // (reaching the parquet scan as an IN filter), lineitem prunes to the
  // overall quantity envelope, and the residual disjunction evaluates
  // inside the broadcast join.
  // ---------------------------------------------------------------------

  def q19Disjunctive(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
    val l = Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
    val arms =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(20, 35) &&
        col("l_quantity").between(20, 30))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(arms)
      .agg(count(lit(1)).as("matched_lines"),
        coalesce(sum(netCents), lit(0L)).as("revenue_cents"))
  }

  private val q19Sql =
    """SELECT CAST(count(*) AS BIGINT) AS matched_lines,
      |  COALESCE(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT), 0)
      |    AS revenue_cents
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE
      |     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1 AND 11)
      |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 35
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // ---------------------------------------------------------------------
  // q21_waiting_supplier — TPC-H Q21: suppliers who were the ONLY late
  // supplier in a multi-supplier order ("held up the order"). Canonical
  // form is a double correlated EXISTS / NOT EXISTS self-join on lineitem;
  // the Spark plan decorrelates it into ONE per-order aggregate:
  //   supp_cnt        = countDistinct(suppkey)
  //   late_supp_cnt   = countDistinct(suppkey) over late lines
  //   lone_late_supp  = max(suppkey) over late lines   (valid when cnt=1)
  // qualifying orders are supp_cnt>=2 AND late_supp_cnt=1 — one shuffle on
  // orderkey total (the orders join is on the same key, so the groupBy
  // reuses its partitioning) versus the textbook plan's three. The DuckDB
  // oracle runs the textbook EXISTS/NOT-EXISTS — the hash match is the
  // equivalence proof. "Late" = shipped >90 days after the order date;
  // numwait counts distinct held-up ORDERS per supplier.
  // ---------------------------------------------------------------------

  def q21WaitingSupplier(s: SparkSession, d: String): DataFrame = {
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")
    val lo = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
    val perOrder = lo.groupBy("l_orderkey")
      .agg(
        countDistinct(col("l_suppkey")).as("supp_cnt"),
        countDistinct(when(late, col("l_suppkey"))).as("late_supp_cnt"),
        max(when(late, col("l_suppkey"))).as("lone_late_supp"))
      .filter(col("supp_cnt") >= 2 && col("late_supp_cnt") === 1)
    perOrder
      .groupBy("lone_late_supp")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, d)),
        col("lone_late_supp") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
  }

  private val q21Sql =
    """WITH lo AS (
      |  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |)
      |SELECT s_name, CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
      |FROM supplier
      |JOIN lo l1 ON s_suppkey = l1.l_suppkey
      |WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 90 DAY
      |  AND EXISTS (
      |    SELECT 1 FROM lo l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lo l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > l3.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  // ---------------------------------------------------------------------
  // q22_dormant_prospects — TPC-H Q22's shape: high-balance customers with
  // no recent orders (dormant ≥ 3 years stands in for the no-orders-at-all
  // clause — every synthetic customer has old orders). The global
  // average-positive-balance threshold is the multiply form
  // (cents*cnt > sum) so both engines compare exact integers; the recent-
  // orders exclusion is a LEFT ANTI join (shuffle on custkey); nation is a
  // broadcast lookup.
  // ---------------------------------------------------------------------

  def q22DormantProspects(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .withColumn("bal_cents", cents(col("c_acctbal")))
    val thresh = cust.filter(col("c_acctbal") > 0)
      .agg(sum("bal_cents").as("sum_cents"), count(lit(1)).as("pos_cnt"))
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1999-01-01"))
      .select("o_custkey")
    cust.crossJoin(broadcast(thresh))
      .filter(col("bal_cents") * col("pos_cnt") > col("sum_cents"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"), sum("bal_cents").as("total_cents"))
      .orderBy("n_name")
  }

  private val q22Sql =
    """WITH cust AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents, c_acctbal
      |  FROM customer
      |), thresh AS (
      |  SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_cents,
      |    CAST(count(*) AS BIGINT) AS pos_cnt
      |  FROM cust WHERE c_acctbal > 0
      |)
      |SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(sum(bal_cents) AS BIGINT) AS total_cents
      |FROM cust
      |JOIN nation ON c_nationkey = n_nationkey
      |CROSS JOIN thresh
      |WHERE bal_cents * pos_cnt > sum_cents
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey
      |      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q6_forecast_revenue — TPC-H Q6: the predicate-pushdown microbenchmark.
  // No join at all — one scan whose THREE range predicates (date year,
  // discount band, quantity cap) all reach the parquet reader as pushed
  // filters, then a single global sum. The plan IS the point: scan →
  // partial agg → final agg, nothing else.
  // ---------------------------------------------------------------------

  def q6ForecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(count(lit(1)).as("n_lines"),
        coalesce(sum(round(col("l_extendedprice") * col("l_discount") * 100)
          .cast("long")), lit(0L)).as("revenue_cents"))

  private val q6Sql =
    """SELECT CAST(count(*) AS BIGINT) AS n_lines,
      |  COALESCE(CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT), 0)
      |    AS revenue_cents
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------------
  // q7_nation_volume — TPC-H Q7: shipping volume BETWEEN two nations with
  // the symmetric OR condition ((supp=A and cust=B) or (supp=B and
  // cust=A)) — the pattern that defeats naive single-key pruning. Both
  // nation filters are applied on the DIM sides before broadcast (each
  // side prunes to the 2-nation subset), so the fact scan joins two tiny
  // broadcasts and the OR evaluates as the join residual.
  // ---------------------------------------------------------------------

  def q7NationVolume(s: SparkSession, d: String): DataFrame = {
    val nat = broadcast(Tables.nation(s, d)
      .filter(col("n_name").isin("NATION_3", "NATION_7")))
    val sup = Tables.supplier(s, d)
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(s, d)
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("o_orderdate")).cast("long").as("l_year"))
      .agg(sum(netCents).as("revenue_cents"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val q7Sql =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |  CAST(year(o_orderdate) AS BIGINT) AS l_year,
      |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT)
      |    AS revenue_cents
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |WHERE sn.n_name IN ('NATION_3', 'NATION_7')
      |  AND cn.n_name IN ('NATION_3', 'NATION_7')
      |  AND sn.n_name <> cn.n_name
      |GROUP BY 1, 2, 3
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ---------------------------------------------------------------------
  // q10_returned_items — TPC-H Q10: top-20 customers by revenue lost to
  // RETURNED items in one quarter. Aggregate-before-enrich: the revenue
  // ranking aggregates (custkey) FIRST, the top-20 cut runs via
  // TakeOrderedAndProject (distributed partial top-k, no global sort), and
  // only the 20 survivors join the customer/nation dims.
  // ---------------------------------------------------------------------

  def q10ReturnedItems(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1997-07-01") &&
            col("o_orderdate") < lit("1997-10-01"))
          .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(netCents).as("lost_cents"))
      .orderBy(col("lost_cents").desc, col("o_custkey").asc)
      .limit(20)
    rev.join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("lost_cents"))
      .orderBy(col("lost_cents").desc, col("c_custkey").asc)
  }

  private val q10Sql =
    """WITH rev AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT)
      |      AS lost_cents
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R'
      |    AND o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      |    AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      |  GROUP BY o_custkey
      |  ORDER BY lost_cents DESC, o_custkey
      |  LIMIT 20
      |)
      |SELECT c_custkey, c_name, n_name, lost_cents
      |FROM rev
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |ORDER BY lost_cents DESC, c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q15_top_supplier — TPC-H Q15: supplier(s) whose quarterly revenue
  // equals the GLOBAL maximum — the argmax-against-a-scalar shape (q2's
  // sibling: there the min is per-group and joins back on the group key;
  // here the max is a 1-row aggregate of the aggregate, broadcast back).
  // Ties kept, exactly like the view-based original.
  // ---------------------------------------------------------------------

  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1997-04-01"))
      .groupBy("l_suppkey")
      .agg(sum(netCents).as("total_cents"))
    val top = rev.agg(max("total_cents").as("max_cents"))
    rev.crossJoin(broadcast(top))
      .filter(col("total_cents") === col("max_cents"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_cents"))
      .orderBy("s_suppkey")
  }

  private val q15Sql =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT)
      |      AS total_cents
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey
      |)
      |SELECT s_suppkey, s_name, total_cents
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_cents = (SELECT max(total_cents) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------------
  // q20_excess_suppliers — TPC-H Q20's nested-semi shape: suppliers who
  // shipped a HOT part (1997 total quantity > 290) during 1997. The inner
  // aggregate-threshold subquery becomes a first-class relation (hot
  // parts), then TWO stacked LEFT SEMI joins: lines→hot-parts (prunes the
  // fact), suppliers→pruned-lines. No distinct needed anywhere — semi
  // joins never duplicate. The oracle runs the textbook nested IN chain.
  // ---------------------------------------------------------------------

  def q20ExcessSuppliers(s: SparkSession, d: String): DataFrame = {
    val l97 = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select("l_partkey", "l_suppkey", "l_quantity")
    val hot = l97.groupBy("l_partkey")
      .agg(round(sum("l_quantity")).cast("long").as("q"))
      .filter(col("q") > 290)
      .select("l_partkey")
    val shippers = l97
      .join(hot, Seq("l_partkey"), "left_semi")
      .select(col("l_suppkey"))
    Tables.supplier(s, d)
      .join(shippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy("s_suppkey")
  }

  private val q20Sql =
    """SELECT s_suppkey, s_name, s_acctbal
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |    AND l_partkey IN (
      |      SELECT l_partkey FROM lineitem
      |      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |      GROUP BY l_partkey
      |      HAVING CAST(round(sum(l_quantity)) AS BIGINT) > 290))
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------------
  // q9_product_profit — TPC-H Q9: profit by (supplier nation, order year)
  // where the measure combines columns from the FACT and TWO dimension
  // branches (revenue net of a part-cost term: retailprice × quantity —
  // partsupp's supplycost is absent from this schema). Part filter prunes
  // the broadcast side; orders supplies the year; exact integer cents for
  // both terms; profit may be negative, which the spec asserts happens.
  // ---------------------------------------------------------------------

  def q9ProductProfit(s: SparkSession, d: String): DataFrame = {
    val costCents =
      round(col("p_retailprice") * col("l_quantity") * 10).cast("long")
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
          .filter(col("p_name").contains("ring"))
          .select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(netCents - costCents).as("profit_cents"))
      .orderBy(col("n_name").asc, col("o_year").desc)
  }

  private val q9Sql =
    """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
      |         - CAST(round(p_retailprice * l_quantity * 10) AS BIGINT)) AS BIGINT)
      |    AS profit_cents
      |FROM lineitem
      |JOIN part     ON l_partkey = p_partkey
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%ring%'
      |GROUP BY 1, 2
      |ORDER BY n_name, o_year DESC""".stripMargin

  // ---------------------------------------------------------------------
  // q17_small_quantity — TPC-H Q17: revenue from lines whose quantity is
  // below 20% of their part's average quantity. The correlated per-part
  // average decorrelates to an aggregate joined back on the part key
  // (same pattern as q_correlated_avg's per-nation version), and the
  // FRACTIONAL threshold stays in exact integers via the multiply form:
  // qty < 0.2·(sum/cnt)  ⟺  5·qty·cnt < sum  (all positive integers).
  // ---------------------------------------------------------------------

  def q17SmallQuantity(s: SparkSession, d: String): DataFrame = {
    val qtyL = round(col("l_quantity")).cast("long")
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey"), qtyL.as("qty"), netCents.as("net"))
    val perPart = li.groupBy("l_partkey")
      .agg(sum("qty").as("sum_qty"), count(lit(1)).as("cnt"))
    li.join(perPart, "l_partkey")
      .filter(col("qty") * 5 * col("cnt") < col("sum_qty"))
      .agg(count(lit(1)).as("n_lines"),
        coalesce(sum("net"), lit(0L)).as("revenue_cents"))
  }

  private val q17Sql =
    """WITH li AS (
      |  SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS qty,
      |    CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS net
      |  FROM lineitem
      |), pp AS (
      |  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sum_qty,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM li GROUP BY l_partkey
      |)
      |SELECT CAST(count(*) AS BIGINT) AS n_lines,
      |  COALESCE(CAST(sum(net) AS BIGINT), 0) AS revenue_cents
      |FROM li JOIN pp USING (l_partkey)
      |WHERE qty * 5 * cnt < sum_qty""".stripMargin

  // ---------------------------------------------------------------------
  // q12_ship_priority — TPC-H Q12: late shipments joined to orders, split
  // into critical-vs-other priority counts per shipping class. The trimmed
  // schema has no l_shipmode/receiptdate, so the class dimension is
  // l_returnflag and "late" is shipped >60 days after the order date.
  // Plan shape preserved from the canonical query: the ship-year window
  // pushes to the lineitem parquet scan; the lateness predicate references
  // BOTH sides so it stays a join residual inside the one shuffle join;
  // the priority split is two sum(CASE) measures computed map-side as
  // partial aggregates — never two passes over the join.
  // ---------------------------------------------------------------------

  def q12ShipPriority(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select("l_orderkey", "l_returnflag", "l_shipdate")
    val o = Tables.orders(s, d)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val critical = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("l_returnflag")
      .agg(sum(when(critical, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(critical, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  private val q12Sql =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |               THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q4_order_priority", q4OrderPriority, Some(q4Sql)),
    Q("q12_ship_priority", q12ShipPriority, Some(q12Sql)),
    Q("q9_product_profit", q9ProductProfit, Some(q9Sql)),
    Q("q17_small_quantity", q17SmallQuantity, Some(q17Sql)),
    Q("q15_top_supplier", q15TopSupplier, Some(q15Sql)),
    Q("q20_excess_suppliers", q20ExcessSuppliers, Some(q20Sql)),
    Q("q6_forecast_revenue", q6ForecastRevenue, Some(q6Sql)),
    Q("q7_nation_volume", q7NationVolume, Some(q7Sql)),
    Q("q10_returned_items", q10ReturnedItems, Some(q10Sql)),
    Q("q11_important_parts", q11ImportantParts, Some(q11Sql)),
    Q("q13_count_distribution", q13CountDistribution, Some(q13Sql)),
    Q("q14_promo_revenue", q14PromoRevenue, Some(q14Sql)),
    Q("q16_supplier_cnt", q16SupplierCnt, Some(q16Sql)),
    Q("q18_large_orders", q18LargeOrders, Some(q18Sql)),
    Q("q19_disjunctive", q19Disjunctive, Some(q19Sql)),
    Q("q21_waiting_supplier", q21WaitingSupplier, Some(q21Sql)),
    Q("q22_dormant_prospects", q22DormantProspects, Some(q22Sql))
  )
}
