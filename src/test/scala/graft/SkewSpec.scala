package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {

  test("salted join result equals plain join result exactly") {
    val salted = Skew.qSaltedJoin(spark, sf).collect()
    val plain = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf), col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("c_mktsegment")
      .collect()
    assert(salted.length == plain.length && salted.nonEmpty)
    salted.zip(plain).foreach { case (a, b) => assert(a == b) }
  }

  test("salting spreads a hot key across saltFactor partitions") {
    val ev = Tables.events(spark, sf)
    val salts = ev
      .withColumn("_salt", pmod(xxhash64(col("event_id")), lit(8)))
      .select("_salt").distinct().collect().map(_.getLong(0)).toSet
    assert(salts == (0L until 8L).toSet, s"salts seen: $salts")
  }

  test("salted aggregation equals the plain single-phase aggregate") {
    val salted = operators.Skew.qSaltedAgg(spark, sf).collect()
      .map(r => r.getAs[String]("o_orderstatus") ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("total_cents"), r.getAs[Long]("min_cents")))
      .toMap
    val plain = Tables.orders(spark, sf)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"), min("cents").as("m"))
      .collect()
      .map(r => r.getAs[String]("o_orderstatus") ->
        (r.getAs[Long]("n"), r.getAs[Long]("s"), r.getAs[Long]("m")))
      .toMap
    assert(salted == plain)
    assert(salted.size == 3, "o_orderstatus is 3-valued — the worst-case skew")
  }

  test("bloom semi prune: exact result and the pre-filter actually bites") {
    val result = operators.Skew.qBloomSemiPrune(spark, sf).collect()
      .map(r => r.getAs[Long]("ship_year") ->
        (r.getAs[Long]("n_items"), r.getAs[Long]("rev_cents"))).toMap
    val dimKeys = Tables.supplier(spark, sf)
      .filter(col("s_nationkey") < 5).select("s_suppkey")
      .collect().map(_.getLong(0)).toSet
    val plain = Tables.lineitem(spark, sf)
      .filter(col("l_suppkey").isin(dimKeys.toSeq: _*))
      .groupBy(year(col("l_shipdate")).cast("long").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("c"))
      .collect().map(r => r.getAs[Long]("y") ->
        (r.getAs[Long]("n"), r.getAs[Long]("c"))).toMap
    assert(result == plain, "bloom + exact verify must equal the plain semi join")
    // the pre-filter must discard most distinct fact keys (selective dim)
    val distinctKeys = Tables.lineitem(spark, sf).select("l_suppkey").distinct().count()
    assert(dimKeys.size.toLong < distinctKeys / 2,
      "test premise: the dim must be selective for pruning to mean anything")
  }
}
