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

  test("AQE splits the skewed partition of a hot-key sort-merge join") {
    // the RUNTIME half of the skew story (deterministic salting is the
    // planned half): with skew-join thresholds hit, AQE must replan the
    // oversized partition into splits — visible as skew=true on the join
    val s = spark
    import s.implicits._
    val restore = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> s.conf.getOption(k)).toMap
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // 1/20 of each side lands on key 0 → that shuffle partition dwarfs the
      // median and crosses the byte threshold (~3k dup rows ≈ 48KB > 20KB)
      def skewed(n: Long) = s.range(n)
        .select(when($"id" % 20 === 0, 0L).otherwise($"id").as("k"), $"id".as("v"))
      // the count MUST be computed over the same QueryExecution we inspect —
      // a fresh j.count() would build (and execute) a different plan
      val agg = skewed(60000).join(skewed(60000), "k").groupBy().count()
      assert(agg.collect().head.getLong(0) > 0)
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join partition:\n$plan")
    } finally restore.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _))
    }
  }

  test("skew profile matches a driver-side recompute of the key distribution") {
    val counts = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(_.getAs[Long]("count")).sorted
    val r = operators.Skew.qSkewProfile(spark, sf).collect().head
    val nKeys = counts.length.toLong
    val nRows = counts.sum
    val maxC = counts.max
    def quantile(q: Int, of: Int): Long = // smallest c with (keys ≤ c)·of ≥ q·nk
      counts.zipWithIndex
        .collectFirst { case (c, i) if (i + 1).toLong * of >= q * nKeys => c }.get
    assert(r.getAs[Long]("n_keys") == nKeys)
    assert(r.getAs[Long]("n_rows") == nRows)
    assert(r.getAs[Long]("max_c") == maxC)
    assert(r.getAs[Long]("p50_c") == quantile(1, 2))
    assert(r.getAs[Long]("p99_c") == quantile(99, 100))
    assert(r.getAs[Long]("top_key_share_bp") == 10000L * maxC / nRows)
    assert(r.getAs[Long]("skew_x100") == 100L * maxC * nKeys / nRows)
  }

  test("join-size estimate: exact F2 recomputes; CMS inner product never underestimates") {
    val counts = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(_.getAs[Long]("count"))
    val exactF2 = counts.map(c => c * c).sum
    val r = operators.Skew.qJoinSizeEstimate(spark, sf).collect().head
    assert(r.getAs[Long]("n_keys") == counts.length.toLong)
    assert(r.getAs[Long]("exact_f2") == exactF2)
    val est = r.getAs[Long]("est_f2")
    assert(est >= exactF2, "CMS inner product must never underestimate F2")
    assert(r.getAs[Long]("overest_bp") == 10000L * (est - exactF2) / exactF2)
  }

  test("gini: grid identity equals a naive sorted-rank recompute") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val rows = operators.Skew.qGiniConcentration(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val cs = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("c")).collect().map(_.getAs[Long]("c")).sorted
    val n = cs.length.toLong
    val t = cs.sum
    assert(r.getAs[Long]("n_users") == n)
    assert(r.getAs[Long]("n_events") == t)
    // naive: ranks 1..n ascending over the sorted totals
    val sr = cs.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
    assert(r.getAs[Long]("gini_bp") == 10000L * (2 * sr - (n + 1) * t) / (n * t))
    val k = math.max(1L, n / 10).toInt
    val top = cs.reverse.take(k).sum
    assert(r.getAs[Long]("top_decile_bp") == 10000L * top / t)
    // bounds: 0 <= gini < 10000; decile share at least its population share
    assert(r.getAs[Long]("gini_bp") >= 0 && r.getAs[Long]("gini_bp") < 10000)
    assert(r.getAs[Long]("top_decile_bp") >= 10000L * k / n - 1)
  }
}
