package graft

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {

  test("custom AsOfJoinExec returns exactly what the composed version returns") {
    val composed = AsOf.asofJoinComposed(spark, sf).collect()
    val custom = AsOf.asofJoinCustom(spark, sf).collect()
    assert(composed.length == custom.length && composed.nonEmpty)
    composed.zip(custom).foreach { case (a, b) => assert(a == b, s"\n$a\n$b") }
  }

  test("as-of semantics: matched click is at-or-before and is the latest such") {
    val rows = AsOf.asofJoinComposed(spark, sf).collect()
    val clicks = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .selectExpr("user_id", "ts div 1000000 as ms")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byUser = clicks.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val user = r.getAs[Long]("user_id")
      val pms = r.getAs[Long]("purchase_ms")
      val expected = byUser.getOrElse(user, Array.empty[Long]).filter(_ <= pms)
      if (expected.isEmpty) assert(r.isNullAt(r.fieldIndex("click_ms")))
      else assert(r.getAs[Long]("click_ms") == expected.max,
        s"user=$user pms=$pms got=${r.getAs[Long]("click_ms")} want=${expected.max}")
    }
  }

  test("null right-time rows are skipped, not merge-wedging (generic join API)") {
    import SparkSpec.spark.implicits._
    // nulls sort FIRST within each key: without the explicit discard the
    // merge would stop at the null head row and starve every real right row
    val left = Seq((1L, 10L), (1L, 20L), (2L, 15L), (3L, 9L))
      .toDF("k", "t")
    val right = Seq(
      (1L, Option.empty[Long], 100L), (1L, Some(5L), 101L), (1L, Some(15L), 102L),
      (2L, Option.empty[Long], 200L), (2L, Some(12L), 201L),
      (3L, Option.empty[Long], 300L))
      .toDF("rk", "rt", "rv")
    val got = AsOf.join(left, right, "k", "rk", "t", "rt")
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got.toSeq == Seq(
      (1L, 10L, Some(101L)),  // matched (1,5) — null row before it skipped
      (1L, 20L, Some(102L)),
      (2L, 15L, Some(201L)),
      (3L, 9L, None)))        // only a null-time right row: no match
  }

  test("custom operator plan contains AsOfJoinExec and co-partitioning exchanges") {
    val df = AsOf.asofJoinCustom(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
  }

  test("nearest as-of: matches a local nearest-within-tolerance recompute") {
    import org.apache.spark.sql.functions._
    val rows = AsOf.asofNearest(spark, sf).collect()
    val tol = 3600000L
    val ev = Tables.events(spark, sf)
      .withColumn("ms", graft.functions.TimeFunctions.nsToMs("ts"))
      .select("event_id", "user_id", "event_type", "ms").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("ms")))
    // deduped clicks: per (user, ms) keep max event_id
    val clicks = ev.filter(_._3 == "click").groupBy(e => (e._2, e._4))
      .map { case ((u, ms), es) => (u, ms, es.map(_._1).max) }.toSeq
    val byUser = clicks.groupBy(_._1)
    val purchases = ev.filter(_._3 == "purchase")
    assert(rows.length == purchases.length)
    val want = purchases.map { case (pid, u, _, pms) =>
      val cs = byUser.getOrElse(u, Seq.empty)
      val back = cs.filter(_._2 <= pms).sortBy(c => (-c._2, -c._3)).headOption
        .filter(c => pms - c._2 <= tol)
      val fwd = cs.filter(_._2 > pms).sortBy(c => (c._2, -c._3)).headOption
        .filter(c => c._2 - pms <= tol)
      val pick = (back, fwd) match {
        case (Some(b), Some(f)) =>
          if (pms - b._2 <= f._2 - pms) ("backward", b) else ("forward", f)
        case (Some(b), None) => ("backward", b)
        case (None, Some(f)) => ("forward", f)
        case _ => ("none", null)
      }
      pid -> pick
    }.toMap
    rows.foreach { r =>
      val pid = r.getAs[Long]("purchase_id")
      val (dir, c) = want(pid)
      assert(r.getAs[String]("direction") == dir, s"direction at $pid")
      if (dir != "none") {
        assert(r.getAs[Long]("click_id") == c._3, s"click at $pid")
        assert(r.getAs[Long]("offset_ms") == c._2 - r.getAs[Long]("purchase_ms"))
        if (dir == "backward") assert(r.getAs[Long]("offset_ms") <= 0)
        else assert(r.getAs[Long]("offset_ms") > 0)
      }
    }
  }
}
