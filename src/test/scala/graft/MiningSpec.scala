package graft

import org.apache.spark.sql.functions._

class MiningSpec extends SparkSpec {
  import operators.Mining._

  test("hierarchy rollup: subtree sums and depths match a local tree walk") {
    val rows = qHierarchyRollup(spark, sf).collect()
    assert(rows.nonEmpty)
    val sup = Tables.supplier(spark, sf)
      .select(col("s_suppkey").cast("long"),
        round(col("s_acctbal") * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // local recompute: ancestors of k are k, k/2, ..., 1; suppkey 0 is an
    // isolated root of its own (testdata keys start at 0)
    def ancestors(k: Long): Seq[Long] = {
      val chain = Iterator.iterate(k)(_ / 2).takeWhile(_ >= 1).toSeq
      if (chain.isEmpty) Seq(k) else chain
    }
    val size = scala.collection.mutable.Map.empty[Long, Long]
    val cents = scala.collection.mutable.Map.empty[Long, Long]
    for ((k, bal) <- sup; a <- ancestors(k)) {
      size(a) = size.getOrElse(a, 0L) + 1
      cents(a) = cents.getOrElse(a, 0L) + bal
    }
    assert(rows.length == sup.size, "one output row per supplier")
    rows.foreach { r =>
      val k = r.getAs[Long]("s_suppkey")
      assert(r.getAs[Long]("depth") == ancestors(k).length - 1, s"depth of $k")
      assert(r.getAs[Long]("subtree_size") == size(k), s"size of $k")
      assert(r.getAs[Long]("subtree_cents") == cents(k), s"cents of $k")
    }
    // root 1's subtree is every node of the main tree (suppkey 0 excluded)
    val root = rows.find(_.getAs[Long]("s_suppkey") == 1L).get
    val mainTree = sup.filter(_._1 >= 1L)
    assert(root.getAs[Long]("subtree_size") == mainTree.size)
    assert(root.getAs[Long]("subtree_cents") == mainTree.values.sum)
  }

  test("itemsets: supports match a local basket count; a-priori closure holds") {
    val rows = qItemsetsApriori(spark, sf).collect()
    assert(rows.nonEmpty)
    val baskets = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").cast("long"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (_, v) => v.map(_._2).toSet }.toSeq
    val minsup = baskets.size / 100
    def support(items: Seq[String]): Int =
      baskets.count(b => items.forall(b.contains))
    val pairRows = rows.filter(_.getAs[Long]("k") == 2L)
    assert(pairRows.nonEmpty)
    rows.foreach { r =>
      val items = r.getAs[String]("itemset").split('|').toSeq
      assert(items == items.sorted && items.distinct == items)
      assert(items.length == r.getAs[Long]("k"))
      assert(r.getAs[Long]("support") == support(items), s"support of $items")
      assert(r.getAs[Long]("support") >= minsup)
    }
    // completeness: every frequent pair from the local recompute is present
    val allItems = baskets.flatten.distinct.sorted
    val expectedPairs = (for {
      i <- allItems; j <- allItems if i < j
      s = support(Seq(i, j)) if s >= minsup
    } yield s"$i|$j").toSet
    assert(pairRows.map(_.getAs[String]("itemset")).toSet == expectedPairs)
    // a-priori closure: every 2-subset of a reported triple is a reported pair
    rows.filter(_.getAs[Long]("k") == 3L).foreach { r =>
      val Seq(a, b, c) = r.getAs[String]("itemset").split('|').toSeq
      Seq(s"$a|$b", s"$a|$c", s"$b|$c").foreach(p =>
        assert(expectedPairs.contains(p), s"subset $p of triple must be frequent"))
    }
  }

  test("gini split: impurities match a local contingency recompute; argmin flagged") {
    val rows = qGiniSplit(spark, sf).collect()
    assert(rows.nonEmpty)
    val pts = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long"), col("l_returnflag")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = pts.length.toLong
    val thresholds = pts.map(_._1).distinct.sorted
    val classes = pts.map(_._2).distinct
    def gini(thr: Long): (Long, Long, Long) = {
      val left = pts.filter(_._1 <= thr)
      val right = pts.filter(_._1 > thr)
      def imp(side: Array[(Long, String)]): Long = {
        val ns = side.length.toLong
        val s2 = classes.map(c => { val k = side.count(_._2 == c).toLong; k * k }).sum
        (1000000L * (ns * ns - s2)) / (ns * ns)
      }
      (left.length.toLong, right.length.toLong,
        (left.length * imp(left) + right.length * imp(right)) / n)
    }
    assert(rows.length == thresholds.count(t => pts.exists(_._1 > t)))
    rows.foreach { r =>
      val (nl, nr, g) = gini(r.getAs[Long]("thr"))
      assert(r.getAs[Long]("n_l") == nl && r.getAs[Long]("n_r") == nr)
      assert(r.getAs[Long]("gini_micro") == g, s"gini at thr ${r.getAs[Long]("thr")}")
    }
    // exactly one best, and it attains the minimum
    val best = rows.filter(_.getAs[Long]("is_best") == 1L)
    assert(best.length == 1)
    assert(best.head.getAs[Long]("gini_micro") ==
      rows.map(_.getAs[Long]("gini_micro")).min)
  }

  test("seq pairs: precedence counts match a local first-touch recompute") {
    val rows = qSeqPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    val ms = functions.TimeFunctions.nsToMs("ts")
    val ft = Tables.events(spark, sf)
      .groupBy(col("user_id"), col("event_type")).agg(min(ms).as("fms"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val expect = scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    for ((_, es) <- ft; a <- es; b <- es if a._3 < b._3) {
      val k = (a._2, b._2)
      val (c, g) = expect.getOrElse(k, (0L, 0L))
      expect(k) = (c + 1, g + (b._3 - a._3))
    }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("first_type"), r.getAs[String]("then_type"))
      val (c, g) = expect(k)
      assert(r.getAs[Long]("n_users") == c, s"count for $k")
      assert(r.getAs[Long]("mean_gap_ms") == g / c, s"gap for $k")
    }
    // a user pair can count in both directions only via DIFFERENT events —
    // self pair (t, t) never appears (first-touch is unique per type)
    rows.foreach(r =>
      assert(r.getAs[String]("first_type") != r.getAs[String]("then_type")))
  }

  test("top paths: session-opening sequences match a local sessionizer") {
    val rows = qTopPaths(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ms = functions.TimeFunctions.nsToMs("ts")
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), ms.as("ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val paths = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._4, e._2))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer[String]())
      var prev = Long.MinValue
      var first = true
      sorted.foreach { e =>
        if (!first && e._4 - prev > 30L * 60 * 1000)
          sessions += scala.collection.mutable.ArrayBuffer[String]()
        sessions.last += e._3
        prev = e._4; first = false
      }
      sessions.map(_.take(3).mkString(">"))
    }.toSeq
    val counts = paths.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(rows.length)
    val got = rows.sortBy(_.getAs[Long]("rk"))
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n_sessions"))).toSeq
    assert(got == expect)
  }
}
