package graft

import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import operators.Graph._

  test("pagerank: dense ranks, floor bound, deterministic across runs") {
    val rows = qPagerankCopurchase(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rk") == i + 1L)
      // every node's rank >= the damping floor (1-d)·1e6
      assert(r.getAs[Long]("rank_micro") >= 150000L)
      assert(r.getAs[Long]("degree") >= 1L)
    }
    val scores = rows.map(_.getAs[Long]("rank_micro"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "ranks must be non-increasing down the ranking")
    // integer arithmetic ⇒ bit-identical re-run (no float accumulation order)
    val again = qPagerankCopurchase(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("triangle counts: degree orientation agrees with naive id orientation") {
    import org.apache.spark.sql.functions._
    // independent naive formulation: a<b<c by id, count per node
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    val und = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct().cache()
    val naive = und.as("ab").join(und.as("ac"),
        col("ab.u") === col("ac.u") && col("ab.v") < col("ac.v"))
      .select(col("ab.u").as("x"), col("ab.v").as("y"), col("ac.v").as("z"))
      .join(und.as("bc"), col("y") === col("bc.u") && col("z") === col("bc.v"), "left_semi")
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("naive_n"))
    val got = qTriangleCount(spark, sf)
    assert(got.count() > 0)
    val joined = got.join(naive, col("p_partkey") === col("node")).collect()
    assert(joined.length == got.count(),
      "every reported node must exist in the naive per-node counts")
    joined.foreach { r =>
      assert(r.getAs[Long]("n_triangles") == r.getAs[Long]("naive_n"),
        s"degree-oriented count disagrees with naive at node ${r.getAs[Long]("node")}")
    }
  }

  test("co-purchase edges are symmetric and loop-free") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") =!= col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst")).distinct()
    assert(edges.filter(col("src") === col("dst")).count() == 0)
    val asym = edges.as("e").join(edges.as("r"),
        col("e.src") === col("r.dst") && col("e.dst") === col("r.src"), "left_anti")
    assert(asym.count() == 0, "every edge must have its reverse")
  }
}
