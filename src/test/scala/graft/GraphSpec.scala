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

  test("label propagation: two planted cliques resolve to two communities") {
    import SparkSpec.spark.implicits._
    // two 4-cliques bridged by a single edge (4—11); hand-traced
    // synchronous LPA with min-label ties converges to communities 1, 11
    val cliqueA = Seq(1L, 2L, 3L, 4L)
    val cliqueB = Seq(11L, 12L, 13L, 14L)
    def clique(ns: Seq[Long]) =
      for { a <- ns; b <- ns if a != b } yield (a, b)
    val edges = (clique(cliqueA) ++ clique(cliqueB) ++ Seq((4L, 11L), (11L, 4L)))
      .toDF("src", "dst")
    val rows = operators.Graph.labelPropagationOn(edges).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("community") == 1L &&
      rows(0).getAs[Long]("n_members") == 4L)
    assert(rows(1).getAs[Long]("community") == 11L &&
      rows(1).getAs[Long]("n_members") == 4L)
    // driver graph: community sizes partition the node set exactly... up to
    // the top-50 cut, so just check conservation bounds and ranking shape
    val real = operators.Graph.qLabelPropagation(spark, sf).collect()
    assert(real.nonEmpty && real.length <= 50)
    val sizes = real.map(_.getAs[Long]("n_members"))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b })
  }

  test("kcore: trajectory is monotone non-increasing and round 12 is a true fixpoint") {
    val rows = qKcore(spark, sf).collect()
    assert(rows.length == 13)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("peel_round") == i.toLong)
    }
    val survivors = rows.map(_.getAs[Long]("survivors"))
    assert(survivors.zip(survivors.tail).forall { case (a, b) => a >= b },
      "peeling can only shrink the survivor set")
    // fixpoint: the last two rounds must agree in BOTH count and node_sum —
    // so the final row is the exact k-core, not a truncated approximation
    assert(rows(11).getAs[Long]("survivors") == rows(12).getAs[Long]("survivors"))
    assert(rows(11).getAs[Long]("node_sum") == rows(12).getAs[Long]("node_sum"))
    // hand-check the peel semantics on a planted graph: a 4-clique (3-core)
    // plus a pendant path — the path peels away, the clique survives
    import SparkSpec.spark.implicits._
    val cliq = for { a <- 1L to 4L; b <- 1L to 4L if a != b } yield (a, b)
    val path = Seq((4L, 5L), (5L, 4L), (5L, 6L), (6L, 5L))
    val edges = (cliq ++ path).toDF("src", "dst")
    var cur = edges.select(col("src").as("node")).distinct()
    for (_ <- 1 to 3) {
      cur = edges
        .join(cur.select(col("node").as("sn")), col("src") === col("sn"))
        .join(cur.select(col("node").as("dn")), col("dst") === col("dn"))
        .groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 3).select(col("src").as("node"))
    }
    assert(cur.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("bfs layers: hop histogram covers seeds at hop 0 and min-hop is stable") {
    val rows = qBfsLayers(spark, sf).collect()
    assert(rows.nonEmpty)
    val hops = rows.map(_.getAs[Long]("hop"))
    assert(hops.head == 0L && hops.forall(h => h >= 0L && h <= 3L))
    // exactly the seed count at hop 0 (seeds are in the edge relation)
    assert(rows.head.getAs[Long]("n_nodes") == 20L)
    // deterministic across runs (pure integer min-aggregation)
    val again = qBfsLayers(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // every node appears in exactly one layer: layer sizes sum to the
    // number of distinct reachable nodes
    val total = rows.map(_.getAs[Long]("n_nodes")).sum
    assert(total >= 20L)
  }

  test("link predict: scores agree with a naive local recompute; no adjacent pairs") {
    val rows = qLinkPredict(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // naive local recompute over the collected multi-order edge set
    val es = operators.Graph.multiOrderEdges(spark, sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val adj = es.groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
    val deg = adj.map { case (k, v) => (k, v.size.toLong) }
    val pairs = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((z, ns) <- adj; a <- ns; b <- ns if a < b) {
      val (cn, ra) = pairs.getOrElse((a, b), (0L, 0L))
      pairs((a, b)) = (cn + 1, ra + 1000000L / deg(z))
    }
    val naive = pairs.filter { case ((a, b), _) => !adj(a).contains(b) }
    rows.foreach { r =>
      val k = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))
      assert(naive.contains(k), s"pair $k must be non-adjacent with common neighbors")
      assert(naive(k) == (r.getAs[Long]("common_n"), r.getAs[Long]("ra_micro")),
        s"scores for $k")
    }
    // ranking is by the declared key and the top-100 really is the top
    val top = naive.toSeq.map { case ((a, b), (cn, ra)) => (-ra, -cn, a, b) }.sorted
      .take(rows.length)
    assert(rows.map(r => (-r.getAs[Long]("ra_micro"), -r.getAs[Long]("common_n"),
      r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))).toSeq == top)
  }

  test("sssp: bucketed distances match a local 3-round Bellman-Ford") {
    val rows = qSsspWeighted(spark, sf).collect()
    assert(rows.nonEmpty)
    // local recompute from the raw weighted edge list
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    val rowsLi = li.collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = rowsLi.groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
    val cooc = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for ((_, ps) <- byOrder; a <- ps; b <- ps if a != b)
      cooc((a, b)) = cooc.getOrElse((a, b), 0L) + 1
    val pairs = cooc.toSeq.collect {
      case ((s0, d0), n) if n >= 2 => (s0, d0, 1000000L / n)
    }
    val seeds = pairs.map(_._1).distinct.sorted.take(20)
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      val relaxed = pairs.flatMap { case (s0, d0, w) =>
        dist.get(s0).map(ds => (d0, ds + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, v) => (k, v.map(_._2).min) }
    }
    val expect = dist.toSeq.groupBy(_._2 / 100000L)
      .map { case (b, v) => (b, (v.size.toLong, v.map(_._1).sum)) }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (nn, sum0) = expect(r.getAs[Long]("dist_bucket"))
      assert(r.getAs[Long]("n_nodes") == nn && r.getAs[Long]("node_sum") == sum0)
    }
    // bucket 0 exists: the seeds themselves are at distance 0
    assert(rows.head.getAs[Long]("dist_bucket") == 0L)
  }

  test("staged traversal variants equal unstaged; staged plans never re-derive from lineitem") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSeq
    val pairs = Seq(
      ("kcore", qKcore(spark, sf), qKcoreStaged(spark, sf)),
      ("bfs_layers", qBfsLayers(spark, sf), qBfsLayersStaged(spark, sf)),
      ("sssp", qSsspWeighted(spark, sf), qSsspWeightedStaged(spark, sf)),
      ("link_predict", qLinkPredict(spark, sf), qLinkPredictStaged(spark, sf)),
      ("assortativity", qAssortativity(spark, sf), qAssortativityStaged(spark, sf)))
    pairs.foreach { case (name, plain, staged) =>
      assert(rows(plain) == rows(staged), s"$name: staged result differs")
    }
    // Plan assertion on the EDGE RELATION the staged variants consume, not
    // the algorithms' final executedPlan: kcore/sssp localCheckpoint per
    // round, so their final plan shows only RDD scans and a lineitem
    // re-derivation would be invisible there (r14 advice). The multi-order
    // relation must scan the staged bucketed table and nothing upstream.
    val multi = operators.Graph.stagedMultiEdgeRelation(spark, sf)
    val multiPlan = multi.queryExecution.executedPlan.toString
    assert(multiPlan.toLowerCase.contains("graft_edges_multi"),
      s"staged multi-order relation must scan the edges_multi table:\n$multiPlan")
    assert(!multiPlan.contains("lineitem"),
      s"staged multi-order relation re-derives from lineitem:\n$multiPlan")
    // same for the oriented layout qAssortativityStaged reads
    val orient = spark.table(operators.Graph.ensureEdgesStaged(spark, sf))
    val orientPlan = orient.queryExecution.executedPlan.toString
    assert(orientPlan.toLowerCase.contains("graft_edges_orient") &&
      !orientPlan.contains("lineitem"),
      s"staged oriented relation must scan edges_orient only:\n$orientPlan")
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

  test("degree hist: bands partition nodes and conserve edge endpoints") {
    val rows = operators.Graph.qDegreeHist(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct().collect().map(r => (r.getAs[Long]("ok"), r.getAs[Long]("p")))
    val byOrder: Seq[Set[Long]] =
      li.groupBy(_._1).values.map(_.map(_._2).toSet).toSeq
    val edges: Set[(Long, Long)] = byOrder.flatMap { parts =>
      parts.toSeq.flatMap(a => parts.toSeq.filter(_ != a).map(b => (a, b)))
    }.toSet
    val deg: Map[Long, Int] =
      edges.groupBy(_._1).map { case (n, es) => n -> es.size }
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == deg.size)
    assert(rows.map(_.getAs[Long]("band_edges")).sum == deg.values.map(_.toLong).sum)
    rows.foreach { r =>
      val b = r.getAs[Long]("band")
      assert(r.getAs[Long]("min_deg") >= (1L << b) &&
        r.getAs[Long]("max_deg") < (1L << (b + 1)), s"band $b bounds")
    }
  }

  test("hits: authority scores recompute from the bipartite edges; top-25 honest") {
    import org.apache.spark.sql.functions.col
    val rows = qHits(spark, sf).collect()
    assert(rows.length == 25)
    assert(rows.head.getAs[Long]("auth_micro") == 1000000L)
    // monotone by rank, ids break ties
    rows.sliding(2).foreach { case Array(a, b) =>
      val (sa, sb) = (a.getAs[Long]("auth_micro"), b.getAs[Long]("auth_micro"))
      assert(sa > sb || (sa == sb &&
        a.getAs[Long]("p_partkey") < b.getAs[Long]("p_partkey")))
    }
    // local recompute of the 2-round L-inf-normalized mutual reinforcement
    val e = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def norm(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = m.values.max
      m.view.mapValues(v => 1000000L * v / mx).toMap
    }
    val h1 = norm(e.groupBy(_._1).view.mapValues(_.length * 1000000L).toMap)
    val a1 = norm(e.groupBy(_._2).view.mapValues(_.map(x => h1(x._1)).sum).toMap)
    val h2 = norm(e.groupBy(_._1).view.mapValues(_.map(x => a1(x._2)).sum).toMap)
    val a2 = norm(e.groupBy(_._2).view.mapValues(_.map(x => h2(x._1)).sum).toMap)
    val indeg = e.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val p = r.getAs[Long]("p_partkey")
      assert(r.getAs[Long]("auth_micro") == a2(p), s"auth for part $p")
      assert(r.getAs[Long]("in_deg") == indeg(p), s"indeg for part $p")
    }
    // the top-25 really are the global top by (score desc, id asc)
    val top = a2.toSeq.sortBy { case (p, sc) => (-sc, p) }.take(25).map(_._1)
    assert(rows.map(_.getAs[Long]("p_partkey")).toSeq == top)
  }

  test("assortativity: r recomputes from the naive edge-degree moments") {
    import org.apache.spark.sql.functions.col
    val rows = qAssortativity(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val und = li.groupBy(_._1).values.toSeq.flatMap { g =>
      val ps = g.map(_._2).distinct.toSeq
      ps.flatMap(a => ps.collect { case b if a < b => (a, b) })
    }.toSet
    val deg = und.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val dir = und.toSeq.flatMap { case (u, v) =>
      Seq((deg(u), deg(v)), (deg(v), deg(u)))
    }
    assert(r.getAs[Long]("n_edges") == und.size.toLong)
    val n = dir.length.toDouble
    val sx = dir.map(_._1).sum.toDouble
    val sxy = dir.map(e => e._1 * e._2).sum.toDouble
    val sxx = dir.map(e => e._1 * e._1).sum.toDouble
    val rr = 1000 * ((n * sxy - sx * sx) / (n * sxx - sx * sx))
    assert(math.abs(r.getAs[Long]("r_milli") - math.round(rr)) <= 1)
    // correlation bound
    assert(math.abs(r.getAs[Long]("r_milli")) <= 1000)
    assert(r.getAs[Long]("mean_deg") == dir.map(_._1).sum / dir.length)
  }

  test("clustering coeff: totals recompute from a naive triangle/wedge count") {
    import org.apache.spark.sql.functions.col
    val rows = qClusteringCoeff(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val und = li.groupBy(_._1).values.toSeq.flatMap { g =>
      val ps = g.map(_._2).distinct.toSeq
      ps.flatMap(a => ps.collect { case b if a < b => (a, b) })
    }.toSet
    val adj = (und.toSeq ++ und.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val wedges = adj.values.map { ns =>
      ns.size.toLong * (ns.size - 1) / 2
    }.sum
    val tris = und.toSeq.map { case (u, v) =>
      (adj(u) & adj(v)).size.toLong
    }.sum / 3 // each triangle counted once per edge
    assert(r.getAs[Long]("n_edges") == und.size.toLong)
    assert(r.getAs[Long]("n_nodes") == adj.size.toLong)
    assert(r.getAs[Long]("n_wedges") == wedges)
    assert(r.getAs[Long]("n_triangles") == tris)
    assert(r.getAs[Long]("transitivity_bp") == 30000L * tris / wedges)
    assert(r.getAs[Long]("transitivity_bp") <= 10000L)
  }

  test("modularity: two disjoint triangles read exactly Q = 0.5; sf graph in [-1, 1]") {
    import org.apache.spark.sql.functions._
    // symmetric directed relation of two disjoint triangles {1,2,3}, {4,5,6}
    val und = Seq((1L,2L),(2L,3L),(1L,3L),(4L,5L),(5L,6L),(4L,6L))
    val edges = spark.createDataFrame(und ++ und.map(_.swap)).toDF("src","dst")
    val r = operators.Graph.modularityOn(edges).collect()(0)
    assert(r.getAs[Long]("n_communities") == 2L)
    assert(r.getAs[Long]("n_edges") == 6L)
    assert(r.getAs[Long]("intra_edges") == 6L)
    assert(r.getAs[Long]("modularity_micro") == 500000L)
    val sf0 = operators.Graph.qGraphModularity(spark, sf).collect()(0)
    assert(math.abs(sf0.getAs[Long]("modularity_micro")) <= 1000000L)
    assert(sf0.getAs[Long]("intra_edges") <= sf0.getAs[Long]("n_edges"))
  }

  test("wedge closing check: broadcast below the |E| gate, shuffled-hash (never sort-merge) above") {
    import org.apache.spark.sql.functions._
    val wedges = spark.range(1000).select(
      (col("id") % 10).as("y"), (col("id") % 7).as("z"))
    val closing = spark.range(50).select(
      (col("id") % 10).as("cy"), (col("id") % 7).as("cz"))
    def planWith(nEdges: Long): String = wedges
      .join(operators.Graph.closingSideFor(closing, nEdges),
        col("y") === col("cy") && col("z") === col("cz"), "left_semi")
      .queryExecution.sparkPlan.toString
    val below = planWith(operators.Graph.closingBroadcastGate - 1)
    assert(below.contains("BroadcastHashJoin"), s"no broadcast below gate:\n$below")
    val above = planWith(operators.Graph.closingBroadcastGate + 1)
    // the sort-merge fallback sorts the O(sum outdeg^2) wedge relation —
    // the sf10 disk-fill failure mode this gate exists to prevent
    assert(above.contains("ShuffledHashJoin") && !above.contains("SortMergeJoin"),
      s"closing fallback must stream wedges, not sort them:\n$above")
  }

  test("closing gate derives from driver heap: a low-heap session picks SHJ where a big-heap one broadcasts") {
    import org.apache.spark.sql.functions._
    val gib = 1024L * 1024 * 1024
    val lowGate = operators.Graph.gateFor(2L * gib)   // default-heap driver
    val highGate = operators.Graph.gateFor(16L * gib) // provisioned driver
    assert(highGate == 50000000L, "big heap keeps the measured 50M ceiling")
    assert(lowGate > 0L && lowGate < highGate,
      "small heap must lower the gate, not zero it")
    // an edge count the provisioned driver broadcasts flips to the
    // shuffled-hash fallback on the default-heap driver — the OOM window
    // the constant gate left open
    val n = lowGate + 1
    val wedges = spark.range(1000).select(
      (col("id") % 10).as("y"), (col("id") % 7).as("z"))
    val closing = spark.range(50).select(
      (col("id") % 10).as("cy"), (col("id") % 7).as("cz"))
    def planWith(gate: Long): String = wedges
      .join(operators.Graph.closingSideFor(closing, n, gate),
        col("y") === col("cy") && col("z") === col("cz"), "left_semi")
      .queryExecution.sparkPlan.toString
    assert(planWith(highGate).contains("BroadcastHashJoin"))
    val low = planWith(lowGate)
    assert(low.contains("ShuffledHashJoin") && !low.contains("SortMergeJoin"),
      s"low-heap fallback must stream wedges, not sort them:\n$low")
  }

  test("link predict: the RA wedge feeds a hash-aggregate with no sort over the wedge relation") {
    // The O(Σdeg²) wedge relation is the materialization hazard: sorting
    // it (a SortAggregate, or a Sort planned between the z-join and its
    // aggregate) is the disk-fill failure mode the wedge family's closing
    // gate exists to prevent. Sorting the O(E) ew INPUTS of a sort-merge
    // z-join is fine — the pin is on the join's OUTPUT side.
    import org.apache.spark.sql.execution.{SortExec, SparkPlan}
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val plan = operators.Graph.qLinkPredict(spark, sf).queryExecution.sparkPlan
    assert(!plan.toString.contains("SortAggregate"),
      s"wedge scoring fell back to a sort-based aggregate:\n$plan")
    def isWedgeJoin(p: SparkPlan): Boolean = p match {
      case j: BaseJoinExec => j.leftKeys.exists {
        case a: AttributeReference => a.name == "z"
        case _ => false
      }
      case _ => false
    }
    // root-to-wedge-join path; the segment between the join and its
    // NEAREST aggregate above must contain no Sort and no shuffle —
    // projections and a broadcast anti-join are the only legal residents
    def path(p: SparkPlan): Option[List[SparkPlan]] =
      if (isWedgeJoin(p)) Some(List(p))
      else p.children.view.flatMap(path).headOption.map(p :: _)
    val pth = path(plan).getOrElse(fail(s"no z-wedge join in plan:\n$plan"))
    val idxAgg = pth.lastIndexWhere(_.isInstanceOf[HashAggregateExec])
    assert(idxAgg >= 0, s"no hash-aggregate above the z-wedge join:\n$plan")
    val between = pth.slice(idxAgg + 1, pth.length - 1)
    assert(between.forall(n =>
      !n.isInstanceOf[SortExec] && !n.isInstanceOf[ShuffleExchangeExec]),
      s"wedge relation sorted or re-shuffled before aggregation:\n$plan")
  }
}
