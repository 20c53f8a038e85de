package graft

import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import operators.Similarity._

  test("recall eval hand-recomputes from the composed queries; IVF has teeth") {
    import operators.Similarity
    val rows = Similarity.simRecallEval(spark, sf).collect()
    val brute3 = Similarity.simTopkBruteforce(spark, sf)
      .filter(col("rk") <= 3).collect()
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("cand_id")).toSet).toMap
    val annBy = Map(
      "lsh" -> Similarity.simAnnLsh(spark, sf).collect(),
      "ivf" -> Similarity.simAnnIvf(spark, sf).collect())
      .view.mapValues(_.groupBy(_.getAs[Long]("qid"))
        .view.mapValues(_.map(_.getAs[Long]("cand_id")).toSet).toMap).toMap
    assert(rows.map(_.getAs[Long]("qid")).toSet == brute3.keySet)
    rows.foreach { r =>
      val (m, qid) = (r.getAs[String]("method"), r.getAs[Long]("qid"))
      val expect = brute3(qid)
        .intersect(annBy(m).getOrElse(qid, Set.empty)).size.toLong
      assert(r.getAs[Long]("n_hits") == expect, s"$m qid $qid")
      assert(r.getAs[Long]("recall_bp") == expect * 10000 / 3, s"$m qid $qid bp")
    }
    // teeth: IVF (nprobe cells) genuinely recalls neighbors at this SF;
    // exact-8-bit-signature LSH measuring ~0 here is the honest finding
    assert(rows.filter(_.getAs[String]("method") == "ivf")
      .map(_.getAs[Long]("recall_bp")).sum > 0)
  }

  test("brute-force top-k: 5 neighbors per query, cosine non-increasing") {
    val rows = simTopkBruteforce(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 10)
    byQ.foreach { case (_, rs) =>
      assert(rs.length == 5)
      val cos = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("ANN LSH results are a subset of each query's bucket and exact-cosine-ranked") {
    val ann = simAnnLsh(spark, sf).collect()
    // every returned neighbor must appear in the brute-force full ranking
    // with the same cosine value
    val bf = simTopkBruteforce(spark, sf)
      .select("qid", "cand_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ann.foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("cand_id"))
      bf.get(key).foreach(c => assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-9))
    }
  }

  test("ANN LSH achieves nonzero recall of brute-force top-5 on bucketed queries") {
    val bf = simTopkBruteforce(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cand_id"))).toSet
    val ann = simAnnLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cand_id"))).toSet
    assert(ann.nonEmpty)
    assert(ann.intersect(bf).nonEmpty, "ANN found none of the true top-5 pairs")
  }

  test("IVF ANN: top-3 per query, decent recall of brute-force top-3") {
    val ivf = operators.Similarity.simAnnIvf(spark, sf).collect()
    val byQ = ivf.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 10)
    byQ.foreach { case (_, rs) => assert(rs.length <= 3 && rs.nonEmpty) }
    val bf3 = simTopkBruteforce(spark, sf).collect()
      .filter(_.getAs[Long]("rk") <= 3)
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cand_id"))).toSet
    val got = ivf.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cand_id"))).toSet
    val recall = got.intersect(bf3).size.toDouble / bf3.size
    assert(recall >= 0.3, s"IVF recall too low: $recall")
  }

  test("rank fusion: rrf recomputes from the two ranks; ordering consistent") {
    val rows = operators.Similarity.simRankFusion(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val lex = r.getAs[Long]("lex_rank"); val sem = r.getAs[Long]("sem_rank")
      val expected = (if (lex > 0) 1000000 / (60 + lex) else 0L) +
        (if (sem > 0) 1000000 / (60 + sem) else 0L)
      assert(r.getAs[Long]("rrf_ppm") == expected, s"rrf mismatch at $r")
      assert(lex > 0 || sem > 0, "a fused doc must appear in some ranking")
    }
    val ppm = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("rrf_ppm"))
    assert(ppm.zip(ppm.tail).forall { case (a, b) => a >= b })
    // hybrid teeth: at least one doc is ranked by BOTH signals
    assert(rows.exists(r =>
      r.getAs[Long]("lex_rank") > 0 && r.getAs[Long]("sem_rank") > 0))
  }

  test("MMR diversity sample: first pick is argmax relevance; picks beat naive top-k diversity") {
    import operators.Similarity
    val rows = Similarity.simDiversitySample(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("rk")).toSeq == (1L to 5L))
    val rels = rows.map(_.getAs[Long]("rel"))
    // pick 1 maximizes pure relevance — must dominate every later pick's rel
    assert(rels.tail.forall(_ <= rels.head))
    // and picks are distinct
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 5)
    // diversity teeth: the MMR set's max intra-set cosine is no worse than
    // the naive top-5-by-relevance set's (that's the entire point of MMR)
    import graft.functions.VectorFunctions.{asDouble, vecDot, vecNorm}
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", vecNorm(col("v")))
    def maxIntraCos(ids: Seq[Long]): Double = {
      val sub = emb.filter(col("vec_id").isin(ids: _*))
      sub.alias("a").join(sub.alias("b"),
          col("a.vec_id") < col("b.vec_id"))
        .select((vecDot(col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm"))).as("c"))
        .agg(max("c")).collect().head.getDouble(0)
    }
    val q = emb.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val top5 = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        (vecDot(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("rel"))
      .orderBy(col("rel").desc, col("vec_id").asc).limit(5)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val mmrIds = rows.map(_.getAs[Long]("vec_id")).toSeq
    if (mmrIds.toSet != top5.toSet) {
      assert(maxIntraCos(mmrIds) <= maxIntraCos(top5) + 1e-9,
        "MMR set must not be MORE redundant than naive top-k")
    }
  }

  test("IVFPQ: ranked top-3 per query, re-rank exact, decent recall of brute-force") {
    val rows = operators.Similarity.simAnnIvfpq(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 10)
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.length <= 3 && sorted.nonEmpty)
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to sorted.length).toSeq)
      val cos = sorted.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }, s"query $q not ranked")
      assert(sorted.forall(_.getAs[Long]("cand_id") != q), s"query $q self-match")
    }
    // the final cosines are EXACT (re-ranked), so every reported (qid, cand)
    // cosine must equal the brute-force cosine for that pair
    val bf = simTopkBruteforce(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cand_id")) -> r.getAs[Double]("cosine"))
      .toMap
    rows.foreach { r =>
      val k = (r.getAs[Long]("qid"), r.getAs[Long]("cand_id"))
      bf.get(k).foreach(exact => assert(exact == r.getAs[Double]("cosine"),
        s"pair $k: re-ranked cosine disagrees with exact"))
    }
    // coarse probing + 8-byte codes still recover a useful share of the
    // true top-3 (2 of 16 cells probed ⇒ perfection not expected)
    val bf3 = simTopkBruteforce(spark, sf).collect()
      .filter(_.getAs[Long]("rk") <= 3)
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cand_id"))).toSet
    val got = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cand_id"))).toSet
    val recall = got.intersect(bf3).size.toDouble / bf3.size
    assert(recall >= 0.3, s"IVFPQ recall too low: $recall")
  }

  test("knn graph: per-vector top-3, ranked, and edges stay within LSH buckets") {
    val rows = simKnnGraph(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("vec_id")).foreach { case (v, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.length <= 3, s"vec $v has ${sorted.length} neighbors")
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to sorted.length).toSeq)
      val cos = sorted.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }, s"vec $v not ranked")
      assert(sorted.forall(_.getAs[Long]("nbr_id") != v), s"vec $v self-edge")
    }
    // the graph is bucket-closed: an edge (a,b) implies b's neighbor list is
    // drawn from the same bucket, so b must also have >= 1 edge
    val withEdges = rows.map(_.getAs[Long]("vec_id")).toSet
    assert(rows.forall(r => withEdges.contains(r.getAs[Long]("nbr_id"))),
      "edge target has no own neighbor list — bucket asymmetry")
  }

  test("PQ/ADC: 50-deep shortlist always contains the exact top-1 neighbor") {
    import operators.Similarity
    val exactTop1 = Similarity.simTopkBruteforce(spark, sf).collect()
      .filter(_.getAs[Long]("rk") == 1L)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("cand_id")).toMap
    val shortlist = Similarity.simAnnPqTopk(spark, sf, 50).collect()
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("cand_id")).toSet).toMap
    exactTop1.foreach { case (qid, top1) =>
      assert(shortlist(qid).contains(top1),
        s"query $qid: exact top-1 $top1 missing from the PQ top-50 shortlist")
    }
    // structural: codes are bytes — every ranked pair's score is a sum of 8
    // bounded per-subspace terms, so |approx| stays well under 8 * 1e6 * max|dot|
    Similarity.simAnnPq(spark, sf).collect().foreach { r =>
      assert(math.abs(r.getAs[Long]("approx_micro")) < 8L * 100L * 1000000L)
    }
  }

  test("centroid norms: one row per label, norm below mean member norm") {
    val rows = simCentroidByLabel(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("label")).distinct.length == rows.length)
    // centroid of spread-out unit-ish vectors is shorter than members
    rows.foreach(r => assert(r.getAs[Double]("centroid_norm") >= 0))
    assert(rows.map(_.getAs[Long]("n_vecs")).sum ==
      Tables.embeddings(spark, sf).count())
  }

  test("range search: every hit is a true ≥τ neighbor; multiprobe ⊇ single-probe") {
    // precision proof at sf0.01 (sf0.001's 50 vectors rarely share buckets):
    // every returned pair must clear the threshold under brute-force
    // recompute, and the Hamming-1 probe set must cover the exact bucket
    val big = "/root/testdata/sf0.01"
    val hits = simRangeSearch(spark, big).collect()
    assert(hits.nonEmpty)
    // brute-force ground truth of all ≥τ pairs for the query set
    val emb = Tables.embeddings(spark, big).collect()
      .map { r =>
        val v = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray
        r.getAs[Long]("vec_id") -> v
      }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      math.rint(d / (math.sqrt(na) * math.sqrt(nb)) * 1e4) / 1e4
    }
    hits.foreach { r =>
      val c = cos(emb(r.getAs[Long]("qid")), emb(r.getAs[Long]("cand_id")))
      assert(c >= 0.2, s"returned pair below threshold: $r vs brute $c")
      assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-9)
    }
    // multiprobe must include everything the single-bucket LSH query can
    // see: any exact-signature bucket-mate above τ appears in the hits
    val hitSet = hits.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cand_id"))).toSet
    val lsh = simAnnLsh(spark, big).collect()
    lsh.filter(_.getAs[Double]("cosine") >= 0.2).foreach { r =>
      assert(hitSet.contains((r.getAs[Long]("qid"), r.getAs[Long]("cand_id"))),
        s"exact-bucket neighbor missing from multiprobe range result: $r")
    }
  }

  test("maxsim: self-retrieval is perfect and strictly beats every other doc") {
    val rows = simMaxsim(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Int]("qlabel"))
    assert(byQ.size == 2)
    byQ.foreach { case (q, rs) =>
      val diag = rs.find(_.getAs[Int]("dlabel") == q).get
      // query vectors ARE in the self doc-set: every one matches itself at
      // cos=1, so the diagonal is exactly n_qvecs * 10000
      assert(diag.getAs[Long]("maxsim_e4") == diag.getAs[Long]("n_qvecs") * 10000L)
      rs.filter(_.getAs[Int]("dlabel") != q).foreach { r =>
        assert(r.getAs[Long]("maxsim_e4") < diag.getAs[Long]("maxsim_e4"),
          s"qlabel $q must retrieve itself above dlabel ${r.getAs[Int]("dlabel")}")
      }
    }
  }

  test("hamming topk: matches a local sign-bit brute force with tie rule") {
    val rows = operators.Similarity.simHammingTopk(spark, sf).collect()
    val embs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
      .toMap
    def bits(v: Array[Float]): Array[Boolean] = v.map(_ > 0f)
    def ham(a: Array[Boolean], b: Array[Boolean]): Int =
      a.zip(b).count { case (x, y) => x != y }
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == embs.keySet.filter(_ < 10))
    byQ.foreach { case (qid, rs) =>
      val want = embs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (ham(bits(embs(qid)), bits(v)), id) }
        .sorted.take(5)
      val got = rs.sortBy(_.getAs[Long]("rk"))
        .map(r => (r.getAs[Long]("hamming").toInt, r.getAs[Long]("cand_id")))
      assert(got.toSeq == want, s"query $qid top-5")
    }
  }

  test("power iteration: matches an exact local integer recompute") {
    val rows = operators.Similarity.simPowerIteration(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("dim")).toSeq == (1L to 64L))
    val q = Tables.embeddings(spark, sf).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding")
        .map(x => if (x > 0f) 1L else -1L).toArray)
    val n = q.length.toLong
    def step(v: Array[Long]): Array[Long] = {
      val t = q.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
      (0 until 64).map { i =>
        val raw = q.zip(t).map { case (row, tr) => row(i) * tr }.sum
        1000L * raw / n // both engines truncate toward zero; / does too
      }.toArray
    }
    val v3 = step(step(step(Array.fill(64)(1L))))
    val maxabs = v3.map(math.abs).max
    rows.foreach { r =>
      val i = r.getAs[Long]("dim").toInt - 1
      assert(r.getAs[Long]("v3") == v3(i), s"v3 at dim ${i + 1}")
      assert(r.getAs[Long]("load_bp") == 10000L * v3(i) / maxabs)
    }
  }

  test("SQ int8: 5 ranked rows per query, codes recall the exact top-5 almost perfectly") {
    val sq = simAnnSq(spark, sf).collect()
    val byQ = sq.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 10)
    byQ.foreach { case (_, rs) =>
      assert(rs.length == 5)
      val cos = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("qcosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
    }
    // 8-bit scalar quantization barely moves cosine: quantized top-5 must
    // recall >= 80% of the exact top-5 pairs overall
    val bf = simTopkBruteforce(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cand_id"))).toSet
    val got = sq.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cand_id"))).toSet
    val recall = got.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.8, s"SQ recall vs exact top-5 too low: $recall")
  }

  test("matryoshka: recall recomputes from a local 16-dim vs 64-dim ranking") {
    val emb = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (0 until d).foreach { i => dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      math.round(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e4) / 1e4
    }
    def top5(qid: Long, d: Int): Set[Long] =
      emb.keys.filter(_ != qid).toSeq
        .sortBy(c => (-cos(emb(qid), emb(c), d), c)).take(5).toSet
    val rows = simMatryoshka(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val hits = (top5(qid, 64) intersect top5(qid, 16)).size.toLong
      assert(r.getAs[Long]("n_hits") == hits, s"q$qid")
      assert(r.getAs[Long]("recall_bp") == hits * 10000L / 5L)
    }
  }

  test("SQ int8: quantized cosine sits within the 8-bit error band of the exact cosine") {
    val bf = simTopkBruteforce(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cand_id")) -> r.getAs[Double]("cosine"))
      .toMap
    simAnnSq(spark, sf).collect().foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("cand_id"))
      bf.get(key).foreach { exact =>
        assert(math.abs(exact - r.getAs[Double]("qcosine")) < 0.05,
          s"$key: quantized ${r.getAs[Double]("qcosine")} vs exact $exact")
      }
    }
  }

  test("bucket purity: purity and NMI recompute from the signature grid") {
    import org.apache.spark.sql.functions.col
    val rows = operators.Similarity.simBucketPurity(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    // recompute signatures locally with the same planes
    val data = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect().map(x => (x.getLong(0), x.getLong(1),
        x.getSeq[Float](2).map(_.toDouble).toArray))
    val planes = operators.Similarity.planes.map(_.toArray)
    def sig(v: Array[Double]): Long =
      planes.zipWithIndex.map { case (pl, p) =>
        if (pl.indices.map(i => pl(i) * v(i)).sum >= 0) 1L << p else 0L
      }.sum
    val cells = data.groupBy(x => (sig(x._3), x._2)).view
      .mapValues(_.length.toLong).toMap
    val nb = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nl = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = data.length.toLong
    assert(r.getAs[Long]("n_vecs") == n)
    assert(r.getAs[Long]("n_buckets") == nb.size.toLong)
    assert(r.getAs[Long]("n_labels") == nl.size.toLong)
    val pur = cells.groupBy(_._1._1).values.map(_.values.max).sum
    assert(r.getAs[Long]("purity_bp") == 10000L * pur / n)
    def q(x: Double): Long = math.round(1000 * math.log(x))
    val iSum = cells.map { case ((b, l), c) =>
      c * q(c.toDouble * n / (nb(b).toDouble * nl(l))) }.sum
    val hbSum = cells.map { case ((b, _), c) => c * q(n.toDouble / nb(b)) }.sum
    val hlSum = cells.map { case ((_, l), c) => c * q(n.toDouble / nl(l)) }.sum
    assert(r.getAs[Long]("nmi_bp") == 10000L * 2 * iSum / (hbSum + hlSum))
    assert(r.getAs[Long]("nmi_bp") >= 0 && r.getAs[Long]("nmi_bp") <= 10000)
  }

  test("label spread: two clamped vote rounds recompute from local kNN") {
    import org.apache.spark.sql.functions.col
    val rows = operators.Similarity.simLabelSpread(spark, sf).collect()
    val data = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect().map(x => (x.getLong(0), x.getLong(1),
        x.getSeq[Float](2).map(_.toDouble).toArray))
    assert(rows.length == data.length)
    val planes = operators.Similarity.planes.map(_.toArray)
    def sig(v: Array[Double]): Long =
      planes.zipWithIndex.map { case (pl, p) =>
        if (pl.indices.map(i => pl(i) * v(i)).sum >= 0) 1L << p else 0L
      }.sum
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => a(i) * b(i)).sum
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    // local kNN: top-3 by cosine within the same signature bucket
    val bySig = data.groupBy(x => sig(x._3))
    val knn = data.flatMap { case (id, _, v) =>
      bySig(sig(v)).filter(_._1 != id)
        .map(o => (o._1, dot(v, o._3) / (nrm(v) * nrm(o._3))))
        .sortBy(x => (-x._2, x._1)).take(3)
        .map { case (nbr, c) => (id, nbr, math.round(1000 * c)) }
    }
    val truth = data.map(x => (x._1, x._2)).toMap
    var labeled = data.collect { case (id, l, _) if id % 4 == 0 => (id, l) }.toMap
    val seedSet = labeled.keySet
    (1 to 2).foreach { _ =>
      val votes = knn.filter(e => !labeled.contains(e._1) && labeled.contains(e._2))
        .groupBy(_._1).view.mapValues { es =>
          es.groupBy(e => labeled(e._2)).view.mapValues(_.map(_._3).sum)
            .toSeq.sortBy(x => (-x._2, x._1)).head._1
        }.toMap
      labeled = labeled ++ votes
    }
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val expSt = if (seedSet(id)) "seed"
        else if (labeled.contains(id)) "spread" else "none"
      assert(r.getAs[String]("status") == expSt, s"status for $id")
      assert(r.getAs[Long]("label_true") == truth(id))
      if (labeled.contains(id)) {
        assert(r.getAs[Long]("label_hat") == labeled(id), s"label for $id")
        assert(r.getAs[Boolean]("agree") == (labeled(id) == truth(id)))
      } else assert(r.isNullAt(r.fieldIndex("label_hat")))
    }
  }

  test("embedding drift: integer mean distance recomputes from raw vectors") {
    import org.apache.spark.sql.functions.col
    val rows = operators.Similarity.simEmbeddingDrift(spark, sf).collect()
    val data = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect().map(x => (x.getLong(0), x.getLong(1),
        x.getSeq[Float](2).map(v => math.round(v.toDouble * 1e6)).toArray))
    val byLabel = data.groupBy(_._2)
    assert(rows.map(_.getAs[Long]("label")).toSet == byLabel.keySet)
    rows.foreach { r =>
      val g = byLabel(r.getAs[Long]("label"))
      val ref = g.filter(_._1 % 2 == 0)
      val cur = g.filter(_._1 % 2 == 1)
      assert(r.getAs[Long]("n_ref") == ref.length.toLong)
      assert(r.getAs[Long]("n_cur") == cur.length.toLong)
      def mean(vs: Array[(Long, Long, Array[Long])], d: Int): Long =
        vs.map(_._3(d)).sum / vs.length // truncating, matches div
      val drift = (0 until 64).map { d =>
        val diff = mean(ref, d) - mean(cur, d); diff * diff
      }.sum
      assert(r.getAs[Long]("drift_l2sq") == drift,
        s"drift for label ${r.getAs[Long]("label")}")
      val (nr, nc) = (ref.length.toLong, cur.length.toLong)
      assert(r.getAs[Long]("share_shift_bp")
        == 10000L * math.abs(nr - nc) / (nr + nc))
    }
  }
}
