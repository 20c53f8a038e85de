package graft

import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import operators.Dedup._

  test("exact dedup: keeper is always <= doc_id and self-maps when unique") {
    val rows = dedupExact(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("keeper") <= r.getAs[Long]("doc_id"))
      assert(r.getAs[Boolean]("is_dup") ==
        (r.getAs[Long]("keeper") != r.getAs[Long]("doc_id")))
    }
  }

  test("minhash LSH finds every pair the 1-band variant confirms at j>=0.5") {
    // 1-band pairs are exact-Jaccard-verified; the 8-band LSH has strictly
    // higher candidate recall at high Jaccard, so it must contain them all.
    val oneBand = dedupMinhash1Band(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = dedupMinhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oneBand.subsetOf(lsh),
      s"1-band pairs missing from LSH: ${oneBand.diff(lsh)}")
    assert(lsh.nonEmpty)
  }

  test("minhash LSH jaccard values are exact (match brute-force intersection)") {
    import graft.functions.TextFunctions._
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"), wordShingles(normalizeText(col("text")), 3).as("s"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[String]]("s").toSet).toMap
    dedupMinhashLsh(spark, sf).collect().foreach { r =>
      val (a, b) = (sh(r.getAs[Long]("doc_a")), sh(r.getAs[Long]("doc_b")))
      val expected = a.intersect(b).size.toDouble / a.union(b).size
      assert(math.abs(r.getAs[Double]("jaccard") - expected) < 1e-3)
    }
  }

  test("simhash pairs all have hamming <= 3 and include near-identical docs") {
    val rows = dedupSimhash(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("hamming") <= 3))
    assert(rows.nonEmpty)
  }

  test("clusters: every near-dup pair shares a cluster; keeper is the min id") {
    val clusters = dedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    val pairs = dedupNgramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    clusters.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min == c, s"cluster $c keeper is not the min id")
    }
  }

  test("embedding near-dup pairs are same-label with cosine >= threshold") {
    val labels = Tables.embeddings(spark, sf).select("vec_id", "label")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val rows = dedupEmbedding(spark, sf).collect()
    rows.foreach { r =>
      assert(labels(r.getAs[Long]("vec_a")) == labels(r.getAs[Long]("vec_b")))
      assert(r.getAs[Double]("cosine") >= 0.35)
    }
  }
}
