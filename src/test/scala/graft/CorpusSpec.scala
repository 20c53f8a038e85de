package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class CorpusSpec extends SparkSpec {
  import operators.Corpus._

  test("normalizeText is idempotent and never longer than the input") {
    val df = Tables.documents(spark, sf)
      .select(col("text"), normalizeText(col("text")).as("n1"))
      .select(col("text"), col("n1"), normalizeText(col("n1")).as("n2"))
    assert(df.filter(col("n1") =!= col("n2")).count() == 0)
    assert(df.filter(length(col("n1")) > length(col("text"))).count() == 0)
  }

  test("wordCount matches whitespace-split semantics on edge cases") {
    val s = spark
    import s.implicits._
    val df = Seq(("", 0), ("   ", 1), ("one", 2), ("a b  c", 3), ("\n x \t y \n", 4))
      .toDF("t", "i").orderBy("i")
      .select(wordCount(col("t")).as("wc"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 0L, 1L, 3L, 2L))
  }

  test("corpus_build dedups and filters: no dup doc_keys, all n_chars > 50") {
    val df = corpusBuild(spark, sf)
    assert(df.count() == df.select("doc_key").distinct().count())
    assert(df.filter(col("n_chars") <= 50).count() == 0)
  }

  test("corpus_merge_sources keeps exactly one row per merge_key, preferring priority 1") {
    val df = corpusMergeSources(spark, sf).collect()
    assert(df.map(_.getAs[Long]("merge_key")).distinct.length == df.length)
    // if any bucket had a priority-1 candidate, the winner must be priority 1
    val docs = Tables.documents(spark, sf)
      .select((col("doc_id") % 250).as("mk"),
        when(length(col("source")) <= 4, 1L).otherwise(2L).as("p"))
      .groupBy("mk").agg(min("p").as("best"))
      .collect().map(r => r.getAs[Long]("mk") -> r.getAs[Long]("best")).toMap
    df.foreach(r => assert(r.getAs[Long]("priority") == docs(r.getAs[Long]("merge_key"))))
  }

  test("keyword match only emits keywords actually contained") {
    val rows = corpusKeywordMatch(spark, sf).collect()
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    rows.foreach { r =>
      assert(texts(r.getAs[Long]("doc_id")).toLowerCase
        .contains(r.getAs[String]("keyword")))
    }
  }

  test("decode dispatch: pdf stub unframes the body, html arm strips all markup") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = corpusDecodeDispatch(spark, sf).collect()
    assert(rows.map(_.getAs[String]("method")).toSet ==
      Set("html_strip", "pdf_stub", "plain_decode"))
    rows.foreach { r =>
      val (id, ext, out) = (r.getAs[Long]("doc_id"), r.getAs[String]("ext"),
        r.getAs[String]("extracted_text"))
      ext match {
        case ".pdf" => assert(out == texts(id), s"pdf stub mangled doc $id")
        case ".txt" => assert(out == texts(id), s"plain decode mangled doc $id")
        case ".html" =>
          assert(!out.contains("<") && !out.contains("var x=1"),
            s"html arm left markup in doc $id")
      }
    }
  }

  test("corpus_tag_themes: tags are sorted theme names consistent with a manual regex pass") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val themeRules = Seq(
      "performance" -> Seq("fast", "slow", "benchmark\\w*"),
      "relational"  -> Seq("join", "agg\\w*", "group"),
      "storage"     -> Seq("table", "column", "scan"),
      "streaming"   -> Seq("stream", "batch", "window"))
    val rows = corpusTagThemes(spark, sf).collect()
    assert(rows.length == texts.size, "one row per document")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val tags = r.getAs[String]("tags").split(";").filter(_.nonEmpty).toSeq
      val expected = themeRules.collect {
        case (theme, pats) if pats.exists(p =>
          java.util.regex.Pattern.compile("(?i)" + p).matcher(texts(id)).find()) => theme
      }.sorted
      assert(tags == expected, s"doc $id: got $tags, expected $expected")
      assert(tags == tags.sorted, s"doc $id: tags not sorted")
    }
  }

  test("stratified sample: every stratum keeps exactly its integer quota") {
    import graft.Tables
    val srcTotals = Tables.documents(spark, sf)
      .groupBy("source").count()
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val rows = corpusSampleStratified(spark, sf).collect()
    val kept = rows.groupBy(_.getAs[String]("source")).view.mapValues(_.length.toLong).toMap
    kept.foreach { case (src, n) =>
      val total = srcTotals(src)
      val permille = src.replaceAll("\\D", "").toLong % 4 match {
        case 0 => 1000L; case 1 => 500L; case 2 => 250L; case _ => 100L
      }
      assert(n == total * permille / 1000,
        s"$src: kept $n of $total at $permille permille")
    }
    // full-weight strata keep everything; ranks are 1..quota with no gaps
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val rks = rs.map(_.getAs[Long]("rk")).sorted.toSeq
      assert(rks == (1L to rks.length).toSeq, s"$src: rank gaps $rks")
    }
  }

  test("inverted index: postings sorted ascending, capped at 20, df-consistent") {
    val rows = corpusInvertedIndex(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      assert(df >= 20L)
      assert(r.getAs[Long]("cf") >= df, "cf counts occurrences, df documents")
      val ids = r.getAs[String]("postings").split(",").map(_.toLong)
      assert(ids.length == math.min(df, 20L).toInt)
      assert(ids.sameElements(ids.sorted), "postings must be ascending")
      assert(ids.distinct.length == ids.length, "postings must be distinct docs")
    }
  }

  test("temperature sample: smaller domains get a larger sampling fraction") {
    val rows = corpusSampleTemperature(spark, sf).collect()
    assert(rows.nonEmpty)
    // per-source: kept == min(quota, n_src), ranks dense from 1
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (src, rs) =>
      val quota = rs.head.getAs[Long]("quota")
      val nSrc = rs.head.getAs[Long]("n_src")
      assert(rs.length.toLong == math.min(quota, nSrc), s"$src kept ${rs.length}")
      val rks = rs.map(_.getAs[Long]("rk")).sorted.toSeq
      assert(rks == (1L to rks.length).toSeq, s"$src: rank gaps")
    }
    // the temperature property: sampled FRACTION is monotone non-increasing
    // in domain size (√-weighting upweights small domains); compare via
    // cross-multiplication to stay in integers
    val stats = bySrc.values.map { rs =>
      (rs.head.getAs[Long]("n_src"), rs.head.getAs[Long]("quota"))
    }.toSeq.sortBy(_._1)
    stats.zip(stats.tail).foreach { case ((nA, qA), (nB, qB)) =>
      // nA <= nB  ⇒  qA/nA >= qB/nB  (allow 1 quantum of rounding slack)
      assert((qA + 1) * nB >= qB * nA,
        s"fraction not monotone: ($nA docs → quota $qA) vs ($nB docs → quota $qB)")
    }
  }

  test("upsert merge: post-merge state is exactly v2 for surviving keys") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val got = corpusUpsertMerge(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rev"), r.getAs[String]("h16"))).toMap
    // expected survivors: v1 keys minus deletes, plus inserts = v2's key set
    val expectedKeys = docs.keySet.filter(id => id % 13 != 5)
    assert(got.keySet == expectedKeys)
    got.foreach { case (id, (rev, h16)) =>
      val expectedText = if (id % 7 == 2) docs(id) + " rev2" else docs(id)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(expectedText.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
      assert(h16 == md, s"doc $id content hash mismatch after merge")
      assert((rev == 1L) == (id % 17 == 3 || id % 7 == 2),
        s"doc $id rev flag wrong")
    }
  }

  test("snapshot diff: every class recomputes from the version slice rules") {
    val ids = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val expected = ids.flatMap { id =>
      val inV1 = id % 17 != 3
      val inV2 = id % 13 != 5
      (inV1, inV2) match {
        case (false, true) => Some(id -> "added")
        case (true, false) => Some(id -> "removed")
        case (true, true) if id % 7 == 2 => Some(id -> "modified")
        case _ => None
      }
    }
    val got = corpusSnapshotDiff(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("change")).toSet
    assert(got == expected)
  }
}
