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

  test("corpus_parse_dates recovers every rendered format; garbage arm stays empty") {
    val df = corpusParseDates(spark, sf).cache()
    try {
      // every non-garbage row parses, every garbage row doesn't
      assert(df.filter(col("date_str") =!= "n/a" && !col("parse_ok")).count() == 0)
      assert(df.filter(col("date_str") === "n/a" &&
        (col("parse_ok") || col("parsed_date") =!= "")).count() == 0)
      // 2-digit-year formats (fmt 2 and 5 ⇒ okey % 9 in {2,5}) land in 2000-2099
      val twoDigit = df.filter(col("okey") % 9 === 2 || col("okey") % 9 === 5)
        .select(substring(col("parsed_date"), 1, 2).as("c"))
      assert(twoDigit.count() > 0 && twoDigit.filter(col("c") =!= "20").count() == 0)
      // 4-digit formats round-trip the original date exactly
      val orig = Tables.orders(spark, sf)
        .select(col("o_orderkey").as("okey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("expect"))
      val fourDigit = df.filter(col("okey") % 9 =!= 2 && col("okey") % 9 =!= 5 &&
          col("okey") % 9 =!= 8)
        .join(orig, "okey")
      assert(fourDigit.filter(col("parsed_date") =!= col("expect")).count() == 0)
    } finally df.unpersist()
  }

  test("corpus_merge_fill: winner is the priority-max row and gaps genuinely fill") {
    // sf0.001 has ~50 docs (singleton groups); use sf0.01 so groups conflict
    val d01 = "/root/testdata/sf0.01"
    val df = corpusMergeFill(spark, d01).cache()
    try {
      val rows = df.collect()
      assert(rows.map(_.getAs[Long]("merge_key")).distinct.length == rows.length)
      // fill has teeth: some winners had missing fields filled from losers
      assert(rows.exists(_.getAs[Long]("n_filled") > 0))
      // a filled field is never empty when ANY group member had a value
      val anyTitle = Tables.documents(spark, d01)
        .select((col("doc_id") % 200).as("mk"),
          when(col("doc_id") % 3 =!= 0, 1L).otherwise(0L).as("has"))
        .groupBy("mk").agg(max("has").as("any_title"))
        .collect().map(r => r.getAs[Long]("mk") -> r.getAs[Long]("any_title")).toMap
      rows.foreach { r =>
        val mk = r.getAs[Long]("merge_key")
        val filled = r.getAs[String]("title_filled")
        if (anyTitle(mk) == 1L) assert(filled.nonEmpty, s"group $mk lost its title")
        else assert(filled.isEmpty, s"group $mk invented a title")
      }
    } finally df.unpersist()
  }

  test("corpus_dim_coverage: uncovered dim entries report zeros; covered ones count") {
    val rows = corpusDimCoverage(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 8) // one row per dim entry, gaps included
    val byCode = rows.map(r => r.getAs[String]("code") -> r).toMap
    Seq("ja", "ko", "pt").foreach { c =>
      val r = byCode(c)
      assert(!r.getAs[Boolean]("covered") && r.getAs[Long]("n_keys") == 0L,
        s"$c should be an uncovered gap row")
    }
    Seq("en", "de", "es", "fr", "zh").foreach { c =>
      val r = byCode(c)
      assert(r.getAs[Boolean]("covered") && r.getAs[Long]("n_keys") > 0L)
      // provenance split partitions the keys
      assert(r.getAs[Long]("n_manual_only") + r.getAs[Long]("n_api_only") +
        r.getAs[Long]("n_both") == r.getAs[Long]("n_keys"))
    }
    // both-sources tagging has teeth at this SF
    assert(rows.map(_.getAs[Long]("n_both")).sum > 0)
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
