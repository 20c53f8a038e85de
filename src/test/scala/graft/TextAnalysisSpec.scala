package graft

import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import operators.TextAnalysis._

  test("dedup lines: keeper policy and cleaned text match a naive recompute") {
    val rows = textDedupLines(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
    // naive: 10-token chunks; the first (doc_id, chunk_idx) occurrence of
    // each identical chunk survives, every later occurrence drops
    val chunks = docs.flatMap { case (id, t) =>
      t.trim.split("\\s+").filter(_.nonEmpty).grouped(10).zipWithIndex
        .map { case (c, ci) => (id, ci.toLong, c.mkString(" ")) }
    }
    val keeper = chunks.groupBy(_._3)
      .map { case (line, g) => line -> g.map(x => (x._1, x._2)).min }
    val keptByDoc = chunks.filter { case (id, ci, line) =>
      keeper(line) == ((id, ci)) }
      .groupBy(_._1).view
      .mapValues(g => g.sortBy(_._2).map(_._3)).toMap
    val nByDoc = chunks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(rows.length == docs.length)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val kept = keptByDoc.getOrElse(id, Array.empty[String])
      assert(r.getAs[Long]("n_lines") == nByDoc.getOrElse(id, 0L))
      assert(r.getAs[Long]("n_removed") ==
        nByDoc.getOrElse(id, 0L) - kept.length)
      assert(r.getAs[String]("cleaned") == kept.mkString(" "))
    }
    // every duplicated chunk survives exactly once corpus-wide
    val keptOcc = chunks.filter { case (id, ci, line) =>
      keeper(line) == ((id, ci)) }
    assert(keptOcc.map(_._3).distinct.length == keptOcc.length,
      "keeper policy must retain exactly one occurrence per distinct chunk")
  }

  test("chunk overlap: spans match a local sliding pass and cover every token") {
    val rows = textChunkOverlap(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val C = 64; val S = 48
    val expect = docs.flatMap { case (id, t) =>
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      val n = toks.length
      if (n == 0) Seq.empty
      else {
        val nc = 1 + (math.max(n - C, 0) + S - 1) / S
        (0 until nc).map { i =>
          val start = i * S
          val len = math.min(C, n - start)
          val body = toks.slice(start, start + len).mkString(" ")
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(body.getBytes("UTF-8")).map("%02x".format(_)).mkString
          (id, i.toLong, start.toLong, len.toLong, n.toLong, md)
        }
      }
    }.sortBy(x => (x._1, x._2))
    val got = rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
      r.getAs[Long]("tok_start"), r.getAs[Long]("tok_len"),
      r.getAs[Long]("n_tokens"), r.getAs[String]("chunk_md5"))).toSeq
    assert(got == expect.toSeq)
    // cover + overlap invariants: chunks tile [0, n) with stride-48 starts,
    // every chunk len in [1, 64], consecutive chunks overlap by C-S except
    // the final truncated one (overlap = min(16, n - 48i) >= 1)
    got.groupBy(_._1).foreach { case (id, cs) =>
      val n = cs.head._5
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2) == (0L until sorted.length.toLong))
      sorted.foreach { case (_, i, start, len, _, _) =>
        assert(start == i * S && len >= 1 && len <= C && start + len <= n) }
      assert(sorted.last._3 + sorted.last._4 == n, s"doc $id: last chunk must end at doc end")
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          val overlap = (a._3 + a._4) - b._3
          assert(overlap >= 1 && overlap <= C - S, s"doc $id: chunk overlap $overlap")
        case _ => ()
      }
    }
  }

  test("dedup lines: packed-key bounds are fail-loud, in-bound ids pass") {
    import SparkSpec.spark.implicits._
    def docsOf(ids: Long*) =
      ids.map(i => (i, "src0", "alpha beta gamma")).toDF("doc_id", "source", "text")
    // in-bound: the largest representable ids work and pack exactly
    val maxOk = operators.TextAnalysis.textDedupLinesOn(docsOf(2147483647L))
      .collect()
    assert(maxOk.length == 1 && maxOk.head.getAs[Long]("n_lines") == 1L)
    // out-of-bound doc_id (2^31): the guard must throw, not wrap — Spark's
    // silent long wrap here diverged from the oracle's BIGINT overflow error
    val e = intercept[Exception] {
      operators.TextAnalysis.textDedupLinesOn(docsOf(2147483648L)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("pack bound exceeded")),
      s"expected the pack-bound raise_error, got: $e")
  }

  test("tfidf top: per-doc top-5 matches a local tf/df recompute") {
    val rows = textTfidfTop(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val tfs = docs.map { case (id, t) =>
      (id, t.trim.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (k, v) => (k, v.length.toLong) })
    }.toMap
    val df = tfs.values.flatMap(_.keys).groupBy(identity)
      .map { case (k, v) => (k, v.size.toLong) }
    val nDocs = docs.length.toLong
    def idf(tok: String): Long =
      math.round(1000.0 * math.log((nDocs + 1) / (df(tok) + 1.0)))
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (id, rs) =>
      val expect = tfs(id).toSeq
        .map { case (tok, tf) => (tok, tf, idf(tok), tf * idf(tok)) }
        .sortBy { case (tok, _, _, s0) => (-s0, tok) }
        .take(rs.length)
      val got = rs.sortBy(_.getAs[Long]("rk")).map(r =>
        (r.getAs[String]("tok"), r.getAs[Long]("tf"),
          r.getAs[Long]("idf_milli"), r.getAs[Long]("score_milli"))).toSeq
      assert(got == expect, s"top terms of doc $id")
      assert(rs.length == math.min(5, tfs(id).size))
    }
    assert(byDoc.size == docs.count(_._2.trim.nonEmpty))
  }

  test("rake: word and phrase scores recompute from a local pass") {
    val rows = textRake(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val stops = Set("a", "an", "the", "of", "and", "to", "in", "is", "for",
      "on", "at", "by", "with")
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    // candidate phrases: maximal stopword-free runs, capped at 4 words
    val phrases = docs.flatMap { case (_, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val runs = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer[String]())
      toks.foreach { t =>
        if (stops(t)) { if (runs.last.nonEmpty) runs += runs.last.take(0) }
        else runs.last += t
      }
      runs.filter(r => r.nonEmpty && r.length <= 4).map(_.toSeq)
    }
    val freq = scala.collection.mutable.Map.empty[String, Long]
    val deg = scala.collection.mutable.Map.empty[String, Long]
    phrases.foreach { p =>
      p.foreach { w =>
        freq(w) = freq.getOrElse(w, 0L) + 1
        deg(w) = deg.getOrElse(w, 0L) + p.length
      }
    }
    def wscore(w: String): Long = 1000000L * deg(w) / freq(w)
    val phraseScores = phrases.map(_.mkString(" ")).groupBy(identity)
      .map { case (ph, occ) =>
        (ph, occ.size.toLong, ph.split(" ").map(wscore).sum)
      }.toSeq
    val expect = phraseScores.sortBy { case (p, _, s0) => (-s0, p) }
      .take(rows.length)
    val got = rows.sortBy(_.getAs[Long]("rk")).map(r =>
      (r.getAs[String]("phrase"), r.getAs[Long]("n_occ"),
        r.getAs[Long]("score_micro"))).toSeq
    assert(got == expect)
  }

  test("backoff lm: levels partition scored tokens; every odd doc scored tri-gram-wide") {
    val rows = operators.TextAnalysis.textBackoffLm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_scored")
      assert(r.getAs[Long]("n_tri") + r.getAs[Long]("n_bi") +
        r.getAs[Long]("n_uni") + r.getAs[Long]("n_oov") == n)
      assert(r.getAs[Long]("avg_surprisal_cn") == r.getAs[Long]("sum_surp") / n)
      assert(r.getAs[Long]("sum_surp") >= 0)
    }
    // every scored doc is odd and contributes exactly n_tokens - 2 positions
    val tokCounts = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("nt"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("nt")).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(id % 2 == 1)
      assert(r.getAs[Long]("n_scored") == tokCounts(id) - 2,
        s"doc $id: scored ${r.getAs[Long]("n_scored")} of ${tokCounts(id)} tokens")
    }
  }

  test("nb classifier: recovers a planted class signal; confusion covers all test docs") {
    import SparkSpec.spark.implicits._
    // planted signal: class "aa" docs speak {alpha,beta}, class "bb" docs
    // {gamma,delta}; both share the filler token "common". 20 train + 10
    // test docs per class (even ids train, odd ids score).
    val rows = (0L until 60L).map { i =>
      val cls = if (i % 4 < 2) "aa" else "bb"
      val words = if (cls == "aa") "alpha beta alpha common" else "gamma delta gamma common"
      (i, cls, words)
    }
    val conf = operators.TextAnalysis
      .nbClassifierOn(rows.toDF("doc_id", "lang", "text"))
      .collect()
    // every odd doc lands in the confusion matrix
    assert(conf.map(_.getAs[Long]("n_docs")).sum == 30)
    // the planted signal is fully recovered: diagonal only
    conf.foreach { r =>
      assert(r.getAs[String]("actual_lang") == r.getAs[String]("pred_lang"),
        s"misclassified: $r")
    }
    // and on the driver corpus the matrix still partitions the odd docs
    val real = operators.TextAnalysis.textNbClassifier(spark, sf).collect()
    val oddDocs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 1).count()
    assert(real.map(_.getAs[Long]("n_docs")).sum == oddDocs)
  }

  test("pii redact: every injected item found, nothing survives redaction") {
    val rows = textPiiRedact(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the deterministic footer guarantees at least one of each
      assert(r.getAs[Long]("n_emails") >= 1)
      assert(r.getAs[Long]("n_phones") >= 1)
      assert(r.getAs[Long]("n_ssns") >= 1)
      val tail = r.getAs[String]("redacted_tail")
      assert(tail.endsWith("[SSN]."), s"footer not redacted: ...$tail")
      assert(!tail.matches(".*\\d{3}-\\d{2}-\\d{4}.*"), s"SSN survived: $tail")
    }
  }

  test("repetition: fractions bounded, top bigram actually occurs in the doc") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = textRepetition(spark, sf).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val dup = r.getAs[Double]("dup_line_frac")
      assert(dup >= 0.0 && dup <= 1.0)
      Option(r.getAs[String]("top_bigram")).foreach { bg =>
        val frac = r.getAs[Double]("top_bigram_frac")
        assert(frac > 0.0 && frac <= 1.0)
        assert(graft.functions.TextFunctions != null) // normalization applied upstream
        assert(bg.split(" ").length == 2, s"not a bigram: '$bg'")
      }
    }
  }

  test("contamination: flagged pairs share >= 3 shingles; benchmark slice is id%100==0") {
    import graft.functions.TextFunctions._
    val shingles = Tables.documents(spark, sf)
      .select(col("doc_id"), wordShingles(normalizeText(col("text")), 3).as("s"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[String]]("s").toSet).toMap
    val rows = textContamination(spark, sf).collect()
    assert(rows.nonEmpty, "expected at least one contaminated doc at this SF")
    rows.foreach { r =>
      val (doc, bench) = (r.getAs[Long]("doc_id"), r.getAs[Long]("benchmark_id"))
      assert(doc % 100 != 0 && bench % 100 == 0)
      val shared = shingles(doc).intersect(shingles(bench)).size
      assert(shared == r.getAs[Long]("n_shared"), s"pair ($doc,$bench)")
      assert(shared >= 3)
    }
  }

  test("sequence packing: conserves tokens/docs; next-fit boundaries respected") {
    import graft.functions.TextFunctions._
    val perDoc = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"), wordCount(col("text")).as("t"))
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"), r.getAs[Long]("t")))
    val rows = textPackSequences(spark, sf).collect()
    // conservation: packing moves every token and every doc into exactly one sequence
    assert(rows.map(_.getAs[Long]("seq_tokens")).sum == perDoc.map(_._3).sum)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == perDoc.length)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val ids = rs.map(_.getAs[Long]("seq_id")).sorted.toSeq
      assert(ids == (0L until ids.length).toSeq, s"$lang: seq_id gaps: $ids")
      // next-fit: a sequence only opens once the previous one crossed the
      // budget, so every sequence except the last must hold >= 512 - (max
      // doc size - 1) tokens... the tight invariant: the exclusive cumsum of
      // each sequence's first doc lies in [seq_id*512, (seq_id+1)*512)
      val docsSorted = perDoc.filter(_._1 == lang).sortBy(_._2)
      val cumEx = docsSorted.scanLeft(0L)(_ + _._3)
      val firstDocBin = docsSorted.zip(cumEx).map { case ((_, id, _), ce) => id -> ce / 512 }.toMap
      rs.foreach { r =>
        assert(firstDocBin(r.getAs[Long]("first_doc")) == r.getAs[Long]("seq_id"))
      }
    }
  }

  test("bpe-ish counts: >= whitespace counts and match a manual regex pass") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val pat = java.util.regex.Pattern.compile("[a-z]+|[0-9]|[^a-z0-9\\s]+")
    val rows = textBpeTokenCount(spark, sf).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nBpe = r.getAs[Long]("n_bpe_tokens")
      val m = pat.matcher(texts(id).toLowerCase)
      var manual = 0L
      while (m.find()) manual += 1
      assert(nBpe == manual, s"doc $id: $nBpe vs manual $manual")
      // every whitespace word yields at least one BPE-ish piece
      assert(r.getAs[Long]("fertility_bp") >= 10000L || r.getAs[Long]("n_ws_tokens") == 0L)
    }
  }

  test("unigram surprisal: positive, conserved token counts, rare beats common") {
    import graft.functions.TextFunctions._
    val rows = textUnigramLogprob(spark, sf).collect()
    val totalToks = Tables.documents(spark, sf)
      .select(wordCount(col("text")).as("n")).collect().map(_.getAs[Long]("n")).sum
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalToks)
    rows.foreach { r =>
      val (n, s, avg) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("sum_surp"),
        r.getAs[Long]("avg_surprisal_cn"))
      assert(n > 0 && s > 0 && avg > 0)
      assert(avg == s / n, "integer mean must be exact sum div count")
    }
    // a corpus has spread: not every document carries the same mean surprisal
    assert(rows.map(_.getAs[Long]("avg_surprisal_cn")).distinct.length > 1)
  }

  test("filter chain: verdicts partition the corpus; reasons from the fixed set") {
    val total = Tables.documents(spark, sf).count()
    val rows = textFilterChain(spark, sf).collect()
    assert(rows.length == total, "one verdict per document")
    val reasons = Set("keep", "too_short", "short_words", "long_words", "low_alpha", "high_punct")
    rows.foreach { r =>
      assert(reasons.contains(r.getAs[String]("reason")))
      assert(r.getAs[Boolean]("keep") == (r.getAs[String]("reason") == "keep"))
    }
    assert(rows.exists(_.getAs[Boolean]("keep")), "some docs must survive")
    assert(rows.exists(!_.getAs[Boolean]("keep")), "some docs must be dropped")
  }

  test("bm25: ranked, positive, dense ranks, and scores reproducible from tf/dl") {
    val rows = textBm25(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    // rk is 1..n dense and ordering is (score desc, doc_id asc)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rk") == i + 1L)
      assert(r.getAs[Long]("bm25_milli") > 0L, "retrieved docs must score > 0")
      assert(r.getAs[Long]("n_terms") >= 1L)
    }
    val pairs = rows.sliding(2).toSeq
    pairs.foreach { case Array(a, b) =>
      val (sa, sb) = (a.getAs[Long]("bm25_milli"), b.getAs[Long]("bm25_milli"))
      assert(sa > sb || (sa == sb && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
    case _ => ()
    }
    // a doc matching more distinct terms should generally outrank one
    // matching a single term at the same budget — check the top hit isn't a
    // single-term doc while multi-term docs exist in the corpus
    if (rows.exists(_.getAs[Long]("n_terms") >= 2))
      assert(rows.take(10).exists(_.getAs[Long]("n_terms") >= 2),
        "no multi-term doc in the top 10 despite multi-term docs existing")
  }

  test("dsir: dense ranks, score-ordered; target slice wins per-occurrence") {
    val rows = textDsirWeight(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rk") == i + 1L)
      assert(r.getAs[Long]("n_feats") >= 1L)
    }
    val scores = rows.map(_.getAs[Long]("dsir_centi"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the importance-weighting direction: every target-doc occurrence carries
    // the c_t >= 1 boost, so the target slice's MEAN per-occurrence score
    // must exceed the non-target mean (per-occurrence normalization removes
    // doc-length and composition variance that can reorder individual docs)
    val all = textDsirScores(spark, sf).collect()
    val (tgt, rest) = all.partition(_.getAs[Long]("doc_id") % 100 == 0)
    assert(tgt.nonEmpty && rest.nonEmpty)
    def perOcc(rs: Array[org.apache.spark.sql.Row]): Double =
      rs.map(r => r.getAs[Long]("dsir_centi").toDouble /
        r.getAs[Long]("n_feats")).sum / rs.length
    assert(perOcc(tgt) > perOcc(rest),
      s"target per-occurrence mean ${perOcc(tgt)} not above raw ${perOcc(rest)}")
  }

  test("span corruption: disjoint spans, ~15% mask rate, deterministic") {
    val rows = textSpanCorruption(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val spans = r.getAs[Long]("n_spans")
      val masked = r.getAs[Long]("n_masked_tokens")
      assert(spans == math.max(1L, n / 20))
      // strata-clamped spans are disjoint: at most 3 tokens per span
      assert(masked >= spans && masked <= 3 * spans,
        s"doc ${r.getAs[Long]("doc_id")}: $masked masked from $spans spans")
      val bp = r.getAs[Long]("mask_bp")
      // 15% target with a wide tolerance for short docs and clamped spans
      if (n >= 100) assert(bp >= 500 && bp <= 1600, s"mask_bp $bp out of band")
    }
    val again = textSpanCorruption(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "md5-seeded placement must be reproducible")
  }

  test("bigram LM beats unigram LM on training-corpus log-loss") {
    val uni = textUnigramLogprob(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("sum_surp"))).toMap
    val bi = textBigramLogprob(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("sum_surp"))).toMap
    assert(bi.keySet == uni.keySet)
    bi.foreach { case (id, (n, _)) => assert(uni(id)._1 == n, s"doc $id token count") }
    // H(W|prev) <= H(W): corpus-total conditional log-loss can't exceed the
    // marginal one (both models score first tokens identically); allow the
    // per-token ±0.5 centinat quantization as slack
    val totalBi = bi.values.map(_._2).sum
    val totalUni = uni.values.map(_._2).sum
    val slack = bi.values.map(_._1).sum // 1 centinat per token
    assert(totalBi <= totalUni + slack,
      s"bigram $totalBi should not exceed unigram $totalUni")
  }

  test("zipf fit: slope negative, token conservation, top share consistent") {
    val r = textZipfFit(spark, sf).collect().head
    assert(r.getAs[Double]("zipf_slope") < 0,
      "rank-frequency slope must be negative (frequency falls with rank)")
    val total = Tables.documents(spark, sf)
      .select(explode(split(graft.functions.TextFunctions.normalizeText(col("text")), "\\s+")))
      .count()
    assert(r.getAs[Long]("n_tokens") == total)
    assert(r.getAs[Long]("top_share_bp") > 0 && r.getAs[Long]("top_share_bp") <= 10000)
  }

  test("count-min sketch never underestimates and overest matches the grid") {
    val rows = textCmsFreq(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (exact, est) = (r.getAs[Long]("exact_c"), r.getAs[Long]("est_c"))
      assert(est >= exact,
        s"CMS must never underestimate: ${r.getAs[String]("tok")} $est < $exact")
      assert(r.getAs[Long]("overest_bp") == 10000 * (est - exact) / exact)
    }
    // depth=4, width=256: expected collision inflation per row is N/256;
    // taking the min over 4 rows keeps the top-token estimates tight
    val worst = rows.map(r => r.getAs[Long]("overest_bp")).max
    assert(worst <= 10000, s"top-token estimates should be within 2x (got $worst bp)")
  }

  test("cooccurrence: symmetric canonical pairs, counts >= adjacent-bigram counts") {
    val rows = textCooccurrence(spark, sf).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      assert(r.getAs[String]("w1") <= r.getAs[String]("w2"),
        "pairs must be canonicalized least/greatest")
      assert(r.getAs[Long]("c") > 0)
    }
    val cs = rows.map(_.getAs[Long]("c"))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, "ranked by count desc")
    // window ±3 co-occurrence of a pair dominates its adjacent-bigram count
    // (distance-1 pairs are a subset of distance-≤3 pairs)
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), posexplode(split(
        graft.functions.TextFunctions.normalizeText(col("text")), "\\s+"))
        .as(Seq("pos", "tok")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    val bigram = toks
      .select(least(col("tok"), lead("tok", 1).over(w)).as("w1"),
        greatest(col("tok"), lead("tok", 1).over(w)).as("w2"))
      .filter(col("w2").isNotNull)
      .groupBy("w1", "w2").agg(count(lit(1)).as("bc"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("bc")).toMap
    rows.foreach { r =>
      val key = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      assert(r.getAs[Long]("c") >= bigram.getOrElse(key, 0L))
    }
  }

  test("pmi: support respected, ranked, and the top score recomputes by hand") {
    val rows = textPmiCollocations(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach(r => assert(r.getAs[Long]("c_ab") >= 5L))
    val scores = rows.map(_.getAs[Long]("pmi_centi"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // recompute the top bigram's PMI from raw token counts
    val top = rows.head
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        posexplode(split(graft.functions.TextFunctions.normalizeText(col("text")), "\\s+"))
          .as(Seq("pos", "tok")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val t1n = toks.length.toDouble
    val byDoc = toks.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val bigrams = byDoc.values.flatMap(ts => ts.zip(ts.tail)).toSeq
    val t2n = bigrams.size.toDouble
    val (wa, wb) = (top.getAs[String]("wa"), top.getAs[String]("wb"))
    val cab = bigrams.count(_ == (wa, wb)).toDouble
    val ca = toks.count(_._3 == wa).toDouble
    val cb = toks.count(_._3 == wb).toDouble
    assert(cab == top.getAs[Long]("c_ab").toDouble)
    val pmi = 100.0 * (math.log(cab) + 2.0 * math.log(t1n) -
      math.log(t2n) - math.log(ca) - math.log(cb))
    assert(math.abs(pmi - top.getAs[Long]("pmi_centi")) <= 1.0,
      s"hand PMI $pmi vs reported ${top.getAs[Long]("pmi_centi")}")
  }

  test("sentence split: stats hand-recompute from a manual segmentation") {
    val rows = textSentenceSplit(spark, sf).collect()
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def segment(t: String): Seq[String] =
      t.replace(" the ", ". ").split("[.!?]+").toSeq
        .map(_.replaceAll("^\\s+|\\s+$", "")).filter(_.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val sents = segment(texts(id))
      assert(r.getAs[Long]("n_sentences") == sents.length, s"doc $id count")
      assert(r.getAs[Long]("max_len") == sents.map(_.length).max, s"doc $id max")
      val total = sents.map(_.length.toLong).sum
      val n = sents.length.toLong
      assert(r.getAs[Long]("mean_len_centichars") == (200 * total + n) / (2 * n),
        s"doc $id mean")
    }
    // every document with at least one sentence appears, and the fixture
    // genuinely produces multi-sentence structure
    assert(rows.length == texts.count(t => segment(t._2).nonEmpty))
    assert(rows.count(_.getAs[Long]("n_sentences") > 1) > rows.length / 2,
      "fixture should yield multi-sentence docs")
  }

  test("quality terciles: monotone cutpoints, exact ceil-rank semantics") {
    val rows = textQualityTercile(spark, sf).collect()
    val n = rows.length
    assert(n == Tables.documents(spark, sf).count())
    val by = rows.groupBy(_.getAs[String]("tercile"))
      .view.mapValues(_.map(_.getAs[Long]("quality_bp")).sorted).toMap
    // buckets are value-monotone: max(t1) < min(t2) (cutpoints separate) and
    // max(t2) < min(t3); ties never straddle buckets by construction
    for ((lo, hi) <- Seq(("t1", "t2"), ("t2", "t3"))
         if by.contains(lo) && by.contains(hi))
      assert(by(lo).last < by(hi).head, s"$lo/$hi overlap")
    // exact discrete-quantile rank semantics: |t1| is the smallest
    // cumulative count >= ceil(n/3) reachable on a value boundary, and
    // |t1|+|t2| likewise for 2n/3 -- verify against a hand scan
    val sortedBp = rows.map(_.getAs[Long]("quality_bp")).sorted
    def cumAtCut(k: Long): Int = {
      // count of elements <= the smallest value whose cume count >= k
      var i = 0
      while (i < n && i + 1 < k) i += 1
      val cut = sortedBp(i) // value at rank ceil position
      sortedBp.count(_ <= cut)
    }
    val k1 = (n + 2) / 3
    val k2 = (2 * n + 2) / 3
    assert(by.get("t1").map(_.size).getOrElse(0) == cumAtCut(k1))
    assert(by.get("t1").map(_.size).getOrElse(0) + by.get("t2").map(_.size).getOrElse(0) == cumAtCut(k2))
  }

  test("novelty: novel counts partition the distinct-ngram space") {
    val rows = operators.TextAnalysis.textNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bp = r.getAs[Long]("novelty_bp")
      assert(bp >= 0 && bp <= 10000)
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_ngrams"))
    }
    // the earliest doc in the result sees everything first
    val firstDoc = rows.minBy(_.getAs[Long]("doc_id"))
    assert(firstDoc.getAs[Long]("novelty_bp") == 10000L)
    // Σ n_novel over docs = |distinct ngrams in corpus| (each ngram is
    // novel in exactly one doc)
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.TextFunctions.normalizeText(col("text")).as("t"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("t").split("\\s+").toSeq)
    val allNg = toks.flatMap { case (_, ts) => ts.sliding(3).filter(_.size == 3)
      .map(_.mkString(" ")) }.toSet
    assert(rows.map(_.getAs[Long]("n_novel")).sum == allNg.size)
  }

  test("langid eval: cells sum to labeled doc counts per language") {
    val rows = operators.TextAnalysis.textLangidEval(spark, sf).collect()
    assert(rows.nonEmpty)
    val actualCounts = Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val byActual = rows.groupBy(_.getAs[String]("actual_lang"))
    // every labeled language appears and its cells exactly cover its docs
    assert(byActual.keySet == actualCounts.keySet)
    byActual.foreach { case (lang, cells) =>
      assert(cells.map(_.getAs[Long]("n")).sum == actualCounts(lang))
      cells.foreach { c =>
        assert(c.getAs[Long]("cell_bp") ==
          10000L * c.getAs[Long]("n") / actualCounts(lang))
      }
    }
  }

  test("quality AUC matches a brute-force pairwise recompute per language") {
    // ground truth by O(n·n) pair counting on the driver: for lang L,
    // u2 = Σ over (pos, neg) pairs of 2·[pos > neg] + 1·[pos == neg]
    val scores = textQuality(spark, sf)
      .select(col("doc_id"), round(col("quality_score") * 10000).cast("long").as("bp"))
      .join(Tables.documents(spark, sf).select("doc_id", "lang"), "doc_id")
      .select("lang", "bp").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = textQualityAuc(spark, sf).collect()
    assert(rows.map(_.getAs[String]("lang")).toSet == scores.map(_._1).toSet)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val pos = scores.collect { case (`lang`, bp) => bp }
      val neg = scores.collect { case (l, bp) if l != lang => bp }
      val u2 = (for (p <- pos; n <- neg)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      assert(r.getAs[Long]("n_pos") == pos.length)
      assert(r.getAs[Long]("n_neg") == neg.length)
      assert(r.getAs[Long]("u2") == u2, s"$lang: u2")
      assert(r.getAs[Long]("auc_bp") ==
        10000L * u2 / (2L * pos.length * neg.length), s"$lang: auc_bp")
    }
    // sanity: every AUC is a probability in basis points
    rows.foreach(r => assert(r.getAs[Long]("auc_bp") >= 0L &&
      r.getAs[Long]("auc_bp") <= 10000L))
  }

  test("ngram entropy matches an exact local recompute with the same quantization") {
    val tokArrays = Tables.documents(spark, sf)
      .select(split(graft.functions.TextFunctions.normalizeText(col("text")), "\\s+").as("t"))
      .collect().map(_.getSeq[String](0).toArray)
    def entropyRow(grams: Seq[String]): (Long, Long, Long) = {
      val counts = grams.groupBy(identity).map(_._2.size.toLong)
      val total = counts.sum
      val clnc = counts.map(c => c * math.round(math.log(c.toDouble) * 1000)).sum
      (counts.size.toLong, total, math.round(math.log(total.toDouble) * 1000) - clnc / total)
    }
    val uni = entropyRow(tokArrays.toSeq.flatten)
    val bi = entropyRow(tokArrays.toSeq.flatMap(t => t.sliding(2).filter(_.length == 2).map(_.mkString(" "))))
    val rows = textNgramEntropy(spark, sf).collect()
      .map(r => r.getAs[Long]("n") ->
        (r.getAs[Long]("n_distinct"), r.getAs[Long]("total"), r.getAs[Long]("entropy_milli"))).toMap
    assert(rows(1L) == uni, s"unigram: ${rows(1L)} vs $uni")
    assert(rows(2L) == bi, s"bigram: ${rows(2L)} vs $bi")
    // redundancy: bigram distribution of a small-vocab corpus is the more
    // redundant one only relative to ITS max; both shares are valid bp
    textNgramEntropy(spark, sf).collect().foreach { r =>
      val red = r.getAs[Long]("redundancy_bp")
      assert(red >= -10L && red <= 10000L)
    }
  }

  test("readability: per-lang stats recompute from raw regex counts") {
    import org.apache.spark.sql.functions.col
    val rows = operators.TextAnalysis.textReadability(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select(col("lang"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val byLang = docs.groupBy(_._1)
    assert(rows.map(_.getAs[String]("lang")).toSet == byLang.keySet)
    rows.foreach { r =>
      val texts = byLang(r.getAs[String]("lang")).map(_._2)
      def cnt(t: String, re: String): Long =
        re.r.findAllIn(t).length.toLong
      val scores = texts.map { t =>
        val w = cnt(t, "[a-z]+"); val syl = cnt(t, "[aeiouy]+")
        val sents = math.max(1L, cnt(t, "[.!?]+")); val ws = math.max(1L, w)
        (w, 206835L - (1015 * w) / sents - (84600 * syl) / ws,
          (390 * w) / sents + (11800 * syl) / ws - 15590L)
      }
      assert(r.getAs[Long]("n_docs") == texts.length.toLong)
      assert(r.getAs[Long]("n_words") == scores.map(_._1).sum)
      assert(r.getAs[Long]("avg_flesch_milli")
        == scores.map(_._2).sum / texts.length)
      assert(r.getAs[Long]("min_flesch_milli") == scores.map(_._2).min)
      assert(r.getAs[Long]("max_flesch_milli") == scores.map(_._2).max)
      assert(r.getAs[Long]("avg_fk_milli")
        == scores.map(_._3).sum / texts.length)
    }
  }

  test("heaps law: bucket curve recomputes; closed vocabulary drives beta to 0") {
    import org.apache.spark.sql.functions.col
    val rows = operators.TextAnalysis.textHeapsLaw(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(x => (x.getLong(0), x.getString(1)))
    val nd = docs.length.toLong
    val toks = docs.flatMap { case (id, t) =>
      t.split("\\s+").filter(_.nonEmpty).map(w => (id * 64 / nd, w))
    }
    assert(r.getAs[Long]("n_tokens") == toks.length.toLong)
    assert(r.getAs[Long]("n_vocab") == toks.map(_._2).distinct.length.toLong)
    // recompute the ln-ln OLS over the 64-bucket cumulative curve
    val buckets = toks.map(_._1).distinct.sorted
    val tB = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val minB = toks.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val vB = minB.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var (tc, vc) = (0L, 0L)
    val pts = buckets.map { b =>
      tc += tB(b); vc += vB.getOrElse(b, 0L)
      (math.round(1000 * math.log(tc.toDouble)),
        math.round(1000 * math.log(vc.toDouble)))
    }
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum.toDouble, pts.map(_._2).sum.toDouble)
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val beta = 1000 * ((n * sxy - sx * sy) / (n * sxx - sx * sx))
    assert(math.abs(r.getAs[Long]("beta_milli") - math.round(beta)) <= 1)
    // the generator's vocabulary is CLOSED (~31 words): growth saturates in
    // bucket 0, so the fitted exponent must be ~0 — the template-flood alarm
    assert(r.getAs[Long]("beta_milli") >= 0 && r.getAs[Long]("beta_milli") < 50)
  }
}
