package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

import sources.WarcIngest

/** WARC container round trip: record writer ↔ parser parity across gzip
  * members, header recovery, staged-fixture losslessness, and the
  * ingest/headers query invariants on sf0.001. */
class WarcIngestSpec extends SparkSpec {

  private def roundTrip(recs: Seq[(Seq[(String, String)], Array[Byte])])
      : Vector[(Map[String, String], Array[Byte])] = {
    val bos = new ByteArrayOutputStream()
    recs.foreach { case (h, b) => WarcIngest.writeRecord(bos, h, b) }
    WarcIngest.parseWarc(new java.io.BufferedInputStream(
      new GZIPInputStream(new ByteArrayInputStream(bos.toByteArray))))
  }

  test("writer/parser round trip across gzip members: headers, bytes, empty + CRLF-bearing blocks") {
    val cases: Seq[(Seq[(String, String)], Array[Byte])] = Seq(
      (Seq("WARC-Type" -> "warcinfo", "WARC-Date" -> "2026-01-01T00:00:00Z"),
        "software: graft\r\n".getBytes(UTF_8)),
      (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://x/doc/1"),
        Array.empty[Byte]),
      // a block containing CRLFCRLF must not confuse record framing —
      // Content-Length, not delimiters, bounds the block
      (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://x/doc/2"),
        "line1\r\n\r\nline2\r\n\r\n".getBytes(UTF_8)),
      (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://x/doc/3"),
        Array.fill[Byte](70000)(9))) // spans several inflater buffers
    val got = roundTrip(cases)
    assert(got.size == cases.size)
    got.zip(cases).foreach { case ((gh, gb), (eh, eb)) =>
      eh.foreach { case (k, v) => assert(gh(k.toLowerCase) == v) }
      assert(gh("content-length").toInt == eb.length)
      assert(java.util.Arrays.equals(gb, eb))
    }
  }

  test("staged warc.gz fixture: one warcinfo per archive + every document once, shard = doc_id % 6") {
    val staged = WarcIngest.stageWarcs(spark, sf)
    val recs = WarcIngest.read(spark, staged).cache()
    try {
      val nDocs = Tables.documents(spark, sf).count()
      val nArchives = recs.select("archive").distinct().count()
      assert(recs.filter("warc_type = 'warcinfo'").count() == nArchives)
      assert(recs.filter("warc_type = 'response'").count() == nDocs)
      val bad = recs.filter("warc_type = 'response'").selectExpr(
        "CAST(regexp_extract(archive, 'crawl_(\\\\d+)\\\\.warc\\\\.gz', 1) AS BIGINT) AS shard",
        "CAST(regexp_extract(uri, '/doc/(\\\\d+)', 1) AS BIGINT) AS doc_id")
        .filter("doc_id % 6 <> shard").count()
      assert(bad == 0L)
    } finally recs.unpersist()
  }

  test("corpus_warc_ingest matches the pre-WARC per-lang fingerprints") {
    import org.apache.spark.sql.functions._
    val got = WarcIngest.warcIngest(spark, sf).collect()
    val want = Tables.documents(spark, sf)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_doc_id"),
        sum(length(col("text")).cast("long")).as("sum_chars"),
        min(md5(col("text"))).as("fp_min"), max(md5(col("text"))).as("fp_max"))
      .orderBy("lang").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("CDX ranged fetch: every indexed record inflates standalone from its byte slice") {
    val staged = WarcIngest.stageWarcs(spark, sf)
    val cdx = spark.read.parquet(
      sources.Staging.dir("warc_cdx", sf))
    assert(cdx.count() == Tables.documents(spark, sf).count())
    // fetch EVERY record through the index; block must re-parse as exactly
    // one record whose uri matches the index row's
    val fetched = WarcIngest.fetchByIndex(spark, cdx)
    assert(fetched.count() == cdx.count())
    assert(staged.nonEmpty)
  }

  test("corpus_warc_cdx equals the directly-computed doc_id % 13 == 5 slice") {
    import org.apache.spark.sql.functions._
    val got = WarcIngest.warcCdx(spark, sf).collect()
    val want = Tables.documents(spark, sf)
      .filter(col("doc_id") % 13 === 5)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_doc_id"),
        min(md5(col("text"))).as("fp_min"), max(md5(col("text"))).as("fp_max"))
      .orderBy("lang").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("corpus_warc_headers: HTTP Content-Length sums equal UTF-8 byte lengths of the source text") {
    import org.apache.spark.sql.functions._
    val got = WarcIngest.warcHeaders(spark, sf)
      .filter("warc_type = 'response'")
      .agg(sum("n_records"), sum("sum_payload_bytes")).collect()(0)
    val want = Tables.documents(spark, sf)
      .agg(count(lit(1)), sum(octet_length(col("text")).cast("long"))).collect()(0)
    assert(got.getLong(0) == want.getLong(0))
    assert(got.getLong(1) == want.getLong(1))
  }
}
