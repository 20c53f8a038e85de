package graft.sources

import java.io.{BufferedOutputStream, ByteArrayInputStream, FileOutputStream, InputStream}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import graft.{Q, Tables}
import org.apache.spark.Partitioner
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) web-archive container ingest — the third container
  * shape next to ZipIngest / TarIngest, and the one raw WEB crawls
  * actually arrive in (the CommonCrawl convention: `.warc.gz` with one
  * gzip member per record, response records carrying a full HTTP message
  * as the block). The reference pulls documents out of downloaded dataset
  * containers (sheaswauger/dissertation-data-pipeline
  * scripts/legislation/legiscan_collector.py:144-278); a 100 TB web
  * corpus is the same motion over WARC.
  *
  * JDK-only boundary parser, same policy as Xlsx/TarIngest: a WARC record
  * is `WARC/1.0 CRLF`, named headers, blank line, `Content-Length` bytes
  * of block, two CRLFs. The `.warc.gz` member-per-record layout reads
  * through a single JDK GZIPInputStream — it consumes concatenated gzip
  * members natively, so record framing survives without any external lib.
  *
  * Scale shape: identical to the other containers — `binaryFile` lists
  * archives, one task per archive walks its records executor-side, the
  * ARCHIVE count is the parallelism axis (CommonCrawl ships ~64k warcs
  * per monthly crawl), and everything downstream of the
  * (archive, headers, block) relation is declarative. Record-level gzip
  * members also mean a future index could seek straight to one record —
  * the layout property CommonCrawl's cdx indexes rely on.
  */
object WarcIngest {

  private val CRLF = "\r\n".getBytes(US_ASCII)

  /** Read one CRLF-terminated ASCII line; None at clean EOF. */
  private def readLine(in: InputStream): Option[String] = {
    val sb = new StringBuilder
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') { sb.append(c.toChar); c = in.read() }
    val s = sb.toString
    Some(if (s.endsWith("\r")) s.dropRight(1) else s)
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new java.io.EOFException(s"WARC block truncated at $off/$n")
      off += r
    }
    buf
  }

  /** Parse a (possibly multi-member-gzipped, already-decompressed) WARC
    * stream: one (headers, block) per record. Header names are
    * case-normalized to the canonical WARC spelling via lower-case keys. */
  private[graft] def parseWarc(in: InputStream): Vector[(Map[String, String], Array[Byte])] = {
    val out = Vector.newBuilder[(Map[String, String], Array[Byte])]
    var line = readLine(in)
    while (line.isDefined) {
      // tolerate blank padding between records
      while (line.exists(_.isEmpty)) line = readLine(in)
      line match {
        case Some(v) if v.startsWith("WARC/") =>
          val hdrs = Map.newBuilder[String, String]
          var h = readLine(in).getOrElse("")
          while (h.nonEmpty) {
            val i = h.indexOf(':')
            if (i > 0) hdrs += h.substring(0, i).trim.toLowerCase -> h.substring(i + 1).trim
            h = readLine(in).getOrElse("")
          }
          val m = hdrs.result()
          val len = m.getOrElse("content-length", "0").toInt
          out += m -> readFully(in, len)
          line = readLine(in) // first of the two record-terminating CRLFs
        case Some(_) => line = readLine(in) // skip junk line
        case None    => line = None
      }
    }
    out.result()
  }

  /** GZIPOutputStream whose member-closing path releases its native
    * Deflater: plain `finish()` leaves the Deflater to the GC/Cleaner
    * (close() would also close the shared underlying stream), which at
    * archive scale is one leaked native buffer per record. `endMember()`
    * finishes the member then calls `Deflater.end()` explicitly. */
  private final class MemberGzip(out: java.io.OutputStream)
      extends GZIPOutputStream(out) {
    def endMember(): Unit = { finish(); `def`.end() }
  }

  /** Write one WARC/1.0 record as its own gzip member (the CommonCrawl
    * `.warc.gz` layout). Headers emit in the given order; Content-Length
    * is derived from the block. */
  private[graft] def writeRecord(
      out: java.io.OutputStream,
      headers: Seq[(String, String)],
      block: Array[Byte]): Unit = {
    val gz = new MemberGzip(out) // one member per record; do NOT close `out`
    gz.write("WARC/1.0".getBytes(US_ASCII)); gz.write(CRLF)
    (headers :+ ("Content-Length" -> block.length.toString)).foreach { case (k, v) =>
      gz.write(s"$k: $v".getBytes(US_ASCII)); gz.write(CRLF)
    }
    gz.write(CRLF)
    gz.write(block)
    gz.write(CRLF); gz.write(CRLF)
    gz.endMember() // ends member + frees Deflater; `out` stays open
  }

  /** One row per record across every `.warc.gz` under `path`:
    * (archive, warc_type, uri, block bytes). */
  def read(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        // buffer over the inflater: header parsing reads byte-at-a-time
        val in = new java.io.BufferedInputStream(
          new GZIPInputStream(new ByteArrayInputStream(bytes)), 1 << 16)
        try parseWarc(in).map { case (m, block) =>
          (p, m.getOrElse("warc-type", ""), m.getOrElse("warc-target-uri", ""), block)
        } finally in.close()
      }
      .toDF("archive", "warc_type", "uri", "block")
  }

  private val nShards = 6

  private val httpHead =
    "HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n"

  /** Byte-position-tracking stream so the writer can emit a CDX index row
    * (archive, offset, compressed length) per record as it writes. */
  private final class CountingOutputStream(out: java.io.OutputStream)
      extends java.io.OutputStream {
    var count: Long = 0L
    override def write(b: Int): Unit = { out.write(b); count += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      out.write(b, off, len); count += len
    }
    override def flush(): Unit = out.flush()
    override def close(): Unit = out.close()
  }

  /** Stage documents as 6 deterministic `.warc.gz` archives: shard =
    * doc_id % 6; each archive opens with a `warcinfo` record then one
    * `response` record per document whose block is a full HTTP message
    * (status line + Content-Type + Content-Length + body = the document
    * text in UTF-8) and whose WARC-Target-URI encodes (lang, doc_id).
    * Dates pinned so archives are byte-deterministic. Distributed by the
    * same by-shard Partitioner shape as the zip/tar staging.
    *
    * Because each record is its own gzip member, the writer also emits a
    * CDX-style index row per record — (archive, uri, doc_id, compressed
    * offset, compressed length) — written as parquet to a SIBLING dir
    * (so the archive dir stays pure `.warc.gz` for binaryFile). That
    * index is what turns 100 TB of warcs into a point-lookup store:
    * a ranged read of [offset, offset+length) inflates standalone. */
  private[graft] def stageWarcs(s: SparkSession, d: String): String = {
    val staged = Staging.dir("warc_docs", d)
    val cdxDir = cdxPath(d)
    new java.io.File(staged).mkdirs()
    import s.implicits._
    val cdx = Tables.documents(s, d)
      .select(
        (col("doc_id") % nShards).cast("int").as("shard"),
        col("doc_id"), col("lang"), col("text"))
      .as[(Int, Long, String, String)]
      .rdd
      .map { case (sh, id, lang, text) => (sh, (id, lang, text)) }
      .partitionBy(new Partitioner {
        def numPartitions: Int = nShards
        def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .mapPartitionsWithIndex { (idx, it) =>
        val rows = it.map(_._2).toVector.sortBy(_._1)
        val index = Vector.newBuilder[(String, String, Long, Long, Long)]
        if (rows.nonEmpty) {
          val f = new java.io.File(staged, f"crawl_$idx%02d.warc.gz")
          val out = new CountingOutputStream(
            new BufferedOutputStream(new FileOutputStream(f)))
          try {
            writeRecord(out,
              Seq("WARC-Type" -> "warcinfo",
                "WARC-Date" -> "2026-01-01T00:00:00Z",
                "WARC-Filename" -> f.getName,
                "Content-Type" -> "application/warc-fields"),
              "software: graft\r\nformat: WARC File Format 1.0\r\n".getBytes(US_ASCII))
            rows.foreach { case (id, lang, text) =>
              val body = text.getBytes(UTF_8)
              val http = httpHead + s"Content-Length: ${body.length}\r\n\r\n"
              val block = http.getBytes(US_ASCII) ++ body
              val off = out.count
              writeRecord(out,
                Seq("WARC-Type" -> "response",
                  "WARC-Date" -> "2026-01-01T00:00:00Z",
                  "WARC-Target-URI" -> s"https://corpus.example/$lang/doc/$id",
                  "Content-Type" -> "application/http; msgtype=response"),
                block)
              index += ((f.getAbsolutePath,
                s"https://corpus.example/$lang/doc/$id", id, off, out.count - off))
            }
          } finally out.close()
        }
        index.result().iterator
      }
      .toDF("archive", "uri", "doc_id", "offset", "length")
    // the parquet write is the action that materializes every archive
    cdx.write.mode("overwrite").parquet(cdxDir)
    staged
  }

  private def cdxPath(d: String): String = Staging.dir("warc_cdx", d)

  /** Driver-contract query: documents → 6 warc.gz archives → container
    * read-back → response filter → HTTP header/body split → per-lang
    * aggregate with md5 content fingerprints. The oracle recomputes the
    * same fingerprints from the PRE-WARC table, proving the text survived
    * gzip members + WARC framing + the HTTP envelope byte-exactly; lang
    * and doc_id are recovered from WARC-Target-URI alone (no payload
    * metadata), proving the header path too. */
  def warcIngest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val recs = read(s, stageWarcs(s, d))
      .where(col("warc_type") === "response")
      .as[(String, String, String, Array[Byte])]
      .map { case (_, _, uri, block) =>
        // HTTP envelope ends at the first CRLFCRLF; body is UTF-8 text
        var cut = -1
        var i = 0
        while (cut < 0 && i + 3 < block.length) {
          if (block(i) == '\r' && block(i + 1) == '\n' &&
              block(i + 2) == '\r' && block(i + 3) == '\n') cut = i + 4
          i += 1
        }
        val m = "https://corpus.example/([^/]+)/doc/(\\d+)".r
          .findFirstMatchIn(uri).get
        (m.group(2).toLong, m.group(1),
          new String(block, cut, block.length - cut, UTF_8))
      }
      .toDF("doc_id", "lang", "text")
    recs.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("doc_id").as("sum_doc_id"),
        sum(length(col("text")).cast("long")).as("sum_chars"),
        min(md5(col("text"))).as("fp_min"),
        max(md5(col("text"))).as("fp_max"))
      .orderBy("lang")
  }

  private val warcIngestSql =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
      |  CAST(sum(length(text)) AS BIGINT) AS sum_chars,
      |  min(md5(text)) AS fp_min, max(md5(text)) AS fp_max
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Driver-contract query: the CONTAINER/METADATA layer alone — per
    * archive shard and WARC-Type, the record count and the Σ of HTTP
    * payload bytes read from each response's HTTP Content-Length HEADER
    * (the body is never touched), plus Σ doc_id from the target URIs.
    * The oracle restates the shard arithmetic + octet lengths on the
    * pre-WARC table, with the per-shard warcinfo record reproduced by a
    * UNION — so a header-level miscount (dropped record, wrong
    * Content-Length emitted, URI mangling) surfaces even if the payload
    * path happens to round-trip. */
  def warcHeaders(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    read(s, stageWarcs(s, d))
      .as[(String, String, String, Array[Byte])]
      .map { case (archive, wtype, uri, block) =>
        val shard = "crawl_(\\d+)\\.warc\\.gz".r
          .findFirstMatchIn(archive).get.group(1).toLong
        val payloadBytes =
          if (wtype == "response") {
            val head = new String(block, 0, math.min(block.length, 256), US_ASCII)
            "Content-Length: (\\d+)".r.findFirstMatchIn(head).get.group(1).toLong
          } else 0L
        val docId =
          if (wtype == "response")
            "/doc/(\\d+)".r.findFirstMatchIn(uri).get.group(1).toLong
          else 0L
        (shard, wtype, payloadBytes, docId)
      }
      .toDF("shard", "warc_type", "payload_bytes", "doc_id")
      .groupBy("shard", "warc_type")
      .agg(count(lit(1)).as("n_records"),
        sum("payload_bytes").as("sum_payload_bytes"),
        sum("doc_id").as("sum_doc_id"))
      .orderBy("shard", "warc_type")
  }

  private val warcHeadersSql =
    """WITH responses AS (
      |  SELECT doc_id % 6 AS shard, 'response' AS warc_type,
      |    CAST(count(*) AS BIGINT) AS n_records,
      |    CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_payload_bytes,
      |    CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
      |  FROM documents GROUP BY 1
      |), infos AS (
      |  SELECT DISTINCT doc_id % 6 AS shard, 'warcinfo' AS warc_type,
      |    CAST(1 AS BIGINT) AS n_records, CAST(0 AS BIGINT) AS sum_payload_bytes,
      |    CAST(0 AS BIGINT) AS sum_doc_id
      |  FROM documents
      |)
      |SELECT * FROM responses UNION ALL SELECT * FROM infos
      |ORDER BY shard, warc_type""".stripMargin

  /** Point-fetch records through the CDX index: one ranged read of
    * [offset, offset+length) per row, inflated standalone thanks to the
    * member-per-record gzip layout. Each fetch opens/seeks/reads/closes
    * independently — the semantics of an object-store ranged GET, which
    * is exactly how a cluster fetcher reads one record out of a 100 TB
    * crawl without scanning the archive. (A production fetcher would
    * batch adjacent ranges per archive; at index grain that is a sort,
    * not a different plan.) Returns (uri, doc_id, block). */
  def fetchByIndex(s: SparkSession, cdx: DataFrame): DataFrame = {
    import s.implicits._
    cdx.select("archive", "uri", "doc_id", "offset", "length")
      .as[(String, String, Long, Long, Long)]
      .mapPartitions { it =>
        it.map { case (archive, uri, id, off, len) =>
          val raf = new java.io.RandomAccessFile(archive, "r")
          try {
            raf.seek(off)
            val buf = new Array[Byte](len.toInt)
            raf.readFully(buf)
            val recs = parseWarc(new java.io.BufferedInputStream(
              new GZIPInputStream(new ByteArrayInputStream(buf))))
            require(recs.size == 1, s"ranged read returned ${recs.size} records")
            (uri, id, recs.head._2)
          } finally raf.close()
        }
      }
      .toDF("uri", "doc_id", "block")
  }

  /** Driver-contract query: the random-access path — build the CDX index
    * while staging, select the doc_id % 13 == 5 slice FROM THE INDEX
    * ALONE, ranged-fetch exactly those records, split the HTTP envelope,
    * and fingerprint per lang. The oracle computes the same slice from
    * the pre-WARC table — a hash match proves the index points at the
    * right bytes and that a single member inflates standalone (the
    * property 100 TB point lookups rely on). */
  def warcCdx(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    stageWarcs(s, d)
    val picked = s.read.parquet(cdxPath(d)).filter(col("doc_id") % 13 === 5)
    fetchByIndex(s, picked)
      .as[(String, Long, Array[Byte])]
      .map { case (uri, id, block) =>
        var cut = -1
        var i = 0
        while (cut < 0 && i + 3 < block.length) {
          if (block(i) == '\r' && block(i + 1) == '\n' &&
              block(i + 2) == '\r' && block(i + 3) == '\n') cut = i + 4
          i += 1
        }
        val lang = "https://corpus.example/([^/]+)/doc/".r
          .findFirstMatchIn(uri).get.group(1)
        (id, lang, new String(block, cut, block.length - cut, UTF_8))
      }
      .toDF("doc_id", "lang", "text")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("doc_id").as("sum_doc_id"),
        min(md5(col("text"))).as("fp_min"),
        max(md5(col("text"))).as("fp_max"))
      .orderBy("lang")
  }

  private val warcCdxSql =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
      |  min(md5(text)) AS fp_min, max(md5(text)) AS fp_max
      |FROM documents WHERE doc_id % 13 = 5 GROUP BY lang ORDER BY lang""".stripMargin

  val all: Seq[Q] = Seq(
    Q("corpus_warc_ingest", warcIngest, Some(warcIngestSql)),
    Q("corpus_warc_headers", warcHeaders, Some(warcHeadersSql)),
    Q("corpus_warc_cdx", warcCdx, Some(warcCdxSql))
  )
}
