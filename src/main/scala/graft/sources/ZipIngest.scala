package graft.sources

import java.io.{ByteArrayInputStream, BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import graft.{Q, Tables}
import org.apache.spark.Partitioner
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** ZIP archive-container ingest — the reference pulls bill JSON documents
  * out of zip dataset archives
  * (sheaswauger/dissertation-data-pipeline
  * scripts/legislation/legiscan_collector.py:144-278 `process_bill` /
  * `process_dataset`: open dataset zip → iterate the per-bill `.json`
  * entries → parse each). Re-expressed Spark-first: the `binaryFile` source LISTS
  * the archives (one row per archive, executors read the bytes), a
  * per-archive flatMap walks the container with the JDK's ZipInputStream
  * — the same one-legitimately-imperative-arm pattern as the Xlsx reader
  * — and every entry surfaces as a row (archive, entry, payload). From
  * there the pipeline is declarative again: `from_json` against a pinned
  * schema, then ordinary relational ops.
  *
  * Scale shape: real 100 TB web/corpus crawls arrive exactly like this —
  * millions of container files (zip/tar/WARC) of ~MBs each. The ARCHIVE
  * is the unit of parallelism: binaryFile distributes one task per file
  * (no splitting inside a container — zip central directories make
  * entries non-splittable anyway), so throughput scales with the number
  * of archives, which is the dimension that actually grows. Entry
  * explosion and JSON parsing happen executor-side; nothing but the file
  * listing touches the driver.
  */
object ZipIngest {

  /** One row per non-directory entry across every zip under `path`:
    * (archive path, entry name, payload text). Payloads decode as UTF-8 —
    * the reference's bill JSON convention. */
  def read(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
        try {
          // materialize before the stream closes; per-archive entry lists
          // are bounded by the archive size already held in memory
          Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
            .filterNot(_.isDirectory)
            .map(e => (p, e.getName, new String(zin.readAllBytes(), UTF_8)))
            .toVector
        } finally zin.close()
      }
      .toDF("archive", "entry", "payload")
  }

  private val nShards = 8

  private val docSchema = new StructType()
    .add("doc_id", LongType).add("lang", StringType)
    .add("source", StringType).add("text", StringType)
    .add("n_chars", LongType)

  /** Stage a deterministic multi-archive fixture from `documents`: shard
    * docs by doc_id % 8 into 8 zip archives, one `doc_<id>.json` entry per
    * document (entry payload = the to_json row). Staging is DISTRIBUTED —
    * an explicit by-shard Partitioner routes each shard to one task, and
    * that task zips its own archive (entries sorted for a deterministic
    * container) — the same executor-writes-its-partition shape a cluster
    * job would use against shared storage. */
  private[graft] def stageZips(s: SparkSession, d: String): String = {
    val staged = Staging.dir("zip_docs", d)
    new java.io.File(staged).mkdirs()
    import s.implicits._
    val entries = Tables.documents(s, d)
      .select(
        (col("doc_id") % nShards).cast("int").as("shard"),
        concat(lit("doc_"), col("doc_id"), lit(".json")).as("entry"),
        to_json(struct(col("doc_id"), col("lang"), col("source"),
          col("text"), col("n_chars"))).as("payload"))
      .as[(Int, String, String)]
    entries.rdd
      .map { case (sh, e, p) => (sh, (e, p)) }
      .partitionBy(new Partitioner {
        def numPartitions: Int = nShards
        def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .mapPartitionsWithIndex { (idx, it) =>
        val rows = it.map(_._2).toVector.sortBy(_._1)
        if (rows.nonEmpty) {
          val f = new java.io.File(staged, f"archive_$idx%02d.zip")
          val zout = new ZipOutputStream(
            new BufferedOutputStream(new FileOutputStream(f)))
          try rows.foreach { case (name, payload) =>
            zout.putNextEntry(new ZipEntry(name))
            zout.write(payload.getBytes(UTF_8))
            zout.closeEntry()
          } finally zout.close()
        }
        Iterator.single(rows.size)
      }
      .count() // action: materialize every archive before the read side runs
    staged
  }

  /** Driver-contract query: zip the documents table into 8 archives, read
    * them back through the container source, parse entries with from_json,
    * and aggregate per language. count + Σdoc_id prove no entry lost or
    * duplicated; Σlength(text) + min/max md5(text) prove the payload text
    * survived the container round trip byte-exactly (the oracle computes
    * the same fingerprints from the PRE-ZIP table). */
  def zipIngest(s: SparkSession, d: String): DataFrame = {
    val parsed = read(s, stageZips(s, d))
      .select(from_json(col("payload"), docSchema).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
        col("r.text").as("text"))
    parsed.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("doc_id").as("sum_doc_id"),
        sum(length(col("text")).cast("long")).as("sum_chars"),
        min(md5(col("text"))).as("fp_min"),
        max(md5(col("text"))).as("fp_max"))
      .orderBy("lang")
  }

  private val zipIngestSql =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
      |  CAST(sum(length(text)) AS BIGINT) AS sum_chars,
      |  min(md5(text)) AS fp_min, max(md5(text)) AS fp_max
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Driver-contract query: the CONTAINER layer alone — per archive, the
    * entry count and the Σ of doc ids recovered from ENTRY NAMES (no
    * payload parse), proving the shard→archive routing and entry naming
    * themselves. The oracle restates the modular shard arithmetic on the
    * pre-zip table. */
  def zipAudit(s: SparkSession, d: String): DataFrame = {
    read(s, stageZips(s, d))
      .select(
        regexp_extract(col("archive"), "archive_(\\d+)\\.zip", 1)
          .cast("long").as("shard"),
        regexp_extract(col("entry"), "doc_(\\d+)\\.json", 1)
          .cast("long").as("doc_id"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_entries"), sum("doc_id").as("sum_doc_id"))
      .orderBy("shard")
  }

  private val zipAuditSql =
    """SELECT doc_id % 8 AS shard, CAST(count(*) AS BIGINT) AS n_entries,
      |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[Q] = Seq(
    Q("corpus_zip_ingest", zipIngest, Some(zipIngestSql)),
    Q("corpus_zip_audit", zipAudit, Some(zipAuditSql))
  )
}
