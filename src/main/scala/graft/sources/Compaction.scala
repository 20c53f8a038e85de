package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planner — the table-maintenance operation every
  * 100 TB ingest pipeline runs continuously: crawls and streaming sinks
  * land millions of KB-scale files, and scan throughput collapses unless
  * they are periodically rewritten into ~target-size outputs (the same
  * motion as Iceberg/Delta `rewriteDataFiles` / OPTIMIZE; the reference's
  * per-session collector output shows the same shape — many small
  * per-dataset JSON drops, sheaswauger/dissertation-data-pipeline
  * scripts/legislation/legiscan_collector.py:144-278).
  *
  * Scale design: the planner NEVER touches data. It plans over the file
  * MANIFEST — one row per file, metadata-grain (a 100 TB table at 128 MB
  * target is ~800k manifest rows; at the pathological million-small-file
  * state it is exactly the file count, still far below data grain). Bin
  * assignment is next-fit by running total: files order deterministically
  * within their table partition, a partitioned window computes the
  * cumulative size, and `bucket = floor(bytes_before / target)` — pure
  * closed-form arithmetic, no iterative packing loop, no driver state.
  * Each (partition, bucket) then becomes one task of the rewrite job
  * reading just its files; the plan relation is the job's input split
  * list. Next-fit guarantees every bucket except the last holds ≥ target
  * bytes BEFORE its final file, so no bucket overshoots target by more
  * than one file — the bound the spec asserts.
  */
object Compaction {

  /** Next-fit compaction plan for a (partition, file, bytes) manifest:
    * one row per output bucket with its file span and fill. `fileCol`
    * must order files deterministically within a partition. */
  def plan(manifest: DataFrame, partCol: String, fileCol: String,
      bytesCol: String, targetBytes: Long): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(fileCol))
    manifest
      .withColumn("bytes_before",
        coalesce(sum(col(bytesCol)).over(w) - col(bytesCol), lit(0L)))
      // integer floor div (not double /): exact for any target, matching
      // the oracle's `//` even past double's 2^53 exact-integer range
      .withColumn("bucket", expr(s"bytes_before div $targetBytes"))
      .groupBy(col(partCol), col("bucket"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(bytesCol)).as("bucket_bytes"),
        min(col(fileCol)).as("first_file"),
        max(col(fileCol)).as("last_file"))
      .orderBy(col(partCol), col("bucket"))
  }

  private val target = 2048L // bytes; small so the sf fixtures produce multi-bucket plans

  /** Driver-contract query: derive a deterministic small-file manifest
    * from `documents` (file = (source, doc_id % 53) with its summed UTF-8
    * text bytes — a 53-way hash-sharded landing layout), then plan its
    * compaction to 2 KiB targets. Output = the rewrite job's task list:
    * per (source, bucket), file count, fill, and the file-id span. */
  def compactionPlan(s: SparkSession, d: String): DataFrame = {
    val manifest = Tables.documents(s, d)
      .groupBy(col("source"), (col("doc_id") % 53).as("file_id"))
      .agg(sum(octet_length(col("text")).cast("long")).as("bytes"),
        count(lit(1)).as("n_docs"))
    plan(manifest, "source", "file_id", "bytes", target)
  }

  private val compactionPlanSql =
    """WITH manifest AS (
      |  SELECT source, doc_id % 53 AS file_id,
      |    CAST(sum(octet_length(encode(text))) AS BIGINT) AS bytes
      |  FROM documents GROUP BY 1, 2
      |), placed AS (
      |  SELECT source, file_id, bytes,
      |    CAST(coalesce(sum(bytes) OVER (PARTITION BY source ORDER BY file_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS bytes_before
      |  FROM manifest
      |)
      |SELECT source, CAST(bytes_before // 2048 AS BIGINT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_files,
      |  CAST(sum(bytes) AS BIGINT) AS bucket_bytes,
      |  CAST(min(file_id) AS BIGINT) AS first_file,
      |  CAST(max(file_id) AS BIGINT) AS last_file
      |FROM placed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val all: Seq[Q] = Seq(
    Q("corpus_compaction_plan", compactionPlan, Some(compactionPlanSql))
  )
}
