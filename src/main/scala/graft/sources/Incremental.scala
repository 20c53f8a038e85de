package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialization: recompute and rewrite ONLY the partitions
  * whose input content changed since the last run.
  *
  * This is the Spark-native form of the reference's cache/change-detection
  * layer (legiscan_enricher.py:64 APICache; legiscan_api.py:42-55 hashes
  * each payload and skips unchanged bills): instead of caching API responses
  * row by row, hash each input PARTITION and skip the transform + write for
  * partitions whose hash is unchanged. Re-running a 100 TB pipeline after a
  * 0.1% source delta then costs 0.1%, not a full recompute.
  *
  * Mechanics:
  *  - the per-partition content hash is one hash-aggregate over the input
  *    (sum of per-row xxhash64 + row count — order-independent, so it is
  *    stable under any shuffle/partitioning of the same rows),
  *  - the manifest (partition → hash) is driver-side metadata, one line per
  *    partition — bounded like any partition listing, NOT data,
  *  - changed partitions are rewritten via dynamic partition overwrite, so
  *    untouched partition directories are never rewritten (their files keep
  *    their timestamps — IncrementalSpec asserts exactly that).
  *
  * The transform must preserve `partitionCol` (it is the write key).
  */
object Incremental {

  /** Order-independent content hash per partition-key value. */
  private[graft] def partitionHashes(df: DataFrame, partitionCol: String): Map[String, Long] = {
    val dataCols = df.columns.sorted.map(c => col(s"`$c`"))
    df.groupBy(col(s"`$partitionCol`").cast("string").as("p"))
      .agg(sum(xxhash64(dataCols: _*)).as("h"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[String]("p") ->
        (java.lang.Long.rotateLeft(r.getAs[Long]("h"), 17) ^ r.getAs[Long]("n")))
      .toMap
  }

  private def manifestPath(outDir: String) =
    java.nio.file.Paths.get(outDir, "_graft_manifest")

  private[sources] def readManifest(outDir: String): Map[String, Long] = {
    val p = manifestPath(outDir)
    if (!java.nio.file.Files.exists(p)) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(p).asScala.filter(_.nonEmpty).map { line =>
        val i = line.lastIndexOf('\t')
        line.substring(0, i) -> line.substring(i + 1).toLong
      }.toMap
    }
  }

  private def writeManifest(outDir: String, m: Map[String, Long]): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.write(manifestPath(outDir),
      m.toSeq.sorted.map { case (k, v) => s"$k\t$v" }.mkString("\n").getBytes("UTF-8"))
  }

  /** Materialize `transform(input)` under `outDir` partitioned by
    * `partitionCol`, recomputing only partitions whose input changed.
    * Returns the partition values that were recomputed (empty = everything
    * was up to date). */
  def materialize(input: DataFrame, partitionCol: String, outDir: String)(
      transform: DataFrame => DataFrame): Seq[String] = {
    val s = input.sparkSession
    val current = partitionHashes(input, partitionCol)
    val previous = readManifest(outDir)
    val changed = current.collect {
      case (p, h) if !previous.get(p).contains(h) => p
    }.toSeq.sorted
    if (changed.nonEmpty) {
      val prevMode = s.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        transform(input.filter(col(s"`$partitionCol`").cast("string").isin(changed: _*)))
          .write.mode(SaveMode.Overwrite)
          .partitionBy(partitionCol)
          .parquet(outDir)
      } finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
    }
    writeManifest(outDir, current)
    changed
  }

  /** The RESUME DECISION as a relation — the reference's ProcessingTracker
    * (scripts/legislation/utils.py:17-56: record processed batches, skip
    * them on restart) restated as a manifest DIFF query: per partition key,
    * compare an order-independent content hash (portable md5-prefix sum +
    * row count) between the current input and the previous run's snapshot,
    * and emit `new` / `removed` / `changed` / `unchanged`. Downstream, the
    * non-`unchanged` rows ARE the work list a resumed run processes —
    * relational, joinable, and cluster-computed, where the reference keeps
    * a JSON set on one machine.
    *
    * Scale shape: one partial hash-aggregate per side to partition-grain
    * rows, then a partition-grain full-outer join — the manifest never
    * exists as driver state (unlike `materialize`'s bounded map, this form
    * also works when the partition count itself is huge). */
  def manifestDiff(cur: DataFrame, prev: DataFrame,
      partCol: String, idCol: String): DataFrame = {
    def side(df: DataFrame): DataFrame = df
      .groupBy(col(s"`$partCol`").as("p"))
      .agg(sum(conv(substring(md5(col(s"`$idCol`").cast("string")), 1, 8), 16, 10)
        .cast("long")).as("h"), count(lit(1)).as("n"))
    side(cur).alias("c")
      .join(side(prev).alias("pv"), col("c.p") === col("pv.p"), "full_outer")
      .select(
        coalesce(col("c.p"), col("pv.p")).as(partCol),
        when(col("pv.p").isNull, "new")
          .when(col("c.p").isNull, "removed")
          .when(col("c.h") =!= col("pv.h") || col("c.n") =!= col("pv.n"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("pv.n"), lit(0L)).as("n_prev"),
        coalesce(col("c.n"), lit(0L)).as("n_cur"))
  }

  /** Driver-contract query: manifest diff over the events table bucketed by
    * day, against a DETERMINISTIC previous-run snapshot the oracle can
    * restate arithmetically: the snapshot is missing the final day entirely
    * (→ `new`) and, on every third day, the event_id % 97 == 0 rows
    * (late-arriving data → `changed`); all other days hash identical
    * (→ `unchanged`). */
  def incrementalManifest(s: SparkSession, d: String): DataFrame = {
    val ms = graft.functions.TimeFunctions.nsToMs("ts")
    val dayMs = 86400000L
    val ev = Tables.events(s, d)
      .select(col("event_id"), ((ms - pmod(ms, lit(dayMs))) / dayMs)
        .cast("long").as("day"))
    val maxDay = ev.agg(max("day")).head.getLong(0) // bounded driver scalar
    val prev = ev.filter(col("day") < maxDay &&
      !(col("event_id") % 97 === 0 && col("day") % 3 === 0))
    manifestDiff(ev, prev, "day", "event_id").orderBy("day")
  }

  private val incrementalManifestSql =
    """WITH e AS (
      |  SELECT event_id, CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
      |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
      |      AS BIGINT) AS h
      |  FROM events
      |), mx AS (SELECT max(day) AS maxday FROM e),
      |cur AS (
      |  SELECT day, CAST(sum(h) AS BIGINT) AS hash, CAST(count(*) AS BIGINT) AS n
      |  FROM e GROUP BY day
      |), prev AS (
      |  SELECT day, CAST(sum(h) AS BIGINT) AS hash, CAST(count(*) AS BIGINT) AS n
      |  FROM e, mx
      |  WHERE day < maxday AND NOT (event_id % 97 = 0 AND day % 3 = 0)
      |  GROUP BY day
      |)
      |SELECT coalesce(c.day, p.day) AS day,
      |  CASE WHEN p.day IS NULL THEN 'new'
      |       WHEN c.day IS NULL THEN 'removed'
      |       WHEN c.hash <> p.hash OR c.n <> p.n THEN 'changed'
      |       ELSE 'unchanged' END AS status,
      |  coalesce(p.n, 0) AS n_prev, coalesce(c.n, 0) AS n_cur
      |FROM cur c FULL OUTER JOIN prev p ON c.day = p.day
      |ORDER BY day""".stripMargin

  val all: Seq[Q] = Seq(
    Q("incremental_manifest", incrementalManifest, Some(incrementalManifestSql)))
}
