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
  *  - the manifest (partition → hash) is a human-diffable line file up to
  *    `driverManifestMax` partitions and a parquet table next to the
  *    output beyond it — the diff against it is a partition-grain join
  *    either way, so partition-key cardinality never pins driver memory,
  *  - changed partitions are rewritten via dynamic partition overwrite, so
  *    untouched partition directories are never rewritten (their files keep
  *    their timestamps — IncrementalSpec asserts exactly that).
  *
  * The transform must preserve `partitionCol` (it is the write key).
  */
object Incremental {

  /** Per-partition content hashes as a RELATION: (p string, h long). The
    * per-row hashes are summed as DECIMAL(38,0) — a LONG sum of full-range
    * 64-bit hashes overflows, which ANSI mode turns into a runtime THROW
    * at a handful of rows per partition — then reduced mod 2^63-1 back to
    * a long. Order-independent (sum), value- and count-sensitive. */
  private[graft] def partitionHashDf(df: DataFrame, partitionCol: String): DataFrame = {
    val dataCols = df.columns.sorted.map(c => col(s"`$c`"))
    val longMax = new java.math.BigDecimal(java.lang.Long.MAX_VALUE)
    df.groupBy(col(s"`$partitionCol`").cast("string").as("p"))
      .agg(sum(xxhash64(dataCols: _*).cast("decimal(38,0)")).as("hs"),
        count(lit(1)).as("n"))
      .select(col("p"), {
        val m = pmod(col("hs"), lit(longMax)).cast("long")
        shiftleft(m, 17).bitwiseOR(shiftrightunsigned(m, 47))
          .bitwiseXOR(col("n")).as("h")
      })
  }

  /** Order-independent content hash per partition-key value (driver map
    * form — bounded use only; `materialize` routes through the relation). */
  private[graft] def partitionHashes(df: DataFrame, partitionCol: String): Map[String, Long] =
    partitionHashDf(df, partitionCol).collect()
      .map(r => r.getAs[String]("p") -> r.getAs[Long]("h")).toMap

  /** Above this partition count the manifest is kept as a PARQUET table
    * next to the output instead of a driver-side line file: a date-grain
    * partition key is partition-listing-sized either way, but a
    * high-cardinality key (user, url-host) would grow the driver map
    * without bound. */
  private[graft] val defaultDriverManifestMax = 100000L

  private def manifestPath(outDir: String) =
    java.nio.file.Paths.get(outDir, "_graft_manifest")

  private def pqManifestPath(outDir: String) =
    java.nio.file.Paths.get(outDir, "_graft_manifest_pq")

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

  /** The previous run's manifest as a relation, whichever format it was
    * written in; None = first run. */
  private def readPrevHashDf(s: SparkSession, outDir: String): Option[DataFrame] = {
    val pq = pqManifestPath(outDir)
    if (java.nio.file.Files.isDirectory(pq)) Some(s.read.parquet(pq.toString))
    else if (java.nio.file.Files.exists(manifestPath(outDir))) {
      import s.implicits._
      Some(readManifest(outDir).toSeq.toDF("p", "h"))
    } else None
  }

  /** Materialize `transform(input)` under `outDir` partitioned by
    * `partitionCol`, recomputing only partitions whose input changed.
    * Returns the partition values that were recomputed (empty = everything
    * was up to date).
    *
    * The change DIFF is a partition-grain left join computed on the
    * cluster; only the CHANGED keys reach the driver (delta-bounded — the
    * incremental contract — except on a first run, where the return value
    * is partition-listing-sized by definition). The manifest itself stays
    * a human-diffable line file up to `driverManifestMax` partitions and
    * spills to a parquet table next to the output beyond it, so the key's
    * cardinality never pins driver memory. */
  def materialize(input: DataFrame, partitionCol: String, outDir: String,
      driverManifestMax: Long = defaultDriverManifestMax)(
      transform: DataFrame => DataFrame): Seq[String] = {
    val s = input.sparkSession
    val hashes = partitionHashDf(input, partitionCol).cache()
    try {
      val nParts = hashes.count()
      val prev = readPrevHashDf(s, outDir)
      // the changed set stays a RELATION: the write path semi-joins
      // against it (a churn-heavy day on a high-cardinality partition key
      // would otherwise put 10^4-10^5 string literals INTO the plan as an
      // IN-list — analysis + codegen cost in exactly the cardinality
      // regime the parquet manifest spill exists for); only the returned
      // work list collects, and that stays delta-bounded
      val changedDf: Option[DataFrame] = prev.map { pdf =>
        hashes.join(pdf.select(col("p"), col("h").as("h_prev")), Seq("p"), "left")
          .filter(col("h_prev").isNull || col("h_prev") =!= col("h"))
          .select("p")
      }
      val changed: Seq[String] = changedDf.getOrElse(hashes.select("p"))
        .collect().map(_.getString(0)).toSeq.sorted
      if (changed.nonEmpty) {
        val prevMode = s.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try {
          // first run writes the whole input — no selection over a full
          // listing; incremental runs semi-join the changed-keys relation
          // (hashes is cached, so re-deriving the diff for the join is a
          // partition-grain re-read, and AQE broadcasts the small side)
          val src = changedDf match {
            case None => input
            case Some(cdf) =>
              input.join(cdf.select(col("p").as("__graft_changed_p")),
                col(s"`$partitionCol`").cast("string") ===
                  col("__graft_changed_p"),
                "left_semi")
          }
          transform(src).write.mode(SaveMode.Overwrite)
            .partitionBy(partitionCol)
            .parquet(outDir)
        } finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
      }
      // manifest write AFTER the data write (a crash between them merely
      // re-runs the changed partitions — idempotent); exactly one format
      // survives so the next run's readPrevHashDf is unambiguous
      if (nParts <= driverManifestMax) {
        writeManifest(outDir, hashes.collect()
          .map(r => r.getString(0) -> r.getAs[Long]("h")).toMap)
        val pq = pqManifestPath(outDir).toFile
        if (pq.isDirectory) Staging.deleteRecursively(pq)
      } else {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        hashes.write.mode(SaveMode.Overwrite).parquet(pqManifestPath(outDir).toString)
        java.nio.file.Files.deleteIfExists(manifestPath(outDir))
      }
      changed
    } finally {
      hashes.unpersist()
      ()
    }
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
