package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
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
}
