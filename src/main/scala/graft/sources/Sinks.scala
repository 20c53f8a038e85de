package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Output sinks — the reference emits parquet + CSV artifacts per stage
  * (build_corpus.py:99-108, normalize_corpus.py:299-305); at 100 TB the
  * layout IS the performance feature:
  *
  *  - `writePartitioned`: hive-style partition directories → partition
  *    pruning for every downstream reader that filters on the key.
  *  - `writeBucketed`: pre-shuffled bucket layout → downstream joins and
  *    aggregations on the bucket key skip their exchange entirely.
  *  - `writeCsv`: the reference's human-facing export (single file, header).
  */
object Sinks {

  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed managed table (bucket pruning + exchange-free joins on
    * `bucketCol` for any reader that joins on it). saveAsTable is required —
    * bucketing metadata lives in the catalog. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Single-file CSV with header — the reference's report/export shape (only
    * for small, final outputs; coalesce(1) is deliberate and documented). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .csv(path)

  def readPartitioned(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)
}
