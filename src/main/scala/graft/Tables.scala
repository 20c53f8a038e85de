package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * The reference pipeline's corpus tables (sheaswauger/dissertation-data-pipeline,
  * scripts/legislation/build_corpus.py:21 FINAL_COLUMNS) are modeled here by
  * `documents`; the TPC-H-ish star schema carries the relational operators and
  * `events`/`embeddings` carry sessionization and similarity work.
  *
  * Plain `spark.read.parquet` keeps the scan declarative so Catalyst pushes
  * filters and prunes columns down to the parquet reader.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read it as a raw nanosecond LONG instead —
    * downstream operators do exact integer arithmetic on it
    * (TimeFunctions.nsToMs; double math would lose precision above 2^53).
    *
    * DELIBERATE side effect: nanosAsLong is a session conf, so after the
    * first events read, any TIMESTAMP(NANOS) parquet column in this session
    * reads as LONG. There is no per-read switch for it; restoring the flag
    * after this call would race the lazy scan. Scoped sessions
    * (spark.newSession()) isolate callers that need nanos-as-timestamp. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
