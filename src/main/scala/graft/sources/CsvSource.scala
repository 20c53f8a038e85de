package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV ingest — the format every real pipeline still meets at its edges
  * (the reference's manual-collection spreadsheets arrive as CSV exports;
  * sheaswauger/dissertation-data-pipeline scripts/legislation/
  * build_master_corpus.py reads them with pandas read_csv).
  *
  * The round-trip is deliberately HOSTILE: the staged CSV carries the raw
  * `props` JSON column — embedded commas, braces, and double quotes in
  * every row — so the writer's RFC-4180 quoting and the reader's unescaping
  * are both on the hash path. Money travels as integer cents (CSV text is
  * no place for binary doubles). The DuckDB oracle reads the ORIGINAL
  * parquet, so a hash match proves the whole text round trip (quote →
  * escape → parse → type) value-exact, including an md5-prefix checksum
  * over every props string.
  *
  * Scale: CSV read is splittable (no embedded newlines here), schema is
  * EXPLICIT on read (inference is a separate full scan — never pay it per
  * job), and the staged directory writes one file per shuffle partition so
  * a 1000-executor read parallelizes. */
object CsvSource {

  private[graft] def stageCsv(s: SparkSession, d: String): String = {
    val staged = Staging.dir("csv", d)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"), col("props"))
      .write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("quoteAll", "true") // every field quoted: the hostile profile
      // Spark's CSV default escapes quotes with backslash; RFC 4180 doubles
      // them. Doubled-quote files are what external readers (pandas, Excel,
      // DuckDB read_csv defaults) parse correctly, so stage true RFC 4180.
      .option("escape", "\"")
      .csv(staged)
    staged
  }

  private val csvSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("cents", LongType),
    StructField("props", StringType)))

  /** Driver-contract query: stage CSV from events, read it back with an
    * explicit schema, aggregate per event_type with a props checksum. */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val staged = stageCsv(s, d)
    s.read.schema(csvSchema).option("header", "true")
      .option("escape", "\"") // match the RFC-4180 doubled-quote staging
      .csv(staged)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        sum("cents").as("total_cents"),
        sum(conv(substring(md5(col("props")), 1, 8), 16, 10).cast("long"))
          .as("props_checksum"))
      .orderBy("event_type")
  }

  private val csvRoundtripSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
      |  CAST(sum(CAST(('0x' || substr(md5(props), 1, 8))::BIGINT AS BIGINT))
      |    AS BIGINT) AS props_checksum
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val all: Seq[Q] = Seq(
    Q("csv_roundtrip", csvRoundtrip, Some(csvRoundtripSql)))
}
