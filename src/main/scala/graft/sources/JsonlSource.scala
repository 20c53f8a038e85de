package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL ingestion with schema inference + one-level flatten — the
  * reference's normalize_json.py (json.loads per line →
  * pandas.json_normalize(records, max_level=1) → parquet) as a Spark
  * source component.
  *
  * `spark.read.json` IS the distributed json-lines reader (per-line records,
  * schema inferred across the cluster); the one-level flatten mirrors
  * json_normalize's `parent.child` columns (underscore separator — dots in
  * Spark column names collide with field-path syntax). Inference at 100 TB:
  * pin `schema(...)` or sample with `samplingRatio` instead of the default
  * full pass; the flatten itself is a pure projection Catalyst prunes
  * through. */
object JsonlSource {

  /** pandas.json_normalize(max_level=1): each top-level struct column is
    * expanded to `parent_child` columns; everything else passes through. */
  def flattenOneLevel(df: DataFrame, sep: String = "_"): DataFrame = {
    val cols = df.schema.fields.flatMap { f =>
      f.dataType match {
        case st: StructType =>
          st.fieldNames.toSeq.map(c => col(s"`${f.name}`.`$c`").as(s"${f.name}$sep$c"))
        case _ => Seq(col(s"`${f.name}`"))
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** Read JSONL file(s) into a flattened DataFrame. */
  def read(s: SparkSession, path: String): DataFrame =
    flattenOneLevel(s.read.json(path))

  /** normalize_json.py main(): JSONL in → flattened parquet out. */
  def normalizeToParquet(s: SparkSession, inPath: String, outPath: String): DataFrame = {
    val df = read(s, inPath)
    df.write.mode(SaveMode.Overwrite).parquet(outPath)
    s.read.parquet(outPath)
  }

  /** Stage a nested JSONL fixture derived from the events table (one JSON
    * record per line, a one-level `user` struct to exercise the flatten) —
    * a distributed text write, rewritten per call. */
  private[graft] def stageJsonl(s: SparkSession, d: String): String = {
    val staged = Staging.dir("jsonl", d)
    Tables.events(s, d)
      .select(to_json(struct(
        col("event_id"),
        struct(col("user_id").as("id"), col("event_type").as("type")).as("user"),
        col("value"))).as("line"))
      .write.mode(SaveMode.Overwrite).text(staged)
    staged
  }

  /** Driver-contract query: stage JSONL from events, read it back through
    * schema inference + flatten, aggregate per flattened user_type. The
    * oracle runs over the ORIGINAL parquet — so the hash compare proves the
    * whole JSONL round trip (to_json → text → inference → flatten) is
    * value-exact, doubles included. */
  def jsonlNormalize(s: SparkSession, d: String): DataFrame = {
    val flat = read(s, stageJsonl(s, d))
    flat.groupBy(col("user_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum("value"), 2).as("total_value"),
        min("event_id").as("min_event_id"))
      .orderBy("user_type")
  }

  private val jsonlNormalizeSql =
    """SELECT event_type AS user_type, count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users,
      |  round(sum(value), 2) AS total_value,
      |  min(event_id) AS min_event_id
      |FROM events GROUP BY 1 ORDER BY user_type""".stripMargin

  /** Flat JSONL fixture for the V2 connector (no nested struct — the V2
    * reader is deliberately a FLAT-record source; nesting is the DataFrame
    * flatten's job, demonstrated by jsonl_normalize above). */
  private[graft] def stageFlatJsonl(s: SparkSession, d: String): String = {
    val staged = Staging.dir("jsonl_flat", d)
    Tables.events(s, d)
      .select(to_json(struct(
        col("event_id"), col("user_id"), col("event_type"), col("value"))).as("line"))
      .write.mode(SaveMode.Overwrite).text(staged)
    staged
  }

  /** Driver-contract query through the custom DataSource V2 connector
    * (sources/JsonlV2.scala): stage flat JSONL, read it back via
    * `format("graft-jsonl")` — schema INFERRED by the connector, the
    * value-filter PUSHED into the partition readers, and user_id PRUNED out
    * of the scan (none of the aggregate's inputs need it) — then aggregate.
    * The oracle runs on the ORIGINAL events parquet, so a hash match proves
    * the connector's inference + pushdown + parse round trip is value-exact
    * including doubles. PlanSpec asserts the pushdown/pruning are visible
    * in the scan description. */
  def jsonlV2Scan(s: SparkSession, d: String): DataFrame = {
    val staged = stageFlatJsonl(s, d)
    s.read.format("graft-jsonl").load(staged)
      .filter(col("value") > 0.5)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("total_cents"),
        min("event_id").as("min_event_id"))
      .orderBy("event_type")
  }

  private val jsonlV2ScanSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
      |  CAST(min(event_id) AS BIGINT) AS min_event_id
      |FROM events WHERE value > 0.5
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Driver-contract query through the connector's AGGREGATE PUSHDOWN
    * (sources/JsonlV2 SupportsPushDownAggregates, partial mode): the
    * count/sum/min/max over bare BIGINT columns translate, so each file
    * partition emits ONE pre-aggregated row per event_type and Spark only
    * merges partials — the connector-side map-side combine that turns a
    * 1000-file scan into |groups| rows per file on the wire. The oracle
    * runs on the ORIGINAL events parquet, so the hash match proves the
    * pushed partial semantics equal the unpushed plan exactly. PlanSpec
    * asserts PushedAggregation appears in the scan. */
  def jsonlV2Agg(s: SparkSession, d: String): DataFrame = {
    val staged = stageFlatJsonl(s, d)
    s.read.format("graft-jsonl").load(staged)
      .groupBy("event_type")
      .agg(count(col("event_id")).as("n_events"),
        sum(col("user_id")).as("sum_user"),
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"))
      .orderBy("event_type")
  }

  private val jsonlV2AggSql =
    """SELECT event_type, CAST(count(event_id) AS BIGINT) AS n_events,
      |  CAST(sum(user_id) AS BIGINT) AS sum_user,
      |  CAST(min(event_id) AS BIGINT) AS min_event_id,
      |  CAST(max(event_id) AS BIGINT) AS max_event_id
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Driver-contract query through the connector's WRITE path: events →
    * `df.write.format("graft-jsonl")` (two-phase task commit: temp file per
    * task, driver rename on job commit) → read back through the same
    * connector (schema inferred) → aggregate with a props md5 checksum.
    * The oracle runs on the ORIGINAL parquet, so the hash match proves the
    * whole write-commit-read cycle value-exact — including JSON string
    * escaping of the props column in BOTH directions. */
  def jsonlV2Write(s: SparkSession, d: String): DataFrame = {
    val staged = Staging.dir("jsonl_w", d)
    val dir = new java.io.File(staged)
    if (dir.exists()) Staging.deleteRecursively(dir) // fresh target: the writer is append-only
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"), col("props"))
      .write.format("graft-jsonl").mode(SaveMode.Append).save(staged)
    s.read.format("graft-jsonl").load(staged)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum("cents").as("total_cents"),
        sum(conv(substring(md5(col("props")), 1, 8), 16, 10).cast("long"))
          .as("props_checksum"))
      .orderBy("event_type")
  }

  private val jsonlV2WriteSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
      |  CAST(sum(CAST(('0x' || substr(md5(props), 1, 8))::BIGINT AS BIGINT))
      |    AS BIGINT) AS props_checksum
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val all: Seq[Q] = Seq(
    Q("jsonl_normalize", jsonlNormalize, Some(jsonlNormalizeSql)),
    Q("jsonl_v2_scan", jsonlV2Scan, Some(jsonlV2ScanSql)),
    Q("jsonl_v2_agg", jsonlV2Agg, Some(jsonlV2AggSql)),
    Q("jsonl_v2_write", jsonlV2Write, Some(jsonlV2WriteSql))
  )
}
