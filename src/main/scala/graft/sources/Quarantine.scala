package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}

/** Corrupt-tolerant ingest with a QUARANTINE channel — the reference keeps
  * going past per-document failures and records them for later triage
  * (sheaswauger/dissertation-data-pipeline scripts/legislation/utils.py:59-138
  * `ErrorLogger`, fetch_texts.py per-bill try/except). Re-expressed
  * Spark-first: ONE distributed text scan, a PERMISSIVE `from_json` parse
  * against a pinned schema, and two declarative filters off the same parsed
  * relation — good rows flow on as typed columns, bad rows land in a
  * quarantine relation carrying the raw payload and a failure reason. No
  * row is ever dropped silently and no exception ever kills the job:
  * exactly the `ErrorLogger` contract, but at 100 TB the quarantine is a
  * relation you can aggregate/join/replay, not a log file on one machine.
  *
  * Failure classification is schema-driven, not exception-driven:
  * `from_json` in PERMISSIVE mode parses what it can and records the raw
  * line in `_corrupt_record` when anything failed. A corrupt row with at
  * least one field recovered was VALID json with a wrong-typed field
  * (`type_mismatch`); a corrupt row with nothing recovered was not JSON at
  * all (`malformed_json`). Both classes keep the full raw payload, so
  * downstream repair (regex salvage, reprocessing with a widened schema)
  * has everything the source had.
  *
  * Scale shape: text scan → codegen'd from_json → two filter branches.
  * Nothing is cached — each branch re-reads the (columnar-pruned) scan, or
  * a real pipeline writes both branches in one pass. The quarantine side
  * is grouped only by reason (bounded grid); the survivor side is a normal
  * partial hash-aggregate. */
object Quarantine {

  /** Good/bad split of a JSONL path under a pinned schema. */
  final case class Split(good: DataFrame, quarantine: DataFrame)

  /** Parse `path` as JSONL against `schema`; route rows that fail to a
    * quarantine relation (raw payload + reason) instead of failing the job
    * or silently nulling fields. */
  def ingest(s: SparkSession, path: String, schema: StructType): Split = {
    val full = schema.add("_corrupt_record", StringType)
    val parsed = s.read.text(path)
      .select(col("value").as("raw"))
      .withColumn("rec", from_json(col("raw"), full,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")))
    val corrupt = col("rec._corrupt_record").isNotNull || col("rec").isNull
    val anyParsed: Column = schema.fieldNames
      .map(f => col(s"rec.`$f`").isNotNull).reduce(_ || _)
    val good = parsed.filter(!corrupt)
      .select(schema.fieldNames.toSeq.map(f => col(s"rec.`$f`").as(f)): _*)
    val quarantine = parsed.filter(corrupt)
      .select(col("raw"),
        when(anyParsed, lit("type_mismatch"))
          .otherwise(lit("malformed_json")).as("reason"))
    Split(good, quarantine)
  }

  private val eventSchema = new StructType()
    .add("event_id", LongType).add("user_id", LongType)
    .add("event_type", StringType).add("value", DoubleType)

  /** Stage a JSONL fixture from events with two DETERMINISTIC planted
    * corruption classes, keyed on event_id so the DuckDB oracle can state
    * the expected split arithmetically:
    *   - event_id % 13 == 0 → final byte truncated (not JSON at all);
    *   - event_id % 13 == 1 → `value` emitted as a non-numeric string
    *     (valid JSON, wrong type under the pinned schema);
    *   - everything else    → clean.  */
  private[graft] def stageCorruptJsonl(s: SparkSession, d: String): String =
    Staging.ensureFixture("jsonl_q", d) { staged =>
      val clean = to_json(struct(
        col("event_id"), col("user_id"), col("event_type"), col("value")))
      val typed = to_json(struct(
        col("event_id"), col("user_id"), col("event_type"),
        lit("not_a_number").as("value")))
      Tables.events(s, d)
        .select(
          when(col("event_id") % 13 === 0, clean.substr(lit(1), length(clean) - 1))
            .when(col("event_id") % 13 === 1, typed)
            .otherwise(clean).as("out"))
        .write.mode(SaveMode.Overwrite).text(staged)
    }

  /** Driver-contract query: the SURVIVOR side — corrupt lines planted in
    * 2/13 of the fixture must not poison the ingest; the good rows
    * aggregate to exactly the oracle's view of the untainted subset. The
    * hash match proves (a) no good row was lost, (b) no bad row leaked
    * through, (c) the parse of survivors is value-exact. */
  def quarantineIngest(s: SparkSession, d: String): DataFrame = {
    val split = ingest(s, stageCorruptJsonl(s, d), eventSchema)
    split.good
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("total_cents"),
        sum("event_id").as("sum_event_id"))
      .orderBy("event_type")
  }

  private val quarantineIngestSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
      |  CAST(sum(event_id) AS BIGINT) AS sum_event_id
      |FROM events WHERE event_id % 13 NOT IN (0, 1)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Driver-contract query: the QUARANTINE side — per failure reason, the
    * row count plus the sum of event ids RECOVERED FROM THE RAW PAYLOAD
    * (regexp over the quarantined line — truncation clips the tail, the id
    * sits at the head). The hash match proves the quarantine holds exactly
    * the planted rows, correctly classified, payload intact. */
  def quarantineAudit(s: SparkSession, d: String): DataFrame = {
    val split = ingest(s, stageCorruptJsonl(s, d), eventSchema)
    split.quarantine
      .select(col("reason"),
        regexp_extract(col("raw"), "\"event_id\":(\\d+)", 1)
          .cast("long").as("eid"))
      .groupBy("reason")
      .agg(count(lit(1)).as("n_bad"), sum("eid").as("sum_event_id"))
      .orderBy("reason")
  }

  private val quarantineAuditSql =
    """SELECT 'malformed_json' AS reason, CAST(count(*) AS BIGINT) AS n_bad,
      |  CAST(sum(event_id) AS BIGINT) AS sum_event_id
      |FROM events WHERE event_id % 13 = 0
      |UNION ALL
      |SELECT 'type_mismatch' AS reason, CAST(count(*) AS BIGINT) AS n_bad,
      |  CAST(sum(event_id) AS BIGINT) AS sum_event_id
      |FROM events WHERE event_id % 13 = 1
      |ORDER BY reason""".stripMargin

  val all: Seq[Q] = Seq(
    Q("quarantine_ingest", quarantineIngest, Some(quarantineIngestSql)),
    Q("quarantine_audit", quarantineAudit, Some(quarantineAuditSql))
  )
}
