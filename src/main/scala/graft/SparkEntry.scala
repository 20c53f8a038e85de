package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each Q carries its DataFrame builder plus (when SQL-expressible) the
  * DuckDB oracle SQL with identical column names / rounding / ordering.
  */
object SparkEntry {

  /** All implemented operators, one Q per SURVEY.md §2 line. */
  def allQueries: Seq[Q] =
    operators.Relational.all ++
      operators.TpchClassics.all ++
      operators.Corpus.all ++
      operators.TextAnalysis.all ++
      operators.BpeTrain.all ++
      operators.UnigramLm.all ++
      operators.Sessionize.all ++
      operators.Attribution.all ++
      operators.Privacy.all ++
      operators.BotDetect.all ++
      operators.Dedup.all ++
      operators.Similarity.all ++
      operators.Skew.all ++
      operators.AsOf.all ++
      operators.Graph.all ++
      operators.Mining.all ++
      operators.TimeSeries.all ++
      operators.StatTests.all ++
      operators.Multimodal.all ++
      operators.LlmPretrain.all ++
      sources.JsonlSource.all ++
      sources.Quarantine.all ++
      sources.Incremental.all ++
      sources.ZipIngest.all ++
      sources.TarIngest.all ++
      sources.WarcIngest.all ++   // zip/tar/WARC: the container-ingest trio
      sources.Compaction.all ++
      sources.CsvSource.all :+
      Q("streaming_sessionize", streaming.EventStream.streamingSessionize,
        Some(streaming.EventStream.streamingSessionizeSql)) :+
      Q("streaming_dedup", streaming.EventStream.streamingDedup,
        Some(streaming.EventStream.streamingDedupSql)) :+
      Q("streaming_tumbling", streaming.EventStream.streamingTumbling,
        Some(streaming.EventStream.streamingTumblingSql)) :+
      Q("streaming_funnel", streaming.EventStream.streamingFunnel,
        Some(streaming.EventStream.streamingFunnelSql)) :+
      Q("streaming_join", streaming.EventStream.streamingJoin,
        Some(streaming.EventStream.streamingJoinSql)) :+
      Q("streaming_attribution", streaming.EventStream.streamingAttribution,
        Some(streaming.EventStream.streamingAttributionSql)) :+
      Q("streaming_hopping", streaming.EventStream.streamingHopping,
        Some(streaming.EventStream.streamingHoppingSql)) :+
      Q("streaming_cdc_upsert", streaming.EventStream.streamingCdcUpsert,
        Some(streaming.EventStream.streamingCdcUpsertSql)) :+
      Q("streaming_late_drop", streaming.EventStream.streamingLateDrop,
        Some(streaming.EventStream.streamingLateDropSql)) :+
      Q("streaming_enrich", streaming.EventStream.streamingEnrich,
        Some(streaming.EventStream.streamingEnrichSql)) :+
      Q("streaming_join_outer", streaming.EventStream.streamingJoinOuter,
        Some(streaming.EventStream.streamingJoinOuterSql)) :+
      Q("streaming_kmv", streaming.EventStream.streamingKmv,
        Some(streaming.EventStream.streamingKmvSql))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
