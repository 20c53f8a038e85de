package graft

import sources.Compaction

/** Next-fit compaction planner invariants on the documents-derived
  * manifest: lossless file coverage, the next-fit overshoot bound, and
  * plan determinism. */
class CompactionSpec extends SparkSpec {

  test("plan covers every manifest file exactly once (no file lost or split)") {
    import org.apache.spark.sql.functions._
    val plan = Compaction.compactionPlan(spark, sf)
    val planned = plan.agg(sum("n_files")).head.getLong(0)
    val files = Tables.documents(spark, sf)
      .select(col("source"), (col("doc_id") % 53).as("file_id"))
      .distinct().count()
    assert(planned == files)
  }

  test("next-fit bound: no bucket exceeds target + the partition's max file size") {
    import org.apache.spark.sql.functions._
    val manifest = Tables.documents(spark, sf)
      .groupBy(col("source"), (col("doc_id") % 53).as("file_id"))
      .agg(sum(octet_length(col("text")).cast("long")).as("bytes"))
    val maxFile = manifest.groupBy("source").agg(max("bytes").as("max_file"))
    val bad = Compaction.plan(manifest, "source", "file_id", "bytes", 2048L)
      .join(maxFile, "source")
      .filter(col("bucket_bytes") > lit(2048L) + col("max_file"))
      .count()
    assert(bad == 0L)
  }

  test("buckets are contiguous file spans: next bucket starts after the previous ends") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("bucket")
    val bad = Compaction.compactionPlan(spark, sf)
      .withColumn("prev_last", lag("last_file", 1).over(w))
      .filter(col("prev_last").isNotNull && col("first_file") <= col("prev_last"))
      .count()
    assert(bad == 0L)
  }

  test("plan is deterministic across evaluations") {
    val a = Compaction.compactionPlan(spark, sf).collect().toSeq
    val b = Compaction.compactionPlan(spark, sf).collect().toSeq
    assert(a == b)
  }
}
