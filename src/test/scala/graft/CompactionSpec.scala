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
    val bad = Compaction.plan(manifest, "source", "file_id", "bytes",
        Compaction.target)
      .join(maxFile, "source")
      .filter(col("bucket_bytes") > lit(Compaction.target) + col("max_file"))
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

  test("apply: one output file per plan bucket, end-to-end bound and plan consistency") {
    import org.apache.spark.sql.functions._
    val plan = Compaction.compactionPlan(spark, sf).collect()
    val root = new java.io.File(Compaction.compactedDir(spark, sf))
    // one parquet file per (source, bucket) directory, bucket-dir count ==
    // plan bucket count — the rewrite's whole point, asserted on the REAL
    // filesystem, not a DataFrame
    val bucketDirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("source="))
      .flatMap(src => Option(src.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("bucket=")))
    assert(bucketDirs.length == plan.length,
      s"bucket dirs ${bucketDirs.length} != plan buckets ${plan.length}")
    bucketDirs.foreach { bd =>
      val files = Option(bd.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${bd.getPath}: ${files.length} files, want 1")
    }
    // end-to-end: the APPLIED buckets respect the next-fit overshoot bound
    // (<= target + the partition's largest file) and agree with the plan
    // on every shared column
    val applied = Compaction.compactionApply(spark, sf)
    val manifest = Tables.documents(spark, sf)
      .groupBy(col("source"), (col("doc_id") % 53).as("file_id"))
      .agg(sum(octet_length(col("text")).cast("long")).as("bytes"))
    val maxFile = manifest.groupBy("source").agg(max("bytes").as("max_file"))
    assert(applied.join(maxFile, "source")
      .filter(col("bucket_bytes") > lit(Compaction.target) + col("max_file"))
      .count() == 0L)
    val planSide = plan.map(r => (r.getAs[String]("source"), r.getAs[Long]("bucket")) ->
      (r.getAs[Long]("n_files"), r.getAs[Long]("bucket_bytes"),
        r.getAs[Long]("first_file"), r.getAs[Long]("last_file"))).toMap
    val appliedRows = applied.collect()
    assert(appliedRows.length == plan.length)
    appliedRows.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[Long]("bucket"))
      assert(planSide(k) == ((r.getAs[Long]("n_files"), r.getAs[Long]("bucket_bytes"),
        r.getAs[Long]("first_file"), r.getAs[Long]("last_file"))),
        s"bucket $k diverges from plan")
    }
  }
}
