package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import sources.ZOrderLayout

class ZOrderSpec extends SparkSpec {

  test("zvalue interleaves bits (hand-checked Morton codes)") {
    import SparkSpec.spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 1L), (65535L, 0L))
      .toDF("a", "b")
      .select(ZOrderLayout.zvalue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // z(a,b): a bits at even positions, b bits at odd.
    // z(5,1): a=101 -> bits 0,4; b=001 -> bit 1 => 1+2+16 = 19
    // z(65535,0): 16 one-bits spread to even positions 0..30 = 0x55555555
    assert(rows == Seq(0L, 1L, 2L, 15L, 19L, 0x55555555L))
  }

  /** Rows the parquet reader actually produced for the given box filter —
    * row groups skipped by min/max stats never reach the scan's output.
    * Metrics must be read from the EXECUTED query's plan (a fresh count()
    * would build a new, never-run QueryExecution); AQE hides scans behind
    * query-stage leaf nodes, so descend through them. */
  private def findScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(findScans)
    }

  private def scannedRows(df: DataFrame): Long = {
    df.collect() // execute THIS plan so its scan metrics populate
    val scans = findScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected a parquet scan leaf")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-order layout skips row groups in BOTH box dimensions; shuffled layout skips none") {
    val s = spark
    val total = Tables.lineitem(s, sf).count()
    // comparison baseline: identical file count, curve-free random layout
    val shuffledPath = s.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:") + "/graft_lineitem_shuffled_spec"
    Tables.lineitem(s, sf)
      .repartition(ZOrderLayout.numFiles) // round-robin: every file spans the whole keyspace
      .write.mode("overwrite").parquet(shuffledPath)
    val z = ZOrderLayout.lineitemZ(s, sf)
    val r = s.read.parquet(shuffledPath)
    // box selective in both dims, and single-dimension slices
    val boxes: Seq[DataFrame => DataFrame] = Seq(
      _.filter(col("l_partkey") <= 20 && col("l_suppkey") <= 2),
      _.filter(col("l_partkey") <= 20),
      _.filter(col("l_suppkey") <= 2))
    boxes.zip(Seq("box", "partkey-slice", "suppkey-slice")).foreach { case (f, name) =>
      val zRows = scannedRows(f(z))
      val rRows = scannedRows(f(r))
      assert(rRows == total,
        s"$name: the shuffled layout must read everything (got $rRows of $total)")
      assert(zRows <= total / 2,
        s"$name: z-order must skip at least half the rows (read $zRows of $total)")
      // same filtered results from both layouts (the layout is invisible)
      assert(f(z).count() == f(r).count())
    }
  }
}
