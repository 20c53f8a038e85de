package graft.sources

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) data layout: lineitem rewritten once, range-
  * partitioned and sorted by the bit-interleaved (l_partkey, l_suppkey)
  * Z-value, so parquet min/max row-group statistics become selective in
  * BOTH dimensions at once — the multi-dimensional data-skipping layout
  * behind Delta/Iceberg OPTIMIZE ZORDER, built from Spark primitives.
  *
  * Why it matters at 100 TB: a single-column sort gives perfect skipping on
  * that column and none on any other; the Z-curve maps a 2-D box predicate
  * to a small set of curve ranges, so a scan with pushed-down filters on
  * EITHER (or both) keys skips most row groups. The shuffle+sort is paid
  * once at layout time and amortized over every box query after — the same
  * economics as BucketedLayout, aimed at scans instead of joins.
  *
  * The interleave is a pure expression tree (shifts/ands/ors — codegen'd,
  * no UDF), and the Z column is dropped after the sort: the skipping power
  * lives entirely in the per-file min/max stats of the ORIGINAL columns, so
  * readers need no knowledge of the curve.
  */
object ZOrderLayout {

  /** One file per range partition; production sizes this so each file is
    * O(128-512 MB) — 32 is right for the test SFs. */
  val numFiles = 32

  /** Morton Z-value: interleave the low `bits` bits of `a` (even positions)
    * and `b` (odd positions). 16+16 bits covers keys < 65536 at every test
    * SF; widen per-dimension bits for larger keyspaces. */
  def zvalue(a: Column, b: Column, bits: Int = 16): Column = {
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  private def suffix(d: String): String =
    d.replaceAll(".*/", "").replaceAll("[^a-zA-Z0-9]", "_")

  /** Stage the Z-ordered lineitem copy for `d` (no-op if already staged this
    * session); returns the parquet path. Staged through Staging.ensureDir
    * so the dir is latched against the orphan sweep and the memo self-heals
    * if the dir vanishes (a private memo here was the r11 q_incr_agg bug
    * class: a forced sweep deleted the dir, the memo kept the path). */
  def ensureStaged(s: SparkSession, d: String): String =
    Staging.ensureDir(s, s"graft_lineitem_z_${suffix(d)}")(path =>
      writeZOrdered(Tables.lineitem(s, d), path, "l_partkey", "l_suppkey"))

  /** Rewrite `df` Z-ordered by (ka, kb): range-partition on the Z-value so
    * each output file owns a contiguous curve range, sort within partitions
    * so row groups inside a file are tight too, then drop the helper.
    *
    * Both dimensions are first NORMALIZED to a common 8-bit range (value's
    * position within its min..max span). Without this, the wider keyspace's
    * high bits dominate the curve and the narrow dimension gets no
    * clustering at all — the same reason Delta's OPTIMIZE ZORDER interleaves
    * per-column range-partition ranks, not raw values. The min/max pass is
    * a one-row aggregate at one-time layout cost. */
  def writeZOrdered(df: DataFrame, path: String, ka: String, kb: String): Unit = {
    val b = df.agg(
      min(col(ka)).cast("long"), max(col(ka)).cast("long"),
      min(col(kb)).cast("long"), max(col(kb)).cast("long")).head()
    def norm(c: String, lo: Long, hi: Long): Column = {
      val span = math.max(hi - lo, 1L)
      (col(c).cast("long") - lit(lo)) * lit(255L) / lit(span)
    }
    df.withColumn("__z",
        zvalue(norm(ka, b.getLong(0), b.getLong(1)),
          norm(kb, b.getLong(2), b.getLong(3)), bits = 8))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def lineitemZ(s: SparkSession, d: String): DataFrame =
    s.read.parquet(ensureStaged(s, d))
}
