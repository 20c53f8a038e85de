package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed fact-table layout: lineitem and orders written once as managed
  * tables bucketed (and sorted) on their orderkey, so every downstream
  * fact-fact join and orderkey-grain aggregation runs WITHOUT an exchange —
  * the shuffle is paid once at write time and amortized over every query.
  *
  * This is the 100 TB answer to the most expensive relational pattern in the
  * suite (lineitem ⋈ orders): at scale the two fact tables dominate shuffle
  * bytes, and co-bucketing them turns the sort-merge join's two exchanges +
  * two sorts into a straight merge of pre-sorted buckets. Bucket count is a
  * layout-time knob — production sizes it so each bucket file is
  * O(128-512 MB); 8 is right for the test SFs.
  *
  * Staging is idempotent per (warehouse, sf dir): repeated calls — every
  * bucketed query in a Verify/Bench run — hit the catalog, not the writer.
  */
object BucketedLayout {

  val numBuckets = 8

  private val staged = scala.collection.mutable.Set[String]()

  /** Catalog-safe table suffix for an sf dir ("/root/testdata/sf0.01" →
    * "sf0_01"). */
  private def suffix(d: String): String =
    d.replaceAll(".*/", "").replaceAll("[^a-zA-Z0-9]", "_")

  /** Stage lineitem + orders for `d` as bucketed tables (no-op if already
    * staged this session); returns the (lineitem, orders) table names. */
  def ensureStaged(s: SparkSession, d: String): (String, String) = synchronized {
    val (lt, ot) = (s"graft_lineitem_bkt_${suffix(d)}", s"graft_orders_bkt_${suffix(d)}")
    if (!staged.contains(lt)) {
      stage(s, Tables.lineitem(s, d), lt, "l_orderkey")
      stage(s, Tables.orders(s, d), ot, "o_orderkey")
      staged += lt
    }
    (lt, ot)
  }

  private def stage(s: SparkSession, df: DataFrame, table: String, key: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    // a crashed prior run can leave the managed location behind without
    // catalog metadata — clear it or saveAsTable refuses the name
    val loc = new java.io.File(
      s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") + s"/$table")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    Sinks.writeBucketed(df, table, key, numBuckets, sortCol = Some(key))
  }
}
