package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvDistinct.kmvDistinct

class KmvDistinctSpec extends SparkSpec {

  private def hashed(n: Int) = {
    import SparkSpec.spark.implicits._
    (1 to n).map(_.toLong).toDF("id")
      .select(conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
        .cast("long").as("v"))
  }

  test("below capacity the sketch is exact") {
    val est = hashed(200).agg(kmvDistinct(col("v"), 256).as("e"))
      .collect().head.getLong(0)
    assert(est == 200L)
  }

  test("above capacity the estimate lands within 4 sigma (k=256 => ~25%)") {
    val n = 20000
    val est = hashed(n).agg(kmvDistinct(col("v"), 256).as("e"))
      .collect().head.getLong(0)
    assert(math.abs(est - n).toDouble / n <= 0.25, s"estimate $est for n=$n")
  }

  test("estimate is invariant to partitioning (merge is order-independent)") {
    val df = hashed(5000)
    val a = df.repartition(1).agg(kmvDistinct(col("v"), 256)).collect().head.getLong(0)
    val b = df.repartition(32).agg(kmvDistinct(col("v"), 256)).collect().head.getLong(0)
    assert(a == b, s"partitioning changed the estimate: $a vs $b")
  }

  test("duplicates do not move the estimate (distinctness is inherent)") {
    val df = hashed(3000)
    val dup = df.union(df).union(df)
    val a = df.agg(kmvDistinct(col("v"), 256)).collect().head.getLong(0)
    val b = dup.agg(kmvDistinct(col("v"), 256)).collect().head.getLong(0)
    assert(a == b, s"duplicates changed the estimate: $a vs $b")
  }

  test("kmv union: merged sketch estimate equals sketching the union directly") {
    val rows = operators.Relational.qKmvUnion(spark, sf).collect()
    val all = rows.filter(_.getAs[String]("scope") == "all")
    assert(all.length == 1)
    val years = rows.filter(_.getAs[String]("scope") == "year")
    assert(years.nonEmpty)
    // recompute the DIRECT sketch of the full data and the MERGED one
    val hv = Tables.lineitem(spark, sf)
      .select(year(col("l_shipdate")).cast("long").as("y"),
        conv(substring(md5(col("l_orderkey").cast("string")), 1, 15), 16, 10)
          .cast("long").as("v"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("y"), r.getAs[Long]("v")))
    def est(hashes: Seq[Long]): Long = {
      val k = 256
      val mins = hashes.distinct.sorted.take(k)
      if (mins.size < k) mins.size.toLong
      else math.round(255.0 * 1152921504606846976.0 / mins.last.toDouble)
    }
    val direct = est(hv.map(_._2).toSeq)
    val merged = est(hv.groupBy(_._1).values
      .flatMap(_.map(_._2).distinct.sorted.take(256)).toSeq)
    assert(direct == merged, "KMV merge property must be exact")
    assert(all.head.getAs[Long]("kmv_n") == direct)
    // per-year estimates stay inside a loose k=256 error envelope
    years.foreach(r => assert(r.getAs[Long]("err_bp") < 2500,
      s"${r.getAs[String]("key")} err too large"))
  }
}
