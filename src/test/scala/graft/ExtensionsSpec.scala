package graft

class ExtensionsSpec extends SparkSpec {

  test("dot_product is SQL-callable after install and matches the Column API") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
    // over real data: SQL form == Column-API form
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_ext_test")
    val sqlNorms = spark.sql(
      """SELECT vec_id, sqrt(dot_product(cast(embedding AS array<double>),
        |                               cast(embedding AS array<double>))) AS nrm
        |FROM emb_ext_test ORDER BY vec_id LIMIT 20""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    import graft.functions.VectorFunctions._
    import org.apache.spark.sql.functions._
    val colNorms = Tables.embeddings(spark, sf)
      .select(col("vec_id"), vecNorm(asDouble(col("embedding"))).as("nrm"))
      .orderBy("vec_id").limit(20)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(sqlNorms.sameElements(colNorms))
  }

  test("approx-distinct rule rewrites count(DISTINCT) to KMV only when enabled") {
    import org.apache.spark.sql.functions._
    GraftExtensions.install(spark)
    def q() = Tables.lineitem(spark, sf)
      .groupBy(year(col("l_shipdate")).cast("long").as("y"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .orderBy("y")
    val exact = q().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set("spark.graft.approxDistinct", "true")
    try {
      val approx = q()
      assert(approx.queryExecution.optimizedPlan.toString.contains("kmv_distinct"),
        s"rule did not rewrite:\n${approx.queryExecution.optimizedPlan}")
      // the rewritten plan must agree with calling the sketch directly
      val direct = Tables.lineitem(spark, sf)
        .select(year(col("l_shipdate")).cast("long").as("y"),
          conv(substring(md5(col("l_orderkey").cast("string")), 1, 15), 16, 10)
            .cast("long").as("v"))
        .groupBy("y")
        .agg(graft.functions.KmvDistinct.kmvDistinct(col("v"), 256).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = approx.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == direct, s"rewrite disagrees with the direct sketch: $got vs $direct")
      // KMV with k=256 over small per-year cardinalities is exact here
      assert(got.keySet == exact.keySet)
    } finally spark.conf.set("spark.graft.approxDistinct", "false")
    // flag off again: back to the exact plan
    val off = q()
    assert(!off.queryExecution.optimizedPlan.toString.contains("kmv_distinct"))
    assert(off.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == exact)
  }

  test("kmv_distinct is SQL-callable after install and matches the Column API") {
    import org.apache.spark.sql.functions._
    GraftExtensions.install(spark)
    Tables.lineitem(spark, sf)
      .select(conv(substring(md5(col("l_orderkey").cast("string")), 1, 15),
        16, 10).cast("long").as("v"), col("l_orderkey"))
      .createOrReplaceTempView("kmv_probe")
    val viaSql = spark.sql(
      "SELECT kmv_distinct(v, 256) AS est FROM kmv_probe")
      .head.getAs[Long]("est")
    val viaApi = spark.table("kmv_probe")
      .agg(functions.KmvDistinct.kmvDistinct(col("v"), 256).as("est"))
      .head.getAs[Long]("est")
    assert(viaSql == viaApi, "SQL and Column API must agree exactly")
    // under k distinct hashes the sketch is exact
    val exact = spark.table("kmv_probe").select("l_orderkey").distinct().count()
    if (exact <= 256) assert(viaSql == exact)
    spark.catalog.dropTempView("kmv_probe")
  }
}
