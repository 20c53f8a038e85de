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
}
