package graft

import graft.sources.JsonlSource

class JsonlSpec extends SparkSpec {

  test("jsonl read infers schema and flattens one level like json_normalize") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_fixture")
    java.nio.file.Files.writeString(dir.resolve("recs.jsonl"),
      """{"id": 1, "user": {"name": "ann", "meta": {"x": 9}}, "score": 1.5}
        |{"id": 2, "user": {"name": "bo"}, "score": 2.5, "extra": "e"}
        |
        |{"id": 3, "score": 3.0}
        |""".stripMargin)
    val df = JsonlSource.read(spark, dir.toString)
    // top-level struct expanded; DEEPER nesting stays a struct (max_level=1)
    assert(df.columns.toSet == Set("extra", "id", "score", "user_meta", "user_name"))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3) // blank line skipped
    assert(rows(0).getAs[String]("user_name") == "ann")
    assert(rows(0).getAs[org.apache.spark.sql.Row]("user_meta").getAs[Long]("x") == 9L)
    assert(rows(1).getAs[String]("extra") == "e")
    assert(rows(2).getAs[String]("user_name") == null) // absent struct → nulls
  }

  test("normalizeToParquet round-trips the flattened table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_np")
    java.nio.file.Files.writeString(dir.resolve("recs.jsonl"),
      """{"id": 1, "user": {"name": "ann"}}
        |{"id": 2, "user": {"name": "bo"}}
        |""".stripMargin)
    val out = dir.toString + "/out_parquet"
    val back = JsonlSource.normalizeToParquet(spark, dir.toString + "/recs.jsonl", out)
    assert(back.columns.toSet == Set("id", "user_name"))
    assert(back.count() == 2)
  }
}
