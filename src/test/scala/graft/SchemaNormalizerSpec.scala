package graft

import graft.sources.SchemaNormalizer
import org.apache.spark.sql.functions._

class SchemaNormalizerSpec extends SparkSpec {

  test("fuzzy column mapping resolves varied spreadsheet headers") {
    val m = SchemaNormalizer.findMapping(
      Seq("State", "Bill  Number", "TITLE", "Last Action Date", "Status", "Bill URL"))
    assert(m("state") == "State")
    assert(m("bill_number") == "Bill  Number")
    assert(m("title") == "TITLE")
    assert(m("last_action_date") == "Last Action Date")
    assert(m("status") == "Status")
    assert(m("url") == "Bill URL")
  }

  test("substring pass matches nonstandard names; missing canonicals go null") {
    val m = SchemaNormalizer.findMapping(Seq("bill_no", "the status field"))
    assert(m("bill_number") == "bill_no")
    assert(m("status") == "the status field")
    assert(!m.contains("title"))
  }

  test("unionConform merges heterogeneous sources into one canonical table") {
    val s = spark
    import s.implicits._
    val a = Seq(("CO", "HB1177", "Red flag law", "Enacted"))
      .toDF("State", "Bill Number", "Title", "Status")
    val b = Seq(("TX", "SB11", "2019-06-01"))
      .toDF("state", "billno", "last action")
    val merged = SchemaNormalizer.unionConform(Seq(a -> "manual", b -> "api"))
    assert(merged.columns.toSeq ==
      Seq("state", "bill_number", "title", "status", "last_action_date", "url",
        "collection_method"))
    val rows = merged.orderBy("state").collect()
    assert(rows.length == 2)
    val co = rows.head
    assert(co.getAs[String]("state") == "CO" && co.getAs[String]("bill_number") == "HB1177"
      && co.getAs[String]("collection_method") == "manual")
    val tx = rows(1)
    assert(tx.getAs[String]("bill_number") == "SB11")
    assert(tx.getAs[String]("title") == null)
    assert(tx.getAs[String]("last_action_date") == "2019-06-01")
  }

  test("readCsv conforms a real CSV file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv")
    val f = dir.resolve("bills.csv")
    java.nio.file.Files.writeString(f,
      "STATE,Bill No.,bill title,STATUS\nWA,HB 1234,Safe storage,Passed\n")
    val df = SchemaNormalizer.readCsv(spark, f.toString, "csv_import")
    val r = df.collect().head
    assert(r.getAs[String]("state") == "WA")
    assert(r.getAs[String]("bill_number") == "HB 1234")
    assert(r.getAs[String]("title") == "Safe storage")
    assert(r.getAs[String]("status") == "Passed")
  }
}
