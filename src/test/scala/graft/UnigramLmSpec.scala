package graft

import org.apache.spark.sql.functions._
import operators.UnigramLm

class UnigramLmSpec extends SparkSpec {

  test("char conservation: every corpus character is covered by exactly one Viterbi piece, both rounds") {
    val pieces = UnigramLm.textUnigramTrain(spark, sf).collect()
    val totalChars = Tables.documents(spark, sf)
      .select(explode(split(regexp_replace(col("text"), "^\\s+|\\s+$", ""),
        "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .agg(sum(length(col("word")).cast("long"))).head.getLong(0)
    def covered(cntCol: String) = pieces.map(r =>
      r.getAs[Long](cntCol) * r.getAs[Long]("piece_len")).sum
    assert(covered("cnt_r1") == totalChars,
      s"round-1 coverage ${covered("cnt_r1")} != $totalChars")
    assert(covered("cnt_r2") == totalChars,
      s"round-2 coverage ${covered("cnt_r2")} != $totalChars")
  }

  test("planted structure: a repeated 4-gram word trains to a single whole-word piece") {
    import SparkSpec.spark.implicits._
    val docs = (1L to 30L).map(i => (i, "zzzz")).toDF("doc_id", "text")
    val res = UnigramLm.unigramRun(docs)
    val rows = res.pieces.collect().map(r => r.getAs[String]("piece") ->
      (r.getAs[Long]("cnt_r2"), Option(r.get(r.fieldIndex("score_milli")))))
      .toMap
    // Viterbi math under seed scores: one 'zzzz' piece (-q(10)) beats
    // 'zz zz' (-2q(10/3)) and char splits, so the whole word wins round 1,
    // every other multi-char piece prunes, and 'z' survives only as the
    // coverage floor
    assert(rows.keySet == Set("z", "zzzz"),
      s"expected only the whole word + the char floor, got ${rows.keySet}")
    assert(rows("zzzz")._1 == 30L)
    assert(rows("z")._1 == 0L)
    // final scores: T2 = 30 (zzzz) + 1 (floored char)
    def q(x: Double) = math.round(1000.0 * math.log(x))
    assert(rows("zzzz")._2.contains(q(30) - q(31)))
    assert(rows("z")._2.contains(q(1) - q(31)))
    // the round-2 segmentation is one piece per word type
    val seg = res.seg2.collect()
    assert(seg.length == 1 &&
      seg.head.getSeq[String](seg.head.fieldIndex("pieces")).toList == List("zzzz"))
  }

  test("encode consistency: corpus token mass equals the trained round-2 counts") {
    val enc = UnigramLm.textUnigramEncode(spark, sf).collect()
    val pieces = UnigramLm.textUnigramTrain(spark, sf).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val (w, c, t) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_unigram_tokens"))
      assert(t >= w && t <= c, s"doc ${r.getAs[Long]("doc_id")}: tokens $t outside [words $w, chars $c]")
    }
    assert(enc.map(_.getAs[Long]("n_unigram_tokens")).sum ==
      pieces.map(_.getAs[Long]("cnt_r2")).sum,
      "per-doc token mass must equal the trainer's round-2 piece counts")
  }
}
