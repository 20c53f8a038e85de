package graft

import org.apache.spark.sql.functions._

/** Semantic teeth for BPE merge training: the planted corpora have
  * hand-computable merge tables, including the leftmost-greedy overlap case
  * naive pair-replacement gets wrong. */
class BpeTrainSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("textbook corpus: learns (u,g) then (u,n) with exact counts") {
    // the classic BPE walkthrough: hug×10 pug×5 pun×12 bun×4 hugs×5
    val text = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs"))
      .mkString(" ")
    val rows = operators.BpeTrain
      .bpeTrainOn(Seq((0L, text)).toDF("doc_id", "text"), 2)
      .collect()
    assert(rows.length == 2)
    val r1 = rows(0); val r2 = rows(1)
    // round 1: (u,g) appears 10+5+5 = 20 times — the unambiguous winner
    assert(r1.getAs[String]("sym_a") == "u" && r1.getAs[String]("sym_b") == "g")
    assert(r1.getAs[Long]("pair_count") == 20)
    // 113 initial symbols; each of the 20 disjoint merges removes one
    assert(r1.getAs[Long]("n_symbols_after") == 93)
    // round 2: (u,n) at 12+4 = 16 beats (h,ug) at 15
    assert(r2.getAs[String]("sym_a") == "u" && r2.getAs[String]("sym_b") == "n")
    assert(r2.getAs[Long]("pair_count") == 16)
    assert(r2.getAs[Long]("n_symbols_after") == 93 - 16)
  }

  test("overlapping runs: leftmost-greedy merges, not naive pair replacement") {
    val rows = operators.BpeTrain
      .bpeTrainOn(Seq((0L, "aaaa aaa")).toDF("doc_id", "text"), 2)
      .collect()
    val r1 = rows(0)
    // (a,a) occurs 3+2 = 5 times OVERLAPPING, but only 2+1 = 3 disjoint
    // merges apply: aaaa → [aa][aa], aaa → [aa][a]
    assert(r1.getAs[String]("sym_a") == "a" && r1.getAs[String]("sym_b") == "a")
    assert(r1.getAs[Long]("pair_count") == 5)
    assert(r1.getAs[Long]("n_symbols_after") == 4,
      "greedy merge must leave [aa,aa] and [aa,a] — 4 symbols")
    // round 2: (aa,aa) and (aa,a) both count 1 — lexicographic tie-break
    val r2 = rows(1)
    assert(r2.getAs[String]("sym_a") == "aa" && r2.getAs[String]("sym_b") == "a")
    assert(r2.getAs[Long]("pair_count") == 1)
  }

  test("driver corpus: monotone non-increasing counts, exact symbol accounting") {
    val rows = operators.BpeTrain.textBpeTrain(spark, sf).collect()
    assert(rows.length == 4)
    val counts = rows.sortBy(_.getAs[Long]("round")).map(_.getAs[Long]("pair_count"))
    // each round merges the CURRENT argmax, so counts can't increase
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"pair counts increased across rounds: ${counts.mkString(",")}")
    // symbol mass strictly decreases and never by more than the pair count
    val after = rows.sortBy(_.getAs[Long]("round")).map(_.getAs[Long]("n_symbols_after"))
    after.zip(after.tail).zip(counts.tail).foreach { case ((prev, next), cnt) =>
      assert(next < prev && prev - next <= cnt)
    }
  }
}
