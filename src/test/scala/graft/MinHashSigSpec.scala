package graft

import org.apache.spark.sql.functions._

/** Bit-exact parity of the native MinHashSig expression with the builtin
  * `array_min(transform(_, x => xxhash64(lit(i), x)))` form it replaces —
  * the staged corpus band index is built with the builtin, so any drift
  * would silently empty the streaming probe's candidate set. */
class MinHashSigSpec extends SparkSpec {

  private val K = 8

  test("parity with the builtin HOF form on real shingle arrays") {
    val toks = split(col("text"), "\\s+")
    val sh = Tables.documents(spark, sf)
      .filter(size(toks) >= 3)
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(0), size(toks) - lit(3)),
        i => concat_ws(" ",
          element_at(toks, i + lit(1)),
          element_at(toks, i + lit(2)),
          element_at(toks, i + lit(3))))).as("sh_arr"))
    val hof = (0 until K).map(i =>
      array_min(transform(col("sh_arr"), x => xxhash64(lit(i), x))).as(s"e$i"))
    val native = functions.MinHashSig.minhashSig(col("sh_arr"), K)
    val bad = sh.select(
        (col("doc_id") +: native.as("sig") +: hof): _*)
      .filter((0 until K).map(i =>
        element_at(col("sig"), i + 1) =!= col(s"e$i")).reduce(_ || _))
      .count()
    assert(bad == 0L)
  }

  test("null semantics mirror array_min(transform(...)): empty/null in, null out; null elements skipped") {
    import SparkSpec.spark.implicits._
    val df = Seq(
      (1L, Seq("a b c", "d e f")),
      (2L, Seq.empty[String]),
      (3L, null.asInstanceOf[Seq[String]])
    ).toDF("id", "arr")
    val out = df.select(col("id"),
        functions.MinHashSig.minhashSig(col("arr"), K).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!out(1L) && out(2L) && out(3L))
    // null element: contributes nothing, like the builtin pair
    val withNull = Seq(1L).toDF("id")
      .select(col("id"), array(lit("a b c"), lit(null)).as("arr"))
    val both = withNull.select(
      functions.MinHashSig.minhashSig(col("arr"), K).as("sig"),
      array_min(transform(col("arr"), x => xxhash64(lit(0), x))).as("e0"))
      .head()
    assert(both.getSeq[Long](0).head == both.getLong(1))
  }
}
