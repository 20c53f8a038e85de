package graft

import org.apache.spark.sql.functions._
import operators.Attribution

/** Markov removal-effect attribution invariants on sf0.001. */
class AttributionSpec extends SparkSpec {

  test("transition micro-probabilities conserve mass per (variant, from) up to floor loss") {
    val t = Attribution.transitionsForTest(spark, sf)
    val rows = t.groupBy("v", "from")
      .agg(sum("pm").as("mass"), count(lit(1)).as("deg"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mass, deg) = (r.getLong(2), r.getLong(3))
      assert(mass <= 1000000L, s"mass>1 for ${r.getString(0)}/${r.getString(1)}")
      assert(mass >= 1000000L - deg, s"floor loss exceeds outdegree: $mass/$deg")
    }
  }

  test("removal variants drop exactly the removed state's rows") {
    val t = Attribution.transitionsForTest(spark, sf)
    val bad = t.filter(col("v") =!= "none" &&
      (col("from") === col("v") || col("to") === col("v"))).count()
    assert(bad == 0L)
  }

  test("shapley: exact telescoping identity Σφ = 24·(v_full − v_empty)") {
    val out = Attribution.qAttributionShapley(spark, sf).collect()
    assert(out.length == 4)
    val sumPhi = out.map(_.getLong(1)).sum
    val (vFull, vEmpty) = (out.head.getLong(2), out.head.getLong(3))
    assert(sumPhi == 24L * (vFull - vEmpty))
    assert(out.forall(r => r.getLong(2) == vFull && r.getLong(3) == vEmpty))
  }

  test("position: credit conserves ~1e6 per converting touched journey (floor deficit < touches)") {
    import org.apache.spark.sql.functions._
    val out = Attribution.qAttributionPosition(spark, sf)
      .agg(sum("credit_micro"), sum("n_touches")).collect()(0)
    val (credit, nTouches) = (out.getLong(0), out.getLong(1))
    // recompute the number of converting journeys that have touches
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), graft.functions.TimeFunctions.nsToMs("ts").as("t"),
        col("event_id"), col("event_type"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("t", "event_id")
    val marked = ev
      .withColumn("is_p", (col("event_type") === "purchase").cast("long"))
      .withColumn("j", sum("is_p").over(w) - col("is_p"))
    val nj = marked.filter(col("is_p") === 0)
      .join(marked.filter(col("is_p") === 1).select("user_id", "j").distinct(),
        Seq("user_id", "j"), "left_semi")
      .select("user_id", "j").distinct().count()
    assert(credit <= 1000000L * nj)
    assert(credit > 1000000L * nj - nTouches) // floor loss < n−2 per journey
  }

  test("output: one row per touch channel, probabilities in [0, 1e6], effects in [-1000, 1000]") {
    val out = Attribution.qAttributionMarkov(spark, sf).collect()
    assert(out.length == 4) // click, error, signup, view
    out.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(1) <= 1000000L) // p_full
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000000L) // p_removed
      assert(math.abs(r.getLong(3)) <= 1000L)
    }
    // p_full identical across rows (it is the shared baseline)
    assert(out.map(_.getLong(1)).distinct.length == 1)
  }
}
