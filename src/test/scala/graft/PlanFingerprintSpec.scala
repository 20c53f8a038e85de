package graft

/** The two properties the bench's noise-vs-regression gate needs from
  * PlanFingerprint (r9 verdict item 2): a no-op re-planning — including
  * re-fingerprinting AFTER execution, when AQE has mutated executedPlan —
  * must hash identically, and a genuine plan change (join strategy flip
  * via the broadcast threshold) must still trip it.
  */
class PlanFingerprintSpec extends SparkSpec {

  private def q() = operators.Relational.qOrdersEnriched(spark, sf)

  test("fingerprint is invariant across planning, execution, and a fresh re-plan") {
    val df = q()
    val before = PlanFingerprint.fingerprint(df)
    df.collect() // drive AQE to its final plan — the r9 flap scenario
    val afterExec = PlanFingerprint.fingerprint(df)
    val fresh = PlanFingerprint.fingerprint(q())
    assert(before == afterExec, "execution phase leaked into the fingerprint")
    assert(before == fresh, "re-planning the same query changed the fingerprint")
  }

  test("fingerprint is invariant for one of the r9 flapped queries (q_multi_distinct)") {
    def f() = operators.Relational.qMultiDistinct(spark, sf)
    val df = f()
    val before = PlanFingerprint.fingerprint(df)
    df.collect()
    assert(PlanFingerprint.fingerprint(df) == before)
    assert(PlanFingerprint.fingerprint(f()) == before)
  }

  test("a deliberate broadcast-threshold flip still trips the fingerprint") {
    // hint-free join: the strategy choice is the threshold's alone
    def join() = {
      val o = spark.read.parquet(s"$sf/orders.parquet")
      val c = spark.read.parquet(s"$sf/customer.parquet")
      o.join(c, o("o_custkey") === c("c_custkey")).groupBy("c_mktsegment").count()
    }
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    val base = PlanFingerprint.fingerprint(join())
    try {
      spark.conf.set(key, "-1") // force sort-merge where broadcast was planned
      assert(PlanFingerprint.fingerprint(join()) != base,
        "join-strategy change must produce a different fingerprint")
    } finally spark.conf.set(key, saved)
  }
}
