package graft

import org.apache.spark.sql.DataFrame

/** Canonical physical-plan fingerprint, the noise-vs-regression
  * discriminator for the bench: a >2x timing swing with an UNCHANGED
  * fingerprint is machine noise (shared-box load), while a changed
  * fingerprint marks a genuine plan change that must be re-judged on its
  * merits. Bench emits one fingerprint per query into bench_full.json and
  * diffs them against the committed PLAN_FINGERPRINTS.json.
  *
  * The hash covers the executed plan's OPERATOR STRUCTURE and strips
  * everything run-varying: expression ids (#123), plan/stage ids, file
  * paths (staging dirs carry per-JVM tokens), and long digit runs
  * (statistics, sizes, row counts — these legitimately change with SF).
  */
object PlanFingerprint {

  def fingerprint(df: DataFrame): String = {
    val canonical = df.queryExecution.executedPlan.toString
      .replaceAll("#\\d+", "#x")
      .replaceAll("plan_id=\\d+", "plan_id=x")
      .replaceAll("\\[id=#?\\d+\\]", "[id=x]")
      .replaceAll("(file:)?/[^\\s,\\)\\]\"]+", "/path")
      .replaceAll("\\d{4,}", "N")
    java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }
}
