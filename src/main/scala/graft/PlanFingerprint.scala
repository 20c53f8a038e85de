package graft

import org.apache.spark.sql.DataFrame

/** Canonical physical-plan fingerprint, the noise-vs-regression
  * discriminator for the bench: a >2x timing swing with an UNCHANGED
  * fingerprint is machine noise (shared-box load), while a changed
  * fingerprint marks a genuine plan change that must be re-judged on its
  * merits. Bench emits one fingerprint per query into bench_full.json and
  * diffs them against the committed PLAN_FINGERPRINTS.json.
  *
  * Fingerprinted at a FIXED phase: `queryExecution.sparkPlan`, the physical
  * plan as planned, BEFORE AdaptiveSparkPlanExec starts mutating it. The
  * r9 bench fingerprinted `executedPlan`, whose toString changes as AQE
  * finalizes stages (isFinalPlan flips, coalesced-partition counts and
  * 1-3-digit runtime stats appear), so four fingerprints flapped between
  * two same-session no-code-change benches. sparkPlan is a pure function
  * of the analyzed plan + optimizer rules + session conf — exactly the
  * "did the PLAN change" question the gate asks — and a genuine plan
  * change (e.g. a join strategy flip from a broadcast-threshold edit)
  * shows up in sparkPlan before AQE ever runs.
  *
  * The hash covers operator structure only; every numeric literal is
  * normalized (expression ids, plan/stage ids, file paths with per-JVM
  * staging tokens, size literals like `24.5 KiB`, and ALL digit runs —
  * statistics and row counts legitimately change with SF and with
  * staged-relation reuse, and r9 proved that whitelisting which digits to
  * strip is a losing game).
  *
  * Each line is additionally reduced to its SORTED token multiset (tree
  * indentation kept, so operator order and depth still count). Measured
  * root cause of the residual r9 flap, reproduced without AQE:
  * RewriteDistinctAggregates assigns its `gid` groups in an order that
  * depends on transient expression ids, so two plannings of the same
  * multi-countDistinct query emit the same operators with the distinct
  * columns PERMUTED inside each Expand/HashAggregate line. A token
  * multiset is invariant under that permutation while a genuine change
  * (join strategy flip, new exchange, lost pushdown) still alters the
  * tokens or the line structure.
  */
object PlanFingerprint {

  def fingerprint(df: DataFrame): String = {
    val normalized = df.queryExecution.sparkPlan.toString
      // Metadata-field truncation guard: plan toString cuts
      // DataFilters/PushedFilters/Location at spark.sql.maxMetadataStringLength
      // chars and the cut position depends on expression-id WIDTH, so the
      // partial token bordering the "..." varied with how far the session's
      // id counter had advanced at capture time (26 same-plan fingerprint
      // shifts in the r16 slim-prestage run, every diffed plan structurally
      // identical). Bench raises the limit so truncation doesn't happen in
      // the gate context; stripping any token that still touches a "..."
      // additionally removes the partial-token artifact for callers on
      // default-conf sessions (the token COUNT before a live cut can still
      // shift there — the raised limit is the real fix).
      .replaceAll("\\S*\\.\\.\\.\\S*", "TRUNC")
      .replaceAll("#\\d+", "#x")
      .replaceAll("(file:)?/[^\\s,\\)\\]\"]+", "/path")
      .replaceAll("\\d+(\\.\\d+)?\\s*(B|KiB|MiB|GiB|TiB)\\b", "SZ")
      .replaceAll("\\d+", "N")
    val canonical = normalized.linesIterator.map { line =>
      val body = line.dropWhile(c => !c.isLetter)
      val indent = line.length - body.length
      indent.toString + "|" +
        body.split("[^A-Za-z_#]+").filter(_.nonEmpty).sorted.mkString(" ")
    }.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }
}
