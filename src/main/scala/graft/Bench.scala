package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark: one JSON line of per-query seconds at the SF dir given
  * by SPARK_GRAFT_SF_DIR. A warmup pass at sf0.001 runs first (untimed) so
  * the timed numbers measure steady-state execution, not JVM JIT and
  * first-use Spark initialization.
  *
  * Each query runs SPARK_GRAFT_BENCH_RUNS times (default 3) and reports the
  * MEDIAN; the per-query min..max spread is kept in the JSON under "spread".
  * The machine is shared and single runs swing 2-3x under load — a median of
  * three is what the regression gate needs to mean anything (BASELINE.md).
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.size / 2) // odd run counts: the true median; even: upper median
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // dev-iteration filter (comma-separated names); the driver never sets it
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val bench: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warmupDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmupDir).isDirectory) {
      bench.foreach { case (_, fn) =>
        try fn(spark, warmupDir).count() catch { case _: Throwable => () }
      }
      spark.catalog.clearCache() // don't let warmup caches pollute timings
    }
    // Run the whole suite nRuns times (round-robin over queries, not
    // back-to-back per query, so one load spike on the shared machine can't
    // hit all runs of the same query), then take per-query medians.
    val names = bench.keys.toSeq
    val runs: Seq[Map[String, Double]] = (1 to nRuns).map { _ =>
      bench.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        spark.catalog.clearCache() // per-query scratch caches must not skew later queries
        // a failed query reports -1, never a plausible-looking partial time
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    }
    // any failed run marks the query failed — a flaky failure must not hide
    // behind a median of the runs that happened to work
    val results: Seq[(String, Double, Double, Double)] = names.map { name =>
      val ts = runs.map(_(name))
      if (ts.exists(_ < 0)) (name, -1.0, -1.0, -1.0)
      else (name, median(ts), ts.min, ts.max)
    }
    val qs = results.map { case (k, m, _, _) => s"\"" + k + "\":" + m }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, _, lo, hi) => s"\"" + k + "\":[" + lo + "," + hi + "]" }
      .mkString("{", ",", "}")
    // failed queries report -1 per-query; keep them OUT of the total (a
    // failure must read as missing time + nonzero failure count, never as
    // a faster-looking round)
    val total = results.collect { case (_, m, _, _) if m >= 0 => m }.sum
    val failures = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"runs":$nRuns,"queries":$qs,"spread":$spread,"sf":"$sfDir"}""")
    spark.stop()
  }
}
