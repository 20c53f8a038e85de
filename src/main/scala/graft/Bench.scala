package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark: one JSON line of per-query seconds at the SF dir given
  * by SPARK_GRAFT_SF_DIR. A warmup pass at sf0.001 runs first (untimed) so
  * the timed numbers measure steady-state execution, not JVM JIT and
  * first-use Spark initialization.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warmupDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmupDir).isDirectory) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmupDir).count() catch { case _: Throwable => () }
      }
      spark.catalog.clearCache() // don't let warmup caches pollute timings
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      spark.catalog.clearCache() // per-query scratch caches must not skew later queries
      // a failed query reports -1, never a plausible-looking partial time
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries report -1 per-query; keep them OUT of the total (a
    // failure must read as missing time + nonzero failure count, never as
    // a faster-looking round)
    val total = results.values.filter(_ >= 0).sum
    val failures = results.values.count(_ < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
