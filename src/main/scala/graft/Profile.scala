package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Optimization-round measurement harness (guide §1): run named queries
  * under the EXACT Bench session shape (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus, same metadata-length knob) and report WHERE the time
  * goes — per-stage wall clock, executor time, shuffle read/write bytes and
  * rows — plus the formatted physical plan, optionally dumped to a file.
  *
  * Unlike Bench (which times the end-to-end median and must stay
  * methodology-stable), Profile is a dev lens: it warms each query once
  * (staging + JIT land outside the profiled run, like Bench's pre-stage)
  * and then profiles one timed execution with a stage-metrics listener.
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.Profile <sfDir> [--plans <dir>] q1 q2 ..."
  */
object Profile {
  private case class StageAgg(
      var name: String = "",
      var wallMs: Long = 0,
      var execRunMs: Long = 0,
      var shufReadB: Long = 0,
      var shufWriteB: Long = 0,
      var inputB: Long = 0,
      var tasks: Int = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rest = args.drop(1)
    val planDirIdx = rest.indexOf("--plans")
    val planDir: Option[String] =
      if (planDirIdx >= 0 && rest.length > planDirIdx + 1) Some(rest(planDirIdx + 1)) else None
    val names = rest.zipWithIndex
      .filterNot { case (_, i) =>
        planDirIdx >= 0 && (i == planDirIdx || i == planDirIdx + 1) }
      .map(_._1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxMetadataStringLength", "100000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)

    val stages = mutable.LinkedHashMap[Int, StageAgg]()
    var collecting = false
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = if (collecting) {
        val a = stages.getOrElseUpdate(t.stageId, StageAgg())
        val m = t.taskMetrics
        if (m != null) {
          a.execRunMs += m.executorRunTime
          a.shufReadB += m.shuffleReadMetrics.totalBytesRead
          a.shufWriteB += m.shuffleWriteMetrics.bytesWritten
          a.inputB += m.inputMetrics.bytesRead
          a.tasks += 1
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (collecting) {
        val si = sc.stageInfo
        val a = stages.getOrElseUpdate(si.stageId, StageAgg())
        a.name = si.name.takeWhile(_ != '\n')
        a.wallMs = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(0L)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm run: staging, JIT, page cache — mirrors Bench's pre-stage
      fn(spark, sfDir).count()
      spark.catalog.clearCache()
      stages.clear()
      collecting = true
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      collecting = false
      spark.catalog.clearCache()
      println(s"\n===== $name: ${f"$sec%.3f"} s, ${stages.size} stages =====")
      println(f"${"stage"}%-7s ${"wall_ms"}%8s ${"exec_ms"}%8s ${"tasks"}%6s ${"in_MB"}%8s ${"shR_MB"}%8s ${"shW_MB"}%8s  name")
      stages.toSeq.sortBy(-_._2.wallMs).take(30).foreach { case (id, a) =>
        println(f"$id%-7d ${a.wallMs}%8d ${a.execRunMs}%8d ${a.tasks}%6d ${a.inputB / 1e6}%8.1f ${a.shufReadB / 1e6}%8.1f ${a.shufWriteB / 1e6}%8.1f  ${a.name.take(60)}")
      }
      val totWall = stages.values.map(_.wallMs).sum
      println(f"stage wall sum: ${totWall / 1000.0}%.2f s (gaps vs ${sec}%.2f s = driver/planning time)")
      planDir.foreach { dir =>
        new java.io.File(dir).mkdirs()
        val w = new java.io.PrintWriter(s"$dir/$name.txt")
        try w.println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        finally w.close()
      }
    }
    spark.stop()
  }
}
