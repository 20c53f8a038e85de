package graft.sources

/** Staging directories for source-fixture round trips (CSV/JSONL written
  * from a parquet table, then read back through the source under test).
  *
  * Keyed by a hash of the FULL dataset path — not the leaf name, so two
  * datasets sharing a leaf (`a/sf0.01` vs `b/sf0.01`) can never collide —
  * plus a per-JVM token so concurrent runs against the same dataset stage
  * disjoint trees and never interleave writes or cleanup. Within one JVM
  * the path is deterministic: re-staging is an idempotent overwrite of the
  * same derived content. */
object Staging {

  /** pid@host: unique per JVM, stable within it. */
  private val jvmToken = java.lang.management.ManagementFactory
    .getRuntimeMXBean.getName.replaceAll("[^a-zA-Z0-9]", "_")

  def dir(tag: String, datasetDir: String): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(datasetDir.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    System.getProperty("java.io.tmpdir") + s"/graft_${tag}_${key}_$jvmToken"
  }

  /** Recursive delete — staging trees nest (`_temporary/<query>/...`), a
    * one-level sweep leaves deep litter behind. */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete()
  }
}
