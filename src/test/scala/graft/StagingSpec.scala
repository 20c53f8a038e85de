package graft

import graft.sources.Staging

/** Managed-table staging identity + memoization: the r8 advisor finding
  * was a staging cache keyed by dataset BASENAME only (two dataset paths
  * sharing a leaf collided onto one table; regenerated data kept serving
  * the stale layout). These cases pin the fixed contract. */
class StagingSpec extends SparkSpec {

  private def mkDataset(parent: java.io.File, leaf: String): java.io.File = {
    val d = new java.io.File(parent, leaf)
    d.mkdirs()
    val w = new java.io.File(d, "documents.parquet")
    w.mkdirs() // witness: a parquet "file" is a directory in practice
    d
  }

  test("same-basename datasets under different parents get distinct stamps") {
    val t1 = java.nio.file.Files.createTempDirectory("graft_stage_a").toFile
    val t2 = java.nio.file.Files.createTempDirectory("graft_stage_b").toFile
    try {
      val d1 = mkDataset(t1, "sf0.5")
      val d2 = mkDataset(t2, "sf0.5")
      val s1 = Staging.contentStamp(d1.getPath, "documents.parquet")
      val s2 = Staging.contentStamp(d2.getPath, "documents.parquet")
      assert(s1 != s2, s"basename collision: $s1")
      // both stamps keep the human-readable leaf prefix
      assert(s1.startsWith("sf0_5_") && s2.startsWith("sf0_5_"))
    } finally {
      Staging.deleteRecursively(t1); Staging.deleteRecursively(t2)
    }
  }

  test("regenerating the witness changes the stamp (stale layouts impossible)") {
    val t = java.nio.file.Files.createTempDirectory("graft_stage_c").toFile
    try {
      val d = mkDataset(t, "sfX")
      val w = new java.io.File(d, "documents.parquet")
      val before = Staging.contentStamp(d.getPath, "documents.parquet")
      assert(w.setLastModified(w.lastModified() + 60000))
      val after = Staging.contentStamp(d.getPath, "documents.parquet")
      assert(before != after, "mtime change did not invalidate the stamp")
    } finally Staging.deleteRecursively(t)
  }

  test("ensureTable memoizes per JVM: derive runs once, count is recorded") {
    val t = java.nio.file.Files.createTempDirectory("graft_stage_d").toFile
    try {
      val d = mkDataset(t, "sfY")
      var derivations = 0
      def derive = {
        derivations += 1
        spark.range(5).toDF("k")
      }
      val (tbl1, n1) = Staging.ensureTable(spark, "spec_memo", d.getPath,
        "documents.parquet", "k", 2, Some("k"))(derive)
      val (tbl2, n2) = Staging.ensureTable(spark, "spec_memo", d.getPath,
        "documents.parquet", "k", 2, Some("k"))(derive)
      assert(tbl1 == tbl2 && n1 == 5L && n2 == 5L)
      assert(derivations == 1, s"derive ran $derivations times")
      assert(spark.table(tbl1).count() == 5L)
      spark.sql(s"DROP TABLE IF EXISTS $tbl1")
    } finally Staging.deleteRecursively(t)
  }
}
