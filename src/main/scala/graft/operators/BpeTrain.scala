package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BPE TOKENIZER TRAINING as pure relational algebra (Sennrich et al. 2016):
  * learn the first R merge rules from the corpus itself — per round, count
  * adjacent symbol pairs over all word types (weighted by word frequency),
  * merge the most frequent pair everywhere with correct LEFTMOST-GREEDY
  * non-overlapping semantics, repeat. The output is the merge table
  * (round, pair, count-at-merge-time, corpus symbol count after) — i.e. the
  * actual artifact a tokenizer trainer produces.
  *
  * Every stage is data-parallel relational algebra partitioned by word
  * type: pair counting is a hash-aggregate, the winning pair is a 1-row
  * broadcast (never driver state), and the merge rewrite is two
  * self-equi-joins on (word, pos). Leftmost-greedy overlap resolution — the
  * part naive SQL gets wrong for runs like "aaaa" — groups consecutive
  * candidate positions by the pos − row_number() run trick and keeps the
  * odd-indexed candidate of each run. Word-type cardinality (not corpus
  * token count) bounds every relation, the same property that makes real
  * BPE trainers feasible; each round's sequence relation is cached so R
  * rounds cost R scans, not a 2^R plan.
  *
  * Fully oracled: integer counts end-to-end (no floats anywhere), ties on
  * the winning pair break (count desc, pair lexicographic) under binary
  * string order in both engines; the DuckDB oracle unrolls all R rounds as
  * generated CTEs.
  */
object BpeTrain {

  private val rounds = 4

  def textBpeTrain(s: SparkSession, d: String): DataFrame =
    bpeTrainOn(Tables.documents(s, d).select("doc_id", "text"), rounds)

  /** BPE core over any (doc_id, text) relation — spec-drivable. */
  private[graft] def bpeTrainOn(docs: DataFrame, r: Int): DataFrame = {
    val toks = docs
      .select(explode(split(regexp_replace(col("text"), "^\\s+|\\s+$", ""),
        "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    val wc = toks.groupBy("word").agg(count(lit(1)).as("freq"))
    // initial symbol sequence: one row per (word type, char position)
    var seq = wc
      .select(col("word"), col("freq"),
        posexplode(sequence(lit(1), length(col("word")))).as(Seq("ignored", "i")))
      .select(col("word"), col("freq"), (col("i") - 1).cast("long").as("pos"),
        expr("substring(word, i, 1)").as("sym"))
      .localCheckpoint()

    val wp = Window.partitionBy("word").orderBy("pos")
    var stats: DataFrame = null
    for (round <- 1 to r) {
      val withNext = seq.withColumn("nsym", lead("sym", 1).over(wp))
      val best = withNext.filter(col("nsym").isNotNull)
        .groupBy("sym", "nsym").agg(sum("freq").as("bcnt"))
        .orderBy(col("bcnt").desc, col("sym").asc, col("nsym").asc)
        .limit(1)
        .select(col("sym").as("ba"), col("nsym").as("bb"), col("bcnt"))
      val cand = withNext.crossJoin(broadcast(best))
        .withColumn("iscand",
          col("nsym").isNotNull && col("sym") === col("ba") && col("nsym") === col("bb"))
      // leftmost-greedy: consecutive candidate positions form runs (only
      // possible when ba = bb); keep the 1st, 3rd, … candidate of each run
      val real = cand.filter(col("iscand"))
        .withColumn("grp",
          col("pos") - row_number().over(Window.partitionBy("word").orderBy("pos")))
        .withColumn("k",
          row_number().over(Window.partitionBy("word", "grp").orderBy("pos")))
        .filter(col("k") % 2 === 1)
        .select(col("word").as("rw"), col("pos").as("rp"))
      val merged = cand.alias("c")
        .join(real.alias("ra"),
          col("c.word") === col("ra.rw") && col("c.pos") === col("ra.rp"), "left")
        .join(real.alias("rb"),
          col("c.word") === col("rb.rw") && col("c.pos") === col("rb.rp") + 1, "left")
        .filter(col("rb.rw").isNull) // drop the consumed right half
        .select(col("c.word").as("word"), col("c.freq").as("freq"),
          col("c.pos").as("oldpos"),
          when(col("ra.rw").isNotNull, concat(col("c.ba"), col("c.bb")))
            .otherwise(col("c.sym")).as("sym"))
        .withColumn("pos",
          (row_number().over(Window.partitionBy("word").orderBy("oldpos")) - 1)
            .cast("long"))
        .select("word", "freq", "pos", "sym")
        // localCheckpoint, not cache: each round references the previous
        // round's relation ~5 times (pair count, candidates, two merge
        // joins, symbol accounting), so the LOGICAL plan grows ~5^R without
        // lineage truncation — Catalyst optimization time explodes
        // exponentially even though the data is tiny (measured 61 s at
        // R=4 with cache, ~6 s with checkpoint). Same pattern as
        // Dedup.dedupClusters' pointer-jumping rounds.
        .localCheckpoint()
      val nAfter = merged.agg(sum("freq").as("n_symbols_after"))
      val stat = best.crossJoin(nAfter)
        .select(lit(round.toLong).as("round"), col("ba").as("sym_a"),
          col("bb").as("sym_b"), col("bcnt").as("pair_count"),
          col("n_symbols_after"))
      stats = if (stats == null) stat else stats.unionByName(stat)
      seq = merged
    }
    stats.orderBy("round")
  }

  private val textBpeTrainSql: String = {
    def round(r: Int): String = {
      val prev = s"s$r"
      s"""p$r AS (
         |  SELECT word, freq, pos, sym,
         |    lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nsym
         |  FROM $prev
         |), best$r AS (
         |  SELECT sym AS ba, nsym AS bb, CAST(cnt AS BIGINT) AS bcnt FROM (
         |    SELECT sym, nsym, sum(freq) AS cnt FROM p$r WHERE nsym IS NOT NULL
         |    GROUP BY sym, nsym
         |  ) ORDER BY cnt DESC, sym, nsym LIMIT 1
         |), cand$r AS (
         |  SELECT p.word, p.freq, p.pos, p.sym, b.ba, b.bb,
         |    (p.nsym IS NOT NULL AND p.sym = b.ba AND p.nsym = b.bb) AS iscand
         |  FROM p$r p CROSS JOIN best$r b
         |), real$r AS (
         |  SELECT word, pos FROM (
         |    SELECT word, pos,
         |      row_number() OVER (PARTITION BY word, grp ORDER BY pos) AS k
         |    FROM (
         |      SELECT word, pos,
         |        pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
         |      FROM cand$r WHERE iscand
         |    )
         |  ) WHERE k % 2 = 1
         |), m$r AS (
         |  SELECT c.word, c.freq, c.pos AS oldpos,
         |    CASE WHEN ra.pos IS NOT NULL THEN c.ba || c.bb ELSE c.sym END AS sym
         |  FROM cand$r c
         |  LEFT JOIN real$r ra ON ra.word = c.word AND ra.pos = c.pos
         |  LEFT JOIN real$r rb ON rb.word = c.word AND rb.pos = c.pos - 1
         |  WHERE rb.pos IS NULL
         |), s${r + 1} AS (
         |  SELECT word, freq,
         |    CAST(row_number() OVER (PARTITION BY word ORDER BY oldpos) - 1
         |      AS BIGINT) AS pos,
         |    sym
         |  FROM m$r
         |), stat$r AS (
         |  SELECT CAST($r AS BIGINT) AS round, b.ba AS sym_a, b.bb AS sym_b,
         |    b.bcnt AS pair_count,
         |    (SELECT CAST(sum(freq) AS BIGINT) FROM s${r + 1}) AS n_symbols_after
         |  FROM best$r b
         |)""".stripMargin
    }
    val roundCtes = (1 to rounds).map(round).mkString(",\n")
    val unions = (1 to rounds).map(r => s"SELECT * FROM stat$r").mkString("\nUNION ALL ")
    s"""WITH toks AS (
       |  SELECT unnest(regexp_split_to_array(
       |    regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+')) AS word
       |  FROM documents
       |), wc AS (
       |  SELECT word, count(*) AS freq FROM toks WHERE length(word) > 0
       |  GROUP BY word
       |), s1 AS (
       |  SELECT word, freq, CAST(i - 1 AS BIGINT) AS pos, substr(word, i, 1) AS sym
       |  FROM (SELECT word, freq, unnest(generate_series(1, length(word))) AS i
       |        FROM wc)
       |),
       |$roundCtes
       |$unions
       |ORDER BY round""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("text_bpe_train", textBpeTrain, Some(textBpeTrainSql))
  )
}
