package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination audit — the decontamination step every
  * training-data pipeline runs before reporting eval numbers: how
  * much of each EVAL document's n-gram mass already appears in the
  * TRAIN split? (The GPT-3 appendix-C / FineWeb convention: a doc is
  * contaminated when a large share of its shingles collide with the
  * eval set — here measured symmetrically, per eval doc against the
  * train shingle universe.)
  *
  * Scale shape: one explode to DISTINCT (doc, shingle) per side; the
  * train side collapses to its distinct-shingle universe (the shuffle
  * unit, vocabulary-sized); the hit test is a LEFT SEMI-shaped join
  * (left join + flag) on the shingle key; per-doc shares are one
  * groupBy. Identical plan family to q129 novelty — no all-pairs
  * anything at any corpus size.
  */
object Contamination {

  /** Top-k most contaminated eval docs: (doc_id, n_shingles, n_hit,
    * overlap 4dp), overlap = hit share of the doc's distinct
    * word n-grams, ordered (overlap desc, doc_id). `isEval` splits
    * the corpus; train = everything else. */
  def evalOverlap(docs: DataFrame, idCol: String, textCol: String,
                  isEval: Column, n: Int = 8,
                  topK: Int = 20): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"), isEval.as("__e"),
        explode(graft.functions.Signatures.wordShingles(col(textCol), n))
          .as("__sh"))
      .distinct()
    val trainSh = sh.filter(!col("__e")).select(col("__sh")).distinct()
      .withColumn("__hit", lit(1L))
    sh.filter(col("__e"))
      .join(trainSh, Seq("__sh"), "left")
      .groupBy(col("__id").as("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .withColumn("overlap",
        round(col("n_hit").cast("double") / col("n_shingles"), 4))
      .orderBy(col("overlap").desc, col("doc_id")).limit(topK)
  }

  /** DuckDB twin of [[evalOverlap]]; mirrors
    * [[graft.functions.Signatures.wordShingles]] tokenization
    * (lowercase, split on whitespace runs, n-word joins). `evalPred`
    * is a SQL boolean over the documents table. */
  def evalOverlapOracleSql(evalPred: String, n: Int = 8,
                           topK: Int = 20): String =
    s"""WITH toks AS (SELECT doc_id, $evalPred AS e,
            list_filter(string_split_regex(lower(trim(text)), '\\s+'),
              x -> length(x) > 0) AS ws
          FROM documents),
        sh0 AS (SELECT doc_id, e,
            UNNEST(CASE WHEN len(ws) < $n THEN
              [array_to_string(ws, ' ')]
              ELSE [array_to_string(ws[i:i+$n-1], ' ')
                FOR i IN range(1, len(ws) - $n + 2)] END) AS sh
          FROM toks),
        sh AS (SELECT DISTINCT doc_id, e, sh FROM sh0),
        train AS (SELECT DISTINCT sh FROM sh WHERE NOT e),
        ev AS (SELECT s.doc_id, s.sh,
            CASE WHEN t.sh IS NOT NULL THEN 1 ELSE 0 END AS hit
          FROM sh s LEFT JOIN train t USING (sh) WHERE s.e)
        SELECT doc_id, COUNT(*) AS n_shingles,
          CAST(SUM(hit) AS BIGINT) AS n_hit,
          ROUND(SUM(hit) / CAST(COUNT(*) AS DOUBLE), 4) AS overlap
        FROM ev GROUP BY doc_id
        ORDER BY overlap DESC, doc_id LIMIT $topK"""
}
