package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RAKE — Rapid Automatic Keyword Extraction (Rose, Engel, Cramer &
  * Cowley 2010) — per source. Candidate phrases are maximal runs of
  * non-stopword tokens (the text split at stopword positions); each
  * word scores deg(w)/freq(w) where freq counts the word's occurrences
  * across phrase instances and deg additionally credits the length of
  * every phrase it appears in (words that live in long multi-word
  * phrases out-score words that appear alone); a phrase scores the sum
  * of its word scores. The classic lightweight alternative to
  * [[TfIdf]]/[[Distinctive]] term scoring: it surfaces multi-word
  * domain phrases ("hash join order") instead of single tokens.
  *
  * Determinism discipline: word scores live on the MILLIONTHS integer
  * lattice — score₆(w) = (10⁶ · deg) div freq, phrase score the exact
  * integer sum of its word scores — so cross-engine ranking never
  * depends on float summation order (deg, freq > 0, so div == floor
  * division on both engines). The reported score is score₆ / 10⁶.
  *
  * Scale shape at 100 TB: phrase extraction is per-row array work (no
  * shuffle); instances aggregate to (source, phrase) cells in the one
  * corpus-scale shuffle; word stats and the score join are cell-sized
  * (bounded by |vocab| and |distinct phrases|); top-k is a per-source
  * window over cells.
  */
object Rake {

  /** Candidate phrase array for one text column: stopwords become '|'
    * markers, the token stream re-joins and splits at the markers, and
    * runs of 1..maxLen non-stop words survive. */
  def phraseArray(t: Column, lang: String = "en",
                  maxLen: Int = 4): Column = {
    val sw = array(Text.stopwords(lang).map(lit): _*)
    val marked = transform(Text.tokens(t), w =>
      when(array_contains(sw, w), lit("|")).otherwise(w))
    filter(
      transform(split(concat_ws(" ", marked), "\\|"), p => trim(p)),
      p => length(p) > 0 &&
        size(split(p, " ")) <= maxLen)
  }

  /** Top-`topK` RAKE phrases per source. Returns
    * (source, phrase, n_words, n_occurrences, score 6dp, rank). */
  def keywordsBySource(docs: DataFrame, srcCol: String, textCol: String,
                       lang: String = "en", maxLen: Int = 4,
                       topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val inst = docs.filter(col(textCol).isNotNull)
      .select(col(srcCol).as("source"),
        explode(phraseArray(col(textCol), lang, maxLen)).as("phrase"))
    val cells = inst.groupBy("source", "phrase")
      .agg(count(lit(1)).as("n_occurrences"))
      .withColumn("__words", split(col("phrase"), " "))
      .withColumn("__plen", size(col("__words")).cast("long"))
    val pw = cells.select(col("source"), col("phrase"),
      col("n_occurrences"), col("__plen"),
      explode(col("__words")).as("__w"))
    val wstats = pw.groupBy("source", "__w")
      .agg(sum(col("n_occurrences")).as("__freq"),
        sum(col("n_occurrences") * col("__plen")).as("__deg"))
      // millionths lattice: integer floor-div (deg, freq > 0)
      .withColumn("__ws", expr("(1000000 * __deg) div __freq"))
    val scored = pw.join(wstats, Seq("source", "__w"))
      .groupBy("source", "phrase")
      .agg(min("__plen").as("n_words"),
        min("n_occurrences").as("n_occurrences"),
        sum("__ws").as("__s6"))
    val w = Window.partitionBy("source")
      .orderBy(col("__s6").desc, col("phrase"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("source"), col("phrase"), col("n_words"),
        col("n_occurrences"),
        round(col("__s6").cast("double") / 1e6, 6).as("score"),
        col("rank"))
      .orderBy("source", "rank")
  }

  /** DuckDB twin of [[keywordsBySource]] over the documents table. */
  def keywordsOracleSql(stopwordsSql: String, maxLen: Int = 4,
                        topK: Int = 10): String =
    s"""WITH toks AS (SELECT source,
            list_filter(string_split_regex(lower(trim(text)), '\\s+'),
              x -> length(x) > 0) AS ws
          FROM documents WHERE text IS NOT NULL),
        inst AS (SELECT source, p AS phrase FROM (
            SELECT source, trim(unnest(string_split(
                array_to_string(list_transform(ws, w ->
                  CASE WHEN list_contains($stopwordsSql, w)
                       THEN '|' ELSE w END), ' '), '|'))) AS p
            FROM toks)
          WHERE length(p) > 0
            AND len(string_split(p, ' ')) <= $maxLen),
        cells AS (SELECT source, phrase, COUNT(*) AS n_occurrences,
            CAST(len(string_split(phrase, ' ')) AS BIGINT) AS plen
          FROM inst GROUP BY source, phrase),
        pw AS (SELECT source, phrase, n_occurrences, plen,
            unnest(string_split(phrase, ' ')) AS w
          FROM cells),
        wstats AS (SELECT source, w,
            CAST(SUM(n_occurrences) AS BIGINT) AS freq,
            CAST(SUM(n_occurrences * plen) AS BIGINT) AS deg
          FROM pw GROUP BY source, w),
        ws AS (SELECT source, w, (1000000 * deg) // freq AS ws6
          FROM wstats),
        scored AS (SELECT pw.source, pw.phrase,
            MIN(pw.plen) AS n_words,
            MIN(pw.n_occurrences) AS n_occurrences,
            CAST(SUM(ws.ws6) AS BIGINT) AS s6
          FROM pw JOIN ws ON pw.source = ws.source AND pw.w = ws.w
          GROUP BY pw.source, pw.phrase),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY source
            ORDER BY s6 DESC, phrase) AS rank
          FROM scored)
        SELECT source, phrase, n_words, n_occurrences,
          ROUND(CAST(s6 AS DOUBLE) / 1e6, 6) AS score, rank
        FROM ranked WHERE rank <= $topK
        ORDER BY source, rank"""
}
