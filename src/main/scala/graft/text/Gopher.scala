package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher quality rules (Rae et al. 2021, table A1) as a per-source
  * funnel — the third preset next to q120 C4 and q128 FineWeb, with
  * the rules THOSE presets don't carry: mean-word-length bounds,
  * symbol-to-word ratio, bullet/ellipsis line shares, alphabetic-word
  * share, and the ≥2-stopword floor. Every rule is a per-row flag
  * (codegen string ops), the funnel one integer groupBy — no UDF.
  */
object Gopher {

  private val stopWords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Count of non-overlapping occurrences of `sub` in `c`. */
  private def occurrences(c: Column, sub: String): Column =
    ((length(c) - length(regexp_replace(c, java.util.regex.Pattern
      .quote(sub), ""))) / sub.length).cast("long")

  /** Per-document rule flags:
    * (idCol, srcCol, n_words, r_wordcount, r_wordlen, r_symbol,
    * r_bullet, r_ellipsis, r_alpha, r_stopwords, pass_all). */
  def annotate(docs: DataFrame, idCol: String, srcCol: String,
               textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = Text.tokens(t)
    val nWords = size(toks).cast("long")
    val meanLen = when(nWords > 0,
      aggregate(toks, lit(0L), (acc, w) => acc + length(w))
        .cast("double") / nWords)
    val symbols = occurrences(t, "#") + occurrences(t, "...") +
      occurrences(t, "…")
    val lines = filter(split(t, "\n"), l => length(trim(l)) > 0)
    val nLines = greatest(size(lines).cast("long"), lit(1L))
    val bulletLines = size(filter(lines, l =>
      trim(l).startsWith("-") || trim(l).startsWith("*") ||
        trim(l).startsWith("•"))).cast("long")
    val ellipsisLines = size(filter(lines, l =>
      trim(l).endsWith("...") || trim(l).endsWith("…")))
      .cast("long")
    val alphaWords = size(filter(toks, w => w.rlike("[a-z]")))
      .cast("long")
    val nStop = size(filter(array(stopWords.map(lit): _*),
      sw => array_contains(toks, sw))).cast("long")
    docs.select(col(idCol), col(srcCol), nWords.as("n_words"),
        (nWords >= 50 && nWords <= 100000).as("r_wordcount"),
        (meanLen >= 3.0 && meanLen <= 10.0).as("r_wordlen"),
        (nWords > 0 &&
          symbols.cast("double") / nWords <= 0.1).as("r_symbol"),
        (bulletLines.cast("double") / nLines <= 0.9).as("r_bullet"),
        (ellipsisLines.cast("double") / nLines <= 0.3)
          .as("r_ellipsis"),
        (nWords > 0 &&
          alphaWords.cast("double") / nWords >= 0.8).as("r_alpha"),
        (nStop >= 2).as("r_stopwords"))
      .withColumn("pass_all",
        col("r_wordcount") && col("r_wordlen") && col("r_symbol") &&
          col("r_bullet") && col("r_ellipsis") && col("r_alpha") &&
          col("r_stopwords"))
  }

  /** Per-source Gopher funnel: how many docs each rule kills.
    * Returns (source, n_docs, pass_wordcount, pass_wordlen,
    * pass_symbol, pass_bullet, pass_ellipsis, pass_alpha,
    * pass_stopwords, pass_all, pass_rate 6dp). */
  def funnel(docs: DataFrame, idCol: String, srcCol: String,
             textCol: String): DataFrame = {
    val a = annotate(docs, idCol, srcCol, textCol)
    a.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("r_wordcount").cast("long")).as("pass_wordcount"),
        sum(col("r_wordlen").cast("long")).as("pass_wordlen"),
        sum(col("r_symbol").cast("long")).as("pass_symbol"),
        sum(col("r_bullet").cast("long")).as("pass_bullet"),
        sum(col("r_ellipsis").cast("long")).as("pass_ellipsis"),
        sum(col("r_alpha").cast("long")).as("pass_alpha"),
        sum(col("r_stopwords").cast("long")).as("pass_stopwords"),
        sum(col("pass_all").cast("long")).as("pass_all"))
      .withColumn("pass_rate",
        round(col("pass_all").cast("double") / col("n_docs"), 6))
      .orderBy("source")
  }

  /** DuckDB twin of [[funnel]] over the documents table. */
  def funnelOracleSql(): String = {
    val stopList = stopWords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH base AS (SELECT source,
            list_filter(string_split_regex(lower(trim(text)), '\\s+'),
              x -> length(x) > 0) AS toks,
            text FROM documents),
        per AS (SELECT source,
            len(toks) AS nw,
            CASE WHEN len(toks) > 0 THEN
              CAST(list_sum(list_transform(toks, w -> length(w)))
                AS DOUBLE) / len(toks) END AS mwl,
            (length(text) - length(replace(text, '#', '')))
              + (length(text) - length(replace(text, '...', ''))) / 3
              + (length(text) - length(replace(text, '…', '')))
              AS sym,
            list_filter(string_split(text, chr(10)),
              l -> length(trim(l)) > 0) AS lines,
            len(list_filter(toks,
              w -> regexp_matches(w, '[a-z]'))) AS alphaw,
            len(list_filter($stopList,
              sw -> list_contains(toks, sw))) AS nstop
          FROM base),
        flags AS (SELECT source,
            (nw >= 50 AND nw <= 100000) AS r_wordcount,
            (mwl >= 3.0 AND mwl <= 10.0) AS r_wordlen,
            (nw > 0 AND CAST(sym AS DOUBLE) / nw <= 0.1) AS r_symbol,
            (CAST(len(list_filter(lines, l -> trim(l) LIKE '-%'
                OR trim(l) LIKE '*%' OR trim(l) LIKE '•%'))
              AS DOUBLE) / GREATEST(len(lines), 1) <= 0.9) AS r_bullet,
            (CAST(len(list_filter(lines, l -> trim(l) LIKE '%...'
                OR trim(l) LIKE '%…'))
              AS DOUBLE) / GREATEST(len(lines), 1) <= 0.3)
              AS r_ellipsis,
            (nw > 0 AND CAST(alphaw AS DOUBLE) / nw >= 0.8) AS r_alpha,
            (nstop >= 2) AS r_stopwords
          FROM per),
        f2 AS (SELECT *,
            (r_wordcount AND r_wordlen AND r_symbol AND r_bullet
              AND r_ellipsis AND r_alpha AND r_stopwords) AS pass_all
          FROM flags)
        SELECT source, COUNT(*) AS n_docs,
          SUM(CASE WHEN r_wordcount THEN 1 ELSE 0 END)
            AS pass_wordcount,
          SUM(CASE WHEN r_wordlen THEN 1 ELSE 0 END) AS pass_wordlen,
          SUM(CASE WHEN r_symbol THEN 1 ELSE 0 END) AS pass_symbol,
          SUM(CASE WHEN r_bullet THEN 1 ELSE 0 END) AS pass_bullet,
          SUM(CASE WHEN r_ellipsis THEN 1 ELSE 0 END)
            AS pass_ellipsis,
          SUM(CASE WHEN r_alpha THEN 1 ELSE 0 END) AS pass_alpha,
          SUM(CASE WHEN r_stopwords THEN 1 ELSE 0 END)
            AS pass_stopwords,
          SUM(CASE WHEN pass_all THEN 1 ELSE 0 END) AS pass_all,
          ROUND(SUM(CASE WHEN pass_all THEN 1 ELSE 0 END)
            / CAST(COUNT(*) AS DOUBLE), 6) AS pass_rate
        FROM f2 GROUP BY source ORDER BY source"""
  }
}
