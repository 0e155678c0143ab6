package graft.dedup

import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch calibration: how well does the MinHash Jaccard ESTIMATE
  * (matching-minima share over `numHashes` salted hashes) track the
  * EXACT Jaccard on this corpus? Every LSH deployment should read this
  * curve once before trusting its thresholds — the estimator's ±1/√k
  * noise is textbook (Broder 1997), but the realized bias on a given
  * token distribution is not. Output is a reliability table per
  * estimate decile: if mean_exact strays from mean_est, the chosen
  * band/row LSH config is mistuned for this corpus.
  *
  * Determinism discipline: the i-th hash of a token is
  * md5(i || '|' || token) — salted md5 hex strings, minimum by
  * lexicographic order, identical on Spark and DuckDB (no engine hash,
  * no RNG). The decile is the integer-lattice cut (10·matches) div k;
  * exact Jaccard uses distinct word tokens, matching q28's definition.
  *
  * Scale shape: calibration is an AUDIT-SAMPLE read by construction —
  * it needs the exact Jaccard, which only exists on a bounded sample
  * (`idCap`); production pairing stays with the LSH path
  * ([[Dedup.minhashLsh]]). The sample pair frame is fixed-size
  * (idCap²/2), independent of corpus scale. */
object SketchCalibration {

  /** Reliability table of the MinHash estimator per estimate decile.
    * Returns (decile, n_pairs, mean_est 6dp, mean_exact 6dp,
    * mean_abs_err 6dp). */
  def minhashReliability(docs: DataFrame, idCol: String,
                         textCol: String, numHashes: Int = 16,
                         idCap: Int = 200): DataFrame = {
    val base = docs.filter(col(idCol) < idCap && col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        array_distinct(Text.tokens(col(textCol))).as("__ws"))
      .filter(size(col("__ws")) > 0)
      .withColumn("__mins",
        transform(sequence(lit(0), lit(numHashes - 1)), i =>
          array_min(transform(col("__ws"), s =>
            md5(concat(i.cast("string"), lit("|"), s))))))
      .localCheckpoint(true) // idCap rows; both sides of the pair join
    val pairs = base.as("a").join(base.as("b"),
      col("a.__id") < col("b.__id"))
    val matches = size(filter(
      zip_with(col("a.__mins"), col("b.__mins"), (x, y) => x === y),
      m => m)).cast("long")
    val inter = size(array_intersect(col("a.__ws"), col("b.__ws")))
      .cast("long")
    val union = size(array_distinct(
      concat(col("a.__ws"), col("b.__ws")))).cast("long")
    pairs
      .select(matches.as("__m"), inter.as("__i"), union.as("__u"))
      .select(expr(s"(10 * __m) div $numHashes").as("decile"),
        (col("__m").cast("double") / numHashes).as("__est"),
        (col("__i").cast("double") / col("__u")).as("__ex"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_pairs"),
        round(avg("__est"), 6).as("mean_est"),
        round(avg("__ex"), 6).as("mean_exact"),
        round(avg(abs(col("__est") - col("__ex"))), 6)
          .as("mean_abs_err"))
      .orderBy("decile")
  }

  /** DuckDB twin of [[minhashReliability]] over the documents table. */
  def minhashReliabilityOracleSql(numHashes: Int = 16,
                                  idCap: Int = 200): String =
    s"""WITH base AS (SELECT doc_id,
            list_distinct(list_filter(
              string_split_regex(lower(trim(text)), '\\s+'),
              x -> length(x) > 0)) AS ws
          FROM documents
          WHERE doc_id < $idCap AND text IS NOT NULL),
        nz AS (SELECT doc_id, ws,
            [list_min(list_transform(ws, s ->
               md5(CAST(i AS VARCHAR) || '|' || s)))
             FOR i IN range(0, $numHashes)] AS mins
          FROM base WHERE len(ws) > 0),
        p AS (SELECT
            CAST(len([1 FOR j IN range(1, $numHashes + 1)
              IF a.mins[j] = b.mins[j]]) AS BIGINT) AS m,
            CAST(len(list_intersect(a.ws, b.ws)) AS BIGINT) AS i,
            CAST(len(list_distinct(list_concat(a.ws, b.ws)))
              AS BIGINT) AS u
          FROM nz a JOIN nz b ON a.doc_id < b.doc_id)
        SELECT (10 * m) // $numHashes AS decile, COUNT(*) AS n_pairs,
          ROUND(AVG(CAST(m AS DOUBLE) / $numHashes), 6) AS mean_est,
          ROUND(AVG(CAST(i AS DOUBLE) / u), 6) AS mean_exact,
          ROUND(AVG(ABS(CAST(m AS DOUBLE) / $numHashes
            - CAST(i AS DOUBLE) / u)), 6) AS mean_abs_err
        FROM p GROUP BY decile ORDER BY decile"""
}
