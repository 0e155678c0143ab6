package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe train/test assignment: documents linked by shared
  * content must land in the SAME split, or the held-out set silently
  * contains near-copies of training rows and every eval number is
  * inflated (the train/test contamination failure mode of Lee et al.
  * 2022 §6.2 — splitting AFTER dedup-linking, not before, is the fix).
  *
  * Linking relation: two docs share a rare anchor shingle
  * (`shingleSize`-gram with corpus doc-frequency in [2, maxDf] — the
  * df cap drops boilerplate exactly like the ExactSubstr kernel's
  * guard). Components come from `iters` rounds of synchronous
  * MIN-LABEL propagation (label(v) ← min(label(v), min over
  * neighbors)), so two docs within `iters` hops share a label — a
  * k-HOP CLOSURE, the practical contamination radius, not full
  * connected components (chains longer than `iters` can still split;
  * the returned `n_cross_pairs` audits exactly that residue, and 0
  * certifies the split leak-free under the link relation).
  *
  * Scale shape: one shingle explode + one df-capped self-join build
  * the edge list (≤ maxDf² pairs per anchor); each propagation round
  * is one keyed join + one min-groupBy (PageRank-round budget); the
  * fold draw is the repo-standard portable md5 predicate on the
  * component label, so the assignment is reproducible on any engine
  * and any rerun. Returns per split: (split, n_docs, n_components,
  * n_cross_pairs) with n_cross_pairs the global linked-pair count
  * crossing splits (same value on both rows — an audit column).
  */
object LeakageSplit {

  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
                       shingleSize: Int = 8, maxDf: Int = 5,
                       iters: Int = 4, trainFraction: Double = 0.8,
                       seed: Long = 42L): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters $iters out of range")
    require(trainFraction > 0 && trainFraction < 1)
    val docs = df.select(col(idCol).cast("long").as("id"),
      col(textCol).as("__text"))
    // checkpointed: rare and linked both read the exploded shingle
    // frame, and the pair self-join reads linked twice — without the
    // checkpoints the corpus explode+distinct ran three times
    val sh = docs.select(col("id"), explode(
        graft.functions.Signatures.wordShingles(col("__text"), shingleSize))
        .as("g"))
      .distinct()
      .localCheckpoint(true)
    val rare = sh.groupBy("g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2 && col("__df") <= maxDf)
      .select("g")
    val linked = sh.join(rare, Seq("g")).localCheckpoint(true)
    val edges = linked.select(col("g"), col("id").as("a"))
      .join(linked.select(col("g"), col("id").as("b")), Seq("g"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct().localCheckpoint(true)
    val symEdges = edges.union(edges.select(col("b").as("a"),
      col("a").as("b")))
    var lab = docs.select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val nbrMin = symEdges.join(lab, symEdges("b") === lab("id"))
        .groupBy(col("a")).agg(min("label").as("__nl"))
      val next = lab.join(nbrMin, lab("id") === nbrMin("a"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("__nl"), col("label")))
            .as("label"))
        .localCheckpoint(true)
      lab.unpersist()
      lab = next
    }
    // portable md5 fold on the component label (stratifiedSplit scheme)
    val cut = f"${math.min((trainFraction * 4294967296L).toLong, 4294967295L)}%08x"
    val draw = substring(md5(concat_ws(":",
      col("label").cast("string"), lit(seed.toString))), 1, 8)
    val assigned = lab.withColumn("split",
      when(draw < lit(cut), "train").otherwise("test"))
      .localCheckpoint(true)
    val cross = edges
      .join(assigned.select(col("id").as("a"), col("split").as("__sa")), "a")
      .join(assigned.select(col("id").as("b"), col("split").as("__sb")), "b")
      .agg(sum(when(col("__sa") =!= col("__sb"), 1L).otherwise(0L))
        .as("n_cross_pairs"))
    val out = assigned.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("label").as("n_components"))
      .crossJoin(broadcast(cross))
      .select(col("split"), col("n_docs"), col("n_components"),
        coalesce(col("n_cross_pairs"), lit(0L)).as("n_cross_pairs"))
      .localCheckpoint(true)
    edges.unpersist(); lab.unpersist(); assigned.unpersist()
    out
  }

  /** DuckDB twin of [[leakageSafeSplit]]; `docsCte` must yield
    * (id, text). Shingles, min-label rounds, and the md5 fold are
    * re-derived identically. */
  def leakageSafeSplitOracleSql(docsCte: String, shingleSize: Int = 8,
                                maxDf: Int = 5, iters: Int = 4,
                                trainFraction: Double = 0.8,
                                seed: Long = 42L): String = {
    val cut = f"${math.min((trainFraction * 4294967296L).toLong, 4294967295L)}%08x"
    val n = shingleSize
    val rounds = (1 to iters).map { t =>
      s"""nm$t AS (SELECT e.a, MIN(l.label) AS nl
            FROM sym e JOIN lb${t - 1} l ON e.b = l.id GROUP BY e.a),
          lb$t AS MATERIALIZED (SELECT l.id,
              LEAST(l.label, COALESCE(nm$t.nl, l.label)) AS label
            FROM lb${t - 1} l LEFT JOIN nm$t ON l.id = nm$t.a)"""
    }.mkString(",\n")
    s"""WITH docs AS ($docsCte),
        tok AS (SELECT CAST(id AS BIGINT) AS id,
            list_filter(string_split_regex(lower(trim(text)), '\\s+'),
              x -> length(x) > 0) AS toks
          FROM docs),
        sh0 AS (SELECT id, CASE WHEN len(toks) < $n
              THEN [array_to_string(toks, ' ')]
            ELSE [array_to_string(toks[i:i+${n - 1}], ' ')
              for i in range(1, len(toks) - ${n - 2})] END AS s
          FROM tok),
        sh AS (SELECT DISTINCT id, unnest(s) AS g FROM sh0),
        rare AS (SELECT g FROM sh GROUP BY g
          HAVING COUNT(*) BETWEEN 2 AND $maxDf),
        lk AS (SELECT sh.id, sh.g FROM sh JOIN rare USING (g)),
        edges AS (SELECT DISTINCT x.id AS a, y.id AS b
          FROM lk x JOIN lk y ON x.g = y.g AND x.id < y.id),
        sym AS MATERIALIZED (SELECT a, b FROM edges
          UNION ALL SELECT b, a FROM edges),
        lb0 AS (SELECT id, id AS label FROM tok),
        $rounds,
        asg AS (SELECT id, label,
            CASE WHEN substring(md5(CAST(label AS VARCHAR) || ':$seed'),
              1, 8) < '$cut' THEN 'train' ELSE 'test' END AS split
          FROM lb$iters),
        cross_cnt AS (SELECT COALESCE(SUM(CASE WHEN sa.split != sb.split
              THEN 1 ELSE 0 END), 0) AS n_cross_pairs
          FROM edges e JOIN asg sa ON e.a = sa.id
          JOIN asg sb ON e.b = sb.id)
        SELECT split, COUNT(*) AS n_docs,
          COUNT(DISTINCT label) AS n_components,
          CAST(ANY_VALUE(c.n_cross_pairs) AS BIGINT) AS n_cross_pairs
        FROM asg CROSS JOIN cross_cnt c GROUP BY split"""
  }
}
