package graft.eda

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-shuffle skew diagnostics — the report you run BEFORE a 100 TB
  * join/groupBy to decide whether a key needs salting or AQE skew
  * handling: hot-key shares, key-count Gini, and the projected
  * equi-join fan-out, all computed from key-cardinality count tables
  * (the corpus is touched once per side).
  */
object SkewReport {

  /** Distribution report for a prospective shuffle key. One row:
    * (n_rows, n_keys, max_key_share 6dp, top5_share 6dp, gini 6dp).
    *
    * Gini over per-key counts (0 = uniform, →1 = one key dominates),
    * Σ_i (2i − n − 1)·c_i / (n·Σc) with c_i ascending — the tie-group
    * rank sums ride the shared adaptive rank kernel
    * ([[graft.ml.Metrics.rankedScores]]): below its route point a
    * plain ordered window over the distinct count values, above it the
    * bucketed two-level cumsum — so a key whose count table is itself
    * huge (billions of keys with near-unique counts) never funnels
    * through a SinglePartition window (VERDICT r7 item 4).
    */
  def keySkew(df: DataFrame, key: String,
              rankSmallMaxRows: Long = graft.ml.Metrics.RankSmallMaxRows)
      : DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // reused 4×; also avoids the self-lineage
                             // attribute collision a shared plan invites
    val t = counts.agg(sum("__c"), count(lit(1)), max("__c")).head()
    val spark0 = df.sparkSession
    if (t.isNullAt(0)) // empty input: a zero-row report, not an NPE
      return spark0.range(0).select(lit(0L).as("n_rows"), lit(0L).as("n_keys"),
        lit(0.0).as("max_key_share"), lit(0.0).as("top5_share"),
        lit(0.0).as("gini"))
    val (nRows, nKeys, mx) = (t.getLong(0), t.getLong(1), t.getLong(2))
    val t5 = counts.orderBy(desc("__c"), asc(key)).limit(5)
      .agg(sum("__c")).head().getLong(0)
    // rank kernel over the count table: one row per key, score = its
    // count. The kernel groups ties to (score, n=__f) pairs and yields
    // each tie group's average 1-based rank, so the group's rank-sum
    // is n·avg_rank = f·F_prev + f(f+1)/2 in the kernel's closed form.
    val ranked = graft.ml.Metrics.rankedScores(
      counts.select(lit("g").as("__grp"), col("__c"), lit(0).as("__lbl")),
      "__grp", "__lbl", "__c", buckets = 1024,
      smallMaxRows = rankSmallMaxRows)
    val g = ranked.agg(sum(col("score") *
        (lit(2.0) * col("n") * col("avg_rank") - col("n") * lit(nKeys + 1.0))))
      .head().getDouble(0)
    counts.unpersist()
    val spark = df.sparkSession
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    spark.range(1).select(
      lit(nRows).as("n_rows"), lit(nKeys).as("n_keys"),
      lit(r6(mx.toDouble / nRows)).as("max_key_share"),
      lit(r6(t5.toDouble / nRows)).as("top5_share"),
      lit(r6(g / (nKeys.toDouble * nRows))).as("gini"))
  }

  /** Exact output cardinality of `left ⋈ right` on `key` WITHOUT
    * running the join: Σ_k n_l(k)·n_r(k) over the two count tables —
    * the sanity check that catches a many-to-many blow-up while it is
    * still cheap. One row: (left_rows, right_rows, matching_keys,
    * join_rows, max_key_pairs).
    */
  def joinCardinality(left: DataFrame, right: DataFrame, key: String): DataFrame = {
    val lc = left.groupBy(col(key)).agg(count(lit(1)).as("__nl"))
    val rc = right.groupBy(col(key)).agg(count(lit(1)).as("__nr"))
    val lTot = left.count()
    val rTot = right.count()
    lc.join(rc, Seq(key))
      .agg(
        lit(lTot).as("left_rows"), lit(rTot).as("right_rows"),
        count(lit(1)).as("matching_keys"),
        coalesce(sum(col("__nl") * col("__nr")), lit(0L)).as("join_rows"),
        coalesce(max(col("__nl") * col("__nr")), lit(0L)).as("max_key_pairs"))
  }

  /** Shard-balance audit for a candidate partitioning key: hash every
    * key into 16^hexChars md5 buckets (2 hex chars = 256 shards) and
    * report how even the shards come out — max/mean skew ratio, CV,
    * and the heaviest shard's share. THE question to ask before
    * bucketing/repartitioning a 100 TB table on a key: a skew ratio
    * of 3 means the slowest executor does 3x the mean work. md5 is
    * engine-portable (unlike Spark's murmur3), so the oracle checks
    * the exact same shard assignment. One integer groupBy + one
    * aggregate with exact integer power sums. Returns one row:
    * (n_shards, n_rows, max_rows, min_rows, skew_ratio 6dp, cv 6dp,
    * top_share 6dp). */
  def shardSkewAudit(df: DataFrame, keyCol: String,
                     hexChars: Int = 2): DataFrame = {
    require(hexChars >= 1 && hexChars <= 4)
    val shards = df.filter(col(keyCol).isNotNull)
      .groupBy(substring(md5(col(keyCol).cast("string")), 1, hexChars)
        .as("__s"))
      .agg(count(lit(1)).as("__n"))
    val nd = col("n_shards").cast("double")
    val mean = col("n_rows").cast("double") / nd
    val varPop = col("__s2").cast("double") / nd - mean * mean
    shards.agg(count(lit(1)).as("n_shards"),
        sum("__n").as("n_rows"),
        max("__n").as("max_rows"), min("__n").as("min_rows"),
        sum(col("__n") * col("__n")).as("__s2"))
      .select(col("n_shards"), col("n_rows"), col("max_rows"),
        col("min_rows"),
        round(col("max_rows").cast("double") / mean, 6).as("skew_ratio"),
        round(sqrt(varPop) / mean, 6).as("cv"),
        round(col("max_rows").cast("double") / col("n_rows"), 6)
          .as("top_share"))
  }

  /** DuckDB twin of [[shardSkewAudit]]; `srcCte` must yield k. */
  def shardSkewAuditOracleSql(srcCte: String,
                              hexChars: Int = 2): String =
    s"""WITH sh AS (SELECT substring(md5(CAST(k AS VARCHAR)), 1,
            $hexChars) AS s, COUNT(*) AS n
          FROM ($srcCte) WHERE k IS NOT NULL GROUP BY s),
        g AS (SELECT COUNT(*) AS ns, SUM(n) AS nr, MAX(n) AS mx,
            MIN(n) AS mn, SUM(n * n) AS s2 FROM sh)
        SELECT ns AS n_shards, CAST(nr AS BIGINT) AS n_rows,
          mx AS max_rows, mn AS min_rows,
          ROUND(CAST(mx AS DOUBLE)
            / (CAST(nr AS DOUBLE) / CAST(ns AS DOUBLE)), 6)
            AS skew_ratio,
          ROUND(SQRT(CAST(s2 AS DOUBLE) / ns
              - (CAST(nr AS DOUBLE) / ns) * (CAST(nr AS DOUBLE) / ns))
            / (CAST(nr AS DOUBLE) / CAST(ns AS DOUBLE)), 6) AS cv,
          ROUND(CAST(mx AS DOUBLE) / nr, 6) AS top_share
        FROM g"""
}
