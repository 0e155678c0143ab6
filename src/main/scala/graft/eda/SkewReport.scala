package graft.eda

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    * Σ_i (2i − n − 1)·c_i / (n·Σc) with c_i ascending — computed in
    * GROUPED form: keys are first collapsed to (count_value, freq)
    * pairs, and each group's rank-sum enters in closed form
    * (f·F_prev + f(f+1)/2). The only ordered window runs over the
    * DISTINCT COUNT VALUES — usually a few hundred rows even when the
    * key has billions of levels — never over keys or rows.
    */
  def keySkew(df: DataFrame, key: String): DataFrame = {
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
    val grouped = counts.groupBy("__c").agg(count(lit(1)).as("__f"))
    val wc = Window.orderBy("__c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withF = grouped.withColumn("__cum", sum("__f").over(wc))
    // rank-sum of a tie group ending at cumulative position F:
    //   Σ_{j in group} j = f·(F − f) + f(f+1)/2
    val rankSum = col("__f") * (col("__cum") - col("__f")) +
      col("__f") * (col("__f") + 1) / 2
    val g = withF.agg(sum(col("__c").cast("double") *
      (lit(2.0) * rankSum - col("__f") * lit(nKeys + 1.0)))).head().getDouble(0)
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
}
