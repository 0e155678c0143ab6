package graft.ml

import graft.text.Mixing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-free train/test splitting: every row of a GROUP (user,
  * patient, session) lands on exactly one side, decided by a
  * deterministic md5 draw of the group key — the split a behavioral
  * model needs, because a row-level split leaks a user's test behavior
  * into training through their other rows (the reference splits at the
  * row level only: temporal_split / stratified_split,
  * reference: src/workbench/utils/pandas_utils.py data-split helpers).
  *
  * No shuffle at all: the side is a PROJECTION of the group column
  * (hash + threshold compare per row) — group co-location is free
  * because the decision is a pure function of the key, not an
  * assignment table to join.
  */
object GroupSplit {

  /** Adds `split` ∈ {"train", "test"}: groups whose md5 draw falls
    * below `testFrac` go to test. Engine-portable (the q105 hex-draw
    * kernel) — any system reproduces the same assignment.
    */
  def groupSplit(df: DataFrame, groupCol: String, testFrac: Double): DataFrame = {
    require(testFrac >= 0 && testFrac <= 1)
    df.withColumn("split",
      when(Mixing.hashKeep(col(groupCol), lit(testFrac)), "test")
        .otherwise("train"))
  }

  /** Split summary: (split, n_rows, n_groups) — the leakage check is
    * n_groups(train) + n_groups(test) == total distinct groups. */
  def splitSummary(df: DataFrame, groupCol: String, testFrac: Double): DataFrame =
    groupSplit(df, groupCol, testFrac)
      .groupBy("split")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(groupCol)).as("n_groups"))
}
