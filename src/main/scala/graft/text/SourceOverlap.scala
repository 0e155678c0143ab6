package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source n-gram overlap matrix: for every pair of corpus
  * sources, the Jaccard similarity of their DISTINCT word-shingle
  * sets — the corpus-composition diagnostic that tells a data team
  * which feeds are rebadged copies of each other before mixing
  * weights are chosen (beyond the reference's operator set —
  * north-star scope).
  *
  * Scale shape: documents collapse to (source, shingle) DISTINCT pairs
  * first — per-source set sizes are one groupBy away, and the pair
  * intersection is a self-equi-join ON THE SHINGLE whose output per
  * shingle is bounded by #sources² (sources are metadata-cardinality:
  * tens, not millions), never by corpus size. No cross join, no
  * all-pairs over documents; the result frame is #source-pairs rows.
  */
object SourceOverlap {

  /** (source_a, source_b, n_a, n_b, n_common, jaccard 4dp) for every
    * unordered source pair with at least one shared shingle,
    * source_a < source_b lexicographically. `n` is the word-shingle
    * width. */
  def overlapMatrix(corpus: DataFrame, sourceCol: String, textCol: String,
                    n: Int = 3): DataFrame = {
    val srcSh = corpus.select(col(sourceCol).as("__src"),
        explode(graft.functions.Signatures.wordShingles(col(textCol), n)).as("__sh"))
      .distinct()
    val sizes = srcSh.groupBy(col("__src")).agg(count(lit(1)).as("__n"))
    val common = srcSh.select(col("__src").as("source_a"), col("__sh"))
      .join(srcSh.select(col("__src").as("source_b"), col("__sh")), Seq("__sh"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("__src").as("source_a"), col("__n").as("n_a")), Seq("source_a"))
      .join(sizes.select(col("__src").as("source_b"), col("__n").as("n_b")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_common"),
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")), 4).as("jaccard"))
  }

  /** Source pairs whose shingle-set Jaccard reaches `minJaccard` —
    * the "these two feeds are the same crawl" shortlist. */
  def nearDuplicateSources(corpus: DataFrame, sourceCol: String,
                           textCol: String, n: Int = 3,
                           minJaccard: Double = 0.8): DataFrame =
    overlapMatrix(corpus, sourceCol, textCol, n)
      .filter(col("jaccard") >= minJaccard)
}
