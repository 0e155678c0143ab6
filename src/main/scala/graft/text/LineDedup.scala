package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide LINE-level deduplication (RefinedWeb/CCNet-style):
  * remove every line that occurs more than `maxFreq` times across the
  * WHOLE corpus — the filter that strips navigation bars, cookie
  * banners, and boilerplate headers that document-level dedup can
  * never catch (beyond the reference's operator set — north-star
  * scope).
  *
  * Scale shape: ONE posexplode projection feeds both sides — the
  * line-frequency aggregate map-side-combines before its shuffle, and
  * the "frequent lines" frame it produces is tiny by construction
  * (only lines with > maxFreq occurrences survive the filter), so the
  * anti-join broadcasts under AQE. Reassembly is one groupBy on the
  * doc id with an in-row `array_sort` — no window, no second explode.
  */
object LineDedup {

  /** Annotated exploded view: (idCol, __pos, __line, __freq) — the
    * inspection surface (which lines WOULD be dropped and why). */
  def lineFrequencies(docs: DataFrame, idCol: String,
                      linesCol: String): DataFrame = {
    val e = docs.select(col(idCol), posexplode(col(linesCol)).as(Seq("__pos", "__line")))
    val freq = e.groupBy("__line").agg(count(lit(1)).as("__freq"))
    e.join(freq, Seq("__line"))
      .select(col(idCol), col("__pos"), col("__line"), col("__freq"))
  }

  /** Documents with corpus-frequent lines removed, remaining lines
    * re-joined by `\n` in original order. A document whose EVERY line
    * is frequent disappears from the output (nothing left to keep) —
    * the same contract as a quality-gate drop. Returns
    * (idCol, text). */
  def dedupLines(docs: DataFrame, idCol: String, linesCol: String,
                 maxFreq: Long): DataFrame = {
    val e = docs.select(col(idCol), posexplode(col(linesCol)).as(Seq("__pos", "__line")))
    // only lines ABOVE the frequency cap cross the join — a frame with
    // a hard row-count ceiling of corpus_lines / maxFreq, broadcast-able
    val frequent = e.groupBy("__line").agg(count(lit(1)).as("__freq"))
      .filter(col("__freq") > maxFreq).select("__line")
    e.join(frequent, Seq("__line"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line"))).as("text"))
  }

  /** [[dedupLines]] for a corpus without newlines: chunk `textCol`
    * into `width`-char lines first ([[Text.charChunks]]). */
  def dedupCharChunks(docs: DataFrame, idCol: String, textCol: String,
                      width: Int, maxFreq: Long): DataFrame =
    dedupLines(
      docs.withColumn("__lines", Text.charChunks(col(textCol), width)),
      idCol, "__lines", maxFreq)
}
