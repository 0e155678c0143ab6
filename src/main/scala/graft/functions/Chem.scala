package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chem-adjacent column pack.
  *
  * RDKit has no JVM port, so per SURVEY §7.5 these operators consume
  * PRECOMPUTED fingerprint/descriptor columns. The reference serializes
  * Morgan count fingerprints as comma-separated uint8 counts in a string
  * (reference: src/workbench/utils/chem_utils/fingerprints.py:27-121,
  * format note at 43-45); here that format is parsed once into a typed
  * array column and all similarity math runs on the typed form.
  */
object Chem {

  /** Parse the reference's CSV-counts fingerprint string into
    * array<int> (e.g. "0,3,0,1" → [0,3,0,1]). */
  def parseFingerprint(fp: Column): Column =
    transform(split(fp, ","), s => s.try_cast("int"))

  /** Serialize back to the reference's CSV string format. */
  def fingerprintToCsv(fp: Column): Column = concat_ws(",", fp)

  /** Tanimoto similarity on count fingerprints: Σmin / Σmax
    * (the complement of graft.proximity.Proximity.ruzicka). */
  def tanimoto(a: Column, b: Column): Column = {
    val smin = aggregate(zip_with(a, b, (x, y) => least(x, y).cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val smax = aggregate(zip_with(a, b, (x, y) => greatest(x, y).cast("double")),
      lit(0.0), (acc, v) => acc + v)
    when(smax === 0, 1.0).otherwise(smin / smax)
  }

  /** Binary Tanimoto on presence bits (counts clamped to 0/1) — what
    * MinHashLSH approximates; useful for cross-checking LSH recall. */
  def tanimotoBinary(a: Column, b: Column): Column = {
    val ab = zip_with(a, b, (x, y) =>
      struct((x > 0 && y > 0).cast("int").as("i"), (x > 0 || y > 0).cast("int").as("u")))
    val inter = aggregate(ab, lit(0), (acc, v) => acc + v.getField("i")).cast("double")
    val union = aggregate(ab, lit(0), (acc, v) => acc + v.getField("u")).cast("double")
    when(union === 0, 1.0).otherwise(inter / union)
  }

  /** Expand a fingerprint-string column to typed form on a frame,
    * validating width; malformed rows get null. */
  def withParsedFingerprint(df: DataFrame, fpCol: String, expectedDims: Int): DataFrame = {
    val parsed = parseFingerprint(col(fpCol))
    df.withColumn(s"${fpCol}_vec",
      when(size(parsed) === expectedDims && !exists(parsed, _.isNull), parsed))
  }
}
