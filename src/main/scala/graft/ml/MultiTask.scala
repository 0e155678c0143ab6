package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-task dataset assembly — the reference's single-task→multi-task
  * merge machinery (utils/multi_task.py:44-250 combine, :407-470
  * validate; compute_inverse_count_task_weights lives in
  * [[Models.inverseCountTaskWeights]]).
  *
  * Semantics: shared feature columns are the intersection across all
  * frames (excluding each frame's targets/passthroughs); each frame is
  * subset to key + shared + its own targets, stacked, and collapsed by
  * the merge key taking, per column, the value from the LOWEST source
  * index that has one — so a molecule appearing in several sources gets
  * all its targets on one row, with the primary task (first frame)
  * winning conflicts. The reference collapses with pandas
  * groupby().first() in concat order; with unique ids per source (which
  * [[validate]] enforces) the min_by form is the same answer and stays
  * one hash aggregate at any scale.
  *
  * `standardize_smiles` (ChEMBL canonicalization) is RDKit-backed and
  * scoped out with the rest of the chem pack (SURVEY §7.5); merging on
  * raw smiles strings is supported.
  */
object MultiTask {

  /** Combine single-task frames into one multi-task frame.
    *
    * @param frames            per-task frames, PRIMARY task first; each has
    *                          `idColumn`, `smiles`, shared features, its targets
    * @param targetColumns     parallel per-frame target column names
    * @param idColumn          merge key ("id"); `mergeOnSmiles` switches to smiles
    * @param mergeOnSmiles     collapse by smiles (external data without shared ids)
    * @param passthroughColumns per-frame columns carried like targets but not tasks
    */
  def combine(frames: Seq[DataFrame], targetColumns: Seq[Seq[String]],
              idColumn: String = "id", mergeOnSmiles: Boolean = false,
              passthroughColumns: Seq[Seq[String]] = Seq.empty): DataFrame = {
    require(frames.nonEmpty, "frames must be non-empty")
    require(frames.size == targetColumns.size,
      s"frames (${frames.size}) and targetColumns (${targetColumns.size}) must align")
    val passthrough =
      if (passthroughColumns.isEmpty) frames.map(_ => Seq.empty[String])
      else {
        require(passthroughColumns.size == frames.size,
          "passthroughColumns must align with frames")
        passthroughColumns
      }
    frames.zipWithIndex.foreach { case (df, i) =>
      require(df.columns.contains(idColumn), s"frame $i missing id column '$idColumn'")
      require(df.columns.contains("smiles"), s"frame $i missing 'smiles' column")
      val missing = targetColumns(i).filterNot(df.columns.contains)
      require(missing.isEmpty, s"frame $i missing targets: ${missing.mkString(",")}")
    }
    val key = if (mergeOnSmiles) "smiles" else idColumn
    // shared features: intersection of every frame's non-key, non-target,
    // non-passthrough columns (order from the primary frame)
    val perFrameFeatures = frames.zipWithIndex.map { case (df, i) =>
      df.columns.toSeq.filterNot(c => c == idColumn || c == "smiles" ||
        targetColumns(i).contains(c) || passthrough(i).contains(c))
    }
    val shared = perFrameFeatures.head
      .filter(c => perFrameFeatures.forall(_.contains(c)))
    val allCarried = (targetColumns ++ passthrough).flatten.distinct
    // stack: key + both key columns + shared + this frame's carried cols,
    // others null — unionByName(allowMissing) fills the rest
    val stacked = frames.zipWithIndex.map { case (df, i) =>
      val carried = (targetColumns(i) ++ passthrough(i)).map(col)
      df.select((Seq(col(idColumn), col("smiles")) ++ shared.map(col) ++ carried
        :+ lit(i).as("__src")): _*)
    }.reduce(_.unionByName(_, allowMissingColumns = true))
    // collapse by key: per column, the value from the lowest source index
    // that has one (primary task wins — pandas concat-order first())
    val valueCols = (Seq(idColumn, "smiles").filterNot(_ == key) ++
      shared ++ allCarried.filter(stacked.columns.contains)).distinct
    val aggs = valueCols.map(c =>
      min_by(col(c), when(col(c).isNotNull, col("__src"))).as(c))
    stacked.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
      .select((key +: valueCols).map(col): _*)
  }

  /** Pre-training validation (multi_task.py:407-470): returns
    * (errors, warnings) from ONE aggregate pass — null/duplicate keys,
    * missing smiles, empty targets, all-null feature columns,
    * featureless rows. Callers fail on non-empty errors. */
  def validate(df: DataFrame, targetColumns: Seq[String],
               idColumn: String = "id"): (Seq[String], Seq[String]) = {
    val errors = scala.collection.mutable.Buffer.empty[String]
    val warnings = scala.collection.mutable.Buffer.empty[String]
    val cols = df.columns.toSeq
    val hasSmiles = cols.contains("smiles")
    if (!hasSmiles) errors += "'smiles' column missing from DataFrame"
    val presentTargets = targetColumns.filter(cols.contains)
    targetColumns.filterNot(cols.contains)
      .foreach(t => errors += s"Target '$t' missing from DataFrame")
    val featureCols = cols.filterNot(c =>
      c == idColumn || c == "smiles" || targetColumns.contains(c))

    val aggs =
      Seq(count(lit(1)).as("__n"),
        sum(when(col(idColumn).isNull, 1).otherwise(0)).as("__null_id"),
        countDistinct(col(idColumn)).as("__distinct_id")) ++
      (if (hasSmiles)
        Seq(sum(when(col("smiles").isNull, 1).otherwise(0)).as("__null_smiles"),
          countDistinct(col("smiles")).as("__distinct_smiles"))
      else Nil) ++
      presentTargets.map(t => count(col(t)).as(s"__t_$t")) ++
      featureCols.map(c => count(col(c)).as(s"__f_$c")) ++
      (if (featureCols.nonEmpty)
        Seq(sum(when(featureCols.map(col(_).isNull).reduce(_ && _), 1)
          .otherwise(0)).as("__featureless"))
      else Nil)
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getAs[Long]("__n")

    val nullId = r.getAs[Long]("__null_id")
    if (nullId > 0) errors += s"$idColumn has $nullId null values"
    val dupId = n - nullId - r.getAs[Long]("__distinct_id")
    if (dupId > 0) errors += s"$idColumn has $dupId duplicate values"
    if (hasSmiles) {
      val nullSm = r.getAs[Long]("__null_smiles")
      if (nullSm > 0) errors += s"'smiles' has $nullSm null values"
      val dupSm = n - nullSm - r.getAs[Long]("__distinct_smiles")
      if (dupSm > 0)
        warnings += s"'smiles' has $dupSm duplicate values (may be expected)"
    }
    presentTargets.foreach { t =>
      if (r.getAs[Long](s"__t_$t") == 0L)
        errors += s"Target '$t' has zero non-null values"
    }
    val fullyNull = featureCols.filter(c => r.getAs[Long](s"__f_$c") == 0L)
    if (fullyNull.nonEmpty)
      warnings += s"${fullyNull.size} feature columns are entirely null: " +
        s"${fullyNull.take(5).mkString(", ")}"
    if (featureCols.nonEmpty) {
      val featureless = r.getAs[Long]("__featureless")
      if (featureless > 0)
        warnings += s"$featureless rows have no feature values (smiles-only merge?)"
    }
    (errors.toSeq, warnings.toSeq)
  }
}
