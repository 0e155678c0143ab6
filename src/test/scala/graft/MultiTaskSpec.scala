package graft

import graft.ml.MultiTask
import org.apache.spark.sql.functions._

/** Multi-task merge/validate (utils/multi_task.py:44-250, 407-470). */
class MultiTaskSpec extends SparkSpec {
  import spark.implicits._

  private def f1 = Seq(
    (1L, "CCO", 1.0, 2.0, 10.0),
    (2L, "CCN", 3.0, 4.0, 20.0),
    (3L, "CCC", 5.0, 6.0, 30.0))
    .toDF("id", "smiles", "feat_a", "feat_b", "sol")

  private def f2 = Seq(
    (2L, "CCN", 3.5, 4.5, 0.2, 99.0),
    (4L, "COC", 7.0, 8.0, 0.4, 88.0))
    .toDF("id", "smiles", "feat_a", "feat_b", "perm", "extra_date")

  test("combine: shared-feature intersection, primary-first collapse, NaN fill") {
    val out = MultiTask.combine(Seq(f1, f2), Seq(Seq("sol"), Seq("perm")),
      passthroughColumns = Seq(Seq(), Seq("extra_date")))
    assert(out.columns.toSeq ==
      Seq("id", "smiles", "feat_a", "feat_b", "sol", "perm", "extra_date"))
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val r2 = rows(1)
    // molecule in both sources: one row, both targets, PRIMARY features win
    assert(r2.getDouble(out.columns.indexOf("sol")) == 20.0)
    assert(r2.getDouble(out.columns.indexOf("perm")) == 0.2)
    assert(r2.getDouble(out.columns.indexOf("feat_a")) == 3.0) // frame 0, not 3.5
    // source-2-only molecule: primary target null
    assert(rows(3).isNullAt(out.columns.indexOf("sol")))
    assert(rows(3).getDouble(out.columns.indexOf("perm")) == 0.4)
    // source-1-only molecule: secondary target + passthrough null
    assert(rows(0).isNullAt(out.columns.indexOf("perm")))
    assert(rows(0).isNullAt(out.columns.indexOf("extra_date")))
  }

  test("combine: merge_on_smiles collapses by smiles instead of id") {
    val ext = Seq((901L, "CCO", 1.5, 2.5, 0.7)).toDF("id", "smiles", "feat_a", "feat_b", "perm")
    val out = MultiTask.combine(Seq(f1, ext), Seq(Seq("sol"), Seq("perm")),
      mergeOnSmiles = true)
    val cco = out.filter(col("smiles") === "CCO").head()
    assert(cco.getDouble(out.columns.indexOf("sol")) == 10.0)
    assert(cco.getDouble(out.columns.indexOf("perm")) == 0.7)
    assert(cco.getLong(out.columns.indexOf("id")) == 1L) // primary id wins
  }

  test("combine: input validation fails hard") {
    intercept[IllegalArgumentException](MultiTask.combine(Nil, Nil))
    intercept[IllegalArgumentException](
      MultiTask.combine(Seq(f1), Seq(Seq("sol"), Seq("perm"))))
    intercept[IllegalArgumentException](
      MultiTask.combine(Seq(f1.drop("smiles")), Seq(Seq("sol"))))
    intercept[IllegalArgumentException](
      MultiTask.combine(Seq(f1), Seq(Seq("nope"))))
  }

  test("validate: one pass flags null/dup keys, empty targets, null features") {
    val bad = Seq(
      (Some(1L), Some("CCO"), Some(1.0), None: Option[Double], None: Option[Double]),
      (Some(1L), Some("CCO"), Some(2.0), None, None),
      (None, None, None, None, None))
      .toDF("id", "smiles", "feat_a", "all_null_feat", "sol")
    val (errors, warnings) = MultiTask.validate(bad, Seq("sol", "missing_t"))
    assert(errors.exists(_.contains("id has 1 null")))
    assert(errors.exists(_.contains("duplicate")))
    assert(errors.exists(_.contains("'smiles' has 1 null")))
    assert(errors.exists(_.contains("Target 'sol' has zero non-null")))
    assert(errors.exists(_.contains("Target 'missing_t' missing")))
    assert(warnings.exists(_.contains("entirely null")))
    assert(warnings.exists(_.contains("duplicate values (may be expected)")))
    // clean frame: no errors
    val (e2, _) = MultiTask.validate(f1, Seq("sol"))
    assert(e2.isEmpty)
  }
}
