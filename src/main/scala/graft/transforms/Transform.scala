package graft.transforms

/** Pipeline node template — the reference's `Transform(input, output)`
  * with the `pre → impl → post` template method
  * (reference: src/workbench/core/transforms/transform.py:14-35 enums,
  * 125-135 template). Nodes compose into DAGs by chaining outputs.
  */
trait Transform[I, O] {
  def pre(input: I): I = input
  def impl(input: I): O
  def post(output: O): O = output
  final def transform(input: I): O = post(impl(pre(input)))
}

/** Input/output kinds enumerated by the reference (LOCAL_FILE, PANDAS_DF,
  * SPARK_DF, S3_OBJECT, DATA_SOURCE, FEATURE_SET, MODEL, ENDPOINT) —
  * here a simple ADT used for registry/metadata, not dispatch. */
sealed trait TransformKind
object TransformKind {
  case object LocalFile extends TransformKind
  case object DataFrameKind extends TransformKind
  case object DataSourceKind extends TransformKind
  case object FeatureSetKind extends TransformKind
  case object ModelKind extends TransformKind
}
