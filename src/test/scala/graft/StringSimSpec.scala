package graft

import graft.functions.StringSimOps
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler expression: canonical textbook values, DuckDB-parity
  * edge semantics, SQL-surface registration, codegen plan shape. */
class StringSimSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSimOps.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("canonical pairs and DuckDB-parity edge cases") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-15)
    assert(jw("ABC", "ABC") == 1.0)
    // DuckDB-parity: empty vs anything (including empty) is 0
    assert(jw("", "ABC") == 0.0 && jw("", "") == 0.0)
    assert(jw("AB", "BA") == 0.0)  // window 0: no same-position match
    // boost applies only ABOVE 0.7 jaro, prefix capped at 4
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333334) < 1e-15)
  }

  test("SQL surface: graft_jaro_winkler registered and null-safe") {
    graft.functions.SqlFunctions.install(spark)
    Seq(("martha", "marhta"), (null, "x")).toDF("a", "b")
      .createOrReplaceTempView("jwt")
    val rows = spark.sql(
      "SELECT graft_jaro_winkler(a, b) AS s FROM jwt").collect()
    assert(math.abs(rows(0).getDouble(0) - 0.9611111111111111) < 1e-15)
    assert(rows(1).isNullAt(0))
  }

  test("plan: whole-stage codegen projection, no fallback/UDF node") {
    // a parquet-backed frame (a literal one constant-folds away the
    // whole projection before any codegen happens)
    val p = graft.core.Tables.load(spark, sf, "part")
      .select(col("p_name").as("a"), reverse(col("p_name")).as("b"))
    val out = p.select(org.apache.spark.sql.GraftExprBridge.toColumn(
      graft.functions.JaroWinklerExpr(
        org.apache.spark.sql.GraftExprBridge.toExpression(col("a")),
        org.apache.spark.sql.GraftExprBridge.toExpression(col("b")))).as("s"))
    val plan = out.queryExecution.executedPlan.toString
    // "*(1)" is the whole-stage-codegen stage marker in plan strings
    assert(plan.contains("*(1) Project [graft_jaro_winkler") &&
      !plan.contains("BatchEvalPython"), plan)
    assert(out.head().getDouble(0) >= 0.0)
  }
}
