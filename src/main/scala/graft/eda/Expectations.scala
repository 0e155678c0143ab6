package graft.eda

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-expectations suite — the dbt-test / Deequ-style
  * contract check a pipeline runs before publishing a table (the
  * reference's health checks are per-artifact heuristics,
  * reference: src/workbench/core/artifacts/artifact.py health_check
  * surface; this generalizes them to user-declared constraints).
  *
  * Scale shape: every check compiles to ONE aggregate expression over a
  * single scan — the whole suite is one job, no per-check passes. The
  * uniqueness check is the only shuffling member (count distinct); the
  * rest are map-side folds.
  */
object Expectations {

  sealed trait Check {
    def name: String
    def column: String
  }
  /** Column must have no NULLs. */
  case class NotNull(column: String) extends Check { val name = "not_null" }
  /** Column tuple must be unique across rows. Tuples containing a NULL
    * are skipped (dbt `unique` semantics — SQL count distinct ignores
    * them on both engines). */
  case class Unique(columns: Seq[String]) extends Check {
    val name = "unique"; val column: String = columns.mkString(",")
  }
  /** Non-null values must be one of `allowed`. */
  case class AcceptedValues(column: String, allowed: Seq[String]) extends Check {
    val name = "accepted_values"
  }
  /** Non-null values must lie in [lo, hi]. */
  case class InRange(column: String, lo: Double, hi: Double) extends Check {
    val name = "in_range"
  }
  /** Non-null values must match the (RE2-portable) regex. */
  case class MatchesRegex(column: String, pattern: String) extends Check {
    val name = "matches_regex"
  }

  private def violations(c: Check): Column = c match {
    case NotNull(col0) =>
      sum(when(col(col0).isNull, 1L).otherwise(0L))
    case Unique(cols0) =>
      // rows beyond the first occurrence of each fully-non-null tuple
      sum(when(cols0.map(col(_).isNotNull).reduce(_ && _), 1L).otherwise(0L)) -
        countDistinct(col(cols0.head), cols0.tail.map(col): _*)
    case AcceptedValues(col0, allowed) =>
      sum(when(col(col0).isNotNull && !col(col0).isin(allowed: _*), 1L).otherwise(0L))
    case InRange(col0, lo, hi) =>
      sum(when(col(col0).isNotNull && (col(col0) < lo || col(col0) > hi), 1L)
        .otherwise(0L))
    case MatchesRegex(col0, p) =>
      sum(when(col(col0).isNotNull && !col(col0).rlike(p), 1L).otherwise(0L))
  }

  /** Run the suite: one row per check —
    * (check, column, n_violations, passed). Single scan, single job.
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty)
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      coalesce(violations(c), lit(0L)).as(s"__v$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val out = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), lit(c.column).as("column"),
        col(s"__v$i").as("n_violations"),
        (col(s"__v$i") === 0L).as("passed"))
    }
    row.select(explode(array(out: _*)).as("r")).select("r.*")
  }
}
