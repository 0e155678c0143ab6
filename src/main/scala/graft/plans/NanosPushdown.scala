package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule restoring parquet filter pushdown for nanosecond
  * timestamps read via the `nanosAsLong` legacy path.
  *
  * `Tables.load` converts raw-nanos longs with
  * `timestamp_micros(ts div 1000)`; a predicate on that derived
  * expression cannot reach the parquet scan (the scan only sees the raw
  * long column). The conversion is monotonic, so comparisons against a
  * timestamp literal rewrite exactly onto the raw column:
  *
  *   floor(ns/1000) <= T  ⟺  ns <= T·1000 + 999
  *   floor(ns/1000) <  T  ⟺  ns <  T·1000
  *   floor(ns/1000) >= T  ⟺  ns >= T·1000
  *   floor(ns/1000) >  T  ⟺  ns >  T·1000 + 999
  *
  * After the rewrite the predicate is a plain long comparison on the
  * scanned column → `PushedFilters` in the parquet scan. Register with
  * `NanosPushdown.install(spark)` (used by Verify/Bench/tests).
  */
object NanosPushdown extends Rule[LogicalPlan] {

  /** Matches timestamp_micros(<col> div 1000) and yields the raw column. */
  private object NanosToTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(c, Literal(1000L, LongType), _)) => Some(c)
      case _ => None
    }
  }

  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(micros: Long, TimestampType) => Some(micros)
      case Cast(Literal(micros: Long, TimestampType), _, _, _) => Some(micros)
      case _ => None
    }
  }

  private def nanosLit(n: Long): Literal = Literal(n, LongType)

  /** Largest ns with trunc(ns/1000) <= m. `div` TRUNCATES toward zero
    * (it is not floor), so the bound depends on the literal's sign:
    * m >= 0 → m·1000 + 999;  m < 0 → m·1000 (e.g. trunc(-999/1000) = 0,
    * which is > -1, so ns = -999 must NOT satisfy "<= -1").
    */
  private def ub(m: Long): Long = if (m >= 0) m * 1000 + 999 else m * 1000

  /** Literal magnitudes where ·1000 could overflow are left unrewritten
    * (the predicate still evaluates correctly, just unpushed). */
  private def safe(m: Long): Boolean = math.abs(m) < Long.MaxValue / 1000 - 1000

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // null-ness passes straight through the conversion
    case IsNull(NanosToTs(c)) => IsNull(c)
    case IsNotNull(NanosToTs(c)) => IsNotNull(c)
    // q <= m ⟺ ns <= ub(m);  q < m ⟺ q <= m-1;  q >= m ⟺ ¬(q <= m-1);
    // q > m ⟺ ¬(q <= m) — all four derive from the single ub() bound.
    case LessThanOrEqual(NanosToTs(c), TsLit(m)) if safe(m) => LessThanOrEqual(c, nanosLit(ub(m)))
    case LessThan(NanosToTs(c), TsLit(m)) if safe(m) => LessThanOrEqual(c, nanosLit(ub(m - 1)))
    case GreaterThanOrEqual(NanosToTs(c), TsLit(m)) if safe(m) => GreaterThan(c, nanosLit(ub(m - 1)))
    case GreaterThan(NanosToTs(c), TsLit(m)) if safe(m) => GreaterThan(c, nanosLit(ub(m)))
    case LessThanOrEqual(TsLit(m), NanosToTs(c)) if safe(m) => GreaterThan(c, nanosLit(ub(m - 1)))
    case LessThan(TsLit(m), NanosToTs(c)) if safe(m) => GreaterThan(c, nanosLit(ub(m)))
    case GreaterThanOrEqual(TsLit(m), NanosToTs(c)) if safe(m) => LessThanOrEqual(c, nanosLit(ub(m)))
    case GreaterThan(TsLit(m), NanosToTs(c)) if safe(m) => LessThanOrEqual(c, nanosLit(ub(m - 1)))
  }

  /** Idempotently add this rule to the session's extra optimizations. */
  def install(spark: SparkSession): Unit = {
    val current = spark.experimental.extraOptimizations
    if (!current.contains(this)) {
      spark.experimental.extraOptimizations = current :+ this
    }
  }
}
