package graft.views

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join utilities for the 100 TB scale path.
  *
  * The reference never plans joins itself (Athena does); these are the
  * engine-side tools a Spark deployment needs when AQE's automatic skew
  * handling isn't enough.
  */
object Joins {

  /** Salted equi-join for skewed keys: the skewed (left) side gets a
    * random-but-deterministic salt in [0, buckets); the right side is
    * exploded `buckets`× so every (key, salt) pair matches. Breaks one
    * hot key's partition into `buckets` partitions at the cost of
    * replicating the right side.
    *
    * Right side should be the smaller input (its rows are multiplied).
    * Salt is derived from a hash of the whole left row — deterministic,
    * no RNG.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, buckets: Int,
                 joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(struct(left.columns.map(col).toIndexedSeq: _*)), lit(buckets)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Exclusion by key set — the reference's `isin`-negation pattern
    * (reference: src/workbench/core/artifacts/endpoint_core.py:780-784)
    * as a distributed anti-join instead of a collected list. */
  def exclude(df: DataFrame, keys: DataFrame, key: String): DataFrame =
    df.join(keys.select(key).distinct(), Seq(key), "left_anti")

  /** As-of join (backward): each left row picks the single right row with
    * the greatest `rightTs <= leftTs` for the same key — the time-series
    * "most recent state at event time" join Spark has no operator for.
    *
    * NOT an interval join: implemented as the union-tag + running-`last`
    * window kernel, which costs ONE shuffle on `key` and a partition-local
    * sort on (ts, tag). At 100 TB that beats any join formulation — there
    * is no pair blow-up, no broadcast, no range bucketing; a hot key
    * serializes into one sorted partition exactly like any windowed
    * aggregate (AQE/salting applies if a single key dominates).
    *
    * `payload` columns are carried over from the right side under an
    * `asof_` prefix, plus `asof_ts` = the matched right timestamp (NULL
    * when no prior right row exists). Tie at equal ts: the right row wins
    * (inclusive match, same as DuckDB `ASOF JOIN ... ON l.ts >= r.ts`).
    * Rows on the right should be unique per (key, ts) — pre-aggregate if
    * not, otherwise which same-ts row wins is unspecified.
    *
    * `toleranceSec`: matches older than `leftTs - tolerance` are nulled
    * out (pandas `merge_asof(tolerance=...)` semantics).
    */
  def asofJoin(left0: DataFrame, right0: DataFrame, key: String, tsCol: String,
               payload: Seq[String], toleranceSec: Option[Long] = None): DataFrame = {
    val left = graft.core.Tables.ltzTs(left0, tsCol)
    val right = graft.core.Tables.ltzTs(right0, tsCol)
    val leftCols = left.columns.toSeq
    val outPayload = payload.map("asof_" + _)
    // Unified shape: key, ts, tag (0=right sorts first on ties), left
    // cols, and ONE match struct carrying (right ts, payload...) — a
    // single running-`last` over the struct picks the whole matched row
    // atomically, so a NULL payload VALUE in the matched row stays NULL
    // instead of falling through to an older row's value (per-column
    // lasts would tear the match).
    val matchStructR = struct(
      (col(tsCol).as("asof_ts") +: payload.map(c => col(c).as("asof_" + c))): _*)
    val rightU = right.select(
      (Seq(col(key), col(tsCol).as("__ts"), lit(0).as("__tag")) ++
        leftCols.filterNot(c => c == key || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        matchStructR.as("__m")): _*)
    val mType = rightU.schema("__m").dataType
    val leftU = left.select(
      (Seq(col(key), col(tsCol).as("__ts"), lit(1).as("__tag")) ++
        leftCols.filterNot(c => c == key || c == tsCol).map(col) :+
        lit(null).cast(mType).as("__m")): _*)
    val w = Window.partitionBy(key).orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = rightU.unionByName(leftU)
      .withColumn("__m", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val withinTol = toleranceSec match {
      case Some(tol) =>
        // micros precision: cast("long") would truncate to whole seconds
        val ok = col("__m").isNotNull &&
          unix_micros(col("__m.asof_ts")) >=
            unix_micros(col("__ts")) - lit(tol * 1000000L)
        joined.withColumn("__m", when(ok, col("__m")))
      case None => joined
    }
    withinTol.withColumnRenamed("__ts", tsCol)
      .select((leftCols.map(col) ++
        ("asof_ts" +: outPayload).map(c => col("__m." + c).as(c))): _*)
  }

  /** Band (range) join: pairs (l, r) on the same key with
    * `r.ts ∈ [l.ts + lowSec, l.ts + highSec]` — without the
    * BroadcastNestedLoop/cartesian plan a raw inequality join produces.
    *
    * Standard binned range join: the right side is bucketed once by
    * `floor(ts / W)` where W = band width; each left row joins at most
    * the two buckets its band can overlap (band width == bucket width ⇒
    * the interval crosses at most one bucket boundary). Equi-join on
    * (key, bucket) then the exact band predicate. Output is exact — each
    * right row lives in exactly one bucket, so no dedup is needed.
    * Scale: one shuffle per side on (key, bucket); left is duplicated at
    * most 2×; pair blow-up is bounded by true band matches, never n².
    */
  def bandJoin(left0: DataFrame, right0: DataFrame, key: String, tsCol: String,
               lowSec: Long, highSec: Long,
               leftPrefix: String = "l_", rightPrefix: String = "r_"): DataFrame = {
    require(highSec > lowSec, s"empty band [$lowSec, $highSec]")
    val left = graft.core.Tables.ltzTs(left0, tsCol)
    val right = graft.core.Tables.ltzTs(right0, tsCol)
    val wMicros = (highSec - lowSec) * 1000000L
    val lowMicros = lowSec * 1000000L
    val l = left.select(col(key) +: left.columns.filterNot(_ == key).toSeq
      .map(c => col(c).as(leftPrefix + c)): _*)
    val r = right.select(col(key) +: right.columns.filterNot(_ == key).toSeq
      .map(c => col(c).as(rightPrefix + c)): _*)
    val rB = r.withColumn("__bucket",
      floor(unix_micros(col(rightPrefix + tsCol)) / wMicros))
    val lo = unix_micros(col(leftPrefix + tsCol)) + lit(lowMicros)
    val lB = l.withColumn("__bucket",
      explode(array_distinct(array(floor(lo / wMicros), floor((lo + wMicros) / wMicros)))))
    val band = unix_micros(col(rightPrefix + tsCol)) - unix_micros(col(leftPrefix + tsCol))
    lB.join(rB, Seq(key, "__bucket"))
      .filter(band >= lit(lowSec * 1000000L) && band <= lit(highSec * 1000000L))
      .drop("__bucket")
  }
}
