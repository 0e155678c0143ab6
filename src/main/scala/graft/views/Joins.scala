package graft.views

import org.apache.spark.sql.{Column, DataFrame}
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
}
