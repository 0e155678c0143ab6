package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join: pair rows whose [start, end] ranges intersect
  * (log spans vs incident windows, session ranges vs campaign windows,
  * genomic intervals) — the third member of the temporal-join family
  * next to the as-of and band joins (views/Joins.scala).
  *
  * Grid blocking: both sides explode each interval onto a fixed-width
  * bucket grid; overlapping intervals share at least one bucket, so the
  * join is an EQUI-join on (key, bucket) + the exact overlap predicate.
  * The same pair can meet in several buckets, so matches are attributed
  * to ONE bucket — the first the overlap itself touches:
  * bucket == floor(max(l.start, r.start) / width) — making the output
  * exact with no distinct pass (the bandJoin dedup-free trick,
  * generalized to two-sided intervals).
  *
  * Scale: one shuffle per side on (key, bucket); fan-out per row =
  * interval_length/width + 1, so pick `widthSec` near the typical
  * interval length. Pair blow-up is bounded by true overlaps per
  * bucket — a hot bucket means genuinely-overlapping data, the usual
  * salting answer applies.
  */
object IntervalJoin {

  def overlapJoin(left0: DataFrame, right0: DataFrame, key: String,
                  startCol: String, endCol: String, widthSec: Long,
                  leftPrefix: String = "l_", rightPrefix: String = "r_"): DataFrame = {
    require(widthSec > 0)
    val w = widthSec * 1000000L
    def prep(df0: DataFrame, prefix: String): DataFrame = {
      val df = graft.core.Tables.ltzTs(
        graft.core.Tables.ltzTs(df0, startCol), endCol)
      df.select(col(key) +: df.columns.filterNot(_ == key).toSeq
        .map(c => col(c).as(prefix + c)): _*)
    }
    def micros(c: Column): Column = unix_micros(c)
    val l = prep(left0, leftPrefix).withColumn("__bucket",
      explode(sequence(
        floor(micros(col(leftPrefix + startCol)) / w),
        floor(micros(col(leftPrefix + endCol)) / w))))
    val r = prep(right0, rightPrefix).withColumn("__bucket",
      explode(sequence(
        floor(micros(col(rightPrefix + startCol)) / w),
        floor(micros(col(rightPrefix + endCol)) / w))))
    val overlaps =
      micros(col(leftPrefix + startCol)) <= micros(col(rightPrefix + endCol)) &&
      micros(col(rightPrefix + startCol)) <= micros(col(leftPrefix + endCol))
    val anchor = floor(
      greatest(micros(col(leftPrefix + startCol)),
        micros(col(rightPrefix + startCol))) / w)
    l.join(r, Seq(key, "__bucket"))
      .filter(overlaps && col("__bucket") === anchor)
      .drop("__bucket")
  }
}
