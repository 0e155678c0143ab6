package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands interval algebra: collapse a bag of (possibly
  * overlapping) per-key intervals into maximal disjoint "islands" and
  * report coverage — the classic warehouse question (machine uptime,
  * shipment-in-transit coverage, user-session overlap) that the
  * point-event sessionizer (`operators/Events.sessionStats`, q138) and
  * the interval JOIN (`operators/IntervalJoin`, q168) both skirt:
  * those consume points or pair up intervals; this one merges them.
  */
object Intervals {

  /** Per-key union of CLOSED numeric intervals [start, end] (touching
    * endpoints merge; rows with end < start or nulls are dropped).
    * The standard one-sort kernel: inside each key, sorted by
    * (start, end), an island opens where start exceeds the running
    * max of all previous ends; the island id is the running count of
    * opens, and islands aggregate to (min start, max end).
    *
    * Scale shape: both windows partition BY THE KEY — one shuffle of
    * the interval frame, no self-join, no unpartitioned window; skew
    * rides the key distribution exactly like any keyed window (salt
    * upstream if one key owns the corpus). Returns one row per key:
    * (key, n_intervals, n_islands, covered_len, max_island_len,
    * max_gap_len) — lengths as doubles 6dp, gaps between consecutive
    * islands (null when a single island). */
  def coalesceIntervals(df: DataFrame, keyCol: String, startCol: String,
                        endCol: String): DataFrame = {
    val s = col(startCol).cast("double")
    val e = col(endCol).cast("double")
    val iv = df.filter(s.isNotNull && e.isNotNull && e >= s)
      .select(col(keyCol).as("key"), s.as("s"), e.as("e"))
    val wPrev = Window.partitionBy("key").orderBy("s", "e")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy("key").orderBy("s", "e")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = iv
      .withColumn("__pmax", max("e").over(wPrev))
      .withColumn("__new",
        when(col("__pmax").isNull || col("s") > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("__isl", sum("__new").over(wCum))
    val islands = flagged.groupBy("key", "__isl").agg(
      count(lit(1)).as("__n"),
      min("s").as("__lo"), max("e").as("__hi"))
    val wIsl = Window.partitionBy("key").orderBy("__isl")
    val gapped = islands
      .withColumn("__gap", col("__lo") - lag("__hi", 1).over(wIsl))
    gapped.groupBy("key").agg(
      sum("__n").as("n_intervals"),
      count(lit(1)).as("n_islands"),
      round(sum(col("__hi") - col("__lo")), 6).as("covered_len"),
      round(max(col("__hi") - col("__lo")), 6).as("max_island_len"),
      round(max("__gap"), 6).as("max_gap_len"))
  }

  /** DuckDB twin of [[coalesceIntervals]]; `ivCte` must yield
    * (key, s, e) numeric. */
  def coalesceIntervalsOracleSql(ivCte: String): String =
    s"""WITH iv0 AS ($ivCte),
        iv AS (SELECT key, CAST(s AS DOUBLE) AS s, CAST(e AS DOUBLE) AS e
          FROM iv0 WHERE s IS NOT NULL AND e IS NOT NULL AND e >= s),
        f AS (SELECT key, s, e,
            CASE WHEN MAX(e) OVER (PARTITION BY key ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              IS NULL OR s > MAX(e) OVER (PARTITION BY key ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            THEN 1 ELSE 0 END AS newf
          FROM iv),
        isl AS (SELECT key, s, e,
            SUM(newf) OVER (PARTITION BY key ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          FROM f),
        g AS (SELECT key, island, COUNT(*) AS n,
            MIN(s) AS lo, MAX(e) AS hi
          FROM isl GROUP BY key, island),
        gp AS (SELECT key, island, n, lo, hi,
            lo - LAG(hi) OVER (PARTITION BY key ORDER BY island) AS gap
          FROM g)
        SELECT key, CAST(SUM(n) AS BIGINT) AS n_intervals,
          COUNT(*) AS n_islands,
          ROUND(SUM(hi - lo), 6) AS covered_len,
          ROUND(MAX(hi - lo), 6) AS max_island_len,
          ROUND(MAX(gap), 6) AS max_gap_len
        FROM gp GROUP BY key"""
}
