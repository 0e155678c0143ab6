package graft

import graft.core.Tables
import graft.views.Joins
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of and band (range) joins — the two time-series join shapes Spark
  * has no operator for, implemented shuffle-once (as-of) and binned
  * (band) so neither can produce a nested-loop/cartesian plan.
  */
class AsOfBandJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin: backward match, inclusive tie, null when no prior row") {
    val left = Seq(
      (1L, ts("2024-01-01 00:00:10"), "a"),
      (1L, ts("2024-01-01 00:00:20"), "b"),
      (1L, ts("2024-01-01 00:00:05"), "c"), // before any right row
      (2L, ts("2024-01-01 00:00:30"), "d")
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:10"), 100.0), // tie with left "a" → matches
      (1L, ts("2024-01-01 00:00:15"), 200.0),
      (2L, ts("2024-01-01 00:00:01"), 300.0)
    ).toDF("k", "ts", "v")
    val out = Joins.asofJoin(left, right, "k", "ts", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(out("a").contains(100.0)) // inclusive at equal ts
    assert(out("b").contains(200.0)) // most recent prior, not first
    assert(out("c").isEmpty)         // nothing at or before
    assert(out("d").contains(300.0))
  }

  test("asofJoin: NULL payload in the matched row stays NULL (no torn match)") {
    val left = Seq((1L, ts("2024-01-01 00:00:12"), "l")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:05"), Some(7.0)),
      (1L, ts("2024-01-01 00:00:10"), None: Option[Double]) // matched row, v NULL
    ).toDF("k", "ts", "v")
    val out = Joins.asofJoin(left, right, "k", "ts", Seq("v"))
      .select("asof_ts", "asof_v")
      .as[(java.sql.Timestamp, Option[Double])].head()
    assert(out._1.toString.startsWith("2024-01-01 00:00:10")) // newest row matched
    assert(out._2.isEmpty) // its NULL v must NOT fall through to 7.0
  }

  test("asofJoin: tolerance is micros-precise, not whole-second truncated") {
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10.9"), "l"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 00:00:01"), 1.0)).toDF("k", "ts", "v")
    // true lag is 9.9s: a 9s tolerance must null it (second-truncation
    // would wrongly keep it), a 10s tolerance keeps it
    val tight = Joins.asofJoin(left, right, "k", "ts", Seq("v"), toleranceSec = Some(9))
    val loose = Joins.asofJoin(left, right, "k", "ts", Seq("v"), toleranceSec = Some(10))
    assert(tight.select("asof_v").as[Option[Double]].head().isEmpty)
    assert(loose.select("asof_v").as[Option[Double]].head().contains(1.0))
  }

  test("asofJoin: tolerance nulls out stale matches") {
    val left = Seq((1L, ts("2024-01-01 00:10:00"), "late")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "ts", "v")
    val loose = Joins.asofJoin(left, right, "k", "ts", Seq("v"), toleranceSec = Some(601))
    val tight = Joins.asofJoin(left, right, "k", "ts", Seq("v"), toleranceSec = Some(599))
    assert(loose.select("asof_v").as[Option[Double]].head().contains(1.0))
    assert(tight.select("asof_v").as[Option[Double]].head().isEmpty)
  }

  test("asofJoin matches the naive window-free formulation on real events") {
    val ev = Tables.load(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
    val fast = Joins.asofJoin(purchases, clicks, "user_id", "ts", Seq("click_id"))
      .select("event_id", "asof_click_id")
    // naive: all (purchase, prior click) pairs → keep the latest click
    val naive = purchases.as("p")
      .join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") && col("p.ts") >= col("c.ts"), "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("p.event_id")).orderBy(col("c.ts").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("p.event_id"), col("c.click_id").as("asof_click_id"))
    assert(fast.count() === purchases.count())
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("asofJoin plan: one exchange on the key, no join operator at all") {
    val ev = Tables.load(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val plan = Joins.asofJoin(purchases, clicks, "user_id", "ts", Seq("click_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
    assert(plan.contains("hashpartitioning(user_id"))
    assert(!plan.contains("SinglePartition"))
  }

  test("bandJoin equals the naive inequality join, boundaries inclusive") {
    val ev = Tables.load(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val e = ev.filter(col("event_type") === "error").select("user_id", "ts", "value")
    val fast = Joins.bandJoin(p, e, "user_id", "ts", -600, 0, "p_", "e_")
      .select("p_event_id", "e_ts")
    val naive = p.as("p").join(e.as("e"),
        col("p.user_id") === col("e.user_id") &&
          col("e.ts") >= col("p.ts") - expr("INTERVAL 600 SECONDS") &&
          col("e.ts") <= col("p.ts"))
      .select(col("p.event_id").as("p_event_id"), col("e.ts").as("e_ts"))
    assert(fast.count() > 0) // band is non-degenerate on this data
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("bandJoin: exact boundary rows are kept on both ends") {
    val l = Seq((1L, ts("2024-01-01 00:10:00"), "p")).toDF("k", "ts", "tag")
    val r = Seq(
      (1L, ts("2024-01-01 00:00:00"), "low-edge"),   // exactly ts-600
      (1L, ts("2024-01-01 00:10:00"), "high-edge"),  // exactly ts
      (1L, ts("2023-12-31 23:59:59"), "below"),
      (1L, ts("2024-01-01 00:10:01"), "above")
    ).toDF("k", "ts", "name")
    val got = Joins.bandJoin(l, r, "k", "ts", -600, 0)
      .select("r_name").as[String].collect().toSet
    assert(got === Set("low-edge", "high-edge"))
  }

  test("bandJoin plan: equi-join on (key, bucket), no nested loop") {
    val ev = Tables.load(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val e = ev.filter(col("event_type") === "error").select("user_id", "ts", "value")
    val plan = Joins.bandJoin(p, e, "user_id", "ts", -600, 0, "p_", "e_")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
    assert(plan.contains("__bucket"))
  }
}
