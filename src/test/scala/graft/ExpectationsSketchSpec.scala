package graft

import graft.eda.{Expectations, GroupStats, Sketches}
import org.apache.spark.sql.functions._

/** Wave-7 kernels: expectations suite, group quantiles, HLL shard
  * sketches. */
class ExpectationsSketchSpec extends SparkSpec {
  import spark.implicits._

  test("expectations: each check counts its violations; suite is one job") {
    import Expectations._
    val df = Seq(
      (Some(1L), Some("A"), Some(0.05), "key1"),
      (Some(2L), Some("X"), Some(0.50), "key2"), // bad flag, out of range
      (None, Some("N"), None, "key2"),           // null id, dup key
      (Some(2L), None, Some(-0.1), "key3")       // below range
    ).toDF("id", "flag", "disc", "k")
    val out = validate(df, Seq(
      NotNull("id"),
      Unique(Seq("k")),
      AcceptedValues("flag", Seq("A", "N", "R")),
      InRange("disc", 0.0, 0.1)))
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("not_null") === ((1L, false)))
    assert(out("unique") === ((1L, false)))        // key2 appears twice
    assert(out("accepted_values") === ((1L, false)))
    assert(out("in_range") === ((2L, false)))
  }

  test("expectations: unique skips NULL tuples; clean table passes") {
    import Expectations._
    val df = Seq(Some("a"), Some("b"), None, None).toDF("k")
    val out = validate(df, Seq(Unique(Seq("k")), NotNull("k"))).collect()
    val unique = out.find(_.getString(0) == "unique").get
    assert(unique.getLong(2) === 0L && unique.getBoolean(3))
  }

  test("groupQuantiles: interpolated per-group values match direct compute") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", 20.0)).toDF("g", "x")
    val q = GroupStats.groupQuantiles(df, "g", "x", Seq(0.5))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(q("a") === 2.5) // (2+3)/2 linear interpolation
    assert(q("b") === 15.0)
  }

  test("hll shards: union estimate within 5% of exact; merge = rescan") {
    val df = (1 to 100000)
      .map(i => (s"shard${i % 8}", (i % 20000).toLong)).toDF("shard", "uid")
    val sketches = Sketches.shardSketches(df, "shard", "uid")
    assert(sketches.count() === 8)
    val est = Sketches.unionEstimate(sketches).head()
    assert(est.getLong(0) === 8L && est.getLong(1) === 100000L)
    val exact = 20000.0
    assert(math.abs(est.getLong(2) - exact) / exact < 0.05,
      s"estimate ${est.getLong(2)} vs exact $exact")
    // merging persisted shard sketches == sketching the whole corpus
    val whole = df.agg(hll_sketch_estimate(
      hll_sketch_agg(col("uid"), lit(12))).cast("long")).head().getLong(0)
    assert(est.getLong(2) === whole)
  }

  test("hll shards: per-shard estimates are close to per-shard exact") {
    val df = (1 to 20000).map(i => (s"s${i % 2}", i.toLong)).toDF("shard", "uid")
    val perShard = Sketches.shardEstimates(
      Sketches.shardSketches(df, "shard", "uid"), "shard")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(math.abs(perShard("s0") - 10000.0) / 10000.0 < 0.05)
    assert(math.abs(perShard("s1") - 10000.0) / 10000.0 < 0.05)
  }
}
