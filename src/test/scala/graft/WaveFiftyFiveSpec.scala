package graft

/** Round-12 wave 55: M4 downsampling, LOCF time-weighted average,
  * DAU/MAU stickiness, GROUPING SETS marginals (q507–q510). */
class WaveFiftyFiveSpec extends SparkSpec {
  import spark.implicits._

  test("m4: open/close by time order, min/max exact, tie-break by ord") {
    val ev = Seq(
      ("a", "2024-01-01 10:05:00", 1L, 5.0),
      ("a", "2024-01-01 10:10:00", 2L, 9.0),
      ("a", "2024-01-01 10:20:00", 3L, 1.0),
      ("a", "2024-01-01 10:20:00", 4L, 7.0), // same ts: ord 4 is close
      ("a", "2024-01-01 11:00:00", 5L, 2.0)
    ).toDF("event_type", "tss", "event_id", "value")
      .selectExpr("event_type", "CAST(tss AS TIMESTAMP) AS ts",
        "event_id", "value")
    val r = graft.operators.Downsample
      .m4(ev, "event_type", "ts", "event_id", "value")
      .collect().map(x => x.getAs[String]("bucket") -> x).toMap
    val h10 = r("2024-01-01 10:00")
    assert(h10.getAs[Long]("n") == 4)
    assert(h10.getAs[Double]("v_open") == 5.0)
    assert(h10.getAs[Double]("v_close") == 7.0) // ord tie-break
    assert(h10.getAs[Double]("v_low") == 1.0)
    assert(h10.getAs[Double]("v_high") == 9.0)
    assert(r("2024-01-01 11:00").getAs[Double]("v_open") == 2.0)
  }

  test("twa: LOCF integral across day buckets equals the flat window") {
    // events straddle a day boundary: value 10 holds 12h (entirely a
    // cross-bucket gap), value 20 holds 12h -> twa 15, mean 10
    val ev = Seq(
      ("m", "2024-01-01 18:00:00", 1L, 10.0),
      ("m", "2024-01-02 06:00:00", 2L, 20.0),
      ("m", "2024-01-02 18:00:00", 3L, 0.0)
    ).toDF("event_type", "tss", "event_id", "value")
      .selectExpr("event_type", "CAST(tss AS TIMESTAMP) AS ts",
        "event_id", "value")
    val r = graft.operators.TimeWeighted
      .timeWeightedAvg(ev, "event_type", "ts", "event_id", "value")
      .collect().head
    assert(r.getAs[Long]("n_events") == 3)
    assert(r.getAs[Long]("span_us") == 24L * 3600 * 1000000)
    assert(r.getAs[Double]("twa") == 15.0)
    assert(r.getAs[Double]("mean_value") == 10.0)
    // single-event key: zero span -> null twa
    val one = Seq(("x", "2024-01-01 00:00:00", 1L, 5.0))
      .toDF("event_type", "tss", "event_id", "value")
      .selectExpr("event_type", "CAST(tss AS TIMESTAMP) AS ts",
        "event_id", "value")
    val r1 = graft.operators.TimeWeighted
      .timeWeightedAvg(one, "event_type", "ts", "event_id", "value")
      .collect().head
    assert(r1.isNullAt(r1.fieldIndex("twa")))
  }

  test("stickiness: user-day cells over months") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 11:00:00"), // dup day
      (1L, "2024-01-02 10:00:00"), (2L, "2024-01-02 10:00:00"),
      (2L, "2024-02-01 10:00:00")
    ).toDF("user_id", "tss")
      .selectExpr("user_id", "CAST(tss AS TIMESTAMP) AS ts")
    val r = graft.operators.Cohorts.stickiness(ev, "user_id", "ts")
      .collect().map(x => x.getAs[String]("month") -> x).toMap
    val jan = r("2024-01-01")
    assert(jan.getAs[Long]("n_days") == 2)
    assert(jan.getAs[Long]("mau") == 2)
    assert(jan.getAs[Long]("user_days") == 3)
    assert(jan.getAs[Double]("avg_dau") == 1.5)
    assert(jan.getAs[Double]("stickiness") == 0.75)
    assert(r("2024-02-01").getAs[Double]("stickiness") == 1.0)
  }

  test("marginals: grouping-set levels with no cross cells") {
    val df = Seq(
      ("A", "F", 1.0), ("A", "O", 2.0), ("B", "F", 4.0)
    ).toDF("d1", "d2", "v")
    val r = graft.operators.Reporting.marginals(df, "d1", "d2", "v")
      .collect()
    assert(r.length == 5) // 2 d1 rows + 2 d2 rows + grand total
    val byKey = r.map(x => (x.getAs[Int]("lvl"),
      x.getAs[String]("d1"), x.getAs[String]("d2")) -> x).toMap
    assert(byKey((1, "A", "ALL")).getAs[Double]("total") == 3.0)
    assert(byKey((2, "ALL", "F")).getAs[Double]("total") == 5.0)
    assert(byKey((3, "ALL", "ALL")).getAs[Long]("n") == 3)
  }
}
