package graft

import org.apache.spark.sql.functions._

/** Round-12: degenerate-input hardening for the Welch/variance family —
  * the ADVICE-flagged ANSI DIVIDE_BY_ZERO scenarios (constant arms,
  * single-row arms, one-sided day windows, no-repeat entities) must
  * yield null/empty-safe rows, not crashes, and must match what the
  * DuckDB twins produce on the same input (null on zero-divide). */
class DegenerateInputSpec extends SparkSpec {
  import spark.implicits._

  test("pairwiseTestsHolm: constant and n=1 arms drop, testable pairs keep ranks") {
    // a,b constant (z: 0/0), c single-row (var null), d,e testable
    val df = Seq(
      ("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0), ("c", 1.0),
      ("d", 1.0), ("d", 2.0), ("d", 3.0),
      ("e", 10.0), ("e", 11.0), ("e", 12.0)
    ).toDF("g", "v")
    val out = graft.eda.MultipleTesting
      .pairwiseTestsHolm(df, "g", "v").collect()
    // untestable pairs (null p) are dropped entirely
    assert(out.forall(r => !r.isNullAt(r.fieldIndex("p_value"))))
    // the testable pairs survive with contiguous ranks from 1
    val ranks = out.map(_.getAs[Int]("holm_rank")).sorted.toSeq
    assert(ranks == (1 to ranks.size).toSeq)
    assert(out.exists(r => r.getAs[String]("group_a") == "d" &&
      r.getAs[String]("group_b") == "e"))
    // constant-vs-constant with EQUAL means is 0/0 → dropped, not ±inf
    assert(!out.exists(r => r.getAs[String]("group_a") == "a" &&
      r.getAs[String]("group_b") == "b"))
  }

  test("pairwiseTestsBH: same degenerate arms, same null-drop") {
    val df = Seq(
      ("a", 5.0), ("a", 5.0), ("b", 1.0),
      ("d", 1.0), ("d", 2.0), ("e", 10.0), ("e", 11.0)
    ).toDF("g", "v")
    val out = graft.eda.MultipleTesting.pairwiseTestsBH(df, "g", "v")
      .collect()
    assert(out.forall(r => !r.isNullAt(r.fieldIndex("p_value"))))
    // pairs touching single-row b drop (null variance ⇒ null divisor);
    // constant-a vs a VARYING arm keeps a positive divisor and stays
    assert(out.map(r => (r.getAs[String]("group_a"),
      r.getAs[String]("group_b"))).toSet ==
      Set(("a", "d"), ("a", "e"), ("d", "e")))
  }

  test("weekendLift: all-weekday window yields nulls, not a crash") {
    // Mon 2024-01-15 .. Fri 2024-01-19 — zero weekend days
    val df = (15 to 19).map(d =>
      (s"2024-01-$d 12:00:00", 10.0 + d)).toDF("ts", "value")
      .select(col("ts").cast("timestamp").as("ts"), col("value"))
    val r = graft.operators.Reporting.weekendLift(df, "ts", "value").head()
    assert(r.getAs[Long]("n_weekend") == 0L)
    assert(r.getAs[Long]("n_weekday") == 5L)
    assert(r.isNullAt(r.fieldIndex("mean_weekend")))
    assert(r.isNullAt(r.fieldIndex("lift")))
    assert(r.isNullAt(r.fieldIndex("t_stat")))
    // exactly ONE weekend day: variance of one sample is null → null t
    val one = df.union(Seq(("2024-01-20 12:00:00", 99.0))
      .toDF("ts", "value")
      .select(col("ts").cast("timestamp").as("ts"), col("value")))
    val r1 = graft.operators.Reporting.weekendLift(one, "ts", "value").head()
    assert(r1.getAs[Long]("n_weekend") == 1L)
    assert(r1.getAs[Double]("mean_weekend") == 99.0)
    assert(r1.isNullAt(r1.fieldIndex("t_stat")))
  }

  test("varianceRatio + tostEquivalence: single-row and constant arms → nulls") {
    val df = Seq(("A", 1.0), ("B", 2.0), ("B", 2.0)).toDF("arm", "v")
    val vr = graft.eda.StatTests
      .varianceRatio(df, "arm", "v", "A", "B").head()
    assert(vr.isNullAt(vr.fieldIndex("var_a"))) // n=1 arm
    assert(vr.getAs[Double]("var_b") == 0.0)    // constant arm
    assert(vr.isNullAt(vr.fieldIndex("f_stat")))
    val to = graft.ml.Experiments
      .tostEquivalence(df, "arm", "v", "A", "B", margin = 0.5).head()
    assert(to.isNullAt(to.fieldIndex("se")))
    assert(to.isNullAt(to.fieldIndex("t_lower")))
    // both arms constant, n>1: se = 0 → null t's, not DIVIDE_BY_ZERO
    val const = Seq(("A", 3.0), ("A", 3.0), ("B", 3.0), ("B", 3.0))
      .toDF("arm", "v")
    val tc = graft.ml.Experiments
      .tostEquivalence(const, "arm", "v", "A", "B", margin = 0.5).head()
    assert(tc.getAs[Double]("se") == 0.0)
    assert(tc.isNullAt(tc.fieldIndex("t_lower")))
  }

  test("reorderGaps: no entity with two orders → one all-null-gap row") {
    val df = Seq((1L, "2024-01-01"), (2L, "2024-01-02"))
      .toDF("e", "d").select(col("e"), col("d").cast("date").as("d"))
    val r = graft.operators.Events.reorderGaps(df, "e", "d").head()
    assert(r.getAs[Long]("n_entities") == 0L)
    assert(r.isNullAt(r.fieldIndex("n_gaps")))
    assert(r.isNullAt(r.fieldIndex("p50_days")))
  }

  test("winsorizedCorr: empty and single-pair inputs are null-safe") {
    val empty = Seq.empty[(Double, Double)].toDF("x", "y")
    val re = graft.eda.Robust.winsorizedCorr(empty, "x", "y").head()
    assert(re.getAs[Long]("n") == 0L)
    assert(re.isNullAt(re.fieldIndex("r_raw")))
    val one = Seq((1.0, 2.0)).toDF("x", "y")
    val r1 = graft.eda.Robust.winsorizedCorr(one, "x", "y").head()
    assert(r1.getAs[Long]("n") == 1L)
    assert(r1.isNullAt(r1.fieldIndex("r_winsorized")))
  }

  test("ksUniform: out-of-range mass is reported, not silently dropped") {
    val df = (1 to 8).map(_ / 10.0).toDF("v")
      .union(Seq(5.0, -2.0).toDF("v")) // 2 outside [0, 1]
    val r = graft.eda.StatTests.ksUniform(df, "v", 0.0, 1.0).head()
    assert(r.getAs[Long]("n") == 8L)
    assert(r.getAs[Long]("n_excluded") == 2L)
  }
}
