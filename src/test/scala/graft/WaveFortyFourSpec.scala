package graft

import graft.dedup.Dedup
import graft.eda.Association
import graft.ml.EvalExtras
import graft.operators.{Cohorts, Reporting}
import graft.text.CorpusStats

/** Wave-44 kernels: MI matrix, cohort LTV, partial AUC, dedup
  * savings, position attribution, novelty curve. */
class WaveFortyFourSpec extends SparkSpec {
  import spark.implicits._

  test("miMatrix: identical columns carry ln 2, independent carry 0") {
    val dep = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"))
      .toDF("a", "b")
    val r = Association.miMatrix(dep, Seq("a", "b")).head()
    assert(r.getAs[Double]("mi") === 0.693147) // ln 2
    val ind = Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "y"))
      .toDF("a", "b")
    assert(Association.miMatrix(ind, Seq("a", "b"))
      .head().getAs[Double]("mi") === 0.0)
  }

  test("cohortLtv: cumulative per-user value by cohort and offset") {
    val df = Seq((1L, "2024-01-01", 10.0), (1L, "2024-01-08", 20.0),
      (2L, "2024-01-01", 30.0))
      .map { case (u, d, v) =>
        (u, java.sql.Timestamp.valueOf(d + " 12:00:00"), v) }
      .toDF("user_id", "ts", "value")
    val r = Cohorts.cohortLtv(df, "user_id", "ts", "value").collect()
    assert(r.length === 2)
    val off0 = r.find(_.getAs[Long]("week_offset") == 0L).get
    assert(off0.getAs[Long]("n_cohort") === 2L)
    assert(off0.getAs[Long]("n_active") === 2L)
    assert(off0.getAs[Double]("value") === 40.0)
    assert(off0.getAs[Double]("cum_ltv") === 20.0)
    val off1 = r.find(_.getAs[Long]("week_offset") == 1L).get
    assert(off1.getAs[Long]("n_active") === 1L)
    assert(off1.getAs[Double]("cum_ltv") === 30.0) // 60 / 2 users
  }

  test("partialAuc: only whole steps inside the FPR cap count") {
    val df = (Seq.fill(2)((0.9, 1)) ++ Seq((0.5, 1), (0.5, 0)) ++
      Seq.fill(8)((0.1, 0))).toDF("s", "y")
    val r = EvalExtras.partialAuc(df, "s", "y", maxFprPct = 20).head()
    assert(r.getAs[Long]("n") === 12L)
    assert(r.getAs[Long]("n_pos") === 3L)
    assert(r.getAs[Double]("achieved_fpr") === 0.111111) // 1/9
    assert(r.getAs[Double]("pauc") === 0.092593)         // 5/54
    assert(r.getAs[Double]("pauc_norm") === 0.833333)    // 45/54
  }

  test("dedupSavings: tokens shed by keep-first exact dedup") {
    val df = Seq((1L, "a", "x y"), (2L, "a", "x y"), (3L, "b", "z"))
      .toDF("id", "src", "text")
    val r = Dedup.dedupSavings(df, "id", "text", "src").collect()
    val a = r.find(_.getString(0) == "a").get
    assert(a.getAs[Long]("n_tokens") === 4L)
    assert(a.getAs[Long]("tokens_removed") === 2L)
    assert(a.getAs[Double]("savings") === 0.5)
    assert(r.find(_.getString(0) == "b").get
      .getAs[Long]("tokens_removed") === 0L)
  }

  test("positionAttribution: U-shaped 40/20/40 with edge journeys") {
    val rows = Seq(
      (1L, 10L, "2024-01-01 10:00:00", "click"),
      (1L, 11L, "2024-01-02 10:00:00", "view"),
      (1L, 12L, "2024-01-03 10:00:00", "signup"),
      (1L, 13L, "2024-01-04 10:00:00", "purchase"),
      (2L, 20L, "2024-01-01 10:00:00", "view"),
      (2L, 21L, "2024-01-02 10:00:00", "purchase"),
      (3L, 30L, "2024-01-05 10:00:00", "purchase"))
      .map { case (u, id, d, t) =>
        (u, id, java.sql.Timestamp.valueOf(d), t, 1.0) }
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val r = Reporting.positionAttribution(rows, "user_id", "ts",
      "event_type", "event_id", "purchase",
      Seq("click", "view", "signup")).collect()
    val byT = r.map(x => x.getString(0) -> x.getAs[Double]("credits"))
      .toMap
    assert(byT("click") === 0.4)
    assert(byT("signup") === 0.4)
    assert(byT("view") === 1.2)   // 0.2 middle + 1.0 solo journey
    assert(byT("(none)") === 1.0)
  }

  test("noveltyCurve: later buckets score only their unseen shingles") {
    val df = Seq((1L, "a b c"), (2L, "a b c x y z"))
      .toDF("doc_id", "text")
    val r = CorpusStats.noveltyCurve(df, "doc_id", "text",
      n = 3, grid = 2).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
      === Seq((0L, 1L, 1L), (1L, 4L, 3L)))
    assert(r(1).getAs[Double]("novelty") === 0.75)
  }
}
