package graft

import graft.api.{Catalog, Contests}
import org.apache.spark.sql.functions._

/** Contest ranking/report/promotion over the Reports store
  * (utils/model_comparison.py, utils/contest_utils.py,
  * batch/models/model_promotion.py). */
class ContestsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture() = {
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft-contest").toString)
    val df = (1 to 40).map(i => (i.toLong, i.toDouble, 2.0 * i + 1))
      .toDF("id", "x", "y")
    // exact, slightly-off, and badly-off formula models
    val champ = cat.onboardFormulaModel("champ", 2.0, Seq("x" -> 2.0), target = "y")
    val good = cat.onboardFormulaModel("good", 1.0, Seq("x" -> 2.0), target = "y")
    val bad = cat.onboardFormulaModel("bad", 9.0, Seq("x" -> 2.0), target = "y")
    Seq(champ, good, bad).foreach(m =>
      m.toEndpoint(m.name + "-end").inference(df, Some("run1"), Some("id")))
    (cat, champ, good, bad)
  }

  test("rankModels orders regressors by rmse; contestReport shapes the table") {
    val (cat, champ, good, bad) = fixture()
    val ranked = Contests.rankModels(Seq(bad, good), "run1")
    assert(ranked.map(_._1) == Seq("good", "bad")) // rmse 0 < 7
    val report = Contests.contestReport(champ, Seq(good, bad), "champ-end", "run1").get
    val rows = report.collect()
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("champion", "challenger", "challenger"))
    assert(rows.map(_.getString(0)).toSeq == Seq("champ", "good", "bad"))
    // champion deltas are 0; 'good' beats champ by rmse 1 (lower-is-better)
    val dRmse = report.columns.indexOf("d_rmse")
    assert(rows(0).getDouble(dRmse) == 0.0)
    assert(rows(1).getDouble(dRmse) == 1.0) // champ rmse 1, good rmse 0
    assert(rows.forall(_.getBoolean(report.columns.indexOf("contested"))))
    // publish + membership lookup
    Contests.publish(cat, "champ-end", report)
    val hits = Contests.findContests(cat, "good")
    assert(hits == Seq(("contests/champ-end", "challenger", "champ-end")))
  }

  test("promoteIfBetter re-points the endpoint at a winning challenger") {
    val (cat, champ, good, bad) = fixture()
    val ep = cat.endpoint("champ-end")
    assert(ep.modelName == "champ")
    val promoted = Contests.promoteIfBetter(ep, Seq(good, bad), "run1")
    assert(promoted.contains("good"))
    assert(cat.endpoint("champ-end").modelName == "good")
    // published report exists with the NEW champion first
    val rep = cat.reports.get("contests/champ-end")
    assert(rep.filter(col("role") === "champion").head().getString(0) == "good")
    // a second arbiter pass with only worse challengers keeps the champion
    assert(Contests.promoteIfBetter(cat.endpoint("champ-end"), Seq(bad), "run1").isEmpty)
    assert(cat.endpoint("champ-end").modelName == "good")
  }
}
