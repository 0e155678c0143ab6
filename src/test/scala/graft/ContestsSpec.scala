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

  test("contestSummary: per-contest row with champion, counts and recency") {
    val (cat, champ, good, bad) = fixture()
    val report = Contests.contestReport(champ, Seq(good, bad), "champ-end", "run1").get
    Contests.publish(cat, "champ-end", report)
    val summary = Contests.contestSummary(cat)
    assert(summary.length == 1)
    val (contest, champion, challengers, endpoint, contested, recent) = summary.head
    assert(contest == "champ-end" && champion == "champ")
    assert(challengers == 2L && endpoint == "champ-end")
    assert(contested && recent) // just published → inside the 72h window
  }

  test("review: heterogeneous metric sets get null deltas, not a crash") {
    val (cat, champ, good, _) = fixture()
    // a challenger whose metrics share nothing with the champion's
    // (classifier-style columns) — deltas must be null, report intact
    val df = (1 to 30).map(i => (i.toLong, i.toDouble, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "x", "label")
    val cls = cat.toModel( {
      cat.onboard("cls_src", df); "cls_src" }, "cls_m", "classifier",
      target = "label", features = Seq("x"))
    cls.toEndpoint("cls-end").inference(df, Some("run1"), Some("id"))
    val rep = Contests.contestReport(champ, Seq(good, cls), "champ-end", "run1").get
    val rows = rep.collect()
    assert(rows.length == 3)
    val clsRow = rows.find(_.getString(0) == "cls_m").get
    // regressor metric columns are null for the classifier row
    assert(clsRow.isNullAt(rep.columns.indexOf("rmse")))
    assert(clsRow.isNullAt(rep.columns.indexOf("d_rmse")))
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
    // review: challengers WITHOUT metrics still publish a champion-only
    // report rather than silently skipping the publish
    val fresh = cat.onboardFormulaModel("fresh", 0.0, Seq("x" -> 1.0), target = "y")
    cat.reports.delete("contests/champ-end")
    assert(Contests.promoteIfBetter(cat.endpoint("champ-end"), Seq(fresh), "run1").isEmpty)
    val solo = cat.reports.get("contests/champ-end")
    assert(solo.count() == 1)
    assert(solo.head().getAs[String]("role") == "champion")
  }

  test("review: challenger-only metrics survive into the report columns") {
    val (cat, champ, good, _) = fixture()
    // classifier challenger in a regressor contest: its f1/accuracy must
    // appear as report columns (challenger-led union), not be dropped
    // because the champion's row lacks them
    val df = (1 to 30).map(i => (i.toLong, i.toDouble, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "x", "label")
    val cls = cat.toModel( {
      cat.onboard("cls_src2", df); "cls_src2" }, "cls_m2", "classifier",
      target = "label", features = Seq("x"))
    cls.toEndpoint("cls-end2").inference(df, Some("run1"), Some("id"))
    val rep = Contests.contestReport(champ, Seq(good, cls), "champ-end", "run1").get
    assert(rep.columns.contains("f1"), rep.columns.mkString(","))
    val clsRow = rep.collect().find(_.getString(0) == "cls_m2").get
    assert(!clsRow.isNullAt(rep.columns.indexOf("f1")))
    // champion lacks f1 → its f1 cell and the delta are null
    val champRow = rep.collect().find(_.getString(0) == "champ").get
    assert(champRow.isNullAt(rep.columns.indexOf("f1")))
  }

  test("review: a zero-primary champion is not contested") {
    val (cat, _, good, bad) = fixture()
    // 'good' has rmse == 0 (exact formula) — with it as champion the
    // reference's champ_value==0 guard says NOT contested, however much
    // better/worse the challengers are
    val rep = Contests.contestReport(good, Seq(bad), "good-end", "run1").get
    assert(rep.collect().forall(!_.getBoolean(rep.columns.indexOf("contested"))))
  }

  test("review: promotion metric keys follow the best challenger's type") {
    val (cat, champ, good, _) = fixture()
    // classifier pool contesting a regressor endpoint: beats() must
    // compare f1 (the winner's family), not rmse/mae
    val df = (1 to 40).map(i => (i.toLong, i.toDouble, if (i <= 20) "a" else "b"))
      .toDF("id", "x", "label")
    val cls = cat.toModel( {
      cat.onboard("cls_src3", df); "cls_src3" }, "cls_m3", "classifier",
      target = "label", features = Seq("x"))
    cls.toEndpoint("cls-end3").inference(df, Some("run1"), Some("id"))
    val ep = cat.endpoint("champ-end")
    // incumbent (regressor) has no f1 → beats() with classifier keys and
    // no incumbent f1 evidence must NOT promote; with the old
    // incumbent-derived flag this compared rmse and also blocked — the
    // observable difference is in the mixed pool below
    val promoted = Contests.promoteIfBetter(ep, Seq(cls), "run1")
    assert(promoted.isEmpty)
    assert(cat.endpoint("champ-end").modelName == "champ")
  }
}
