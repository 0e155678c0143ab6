package graft

import graft.api.Catalog
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Model + Endpoint artifact lifecycle (VERDICT r2 item 1): the
  * reference's main user journey — FeatureSet.to_model() →
  * Model.to_endpoint() → Endpoint.inference(df) with capture — must
  * survive a session restart: a NEW session pointed at the same catalog
  * root reopens the model, runs inference, and sees the captured runs,
  * metrics-in-meta, and InferenceStore rows. */
class ModelLifecycleSpec extends SparkSpec {
  import spark.implicits._

  lazy val root: String =
    java.nio.file.Files.createTempDirectory("graft-modellife").toString

  test("toModel trains, registers, and captures class labels") {
    val cat = new Catalog(spark, root)
    cat.onboardFeatures("events_fs",
      Tables.load(spark, sf, "events")
        .select("event_id", "value", "event_type")
        .filter(col("value").isNotNull),
      idColumn = "event_id")
    val m = cat.toModel("events_fs", "event_clf", "classifier",
      target = "event_type", features = Seq("value"))
    assert(m.exists && m.modelType == "classifier")
    assert(m.features == Seq("value") && m.target == "event_type")
    assert(m.classLabels.nonEmpty, "StringIndexer labels not captured")
    assert(cat.registry.get("event_clf").exists(_.artifact_type == "model"))
    assert(cat.registry.getInput("event_clf") == "events_fs")
  }

  test("regressor endpoint: inference + capture writes metrics, runs, store rows") {
    val cat = new Catalog(spark, root)
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
    val m = cat.onboardFormulaModel("price_model", 10.0,
      Seq("l_quantity" -> 2.0, "l_discount" -> -5.0), target = "l_extendedprice")
    val ep = m.toEndpoint("price-endpoint")
    assert(ep.exists && ep.modelName == "price_model")
    assert(cat.model("price_model").endpoints == Seq("price-endpoint"))

    val out = ep.inference(li, captureName = Some("test_run"),
      idColumn = Some("l_orderkey"))
    // prediction is the exact formula; residuals appended
    val r = out.filter(col("l_orderkey") === out.select(min("l_orderkey"))
      .head().getLong(0)).head()
    val expected = 10.0 + 2.0 * r.getDouble(r.fieldIndex("l_quantity")) -
      5.0 * r.getDouble(r.fieldIndex("l_discount"))
    assert(math.abs(r.getDouble(r.fieldIndex("prediction")) - expected) < 1e-9)
    assert(out.columns.contains("residuals_abs"))

    // capture side-effects
    assert(m.listInferenceRuns() == Seq("test_run"))
    val mt = m.getInferenceMetrics("test_run").get.head()
    assert(!mt.isNullAt(mt.fieldIndex("rmse")))
    val meta = cat.registry.getMeta("price_model")
    assert(meta.contains("graft_metric/test_run/rmse"), s"meta=$meta")
    val stored = cat.inferenceStore.byModel("price_model")
    assert(stored.count() == li.count())
    assert(stored.filter(col("pred_value").isNull).count() == 0)
    // predictions parquet keeps id/target/prediction, drops features
    val predCols = m.getInferencePredictions("test_run").get.columns.toSeq
    assert(predCols.contains("l_orderkey") && predCols.contains("prediction"))
    assert(!predCols.contains("l_quantity"))
  }

  test("gbt/rf algos: train, meta round-trip, endpoint metrics (VERDICT r4 item 2)") {
    val cat = new Catalog(spark, root)
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
    cat.onboardFeatures("li_fs", li, idColumn = "l_orderkey")
    // GBT regressor — the reference's default XGBoost journey analogue
    val m = cat.toModel("li_fs", "gbt_price", "regressor",
      target = "l_extendedprice", features = Seq("l_quantity", "l_discount"),
      algo = "gbt")
    assert(m.algo == "gbt", "algo must be model-defining meta")
    assert(m.pipeline.get.stages.last
      .isInstanceOf[org.apache.spark.ml.regression.GBTRegressionModel])
    val ep = m.toEndpoint("gbt-endpoint")
    val out = ep.inference(li, captureName = Some("gbt_run"),
      idColumn = Some("l_orderkey"))
    assert(out.filter(col("prediction").isNull).count() == 0)
    val mt = m.getInferenceMetrics("gbt_run").get.head()
    assert(!mt.isNullAt(mt.fieldIndex("rmse")))
    // a fresh session reopens the model and sees the tree algo
    assert(new Catalog(spark, root).model("gbt_price").algo == "gbt")

    // RF classifier: labels captured, proba emitted
    cat.onboardFeatures("events_fs_rf",
      Tables.load(spark, sf, "events")
        .select("event_id", "value", "event_type")
        .filter(col("value").isNotNull),
      idColumn = "event_id")
    val c = cat.toModel("events_fs_rf", "event_rf", "classifier",
      target = "event_type", features = Seq("value"), algo = "rf")
    assert(c.algo == "rf" && c.classLabels.nonEmpty)
    assert(c.pipeline.get.stages.last
      .isInstanceOf[org.apache.spark.ml.classification.RandomForestClassificationModel])

    // unknown algo fails loud
    intercept[IllegalArgumentException] {
      graft.ml.Models.trainRegressor(li, Seq("l_quantity"), "l_extendedprice",
        algo = "xgboost")
    }
  }

  test("feature importance persists in registry meta and survives catalog reopen") {
    val cat = new Catalog(spark, root)
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_discount", "l_tax", "l_extendedprice")
    cat.onboardFeatures("li_fs_imp", li, idColumn = "l_orderkey")
    val m = cat.toModel("li_fs_imp", "rf_imp", "regressor",
      target = "l_extendedprice",
      features = Seq("l_quantity", "l_discount", "l_tax"), algo = "rf")
    // read back through a FRESH catalog handle: importances must come from
    // registry meta written at onboard time, not the live pipeline object
    val imp = new Catalog(spark, root).model("rf_imp").getFeatureImportance()
    assert(imp.isDefined, "rf model must expose feature importances")
    val rows = imp.get.orderBy("rank").collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("l_quantity", "l_discount", "l_tax"))
    // RF impurity importances are a distribution over features
    val total = rows.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-6, s"importances should sum to 1, got $total")
    assert(rows.map(_.getInt(2)).toSeq == Seq(1, 2, 3))
    // rank 1 carries the largest |importance|
    assert(rows.head.getDouble(1) == rows.map(_.getDouble(1)).max)

    // linear models expose signed coefficients, ranked by |value|
    val lm = cat.toModel("li_fs_imp", "lin_imp", "regressor",
      target = "l_extendedprice", features = Seq("l_quantity", "l_discount"))
    val lrows = lm.getFeatureImportance().get.orderBy("rank").collect()
    assert(lrows.length == 2 &&
      math.abs(lrows(0).getDouble(1)) >= math.abs(lrows(1).getDouble(1)))
  }

  test("classifier endpoint: proba expansion, label mapping, confusion matrix") {
    val cat = new Catalog(spark, root)
    val ep = cat.model("event_clf").toEndpoint("event-clf-end")
    val eval = spark.table("events_fs").limit(500)
    val out = ep.inference(eval, captureName = Some("clf_run"),
      idColumn = Some("event_id"))
    val m = cat.model("event_clf")
    // prediction mapped back to label strings, per-label proba + confidence
    assert(out.select("prediction").schema.head.dataType.typeName == "string")
    assert(m.classLabels.forall(l => out.columns.contains(s"${l}_proba")))
    assert(out.filter(col("confidence") < 0 || col("confidence") > 1).count() == 0)
    assert(m.getConfusionMatrix("clf_run").isDefined)
    val mt = m.getInferenceMetrics("clf_run").get
    assert(mt.filter(col("class") === "all").count() == 1)
    // classifier rows land as pred_label
    assert(cat.inferenceStore.byModel("event_clf")
      .filter(col("pred_label").isNull).count() == 0)
  }

  test("crossFoldInference: every row exactly once, per-fold refit, captured run") {
    val cat = new Catalog(spark, root)
    val li = Tables.load(spark, sf, "lineitem").limit(2000)
      .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
      .dropDuplicates("l_orderkey")
    // mllib path: refits the standard pipeline per fold
    cat.onboard("li_fs", li)
    val m = cat.toModel("li_fs", "li_reg", "regressor",
      target = "l_extendedprice", features = Seq("l_quantity", "l_discount"))
    val ep = m.toEndpoint("li-reg-end")
    val oof = ep.crossFoldInference(spark.table("li_fs"),
      idColumn = "l_orderkey", k = 3)
    val n = li.count()
    assert(oof.count() == n, "stitched OOF must cover every row once")
    assert(oof.select("l_orderkey").distinct().count() == n)
    assert(oof.select("fold").distinct().count() == 3)
    assert(oof.filter(col("fold") < 0 || col("fold") >= 3).count() == 0)
    assert(oof.columns.contains("residuals"))
    // captured as the full_cross_fold run with metrics-in-meta
    assert(cat.model("li_reg").listInferenceRuns().contains("full_cross_fold"))
    assert(cat.registry.getMeta("li_reg").contains("graft_metric/full_cross_fold/rmse"))
  }

  test("classifier cross-fold: per-fold indices map to LABELS before the stitch") {
    val cat = new Catalog(spark, root)
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "value", "event_type")
      .filter(col("value").isNotNull).limit(3000)
      .dropDuplicates("event_id")
    cat.onboard("events_cf_fs", ev)
    val m = cat.toModel("events_cf_fs", "ev_cf_clf", "classifier",
      target = "event_type", features = Seq("value"))
    val ep = m.toEndpoint("ev-cf-end")
    val oof = ep.crossFoldInference(spark.table("events_cf_fs"),
      idColumn = "event_id", k = 3, capture = true)
    // predictions are class LABELS (fold-local indices are incomparable)
    val preds = oof.select("prediction").distinct()
      .collect().map(_.get(0).toString).toSet
    val labels = ev.select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(labels),
      s"stitched predictions must be labels, got $preds vs $labels")
    // proba columns are label-NAMED (vector slots differ per fold)
    assert(labels.forall(l => oof.columns.contains(s"${l}_proba")))
    assert(!oof.columns.contains("pred_proba"))
    // metrics-into-meta records the 'all' summary row, not a class row
    val meta = cat.registry.getMeta("ev_cf_clf")
    val mt = cat.model("ev_cf_clf").getInferenceMetrics("full_cross_fold").get
    val allRow = mt.filter(col("class") === "all").head()
    val recorded = meta("graft_metric/full_cross_fold/support").toDouble
    assert(recorded == allRow.getAs[Long]("support").toDouble,
      "meta must carry the support-weighted 'all' row")
  }

  test("cross-fold null ids land in fold 0 instead of vanishing") {
    import graft.ml.CrossFold
    val df = Seq((Some(1L), 1.0), (Some(2L), 2.0), (None, 3.0))
      .toDF("id", "v")
    val out = CrossFold.run(df, "id", k = 2)((_, te) => te)
    assert(out.count() == 3, "null-id rows must not be dropped")
    assert(out.filter(col("id").isNull).select("fold").head().getInt(0) == 0)
    val withFoldAlready = df.withColumn("fold", lit(9))
    intercept[IllegalArgumentException] {
      CrossFold.run(withFoldAlready, "id", k = 2)((_, te) => te)
    }
  }

  test("capture CSV round-trips commas, quotes and newlines in values") {
    val root2 = java.nio.file.Files.createTempDirectory("graft-csvcap").toString
    val cat = new Catalog(spark, root2)
    val df = Seq(
      (1L, "plain", 10.0),
      (2L, "has,comma", 20.0),
      (3L, "has \"quote\"", 30.0),
      (4L, "has\nnewline", 40.0)).toDF("id", "note", "y")
    // zero-weight coef makes the string column a capture FEATURE
    // without affecting the (numeric) formula shape
    val m = cat.onboardFormulaModel("csv_m", 1.0,
      Seq("note" -> 0.0, "y" -> 2.0), target = "y2")
    val ep = m.toEndpoint("csv-end")
    ep.monitor.enableDataCapture()
    ep.inference(df, idColumn = Some("id"))
    val parsed = ep.monitor.capturedData(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("note",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("y",
        org.apache.spark.sql.types.DoubleType))))
    val notes = parsed.select("note").collect().map(_.getString(0)).toSet
    assert(notes == Set("plain", "has,comma", "has \"quote\"", "has newline"),
      notes.toString) // newline flattened to space (line-based protocol)
    assert(parsed.count() == 4)
  }

  test("Meta API + graph artifacts: typed listings, details, views, describe") {
    val cat = new Catalog(spark, root)
    // register a graph artifact alongside the existing artifact types
    val vertices = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "label")
    val edges = (1 to 9).map(i => (i.toLong, i + 1L)).toDF("src", "dst")
    cat.onboardGraph("prox_graph", vertices, edges, owner = "bob")
    val (v2, e2) = cat.graph("prox_graph")
    assert(v2.count() == 10 && e2.count() == 9)

    val meta = cat.meta
    assert(meta.account.contains("count_model"))
    assert(meta.graphs().select("name").as[String].collect().contains("prox_graph"))
    assert(meta.models(details = true).filter(col("name") === "price_model")
      .head().getAs[String]("model_type") == "regressor")
    assert(meta.featureSets(details = true).columns.contains("id_column"))
    assert(meta.endpoints().count() >= 2)
    // view listing surfaces the stored SQL
    assert(meta.views().filter(col("artifact") === "events_fs").count() >= 2)
    val desc = meta.describe("prox_graph")
    assert(desc("artifact_type") == "graph" && desc("graft_num_vertices") == "10")
  }

  test("delete removes per-type storage: model binaries, runs, graph parquet") {
    val root2 = java.nio.file.Files.createTempDirectory("graft-del").toString
    val cat = new Catalog(spark, root2)
    val m = cat.onboardFormulaModel("del_model", 1.0, Seq("x" -> 1.0), target = "y")
    m.toEndpoint("del-end").inference(
      Seq((1.0, 2.0)).toDF("x", "y"), captureName = Some("r1"), idColumn = Some("x"))
    cat.onboardGraph("del_graph", Seq((1L, "a")).toDF("id", "l"),
      Seq((1L, 1L)).toDF("src", "dst"))
    cat.delete("del_model"); cat.delete("del_graph"); cat.delete("del-end")
    val fs = new org.apache.hadoop.fs.Path(root2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root2/inference/del_model")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root2/graphs/del_graph")))
    assert(cat.registry.listNames().isEmpty)
  }

  test("restart: a new session reopens model + endpoint and reruns inference") {
    val s2 = spark.newSession()
    val cat2 = new Catalog(s2, root)
    cat2.attach()
    val m2 = cat2.model("price_model")
    assert(m2.exists && m2.listInferenceRuns() == Seq("test_run"))
    assert(cat2.registry.getMeta("price_model").contains("graft_metric/test_run/rmse"))
    // mllib model reloads from disk in the new session
    val clf = cat2.model("event_clf")
    assert(clf.pipeline.isDefined)
    val ep2 = cat2.endpoint("price-endpoint")
    val li2 = Tables.load(s2, sf, "lineitem").limit(100)
      .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
    val out2 = ep2.inference(li2, captureName = Some("rerun"),
      idColumn = Some("l_orderkey"))
    assert(out2.count() == 100)
    assert(cat2.model("price_model").listInferenceRuns() == Seq("test_run", "rerun"))
    // both sessions' captures accumulated in the shared store
    assert(cat2.inferenceStore.byModel("price_model").count() > 100)
    // Meta sees every artifact type from the new session, graphs included
    val meta2 = cat2.meta
    assert(Seq("data_source", "endpoint", "feature_set", "graph", "model")
      .forall(t => meta2.account.contains(s"count_$t")), meta2.account)
    assert(cat2.graph("prox_graph")._1.count() == 10)
  }

  test("copyModel freezes an independent copy (artifacts + defining meta only)") {
    val cat2 = new Catalog(spark, root)
    cat2.attach()
    val copy = cat2.copyModel("event_clf", "event_clf_frozen")
    assert(copy.exists && copy.modelType == cat2.model("event_clf").modelType)
    assert(copy.features == cat2.model("event_clf").features)
    // lifecycle bookkeeping does NOT come along
    assert(copy.listInferenceRuns().isEmpty && copy.endpoints.isEmpty)
    // the copy's MLlib artifact is its own directory — deleting the
    // source leaves the frozen copy loadable (delete-then-create churn)
    cat2.delete("event_clf")
    val reopened = new Catalog(spark, root).model("event_clf_frozen")
    assert(reopened.pipeline.isDefined)
    val li = Tables.load(spark, sf, "events").limit(20)
    assert(reopened.transform(li).count() == 20)
    // formula models copy via registry meta alone
    val fcopy = cat2.copyModel("price_model", "price_model_v2")
    assert(fcopy.exists && fcopy.transform(
      Tables.load(spark, sf, "lineitem").limit(5)
        .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice"))
      .count() == 5)
  }

  test("endpoint lineage: backtrack to FeatureSet, evaluation data, column registry") {
    val cat2 = new Catalog(spark, root)
    cat2.attach()
    val df = Tables.load(spark, sf, "lineitem").limit(60)
      .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
    cat2.onboardFeatures("lin_fs", df, idColumn = "l_orderkey")
    val m = cat2.toModel("lin_fs", "lin_m", "regressor",
      target = "l_extendedprice", features = Seq("l_quantity", "l_discount"))
    val ep = m.toEndpoint("lin-end")
    // End -> Model -> FeatureSet
    val fs = ep.backtrackToFeatureSet
    assert(fs.exists(_.name == "lin_fs"))
    // snapshot semantics: one row per id (duplicate l_orderkeys collapse)
    assert(ep.evaluationData.count() ==
      df.select("l_orderkey").distinct().count())
    // a model without a FeatureSet input has no lineage (formula onboard)
    val loose = cat2.onboardFormulaModel("loose_m", 0.0,
      Seq("l_quantity" -> 1.0), target = "l_extendedprice").toEndpoint("loose-end")
    assert(loose.backtrackToFeatureSet.isEmpty)
    assert(loose.evaluationData.isEmpty)
    // column registry: derived, cached, stale-invalidated
    assert(ep.inputColumns == Seq("l_quantity", "l_discount"))
    assert(ep.outputColumns == Seq("prediction"))
    // explicit registration overrides; cached lookup serves it back
    ep.registerInputColumns(Seq("l_quantity"))
    assert(ep.inputColumns == Seq("l_quantity"))
    // endpoint modification invalidates the cached list (re-derives)
    Thread.sleep(5)
    cat2.registry.addTag("lin-end", "touched")
    assert(ep.inputColumns == Seq("l_quantity", "l_discount"))
  }

  test("review: re-freezing over an existing copy replaces it, not nests it") {
    val cat2 = new Catalog(spark, root)
    cat2.attach()
    val df = Tables.load(spark, sf, "lineitem").limit(50)
      .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
    cat2.onboardFormulaModel("rf_a", 1.0, Seq("l_quantity" -> 2.0),
      target = "l_extendedprice")
    // MLlib source so a real artifact directory exists
    val src = cat2.toModel( {
      cat2.onboard("rf_src", df); "rf_src" }, "rf_m", "regressor",
      target = "l_extendedprice", features = Seq("l_quantity", "l_discount"))
    cat2.copyModel("rf_m", "rf_frozen")
    // retrain the source (new artifact), then RE-freeze over the same name:
    // the copy must load the NEW pipeline at the top level, not keep the
    // old one with the new files nested under models/rf_frozen/rf_m
    cat2.toModel("rf_src", "rf_m", "regressor",
      target = "l_extendedprice", features = Seq("l_quantity"))
    val again = cat2.copyModel("rf_m", "rf_frozen")
    assert(again.pipeline.isDefined)
    assert(again.features == Seq("l_quantity"))
    assert(again.transform(df).count() == 50)
  }
}
