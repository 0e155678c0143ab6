package graft

import graft.api.{Catalog, MetaEndpointDAG}
import graft.ml.{Ensemble, EnsembleSimulator, Metrics}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ensemble aggregation nodes, the meta-endpoint DAG walker, and the
  * offline strategy simulator (reference: utils/aggregation_nodes.py,
  * utils/meta_endpoint_dag.py, utils/ensemble_simulator.py,
  * api/meta_endpoint.py). All math is checked against hand-computed
  * numpy-identical values. */
class EnsembleSpec extends SparkSpec {
  import spark.implicits._

  private val rid = "__dag_row_id"

  private def frame(rows: (Long, Double, Double)*): DataFrame =
    rows.toSeq.toDF(rid, "prediction", "confidence")

  private def resultMap(df: DataFrame): Map[Long, (Double, Double, Double)] =
    df.select(col(rid), col("prediction"), col("prediction_std"), col("confidence"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap

  test("Mean: equal-weight mean, population std, mean confidence") {
    val a = frame((1L, 10.0, 0.8), (2L, 4.0, 0.6))
    val b = frame((1L, 14.0, 0.4), (2L, 8.0, 0.2))
    val out = resultMap(Ensemble.Mean("m").apply(Seq(a, b), rid))
    assert(out(1L)._1 === 12.0)
    assert(math.abs(out(1L)._2 - 2.0) < 1e-12) // pop std of {10,14}
    assert(math.abs(out(1L)._3 - 0.6) < 1e-12)
    assert(out(2L)._1 === 6.0)
  }

  test("Mean: missing confidence column defaults to 1.0 (np.ones)") {
    val a = Seq((1L, 10.0)).toDF(rid, "prediction")
    val b = Seq((1L, 20.0)).toDF(rid, "prediction")
    val out = resultMap(Ensemble.Mean("m").apply(Seq(a, b), rid))
    assert(out(1L)._3 === 1.0)
  }

  test("inner-join id semantics: rows missing from any upstream are dropped") {
    val a = frame((1L, 10.0, 0.8), (2L, 4.0, 0.6))
    val b = frame((1L, 14.0, 0.4)) // id 2 absent
    val out = Ensemble.Mean("m").apply(Seq(a, b), rid)
    assert(out.select(rid).as[Long].collect().toSeq == Seq(1L))
  }

  test("WeightedMean: weights normalized; prediction and confidence weighted") {
    val a = frame((1L, 10.0, 1.0))
    val b = frame((1L, 20.0, 0.5))
    // weights 3,1 → normalized 0.75/0.25
    val out = resultMap(Ensemble.WeightedMean("w", Seq(3.0, 1.0)).apply(Seq(a, b), rid))
    assert(math.abs(out(1L)._1 - 12.5) < 1e-12)
    assert(math.abs(out(1L)._3 - 0.875) < 1e-12)
    intercept[IllegalArgumentException] {
      Ensemble.WeightedMean("w", Seq(1.0)).apply(Seq(a, b), rid)
    }
    intercept[IllegalArgumentException] { Ensemble.WeightedMean("w", Seq(-1.0, 2.0)) }
  }

  test("Vote: majority label, winner share, smallest label on ties") {
    def lf(rows: (Long, String)*) = rows.toSeq.toDF(rid, "prediction")
    val a = lf((1L, "cat"), (2L, "dog"), (3L, "owl"))
    val b = lf((1L, "cat"), (2L, "cat"), (3L, "ant"))
    val c = lf((1L, "dog"), (2L, "dog"), (3L, "cat"))
    val out = Ensemble.Vote("v").apply(Seq(a, b, c), rid)
      .select(col(rid), col("prediction"), col("confidence"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out(1L) == ("cat", 2.0 / 3)) // cat 2, dog 1
    assert(out(2L) == ("dog", 2.0 / 3))
    assert(out(3L) == ("ant", 1.0 / 3)) // 3-way tie → smallest label
  }

  test("ConfidenceWeighted: per-row normalized weights with static fallback") {
    val a = frame((1L, 10.0, 3.0), (2L, 10.0, 0.0))
    val b = frame((1L, 20.0, 1.0), (2L, 20.0, 0.0))
    val node = Ensemble.ConfidenceWeighted("cw", Seq(0.9, 0.1))
    val out = resultMap(node.apply(Seq(a, b), rid))
    // row 1: (10·3 + 20·1)/(4 + 1e-12) = 12.5
    assert(math.abs(out(1L)._1 - 12.5) < 1e-9)
    // row 2: zero confidence → static weights 0.9/0.1 → 11
    assert(math.abs(out(2L)._1 - 11.0) < 1e-12)
    // ensemble confidence row 1: α/(1+popstd) + (1−α)·Σ(conf·1·w)
    // popstd {10,20} = 5 → 0.5/6 + 0.5·(3·0.9 + 1·0.1) = 1.48333…
    assert(math.abs(out(1L)._3 - (0.5 / 6 + 0.5 * 2.8)) < 1e-9)
  }

  test("Scaled and Calibrated conf-weighted match hand math") {
    val a = frame((1L, 10.0, 0.5))
    val b = frame((1L, 20.0, 0.5))
    val scaled = resultMap(Ensemble.ScaledConfidenceWeighted(
      "s", Seq(3.0, 1.0)).apply(Seq(a, b), rid))
    // kernel = conf·w = {0.375, 0.125} → pred = (10·.375+20·.125)/.5 = 12.5
    assert(math.abs(scaled(1L)._1 - 12.5) < 1e-9)
    val cal = resultMap(Ensemble.CalibratedConfidenceWeighted(
      "c", Seq(1.0, 1.0), corrScale = Seq(0.8, 0.2)).apply(Seq(a, b), rid))
    // kernel = conf·cs = {0.4, 0.1} → pred = (10·.4+20·.1)/.5 = 12
    assert(math.abs(cal(1L)._1 - 12.0) < 1e-9)
  }

  test("Concat: column-union of parallel branches on the row id") {
    val a = Seq((1L, 1.0), (2L, 2.0)).toDF(rid, "f1")
    val b = Seq((1L, 10.0), (2L, 20.0)).toDF(rid, "f2")
    val out = Ensemble.Concat("cc").apply(Seq(a, b), rid)
    assert(out.columns.toSeq == Seq(rid, "f1", "f2"))
    assert(out.count() == 2)
  }

  test("pass-through: user columns from the first upstream flow through") {
    val a = Seq((1L, "x9", 10.0, 0.5)).toDF(rid, "sid", "prediction", "confidence")
    val b = frame((1L, 20.0, 0.5))
    val out = Ensemble.Mean("m").apply(Seq(a, b), rid)
    assert(out.columns.contains("sid"))
    assert(out.select("sid").as[String].head() == "x9")
  }

  test("Metrics.spearman: tie-averaged ranks match scipy semantics") {
    // x = 1,2,3,4; y = 10,10,30,40 → ranks y = 1.5,1.5,3,4
    // spearman = pearson((1,2,3,4),(1.5,1.5,3,4)) = 4.5/√22.5 = 0.9486832…
    // (matches scipy.stats.spearmanr)
    val df = Seq((1.0, 10.0), (2.0, 10.0), (3.0, 30.0), (4.0, 40.0)).toDF("x", "y")
    val r = Metrics.spearman(df, "x", "y").head().getDouble(0)
    assert(math.abs(r - 0.948683) < 1e-6)
    // perfect monotone
    val mono = Seq((1.0, 5.0), (2.0, 9.0), (3.0, 100.0)).toDF("x", "y")
    assert(Metrics.spearman(mono, "x", "y").head().getDouble(0) === 1.0)
  }

  test("DAG: validation failures are loud") {
    val dag = new MetaEndpointDAG
    dag.addEndpoint("e1"); dag.addAggregation(Ensemble.Mean("agg"))
    intercept[IllegalArgumentException](dag.validate()) // no input
    dag.setInputNodes("e1")
    intercept[IllegalArgumentException](dag.validate()) // no output
    dag.setOutputNode("agg")
    intercept[IllegalArgumentException](dag.validate()) // agg has no parents
    dag.addEdge("e1", "agg")
    dag.validate()
    intercept[IllegalArgumentException](dag.addEdge("agg", "nope"))
    // endpoint nodes take at most one inbound edge
    val dag2 = new MetaEndpointDAG
    dag2.addEndpoint("a"); dag2.addEndpoint("b"); dag2.addEndpoint("c")
    dag2.addEdge("a", "c")
    intercept[IllegalArgumentException](dag2.addEdge("b", "c"))
  }

  test("DAG spec round-trips through the registry encoding") {
    val dag = new MetaEndpointDAG
    dag.addEndpoint("model-a-end", "n1")
    dag.addEndpoint("model-b-end", "n2")
    dag.addAggregation(Ensemble.ScaledConfidenceWeighted(
      "combine", Seq(0.75, 0.25), Seq(0.9, 0.3), optimalAlpha = 0.4))
    dag.addEdge("n1", "combine"); dag.addEdge("n2", "combine")
    dag.setInputNodes("n1", "n2"); dag.setOutputNode("combine")
    val rt = MetaEndpointDAG.fromSpec(dag.toSpec)
    assert(rt.toSpec == dag.toSpec)
    rt.validate()
    assert(rt.endpoints == Map("n1" -> "model-a-end", "n2" -> "model-b-end"))
  }

  test("MetaEndpoint lifecycle: create, restart-reopen, DAG inference") {
    val root = java.nio.file.Files.createTempDirectory("graft-meta-end").toString
    val cat = new Catalog(spark, root)
    val df = Seq((1L, 2.0), (2L, 4.0), (3L, 6.0)).toDF("id", "x")
    cat.onboardFormulaModel("ens-a", 1.0, Seq("x" -> 2.0), target = "y")
      .toEndpoint("ens-a-end")
    cat.onboardFormulaModel("ens-b", 3.0, Seq("x" -> 1.0), target = "y")
      .toEndpoint("ens-b-end")
    val dag = new MetaEndpointDAG
    dag.addEndpoint("ens-a-end"); dag.addEndpoint("ens-b-end")
    dag.addAggregation(Ensemble.WeightedMean("combine", Seq(0.5, 0.5)))
    dag.addEdge("ens-a-end", "combine"); dag.addEdge("ens-b-end", "combine")
    dag.setInputNodes("ens-a-end", "ens-b-end"); dag.setOutputNode("combine")
    cat.createMetaEndpoint("meta-ab", dag)

    // unknown child endpoint fails fast
    val bad = new MetaEndpointDAG
    bad.addEndpoint("ghost-end"); bad.setInputNodes("ghost-end")
    bad.setOutputNode("ghost-end")
    intercept[IllegalArgumentException](cat.createMetaEndpoint("meta-bad", bad))

    // a NEW catalog (fresh session state) reopens the meta by name
    val cat2 = new Catalog(spark, root)
    val me = cat2.metaEndpoint("meta-ab")
    assert(me.exists)
    val out = me.inference(df)
    assert(!out.columns.contains("__dag_row_id"))
    val got = out.select(col("id"), col("prediction"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 0.5·(1+2x) + 0.5·(3+x): x=2 → 5.0; x=4 → 8.0; x=6 → 11.0
    assert(got == Map(1L -> 5.0, 2L -> 8.0, 3L -> 11.0))
  }

  test("chained MLlib endpoint: upstream output columns don't collide") {
    val root = java.nio.file.Files.createTempDirectory("graft-chain").toString
    val cat = new Catalog(spark, root)
    val train = (1 to 60).map(i => (i.toLong, i.toDouble, 3.0 * i + 1))
      .toDF("id", "x", "y")
    // upstream: formula endpoint; downstream: a REAL MLlib pipeline
    // whose transform throws on pre-existing prediction/features cols
    cat.onboardFormulaModel("ch-up", 0.0, Seq("x" -> 1.0), target = "y")
      .toEndpoint("ch-up-end")
    val fitted = graft.ml.Models.trainRegressor(train, Seq("x"), "y")
    cat.onboardModel("ch-down", fitted, "regressor", "y", Seq("x"))
      .toEndpoint("ch-down-end")
    val dag = new MetaEndpointDAG
    dag.addEndpoint("ch-up-end"); dag.addEndpoint("ch-down-end")
    dag.addEdge("ch-up-end", "ch-down-end")
    dag.setInputNodes("ch-up-end"); dag.setOutputNode("ch-down-end")
    val me = cat.createMetaEndpoint("meta-chain", dag)
    val out = me.inference(Seq((100L, 5.0)).toDF("id", "x"))
    assert(out.columns.contains("prediction"))
    assert(out.count() == 1)
  }

  test("EnsembleSimulator: weights, performance, strategies, agreement") {
    // two models over 4 rows; model A is better (MAE 1 vs 2)
    val ta = Seq((1L, 10.0, 9.0, 0.9), (2L, 20.0, 21.0, 0.8),
      (3L, 30.0, 29.0, 0.7), (4L, 40.0, 41.0, 0.6))
      .toDF("id", "y", "prediction", "confidence")
    val tb = Seq((1L, 10.0, 12.0, 0.5), (2L, 20.0, 18.0, 0.5),
      (3L, 30.0, 32.0, 0.5), (4L, 40.0, 38.0, 0.5))
      .toDF("id", "y", "prediction", "confidence")
    val sim = EnsembleSimulator.fromFrames(
      Seq("ma" -> ta, "mb" -> tb), "id", "y")

    assert(sim.maeScores == Seq(1.0, 2.0))
    val w = sim.ensembleWeights().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(w("ma") - 2.0 / 3) < 1e-6 && math.abs(w("mb") - 1.0 / 3) < 1e-6)

    val perf = sim.modelPerformance().collect()
    assert(perf.map(_.getString(0)).toSeq == Seq("ma", "mb"))
    val perfA = perf.head
    assert(perfA.getDouble(2) === 1.0) // mae
    assert(math.abs(perfA.getDouble(1) - 1.0) < 1e-9) // rmse (all |err|=1)

    val strat = sim.strategyComparison().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // simple mean errs: (10.5-10, 19.5-20, 30.5-30, 39.5-40) → MAE 0.5
    assert(math.abs(strat("Simple Mean") - 0.5) < 1e-9)
    assert(strat.contains("Best Model Only (ma)"))
    assert(strat.contains("Drop Worst (mb)"))
    assert(math.abs(strat("Drop Worst (mb)") - 1.0) < 1e-9) // = model A alone
    // inverse-MAE: w=(2/3,1/3): row1 = 9·2/3+12·1/3 = 10 → err 0 …
    assert(strat("Inverse-MAE Weighted") < strat("Simple Mean"))

    val agg = sim.modelAgreement().head()
    // per-row sample std of {pa,pb}: |pa-pb|/√2 = {2.12…, 2.12…, 2.12…, 2.12…}
    assert(math.abs(agg.getDouble(0) - 3.0 / math.sqrt(2)) < 1e-6)

    val rc = sim.residualCorrelations()
    assert(rc.count() == 2) // 2 models → 2 oriented pairs
    sim.release()
  }

  test("EnsembleSimulator loads captures from the catalog (full journey)") {
    val root = java.nio.file.Files.createTempDirectory("graft-sim").toString
    val cat = new Catalog(spark, root)
    val df = Seq((1L, 2.0, 5.1, 0.9), (2L, 4.0, 9.0, 0.8), (3L, 6.0, 13.2, 0.7))
      .toDF("id", "x", "y", "confidence")
    // two deterministic formula models; confidence flows through the
    // transform into the capture because it rides the input frame
    cat.onboardFormulaModel("sim-a", 1.0, Seq("x" -> 2.0), target = "y")
      .toEndpoint("sim-a-end")
    cat.onboardFormulaModel("sim-b", 0.0, Seq("x" -> 2.2), target = "y")
      .toEndpoint("sim-b-end")
    cat.endpoint("sim-a-end").inference(df, captureName = Some("full_cross_fold"),
      idColumn = Some("id"))
    cat.endpoint("sim-b-end").inference(df, captureName = Some("full_cross_fold"),
      idColumn = Some("id"))
    val sim = EnsembleSimulator(cat, Seq("sim-a", "sim-b"), idColumn = "id")
    val strat = sim.strategyComparison()
    assert(strat.count() == 7)
    assert(strat.columns.toSeq == Seq("strategy", "mae"))
    sim.release()
  }
}
