package graft

import graft.core.Tables
import graft.dedup.Dedup
import graft.eda.Eda
import graft.ml.Metrics
import graft.proximity.Proximity
import graft.text.Text
import graft.transforms.Transforms
import graft.views.Views
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or the
  * training-data-pipeline extension set), expressed through the graft
  * library; each `oracleSql` entry is the equivalent ANSI SQL DuckDB runs
  * on the same parquet tables. Aggregate/computed columns are aliased
  * identically on both sides; floating aggregates are rounded identically
  * on both sides so cross-engine float noise cannot flip the hash compare.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Run independent lifecycle actions concurrently (guide §2.6: Spark's
    * scheduler overlaps jobs submitted from several driver threads, so
    * one inference's straggler tail back-fills with the next one's
    * work). Bounded pool, exceptions rethrown, pool always torn down. */
  private def parallelEach[A](items: Seq[A])(f: A => Unit): Unit =
    if (items.size == 1) f(items.head)
    else if (items.nonEmpty) {
      // (empty guard: Executors.newFixedThreadPool(0) throws)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(items.size, 4))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try scala.concurrent.Await.result(
        scala.concurrent.Future.traverse(items)(a =>
          scala.concurrent.Future(f(a))),
        scala.concurrent.duration.Duration.Inf)
      catch { case e: Throwable =>
        // a failed sibling must not keep writing on a shutdown-pending
        // pool while the caller unwinds: drain the queue and wait for
        // in-flight tasks so no concurrent writer leaks past this call
        pool.shutdownNow()
        pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
        throw e }
      finally pool.shutdown()
    }

  /** Exact decimal sum surfaced as double — deterministic across engines
    * (decimal accumulation is order-independent; the final double cast of
    * the same decimal value is identical everywhere).
    */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  private val lineitemNumeric = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ───────── EDA pack (SURVEY §2.4) ─────────
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),
    "q02_num_rows" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(count(lit(1)).as("num_rows"))),
    "q03_descriptive_stats" -> ((s, dir) => {
      val d = Eda.descriptiveStats(t(s, dir, "lineitem"), lineitemNumeric)
      d.select(col("column_name"), col("min"), round(col("q1"), 6).as("q1"),
        round(col("median"), 6).as("median"), round(col("q3"), 6).as("q3"),
        col("max"), round(col("mean"), 6).as("mean"),
        round(col("stddev"), 6).as("stddev"))
    }),
    "q04_count_distinct" -> ((s, dir) =>
      Eda.countDistinct(t(s, dir, "lineitem"), lineitemNumeric ++ Seq("l_orderkey", "l_returnflag"))),
    "q05_count_nulls" -> ((s, dir) =>
      Eda.countNulls(t(s, dir, "lineitem"), lineitemNumeric)),
    "q06_count_zeros" -> ((s, dir) =>
      Eda.countZeros(t(s, dir, "lineitem"), lineitemNumeric)),
    "q07_correlations" -> ((s, dir) =>
      Eda.correlations(t(s, dir, "lineitem"), lineitemNumeric)
        .select(col("col_1"), col("col_2"), round(col("correlation"), 6).as("correlation"))),
    "q08_value_counts" -> ((s, dir) =>
      Eda.valueCounts(t(s, dir, "orders"), "o_orderpriority")),
    "q09_outliers" -> ((s, dir) =>
      Eda.outliers(t(s, dir, "customer"), Seq("c_acctbal"))
        .select("c_custkey", "c_acctbal")),
    // ───────── window / views / joins (SURVEY §2.2, 2.3, 2.5) ─────────
    "q10_snapshot" -> ((s, dir) =>
      Views.snapshot(t(s, dir, "events"), "user_id",
        Seq(col("ts").desc, col("event_id").desc))
        .select("user_id", "event_id", "event_type", "value")),
    "q11_column_subset" -> ((s, dir) =>
      Views.columnSubset(t(s, dir, "customer"), Seq("c_custkey", "c_name", "c_acctbal"))),
    "q12_join_view" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val supp = t(s, dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
        .select("o_custkey", "c_name", "c_acctbal", "c_mktsegment")
      Views.joinView(orders, supp, "o_custkey", hintBroadcast = true)
        .select("o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment")
    }),
    "q13_training_view" -> ((s, dir) => {
      val base = t(s, dir, "customer")
      val roles = base.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"),
          (col("c_custkey") % 7 === 0).as("exclude"),
          (col("c_custkey") % 5 === 0).as("validation"),
          lit(2.0).as("sample_weight"))
      Views.trainingView(base, roles, "c_custkey")
        .select("c_custkey", "c_name", "c_acctbal", "sample_weight", "validation")
    }),
    "q14_topk_per_group" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders").withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rank")
    }),
    "q15_temporal_split" -> ((s, dir) => {
      val (train, _) = Transforms.temporalSplit(t(s, dir, "events"), "ts", "2024-03-01 00:00:00")
      train.select("event_id", "event_type", "value")
    }),
    "q16_union_dedup" -> ((s, dir) => {
      val e = t(s, dir, "events").select("event_id", "event_type", "value")
      e.filter(col("value") > 150)
        .unionByName(e.filter(col("event_type") === "error"))
        .dropDuplicates("event_id")
    }),
    "q17_one_hot" -> ((s, dir) =>
      Transforms.oneHot(
        t(s, dir, "orders").select("o_orderkey", "o_orderstatus"), "o_orderstatus")),
    // ───────── ML metrics (SURVEY §2.4 metrics rows) ─────────
    "q18_confusion_matrix" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("prediction",
          when(col("value") >= 100, "purchase").otherwise(col("event_type")))
      Metrics.confusionMatrix(e, "event_type", "prediction")
    }),
    "q19_regression_metrics" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("pred", col("o_totalprice") * 0.9 + 1000)
      Metrics.regressionMetrics(o, "o_totalprice", "pred")
        .select(round(col("rmse"), 2).as("rmse"), round(col("mae"), 2).as("mae"),
          round(col("medae"), 2).as("medae"), col("r2"))
    }),
    "q20_classification_report" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("prediction",
          when(col("value") >= 100, "purchase").otherwise(col("event_type")))
      Metrics.classificationReport(e, "event_type", "prediction")
    }),
    // ───────── joins at TPC-H shape (bench headline) ─────────
    "q21_top_revenue_orders" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      // No broadcast hint on customer: at 100 TB customer-class tables are
      // GBs — a pinned hint would force an OOM-ing broadcast. AQE picks
      // BHJ at small SF from runtime sizes and SMJ at scale.
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),
    "q22_nation_revenue" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      // Hints only on true dimension tables (nation 25 rows, region 5 rows);
      // customer/supplier scale with SF, so their join strategy is left to
      // AQE's size-based choice (BHJ small, SMJ at 100×).
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(c, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),
    "q23_time_rollup" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy("day", "event_type")),
    "q24_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))),
    // ───────── similarity / dedup / text (training-data pipeline pack) ─────────
    "q25_knn_cosine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      Proximity.cosineTopK(q, emb, "vec_id", "embedding", 5)
        .select(col("id"), col("neighbor_id"), round(col("similarity"), 4).as("similarity"))
    }),
    "q26_doc_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fingerprint"))),
    "q27_exact_dedup" -> ((s, dir) =>
      Dedup.exactGroups(t(s, dir, "documents"), "doc_id", "text")),
    "q28_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(
        t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text", 0.5)),
    "q29_token_stats" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars_m"),
          Text.wordCount(col("text")).cast("long").as("n_words"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens"))),
    "q30_quality_signals" -> ((s, dir) =>
      Text.qualitySignals(t(s, dir, "documents"), "text")),
    "q31_lang_id" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), Text.langId(col("text")).as("lang_pred"))),
    "q32_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLsh(t(s, dir, "documents"), "doc_id", "text", threshold = 0.2)),
    "q33_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 6)),
    // ───────── quality / drift / health (SURVEY §2.4 tail) ─────────
    "q34_target_health" -> ((s, dir) =>
      graft.eda.Quality.targetHealth(t(s, dir, "orders"), "o_totalprice").drop("skew")),
    "q35_detect_drift" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val baseline = li.filter(col("l_shipdate") < to_timestamp(lit("1997-01-01")))
      graft.eda.Quality.detectDrift(li, baseline, lineitemNumeric)
        .select(col("column_name"), round(col("base_mean"), 6).as("base_mean"),
          round(col("cur_mean"), 6).as("cur_mean"), col("mean_drift"), col("drifted"))
    }),
    "q36_feature_quality" -> ((s, dir) =>
      graft.eda.Quality.featureQuality(t(s, dir, "lineitem"), lineitemNumeric)),
    "q37_smart_sample" -> ((s, dir) =>
      graft.eda.Quality.smartSample(t(s, dir, "customer"), Seq("c_acctbal"))),
    // ───────── proximity analytics pack (SURVEY §2.9) ─────────
    "q38_residual_features" -> ((s, dir) => {
      val e = embDouble(s, dir).filter(col("vec_id") < 100)
      val rows = e.withColumn("pred", col("label") * 0.9)
      val nn = Proximity.knnJoin(e.filter(col("vec_id") < 30), e, "vec_id", "embedding",
        5, Proximity.euclidean)
      graft.proximity.Analytics.residualFeatures(nn, rows, "vec_id", "label", "pred", 5)
        .select(col("id"), col("target"), round(col("prediction"), 6).as("prediction"),
          round(col("knn_distance"), 4).as("knn_distance"),
          round(col("knn_target_mean"), 6).as("knn_target_mean"),
          round(col("knn_target_std"), 6).as("knn_target_std"),
          round(col("local_pred_gap"), 4).as("local_pred_gap"))
    }),
    "q39_proximity_graph" -> ((s, dir) => {
      val e = embDouble(s, dir).filter(col("vec_id") < 100)
      val nn = Proximity.knnJoinAdaptive(e, e, "vec_id", "embedding", 5, "euclidean", 64)
      graft.proximity.Analytics.proximityGraph(nn, minEdges = 2, extraThreshold = 0.8)
        .select(col("src"), col("dst"), round(col("weight"), 6).as("weight"))
    }),
    "q40_laplacian_smoothness" -> ((s, dir) => {
      val e = embDouble(s, dir).filter(col("vec_id") < 100)
      val nn = Proximity.knnJoinAdaptive(e, e, "vec_id", "embedding", 5, "euclidean", 64)
      val edges = graft.proximity.Analytics.proximityGraph(nn, 2, 0.8)
      graft.proximity.Analytics.laplacianSmoothness(edges, e, "vec_id", "label")
        .select(col("id"), round(col("node_smoothness"), 4).as("node_smoothness"),
          col("degree"), round(col("global_smoothness"), 4).as("global_smoothness"))
    }),
    "q41_target_gradients" -> ((s, dir) => {
      val e = embDouble(s, dir).filter(col("vec_id") < 100)
      val nn = Proximity.knnJoin(e.filter(col("vec_id") < 30), e, "vec_id", "embedding",
        5, Proximity.euclidean)
      graft.proximity.Analytics.targetGradients(nn, e, "vec_id", "label")
        .select(col("id"), col("neighbor_id"),
          round(col("feature_diff"), 4).as("feature_diff"), col("target_diff"),
          round(col("target_gradient"), 4).as("target_gradient"))
    }),
    "q42_row_tags" -> ((s, dir) => {
      val e = embDouble(s, dir).filter(col("vec_id") < 100)
      val nn = Proximity.knnJoinAdaptive(e, e, "vec_id", "embedding", 5, "euclidean", 64)
      graft.proximity.Analytics.rowTags(nn, e, "vec_id", "label", gradientCut = 2.0)
        .select(col("id"), array_join(col("tags"), ",").as("tags"))
    }),
    "q43_landscape_isolated" -> ((s, dir) => {
      val e = embDouble(s, dir).filter(col("vec_id") < 200)
      val nn = Proximity.knnJoinAdaptive(e, e, "vec_id", "embedding", 3, "euclidean", 64)
      graft.proximity.Analytics.landscapeIsolated(nn, 0.9)
        .select(col("id"), round(col("nn_distance"), 4).as("nn_distance"))
    }),
    // ───────── ML loop / aggregation / projection (rows-only checks) ─────────
    "q44_smart_aggregate" -> ((s, dir) =>
      graft.ml.Models.smartAggregate(
        t(s, dir, "customer").select("c_custkey", "c_acctbal", "c_mktsegment"),
        Seq("c_acctbal"), targetRows = 50)),
    "q45_projection_2d" -> ((s, dir) =>
      graft.ml.Models.projection2D(
        t(s, dir, "lineitem").limit(5000)
          .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .select("l_orderkey", "x", "y")),
    "q46_train_infer" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
      val model = graft.ml.Models.trainRegressor(li,
        Seq("l_quantity", "l_discount"), "l_extendedprice")
      graft.ml.Metrics.withResiduals(
        model.transform(li).select("l_orderkey", "l_extendedprice", "prediction"),
        "l_extendedprice", "prediction")
    }),
    "q47_multimodal_features" -> ((s, dir) => {
      // REAL decode path (VERDICT r4 item 5): deterministic synthetic
      // PNG payloads → javax.imageio decode → channel stats + luma grid
      val toPng = udf((id: Long) =>
        graft.multimodal.Multimodal.syntheticPng(id, 16, 16))
      val media = t(s, dir, "documents").select(
        col("doc_id").as("media_id"), lit("image").as("media_type"),
        lit("image/png").as("mime"),
        lit(16).as("width"), lit(16).as("height"),
        lit(null).cast("long").as("duration_ms"),
        toPng(col("doc_id")).as("payload"))
      // the library emits a typed array<float> `features` column; the
      // driver's rows-only check needs hashable cells, so project the
      // array to a deterministic per-row checksum string here
      graft.multimodal.Multimodal.extractFeatures(media, dim = 8)
        .withColumn("features",
          concat_ws(",", transform(col("features"),
            x => format_number(round(x.cast("double"), 4), 4))))
    }),
    // ───────── nested flatten (SURVEY §2.1 heavy loader) ─────────
    "q48_flatten_json" -> ((s, dir) => {
      val parsed = t(s, dir, "events").select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).as("p"))
      graft.sources.Sources.flattenStructs(parsed)
    }),
    "q49_knn_euclidean" -> ((s, dir) => {
      val e = embDouble(s, dir)
      Proximity.knnJoin(e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
        5, Proximity.euclidean)
        .select(col("id"), col("neighbor_id"), round(col("distance"), 4).as("distance"))
    }),
    "q50_knn_ruzicka" -> ((s, dir) => {
      // deterministic count-vector fingerprints derived from embeddings —
      // stands in for the reference's Morgan count fingerprints
      val f = t(s, dir, "embeddings").filter(col("vec_id") < 300)
        .withColumn("fp", transform(col("embedding"),
          x => floor(abs(x.cast("double") * 20))))
      Proximity.knnJoin(f.filter(col("vec_id") < 10), f, "vec_id", "fp",
        5, Proximity.ruzicka)
        .select(col("id"), col("neighbor_id"), round(col("distance"), 6).as("distance"))
    }),
    "q51_multi_task_alignment" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      graft.proximity.Analytics.multiTaskAlignment(li, lineitemNumeric)
        .select(col("task_1"), col("task_2"), round(col("pearson_r"), 6).as("pearson_r"),
          round(col("coverage"), 6).as("coverage"))
    }),
    "q52_feature_spider" -> ((s, dir) => {
      val e = embDouble(s, dir).filter(col("vec_id") < 100)
      val nn = Proximity.knnJoin(e.filter(col("vec_id") < 30), e, "vec_id", "embedding",
        5, Proximity.euclidean)
      graft.proximity.Analytics.featureSpider(nn, e, "vec_id", "label", gradientCut = 2.0)
        .select(col("id"), col("target"),
          round(col("knn_prediction"), 6).as("knn_prediction"),
          round(col("knn_error"), 6).as("knn_error"),
          col("coincident"), col("high_gradient"))
    }),
    "q53_dedup_clusters" -> ((s, dir) => {
      // exact word-jaccard pairs -> connected components -> dedup survivors
      val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.7)
      graft.dedup.Components.dedupByPairs(docs, "doc_id", pairs)
        .select("doc_id", "lang", "source")
    }),
    "q54_quantile_split" -> ((s, dir) =>
      Transforms.quantileSplit(
        t(s, dir, "customer").select("c_custkey", "c_acctbal"),
        "c_acctbal", 4, tiebreak = Seq("c_custkey"))),
    "q55_column_stats" -> ((s, dir) => {
      // composite per-column stats: dtype + distinct + nulls in one frame
      // (reference column_stats.py:52-121 orchestration)
      val o = t(s, dir, "orders")
      val cols = o.columns.toSeq
      val distinctLong = Eda.countDistinct(o, cols).selectExpr(
        s"stack(${cols.size}, ${cols.map(c => s"'$c', `$c`").mkString(", ")}) as (column_name, n_distinct)")
      val nullsLong = Eda.countNulls(o, cols).selectExpr(
        s"stack(${cols.size}, ${cols.map(c => s"'$c', `$c`").mkString(", ")}) as (column_name, n_nulls)")
      val dtypes = o.schema.fields.map(f =>
        (f.name, f.dataType.simpleString.replace("timestamp_ntz", "timestamp"))).toSeq
      val dtypeDf = o.sparkSession.createDataFrame(dtypes).toDF("column_name", "dtype")
      distinctLong.join(nullsLong, Seq("column_name")).join(dtypeDf, Seq("column_name"))
    }),
    "q56_stratified_split" -> ((s, dir) => {
      val (train, _) = Transforms.stratifiedSplit(
        t(s, dir, "customer"), "c_mktsegment", 0.8, "c_custkey")
      train.select("c_custkey", "c_mktsegment")
    }),
    "q57_label_noise" -> ((s, dir) => {
      val e = embDouble(s, dir).filter(col("vec_id") < 100)
      val nn = Proximity.knnJoinAdaptive(e, e, "vec_id", "embedding", 5, "euclidean", 64)
      graft.ml.Noise.neighborhoodDisagreement(nn, e, "vec_id", "label")
        .select(col("id"), col("label"), col("majority_label"),
          round(col("agreement"), 6).as("agreement"), col("noisy"))
    }),
    "q58_fingerprint_tanimoto" -> ((s, dir) => {
      import graft.functions.Chem
      // serialize to the reference's CSV-counts string, parse back, then
      // run typed tanimoto — proves the roundtrip is lossless
      val f = t(s, dir, "embeddings").filter(col("vec_id") < 50)
        .withColumn("fp_csv", Chem.fingerprintToCsv(
          transform(col("embedding"), x => floor(abs(x.cast("double") * 20)).cast("int"))))
        .withColumn("fp", Chem.parseFingerprint(col("fp_csv")))
      val ref = f.filter(col("vec_id") === 0).select(col("fp").as("fp0"))
      f.crossJoin(broadcast(ref))
        .select(col("vec_id"), round(Chem.tanimoto(col("fp"), col("fp0")), 6).as("tanimoto"))
    }),
    "q59_feature_space_knn" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("rid", col("l_orderkey") * 10 + col("l_linenumber"))
        .filter(col("rid") < 3000)
      Proximity.featureSpaceKnn(li.filter(col("rid") < 150), li, "rid",
        lineitemNumeric, 5)
        .select(col("id"), col("neighbor_id"), round(col("distance"), 4).as("distance"))
    }),
    "q60_radius_neighbors" -> ((s, dir) => {
      val e = embDouble(s, dir).filter(col("vec_id") < 200)
      Proximity.radiusJoin(e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
        radius = 1.1, Proximity.euclidean)
        .select(col("id"), col("neighbor_id"), round(col("distance"), 4).as("distance"))
    }),
    "q61_outliers_sdev" -> ((s, dir) =>
      Eda.outliersSdev(t(s, dir, "customer"), Seq("c_acctbal"), nSigma = 2.0)
        .select("c_custkey", "c_acctbal")),
    "q62_quantile_split_ranged" -> ((s, dir) =>
      // scale path for q54: edge aggregate + range assignment, no
      // single-partition window (exact edges here for oracle parity;
      // exact=false is the approx-sketch 100 TB path)
      Transforms.quantileSplitRanged(
        t(s, dir, "customer").select("c_custkey", "c_acctbal"),
        "c_acctbal", 4, exact = true)),
    "q63_uq_intervals" -> ((s, dir) => {
      // UQ v0: conformal intervals calibrated on even orderkeys, applied
      // to odd ones (deterministic pseudo-ensemble: pred = 0.95y + 500,
      // std = y/20 floored at 1). Rows-only check: isotonic calibration
      // is not SQL-expressible.
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_totalprice").cast("double").as("y"))
        .withColumn("pred", col("y") * 0.95 + 500)
        .withColumn("std", greatest(lit(1.0), col("y") / 20))
      val m = graft.ml.UQ.fit(o.filter(col("o_orderkey") % 2 === 0), "y", "pred", "std")
      m.predict(o.filter(col("o_orderkey") % 2 === 1), "pred", "std")
        .select(col("o_orderkey"), round(col("expected_residual"), 4).as("expected_residual"),
          round(col("confidence"), 4).as("confidence"),
          round(col("q_025"), 4).as("q_025"), round(col("q_975"), 4).as("q_975"))
    }),
    "q64_column_stats_full" -> ((s, dir) => {
      // full column_stats orchestration (column_stats.py:52-121): flat
      // projection for the oracle; the map-typed value_counts /
      // correlations variant is spec-checked (EdaSpec)
      val statCols = Seq("min", "q1", "median", "q3", "max", "mean", "stddev")
      Eda.columnStatsFull(t(s, dir, "orders"), includeMaps = false)
        .select(Seq(col("column_name"), col("dtype"), col("n_distinct"),
          col("n_nulls"), col("num_zeros")) ++
          statCols.map(c => round(col(c), 6).as(c)): _*)
    }),
    "q65_filter_by_tags" -> ((s, dir) => {
      // row tags -> filter_by_tags (mol_tagging.py:386-434): require +
      // exclude + prefix forms all exercised
      val e = embDouble(s, dir).filter(col("vec_id") < 100)
      val nn = Proximity.knnJoinAdaptive(e, e, "vec_id", "embedding", 5, "euclidean", 64)
      val tagged = graft.proximity.Analytics.rowTags(nn, e, "vec_id", "label", gradientCut = 2.0)
      graft.proximity.Analytics.filterByTags(tagged,
        require = Seq("zero_target"), exclude = Seq("coincident"),
        requirePrefix = Seq("zero"), excludePrefix = Seq("coinc"))
        .select(col("id"), array_join(col("tags"), ",").as("tags"))
    }),
    "q66_projection_umap" -> ((s, dir) => {
      // sampled UMAP-style projection (projection_2d.py:17-166): seeded,
      // capped, rows-only check (embedding coords are engine-specific)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding")(0).as("e0"), col("embedding")(1).as("e1"),
          col("embedding")(2).as("e2"), col("embedding")(3).as("e3"))
      graft.ml.Projection.projection2DSampled(e, "vec_id",
          Seq("e0", "e1", "e2", "e3"), "umap", maxRows = 2000)
        .select(col("vec_id"), round(col("x"), 4).as("x"), round(col("y"), 4).as("y"))
    }),
    // ───────── endpoint inference-loop details (SURVEY §2.4/§2.3) ─────────
    "q67_binary_accuracy" -> ((s, dir) =>
      graft.ml.Metrics.binaryAccuracy(
        t(s, dir, "events").withColumn("prediction",
          when(col("value") >= 100, "purchase").otherwise(col("event_type"))),
        "event_type", "prediction", Seq("purchase"))),
    "q68_confidence_profile" -> ((s, dir) =>
      graft.ml.Metrics.confidenceProfile(
        t(s, dir, "events")
          .withColumn("prediction",
            when(col("value") >= 100, "purchase").otherwise(col("event_type")))
          .withColumn("mp", col("value") % 1), // deterministic pseudo-proba
        "event_type", "prediction", "mp", Seq("purchase"), quantiles = 10)),
    "q69_classifier_residuals" -> ((s, dir) =>
      graft.ml.Metrics.withClassifierResiduals(
        t(s, dir, "events").withColumn("prediction",
          when(col("value") >= 100, "purchase").otherwise(col("event_type"))),
        "event_type", "prediction",
        Seq("click", "error", "purchase", "signup", "view"))
        .select("event_id", "residuals", "residuals_abs")),
    "q70_uq_v1" -> ((s, dir) => {
      // full v1 pipeline: knn join -> residual features -> RF error model
      // -> normalized conformal intervals (rows-only: RF output is
      // engine-specific)
      val e = embDouble(s, dir).filter(col("vec_id") < 400)
        .withColumn("prediction", col("label").cast("double") * 0.9 + 0.5)
        .withColumn("prediction_std", lit(0.5))
      val nn = Proximity.knnJoinAdaptive(e, e, "vec_id", "embedding", 10, "euclidean", 64)
      val feats = graft.proximity.Analytics.residualFeatures(
        nn, e, "vec_id", "label", "prediction", 10)
        .join(e.select(col("vec_id").as("id"), col("prediction_std")), Seq("id"))
        // localCheckpoint (not persist): fit + predict both read it, and
        // the checkpoint is released with the DataFrame instead of
        // pinning session storage
        .localCheckpoint(true)
      // OOF via the cross-fold runner (VERDICT r2 item 4): fit v1 on
      // k−1 folds, predict the held-out fold, stitched frame covers
      // every row once
      graft.ml.CrossFold.run(feats, "id", 2) { (tr, te) =>
        graft.ml.UQ.fitV1(tr, "target", "prediction", "prediction_std",
            numTrees = 20, maxDepth = 6)
          .predict(te, "prediction", "prediction_std")
      }.select(col("id"), col("fold"),
        round(col("expected_residual"), 4).as("expected_residual"),
        round(col("confidence"), 4).as("confidence"),
        round(col("q_025"), 4).as("q_025"), round(col("q_975"), 4).as("q_975"))
    }),
    "q71_uq_v2" -> ((s, dir) => {
      // pure applicability-domain UQ: neighbor stats + percentile-rank
      // confidence + neighbor-target-quantile intervals — fully
      // relational, oracle-checked
      // distances rounded to 9dp before the k-boundary and stats to 6dp
      // before percentile ranking: both engines sum floats in different
      // orders, and unrounded ulp noise flips tie-breaks / rank edges
      val e = embDouble(s, dir).filter(col("vec_id") < 300)
      val nn = Proximity.knnJoin(e, e, "vec_id", "embedding", 10,
        (a, b) => round(Proximity.euclidean(a, b), 9))
      val m = graft.ml.UQ.fitV2(nn, e, "vec_id", "label", k = 10,
        statsRound = Some(6))
      val out = m.predict(e.filter(col("vec_id") < 50), nn, e, "vec_id", "label",
        statsRound = Some(6))
      out.select(col("id") +: out.columns.filterNot(_ == "id")
        .map(c => round(col(c), 6).as(c)).toIndexedSeq: _*)
    }),
    "q72_aggregate_rows" -> ((s, dir) =>
      Transforms.aggregateRows(t(s, dir, "lineitem"), "l_returnflag",
        Seq("l_quantity", "l_extendedprice", "l_discount"))
        .select(col("l_returnflag"), round(col("l_quantity"), 4).as("l_quantity"),
          round(col("l_extendedprice"), 4).as("l_extendedprice"),
          round(col("l_discount"), 4).as("l_discount"), col("group_count"))),
    "q73_data_capture_parse" -> ((s, dir) => {
      // SageMaker capture round-trip: pack events into CSV capture
      // payloads, parse them back with the capture parser — output must
      // equal the source rows (oracle = the source table)
      val payloads = t(s, dir, "events")
        .select(col("event_id"), col("value"))
        .withColumn("chunk", col("event_id") % 20)
        .groupBy("chunk")
        .agg(concat_ws("\n",
          collect_list(concat_ws(",", col("event_id"), col("value")))).as("body"))
        .select(concat(lit("event_id,value\n"), col("body")).as("data"),
          lit("CSV").as("encoding"),
          lit(null).cast("timestamp").as("timestamp"))
      graft.sources.DataCapture.parsePayloads(payloads)
        .select(col("event_id").cast("bigint").as("event_id"),
          col("value").cast("double").as("value"))
    }),
    "q74_roc_auc" -> ((s, dir) =>
      // does `value` rank purchases above other events? tie-aware
      // rank-sum AUC, distinct-score cumulative window
      graft.ml.Metrics.rocAuc(
        t(s, dir, "events").withColumn("is_purchase",
          (col("event_type") === "purchase").cast("int")),
        "is_purchase", "value")),
    "q75_cosine_near_dup" -> ((s, dir) =>
      // embedding-cosine near-dup pairs: brute baseline (oracle path);
      // Dedup.cosinePairsLsh is the bucketed scale path (spec-checked)
      Dedup.cosinePairs(t(s, dir, "embeddings").filter(col("vec_id") < 300),
        "vec_id", "embedding", 0.35)),
    "q76_classification_metrics" -> ((s, dir) => {
      // full compute_classification_metrics: per-class P/R/F1/support +
      // one-vs-rest ROC-AUC from proba columns + weighted 'all' row
      val labels = Seq("click", "error", "purchase", "signup", "view")
      val base = t(s, dir, "events").withColumn("prediction",
        when(col("value") >= 100, "purchase").otherwise(col("event_type")))
      val withProba = labels.zipWithIndex.foldLeft(base) { case (d, (l, i)) =>
        d.withColumn(s"${l}_proba", col("value") * (i + 1) % 100 / 100)
      }
      graft.ml.Metrics.classificationMetricsFull(
        withProba, "event_type", "prediction", labels)
    }),
    "q77_proba_expand" -> ((s, dir) => {
      // proba array -> per-label columns + rowwise max confidence
      // (pandas_utils.py:1045-1075, 270-307)
      val df = t(s, dir, "events").select(col("event_id"),
        array(col("value") % 1, lit(1.0) - col("value") % 1).as("pred_proba"))
      graft.ml.Models.withConfidence(
        graft.ml.Models.expandProba(df, "pred_proba", Seq("no", "yes")), "pred_proba")
        .select(col("event_id"),
          round(col("no_proba"), 6).as("no_proba"),
          round(col("yes_proba"), 6).as("yes_proba"),
          round(col("confidence"), 6).as("confidence"))
    }),
    "q78_psi_drift" -> ((s, dir) => {
      // PSI drift of a shifted copy vs the original distribution
      val base = t(s, dir, "events").select(col("value"))
      val cur = t(s, dir, "events").select((col("value") * 1.2 + 5).as("value"))
      graft.eda.Quality.psiDrift(cur, base, Seq("value"))
    }),
    "q79_endpoint_inference" -> ((s, dir) => {
      // FULL artifact lifecycle (model → endpoint → captured inference):
      // a fixed-coefficient formula model keeps the predictions engine-
      // deterministic, so the InferenceStore read-back is oracle-exact
      val cat = lifecycleCatalog(s, dir)
      cat.inferenceStore.byModel("price_model")
        .select(col("id").cast("bigint").as("id"),
          round(col("pred_value"), 4).as("pred_value"))
    }),
    "q80_inference_metrics" -> ((s, dir) => {
      // metrics round-trip: computed at capture time, persisted under
      // the run dir, read back through the Model artifact
      val m = lifecycleCatalog(s, dir).model("price_model")
      m.getInferenceMetrics("run1").get
        .select(round(col("rmse"), 2).as("rmse"), round(col("mae"), 2).as("mae"),
          round(col("medae"), 2).as("medae"), col("r2"))
    }),
    "q81_monitor_drift" -> ((s, dir) => {
      // monitor lifecycle: baseline persist → capture-enabled inference
      // on shifted inputs → drift report of the PARSED capture (CSV
      // round-trip) against the stored baseline
      val root = java.nio.file.Files.createTempDirectory("graft-q81").toString
      val cat = new graft.api.Catalog(s, root)
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
      val m = cat.onboardFormulaModel("mon_model", 10.0,
        Seq("l_quantity" -> 2.0, "l_discount" -> -5.0), target = "l_extendedprice")
      val ep = m.toEndpoint("mon-endpoint")
      val mon = ep.monitor
      mon.createBaseline(li.select("l_quantity", "l_discount"),
        Seq("l_quantity", "l_discount"))
      mon.enableDataCapture()
      ep.inference(li.withColumn("l_quantity", col("l_quantity") * 1.5 + 2),
        idColumn = Some("l_orderkey"))
      val parsed = mon.capturedData(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("l_quantity",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("l_discount",
          org.apache.spark.sql.types.DoubleType))))
      mon.driftReport(parsed, Seq("l_quantity", "l_discount"))
        .select(col("column_name"), col("psi"),
          round(col("base_mean"), 6).as("base_mean"),
          round(col("cur_mean"), 6).as("cur_mean"),
          col("mean_drift"), col("drifted"))
    }),
    "q82_cross_fold" -> ((s, dir) => {
      // cross-fold OOF runner: deterministic hash folds + stitched
      // frame (formula model keeps predictions engine-exact, so fold
      // assignment AND the stitched OOF are both oracle-checked)
      val cat = lifecycleCatalog(s, dir)
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
      cat.endpoint("price-endpoint")
        .crossFoldInference(li, idColumn = "l_orderkey", k = 5, capture = false)
        .select(col("l_orderkey").cast("bigint").as("id"), col("fold"),
          round(col("prediction"), 4).as("prediction"))
    }),
    "q83_property_tags" -> ((s, dir) => {
      // tag catalog as data (mol_tagging.py:200-228): deterministic
      // pseudo-descriptors from part, tagged via the rule catalog's
      // violation-count engine — no RDKit anywhere
      graft.functions.TagCatalog.applyPropertyRules(
          partDescriptors(s, dir), "id", graft.functions.TagCatalog.propertyRules(s))
        .select(col("id"), array_join(col("tags"), ",").as("tags"))
    }),
    "q84_curation_filter" -> ((s, dir) => {
      // end-to-end tag-driven curation (mol_tagging.py:240-288 +
      // :386-434): underlying tags ∪ property-rule tags → policy-derived
      // curation tags → filterByTags drops curation:exclude rows
      val TC = graft.functions.TagCatalog
      val p = partDescriptors(s, dir)
      val underlying = p.withColumn("tags", filter(array(
        when(col("id") % 41 === 0, "composition:inorganic"),
        when(col("id") % 37 === 0, "composition:heavy_metal"),
        when(col("id") % 23 === 0, "liabilities:pains_a"),
        when(col("id") % 5 === 0, "composition:halogenated")), _.isNotNull))
      val propTags = TC.applyPropertyRules(p, "id", TC.propertyRules(s), "prop_tags")
      val tagged = underlying.join(propTags, Seq("id"), "left")
        .withColumn("tags",
          sort_array(concat(col("tags"), coalesce(col("prop_tags"),
            array().cast("array<string>")))))
      val curated = TC.deriveCurationTags(tagged, TC.curationPolicy(s))
        .withColumn("tags", sort_array(concat(col("tags"), col("curation_tags"))))
      graft.proximity.Analytics.filterByTags(curated,
          excludePrefix = Seq("curation:exclude:"))
        .select(col("id"),
          array_join(filter(col("tags"), _.startsWith("curation:")), ",")
            .as("curation_tags"))
    }),
    "q85_curation_funnel" -> ((s, dir) =>
      // end-to-end corpus-curation funnel (quality gate → language gate
      // → exact dedup), per-source counts — composes q29-q31 + q27 the
      // way an ingest pipeline runs them
      graft.text.Curation.funnel(t(s, dir, "documents"), "doc_id", "text",
        "source", graft.text.Curation.Config(
          minWords = 40, maxPunctRatio = 0.05, langs = Seq("en", "fr"))))
    ,
    "q86_sql_surface" -> ((s, dir) => {
      // the library's SQL surface: same codegen'd expressions as the
      // Column API, reached through plain spark.sql after one
      // SqlFunctions.install (or spark.sql.extensions wiring)
      graft.functions.SqlFunctions.install(s)
      t(s, dir, "documents").createOrReplaceTempView("documents_sqlv")
      s.sql("""SELECT doc_id, graft_fingerprint(text) AS fingerprint,
                 CAST(graft_word_count(text) AS BIGINT) AS n_words,
                 graft_lang_id(text) AS lang_pred
               FROM documents_sqlv""")
    }),
    "q87_cached_inference" -> ((s, dir) => {
      // InferenceCache lifecycle (api/inference_cache.py): seed the
      // cache with the even-key half, then run the FULL frame — even
      // keys served from the cache, odd keys computed and appended; the
      // returned frame is exactly what the uncached endpoint produces
      val root = java.nio.file.Files.createTempDirectory("graft-q87").toString
      val cat = new graft.api.Catalog(s, root)
      val ords = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val m = cat.onboardFormulaModel("order_price_model", 5.0,
        Seq("o_totalprice" -> 0.1), target = "__absent__")
      val ep = m.toEndpoint("order-price-end")
      val cache = new graft.api.InferenceCache(ep, "o_orderkey")
      // the seed call's cache append runs eagerly inside inference()
      cache.inference(ords.filter(col("o_orderkey") % 2 === 0))
      cache.inference(ords)
        .select(col("o_orderkey"), col("o_totalprice"),
          round(col("prediction"), 4).as("prediction"))
    }),
    "q88_ensemble_weighted" -> ((s, dir) => {
      // WeightedMean DAG node: ONE union+groupBy over three model
      // branches; binary-exact weights (2,1,1)→(.5,.25,.25) and
      // power-of-two confidence denominators keep every aggregate
      // exactly representable, so the oracle matches without rounding
      val ev = t(s, dir, "events").select("event_id")
      def up(pm: Int, cm: Int) = ev.select(col("event_id"),
        (col("event_id") % pm).cast("double").as("prediction"),
        ((col("event_id") % cm).cast("double") / cm).as("confidence"))
      graft.ml.Ensemble.WeightedMean("wmean", Seq(2.0, 1.0, 1.0))(
          Seq(up(10, 16), up(7, 8), up(5, 4)), "event_id")
        .select(col("event_id"), col("prediction"), col("confidence"))
    }),
    "q89_ensemble_vote" -> ((s, dir) => {
      // majority Vote node: two stacked groupBys, winner = most common
      // label with the smallest-label tie-break (pandas mode()[0])
      val ev = t(s, dir, "events").select("event_id", "event_type", "value")
      val u1 = ev.select(col("event_id"), col("event_type").as("prediction"))
      val u2 = ev.select(col("event_id"),
        when(col("value") >= 50, "view").otherwise(col("event_type"))
          .as("prediction"))
      val u3 = ev.select(col("event_id"),
        when(col("event_id") % 3 === 0, "click").otherwise(col("event_type"))
          .as("prediction"))
      graft.ml.Ensemble.Vote("vote")(Seq(u1, u2, u3), "event_id")
        .select(col("event_id"), col("prediction"),
          round(col("confidence"), 6).as("confidence"))
    }),
    "q90_ensemble_perf" -> ((s, dir) => {
      // EnsembleSimulator per-model performance over aligned frames
      // (ensemble_simulator.py:307-342); integer-derived predictions
      // keep every error-sum exact across engines (spearman /
      // conf_err_corr stay spec-checked — rank kernels are engine-side)
      val ev = t(s, dir, "events").select("event_id")
      def frame(pm: Int, cm: Int) = ev.select(col("event_id"),
        (col("event_id") % 12).cast("double").as("target"),
        (col("event_id") % pm).cast("double").as("prediction"),
        ((col("event_id") % cm).cast("double") / cm).as("confidence"))
      val sim = graft.ml.EnsembleSimulator.fromFrames(
        Seq("m_a" -> frame(10, 16), "m_b" -> frame(7, 8), "m_c" -> frame(5, 4)),
        "event_id", "target")
      // modelPerformance materializes to driver-side literal rows, so
      // releasing the aligned frame before returning is safe; the rank
      // columns aren't in the oracle projection — skip their pipelines
      val out = sim.modelPerformance(withRankCorrelations = false)
        .select("model", "rmse", "mae", "r2", "mean_conf")
      sim.release()
      out
    }),
    "q91_model_comparison" -> ((s, dir) => {
      // champion/challenger comparison over two captured runs
      // (model_comparison.py): per-model metrics rows + the
      // metrics-aware delta (lower-is-better flipped so positive always
      // means model B is better)
      val root = java.nio.file.Files.createTempDirectory("graft-q91").toString
      val cat = new graft.api.Catalog(s, root)
      val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
        .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
      val ma = cat.onboardFormulaModel("cmp_a", 10.0,
        Seq("l_quantity" -> 2.0, "l_discount" -> -5.0), target = "l_extendedprice")
      val mb = cat.onboardFormulaModel("cmp_b", 50.0,
        Seq("l_quantity" -> 3.0), target = "l_extendedprice")
      // two independent endpoint inferences overlapped (guide §2.6 —
      // same computation, per-model capture dirs, locked shared stores)
      parallelEach(Seq(ma -> "cmp-a-end", mb -> "cmp-b-end")) {
        case (m, e) => m.toEndpoint(e)
          .inference(li, captureName = Some("run1"), idColumn = Some("l_orderkey")) }
      graft.api.ModelComparison.compare(ma, mb, "run1").get
        .select(col("model"), round(col("rmse"), 4).as("rmse"),
          round(col("mae"), 4).as("mae"), round(col("medae"), 4).as("medae"),
          round(col("r2"), 6).as("r2"))
    }),
    "q92_ks_test" -> ((s, dir) => {
      // two-sample KS statistic of a shifted copy vs the original —
      // ECDF gaps via the same bucket-partitioned prefix-sum as rocAuc
      val base = t(s, dir, "events").select(col("value"))
      val cur = t(s, dir, "events").select((col("value") * 1.1 + 3).as("value"))
      graft.eda.Quality.ksTest(cur, base, "value").select("statistic")
    }),
    "q93_js_divergence" -> ((s, dir) => {
      // Jensen-Shannon divergence + fixed-bin PSI over one shared
      // epsilon-padded histogram (distribution_stats.py:75-126)
      val a = t(s, dir, "events").select(col("value"))
      val b = t(s, dir, "events").select((col("value") * 1.2 + 5).as("value"))
      graft.eda.Quality.jsDivergence(a, b, "value",
        bins = 10, rangeMin = 0.0, rangeMax = 150.0)
    }),
    "q94_contest_report" -> ((s, dir) => {
      // champion + ranked challengers in one publishable table
      // (model_comparison.py contest_report): metric columns interleaved
      // with deltas vs the champion, contest-level contested flag
      val root = java.nio.file.Files.createTempDirectory("graft-q94").toString
      val cat = new graft.api.Catalog(s, root)
      val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
        .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
      val champ = cat.onboardFormulaModel("champ_m", 10.0,
        Seq("l_quantity" -> 2.0, "l_discount" -> -5.0), target = "l_extendedprice")
      val chA = cat.onboardFormulaModel("chall_a", 50.0,
        Seq("l_quantity" -> 3.0), target = "l_extendedprice")
      val chB = cat.onboardFormulaModel("chall_b", 0.0,
        Seq("l_quantity" -> 1.0), target = "l_extendedprice")
      // the three endpoints' inferences are independent — submit them
      // from a small thread pool so each job's straggler tail back-fills
      // with the next model's work (guide §2.6); results are identical
      // (per-model capture dirs; the shared param/inference stores
      // serialize on their per-root locks)
      parallelEach(Seq(champ -> "champ-m-end", chA -> "chall-a-end",
        chB -> "chall-b-end")) { case (m, e) => m.toEndpoint(e)
          .inference(li, captureName = Some("run1"), idColumn = Some("l_orderkey")) }
      graft.api.Contests.contestReport(champ, Seq(chA, chB), "champ-m-end", "run1")
        .get.select(col("model"), col("role"),
          round(col("rmse"), 4).as("rmse"), round(col("d_rmse"), 4).as("d_rmse"),
          round(col("mae"), 4).as("mae"), round(col("d_mae"), 4).as("d_mae"),
          col("contested"))
    }),
    "q95_uq_metrics" -> ((s, dir) => {
      // UQ evaluation pack over a deterministic pseudo-UQ frame
      // (model_utils.py:540-690), Gaussian-bounds path; the CRPS and
      // rank-correlation columns are engine-side (erf / rank kernel)
      // and stay spec-checked
      val uq = t(s, dir, "lineitem").select(
        col("l_extendedprice").as("y"),
        (col("l_extendedprice") * 0.9 + 100).as("prediction"),
        (col("l_quantity") * 50 + 100).as("prediction_std"))
      graft.ml.UQMetrics.uqMetrics(uq, "y")
        .select("coverage_68", "coverage_80", "coverage_90", "coverage_95",
          "median_std", "median_width_50", "median_width_68",
          "median_width_80", "median_width_90", "median_width_95",
          "interval_score_95", "n_samples")
    }),
    "q96_vocabulary" -> ((s, dir) =>
      // corpus vocabulary (term + document frequency) — the tokenizer-
      // training pre-pass; one explode, two stacked groupBys
      graft.text.Text.vocabulary(t(s, dir, "documents"), "doc_id", "text",
        minCount = 5L)),
    "q97_cached_stats" -> ((s, dir) => {
      // cached artifact handle lifecycle (cached/cached_data_source.py):
      // onboard → CachedDataSource → stats computed once, the second
      // call answers from the shared ArtifactCache — the returned frame
      // IS the cached checkpoint, values oracle-checked
      val root = java.nio.file.Files.createTempDirectory("graft-q97").toString
      val cat = new graft.api.Catalog(s, root)
      cat.onboard("q97_customer", t(s, dir, "customer")
        .select("c_custkey", "c_acctbal", "c_nationkey"))
      val cds = cat.cachedDataSource("q97_customer")
      cds.descriptiveStats() // compute + cache
      val d = cds.descriptiveStats() // served from cache
      d.select(col("column_name"), col("min"), round(col("q1"), 6).as("q1"),
        round(col("median"), 6).as("median"), round(col("q3"), 6).as("q3"),
        col("max"), round(col("mean"), 6).as("mean"),
        round(col("stddev"), 6).as("stddev"))
    }),
    "q100_synthetic_ml" -> ((s, dir) => {
      // synthetic generator surface (rows-only: the hash-noise stream is
      // engine-specific by construction) — person_data exercises the
      // correlated-column chain end to end
      graft.sources.SyntheticData.personData(s, rows = 200)
    }),
    "q99_multi_task_combine" -> ((s, dir) => {
      // single-task -> multi-task merge (utils/multi_task.py:44-250):
      // two deterministic task frames from part; the 31-60 overlap gets
      // both targets on one row with the PRIMARY frame's features
      val p = t(s, dir, "part")
      val a = p.filter(col("p_partkey") <= 60)
        .select(col("p_partkey").as("id"), col("p_name").as("smiles"),
          col("p_size").cast("double").as("feat_size"),
          col("p_retailprice").as("feat_price"),
          (col("p_partkey") % 7).cast("double").as("sol"))
      val b = p.filter(col("p_partkey") > 30 && col("p_partkey") <= 90)
        .select(col("p_partkey").as("id"), col("p_name").as("smiles"),
          (col("p_size") + 1).cast("double").as("feat_size"),
          col("p_retailprice").as("feat_price"),
          (col("p_partkey") % 5).cast("double").as("perm"))
      graft.ml.MultiTask.combine(Seq(a, b), Seq(Seq("sol"), Seq("perm")))
        .orderBy("id")
    }),
    "q98_compound_registry" -> ((s, dir) => {
      // Compound record lifecycle (api/compound.py): deterministic tags
      // from part attributes → save → REOPENED catalog reads them back
      // from registry meta — persistence, not session state
      val root = java.nio.file.Files.createTempDirectory("graft-q98").toString
      val cat = new graft.api.Catalog(s, root)
      val parts = t(s, dir, "part").filter(col("p_partkey") <= 20)
        .select("p_partkey", "p_name", "p_size", "p_type")
        .collect().sortBy(_.getLong(0))
      cat.compounds.saveAll(parts.toSeq.map { r =>
        val c0 = graft.api.Compound(s"c${r.getLong(0)}",
          smiles = Some(r.getString(1)))
        val c1 = if (r.getInt(2) > 25) c0.addTag("big") else c0
        val c2 = if (r.getString(3).contains("BRASS")) c1.addTag("brassy") else c1
        c2.addMeta("size", r.getInt(2).toString)
      })
      val reopened = new graft.api.Catalog(s, root)
      val rows = reopened.compounds.getAll()
        .map(c => (c.id, c.smiles.orNull, c.tags.mkString(","),
          c.meta.getOrElse("size", "")))
      import s.implicits._
      rows.toDF("id", "smiles", "tags", "size")
        .orderBy(expr("CAST(substr(id, 2) AS BIGINT)"))
    }),
    // ───────── training-data pipeline, second wave (north-star) ─────────
    "q101_pii_scrub" -> ((s, dir) => {
      // documents carry no PII by construction — plant deterministic
      // contact strings on a doc_id-keyed subset, then detect + redact
      val d = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact u"), col("doc_id").cast("string"),
            lit("@example.com now")))
        .when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" call 555-123-4567 or ping 10.0.0."),
            (col("doc_id") % 250).cast("string")))
        .otherwise(col("text")).as("text"))
      graft.text.Scrub.piiSignals(d, "text")
        .select(col("doc_id"), col("n_emails").cast("long").as("n_emails"),
          col("n_phones").cast("long").as("n_phones"),
          col("n_ipv4").cast("long").as("n_ipv4"), col("has_pii"),
          graft.text.Scrub.redact(col("text")).as("redacted"))
    }),
    "q102_repetition_signals" -> ((s, dir) =>
      graft.text.Text.repetitionSignals(
          t(s, dir, "documents").select("doc_id", "text"), "text", lineWidth = 32)
        .drop("text")),
    "q103_line_dedup" -> ((s, dir) =>
      graft.text.LineDedup.dedupCharChunks(
        t(s, dir, "documents"), "doc_id", "text", width = 16, maxFreq = 1)),
    "q104_packing_manifest" -> ((s, dir) =>
      graft.text.Packing.packingManifest(
        t(s, dir, "documents"), "doc_id", "text", maxLen = 512)),
    "q105_domain_mixture" -> ((s, dir) => {
      // mix on lang (skewed counts) — per-source fractions + the
      // deterministic md5-hash sample's per-source size
      val docs = t(s, dir, "documents")
      val fr = graft.text.Mixing.temperatureFractions(docs, "lang", 0.7, 200)
      val sampled = graft.text.Mixing
        .temperatureSample(docs, "doc_id", "lang", 0.7, 200)
        .groupBy(col("lang").as("source")).agg(count(lit(1)).as("n_sampled"))
      fr.join(sampled, Seq("source"), "left").na.fill(0L, Seq("n_sampled"))
    }),
    "q106_contamination" -> ((s, dir) => {
      // benchmark = doc_id < 100, corpus = the rest; 4-gram overlap
      val docs = t(s, dir, "documents")
      graft.text.Contamination.contaminated(
        docs.filter(col("doc_id") >= 100), "doc_id", "text",
        docs.filter(col("doc_id") < 100), "doc_id", "text", n = 4)
    }),
    "q107_embedding_drift" -> ((s, dir) =>
      graft.proximity.Embeddings.centroidDrift(
        t(s, dir, "embeddings"), "label", "embedding")),
    "q112_embedding_spread" -> ((s, dir) =>
      graft.proximity.Embeddings.groupSpread(
        t(s, dir, "embeddings"), "label", "embedding")),
    "q110_corpus_report" -> ((s, dir) =>
      graft.text.CorpusReport.report(t(s, dir, "documents"), "text", "source")),
    "q113_chunk_documents" -> ((s, dir) =>
      graft.text.Text.chunkDocuments(
        t(s, dir, "documents"), "doc_id", "text", size = 8, stride = 4)),
    "q111_bpe_tokenize" -> ((s, dir) => {
      // tokenizer-training lifecycle (rows-only: merge table is a
      // learned artifact): train 64 merges on the corpus, re-encode it
      val docs = t(s, dir, "documents")
      val merges = graft.text.Bpe.trainMerges(docs, "text", numMerges = 64)
      docs.select(col("doc_id"),
        graft.text.Bpe.tokenCount(col("text"), merges).as("n_bpe_tokens"))
    }),
    "q109_lm_score" -> ((s, dir) => {
      // CCNet-shape quality scoring: unigram LM from the first half of
      // the corpus, every other document scored against it
      val docs = t(s, dir, "documents")
      val lm = graft.text.Text.unigramLm(
        docs.filter(col("doc_id") < 250), "doc_id", "text", minCount = 2)
      graft.text.Text.lmScore(
        docs.filter(col("doc_id") >= 250), "doc_id", "text", lm)
    }),
    "q108_ivf_index" -> ((s, dir) => {
      // persistent-ANN lifecycle (rows-only: KMeans cells are
      // engine-specific): build the cell-partitioned index, then the
      // partition-pruned query path
      val path = java.nio.file.Files.createTempDirectory("graft-q108").toString
      val emb = t(s, dir, "embeddings")
      graft.proximity.IvfIndex.build(emb, "vec_id", "embedding", path, nCells = 16)
      graft.proximity.IvfIndex.query(s, path, emb.filter(col("vec_id") < 100),
        "vec_id", "embedding", k = 5, nProbe = 4)
    }),
    "q115_exact_substring" -> ((s, dir) =>
      // ExactSubstr dedup modality (Lee et al. 2022): pairs sharing a
      // verbatim ≥20-token run, with covering spans — anchor-gram join,
      // doc-frequency boilerplate guard at 100
      graft.dedup.Substrings.exactSubstringPairs(
        t(s, dir, "documents"), "doc_id", "text",
        minTokens = 20, maxDocFreq = 100)),
    "q116_substring_scrub" -> ((s, dir) =>
      // span-level removal (the cut half of ExactSubstr): lowest-id
      // occurrence keeps its text, later docs lose the covered tokens
      graft.dedup.Substrings.removeSharedSpans(
        t(s, dir, "documents"), "doc_id", "text",
        minTokens = 20, maxDocFreq = 100)),
    "q117_quality_classifier" -> ((s, dir) => {
      // model-based quality filter (GPT-3 appendix A): train a hashed
      // bag-of-tokens logistic classifier against a deterministic seed
      // label (lang='en' as the "reference corpus" class), score every
      // doc, mark the deterministic pareto-keep verdict. Rows-only:
      // probabilities are engine-specific (L-BFGS fit).
      val docs = t(s, dir, "documents")
      val labeled = docs.filter(col("doc_id") % 2 === 0)
        .withColumn("label", (col("lang") === "en").cast("int"))
      val model = graft.text.QualityModel.train(labeled, "text", "label",
        numFeatures = 1 << 15)
      val scored = graft.text.QualityModel.score(model, docs, "text")
      val kept = graft.text.QualityModel.paretoKeep(scored, "doc_id")
        .select(col("doc_id")).withColumn("kept", lit(1))
      scored.join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("quality_prob"),
          coalesce(col("kept"), lit(0)).as("kept"))
    }),
    "q114_gbt_lifecycle" -> ((s, dir) => {
      // tree-model train→deploy→infer→metrics-read-back lifecycle
      // (rows-only: GBT predictions are engine-specific). The reference's
      // default model scripts train XGBoost ensembles
      // (features_to_model.py:162-211); "gbt" is the MLlib analogue and
      // is recorded as model-defining meta so cross-fold refits reuse it.
      val root = java.nio.file.Files.createTempDirectory("graft-q114").toString
      val cat = new graft.api.Catalog(s, root)
      val li = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 10 === 0) // deterministic subsample
        .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
      val fitted = graft.ml.Models.trainRegressor(li,
        Seq("l_quantity", "l_discount"), "l_extendedprice", algo = "gbt")
      val m = cat.onboardModel("gbt_price", fitted, "regressor",
        "l_extendedprice", Seq("l_quantity", "l_discount"), algo = "gbt")
      m.toEndpoint("gbt-endpoint")
        .inference(li, captureName = Some("run1"), idColumn = Some("l_orderkey"))
      m.getInferenceMetrics("run1").get
        .select(round(col("rmse"), 2).as("rmse"), round(col("mae"), 2).as("mae"),
          round(col("medae"), 2).as("medae"), round(col("r2"), 4).as("r2"))
    }),
    "q118_hpo_search" -> ((s, dir) => {
      // hyperparameter search over the q114 fixture (rows-only: GBT fold
      // metrics are engine-specific). Deterministic under seed 42: the
      // sampler is a pure function of (space, seed) and the fold split is
      // the hashed id column (reference trial contract:
      // training/hpo_harness.py:237-297, hpo_runner.py:64-79).
      // % 101 subsample: a trial is k GBT fits and the search is nTrials
      // of them — the harness contract (sampling, fold scoring, trial
      // table) is what's under test, so the fixture stays fit-cheap.
      // 101 (odd) keeps id parity mixed: the Knuth fold hash preserves
      // parity, so all-even ids would collapse every row into fold 0
      val li = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 101 === 0)
        .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
      val space = Map[String, graft.ml.Hpo.ParamSpec](
        "maxDepth" -> graft.ml.Hpo.IntRange(2, 5),
        "maxIter" -> graft.ml.Hpo.IntRange(5, 10, 5),
        "stepSize" -> graft.ml.Hpo.FloatRange(0.05, 0.3, log = true))
      val res = graft.ml.Hpo.runSearch(space, nTrials = 3, seed = 42L)(
        graft.ml.Hpo.regressorTrialFn(li, "l_orderkey",
          Seq("l_quantity", "l_discount"), "l_extendedprice", "gbt", k = 2))
      graft.ml.Hpo.trialsDf(s, res)
    }),
    "q119_feature_importance" -> ((s, dir) => {
      // feature-importance read-back through the registry (rows-only:
      // impurity importances are engine-specific). Train→onboard→read
      // via a FRESH catalog handle over the same root, proving the
      // importances persist in registry meta, not the live JVM object.
      val root = java.nio.file.Files.createTempDirectory("graft-q119").toString
      val li = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 10 === 0)
        .select("l_orderkey", "l_quantity", "l_discount", "l_tax", "l_extendedprice")
      val fitted = graft.ml.Models.trainRegressor(li,
        Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice", algo = "rf")
      new graft.api.Catalog(s, root).onboardModel("rf_price", fitted, "regressor",
        "l_extendedprice", Seq("l_quantity", "l_discount", "l_tax"), algo = "rf")
      new graft.api.Catalog(s, root).model("rf_price").getFeatureImportance().get
        .select(col("feature"), round(col("importance"), 4).as("importance"), col("rank"))
    }),
    "q120_c4_filters" -> ((s, dir) => {
      // The synthetic corpus is punctuation-free word soup, so derive
      // structured pages deterministically (both engines compute the
      // same derivation): every 3rd doc becomes one long sentence,
      // every 3rd+1 gets sentence/line breaks at " the ", the rest stay
      // raw — giving the C4 rules genuinely mixed verdicts to grade.
      val pages = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(".")))
          .when(col("doc_id") % 3 === 1,
            regexp_replace(col("text"), " the ", ".\n"))
          .otherwise(col("text")).as("text"))
      graft.text.C4.pageFilters(pages, "doc_id", "text").orderBy("doc_id")
    }),
    "q121_semantic_dedup" -> ((s, dir) => {
      // SemDeDup over the embeddings table (rows-only: KMeans centroids
      // are MLlib-specific). The synthetic embeddings carry no
      // high-cosine pairs (max pairwise ~0.51), so plant deterministic
      // semantic twins: scaled copies of the first 25 vectors — scaling
      // preserves direction, so each (original, clone) pair has cosine
      // exactly 1 and must collapse to one survivor.
      val base = t(s, dir, "embeddings")
      val clones = base.filter(col("vec_id") < 25).select(
        (col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.1f)).as("embedding"),
        col("label"))
      // maxClusterSize 512: with fixed nClusters the per-cluster
      // population grows linearly with the corpus and the pair join
      // quadratically — the cap sub-blocks oversized clusters so pair
      // work stays linear in n (round-7 ladder: 8.4 s → 108 s at 10×
      // uncapped; the documented recall trade of the cap)
      graft.dedup.SemDedup.semDedup(base.unionByName(clones),
        "vec_id", "embedding", nClusters = 8, tau = 0.9,
        maxClusterSize = 512)
        .orderBy("id")
    }),
    "q122_url_curation" -> ((s, dir) => {
      // URL gate over deterministically-derived URLs (the corpus has no
      // url column; both engines compute the same derivation): five
      // shapes exercising scheme/www/query/fragment/case stripping,
      // path collisions (doc_id % 40) for the per-URL dedup, and two
      // blocklisted domains
      val d = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(lit("https://www."), col("source"),
            lit(".example.com/page/"), (col("doc_id") % 40).cast("string"),
            lit("?utm=x")))
          .when(col("doc_id") % 5 === 1,
            concat(lit("http://"), col("source"),
              lit(".example.com/page/"), (col("doc_id") % 40).cast("string"),
              lit("/")))
          .when(col("doc_id") % 5 === 2,
            concat(lit("HTTPS://ads.tracker.net/click/"),
              col("doc_id").cast("string")))
          .when(col("doc_id") % 5 === 3,
            concat(lit("https://"), col("source"),
              lit(".example.COM/page/"), (col("doc_id") % 40).cast("string"),
              lit("#frag")))
          .otherwise(
            concat(lit("spam.example.org/offer/"),
              (col("doc_id") % 7).cast("string")))
          .as("url"))
      graft.text.Urls.annotate(d, "doc_id", "url",
        Seq("tracker.net", "example.org")).orderBy("doc_id")
    }),
    "q123_perplexity_bands" -> ((s, dir) => {
      // CCNet quality ladder on the q109 LM setup: band by perplexity
      // quartiles (exact edges), keep head fully / middle half / tail 10%
      val docs = t(s, dir, "documents")
      val lm = graft.text.Text.unigramLm(
        docs.filter(col("doc_id") < 250), "doc_id", "text", minCount = 2)
      val scored = graft.text.Text.lmScore(
        docs.filter(col("doc_id") >= 250), "doc_id", "text", lm)
      graft.text.Ccnet.sampleBands(
        graft.text.Ccnet.perplexityBands(scored), "doc_id",
        headFrac = 1.0, middleFrac = 0.5, tailFrac = 0.1)
        .orderBy("doc_id")
    }),
    "q124_source_overlap" -> ((s, dir) =>
      graft.text.SourceOverlap.overlapMatrix(
        t(s, dir, "documents"), "source", "text", n = 3)
        .orderBy("source_a", "source_b")),
    "q125_pq_topk" -> ((s, dir) => {
      // PQ-compressed ANN (rows-only: codebooks are MLlib KMeans
      // artifacts). Plant scaled clones — same direction, cosine 1 —
      // so each query's own twin must surface among its top codes.
      // Codebooks memoized per (session, sfDir) like the lifecycle
      // catalog: they are a trained artifact the reference would store,
      // not per-query work (and 16 subspace fits dominate the query).
      val base = t(s, dir, "embeddings")
      val clones = base.filter(col("vec_id") < 25).select(
        (col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"),
        col("label"))
      val refs = base.unionByName(clones)
      val books = pqBooksCache.getOrElseUpdate((s, dir),
        graft.proximity.Pq.fitCodebooks(refs, "vec_id", "embedding",
          m = 16, k = 16))
      graft.proximity.Pq.adcTopKRerank(
        base.filter(col("vec_id") < 50), refs, "vec_id", "embedding",
        k = 5, books, shortlist = 50).orderBy("id", "neighbor_id")
    }),
    "q126_token_budget" -> ((s, dir) =>
      graft.text.Budget.planFromCorpus(
        t(s, dir, "documents"), "source", "text",
        totalBudget = 54000L, temperature = 0.7, maxEpochs = 2.0)
        .orderBy("source")),
    "q127_incremental_dedup" -> ((s, dir) => {
      // daily-increment lifecycle: batch1 (doc_id < 250) seeds the
      // fingerprint store, batch2 dedupes against history + itself;
      // output = batch2 survivors (oracle: an anti-join on batch1's
      // distinct fingerprints + first-occurrence within batch2)
      val docs = t(s, dir, "documents")
      val store = java.nio.file.Files
        .createTempDirectory("graft-incdedup").toString + "/fp_store"
      graft.dedup.Incremental.dedupAndIngest(s,
        docs.filter(col("doc_id") < 250), "doc_id", "text", store, "batch1")
      graft.dedup.Incremental.newDocuments(s,
        docs.filter(col("doc_id") >= 250), "doc_id", "text", store)
        .orderBy("doc_id")
    }),
    "q128_fineweb_funnel" -> ((s, dir) => {
      // FineWeb preset funnel over the q120 page derivation (mixed C4
      // verdicts), per-source accounting
      val pages = t(s, dir, "documents").select(col("doc_id"), col("source"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(".")))
          .when(col("doc_id") % 3 === 1,
            regexp_replace(col("text"), " the ", ".\n"))
          .otherwise(col("text")).as("text"))
      graft.text.Pipelines.finewebFunnel(pages, "doc_id", "text", "source")
        .orderBy("source")
    }),
    "q129_ngram_novelty" -> ((s, dir) =>
      graft.text.CorpusStats.ngramNovelty(
        t(s, dir, "documents"), "doc_id", "text", n = 3)
        .orderBy("doc_id")),
    "q130_zipf_slope" -> ((s, dir) =>
      graft.text.CorpusStats.zipfSlope(
        t(s, dir, "documents"), "source", "text")
        .orderBy("source")),
    "q131_bigram_lm_score" -> ((s, dir) => {
      // the q109 LM split, one n-gram order up: bigram+unigram
      // interpolated scoring of the held-out half
      val docs = t(s, dir, "documents")
      graft.text.NgramLm.bigramScore(
        docs.filter(col("doc_id") >= 250), "doc_id", "text",
        docs.filter(col("doc_id") < 250), minCount = 2, lambda = 0.7)
        .orderBy("doc_id")
    }),
    "q132_asof_join" -> ((s, dir) => {
      // each purchase matched to the user's most recent prior click —
      // the "state at event time" join (pandas merge_asof / DuckDB
      // ASOF JOIN), one shuffle + window, no pair blow-up
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts")
        .agg(max("event_id").as("click_id")) // unique per (key, ts)
      graft.views.Joins.asofJoin(purchases, clicks, "user_id", "ts",
        payload = Seq("click_id"))
        .select(col("event_id"), col("user_id"),
          round(col("value"), 4).as("value"),
          // no-prior-click ⇒ NULLs; sentinel-coalesced ONLY for the
          // cross-engine hash compare (NaT != NaT in the harness)
          coalesce(col("asof_ts"), to_timestamp(lit("1970-01-01"))).as("asof_ts"),
          coalesce(col("asof_click_id"), lit(-1L)).as("asof_click_id"))
    }),
    "q133_band_join" -> ((s, dir) => {
      // errors in the 10 minutes before each purchase (same user):
      // binned range join — equi-join on (key, time bucket), never a
      // BroadcastNestedLoop/cartesian
      val ev = t(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val e = ev.filter(col("event_type") === "error")
        .select("user_id", "ts", "value")
      val pairs = graft.views.Joins.bandJoin(p, e, "user_id", "ts",
        lowSec = -600, highSec = 0, leftPrefix = "p_", rightPrefix = "e_")
      val perPurchase = pairs.groupBy(col("p_event_id").as("event_id"))
        .agg(count(lit(1)).as("n_err"), dsum(col("e_value")).as("err_sum"))
      p.select("event_id").join(perPurchase, Seq("event_id"), "left")
        .select(col("event_id"),
          coalesce(col("n_err"), lit(0L)).as("n_err"),
          coalesce(col("err_sum"), lit(0.0)).as("err_sum"))
    }),
    "q134_dsir_weights" -> ((s, dir) => {
      // DSIR: per-doc target-vs-raw log-likelihood ratio under hashed
      // n-gram LMs; target = three curated sources, raw = whole corpus
      val docs = t(s, dir, "documents")
      graft.text.Dsir.importanceWeights(
        docs, docs.filter(col("source").isin("src0", "src1", "src2")),
        "doc_id", "text")
    }),
    "q135_dsir_select" -> ((s, dir) => {
      // keep the most target-like quarter: exact-percentile threshold
      // (one aggregate) + filter — no global sort at any scale
      val docs = t(s, dir, "documents")
      graft.text.Dsir.selectTopFraction(
        docs, docs.filter(col("source").isin("src0", "src1", "src2")),
        "doc_id", "text", fraction = 0.25)
    }),
    "q136_doremi_mixture" -> ((s, dir) => {
      // DoReMi inner loop: domain excess losses → multiplicative-weights
      // mixture (k-domain metadata iteration, corpus touched once)
      val ex = t(s, dir, "documents")
        .groupBy(col("source").as("domain"))
        .agg((avg(col("n_chars")) / 1000.0).as("excess"))
      graft.text.Doremi.weights(ex, "domain", "excess",
        eta = 1.0, steps = 5, smoothing = 0.01)
        .select(col("domain"), round(col("weight"), 6).as("weight"))
    }),
    "q137_unigram_tokenize" -> ((s, dir) => {
      // SentencePiece-unigram lifecycle (rows-only like q111's BPE: the
      // vocabulary is a learned artifact): train, re-encode the corpus
      val docs = t(s, dir, "documents")
      val vocab = graft.text.Unigram.train(docs, "text", vocabSize = 256,
        maxPieceLen = 6, emRounds = 3)
      docs.select(col("doc_id"),
        graft.text.Unigram.tokenCount(col("text"), vocab).as("n_unigram_tokens"))
    }),
    "q138_sessionize" -> ((s, dir) =>
      // gap-based sessionization (1h idle) + per-session rollup: one
      // shuffle on the user, lag/cumsum inside the sorted partition
      graft.operators.Events.sessionStats(
        t(s, dir, "events"), "user_id", "ts", gapSec = 3600, valueCol = "value")),
    "q139_rolling_window" -> ((s, dir) => {
      // trailing-1h per-user rolling features: RANGE window over epoch
      // micros — partition-local, never an event self-join
      val ev = t(s, dir, "events")
        .withColumn("value_d", col("value").cast(DecimalType(18, 2)))
      graft.operators.Events.rollingWindow(ev, "user_id", "ts", "value_d", 3600)
        .select(col("event_id"), col("rolling_n"),
          col("rolling_sum").cast("double").as("rolling_sum"))
    }),
    "q140_funnel" -> ((s, dir) =>
      // ordered signup→click→purchase funnel, 7-day journey horizon:
      // k entity-keyed aggregates, no event-table self-join
      graft.operators.Events.funnel(t(s, dir, "events"), "user_id", "ts",
        "event_type", Seq("signup", "click", "purchase"),
        withinSec = Some(604800L))),
    "q141_pagerank" -> ((s, dir) =>
      // centrality over the q39 proximity graph: per-iteration = one
      // src-keyed join + one dst groupBy, rank state never on the driver
      graft.proximity.Graph.pageRank(proximityEdges(s, dir), iters = 5, damping = 0.85)
        .select(col("id"), round(col("pr"), 6).as("pagerank"))),
    "q142_resample_ffill" -> ((s, dir) => {
      // hourly per-user grid over purchase values, forward-filled via
      // the as-of kernel; grid slots before the first purchase stay
      // NULL → sentinel-coalesced for the cross-engine compare
      val obs = t(s, dir, "events").filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("value").as("value"))
      graft.operators.Events.resampleFfill(obs, "user_id", "ts", "value", 3600)
        .select(col("user_id"), col("ts"),
          round(coalesce(col("asof_value"), lit(-1.0)), 4).as("value_ffill"))
    }),
    "q143_scd2_intervals" -> ((s, dir) => {
      // SCD2 build: per-user coarse state from click events; intervals
      // close at the next CHANGE (consecutive duplicates compacted)
      val st = t(s, dir, "events").filter(col("event_type") === "click")
        .groupBy("user_id", "ts")
        .agg((floor(max("value")) % 3).cast("long").as("state"))
      graft.operators.Events.scd2Intervals(st, "user_id", "ts", "state")
        // open-interval sentinel must stay inside pandas' datetime64[ns]
        // range (max 2262-04-11) or the driver's canonicalizer mangles it
        .select(col("user_id"), col("state"), col("valid_from"),
          coalesce(col("valid_to"), to_timestamp(lit("2200-01-01"))).as("valid_to"))
    }),
    "q144_weighted_sample" -> ((s, dir) =>
      // deterministic A-ES weighted sample: 5 docs per source ∝ length,
      // integer-hash draw so every engine reproduces the same sample
      graft.operators.Sampling.weightedSamplePerGroup(
        t(s, dir, "documents"), "source", "doc_id", "n_chars", k = 5)
        .select(col("source"), col("doc_id"),
          round(col("sample_key"), 6).as("sample_key"))),
    "q145_label_propagation" -> ((s, dir) => {
      // synchronous LPA communities over the q39 proximity graph —
      // deterministic (argmax vote, ties → smallest label)
      graft.proximity.Graph.labelPropagation(proximityEdges(s, dir), iters = 3)
    }),
    "q146_triangle_count" -> ((s, dir) =>
      // per-node triangles on the undirected induced graph: canonical
      // a<b edge set, two-path + closing-edge joins — never all-pairs
      graft.proximity.Graph.triangleCount(proximityEdges(s, dir))),
    "q147_rollup" -> ((s, dir) =>
      // OLAP ROLLUP: grand total + per-flag subtotals in one pass
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))),
    "q148_cube" -> ((s, dir) =>
      // OLAP CUBE over (event_type, day): all 4 grouping sets at once;
      // subtotal rows' NULL day sentinel-coalesced for the NaT compare
      t(s, dir, "events")
        .cube(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .withColumn("day", coalesce(col("day"), to_timestamp(lit("1970-01-01"))))),
    "q149_bm25" -> ((s, dir) => {
      // BM25 lexical retrieval: 5 documents used as queries against the
      // corpus — postings equi-join on the term, query side broadcast
      val docs = t(s, dir, "documents")
      val qs = docs.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"), col("text"))
      graft.text.Bm25.search(docs, "doc_id", "text", qs, "qid", "text", k = 10)
    }),
    "q150_fuzzy_join" -> ((s, dir) => {
      // PassJoin-blocked edit-distance self-join on part names (k=2):
      // segment equi-join + exact Levenshtein filter, never cartesian
      val names = t(s, dir, "part").select("p_name").distinct()
      val a = names.select(col("p_name").as("a_id"), col("p_name").as("a_name"))
      val b = names.select(col("p_name").as("b_id"), col("p_name").as("b_name"))
      graft.operators.FuzzyJoin.fuzzyJoin(a, b, "a_name", "b_name", 2, "a_id", "b_id")
        .filter(col("a_name") < col("b_name"))
        .select("a_name", "b_name", "edit_dist")
    }),
    "q151_histogram_width" -> ((s, dir) =>
      // equi-width histogram: two aggregates, no sort at any scale
      graft.eda.Histogram.equiWidth(t(s, dir, "lineitem"), "l_extendedprice", 10)),
    "q152_histogram_depth" -> ((s, dir) =>
      // equi-depth histogram: exact-percentile edges (one aggregate pass),
      // plan-constant bucket assignment — no global sort / ntile
      graft.eda.Histogram.equiDepth(t(s, dir, "events"), "value", 8)),
    "q153_tfidf_pairs" -> ((s, dir) =>
      // tf-idf lexical near-dup pairs via inverted-index self-join.
      // Fixed 500-doc slice (the q32 MinHash convention): the synthetic
      // vocabulary is ~31 terms shared by EVERY doc, so an uncapped
      // full-corpus pass is Σ df² ≈ n²·|V| — 390M pair rows at sf0.1.
      // Real corpora use the maxDocFreq cap instead (stop-word df gate);
      // here the cap would simply empty the join, so slice + exact.
      graft.text.TfIdf.similarPairs(
        t(s, dir, "documents").filter(col("doc_id") < 500), "doc_id", "text",
        minSim = 0.9, maxDocFreq = Long.MaxValue)),
    "q154_hybrid_rrf" -> ((s, dir) => {
      // hybrid retrieval: dense cosine top-20 + BM25 top-20, RRF-fused
      // (k0=60) to top-10 per query — fusion is retrieval-output-sized
      val docs = t(s, dir, "documents")
      val vecs = t(s, dir, "embeddings")
      val qs = docs.filter(col("doc_id") < 5)
        .join(vecs, col("doc_id") === col("vec_id"))
        .select(col("doc_id").as("qid"), col("text"), col("embedding"))
      graft.proximity.Hybrid.hybridSearch(
        docs, "doc_id", "text", vecs, "vec_id", "embedding",
        qs, "qid", "text", "embedding", k = 10, perList = 20)
    }),
    "q155_mutual_information" -> ((s, dir) =>
      // categorical association screen: one groupBy to cells, aggregates
      // of the cell table only
      graft.eda.Association.mutualInformation(
        t(s, dir, "events").withColumn("value_band",
          when(col("value") >= 50, "high").otherwise("low")),
        "event_type", "value_band")),
    "q156_chi_square" -> ((s, dir) =>
      graft.eda.Association.chiSquare(
        t(s, dir, "events").withColumn("value_band",
          when(col("value") >= 50, "high").otherwise("low")),
        "event_type", "value_band")),
    "q157_expectations" -> ((s, dir) => {
      // declarative contract suite: the WHOLE suite is one aggregate job
      import graft.eda.Expectations._
      validate(t(s, dir, "lineitem"), Seq(
        NotNull("l_orderkey"),
        Unique(Seq("l_orderkey", "l_linenumber")),
        InRange("l_discount", 0.0, 0.1),
        AcceptedValues("l_returnflag", Seq("A", "N", "R")),
        MatchesRegex("l_linestatus", "^[OF]$")))
    }),
    "q158_group_quantiles" -> ((s, dir) =>
      // per-group exact quantiles: one groupBy, no window/global sort
      graft.eda.GroupStats.groupQuantiles(t(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice", Seq(0.25, 0.5, 0.75, 0.9))),
    "q159_pivot" -> ((s, dir) =>
      // wide daily matrix: pivot with an EXPLICIT value list (no extra
      // distinct scan to discover columns; plan is one aggregate)
      t(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(dsum(col("value")))),
    "q160_unpivot" -> ((s, dir) =>
      // long-format melt of a wide aggregate (metadata-sized input)
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price")), "metric", "value")),
    "q161_window_funcs" -> ((s, dir) => {
      // rank-function breadth over a deterministic (unique) ordering;
      // the window partitions on o_custkey — hash-spread, never global
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        ntile(4).over(w).as("quartile"),
        round(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), 2)
          .as("delta_prev"))
    }),
    "q162_hll_shards" -> ((s, dir) =>
      // mergeable per-shard HLL sketches + union estimate — answers
      // global distincts from shard-count rows, corpus scanned once
      graft.eda.Sketches.shardEstimates(
        graft.eda.Sketches.shardSketches(t(s, dir, "events"),
          "event_type", "user_id"), "event_type")),
    "q163_rolling_anomaly" -> ((s, dir) =>
      // trailing-baseline z-score: one entity shuffle + RANGE frame
      graft.operators.Anomaly.rollingZScore(t(s, dir, "events"),
        "user_id", "ts", "value", windowSec = 86400L, minN = 5, threshold = 2.0)
        .select("event_id", "user_id", "baseline_n", "baseline_mean",
          "z", "is_anomaly")),
    "q164_cohort_retention" -> ((s, dir) =>
      graft.operators.Cohorts.retention(t(s, dir, "events"), "user_id", "ts")),
    "q165_bfs_hops" -> ((s, dir) =>
      // multi-source BFS over the proximity graph: frontier joins,
      // O(diameter) rounds, state checkpointed per hop
      graft.proximity.Graph.bfsDepths(proximityEdges(s, dir),
        embDouble(s, dir).filter(col("vec_id") < 3)
          .select(col("vec_id").as("id")), maxHops = 4)),
    "q166_woe_encoding" -> ((s, dir) =>
      graft.ml.Encoders.woeTable(
        t(s, dir, "lineitem").withColumn("label",
          (col("l_discount") > 0.05).cast("int")),
        "l_returnflag", "label")),
    "q167_target_encoding" -> ((s, dir) =>
      graft.ml.Encoders.targetEncode(t(s, dir, "orders"),
        "o_orderpriority", "o_totalprice", "prio_enc", smoothing = 20.0)
        .select("o_orderkey", "o_orderpriority", "prio_enc")),
    "q168_interval_join" -> ((s, dir) => {
      // interval-overlap join via grid blocking: equi-join on
      // (user, bucket) + exact predicate, anchor-bucket dedup-free
      val ev = t(s, dir, "events")
      val l = ev.select(col("user_id"), col("event_id"), col("ts").as("s"),
        expr("ts + INTERVAL 1800 SECOND").as("e"))
      val r = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("ts").as("s"),
          expr("ts + INTERVAL 600 SECOND").as("e"))
      graft.operators.IntervalJoin.overlapJoin(l, r, "user_id", "s", "e",
        widthSec = 1800)
        .select(col("user_id"), col("l_event_id"), col("r_event_id"))
    }),
    "q169_skew_report" -> ((s, dir) =>
      graft.eda.SkewReport.keySkew(t(s, dir, "lineitem"), "l_suppkey")),
    "q170_join_cardinality" -> ((s, dir) =>
      graft.eda.SkewReport.joinCardinality(
        t(s, dir, "lineitem").withColumnRenamed("l_orderkey", "k"),
        t(s, dir, "orders").withColumnRenamed("o_orderkey", "k"), "k")),
    "q171_bloom_blocklist" -> ((s, dir) => {
      // Bloom-pruned blocklist removal: only might_contain candidates
      // reach the confirm anti-join; result is exact
      val fp = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      val docs = t(s, dir, "documents").withColumn("fp", fp)
      val block = docs.filter(col("doc_id") % 10 === 0).select(col("fp").as("bfp"))
      graft.text.BloomBlocklist.antiJoinPruned(docs, "fp", block, "bfp",
          expectedItems = 100000L, fpp = 0.01)
        .select("doc_id")
    }),
    "q172_incremental_agg" -> ((s, dir) => {
      // incremental rollup maintenance: fold the delta batch's partial
      // aggregates into the base state — equals a full rescan exactly
      // (decimal sums are order-independent)
      import graft.stores.IncrementalAgg._
      val li = t(s, dir, "lineitem")
      val base = aggState(li.filter(col("l_orderkey") % 5 =!= 0),
        Seq("l_returnflag"), "l_extendedprice")
      val delta = aggState(li.filter(col("l_orderkey") % 5 === 0),
        Seq("l_returnflag"), "l_extendedprice")
      finalizeState(merge(base, delta, Seq("l_returnflag")))
    }),
    "q173_item_cooccur" -> ((s, dir) =>
      // market-basket pair mining: within-order self-join, catalog-
      // cardinality count tables, mega-basket cap
      graft.operators.Cooccur.itemPairs(t(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", minSupport = 2)),
    "q174_mad_outliers" -> ((s, dir) =>
      // robust modified-z outliers: two exact-percentile aggregates,
      // medians become plan constants — no sort/window
      graft.eda.Robust.madOutliers(t(s, dir, "lineitem"), "l_extendedprice")
        .select("l_orderkey", "l_linenumber", "mad_z", "is_outlier")),
    "q175_benford" -> ((s, dir) =>
      graft.eda.Robust.benford(t(s, dir, "lineitem"), "l_extendedprice")),
    "q176_group_regression" -> ((s, dir) =>
      // per-group OLS trend from ANSI regr_* aggregates: one groupBy
      graft.eda.GroupRegression.fit(t(s, dir, "lineitem"),
        "l_returnflag", "l_quantity", "l_extendedprice")),
    "q177_decayed_sum" -> ((s, dir) =>
      // recency-weighted behavior features against a FIXED as-of instant
      graft.operators.Decay.decayedAggregate(t(s, dir, "events"),
        "user_id", "ts", "value",
        java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), halfLifeDays = 7.0)),
    "q178_group_split" -> ((s, dir) =>
      // leakage-free split: side is a pure hash of the group key —
      // zero shuffle, engine-portable assignment
      graft.ml.GroupSplit.splitSummary(t(s, dir, "events"), "user_id", 0.25)),
    "q179_kcore" -> ((s, dir) =>
      // 3-round 2-core peel of the proximity graph (k=3 empties it —
      // the min_edges=2 construction caps most degrees at 2)
      graft.proximity.Graph.kcorePeel(proximityEdges(s, dir), k = 2, rounds = 3)),
    "q180_degree_stats" -> ((s, dir) =>
      graft.proximity.Graph.degreeStats(proximityEdges(s, dir))),
    "q181_entity_resolution" -> ((s, dir) =>
      // fuzzy match → components → golden record, over part names
      graft.operators.EntityResolution.goldenRecords(
        t(s, dir, "part"), "p_name", maxDist = 2)),
    "q182_weekly_report" -> ((s, dir) =>
      // period-over-period: lag/MA windows run over the WEEK table
      graft.operators.Reporting.weeklyReport(t(s, dir, "events"), "ts", "value")),
    "q183_survival" -> ((s, dir) => {
      // Kaplan–Meier time-to-first-error per user; users who never
      // error are right-censored at their last observed event
      val ev = graft.core.Tables.ltzTs(t(s, dir, "events"), "ts")
      val life = ev.groupBy(col("user_id")).agg(
          min(unix_micros(col("ts"))).as("__f"),
          min(when(col("event_type") === "error", unix_micros(col("ts"))))
            .as("__e"),
          max(unix_micros(col("ts"))).as("__l"))
        .select(
          ((coalesce(col("__e"), col("__l")) - col("__f")) /
            lit(86400.0 * 1e6)).as("duration"),
          when(col("__e").isNotNull, 1).otherwise(0).as("event"))
      graft.ml.Stats.kaplanMeier(life, "duration", "event")
    }),
    "q184_transitions" -> ((s, dir) =>
      // Markov event-type transition matrix: one entity-keyed lead
      graft.operators.Reporting.transitions(t(s, dir, "events"),
        "user_id", "ts", "event_type", "event_id")),
    "q185_welch_t" -> ((s, dir) =>
      // A/B read-out on a deterministic parity split of users
      graft.ml.Stats.welchT(
        t(s, dir, "events").withColumn("grp",
          when(col("user_id") % 2 === 0, "a").otherwise("b")),
        "grp", "value", "a", "b")),
    "q186_rolling_folds" -> ((s, dir) =>
      // leakage-free time-series CV folds: one percentile aggregate
      // for the cuts, metadata-sized count rows
      graft.ml.Stats.rollingOriginFolds(t(s, dir, "events"), "ts", k = 4)),
    "q187_calibration" -> ((s, dir) =>
      // reliability bins over a deterministic pseudo-probability
      graft.ml.Stats.calibrationBins(
        t(s, dir, "events").select((col("value") / 100).as("p"),
          when(col("event_type") === "purchase", 1).otherwise(0).as("y")),
        "p", "y", bins = 10)),
    "q188_winsorized_stats" -> ((s, dir) =>
      // outlier-resistant headline stats: percentile clip bounds become
      // plan constants, then one stats aggregate
      graft.eda.Robust.winsorizedStats(t(s, dir, "lineitem"),
        "l_extendedprice", pLo = 0.01, pHi = 0.99)),
    "q189_dow_seasonality" -> ((s, dir) =>
      graft.eda.Robust.dowSeasonality(t(s, dir, "events"), "ts", "value")),
    "q190_binned_woe" -> ((s, dir) =>
      // credit-scoring numeric WOE: equi-depth bins (6dp-quantized
      // percentile edges) scored against a binary label
      graft.ml.Encoders.binnedWoe(
        t(s, dir, "lineitem").withColumn("label",
          (col("l_discount") > 0.05).cast("int")),
        "l_extendedprice", "label", bins = 5)),
    "q191_abc_analysis" -> ((s, dir) =>
      // Pareto 80/20: one supplier-collapsing groupBy, cumulative
      // window over the catalog-sized total table
      graft.operators.Reporting.abcAnalysis(
        t(s, dir, "lineitem").withColumn("supp", col("l_suppkey").cast("string")),
        "supp", "l_extendedprice")),
    "q192_attribution" -> ((s, dir) =>
      // last-touch conversion attribution: running last-non-null touch
      // per user, conversion can't touch itself (frame ends at -1)
      graft.operators.Reporting.lastTouchAttribution(
        t(s, dir, "events"), "user_id", "ts", "event_type",
        conversionType = "purchase", touchTypes = Seq("click", "view"))),
    "q193_rfm_segments" -> ((s, dir) =>
      graft.operators.Reporting.rfmSegments(t(s, dir, "events"),
        "user_id", "ts", "value",
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), bins = 4)),
    "q194_mann_whitney" -> ((s, dir) =>
      // rank-sum A/B test on the q185 parity split — rides the rocAuc
      // bucketed rank kernel, tie-corrected normal approximation
      graft.eda.StatTests.mannWhitneyU(
        t(s, dir, "events").withColumn("grp",
          when(col("user_id") % 2 === 0, "a").otherwise("b")),
        "grp", "value", "a", "b")),
    "q195_kruskal_wallis" -> ((s, dir) =>
      graft.eda.StatTests.kruskalWallis(t(s, dir, "events"),
        "event_type", "value")),
    "q196_anova_f" -> ((s, dir) =>
      graft.eda.StatTests.anovaF(t(s, dir, "events"),
        "event_type", "value")),
    "q197_spearman_corr" -> ((s, dir) =>
      // rank correlation via the shared avg-rank kernel (scipy
      // spearmanr semantics, already spec-covered in the simulator)
      graft.ml.Metrics.spearman(t(s, dir, "lineitem"),
        "l_quantity", "l_extendedprice")),
    "q198_kendall_tau" -> ((s, dir) =>
      // τ-b from contingency cells — quadratic only in distinct-value
      // pairs (bounded-cardinality columns), never in rows
      graft.eda.StatTests.kendallTauB(t(s, dir, "lineitem"),
        "l_quantity", "l_linenumber")),
    "q199_lift_table" -> ((s, dir) =>
      // cumulative-gains deciles on the q187 pseudo-probability
      graft.ml.Lift.liftTable(
        t(s, dir, "events").select((col("value") / 100).as("p"),
          when(col("event_type") === "purchase", 1).otherwise(0).as("y")),
        "p", "y", bands = 10)),
    "q200_acf" -> ((s, dir) =>
      graft.operators.Forecast.acf(t(s, dir, "events"), "ts", "value",
        maxLag = 7)),
    "q201_cusum" -> ((s, dir) =>
      graft.operators.Forecast.cusumChangepoint(t(s, dir, "events"),
        "ts", "value")),
    "q202_forecast_eval" -> ((s, dir) =>
      graft.operators.Forecast.seasonalNaiveEval(t(s, dir, "events"),
        "ts", "value", season = 7)),
    "q203_theil_sen" -> ((s, dir) =>
      graft.operators.Forecast.theilSen(t(s, dir, "events"), "ts", "value")),
    "q204_ecod_outliers" -> ((s, dir) =>
      // ECOD joint-tail outliers over three lineitem measures; row id
      // packs (orderkey, linenumber) — linenumber is 1..7
      graft.eda.OutlierScores.ecodTopK(
        t(s, dir, "lineitem").withColumn("rid",
          col("l_orderkey") * 8 + col("l_linenumber")),
        "rid", Seq("l_quantity", "l_extendedprice", "l_discount"), k = 20)),
    "q205_link_prediction" -> ((s, dir) =>
      graft.proximity.Graph.linkPrediction(proximityEdges(s, dir))),
    "q206_profile_compare" -> ((s, dir) =>
      // snapshot drift: full lineitem vs the post-1995 slice
      graft.eda.Profile.profileCompare(
        t(s, dir, "lineitem"),
        t(s, dir, "lineitem").filter(col("l_shipdate") >= lit("1995-01-01")))),
    "q207_key_candidates" -> ((s, dir) =>
      graft.eda.Profile.keyCandidates(t(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus"))),
    "q208_functional_deps" -> ((s, dir) =>
      graft.eda.Profile.functionalDeps(t(s, dir, "orders"),
        Seq("o_orderkey" -> "o_custkey", "o_custkey" -> "o_orderstatus",
          "o_orderstatus" -> "o_orderpriority"))),
    "q209_ewma" -> ((s, dir) =>
      // adjust=true EWMA in closed pair-join form (exactly SQL-portable)
      graft.operators.Forecast.ewma(t(s, dir, "events"), "ts", "value",
        alpha = 0.3)),
    "q210_distinctive_terms" -> ((s, dir) =>
      // Fightin'-Words log-odds with Dirichlet prior, top-5 per source
      graft.text.Distinctive.distinctiveTerms(t(s, dir, "documents"),
        "source", "text", topK = 5, minCount = 5L)),
    "q211_clustering_coeff" -> ((s, dir) =>
      graft.proximity.Graph.clusteringCoefficient(proximityEdges(s, dir))),
    "q212_conversion_latency" -> ((s, dir) =>
      graft.operators.Reporting.conversionLatency(t(s, dir, "events"),
        "user_id", "ts", "event_type", "signup", "purchase")),
    "q213_salted_join" -> ((s, dir) => {
      // skew-salted fact⋈dim: result must equal the plain join — that
      // equality IS the oracle check
      val ev = t(s, dir, "events")
      val dim = ev.groupBy("user_id").agg(count(lit(1)).as("user_events"))
      graft.operators.SkewJoin.saltedJoin(ev, dim, "user_id", "event_id", 8)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("value_sum"),
          sum("user_events").as("user_events_sum"))
    }),
    "q214_readability" -> ((s, dir) =>
      graft.text.Readability.readabilityProfile(t(s, dir, "documents"),
        "source", "text")),
    "q215_info_gain" -> ((s, dir) =>
      graft.ml.InfoGain.infoGain(
        t(s, dir, "lineitem").withColumn("label",
          when(col("l_returnflag") === "R", 1).otherwise(0)),
        Seq("l_quantity", "l_extendedprice", "l_discount"), "label",
        bins = 5)),
    "q216_purged_folds" -> ((s, dir) =>
      // 1-day embargo before each validation window (purged CV)
      graft.ml.Stats.purgedRollingFolds(t(s, dir, "events"), "ts", k = 4,
        embargoUs = 86400000000L)),
    "q217_mahalanobis" -> ((s, dir) =>
      // joint-ellipse outliers on (quantity, price) — closed-form 2D
      // covariance inverse, one moments aggregate + top-k
      graft.eda.OutlierScores.mahalanobisTopK(
        t(s, dir, "lineitem").withColumn("rid",
          col("l_orderkey") * 8 + col("l_linenumber")),
        "rid", "l_quantity", "l_extendedprice", k = 20)),
    "q218_seasonal_decompose" -> ((s, dir) =>
      graft.operators.Forecast.seasonalDecompose(t(s, dir, "events"),
        "ts", "value")),
    "q219_sprt" -> ((s, dir) =>
      // early-stopping A/B monitor on the daily purchase rate
      graft.operators.Forecast.sprtTrace(t(s, dir, "events"), "ts",
        "event_type", "purchase", p0 = 0.18, p1 = 0.22)),
    "q220_power_mde" -> ((s, dir) =>
      graft.eda.StatTests.powerMde(
        t(s, dir, "events").withColumn("grp",
          when(col("user_id") % 2 === 0, "a").otherwise("b")),
        "grp", "value", "a", "b")),
    "q221_embedding_decontamination" -> ((s, dir) => {
      // semantic benchmark leakage: corpus vectors too close (cosine)
      // to the held-out benchmark slice; bench side broadcast
      val e = embDouble(s, dir)
      graft.proximity.Embeddings.benchmarkDecontaminate(
        e.filter(col("vec_id") >= 100), e.filter(col("vec_id") < 100),
        "vec_id", "embedding", threshold = 0.35)
    }),
    "q222_snapshot_diff" -> ((s, dir) => {
      // CDC audit between two simulated snapshots of orders
      val o = t(s, dir, "orders")
      val base = o.filter(col("o_orderkey") % 89 =!= 0)
      val curr = o.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 13 === 0, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice")))
      graft.eda.Profile.snapshotDiff(base, curr, "o_orderkey",
        Seq("o_totalprice", "o_orderstatus"))
    }),
    "q223_ucb_allocation" -> ((s, dir) =>
      graft.ml.Stats.ucbAllocation(t(s, dir, "events"),
        "event_type", "value")),
    "q224_pairwise_bh" -> ((s, dir) =>
      // post-omnibus pairwise z-tests with Benjamini-Hochberg FDR;
      // normal CDF via the A&S polynomial on BOTH engines
      graft.eda.MultipleTesting.pairwiseTestsBH(t(s, dir, "events"),
        "event_type", "value", alpha = 0.05)),
    "q225_neyman_allocation" -> ((s, dir) =>
      graft.eda.MultipleTesting.neymanAllocation(t(s, dir, "events"),
        "event_type", "value", budget = 1000L)),
    "q226_corr_significance" -> ((s, dir) =>
      // which correlations are real: Pearson r per pair in ONE wide
      // aggregate, t→p via the shared A&S CDF, BH over the 6 pairs
      graft.eda.MultipleTesting.corrSignificance(t(s, dir, "lineitem"),
        Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))),
    "q227_cramers_v" -> ((s, dir) =>
      graft.eda.Association.cramersVMatrix(
        t(s, dir, "lineitem").withColumn("l_linenum_cat",
          col("l_linenumber").cast("string")),
        Seq("l_returnflag" -> "l_linestatus",
          "l_returnflag" -> "l_linenum_cat",
          "l_linestatus" -> "l_linenum_cat"))),
    "q228_lexical_richness" -> ((s, dir) =>
      graft.text.Distinctive.lexicalRichness(t(s, dir, "documents"),
        "source", "text")),
    "q229_audio_features" -> ((s, dir) => {
      // REAL audio decode path (the q47 contract for sound): synthetic
      // PCM16 WAV payloads — tone/amplitude keyed off doc_id, every
      // 13th payload corrupted — → RIFF parser → signal stats. The
      // synth UDF builds the FIXTURE; the graded operator is the
      // mapPartitions decode.
      val toWav = udf((id: Long) =>
        if (id % 13 == 0) Array[Byte](1, 2, 3, 4) // exercises ok=false
        else graft.multimodal.Audio.synthWavPcm16(
          200.0 + (id % 500), seconds = 0.05, sampleRate = 8000,
          amplitude = 0.2 + (id % 8) / 8.0))
      val media = t(s, dir, "documents").filter(col("doc_id") < 500)
        .select(col("doc_id").as("media_id"),
          lit("audio/wav").as("mime"), toWav(col("doc_id")).as("payload"))
      graft.multimodal.Audio.audioFeatures(media)
    }),
    "q230_video_features" -> ((s, dir) => {
      // frame-sampling plumbing (the q47/q229 contract for clips):
      // length-prefixed PNG-frame containers, every 7th corrupted;
      // sampled frames go through the REAL imageio decode
      val toClip = udf((id: Long) =>
        if (id % 7 == 0) Array[Byte](71, 86, 73, 68) // magic, no body
        else graft.multimodal.Video.syntheticClip(id,
          nFrames = 4 + (id % 5).toInt))
      val media = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id").as("media_id"),
          lit("video/x-gvid").as("mime"), toClip(col("doc_id")).as("payload"))
      graft.multimodal.Video.videoFeatures(media, sampleEvery = 2)
    }),
    "q231_kll_quantiles" -> ((s, dir) => {
      // mergeable quantile shards (KLL): 8 hash shards sketched once,
      // global quantiles answered from the kilobyte shard table
      val li = t(s, dir, "lineitem").withColumn("shard",
        pmod(xxhash64(col("l_orderkey")), lit(8L)))
      val shards = graft.eda.Sketches.quantileShardSketches(
        li, "shard", "l_extendedprice")
      graft.eda.Sketches.mergedQuantiles(shards,
        Seq(0.25, 0.5, 0.75, 0.9))
    }),
    "q232_theta_overlap" -> ((s, dir) => {
      // theta set algebra on persisted distinct sketches: purchase ∩
      // click users / purchase-only — what HLL can't answer
      import graft.functions.ThetaSketch
      val sk = t(s, dir, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(ThetaSketch.thetaSketch(col("user_id")).as("sk"))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
      import s.implicits._
      Seq(
        ("purchase_users", ThetaSketch.estimate(sk("purchase"))),
        ("click_users", ThetaSketch.estimate(sk("click"))),
        ("purchase_and_click", ThetaSketch.intersect(sk("purchase"), sk("click"))),
        ("purchase_only", ThetaSketch.aNotB(sk("purchase"), sk("click"))))
        .map { case (m, e) => (m, math.round(e)) }
        .toDF("set_op", "distinct_estimate")
    }),
    "q233_frequent_terms" -> ((s, dir) => {
      // heavy-hitter terms with deterministic error bounds — bounded
      // state where an exact global top-k would shuffle the key universe
      import graft.functions.FreqSketch
      val bytes = t(s, dir, "documents")
        .select(explode(graft.text.Text.tokens(col("text"))).as("term"))
        .agg(FreqSketch.freqSketch(col("term"), 256)).head()
        .getAs[Array[Byte]](0)
      import s.implicits._
      FreqSketch.frequentItems(bytes).take(10)
        .toDF("term", "estimate", "lower_bound", "upper_bound")
    }),
    "q234_skyline" -> ((s, dir) =>
      // Pareto frontier of parts: biggest size at lowest price —
      // local-skyline mapPartitions prune + survivor anti-join
      graft.operators.Skyline.skyline(t(s, dir, "part"),
        Seq("p_size" -> true, "p_retailprice" -> false))
        .select("p_partkey", "p_size", "p_retailprice")),
    "q235_sequence_neighbors" -> ((s, dir) =>
      // trajectory-similarity top-k: users whose event journeys edit-
      // closest to the busiest user's journey
      graft.operators.FuzzyJoin.sequenceNeighbors(t(s, dir, "events"),
        "user_id", "ts", "event_type", "event_id", k = 10)),
    "q236_ppjoin_exact" -> ((s, dir) =>
      // EXACT prefix-filtered jaccard join. Fixed 500-doc slice for
      // the same reason as q153: the synthetic corpus shares one
      // ~31-term vocabulary, so every token's posting list is
      // corpus-sized and ANY token-postings join degenerates — on
      // realistic vocabularies the rarest-first prefix is the scale
      // lever (the operator itself is unrestricted)
      graft.dedup.Dedup.jaccardJoinPrefix(
        t(s, dir, "documents").filter(col("doc_id") < 500),
        "doc_id", "text", threshold = 0.85)),
    "q237_impute" -> ((s, dir) => {
      // the reference's impute_dataframe contract: plant NULL and INF
      // cells, demote INF to missing, median-fill, tag repaired rows
      val ev = t(s, dir, "events").select(col("event_id"),
        when(col("event_id") % 37 === 0, lit(null).cast("double"))
          .when(col("event_id") % 41 === 0, lit(Double.PositiveInfinity))
          .otherwise(col("value")).as("value"))
      graft.transforms.Impute.imputeFeatures(ev, Seq("value"), "median")
    }),
    "q238_zorder_key" -> ((s, dir) => {
      // Z-order clustering key (operators/ZOrder.scala): 8-bit Morton
      // interleave of (p_size, p_retailprice) — pure integer math over
      // min/max plan constants, bit-identical in any engine; the sort
      // key behind multi-column parquet pruning at scale
      val p = t(s, dir, "part")
      p.select(col("p_partkey"),
        graft.operators.ZOrder.zOrderKey(
          p, Seq("p_size", "p_retailprice"), bits = 8).as("zkey"))
    }),
    "q239_spectral_embedding" -> ((s, dir) =>
      // distributed Laplacian eigenmaps over the q39 proximity graph:
      // the "project everything" manifold path (power iteration with
      // analytic sqrt-degree deflation; rows-only — eigen solves are
      // not SQL-expressible)
      // 18 power iterations: the proximity graph's eigengap converges
      // the sign structure well before that; the default 30 is for
      // tighter gaps
      graft.ml.SpectralEmbedding.embed(
        proximityEdges(s, dir), "src", "dst", k = 2, iters = 18)),
    "q240_pruned_read" -> ((s, dir) => {
      // file-skipping read over a z-ordered layout: only files whose
      // footer envelope intersects the predicate are opened; the
      // residual filter keeps the result EXACT, so the oracle is the
      // plain WHERE clause over the source table
      val p = t(s, dir, "part").select("p_partkey", "p_size", "p_retailprice")
      val zdir = s"${System.getProperty("java.io.tmpdir")}/graft_q240_z"
      graft.operators.ZOrder.writeZOrdered(
        p, zdir, Seq("p_size", "p_retailprice"), nFiles = 16, bits = 12)
      val idx = graft.operators.ZOrder.skippingIndex(
        s, zdir, Seq("p_size", "p_retailprice"))
      graft.operators.ZOrder.prunedRead(s, zdir, idx,
          "p_retailprice", 905.0, 915.0)
        .select("p_partkey", "p_size", "p_retailprice")
    }),
    "q241_cdc_merge" -> ((s, dir) => {
      // MERGE INTO kernel: fold a synthetic I/U/D change log into the
      // orders snapshot — latest change per key wins, deletes drop,
      // inserts appear, untouched base rows pass through
      val o = t(s, dir, "orders").select(col("o_orderkey").as("k"),
        col("o_totalprice").as("price"), col("o_orderstatus").as("status"))
      val base = o.filter(col("k") % 4 =!= 0)
      val ch = o.filter(col("k") % 3 === 0).select(col("k"), lit("U").as("op"),
          lit(1L).as("seq"), (col("price") * 2).as("price"), col("status"))
        .unionByName(o.filter(col("k") % 5 === 0).select(col("k"),
          lit("D").as("op"), lit(2L).as("seq"), col("price"), col("status")))
        .unionByName(o.filter(col("k") % 7 === 0).select(col("k"),
          lit("I").as("op"), lit(3L).as("seq"),
          (col("price") + 10).as("price"), col("status")))
      graft.operators.Cdc.mergeChanges(base, ch, "k", "op", "seq")
    }),
    "q242_time_decay_attribution" -> ((s, dir) =>
      // multi-touch credit with half-life decay: exact dyadic weights
      // (CASE ladder, no pow), per-conversion normalization in
      // DECIMAL(28,18) so the per-type totals are order-independent
      graft.operators.Reporting.timeDecayAttribution(
        t(s, dir, "events"), "user_id", "ts", "event_type", "event_id",
        conversionType = "purchase", touchTypes = Seq("click", "signup"),
        lookbackDays = 30, halfLifeDays = 7)),
    "q243_personalized_pagerank" -> ((s, dir) =>
      // seed-restart PageRank over the q39 proximity graph: rank
      // concentrates around the seed nodes (ids 0-9)
      graft.proximity.Graph.personalizedPageRank(
          proximityEdges(s, dir),
          t(s, dir, "embeddings").filter(col("vec_id") < 10)
            .select(col("vec_id").as("id")),
          iters = 5, damping = 0.85)
        .select(col("id"), round(col("pr"), 6).as("ppr"))),
    "q244_jaro_winkler" -> ((s, dir) => {
      // codegen Jaro-Winkler (DuckDB-parity semantics, fuzz-verified):
      // adjacent part names pair via a key equi-join, never a global
      // ordered window
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_name"))
      val nxt = p.select((col("p_partkey") - 1).as("p_partkey"),
        col("p_name").as("next_name"))
      p.join(nxt, "p_partkey")
        .select(col("p_partkey"),
          round(org.apache.spark.sql.GraftExprBridge.toColumn(
            graft.functions.JaroWinklerExpr(
              org.apache.spark.sql.GraftExprBridge.toExpression(col("p_name")),
              org.apache.spark.sql.GraftExprBridge.toExpression(col("next_name")))), 6)
            .as("name_jw"))
    }),
    "q245_journey_ngrams" -> ((s, dir) =>
      // frequent ordered event-type trigrams across user journeys:
      // chained leads in one entity-keyed window, no journey
      // materialization
      graft.operators.Reporting.journeyNgrams(
        t(s, dir, "events"), "user_id", "ts", "event_type", "event_id",
        n = 3, minSupport = 5L)),
    "q246_fairness_report" -> ((s, dir) => {
      // per-segment fairness read-out on a deterministic pseudo-model:
      // segment = user cohort, label = purchase, accept = value > 50.
      // NaN values are excluded up front (Spark orders NaN above all,
      // DuckDB too, but NaN > 50 disagrees across engines)
      val d = t(s, dir, "events")
        .filter(col("value").isNotNull && !isnan(col("value")))
        .select((col("user_id") % 3).as("segment"),
          when(col("event_type") === "purchase", 1).otherwise(0).as("y"),
          (col("value") > 50).cast("int").as("pred"))
      graft.ml.Fairness.fairnessReport(d, "segment", "y", "pred")
    }),
    "q247_rolling_corr" -> ((s, dir) =>
      // 7-day trailing volume-vs-intensity correlation: five running
      // sums in one ordered window over the metadata-sized day frame
      graft.operators.Forecast.rollingCorrelation(
        t(s, dir, "events"), "ts", "value", windowDays = 7)),
    "q248_oof_target_encoding" -> ((s, dir) => {
      // leakage-controlled target encoding: each row's encoding uses
      // every OTHER fold's statistics (leave-fold-out), smoothing
      // toward the leave-fold-out global mean
      val d = t(s, dir, "events")
        .filter(col("value").isNotNull && !isnan(col("value")))
        .select(col("event_id"), col("event_type").as("cat"),
          (col("user_id") % 4).as("fold"), col("value"))
      graft.ml.Encoders.targetEncodeOof(d, "cat", "value", "fold", "te_oof")
        .select("event_id", "cat", "fold", "te_oof")
    }),
    "q249_markov_attribution" -> ((s, dir) =>
      // first-order Markov removal-effect attribution over user
      // journeys: transition counts from one entity-keyed window, chain
      // evolution on a (scenario, state) metadata frame
      graft.operators.MarkovAttribution.removalEffect(
        t(s, dir, "events"), "user_id", "ts", "event_type", "event_id",
        convType = "purchase", steps = 12)),
    "q250_privacy_audit" -> ((s, dir) =>
      // k-anonymity / l-diversity release gate over a quasi-identifier
      // tuple: one class groupBy, every k read off one wide aggregate
      graft.eda.Privacy.kAnonymityAudit(
        t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"),
        "c_acctbal", ks = Seq(5, 10, 20))),
    "q251_cuped" -> ((s, dir) =>
      // CUPED variance reduction: pre-period covariate per entity,
      // pooled theta, per-variant adjusted means (decimal-exact sums)
      graft.ml.Experiments.cuped(
        t(s, dir, "events"), "user_id", "ts", "value",
        variantOf = u => u % 2, splitTs = "2024-01-15 00:00:00")),
    "q252_diff_in_diff" -> ((s, dir) =>
      // two-period x two-group difference-in-differences with the
      // large-sample SE — one aggregation pass, one row out
      graft.ml.Experiments.diffInDiff(
        t(s, dir, "events"), "ts", "value",
        treatOf = col("user_id") % 2 === 1,
        splitTs = "2024-01-15 00:00:00")),
    "q253_silhouette" -> ((s, dir) =>
      // simplified (centroid-based) silhouette per label cluster:
      // linear passes only, broadcast k-centroid table
      graft.ml.Silhouette.simplifiedSilhouette(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        clusterOf = col("label"))),
    "q254_negative_sampling" -> ((s, dir) => {
      // deterministic md5-ordered negative sampling: each anchor probes
      // exactly one of 16 hash shards, in-source near-positives excluded
      val d = t(s, dir, "documents")
      graft.text.NegativeSampling.sampleNegatives(
        d, "doc_id", "source", d.filter(col("doc_id") % 20 === 0), k = 5)
    }),
    "q255_canonical_keep" -> ((s, dir) => {
      // quality-aware canonical selection: synthetic id-block clusters
      // (doc -> its 7-block leader), winner = longest doc (n_chars),
      // manifest records why every non-canonical copy drops
      val d = t(s, dir, "documents")
      val pairs = d.select(
          (col("doc_id") - pmod(col("doc_id"), lit(7))).as("id_a"),
          col("doc_id").as("id_b"))
        .filter(col("id_a") =!= col("id_b"))
      graft.dedup.Canonical.keepPolicyManifest(d, "doc_id", pairs,
        qualityOf = col("n_chars"))
    }),
    "q256_length_buckets" -> ((s, dir) =>
      // packing-cost planner: power-of-two token-length buckets with
      // batch counts and padding waste per bucket
      graft.text.Packing.lengthBucketSummary(
        t(s, dir, "documents"), "doc_id", "text", batchSize = 8)),
    "q257_holt_linear" -> ((s, dir) =>
      // Holt double-exponential smoothing of the daily total: state
      // recursion on the calendar-bounded day frame, one-step-ahead
      // forecasts and residuals
      graft.operators.Forecast.holtLinear(t(s, dir, "events"), "ts", "value")),
    "q258_bradley_terry" -> ((s, dir) => {
      // Bradley-Terry strengths from pairwise preferences: matches are
      // consecutive same-user event pairs, winner = higher value (tie
      // to the earlier event); one window builds the data-sized pair
      // log, one groupBy collapses it to the items² match matrix the
      // MM iterations run on
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.ltzTs(t(s, dir, "events"), "ts")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val p = ev.select(col("event_type").as("a"), col("value").as("va"),
          lead(col("event_type"), 1).over(w).as("b"),
          lead(col("value"), 1).over(w).as("vb"))
        .filter(col("b").isNotNull && col("a") =!= col("b"))
      val m = p.select(least(col("a"), col("b")).as("item_a"),
          greatest(col("a"), col("b")).as("item_b"),
          when(col("va") >= col("vb"), col("a")).otherwise(col("b"))
            .as("__win"))
        .groupBy("item_a", "item_b")
        .agg(sum((col("__win") === col("item_a")).cast("int")).as("wins_a"),
          sum((col("__win") === col("item_b")).cast("int")).as("wins_b"))
      graft.ml.Preference.bradleyTerry(m, "item_a", "item_b",
        "wins_a", "wins_b", iters = 8)
    }),
    "q259_annotator_agreement" -> ((s, dir) => {
      // Cohen's kappa between two derived annotators over the same
      // events: same value-band rubric, annotator B reads a perturbed
      // value — partial, non-trivial agreement
      val vb = col("value") + (col("event_id") % 40).cast("double")
      def band(c: Column): Column =
        when(c < 50, "low").when(c < 150, "mid").otherwise("high")
      graft.ml.Preference.cohenKappa(
        t(s, dir, "events").select(band(col("value")).as("ann_a"),
          band(vb).as("ann_b")),
        "ann_a", "ann_b")
    }),
    "q260_ranking_metrics" -> ((s, dir) =>
      // retrieval-eval pack: per-nation customer rankings by account
      // balance, relevance = custkey % 3 — precision/recall@10, MRR,
      // AP, NDCG@10 per query from one window + one groupBy
      graft.ml.RankingMetrics.evaluate(
        t(s, dir, "customer").select(col("c_nationkey").as("query"),
          col("c_custkey").as("doc"), col("c_acctbal").as("score"),
          (col("c_custkey") % 3 === 0).cast("int").as("rel")),
        "query", "doc", "score", "rel", k = 10)),
    "q261_gini_concentration" -> ((s, dir) => {
      // revenue concentration per nation: Gini/HHI/top-10% share over
      // decimal-exact per-customer spend totals
      val spend = t(s, dir, "orders").groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("spend"))
      val g = spend.join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nation"), col("spend"))
      graft.eda.Concentration.concentration(g, "nation", "spend",
        topFrac = 0.1)
    }),
    "q262_qini_uplift" -> ((s, dir) => {
      // uplift by score decile: treatment = user parity, score =
      // pre-period activity count, outcome = post-period purchase
      // value (decimal-exact per-unit sums, the q251 pattern)
      val ev = Tables.ltzTs(t(s, dir, "events"), "ts")
        .filter(col("value").isNotNull && !isnan(col("value")))
      val cut = lit("2024-01-15 00:00:00").cast("timestamp")
      val units = ev.groupBy("user_id").agg(
        sum(when(col("ts") < cut, 1L).otherwise(0L)).as("score"),
        coalesce(sum(when(col("ts") >= cut &&
            col("event_type") === "purchase",
          col("value").cast("decimal(18,2)"))),
          lit(0).cast("decimal(18,2)")).cast("double").as("y"))
      graft.ml.Uplift.qiniByBucket(units, col("user_id") % 2 === 1,
        "score", "y", "user_id", nBuckets = 10)
    }),
    "q263_binary_quantization" -> ((s, dir) =>
      // sign-bit embedding compression: midrange thresholds, 64 dims
      // → two 32-bit words, Hamming top-10 by XOR+popcount — integer-
      // exact end to end
      graft.proximity.BinaryQuant.hammingTopK(
        t(s, dir, "embeddings").select("vec_id", "embedding"),
        t(s, dir, "embeddings").filter(col("vec_id") % 100 === 0)
          .select("vec_id"),
        "vec_id", "embedding", dim = 64, k = 10)),
    "q264_holt_winters" -> ((s, dir) =>
      // additive triple-exponential smoothing, season 7: the seasonal
      // extension of q257's state recursion (dyadic α/β/γ)
      graft.operators.Forecast.holtWinters(t(s, dir, "events"),
        "ts", "value")),
    "q265_nelson_aalen" -> ((s, dir) => {
      // Nelson-Aalen cumulative hazard on the q183 life table:
      // time-to-first-error per user, right-censored at last event
      val ev = Tables.ltzTs(t(s, dir, "events"), "ts")
      val life = ev.groupBy(col("user_id")).agg(
          min(unix_micros(col("ts"))).as("__f"),
          min(when(col("event_type") === "error", unix_micros(col("ts"))))
            .as("__e"),
          max(unix_micros(col("ts"))).as("__l"))
        .select(
          ((coalesce(col("__e"), col("__l")) - col("__f")) /
            lit(86400.0 * 1e6)).as("duration"),
          when(col("__e").isNotNull, 1).otherwise(0).as("event"))
      graft.ml.Stats.nelsonAalen(life, "duration", "event")
    }),
    "q266_curriculum_order" -> ((s, dir) =>
      // curriculum ordering: 4 difficulty bands by doc length, sources
      // round-robin-interleaved within each band — integer-rank exact
      graft.text.Curriculum.curriculumOrder(t(s, dir, "documents"),
        "doc_id", "n_chars", "source", nBands = 4)),
    "q267_ann_recall" -> ((s, dir) => {
      // recall@10 of the binary-quant Hamming route against the exact
      // cosine kernel — the eval harness that grades every approximate
      // index against its exact twin
      val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
      val qs = emb.filter(col("vec_id") % 100 === 0)
      val exact = Proximity.cosineTopK(qs, emb, "vec_id", "embedding", 10)
        .select(col("id").as("query"), col("neighbor_id").as("doc"))
      val approx = graft.proximity.BinaryQuant.hammingTopK(
          emb, qs.select("vec_id"), "vec_id", "embedding", dim = 64, k = 10)
        .select(col("query_id").as("query"), col("cand_id").as("doc"))
      graft.ml.RankingMetrics.overlapAtK(approx, exact, k = 10)
    }),
    "q268_position_bias" -> ((s, dir) => {
      // first-position win rate per item over the q258 ordered pair
      // log — the left-bias audit a preference pipeline runs before
      // trusting its comparisons
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.ltzTs(t(s, dir, "events"), "ts")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pl = ev.select(col("event_type").as("a"), col("value").as("va"),
          lead(col("event_type"), 1).over(w).as("b"),
          lead(col("value"), 1).over(w).as("vb"))
        .filter(col("b").isNotNull && col("a") =!= col("b"))
        .select(col("a").as("first_item"),
          (col("va") >= col("vb")).cast("int").as("first_won"))
      graft.ml.Preference.positionBias(pl, "first_item", "first_won")
    }),
    "q269_bootstrap_ci" -> ((s, dir) =>
      // deterministic subsample-bootstrap CI for the per-type mean
      // value: 64 md5-drawn half-sample replicates, order-statistic
      // bounds — portable-RNG exact on both engines
      graft.ml.Bootstrap.subsampleCi(t(s, dir, "events"),
        "event_type", "event_id", "value", b = 64)),
    "q270_sssp_weighted" -> ((s, dir) => {
      // weighted shortest paths over the KNN graph (edge weight =
      // euclidean distance), 4 Bellman-Ford rounds from 3 sources
      val e = embDouble(s, dir).filter(col("vec_id") < 100)
      val nn = Proximity.knnJoinAdaptive(e, e, "vec_id", "embedding", 5,
        "euclidean", 64)
      graft.proximity.Graph.ssspWeighted(
        nn.select(col("id").as("src"), col("neighbor_id").as("dst"),
          col("distance").as("w")),
        embDouble(s, dir).filter(col("vec_id") < 3)
          .select(col("vec_id").as("id")),
        rounds = 4)
    }),
    "q271_modularity" -> ((s, dir) => {
      // Newman modularity of the label-propagation partition over the
      // proximity graph — closed-form aggregates on the edge list
      val edges = proximityEdges(s, dir)
      graft.proximity.Graph.modularity(edges,
        graft.proximity.Graph.labelPropagation(edges, iters = 3))
    }),
    "q272_ridge_regression" -> ((s, dir) =>
      // two-feature ridge per return flag: one moments groupBy, the
      // closed-form 2x2 solve rides the #groups frame
      graft.ml.Ridge.ridge2(t(s, dir, "lineitem"), "l_returnflag",
        "l_quantity", "l_discount", "l_extendedprice", lambda = 1.0)),
    "q273_log_rank" -> ((s, dir) => {
      // two-cohort log-rank test on the q183/q265 life table (time to
      // first error, censored at last event), cohorts by user parity
      val ev = Tables.ltzTs(t(s, dir, "events"), "ts")
      val life = ev.groupBy(col("user_id")).agg(
          min(unix_micros(col("ts"))).as("__f"),
          min(when(col("event_type") === "error", unix_micros(col("ts"))))
            .as("__e"),
          max(unix_micros(col("ts"))).as("__l"))
        .select(
          when(col("user_id") % 2 === 0, lit("even")).otherwise(lit("odd"))
            .as("cohort"),
          ((coalesce(col("__e"), col("__l")) - col("__f")) /
            lit(86400.0 * 1e6)).as("duration"),
          when(col("__e").isNotNull, 1).otherwise(0).as("event"))
      graft.ml.Stats.logRank(life, "duration", "event", "cohort")
    }),
    "q274_weighted_quantiles" -> ((s, dir) =>
      // quantity-weighted price quantiles per return flag — decimal
      // cumulative weights, integer-scaled threshold compares
      graft.eda.Robust.weightedQuantiles(t(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice", "l_quantity")),
    "q275_hits" -> ((s, dir) =>
      // HITS hubs/authorities over the directed proximity-KNN edges —
      // 3 L1-normalized power-iteration rounds
      graft.proximity.Graph.hits(proximityEdges(s, dir), iters = 3)),
    "q276_quantile_normalize" -> ((s, dir) =>
      // align per-source doc-length distributions onto the cross-source
      // average — 100-centile binned quantile normalization
      graft.transforms.QuantileNorm.quantileNormalize(
        t(s, dir, "documents"), "source", "doc_id", "n_chars", nBins = 100)),
    "q277_stratified_ate" -> ((s, dir) => {
      // observational treatment effect: purchasers vs not on their
      // non-purchase spend, stratified by activity (event count)
      val units = t(s, dir, "events").filter(col("value").isNotNull)
        .groupBy("user_id").agg(
          max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("treated"),
          sum(when(col("event_type") =!= "purchase",
            col("value").cast("decimal(18,2)"))).as("y"),
          count(lit(1)).as("x"))
      graft.ml.Experiments.stratifiedAte(units, "treated", "y", "x",
        nStrata = 5)
    }),
    "q278_periodogram" -> ((s, dir) =>
      // fraction-of-variance spectral power of the daily total at
      // harmonics 1..10 — the frequency-domain twin of q200's ACF
      graft.operators.Forecast.periodogram(t(s, dir, "events"),
        "ts", "value", maxK = 10)),
    "q279_cross_correlation" -> ((s, dir) =>
      // does spend lead errors? daily purchase revenue vs daily error
      // count, cross-correlogram at lags -7..7 on one day rollup
      graft.operators.Forecast.crossCorrelation(t(s, dir, "events"), "ts",
        when(col("event_type") === "purchase", col("value")),
        when(col("event_type") === "error", lit(1)), maxLag = 7)),
    "q280_eb_rates" -> ((s, dir) =>
      // per-part return rate, empirical-Bayes shrunk under a MoM-fit
      // beta prior — low-volume parts pull to the corpus rate
      graft.ml.Stats.ebRates(
        t(s, dir, "lineitem").withColumn("__succ",
          when(col("l_returnflag") === "R", 1).otherwise(0)),
        "l_partkey", "__succ")),
    "q281_ratio_metric_ci" -> ((s, dir) => {
      // revenue-per-event ratio metric with a delta-method CI per
      // parity cohort — the varying-denominator read-out q185's plain
      // t-test gets wrong
      val units = t(s, dir, "events").filter(col("value").isNotNull)
        .groupBy("user_id").agg(
          sum(col("value").cast("decimal(18,2)")).as("y"),
          count(lit(1)).as("x"))
        .select(
          when(col("user_id") % 2 === 0, lit("even")).otherwise(lit("odd"))
            .as("arm"), col("y"), col("x"))
      graft.ml.Experiments.ratioMetricCi(units, "arm", "y", "x")
    }),
    "q282_caliper_matching" -> ((s, dir) => {
      // q277's observational effect re-estimated by nearest-control
      // caliper matching on the activity covariate (caliper = 2 events)
      val units = t(s, dir, "events").filter(col("value").isNotNull)
        .groupBy("user_id").agg(
          max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("treated"),
          sum(when(col("event_type") =!= "purchase",
            col("value").cast("decimal(18,2)"))).as("y"),
          count(lit(1)).as("x"))
      graft.ml.Experiments.caliperMatch(units, "treated", "y", "x",
        caliper = 2.0)
    }),
    "q283_interval_coalesce" -> ((s, dir) => {
      // per-customer fulfillment coverage: each order spans order date
      // -> last line shipment; merge overlaps into islands per customer
      val spans = t(s, dir, "lineitem")
        .groupBy("l_orderkey").agg(max("l_shipdate").as("__last"))
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"),
          datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).as("s"),
          datediff(col("__last"), to_date(lit("1970-01-01"))).as("e"))
      graft.operators.Intervals.coalesceIntervals(spans,
        "o_custkey", "s", "e")
    }),
    "q284_theil_decomposition" -> ((s, dir) =>
      // order-value inequality split between vs within order priority
      // classes — additive Theil-T identity on 3 sufficient stats
      graft.eda.Concentration.theilDecomposition(
        t(s, dir, "orders"), "o_orderpriority", "o_totalprice")),
    "q285_hierarchy_flatten" -> ((s, dir) => {
      // synthetic part taxonomy (parent = k/2, 3 roots): resolve every
      // node's root + depth by pointer doubling, O(log depth) joins.
      // Parents derive from the key's low digits (mod the ScaleUp
      // replica step) so key-shifted ladder replicas each form their
      // own closed taxonomy — identical to plain k/2 at base scales
      // (keys < 1e8), but convergent at every ladder factor (the
      // r10-r12 ladder entries for this query were silently measuring
      // time-to-exception on dangling cross-replica parents).
      val lk = pmod(col("p_partkey"), lit(100000000L))
      graft.operators.Hierarchy.flatten(
        t(s, dir, "part").select(col("p_partkey").as("id"),
          when(lk > 3, col("p_partkey") - lk + floor(lk / 2))
            .as("parent")),
        "id", "parent")
    }),
    "q286_cumulative_distinct" -> ((s, dir) =>
      // daily audience growth: events, first-seen users, cumulative
      // distinct users — two corpus passes + a calendar window
      graft.operators.Events.cumulativeDistinct(
        t(s, dir, "events"), "user_id", "ts")),
    "q287_partial_correlation" -> ((s, dir) =>
      // price-quantity association per return flag with discount held
      // fixed — closed form from one 9-moment groupBy
      graft.ml.Stats.partialCorr(t(s, dir, "lineitem"), "l_returnflag",
        "l_extendedprice", "l_quantity", "l_discount")),
    "q288_mcnemar" -> ((s, dir) =>
      // two cheap urgency heuristics on the SAME orders: paired
      // McNemar test over the discordant cells, continuity-corrected
      graft.ml.Stats.mcnemar(
        t(s, dir, "orders").select(
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0).as("label"),
          when(col("o_totalprice") > 150000, 1).otherwise(0).as("pred_a"),
          when(col("o_orderkey") % 3 === 0, 1).otherwise(0).as("pred_b")),
        "label", "pred_a", "pred_b")),
    "q289_fk_integrity" -> ((s, dir) => {
      // referential-integrity sweep of the whole star schema: orphan
      // rows/keys per FK edge, keys collapsed before the join
      import graft.eda.Integrity.fkAudit
      Seq(
        fkAudit(t(s, dir, "lineitem"), "l_orderkey",
          t(s, dir, "orders"), "o_orderkey", "lineitem->orders"),
        fkAudit(t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "part"), "p_partkey", "lineitem->part"),
        fkAudit(t(s, dir, "lineitem"), "l_suppkey",
          t(s, dir, "supplier"), "s_suppkey", "lineitem->supplier"),
        fkAudit(t(s, dir, "orders"), "o_custkey",
          t(s, dir, "customer"), "c_custkey", "orders->customer"),
        fkAudit(t(s, dir, "customer"), "c_nationkey",
          t(s, dir, "nation"), "n_nationkey", "customer->nation"),
        fkAudit(t(s, dir, "supplier"), "s_nationkey",
          t(s, dir, "nation"), "n_nationkey", "supplier->nation"),
        fkAudit(t(s, dir, "nation"), "n_regionkey",
          t(s, dir, "region"), "r_regionkey", "nation->region"))
        .reduce(_ unionAll _)
    }),
    "q290_cronbach_alpha" -> ((s, dir) =>
      // are the first three line quantities of an order one "size"
      // construct? Cronbach's alpha over complete 3-line orders
      graft.ml.Stats.cronbachAlpha(
        t(s, dir, "lineitem").filter(col("l_linenumber") <= 3),
        "l_orderkey", "l_linenumber", "l_quantity")),
    "q291_lsh_tuning" -> ((s, dir) =>
      // grade the banded-MinHash dedup on a 500-doc sample against
      // exhaustive shingle-Jaccard truth: recall + candidate precision
      // (rows-only: banding depends on the engine hash, not SQL-
      // expressible; truth/pair semantics spec'd in WaveSixteenSpec)
      graft.dedup.Dedup.minhashLshStats(
        t(s, dir, "documents").filter(col("doc_id") < 500),
        "doc_id", "text")),
    "q292_assortativity" -> ((s, dir) =>
      // do well-connected feature-space nodes link to each other?
      // degree assortativity of the q39 proximity graph
      graft.proximity.Graph.assortativity(proximityEdges(s, dir))),
    "q293_fisher_exact" -> ((s, dir) =>
      // nation-1 vs nation-2 customers x BUILDING segment: exact
      // hypergeometric p on the small 2x2 where chi-square misleads
      graft.ml.Stats.fisherExact(
        t(s, dir, "customer").filter(col("c_nationkey").isin(1, 2))
          .select(when(col("c_nationkey") === 1, 1).otherwise(0).as("r"),
            when(col("c_mktsegment") === "BUILDING", 1).otherwise(0)
              .as("c")),
        "r", "c")),
    "q294_term_bursts" -> ((s, dir) =>
      // which terms are over-represented in one ingestion batch vs the
      // rest of the corpus? leave-one-out two-proportion z per term
      graft.text.Bursts.termBursts(
        t(s, dir, "documents").select((col("doc_id") % 4).as("batch"),
          col("text")),
        "batch", "text", minCount = 10)),
    "q295_chow_break" -> ((s, dir) =>
      // did the price~quantity line move mid-1995? Chow F on the
      // shipdate split, one conditional-moment pass
      graft.ml.Ridge.chowTest(
        t(s, dir, "lineitem").withColumn("__regime",
          col("l_shipdate") < to_date(lit("1995-06-01"))),
        "l_quantity", "l_extendedprice", "__regime")),
    "q296_brown_forsythe" -> ((s, dir) =>
      // variance homogeneity of price across return flags — the
      // median-centered Levene gate before pooled-variance tests
      graft.eda.StatTests.brownForsythe(t(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice")),
    "q297_durbin_watson" -> ((s, dir) =>
      // are the detrended daily-revenue residuals serially correlated?
      // the trust gate on any line fit over this series
      graft.operators.Forecast.durbinWatson(t(s, dir, "events"),
        "ts", "value")),
    "q298_cmh_pooled" -> ((s, dir) =>
      // BUILDING-segment x positive-balance association, controlling
      // for nation block: the stratified 2x2 pooled test
      graft.ml.Stats.cmh(
        t(s, dir, "customer").select(
          (col("c_nationkey") % 5).as("strat"),
          when(col("c_mktsegment") === "BUILDING", 1).otherwise(0).as("r"),
          when(col("c_acctbal") > 0, 1).otherwise(0).as("c")),
        "strat", "r", "c")),
    "q299_cochran_q" -> ((s, dir) =>
      // three order-book "detectors" per customer (any urgent-ish
      // order / any big ticket / any finished order): same hit rate?
      graft.ml.Stats.cochranQ(
        t(s, dir, "orders").groupBy("o_custkey").agg(
          max(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)).as("f1"),
          max(when(col("o_totalprice") > 150000, 1).otherwise(0)).as("f2"),
          max(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("f3")),
        Seq("f1", "f2", "f3"))),
    "q300_vif" -> ((s, dir) =>
      // is extendedprice's coefficient estimable next to quantity and
      // discount, or collinear noise? VIF from the 3x3 corr matrix
      graft.ml.Ridge.vif3(t(s, dir, "lineitem"),
        "l_quantity", "l_extendedprice", "l_discount")),
    "q301_hbos" -> ((s, dir) =>
      // linear-time histogram outlier score over the three lineitem
      // measures — the 100TB-first member of the outlier family
      graft.eda.OutlierScores.hbosTopK(
        t(s, dir, "lineitem").withColumn("id",
          col("l_orderkey") * 8 + col("l_linenumber")),
        "id", Seq("l_quantity", "l_extendedprice", "l_discount"),
        bins = 10, k = 20)),
    "q302_welch_anova" -> ((s, dir) =>
      // event-type means under unequal variances — the test to run
      // when q296's homogeneity gate rejects
      graft.eda.StatTests.welchAnova(t(s, dir, "events"),
        "event_type", "value")),
    "q303_shapley_attribution" -> ((s, dir) =>
      // exact Shapley channel credit over user journeys — the axiom-
      // fair member of the attribution family (q192/q242/q249)
      graft.operators.Reporting.shapleyAttribution(t(s, dir, "events"),
        "user_id", "ts", "event_type", convType = "purchase")),
    "q304_raking_weights" -> ((s, dir) => {
      // calibrate the positive-balance "respondents" to the full
      // customer margins over segment x nation block: 3 IPF cycles
      val cust = t(s, dir, "customer").select(
        col("c_mktsegment").as("r"), (col("c_nationkey") % 3).as("c"),
        col("c_acctbal"))
      graft.ml.Experiments.rakeWeights(
        cust.filter(col("c_acctbal") > 0), cust, "r", "c", iters = 3)
    }),
    "q305_leakage_split" -> ((s, dir) =>
      // contamination-safe train/test split: docs linked by a rare
      // 8-gram land together; portable md5 fold on the component label
      graft.dedup.LeakageSplit.leakageSafeSplit(
        t(s, dir, "documents"), "doc_id", "text",
        shingleSize = 8, maxDf = 5, iters = 4, trainFraction = 0.8)),
    "q306_snake_shards" -> ((s, dir) =>
      // balanced output-shard plan over the document manifest:
      // serpentine deal by token count into 8 shards
      graft.text.Packing.snakeShards(
        t(s, dir, "documents").select(col("doc_id").as("id"),
          graft.text.Text.tokenCount(col("text")).cast("long").as("sz")),
        "id", "sz", nShards = 8)),
    "q307_yuen_trimmed_t" -> ((s, dir) =>
      // robust A-vs-N price comparison: 20%-trimmed means with
      // winsorized variances — heavy-tail-proof two-sample test
      graft.ml.Stats.yuenT(t(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice", "A", "N", trim = 0.2)),
    "q308_item_triples" -> ((s, dir) =>
      // Apriori level-3: frequent part triples within orders, pair-
      // support pruned before the cubic extension join
      graft.operators.Cooccur.itemTriples(t(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", minSupport = 2, topK = 20)),
    "q309_bayesian_ab" -> ((s, dir) =>
      // exact P(B beats A) on purchase conversion, arms by user parity
      // — Cook's closed form on the shared log-factorial ladder
      graft.ml.Experiments.bayesianAb(
        t(s, dir, "events").groupBy(col("user_id")).agg(
          max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("conv"))
          .select(when(col("user_id") % 2 === 0, "A").otherwise("B")
            .as("arm"), col("conv")),
        "arm", "conv", "A", "B")),
    "q310_collocations" -> ((s, dir) =>
      // which word pairs glue together? Dunning G2 bigram collocations
      graft.text.Distinctive.collocations(t(s, dir, "documents"),
        "text", minCount = 5, topK = 20)),
    "q311_hurst" -> ((s, dir) =>
      // does daily revenue trend or revert? rescaled-range H
      graft.operators.Forecast.hurstRs(t(s, dir, "events"),
        "ts", "value")),
    "q312_best_split" -> ((s, dir) =>
      // decision stump: where does extendedprice separate returns?
      // all candidate thresholds in ONE conditional-moment aggregate
      graft.ml.InfoGain.bestSplit(
        t(s, dir, "lineitem").withColumn("__y",
          when(col("l_returnflag") === "R", 1).otherwise(0)),
        "l_extendedprice", "__y", candidates = 19)),
    "q313_croston" -> ((s, dir) =>
      // intermittent-demand forecast: separate size/interval EWMAs
      // over purchase-day demand only
      graft.operators.Forecast.croston(
        t(s, dir, "events").filter(col("event_type") === "purchase"),
        "ts", "value", alpha = 0.25)),
    "q314_pacf" -> ((s, dir) =>
      // AR-order read-out: Durbin-Levinson PACF at lags 1..5 over the
      // daily total, unrolled to named intermediates
      graft.operators.Forecast.pacf(t(s, dir, "events"), "ts", "value",
        maxLag = 5)),
    "q315_price_index" -> ((s, dir) =>
      // monthly Laspeyres/Paasche/Fisher vs the first shipping month:
      // price vs volume decomposition of revenue movement
      graft.operators.Reporting.priceIndex(t(s, dir, "lineitem"),
        "l_shipdate", "l_partkey", "l_extendedprice", "l_quantity")),
    "q316_ridge_cv" -> ((s, dir) =>
      // lambda grid x 5 folds from ONE moments-by-fold pass — the
      // sufficient-statistics RidgeCV
      graft.ml.Ridge.ridgeCv(
        t(s, dir, "lineitem").withColumn("rid",
          col("l_orderkey") * 8 + col("l_linenumber")),
        "rid", "l_quantity", "l_discount", "l_extendedprice")),
    "q317_motifs" -> ((s, dir) =>
      // most similar non-overlapping weekly shapes of daily revenue —
      // matrix-profile-style motif pairs on the day frame
      graft.operators.Forecast.motifs(t(s, dir, "events"),
        "ts", "value", w = 7, topK = 5)),
    "q318_gumbel_returns" -> ((s, dir) =>
      // what weekly peak shows up once a month/quarter/year? EV-I
      // return levels from weekly block maxima
      graft.operators.Forecast.gumbelReturnLevels(t(s, dir, "events"),
        "ts", "value")),
    "q319_entropy_rate" -> ((s, dir) =>
      // corpus redundancy: is the next token predictable? unigram vs
      // bigram-conditional entropy from one tokenize pass
      graft.text.Distinctive.entropyRate(t(s, dir, "documents"), "text")),
    "q320_cramer_von_mises" -> ((s, dir) => {
      // whole-distribution R-vs-N price drift — integrates every ECDF
      // gap where q92's KS sees only the largest
      val li = t(s, dir, "lineitem")
      graft.eda.StatTests.cramerVonMises(
        li.filter(col("l_returnflag") === "R")
          .select(col("l_extendedprice").as("v")),
        li.filter(col("l_returnflag") === "N")
          .select(col("l_extendedprice").as("v")),
        "v")
    }),
    "q321_retention_half_life" -> ((s, dir) =>
      // exponential-decay fit per cohort on the q164 triangle —
      // one number per cohort instead of a chart
      graft.operators.Cohorts.retentionHalfLife(t(s, dir, "events"),
        "user_id", "ts")),
    "q322_seasonality_strength" -> ((s, dir) =>
      // trend vs seasonal vs noise shares of the daily series
      graft.operators.Forecast.seasonalityStrength(t(s, dir, "events"),
        "ts", "value")),
    "q323_qte" -> ((s, dir) =>
      // where does the A-vs-N price effect live? per-decile QTE
      graft.ml.Experiments.quantileTreatmentEffects(
        t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
          col("l_extendedprice").as("v")),
        "g", "v", "A", "N")),
    "q324_proportion_effects" -> ((s, dir) =>
      // Cohen's h + risk ratio CI for BUILDING-vs-AUTOMOBILE
      // positive-balance rates — effect sizes, not just a p-value
      graft.ml.Stats.proportionEffects(
        t(s, dir, "customer").select(col("c_mktsegment").as("g"),
          when(col("c_acctbal") > 0, 1).otherwise(0).as("conv")),
        "g", "conv", "BUILDING", "AUTOMOBILE")),
    "q325_nb_fit" -> ((s, dir) =>
      // orders-per-customer count model: overdispersion + NB fit +
      // zero-inflation check (zero-order customers included)
      graft.ml.Stats.nbFit(
        t(s, dir, "customer").join(
          t(s, dir, "orders").groupBy(col("o_custkey").as("c_custkey"))
            .agg(count(lit(1)).as("__k")),
          Seq("c_custkey"), "left")
          .select(coalesce(col("__k"), lit(0L)).as("c")),
        "c")),
    "q326_two_means" -> ((s, dir) =>
      // is extendedprice bimodal? deterministic 1-D 2-means with
      // quantized centroids
      graft.ml.Stats.twoMeans1d(t(s, dir, "lineitem"),
        "l_extendedprice")),
    "q327_heaps_law" -> ((s, dir) =>
      // vocabulary-growth exponent: how much new vocab does 10x more
      // data bring? grid-bucketed ln-ln fit
      graft.text.Distinctive.heapsLaw(t(s, dir, "documents"),
        "doc_id", "text")),
    "q328_weibull_fit" -> ((s, dir) => {
      // parametric Weibull over the q183 KM curve: churn shape k and
      // scale, median-rank regression
      val ev = graft.core.Tables.ltzTs(t(s, dir, "events"), "ts")
      val life = ev.groupBy(col("user_id")).agg(
          min(unix_micros(col("ts"))).as("__f"),
          min(when(col("event_type") === "error", unix_micros(col("ts"))))
            .as("__e"),
          max(unix_micros(col("ts"))).as("__l"))
        .select(
          (coalesce(col("__e"), col("__l")) - col("__f")).as("dur"),
          when(col("__e").isNotNull, 1).otherwise(0).as("event"))
        .filter(col("dur") > 0)
      graft.ml.Stats.weibullFit(life, "dur", "event")
    }),
    "q329_newey_west" -> ((s, dir) =>
      // how much do serial correlations inflate the daily-mean CI?
      graft.operators.Forecast.neweyWestSe(t(s, dir, "events"),
        "ts", "value")),
    "q330_hill_tail" -> ((s, dir) =>
      // Pareto tail index of order totals — can we trust means here?
      graft.eda.Concentration.hillTailIndex(t(s, dir, "orders"),
        "o_totalprice", k = 100)),
    "q331_dedup_completeness" -> ((s, dir) =>
      // capture-recapture on two anchor-gram detectors: how many dup
      // pairs did both passes miss? (lower-bound semantics documented)
      graft.dedup.Dedup.dedupCompleteness(t(s, dir, "documents"),
        "doc_id", "text")),
    "q332_ece_brier" -> ((s, dir) =>
      // scalar calibration gate: ECE + Brier + Murphy decomposition
      // over the q187 pseudo-probability
      graft.ml.Stats.eceBrier(
        t(s, dir, "events").select((col("value") / 100).as("p"),
          when(col("event_type") === "purchase", 1).otherwise(0).as("y"))
          .filter(col("p") >= 0 && col("p") <= 1),
        "p", "y", bins = 10)),
    "q333_decile_migration" -> ((s, dir) =>
      // are the whales churning? user-spend decile transition matrix
      // between the two halves of the observed range
      graft.operators.Reporting.decileMigration(t(s, dir, "events"),
        "user_id", "ts", "value")),
    "q334_trend_test" -> ((s, dir) =>
      // does purchase propensity trend with spend decile? the ordered
      // alternative a flat chi-square has no power for
      graft.ml.Stats.cochranArmitage(
        t(s, dir, "orders").select(
          (col("o_custkey") % 10).as("x"),
          when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)
            .as("conv")),
        "x", "conv")),
    "q335_gk_gamma" -> ((s, dir) =>
      // ordinal association: quantity bucket vs discount bucket
      graft.ml.Stats.gkGamma(
        t(s, dir, "lineitem").select(
          (col("l_quantity") / 10).cast("long").as("r"),
          (col("l_discount") * 20).cast("long").as("c")),
        "r", "c")),
    "q336_krippendorff" -> ((s, dir) =>
      // inter-annotator agreement with varying rater counts per item:
      // raters = event types voting "high value" per user-item
      graft.ml.Stats.krippendorffAlpha(
        t(s, dir, "events").select(col("user_id").as("item"),
          when(col("value") > 50, 1).otherwise(0).as("rating")),
        "item", "rating")),
    "q337_cross_source_dups" -> ((s, dir) =>
      // can dedup shard by source? share of near-dup pairs that cross
      // source boundaries
      graft.dedup.Dedup.crossSourceDupShare(t(s, dir, "documents"),
        "doc_id", "text", "source")),
    "q338_intrinsic_dim" -> ((s, dir) =>
      // TwoNN intrinsic dimension of the embedding space on a bounded
      // sample — how many of the 64 dims are real?
      graft.proximity.Embeddings.twoNnIntrinsicDim(
        t(s, dir, "embeddings").filter(col("vec_id") < 400),
        "vec_id", "embedding")),
    "q339_rmst" -> ((s, dir) => {
      // restricted mean time-to-first-error in the first 30 days —
      // the hazard-free effect size over the q183 KM curve. Durations
      // in DAYS, not epoch-microseconds: round(rmst, 6) at 1e12
      // magnitude asks for 18 significant digits (beyond double) —
      // r9's only algorithm-adjacent hash red. One double division
      // (micros / 86.4e9) is IEEE-identical in Spark and DuckDB.
      val ev = graft.core.Tables.ltzTs(t(s, dir, "events"), "ts")
      val life = ev.groupBy(col("user_id")).agg(
          min(unix_micros(col("ts"))).as("__f"),
          min(when(col("event_type") === "error", unix_micros(col("ts"))))
            .as("__e"),
          max(unix_micros(col("ts"))).as("__l"))
        .select(
          ((coalesce(col("__e"), col("__l")) - col("__f")) /
            lit(86400000000.0)).as("dur"),
          when(col("__e").isNotNull, 1).otherwise(0).as("event"))
        .filter(col("dur") > 0)
      graft.ml.Stats.rmst(life, "dur", "event", tau = 30.0)
    }),
    "q340_simpson_detector" -> ((s, dir) =>
      // does the pooled discount-price slope contradict every
      // per-flag slope? the aggregation-bias tripwire
      graft.ml.Stats.simpsonDetector(t(s, dir, "lineitem"),
        "l_returnflag", "l_discount", "l_extendedprice")),
    "q341_slice_scan" -> ((s, dir) =>
      // which (returnflag, linestatus) segment's revenue deviates
      // most, in standardized units? SliceFinder-lite sweep
      graft.eda.Quality.sliceScan(t(s, dir, "lineitem"),
        "l_returnflag", "l_linestatus", "l_extendedprice")),
    "q342_agreement" -> ((s, dir) =>
      // does the rule-of-thumb price (1500/unit) agree with the real
      // one? Bland-Altman limits + Lin's CCC
      graft.ml.Stats.agreement(
        t(s, dir, "lineitem").select(col("l_extendedprice").as("x"),
          (col("l_quantity") * 1500).as("y")),
        "x", "y")),
    "q343_term_burstiness" -> ((s, dir) =>
      // templated-term detector: which terms clump into few docs vs a
      // Poisson scatter of the same frequency?
      graft.text.Bursts.termBurstiness(t(s, dir, "documents"),
        "doc_id", "text", minCf = 20, topK = 20)),
    "q344_median_ci" -> ((s, dir) =>
      // distribution-free 95% CI for the median price from exact
      // order statistics — no bootstrap, no normality
      graft.eda.Robust.medianCi(t(s, dir, "lineitem"),
        "l_extendedprice")),
    "q345_wasserstein" -> ((s, dir) => {
      // earth-mover distance between returned vs kept quantity
      // distributions — drift weighted by how far mass moved
      val li = t(s, dir, "lineitem")
      graft.eda.StatTests.wasserstein1(
        li.filter(col("l_returnflag") === "R"),
        li.filter(col("l_returnflag") === "N"), "l_quantity")
    }),
    "q346_anderson_darling" -> ((s, dir) => {
      // tail-weighted two-sample drift test: urgent vs low-priority
      // order values (AD catches the top-percentile shift KS misses)
      val o = t(s, dir, "orders")
      graft.eda.StatTests.andersonDarling2(
        o.filter(col("o_orderpriority") === "1-URGENT"),
        o.filter(col("o_orderpriority") === "5-LOW"), "o_totalprice")
    }),
    "q347_jarque_bera" -> ((s, dir) =>
      // moment-based normality read-out per flag; quantity is integral
      // so the four power sums accumulate exactly
      graft.eda.ShapeTests.jarqueBera(t(s, dir, "lineitem"),
        "l_returnflag", "l_quantity")),
    "q348_mood_median" -> ((s, dir) =>
      // variance-free k-group location screen on the pooled median
      graft.eda.ShapeTests.moodMedian(t(s, dir, "orders"),
        "o_orderpriority", "o_totalprice")),
    "q349_wilcoxon_signed_rank" -> ((s, dir) => {
      // paired location test: per-user mean event value before vs
      // after mid-January (decimal-exact means so pairs are portable)
      val ev = graft.core.Tables.ltzTs(t(s, dir, "events"), "ts")
      val split = lit("2024-01-15 00:00:00").cast("timestamp")
      val dv = col("value").cast(DecimalType(18, 2))
      val pairs = ev.groupBy("user_id").agg(
          (sum(when(col("ts") < split, dv)).cast("double") /
            sum(when(col("ts") < split, 1L))).as("x"),
          (sum(when(col("ts") >= split, dv)).cast("double") /
            sum(when(col("ts") >= split, 1L))).as("y"))
        .filter(col("x").isNotNull && col("y").isNotNull)
      graft.eda.ShapeTests.wilcoxonSignedRank(pairs, "x", "y")
    }),
    "q350_runs_test" -> ((s, dir) => {
      // is daily revenue a random scatter around its median, or does
      // it trend/cycle? Wald-Wolfowitz runs over the day frame
      val daily = t(s, dir, "lineitem")
        .groupBy(col("l_shipdate").as("day"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast("double").as("rev"))
      graft.eda.ShapeTests.runsTest(daily, "day", "rev")
    }),
    "q351_ljung_box" -> ((s, dir) =>
      // whiteness gate on the daily-value correlogram: cumulative
      // portmanteau Q per lag over the q200 acf rows
      graft.operators.Forecast.ljungBox(t(s, dir, "events"),
        "ts", "value")),
    "q352_pettitt" -> ((s, dir) =>
      // rank-based (outlier-immune) change-point test — the
      // distribution-free twin of q201 CUSUM
      graft.operators.Forecast.pettitt(t(s, dir, "events"),
        "ts", "value")),
    "q353_granger" -> ((s, dir) =>
      // does yesterday's event volume predict today's total value
      // beyond yesterday's total? lag-1 Granger F, closed form
      graft.operators.Forecast.grangerLag1(t(s, dir, "events"),
        "ts", "value")),
    "q354_permutation_entropy" -> ((s, dir) =>
      // ordinal-pattern complexity of the daily series: 1 = white
      // noise, 0 = monotone ramp; no moments or stationarity needed
      graft.operators.Forecast.permutationEntropy(t(s, dir, "events"),
        "ts", "value")),
    "q355_dickey_fuller" -> ((s, dir) =>
      // unit-root test: is the daily total a random walk (difference
      // it) or mean-reverting (model it)?
      graft.operators.Forecast.dickeyFuller(t(s, dir, "events"),
        "ts", "value")),
    "q356_engle_granger" -> ((s, dir) =>
      // do daily volume and daily value share a long-run equilibrium?
      // residual-based cointegration test
      graft.operators.Forecast.engleGranger(t(s, dir, "events"),
        "ts", "value")),
    "q357_shewhart" -> ((s, dir) =>
      // I-MR control chart on the daily mean with Western Electric
      // rule-1/rule-2 violation counts
      graft.eda.ProcessControl.shewhartI(t(s, dir, "events"),
        "ts", "value")),
    "q358_capability" -> ((s, dir) =>
      // Cp/Cpk of quantity against 0..55 spec limits per flag —
      // exact-decimal moments, one groupBy
      graft.eda.ProcessControl.capability(t(s, dir, "lineitem"),
        "l_returnflag", "l_quantity", lsl = 0.0, usl = 55.0)),
    "q359_grubbs" -> ((s, dir) =>
      // single-worst-point outlier screen per priority class
      graft.eda.ProcessControl.grubbs(t(s, dir, "orders"),
        "o_orderpriority", "o_totalprice")),
    "q360_poisson_rate" -> ((s, dir) => {
      // error events per active user-day, even vs odd user cohorts —
      // exposure-adjusted rate test, conditional-binomial z
      val ev = graft.core.Tables.ltzTs(t(s, dir, "events"), "ts")
      val perUser = ev.groupBy("user_id").agg(
          sum((col("event_type") === "error").cast("long")).as("ev"),
          countDistinct(to_date(col("ts"))).as("expo"))
        .select((col("user_id") % 2 === 0).as("arm"), col("ev"),
          col("expo"))
      graft.eda.StatTests.poissonRateTest(perUser, "arm", "ev", "expo")
    }),
    "q361_tukey_hsd" -> ((s, dir) =>
      // post-ANOVA pairwise studentized mean gaps (Tukey-Kramer)
      graft.eda.StatTests.tukeyHsd(t(s, dir, "lineitem"),
        "l_returnflag", "l_quantity")),
    "q362_fleiss_kappa" -> ((s, dir) =>
      // multi-rater agreement: 4-line orders as items, the 4 lines'
      // return flags as the rater panel
      graft.eda.StatTests.fleissKappa(
        t(s, dir, "lineitem").select(col("l_orderkey").as("item"),
          col("l_returnflag").as("cat")), "item", "cat", nRaters = 4)),
    "q363_leverage_cooks" -> ((s, dir) =>
      // which 20 rows most bend the price~quantity line? influence
      // from five broadcast scalars, never a hat matrix
      graft.ml.RegressionDiagnostics.leverageCooks(
        t(s, dir, "lineitem").withColumn("id",
          col("l_orderkey") * 8 + col("l_linenumber")),
        "id", "l_quantity", "l_extendedprice")),
    "q364_breusch_pagan" -> ((s, dir) =>
      // does residual spread grow with quantity? heteroscedasticity LM
      graft.ml.RegressionDiagnostics.breuschPagan(
        t(s, dir, "lineitem"), "l_quantity", "l_extendedprice")),
    "q365_pca_2d" -> ((s, dir) =>
      // closed-form 2x2 eigensystem: how 1-dimensional is the
      // (quantity, price) cloud, and along which slope?
      graft.ml.RegressionDiagnostics.pca2d(
        t(s, dir, "lineitem"), "l_quantity", "l_extendedprice")),
    "q366_aic_quadratic" -> ((s, dir) =>
      // does a quadratic term earn its parameter? AIC on exact
      // lattice power sums
      graft.ml.RegressionDiagnostics.aicQuadratic(
        t(s, dir, "lineitem"), "l_quantity", "l_extendedprice")),
    "q367_anisotropy" -> ((s, dir) =>
      // exact mean pairwise cosine WITHOUT the pair join (sum-vector
      // identity) — is the embedding space collapsing to a cone?
      graft.proximity.EmbedDiagnostics.anisotropy(
        t(s, dir, "embeddings"), "embedding")),
    "q368_hubness" -> ((s, dir) =>
      // do a few vectors dominate every kNN list? in-degree skew of
      // the k=5 graph on the bounded sample
      graft.proximity.EmbedDiagnostics.hubness(
        t(s, dir, "embeddings").filter(col("vec_id") < 400),
        "vec_id", "embedding", k = 5)),
    "q369_lid" -> ((s, dir) =>
      // per-label Levina-Bickel local intrinsic dimension — the
      // per-region companion to q338's global TwoNN
      graft.proximity.EmbedDiagnostics.lidByLabel(
        t(s, dir, "embeddings").filter(col("vec_id") < 400),
        "vec_id", "embedding", "label", k = 6)),
    "q370_fisher_ratio" -> ((s, dir) =>
      // which embedding dimensions actually separate the labels?
      graft.proximity.EmbedDiagnostics.fisherRatio(
        t(s, dir, "embeddings"), "embedding", "label")),
    "q371_centroid_distances" -> ((s, dir) =>
      // label-centroid geometry: which classes overlap?
      graft.proximity.EmbedDiagnostics.centroidDistances(
        t(s, dir, "embeddings"), "embedding", "label")),
    "q372_norm_profile" -> ((s, dir) =>
      // norm hygiene per label: hot-norm labels dominate dot-product
      // retrieval even with healthy directions
      graft.proximity.EmbedDiagnostics.normProfile(
        t(s, dir, "embeddings"), "embedding", "label")),
    "q373_fd_audit" -> ((s, dir) =>
      // do the claimed functional dependencies of the part catalog
      // hold? one stacked shuffle for all candidate pairs
      graft.eda.DataAudit.fdAudit(t(s, dir, "part"),
        Seq(("p_partkey", "p_brand"), ("p_brand", "p_type"),
          ("p_type", "p_brand")))),
    "q374_key_candidates" -> ((s, dir) =>
      // which orders columns could be a key? one stacked
      // (column, value) shuffle, no per-column job loop
      graft.eda.DataAudit.keyCandidates(t(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
          "o_orderpriority"))),
    "q375_herfindahl" -> ((s, dir) =>
      // segment concentration of positive balances per nation — is
      // one market segment dominating a nation's book?
      graft.eda.DataAudit.herfindahl(t(s, dir, "customer"),
        "c_nationkey", "c_mktsegment", "c_acctbal")),
    "q376_consistency_audit" -> ((s, dir) =>
      // do lineitem and orders still agree on each order's total?
      graft.eda.DataAudit.consistencyAudit(
        t(s, dir, "lineitem"), t(s, dir, "orders"))),
    "q377_truss_support" -> ((s, dir) =>
      // edge-support histogram of the proximity graph (k-truss
      // strength profile): which edges survive when bridges cut?
      graft.proximity.Truss.supportHistogram(
        proximityEdges(s, dir))),
    "q378_contamination" -> ((s, dir) =>
      // decontamination audit: how much of each held-out doc's 8-gram
      // mass already sits in the train split?
      graft.dedup.Contamination.evalOverlap(t(s, dir, "documents"),
        "doc_id", "text", isEval = col("doc_id") % 50 === 0)),
    "q379_mann_kendall" -> ((s, dir) =>
      // distribution-free monotone-trend test on the daily total —
      // the significance companion to q203's Theil-Sen slope
      graft.operators.Forecast.mannKendall(t(s, dir, "events"),
        "ts", "value")),
    "q380_sign_test" -> ((s, dir) => {
      // assumption-free paired floor under q349: only the sign of
      // each user's pre-vs-post change matters
      val ev = graft.core.Tables.ltzTs(t(s, dir, "events"), "ts")
      val split = lit("2024-01-15 00:00:00").cast("timestamp")
      val dv = col("value").cast(DecimalType(18, 2))
      val pairs = ev.groupBy("user_id").agg(
          (sum(when(col("ts") < split, dv)).cast("double") /
            sum(when(col("ts") < split, 1L))).as("x"),
          (sum(when(col("ts") >= split, dv)).cast("double") /
            sum(when(col("ts") >= split, 1L))).as("y"))
        .filter(col("x").isNotNull && col("y").isNotNull)
      graft.eda.ShapeTests.signTest(pairs, "x", "y")
    }),
    "q381_cliffs_delta" -> ((s, dir) => {
      // ordinal effect size for returned-vs-kept quantities — the
      // "how often does A beat B" number next to q194's p-value
      val li = t(s, dir, "lineitem")
      graft.eda.StatTests.cliffsDelta(
        li.filter(col("l_returnflag") === "R"),
        li.filter(col("l_returnflag") === "N"), "l_quantity")
    }),
    "q382_hodges_lehmann" -> ((s, dir) => {
      // robust shift estimate between the two flags' quantities:
      // weighted median over the 50x50 distinct-value grid
      val li = t(s, dir, "lineitem")
      graft.eda.StatTests.hodgesLehmann(
        li.filter(col("l_returnflag") === "R"),
        li.filter(col("l_returnflag") === "N"), "l_quantity")
    }),
    "q383_atkinson" -> ((s, dir) =>
      // welfare-weighted inequality of positive balances per nation
      graft.eda.Concentration.atkinson(t(s, dir, "customer"),
        "c_nationkey", "c_acctbal")),
    "q384_lorenz" -> ((s, dir) =>
      // decile Lorenz curve of order value per priority class --
      // exact percentile edges, no per-group sort window
      graft.eda.Concentration.lorenzDeciles(t(s, dir, "orders"),
        "o_orderpriority", "o_totalprice")),
    "q385_burstiness" -> ((s, dir) =>
      // Goh-Barabási B of per-user inter-event gaps: metronome (-1)
      // vs Poisson (0) vs bursty (+1) — shape, not rate
      graft.operators.Events.interEventBurstiness(
        t(s, dir, "events"), "user_id", "ts")),
    "q386_iv_wald" -> ((s, dir) =>
      // instrumented effect of high-engagement on order value:
      // Z = even customer key, D = positive balance, Y = totalprice
      graft.ml.Causal.ivWald(
        t(s, dir, "orders").join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
          .select((col("c_custkey") % 2 === 0).cast("int").as("z"),
            (col("c_acctbal") > 0).cast("int").as("d"),
            col("o_totalprice").as("y")),
        "z", "d", "y")),
    "q387_rdd" -> ((s, dir) =>
      // is there a price jump at the quantity-25 boundary? sharp RD
      // with +-20 bandwidth, local lines both sides
      graft.ml.Causal.rddSharp(t(s, dir, "lineitem"),
        "l_quantity", "l_extendedprice", cutoff = 25.0,
        bandwidth = 20.0)),
    "q388_icc_deff" -> ((s, dir) =>
      // users as clusters of event values: intra-cluster correlation
      // + Kish design effect — the cluster-randomization tax
      graft.ml.Causal.iccDesignEffect(t(s, dir, "events"),
        "user_id", "value")),
    "q389_char_entropy" -> ((s, dir) =>
      // cheapest junk detector: per-source char-unigram entropy
      // profile with a low-entropy (repetitive) share
      graft.text.CharStats.charEntropyProfile(t(s, dir, "documents"),
        "source", "doc_id", "text")),
    "q390_containment" -> ((s, dir) =>
      // asymmetric near-dup: docs CONTAINED in longer docs that
      // symmetric Jaccard under-scores
      graft.dedup.Contamination.containmentPairs(
        t(s, dir, "documents").filter(col("doc_id") < 300),
        "doc_id", "text")),
    "q391_mcc" -> ((s, dir) =>
      // skew-robust scalar classifier summary at a fixed decision
      graft.ml.EvalExtras.mccSummary(
        t(s, dir, "customer").select(
          (col("c_mktsegment") === "BUILDING").cast("int").as("p"),
          (col("c_acctbal") > 0).cast("int").as("l")), "p", "l")),
    "q392_effect_sizes" -> ((s, dir) => {
      // Cohen's d / Hedges' g / Glass delta for R-vs-N quantities —
      // the meta-analysis numbers next to q194's p-value
      val li = t(s, dir, "lineitem")
      graft.ml.EvalExtras.effectSizes(
        li.filter(col("l_returnflag") === "R"),
        li.filter(col("l_returnflag") === "N"), "l_quantity")
    }),
    "q393_srm" -> ((s, dir) =>
      // sample-ratio-mismatch guardrail on the unit (user) split
      graft.ml.EvalExtras.srmCheck(
        t(s, dir, "events").select(col("user_id")).distinct()
          .select((col("user_id") % 2 === 0).cast("int").as("arm")),
        "arm")),
    "q394_best_thresholds" -> ((s, dir) =>
      // Youden-J and F1-optimal cutoffs over EVERY distinct score in
      // one pass (rank kernel, no sort, no window)
      graft.ml.EvalExtras.bestThresholds(
        t(s, dir, "orders").select(col("o_totalprice").as("s"),
          (col("o_orderpriority") === "1-URGENT").cast("int")
            .as("l")), "s", "l")),
    "q395_average_precision" -> ((s, dir) =>
      // ties-exact AP (area under the PR curve) from one aggregate
      graft.ml.EvalExtras.averagePrecision(
        t(s, dir, "orders").select(col("o_totalprice").as("s"),
          (col("o_orderpriority") === "1-URGENT").cast("int")
            .as("l")), "s", "l")),
    "q396_equalized_odds" -> ((s, dir) =>
      // fairness audit: does the decision err evenly across segments?
      graft.ml.EvalExtras.equalizedOdds(
        t(s, dir, "customer").select(col("c_mktsegment").as("g"),
          (col("c_custkey") % 3 === 0).cast("int").as("p"),
          (col("c_acctbal") > 0).cast("int").as("l")),
        "g", "p", "l")),
    "q397_gopher_rules" -> ((s, dir) =>
      // the third quality preset next to q120 C4 / q128 FineWeb:
      // Gopher's rule funnel per source, all codegen string ops
      graft.text.Gopher.funnel(t(s, dir, "documents"),
        "doc_id", "source", "text")),
    "q398_tail_dependence" -> ((s, dir) =>
      // do volume and value spike on the SAME days? upper-tail
      // co-occurrence vs the independence square
      graft.operators.Forecast.tailDependence(t(s, dir, "events"),
        "ts", "value")),
    "q399_two_way_anova" -> ((s, dir) =>
      // factorial decomposition: flag, status, and their interaction
      graft.eda.StatTests.twoWayAnova(t(s, dir, "lineitem"),
        "l_returnflag", "l_linestatus", "l_quantity")),
    "q400_split_half" -> ((s, dir) =>
      // is per-user mean event value a stable metric? split-half r
      // with the Spearman-Brown step-up
      graft.ml.EvalExtras.splitHalfReliability(
        graft.core.Tables.ltzTs(t(s, dir, "events"), "ts")
          .select(col("user_id").as("id"),
            dayofmonth(col("ts")).as("item"), col("value").as("v")),
        "id", "item", "v")),
    "q401_vocab_coverage" -> ((s, dir) =>
      // tokenizer design: corpus share covered by a top-k vocabulary,
      // computed on the distinct-FREQUENCY frame (no vocab sort)
      graft.text.VocabStats.vocabCoverage(t(s, dir, "documents"),
        "text", ks = Seq(10, 100, 1000, 10000))),
    "q402_oov_rate" -> ((s, dir) =>
      // does the train vocabulary even speak eval's language?
      // instance- and type-level OOV of the held-out split
      graft.text.VocabStats.oovRate(t(s, dir, "documents"),
        "doc_id", "text", isEval = col("doc_id") % 50 === 0)),
    "q403_sobel_mediation" -> ((s, dir) =>
      // does quantity move revenue THROUGH price? closed-form
      // Baron-Kenny paths + Sobel z from one moments aggregate
      // native-2dp columns only: a DERIVED 4dp product rounded to 2dp
      // hits engine-divergent tie rounding (r10 found sy off by 6
      // cents across ~6 tie rows) -- never feed synthesized rounded
      // values into a hash-gated query
      graft.ml.Causal.sobelMediation(
        t(s, dir, "lineitem").select(col("l_quantity").as("x"),
          col("l_extendedprice").as("m"),
          (col("l_discount") * 100).as("y")), "x", "m", "y")),
    "q404_eb_shrink" -> ((s, dir) =>
      // empirical-Bayes shrinkage of per-nation mean balances — the
      // small-group leaderboard correction
      graft.ml.Causal.ebShrinkMeans(t(s, dir, "customer"),
        "c_nationkey", "c_acctbal")),
    "q405_stratified_ate" -> ((s, dir) =>
      // nation-standardized BUILDING-segment effect on balance:
      // g-formula over one discrete confounder
      graft.ml.Causal.stratifiedAte(
        t(s, dir, "customer").select(col("c_nationkey").as("s"),
          (col("c_mktsegment") === "BUILDING").cast("int").as("tr"),
          col("c_acctbal").as("y")), "s", "tr", "y")),
    "q406_cum_incidence" -> ((s, dir) => {
      // competing risks: days to first ERROR vs first PURCHASE per
      // user — Aalen-Johansen CIF, not the overstating 1-KM
      val ev = graft.core.Tables.ltzTs(t(s, dir, "events"), "ts")
      val life = ev.groupBy(col("user_id")).agg(
          min(to_date(col("ts"))).as("__d0"),
          min(when(col("event_type") === "error", to_date(col("ts"))))
            .as("__de"),
          min(when(col("event_type") === "purchase",
            to_date(col("ts")))).as("__dp"),
          max(to_date(col("ts"))).as("__dl"))
        .select(
          when(col("__de").isNotNull &&
            (col("__dp").isNull || col("__de") <= col("__dp")),
            struct(datediff(col("__de"), col("__d0")).as("dur"),
              lit(1).as("cause")))
          .when(col("__dp").isNotNull,
            struct(datediff(col("__dp"), col("__d0")).as("dur"),
              lit(2).as("cause")))
          .otherwise(struct(datediff(col("__dl"), col("__d0"))
            .as("dur"), lit(0).as("cause"))).as("o"))
        .select(col("o.dur").as("dur"), col("o.cause").as("cause"))
        .filter(col("dur") >= 0)
      graft.ml.Stats.cumulativeIncidence(life, "dur", "cause")
    }),
    "q407_mcf" -> ((s, dir) =>
      // expected errors per user by day t since first activity —
      // the recurrent-event twin of a survival curve
      graft.ml.Stats.meanCumulativeFunction(t(s, dir, "events"),
        "user_id", "ts", isEvent = col("event_type") === "error")),
    "q408_quantile_map" -> ((s, dir) => {
      // batch-effect lookup: map urgent-order value quantiles onto
      // low-priority quantiles (the normalization table)
      val o = t(s, dir, "orders")
      graft.eda.Robust.quantileMap(
        o.filter(col("o_orderpriority") === "1-URGENT"),
        o.filter(col("o_orderpriority") === "5-LOW"), "o_totalprice")
    }),
    "q409_neyman" -> ((s, dir) =>
      // eval-set design: spend a 1000-label budget where nations are
      // big AND noisy (Neyman), vs proportional for contrast
      graft.eda.DataAudit.neymanAllocation(t(s, dir, "customer"),
        "c_nationkey", "c_acctbal", budget = 1000L)),
    "q410_rich_club" -> ((s, dir) =>
      // do proximity-graph hubs wire to each other? phi(k) curve
      graft.proximity.Truss.richClub(proximityEdges(s, dir),
        ks = Seq(1, 2, 3, 4))),
    "q411_det_sample" -> ((s, dir) =>
      // reproducible 3-per-source audit sample by md5 order — the
      // oracle-checkable face of q37's smart sample
      graft.eda.DataAudit.deterministicSample(t(s, dir, "documents"),
        "source", "doc_id", k = 3)),
    "q412_gini_stump" -> ((s, dir) =>
      // depth-1 tree in one pass: the price threshold that best
      // splits urgent from non-urgent orders by Gini
      graft.ml.EvalExtras.giniStump(
        t(s, dir, "orders").select(col("o_totalprice").as("f"),
          (col("o_orderpriority") === "1-URGENT").cast("int")
            .as("l")), "f", "l")),
    "q413_calibration" -> ((s, dir) =>
      // linear calibration audit of a pseudo-probability: CITL +
      // slope/intercept (slope < 1 = overconfident spread)
      graft.ml.EvalExtras.linearCalibration(
        t(s, dir, "customer").select(
          ((col("c_custkey") % 100).cast("double") / 100).as("p"),
          (col("c_acctbal") > 0).cast("int").as("l")), "p", "l")),
    "q414_kendall_w" -> ((s, dir) => {
      // do the five event types agree on which days were big?
      // Kendall's W over per-type daily-total rankings
      val ev = graft.core.Tables.ltzTs(t(s, dir, "events"), "ts")
      val daily = ev.groupBy(col("event_type").as("r"),
          to_date(col("ts")).as("i"))
        .agg(sum(col("value").cast(DecimalType(18, 2)))
          .cast("double").as("v"))
      graft.eda.StatTests.kendallW(daily, "r", "i", "v")
    }),
    "q415_weighted_kappa" -> ((s, dir) =>
      // ordinal agreement between two value banders: near-misses
      // count partially (quadratic weights)
      graft.ml.Preference.weightedKappa(
        t(s, dir, "events").select(
          floor(col("value") / 20).as("a"),
          floor(col("value") / 25).as("b")), "a", "b")),
    "q416_somers_d" -> ((s, dir) =>
      // directional ordinal association: discount band given
      // quantity decile (gamma without the tie blindness)
      graft.ml.Stats.somersD(
        t(s, dir, "lineitem").select(
          floor(col("l_quantity") / 10).as("x"),
          floor(col("l_discount") * 20).as("y")), "x", "y")),
    "q417_km_bands" -> ((s, dir) => {
      // the q183 curve with Greenwood SEs and plain clamped bands
      val ev = graft.core.Tables.ltzTs(t(s, dir, "events"), "ts")
      val life = ev.groupBy(col("user_id")).agg(
          min(to_date(col("ts"))).as("__f"),
          min(when(col("event_type") === "error", to_date(col("ts"))))
            .as("__e"),
          max(to_date(col("ts"))).as("__l"))
        .select(datediff(coalesce(col("__e"), col("__l")), col("__f"))
          .as("dur"),
          when(col("__e").isNotNull, 1).otherwise(0).as("event"))
        .filter(col("dur") > 0)
      graft.ml.Stats.kaplanMeierBands(life, "dur", "event")
    }),
    "q418_win_ratio" -> ((s, dir) => {
      // composite-endpoint effect: purchase values vs click values,
      // counted pairwise on the rank kernel (no pair join)
      val ev = t(s, dir, "events")
      graft.eda.StatTests.winRatio(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "click"), "value")
    }),
    "q419_bimodality" -> ((s, dir) =>
      // cheap dip-test stand-in: BC > 5/9 flags a bimodal shoulder
      graft.eda.ShapeTests.bimodalityCoefficient(
        t(s, dir, "lineitem"), "l_returnflag", "l_quantity")),
    "q420_theil_u" -> ((s, dir) =>
      // directional categorical association: how much of linestatus
      // does knowing returnflag explain?
      graft.eda.StatTests.uncertaintyCoefficient(
        t(s, dir, "lineitem"), "l_returnflag", "l_linestatus")),
    "q421_cmh" -> ((s, dir) =>
      // nation-stratified segment-vs-balance association: CMH chi2
      // + Mantel-Haenszel pooled odds ratio
      graft.eda.StatTests.cmhTest(
        t(s, dir, "customer").select(col("c_nationkey").as("s"),
          (col("c_mktsegment") === "BUILDING").cast("int").as("e"),
          (col("c_acctbal") > 0).cast("int").as("o")),
        "s", "e", "o")),
    "q422_dispersion" -> ((s, dir) =>
      // are per-user event counts Poisson or clumped? variance-to-
      // mean ratio per event type
      graft.eda.StatTests.dispersionIndex(
        t(s, dir, "events").groupBy(col("event_type").as("g"),
          col("user_id")).agg(count(lit(1)).as("c")), "g", "c")),
    "q423_cv_ci" -> ((s, dir) =>
      // relative noise per flag with honest McKay bounds
      graft.eda.StatTests.cvWithCi(t(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice")),
    "q424_friedman_page" -> ((s, dir) => {
      // do discount bands rank the same way every day? Friedman
      // omnibus + Page's ordered-trend L over day blocks
      val daily = t(s, dir, "lineitem")
        .groupBy(col("l_shipdate").as("b"),
          floor(col("l_discount") * 20).as("t"))
        .agg((sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast("double") / count(lit(1))).as("v"))
      graft.eda.StatTests.friedmanPage(daily, "b", "t", "v")
    }),
    "q425_robust_spread" -> ((s, dir) =>
      // outlier-proof location/spread per flag: median + scaled MAD
      graft.eda.Robust.robustSpread(t(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice")),
    "q426_ks_uniform" -> ((s, dir) =>
      // is the discount grid actually uniform on [0, 0.1]? 1-sample
      // KS against the design distribution
      graft.eda.StatTests.ksUniform(t(s, dir, "lineitem"),
        "l_discount", lo = 0.0, hi = 0.1)),
    "q427_topk_churn" -> ((s, dir) =>
      // is the top-20 customer leaderboard stable across the 1995
      // split? Jaccard of the two top sets
      graft.eda.DataAudit.topkChurn(
        t(s, dir, "orders").select(col("o_custkey").as("e"),
          col("o_totalprice").as("v"), col("o_orderdate")),
        "e", "v",
        periodA = col("o_orderdate") < "1995-01-01", k = 20)),
    "q428_ess_weights" -> ((s, dir) =>
      // how many EFFECTIVE docs does each source contribute under
      // char-length weighting? ESS + Kish design effect
      graft.ml.Experiments.essProfile(t(s, dir, "documents"),
        "source", "n_chars")),
    "q429_first_seen_dups" -> ((s, dir) =>
      // which feed re-sends content we already ingested? per-source
      // share of docs whose exact hash was seen at a smaller doc_id
      graft.dedup.Dedup.firstSeenDupShare(t(s, dir, "documents"),
        "doc_id", "text", "source")),
    "q430_energy_distance" -> ((s, dir) => {
      // distribution distance between returned and kept quantities —
      // zero iff the distributions match, no binning choice
      val li = t(s, dir, "lineitem")
      graft.eda.StatTests.energyDistance(
        li.filter(col("l_returnflag") === "R"),
        li.filter(col("l_returnflag") === "N"), "l_quantity")
    }),
    "q431_gini_mean_diff" -> ((s, dir) =>
      // pairwise-mean-difference inequality of raw prices per flag:
      // GMD + the value-level Gini coefficient
      graft.eda.Concentration.giniMeanDifference(t(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice")),
    "q432_c_index" -> ((s, dir) => {
      // does event volume rank churn risk? Harrell's C of per-user
      // activity count against time-to-error
      val ev = graft.core.Tables.ltzTs(t(s, dir, "events"), "ts")
      val life = ev.groupBy(col("user_id")).agg(
          min(to_date(col("ts"))).as("__f"),
          min(when(col("event_type") === "error", to_date(col("ts"))))
            .as("__e"),
          max(to_date(col("ts"))).as("__l"),
          count(lit(1)).as("__cnt"))
        .select(datediff(coalesce(col("__e"), col("__l")), col("__f"))
          .as("t"),
          when(col("__e").isNotNull, 1).otherwise(0).as("e"),
          col("__cnt").as("p"))
        .filter(col("t") > 0)
      graft.ml.Stats.concordanceIndex(life, "t", "e", "p")
    }),
    "q433_source_kl" -> ((s, dir) =>
      // ONE drift number per source: unigram KL vs the corpus over a
      // capped vocab — the mixture-design companion to q136 DoReMi
      graft.text.Distinctive.sourceKl(t(s, dir, "documents"),
        "source", "text", topK = 2000)),
    "q434_page_hinkley" -> ((s, dir) =>
      // sequential level-shift budget on the daily total, with the
      // day the drift peaked — the CUSUM companion that names WHERE
      graft.operators.Forecast.pageHinkley(t(s, dir, "events"),
        "ts", "value")),
    "q435_dup_cluster_sizes" -> ((s, dir) =>
      // dedup planning: how big are the exact-duplicate families?
      graft.dedup.Dedup.dupClusterSizes(t(s, dir, "documents"),
        "text")),
    "q436_propensity_overlap" -> ((s, dir) =>
      // common-support audit before matching: do BUILDING-segment
      // customers share the balance distribution of the rest?
      graft.ml.Causal.propensityOverlap(
        t(s, dir, "customer").select(
          floor(col("c_acctbal") / 500).as("b"),
          (col("c_mktsegment") === "BUILDING").cast("int").as("tr")),
        "b", "tr")),
    "q437_cold_start" -> ((s, dir) =>
      // per event type: share of post-split users never seen before
      // the split — the serve-time cold-start hygiene number
      graft.operators.Cohorts.coldStartRate(t(s, dir, "events"),
        "user_id", "event_type", "ts",
        java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))),
    "q438_pinball" -> ((s, dir) =>
      // quantile-forecast acceptance: pinball loss of train-half
      // q10/q50/q90 order statistics on the test half
      graft.operators.Forecast.pinballEval(t(s, dir, "events"),
        "ts", "value", java.sql.Date.valueOf("2024-01-15"))),
    "q439_winsorized_corr" -> ((s, dir) =>
      // how much of the quantity-price correlation is tail points?
      // clamp both at rank-based p05/p95 and compare r
      graft.eda.Robust.winsorizedCorr(t(s, dir, "lineitem"),
        "l_quantity", "l_extendedprice")),
    "q440_shard_skew" -> ((s, dir) =>
      // would o_custkey partition evenly across 256 hash shards?
      // md5 buckets so the oracle checks the same assignment
      graft.eda.SkewReport.shardSkewAudit(t(s, dir, "orders"),
        "o_custkey")),
    "q441_holm_pairwise" -> ((s, dir) =>
      // FWER-controlled pairwise arm comparison: Holm step-down over
      // the q224 Welch-z battery
      graft.eda.MultipleTesting.pairwiseTestsHolm(t(s, dir, "events"),
        "event_type", "value")),
    "q442_tost_equivalence" -> ((s, dir) =>
      // are returned and kept quantities the SAME to within 0.5?
      // equivalence needs TOST, not an insignificant t-test
      graft.ml.Experiments.tostEquivalence(t(s, dir, "lineitem"),
        "l_returnflag", "l_quantity", armA = "R", armB = "N",
        margin = 0.5)),
    "q443_power_proportions" -> ((s, dir) =>
      // how many orders per arm to detect +2pp on the F-status share?
      graft.eda.StatTests.powerProportions(
        t(s, dir, "orders").select(
          (col("o_orderstatus") === "F").cast("int").as("conv")),
        "conv", delta = 0.02)),
    "q444_variance_changepoint" -> ((s, dir) =>
      // the single best level-shift split of the daily total and how
      // much variance it explains — binary segmentation, step 1
      graft.operators.Forecast.varianceChangepoint(t(s, dir, "events"),
        "ts", "value")),
    "q445_group_trend" -> ((s, dir) =>
      // which event types actually trend? per-type Theil-Sen slope
      graft.operators.Forecast.senSlopeByGroup(t(s, dir, "events"),
        "event_type", "ts", "value")),
    "q446_similarity_sweep" -> ((s, dir) =>
      // pick the near-dup threshold BEFORE the dedup run: pairs per
      // Jaccard band + cumulative at-or-above (q236 operating point)
      graft.dedup.Dedup.jaccardBandSweep(
        t(s, dir, "documents").filter(col("doc_id") < 500),
        "doc_id", "text", minBand = 5)),
    "q447_lilliefors" -> ((s, dir) =>
      // is daily revenue Normal enough for +-k*sigma alerting? KS vs
      // the FITTED Normal (Lilliefors), A&S polynomial both engines
      graft.eda.StatTests.lilliefors(
        t(s, dir, "lineitem")
          .groupBy(col("l_shipdate").as("day"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast("double").as("rev")),
        "rev")),
    "q448_bowker" -> ((s, dir) => {
      // did per-user value bands SHIFT across the split? k x k paired
      // symmetry test (the multi-class McNemar); band = 6dp-free
      // integer-div lattice of the per-user mean in $25 steps
      val ev = graft.core.Tables.ltzTs(t(s, dir, "events"), "ts")
      val split = lit("2024-01-15 00:00:00").cast("timestamp")
      val dv = col("value").cast(DecimalType(18, 2))
      val agg = ev.groupBy("user_id").agg(
        (sum(when(col("ts") < split, dv)) * 100).cast("long").as("__sp"),
        sum(when(col("ts") < split, 1L)).as("__cp"),
        (sum(when(col("ts") >= split, dv)) * 100).cast("long").as("__sq"),
        sum(when(col("ts") >= split, 1L)).as("__cq"))
      // FLOOR division via pmod (exact in integer arithmetic): Spark's
      // `div` truncates toward zero while the DuckDB twin's `//`
      // floors — they disagree on negative per-user sums, so make the
      // floor explicit instead of relying on values being nonnegative
      val paired = agg
        .withColumn("a", least(
          expr("(__sp - pmod(__sp, 2500 * __cp)) div (2500 * __cp)"),
          lit(3L)))
        .withColumn("b", least(
          expr("(__sq - pmod(__sq, 2500 * __cq)) div (2500 * __cq)"),
          lit(3L)))
        .filter(col("a").isNotNull && col("b").isNotNull)
      graft.ml.Stats.bowker(paired, "a", "b")
    }),
    "q449_jonckheere" -> ((s, dir) =>
      // do quantities rise monotonically with the discount band?
      // ordered-alternative test over integer cell tables
      graft.eda.StatTests.jonckheereTerpstra(
        t(s, dir, "lineitem").select(
          floor(col("l_discount") * 20).cast("long").as("g"),
          col("l_quantity").cast("long").as("v")),
        "g", "v")),
    "q450_interval_coverage" -> ((s, dir) =>
      // are naive +-k*sigma alert bands honest? test-half coverage vs
      // nominal Normal mass
      graft.operators.Forecast.intervalCoverage(t(s, dir, "events"),
        "ts", "value", java.sql.Date.valueOf("2024-01-15"))),
    "q451_operating_points" -> ((s, dir) =>
      // where to set the score cutoff: highest threshold reaching
      // each target sensitivity, with spec/precision there
      graft.eda.StatTests.operatingPoints(
        t(s, dir, "customer").select(
          (col("c_custkey") % 100).cast("double").divide(lit(100))
            .as("s"),
          (col("c_acctbal") > 0).cast("int").as("y")),
        "s", "y")),
    "q452_mi_matrix" -> ((s, dir) =>
      // which lineitem categoricals are redundant? pairwise MI in one
      // stacked shuffle
      graft.eda.Association.miMatrix(
        t(s, dir, "lineitem").select(col("l_returnflag"),
          col("l_linestatus"),
          floor(col("l_discount") * 20).cast("long").as("disc_band")),
        Seq("l_returnflag", "l_linestatus", "disc_band"))),
    "q453_cohort_ltv" -> ((s, dir) =>
      // value-weighted retention triangle: cumulative per-user LTV by
      // cohort week and offset
      graft.operators.Cohorts.cohortLtv(t(s, dir, "events"),
        "user_id", "ts", "value")),
    "q454_partial_auc" -> ((s, dir) =>
      // model quality where screening actually operates: ROC area at
      // FPR <= 10%, integer-lattice step gate
      graft.ml.EvalExtras.partialAuc(
        t(s, dir, "customer").select(
          (col("c_custkey") % 100).cast("double").divide(lit(100))
            .as("s"),
          (col("c_acctbal") > 0).cast("int").as("y")),
        "s", "y")),
    "q455_dedup_savings" -> ((s, dir) =>
      // what does keep-first exact dedup save per source, in tokens?
      graft.dedup.Dedup.dedupSavings(t(s, dir, "documents"),
        "doc_id", "text", "source")),
    "q456_position_attribution" -> ((s, dir) =>
      // U-shaped 40/20/40 credit across each conversion journey —
      // completes the attribution family
      graft.operators.Reporting.positionAttribution(
        t(s, dir, "events"), "user_id", "ts", "event_type", "event_id",
        conversionType = "purchase",
        touchTypes = Seq("click", "view", "signup"))),
    "q457_novelty_curve" -> ((s, dir) =>
      // is later-ingested data still NEW content? per-bucket share of
      // never-seen word shingles over ingest order
      graft.text.CorpusStats.noveltyCurve(t(s, dir, "documents"),
        "doc_id", "text")),
    "q458_ks_by_group" -> ((s, dir) => {
      // which event types' value distributions moved across the
      // split? two-sample KS per segment, one grouped rank kernel
      val ev = graft.core.Tables.ltzTs(t(s, dir, "events"), "ts")
      val split = lit("2024-01-15 00:00:00").cast("timestamp")
      graft.eda.StatTests.ksByGroup(
        ev.select(col("event_type").as("g"),
          (col("ts") < split).cast("int").as("a"), col("value")),
        "g", "a", "value")
    }),
    "q459_turning_points" -> ((s, dir) =>
      // randomness check: does daily revenue zig-zag like iid noise
      // or glide like a trend? Kendall turning-points count
      graft.operators.Forecast.turningPoints(t(s, dir, "events"),
        "ts", "value")),
    "q460_von_neumann" -> ((s, dir) =>
      // mean-square successive difference / variance on the daily
      // total: 2 = iid, <2 = momentum, >2 = alternation
      graft.operators.Forecast.vonNeumann(t(s, dir, "events"),
        "ts", "value")),
    "q461_cost_curve" -> ((s, dir) =>
      // where to cut when a missed positive costs 5x a false alarm —
      // all-integer cost minimization over score thresholds
      graft.eda.StatTests.costCurve(
        t(s, dir, "customer").select(
          (col("c_custkey") % 100).cast("double").divide(lit(100))
            .as("s"),
          (col("c_acctbal") > 0).cast("int").as("y")),
        "s", "y", costFp = 1L, costFn = 5L)),
    "q462_contamination_sweep" -> ((s, dir) =>
      // which benchmark leaks most into the training pool? q106 per
      // eval set, one shingle pass
      graft.dedup.Contamination.contaminationSweep(
        t(s, dir, "documents"), "doc_id", "text",
        Seq("mod50" -> (col("doc_id") % 50 === 0),
          "mod97" -> (col("doc_id") % 97 === 0)))),
    "q463_defect_scan" -> ((s, dir) =>
      // which feed needs its extractor fixed? mojibake/control-byte/
      // glued-word/digit-table/blank triage per source
      graft.text.Scrub.defectScan(t(s, dir, "documents"),
        "source", "text")),
    "q464_w1_by_group" -> ((s, dir) => {
      // BY HOW MUCH did each event type's values move across the
      // split? earth-mover distance per segment (q458's companion)
      val ev = graft.core.Tables.ltzTs(t(s, dir, "events"), "ts")
      val split = lit("2024-01-15 00:00:00").cast("timestamp")
      graft.eda.StatTests.wassersteinByGroup(
        ev.select(col("event_type").as("g"),
          (col("ts") < split).cast("int").as("a"), col("value")),
        "g", "a", "value")
    }),
    "q465_acf_by_group" -> ((s, dir) =>
      // which event types carry day-over-day momentum? correlogram
      // per segment, lags 1..3
      graft.operators.Forecast.acfByGroup(t(s, dir, "events"),
        "event_type", "ts", "value")),
    "q466_seasonal_mk" -> ((s, dir) =>
      // monotone trend that a weekly cycle can't fake: Mann-Kendall
      // within day-of-week strata, summed
      graft.operators.Forecast.seasonalMannKendall(t(s, dir, "events"),
        "ts", "value")),
    "q467_gini_sweep" -> ((s, dir) =>
      // feature ranking in one pass: best gini split per pre-binned
      // feature against the returned-flag label
      graft.ml.InfoGain.giniSweep(
        t(s, dir, "lineitem").select(
          floor(col("l_quantity") / 10).cast("long").as("qty_band"),
          floor(col("l_discount") * 20).cast("long").as("disc_band"),
          floor(col("l_extendedprice") / 10000).cast("long")
            .as("price_band"),
          (col("l_returnflag") === "R").cast("int").as("y")),
        Seq("qty_band", "disc_band", "price_band"), "y")),
    "q468_rank_biserial" -> ((s, dir) => {
      // effect size under q349's signed-rank test: per-user pre/post
      // means, exact half-integer rank mass
      val ev = graft.core.Tables.ltzTs(t(s, dir, "events"), "ts")
      val split = lit("2024-01-15 00:00:00").cast("timestamp")
      val dv = col("value").cast(DecimalType(18, 2))
      val pairs = ev.groupBy("user_id").agg(
          (sum(when(col("ts") < split, dv)).cast("double") /
            sum(when(col("ts") < split, 1L))).as("x"),
          (sum(when(col("ts") >= split, dv)).cast("double") /
            sum(when(col("ts") >= split, 1L))).as("y"))
        .filter(col("x").isNotNull && col("y").isNotNull)
      graft.eda.ShapeTests.rankBiserial(pairs, "x", "y")
    }),
    "q469_variance_ratio" -> ((s, dir) =>
      // plain F spread comparison of returned vs kept quantities —
      // the normal-theory number next to q296's robust version
      graft.eda.StatTests.varianceRatio(t(s, dir, "lineitem"),
        "l_returnflag", "l_quantity", armA = "R", armB = "N")),
    "q470_km_by_group" -> ((s, dir) => {
      // which acquisition channel churns fastest? KM median survival
      // per first-event-type cohort
      val ev = graft.core.Tables.ltzTs(t(s, dir, "events"), "ts")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(unix_micros(col("ts")), col("event_id"))
      val firstType = ev
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("event_type").as("channel"))
      val life = ev.groupBy(col("user_id")).agg(
          min(to_date(col("ts"))).as("__f"),
          min(when(col("event_type") === "error", to_date(col("ts"))))
            .as("__e"),
          max(to_date(col("ts"))).as("__l"))
        .select(col("user_id"),
          datediff(coalesce(col("__e"), col("__l")), col("__f"))
            .as("t"),
          when(col("__e").isNotNull, 1).otherwise(0).as("e"))
        .filter(col("t") > 0)
        .join(firstType, Seq("user_id"))
      graft.ml.Stats.kmMedianByGroup(life, "channel", "t", "e")
    }),
    "q471_boilerplate_mass" -> ((s, dir) =>
      // how much of each feed is template chrome? share of per-doc
      // distinct shingles with doc-frequency >= 5
      graft.text.CorpusStats.boilerplateMass(t(s, dir, "documents"),
        "doc_id", "source", "text")),
    "q472_entropy_by_source" -> ((s, dir) =>
      // which source is templated prose? per-source entropy rate and
      // redundancy
      graft.text.Distinctive.entropyBySource(t(s, dir, "documents"),
        "source", "text")),
    "q473_streaks" -> ((s, dir) =>
      // momentum read-out: up/down day counts, longest streaks, and
      // the streak running at series end
      graft.operators.Forecast.streaks(t(s, dir, "events"),
        "ts", "value")),
    "q474_missingness" -> ((s, dir) =>
      // do nulls arrive TOGETHER (one upstream failure) or
      // independently (plain sparsity)? planted-null phi audit
      graft.eda.DataAudit.missingnessPattern(
        t(s, dir, "events").select(
          when(col("event_id") % 37 === 0, lit(null).cast("double"))
            .otherwise(col("value")).as("va"),
          when(col("event_id") % 37 === 0 || col("event_id") % 11 === 0,
            lit(null).cast("double")).otherwise(col("value")).as("vb"),
          when(col("event_id") % 41 === 0, lit(null).cast("double"))
            .otherwise(col("value")).as("vc")),
        Seq("va", "vb", "vc"))),
    "q475_reorder_gaps" -> ((s, dir) =>
      // how often do customers come back? type-1 percentiles of
      // per-customer reorder gaps in days
      graft.operators.Events.reorderGaps(t(s, dir, "orders"),
        "o_custkey", "o_orderdate")),
    "q476_latency_percentiles" -> ((s, dir) =>
      // the tail that pages people: p50/p90/p99 inter-event seconds
      // per type from entity-keyed lags
      graft.operators.Events.latencyPercentiles(t(s, dir, "events"),
        "user_id", "ts", "event_type")),
    "q477_hourly_profile" -> ((s, dir) =>
      // hour-of-week activity heatmap for capacity planning
      graft.operators.Reporting.hourlyProfile(t(s, dir, "events"),
        "ts")),
    "q478_weekend_lift" -> ((s, dir) =>
      // is weekend volume really higher? Welch effect size on daily
      // totals, not just the q189 profile
      graft.operators.Reporting.weekendLift(t(s, dir, "events"),
        "ts", "value")),
    "q479_psi_timeline" -> ((s, dir) =>
      // WHEN did the drift start? daily PSI vs the first-week
      // baseline on a fixed bin grid
      graft.eda.Quality.psiTimeline(t(s, dir, "events"),
        "ts", "value", binWidth = 10.0)),
    "q480_shard_exchange" -> ((s, dir) => {
      // cross-shard dedup exchange: N shards dedupe locally, exchange
      // fingerprint manifests (never text), a global first-seen
      // assignment picks winners — the N-store orchestration of the
      // q84 incremental store; rollup = per-shard exchange economics
      val docs = t(s, dir, "documents")
      val shards = (0 until 4).map { k =>
        (s"s$k", k,
          docs.filter(pmod(col("doc_id").cast("long"), lit(4L)) === k))
      }
      graft.dedup.ShardExchange.exchangeReport(shards, "doc_id", "text")
    }),
    "q481_logrank" -> ((s, dir) => {
      // do even- and odd-cohort users churn at different rates?
      // Mantel-Cox over the q417 life table, split by user parity
      val ev = graft.core.Tables.ltzTs(t(s, dir, "events"), "ts")
      val life = ev.groupBy(col("user_id")).agg(
          min(to_date(col("ts"))).as("__f"),
          min(when(col("event_type") === "error", to_date(col("ts"))))
            .as("__e"),
          max(to_date(col("ts"))).as("__l"))
        .select(datediff(coalesce(col("__e"), col("__l")), col("__f"))
          .as("dur"),
          when(col("__e").isNotNull, 1).otherwise(0).as("event"),
          when(pmod(col("user_id").cast("long"), lit(2L)) === 0, "even")
            .otherwise("odd").as("arm"))
        .filter(col("dur") > 0)
      graft.ml.SurvivalTests.logRank(life, "dur", "event", "arm",
        "even", "odd")
    }),
    "q482_krippendorff" -> ((s, dir) =>
      // do an order's line items agree on the return flag? nominal
      // multi-rater alpha with ragged units (1..7 lines per order)
      graft.eda.Agreement.krippendorffAlpha(
        t(s, dir, "lineitem"), "l_orderkey", "l_returnflag")),
    "q483_mixture_reweight" -> ((s, dir) =>
      // the pretraining-mix knob: per-source sampling weights that
      // morph the current token composition into a target recipe
      graft.text.CorpusStats.mixtureReweight(t(s, dir, "documents"),
        "source", "text", Map("src0" -> 0.2, "src1" -> 0.15,
          "src2" -> 0.1, "src3" -> 0.05), cap = 3.0)),
    "q484_cross_shard_neardups" -> ((s, dir) =>
      // can a sharded ingest near-dedup locally? pair mass that
      // crosses shard boundaries, via the exact prefix-filter join
      graft.dedup.ShardExchange.crossShardNearDups(
        t(s, dir, "documents").filter(col("doc_id") < 800),
        "doc_id", "text", nShards = 4, threshold = 0.3)),
    "q485_bucket_skew" -> ((s, dir) => {
      // does the 256-bucket exchange layout stay balanced? manifest
      // rows per fp_bucket + max/mean skew over the global assignment
      val docs = t(s, dir, "documents")
      val manifests = (0 until 4).map { k =>
        graft.dedup.ShardExchange.localManifest(
          docs.filter(pmod(col("doc_id").cast("long"), lit(4L)) === k),
          "doc_id", "text", s"s$k", k) }
      graft.dedup.ShardExchange.bucketSkew(
        graft.dedup.ShardExchange.globalAssign(manifests))
    }),
    "q486_bigram_entropy" -> ((s, dir) =>
      // CCNet-style LM quality filter without an external model:
      // corpus-trained add-k bigram MLE, per-source cross-entropy
      graft.text.LmScore.bigramCrossEntropy(t(s, dir, "documents"),
        "source", "text", k = 0.5)),
    "q487_mixture_apply" -> ((s, dir) =>
      // materialize the q483 mixture plan: hash-ranked token-budget
      // prefix per source, realized shares after the cut
      graft.text.CorpusStats.mixtureApply(t(s, dir, "documents"),
        "source", "doc_id", "text", Map("src0" -> 0.2, "src1" -> 0.15,
          "src2" -> 0.1, "src3" -> 0.05), cap = 3.0)),
    "q488_token_fertility" -> ((s, dir) =>
      // what does a tokenizer see per source? word-length mean/p50/p90
      // + tokens per doc from (source, word_len) cells
      graft.text.CorpusStats.tokenFertility(t(s, dir, "documents"),
        "source", "text")),
    "q489_shard_pair_overlap" -> ((s, dir) =>
      // WHICH shards collide? pairwise fingerprint-set Jaccard over
      // manifest-sized frames — the pre-exchange routing read
      graft.dedup.ShardExchange.shardPairOverlap(
        t(s, dir, "documents"), "doc_id", "text", nShards = 4)),
    "q490_order_reconciliation" -> ((s, dir) =>
      // does the header total agree with the detail? integer-lattice
      // recompute of o_totalprice vs lineitem terms, per status
      graft.eda.Integrity.reconcileOrderTotals(
        t(s, dir, "orders"), t(s, dir, "lineitem"))),
    "q491_length_quality_grid" -> ((s, dir) =>
      // WHERE would a length or stopword cut bite? 2-D occupancy grid
      // on integer-exact buckets
      graft.text.CorpusStats.lengthQualityGrid(
        t(s, dir, "documents"), "text")),
    "q492_backlog_curve" -> ((s, dir) =>
      // is fulfillment keeping up with intake? sweep-line open-order
      // count by month (+1 at order month, -1 after last ship month)
      graft.operators.Intervals.backlogByMonth(
        t(s, dir, "orders"), t(s, dir, "lineitem"),
        "o_orderkey", "l_orderkey", "o_orderdate", "l_shipdate")),
    "q493_lead_time" -> ((s, dir) =>
      // the fulfillment-SLA tail: order-to-last-ship days, type-1
      // p50/p90/p99 per priority class from (priority, days) cells
      graft.operators.Reporting.leadTimeProfile(
        t(s, dir, "orders"), t(s, dir, "lineitem"),
        "o_orderkey", "l_orderkey", "o_orderdate", "l_shipdate",
        "o_orderpriority")),
    "q494_shared_prefixes" -> ((s, dir) =>
      // machine-stamped headers: normalized first-8-char families per
      // source, share of docs in a >=2 family, the top template
      graft.text.Templates.sharedPrefixes(t(s, dir, "documents"),
        "source", "text", k = 8, minDocs = 2L)),
    "q495_dup_span_position" -> ((s, dir) =>
      // WHERE does duplicated text sit? per doc-third share of n-gram
      // instances whose shingle appears in >= 2 documents
      graft.text.CorpusStats.dupSpanPosition(t(s, dir, "documents"),
        "doc_id", "text", n = 3)),
    "q496_dup_attribution" -> ((s, dir) =>
      // who copies whom: keep-first losses per (winner_source,
      // dup_source) over template (prefix-8) families — the corpus
      // has no whole-text dups, so attribute the q494 header families
      graft.dedup.Dedup.dupAttribution(t(s, dir, "documents"),
        "doc_id", "source", "text", prefixChars = 8)),
    "q497_langid_confusion" -> ((s, dir) => {
      // lang-ID quality audit: labeled lang vs q31's predicted lang,
      // cell counts + share within each labeled row
      import org.apache.spark.sql.expressions.Window
      val cells = t(s, dir, "documents")
        .select(col("lang"), Text.langId(col("text")).as("lang_pred"))
        .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n_docs"))
      cells.withColumn("share",
          round(col("n_docs").cast("double") /
            sum("n_docs").over(Window.partitionBy("lang")), 6))
        .orderBy("lang", "lang_pred")
    }),
    "q498_ngram_df_histogram" -> ((s, dir) =>
      // the boilerplate-economics curve: shingle df spectrum with
      // instance-mass share per df bucket
      graft.text.CorpusStats.ngramDfHistogram(t(s, dir, "documents"),
        "doc_id", "text", n = 3)),
    "q499_growth_accounting" -> ((s, dir) =>
      // the DAU ledger: new/retained/resurrected/churned per day;
      // new + resurrected - churned = active delta
      graft.operators.Cohorts.growthAccounting(t(s, dir, "events"),
        "user_id", "ts")),
    "q500_function_word_cosine" -> ((s, dir) =>
      // stylometry over sources: integer-exact cosine between
      // function-word frequency vectors — relabeled-feed detector
      graft.text.Distinctive.functionWordCosine(
        t(s, dir, "documents"), "source", "text")),
    "q501_new_repeat_revenue" -> ((s, dir) =>
      // growth quality: monthly revenue split into first-month
      // (acquisition) vs returning (retention) customers
      graft.operators.Reporting.newRepeatRevenue(t(s, dir, "orders"),
        "o_custkey", "o_orderdate", "o_totalprice")),
    "q502_template_purity" -> ((s, dir) =>
      // are shared headers site templates or cross-source syndication?
      // family-size buckets with integer-exact pooled top-source share
      graft.text.Templates.templatePurity(t(s, dir, "documents"),
        "source", "text", k = 8)),
    "q503_winnow_density" -> ((s, dir) =>
      // MOSS winnowing fingerprint selection: realized density per
      // source vs the 2/(w+1) theory line — template-heavy sources
      // re-select the same minima and sit above it
      graft.dedup.Winnowing.densityBySource(t(s, dir, "documents"),
        "doc_id", "source", "text", k = 3, w = 4)),
    "q504_winnow_candidates" -> ((s, dir) =>
      // winnow-fingerprint dup candidates: guaranteed to catch any
      // shared run of >= w+k-1 tokens, df-capped band join
      graft.dedup.Winnowing.candidatePairs(t(s, dir, "documents"),
        "doc_id", "text", k = 3, w = 4, minShared = 2, maxDf = 10)),
    "q505_filter_agreement" -> ((s, dir) => {
      // do the C4 and Gopher presets agree? 2x2 verdict cells +
      // integer-exact Cohen's kappa per source. The raw corpus is
      // punctuation-free soup, so derive pages deterministically:
      // sentence/line breaks at " the " for everyone, and a
      // stopword-rich closing sentence for even doc_ids — giving both
      // filters genuinely mixed verdicts (all four cells populated).
      val pages = t(s, dir, "documents").select(col("doc_id"),
        col("source"),
        regexp_replace(concat(col("text"),
          when(col("doc_id") % 2 === 0,
            lit(" more rows of the batch and that plan with scans to finish here now."))
            .otherwise(lit(" tail"))),
          " the ", ".\n").as("text"))
      graft.text.FilterAgreement.c4GopherCells(pages, "source", "text")
    }),
    "q506_rake_keywords" -> ((s, dir) =>
      // RAKE multi-word keyphrases per source on the millionths
      // integer lattice (deg/freq word scores, exact integer sums)
      graft.text.Rake.keywordsBySource(t(s, dir, "documents"),
        "source", "text", lang = "en", maxLen = 4, topK = 10)),
    "q507_m4_downsample" -> ((s, dir) =>
      // M4 visualization downsampling (VLDB 2014): first/last/min/max
      // per (series, hour) with a total-order tie-break key
      graft.operators.Downsample.m4(t(s, dir, "events"),
        "event_type", "ts", "event_id", "value")),
    "q508_time_weighted_avg" -> ((s, dir) =>
      // LOCF time-weighted average per event type — day-bucketed
      // telescoping-sum kernel, algebraically equal to the flat window
      graft.operators.TimeWeighted.timeWeightedAvg(t(s, dir, "events"),
        "event_type", "ts", "event_id", "value")),
    "q509_stickiness" -> ((s, dir) =>
      // DAU/MAU engagement: integer user-day cells, two exact divisions
      graft.operators.Cohorts.stickiness(t(s, dir, "events"),
        "user_id", "ts")),
    "q510_marginals" -> ((s, dir) =>
      // GROUPING SETS marginals: per-dim totals + grand total in one
      // scan — the non-hierarchical shape rollup/cube can't express
      graft.operators.Reporting.marginals(t(s, dir, "lineitem"),
        "l_returnflag", "l_linestatus", "l_quantity")),
    "q511_learning_curve" -> ((s, dir) =>
      // is more data still buying accuracy? closed-form OLS learning
      // curve (n_chars ~ word count), hash-bucket splits, one scan
      graft.ml.LearningCurve.simpleOlsCurve(
        t(s, dir, "documents").select(col("doc_id"),
          size(graft.text.Text.tokens(col("text"))).as("n_words_x"),
          col("n_chars")),
        "n_words_x", "n_chars", col("doc_id"))),
    "q512_winnow_spectrum" -> ((s, dir) =>
      // operating curve for the winnow dedup threshold: pair volume
      // (verify-stage cost) at every n_shared cut
      graft.dedup.Winnowing.sharedSpectrum(t(s, dir, "documents"),
        "doc_id", "text", k = 3, w = 4, maxDf = 10)),
    "q513_minhash_calibration" -> ((s, dir) =>
      // MinHash reliability table: estimated vs exact Jaccard per
      // estimate decile on a fixed audit sample (salted-md5 minima)
      graft.dedup.SketchCalibration.minhashReliability(
        t(s, dir, "documents"), "doc_id", "text",
        numHashes = 16, idCap = 200)),
    "q514_brunner_munzel" -> ((s, dir) =>
      // heteroscedastic-robust rank test (the Mann-Whitney upgrade):
      // bucketed rank kernel for combined AND within-group mid-ranks
      graft.eda.RankTests.brunnerMunzel(t(s, dir, "events"),
        "event_type", "value", "click", "view")),
    "q515_cucconi" -> ((s, dir) =>
      // joint location-scale rank test (beats separate Wilcoxon +
      // Ansari-Bradley); exp(-C) asymptotic p
      graft.eda.RankTests.cucconi(t(s, dir, "events"),
        "event_type", "value", "purchase", "view")),
    "q516_isotonic_calibration" -> ((s, dir) =>
      // exact PAV fit (minimax form) of P(purchase) vs event value:
      // one corpus scan to B buckets, then metadata-frame algebra
      graft.ml.Isotonic.calibrate(
        t(s, dir, "events").select(col("value"),
          (col("event_type") === "purchase").as("is_purchase")),
        "value", "is_purchase")),
    "q517_copula_grid" -> ((s, dir) =>
      // rank-space dependence heatmap (empirical copula deciles) of
      // document length in words vs chars
      graft.eda.Copula.copulaGrid(
        t(s, dir, "documents").select(
          size(graft.text.Text.tokens(col("text"))).as("n_words_x"),
          col("n_chars")),
        "n_words_x", "n_chars")),
    "q518_char_js_matrix" -> ((s, dir) =>
      // orthographic style drift: char-trigram JS divergence between
      // every source pair (intersection join + totals, no vocab union)
      graft.text.StyleDrift.charJsMatrix(t(s, dir, "documents"),
        "source", "text", n = 3)),
    "q519_jl_distortion" -> ((s, dir) =>
      // JL projection audit: per true-cosine decile, the realized
      // distortion of k=16 md5-sign projections on a fixed sample
      graft.proximity.JlAudit.jlDistortion(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 16, idCap = 500)),
    "q520_snapshot_diff" -> ((s, dir) =>
      // corpus refresh diff: per (source, status) roll-up of the
      // id-keyed, md5-compared old-vs-new snapshot join
      graft.operators.SnapshotDiff.diff(
        t(s, dir, "documents").select("doc_id", "text", "source"),
        snapshotNewDf(s, dir), "doc_id", "text", "source")),
    "q521_incremental_stats" -> ((s, dir) =>
      // refreshed per-source stats from old stats + the diff only,
      // self-checked against a direct rescan of the new snapshot
      graft.operators.SnapshotDiff.incrementalStats(
        t(s, dir, "documents").select("doc_id", "text", "source"),
        snapshotNewDf(s, dir), "doc_id", "text", "source")),
    "q522_changed_similarity" -> ((s, dir) =>
      // how much did changed docs change: per-source mean word-set
      // Jaccard of old vs new text on the exact millionths lattice
      graft.operators.SnapshotDiff.changedSimilarity(
        t(s, dir, "documents").select("doc_id", "text", "source"),
        snapshotNewDf(s, dir), "doc_id", "text", "source"))
  )

  /** Deterministic "next ingestion run" snapshot of the documents
    * table (shared by q520–q522): doc_id % 20 == 3 removed,
    * % 20 ∈ {5, 11} changed (suffix stamp), % 20 == 7 re-added under
    * a shifted id ("new" documents), everything else unchanged. */
  private def snapshotNewDf(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text", "source")
    val kept = d.filter(col("doc_id") % 20 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 20 === 5 || col("doc_id") % 20 === 11,
          concat(col("text"), lit(" v2 update")))
          .otherwise(col("text")).as("text"),
        col("source"))
    val added = d.filter(col("doc_id") % 20 === 7)
      .select((col("doc_id") + lit(1000000000L)).as("doc_id"),
        concat(lit("new "), col("text")).as("text"), col("source"))
    kept.unionByName(added)
  }

  /** DuckDB twin of [[snapshotNewDf]]. */
  private val snapshotNewSql: String =
    """SELECT doc_id,
         CASE WHEN doc_id % 20 IN (5, 11) THEN text || ' v2 update'
           ELSE text END AS text, source
       FROM documents WHERE doc_id % 20 != 3
       UNION ALL
       SELECT doc_id + 1000000000 AS doc_id, 'new ' || text AS text,
         source
       FROM documents WHERE doc_id % 20 = 7"""

  private val snapshotOldSql: String =
    "SELECT doc_id, text, source FROM documents"

  /** The q39 proximity-graph edge list (shared by the graph-analytics
    * queries q141/q145/q146). */
  private def proximityEdges(s: SparkSession, dir: String): DataFrame = {
    val e = embDouble(s, dir).filter(col("vec_id") < 100)
    val nn = Proximity.knnJoinAdaptive(e, e, "vec_id", "embedding", 5, "euclidean", 64)
    graft.proximity.Analytics.proximityGraph(nn, minEdges = 2, extraThreshold = 0.8)
      .select("src", "dst")
  }

  /** The q39 edge list as a DuckDB CTE body (shared oracle fragment). */
  private def proximityEdgesSql: String =
    s"""WITH ${knnSql("true", "vec_id < 100", 5)},
        mx AS (SELECT CASE WHEN MAX(distance) = 0 THEN 1.0 ELSE MAX(distance) END AS m FROM knn),
        weighted AS (SELECT id AS src, neighbor_id AS dst,
            1 - distance / (SELECT m FROM mx) AS weight FROM knn)
        SELECT src, dst FROM weighted
        QUALIFY row_number() OVER (PARTITION BY src ORDER BY weight DESC, dst) <= 2
          OR weight > 0.8"""

  /** Deterministic pseudo-descriptor frame for the tag-catalog queries:
    * molecular descriptors aren't computable without RDKit, so integer-
    * derived stand-ins (exact in double on every engine) exercise every
    * threshold in the catalog. */
  private def partDescriptors(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey").as("id"),
      (lit(80) + (col("p_partkey") % 100) * 10).cast("double").as("mw"),
      ((col("p_size") % 13) - 4).cast("double").as("logp"),
      (col("p_partkey") % 8).cast("double").as("hbd"),
      (col("p_partkey") % 14).cast("double").as("hba"),
      (col("p_size") % 15).cast("double").as("rotbonds"),
      (col("p_partkey") % 200).cast("double").as("tpsa"))

  /** One lifecycle run shared by q79/q80: onboard a deterministic
    * formula model, endpoint it, capture one inference over lineitem
    * (api/model.py → api/endpoint.py journey). Memoized per (session,
    * sfDir): q80 reads the metrics q79's run persisted — re-running the
    * whole inference+capture would only re-create identical artifacts
    * (and is exactly what the reference avoids by storing them). */
  private val lifecycleCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), graft.api.Catalog]

  /** q125's trained PQ codebooks, memoized per (session, sfDir) — a
    * stored model artifact, same rationale as [[lifecycleCache]]. */
  private val pqBooksCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), graft.proximity.Pq.Codebooks]

  private def lifecycleCatalog(s: SparkSession, dir: String): graft.api.Catalog =
    lifecycleCache.getOrElseUpdate((s, dir), buildLifecycleCatalog(s, dir))

  private def buildLifecycleCatalog(s: SparkSession, dir: String): graft.api.Catalog = {
    val root = java.nio.file.Files.createTempDirectory("graft-lifecycle").toString
    val cat = new graft.api.Catalog(s, root)
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
    val m = cat.onboardFormulaModel("price_model", 10.0,
      Seq("l_quantity" -> 2.0, "l_discount" -> -5.0), target = "l_extendedprice")
    m.toEndpoint("price-endpoint")
      .inference(li, captureName = Some("run1"), idColumn = Some("l_orderkey"))
    cat
  }

  /** embeddings with the float vector cast to double (shared by the
    * proximity queries; matches the oracle's list_transform cast). */
  private def embDouble(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").withColumn("embedding",
      transform(col("embedding"), x => x.cast("double")))

  /** Shared oracle CTE: embeddings cast to double + euclidean KNN.
    * Mirrors knnJoin semantics incl. the 1e-6 near-zero clamp. */
  private def knnSql(queryFilter: String, refFilter: String, k: Int): String =
    s"""e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
              label FROM embeddings WHERE $refFilter),
        qs AS (SELECT * FROM e WHERE $queryFilter),
        pairs AS (SELECT qs.vec_id AS id, r.vec_id AS neighbor_id,
            CASE WHEN list_distance(qs.v, r.v) < 1e-6 THEN 0.0
                 ELSE list_distance(qs.v, r.v) END AS distance
          FROM qs CROSS JOIN e r WHERE qs.vec_id != r.vec_id),
        knn AS (SELECT * FROM pairs QUALIFY
          row_number() OVER (PARTITION BY id ORDER BY distance, neighbor_id) <= $k)"""

  /** Cents-lattice column for the exact mean/stddev oracles
    * (mirrors Eda.descriptiveStats' xc: NaN guarded BEFORE the
    * decimal cast, null for NaN). */
  private def latticeXcSql(c: String): String =
    s"""CASE WHEN NOT isnan(CAST($c AS DOUBLE))
        THEN CAST(TRY_CAST($c AS DECIMAL(18,2)) * 100 AS HUGEINT) END"""

  /** The four lattice moment aggregates (cnt, s1i, s2i, nanc) over a
    * frame exposing (c0, xc). */
  private val latticeMomentAggs: String =
    """COUNT(xc) AS cnt, SUM(xc) AS s1i, SUM(xc * xc) AS s2i,
       SUM(CASE WHEN isnan(CAST(c0 AS DOUBLE)) THEN 1 ELSE 0 END)
         AS nanc"""

  /** Engine-portable mean of the lattice moments — the identical
    * expression tree Eda.descriptiveStats builds on the Spark side. */
  private def latticeMeanSql(cnt: String, s1i: String,
                             nanc: String): String =
    s"""CASE WHEN $nanc > 0 THEN CAST('NaN' AS DOUBLE)
        WHEN $cnt > 0 THEN
          (${graft.core.Lattice.duckPortableDoubleSigned(s1i)} / 100.0)
            / CAST($cnt AS DOUBLE) END"""

  /** Engine-portable sample stddev of the lattice moments. */
  private def latticeStdSql(cnt: String, s1i: String, s2i: String,
                            nanc: String): String = {
    val pdd = graft.core.Lattice.duckPortableDoubleSigned _
    s"""CASE WHEN $nanc > 0 THEN CAST('NaN' AS DOUBLE)
        WHEN $cnt >= 2 THEN SQRT(GREATEST(
          ((${pdd(s2i)} / 10000.0)
            - (${pdd(s1i)} / 100.0) * (${pdd(s1i)} / 100.0)
              / CAST($cnt AS DOUBLE))
            / (CAST($cnt AS DOUBLE) - 1), 0.0)) END"""
  }

  /** DuckDB-runnable oracles; keys/aliases match `queries` exactly.
    * Omitted keys (q32/q33 — engine-specific hash functions) get the
    * driver's weaker rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         ROUND(AVG(l_quantity), 4) AS avg_qty,
         ROUND(AVG(l_discount), 6) AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_num_rows" -> "SELECT COUNT(*) AS num_rows FROM lineitem",
    "q03_descriptive_stats" -> Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(c =>
        s"""SELECT '$c' AS column_name, mn AS min, q1v AS q1,
            medv AS median, q3v AS q3, mx AS max,
            ROUND(${latticeMeanSql("cnt", "s1i", "nanc")}, 6) AS mean,
            ROUND(${latticeStdSql("cnt", "s1i", "s2i", "nanc")}, 6)
              AS stddev
          FROM (SELECT CAST(MIN(c0) AS DOUBLE) AS mn,
              ROUND(quantile_cont(c0, 0.25), 6) AS q1v,
              ROUND(quantile_cont(c0, 0.5), 6) AS medv,
              ROUND(quantile_cont(c0, 0.75), 6) AS q3v,
              CAST(MAX(c0) AS DOUBLE) AS mx, $latticeMomentAggs
            FROM (SELECT $c AS c0, ${latticeXcSql(c)} AS xc
              FROM lineitem))""").mkString(" UNION ALL "),
    "q04_count_distinct" ->
      """SELECT COUNT(DISTINCT l_quantity) AS l_quantity,
         COUNT(DISTINCT l_extendedprice) AS l_extendedprice,
         COUNT(DISTINCT l_discount) AS l_discount,
         COUNT(DISTINCT l_tax) AS l_tax,
         COUNT(DISTINCT l_orderkey) AS l_orderkey,
         COUNT(DISTINCT l_returnflag) AS l_returnflag FROM lineitem""",
    "q05_count_nulls" ->
      """SELECT COUNT(CASE WHEN l_quantity IS NULL THEN 1 END) AS l_quantity,
         COUNT(CASE WHEN l_extendedprice IS NULL THEN 1 END) AS l_extendedprice,
         COUNT(CASE WHEN l_discount IS NULL THEN 1 END) AS l_discount,
         COUNT(CASE WHEN l_tax IS NULL THEN 1 END) AS l_tax FROM lineitem""",
    "q06_count_zeros" ->
      """SELECT COUNT(CASE WHEN l_quantity = 0 THEN 1 END) AS l_quantity,
         COUNT(CASE WHEN l_extendedprice = 0 THEN 1 END) AS l_extendedprice,
         COUNT(CASE WHEN l_discount = 0 THEN 1 END) AS l_discount,
         COUNT(CASE WHEN l_tax = 0 THEN 1 END) AS l_tax FROM lineitem""",
    "q07_correlations" -> {
      val cols = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
      val pairs = for { a <- cols; b <- cols if a != b } yield (a, b)
      pairs.map { case (a, b) =>
        s"SELECT '$a' AS col_1, '$b' AS col_2, ROUND(CORR($a, $b), 6) AS correlation FROM lineitem"
      }.mkString(" UNION ALL ")
    },
    "q08_value_counts" ->
      """(SELECT o_orderpriority AS value, COUNT(*) AS count FROM orders
          GROUP BY 1 ORDER BY count DESC, value ASC LIMIT 20)
         UNION ALL
         (SELECT o_orderpriority AS value, COUNT(*) AS count FROM orders
          GROUP BY 1 ORDER BY count ASC, value DESC LIMIT 20)""",
    "q09_outliers" ->
      """WITH b AS (SELECT quantile_cont(c_acctbal, 0.25) AS q1,
                           quantile_cont(c_acctbal, 0.75) AS q3 FROM customer)
         SELECT c_custkey, c_acctbal FROM customer, b
         WHERE c_acctbal < q1 - 1.5 * (q3 - q1) OR c_acctbal > q3 + 1.5 * (q3 - q1)""",
    "q10_snapshot" ->
      """SELECT user_id, event_id, event_type, value FROM events
         QUALIFY row_number() OVER (PARTITION BY user_id
           ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) = 1""",
    "q11_column_subset" -> "SELECT c_custkey, c_name, c_acctbal FROM customer",
    "q12_join_view" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey""",
    "q13_training_view" ->
      """SELECT c.c_custkey, c.c_name, c.c_acctbal,
         CAST(COALESCE(r.sample_weight, 1.0) AS DOUBLE) AS sample_weight,
         COALESCE(r.validation, false) AS validation
         FROM customer c LEFT JOIN (
           SELECT c_custkey, c_custkey % 7 = 0 AS exclude,
                  c_custkey % 5 = 0 AS validation, 2.0 AS sample_weight
           FROM customer WHERE c_custkey % 2 = 0) r
         ON c.c_custkey = r.c_custkey
         WHERE NOT COALESCE(r.exclude, false)""",
    "q14_topk_per_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
         FROM orders QUALIFY rank <= 3""",
    "q15_temporal_split" ->
      """SELECT event_id, event_type, value FROM events
         WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-03-01 00:00:00'""",
    "q16_union_dedup" ->
      """SELECT event_id, ANY_VALUE(event_type) AS event_type, ANY_VALUE(value) AS value
         FROM (SELECT event_id, event_type, value FROM events WHERE value > 150
               UNION ALL
               SELECT event_id, event_type, value FROM events WHERE event_type = 'error')
         GROUP BY event_id""",
    "q17_one_hot" ->
      """SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS o_orderstatus_f,
         CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS o_orderstatus_o,
         CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS o_orderstatus_p
         FROM orders""",
    "q18_confusion_matrix" ->
      """SELECT event_type AS label,
         CASE WHEN value >= 100 THEN 'purchase' ELSE event_type END AS prediction,
         COUNT(*) AS count FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q19_regression_metrics" ->
      """SELECT ROUND(SQRT(AVG((o_totalprice - pred) * (o_totalprice - pred))), 2) AS rmse,
         ROUND(AVG(ABS(o_totalprice - pred)), 2) AS mae,
         ROUND(quantile_cont(ABS(o_totalprice - pred), 0.5), 2) AS medae,
         ROUND(1.0 - SUM((o_totalprice - pred) * (o_totalprice - pred)) /
           (SUM(o_totalprice * o_totalprice) - COUNT(*) * AVG(o_totalprice) * AVG(o_totalprice)), 6) AS r2
         FROM (SELECT o_totalprice,
               o_totalprice * CAST(0.9 AS DOUBLE) + 1000 AS pred FROM orders)""",
    "q20_classification_report" ->
      """WITH cm AS (SELECT event_type AS label,
             CASE WHEN value >= 100 THEN 'purchase' ELSE event_type END AS prediction,
             COUNT(*) AS count FROM events GROUP BY 1, 2),
         actual AS (SELECT label AS class, CAST(SUM(count) AS BIGINT) AS support FROM cm GROUP BY 1),
         predicted AS (SELECT prediction AS class, CAST(SUM(count) AS BIGINT) AS n_pred FROM cm GROUP BY 1),
         tp AS (SELECT label AS class, CAST(count AS BIGINT) AS tp FROM cm WHERE label = prediction)
         SELECT a.class, a.support,
           ROUND(COALESCE(t.tp, 0) / GREATEST(COALESCE(p.n_pred, 0), 1), 6) AS precision,
           ROUND(COALESCE(t.tp, 0) / GREATEST(a.support, 1), 6) AS recall,
           ROUND(CASE WHEN ROUND(COALESCE(t.tp, 0) / GREATEST(COALESCE(p.n_pred, 0), 1), 6)
                         + ROUND(COALESCE(t.tp, 0) / GREATEST(a.support, 1), 6) = 0 THEN 0
             ELSE 2 * ROUND(COALESCE(t.tp, 0) / GREATEST(COALESCE(p.n_pred, 0), 1), 6)
                    * ROUND(COALESCE(t.tp, 0) / GREATEST(a.support, 1), 6)
                  / (ROUND(COALESCE(t.tp, 0) / GREATEST(COALESCE(p.n_pred, 0), 1), 6)
                     + ROUND(COALESCE(t.tp, 0) / GREATEST(a.support, 1), 6)) END, 6) AS f1
         FROM actual a LEFT JOIN predicted p ON a.class = p.class
         LEFT JOIN tp t ON a.class = t.class ORDER BY a.class""",
    "q21_top_revenue_orders" ->
      """SELECT o_orderkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "q22_nation_revenue" ->
      """SELECT n_name,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q23_time_rollup" ->
      """SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q24_json_extract" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events""",
    "q25_knn_cosine" ->
      """WITH q AS (SELECT vec_id AS id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
           FROM embeddings WHERE vec_id < 10),
         r AS (SELECT vec_id AS neighbor_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS re
           FROM embeddings),
         pairs AS (SELECT id, neighbor_id,
             list_dot_product(qe, re) /
             (SQRT(list_dot_product(qe, qe)) * SQRT(list_dot_product(re, re))) AS sim
           FROM q CROSS JOIN r WHERE id != neighbor_id)
         SELECT id, neighbor_id, ROUND(sim, 4) AS similarity FROM pairs
         QUALIFY row_number() OVER (PARTITION BY id ORDER BY sim DESC, neighbor_id) <= 5""",
    "q26_doc_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
         FROM documents""",
    "q27_exact_dedup" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
         MIN(doc_id) AS keeper_id, COUNT(*) AS n_dups FROM documents GROUP BY 1""",
    "q28_jaccard_pairs" ->
      """WITH docs AS (SELECT doc_id,
             list_distinct(list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0)) AS w
           FROM documents WHERE doc_id < 200)
         SELECT * FROM (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ROUND(CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) /
                   len(list_distinct(list_concat(a.w, b.w))), 6) AS jaccard
           FROM docs a CROSS JOIN docs b WHERE a.doc_id < b.doc_id)
         WHERE jaccard >= 0.5""",
    "q29_token_stats" ->
      """SELECT doc_id, length(text) AS n_chars_m,
         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
           x -> length(x) > 0)) AS n_words,
         len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_tokens
         FROM documents""",
    "q30_quality_signals" -> {
      val en = Text.stopwords("en").map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH d AS (SELECT doc_id, lang, source, n_chars, text,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
               x -> length(x) > 0) AS toks
           FROM documents)
         SELECT doc_id, lang, source, n_chars,
           length(text) AS n_chars_m, len(toks) AS n_words,
           ROUND(CASE WHEN len(toks) = 0 THEN 0
             ELSE list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE))) / len(toks)
             END, 4) AS mean_word_len,
           ROUND(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) /
             GREATEST(length(text), 1), 4) AS punct_ratio,
           ROUND(CASE WHEN len(toks) = 0 THEN 0
             ELSE CAST(len(list_filter(toks, x -> list_contains($en, x))) AS DOUBLE) / len(toks)
             END, 4) AS stopword_ratio
         FROM d"""
    },
    "q31_lang_id" -> {
      def ratio(l: String): String = {
        val sw = Text.stopwords(l).map(w => s"'$w'").mkString("[", ", ", "]")
        s"CAST(len(list_filter(toks, x -> list_contains($sw, x))) AS DOUBLE) / GREATEST(len(toks), 1)"
      }
      s"""WITH d AS (SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
               x -> length(x) > 0) AS toks
           FROM documents),
         s AS (SELECT doc_id, ${ratio("de")} AS s_de, ${ratio("en")} AS s_en,
                      ${ratio("es")} AS s_es, ${ratio("fr")} AS s_fr FROM d)
         SELECT doc_id, CASE
           WHEN s_fr > 0 AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
           WHEN s_es > 0 AND s_es >= s_en AND s_es >= s_de THEN 'es'
           WHEN s_en > 0 AND s_en >= s_de THEN 'en'
           WHEN s_de > 0 THEN 'de'
           ELSE 'und' END AS lang_pred
         FROM s"""
    },
    "q34_target_health" ->
      """SELECT COUNT(*) AS n_rows,
         COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END) AS n_null,
         ROUND(MIN(o_totalprice), 6) AS min, ROUND(MAX(o_totalprice), 6) AS max,
         ROUND(AVG(o_totalprice), 6) AS mean,
         ROUND(quantile_cont(o_totalprice, 0.5), 6) AS median,
         ROUND(CAST(COUNT(CASE WHEN o_totalprice = (SELECT MIN(o_totalprice) FROM orders)
           THEN 1 END) AS DOUBLE) / COUNT(*), 6) AS min_mass,
         ROUND(CAST(COUNT(CASE WHEN o_totalprice = (SELECT MAX(o_totalprice) FROM orders)
           THEN 1 END) AS DOUBLE) / COUNT(*), 6) AS max_mass
         FROM orders""",
    "q35_detect_drift" -> {
      def side(tag: String, filter: String): String =
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map(c =>
          s"""SELECT '$c' AS column_name, CAST(MIN($c) AS DOUBLE) AS ${tag}_min,
              CAST(MAX($c) AS DOUBLE) AS ${tag}_max, AVG($c) AS ${tag}_mean
              FROM lineitem $filter""").mkString(" UNION ALL ")
      s"""WITH cur AS (${side("cur", "")}),
          base AS (${side("base", "WHERE l_shipdate < TIMESTAMP '1997-01-01'")})
          SELECT cur.column_name, ROUND(base_mean, 6) AS base_mean,
            ROUND(cur_mean, 6) AS cur_mean,
            ROUND(ABS(cur_mean - base_mean) /
              (CASE WHEN base_max - base_min = 0 THEN 1.0
                    ELSE base_max - base_min END), 6) AS mean_drift,
            ROUND(ABS(cur_mean - base_mean) /
              (CASE WHEN base_max - base_min = 0 THEN 1.0
                    ELSE base_max - base_min END), 6) > 0.1 AS drifted
          FROM cur JOIN base ON cur.column_name = base.column_name"""
    },
    "q36_feature_quality" ->
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map(c =>
        s"""SELECT '$c' AS column_name,
            ROUND(CAST(nnul AS DOUBLE) / nall, 6) AS null_frac,
            ROUND(CAST(nzero AS DOUBLE) / nall, 6) AS zero_frac,
            ROUND(CASE WHEN nanc > 0 THEN CAST('NaN' AS DOUBLE)
              WHEN cnt >= 2 THEN GREATEST(
                ((${graft.core.Lattice.duckPortableDoubleSigned("s2i")}
                    / 10000.0)
                  - (${graft.core.Lattice.duckPortableDoubleSigned("s1i")}
                      / 100.0)
                    * (${graft.core.Lattice.duckPortableDoubleSigned("s1i")}
                        / 100.0) / CAST(cnt AS DOUBLE))
                  / (CAST(cnt AS DOUBLE) - 1), 0.0) END, 6) AS variance,
            n_distinct
          FROM (SELECT COUNT(*) AS nall,
              COUNT(CASE WHEN c0 IS NULL THEN 1 END) AS nnul,
              COUNT(CASE WHEN c0 = 0 THEN 1 END) AS nzero,
              COUNT(DISTINCT c0) AS n_distinct, $latticeMomentAggs
            FROM (SELECT $c AS c0, ${latticeXcSql(c)} AS xc
              FROM lineitem))""").mkString(" UNION ALL "),
    "q38_residual_features" ->
      s"""WITH ${knnSql("vec_id < 30", "vec_id < 100", 5)},
          aggs AS (SELECT knn.id, AVG(distance) AS knn_distance,
              AVG(CAST(r.label AS DOUBLE)) AS knn_target_mean,
              STDDEV(CAST(r.label AS DOUBLE)) AS knn_target_std
            FROM knn JOIN e r ON knn.neighbor_id = r.vec_id GROUP BY 1)
          SELECT qs.vec_id AS id, CAST(qs.label AS DOUBLE) AS target,
            ROUND(qs.label * CAST(0.9 AS DOUBLE), 6) AS prediction,
            ROUND(knn_distance, 4) AS knn_distance,
            ROUND(knn_target_mean, 6) AS knn_target_mean,
            ROUND(knn_target_std, 6) AS knn_target_std,
            ROUND(qs.label * CAST(0.9 AS DOUBLE) - knn_target_mean, 4) AS local_pred_gap
          FROM qs LEFT JOIN aggs ON qs.vec_id = aggs.id""",
    "q39_proximity_graph" ->
      s"""WITH ${knnSql("true", "vec_id < 100", 5)},
          mx AS (SELECT CASE WHEN MAX(distance) = 0 THEN 1.0 ELSE MAX(distance) END AS m FROM knn),
          weighted AS (SELECT id AS src, neighbor_id AS dst,
              1 - distance / (SELECT m FROM mx) AS weight FROM knn)
          SELECT src, dst, ROUND(weight, 6) AS weight FROM weighted
          QUALIFY row_number() OVER (PARTITION BY src ORDER BY weight DESC, dst) <= 2
            OR weight > 0.8""",
    "q40_laplacian_smoothness" ->
      s"""WITH ${knnSql("true", "vec_id < 100", 5)},
          mx AS (SELECT CASE WHEN MAX(distance) = 0 THEN 1.0 ELSE MAX(distance) END AS m FROM knn),
          weighted AS (SELECT id AS src, neighbor_id AS dst,
              1 - distance / (SELECT m FROM mx) AS weight FROM knn),
          edges AS (SELECT * FROM weighted
            QUALIFY row_number() OVER (PARTITION BY src ORDER BY weight DESC, dst) <= 2
              OR weight > 0.8),
          terms AS (SELECT edges.src, edges.dst,
              weight * POW(CAST(a.label AS DOUBLE) - CAST(b.label AS DOUBLE), 2) AS term
            FROM edges JOIN e a ON edges.src = a.vec_id JOIN e b ON edges.dst = b.vec_id),
          per_node AS (SELECT src AS id, SUM(term) AS node_smoothness,
              COUNT(*) AS degree FROM terms GROUP BY 1),
          g AS (SELECT SUM(term) / COUNT(*) AS global_smoothness FROM terms)
          SELECT id, ROUND(node_smoothness, 4) AS node_smoothness, degree,
            ROUND(global_smoothness, 4) AS global_smoothness
          FROM per_node CROSS JOIN g""",
    "q41_target_gradients" ->
      s"""WITH ${knnSql("vec_id < 30", "vec_id < 100", 5)}
          SELECT knn.id, knn.neighbor_id, ROUND(distance, 4) AS feature_diff,
            CAST(b.label AS DOUBLE) - CAST(a.label AS DOUBLE) AS target_diff,
            ROUND(CASE WHEN distance > 0
              THEN ABS(CAST(b.label AS DOUBLE) - CAST(a.label AS DOUBLE)) / distance
              END, 4) AS target_gradient
          FROM knn JOIN e a ON knn.id = a.vec_id JOIN e b ON knn.neighbor_id = b.vec_id""",
    "q42_row_tags" ->
      s"""WITH ${knnSql("true", "vec_id < 100", 5)},
          grads AS (SELECT knn.id,
              MAX(CASE WHEN distance <= 1e-6 THEN 1 ELSE 0 END) AS coinc,
              MAX(CASE WHEN distance > 0 AND
                ABS(CAST(b.label AS DOUBLE) - CAST(a.label AS DOUBLE)) / distance > 2.0
                THEN 1 ELSE 0 END) AS cliff
            FROM knn JOIN e a ON knn.id = a.vec_id JOIN e b ON knn.neighbor_id = b.vec_id
            GROUP BY 1)
          SELECT e.vec_id AS id, concat_ws(',',
            CASE WHEN e.label = 0 THEN 'zero_target' END,
            CASE WHEN COALESCE(coinc, 0) = 1 THEN 'coincident' END,
            CASE WHEN COALESCE(cliff, 0) = 1 THEN 'high_gradient' END) AS tags
          FROM e LEFT JOIN grads ON e.vec_id = grads.id""",
    "q43_landscape_isolated" ->
      s"""WITH ${knnSql("true", "vec_id < 200", 3)},
          nearest AS (SELECT id, MIN(distance) AS nn_distance FROM knn GROUP BY 1),
          cut AS (SELECT quantile_cont(nn_distance, 0.9) AS c FROM nearest)
          SELECT id, ROUND(nn_distance, 4) AS nn_distance FROM nearest
          WHERE nn_distance > (SELECT c FROM cut)""",
    "q48_flatten_json" ->
      """SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS p_k FROM events""",
    "q49_knn_euclidean" ->
      s"""WITH ${knnSql("vec_id < 10", "true", 5)}
          SELECT id, neighbor_id, ROUND(distance, 4) AS distance FROM knn""",
    "q50_knn_ruzicka" ->
      """WITH f AS (SELECT vec_id,
             list_transform(embedding, x -> floor(abs(CAST(x AS DOUBLE) * 20))) AS v
           FROM embeddings WHERE vec_id < 300),
         qs AS (SELECT * FROM f WHERE vec_id < 10),
         sums AS (SELECT qs.vec_id AS id, r.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, len(qs.v) + 1),
               i -> least(qs.v[i], r.v[i]))) AS smin,
             list_sum(list_transform(range(1, len(qs.v) + 1),
               i -> greatest(qs.v[i], r.v[i]))) AS smax
           FROM qs CROSS JOIN f r WHERE qs.vec_id != r.vec_id),
         pairs AS (SELECT id, neighbor_id,
             1 - CASE WHEN smax = 0 THEN 1.0 ELSE smin / smax END AS d0 FROM sums),
         knn AS (SELECT id, neighbor_id,
             CASE WHEN d0 < 1e-6 THEN 0.0 ELSE d0 END AS distance FROM pairs
           QUALIFY row_number() OVER (PARTITION BY id
             ORDER BY CASE WHEN d0 < 1e-6 THEN 0.0 ELSE d0 END, neighbor_id) <= 5)
         SELECT id, neighbor_id, ROUND(distance, 6) AS distance FROM knn""",
    "q51_multi_task_alignment" -> {
      val cols = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
      val pairs = for { a <- cols; b <- cols if a < b } yield (a, b)
      pairs.map { case (a, b) =>
        s"""SELECT '$a' AS task_1, '$b' AS task_2,
            ROUND(CORR($a, $b), 6) AS pearson_r,
            ROUND(CAST(COUNT(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL THEN 1 END)
              AS DOUBLE) / COUNT(*), 6) AS coverage FROM lineitem"""
      }.mkString(" UNION ALL ")
    },
    "q52_feature_spider" ->
      s"""WITH ${knnSql("vec_id < 30", "vec_id < 100", 5)},
          aggs AS (SELECT knn.id, AVG(CAST(r.label AS DOUBLE)) AS knn_prediction,
              MAX(CASE WHEN distance <= 1e-6 THEN 1 ELSE 0 END) AS coinc
            FROM knn JOIN e r ON knn.neighbor_id = r.vec_id GROUP BY 1),
          cliffs AS (SELECT knn.id,
              MAX(CASE WHEN distance > 0 AND
                ABS(CAST(b.label AS DOUBLE) - CAST(a.label AS DOUBLE)) / distance > 2.0
                THEN 1 ELSE 0 END) AS cliff
            FROM knn JOIN e a ON knn.id = a.vec_id JOIN e b ON knn.neighbor_id = b.vec_id
            GROUP BY 1)
          SELECT qs.vec_id AS id, CAST(qs.label AS DOUBLE) AS target,
            ROUND(knn_prediction, 6) AS knn_prediction,
            ROUND(ABS(CAST(qs.label AS DOUBLE) - knn_prediction), 6) AS knn_error,
            COALESCE(coinc, 0) = 1 AS coincident,
            COALESCE(cliff, 0) = 1 AS high_gradient
          FROM qs LEFT JOIN aggs ON qs.vec_id = aggs.id
          LEFT JOIN cliffs ON qs.vec_id = cliffs.id""",
    "q53_dedup_clusters" ->
      """WITH RECURSIVE docs AS (SELECT doc_id, lang, source,
             list_distinct(list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0)) AS w
           FROM documents WHERE doc_id < 200),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM docs a CROSS JOIN docs b WHERE a.doc_id < b.doc_id
             AND ROUND(CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) /
                 len(list_distinct(list_concat(a.w, b.w))), 6) >= 0.7),
         edges AS (SELECT id_a AS src, id_b AS dst FROM p
           UNION SELECT id_b, id_a FROM p),
         reach(src, dst) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         comp AS (SELECT src AS id, LEAST(src, MIN(dst)) AS component
           FROM reach GROUP BY src)
         SELECT doc_id, lang, source FROM docs
         WHERE doc_id NOT IN (SELECT id FROM comp WHERE id != component)""",
    "q54_quantile_split" ->
      """SELECT c_custkey, c_acctbal,
         ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quantile
         FROM customer""",
    "q55_column_stats" -> {
      val cols = Seq(("o_orderkey", "bigint"), ("o_custkey", "bigint"),
        ("o_orderstatus", "string"), ("o_totalprice", "double"),
        ("o_orderdate", "timestamp"), ("o_orderpriority", "string"))
      cols.map { case (c, ty) =>
        s"""SELECT '$c' AS column_name, COUNT(DISTINCT $c) AS n_distinct,
            COUNT(CASE WHEN $c IS NULL THEN 1 END) AS n_nulls,
            '$ty' AS dtype FROM orders"""
      }.mkString(" UNION ALL ")
    },
    "q56_stratified_split" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE substr(md5(CAST(c_custkey AS VARCHAR) || ':42'), 1, 8) <
           lower(lpad(to_hex(CAST(floor(0.8 * 4294967296) AS BIGINT)), 8, '0'))""",
    "q57_label_noise" ->
      s"""WITH ${knnSql("true", "vec_id < 100", 5)},
          votes AS (SELECT knn.id, r.label AS nl, COUNT(*) AS n_votes
            FROM knn JOIN e r ON knn.neighbor_id = r.vec_id GROUP BY 1, 2),
          majority AS (SELECT id, nl AS majority_label, n_votes FROM votes
            QUALIFY row_number() OVER (PARTITION BY id
              ORDER BY n_votes DESC, nl ASC) = 1),
          totals AS (SELECT id, COUNT(*) AS k FROM knn GROUP BY 1)
          SELECT e.vec_id AS id, e.label, m.majority_label,
            ROUND(CAST(m.n_votes AS DOUBLE) / t.k, 6) AS agreement,
            e.label != m.majority_label AS noisy
          FROM e JOIN majority m ON e.vec_id = m.id
          JOIN totals t ON e.vec_id = t.id""",
    "q58_fingerprint_tanimoto" ->
      """WITH f AS (SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(abs(CAST(x AS DOUBLE) * 20)) AS INT)) AS v
           FROM embeddings WHERE vec_id < 50),
         q0 AS (SELECT v AS v0 FROM f WHERE vec_id = 0),
         sums AS (SELECT f.vec_id,
             list_sum(list_transform(range(1, len(f.v) + 1),
               i -> CAST(least(f.v[i], v0[i]) AS DOUBLE))) AS smin,
             list_sum(list_transform(range(1, len(f.v) + 1),
               i -> CAST(greatest(f.v[i], v0[i]) AS DOUBLE))) AS smax
           FROM f CROSS JOIN q0)
         SELECT vec_id,
           ROUND(CASE WHEN smax = 0 THEN 1.0 ELSE smin / smax END, 6) AS tanimoto
         FROM sums""",
    "q59_feature_space_knn" ->
      """WITH li AS (SELECT l_orderkey * 10 + l_linenumber AS rid,
             l_quantity, l_extendedprice, l_discount, l_tax
           FROM lineitem WHERE l_orderkey * 10 + l_linenumber < 3000),
         st AS (SELECT AVG(l_quantity) AS mu1, STDDEV(l_quantity) AS sd1,
             AVG(l_extendedprice) AS mu2, STDDEV(l_extendedprice) AS sd2,
             AVG(l_discount) AS mu3, STDDEV(l_discount) AS sd3,
             AVG(l_tax) AS mu4, STDDEV(l_tax) AS sd4 FROM li),
         z AS (SELECT rid,
             (l_quantity - mu1) / (CASE WHEN sd1 = 0 THEN 1 ELSE sd1 END) AS z1,
             (l_extendedprice - mu2) / (CASE WHEN sd2 = 0 THEN 1 ELSE sd2 END) AS z2,
             (l_discount - mu3) / (CASE WHEN sd3 = 0 THEN 1 ELSE sd3 END) AS z3,
             (l_tax - mu4) / (CASE WHEN sd4 = 0 THEN 1 ELSE sd4 END) AS z4
           FROM li CROSS JOIN st),
         pairs AS (SELECT q.rid AS id, r.rid AS neighbor_id,
             SQRT((q.z1 - r.z1) * (q.z1 - r.z1) + (q.z2 - r.z2) * (q.z2 - r.z2)
               + (q.z3 - r.z3) * (q.z3 - r.z3) + (q.z4 - r.z4) * (q.z4 - r.z4)) AS d0
           FROM z q CROSS JOIN z r WHERE q.rid < 150 AND q.rid != r.rid),
         knn AS (SELECT id, neighbor_id,
             CASE WHEN d0 < 1e-6 THEN 0.0 ELSE d0 END AS distance FROM pairs
           QUALIFY row_number() OVER (PARTITION BY id
             ORDER BY CASE WHEN d0 < 1e-6 THEN 0.0 ELSE d0 END, neighbor_id) <= 5)
         SELECT id, neighbor_id, ROUND(distance, 4) AS distance FROM knn""",
    "q60_radius_neighbors" ->
      s"""WITH ${knnSql("vec_id < 10", "vec_id < 200", 999999)}
          SELECT id, neighbor_id, ROUND(distance, 4) AS distance FROM knn
          WHERE distance <= 1.1""",
    "q61_outliers_sdev" ->
      """WITH b AS (SELECT AVG(c_acctbal) AS mu, STDDEV(c_acctbal) AS sd FROM customer)
         SELECT c_custkey, c_acctbal FROM customer, b
         WHERE c_acctbal < mu - 2.0 * sd OR c_acctbal > mu + 2.0 * sd""",
    "q62_quantile_split_ranged" ->
      """WITH e AS (SELECT quantile_cont(c_acctbal, 0.25) AS e1,
                    quantile_cont(c_acctbal, 0.50) AS e2,
                    quantile_cont(c_acctbal, 0.75) AS e3 FROM customer)
         SELECT c_custkey, c_acctbal,
           1 + (CASE WHEN c_acctbal > e1 THEN 1 ELSE 0 END)
             + (CASE WHEN c_acctbal > e2 THEN 1 ELSE 0 END)
             + (CASE WHEN c_acctbal > e3 THEN 1 ELSE 0 END) AS quantile
         FROM customer, e""",
    "q64_column_stats_full" -> {
      val cols = Seq(("o_orderkey", "bigint", true), ("o_custkey", "bigint", true),
        ("o_orderstatus", "string", false), ("o_totalprice", "double", true),
        ("o_orderdate", "timestamp", false), ("o_orderpriority", "string", false))
      cols.map { case (c, ty, isNum) =>
        if (isNum)
          s"""SELECT '$c' AS column_name, '$ty' AS dtype,
              n_distinct, n_nulls, num_zeros, mn AS min, q1v AS q1,
              medv AS median, q3v AS q3, mx AS max,
              ROUND(${latticeMeanSql("cnt", "s1i", "nanc")}, 6) AS mean,
              ROUND(${latticeStdSql("cnt", "s1i", "s2i", "nanc")}, 6)
                AS stddev
            FROM (SELECT COUNT(DISTINCT c0) AS n_distinct,
                COUNT(CASE WHEN c0 IS NULL THEN 1 END) AS n_nulls,
                COUNT(CASE WHEN c0 = 0 THEN 1 END) AS num_zeros,
                ROUND(CAST(MIN(c0) AS DOUBLE), 6) AS mn,
                ROUND(quantile_cont(CAST(c0 AS DOUBLE), 0.25), 6) AS q1v,
                ROUND(quantile_cont(CAST(c0 AS DOUBLE), 0.50), 6) AS medv,
                ROUND(quantile_cont(CAST(c0 AS DOUBLE), 0.75), 6) AS q3v,
                ROUND(CAST(MAX(c0) AS DOUBLE), 6) AS mx,
                $latticeMomentAggs
              FROM (SELECT $c AS c0, ${latticeXcSql(c)} AS xc
                FROM orders))"""
        else
          s"""SELECT '$c' AS column_name, '$ty' AS dtype,
              COUNT(DISTINCT $c) AS n_distinct,
              COUNT(CASE WHEN $c IS NULL THEN 1 END) AS n_nulls,
              CAST(NULL AS BIGINT) AS num_zeros,
              CAST(NULL AS DOUBLE) AS min, CAST(NULL AS DOUBLE) AS q1,
              CAST(NULL AS DOUBLE) AS median, CAST(NULL AS DOUBLE) AS q3,
              CAST(NULL AS DOUBLE) AS max, CAST(NULL AS DOUBLE) AS mean,
              CAST(NULL AS DOUBLE) AS stddev FROM orders"""
      }.mkString(" UNION ALL ")
    },
    "q65_filter_by_tags" ->
      s"""WITH ${knnSql("true", "vec_id < 100", 5)},
          grads AS (SELECT knn.id,
              MAX(CASE WHEN distance <= 1e-6 THEN 1 ELSE 0 END) AS coinc,
              MAX(CASE WHEN distance > 0 AND
                ABS(CAST(b.label AS DOUBLE) - CAST(a.label AS DOUBLE)) / distance > 2.0
                THEN 1 ELSE 0 END) AS cliff
            FROM knn JOIN e a ON knn.id = a.vec_id JOIN e b ON knn.neighbor_id = b.vec_id
            GROUP BY 1),
          tagged AS (SELECT e.vec_id AS id, list_filter([
              CASE WHEN e.label = 0 THEN 'zero_target' END,
              CASE WHEN COALESCE(coinc, 0) = 1 THEN 'coincident' END,
              CASE WHEN COALESCE(cliff, 0) = 1 THEN 'high_gradient' END],
              t -> t IS NOT NULL) AS tag_list
            FROM e LEFT JOIN grads ON e.vec_id = grads.id)
          SELECT id, list_aggregate(tag_list, 'string_agg', ',') AS tags FROM tagged
          WHERE list_contains(tag_list, 'zero_target')
            AND NOT list_contains(tag_list, 'coincident')
            AND len(list_filter(tag_list, t -> t LIKE 'zero%')) > 0
            AND len(list_filter(tag_list, t -> t LIKE 'coinc%')) = 0""",
    "q67_binary_accuracy" ->
      """SELECT ROUND(AVG(CASE WHEN (event_type IN ('purchase')) =
           ((CASE WHEN value >= 100 THEN 'purchase' ELSE event_type END) IN ('purchase'))
           THEN 1.0 ELSE 0 END), 6) AS binary_accuracy FROM events""",
    "q68_confidence_profile" -> {
      val edges = (1 to 9).map(k =>
        s"quantile_cont(value % 1, 0.$k) AS e$k").mkString(", ")
      val bucket = (1 to 9).map(k =>
        s"(CASE WHEN value % 1 > e$k THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH e AS (SELECT $edges FROM events),
          b AS (SELECT event_type,
              CASE WHEN value >= 100 THEN 'purchase' ELSE event_type END AS prediction,
              1 + $bucket AS quantile
            FROM events, e)
          SELECT quantile, ROUND(AVG(CASE WHEN (event_type IN ('purchase')) =
            (prediction IN ('purchase')) THEN 1.0 ELSE 0 END), 6) AS binary_accuracy
          FROM b GROUP BY quantile ORDER BY quantile"""
    },
    "q69_classifier_residuals" ->
      """WITH p AS (SELECT event_id, event_type,
             CASE WHEN value >= 100 THEN 'purchase' ELSE event_type END AS prediction
           FROM events),
         ix AS (SELECT event_id,
             CASE prediction WHEN 'click' THEN 0 WHEN 'error' THEN 1
               WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 WHEN 'view' THEN 4 END
             - CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
               WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 WHEN 'view' THEN 4 END
             AS residuals FROM p)
         SELECT event_id, residuals, ABS(residuals) AS residuals_abs FROM ix""",
    "q71_uq_v2" -> {
      val probs = (0 to 100).map(p => f"${p / 100.0}%.2f").mkString("[", ", ", "]")
      val qCols = graft.ml.UQ.V2Quantiles
        .map { case (p, n) => s"ROUND(quantile_cont(t, $p), 6) AS $n" }.mkString(", ")
      val qOut = graft.ml.UQ.V2Quantiles
        .map { case (_, n) => s"ROUND($n, 6) AS $n" }.mkString(", ")
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
              label FROM embeddings WHERE vec_id < 300),
          pairs AS (SELECT qs.vec_id AS id, r.vec_id AS neighbor_id,
              CASE WHEN ROUND(list_distance(qs.v, r.v), 9) < 1e-6 THEN 0.0
                   ELSE ROUND(list_distance(qs.v, r.v), 9) END AS distance
            FROM e qs CROSS JOIN e r WHERE qs.vec_id != r.vec_id),
          knn AS (SELECT * FROM pairs QUALIFY
            row_number() OVER (PARTITION BY id ORDER BY distance, neighbor_id) <= 10),
          nt AS (SELECT knn.id, knn.distance, CAST(r.label AS DOUBLE) AS t
                 FROM knn JOIN e r ON knn.neighbor_id = r.vec_id),
          stats AS (SELECT id, ROUND(AVG(distance), 6) AS nd,
              ROUND(AVG(t), 6) AS ntm, ROUND(STDDEV(t), 6) AS nts,
              $qCols FROM nt GROUP BY 1),
          fitp AS (SELECT list_transform(quantile_cont(nd, $probs), p -> ROUND(p, 6)) AS dp,
              list_transform(quantile_cont(nts, $probs), p -> ROUND(p, 6)) AS vp FROM stats),
          scored AS (SELECT s.*,
              LEAST(len(list_filter(dp, p -> p <= s.nd)) / 101.0, 1.0) AS dpct,
              CASE WHEN s.nts IS NULL THEN 1.0
                ELSE LEAST(len(list_filter(vp, p -> p <= s.nts)) / 101.0, 1.0)
              END AS vpct
            FROM stats s, fitp)
          SELECT id,
            ROUND(GREATEST(0.0, (1.0 - dpct) * (1.0 - vpct)), 6) AS confidence,
            ROUND(nd, 6) AS neighbor_distance,
            ROUND(ntm, 6) AS neighbor_target_mean,
            ROUND(nts, 6) AS neighbor_target_std,
            ROUND(dpct, 6) AS distance_percentile,
            ROUND(vpct, 6) AS variance_percentile, $qOut
          FROM scored WHERE id < 50"""
    },
    "q72_aggregate_rows" ->
      """SELECT l_returnflag, ROUND(AVG(l_quantity), 4) AS l_quantity,
         ROUND(AVG(l_extendedprice), 4) AS l_extendedprice,
         ROUND(AVG(l_discount), 4) AS l_discount,
         COUNT(*) AS group_count FROM lineitem GROUP BY 1""",
    "q73_data_capture_parse" ->
      "SELECT event_id, value FROM events",
    "q74_roc_auc" ->
      """WITH g AS (SELECT value AS score,
             COUNT(*) AS n,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_pos
           FROM events
           WHERE value IS NOT NULL AND event_type IS NOT NULL
           GROUP BY 1),
         r AS (SELECT n, n_pos,
             COALESCE(SUM(n) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (n + 1) / 2.0 AS avg_rank
           FROM g)
         SELECT ROUND((SUM(n_pos * avg_rank) - SUM(n_pos) * (SUM(n_pos) + 1) / 2.0)
           / (SUM(n_pos) * SUM(n - n_pos)), 6) AS roc_auc FROM r""",
    "q75_cosine_near_dup" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings WHERE vec_id < 300)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS similarity
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35""",
    "q76_classification_metrics" -> {
      val labels = Seq("click", "error", "purchase", "signup", "view")
      val aucSelects = labels.zipWithIndex.map { case (l, i) =>
        s"""SELECT '$l' AS class, (
             SELECT ROUND((SUM(n_pos * avg_rank) - SUM(n_pos) * (SUM(n_pos) + 1) / 2.0)
               / (SUM(n_pos) * SUM(n - n_pos)), 6)
             FROM (SELECT n, n_pos,
                 COALESCE(SUM(n) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + (n + 1) / 2.0 AS avg_rank
               FROM (SELECT value * ${i + 1} % 100 / 100 AS score, COUNT(*) AS n,
                   SUM(CASE WHEN event_type = '$l' THEN 1 ELSE 0 END) AS n_pos
                 FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
                 GROUP BY 1) gg) rr) AS roc_auc"""
      }.mkString(" UNION ALL ")
      s"""WITH cm AS (SELECT event_type AS label,
             CASE WHEN value >= 100 THEN 'purchase' ELSE event_type END AS prediction,
             COUNT(*) AS count FROM events
             WHERE (CASE WHEN value >= 100 THEN 'purchase' ELSE event_type END) IS NOT NULL
             GROUP BY 1, 2),
         actual AS (SELECT label AS class, CAST(SUM(count) AS BIGINT) AS support FROM cm GROUP BY 1),
         predicted AS (SELECT prediction AS class, CAST(SUM(count) AS BIGINT) AS n_pred FROM cm GROUP BY 1),
         tp AS (SELECT label AS class, CAST(count AS BIGINT) AS tp FROM cm WHERE label = prediction),
         report AS (SELECT a.class, a.support,
             ROUND(COALESCE(t.tp, 0) / GREATEST(COALESCE(p.n_pred, 0), 1), 6) AS precision,
             ROUND(COALESCE(t.tp, 0) / GREATEST(a.support, 1), 6) AS recall,
             ROUND(CASE WHEN ROUND(COALESCE(t.tp, 0) / GREATEST(COALESCE(p.n_pred, 0), 1), 6)
                           + ROUND(COALESCE(t.tp, 0) / GREATEST(a.support, 1), 6) = 0 THEN 0
               ELSE 2 * ROUND(COALESCE(t.tp, 0) / GREATEST(COALESCE(p.n_pred, 0), 1), 6)
                      * ROUND(COALESCE(t.tp, 0) / GREATEST(a.support, 1), 6)
                    / (ROUND(COALESCE(t.tp, 0) / GREATEST(COALESCE(p.n_pred, 0), 1), 6)
                       + ROUND(COALESCE(t.tp, 0) / GREATEST(a.support, 1), 6)) END, 6) AS f1
           FROM actual a LEFT JOIN predicted p ON a.class = p.class
           LEFT JOIN tp t ON a.class = t.class),
         auc AS ($aucSelects),
         perclass AS (SELECT r.class, r.support, r.precision, r.recall, r.f1, a.roc_auc
           FROM report r LEFT JOIN auc a ON r.class = a.class)
         SELECT class, support, precision, recall, f1, roc_auc FROM perclass
         UNION ALL
         SELECT 'all', CAST(SUM(support) AS BIGINT),
           ROUND(SUM(precision * support) / SUM(support), 6),
           ROUND(SUM(recall * support) / SUM(support), 6),
           ROUND(SUM(f1 * support) / SUM(support), 6),
           ROUND(SUM(roc_auc * support) / SUM(support), 6)
         FROM perclass"""
    },
    "q77_proba_expand" ->
      """SELECT event_id, ROUND(value % 1, 6) AS no_proba,
         ROUND(1.0 - value % 1, 6) AS yes_proba,
         ROUND(GREATEST(value % 1, 1.0 - value % 1), 6) AS confidence
         FROM events""",
    "q78_psi_drift" -> {
      val probs = (1 until 10).map(p => f"${p / 10.0}%.1f").mkString("[", ", ", "]")
      val bucket = (1 to 9).map(i =>
        s"(CASE WHEN value > ed[$i] THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH b AS (SELECT value FROM events WHERE value IS NOT NULL),
          c AS (SELECT value * 1.2 + 5 AS value FROM events WHERE value IS NOT NULL),
          e AS (SELECT quantile_cont(value, $probs) AS ed FROM b),
          bb AS (SELECT 1 + $bucket AS bucket FROM b, e),
          cb AS (SELECT 1 + $bucket AS bucket FROM c, e),
          bp AS (SELECT bucket, COUNT(*) / CAST((SELECT COUNT(*) FROM bb) AS DOUBLE) AS p
            FROM bb GROUP BY 1),
          cp AS (SELECT bucket, COUNT(*) / CAST((SELECT COUNT(*) FROM cb) AS DOUBLE) AS q
            FROM cb GROUP BY 1),
          j AS (SELECT GREATEST(COALESCE(p, 0), 0.0001) AS p,
              GREATEST(COALESCE(q, 0), 0.0001) AS q
            FROM bp FULL JOIN cp ON bp.bucket = cp.bucket)
          SELECT 'value' AS column_name,
            ROUND(SUM((p - q) * LN(p / q)), 6) AS psi FROM j"""
    },
    "q79_endpoint_inference" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS id,
         ROUND(10.0 + l_quantity * 2.0 + l_discount * (-5.0), 4) AS pred_value
         FROM lineitem""",
    "q80_inference_metrics" ->
      """WITH p AS (SELECT l_extendedprice AS y,
             10.0 + l_quantity * 2.0 + l_discount * (-5.0) AS pred
           FROM lineitem)
         SELECT ROUND(ROUND(SQRT(AVG((y - pred) * (y - pred))), 6), 2) AS rmse,
           ROUND(ROUND(AVG(ABS(y - pred)), 6), 2) AS mae,
           ROUND(ROUND(quantile_cont(ABS(y - pred), 0.5), 6), 2) AS medae,
           ROUND(1.0 - SUM((y - pred) * (y - pred)) /
             (SUM(y * y) - COUNT(*) * AVG(y) * AVG(y)), 6) AS r2
         FROM p""",
    "q81_monitor_drift" -> {
      val probs = (1 until 10).map(p => f"${p / 10.0}%.1f").mkString("[", ", ", "]")
      def bucket(c: String) = (1 to 9).map(i =>
        s"(CASE WHEN $c > ed[$i] THEN 1 ELSE 0 END)").mkString(" + ")
      def psiFor(c: String, curExpr: String) =
        s"""(WITH e AS (SELECT quantile_cont($c, $probs) AS ed FROM src),
            bb AS (SELECT 1 + ${bucket(c)} AS bucket FROM src, e WHERE $c IS NOT NULL),
            cb AS (SELECT 1 + ${bucket("cv")} AS bucket
              FROM (SELECT $curExpr AS cv FROM src) , e WHERE cv IS NOT NULL),
            bp AS (SELECT bucket, COUNT(*) / CAST((SELECT COUNT(*) FROM bb) AS DOUBLE) AS p
              FROM bb GROUP BY 1),
            cp AS (SELECT bucket, COUNT(*) / CAST((SELECT COUNT(*) FROM cb) AS DOUBLE) AS q
              FROM cb GROUP BY 1),
            j AS (SELECT GREATEST(COALESCE(p, 0), 0.0001) AS p,
                GREATEST(COALESCE(q, 0), 0.0001) AS q
              FROM bp FULL JOIN cp ON bp.bucket = cp.bucket)
            SELECT ROUND(SUM((p - q) * LN(p / q)), 6) FROM j)"""
      def statsFor(c: String, curExpr: String) =
        s"""SELECT '$c' AS column_name, ${psiFor(c, curExpr)} AS psi,
            ROUND(AVG($c), 6) AS base_mean,
            ROUND(AVG($curExpr), 6) AS cur_mean,
            ROUND(ABS(AVG($curExpr) - AVG($c)) /
              (CASE WHEN MAX($c) - MIN($c) = 0 THEN 1.0
                    ELSE CAST(MAX($c) AS DOUBLE) - MIN($c) END), 6) AS mean_drift,
            ROUND(ABS(AVG($curExpr) - AVG($c)) /
              (CASE WHEN MAX($c) - MIN($c) = 0 THEN 1.0
                    ELSE CAST(MAX($c) AS DOUBLE) - MIN($c) END), 6) > 0.1 AS drifted
            FROM src"""
      s"""WITH src AS (SELECT l_quantity, l_discount FROM lineitem)
          ${statsFor("l_discount", "l_discount")}
          UNION ALL
          ${statsFor("l_quantity", "l_quantity * 1.5 + 2")}
          ORDER BY column_name"""
    },
    "q82_cross_fold" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS id,
         CAST(((l_orderkey % 1000003) * 2654435761) % 5 AS INT) AS fold,
         ROUND(10.0 + l_quantity * 2.0 + l_discount * (-5.0), 4) AS prediction
         FROM lineitem""",
    "q83_property_tags" ->
      s"""WITH $tagRulesSql
          SELECT id, string_agg(tag, ',' ORDER BY tag) AS tags
          FROM viol WHERE v BETWEEN min_v AND max_v GROUP BY id""",
    "q84_curation_filter" ->
      s"""WITH $tagRulesSql,
          prop_tags AS (SELECT id, list(tag ORDER BY tag) AS ptags
            FROM viol WHERE v BETWEEN min_v AND max_v GROUP BY id),
          base AS (SELECT p_partkey AS id, list_filter([
              CASE WHEN p_partkey % 41 = 0 THEN 'composition:inorganic' END,
              CASE WHEN p_partkey % 37 = 0 THEN 'composition:heavy_metal' END,
              CASE WHEN p_partkey % 23 = 0 THEN 'liabilities:pains_a' END,
              CASE WHEN p_partkey % 5 = 0 THEN 'composition:halogenated' END],
              t -> t IS NOT NULL) AS utags FROM part),
          merged AS (SELECT base.id,
              list_sort(list_concat(utags, COALESCE(ptags, []))) AS tags
            FROM base LEFT JOIN prop_tags ON base.id = prop_tags.id),
          cur AS (SELECT id, list_sort(list_concat(tags,
              list_sort(list_distinct(list_filter([
                CASE WHEN list_contains(tags, 'composition:inorganic')
                  THEN 'curation:exclude:inorganic' END,
                CASE WHEN list_contains(tags, 'composition:organometallic')
                  THEN 'curation:exclude:organometallic' END,
                CASE WHEN list_contains(tags, 'composition:isotope_labeled')
                  THEN 'curation:caution:isotope_labeled' END,
                CASE WHEN list_contains(tags, 'structure:peptide')
                  THEN 'curation:caution:peptide' END,
                CASE WHEN list_contains(tags, 'structure:macrocycle')
                  THEN 'curation:caution:macrocycle' END,
                CASE WHEN list_contains(tags, 'composition:heavy_metal')
                  THEN 'curation:caution:heavy_metal' END,
                CASE WHEN list_contains(tags, 'composition:highly_halogenated')
                  THEN 'curation:caution:highly_halogenated' END,
                CASE WHEN list_contains(tags, 'composition:unusual_element')
                  THEN 'curation:caution:unusual_element' END,
                CASE WHEN len(list_filter(tags, t -> t LIKE 'liabilities:pains_%')) > 0
                  THEN 'curation:caution:pains' END],
                t -> t IS NOT NULL)))) ) AS tags FROM merged)
          SELECT id, COALESCE(list_aggregate(
              list_filter(tags, t -> t LIKE 'curation:%'), 'string_agg', ','), '')
            AS curation_tags
          FROM cur
          WHERE len(list_filter(tags, t -> t LIKE 'curation:exclude:%')) = 0""",
    "q85_curation_funnel" -> {
      def ratio(l: String): String = {
        val sw = Text.stopwords(l).map(w => s"'$w'").mkString("[", ", ", "]")
        s"CAST(len(list_filter(toks, x -> list_contains($sw, x))) AS DOUBLE) / GREATEST(len(toks), 1)"
      }
      s"""WITH d AS (SELECT doc_id, source, text,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
               x -> length(x) > 0) AS toks
           FROM documents),
         s AS (SELECT doc_id, source, text, toks,
             (len(toks) >= 40 AND
              CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) /
                GREATEST(length(text), 1) <= 0.05) AS quality_pass,
             ${ratio("de")} AS s_de, ${ratio("en")} AS s_en,
             ${ratio("es")} AS s_es, ${ratio("fr")} AS s_fr FROM d),
         l AS (SELECT *, CASE
             WHEN s_fr > 0 AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
             WHEN s_es > 0 AND s_es >= s_en AND s_es >= s_de THEN 'es'
             WHEN s_en > 0 AND s_en >= s_de THEN 'en'
             WHEN s_de > 0 THEN 'de'
             ELSE 'und' END AS lang_pred FROM s),
         lp AS (SELECT *, quality_pass AND lang_pred IN ('en', 'fr') AS lang_pass,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
           FROM l),
         k AS (SELECT fingerprint, MIN(doc_id) AS keeper FROM lp
           WHERE lang_pass GROUP BY 1),
         a AS (SELECT lp.*, (lang_pass AND keeper = doc_id) AS kept
           FROM lp LEFT JOIN k USING (fingerprint))
         SELECT source, COUNT(*) AS n_input,
           CAST(SUM(CASE WHEN quality_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(SUM(CASE WHEN lang_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         FROM a GROUP BY source"""
    },
    "q86_sql_surface" -> {
      def ratio(l: String): String = {
        val sw = Text.stopwords(l).map(w => s"'$w'").mkString("[", ", ", "]")
        s"CAST(len(list_filter(toks, x -> list_contains($sw, x))) AS DOUBLE) / GREATEST(len(toks), 1)"
      }
      s"""WITH d AS (SELECT doc_id, text,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
               x -> length(x) > 0) AS toks
           FROM documents),
         s AS (SELECT doc_id, text, toks, ${ratio("de")} AS s_de, ${ratio("en")} AS s_en,
                      ${ratio("es")} AS s_es, ${ratio("fr")} AS s_fr FROM d)
         SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
           CAST(len(toks) AS BIGINT) AS n_words,
           CASE
             WHEN s_fr > 0 AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
             WHEN s_es > 0 AND s_es >= s_en AND s_es >= s_de THEN 'es'
             WHEN s_en > 0 AND s_en >= s_de THEN 'en'
             WHEN s_de > 0 THEN 'de'
             ELSE 'und' END AS lang_pred
         FROM s"""
    },
    "q87_cached_inference" ->
      """SELECT o_orderkey, o_totalprice,
         ROUND(5.0 + o_totalprice * 0.1, 4) AS prediction
         FROM orders""",
    "q88_ensemble_weighted" ->
      """SELECT event_id,
         0.5 * CAST(event_id % 10 AS DOUBLE) + 0.25 * CAST(event_id % 7 AS DOUBLE)
           + 0.25 * CAST(event_id % 5 AS DOUBLE) AS prediction,
         0.5 * (CAST(event_id % 16 AS DOUBLE) / 16.0)
           + 0.25 * (CAST(event_id % 8 AS DOUBLE) / 8.0)
           + 0.25 * (CAST(event_id % 4 AS DOUBLE) / 4.0) AS confidence
         FROM events""",
    "q89_ensemble_vote" ->
      """WITH long AS (
           SELECT event_id, event_type AS label FROM events
           UNION ALL
           SELECT event_id, CASE WHEN value >= 50 THEN 'view' ELSE event_type END
             FROM events
           UNION ALL
           SELECT event_id, CASE WHEN event_id % 3 = 0 THEN 'click' ELSE event_type END
             FROM events),
         counts AS (SELECT event_id, label, COUNT(*) AS c FROM long GROUP BY 1, 2)
         SELECT event_id, label AS prediction,
           ROUND(CAST(c AS DOUBLE) / 3.0, 6) AS confidence
         FROM counts
         QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY c DESC, label ASC) = 1""",
    "q90_ensemble_perf" ->
      """WITH f AS (SELECT
             CAST(event_id % 12 AS DOUBLE) AS t,
             CAST(event_id % 10 AS DOUBLE) AS p1,
             CAST(event_id % 16 AS DOUBLE) / 16.0 AS c1,
             CAST(event_id % 7 AS DOUBLE) AS p2,
             CAST(event_id % 8 AS DOUBLE) / 8.0 AS c2,
             CAST(event_id % 5 AS DOUBLE) AS p3,
             CAST(event_id % 4 AS DOUBLE) / 4.0 AS c3
           FROM events),
         agg AS (SELECT COUNT(*) AS n, AVG(t) AS mt, SUM(t * t) AS stt,
             SUM((p1 - t) * (p1 - t)) AS se1, SUM(ABS(p1 - t)) AS ae1, AVG(c1) AS mc1,
             SUM((p2 - t) * (p2 - t)) AS se2, SUM(ABS(p2 - t)) AS ae2, AVG(c2) AS mc2,
             SUM((p3 - t) * (p3 - t)) AS se3, SUM(ABS(p3 - t)) AS ae3, AVG(c3) AS mc3
           FROM f)
         SELECT 'm_a' AS model, ROUND(SQRT(se1 / n), 6) AS rmse,
           ROUND(ae1 / n, 6) AS mae,
           ROUND(1 - se1 / (stt - n * mt * mt), 6) AS r2,
           ROUND(mc1, 6) AS mean_conf FROM agg
         UNION ALL SELECT 'm_b', ROUND(SQRT(se2 / n), 6), ROUND(ae2 / n, 6),
           ROUND(1 - se2 / (stt - n * mt * mt), 6), ROUND(mc2, 6) FROM agg
         UNION ALL SELECT 'm_c', ROUND(SQRT(se3 / n), 6), ROUND(ae3 / n, 6),
           ROUND(1 - se3 / (stt - n * mt * mt), 6), ROUND(mc3, 6) FROM agg""",
    "q91_model_comparison" ->
      """WITH li AS (SELECT l_quantity, l_discount, l_extendedprice
             FROM lineitem WHERE l_orderkey % 10 = 0),
         pa AS (SELECT l_extendedprice AS y,
             10.0 + l_quantity * 2.0 + l_discount * (-5.0) AS pred FROM li),
         pb AS (SELECT l_extendedprice AS y,
             50.0 + l_quantity * 3.0 AS pred FROM li),
         ma AS (SELECT ROUND(SQRT(AVG((y - pred) * (y - pred))), 6) AS rmse,
             ROUND(AVG(ABS(y - pred)), 6) AS mae,
             ROUND(quantile_cont(ABS(y - pred), 0.5), 6) AS medae,
             ROUND(1.0 - SUM((y - pred) * (y - pred)) /
               (SUM(y * y) - COUNT(*) * AVG(y) * AVG(y)), 6) AS r2 FROM pa),
         mb AS (SELECT ROUND(SQRT(AVG((y - pred) * (y - pred))), 6) AS rmse,
             ROUND(AVG(ABS(y - pred)), 6) AS mae,
             ROUND(quantile_cont(ABS(y - pred), 0.5), 6) AS medae,
             ROUND(1.0 - SUM((y - pred) * (y - pred)) /
               (SUM(y * y) - COUNT(*) * AVG(y) * AVG(y)), 6) AS r2 FROM pb)
         SELECT 'cmp_a' AS model, ROUND(rmse, 4) AS rmse, ROUND(mae, 4) AS mae,
           ROUND(medae, 4) AS medae, ROUND(r2, 6) AS r2 FROM ma
         UNION ALL
         SELECT 'cmp_b', ROUND(rmse, 4), ROUND(mae, 4), ROUND(medae, 4),
           ROUND(r2, 6) FROM mb
         UNION ALL
         SELECT 'delta', ROUND(ROUND(ma.rmse - mb.rmse, 6), 4),
           ROUND(ROUND(ma.mae - mb.mae, 6), 4),
           ROUND(ROUND(ma.medae - mb.medae, 6), 4),
           ROUND(ROUND(mb.r2 - ma.r2, 6), 6) FROM ma, mb""",
    "q92_ks_test" ->
      """WITH s AS (
           SELECT value * 1.1 + 3 AS v, 1 AS isa FROM events WHERE value IS NOT NULL
           UNION ALL
           SELECT value, 0 FROM events WHERE value IS NOT NULL),
         m AS (SELECT v, SUM(isa) AS ca, SUM(1 - isa) AS cb FROM s GROUP BY v),
         c AS (SELECT SUM(ca) OVER (ORDER BY v) AS cuma,
                      SUM(cb) OVER (ORDER BY v) AS cumb FROM m),
         t2 AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM m)
         SELECT ROUND(MAX(ABS(CAST(cuma AS DOUBLE) / na
           - CAST(cumb AS DOUBLE) / nb)), 6) AS statistic FROM c, t2""",
    "q93_js_divergence" ->
      """WITH s AS (
           SELECT LEAST(FLOOR(value / 15.0), 9) AS bucket, 1 AS isa FROM events
             WHERE value IS NOT NULL AND value >= 0.0 AND value <= 150.0
           UNION ALL
           SELECT LEAST(FLOOR((value * 1.2 + 5) / 15.0), 9), 0 FROM events
             WHERE value IS NOT NULL AND value * 1.2 + 5 >= 0.0
               AND value * 1.2 + 5 <= 150.0),
         g AS (SELECT bucket, SUM(isa) AS ca, SUM(1 - isa) AS cb
           FROM s GROUP BY bucket),
         f AS (SELECT b.bucket, COALESCE(ca, 0) + 1e-10 AS pa,
             COALESCE(cb, 0) + 1e-10 AS pb
           FROM (SELECT UNNEST(range(10)) AS bucket) b
           LEFT JOIN g ON b.bucket = g.bucket),
         t2 AS (SELECT SUM(pa) AS ta, SUM(pb) AS tb FROM f),
         n AS (SELECT pa / ta AS p, pb / tb AS q FROM f, t2)
         SELECT ROUND(SUM(p * log2(p / ((p + q) / 2)) / 2
             + q * log2(q / ((p + q) / 2)) / 2), 6) AS jsd,
           ROUND(SUM((q - p) * LN(q / p)), 6) AS psi FROM n""",
    "q94_contest_report" ->
      """WITH li AS (SELECT l_quantity, l_discount, l_extendedprice
             FROM lineitem WHERE l_orderkey % 10 = 0),
         m0 AS (SELECT ROUND(SQRT(AVG((l_extendedprice - (10.0 + l_quantity * 2.0
               + l_discount * (-5.0))) * (l_extendedprice - (10.0 + l_quantity * 2.0
               + l_discount * (-5.0))))), 6) AS rmse,
             ROUND(AVG(ABS(l_extendedprice - (10.0 + l_quantity * 2.0
               + l_discount * (-5.0)))), 6) AS mae FROM li),
         m1 AS (SELECT ROUND(SQRT(AVG((l_extendedprice - (50.0 + l_quantity * 3.0))
               * (l_extendedprice - (50.0 + l_quantity * 3.0)))), 6) AS rmse,
             ROUND(AVG(ABS(l_extendedprice - (50.0 + l_quantity * 3.0))), 6) AS mae
             FROM li),
         m2 AS (SELECT ROUND(SQRT(AVG((l_extendedprice - l_quantity)
               * (l_extendedprice - l_quantity))), 6) AS rmse,
             ROUND(AVG(ABS(l_extendedprice - l_quantity)), 6) AS mae FROM li),
         flag AS (SELECT MAX(CASE WHEN ABS(m0.rmse - r) > 1e-6
               AND (m0.rmse - r) >= -0.01 * ABS(m0.rmse) THEN 1 ELSE 0 END) = 1
             AS contested
           FROM (SELECT rmse AS r FROM m1 UNION ALL SELECT rmse FROM m2), m0)
         SELECT 'champ_m' AS model, 'champion' AS role, ROUND(rmse, 4) AS rmse,
           CAST(0.0 AS DOUBLE) AS d_rmse, ROUND(mae, 4) AS mae,
           CAST(0.0 AS DOUBLE) AS d_mae, contested
           FROM m0, flag
         UNION ALL
         SELECT 'chall_a', 'challenger', ROUND(m1.rmse, 4),
           ROUND(ROUND(m0.rmse - m1.rmse, 6), 4), ROUND(m1.mae, 4),
           ROUND(ROUND(m0.mae - m1.mae, 6), 4), contested FROM m0, m1, flag
         UNION ALL
         SELECT 'chall_b', 'challenger', ROUND(m2.rmse, 4),
           ROUND(ROUND(m0.rmse - m2.rmse, 6), 4), ROUND(m2.mae, 4),
           ROUND(ROUND(m0.mae - m2.mae, 6), 4), contested FROM m0, m2, flag""",
    "q95_uq_metrics" ->
      """WITH b AS (SELECT l_extendedprice AS y,
             l_extendedprice * 0.9 + 100 AS pred,
             l_quantity * 50 + 100 AS std FROM lineitem),
         i AS (SELECT y, std,
             pred - 1.96 * std AS lo95, pred + 1.96 * std AS hi95,
             pred - 1.645 * std AS lo90, pred + 1.645 * std AS hi90,
             pred - 1.282 * std AS lo80, pred + 1.282 * std AS hi80,
             pred - std AS lo68, pred + std AS hi68,
             pred - 0.674 * std AS lo50, pred + 0.674 * std AS hi50 FROM b)
         SELECT
           ROUND(AVG(CASE WHEN y >= lo68 AND y <= hi68 THEN 1 ELSE 0 END), 6)
             AS coverage_68,
           ROUND(AVG(CASE WHEN y >= lo80 AND y <= hi80 THEN 1 ELSE 0 END), 6)
             AS coverage_80,
           ROUND(AVG(CASE WHEN y >= lo90 AND y <= hi90 THEN 1 ELSE 0 END), 6)
             AS coverage_90,
           ROUND(AVG(CASE WHEN y >= lo95 AND y <= hi95 THEN 1 ELSE 0 END), 6)
             AS coverage_95,
           ROUND(quantile_cont(std, 0.5), 6) AS median_std,
           ROUND(quantile_cont(hi50 - lo50, 0.5), 6) AS median_width_50,
           ROUND(quantile_cont(hi68 - lo68, 0.5), 6) AS median_width_68,
           ROUND(quantile_cont(hi80 - lo80, 0.5), 6) AS median_width_80,
           ROUND(quantile_cont(hi90 - lo90, 0.5), 6) AS median_width_90,
           ROUND(quantile_cont(hi95 - lo95, 0.5), 6) AS median_width_95,
           ROUND(AVG((hi95 - lo95)
             + 40 * (lo95 - y) * (CASE WHEN y < lo95 THEN 1 ELSE 0 END)
             + 40 * (y - hi95) * (CASE WHEN y > hi95 THEN 1 ELSE 0 END)), 6)
             AS interval_score_95,
           COUNT(*) AS n_samples
         FROM i""",
    "q97_cached_stats" -> Seq("c_custkey", "c_acctbal", "c_nationkey")
      .map(c =>
        s"""SELECT '$c' AS column_name, mn AS min, q1v AS q1,
            medv AS median, q3v AS q3, mx AS max,
            ROUND(${latticeMeanSql("cnt", "s1i", "nanc")}, 6) AS mean,
            ROUND(${latticeStdSql("cnt", "s1i", "s2i", "nanc")}, 6)
              AS stddev
          FROM (SELECT CAST(MIN(c0) AS DOUBLE) AS mn,
              ROUND(quantile_cont(c0, 0.25), 6) AS q1v,
              ROUND(quantile_cont(c0, 0.5), 6) AS medv,
              ROUND(quantile_cont(c0, 0.75), 6) AS q3v,
              CAST(MAX(c0) AS DOUBLE) AS mx, $latticeMomentAggs
            FROM (SELECT $c AS c0, ${latticeXcSql(c)} AS xc
              FROM customer))""").mkString(" UNION ALL "),
    "q98_compound_registry" ->
      """SELECT 'c' || p_partkey AS id, p_name AS smiles,
         concat_ws(',', CASE WHEN p_size > 25 THEN 'big' END,
                        CASE WHEN contains(p_type, 'BRASS') THEN 'brassy' END) AS tags,
         CAST(p_size AS VARCHAR) AS size
         FROM part WHERE p_partkey <= 20 ORDER BY p_partkey""",
    "q99_multi_task_combine" ->
      """WITH a AS (SELECT p_partkey AS id, p_name AS smiles,
             CAST(p_size AS DOUBLE) AS feat_size, p_retailprice AS feat_price,
             CAST(p_partkey % 7 AS DOUBLE) AS sol,
             CAST(NULL AS DOUBLE) AS perm, 0 AS src
           FROM part WHERE p_partkey <= 60),
         b AS (SELECT p_partkey, p_name, CAST(p_size + 1 AS DOUBLE),
             p_retailprice, CAST(NULL AS DOUBLE),
             CAST(p_partkey % 5 AS DOUBLE), 1
           FROM part WHERE p_partkey > 30 AND p_partkey <= 90),
         u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
         SELECT id,
           arg_min(smiles, src) FILTER (smiles IS NOT NULL) AS smiles,
           arg_min(feat_size, src) FILTER (feat_size IS NOT NULL) AS feat_size,
           arg_min(feat_price, src) FILTER (feat_price IS NOT NULL) AS feat_price,
           arg_min(sol, src) FILTER (sol IS NOT NULL) AS sol,
           arg_min(perm, src) FILTER (perm IS NOT NULL) AS perm
         FROM u GROUP BY id ORDER BY id""",
    "q96_vocabulary" ->
      """WITH toks AS (SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS t
           FROM documents),
         e AS (SELECT doc_id, UNNEST(t) AS term FROM toks),
         g AS (SELECT doc_id, term, COUNT(*) AS c FROM e GROUP BY 1, 2)
         SELECT term, CAST(SUM(c) AS BIGINT) AS tf, COUNT(*) AS df
         FROM g GROUP BY term HAVING SUM(c) >= 5""",
    "q101_pii_scrub" ->
      """WITH d AS (SELECT doc_id, CASE
             WHEN doc_id % 7 = 0 THEN text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com now'
             WHEN doc_id % 11 = 0 THEN text || ' call 555-123-4567 or ping 10.0.0.' || CAST(doc_id % 250 AS VARCHAR)
             ELSE text END AS text
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             + len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
             + len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) > 0 AS has_pii,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
         FROM d""",
    "q102_repetition_signals" ->
      """WITH d AS (SELECT doc_id,
             [substr(text, (i-1)*32+1, 32)
              for i in range(1, GREATEST(CAST(ceil(length(text)/32.0) AS BIGINT), 1)+1)] AS chunks,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS toks
           FROM documents),
         s AS (SELECT doc_id, len(toks) AS ntoks,
             CASE WHEN len(chunks) <= 0 THEN 0
               ELSE CAST(len(chunks) - len(list_distinct(chunks)) AS DOUBLE)/len(chunks) END AS dlf,
             CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
               ELSE [array_to_string(toks[i:i+1], ' ') for i in range(1, len(toks))] END AS sh2,
             CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)] END AS sh3
           FROM d)
         SELECT doc_id, ROUND(dlf, 4) AS dup_line_frac,
           ROUND(CASE WHEN ntoks < 2 THEN 0
             ELSE CAST(list_max([len(list_filter(sh2, x -> x = g)) for g in list_distinct(sh2)]) AS DOUBLE)/len(sh2) END, 4) AS top_2gram_frac,
           ROUND(CASE WHEN ntoks < 3 THEN 0
             ELSE CAST(list_max([len(list_filter(sh3, x -> x = g)) for g in list_distinct(sh3)]) AS DOUBLE)/len(sh3) END, 4) AS top_3gram_frac
         FROM s""",
    "q103_line_dedup" ->
      """WITH d AS (SELECT doc_id,
             [substr(text, (i-1)*16+1, 16)
              for i in range(1, GREATEST(CAST(ceil(length(text)/16.0) AS BIGINT), 1)+1)] AS l
           FROM documents),
         e AS (SELECT doc_id,
             unnest([{'line': l[i], 'i': i} for i in range(1, len(l)+1)], recursive := true)
           FROM d),
         freq AS (SELECT line, COUNT(*) AS c FROM e GROUP BY line)
         SELECT e.doc_id, array_to_string(list(e.line ORDER BY e.i), chr(10)) AS text
         FROM e JOIN freq USING (line) WHERE freq.c <= 1 GROUP BY e.doc_id""",
    "q104_packing_manifest" ->
      """WITH d AS (SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_tokens
           FROM documents),
         o AS (SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_offset
           FROM d)
         SELECT doc_id, n_tokens, token_offset,
           CAST(floor(token_offset / 512.0) AS BIGINT) AS start_chunk,
           CAST(floor((token_offset + GREATEST(n_tokens, 1) - 1) / 512.0) AS BIGINT) AS end_chunk
         FROM o""",
    "q105_domain_mixture" ->
      """WITH c AS (SELECT lang AS source, COUNT(*) AS n_docs,
             pow(COUNT(*), 0.7) AS wt FROM documents GROUP BY lang),
         f AS (SELECT source, n_docs,
             ROUND(wt / (SELECT SUM(wt) FROM c), 6) AS weight FROM c),
         f2 AS (SELECT source, n_docs, weight,
             ROUND(LEAST(1.0, 200 * weight / n_docs), 6) AS sample_frac FROM f),
         s AS (SELECT d.lang AS source, COUNT(*) AS n_sampled
           FROM documents d JOIN f2 ON f2.source = d.lang
           WHERE f2.sample_frac >= 1.0
              OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
                 lower(lpad(to_hex(CAST(floor(f2.sample_frac * 4294967296) AS BIGINT)), 8, '0'))
           GROUP BY d.lang)
         SELECT f2.source, f2.n_docs, f2.weight, f2.sample_frac,
           COALESCE(s.n_sampled, 0) AS n_sampled
         FROM f2 LEFT JOIN s USING (source)""",
    "q106_contamination" ->
      """WITH tok AS (SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS toks
           FROM documents),
         sh AS (SELECT doc_id, CASE WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
             ELSE [array_to_string(toks[i:i+3], ' ') for i in range(1, len(toks)-2)] END AS s
           FROM tok),
         ds AS (SELECT doc_id, len(list_distinct(s)) AS n_sh,
             unnest(list_distinct(s)) AS g FROM sh WHERE doc_id >= 100),
         bs AS (SELECT doc_id AS bid, unnest(list_distinct(s)) AS g
           FROM sh WHERE doc_id < 100)
         SELECT ds.doc_id, COUNT(DISTINCT ds.g) AS n_hit_shingles,
           COUNT(DISTINCT bs.bid) AS n_bench_docs,
           CAST(MAX(ds.n_sh) AS BIGINT) AS n_shingles,
           ROUND(CAST(COUNT(DISTINCT ds.g) AS DOUBLE) / MAX(ds.n_sh), 4) AS hit_frac
         FROM ds JOIN bs USING (g) GROUP BY ds.doc_id""",
    "q107_embedding_drift" ->
      """WITH e AS (SELECT label,
             unnest([{'v': CAST(embedding[i] AS DOUBLE), 'i': i}
                     for i in range(1, len(embedding)+1)], recursive := true)
           FROM embeddings WHERE embedding IS NOT NULL),
         c AS (SELECT label, i, ROUND(AVG(v), 6) AS v FROM e GROUP BY label, i),
         ce AS (SELECT label, list(v ORDER BY i) AS c FROM c GROUP BY label)
         SELECT a.label AS group_a, b.label AS group_b,
           ROUND(list_sum([a.c[i] * b.c[i] for i in range(1, len(a.c)+1)]) /
             (sqrt(list_sum([x * x for x in a.c])) *
              sqrt(list_sum([x * x for x in b.c]))), 4) AS cosine
         FROM ce a CROSS JOIN ce b WHERE a.label < b.label""",
    "q112_embedding_spread" ->
      """WITH e AS (SELECT label,
             unnest([{'v': CAST(embedding[i] AS DOUBLE), 'i': i}
                     for i in range(1, len(embedding)+1)], recursive := true)
           FROM embeddings WHERE embedding IS NOT NULL),
         g AS (SELECT label, i, var_pop(v) AS vv, SUM(v*v) AS sq,
               COUNT(*) AS n FROM e GROUP BY label, i)
         SELECT label, CAST(MAX(n) AS BIGINT) AS n_vecs,
           ROUND(SUM(vv), 6) AS trace_var,
           ROUND(SUM(sq)/MAX(n), 6) AS mean_sq_norm
         FROM g GROUP BY label""",
    "q113_chunk_documents" ->
      """WITH toks AS (SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS t
           FROM documents),
         w AS (SELECT doc_id, t,
             1 + CAST(ceil(GREATEST(len(t) - 8, 0) / 4.0) AS INT) AS cnt
           FROM toks),
         e AS (SELECT doc_id,
             unnest([{'chunk_id': CAST(i - 1 AS INTEGER),
                      'chunk_text': array_to_string(t[((i-1)*4+1):((i-1)*4+8)], ' ')}
                     for i in range(1, cnt + 1)], recursive := true)
           FROM w)
         SELECT doc_id, chunk_id, chunk_text,
           CAST(len(list_filter(string_split_regex(chunk_text, '\s+'),
             x -> length(x) > 0)) AS INTEGER) AS n_chunk_tokens
         FROM e""",
    "q115_exact_substring" ->
      """WITH toks AS (SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS t
           FROM documents),
         pos AS (SELECT doc_id, t, unnest(range(0, len(t) - 19)) AS pos
           FROM toks WHERE len(t) >= 20),
         g AS (SELECT doc_id, pos,
             array_to_string(t[(pos+1):(pos+20)], ' ') AS gram FROM pos),
         keep AS (SELECT gram FROM g GROUP BY gram
           HAVING COUNT(DISTINCT doc_id) <= 100),
         gk AS (SELECT g.* FROM g JOIN keep USING (gram)),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.gram,
             a.pos AS pa, b.pos AS pb
           FROM gk a JOIN gk b ON a.gram = b.gram AND a.doc_id < b.doc_id)
         SELECT id_a, id_b, CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_shared,
           CAST(MIN(pa) AS BIGINT) AS a_start,
           CAST(MAX(pa) + 19 AS BIGINT) AS a_end,
           CAST(MIN(pb) AS BIGINT) AS b_start,
           CAST(MAX(pb) + 19 AS BIGINT) AS b_end
         FROM p GROUP BY id_a, id_b HAVING COUNT(DISTINCT gram) >= 1""",
    "q116_substring_scrub" ->
      """WITH toks AS (SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS t
           FROM documents),
         pos AS (SELECT doc_id, t, unnest(range(0, len(t) - 19)) AS pos
           FROM toks WHERE len(t) >= 20),
         g AS (SELECT doc_id, pos,
             array_to_string(t[(pos+1):(pos+20)], ' ') AS gram FROM pos),
         keep AS (SELECT gram FROM g GROUP BY gram
           HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 100),
         gk AS (SELECT g.doc_id, g.pos, g.gram FROM g JOIN keep USING (gram)),
         spans AS (SELECT doc_id AS id, pos AS s, pos + 19 AS e
           FROM (SELECT gk.*, MIN(doc_id) OVER (PARTITION BY gram) AS min_id
                 FROM gk)
           WHERE doc_id <> min_id),
         si AS (SELECT id, s, e, CASE WHEN s > COALESCE(MAX(e) OVER (
               PARTITION BY id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
             THEN 1 ELSE 0 END AS newi
           FROM spans),
         mi AS (SELECT id, s, e, SUM(newi) OVER (PARTITION BY id
             ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS island FROM si),
         merged AS (SELECT id, MIN(s) AS s, MAX(e) AS e FROM mi
           GROUP BY id, island),
         tokpos AS (SELECT doc_id AS id,
           unnest([{'pos': i, 'tok': t[i+1]} for i in range(len(t))],
             recursive := true)
           FROM toks),
         surv AS (SELECT tp.id, tp.pos, tp.tok FROM tokpos tp
           WHERE NOT EXISTS (SELECT 1 FROM merged m
             WHERE m.id = tp.id AND tp.pos BETWEEN m.s AND m.e)),
         rebuilt AS (SELECT id,
             array_to_string(list(tok ORDER BY pos), ' ') AS clean,
             COUNT(*) AS kept
           FROM surv GROUP BY id),
         n AS (SELECT doc_id, len(t) AS n_toks FROM toks)
         SELECT d.doc_id,
           CASE WHEN n.n_toks - COALESCE(r.kept, 0) > 0
             THEN COALESCE(r.clean, '') ELSE d.text END AS text,
           CAST(n.n_toks - COALESCE(r.kept, 0) AS BIGINT) AS n_removed_tokens
         FROM documents d
         JOIN n ON n.doc_id = d.doc_id
         LEFT JOIN rebuilt r ON r.id = d.doc_id""",
    "q109_lm_score" ->
      """WITH toks AS (SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS t
           FROM documents),
         e AS (SELECT doc_id, unnest(t) AS term FROM toks),
         g AS (SELECT doc_id, term, COUNT(*) AS c FROM e
               WHERE doc_id < 250 GROUP BY 1, 2),
         v AS (SELECT term, CAST(SUM(c) AS BIGINT) AS tf FROM g
               GROUP BY term HAVING SUM(c) >= 2),
         lm AS (SELECT term,
             ln(CAST(tf AS DOUBLE) / CAST((SELECT SUM(tf) FROM v) AS DOUBLE)) AS logp
           FROM v),
         s AS (SELECT e.doc_id, lm.logp FROM e LEFT JOIN lm USING (term)
               WHERE e.doc_id >= 250)
         SELECT doc_id, COUNT(*) AS n_tokens,
           ROUND(AVG(COALESCE(logp, -20.0)), 4) AS avg_logp
         FROM s GROUP BY doc_id""",
    "q110_corpus_report" -> {
      val en = Text.stopwords("en").map(w => s"'$w'").mkString("[", ", ", "]")
      val fr = Text.stopwords("fr").map(w => s"'$w'").mkString("[", ", ", "]")
      val es = Text.stopwords("es").map(w => s"'$w'").mkString("[", ", ", "]")
      val de = Text.stopwords("de").map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH d AS (SELECT source, text,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
               x -> length(x) > 0) AS toks
           FROM documents),
         s AS (SELECT source, text, COALESCE(len(toks), 0) AS w,
             CAST(len(list_filter(toks, x -> list_contains($en, x))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_en,
             CAST(len(list_filter(toks, x -> list_contains($fr, x))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_fr,
             CAST(len(list_filter(toks, x -> list_contains($es, x))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_es,
             CAST(len(list_filter(toks, x -> list_contains($de, x))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_de,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
             (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
              + len(regexp_extract_all(text, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b'))
              + len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) > 0) AS pii
           FROM d)
         SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(SUM(CASE WHEN NOT (s_fr > 0 AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de)
                          AND NOT (s_es > 0 AND s_es >= s_en AND s_es >= s_de)
                          AND s_en > 0 AND s_en >= s_de THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
           COUNT(*) - COUNT(DISTINCT COALESCE(fp, '')) AS n_dup,
           CAST(SUM(CASE WHEN pii THEN 1 ELSE 0 END) AS BIGINT) AS n_pii,
           ROUND(AVG(w), 2) AS avg_words
         FROM s GROUP BY source"""
    },
    "q120_c4_filters" ->
      """WITH pages AS (SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN text || '.'
                  WHEN doc_id % 3 = 1 THEN regexp_replace(text, ' the ', '.' || chr(10), 'g')
                  ELSE text END AS text
           FROM documents),
         lines AS (SELECT doc_id, text,
             COALESCE(array_to_string(
               list_filter(string_split(text, chr(10)), l ->
                 regexp_matches(trim(l), '[.!?"'']$') AND
                 len(string_split_regex(trim(l), '\s+')) >= 5 AND
                 NOT contains(lower(l), 'javascript')),
               chr(10)), '') AS c4_text
           FROM pages)
         SELECT doc_id, c4_text,
           CAST(length(regexp_replace(c4_text, '[^.!?]', '', 'g')) AS BIGINT) AS n_sentences,
           (length(regexp_replace(c4_text, '[^.!?]', '', 'g')) >= 3 AND
            NOT contains(lower(text), 'lorem ipsum') AND
            NOT contains(text, '{')) AS c4_pass
         FROM lines""",
    "q122_url_curation" ->
      """WITH d AS (SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN 'https://www.' || source || '.example.com/page/' || CAST(doc_id % 40 AS VARCHAR) || '?utm=x'
                  WHEN doc_id % 5 = 1 THEN 'http://' || source || '.example.com/page/' || CAST(doc_id % 40 AS VARCHAR) || '/'
                  WHEN doc_id % 5 = 2 THEN 'HTTPS://ads.tracker.net/click/' || CAST(doc_id AS VARCHAR)
                  WHEN doc_id % 5 = 3 THEN 'https://' || source || '.example.COM/page/' || CAST(doc_id % 40 AS VARCHAR) || '#frag'
                  ELSE 'spam.example.org/offer/' || CAST(doc_id % 7 AS VARCHAR) END AS url
           FROM documents),
         n AS (SELECT doc_id, url,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               lower(trim(url)), '^[a-z][a-z0-9+.-]*://', ''), '^www\.', ''),
               '#.*$', ''), '\?.*$', ''), '/+$', '') AS url_norm
           FROM d),
         h AS (SELECT doc_id, url, url_norm,
             regexp_extract(url_norm, '^([^/]+)', 1) AS domain FROM n),
         r AS (SELECT doc_id, url, url_norm, domain,
             CASE WHEN contains(domain, '.')
                  THEN regexp_extract(domain, '([^.]+\.[^.]+)$', 1)
                  ELSE domain END AS reg_domain,
             row_number() OVER (PARTITION BY url_norm ORDER BY doc_id) AS url_rank
           FROM h)
         SELECT doc_id, url, url_norm, domain, reg_domain,
           reg_domain IN ('tracker.net', 'example.org') AS blocked,
           url_rank,
           (reg_domain NOT IN ('tracker.net', 'example.org') AND url_rank = 1) AS keep
         FROM r""",
    "q123_perplexity_bands" ->
      """WITH toks AS (SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS t
           FROM documents),
         e AS (SELECT doc_id, unnest(t) AS term FROM toks),
         g AS (SELECT doc_id, term, COUNT(*) AS c FROM e
               WHERE doc_id < 250 GROUP BY 1, 2),
         v AS (SELECT term, CAST(SUM(c) AS BIGINT) AS tf FROM g
               GROUP BY term HAVING SUM(c) >= 2),
         lm AS (SELECT term,
             ln(CAST(tf AS DOUBLE) / CAST((SELECT SUM(tf) FROM v) AS DOUBLE)) AS logp
           FROM v),
         sc AS (SELECT e.doc_id, COUNT(*) AS n_tokens,
             ROUND(AVG(COALESCE(lm.logp, -20.0)), 4) AS avg_logp
           FROM e LEFT JOIN lm USING (term)
           WHERE e.doc_id >= 250 GROUP BY e.doc_id),
         pp AS (SELECT doc_id, n_tokens, avg_logp,
             ROUND(exp(-avg_logp), 4) AS perplexity FROM sc),
         ed AS (SELECT quantile_cont(perplexity, 0.25) AS e1,
                       quantile_cont(perplexity, 0.50) AS e2,
                       quantile_cont(perplexity, 0.75) AS e3 FROM pp),
         b AS (SELECT pp.*,
             1 + (CASE WHEN perplexity > e1 THEN 1 ELSE 0 END)
               + (CASE WHEN perplexity > e2 THEN 1 ELSE 0 END)
               + (CASE WHEN perplexity > e3 THEN 1 ELSE 0 END) AS q
           FROM pp, ed)
         SELECT doc_id, n_tokens, avg_logp, perplexity,
           CASE WHEN q = 1 THEN 'head' WHEN q = 4 THEN 'tail'
                ELSE 'middle' END AS band
         FROM b
         WHERE CASE WHEN q = 1 THEN TRUE
                    WHEN q = 4 THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '19999999'
                    ELSE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '80000000' END""",
    "q124_source_overlap" ->
      """WITH tok AS (SELECT source,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS toks
           FROM documents),
         sh AS (SELECT source, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
             ELSE [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)] END AS s
           FROM tok),
         ss AS (SELECT DISTINCT source, g
           FROM (SELECT source, unnest(s) AS g FROM sh)),
         sz AS (SELECT source, COUNT(*) AS n FROM ss GROUP BY source),
         cm AS (SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
           FROM ss a JOIN ss b ON a.g = b.g AND a.source < b.source
           GROUP BY 1, 2)
         SELECT source_a, source_b, sa.n AS n_a, sb.n AS n_b, n_common,
           ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) AS jaccard
         FROM cm
         JOIN sz sa ON cm.source_a = sa.source
         JOIN sz sb ON cm.source_b = sb.source""",
    "q126_token_budget" ->
      """WITH tok AS (SELECT source,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS toks
           FROM documents),
         cnt AS (SELECT source, CAST(SUM(len(toks)) AS BIGINT) AS n_tokens_avail
           FROM tok GROUP BY source),
         w AS (SELECT source, n_tokens_avail,
             ROUND(pow(CAST(n_tokens_avail AS DOUBLE), 0.7) /
               (SELECT SUM(pow(CAST(n_tokens_avail AS DOUBLE), 0.7)) FROM cnt), 6) AS weight
           FROM cnt),
         base AS (SELECT source, n_tokens_avail, weight,
             weight * 54000 AS raw, n_tokens_avail * 2.0 AS cap FROM w),
         pools AS (SELECT
             SUM(CASE WHEN raw > cap THEN raw - cap ELSE 0 END) AS surplus,
             SUM(CASE WHEN raw > cap THEN 0 ELSE weight END) AS free_w FROM base)
         SELECT source, n_tokens_avail, weight,
           CAST(FLOOR(CASE WHEN raw > cap THEN cap
                ELSE LEAST(raw + CASE WHEN free_w > 0 THEN surplus * weight / free_w ELSE 0 END, cap) END) AS BIGINT) AS alloc_tokens,
           ROUND(CAST(FLOOR(CASE WHEN raw > cap THEN cap
                ELSE LEAST(raw + CASE WHEN free_w > 0 THEN surplus * weight / free_w ELSE 0 END, cap) END) AS DOUBLE) / n_tokens_avail, 4) AS epochs,
           raw > cap AS capped
         FROM base, pools""",
    "q127_incremental_dedup" ->
      """WITH f AS (SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
           FROM documents),
         b1 AS (SELECT DISTINCT fp FROM f WHERE doc_id < 250),
         b2 AS (SELECT doc_id, fp FROM f WHERE doc_id >= 250),
         k AS (SELECT MIN(doc_id) AS doc_id FROM b2
               WHERE fp NOT IN (SELECT fp FROM b1) GROUP BY fp)
         SELECT d.* FROM documents d JOIN k USING (doc_id)""",
    "q128_fineweb_funnel" -> {
      def ratio(l: String): String = {
        val sw = Text.stopwords(l).map(w => s"'$w'").mkString("[", ", ", "]")
        s"CAST(len(list_filter(toks, x -> list_contains($sw, x))) AS DOUBLE) / GREATEST(len(toks), 1)"
      }
      s"""WITH pages AS (SELECT doc_id, source,
             CASE WHEN doc_id % 3 = 0 THEN text || '.'
                  WHEN doc_id % 3 = 1 THEN regexp_replace(text, ' the ', '.' || chr(10), 'g')
                  ELSE text END AS text
           FROM documents),
         c4 AS (SELECT doc_id, source, text,
             COALESCE(array_to_string(
               list_filter(string_split(text, chr(10)), l ->
                 regexp_matches(trim(l), '[.!?"'']$$') AND
                 len(string_split_regex(trim(l), '\\s+')) >= 5 AND
                 NOT contains(lower(l), 'javascript')),
               chr(10)), '') AS c4_text
           FROM pages),
         c AS (SELECT doc_id, source, c4_text,
             (length(regexp_replace(c4_text, '[^.!?]', '', 'g')) >= 3 AND
              NOT contains(lower(text), 'lorem ipsum') AND
              NOT contains(text, '{')) AS c4_pass,
             list_filter(string_split_regex(lower(trim(c4_text)), '\\s+'),
               x -> length(x) > 0) AS toks
           FROM c4),
         q AS (SELECT *, (c4_pass AND len(toks) >= 5 AND
             CAST(length(regexp_replace(c4_text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
               / GREATEST(length(c4_text), 1) <= 0.3) AS quality_pass
           FROM c),
         l AS (SELECT *, (quality_pass AND (CASE
             WHEN ${ratio("fr")} > 0 AND ${ratio("fr")} >= ${ratio("es")} AND ${ratio("fr")} >= ${ratio("en")} AND ${ratio("fr")} >= ${ratio("de")} THEN 'fr'
             WHEN ${ratio("es")} > 0 AND ${ratio("es")} >= ${ratio("en")} AND ${ratio("es")} >= ${ratio("de")} THEN 'es'
             WHEN ${ratio("en")} > 0 AND ${ratio("en")} >= ${ratio("de")} THEN 'en'
             WHEN ${ratio("de")} > 0 THEN 'de'
             ELSE 'und' END) = 'en') AS lang_pass,
             md5(regexp_replace(lower(trim(c4_text)), '\\s+', ' ', 'g')) AS fp,
             (len(regexp_extract_all(c4_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
              + len(regexp_extract_all(c4_text, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b'))
              + len(regexp_extract_all(c4_text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) > 0) AS pii_hit
           FROM q),
         kp AS (SELECT fp, MIN(doc_id) AS keeper FROM l
                WHERE lang_pass GROUP BY fp),
         a AS (SELECT l.*, (l.lang_pass AND l.doc_id = kp.keeper) AS kept
               FROM l LEFT JOIN kp ON l.fp = kp.fp)
         SELECT source, COUNT(*) AS n_input,
           CAST(SUM(CASE WHEN c4_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_c4,
           CAST(SUM(CASE WHEN quality_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(SUM(CASE WHEN lang_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN kept AND pii_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_kept
         FROM a GROUP BY source"""
    },
    "q129_ngram_novelty" ->
      """WITH tok AS (SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS toks
           FROM documents),
         sh AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
             ELSE [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)] END AS s
           FROM tok),
         ds AS (SELECT DISTINCT doc_id, g
           FROM (SELECT doc_id, unnest(s) AS g FROM sh)),
         fs AS (SELECT g, MIN(doc_id) AS first FROM ds GROUP BY g)
         SELECT doc_id, COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN doc_id = first THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           ROUND(CAST(SUM(CASE WHEN doc_id = first THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS novelty
         FROM ds JOIN fs USING (g) GROUP BY doc_id""",
    "q130_zipf_slope" ->
      """WITH tok AS (SELECT source,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS toks
           FROM documents),
         tf AS (SELECT source, term, COUNT(*) AS f
           FROM (SELECT source, unnest(toks) AS term FROM tok)
           GROUP BY source, term),
         rk AS (SELECT source, term, f,
             row_number() OVER (PARTITION BY source ORDER BY f DESC, term ASC) AS r
           FROM tf),
         lg AS (SELECT source, f, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y
           FROM rk)
         SELECT source, COUNT(*) AS n_terms, CAST(SUM(f) AS BIGINT) AS n_tokens,
           ROUND((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y)) /
                 (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)), 4) AS zipf_slope
         FROM lg GROUP BY source""",
    "q131_bigram_lm_score" ->
      """WITH tok AS (SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS toks
           FROM documents),
         ref AS (SELECT doc_id, toks FROM tok WHERE doc_id < 250),
         refsh AS (SELECT CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
             ELSE [array_to_string(toks[i:i+1], ' ') for i in range(1, len(toks))] END AS s
           FROM ref),
         bgc AS (SELECT g AS bigram, COUNT(*) AS c12
           FROM (SELECT unnest(s) AS g FROM refsh)
           WHERE contains(g, ' ') GROUP BY g HAVING COUNT(*) >= 2),
         c1 AS (SELECT term AS w1, COUNT(*) AS c1n
           FROM (SELECT unnest(toks) AS term FROM ref) GROUP BY 1),
         pb AS (SELECT bigram, CAST(c12 AS DOUBLE) / c1n AS p_big
           FROM bgc JOIN c1 ON split_part(bigram, ' ', 1) = w1),
         vocab AS (SELECT term, COUNT(*) AS tf
           FROM (SELECT unnest(toks) AS term FROM ref)
           GROUP BY term HAVING COUNT(*) >= 2),
         uni AS (SELECT term AS w2,
             CAST(tf AS DOUBLE) / (SELECT SUM(tf) FROM vocab) AS p_uni
           FROM vocab),
         d AS (SELECT doc_id, toks FROM tok WHERE doc_id >= 250 AND len(toks) >= 2),
         dsh AS (SELECT doc_id,
             unnest([array_to_string(toks[i:i+1], ' ') for i in range(1, len(toks))]) AS bigram
           FROM d),
         sc AS (SELECT doc_id,
             0.7 * COALESCE(p_big, 0) + (1.0 - 0.7) * COALESCE(p_uni, 0) AS p
           FROM dsh
           LEFT JOIN pb USING (bigram)
           LEFT JOIN uni ON split_part(bigram, ' ', 2) = w2)
         SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(AVG(CASE WHEN p > 0 THEN ln(p) ELSE -20.0 END), 4) AS avg_logp
         FROM sc GROUP BY doc_id""",
    "q132_asof_join" ->
      """WITH c AS (SELECT user_id, ts, MAX(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
         p AS (SELECT event_id, user_id, ts, value
           FROM events WHERE event_type = 'purchase')
         SELECT p.event_id, p.user_id, ROUND(p.value, 4) AS value,
           COALESCE(c.ts, TIMESTAMP '1970-01-01') AS asof_ts,
           COALESCE(c.click_id, -1) AS asof_click_id
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.user_id AND p.ts >= c.ts""",
    "q133_band_join" ->
      """WITH p AS (SELECT event_id, user_id, ts
           FROM events WHERE event_type = 'purchase')
         SELECT p.event_id,
           COUNT(e.ts) AS n_err,
           CAST(COALESCE(SUM(CAST(e.value AS DECIMAL(18,2))), 0) AS DOUBLE) AS err_sum
         FROM p LEFT JOIN events e
           ON e.user_id = p.user_id AND e.event_type = 'error'
           AND e.ts BETWEEN p.ts - INTERVAL 600 SECOND AND p.ts
         GROUP BY p.event_id""",
    "q134_dsir_weights" -> dsirWeightsSql,
    "q135_dsir_select" ->
      s"""WITH w AS ($dsirWeightsSql)
         SELECT * FROM w
         WHERE dsir_weight >= (SELECT quantile_cont(dsir_weight, 0.75) FROM w)""",
    "q136_doremi_mixture" -> graft.text.Doremi.oracleSql(
      "SELECT source AS domain, AVG(n_chars) / 1000.0 AS excess FROM documents GROUP BY source",
      eta = 1.0, steps = 5, smoothing = 0.01),
    "q138_sessionize" ->
      """WITH o AS (SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
                  THEN 1 ELSE 0 END AS nw
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         s AS (SELECT user_id, ts, value,
             CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
           FROM o)
         SELECT user_id, session_idx, COUNT(*) AS n_events,
           (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_sec,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
         FROM s GROUP BY user_id, session_idx""",
    "q139_rolling_window" ->
      """SELECT event_id,
           COUNT(*) OVER w AS rolling_n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS rolling_sum
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",
    "q140_funnel" ->
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
         s2 AS MATERIALIZED (SELECT e.user_id, MIN(e.ts) AS t2, MIN(s1.t1) AS t0
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s1.t1
             AND epoch_us(e.ts) <= epoch_us(s1.t1) + 604800000000
           GROUP BY e.user_id),
         s3 AS MATERIALIZED (SELECT e.user_id, MIN(e.ts) AS t3
           FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2
             AND epoch_us(e.ts) <= epoch_us(s2.t0) + 604800000000
           GROUP BY e.user_id)
         SELECT 1 AS step, 'signup' AS step_name,
           (SELECT COUNT(*) FROM s1) AS n_users
         UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
         UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)""",
    "q141_pagerank" -> graft.proximity.Graph.pageRankOracleSql(
      proximityEdgesSql, iters = 5, damping = 0.85),
    "q145_label_propagation" -> graft.proximity.Graph.labelPropagationOracleSql(
      proximityEdgesSql, iters = 3),
    "q146_triangle_count" -> graft.proximity.Graph.triangleCountOracleSql(
      proximityEdgesSql),
    "q147_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q148_cube" ->
      """SELECT event_type,
         COALESCE(date_trunc('day', ts), TIMESTAMP '1970-01-01') AS day,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY CUBE (event_type, date_trunc('day', ts))""",
    "q142_resample_ffill" ->
      """WITH obs AS (SELECT user_id, ts, MAX(value) AS value
           FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
         grid AS (SELECT user_id,
             unnest(generate_series(
               to_timestamp((epoch_us(MIN(ts)) // 3600000000) * 3600),
               to_timestamp((epoch_us(MAX(ts)) // 3600000000) * 3600),
               INTERVAL 1 HOUR)) AS ts
           FROM obs GROUP BY user_id)
         SELECT g.user_id, CAST(g.ts AS TIMESTAMP) AS ts,
           ROUND(COALESCE(o.value, -1.0), 4) AS value_ffill
         FROM grid g ASOF LEFT JOIN obs o
           ON g.user_id = o.user_id AND g.ts >= o.ts""",
    "q143_scd2_intervals" ->
      """WITH st AS (SELECT user_id, ts,
             CAST(FLOOR(MAX(value)) % 3 AS BIGINT) AS state
           FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
         ch AS (SELECT user_id, ts, state,
             lag(state) OVER (PARTITION BY user_id ORDER BY ts) AS prev
           FROM st),
         cp AS (SELECT user_id, ts, state FROM ch
           WHERE prev IS NULL OR prev IS DISTINCT FROM state)
         SELECT user_id, state, ts AS valid_from,
           COALESCE(lead(ts) OVER (PARTITION BY user_id ORDER BY ts),
             TIMESTAMP '2200-01-01') AS valid_to
         FROM cp""",
    "q144_weighted_sample" ->
      """SELECT source, doc_id, ROUND(sample_key, 6) AS sample_key
         FROM (SELECT source, doc_id,
             POW(((doc_id * 2654435761) % 4294967296 + 0.5) / 4294967296.0,
               1.0 / n_chars) AS sample_key
           FROM documents)
         QUALIFY row_number() OVER (PARTITION BY source
           ORDER BY sample_key DESC, doc_id ASC) <= 5""",
    "q149_bm25" ->
      """WITH tok AS (SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS t
           FROM documents),
         post AS (SELECT doc_id, term, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest(t) AS term FROM tok) GROUP BY doc_id, term),
         dl AS (SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY doc_id),
         stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
         dfq AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
         idf AS (SELECT term, ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf
           FROM dfq, stats),
         q AS (SELECT DISTINCT doc_id AS qid, unnest(t) AS term
           FROM tok WHERE doc_id < 5),
         sc AS (SELECT q.qid, p.doc_id,
             ROUND(SUM(idf.idf * p.tf * (1.2 + 1) /
               (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))), 6) AS bm25
           FROM q JOIN post p USING (term) JOIN idf USING (term)
           JOIN dl ON p.doc_id = dl.doc_id, stats
           GROUP BY q.qid, p.doc_id)
         SELECT qid, doc_id, bm25, rank FROM
           (SELECT *, CAST(row_number() OVER (PARTITION BY qid
              ORDER BY bm25 DESC, doc_id ASC) AS INT) AS rank FROM sc)
         WHERE rank <= 10""",
    "q150_fuzzy_join" ->
      """WITH p AS (SELECT DISTINCT p_name FROM part)
         SELECT a.p_name AS a_name, b.p_name AS b_name,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
         FROM p a JOIN p b ON a.p_name < b.p_name
           AND abs(length(a.p_name) - length(b.p_name)) <= 2
           AND levenshtein(a.p_name, b.p_name) <= 2""",
    "q151_histogram_width" ->
      """WITH mm AS (SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
           FROM lineitem WHERE l_extendedprice IS NOT NULL),
         b AS (SELECT LEAST(CAST(FLOOR((l_extendedprice - mn) / ((mx - mn) / 10))
               AS INT), 9) AS bucket, mn, mx
           FROM lineitem, mm WHERE l_extendedprice IS NOT NULL)
         SELECT bucket, ROUND(mn + bucket * ((mx - mn) / 10), 6) AS lo,
           ROUND(mn + (bucket + 1) * ((mx - mn) / 10), 6) AS hi, COUNT(*) AS n
         FROM b GROUP BY bucket, mn, mx""",
    "q152_histogram_depth" ->
      """WITH e AS (SELECT list_transform(quantile_cont(value,
             [0.0, 0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875, 1.0]),
             x -> ROUND(x, 6)) AS ed
           FROM events WHERE value IS NOT NULL),
         b AS (SELECT value, CAST(
             (CASE WHEN value > ed[2] THEN 1 ELSE 0 END) +
             (CASE WHEN value > ed[3] THEN 1 ELSE 0 END) +
             (CASE WHEN value > ed[4] THEN 1 ELSE 0 END) +
             (CASE WHEN value > ed[5] THEN 1 ELSE 0 END) +
             (CASE WHEN value > ed[6] THEN 1 ELSE 0 END) +
             (CASE WHEN value > ed[7] THEN 1 ELSE 0 END) +
             (CASE WHEN value > ed[8] THEN 1 ELSE 0 END) AS INT) AS bucket
           FROM events, e WHERE value IS NOT NULL)
         SELECT bucket, ed[bucket + 1] AS lo, ed[bucket + 2] AS hi, COUNT(*) AS n
         FROM b, e GROUP BY bucket, ed""",
    "q153_tfidf_pairs" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
         tok AS (SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS t
           FROM docs),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest(t) AS term FROM tok) GROUP BY doc_id, term),
         nn AS (SELECT COUNT(*) AS n FROM docs),
         idf AS (SELECT term, ln(CAST(n AS DOUBLE) / COUNT(*)) AS idf
           FROM tf, nn GROUP BY term, n),
         w AS (SELECT doc_id, term, tf * idf AS w
           FROM tf JOIN idf USING (term)),
         nrm AS (SELECT doc_id, SQRT(SUM(w * w)) AS nrm FROM w GROUP BY doc_id),
         v AS (SELECT w.doc_id, term,
             CASE WHEN nrm > 0 THEN w / nrm ELSE 0 END AS weight
           FROM w JOIN nrm ON w.doc_id = nrm.doc_id)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           ROUND(SUM(a.weight * b.weight), 6) AS similarity
         FROM v a JOIN v b ON a.term = b.term AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id HAVING similarity >= 0.9""",
    "q154_hybrid_rrf" ->
      """WITH q AS (SELECT d.doc_id AS qid, d.text, e.embedding
           FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
           WHERE d.doc_id < 5),
         qv AS (SELECT qid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe FROM q),
         r AS (SELECT vec_id AS doc_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS re
           FROM embeddings),
         dense AS (SELECT qid, doc_id, CAST(row_number() OVER
               (PARTITION BY qid ORDER BY sim DESC, doc_id) AS INT) AS rank
           FROM (SELECT qid, doc_id,
               list_dot_product(qe, re) / (SQRT(list_dot_product(qe, qe)) *
                 SQRT(list_dot_product(re, re))) AS sim
             FROM qv CROSS JOIN r WHERE qid != doc_id)
           QUALIFY rank <= 20),
         tok AS (SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS t
           FROM documents),
         post AS (SELECT doc_id, term, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest(t) AS term FROM tok) GROUP BY doc_id, term),
         dl AS (SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY doc_id),
         stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
         dfq AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
         idf AS (SELECT term, ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf
           FROM dfq, stats),
         qt AS (SELECT DISTINCT qid,
             unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0)) AS term
           FROM q),
         sc AS (SELECT qt.qid, p.doc_id,
             ROUND(SUM(idf.idf * p.tf * (1.2 + 1) /
               (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))), 6) AS bm25
           FROM qt JOIN post p USING (term) JOIN idf USING (term)
           JOIN dl ON p.doc_id = dl.doc_id, stats
           GROUP BY qt.qid, p.doc_id),
         sparse AS (SELECT qid, doc_id, CAST(row_number() OVER
               (PARTITION BY qid ORDER BY bm25 DESC, doc_id) AS INT) AS rank
           FROM sc QUALIFY rank <= 20),
         fused AS (SELECT COALESCE(d.qid, s.qid) AS qid,
             COALESCE(d.doc_id, s.doc_id) AS doc_id,
             ROUND(COALESCE(1.0 / (60 + d.rank), 0) +
                   COALESCE(1.0 / (60 + s.rank), 0), 6) AS rrf_score
           FROM dense d FULL OUTER JOIN sparse s
             ON d.qid = s.qid AND d.doc_id = s.doc_id)
         SELECT qid, doc_id, rrf_score, CAST(row_number() OVER
             (PARTITION BY qid ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
         FROM fused QUALIFY rank <= 10""",
    "q155_mutual_information" ->
      """WITH d AS (SELECT event_type AS a,
             CASE WHEN value >= 50 THEN 'high' ELSE 'low' END AS b FROM events),
         cells AS (SELECT a, b, COUNT(*) AS n FROM d GROUP BY a, b),
         na AS (SELECT a, SUM(n) AS n_a FROM cells GROUP BY a),
         nb AS (SELECT b, SUM(n) AS n_b FROM cells GROUP BY b),
         nt AS (SELECT SUM(n) AS n_tot FROM cells),
         mi AS (SELECT SUM((n / n_tot) * ln((n / n_tot) /
               ((n_a / n_tot) * (n_b / n_tot)))) AS mi
           FROM cells JOIN na USING (a) JOIN nb USING (b), nt),
         ha AS (SELECT -SUM((n_a / n_tot) * ln(n_a / n_tot)) AS ha FROM na, nt),
         hb AS (SELECT -SUM((n_b / n_tot) * ln(n_b / n_tot)) AS hb FROM nb, nt)
         SELECT ROUND(mi, 6) AS mi_nats, ROUND(ha, 6) AS entropy_a,
           ROUND(hb, 6) AS entropy_b,
           ROUND(CASE WHEN LEAST(ha, hb) > 0 THEN mi / LEAST(ha, hb)
             ELSE 0 END, 6) AS normalized_mi
         FROM mi, ha, hb""",
    "q156_chi_square" ->
      """WITH d AS (SELECT event_type AS a,
             CASE WHEN value >= 50 THEN 'high' ELSE 'low' END AS b FROM events),
         cells AS (SELECT a, b, COUNT(*) AS n FROM d GROUP BY a, b),
         na AS (SELECT a, SUM(n) AS n_a FROM cells GROUP BY a),
         nb AS (SELECT b, SUM(n) AS n_b FROM cells GROUP BY b),
         nt AS (SELECT SUM(n) AS n_tot FROM cells),
         obs AS (SELECT
             SUM(POW(n - CAST(n_a AS DOUBLE) * n_b / n_tot, 2) /
               (CAST(n_a AS DOUBLE) * n_b / n_tot)) AS chi_obs,
             SUM(CAST(n_a AS DOUBLE) * n_b / n_tot) AS e_obs,
             ANY_VALUE(n_tot) AS n,
             COUNT(DISTINCT a) AS r, COUNT(DISTINCT b) AS c
           FROM cells JOIN na USING (a) JOIN nb USING (b), nt)
         SELECT ROUND(chi_obs + (n - e_obs), 6) AS chi2,
           (r - 1) * (c - 1) AS dof,
           ROUND(SQRT((chi_obs + (n - e_obs)) / (n * (LEAST(r, c) - 1))), 6)
             AS cramers_v
         FROM obs""",
    "q157_expectations" ->
      """SELECT 'not_null' AS "check", 'l_orderkey' AS "column",
           COUNT(*) FILTER (WHERE l_orderkey IS NULL) AS n_violations,
           COUNT(*) FILTER (WHERE l_orderkey IS NULL) = 0 AS passed
         FROM lineitem
         UNION ALL
         SELECT 'unique', 'l_orderkey,l_linenumber',
           (SELECT COUNT(*) FROM lineitem
              WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL)
             - (SELECT COUNT(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem
              WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL)
             = (SELECT COUNT(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem)
         UNION ALL
         SELECT 'in_range', 'l_discount',
           COUNT(*) FILTER (WHERE l_discount IS NOT NULL
             AND (l_discount < 0.0 OR l_discount > 0.1)),
           COUNT(*) FILTER (WHERE l_discount IS NOT NULL
             AND (l_discount < 0.0 OR l_discount > 0.1)) = 0
         FROM lineitem
         UNION ALL
         SELECT 'accepted_values', 'l_returnflag',
           COUNT(*) FILTER (WHERE l_returnflag IS NOT NULL
             AND l_returnflag NOT IN ('A', 'N', 'R')),
           COUNT(*) FILTER (WHERE l_returnflag IS NOT NULL
             AND l_returnflag NOT IN ('A', 'N', 'R')) = 0
         FROM lineitem
         UNION ALL
         SELECT 'matches_regex', 'l_linestatus',
           COUNT(*) FILTER (WHERE l_linestatus IS NOT NULL
             AND NOT regexp_matches(l_linestatus, '^[OF]$')),
           COUNT(*) FILTER (WHERE l_linestatus IS NOT NULL
             AND NOT regexp_matches(l_linestatus, '^[OF]$')) = 0
         FROM lineitem""",
    "q158_group_quantiles" -> Seq(0.25, 0.5, 0.75, 0.9).map(p =>
      s"""SELECT l_returnflag, CAST($p AS DOUBLE) AS p,
          ROUND(quantile_cont(l_extendedprice, $p), 6) AS value
          FROM lineitem GROUP BY l_returnflag""").mkString(" UNION ALL "),
    "q159_pivot" -> {
      val cols = Seq("click", "view", "purchase", "signup", "error").map(v =>
        s"""CAST(SUM(CASE WHEN event_type = '$v'
            THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS "$v"""")
        .mkString(", ")
      s"""SELECT date_trunc('day', ts) AS day, $cols
          FROM events GROUP BY day"""
    },
    "q160_unpivot" ->
      """WITH a AS (SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
         UNION ALL
         SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM a""",
    "q161_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
           ROUND(percent_rank() OVER w, 6) AS pr,
           ROUND(cume_dist() OVER w, 6) AS cd,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           ROUND(o_totalprice - lag(o_totalprice, 1) OVER w, 2) AS delta_prev
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
    "q163_rolling_anomaly" ->
      """SELECT event_id, user_id, baseline_n, baseline_mean, z,
           COALESCE(ABS(z) > 2.0, false) AS is_anomaly
         FROM (SELECT event_id, user_id,
             COUNT(value) OVER w AS baseline_n,
             ROUND(AVG(value) OVER w, 6) AS baseline_mean,
             CASE WHEN COUNT(value) OVER w >= 5 AND stddev_samp(value) OVER w > 0
               THEN ROUND((value - AVG(value) OVER w) /
                 stddev_samp(value) OVER w, 6) END AS z
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING))""",
    "q164_cohort_retention" ->
      """WITH ev AS (SELECT user_id AS u,
             date_trunc('week', ts) AS wk FROM events),
         coh AS (SELECT u, MIN(wk) AS cohort_week FROM ev GROUP BY u),
         act AS (SELECT DISTINCT u, wk FROM ev)
         SELECT cohort_week,
           CAST(date_diff('day', cohort_week, wk) / 7 AS INT) AS week_offset,
           COUNT(DISTINCT u) AS n_active
         FROM act JOIN coh USING (u) GROUP BY cohort_week, week_offset""",
    "q165_bfs_hops" -> graft.proximity.Graph.bfsDepthsOracleSql(
      proximityEdgesSql,
      "SELECT vec_id AS id FROM embeddings WHERE vec_id < 3", maxHops = 4),
    "q166_woe_encoding" ->
      """WITH cells AS (SELECT l_returnflag AS category, COUNT(*) AS n,
             COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_pos,
             COUNT(*) FILTER (WHERE NOT l_discount > 0.05) AS n_neg
           FROM lineitem GROUP BY l_returnflag),
         tot AS (SELECT SUM(n_pos) AS p, SUM(n_neg) AS ng FROM cells)
         SELECT category, n, n_pos, n_neg,
           ROUND(ln(((n_pos + 0.5) / p) / ((n_neg + 0.5) / ng)), 6) AS woe,
           ROUND(((n_pos + 0.5) / p - (n_neg + 0.5) / ng) *
             ln(((n_pos + 0.5) / p) / ((n_neg + 0.5) / ng)), 6) AS iv_term
         FROM cells, tot""",
    "q167_target_encoding" ->
      """WITH s AS (SELECT o_orderpriority, COUNT(o_totalprice) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
           FROM orders GROUP BY o_orderpriority),
         g AS (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(o_totalprice) AS gm FROM orders),
         enc AS (SELECT o_orderpriority,
             ROUND((s + 20.0 * gm) / (n + 20.0), 6) AS prio_enc FROM s, g)
         SELECT o_orderkey, o_orderpriority, prio_enc
         FROM orders JOIN enc USING (o_orderpriority)""",
    "q168_interval_join" ->
      """WITH l AS (SELECT user_id, event_id AS l_event_id, ts AS ls,
             ts + INTERVAL 1800 SECOND AS le FROM events),
         r AS (SELECT user_id, event_id AS r_event_id, ts AS rs,
             ts + INTERVAL 600 SECOND AS re FROM events
           WHERE event_type = 'error')
         SELECT l.user_id, l_event_id, r_event_id
         FROM l JOIN r ON l.user_id = r.user_id
           AND ls <= re AND rs <= le""",
    "q169_skew_report" ->
      """WITH c AS (SELECT l_suppkey AS k, COUNT(*) AS c
           FROM lineitem GROUP BY l_suppkey),
         rk AS (SELECT c, row_number() OVER (ORDER BY c, k) AS i FROM c),
         t AS (SELECT SUM(c) AS s, COUNT(*) AS n, MAX(c) AS mx FROM c),
         t5 AS (SELECT SUM(c) AS t5 FROM
           (SELECT c FROM c ORDER BY c DESC, k ASC LIMIT 5)),
         g AS (SELECT SUM((2.0 * i - n - 1) * c) AS gsum FROM rk, t)
         SELECT CAST(s AS BIGINT) AS n_rows, n AS n_keys,
           ROUND(CAST(mx AS DOUBLE) / s, 6) AS max_key_share,
           ROUND(CAST(t5 AS DOUBLE) / s, 6) AS top5_share,
           ROUND(gsum / (n * s), 6) AS gini
         FROM t, t5, g""",
    "q170_join_cardinality" ->
      """WITH lc AS (SELECT l_orderkey AS k, COUNT(*) AS nl
           FROM lineitem GROUP BY l_orderkey),
         rc AS (SELECT o_orderkey AS k, COUNT(*) AS nr
           FROM orders GROUP BY o_orderkey)
         SELECT (SELECT COUNT(*) FROM lineitem) AS left_rows,
           (SELECT COUNT(*) FROM orders) AS right_rows,
           COUNT(*) AS matching_keys,
           CAST(COALESCE(SUM(nl * nr), 0) AS BIGINT) AS join_rows,
           COALESCE(MAX(nl * nr), 0) AS max_key_pairs
         FROM lc JOIN rc USING (k)""",
    "q171_bloom_blocklist" ->
      """WITH fp AS (SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
           FROM documents),
         block AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 10 = 0)
         SELECT doc_id FROM fp WHERE fp NOT IN (SELECT fp FROM block)""",
    "q172_incremental_agg" ->
      """SELECT l_returnflag, COUNT(l_extendedprice) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
           MIN(l_extendedprice) AS min_v, MAX(l_extendedprice) AS max_v,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(l_extendedprice), 6) AS avg_v
         FROM lineitem GROUP BY l_returnflag""",
    "q173_item_cooccur" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
           FROM lineitem),
         nb AS (SELECT COUNT(DISTINCT b) AS n FROM items),
         ic AS (SELECT i, COUNT(*) AS ci FROM items GROUP BY i),
         pairs AS (SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS n_pair
           FROM items a JOIN items b ON a.b = b.b AND a.i < b.i
           GROUP BY a.i, b.i HAVING COUNT(*) >= 2)
         SELECT item_a, item_b, n_pair, ca.ci AS n_a, cb.ci AS n_b,
           ROUND(n_pair * nb.n / (ca.ci * cb.ci), 6) AS lift,
           ROUND(ln(n_pair * nb.n / (ca.ci * cb.ci)), 6) AS pmi
         FROM pairs
         JOIN ic ca ON pairs.item_a = ca.i
         JOIN ic cb ON pairs.item_b = cb.i, nb""",
    "q174_mad_outliers" ->
      """WITH med AS (SELECT quantile_cont(l_extendedprice, 0.5) AS m
           FROM lineitem WHERE l_extendedprice IS NOT NULL),
         mad AS (SELECT quantile_cont(ABS(l_extendedprice - m), 0.5) AS d
           FROM lineitem, med WHERE l_extendedprice IS NOT NULL),
         z AS (SELECT l_orderkey, l_linenumber,
             CASE WHEN d = 0 THEN NULL
               ELSE ROUND(0.6745 * (l_extendedprice - m) / d, 6) END AS mad_z
           FROM lineitem, med, mad)
         SELECT l_orderkey, l_linenumber, mad_z,
           COALESCE(ABS(mad_z) > 3.5, false) AS is_outlier
         FROM z""",
    "q175_benford" ->
      """WITH pos AS (SELECT l_extendedprice AS x FROM lineitem
           WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0),
         c AS (SELECT CAST(FLOOR(x / POW(10.0, FLOOR(LOG10(x)))) AS INT)
             AS digit, COUNT(*) AS n FROM pos GROUP BY digit),
         t AS (SELECT SUM(n) AS tot FROM c)
         SELECT digit, n,
           ROUND(n / CAST(tot AS DOUBLE), 6) AS observed_share,
           ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford_share,
           ROUND(POW(n / CAST(tot AS DOUBLE) - LOG10(1.0 + 1.0 / digit), 2)
             / LOG10(1.0 + 1.0 / digit) * tot, 6) AS chi2_term
         FROM c, t""",
    "q176_group_regression" ->
      """SELECT l_returnflag,
           regr_count(l_extendedprice, l_quantity) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           ROUND(corr(l_extendedprice, l_quantity), 6) AS corr,
           CASE WHEN regr_count(l_extendedprice, l_quantity) > 2
               AND ABS(corr(l_extendedprice, l_quantity)) < 1.0
             THEN ROUND(corr(l_extendedprice, l_quantity) *
               SQRT((regr_count(l_extendedprice, l_quantity) - 2) /
                 (1.0 - corr(l_extendedprice, l_quantity) *
                   corr(l_extendedprice, l_quantity))), 6) END AS t_stat
         FROM lineitem GROUP BY l_returnflag""",
    "q177_decayed_sum" ->
      """SELECT user_id, COUNT(*) AS n_events,
           ROUND(SUM(EXP((-LN(2) / 7) *
             ((epoch_us(TIMESTAMP '2024-01-20 00:00:00') - epoch_us(ts))
               / 86400000000.0)) * value), 6) AS decayed_sum,
           ROUND(SUM(EXP((-LN(2) / 7) *
             ((epoch_us(TIMESTAMP '2024-01-20 00:00:00') - epoch_us(ts))
               / 86400000000.0))), 6) AS decayed_count
         FROM events WHERE ts <= TIMESTAMP '2024-01-20 00:00:00'
         GROUP BY user_id""",
    "q178_group_split" ->
      """WITH s AS (SELECT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 8) <
                 lower(lpad(to_hex(CAST(floor(0.25 * 4294967296) AS BIGINT)), 8, '0'))
               THEN 'test' ELSE 'train' END AS split
           FROM events)
         SELECT split, COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_groups
         FROM s GROUP BY split""",
    "q179_kcore" -> graft.proximity.Graph.kcorePeelOracleSql(
      proximityEdgesSql, k = 2, rounds = 3),
    "q180_degree_stats" ->
      s"""WITH eg AS ($proximityEdgesSql),
          und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM eg WHERE src != dst),
          dir AS (SELECT a AS src, b AS dst FROM und
                  UNION ALL SELECT b, a FROM und),
          deg AS (SELECT src AS id, COUNT(*) AS deg FROM dir GROUP BY src),
          j AS (SELECT dir.src, d1.deg AS ds, d2.deg AS dd
            FROM dir JOIN deg d1 ON dir.src = d1.id
            JOIN deg d2 ON dir.dst = d2.id)
          SELECT COUNT(DISTINCT src) AS n_nodes,
            CAST(COUNT(*) / 2 AS BIGINT) AS n_edges,
            ROUND(COUNT(*) / COUNT(DISTINCT src), 6) AS avg_degree,
            MAX(ds) AS max_degree,
            ROUND(corr(ds, dd), 6) AS assortativity
          FROM j""",
    "q181_entity_resolution" ->
      """WITH RECURSIVE names AS (SELECT DISTINCT p_name AS n FROM part),
         e AS (SELECT a.n AS src, b.n AS dst FROM names a JOIN names b
           ON a.n != b.n AND abs(length(a.n) - length(b.n)) <= 2
           AND levenshtein(a.n, b.n) <= 2),
         reach(a, b) AS (
           SELECT n, n FROM names
           UNION
           SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b),
         canon AS (SELECT a AS name, MIN(b) AS canonical_name
           FROM reach GROUP BY a),
         sizes AS (SELECT canonical_name, COUNT(*) AS cluster_size
           FROM canon GROUP BY canonical_name)
         SELECT name, canonical_name, cluster_size
         FROM canon JOIN sizes USING (canonical_name)""",
    "q182_weekly_report" ->
      """WITH wk AS (SELECT date_trunc('week', ts) AS week, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS t
           FROM events GROUP BY week)
         SELECT week, n, ROUND(t, 6) AS total,
           ROUND((t - lag(t, 1) OVER (ORDER BY week)) /
             lag(t, 1) OVER (ORDER BY week), 6) AS pct_change,
           ROUND(AVG(t) OVER (ORDER BY week
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS ma4
         FROM wk""",
    "q183_survival" ->
      """WITH life AS (SELECT
             (COALESCE(MIN(CASE WHEN event_type = 'error'
                 THEN epoch_us(ts) END), MAX(epoch_us(ts)))
               - MIN(epoch_us(ts))) / 86400000000.0 AS duration,
             CASE WHEN MIN(CASE WHEN event_type = 'error'
                 THEN epoch_us(ts) END) IS NOT NULL
               THEN 1 ELSE 0 END AS event
           FROM events GROUP BY user_id),
         byt AS (SELECT duration AS t, COUNT(*) AS n,
             CAST(SUM(CASE WHEN event = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_events
           FROM life GROUP BY duration),
         ar AS (SELECT t, n_events, CAST(SUM(n) OVER (ORDER BY t DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_at_risk
           FROM byt),
         ev AS (SELECT t, n_at_risk, n_events,
             1.0 - n_events / CAST(n_at_risk AS DOUBLE) AS factor
           FROM ar WHERE n_events > 0)
         SELECT t, n_at_risk, n_events,
           CASE WHEN SUM(CASE WHEN factor <= 0 THEN 1 ELSE 0 END)
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) > 0 THEN 0.0
             ELSE ROUND(EXP(SUM(CASE WHEN factor > 0 THEN LN(factor) END)
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)), 6) END AS survival
         FROM ev""",
    "q184_transitions" ->
      """WITH nxt AS (SELECT event_type AS from_type,
             lead(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
           FROM events),
         pairs AS (SELECT from_type, to_type, COUNT(*) AS n
           FROM nxt WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
         tot AS (SELECT from_type, SUM(n) AS tt FROM pairs GROUP BY from_type)
         SELECT from_type, to_type, n, ROUND(n / CAST(tt AS DOUBLE), 6) AS p
         FROM pairs JOIN tot USING (from_type)""",
    "q185_welch_t" ->
      """WITH g AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END
             AS grp, value FROM events),
         a AS (SELECT
             COUNT(*) FILTER (WHERE grp = 'a') AS n_a,
             COUNT(*) FILTER (WHERE grp = 'b') AS n_b,
             AVG(value) FILTER (WHERE grp = 'a') AS ma,
             AVG(value) FILTER (WHERE grp = 'b') AS mb,
             var_samp(value) FILTER (WHERE grp = 'a') AS va,
             var_samp(value) FILTER (WHERE grp = 'b') AS vb
           FROM g)
         SELECT n_a, n_b, ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
           ROUND(ma - mb, 6) AS diff,
           ROUND(SQRT(va / n_a + vb / n_b), 6) AS se,
           ROUND((ma - mb) / SQRT(va / n_a + vb / n_b), 6) AS t_stat,
           ROUND(POW(va / n_a + vb / n_b, 2) /
             (POW(va / n_a, 2) / (n_a - 1) + POW(vb / n_b, 2) / (n_b - 1)), 6)
             AS df
         FROM a""",
    "q186_rolling_folds" ->
      // rank-based cuts (exact integers — interpolated percentiles
      // rounded the last µs differently per engine at sf0.1):
      // cut_i = MIN us with ascending cumulative count >= (n*i) div 5
      """WITH base AS (SELECT epoch_us(ts) AS us FROM events),
         nn AS (SELECT COUNT(*) AS n FROM base),
         cum AS MATERIALIZED (SELECT us, SUM(c) OVER (ORDER BY us) AS cm
           FROM (SELECT us, COUNT(*) AS c FROM base GROUP BY us)),
         cutv AS (SELECT i, (SELECT MIN(us) FROM cum
             WHERE cm >= GREATEST(1, (SELECT n FROM nn) * i // 5)) AS v
           FROM (SELECT UNNEST(range(1, 6)) AS i))
         SELECT CAST(a.i - 1 AS INT) AS fold, a.v AS train_end_us,
           b.v AS valid_end_us,
           (SELECT COUNT(*) FROM base WHERE us < a.v) AS n_train,
           (SELECT COUNT(*) FROM base
              WHERE us >= a.v AND us < b.v) AS n_valid
         FROM cutv a JOIN cutv b ON b.i = a.i + 1
         WHERE a.i <= 4 ORDER BY fold""",
    "q187_calibration" ->
      """WITH d AS (SELECT value / 100 AS p,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
           FROM events)
         SELECT LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS bin, COUNT(*) AS n,
           ROUND(AVG(p), 6) AS mean_pred,
           ROUND(AVG(CASE WHEN y = 1 THEN 1.0 ELSE 0.0 END), 6) AS frac_pos
         FROM d WHERE p IS NOT NULL AND p >= 0 AND p <= 1
         GROUP BY bin""",
    "q188_winsorized_stats" ->
      """WITH b AS (SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
             quantile_cont(l_extendedprice, 0.99) AS hi
           FROM lineitem WHERE l_extendedprice IS NOT NULL)
         SELECT COUNT(*) AS n, ROUND(lo, 6) AS lo_bound,
           ROUND(hi, 6) AS hi_bound,
           CAST(SUM(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi
             THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           ROUND(AVG(LEAST(GREATEST(l_extendedprice, lo), hi)), 6) AS mean,
           ROUND(stddev_samp(LEAST(GREATEST(l_extendedprice, lo), hi)), 6)
             AS stddev
         FROM lineitem, b WHERE l_extendedprice IS NOT NULL
         GROUP BY lo, hi""",
    "q189_dow_seasonality" ->
      """SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow, COUNT(*) AS n,
           ROUND(AVG(value), 6) AS mean,
           ROUND(AVG(value) - (SELECT AVG(value) FROM events), 6)
             AS delta_vs_global
         FROM events GROUP BY dow""",
    "q190_binned_woe" ->
      """WITH e AS (SELECT list_transform(quantile_cont(l_extendedprice,
             [0.2, 0.4, 0.6, 0.8]), x -> ROUND(x, 6)) AS ed
           FROM lineitem WHERE l_extendedprice IS NOT NULL),
         b AS (SELECT CAST(
             (CASE WHEN l_extendedprice > ed[1] THEN 1 ELSE 0 END) +
             (CASE WHEN l_extendedprice > ed[2] THEN 1 ELSE 0 END) +
             (CASE WHEN l_extendedprice > ed[3] THEN 1 ELSE 0 END) +
             (CASE WHEN l_extendedprice > ed[4] THEN 1 ELSE 0 END)
               AS VARCHAR) AS category,
             CASE WHEN l_discount > 0.05 THEN 1
               WHEN l_discount IS NULL THEN NULL ELSE 0 END AS label
           FROM lineitem, e WHERE l_extendedprice IS NOT NULL),
         cells AS (SELECT category, COUNT(*) AS n,
             COUNT(*) FILTER (WHERE label = 1) AS n_pos,
             COUNT(*) FILTER (WHERE label = 0) AS n_neg
           FROM b GROUP BY category),
         tot AS (SELECT SUM(n_pos) AS p, SUM(n_neg) AS ng FROM cells)
         SELECT category, n, n_pos, n_neg,
           ROUND(ln(((n_pos + 0.5) / p) / ((n_neg + 0.5) / ng)), 6) AS woe,
           ROUND(((n_pos + 0.5) / p - (n_neg + 0.5) / ng) *
             ln(((n_pos + 0.5) / p) / ((n_neg + 0.5) / ng)), 6) AS iv_term
         FROM cells, tot""",
    "q191_abc_analysis" ->
      """WITH t AS (SELECT CAST(l_suppkey AS VARCHAR) AS entity,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS t
           FROM lineitem GROUP BY l_suppkey),
         g AS (SELECT SUM(t) AS grand FROM t),
         c AS (SELECT entity, t,
             SUM(t) OVER (ORDER BY t DESC, entity ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM t)
         SELECT entity, ROUND(t, 6) AS total,
           ROUND(t / grand, 6) AS share,
           ROUND(cum / grand, 6) AS cum_share,
           CASE WHEN ROUND(cum / grand, 6) <= 0.8 THEN 'A'
             WHEN ROUND(cum / grand, 6) <= 0.95 THEN 'B'
             ELSE 'C' END AS abc_class
         FROM c, g""",
    "q192_attribution" ->
      """WITH tagged AS (SELECT user_id, ts, event_type, value,
             CASE WHEN event_type IN ('click', 'view')
               THEN event_type END AS touch
           FROM events),
         a AS (SELECT *, last_value(touch IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY epoch_us(ts), event_type
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr
           FROM tagged)
         SELECT COALESCE(attr, '(none)') AS touch_type,
           COUNT(*) AS n_conversions,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6)
             AS value_sum
         FROM a WHERE event_type = 'purchase' GROUP BY touch_type""",
    "q193_rfm_segments" ->
      """WITH pu AS (SELECT user_id AS user,
             (epoch_us(TIMESTAMP '2024-02-01 00:00:00') - MAX(epoch_us(ts)))
               / 86400000000.0 AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
           FROM events WHERE ts <= TIMESTAMP '2024-02-01 00:00:00'
           GROUP BY user_id),
         e AS (SELECT
             list_transform(quantile_cont(recency_days, [0.25, 0.5, 0.75]),
               x -> ROUND(x, 6)) AS re,
             list_transform(quantile_cont(CAST(frequency AS DOUBLE),
               [0.25, 0.5, 0.75]), x -> ROUND(x, 6)) AS fe,
             list_transform(quantile_cont(monetary, [0.25, 0.5, 0.75]),
               x -> ROUND(x, 6)) AS me
           FROM pu),
         s AS (SELECT "user", recency_days, frequency, monetary,
             4 - ((CASE WHEN recency_days > re[1] THEN 1 ELSE 0 END) +
                  (CASE WHEN recency_days > re[2] THEN 1 ELSE 0 END) +
                  (CASE WHEN recency_days > re[3] THEN 1 ELSE 0 END)) AS r_score,
             1 + ((CASE WHEN frequency > fe[1] THEN 1 ELSE 0 END) +
                  (CASE WHEN frequency > fe[2] THEN 1 ELSE 0 END) +
                  (CASE WHEN frequency > fe[3] THEN 1 ELSE 0 END)) AS f_score,
             1 + ((CASE WHEN monetary > me[1] THEN 1 ELSE 0 END) +
                  (CASE WHEN monetary > me[2] THEN 1 ELSE 0 END) +
                  (CASE WHEN monetary > me[3] THEN 1 ELSE 0 END)) AS m_score
           FROM pu, e)
         SELECT "user", ROUND(recency_days, 6) AS recency_days, frequency,
           ROUND(monetary, 6) AS monetary,
           CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
             CAST(m_score AS VARCHAR) AS segment
         FROM s""",
    "q194_mann_whitney" ->
      """WITH base AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END
             AS grp, CAST(value AS DOUBLE) AS v
           FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
         r AS (SELECT grp,
             rank() OVER (ORDER BY v) +
               (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0 AS ar,
             COUNT(*) OVER (PARTITION BY v) AS tn FROM base),
         a AS (SELECT COUNT(*) FILTER (WHERE grp = 'a') AS na,
             COUNT(*) FILTER (WHERE grp = 'b') AS nb,
             SUM(ar) FILTER (WHERE grp = 'a') AS rs,
             SUM(tn * tn - 1.0) AS ties FROM r)
         SELECT na AS n_a, nb AS n_b,
           ROUND(rs - na * (na + 1) / 2.0, 6) AS u_stat,
           ROUND((rs - na * (na + 1) / 2.0 - na * nb / 2.0) /
             SQRT(na * nb / 12.0 * ((na + nb + 1) -
               ties / ((na + nb) * (na + nb - 1.0)))), 6) AS z_stat,
           ROUND(1.0 - 2.0 * (rs - na * (na + 1) / 2.0) / (na * nb), 6)
             AS rank_biserial
         FROM a""",
    "q195_kruskal_wallis" ->
      """WITH base AS (SELECT event_type AS grp, CAST(value AS DOUBLE) AS v
           FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
         r AS (SELECT grp,
             rank() OVER (ORDER BY v) +
               (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0 AS ar,
             COUNT(*) OVER (PARTITION BY v) AS tn FROM base),
         g AS (SELECT grp, COUNT(*) AS ng, SUM(ar) AS rg,
             SUM(tn * tn - 1.0) AS tg FROM r GROUP BY grp),
         a AS (SELECT COUNT(*) AS k, CAST(SUM(ng) AS BIGINT) AS n,
             SUM(rg * rg / ng) AS s, SUM(tg) AS ties FROM g)
         SELECT k, n,
           ROUND(12.0 / (n * (n + 1)) * s - 3.0 * (n + 1), 6) AS h_stat,
           ROUND((12.0 / (n * (n + 1)) * s - 3.0 * (n + 1)) /
             (1.0 - ties / (CAST(n AS DOUBLE) * n * n - n)), 6)
             AS h_corrected
         FROM a""",
    "q196_anova_f" ->
      // exact cents lattice + B_g = (S_g²·10⁶) // n_g; one portable
      // double conversion (core/Lattice) — see StatTests.anovaF
      s"""WITH base AS (SELECT event_type AS grp,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS xc
           FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
         g AS (SELECT grp, CAST(COUNT(*) AS HUGEINT) AS ng,
             SUM(xc) AS sg, SUM(xc * xc) AS qg FROM base GROUP BY grp),
         gb AS (SELECT grp, ng, sg, qg,
             (sg * sg * 1000000) // ng AS bg FROM g),
         a AS (SELECT COUNT(*) AS k, SUM(ng) AS nD, SUM(sg) AS s,
             SUM(qg) AS q, SUM(bg) AS bsum FROM gb),
         sc AS (SELECT k, nD,
             GREATEST(bsum - ((s * s * 1000000) // nD),
               CAST(0 AS HUGEINT)) AS ssbS,
             GREATEST(q * 1000000 - bsum, CAST(0 AS HUGEINT)) AS sswS
           FROM a),
         d AS (SELECT k, nD,
             ${graft.core.Lattice.duckPortableDouble("ssbS")} / 1.0e10
               AS ssb,
             ${graft.core.Lattice.duckPortableDouble("sswS")} / 1.0e10
               AS ssw
           FROM sc)
         SELECT k, CAST(nD AS BIGINT) AS n,
           ROUND(ssb, 6) AS ss_between, ROUND(ssw, 6) AS ss_within,
           ROUND((ssb / (k - 1)) / (ssw / CAST(nD - k AS DOUBLE)), 6)
             AS f_stat
         FROM d""",
    "q197_spearman_corr" ->
      """WITH base AS (SELECT CAST(l_quantity AS DOUBLE) AS a,
             CAST(l_extendedprice AS DOUBLE) AS b
           FROM lineitem WHERE l_quantity IS NOT NULL
             AND l_extendedprice IS NOT NULL),
         r AS (SELECT
             rank() OVER (ORDER BY a) +
               (COUNT(*) OVER (PARTITION BY a) - 1) / 2.0 AS ra,
             rank() OVER (ORDER BY b) +
               (COUNT(*) OVER (PARTITION BY b) - 1) / 2.0 AS rb FROM base)
         SELECT ROUND(covar_pop(ra, rb) /
           (stddev_pop(ra) * stddev_pop(rb)), 6) AS spearman FROM r""",
    "q198_kendall_tau" ->
      """WITH cells AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
             CAST(l_linenumber AS DOUBLE) AS y, COUNT(*) AS c
           FROM lineitem WHERE l_quantity IS NOT NULL
             AND l_linenumber IS NOT NULL GROUP BY x, y),
         p AS (SELECT
             CAST(SUM(CASE WHEN c1.y < c2.y THEN c1.c * c2.c ELSE 0 END)
               AS BIGINT) AS conc,
             CAST(SUM(CASE WHEN c1.y > c2.y THEN c1.c * c2.c ELSE 0 END)
               AS BIGINT) AS disc
           FROM cells c1 JOIN cells c2 ON c1.x < c2.x),
         m AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS ncells
           FROM cells),
         tx AS (SELECT SUM(nx * (nx - 1) / 2) AS t
           FROM (SELECT SUM(c) AS nx FROM cells GROUP BY x)),
         ty AS (SELECT SUM(ny * (ny - 1) / 2) AS t
           FROM (SELECT SUM(c) AS ny FROM cells GROUP BY y))
         SELECT n, ncells AS n_cells, conc AS concordant, disc AS discordant,
           ROUND((conc - disc) / SQRT(
             (n * (n - 1) / 2.0 - tx.t) * (n * (n - 1) / 2.0 - ty.t)), 6)
             AS tau_b
         FROM p, m, tx, ty""",
    "q199_lift_table" ->
      """WITH d AS (SELECT value / 100 AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
           FROM events WHERE value IS NOT NULL AND NOT isnan(value / 100)),
         e AS (SELECT list_transform(quantile_cont(s,
             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
             x -> ROUND(x, 6)) AS ed FROM d),
         b AS (SELECT 1 +
             (CASE WHEN s > ed[1] THEN 1 ELSE 0 END) +
             (CASE WHEN s > ed[2] THEN 1 ELSE 0 END) +
             (CASE WHEN s > ed[3] THEN 1 ELSE 0 END) +
             (CASE WHEN s > ed[4] THEN 1 ELSE 0 END) +
             (CASE WHEN s > ed[5] THEN 1 ELSE 0 END) +
             (CASE WHEN s > ed[6] THEN 1 ELSE 0 END) +
             (CASE WHEN s > ed[7] THEN 1 ELSE 0 END) +
             (CASE WHEN s > ed[8] THEN 1 ELSE 0 END) +
             (CASE WHEN s > ed[9] THEN 1 ELSE 0 END) AS band, y
           FROM d, e),
         pb AS (SELECT band, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos
           FROM b GROUP BY band),
         t AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS tp,
             CAST(SUM(n) AS BIGINT) AS tnn FROM pb)
         SELECT band, n, n_pos,
           ROUND(n_pos / CAST(n AS DOUBLE), 6) AS pos_rate,
           ROUND(SUM(n_pos) OVER (ORDER BY band DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / CAST(tp AS DOUBLE), 6) AS cum_capture,
           ROUND((n_pos / CAST(n AS DOUBLE)) /
             (tp / CAST(tnn AS DOUBLE)), 6) AS lift
         FROM pb, t""",
    "q200_acf" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM events WHERE value IS NOT NULL GROUP BY day),
         m AS (SELECT AVG(total) AS mm, SUM(total * total) AS ss,
             COUNT(*) AS nn FROM d),
         l AS (SELECT total AS x,
             lag(total, 1) OVER (ORDER BY day) AS x1,
             lag(total, 2) OVER (ORDER BY day) AS x2,
             lag(total, 3) OVER (ORDER BY day) AS x3,
             lag(total, 4) OVER (ORDER BY day) AS x4,
             lag(total, 5) OVER (ORDER BY day) AS x5,
             lag(total, 6) OVER (ORDER BY day) AS x6,
             lag(total, 7) OVER (ORDER BY day) AS x7
           FROM d),
         u AS (SELECT 1 AS lag, x, x1 AS xk FROM l
           UNION ALL SELECT 2, x, x2 FROM l
           UNION ALL SELECT 3, x, x3 FROM l
           UNION ALL SELECT 4, x, x4 FROM l
           UNION ALL SELECT 5, x, x5 FROM l
           UNION ALL SELECT 6, x, x6 FROM l
           UNION ALL SELECT 7, x, x7 FROM l)
         SELECT lag, COUNT(xk) AS n_pairs,
           ROUND(SUM((x - mm) * (xk - mm)) /
             ANY_VALUE(ss - nn * mm * mm), 6) AS acf
         FROM u, m GROUP BY lag""",
    "q201_cusum" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS mean
           FROM events WHERE value IS NOT NULL GROUP BY day),
         g AS (SELECT AVG(mean) AS gm FROM d),
         c AS (SELECT day, mean,
             ROUND(SUM(mean - gm) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
               AS cusum
           FROM d, g),
         pk AS (SELECT MAX(ABS(cusum)) AS p FROM c)
         SELECT CAST(day AS TIMESTAMP) AS day, ROUND(mean, 6) AS mean, cusum,
           ABS(cusum) = pk.p AS is_peak
         FROM c, pk""",
    "q202_forecast_eval" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM events WHERE value IS NOT NULL GROUP BY day),
         l AS (SELECT total,
             lag(total, 7) OVER (ORDER BY day) AS fs,
             lag(total, 1) OVER (ORDER BY day) AS f1
           FROM d)
         SELECT COUNT(*) AS n_eval,
           ROUND(AVG(ABS(total - fs)), 6) AS mae_seasonal,
           ROUND(AVG(ABS(total - f1)), 6) AS mae_naive,
           ROUND(AVG(ABS(total - fs)) / AVG(ABS(total - f1)), 6) AS mase
         FROM l WHERE fs IS NOT NULL AND f1 IS NOT NULL""",
    "q203_theil_sen" ->
      """WITH d AS (SELECT
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS DOUBLE) AS x,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
           FROM events WHERE value IS NOT NULL GROUP BY CAST(ts AS DATE)),
         s AS (SELECT (p2.y - p1.y) / (p2.x - p1.x) AS sl
           FROM d p1 JOIN d p2 ON p1.x < p2.x),
         sm AS (SELECT COUNT(*) AS n_pairs, quantile_cont(sl, 0.5) AS msl
           FROM s)
         SELECT (SELECT COUNT(*) FROM d) AS n_days, n_pairs,
           ROUND(msl, 6) AS slope_per_day,
           ROUND((SELECT quantile_cont(y - sm.msl * x, 0.5) FROM d), 6)
             AS intercept
         FROM sm""",
    "q204_ecod_outliers" ->
      """WITH long AS (
           SELECT l_orderkey * 8 + l_linenumber AS rid, 'q' AS f,
             CAST(l_quantity AS DOUBLE) AS v FROM lineitem
             WHERE l_quantity IS NOT NULL
           UNION ALL SELECT l_orderkey * 8 + l_linenumber, 'p',
             CAST(l_extendedprice AS DOUBLE) FROM lineitem
             WHERE l_extendedprice IS NOT NULL
           UNION ALL SELECT l_orderkey * 8 + l_linenumber, 'd',
             CAST(l_discount AS DOUBLE) FROM lineitem
             WHERE l_discount IS NOT NULL),
         r AS (SELECT rid, f, v,
             COUNT(*) OVER (PARTITION BY f ORDER BY v
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS leq,
             COUNT(*) OVER (PARTITION BY f) AS nf,
             COUNT(*) OVER (PARTITION BY f, v) AS t
           FROM long),
         sc AS (SELECT rid, ROUND(SUM(-LN(LEAST(
             leq / CAST(nf AS DOUBLE),
             (nf - leq + t) / CAST(nf AS DOUBLE)))), 6) AS ecod_score
           FROM r GROUP BY rid)
         SELECT rid, ecod_score FROM sc
         ORDER BY ecod_score DESC, rid LIMIT 20""",
    "q205_link_prediction" -> graft.proximity.Graph.linkPredictionOracleSql(
      proximityEdgesSql),
    "q206_profile_compare" -> profileCompareSql,
    "q207_key_candidates" ->
      """WITH a AS (SELECT COUNT(*) AS rows_,
             COUNT(DISTINCT o_orderkey) AS d1,
             CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n1,
             COUNT(DISTINCT o_custkey) AS d2,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n2,
             COUNT(DISTINCT o_orderstatus) AS d3,
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n3
           FROM orders)
         SELECT 'o_orderkey' AS column_name, rows_ AS n_rows, d1 AS n_distinct,
           n1 AS n_null, (n1 = 0 AND d1 = rows_) AS is_key FROM a
         UNION ALL SELECT 'o_custkey', rows_, d2, n2,
           (n2 = 0 AND d2 = rows_) FROM a
         UNION ALL SELECT 'o_orderstatus', rows_, d3, n3,
           (n3 = 0 AND d3 = rows_) FROM a""",
    "q208_functional_deps" ->
      """SELECT 'o_orderkey' AS lhs, 'o_custkey' AS rhs,
           COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) = 0
             AS holds
         FROM (SELECT COUNT(DISTINCT o_custkey) AS d FROM orders
           GROUP BY o_orderkey)
         UNION ALL
         SELECT 'o_custkey', 'o_orderstatus', COUNT(*),
           CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) = 0
         FROM (SELECT COUNT(DISTINCT o_orderstatus) AS d FROM orders
           GROUP BY o_custkey)
         UNION ALL
         SELECT 'o_orderstatus', 'o_orderpriority', COUNT(*),
           CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) = 0
         FROM (SELECT COUNT(DISTINCT o_orderpriority) AS d FROM orders
           GROUP BY o_orderstatus)""",
    "q209_ewma" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM events WHERE value IS NOT NULL GROUP BY day),
         r AS (SELECT day, total,
             row_number() OVER (ORDER BY day) AS rn FROM d)
         SELECT CAST(r.day AS TIMESTAMP) AS day, r.total,
           ROUND(SUM(POW(0.7, r.rn - p.rn) * p.total) /
             SUM(POW(0.7, r.rn - p.rn)), 6) AS ewma
         FROM r JOIN r p ON p.rn <= r.rn
         GROUP BY r.day, r.total""",
    "q210_distinctive_terms" ->
      """WITH tok AS (SELECT source,
             unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0)) AS term
           FROM documents),
         ps AS (SELECT source, term, COUNT(*) AS y_sw
           FROM tok GROUP BY source, term),
         pt AS (SELECT term, CAST(SUM(y_sw) AS BIGINT) AS y_w
           FROM ps GROUP BY term),
         tt AS (SELECT source, CAST(SUM(y_sw) AS BIGINT) AS n_s
           FROM ps GROUP BY source),
         cc AS (SELECT CAST(SUM(y_sw) AS BIGINT) AS n,
             COUNT(DISTINCT term) AS v FROM ps),
         sc AS (SELECT ps.source, ps.term, ps.y_sw,
             pt.y_w - ps.y_sw AS yr,
             LN((ps.y_sw + 0.5) /
                (tt.n_s + cc.v * 0.5 - ps.y_sw - 0.5)) -
             LN((pt.y_w - ps.y_sw + 0.5) /
                (cc.n - tt.n_s + cc.v * 0.5 - (pt.y_w - ps.y_sw) - 0.5))
               AS lo
           FROM ps JOIN pt USING (term) JOIN tt USING (source), cc),
         zz AS (SELECT source, term, y_sw, yr, lo,
             ROUND(lo / SQRT(1.0 / (y_sw + 0.5) + 1.0 / (yr + 0.5)), 6)
               AS z
           FROM sc WHERE y_sw >= 5)
         SELECT source, term, y_sw AS n_source, yr AS n_rest,
           ROUND(lo, 6) AS log_odds, z
         FROM zz
         QUALIFY row_number() OVER (PARTITION BY source
           ORDER BY z DESC, term) <= 5""",
    "q211_clustering_coeff" ->
      graft.proximity.Graph.clusteringCoefficientOracleSql(proximityEdgesSql),
    "q212_conversion_latency" ->
      """WITH st AS (SELECT user_id, MIN(epoch_us(ts)) AS t0
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
         cv AS (SELECT st.user_id, st.t0,
             MIN(CASE WHEN epoch_us(e.ts) > st.t0
               THEN epoch_us(e.ts) END) AS tc
           FROM st LEFT JOIN events e
             ON e.user_id = st.user_id AND e.event_type = 'purchase'
           GROUP BY st.user_id, st.t0),
         d AS (SELECT (tc - t0) / 86400000000.0 AS days FROM cv)
         SELECT COUNT(*) AS n_started, COUNT(days) AS n_converted,
           ROUND(COUNT(days) / CAST(COUNT(*) AS DOUBLE), 6)
             AS conversion_rate,
           ROUND(AVG(days), 6) AS mean_days,
           ROUND(quantile_cont(days, 0.25), 6) AS p25_days,
           ROUND(quantile_cont(days, 0.5), 6) AS p50_days,
           ROUND(quantile_cont(days, 0.75), 6) AS p75_days
         FROM d""",
    "q213_salted_join" ->
      """WITH dim AS (SELECT user_id, COUNT(*) AS user_events
           FROM events GROUP BY user_id)
         SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
           CAST(SUM(user_events) AS BIGINT) AS user_events_sum
         FROM events JOIN dim USING (user_id)
         GROUP BY event_type""",
    "q214_readability" ->
      """WITH d AS (SELECT source,
             GREATEST(len(list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0)), 1) AS w,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS snt,
             GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
               AS syl
           FROM documents WHERE text IS NOT NULL)
         SELECT source, COUNT(*) AS n_docs,
           ROUND(AVG(CAST(w AS DOUBLE) / snt), 6)
             AS mean_words_per_sentence,
           ROUND(AVG(CAST(syl AS DOUBLE) / w), 6)
             AS mean_syllables_per_word,
           ROUND(AVG(206.835 - 1.015 * (CAST(w AS DOUBLE) / snt) -
             84.6 * (CAST(syl AS DOUBLE) / w)), 6) AS mean_reading_ease,
           ROUND(MIN(206.835 - 1.015 * (CAST(w AS DOUBLE) / snt) -
             84.6 * (CAST(syl AS DOUBLE) / w)), 6) AS min_reading_ease
         FROM d GROUP BY source""",
    "q215_info_gain" -> infoGainSql,
    "q216_purged_folds" ->
      // rank-based cuts — the q186 formulation plus the 1-day embargo
      """WITH base AS (SELECT epoch_us(ts) AS us FROM events),
         nn AS (SELECT COUNT(*) AS n FROM base),
         cum AS MATERIALIZED (SELECT us, SUM(c) OVER (ORDER BY us) AS cm
           FROM (SELECT us, COUNT(*) AS c FROM base GROUP BY us)),
         cutv AS (SELECT i, (SELECT MIN(us) FROM cum
             WHERE cm >= GREATEST(1, (SELECT n FROM nn) * i // 5)) AS v
           FROM (SELECT UNNEST(range(1, 6)) AS i))
         SELECT CAST(a.i - 1 AS INT) AS fold, a.v AS train_end_us,
           b.v AS valid_end_us,
           (SELECT COUNT(*) FROM base
              WHERE us < a.v - 86400000000) AS n_train,
           (SELECT COUNT(*) FROM base
              WHERE us >= a.v - 86400000000 AND us < a.v) AS n_embargoed,
           (SELECT COUNT(*) FROM base
              WHERE us >= a.v AND us < b.v) AS n_valid
         FROM cutv a JOIN cutv b ON b.i = a.i + 1
         WHERE a.i <= 4 ORDER BY fold""",
    "q217_mahalanobis" ->
      """WITH base AS (SELECT l_orderkey * 8 + l_linenumber AS rid,
             CAST(l_quantity AS DOUBLE) AS x,
             CAST(l_extendedprice AS DOUBLE) AS y
           FROM lineitem WHERE l_quantity IS NOT NULL
             AND l_extendedprice IS NOT NULL),
         m AS (SELECT AVG(x) AS mx, AVG(y) AS my, var_pop(x) AS vx,
             var_pop(y) AS vy, covar_pop(x, y) AS cxy FROM base)
         SELECT rid, ROUND(
           ((x - mx) * (x - mx) * vy -
            2.0 * (x - mx) * (y - my) * cxy +
            (y - my) * (y - my) * vx) / (vx * vy - cxy * cxy), 6)
           AS mahalanobis_sq
         FROM base, m ORDER BY mahalanobis_sq DESC, rid LIMIT 20""",
    "q218_seasonal_decompose" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS mean
           FROM events WHERE value IS NOT NULL GROUP BY day),
         t AS (SELECT day, mean, dayofweek(day) + 1 AS dow,
             CASE WHEN COUNT(*) OVER w = 7 THEN AVG(mean) OVER w END
               AS trend
           FROM d WINDOW w AS (ORDER BY day
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         s AS (SELECT dow, AVG(mean - trend) AS seas
           FROM t WHERE trend IS NOT NULL GROUP BY dow)
         SELECT CAST(day AS TIMESTAMP) AS day, ROUND(mean, 6) AS mean,
           ROUND(trend, 6) AS trend, ROUND(seas, 6) AS seasonal,
           ROUND(mean - trend - seas, 6) AS residual
         FROM t LEFT JOIN s USING (dow)""",
    "q219_sprt" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS trials,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS successes
           FROM events GROUP BY day),
         l AS (SELECT day, trials, successes,
             successes * LN(0.22 / 0.18) +
               (trials - successes) * LN(0.78 / 0.82) AS llr FROM d),
         c AS (SELECT day, trials, successes, ROUND(llr, 6) AS llr,
             ROUND(SUM(llr) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
               AS cum_llr
           FROM l)
         SELECT CAST(day AS TIMESTAMP) AS day, trials, successes, llr,
           cum_llr,
           CASE WHEN cum_llr > LN(19.0) THEN 'accept_h1'
             WHEN cum_llr < -LN(19.0) THEN 'accept_h0'
             ELSE 'continue' END AS decision
         FROM c""",
    "q220_power_mde" ->
      """WITH g AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END
             AS grp, CAST(value AS DOUBLE) AS v
           FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
         a AS (SELECT COUNT(*) FILTER (WHERE grp = 'a') AS na,
             COUNT(*) FILTER (WHERE grp = 'b') AS nb,
             AVG(v) FILTER (WHERE grp = 'a') AS ma,
             var_samp(v) FILTER (WHERE grp = 'a') AS va,
             var_samp(v) FILTER (WHERE grp = 'b') AS vb FROM g)
         SELECT na AS n_a, nb AS n_b, ROUND(ma, 6) AS mean_a,
           ROUND(SQRT(va / na + vb / nb), 6) AS se_diff,
           ROUND(2.801585 * SQRT(va / na + vb / nb), 6) AS mde_abs,
           ROUND(2.801585 * SQRT(va / na + vb / nb) / ma, 6) AS mde_rel
         FROM a""",
    "q221_embedding_decontamination" ->
      """WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         b AS (SELECT vec_id AS bid, v FROM e WHERE vec_id < 100),
         c AS (SELECT vec_id, v FROM e WHERE vec_id >= 100),
         sims AS (SELECT c.vec_id, b.bid,
             ROUND(list_cosine_similarity(c.v, b.v), 6) AS s
           FROM c CROSS JOIN b),
         best AS (SELECT vec_id, bid, s FROM sims
           QUALIFY row_number() OVER (PARTITION BY vec_id
             ORDER BY s DESC, bid DESC) = 1)
         SELECT vec_id, bid AS bench_id, s AS similarity
         FROM best WHERE s >= 0.35""",
    "q222_snapshot_diff" ->
      """WITH b AS (SELECT o_orderkey AS k, o_totalprice, o_orderstatus
           FROM orders WHERE o_orderkey % 89 != 0),
         u AS (SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * 2
               ELSE o_totalprice END AS o_totalprice, o_orderstatus
           FROM orders WHERE o_orderkey % 97 != 0),
         j AS (SELECT b.k IS NOT NULL AS inb, u.k IS NOT NULL AS inu,
             b.o_totalprice AS bp, u.o_totalprice AS up,
             b.o_orderstatus AS bs, u.o_orderstatus AS us
           FROM b FULL OUTER JOIN u ON b.k = u.k)
         SELECT 'added' AS metric, CAST(SUM(CASE WHEN NOT inb THEN 1
           ELSE 0 END) AS BIGINT) AS n FROM j
         UNION ALL SELECT 'removed', CAST(SUM(CASE WHEN NOT inu THEN 1
           ELSE 0 END) AS BIGINT) FROM j
         UNION ALL SELECT 'changed', CAST(SUM(CASE WHEN inb AND inu AND
           (bp IS DISTINCT FROM up OR bs IS DISTINCT FROM us) THEN 1
           ELSE 0 END) AS BIGINT) FROM j
         UNION ALL SELECT 'unchanged', CAST(SUM(CASE WHEN inb AND inu
           AND NOT (bp IS DISTINCT FROM up OR bs IS DISTINCT FROM us)
           THEN 1 ELSE 0 END) AS BIGINT) FROM j
         UNION ALL SELECT 'changed_o_totalprice', CAST(SUM(CASE WHEN inb
           AND inu AND bp IS DISTINCT FROM up THEN 1 ELSE 0 END)
           AS BIGINT) FROM j
         UNION ALL SELECT 'changed_o_orderstatus', CAST(SUM(CASE WHEN
           inb AND inu AND bs IS DISTINCT FROM us THEN 1 ELSE 0 END)
           AS BIGINT) FROM j""",
    "q223_ucb_allocation" ->
      """WITH arms AS (SELECT event_type AS arm, COUNT(*) AS n,
             AVG(value) AS m
           FROM events WHERE value IS NOT NULL GROUP BY event_type),
         t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM arms)
         SELECT arm, n, ROUND(m, 6) AS mean_reward,
           ROUND(m + SQRT(2.0 * LN(nt) / n), 6) AS ucb,
           CAST(row_number() OVER (ORDER BY
             ROUND(m + SQRT(2.0 * LN(nt) / n), 6) DESC, arm) AS INT)
             AS rank
         FROM arms, t""",
    "q224_pairwise_bh" ->
      """WITH base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
           FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
         s AS (SELECT g, COUNT(*) AS n, AVG(v) AS m, var_samp(v) AS var
           FROM base GROUP BY g),
         pairs AS (SELECT a.g AS group_a, b.g AS group_b,
             (a.m - b.m) / SQRT(a.var / a.n + b.var / b.n) AS z
           FROM s a JOIN s b ON a.g < b.g),
         wp0 AS (SELECT group_a, group_b, z,
             1.0 / (1.0 + 0.2316419 * ABS(z)) AS kk FROM pairs),
         wp AS (SELECT group_a, group_b, ROUND(z, 6) AS z_stat,
             ROUND(2.0 * (0.3989422804014327 *
               EXP(-0.5 * ABS(z) * ABS(z)) *
               (kk * (0.319381530 + kk * (-0.356563782 +
                 kk * (1.781477937 + kk * (-1.821255978 +
                   kk * 1.330274429)))))), 6) AS p_value
           FROM wp0),
         rk AS (SELECT *, CAST(row_number() OVER (ORDER BY p_value,
             group_a, group_b) AS INT) AS bh_rank FROM wp
           WHERE p_value IS NOT NULL),
         mm AS (SELECT COUNT(*) * (COUNT(*) - 1) / 2 AS m FROM s),
         th AS (SELECT rk.*, ROUND(0.05 * bh_rank / mm.m, 6)
             AS bh_threshold FROM rk, mm),
         cr AS (SELECT MAX(CASE WHEN p_value <= bh_threshold
             THEN bh_rank END) AS c FROM th)
         SELECT group_a, group_b, z_stat, p_value, bh_rank, bh_threshold,
           COALESCE(bh_rank <= cr.c, FALSE) AS significant
         FROM th, cr""",
    "q225_neyman_allocation" ->
      """WITH s AS (SELECT event_type AS stratum, COUNT(*) AS n_rows,
             COALESCE(stddev_samp(CAST(value AS DOUBLE)), 0) AS sd
           FROM events WHERE value IS NOT NULL AND NOT isnan(value)
           GROUP BY event_type),
         t AS (SELECT SUM(n_rows * sd) AS tt FROM s)
         SELECT stratum, n_rows, ROUND(sd, 6) AS sigma,
           ROUND(n_rows * sd / tt, 6) AS weight,
           CAST(ROUND(1000.0 * (n_rows * sd / tt), 0) AS BIGINT)
             AS n_alloc
         FROM s, t""",
    "q226_corr_significance" -> corrSignificanceSql,
    "q234_skyline" ->
      """SELECT a.p_partkey, a.p_size, a.p_retailprice FROM part a
         WHERE a.p_size IS NOT NULL AND a.p_retailprice IS NOT NULL
           AND NOT EXISTS (SELECT 1 FROM part b
             WHERE b.p_size IS NOT NULL AND b.p_retailprice IS NOT NULL
               AND b.p_size >= a.p_size
               AND b.p_retailprice <= a.p_retailprice
               AND (b.p_size > a.p_size
                 OR b.p_retailprice < a.p_retailprice))""",
    "q235_sequence_neighbors" ->
      """WITH seqs AS (SELECT user_id AS entity, COUNT(*) AS n_events,
             string_agg(substr(event_type, 1, 1), ''
               ORDER BY epoch_us(ts), event_id) AS seq
           FROM events GROUP BY user_id),
         probe AS (SELECT entity, seq FROM seqs
           ORDER BY n_events DESC, entity LIMIT 1)
         SELECT s.entity, CAST(length(s.seq) AS INT) AS seq_len,
           CAST(levenshtein(s.seq, probe.seq) AS INT) AS distance
         FROM seqs s, probe WHERE s.entity != probe.entity
         ORDER BY distance, s.entity LIMIT 10""",
    "q236_ppjoin_exact" ->
      """WITH docs AS (SELECT doc_id,
             list_distinct(list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0)) AS w
           FROM documents WHERE doc_id < 500),
         d AS (SELECT doc_id, w FROM docs WHERE len(w) > 0),
         tok AS (SELECT doc_id, unnest(w) AS t FROM d),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
         common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             COUNT(*) AS c
           FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id)
         SELECT id_a, id_b,
           ROUND(c / CAST(sa.sz + sb.sz - c AS DOUBLE), 6) AS jaccard
         FROM common
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b
         WHERE ROUND(c / CAST(sa.sz + sb.sz - c AS DOUBLE), 6) >= 0.85""",
    "q237_impute" ->
      """WITH d AS (SELECT event_id,
             CASE WHEN event_id % 37 = 0 THEN NULL
               WHEN event_id % 41 = 0 THEN CAST('inf' AS DOUBLE)
               ELSE value END AS v
           FROM events),
         c AS (SELECT event_id, v,
             CASE WHEN v IS NULL OR isnan(v) OR isinf(v) THEN NULL
               ELSE v END AS vc
           FROM d),
         m AS (SELECT COALESCE(quantile_cont(vc, 0.5), 0) AS med FROM c)
         SELECT event_id, COALESCE(vc, ROUND(med, 6)) AS value,
           CASE WHEN v IS NULL OR isnan(v) THEN 'nan'
             WHEN isinf(v) THEN 'inf' ELSE '' END AS feature_quality_tags
         FROM c, m""",
    "q238_zorder_key" -> {
      // 8-bit 2-dim Morton interleave, unrolled to 16 shift/mask terms —
      // mirrors ZOrder.morton's static unroll so the oracle is the same
      // integer expression the codegen projection runs
      val terms = (for { j <- 0 until 8; d <- 1 to 2 } yield
        s"(((b$d >> $j) & 1) << ${j * 2 + d - 1})").mkString(" | ")
      s"""WITH m AS (SELECT CAST(MIN(p_size) AS DOUBLE) AS lo1,
             CAST(MAX(p_size) AS DOUBLE) AS hi1,
             CAST(MIN(p_retailprice) AS DOUBLE) AS lo2,
             CAST(MAX(p_retailprice) AS DOUBLE) AS hi2 FROM part),
         b AS (SELECT p_partkey,
             CAST(LEAST(255, GREATEST(0, CAST(FLOOR(
               (CAST(p_size AS DOUBLE) - lo1) / ((hi1 - lo1) / 256.0))
               AS BIGINT))) AS BIGINT) AS b1,
             CAST(LEAST(255, GREATEST(0, CAST(FLOOR(
               (CAST(p_retailprice AS DOUBLE) - lo2) / ((hi2 - lo2) / 256.0))
               AS BIGINT))) AS BIGINT) AS b2
           FROM part, m)
         SELECT p_partkey, CAST($terms AS BIGINT) AS zkey FROM b"""
    },
    "q240_pruned_read" ->
      """SELECT p_partkey, p_size, p_retailprice FROM part
         WHERE p_retailprice >= 905.0 AND p_retailprice <= 915.0""",
    "q241_cdc_merge" ->
      """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS price,
             o_orderstatus AS status FROM orders),
         base AS (SELECT * FROM o WHERE k % 4 <> 0),
         ch AS (SELECT k, 'U' AS op, 1 AS seq, price * 2 AS price, status
             FROM o WHERE k % 3 = 0
           UNION ALL SELECT k, 'D', 2, price, status FROM o WHERE k % 5 = 0
           UNION ALL SELECT k, 'I', 3, price + 10, status
             FROM o WHERE k % 7 = 0),
         latest AS (SELECT * FROM ch QUALIFY row_number() OVER (
             PARTITION BY k ORDER BY seq DESC,
             CASE op WHEN 'I' THEN 3 WHEN 'U' THEN 2 ELSE 1 END DESC) = 1)
         SELECT k, price, status FROM base
           WHERE k NOT IN (SELECT k FROM latest)
         UNION ALL
         SELECT k, price, status FROM latest WHERE op <> 'D'""",
    "q242_time_decay_attribution" ->
      """WITH conv AS (SELECT user_id AS u, event_id AS cid,
             epoch_us(ts) AS cts FROM events WHERE event_type = 'purchase'),
         touch AS (SELECT user_id AS u, event_type AS t,
             epoch_us(ts) AS tts FROM events
           WHERE event_type IN ('click', 'signup')),
         paired AS (SELECT c.cid, t.t,
             CAST(FLOOR((c.cts - t.tts) / 86400000000.0 / 7) AS INT) AS k
           FROM conv c JOIN touch t ON c.u = t.u
           WHERE t.tts < c.cts AND t.tts >= c.cts - 2592000000000),
         wtd AS (SELECT cid, t, CAST(CASE k WHEN 0 THEN 1.0 WHEN 1 THEN 0.5
             WHEN 2 THEN 0.25 WHEN 3 THEN 0.125 ELSE 0.0625 END AS DOUBLE)
             AS w FROM paired),
         nrm AS (SELECT cid, SUM(w) AS wsum FROM wtd GROUP BY cid),
         cr AS (SELECT w1.t, CAST(w1.w / n.wsum AS DECIMAL(28,18)) AS credit,
             w1.cid FROM wtd w1 JOIN nrm n USING (cid)
           UNION ALL
           SELECT '(none)', CAST(1.0 AS DECIMAL(28,18)), c.cid FROM conv c
             WHERE c.cid NOT IN (SELECT cid FROM wtd))
         SELECT t AS touch_type,
           ROUND(CAST(SUM(credit) AS DOUBLE), 6) AS credits,
           COUNT(DISTINCT cid) AS n_conversions
         FROM cr GROUP BY t""",
    "q243_personalized_pagerank" ->
      graft.proximity.Graph.personalizedPageRankOracleSql(
        proximityEdgesSql,
        "SELECT vec_id AS id FROM embeddings WHERE vec_id < 10",
        iters = 5, damping = 0.85),
    "q244_jaro_winkler" ->
      """SELECT a.p_partkey,
           ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS name_jw
         FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1""",
    "q245_journey_ngrams" ->
      """WITH s AS (SELECT event_type AS step_1,
             lead(event_type, 1) OVER w AS step_2,
             lead(event_type, 2) OVER w AS step_3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT step_1, step_2, step_3, COUNT(*) AS n_occurrences
         FROM s WHERE step_3 IS NOT NULL
         GROUP BY 1, 2, 3 HAVING COUNT(*) >= 5""",
    "q246_fairness_report" ->
      """WITH d AS (SELECT user_id % 3 AS segment,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CAST(value > 50 AS INT) AS pred
           FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
         per AS (SELECT segment, COUNT(*) AS n, SUM(pred) AS np,
             SUM(y) AS pos, SUM(pred * y) AS tp,
             SUM(pred * (1 - y)) AS fp
           FROM d GROUP BY segment),
         g AS (SELECT
             ROUND(CAST(SUM(pred) AS DOUBLE) / COUNT(*), 6) AS gar,
             ROUND(CAST(SUM(pred * y) AS DOUBLE) / NULLIF(SUM(y), 0), 6)
               AS gtpr,
             ROUND(CAST(SUM(pred * (1 - y)) AS DOUBLE)
               / NULLIF(COUNT(*) - SUM(y), 0), 6) AS gfpr
           FROM d)
         SELECT segment, n,
           ROUND(CAST(np AS DOUBLE) / n, 6) AS acceptance_rate,
           ROUND(CAST(tp AS DOUBLE) / NULLIF(pos, 0), 6) AS tpr,
           ROUND(CAST(fp AS DOUBLE) / NULLIF(n - pos, 0), 6) AS fpr,
           ROUND(ROUND(CAST(np AS DOUBLE) / n, 6) - g.gar, 6) AS parity_gap,
           ROUND(ROUND(CAST(tp AS DOUBLE) / NULLIF(pos, 0), 6) - g.gtpr, 6)
             AS tpr_gap,
           ROUND(ROUND(CAST(fp AS DOUBLE) / NULLIF(n - pos, 0), 6) - g.gfpr, 6)
             AS fpr_gap
         FROM per, g""",
    "q247_rolling_corr" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS DOUBLE) AS x,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS y
           FROM events WHERE value IS NOT NULL GROUP BY day),
         r AS (SELECT day, COUNT(*) OVER w AS n_days, x, y,
             SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
             SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy,
             SUM(x * y) OVER w AS sxy
           FROM d WINDOW w AS (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
         SELECT day, n_days, x, y,
           ROUND((n_days * sxy - sx * sy) / NULLIF(SQRT(
             GREATEST(0.0, n_days * sxx - sx * sx) *
             GREATEST(0.0, n_days * syy - sy * sy)), 0), 6) AS corr
         FROM r""",
    "q248_oof_target_encoding" ->
      """WITH d AS (SELECT event_id, event_type AS cat, user_id % 4 AS fold,
             CAST(value AS DECIMAL(18,2)) AS t
           FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
         cf AS (SELECT cat, fold, COUNT(t) AS nf, SUM(t) AS sf
           FROM d GROUP BY cat, fold),
         ct AS (SELECT cat, SUM(nf) AS nc, SUM(sf) AS sc
           FROM cf GROUP BY cat),
         fl AS (SELECT fold, SUM(nf) AS ngf, SUM(sf) AS sgf
           FROM cf GROUP BY fold),
         tot AS (SELECT SUM(nf) AS ng, SUM(sf) AS sg FROM cf),
         gm AS (SELECT fold, CAST(sg - sgf AS DOUBLE) / (ng - ngf) AS gmo
           FROM fl, tot),
         enc AS (SELECT cf.cat, cf.fold,
             ROUND((CAST(ct.sc - cf.sf AS DOUBLE) + 20 * gm.gmo)
               / (ct.nc - cf.nf + 20), 6) AS te_oof
           FROM cf JOIN ct USING (cat) JOIN gm USING (fold))
         SELECT d.event_id, d.cat, d.fold, enc.te_oof
         FROM d JOIN enc USING (cat, fold)""",
    "q249_markov_attribution" ->
      graft.operators.MarkovAttribution.removalEffectOracleSql(
        "user_id", "ts", "event_type", "event_id", "purchase", steps = 12),
    "q250_privacy_audit" ->
      """WITH cls AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
             COUNT(DISTINCT c_acctbal) AS l
           FROM customer GROUP BY 1, 2),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
             CAST(SUM(n) AS BIGINT) AS rows_,
             CAST(MIN(l) AS BIGINT) AS min_l FROM cls)
         SELECT ks.k, tot.n_classes,
           CAST(SUM(CASE WHEN cls.n < ks.k THEN 1 ELSE 0 END) AS BIGINT)
             AS classes_below,
           CAST(SUM(CASE WHEN cls.n < ks.k THEN cls.n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           ROUND(CAST(SUM(CASE WHEN cls.n < ks.k THEN cls.n ELSE 0 END)
             AS DOUBLE) / tot.rows_, 6) AS risk_frac,
           tot.min_l AS min_l_diversity
         FROM (VALUES (5), (10), (20)) ks(k) CROSS JOIN cls CROSS JOIN tot
         GROUP BY ks.k, tot.n_classes, tot.rows_, tot.min_l
         ORDER BY ks.k""",
    "q251_cuped" ->
      """WITH e AS (SELECT user_id AS u,
             CAST(value AS DECIMAL(18,2)) AS dv,
             ts < TIMESTAMP '2024-01-15 00:00:00' AS pre
           FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
         units AS (SELECT u,
             COALESCE(SUM(CASE WHEN pre THEN dv END),
               CAST(0 AS DECIMAL(18,2))) AS x,
             COALESCE(SUM(CASE WHEN NOT pre THEN dv END),
               CAST(0 AS DECIMAL(18,2))) AS y,
             u % 2 AS v
           FROM e GROUP BY u),
         g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(x * y) AS DOUBLE) AS sxy
           FROM units),
         th AS (SELECT
             CASE WHEN n = 0 OR (n * sxx - sx * sx) = 0 THEN 0.0
               ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS theta,
             CASE WHEN n = 0 THEN 0.0 ELSE sx / n END AS meanx
           FROM g),
         pv AS (SELECT v AS variant, COUNT(*) AS n_units,
             CAST(COUNT(*) AS DOUBLE) AS nn,
             CAST(SUM(x) AS DOUBLE) AS vsx, CAST(SUM(y) AS DOUBLE) AS vsy,
             CAST(SUM(x * x) AS DOUBLE) AS vsxx,
             CAST(SUM(y * y) AS DOUBLE) AS vsyy,
             CAST(SUM(x * y) AS DOUBLE) AS vsxy
           FROM units GROUP BY v)
         SELECT variant, n_units,
           ROUND(vsy / nn, 6) AS mean_y,
           ROUND(vsy / nn - th.theta * (vsx / nn - th.meanx), 6)
             AS mean_y_cuped,
           ROUND((vsyy - vsy * vsy / nn) / (nn - 1), 6) AS var_y,
           ROUND((vsyy - vsy * vsy / nn) / (nn - 1)
             - (2 * th.theta) * ((vsxy - vsx * vsy / nn) / (nn - 1))
             + (th.theta * th.theta) * ((vsxx - vsx * vsx / nn) / (nn - 1)),
             6) AS var_y_cuped,
           ROUND(th.theta, 6) AS theta,
           ROUND(1.0 - ((vsyy - vsy * vsy / nn) / (nn - 1)
             - (2 * th.theta) * ((vsxy - vsx * vsy / nn) / (nn - 1))
             + (th.theta * th.theta) * ((vsxx - vsx * vsx / nn) / (nn - 1)))
             / ((vsyy - vsy * vsy / nn) / (nn - 1)), 6) AS var_reduction
         FROM pv CROSS JOIN th ORDER BY variant""",
    "q252_diff_in_diff" ->
      """WITH e AS (SELECT CAST(user_id % 2 = 1 AS INT) AS t,
             CAST(ts >= TIMESTAMP '2024-01-15 00:00:00' AS INT) AS p,
             CAST(value AS DECIMAL(18,2)) AS y
           FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
         m AS (SELECT
             CAST(SUM(CASE WHEN t = 0 AND p = 0 THEN 1 END) AS DOUBLE) AS n00,
             CAST(SUM(CASE WHEN t = 0 AND p = 1 THEN 1 END) AS DOUBLE) AS n01,
             CAST(SUM(CASE WHEN t = 1 AND p = 0 THEN 1 END) AS DOUBLE) AS n10,
             CAST(SUM(CASE WHEN t = 1 AND p = 1 THEN 1 END) AS DOUBLE) AS n11,
             CAST(SUM(CASE WHEN t = 0 AND p = 0 THEN y END) AS DOUBLE) AS s00,
             CAST(SUM(CASE WHEN t = 0 AND p = 1 THEN y END) AS DOUBLE) AS s01,
             CAST(SUM(CASE WHEN t = 1 AND p = 0 THEN y END) AS DOUBLE) AS s10,
             CAST(SUM(CASE WHEN t = 1 AND p = 1 THEN y END) AS DOUBLE) AS s11,
             CAST(SUM(CASE WHEN t = 0 AND p = 0 THEN y * y END) AS DOUBLE) AS q00,
             CAST(SUM(CASE WHEN t = 0 AND p = 1 THEN y * y END) AS DOUBLE) AS q01,
             CAST(SUM(CASE WHEN t = 1 AND p = 0 THEN y * y END) AS DOUBLE) AS q10,
             CAST(SUM(CASE WHEN t = 1 AND p = 1 THEN y * y END) AS DOUBLE) AS q11
           FROM e),
         c AS (SELECT
             (s11 / n11 - s10 / n10) - (s01 / n01 - s00 / n00) AS did,
             SQRT((q00 - s00 * s00 / n00) / (n00 - 1) / n00
               + (q01 - s01 * s01 / n01) / (n01 - 1) / n01
               + (q10 - s10 * s10 / n10) / (n10 - 1) / n10
               + (q11 - s11 * s11 / n11) / (n11 - 1) / n11) AS se,
             s00 / n00 AS m00, s01 / n01 AS m01,
             s10 / n10 AS m10, s11 / n11 AS m11
           FROM m)
         SELECT ROUND(m00, 6) AS m_ctrl_pre, ROUND(m01, 6) AS m_ctrl_post,
           ROUND(m10, 6) AS m_treat_pre, ROUND(m11, 6) AS m_treat_post,
           ROUND(did, 6) AS did, ROUND(se, 6) AS se,
           ROUND(did / se, 6) AS t_stat
         FROM c""",
    "q253_silhouette" ->
      """WITH b AS (SELECT vec_id, label AS c, embedding
           FROM embeddings WHERE embedding IS NOT NULL),
         exp AS (SELECT vec_id, c, p, CAST(x0 AS DOUBLE) AS x FROM (
           SELECT vec_id, c, UNNEST(range(1, len(embedding) + 1)) AS p,
             UNNEST(embedding) AS x0 FROM b)),
         cent AS (SELECT c AS cc, p, ROUND(AVG(x), 6) AS m
           FROM exp GROUP BY c, p),
         d2 AS (SELECT e.vec_id, e.c, ct.cc,
             ROUND(SQRT(SUM((e.x - ct.m) * (e.x - ct.m) ORDER BY e.p)), 6)
               AS d
           FROM exp e JOIN cent ct ON e.p = ct.p
           GROUP BY e.vec_id, e.c, ct.cc),
         ab AS (SELECT vec_id, c,
             MIN(CASE WHEN c = cc THEN d END) AS a,
             MIN(CASE WHEN c <> cc THEN d END) AS b
           FROM d2 GROUP BY vec_id, c),
         s AS (SELECT c, a, b,
             CASE WHEN GREATEST(a, b) = 0 THEN 0.0
               ELSE ROUND((b - a) / GREATEST(a, b), 6) END AS sil
           FROM ab)
         SELECT c AS cluster, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(a AS DECIMAL(28,6))) AS DOUBLE)
             / COUNT(*), 6) AS mean_a,
           ROUND(CAST(SUM(CAST(b AS DECIMAL(28,6))) AS DOUBLE)
             / COUNT(*), 6) AS mean_b,
           ROUND(CAST(SUM(CAST(sil AS DECIMAL(28,6))) AS DOUBLE)
             / COUNT(*), 6) AS mean_silhouette
         FROM s GROUP BY c ORDER BY cluster""",
    "q254_negative_sampling" ->
      """WITH cand AS (SELECT doc_id AS cid, source AS neg_source,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS b
           FROM documents),
         anc AS (SELECT doc_id AS anchor_id, source AS asrc,
             substr(md5(CAST(doc_id AS VARCHAR) || ':probe'), 1, 1) AS b
           FROM documents WHERE doc_id % 20 = 0),
         j AS (SELECT anchor_id, cid, neg_source,
             md5(CAST(anchor_id AS VARCHAR) || ':'
               || CAST(cid AS VARCHAR)) AS draw
           FROM anc JOIN cand USING (b)
           WHERE cid <> anchor_id AND neg_source <> asrc)
         SELECT anchor_id, neg_rank, cid AS neg_id, neg_source FROM (
           SELECT anchor_id, cid, neg_source, row_number() OVER (
               PARTITION BY anchor_id ORDER BY draw, cid) AS neg_rank
           FROM j)
         WHERE neg_rank <= 5""",
    "q255_canonical_keep" ->
      """WITH g AS (SELECT doc_id, n_chars,
             doc_id - doc_id % 7 AS comp FROM documents),
         sz AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS csize
           FROM g GROUP BY comp),
         win AS (SELECT comp, doc_id AS keep_id FROM g
           QUALIFY row_number() OVER (PARTITION BY comp
             ORDER BY n_chars DESC, doc_id) = 1)
         SELECT g.doc_id, g.comp AS cluster_id, w.keep_id,
           g.doc_id = w.keep_id AS kept, s.csize AS cluster_size
         FROM g JOIN win w ON g.comp = w.comp JOIN sz s ON g.comp = s.comp""",
    "q256_length_buckets" ->
      """WITH d AS (SELECT doc_id, COALESCE(CAST(len(regexp_extract_all(
             text, '\w+|[^\w\s]')) AS BIGINT), 0) AS n FROM documents),
         b AS (SELECT n,
             CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
               WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
               WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
               WHEN n <= 1024 THEN 1024 WHEN n <= 2048 THEN 2048
               ELSE 4096 END AS bucket_len
           FROM d)
         SELECT bucket_len, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(CEIL(CAST(COUNT(*) AS DOUBLE) / 8) AS BIGINT) AS n_batches,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           ROUND(1.0 - CAST(SUM(n) AS DOUBLE)
             / CAST(COUNT(*) * bucket_len AS DOUBLE), 6) AS pad_frac
         FROM b GROUP BY bucket_len ORDER BY bucket_len""",
    "q257_holt_linear" ->
      """WITH RECURSIVE d AS (SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM events WHERE value IS NOT NULL GROUP BY day),
         idx AS (SELECT day, total,
             CAST(row_number() OVER (ORDER BY day) AS INT) AS t FROM d),
         rec AS (
           SELECT i.t, i.day, i.total, i.total AS level,
             CAST(0 AS DOUBLE) AS trend,
             CAST(NULL AS DOUBLE) AS forecast
           FROM idx i WHERE i.t = 1
           UNION ALL
           SELECT i.t, i.day, i.total,
             CASE WHEN i.t = 2 THEN i.total
               ELSE 0.5 * i.total + 0.5 * (r.level + r.trend) END,
             CASE WHEN i.t = 2 THEN i.total - r.level
               ELSE 0.25 * ((0.5 * i.total + 0.5 * (r.level + r.trend))
                 - r.level) + 0.75 * r.trend END,
             CASE WHEN i.t <= 2 THEN CAST(NULL AS DOUBLE)
               ELSE r.level + r.trend END
           FROM rec r JOIN idx i ON i.t = r.t + 1)
         SELECT CAST(day AS TIMESTAMP) AS day, total,
           ROUND(level, 6) AS level, ROUND(trend, 6) AS trend,
           ROUND(forecast, 6) AS forecast,
           ROUND(total - forecast, 6) AS resid
         FROM rec ORDER BY day""",
    "q258_bradley_terry" -> graft.ml.Preference.bradleyTerryOracleSql(
      """WITH nxt AS (SELECT event_type AS a, value AS va,
             lead(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS b,
             lead(value, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS vb
           FROM events),
         pp AS (SELECT LEAST(a, b) AS item_a, GREATEST(a, b) AS item_b,
             CASE WHEN va >= vb THEN a ELSE b END AS win
           FROM nxt WHERE b IS NOT NULL AND a != b)
         SELECT item_a, item_b,
           SUM(CASE WHEN win = item_a THEN 1 ELSE 0 END) AS wins_a,
           SUM(CASE WHEN win = item_b THEN 1 ELSE 0 END) AS wins_b
         FROM pp GROUP BY item_a, item_b""", iters = 8),
    "q259_annotator_agreement" ->
      """WITH lab AS (SELECT
           CASE WHEN value < 50 THEN 'low' WHEN value < 150 THEN 'mid'
             ELSE 'high' END AS label_a,
           CASE WHEN value + CAST(event_id % 40 AS DOUBLE) < 50 THEN 'low'
             WHEN value + CAST(event_id % 40 AS DOUBLE) < 150 THEN 'mid'
             ELSE 'high' END AS label_b
           FROM events),
         conf AS (SELECT label_a, label_b, COUNT(*) AS n
           FROM lab GROUP BY label_a, label_b),
         tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS nn,
             CAST(SUM(CASE WHEN label_a = label_b THEN n ELSE 0 END)
               AS DOUBLE) AS diag FROM conf),
         pa AS (SELECT label_a AS c, CAST(SUM(n) AS DOUBLE) AS na
           FROM conf GROUP BY label_a),
         pb AS (SELECT label_b AS c, CAST(SUM(n) AS DOUBLE) AS nb
           FROM conf GROUP BY label_b),
         pe AS (SELECT SUM(na / t.nn * (nb / t.nn)) AS pe
           FROM pa JOIN pb USING (c) CROSS JOIN tot t)
         SELECT conf.label_a, conf.label_b, conf.n,
           ROUND(t.diag / t.nn, 6) AS po, ROUND(pe.pe, 6) AS pe,
           ROUND((t.diag / t.nn - pe.pe) / (1 - pe.pe), 6) AS kappa
         FROM conf CROSS JOIN tot t CROSS JOIN pe""",
    "q260_ranking_metrics" -> graft.ml.RankingMetrics.evaluateOracleSql(
      """SELECT c_nationkey AS query, c_custkey AS doc,
           c_acctbal AS score,
           CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END AS rel
         FROM customer""", k = 10),
    "q261_gini_concentration" ->
      graft.eda.Concentration.concentrationOracleSql(
        """SELECT c_nationkey AS grp,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS x
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_nationkey, o_custkey""", topFrac = 0.1),
    "q262_qini_uplift" -> graft.ml.Uplift.qiniOracleSql(
      """SELECT CAST(user_id % 2 = 1 AS INT) AS treat,
           SUM(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
             THEN 1 ELSE 0 END) AS score,
           CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
               AND event_type = 'purchase'
             THEN CAST(value AS DECIMAL(18,2)) END),
             CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS y,
           user_id AS tb
         FROM events WHERE value IS NOT NULL AND NOT isnan(value)
         GROUP BY user_id""", nBuckets = 10),
    "q263_binary_quantization" ->
      graft.proximity.BinaryQuant.hammingTopKOracleSql(
        "SELECT vec_id AS id, embedding AS vec FROM embeddings",
        "id % 100 = 0", dim = 64, k = 10),
    "q264_holt_winters" ->
      graft.operators.Forecast.holtWintersOracleSql(),
    "q265_nelson_aalen" ->
      """WITH life AS (SELECT
             (COALESCE(MIN(CASE WHEN event_type = 'error'
                 THEN epoch_us(ts) END), MAX(epoch_us(ts)))
               - MIN(epoch_us(ts))) / 86400000000.0 AS duration,
             CASE WHEN MIN(CASE WHEN event_type = 'error'
                 THEN epoch_us(ts) END) IS NOT NULL
               THEN 1 ELSE 0 END AS event
           FROM events GROUP BY user_id),
         byt AS (SELECT duration AS t, COUNT(*) AS n,
             CAST(SUM(CASE WHEN event = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_events
           FROM life GROUP BY duration),
         ar AS (SELECT t, n_events, CAST(SUM(n) OVER (ORDER BY t DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_at_risk
           FROM byt),
         cum AS (SELECT t, n_at_risk, n_events,
             SUM(CAST(n_events AS DOUBLE) / n_at_risk)
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS ch,
             SUM(CAST(n_events AS DOUBLE) / (n_at_risk * n_at_risk))
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS vh
           FROM ar WHERE n_events > 0)
         SELECT t, n_at_risk, n_events,
           ROUND(ch, 6) AS cum_hazard, ROUND(vh, 6) AS var_hazard,
           ROUND(EXP(-ch), 6) AS na_survival
         FROM cum""",
    "q266_curriculum_order" -> graft.text.Curriculum.curriculumOracleSql(
      "SELECT doc_id AS id, source AS domain, n_chars AS score FROM documents",
      nBands = 4),
    "q267_ann_recall" -> {
      val ap = graft.proximity.BinaryQuant.hammingTopKOracleSql(
        "SELECT vec_id AS id, embedding AS vec FROM embeddings",
        "id % 100 = 0", dim = 64, k = 10)
      s"""WITH a AS (SELECT query_id AS query, cand_id AS doc FROM ($ap)),
          ex AS (
            WITH q AS (SELECT vec_id AS id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
              FROM embeddings WHERE vec_id % 100 = 0),
            r AS (SELECT vec_id AS nid,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS re
              FROM embeddings),
            pairs AS (SELECT id, nid,
                list_dot_product(qe, re) /
                (SQRT(list_dot_product(qe, qe)) *
                  SQRT(list_dot_product(re, re))) AS sim
              FROM q CROSS JOIN r WHERE id != nid)
            SELECT id AS query, nid AS doc FROM pairs
            QUALIFY row_number() OVER (PARTITION BY id
              ORDER BY sim DESC, nid) <= 10),
          sel AS (SELECT a.query, a.doc FROM a
            WHERE EXISTS (SELECT 1 FROM ex
              WHERE ex.query = a.query AND ex.doc = a.doc)),
          ov AS (SELECT query, COUNT(*) AS n_overlap
            FROM sel GROUP BY query),
          qs AS (SELECT DISTINCT query FROM a)
          SELECT qs.query, COALESCE(ov.n_overlap, 0) AS n_overlap,
            ROUND(COALESCE(ov.n_overlap, 0) / 10.0, 6) AS recall_at_k
          FROM qs LEFT JOIN ov USING (query)"""
    },
    "q268_position_bias" ->
      """WITH nxt AS (SELECT event_type AS a, value AS va,
             lead(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS b,
             lead(value, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS vb
           FROM events),
         pl AS (SELECT a AS item,
             CASE WHEN va >= vb THEN 1 ELSE 0 END AS fw
           FROM nxt WHERE b IS NOT NULL AND a != b),
         per AS (SELECT item, COUNT(*) AS n_first,
             CAST(SUM(fw) AS BIGINT) AS n_first_wins
           FROM pl GROUP BY item),
         p0 AS (SELECT CAST(SUM(n_first_wins) AS DOUBLE) / SUM(n_first)
             AS p0 FROM per)
         SELECT item, n_first, n_first_wins,
           ROUND(CAST(n_first_wins AS DOUBLE) / n_first, 6)
             AS first_win_rate,
           ROUND(p0.p0, 6) AS pooled_rate,
           CASE WHEN p0.p0 > 0 AND p0.p0 < 1 THEN ROUND(
             (CAST(n_first_wins AS DOUBLE) / n_first - p0.p0) /
               SQRT(p0.p0 * (1 - p0.p0) / n_first), 6) END AS z
         FROM per CROSS JOIN p0""",
    "q269_bootstrap_ci" -> graft.ml.Bootstrap.subsampleCiOracleSql(
      "SELECT event_type AS grp, event_id AS id, value AS y FROM events",
      b = 64),
    "q270_sssp_weighted" -> graft.proximity.Graph.ssspWeightedOracleSql(
      s"""WITH ${knnSql("true", "vec_id < 100", 5)}
          SELECT id AS src, neighbor_id AS dst, distance AS w FROM knn""",
      "SELECT vec_id AS id FROM embeddings WHERE vec_id < 3",
      rounds = 4),
    "q271_modularity" -> graft.proximity.Graph.modularityOracleSql(
      proximityEdgesSql,
      graft.proximity.Graph.labelPropagationOracleSql(proximityEdgesSql,
        iters = 3)),
    "q272_ridge_regression" -> graft.ml.Ridge.ridge2OracleSql(
      """SELECT l_returnflag AS grp, l_quantity AS x1, l_discount AS x2,
           l_extendedprice AS y FROM lineitem""", lambda = 1.0),
    "q273_log_rank" -> graft.ml.Stats.logRankOracleSql(
      """SELECT CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END
             AS grp,
           (COALESCE(MIN(CASE WHEN event_type = 'error'
               THEN epoch_us(ts) END), MAX(epoch_us(ts)))
             - MIN(epoch_us(ts))) / 86400000000.0 AS duration,
           CASE WHEN MIN(CASE WHEN event_type = 'error'
               THEN epoch_us(ts) END) IS NOT NULL
             THEN 1 ELSE 0 END AS event
         FROM events GROUP BY user_id"""),
    "q274_weighted_quantiles" -> graft.eda.Robust.weightedQuantilesOracleSql(
      """SELECT l_returnflag AS grp, l_extendedprice AS v, l_quantity AS w
         FROM lineitem"""),
    "q275_hits" -> graft.proximity.Graph.hitsOracleSql(
      proximityEdgesSql, iters = 3),
    "q276_quantile_normalize" ->
      graft.transforms.QuantileNorm.quantileNormalizeOracleSql(
        "SELECT source AS grp, doc_id AS id, n_chars AS v FROM documents",
        nBins = 100),
    "q277_stratified_ate" -> graft.ml.Experiments.stratifiedAteOracleSql(
      """SELECT MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS treated,
           SUM(CASE WHEN event_type != 'purchase'
             THEN CAST(value AS DECIMAL(18,2)) END) AS y,
           COUNT(*) AS x
         FROM events WHERE value IS NOT NULL GROUP BY user_id""",
      nStrata = 5),
    "q278_periodogram" -> graft.operators.Forecast.periodogramOracleSql(
      """SELECT CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM events WHERE value IS NOT NULL GROUP BY day""",
      maxK = 10),
    "q279_cross_correlation" ->
      graft.operators.Forecast.crossCorrelationOracleSql(
        """SELECT CAST(ts AS DATE) AS day,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
               THEN CAST(value AS DECIMAL(18,2)) END),
               CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS x,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'error'
               THEN CAST(1 AS DECIMAL(18,2)) END),
               CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS y
           FROM events GROUP BY day""", maxLag = 7),
    "q280_eb_rates" -> graft.ml.Stats.ebRatesOracleSql(
      """SELECT l_partkey AS grp,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS success
         FROM lineitem"""),
    "q281_ratio_metric_ci" -> graft.ml.Experiments.ratioMetricCiOracleSql(
      """SELECT CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END
             AS arm,
           SUM(CAST(value AS DECIMAL(18,2))) AS y, COUNT(*) AS x
         FROM events WHERE value IS NOT NULL GROUP BY user_id"""),
    "q282_caliper_matching" -> graft.ml.Experiments.caliperMatchOracleSql(
      """SELECT MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS treated,
           SUM(CASE WHEN event_type != 'purchase'
             THEN CAST(value AS DECIMAL(18,2)) END) AS y,
           COUNT(*) AS x
         FROM events WHERE value IS NOT NULL GROUP BY user_id""",
      caliper = 2.0),
    "q283_interval_coalesce" ->
      graft.operators.Intervals.coalesceIntervalsOracleSql(
        """SELECT o.o_custkey AS key,
             CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS s,
             CAST(li.last_ship AS DATE) - DATE '1970-01-01' AS e
           FROM orders o
           JOIN (SELECT l_orderkey, MAX(l_shipdate) AS last_ship
                 FROM lineitem GROUP BY l_orderkey) li
             ON li.l_orderkey = o.o_orderkey"""),
    "q284_theil_decomposition" ->
      graft.eda.Concentration.theilDecompositionOracleSql(
        "SELECT o_orderpriority AS grp, o_totalprice AS x FROM orders"),
    "q285_hierarchy_flatten" -> graft.operators.Hierarchy.flattenOracleSql(
      // replica-aware parent (p_partkey nonneg → % == pmod), mirroring
      // the Spark wiring: the low digits mod the ScaleUp replica step
      // form each replica's own closed taxonomy — identical to plain
      // k // 2 at base scales, convergent at every ladder factor
      """SELECT p_partkey AS id,
           CASE WHEN p_partkey % 100000000 > 3
             THEN p_partkey - (p_partkey % 100000000)
               + (p_partkey % 100000000) // 2 END AS parent
         FROM part"""),
    "q286_cumulative_distinct" ->
      graft.operators.Events.cumulativeDistinctOracleSql(
        "SELECT user_id AS u, CAST(ts AS DATE) AS day FROM events"),
    "q287_partial_correlation" -> graft.ml.Stats.partialCorrOracleSql(
      """SELECT l_returnflag AS grp, l_extendedprice AS x,
           l_quantity AS y, l_discount AS z FROM lineitem"""),
    "q288_mcnemar" -> graft.ml.Stats.mcnemarOracleSql(
      """SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END AS label,
           CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS pred_a,
           CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS pred_b
         FROM orders"""),
    "q289_fk_integrity" -> Seq(
      ("lineitem", "l_orderkey", "orders", "o_orderkey",
        "lineitem->orders"),
      ("lineitem", "l_partkey", "part", "p_partkey", "lineitem->part"),
      ("lineitem", "l_suppkey", "supplier", "s_suppkey",
        "lineitem->supplier"),
      ("orders", "o_custkey", "customer", "c_custkey",
        "orders->customer"),
      ("customer", "c_nationkey", "nation", "n_nationkey",
        "customer->nation"),
      ("supplier", "s_nationkey", "nation", "n_nationkey",
        "supplier->nation"),
      ("nation", "n_regionkey", "region", "r_regionkey",
        "nation->region"))
      .map { case (ct, ck, pt, pk, e) =>
        graft.eda.Integrity.fkAuditOracleSql(ct, ck, pt, pk, e)
      }.mkString("", "\nUNION ALL\n", ""),
    "q290_cronbach_alpha" -> graft.ml.Stats.cronbachAlphaOracleSql(
      """SELECT l_orderkey AS subj, l_linenumber AS item,
           l_quantity AS score FROM lineitem WHERE l_linenumber <= 3"""),
    "q292_assortativity" -> graft.proximity.Graph.assortativityOracleSql(
      proximityEdgesSql),
    "q293_fisher_exact" -> graft.ml.Stats.fisherExactOracleSql(
      """SELECT CASE WHEN c_nationkey = 1 THEN 1 ELSE 0 END AS r,
           CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS c
         FROM customer WHERE c_nationkey IN (1, 2)"""),
    "q294_term_bursts" -> graft.text.Bursts.termBurstsOracleSql(
      "SELECT doc_id % 4 AS batch, text FROM documents", minCount = 10),
    "q295_chow_break" -> graft.ml.Ridge.chowTestOracleSql(
      """SELECT l_quantity AS x, l_extendedprice AS y,
           l_shipdate < DATE '1995-06-01' AS s FROM lineitem"""),
    "q296_brown_forsythe" -> graft.eda.StatTests.brownForsytheOracleSql(
      "SELECT l_returnflag AS grp, l_extendedprice AS v FROM lineitem"),
    "q297_durbin_watson" -> graft.operators.Forecast.durbinWatsonOracleSql(
      "ts", "value", "events"),
    "q298_cmh_pooled" -> graft.ml.Stats.cmhOracleSql(
      """SELECT c_nationkey % 5 AS s,
           CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS r,
           CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS c
         FROM customer"""),
    "q299_cochran_q" -> graft.ml.Stats.cochranQOracleSql(
      """SELECT o_custkey,
           MAX(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS f1,
           MAX(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS f2,
           MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS f3
         FROM orders GROUP BY o_custkey""", k = 3),
    "q300_vif" -> graft.ml.Ridge.vif3OracleSql(
      """SELECT l_quantity AS x1, l_extendedprice AS x2,
           l_discount AS x3 FROM lineitem""",
      "l_quantity", "l_extendedprice", "l_discount"),
    "q301_hbos" -> graft.eda.OutlierScores.hbosOracleSql(
      """SELECT l_orderkey * 8 + l_linenumber AS id, f,
           CAST(v AS DOUBLE) AS v
         FROM (SELECT l_orderkey, l_linenumber,
             UNNEST(['l_quantity', 'l_extendedprice', 'l_discount']) AS f,
             UNNEST([CAST(l_quantity AS DOUBLE),
               CAST(l_extendedprice AS DOUBLE),
               CAST(l_discount AS DOUBLE)]) AS v
           FROM lineitem)
         WHERE v IS NOT NULL AND NOT isnan(v)""", bins = 10, k = 20),
    "q302_welch_anova" -> graft.eda.StatTests.welchAnovaOracleSql(
      """SELECT event_type AS grp, value AS v FROM events"""),
    "q303_shapley_attribution" ->
      graft.operators.Reporting.shapleyAttributionOracleSql(
        "user_id", "ts", "event_type", "purchase", "events"),
    "q304_raking_weights" -> graft.ml.Experiments.rakeWeightsOracleSql(
      """SELECT c_mktsegment AS r, c_nationkey % 3 AS c
         FROM customer WHERE c_acctbal > 0""",
      "SELECT c_mktsegment AS r, c_nationkey % 3 AS c FROM customer",
      iters = 3),
    "q305_leakage_split" -> graft.dedup.LeakageSplit.leakageSafeSplitOracleSql(
      "SELECT doc_id AS id, text FROM documents",
      shingleSize = 8, maxDf = 5, iters = 4, trainFraction = 0.8),
    "q306_snake_shards" -> graft.text.Packing.snakeShardsOracleSql(
      """SELECT doc_id AS id, len(list_filter(
           string_split_regex(lower(trim(text)), '\s+'),
           x -> length(x) > 0)) AS sz FROM documents""", nShards = 8),
    "q307_yuen_trimmed_t" -> graft.ml.Stats.yuenTOracleSql(
      "SELECT l_returnflag AS g, l_extendedprice AS v FROM lineitem",
      "A", "N", trim = 0.2),
    "q308_item_triples" -> graft.operators.Cooccur.itemTriplesOracleSql(
      "SELECT l_orderkey AS b, l_partkey AS i FROM lineitem",
      minSupport = 2, maxBasketSize = 1000, topK = 20),
    "q309_bayesian_ab" -> graft.ml.Experiments.bayesianAbOracleSql(
      """SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS conv
         FROM events GROUP BY user_id""", "A", "B"),
    "q310_collocations" -> graft.text.Distinctive.collocationsOracleSql(
      "SELECT text FROM documents", minCount = 5, topK = 20),
    "q311_hurst" -> graft.operators.Forecast.hurstRsOracleSql(
      "ts", "value", "events"),
    "q312_best_split" -> graft.ml.InfoGain.bestSplitOracleSql(
      """SELECT l_extendedprice AS x,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
         FROM lineitem""", candidates = 19),
    "q313_croston" -> graft.operators.Forecast.crostonOracleSql(
      "ts", "value", "(SELECT * FROM events WHERE event_type = 'purchase')",
      alpha = 0.25),
    "q314_pacf" -> graft.operators.Forecast.pacfOracleSql(
      "ts", "value", "events", maxLag = 5),
    "q315_price_index" -> graft.operators.Reporting.priceIndexOracleSql(
      "l_shipdate", "l_partkey", "l_extendedprice", "l_quantity",
      "lineitem"),
    "q316_ridge_cv" -> graft.ml.Ridge.ridgeCvOracleSql(
      """SELECT l_orderkey * 8 + l_linenumber AS id, l_quantity AS x1,
           l_discount AS x2, l_extendedprice AS y FROM lineitem"""),
    "q317_motifs" -> graft.operators.Forecast.motifsOracleSql(
      "ts", "value", "events", w = 7, topK = 5),
    "q318_gumbel_returns" -> graft.operators.Forecast.gumbelOracleSql(
      "ts", "value", "events"),
    "q319_entropy_rate" -> graft.text.Distinctive.entropyRateOracleSql(
      "SELECT text FROM documents"),
    "q320_cramer_von_mises" ->
      graft.eda.StatTests.cramerVonMisesOracleSql(
        "SELECT l_extendedprice AS v FROM lineitem WHERE l_returnflag = 'R'",
        "SELECT l_extendedprice AS v FROM lineitem WHERE l_returnflag = 'N'"),
    "q321_retention_half_life" ->
      graft.operators.Cohorts.retentionHalfLifeOracleSql(
        "user_id", "ts", "events"),
    "q322_seasonality_strength" ->
      graft.operators.Forecast.seasonalityStrengthOracleSql(
        "ts", "value", "events"),
    "q323_qte" -> graft.ml.Experiments.qteOracleSql(
      "SELECT l_returnflag AS g, l_extendedprice AS v FROM lineitem",
      "A", "N"),
    "q324_proportion_effects" ->
      graft.ml.Stats.proportionEffectsOracleSql(
        """SELECT c_mktsegment AS g,
             CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS conv
           FROM customer""", "BUILDING", "AUTOMOBILE"),
    "q325_nb_fit" -> graft.ml.Stats.nbFitOracleSql(
      """SELECT COALESCE(k, 0) AS c FROM customer
         LEFT JOIN (SELECT o_custkey, COUNT(*) AS k FROM orders
           GROUP BY o_custkey) o ON customer.c_custkey = o.o_custkey"""),
    "q326_two_means" -> graft.ml.Stats.twoMeans1dOracleSql(
      "SELECT l_extendedprice AS v FROM lineitem"),
    "q327_heaps_law" -> graft.text.Distinctive.heapsLawOracleSql(
      "SELECT doc_id AS id, text FROM documents"),
    "q328_weibull_fit" -> graft.ml.Stats.weibullFitOracleSql(
      """SELECT coalesce(e, l) - f AS dur,
           CASE WHEN e IS NOT NULL THEN 1 ELSE 0 END AS event
         FROM (SELECT user_id,
             MIN(epoch_us(ts)) AS f,
             MIN(CASE WHEN event_type = 'error' THEN epoch_us(ts) END)
               AS e,
             MAX(epoch_us(ts)) AS l
           FROM events GROUP BY user_id)
         WHERE coalesce(e, l) - f > 0"""),
    "q329_newey_west" -> graft.operators.Forecast.neweyWestOracleSql(
      "ts", "value", "events"),
    "q330_hill_tail" -> graft.eda.Concentration.hillTailIndexOracleSql(
      "SELECT o_totalprice AS v FROM orders", k = 100),
    "q331_dedup_completeness" ->
      graft.dedup.Dedup.dedupCompletenessOracleSql(
        "SELECT doc_id AS id, text FROM documents"),
    "q332_ece_brier" -> graft.ml.Stats.eceBrierOracleSql(
      """SELECT value / 100 AS p,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         FROM events
         WHERE value / 100 >= 0 AND value / 100 <= 1"""),
    "q333_decile_migration" ->
      graft.operators.Reporting.decileMigrationOracleSql(
        "user_id", "ts", "value", "events"),
    "q334_trend_test" -> graft.ml.Stats.cochranArmitageOracleSql(
      """SELECT o_custkey % 10 AS x,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
             AS conv
         FROM orders"""),
    "q335_gk_gamma" -> graft.ml.Stats.gkGammaOracleSql(
      """SELECT CAST(FLOOR(l_quantity / 10) AS BIGINT) AS r,
           CAST(FLOOR(l_discount * 20) AS BIGINT) AS c
         FROM lineitem"""),
    "q336_krippendorff" -> graft.ml.Stats.krippendorffAlphaOracleSql(
      """SELECT user_id AS item,
           CASE WHEN value > 50 THEN 1 ELSE 0 END AS rating
         FROM events"""),
    "q337_cross_source_dups" ->
      graft.dedup.Dedup.crossSourceDupShareOracleSql(
        "SELECT doc_id AS id, text, source AS src FROM documents"),
    "q338_intrinsic_dim" -> graft.proximity.Embeddings.twoNnOracleSql(
      "SELECT vec_id AS id, embedding AS v FROM embeddings WHERE vec_id < 400"),
    "q339_rmst" -> graft.ml.Stats.rmstOracleSql(
      """SELECT (coalesce(e, l) - f) / 86400000000.0 AS dur,
           CASE WHEN e IS NOT NULL THEN 1 ELSE 0 END AS event
         FROM (SELECT user_id,
             MIN(epoch_us(ts)) AS f,
             MIN(CASE WHEN event_type = 'error' THEN epoch_us(ts) END)
               AS e,
             MAX(epoch_us(ts)) AS l
           FROM events GROUP BY user_id)
         WHERE coalesce(e, l) - f > 0""", tau = 30.0),
    "q340_simpson_detector" -> graft.ml.Stats.simpsonDetectorOracleSql(
      """SELECT l_returnflag AS g, l_discount AS x,
           l_extendedprice AS y FROM lineitem"""),
    "q341_slice_scan" -> graft.eda.Quality.sliceScanOracleSql(
      """SELECT l_returnflag AS a, l_linestatus AS b,
           l_extendedprice AS v FROM lineitem""", minN = 30, topK = 10),
    "q342_agreement" -> graft.ml.Stats.agreementOracleSql(
      "SELECT l_extendedprice AS x, l_quantity * 1500 AS y FROM lineitem"),
    "q343_term_burstiness" -> graft.text.Bursts.termBurstinessOracleSql(
      "SELECT doc_id AS id, text FROM documents", minCf = 20, topK = 20),
    "q344_median_ci" -> graft.eda.Robust.medianCiOracleSql(
      "SELECT l_extendedprice AS v FROM lineitem"),
    "q345_wasserstein" -> graft.eda.StatTests.wasserstein1OracleSql(
      "SELECT l_quantity AS v FROM lineitem WHERE l_returnflag = 'R'",
      "SELECT l_quantity AS v FROM lineitem WHERE l_returnflag = 'N'"),
    "q346_anderson_darling" ->
      graft.eda.StatTests.andersonDarling2OracleSql(
        """SELECT o_totalprice AS v FROM orders
           WHERE o_orderpriority = '1-URGENT'""",
        """SELECT o_totalprice AS v FROM orders
           WHERE o_orderpriority = '5-LOW'"""),
    "q347_jarque_bera" -> graft.eda.ShapeTests.jarqueBeraOracleSql(
      "SELECT l_returnflag AS grp, l_quantity AS v FROM lineitem"),
    "q348_mood_median" -> graft.eda.ShapeTests.moodMedianOracleSql(
      "SELECT o_orderpriority AS grp, o_totalprice AS v FROM orders"),
    "q349_wilcoxon_signed_rank" ->
      graft.eda.ShapeTests.wilcoxonSignedRankOracleSql(
        """SELECT
             CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
               / SUM(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                 THEN 1 END) AS x,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
                 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
               / SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
                 THEN 1 END) AS y
           FROM events GROUP BY user_id
           HAVING x IS NOT NULL AND y IS NOT NULL"""),
    "q350_runs_test" -> graft.eda.ShapeTests.runsTestOracleSql(
      """SELECT l_shipdate AS o,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS v
         FROM lineitem GROUP BY l_shipdate"""),
    "q351_ljung_box" -> graft.operators.Forecast.ljungBoxOracleSql(
      "ts", "value", "events"),
    "q352_pettitt" -> graft.operators.Forecast.pettittOracleSql(
      "ts", "value", "events"),
    "q353_granger" -> graft.operators.Forecast.grangerLag1OracleSql(
      "ts", "value", "events"),
    "q354_permutation_entropy" ->
      graft.operators.Forecast.permutationEntropyOracleSql(
        "ts", "value", "events"),
    "q355_dickey_fuller" ->
      graft.operators.Forecast.dickeyFullerOracleSql(
        "ts", "value", "events"),
    "q356_engle_granger" ->
      graft.operators.Forecast.engleGrangerOracleSql(
        "ts", "value", "events"),
    "q357_shewhart" -> graft.eda.ProcessControl.shewhartIOracleSql(
      "ts", "value", "events"),
    "q358_capability" -> graft.eda.ProcessControl.capabilityOracleSql(
      "SELECT l_returnflag AS grp, l_quantity AS v FROM lineitem",
      lsl = 0.0, usl = 55.0),
    "q359_grubbs" -> graft.eda.ProcessControl.grubbsOracleSql(
      "SELECT o_orderpriority AS grp, o_totalprice AS v FROM orders"),
    "q360_poisson_rate" -> graft.eda.StatTests.poissonRateTestOracleSql(
      """SELECT (user_id % 2 = 0) AS arm,
           SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS ev,
           COUNT(DISTINCT CAST(ts AS DATE)) AS expo
         FROM events GROUP BY user_id"""),
    "q361_tukey_hsd" -> graft.eda.StatTests.tukeyHsdOracleSql(
      "SELECT l_returnflag AS grp, l_quantity AS v FROM lineitem"),
    "q362_fleiss_kappa" -> graft.eda.StatTests.fleissKappaOracleSql(
      "SELECT l_orderkey AS item, l_returnflag AS cat FROM lineitem",
      nRaters = 4),
    "q363_leverage_cooks" ->
      graft.ml.RegressionDiagnostics.leverageCooksOracleSql(
        """SELECT l_orderkey * 8 + l_linenumber AS id,
             l_quantity AS x, l_extendedprice AS y FROM lineitem"""),
    "q364_breusch_pagan" ->
      graft.ml.RegressionDiagnostics.breuschPaganOracleSql(
        "SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem"),
    "q365_pca_2d" -> graft.ml.RegressionDiagnostics.pca2dOracleSql(
      "SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem"),
    "q366_aic_quadratic" ->
      graft.ml.RegressionDiagnostics.aicQuadraticOracleSql(
        "SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem"),
    "q367_anisotropy" ->
      graft.proximity.EmbedDiagnostics.anisotropyOracleSql(
        "SELECT embedding AS v FROM embeddings"),
    "q368_hubness" -> graft.proximity.EmbedDiagnostics.hubnessOracleSql(
      knnSql("true", "vec_id < 400", 5), k = 5),
    "q369_lid" -> graft.proximity.EmbedDiagnostics.lidByLabelOracleSql(
      knnSql("true", "vec_id < 400", 6), k = 6),
    "q370_fisher_ratio" ->
      graft.proximity.EmbedDiagnostics.fisherRatioOracleSql(
        "SELECT label, embedding AS v FROM embeddings"),
    "q371_centroid_distances" ->
      graft.proximity.EmbedDiagnostics.centroidDistancesOracleSql(
        "SELECT label, embedding AS v FROM embeddings"),
    "q372_norm_profile" ->
      graft.proximity.EmbedDiagnostics.normProfileOracleSql(
        "SELECT label, embedding AS v FROM embeddings"),
    "q373_fd_audit" -> graft.eda.DataAudit.fdAuditOracleSql("part",
      Seq(("p_partkey", "p_brand"), ("p_brand", "p_type"),
        ("p_type", "p_brand"))),
    "q374_key_candidates" -> graft.eda.DataAudit.keyCandidatesOracleSql(
      "orders", Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderdate", "o_orderpriority")),
    "q375_herfindahl" -> graft.eda.DataAudit.herfindahlOracleSql(
      """SELECT c_nationkey AS grp, c_mktsegment AS ent,
           c_acctbal AS v FROM customer"""),
    "q376_consistency_audit" ->
      graft.eda.DataAudit.consistencyAuditOracleSql(),
    "q377_truss_support" -> graft.proximity.Truss
      .supportHistogramOracleSql(s"eg AS ($proximityEdgesSql)", "eg"),
    "q378_contamination" -> graft.dedup.Contamination
      .evalOverlapOracleSql("doc_id % 50 = 0"),
    "q379_mann_kendall" -> graft.operators.Forecast.mannKendallOracleSql(
      "ts", "value", "events"),
    "q380_sign_test" -> graft.eda.ShapeTests.signTestOracleSql(
      """SELECT
           CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
               THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
             / SUM(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
               THEN 1 END) AS x,
           CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
               THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
             / SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
               THEN 1 END) AS y
         FROM events GROUP BY user_id
         HAVING x IS NOT NULL AND y IS NOT NULL"""),
    "q381_cliffs_delta" -> graft.eda.StatTests.cliffsDeltaOracleSql(
      "SELECT l_quantity AS v FROM lineitem WHERE l_returnflag = 'R'",
      "SELECT l_quantity AS v FROM lineitem WHERE l_returnflag = 'N'"),
    "q382_hodges_lehmann" ->
      graft.eda.StatTests.hodgesLehmannOracleSql(
        "SELECT l_quantity AS v FROM lineitem WHERE l_returnflag = 'R'",
        "SELECT l_quantity AS v FROM lineitem WHERE l_returnflag = 'N'"),
    "q383_atkinson" -> graft.eda.Concentration.atkinsonOracleSql(
      "SELECT c_nationkey AS grp, c_acctbal AS v FROM customer"),
    "q384_lorenz" -> graft.eda.Concentration.lorenzDecilesOracleSql(
      "SELECT o_orderpriority AS grp, o_totalprice AS v FROM orders"),
    "q385_burstiness" ->
      graft.operators.Events.interEventBurstinessOracleSql(
        "user_id", "ts", "events"),
    "q386_iv_wald" -> graft.ml.Causal.ivWaldOracleSql(
      """SELECT CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END AS z,
           CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS d,
           o_totalprice AS y
         FROM orders JOIN customer ON o_custkey = c_custkey"""),
    "q387_rdd" -> graft.ml.Causal.rddSharpOracleSql(
      "SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem",
      cutoff = 25.0, bandwidth = 20.0),
    "q388_icc_deff" -> graft.ml.Causal.iccDesignEffectOracleSql(
      "SELECT user_id AS c, value AS y FROM events"),
    "q389_char_entropy" ->
      graft.text.CharStats.charEntropyProfileOracleSql(),
    "q390_containment" -> graft.dedup.Contamination
      .containmentPairsOracleSql("doc_id < 300"),
    "q391_mcc" -> graft.ml.EvalExtras.mccSummaryOracleSql(
      """SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
           AS p,
           CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS l
         FROM customer"""),
    "q392_effect_sizes" -> graft.ml.EvalExtras.effectSizesOracleSql(
      "SELECT l_quantity AS v FROM lineitem WHERE l_returnflag = 'R'",
      "SELECT l_quantity AS v FROM lineitem WHERE l_returnflag = 'N'"),
    "q393_srm" -> graft.ml.EvalExtras.srmCheckOracleSql(
      """SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS arm
         FROM (SELECT DISTINCT user_id FROM events)"""),
    "q394_best_thresholds" ->
      graft.ml.EvalExtras.bestThresholdsOracleSql(
        """SELECT o_totalprice AS s,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
               AS l
           FROM orders"""),
    "q395_average_precision" ->
      graft.ml.EvalExtras.averagePrecisionOracleSql(
        """SELECT o_totalprice AS s,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
               AS l
           FROM orders"""),
    "q396_equalized_odds" ->
      graft.ml.EvalExtras.equalizedOddsOracleSql(
        """SELECT c_mktsegment AS g,
             CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END AS p,
             CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS l
           FROM customer"""),
    "q397_gopher_rules" -> graft.text.Gopher.funnelOracleSql(),
    "q398_tail_dependence" ->
      graft.operators.Forecast.tailDependenceOracleSql(
        "ts", "value", "events"),
    "q399_two_way_anova" -> graft.eda.StatTests.twoWayAnovaOracleSql(
      """SELECT l_returnflag AS a, l_linestatus AS b,
           l_quantity AS v FROM lineitem"""),
    "q400_split_half" ->
      graft.ml.EvalExtras.splitHalfReliabilityOracleSql(
        """SELECT user_id AS id, EXTRACT(day FROM ts) AS item,
             value AS v FROM events"""),
    "q401_vocab_coverage" -> graft.text.VocabStats
      .vocabCoverageOracleSql(ks = Seq(10, 100, 1000, 10000)),
    "q402_oov_rate" -> graft.text.VocabStats.oovRateOracleSql(
      "doc_id % 50 = 0"),
    "q403_sobel_mediation" -> graft.ml.Causal.sobelMediationOracleSql(
      """SELECT l_quantity AS x, l_extendedprice AS m,
           l_discount * 100 AS y FROM lineitem"""),
    "q404_eb_shrink" -> graft.ml.Causal.ebShrinkMeansOracleSql(
      "SELECT c_nationkey AS grp, c_acctbal AS v FROM customer"),
    "q405_stratified_ate" -> graft.ml.Causal.stratifiedAteOracleSql(
      """SELECT c_nationkey AS s,
           CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS tr,
           c_acctbal AS y FROM customer"""),
    "q406_cum_incidence" ->
      graft.ml.Stats.cumulativeIncidenceOracleSql(
        """SELECT
             CASE WHEN de IS NOT NULL AND (dp IS NULL OR de <= dp)
                 THEN date_diff('day', d0, de)
               WHEN dp IS NOT NULL THEN date_diff('day', d0, dp)
               ELSE date_diff('day', d0, dl) END AS dur,
             CASE WHEN de IS NOT NULL AND (dp IS NULL OR de <= dp)
                 THEN 1
               WHEN dp IS NOT NULL THEN 2 ELSE 0 END AS cause
           FROM (SELECT user_id,
               MIN(CAST(ts AS DATE)) AS d0,
               MIN(CASE WHEN event_type = 'error'
                 THEN CAST(ts AS DATE) END) AS de,
               MIN(CASE WHEN event_type = 'purchase'
                 THEN CAST(ts AS DATE) END) AS dp,
               MAX(CAST(ts AS DATE)) AS dl
             FROM events GROUP BY user_id)
           WHERE CASE WHEN de IS NOT NULL AND (dp IS NULL OR de <= dp)
               THEN date_diff('day', d0, de)
             WHEN dp IS NOT NULL THEN date_diff('day', d0, dp)
             ELSE date_diff('day', d0, dl) END >= 0"""),
    "q407_mcf" -> graft.ml.Stats.meanCumulativeFunctionOracleSql(
      "e.event_type = 'error'"),
    "q408_quantile_map" -> graft.eda.Robust.quantileMapOracleSql(
      """SELECT o_totalprice AS v FROM orders
         WHERE o_orderpriority = '1-URGENT'""",
      """SELECT o_totalprice AS v FROM orders
         WHERE o_orderpriority = '5-LOW'"""),
    "q409_neyman" -> graft.eda.DataAudit.neymanAllocationOracleSql(
      "SELECT c_nationkey AS s, c_acctbal AS v FROM customer",
      budget = 1000L),
    "q410_rich_club" -> graft.proximity.Truss.richClubOracleSql(
      s"eg AS ($proximityEdgesSql)", "eg", ks = Seq(1, 2, 3, 4)),
    "q411_det_sample" ->
      graft.eda.DataAudit.deterministicSampleOracleSql(
        "SELECT source AS g, doc_id AS id FROM documents", k = 3),
    "q412_gini_stump" -> graft.ml.EvalExtras.giniStumpOracleSql(
      """SELECT o_totalprice AS f,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
             AS l
         FROM orders"""),
    "q413_calibration" ->
      graft.ml.EvalExtras.linearCalibrationOracleSql(
        """SELECT CAST(c_custkey % 100 AS DOUBLE) / 100 AS p,
             CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS l
           FROM customer"""),
    "q414_kendall_w" -> graft.eda.StatTests.kendallWOracleSql(
      """SELECT event_type AS r, CAST(ts AS DATE) AS i,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
         FROM events GROUP BY event_type, CAST(ts AS DATE)"""),
    "q415_weighted_kappa" ->
      graft.ml.Preference.weightedKappaOracleSql(
        """SELECT FLOOR(value / 20) AS a, FLOOR(value / 25) AS b
           FROM events"""),
    "q416_somers_d" -> graft.ml.Stats.somersDOracleSql(
      """SELECT FLOOR(l_quantity / 10) AS x,
           FLOOR(l_discount * 20) AS y FROM lineitem"""),
    "q417_km_bands" -> graft.ml.Stats.kaplanMeierBandsOracleSql(
      """SELECT date_diff('day', f, coalesce(e, l)) AS dur,
           CASE WHEN e IS NOT NULL THEN 1 ELSE 0 END AS event
         FROM (SELECT user_id, MIN(CAST(ts AS DATE)) AS f,
             MIN(CASE WHEN event_type = 'error'
               THEN CAST(ts AS DATE) END) AS e,
             MAX(CAST(ts AS DATE)) AS l
           FROM events GROUP BY user_id)
         WHERE date_diff('day', f, coalesce(e, l)) > 0"""),
    "q418_win_ratio" -> graft.eda.StatTests.winRatioOracleSql(
      "SELECT value AS v FROM events WHERE event_type = 'purchase'",
      "SELECT value AS v FROM events WHERE event_type = 'click'"),
    "q419_bimodality" ->
      graft.eda.ShapeTests.bimodalityCoefficientOracleSql(
        "SELECT l_returnflag AS grp, l_quantity AS v FROM lineitem"),
    "q420_theil_u" ->
      graft.eda.StatTests.uncertaintyCoefficientOracleSql(
        """SELECT l_returnflag AS x, l_linestatus AS y
           FROM lineitem"""),
    "q421_cmh" -> graft.eda.StatTests.cmhTestOracleSql(
      """SELECT c_nationkey AS s,
           CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS e,
           CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS o
         FROM customer"""),
    "q422_dispersion" -> graft.eda.StatTests.dispersionIndexOracleSql(
      """SELECT event_type AS grp, COUNT(*) AS c
         FROM events GROUP BY event_type, user_id"""),
    "q423_cv_ci" -> graft.eda.StatTests.cvWithCiOracleSql(
      "SELECT l_returnflag AS grp, l_extendedprice AS v FROM lineitem"),
    "q424_friedman_page" -> graft.eda.StatTests.friedmanPageOracleSql(
      """SELECT l_shipdate AS b, FLOOR(l_discount * 20) AS t,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS v
         FROM lineitem GROUP BY l_shipdate, FLOOR(l_discount * 20)"""),
    "q425_robust_spread" -> graft.eda.Robust.robustSpreadOracleSql(
      "SELECT l_returnflag AS grp, l_extendedprice AS v FROM lineitem"),
    "q426_ks_uniform" -> graft.eda.StatTests.ksUniformOracleSql(
      "SELECT l_discount AS v FROM lineitem", lo = 0.0, hi = 0.1),
    "q427_topk_churn" -> graft.eda.DataAudit.topkChurnOracleSql(
      """SELECT o_custkey AS e, o_totalprice AS v FROM orders
         WHERE o_orderdate < DATE '1995-01-01'""",
      """SELECT o_custkey AS e, o_totalprice AS v FROM orders
         WHERE NOT (o_orderdate < DATE '1995-01-01')""", k = 20),
    "q428_ess_weights" -> graft.ml.Experiments.essProfileOracleSql(
      "SELECT source AS g, n_chars AS w FROM documents"),
    "q429_first_seen_dups" ->
      graft.dedup.Dedup.firstSeenDupShareOracleSql(
        "SELECT doc_id AS id, source AS g, text FROM documents"),
    "q430_energy_distance" ->
      graft.eda.StatTests.energyDistanceOracleSql(
        "SELECT l_quantity AS v FROM lineitem WHERE l_returnflag = 'R'",
        "SELECT l_quantity AS v FROM lineitem WHERE l_returnflag = 'N'"),
    "q431_gini_mean_diff" ->
      graft.eda.Concentration.giniMeanDifferenceOracleSql(
        "SELECT l_returnflag AS g, l_extendedprice AS v FROM lineitem"),
    "q432_c_index" -> graft.ml.Stats.concordanceIndexOracleSql(
      """SELECT date_diff('day', f, coalesce(e, l)) AS t,
           CASE WHEN e IS NOT NULL THEN 1 ELSE 0 END AS e,
           cnt AS p
         FROM (SELECT user_id, MIN(CAST(ts AS DATE)) AS f,
             MIN(CASE WHEN event_type = 'error'
               THEN CAST(ts AS DATE) END) AS e,
             MAX(CAST(ts AS DATE)) AS l, COUNT(*) AS cnt
           FROM events GROUP BY user_id)
         WHERE date_diff('day', f, coalesce(e, l)) > 0"""),
    "q433_source_kl" ->
      graft.text.Distinctive.sourceKlOracleSql(topK = 2000),
    "q434_page_hinkley" -> graft.operators.Forecast
      .pageHinkleyOracleSql("ts", "value", "events"),
    "q435_dup_cluster_sizes" ->
      graft.dedup.Dedup.dupClusterSizesOracleSql(
        "SELECT text FROM documents"),
    "q436_propensity_overlap" ->
      graft.ml.Causal.propensityOverlapOracleSql(
        """SELECT FLOOR(c_acctbal / 500) AS b,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
               AS tr
           FROM customer"""),
    "q437_cold_start" -> graft.operators.Cohorts.coldStartRateOracleSql(
      "user_id", "event_type", "ts", "events", "2024-01-15 00:00:00"),
    "q438_pinball" -> graft.operators.Forecast.pinballEvalOracleSql(
      "ts", "value", "events", "2024-01-15"),
    "q439_winsorized_corr" -> graft.eda.Robust.winsorizedCorrOracleSql(
      """SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem"""),
    "q440_shard_skew" -> graft.eda.SkewReport.shardSkewAuditOracleSql(
      "SELECT o_custkey AS k FROM orders"),
    "q441_holm_pairwise" ->
      graft.eda.MultipleTesting.pairwiseTestsHolmOracleSql(
        """SELECT event_type AS g, value AS v FROM events"""),
    "q442_tost_equivalence" ->
      graft.ml.Experiments.tostEquivalenceOracleSql(
        "SELECT l_returnflag AS arm, l_quantity AS v FROM lineitem",
        armA = "R", armB = "N", margin = 0.5),
    "q443_power_proportions" ->
      graft.eda.StatTests.powerProportionsOracleSql(
        """SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
             AS conv FROM orders""", delta = 0.02),
    "q444_variance_changepoint" -> graft.operators.Forecast
      .varianceChangepointOracleSql("ts", "value", "events"),
    "q445_group_trend" -> graft.operators.Forecast
      .senSlopeByGroupOracleSql("event_type", "ts", "value", "events"),
    "q446_similarity_sweep" ->
      graft.dedup.Dedup.jaccardBandSweepOracleSql(
        "SELECT doc_id AS id, text FROM documents WHERE doc_id < 500",
        minBand = 5),
    "q447_lilliefors" -> graft.eda.StatTests.lillieforsOracleSql(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
           AS DOUBLE) AS v
         FROM lineitem GROUP BY l_shipdate"""),
    "q448_bowker" -> graft.ml.Stats.bowkerOracleSql(
      """SELECT LEAST(CAST(sp * 100 AS BIGINT) // (2500 * cp), 3) AS a,
           LEAST(CAST(sq * 100 AS BIGINT) // (2500 * cq), 3) AS b
         FROM (SELECT user_id,
             SUM(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
               THEN CAST(value AS DECIMAL(18,2)) END) AS sp,
             SUM(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
               THEN 1 END) AS cp,
             SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
               THEN CAST(value AS DECIMAL(18,2)) END) AS sq,
             SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
               THEN 1 END) AS cq
           FROM events GROUP BY user_id)"""),
    "q449_jonckheere" ->
      graft.eda.StatTests.jonckheereTerpstraOracleSql(
        """SELECT CAST(FLOOR(l_discount * 20) AS BIGINT) AS g,
             CAST(l_quantity AS BIGINT) AS v FROM lineitem"""),
    "q450_interval_coverage" -> graft.operators.Forecast
      .intervalCoverageOracleSql("ts", "value", "events", "2024-01-15"),
    "q451_operating_points" ->
      graft.eda.StatTests.operatingPointsOracleSql(
        """SELECT CAST(c_custkey % 100 AS DOUBLE) / 100 AS s,
             CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS y
           FROM customer"""),
    "q452_mi_matrix" -> graft.eda.Association.miMatrixOracleSql(
      """(SELECT l_returnflag, l_linestatus,
           CAST(FLOOR(l_discount * 20) AS BIGINT) AS disc_band
         FROM lineitem)""",
      Seq("l_returnflag", "l_linestatus", "disc_band")),
    "q453_cohort_ltv" -> graft.operators.Cohorts.cohortLtvOracleSql(
      "user_id", "ts", "value", "events"),
    "q454_partial_auc" -> graft.ml.EvalExtras.partialAucOracleSql(
      """SELECT CAST(c_custkey % 100 AS DOUBLE) / 100 AS s,
           CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS y
         FROM customer"""),
    "q455_dedup_savings" -> graft.dedup.Dedup.dedupSavingsOracleSql(
      "SELECT doc_id AS id, source AS g, text FROM documents"),
    "q456_position_attribution" ->
      graft.operators.Reporting.positionAttributionOracleSql(
        conversionType = "purchase",
        touchTypes = Seq("click", "view", "signup")),
    "q457_novelty_curve" ->
      graft.text.CorpusStats.noveltyCurveOracleSql(),
    "q458_ks_by_group" -> graft.eda.StatTests.ksByGroupOracleSql(
      """SELECT event_type AS g,
           CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
             THEN 1 ELSE 0 END AS a,
           value AS v FROM events"""),
    "q459_turning_points" -> graft.operators.Forecast
      .turningPointsOracleSql("ts", "value", "events"),
    "q460_von_neumann" -> graft.operators.Forecast
      .vonNeumannOracleSql("ts", "value", "events"),
    "q461_cost_curve" -> graft.eda.StatTests.costCurveOracleSql(
      """SELECT CAST(c_custkey % 100 AS DOUBLE) / 100 AS s,
           CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS y
         FROM customer""", costFp = 1L, costFn = 5L),
    "q462_contamination_sweep" ->
      graft.dedup.Contamination.contaminationSweepOracleSql(
        Seq("mod50" -> "doc_id % 50 = 0", "mod97" -> "doc_id % 97 = 0")),
    "q463_defect_scan" -> graft.text.Scrub.defectScanOracleSql(),
    "q464_w1_by_group" ->
      graft.eda.StatTests.wassersteinByGroupOracleSql(
        """SELECT event_type AS g,
             CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
               THEN 1 ELSE 0 END AS a,
             value AS v FROM events"""),
    "q465_acf_by_group" -> graft.operators.Forecast.acfByGroupOracleSql(
      "event_type", "ts", "value", "events"),
    "q466_seasonal_mk" -> graft.operators.Forecast
      .seasonalMannKendallOracleSql("ts", "value", "events"),
    "q467_gini_sweep" -> graft.ml.InfoGain.giniSweepOracleSql(
      """(SELECT CAST(FLOOR(l_quantity / 10) AS BIGINT) AS qty_band,
           CAST(FLOOR(l_discount * 20) AS BIGINT) AS disc_band,
           CAST(FLOOR(l_extendedprice / 10000) AS BIGINT)
             AS price_band,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
         FROM lineitem)""",
      Seq("qty_band", "disc_band", "price_band"), "y"),
    "q468_rank_biserial" -> graft.eda.ShapeTests.rankBiserialOracleSql(
      """SELECT
           CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
             THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
             / SUM(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
               THEN 1 END) AS x,
           CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
             THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
             / SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
               THEN 1 END) AS y
         FROM events GROUP BY user_id"""),
    "q469_variance_ratio" -> graft.eda.StatTests.varianceRatioOracleSql(
      "SELECT l_returnflag AS arm, l_quantity AS v FROM lineitem",
      armA = "R", armB = "N"),
    "q470_km_by_group" -> graft.ml.Stats.kmMedianByGroupOracleSql(
      """SELECT ft.channel AS g,
           date_diff('day', lf.f, coalesce(lf.e, lf.l)) AS t,
           CASE WHEN lf.e IS NOT NULL THEN 1 ELSE 0 END AS e
         FROM (SELECT user_id, MIN(CAST(ts AS DATE)) AS f,
             MIN(CASE WHEN event_type = 'error'
               THEN CAST(ts AS DATE) END) AS e,
             MAX(CAST(ts AS DATE)) AS l
           FROM events GROUP BY user_id) lf
         JOIN (SELECT user_id, event_type AS channel FROM (
             SELECT user_id, event_type, ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS rn
             FROM events) WHERE rn = 1) ft
           ON lf.user_id = ft.user_id
         WHERE date_diff('day', lf.f, coalesce(lf.e, lf.l)) > 0"""),
    "q471_boilerplate_mass" ->
      graft.text.CorpusStats.boilerplateMassOracleSql(),
    "q472_entropy_by_source" ->
      graft.text.Distinctive.entropyBySourceOracleSql(),
    "q473_streaks" -> graft.operators.Forecast.streaksOracleSql(
      "ts", "value", "events"),
    "q474_missingness" ->
      graft.eda.DataAudit.missingnessPatternOracleSql(
        """(SELECT
             CASE WHEN event_id % 37 = 0 THEN NULL ELSE value END
               AS va,
             CASE WHEN event_id % 37 = 0 OR event_id % 11 = 0
               THEN NULL ELSE value END AS vb,
             CASE WHEN event_id % 41 = 0 THEN NULL ELSE value END
               AS vc
           FROM events)""",
        Seq("va", "vb", "vc")),
    "q475_reorder_gaps" -> graft.operators.Events.reorderGapsOracleSql(
      "o_custkey", "o_orderdate", "orders"),
    "q476_latency_percentiles" ->
      graft.operators.Events.latencyPercentilesOracleSql(
        "user_id", "ts", "event_type", "events"),
    "q477_hourly_profile" ->
      graft.operators.Reporting.hourlyProfileOracleSql("ts", "events"),
    "q478_weekend_lift" ->
      graft.operators.Reporting.weekendLiftOracleSql(
        "ts", "value", "events"),
    "q479_psi_timeline" -> graft.eda.Quality.psiTimelineOracleSql(
      "ts", "value", "events", binWidth = 10.0),
    "q480_shard_exchange" ->
      graft.dedup.ShardExchange.exchangeReportOracleSql(
        "doc_id", "text", "documents", nShards = 4),
    "q481_logrank" -> graft.ml.SurvivalTests.logRankOracleSql(
      """SELECT date_diff('day', f, coalesce(e, l)) AS dur,
           CASE WHEN e IS NOT NULL THEN 1 ELSE 0 END AS event,
           CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS arm
         FROM (SELECT user_id, MIN(CAST(ts AS DATE)) AS f,
             MIN(CASE WHEN event_type = 'error'
               THEN CAST(ts AS DATE) END) AS e,
             MAX(CAST(ts AS DATE)) AS l
           FROM events GROUP BY user_id)
         WHERE date_diff('day', f, coalesce(e, l)) > 0""",
      armA = "even", armB = "odd"),
    "q482_krippendorff" -> graft.eda.Agreement.krippendorffAlphaOracleSql(
      "SELECT l_orderkey AS u, l_returnflag AS c FROM lineitem"),
    "q483_mixture_reweight" ->
      graft.text.CorpusStats.mixtureReweightOracleSql(
        Map("src0" -> 0.2, "src1" -> 0.15, "src2" -> 0.1,
          "src3" -> 0.05), cap = 3.0),
    "q484_cross_shard_neardups" ->
      graft.dedup.ShardExchange.crossShardNearDupsOracleSql(
        "SELECT doc_id AS id, text FROM documents WHERE doc_id < 800",
        nShards = 4, threshold = 0.3),
    "q485_bucket_skew" -> graft.dedup.ShardExchange.bucketSkewOracleSql(
      "doc_id", "text", "documents"),
    "q486_bigram_entropy" ->
      graft.text.LmScore.bigramCrossEntropyOracleSql(k = 0.5),
    "q487_mixture_apply" -> graft.text.CorpusStats.mixtureApplyOracleSql(
      Map("src0" -> 0.2, "src1" -> 0.15, "src2" -> 0.1,
        "src3" -> 0.05), cap = 3.0),
    "q488_token_fertility" -> graft.text.CorpusStats
      .tokenFertilityOracleSql("source", "text", "documents"),
    "q489_shard_pair_overlap" -> graft.dedup.ShardExchange
      .shardPairOverlapOracleSql("doc_id", "text", "documents",
        nShards = 4),
    "q490_order_reconciliation" ->
      graft.eda.Integrity.reconcileOrderTotalsOracleSql(),
    "q491_length_quality_grid" -> graft.text.CorpusStats
      .lengthQualityGridOracleSql("text", "documents",
        Text.stopwords("en").map(w => s"'$w'").mkString("[", ", ", "]")),
    "q492_backlog_curve" ->
      graft.operators.Intervals.backlogByMonthOracleSql(),
    "q493_lead_time" ->
      graft.operators.Reporting.leadTimeProfileOracleSql(),
    "q494_shared_prefixes" -> graft.text.Templates
      .sharedPrefixesOracleSql("source", "text", "documents",
        k = 8, minDocs = 2L),
    "q495_dup_span_position" ->
      graft.text.CorpusStats.dupSpanPositionOracleSql(n = 3),
    "q496_dup_attribution" ->
      graft.dedup.Dedup.dupAttributionOracleSql(prefixChars = 8),
    "q497_langid_confusion" -> {
      def ratio(l: String): String = {
        val sw = Text.stopwords(l).map(w => s"'$w'").mkString("[", ", ", "]")
        s"CAST(len(list_filter(toks, x -> list_contains($sw, x))) AS DOUBLE) / GREATEST(len(toks), 1)"
      }
      s"""WITH d AS (SELECT lang,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
               x -> length(x) > 0) AS toks
           FROM documents),
         s AS (SELECT lang, ${ratio("de")} AS s_de, ${ratio("en")} AS s_en,
                      ${ratio("es")} AS s_es, ${ratio("fr")} AS s_fr FROM d),
         p AS (SELECT lang, CASE
           WHEN s_fr > 0 AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
           WHEN s_es > 0 AND s_es >= s_en AND s_es >= s_de THEN 'es'
           WHEN s_en > 0 AND s_en >= s_de THEN 'en'
           WHEN s_de > 0 THEN 'de'
           ELSE 'und' END AS lang_pred
          FROM s),
         cells AS (SELECT lang, lang_pred, COUNT(*) AS n_docs
           FROM p GROUP BY lang, lang_pred)
         SELECT lang, lang_pred, n_docs,
           ROUND(CAST(n_docs AS DOUBLE) /
             SUM(n_docs) OVER (PARTITION BY lang), 6) AS share
         FROM cells ORDER BY lang, lang_pred"""
    },
    "q498_ngram_df_histogram" ->
      graft.text.CorpusStats.ngramDfHistogramOracleSql(n = 3),
    "q499_growth_accounting" -> graft.operators.Cohorts
      .growthAccountingOracleSql("user_id", "ts", "events"),
    "q500_function_word_cosine" -> graft.text.Distinctive
      .functionWordCosineOracleSql("source", "text", "documents",
        Text.stopwords("en").map(w => s"'$w'").mkString("[", ", ", "]")),
    "q501_new_repeat_revenue" -> graft.operators.Reporting
      .newRepeatRevenueOracleSql("o_custkey", "o_orderdate",
        "o_totalprice", "orders"),
    "q502_template_purity" -> graft.text.Templates
      .templatePurityOracleSql("source", "text", "documents", k = 8),
    "q503_winnow_density" ->
      graft.dedup.Winnowing.densityOracleSql(k = 3, w = 4),
    "q504_winnow_candidates" -> graft.dedup.Winnowing
      .candidatePairsOracleSql(k = 3, w = 4, minShared = 2, maxDf = 10),
    "q505_filter_agreement" -> graft.text.FilterAgreement
      .c4GopherCellsOracleSql(
        """SELECT doc_id, source,
             regexp_replace(text || CASE WHEN doc_id % 2 = 0
                 THEN ' more rows of the batch and that plan with scans to finish here now.'
                 ELSE ' tail' END,
               ' the ', '.' || chr(10), 'g') AS text
           FROM documents"""),
    "q506_rake_keywords" -> graft.text.Rake.keywordsOracleSql(
      Text.stopwords("en").map(w => s"'$w'").mkString("[", ", ", "]")),
    "q507_m4_downsample" -> graft.operators.Downsample.m4OracleSql(
      "event_type", "ts", "event_id", "value", "events"),
    "q508_time_weighted_avg" -> graft.operators.TimeWeighted
      .timeWeightedAvgOracleSql("event_type", "ts", "event_id",
        "value", "events"),
    "q509_stickiness" -> graft.operators.Cohorts
      .stickinessOracleSql("user_id", "ts", "events"),
    "q510_marginals" -> graft.operators.Reporting.marginalsOracleSql(
      "l_returnflag", "l_linestatus", "l_quantity", "lineitem"),
    "q511_learning_curve" -> graft.ml.LearningCurve
      .simpleOlsCurveOracleSql(
        """len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             w -> length(w) > 0))""",
        "n_chars", "doc_id", "documents"),
    "q512_winnow_spectrum" -> graft.dedup.Winnowing
      .sharedSpectrumOracleSql(k = 3, w = 4, maxDf = 10),
    "q513_minhash_calibration" -> graft.dedup.SketchCalibration
      .minhashReliabilityOracleSql(numHashes = 16, idCap = 200),
    "q514_brunner_munzel" -> graft.eda.RankTests
      .brunnerMunzelOracleSql("event_type", "value", "events",
        "click", "view"),
    "q515_cucconi" -> graft.eda.RankTests
      .cucconiOracleSql("event_type", "value", "events",
        "purchase", "view"),
    "q516_isotonic_calibration" -> graft.ml.Isotonic
      .calibrateOracleSql("value", "event_type = 'purchase'", "events"),
    "q517_copula_grid" -> graft.eda.Copula.copulaGridOracleSql(
      """len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
           w -> length(w) > 0))""",
      "n_chars", "documents"),
    "q518_char_js_matrix" ->
      graft.text.StyleDrift.charJsMatrixOracleSql(n = 3),
    "q519_jl_distortion" ->
      graft.proximity.JlAudit.jlDistortionOracleSql(k = 16, idCap = 500),
    "q520_snapshot_diff" -> graft.operators.SnapshotDiff
      .diffOracleSql(snapshotOldSql, snapshotNewSql),
    "q521_incremental_stats" -> graft.operators.SnapshotDiff
      .incrementalStatsOracleSql(snapshotOldSql, snapshotNewSql),
    "q522_changed_similarity" -> graft.operators.SnapshotDiff
      .changedSimilarityOracleSql(snapshotOldSql, snapshotNewSql),
    "q227_cramers_v" -> cramersVSql,
    "q228_lexical_richness" ->
      """WITH tok AS (SELECT source,
             unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0)) AS term
           FROM documents),
         ps AS (SELECT source, term, COUNT(*) AS c
           FROM tok GROUP BY source, term),
         nd AS (SELECT source, COUNT(*) AS n_docs
           FROM documents GROUP BY source),
         pr AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_types,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax,
             CAST(SUM(length(term) * c) AS BIGINT) AS len
           FROM ps GROUP BY source)
         SELECT source, n_docs, n_tokens, n_types,
           ROUND(n_types / CAST(n_tokens AS DOUBLE), 6) AS ttr,
           ROUND(hapax / CAST(n_types AS DOUBLE), 6) AS hapax_frac,
           ROUND(len / CAST(n_tokens AS DOUBLE), 6) AS mean_token_len
         FROM pr JOIN nd USING (source)"""
  )

  /** Generated oracle for q226: per-pair corr + n in one aggregate,
    * then the same A&S CDF polynomial and BH tail as
    * [[graft.eda.MultipleTesting.corrSignificance]]. */
  private def corrSignificanceSql: String = {
    val cols = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
    val pairs = cols.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
    val aggs = pairs.zipWithIndex.map { case ((a, b), i) =>
      s"corr(CAST($a AS DOUBLE), CAST($b AS DOUBLE)) AS r_$i, " +
        s"CAST(SUM(CASE WHEN $a IS NOT NULL AND NOT isnan(CAST($a AS DOUBLE)) " +
        s"AND $b IS NOT NULL AND NOT isnan(CAST($b AS DOUBLE)) " +
        s"THEN 1 ELSE 0 END) AS BIGINT) AS n_$i"
    }.mkString(", ")
    val arms = pairs.zipWithIndex.map { case ((a, b), i) =>
      s"SELECT '$a' AS col_a, '$b' AS col_b, r_$i AS r0, n_$i AS n FROM s"
    }.mkString(" UNION ALL ")
    s"""WITH s AS (SELECT $aggs FROM lineitem),
        long AS ($arms),
        wp0 AS (SELECT col_a, col_b, n, r0,
            ABS(r0 * SQRT((n - 2) / (1.0 - r0 * r0))) AS x FROM long),
        wp1 AS (SELECT col_a, col_b, n, r0, x,
            1.0 / (1.0 + 0.2316419 * x) AS kk FROM wp0),
        wp AS (SELECT col_a, col_b, n, ROUND(r0, 6) AS r,
            ROUND(2.0 * (0.3989422804014327 * EXP(-0.5 * x * x) *
              (kk * (0.319381530 + kk * (-0.356563782 +
                kk * (1.781477937 + kk * (-1.821255978 +
                  kk * 1.330274429)))))), 6) AS p_value
          FROM wp1),
        rk AS (SELECT *, CAST(row_number() OVER (ORDER BY p_value,
            col_a, col_b) AS INT) AS bh_rank FROM wp),
        th AS (SELECT *, ROUND(0.05 * bh_rank / ${pairs.size}.0, 6)
            AS bh_threshold FROM rk),
        cr AS (SELECT MAX(CASE WHEN p_value <= bh_threshold
            THEN bh_rank END) AS c FROM th)
        SELECT col_a, col_b, n, r, p_value, bh_rank, bh_threshold,
          COALESCE(bh_rank <= cr.c, FALSE) AS significant
        FROM th, cr"""
  }

  /** Generated oracle for q227: the q156 chi-square/V template once per
    * declared pair, labeled and unioned. */
  private def cramersVSql: String = {
    val realPairs = Seq(
      ("l_returnflag", "l_linestatus", "l_returnflag", "l_linestatus"),
      ("l_returnflag", "l_linenum_cat", "l_returnflag",
        "CAST(l_linenumber AS VARCHAR)"),
      ("l_linestatus", "l_linenum_cat", "l_linestatus",
        "CAST(l_linenumber AS VARCHAR)"))
    realPairs.map { case (la, lb, ea, eb) =>
      s"""SELECT '$la' AS col_a, '$lb' AS col_b,
          ROUND(chi_obs + (n - e_obs), 6) AS chi2,
          (r - 1) * (c - 1) AS dof,
          ROUND(SQRT((chi_obs + (n - e_obs)) /
            (n * (LEAST(r, c) - 1))), 6) AS cramers_v
        FROM (
          WITH d AS (SELECT $ea AS a, $eb AS b FROM lineitem),
          cells AS (SELECT a, b, COUNT(*) AS n FROM d GROUP BY a, b),
          na AS (SELECT a, SUM(n) AS n_a FROM cells GROUP BY a),
          nb AS (SELECT b, SUM(n) AS n_b FROM cells GROUP BY b),
          nt AS (SELECT SUM(n) AS n_tot FROM cells)
          SELECT
            SUM(POW(n - CAST(n_a AS DOUBLE) * n_b / n_tot, 2) /
              (CAST(n_a AS DOUBLE) * n_b / n_tot)) AS chi_obs,
            SUM(CAST(n_a AS DOUBLE) * n_b / n_tot) AS e_obs,
            ANY_VALUE(n_tot) AS n,
            COUNT(DISTINCT a) AS r, COUNT(DISTINCT b) AS c
          FROM cells JOIN na USING (a) JOIN nb USING (b), nt)"""
    }.mkString(" UNION ALL ")
  }

  /** Generated oracle for q215: equi-depth binning + guarded binary
    * entropies per feature, mirroring [[graft.ml.InfoGain.infoGain]]. */
  private def infoGainSql: String = {
    val feats = Seq("l_quantity", "l_extendedprice", "l_discount")
    val edgeCols = feats.map { c =>
      s"list_transform(quantile_cont(CAST($c AS DOUBLE), " +
        s"[0.2, 0.4, 0.6, 0.8]), x -> ROUND(x, 6)) AS e_$c"
    }.mkString(", ")
    val arms = feats.map { c =>
      val bin = (1 to 4).map(j =>
        s"(CASE WHEN $c > e_$c[$j] THEN 1 ELSE 0 END)").mkString(" + ")
      s"SELECT '$c' AS f, $bin AS b, y FROM base, e"
    }.mkString(" UNION ALL ")
    def h(pos: String, n: String): String =
      s"(CASE WHEN $pos > 0 THEN -($pos / CAST($n AS DOUBLE)) * " +
        s"LN($pos / CAST($n AS DOUBLE)) ELSE 0 END + " +
        s"CASE WHEN $n - $pos > 0 THEN -(($n - $pos) / CAST($n AS DOUBLE)) * " +
        s"LN(($n - $pos) / CAST($n AS DOUBLE)) ELSE 0 END)"
    s"""WITH base AS (SELECT
          CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
          l_quantity, l_extendedprice, l_discount FROM lineitem),
        e AS (SELECT $edgeCols FROM base),
        long AS ($arms),
        cells AS (SELECT f, b, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos
          FROM long GROUP BY f, b),
        tot AS (SELECT f, CAST(SUM(n) AS BIGINT) AS nt,
            CAST(SUM(pos) AS BIGINT) AS post, COUNT(*) AS n_bins
          FROM cells GROUP BY f)
        SELECT f AS feature, n_bins,
          ROUND(${h("post", "nt")} -
            SUM(n / CAST(nt AS DOUBLE) * ${h("pos", "n")}), 6) AS info_gain
        FROM cells JOIN tot USING (f)
        GROUP BY f, n_bins, nt, post"""
  }

  /** Generated oracle for q206: the same six stats per shared numeric
    * lineitem column, base vs the post-1995 slice, unpivoted to the
    * [[graft.eda.Profile.profileCompare]] long shape. */
  private def profileCompareSql: String = {
    val cols = Seq("l_discount", "l_extendedprice", "l_linenumber",
      "l_orderkey", "l_partkey", "l_quantity", "l_suppkey", "l_tax")
    def side(name: String, pred: String): String =
      s"$name AS (SELECT CAST(COUNT(*) AS DOUBLE) AS rows_, " +
        cols.map { c =>
          s"CAST(COUNT($c) AS DOUBLE) AS n_$c, " +
            s"AVG(CAST($c AS DOUBLE)) AS mean_$c, " +
            s"stddev_samp(CAST($c AS DOUBLE)) AS std_$c, " +
            s"CAST(MIN($c) AS DOUBLE) AS min_$c, " +
            s"CAST(MAX($c) AS DOUBLE) AS max_$c"
        }.mkString(", ") + s" FROM lineitem $pred)"
    val arms = for {
      c <- cols
      m <- Seq("n", "n_null", "mean", "stddev", "min", "max")
    } yield {
      val (bv, uv) = m match {
        case "n"      => (s"b.n_$c", s"u.n_$c")
        case "n_null" => (s"b.rows_ - b.n_$c", s"u.rows_ - u.n_$c")
        case "mean"   => (s"b.mean_$c", s"u.mean_$c")
        case "stddev" => (s"b.std_$c", s"u.std_$c")
        case "min"    => (s"b.min_$c", s"u.min_$c")
        case "max"    => (s"b.max_$c", s"u.max_$c")
      }
      s"SELECT '$c' AS column_name, '$m' AS metric, " +
        s"ROUND($bv, 6) AS base_value, ROUND($uv, 6) AS curr_value, " +
        s"ROUND(ABS(CAST(($uv) - ($bv) AS DOUBLE)), 6) AS abs_change " +
        "FROM b, u"
    }
    s"WITH ${side("b", "")}, " +
      s"${side("u", "WHERE l_shipdate >= DATE '1995-01-01'")} " +
      arms.mkString(" UNION ALL ")
  }

  /** DSIR per-doc importance weights in portable SQL: unigram+bigram
    * bag, 16-bit md5 hex buckets, add-one smoothing — bit-identical to
    * [[graft.text.Dsir.importanceWeights]]. */
  private val dsirWeightsSql: String =
    """WITH tok AS (SELECT doc_id, source,
           list_filter(string_split_regex(lower(trim(text)), '\s+'),
             x -> length(x) > 0) AS t
         FROM documents),
       ng AS (SELECT doc_id, source, unnest(
           CASE WHEN len(t) < 2 THEN t
                ELSE t || [t[i] || ' ' || t[i+1] for i in range(1, len(t))] END) AS g
         FROM tok),
       bk AS (SELECT doc_id, source, substr(md5(g), 1, 4) AS b FROM ng),
       rcnt AS (SELECT b, COUNT(*) AS cr FROM bk GROUP BY b),
       tcnt AS (SELECT b, COUNT(*) AS ct FROM bk
         WHERE source IN ('src0', 'src1', 'src2') GROUP BY b),
       tot AS (SELECT (SELECT SUM(cr) FROM rcnt) AS nr,
                      (SELECT COALESCE(SUM(ct), 0) FROM tcnt) AS nt),
       llr AS (SELECT b,
           ln((COALESCE(ct, 0) + 1.0) / (nt + 65536.0)) -
           ln((cr + 1.0) / (nr + 65536.0)) AS w
         FROM rcnt LEFT JOIN tcnt USING (b), tot)
       SELECT doc_id, COUNT(*) AS n_ngrams, ROUND(AVG(w), 4) AS dsir_weight
       FROM bk JOIN llr USING (b) GROUP BY doc_id"""

  /** Shared oracle CTEs for the tag-catalog queries: the pseudo-
    * descriptor stack + the [[graft.functions.TagCatalog.propertyRules]]
    * catalog inlined as VALUES + the per-(id, tag) violation counts. */
  private val tagRulesSql: String =
    """props AS (
         SELECT p_partkey AS id, 'mw' AS property,
           CAST(80 + (p_partkey % 100) * 10 AS DOUBLE) AS value FROM part
         UNION ALL SELECT p_partkey, 'logp', CAST((p_size % 13) - 4 AS DOUBLE) FROM part
         UNION ALL SELECT p_partkey, 'hbd', CAST(p_partkey % 8 AS DOUBLE) FROM part
         UNION ALL SELECT p_partkey, 'hba', CAST(p_partkey % 14 AS DOUBLE) FROM part
         UNION ALL SELECT p_partkey, 'rotbonds', CAST(p_size % 15 AS DOUBLE) FROM part
         UNION ALL SELECT p_partkey, 'tpsa', CAST(p_partkey % 200 AS DOUBLE) FROM part),
       rules(tag, property, lo, hi, min_v, max_v) AS (VALUES
         ('physchem:ro5_compliant', 'mw', -1e18, 500.0, 0, 1),
         ('physchem:ro5_compliant', 'logp', -1e18, 5.0, 0, 1),
         ('physchem:ro5_compliant', 'hbd', -1e18, 5.0, 0, 1),
         ('physchem:ro5_compliant', 'hba', -1e18, 10.0, 0, 1),
         ('physchem:ro5_strict', 'mw', -1e18, 500.0, 0, 0),
         ('physchem:ro5_strict', 'logp', -1e18, 5.0, 0, 0),
         ('physchem:ro5_strict', 'hbd', -1e18, 5.0, 0, 0),
         ('physchem:ro5_strict', 'hba', -1e18, 10.0, 0, 0),
         ('physchem:beyond_ro5', 'mw', -1e18, 500.0, 1, 2),
         ('physchem:beyond_ro5', 'logp', -1e18, 5.0, 1, 2),
         ('physchem:veber_compliant', 'rotbonds', -1e18, 10.0, 0, 0),
         ('physchem:veber_compliant', 'tpsa', -1e18, 140.0, 0, 0),
         ('physchem:lead_like', 'mw', 150.0, 350.0, 0, 0),
         ('physchem:lead_like', 'logp', -3.0, 3.5, 0, 0),
         ('physchem:fragment_like', 'mw', -1e18, 300.0, 0, 0),
         ('physchem:fragment_like', 'logp', -1e18, 3.0, 0, 0),
         ('physchem:fragment_like', 'hbd', -1e18, 3.0, 0, 0),
         ('physchem:fragment_like', 'hba', -1e18, 3.0, 0, 0),
         ('physchem:fragment_like', 'rotbonds', -1e18, 3.0, 0, 0),
         ('curation:exclude:mw_too_low', 'mw', 100.0, 1e18, 1, 1),
         ('curation:exclude:mw_too_high', 'mw', -1e18, 900.0, 1, 1)),
       viol AS (
         SELECT id, tag, ANY_VALUE(min_v) AS min_v, ANY_VALUE(max_v) AS max_v,
           SUM(CASE WHEN value IS NULL OR value < lo OR value > hi
             THEN 1 ELSE 0 END) AS v
         FROM props JOIN rules USING (property) GROUP BY id, tag)"""
}
