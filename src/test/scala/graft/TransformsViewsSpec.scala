package graft

import graft.core.Tables
import graft.ml.Metrics
import graft.transforms.Transforms
import graft.views.Views
import org.apache.spark.sql.functions._

class TransformsViewsSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeColumnNames lowercases and sanitizes") {
    val df = Seq((1, 2)).toDF("My Col!", "OK_name-2")
    assert(Transforms.normalizeColumnNames(df).columns.toSeq == Seq("my_col_", "ok_name-2"))
  }

  test("clampFeatureTypes: bool to int, timestamp to ISO string") {
    val df = Seq((true, java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))).toDF("b", "ts")
    val out = Transforms.clampFeatureTypes(df)
    assert(out.schema("b").dataType.typeName == "integer")
    assert(out.head().getString(1) == "2024-01-02T03:04:05.000Z")
  }

  test("temporalSplit: unparseable/null to train, cutoff respected") {
    val df = Seq(Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      Some(java.sql.Timestamp.valueOf("2024-06-01 00:00:00")), None).toDF("ts")
    val (train, test0) = Transforms.temporalSplit(df, "ts", "2024-03-01 00:00:00")
    assert(train.count() == 2) // jan + null
    assert(test0.count() == 1)
  }

  test("stratifiedSplit covers all rows exactly once") {
    val df = Tables.load(spark, sf, "customer")
    val (train, test0) = Transforms.stratifiedSplit(df, "c_mktsegment", 0.8, "c_custkey")
    assert(train.count() + test0.count() == df.count())
    assert(train.join(test0, Seq("c_custkey"), "inner").count() == 0)
  }

  test("oneHot gate and encoding; undummify round-trips") {
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "cat")
    val enc = Transforms.oneHot(df, "cat")
    assert(enc.columns.toSet == Set("id", "cat_a", "cat_b"))
    val dec = Transforms.undummify(enc, "cat")
    assert(dec.orderBy("id").select("cat").as[String].collect().toSeq == Seq("a", "b", "a"))
    // gate: single category → unchanged
    val one = Seq((1, "x"), (2, "x")).toDF("id", "cat")
    assert(Transforms.oneHot(one, "cat").columns.toSeq == Seq("id", "cat"))
  }

  test("sampleRows clamps to target with fudge") {
    val df = Tables.load(spark, sf, "lineitem")
    val n = Transforms.sampleRows(df, targetRows = 100).count()
    assert(n <= 100 && n > 50)
  }

  test("snapshot keeps exactly one latest row per id") {
    val ev = Tables.load(spark, sf, "events")
    val snap = Views.snapshot(ev, "user_id", Seq(col("ts").desc, col("event_id").desc))
    assert(snap.count() == ev.select("user_id").distinct().count())
  }

  test("trainingView: defaults applied, excluded rows dropped") {
    val base = Seq((1, "a"), (7, "b"), (14, "c")).toDF("id", "v")
    val roles = Seq((14, true, true, 2.0)).toDF("id", "exclude", "validation", "sample_weight")
    val tv = Views.trainingView(base, roles, "id").collect()
    assert(tv.length == 2) // id=14 excluded
    val r1 = tv.find(_.getInt(0) == 1).get
    assert(r1.getAs[Double]("sample_weight") == 1.0)
    assert(!r1.getAs[Boolean]("validation"))
  }

  test("joinView drops overlapping columns from base") {
    val base = Seq((1, "old", 10)).toDF("id", "name", "x")
    val supp = Seq((1, "new")).toDF("id", "name")
    val out = Views.joinView(base, supp, "id")
    assert(out.head().getAs[String]("name") == "new")
    assert(out.columns.count(_ == "name") == 1)
  }

  test("regression metrics: perfect prediction gives rmse 0, r2 1") {
    val df = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("y", "p")
    val m = Metrics.regressionMetrics(df, "y", "p").head()
    assert(m.getDouble(0) == 0.0)
    assert(m.getDouble(3) == 1.0)
  }

  test("classificationReport: perfect prediction gives f1 1 per class") {
    val df = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("y", "p")
    val rep = Metrics.classificationReport(df, "y", "p").collect()
    assert(rep.forall(_.getAs[Double]("f1") == 1.0))
  }

  test("resolveNames rewrites whole words only") {
    val out = Views.resolveNames("SELECT * FROM fs JOIN fs_other ON fs.id = fs_other.id",
      Map("fs" -> "db.fs_physical"))
    assert(out == "SELECT * FROM db.fs_physical JOIN fs_other ON db.fs_physical.id = fs_other.id")
  }

  test("contentHash: order-independent, content-sensitive") {
    val a = Seq((1, "x"), (2, "y")).toDF("id", "v")
    val b = Seq((2, "y"), (1, "x")).toDF("id", "v")  // same rows, other order
    val c = Seq((1, "x"), (2, "z")).toDF("id", "v")
    assert(Transforms.contentHash(a) == Transforms.contentHash(b.repartition(3)))
    assert(Transforms.contentHash(a) != Transforms.contentHash(c))
  }

  test("binaryAccuracy / classifier residuals / meta merge (inference loop)") {
    import graft.ml.Metrics
    val df = Seq(
      ("cat", "cat"), ("cat", "dog"), ("dog", "dog"), ("dog", "cat"),
      ("cat", "cat"), ("dog", "dog")).toDF("y", "pred")
    // positive = cat: agree on side in 4/6 rows
    assert(Metrics.binaryAccuracy(df, "y", "pred", Seq("cat"))
      .head().getDouble(0) == math.rint(4.0 / 6 * 1e6) / 1e6)
    val res = Metrics.withClassifierResiduals(
      Seq(("cat", "dog"), ("dog", "dog"), ("bird", "cat")).toDF("y", "pred"),
      "y", "pred", Seq("cat", "dog")).collect()
    assert(res(0).getInt(2) == 1 && res(0).getInt(3) == 1)  // dog(1)-cat(0)
    assert(res(1).getInt(2) == 0)
    assert(res(2).isNullAt(2), "unknown label maps to null like pandas map")
    val oof = Seq((1, 0.5)).toDF("id", "prediction")
    val fs = Seq((1, "CCO", "x")).toDF("id", "smiles", "prediction")
    val merged = Metrics.mergeMetaColumns(oof, fs, "id", Seq("smiles", "prediction"))
    assert(merged.columns.toSeq == Seq("id", "prediction", "smiles"))
    assert(merged.head().getString(2) == "CCO")
  }

  test("rocAuc: perfect separation 1.0, random 0.5-ish, ties averaged") {
    import graft.ml.Metrics
    val perfect = Seq((0, 0.1), (0, 0.2), (1, 0.8), (1, 0.9)).toDF("y", "s")
    assert(Metrics.rocAuc(perfect, "y", "s").head().getDouble(0) == 1.0)
    val inverted = Seq((1, 0.1), (1, 0.2), (0, 0.8), (0, 0.9)).toDF("y", "s")
    assert(Metrics.rocAuc(inverted, "y", "s").head().getDouble(0) == 0.0)
    // all scores tied → AUC exactly 0.5 (tie-aware average ranks)
    val tied = Seq((0, 0.5), (1, 0.5), (0, 0.5), (1, 0.5)).toDF("y", "s")
    assert(Metrics.rocAuc(tied, "y", "s").head().getDouble(0) == 0.5)
  }

  test("classificationMetricsFull: per-class OvR AUC + weighted all row") {
    import graft.ml.Metrics
    // 2 classes; proba perfectly ranks class membership → per-class AUC 1
    val df = Seq(
      ("a", "a", 0.9, 0.1), ("a", "a", 0.8, 0.2),
      ("b", "b", 0.2, 0.8), ("b", "a", 0.3, 0.7))
      .toDF("y", "prediction", "a_proba", "b_proba")
    val out = Metrics.classificationMetricsFull(df, "y", "prediction", Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b", "all"))
    assert(out("a").getAs[Double]("roc_auc") == 1.0)
    assert(out("b").getAs[Double]("roc_auc") == 1.0)
    assert(out("a").getAs[Double]("recall") == 1.0)
    assert(out("b").getAs[Double]("recall") == 0.5)
    val all = out("all")
    assert(all.getAs[Long]("support") == 4)
    assert(all.getAs[Double]("recall") == 0.75) // (1.0·2 + 0.5·2)/4
    // without proba columns the auc column is null, rest intact
    val noProba = Metrics.classificationMetricsFull(
      df.drop("a_proba", "b_proba"), "y", "prediction", Seq("a", "b"))
    assert(noProba.filter(col("roc_auc").isNotNull).count() == 0)
    assert(noProba.count() == 3)
  }

  test("confusionMatrixPivot: wide, zero-filled, model-label ordered") {
    import graft.ml.Metrics
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b")).toDF("y", "p")
    val cm = Metrics.confusionMatrixPivot(df, "y", "p", Seq("a", "b", "c"))
      .orderBy("label").collect()
    assert(cm.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(cm(0).getLong(1) == 1 && cm(0).getLong(2) == 1) // a→a, a→b
    assert(cm(1).getLong(2) == 1)                          // b→b
    assert(cm(2).getLong(1) == 0 && cm(2).getLong(3) == 0) // c row all zero
  }

  test("confidenceProfile: per-quantile accuracy, monotone-friendly shape") {
    import graft.ml.Metrics
    // confidence perfectly predicts correctness: high mp → correct
    val df = (1 to 100).map { i =>
      val mp = i / 100.0
      val correct = mp > 0.5
      ("pos", if (correct) "pos" else "neg", mp)
    }.toDF("y", "pred", "mp")
    val prof = Metrics.confidenceProfile(df, "y", "pred", "mp", Seq("pos"), 10)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(prof.size == 10)
    assert(prof(1) == 0.0 && prof(10) == 1.0)
  }

  test("quantileSplitRanged: no window / no single-partition exchange in plan") {
    val df = graft.core.Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_acctbal")
    val ranged = Transforms.quantileSplitRanged(df, "c_acctbal", 4)
    // ntile's plan has Window + Exchange SinglePartition — the scale
    // killer VERDICT r1 flagged; the ranged plan must have neither
    val ntilePlan = Transforms.quantileSplit(df, "c_acctbal", 4)
      .queryExecution.executedPlan.toString
    assert(ntilePlan.contains("Window") && ntilePlan.contains("SinglePartition"))
    val plan = ranged.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SinglePartition"), plan)
    // all four buckets populated, sizes within sketch tolerance
    val counts = ranged.groupBy("quantile").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(1, 2, 3, 4))
    val n = counts.values.sum
    assert(counts.values.forall(c => math.abs(c - n / 4.0) <= n * 0.05))
  }

  test("quantileSplitRanged: exact edges, nulls land in bucket 1, n<2 rejected") {
    val df = Seq[(Int, java.lang.Double)](
      (1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0), (5, null)).toDF("id", "v")
    val out = Transforms.quantileSplitRanged(df, "v", 2, exact = true)
      .orderBy("id").collect().map(_.getInt(2)).toSeq
    // exact median of 1..4 = 2.5 → ids 1,2 bucket 1; 3,4 bucket 2; null → 1
    assert(out == Seq(1, 1, 2, 2, 1))
    intercept[IllegalArgumentException] {
      Transforms.quantileSplitRanged(df, "v", 1)
    }
  }
}
