package graft

import graft.sources.SyntheticData
import org.apache.spark.sql.functions._

/** Synthetic dataset generators (utils/synthetic_data_generator.py).
  * Noise is hash-derived, so every assertion here is on a fully
  * deterministic frame — including across partitioning changes. */
class SyntheticDataSpec extends SparkSpec {

  test("mlData: shapes, determinism across partitioning, classification labels") {
    val df = SyntheticData.mlData(spark, 500, 4)
    assert(df.columns.toSeq ==
      Seq("feature_1", "feature_2", "feature_3", "feature_4", "target"))
    assert(df.count() == 500)
    // features ~ N(0,1): mean near 0, std near 1
    val s = df.agg(avg("feature_1"), stddev("feature_1")).head()
    assert(math.abs(s.getDouble(0)) < 0.15 && math.abs(s.getDouble(1) - 1.0) < 0.15)
    // partition-independent: identical content at different parallelism
    val again = SyntheticData.mlData(spark, 500, 4).repartition(13)
    assert(df.exceptAll(again).isEmpty && again.exceptAll(df).isEmpty)
    val cls = SyntheticData.mlData(spark, 300, 4, "classification")
    val labels = cls.select("target").distinct().collect().map(_.getInt(0)).toSet
    assert(labels.subsetOf(Set(0, 1)) && labels.size == 2)
    intercept[IllegalArgumentException](SyntheticData.mlData(spark, 10, 4, "nope"))
  }

  test("confidenceData: dense/sparse segments, coincident packs, sorted") {
    val df = SyntheticData.confidenceData(spark, 2000)
    assert(df.count() == 2000 * 7 / 8 + 2000 / 8 + 18) // dense + sparse + packs
    val xs = df.select("feature_1").collect().map(_.getDouble(0))
    assert(xs.min >= -10.0 - 1e-9 && xs.max <= 10.0 + 1e-9)
    assert(xs.sameElements(xs.sorted))
    // the sparse tail [5,10] holds ~1/8 of points, the dense head the rest
    assert(xs.count(_ > 5.0) < xs.length / 4)
    // coincident x packs present (6 rows at each of -0.5, 0, 0.5)
    assert(xs.count(_ == 0.5) >= 6)
  }

  test("regressionWithVaryingNoise: target tracks feature + 1000 within 10%") {
    val df = SyntheticData.regressionWithVaryingNoise(spark, 1000)
    val bad = df.filter(
      abs(col("target") - col("feature") - 1000.0) > col("feature") * 0.1 + 1e-6)
    assert(bad.count() == 0)
  }

  test("withCorrelatedColumn: achieves the (fudged) target correlation and range") {
    val base = SyntheticData.mlData(spark, 2000, 2).select(col("feature_1").as("x"))
    val out = SyntheticData.withCorrelatedColumn(base, "x", 0.6, 10, 20, "y")
    val r = out.agg(corr("x", "y"), min("y"), max("y")).head()
    assert(r.getDouble(0) > 0.25 && r.getDouble(0) < 0.75, s"corr=${r.getDouble(0)}")
    assert(r.getDouble(1) >= 10.0 - 1e-9 && r.getDouble(2) <= 20.0 + 1e-9)
    // negative correlation flips the sign
    val neg = SyntheticData.withCorrelatedColumn(base, "x", -0.6, 0, 1, "y")
      .agg(corr("x", "y")).head().getDouble(0)
    assert(neg < -0.25)
  }

  test("review: tied source values still draw distinct noise") {
    // a discrete source column (6 distinct values over 600 rows): noise
    // hashed from the source value ALONE would collapse the output to 6
    // distinct values with rank correlation 1
    val disc = spark.range(600).selectExpr("id", "CAST(id % 6 AS DOUBLE) AS grade")
    val out = SyntheticData.withCorrelatedColumn(disc, "grade", 0.2, 0, 100, "score")
    val distinctScores = out.select("score").distinct().count()
    assert(distinctScores > 100, s"only $distinctScores distinct scores")
    val r = out.agg(corr("grade", "score")).head().getDouble(0)
    assert(r > 0.0 && r < 0.6, s"corr=$r")
  }

  test("personData: schema, ranges, outliers, nullable food, 2022 dates") {
    val df = SyntheticData.personData(spark, 100)
    assert(df.count() == 100)
    val cols = df.columns.toSeq
    assert(Seq("id", "name", "height", "weight", "salary", "age", "iq_score",
      "food", "likes_dogs", "date").forall(cols.contains), cols.mkString(","))
    val r = df.agg(min("age"), max("age"), min("weight"), max("weight"),
      sum(when(col("salary") >= 200000, 1).otherwise(0)),
      sum(when(col("food").isNull, 1).otherwise(0))).head()
    assert(r.getInt(0) >= 20 && r.getInt(1) <= 80)
    assert(r.getDouble(2) >= 100 - 1e-6 && r.getDouble(3) <= 300 + 1e-6)
    assert(r.getLong(4) >= 4) // the four bumped outliers
    assert(r.getLong(5) > 0 && r.getLong(5) < 30) // ~10% nulls
    val foods = df.select("food").filter(col("food").isNotNull)
      .distinct().collect().map(_.getString(0)).toSet
    assert(foods.subsetOf(Set("pizza", "tacos", "steak", "sushi")))
    val years = df.select(year(col("date"))).distinct().collect().map(_.getInt(0)).toSet
    assert(years == Set(2022))
  }
}
