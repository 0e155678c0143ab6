package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic dataset generators — the reference's SyntheticDataGenerator
  * (utils/synthetic_data_generator.py:22-370: ml_data, confidence_data,
  * regression_with_varying_noise, person_data,
  * generate_correlated_series), used throughout its examples to onboard
  * test artifacts.
  *
  * Noise here is NOT `randn(seed)` (whose stream depends on the physical
  * partition layout): uniforms derive from a murmur hash of the row id
  * and normals via Box-Muller on top, so a generated table is
  * bit-identical at any parallelism — the repo-wide "no RNG at runtime"
  * rule. Distributions match the reference's shapes; the streams differ
  * from numpy's, as they already do between any two engines.
  */
object SyntheticData {

  /** Deterministic uniform in (0, 1) from (id, seed) — codegen'd hash,
    * partition-independent. */
  private def seededUniform(id: Column, seed: Int): Column =
    (pmod(hash(id, lit(seed)).cast("long"), lit(1000000L)).cast("double") + 0.5) /
      1000000.0

  /** Deterministic standard normal via Box-Muller over two hash uniforms. */
  private def seededNormal(id: Column, seed: Int): Column =
    sqrt(lit(-2.0) * log(seededUniform(id, seed))) *
      cos(lit(2.0 * math.Pi) * seededUniform(id, seed + 7919))

  /** ml_data (synthetic_data_generator.py:22-44): n features, the first
    * `nFeatures - 2` informative (sklearn's make_regression /
    * make_classification shape — informative weights in (0, 100), the
    * rest noise-only). Regression target is the linear combination;
    * classification thresholds its sigmoid at 0.5. */
  def mlData(spark: SparkSession, nSamples: Int = 1000, nFeatures: Int = 4,
             targetType: String = "regression", seed: Int = 42): DataFrame = {
    require(nFeatures >= 2, "nFeatures must be >= 2")
    val rng = new scala.util.Random(seed)
    val weights = Seq.fill(math.max(nFeatures - 2, 1))(rng.nextDouble() * 100.0)
    val base = spark.range(nSamples.toLong)
    val withFeatures = (0 until nFeatures).foldLeft(base.toDF()) { (d, i) =>
      d.withColumn(s"feature_${i + 1}", round(seededNormal(col("id"), seed + i), 6))
    }
    val combo = weights.zipWithIndex
      .map { case (w, i) => col(s"feature_${i + 1}") * w }
      .reduce(_ + _)
    val out = targetType match {
      case "regression" => withFeatures.withColumn("target", round(combo, 6))
      case "classification" =>
        withFeatures.withColumn("target",
          (lit(1.0) / (lit(1.0) + exp(-combo / 100.0)) > 0.5).cast("int"))
      case other => throw new IllegalArgumentException(s"Unknown target_type: $other")
    }
    out.drop("id")
  }

  /** confidence_data (synthetic_data_generator.py:47-101): evenly spaced
    * x in [-10, 5], increasingly sparse in [5, 10], a log-shaped 'S'
    * target with |x|-scaled noise, plus three fixed coincident-x point
    * packs that exercise IQR handling downstream. Sorted by feature. */
  def confidenceData(spark: SparkSession, nSamples: Int = 2000,
                     seed: Int = 42): DataFrame = {
    val nEven = nSamples * 7 / 8
    val nSparse = nSamples / 8
    val even = spark.range(nEven.toLong).select(
      (lit(-10.0) + col("id") * (15.0 / (nEven - 1))).as("x"), col("id"))
    val sparse = spark.range(nSparse.toLong).select(
      (lit(5.0) + pow(col("id") / (nSparse - 1.0), 2) * 5.0).as("x"),
      (col("id") + nEven).as("id"))
    val eps = 1e-6
    val xAdj = when(col("x") >= 0, col("x") + 1 + eps).otherwise(-col("x") + 1 + eps)
    val shaped = even.unionByName(sparse)
      .withColumn("target",
        when(col("x") >= 0, log(xAdj) / math.log(100.0))
          .otherwise(-log(xAdj) / math.log(100.0)) +
          seededNormal(col("id"), seed) * 0.02 * abs(col("x")))
      .select(col("x").as("feature_1"), round(col("target"), 6).as("target"))
    // three packs of coincident x values with widening y pairs
    val coincident = (0 until 3).flatMap { i =>
      val delta = 0.1 + 0.05 * i
      // each x position pairs with ONE y offset: (-0.5, -0.1), (0, 0),
      // (0.5, 0.1), two rows (±delta) apiece — 6 points per pack
      for ((x, off) <- Seq(-0.5 -> -0.1, 0.0 -> 0.0, 0.5 -> 0.1);
           s <- Seq(-1, 1))
        yield (x, s * delta + off)
    }
    import spark.implicits._
    shaped.unionByName(coincident.toDF("feature_1", "target"))
      .orderBy("feature_1", "target")
  }

  /** regression_with_varying_noise (synthetic_data_generator.py:103-121):
    * target = feature + 1000 + feature·U(−0.1, 0.1) — absolute noise
    * grows with the feature, the UQ-model test shape. */
  def regressionWithVaryingNoise(spark: SparkSession, nSamples: Int = 1000,
                                 seed: Int = 42): DataFrame =
    spark.range(nSamples.toLong).select(
      col("id").cast("double").as("feature"),
      round(col("id") + 1000.0 +
        col("id") * (seededUniform(col("id"), seed) * 0.2 - 0.1), 6).as("target"))

  /** generate_correlated_series (synthetic_data_generator.py:344-370):
    * append `outCol` with Pearson correlation ≈ `targetCorr` to `srcCol`,
    * rescaled into [minVal, maxVal]. Two bounded aggregates (source
    * mean/std, generated min/max) become broadcast literals — the
    * repo-wide two-phase-literal pattern. */
  def withCorrelatedColumn(df: DataFrame, srcCol: String, targetCorr: Double,
                           minVal: Double, maxVal: Double, outCol: String,
                           seed: Int = 42): DataFrame = {
    val corr = targetCorr * 0.8 // the reference's fudge factor
    val s = df.agg(avg(col(srcCol)).as("mu"), stddev_pop(col(srcCol)).as("sd")).head()
    val (mu, sd) = (s.getDouble(0), if (s.isNullAt(1) || s.getDouble(1) == 0) 1.0
                                    else s.getDouble(1))
    // per-row noise id: hash of the WHOLE row, so tied source values
    // (discrete columns) still draw distinct noise; only fully identical
    // rows share a draw. Partition-independent like every other stream.
    val rowId = hash(df.columns.map(col) :+ lit(seed): _*)
    val noise = lit(mu) + lit(sd) * seededNormal(rowId, seed)
    val raw = lit(corr) * col(srcCol) + lit(1.0 - math.abs(corr)) * noise
    val staged = df.withColumn("__raw", raw)
    val b = staged.agg(min(col("__raw")), max(col("__raw"))).head()
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    val span = if (hi == lo) 1.0 else hi - lo
    staged.withColumn(outCol,
        lit(minVal) + (col("__raw") - lo) * ((maxVal - minVal) / span))
      .drop("__raw")
  }

  /** person_data (synthetic_data_generator.py:264-331): Id/Name, normal
    * heights, correlated weight/salary/age/IQ, salary outliers on the
    * top 4 rows, a salary-correlated food preference with ~10% nulls, an
    * IQ-correlated boolean, and an evenly spaced 2022 date column. */
  def personData(spark: SparkSession, rows: Int = 100, seed: Int = 42): DataFrame = {
    val foods = Seq("pizza", "tacos", "steak", "sushi")
    val base = spark.range(1, rows + 1L).select(
      col("id").cast("int").as("id"),
      concat(lit("Person "), col("id")).as("name"),
      round(lit(68.0) + lit(4.0) * seededNormal(col("id"), seed), 4).as("height"))
    val withW = withCorrelatedColumn(base, "height", 0.2, 100, 300, "weight", seed + 1)
    val withSal = withCorrelatedColumn(withW, "height", 0.3, 80000, 200000, "salary", seed + 2)
    // top-4 salary outliers bumped into [200k, 230k) (deterministic rank)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("salary"), asc("id"))
    val outliered = withSal
      .withColumn("__rk", row_number().over(w))
      .withColumn("salary",
        when(col("__rk") <= 4,
          lit(200000.0) + seededUniform(col("id"), seed + 3) * 30000.0)
          .otherwise(col("salary")))
      .drop("__rk")
    val withAge = withCorrelatedColumn(outliered, "salary", 0.5, 20, 80, "__age", seed + 4)
      .withColumn("age", round(col("__age")).cast("int")).drop("__age")
    val withIq = withCorrelatedColumn(withAge, "salary", -0.6, 100, 150, "iq_score", seed + 5)
    val withFood = withCorrelatedColumn(withIq, "salary", 1.0, -1.5, 4.4, "__food", seed + 6)
      .withColumn("food",
        when(seededUniform(col("id"), seed + 8) < 0.1, lit(null))
          .otherwise(element_at(
            array(foods.map(lit): _*),
            greatest(least(round(col("__food")).cast("int"), lit(foods.size - 1)),
              lit(0)) + 1)))
      .drop("__food")
    val withDogs = withCorrelatedColumn(withFood, "iq_score", 0.75, -0.5, 1.5, "__dog", seed + 7)
      .withColumn("likes_dogs",
        (greatest(least(round(col("__dog")).cast("int"), lit(1)), lit(0)) === 1))
      .drop("__dog")
    // evenly spaced dates over 2022 (the reference's date_range periods)
    withDogs.withColumn("date",
      timestamp_seconds(
        unix_timestamp(to_timestamp(lit("2022-01-01 00:00:00"))) +
          ((col("id") - 1) * (364.0 * 86400 / math.max(rows - 1, 1))).cast("long")))
  }
}
