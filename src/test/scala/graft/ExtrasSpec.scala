package graft

import graft.core.Tables
import graft.eda.Eda
import graft.ml.Models
import graft.proximity.{Analytics, Proximity}
import graft.transforms.Transform
import graft.views.Joins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("valueCounts collapses to 5 rows when every value is unique") {
    val unique = (1 to 50).map(i => s"v$i").toDF("c")
    assert(Eda.valueCounts(unique, "c").count() == 5)
    val repeated = Seq("a", "a", "b").toDF("c")
    assert(Eda.valueCounts(repeated, "c", k = 2).count() == 4)
  }

  test("saltedJoin equals plain join on skewed data") {
    val left = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i)).toDF("k", "v")
    val right = Seq((1L, "hot"), (2L, "cold")).toDF("k", "tag")
    val plain = left.join(right, Seq("k")).count()
    val salted = Joins.saltedJoin(left, right, "k", buckets = 8).count()
    assert(salted == plain)
  }

  test("Joins.exclude behaves as anti-join") {
    val df = Seq(1, 2, 3, 4).toDF("k")
    val bad = Seq(2, 4).toDF("k")
    assert(Joins.exclude(df, bad, "k").as[Int].collect().sorted.toSeq == Seq(1, 3))
  }

  test("Transform template runs pre -> impl -> post in order") {
    val t = new Transform[Seq[Int], Seq[Int]] {
      override def pre(in: Seq[Int]) = in.filter(_ > 0)
      def impl(in: Seq[Int]) = in.map(_ * 2)
      override def post(out: Seq[Int]) = out.sorted
    }
    assert(t.transform(Seq(3, -1, 1)) == Seq(2, 6))
  }

  test("featureSpider: neighborhood prediction and error") {
    val e = Tables.load(spark, sf, "embeddings")
      .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
      .filter(col("vec_id") < 60)
    val nn = Proximity.knnJoin(e, e, "vec_id", "embedding", 4, Proximity.euclidean)
    val fs = Analytics.featureSpider(nn, e, "vec_id", "label", gradientCut = 1e18)
    val r = fs.head()
    val expected = math.abs(r.getAs[Double]("target") - r.getAs[Double]("knn_prediction"))
    assert(math.abs(r.getAs[Double]("knn_error") - expected) < 1e-9)
    assert(fs.filter(col("high_gradient")).count() == 0) // cut at infinity
  }

  test("multiTaskAlignment: full coverage and symmetric-free pairs") {
    val li = Tables.load(spark, sf, "lineitem")
    val mta = Analytics.multiTaskAlignment(li, Seq("l_quantity", "l_discount", "l_tax"))
    assert(mta.count() == 3)
    assert(mta.agg(min("coverage")).head().getDouble(0) == 1.0)
  }

  test("uqIntervals: width floored by global residual std, bounds bracket prediction") {
    val rf: DataFrame = Seq(
      (1L, 10.0, 9.0, Some(0.5)), (2L, 20.0, 22.0, None))
      .toDF("id", "target", "prediction", "knn_target_std")
    val uq = Models.uqIntervals(rf, z = 2.0)
    uq.collect().foreach { r =>
      assert(r.getAs[Double]("pred_lower") < r.getAs[Double]("prediction"))
      assert(r.getAs[Double]("pred_upper") > r.getAs[Double]("prediction"))
    }
  }

  test("connectedComponents: chains merge, separate clusters stay apart") {
    import graft.dedup.Components
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comps = Components.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(1L) == 1L && comps(2L) == 1L && comps(3L) == 1L)
    assert(comps(10L) == 10L && comps(11L) == 10L)
  }

  test("dedupByPairs keeps one canonical row per cluster plus singletons") {
    import graft.dedup.Components
    val df = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Components.dedupByPairs(df, "id", pairs).as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 10L, 99L))
  }

  test("neighborhoodDisagreement flags minority-label rows") {
    import graft.ml.Noise
    import graft.proximity.Proximity
    // 5 points clustered at ~0 labeled A (one mislabeled B), far point C
    val df = Seq(
      (1L, Seq(0.0, 0.0), "A"), (2L, Seq(0.1, 0.0), "A"), (3L, Seq(0.0, 0.1), "A"),
      (4L, Seq(0.1, 0.1), "B"), (5L, Seq(0.05, 0.05), "A"),
      (6L, Seq(100.0, 100.0), "C")).toDF("id", "vec", "label")
    val nn = Proximity.knnJoin(df, df, "id", "vec", 3, Proximity.euclidean)
    val out = Noise.neighborhoodDisagreement(nn, df, "id", "label")
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("noisy")).toMap
    assert(out(4L))   // the mislabeled point disagrees with its A neighborhood
    assert(!out(1L))
  }

  test("chem fingerprint CSV roundtrip is lossless; tanimoto identities") {
    import graft.functions.Chem
    val df = Seq((1L, Seq(0, 3, 0, 1)), (2L, Seq(0, 3, 0, 1)), (3L, Seq(1, 0, 2, 0)))
      .toDF("id", "fp")
    val rt = df.withColumn("csv", Chem.fingerprintToCsv(col("fp")))
      .withColumn("back", Chem.parseFingerprint(col("csv")))
    assert(rt.filter(col("fp") =!= col("back")).count() == 0)
    val sims = rt.crossJoin(rt.filter(col("id") === 1).select(col("fp").as("fp1")))
      .select(col("id"), Chem.tanimoto(col("fp"), col("fp1")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sims(2L) == 1.0)   // identical fingerprints
    assert(sims(3L) == 0.0)   // disjoint count support
    assert(Chem.withParsedFingerprint(
      Seq(Tuple1("1,2,x")).toDF("fp"), "fp", 3).head().isNullAt(1))
  }
}
