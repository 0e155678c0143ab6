package graft

import graft.eda.StatTests
import graft.ml.EvalExtras
import graft.operators.Forecast
import graft.text.{Gopher, VocabStats}
import org.apache.spark.sql.functions._

/** Wave-34 kernels: Gopher funnel, tail dependence, two-way ANOVA,
  * split-half reliability, vocab coverage, OOV rate. */
class WaveThirtyFourSpec extends SparkSpec {
  import spark.implicits._

  test("gopher funnel: a healthy doc passes, a stub fails word count") {
    val good = (("the quick brown fox and the lazy dog went to " * 6) +
      "have been with that crowd of familiar words every day").trim
    val docs = Seq((1L, "s1", good), (2L, "s1", "too short"))
      .toDF("doc_id", "source", "text")
    val r = Gopher.funnel(docs, "doc_id", "source", "text").head()
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Long]("pass_wordcount") === 1L)
    assert(r.getAs[Long]("pass_stopwords") >= 1L)
    assert(r.getAs[Long]("pass_all") === 1L)
    assert(r.getAs[Double]("pass_rate") === 0.5)
  }

  test("tailDependence: engineered co-spikes lift above independence") {
    val rows = (1 to 10).flatMap { day =>
      val big = day >= 9
      val k = if (big) 5 else 1
      val v = if (big) 20.0 else 1.0
      Seq.fill(k)((f"2024-01-$day%02d 10:00:00", v))
    }
    val df = rows.toDF("s", "value")
      .select(to_timestamp(col("s")).as("ts"), col("value"))
    val r = Forecast.tailDependence(df, "ts", "value", q = 0.8).head()
    assert(r.getAs[Long]("n_days") === 10L)
    assert(r.getAs[Long]("n_joint") === 2L)
    assert(r.getAs[Double]("joint_share") === 0.2)
    assert(r.getAs[Double]("lift") === 5.0)
  }

  test("twoWayAnova: additive design has zero interaction F") {
    val rows = for {
      a <- Seq("a1", "a2"); b <- Seq("b1", "b2"); rep <- 1 to 4
    } yield {
      val base = (if (a == "a2") 10.0 else 0.0) +
        (if (b == "b2") 5.0 else 0.0)
      (a, b, base + (if (rep % 2 == 0) 1.0 else -1.0))
    }
    val r = StatTests.twoWayAnova(rows.toDF("a", "b", "v"),
      "a", "b", "v").head()
    assert(r.getAs[Long]("n") === 16L)
    assert(r.getAs[Double]("f_interaction") === 0.0)
    assert(r.getAs[Double]("f_a") > r.getAs[Double]("f_b"))
    assert(r.getAs[Double]("f_b") > 10.0)
  }

  test("splitHalfReliability: constant-per-user metric is perfectly reliable") {
    val rows = for (u <- 1 to 10; item <- 1 to 6)
      yield (u, item, u * 2.0)
    val r = EvalExtras.splitHalfReliability(
      rows.toDF("id", "item", "v"), "id", "item", "v").head()
    assert(r.getAs[Long]("n_entities") === 10L)
    assert(r.getAs[Double]("half_corr") === 1.0)
    assert(r.getAs[Double]("spearman_brown") === 1.0)
  }

  test("vocabCoverage: hand-built tiers with a partial boundary") {
    // freqs: a:5, b:3, c:1, d:1 -> 10 tokens, 4 terms
    val docs = Seq(("a a a a a b b b c d"))
      .toDF("text")
    val rows = VocabStats.vocabCoverage(docs, "text",
      ks = Seq(1, 2, 3, 10)).orderBy("k").collect()
    val cov = rows.map(r => r.getAs[Int]("k") ->
      r.getAs[Double]("coverage")).toMap
    assert(cov(1) === 0.5)
    assert(cov(2) === 0.8)
    assert(cov(3) === 0.9)
    assert(cov(10) === 1.0)
    assert(rows.head.getAs[Long]("n_tokens") === 10L)
  }

  test("oovRate: half the eval tokens are unseen") {
    val docs = Seq((1L, "alpha beta gamma delta"),
      (50L, "alpha beta zork blarg"))
      .toDF("doc_id", "text")
    val r = VocabStats.oovRate(docs, "doc_id", "text",
      isEval = col("doc_id") % 50 === 0).head()
    assert(r.getAs[Long]("n_eval_tokens") === 4L)
    assert(r.getAs[Long]("n_eval_types") === 4L)
    assert(r.getAs[Double]("oov_token_rate") === 0.5)
    assert(r.getAs[Double]("oov_type_rate") === 0.5)
  }
}
