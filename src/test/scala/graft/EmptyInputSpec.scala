package graft

import graft.eda.{Histogram, Robust, SkewReport}
import graft.ml.Stats
import graft.operators.{Cooccur, Decay}
import graft.text.{Bm25, TfIdf}
import org.apache.spark.sql.functions._

/** Empty / all-null inputs return schema-correct empty (or neutral)
  * results instead of driver-side NPEs — the library contract a
  * pipeline stage can rely on when an upstream filter drains a
  * partition-day to nothing. */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val noNums = Seq.empty[(Long, Option[Double])].toDF("id", "x")

  test("histograms: empty and all-null inputs give zero-row results") {
    assert(Histogram.equiWidth(noNums, "x", 10).count() === 0)
    assert(Histogram.equiDepth(noNums, "x", 4).count() === 0)
    val allNull = Seq((1L, None: Option[Double])).toDF("id", "x")
    assert(Histogram.equiWidth(allNull, "x", 10).count() === 0)
    assert(Histogram.equiDepth(allNull, "x", 4).count() === 0)
  }

  test("madOutliers: all-null column flags nothing, keeps every row") {
    val allNull = Seq((1L, None: Option[Double]), (2L, None)).toDF("id", "x")
    val out = Robust.madOutliers(allNull, "x")
    assert(out.count() === 2)
    assert(out.filter(col("is_outlier")).count() === 0)
  }

  test("bm25: empty corpus returns no hits for any query") {
    val qs = Seq((1L, "some query text")).toDF("qid", "text")
    assert(Bm25.search(noDocs, "doc_id", "text", qs, "qid", "text").count() === 0)
  }

  test("tfidf: empty corpus produces no vectors and no pairs") {
    assert(TfIdf.vectors(noDocs, "doc_id", "text").count() === 0)
    assert(TfIdf.similarPairs(noDocs, "doc_id", "text", 0.5).count() === 0)
  }

  test("skew report and rolling folds: empty input → zero rows") {
    val empty = Seq.empty[Long].toDF("k")
    assert(SkewReport.keySkew(empty, "k").count() === 0)
    val noEvents = Seq.empty[(Long, java.sql.Timestamp)].toDF("u", "t")
    assert(Stats.rollingOriginFolds(noEvents, "t", 3).count() === 0)
  }

  test("cooccur and decay: empty inputs are empty, not errors") {
    val noBaskets = Seq.empty[(Long, String)].toDF("b", "i")
    assert(Cooccur.itemPairs(noBaskets, "b", "i", 1).count() === 0)
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("u", "t", "v")
    assert(Decay.decayedAggregate(noEvents, "u", "t", "v",
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7.0).count() === 0)
  }

  test("wave 14-17 operators: empty inputs don't NPE the driver pulls") {
    val noEv = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("u", "ts", "value")
    assert(graft.operators.Forecast.acf(noEv, "ts", "value").count() === 0)
    assert(graft.operators.Forecast.ewma(noEv, "ts", "value").count() === 0)
    assert(graft.ml.Stats.purgedRollingFolds(noEv, "ts", 3, 1000L)
      .count() === 0)
    val noKeyed = Seq.empty[(Long, Double, String)].toDF("k", "p", "s")
    val diff = graft.eda.Profile.snapshotDiff(noKeyed, noKeyed, "k",
      Seq("p", "s")).collect()
    assert(diff.length === 6 && diff.forall(_.getLong(1) === 0L))
    val keys = graft.eda.Profile.keyCandidates(noKeyed, Seq("k", "p"))
      .collect()
    assert(keys.length === 2 && keys.forall(_.getLong(1) === 0L))
  }
}
