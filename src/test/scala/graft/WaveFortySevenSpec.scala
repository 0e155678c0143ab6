package graft

import graft.ml.Stats
import graft.operators.Forecast
import graft.text.{CorpusStats, Distinctive}

/** Wave-47 kernels: grouped KM median, boilerplate mass, per-source
  * entropy rate, streak report. */
class WaveFortySevenSpec extends SparkSpec {
  import spark.implicits._

  test("kmMedianByGroup: first t with S <= 0.5; censored-only is null") {
    val df = (Seq((1L, 1), (2L, 1), (3L, 1), (4L, 1), (5L, 1)).map {
      case (t, e) => ("g", t, e) } ++
      Seq(("h", 5L, 0), ("h", 6L, 0))).toDF("ch", "t", "e")
    val r = Stats.kmMedianByGroup(df, "ch", "t", "e").collect()
    val g = r.find(_.getString(0) == "g").get
    assert(g.getAs[Long]("n_events") === 5L)
    assert(g.getAs[Long]("median_survival") === 3L) // S(3) = 0.4
    val h = r.find(_.getString(0) == "h").get
    assert(h.getAs[Long]("n_events") === 0L)
    assert(h.isNullAt(h.fieldIndex("median_survival")))
  }

  test("boilerplateMass: high-df shingles carry the template share") {
    val docs = (1 to 5).map(i => (i.toLong, "a", "a b c")) :+
      (6L, "a", "x y z")
    val r = CorpusStats.boilerplateMass(docs.toDF("id", "src", "text"),
      "id", "src", "text", n = 3, minDf = 5L).head()
    assert(r.getAs[Long]("n_instances") === 6L)
    assert(r.getAs[Long]("n_boilerplate") === 5L)
    assert(r.getAs[Double]("boilerplate_share") === 0.833333)
  }

  test("entropyBySource: a deterministic chain is fully redundant") {
    val df = Seq(("s", "a b a b")).toDF("src", "text")
    val r = Distinctive.entropyBySource(df, "src", "text").head()
    assert(r.getAs[Long]("n_pairs") === 3L)
    assert(r.getAs[Double]("h_unigram") === 0.636514)
    assert(r.getAs[Double]("h_cond") === 0.0)
    assert(r.getAs[Double]("redundancy") === 1.0)
  }

  test("streaks: run lengths and the live streak at series end") {
    val df = Seq("2024-01-01" -> 1.0, "2024-01-02" -> 2.0,
      "2024-01-03" -> 3.0, "2024-01-04" -> 2.0,
      "2024-01-05" -> 1.0, "2024-01-06" -> 5.0)
      .map { case (d, v) =>
        (java.sql.Timestamp.valueOf(d + " 12:00:00"), v) }
      .toDF("ts", "value")
    val r = Forecast.streaks(df, "ts", "value").head()
    assert(r.getAs[Long]("n_days") === 6L)
    assert(r.getAs[Long]("n_up") === 3L)
    assert(r.getAs[Long]("n_down") === 2L)
    assert(r.getAs[Long]("longest_up") === 2L)
    assert(r.getAs[Long]("longest_down") === 2L)
    assert(r.getAs[Long]("current_streak") === 1L)
  }
}
