package graft

import graft.eda.Concentration
import graft.ml.{Stats, Uplift}
import graft.operators.Forecast
import graft.proximity.BinaryQuant
import graft.text.Curriculum
import org.apache.spark.sql.functions._

/** Concentration (q261), uplift/Qini (q262), binary quantization
  * (q263), Holt-Winters (q264), Nelson-Aalen (q265) and curriculum
  * ordering (q266): hand-computed fixtures + invariants. */
class WaveNineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("concentration: equal values give gini 0, hhi 1/n") {
    val df = (1 to 8).map(i => ("g", 10.0)).toDF("grp", "x")
    val r = Concentration.concentration(df, "grp", "x").head()
    assert(r.getLong(1) == 8 && r.getDouble(2) == 80.0)
    assert(r.getDouble(3) == 0.0)
    assert(r.getDouble(4) == 0.125)
    // top 10% of 8 = ceil(0.8) = 1 value → share 1/8
    assert(r.getDouble(5) == 0.125)
  }

  test("concentration: single holder gives gini (n-1)/n, hhi 1") {
    val df = (("g", 100.0) +: Seq.fill(9)(("g", 0.0))).toDF("grp", "x")
    val r = Concentration.concentration(df, "grp", "x").head()
    assert(r.getDouble(3) == 0.9)
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0)
  }

  test("concentration: zero-total group emits nulls, not division junk") {
    val df = Seq(("z", 0.0), ("z", 0.0)).toDF("grp", "x")
    val r = Concentration.concentration(df, "grp", "x").head()
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }

  test("qiniByBucket: planted uplift concentrates in the top buckets") {
    // 40 units, scores 40..1; treated = even idx; outcome = 1 for
    // treated units with score > 20, else 0 → all uplift in the top
    // half; control outcome always 0
    val units = (1 to 40).map { i =>
      val treated = i % 2 == 0
      (i.toLong, i.toDouble, if (treated && i > 20) 1.0 else 0.0, treated)
    }.toDF("id", "score", "y", "treated")
    val out = Uplift.qiniByBucket(units, col("treated"), "score", "y",
      "id", nBuckets = 4).orderBy("bucket").collect()
    assert(out.length == 4)
    // buckets 1-2 (scores 40..21): every treated unit converts
    assert(out(0).getDouble(5) == 1.0 && out(1).getDouble(5) == 1.0)
    assert(out(2).getDouble(5) == 0.0 && out(3).getDouble(5) == 0.0)
    // Qini accumulates to the total treated conversions (control is 0
    // and arms are balanced: cumNt/cumNc = 1)
    assert(out(3).getDouble(6) == 10.0)
    assert(out(0).getLong(1) == 5 && out(0).getLong(2) == 5)
  }

  test("qiniByBucket: bucket with no control emits null uplift") {
    val units = Seq((1L, 2.0, 1.0, true), (2L, 1.0, 0.0, false))
      .toDF("id", "score", "y", "treated")
    val out = Uplift.qiniByBucket(units, col("treated"), "score", "y",
      "id", nBuckets = 2).orderBy("bucket").collect()
    assert(out(0).isNullAt(5) && out(1).isNullAt(5))
  }

  test("binary quant: hamming distance matches unpacked brute force") {
    // 3-dim vectors (one word, partial): thresholds are midranges
    // dim1: (0+8)/2=4, dim2: (0+4)/2=2, dim3: (0+6)/2=3
    // bits (v>thr): a=(1,1,1) b=(0,0,0) c=(1,0,1)
    val df = Seq((1L, Seq(8.0f, 4.0f, 6.0f)), (2L, Seq(0.0f, 0.0f, 0.0f)),
        (3L, Seq(5.0f, 1.0f, 4.0f)))
      .toDF("id", "vec")
    val out = BinaryQuant.hammingTopK(df, Seq(Tuple1(1L)).toDF("id"),
        "id", "vec", dim = 3, k = 2)
      .orderBy("rank").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 3 && out(0).getInt(2) == 1) // c differs dim2
    assert(out(1).getLong(1) == 2 && out(1).getInt(2) == 3) // b differs all
  }

  test("binary quant: >32 dims pack into multiple words correctly") {
    // 40 dims; query q and candidate d differ in exactly dims 1, 33, 40
    // (one in word 0, two in word 1)
    def vec(flip: Set[Int]): Seq[Float] =
      (1 to 40).map(d => if (flip.contains(d)) 1.0f else -1.0f)
    val df = Seq((1L, vec(Set())), (2L, vec(Set(1, 33, 40))),
        (3L, vec((1 to 40).toSet)))
      .toDF("id", "vec")
    val out = BinaryQuant.hammingTopK(df, Seq(Tuple1(1L)).toDF("id"),
        "id", "vec", dim = 40, k = 2)
      .orderBy("rank").collect()
    assert(out(0).getLong(1) == 2 && out(0).getInt(2) == 3)
    assert(out(1).getLong(1) == 3 && out(1).getInt(2) == 40)
  }

  test("binary quant: ties break by candidate id and self is excluded") {
    val df = Seq((1L, Seq(1.0f, 1.0f)), (2L, Seq(1.0f, 1.0f)),
        (3L, Seq(1.0f, 1.0f)))
      .toDF("id", "vec")
    val out = BinaryQuant.hammingTopK(df, Seq(Tuple1(2L)).toDF("id"),
        "id", "vec", dim = 2, k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L))
  }

  test("holtWinters: pure period-7 series is forecast exactly") {
    // y_t = pattern[(t-1) % 7], zero trend: init gives L = mean,
    // T = 0, s_i = pattern_i − mean, and the recursion is then a fixed
    // point — every forecast equals y, every residual is 0, level and
    // trend never move
    val pattern = Seq(20.0, 30.0, 10.0, 40.0, 25.0, 35.0, 15.0)
    val mean = pattern.sum / 7
    val days = (1 to 21).map(t =>
      (java.sql.Timestamp.valueOf(f"2024-02-${t}%02d 12:00:00"),
        pattern((t - 1) % 7)))
    val out = Forecast.holtWinters(days.toDF("ts", "value"), "ts", "value")
      .orderBy("day").collect()
    assert(out.length == 14) // t = 8..21
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDouble(2) == mean)                       // level
      assert(r.getDouble(3) == 0.0)                        // trend
      assert(r.getDouble(5) == pattern(i % 7))             // forecast
      assert(r.getDouble(6) == 0.0)                        // resid
      assert(math.abs(r.getDouble(4) -
        (pattern(i % 7) - mean)) < 1e-9)                   // seasonal
    }
  }

  test("holtWinters: series shorter than two seasons emits nothing") {
    val days = (1 to 13).map(t =>
      (java.sql.Timestamp.valueOf(f"2024-02-${t}%02d 12:00:00"), 1.0))
    assert(Forecast.holtWinters(days.toDF("ts", "value"), "ts", "value")
      .count() == 0)
  }

  test("nelsonAalen: hand-computed cohort") {
    // durations (event=1): 1, 2; censored at 3. n=3.
    // t=1: H = 1/3, var = 1/9; t=2: H = 1/3+1/2, var = 1/9+1/4
    val life = Seq((1.0, 1), (2.0, 1), (3.0, 0)).toDF("duration", "event")
    val out = Stats.nelsonAalen(life, "duration", "event")
      .orderBy("t").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 3 && out(0).getLong(2) == 1)
    assert(math.abs(out(0).getDouble(3) - 1.0 / 3) < 1e-6)
    assert(math.abs(out(1).getDouble(3) - (1.0 / 3 + 0.5)) < 1e-6)
    assert(math.abs(out(1).getDouble(4) - (1.0 / 9 + 0.25)) < 1e-6)
    // Fleming-Harrington survival dominates Kaplan-Meier pointwise
    val km = Stats.kaplanMeier(life, "duration", "event")
      .orderBy("t").collect()
    out.zip(km).foreach { case (na, k) =>
      assert(na.getDouble(5) >= k.getDouble(3) - 1e-9)
    }
  }

  test("curriculumOrder: bands partition and sources interleave") {
    // 12 docs, 2 sources alternating, difficulty = id
    val docs = (1 to 12).map(i => (i.toLong, s"s${i % 2}", i.toLong * 10))
      .toDF("doc_id", "source", "len")
    val out = Curriculum.curriculumOrder(docs, "doc_id", "len", "source",
        nBands = 3)
      .orderBy("global_pos").collect()
    assert(out.map(_.getInt(5)).toSeq == (1 to 12))
    // band 1 = easiest 4 docs (ids 1..4), band 3 = hardest (9..12)
    assert(out.take(4).map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    assert(out.takeRight(4).map(_.getLong(0)).toSet ==
      Set(9L, 10L, 11L, 12L))
    // within each band the first two positions hit both sources
    (0 until 3).foreach { b =>
      assert(out.slice(b * 4, b * 4 + 2).map(_.getString(1)).toSet.size
        == 2)
    }
  }
}
