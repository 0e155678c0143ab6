package graft

import graft.eda.Integrity
import graft.ml.Stats
import graft.operators.{Events, Hierarchy}
import org.apache.spark.sql.functions._

/** Hierarchy flatten (q285), cumulative distinct (q286), partial
  * correlation (q287), McNemar (q288), FK integrity (q289) and
  * Cronbach's alpha (q290): hand-computed fixtures + invariants. */
class WaveThirteenOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hierarchy flatten: depths and roots of a known forest") {
    // forest: 1 and 2 roots; 3,4 under 2; 5 under 4 -> depth 2
    val edges = Seq((1L, None), (2L, None), (3L, Some(2L)),
      (4L, Some(2L)), (5L, Some(4L)))
      .toDF("id", "parent")
    val out = Hierarchy.flatten(edges, "id", "parent")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(1L) == ((1L, 0L)) && out(2L) == ((2L, 0L)))
    assert(out(3L) == ((2L, 1L)) && out(4L) == ((2L, 1L)))
    assert(out(5L) == ((2L, 2L)))
  }

  test("hierarchy flatten: deep chain resolves in O(log) rounds") {
    // a 200-deep chain: 2^8 = 256 >= 200 -> 8 doublings suffice
    val edges = (1L to 200L)
      .map(k => (k, if (k == 1) None else Some(k - 1)))
      .toDF("id", "parent")
    val out = Hierarchy.flatten(edges, "id", "parent", maxDoublings = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(200L).getLong(1) == 1L && out(200L).getLong(2) == 199L)
    assert(out(1L).getLong(2) == 0L)
  }

  test("hierarchy flatten: a cycle fails loudly, not wrongly") {
    val edges = Seq((1L, Some(2L)), (2L, Some(1L)), (3L, None))
      .toDF("id", "parent")
    val e = intercept[IllegalArgumentException] {
      Hierarchy.flatten(edges, "id", "parent", maxDoublings = 3).collect()
    }
    assert(e.getMessage.contains("converge"))
  }

  test("cumulativeDistinct: new vs returning users accumulate") {
    def ts(d: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(java.time.LocalDate.parse("2024-03-01")
        .plusDays(d).atStartOfDay)
    // day0: u1,u2 (2 new); day1: u1 again + u3 (1 new); day2: u2 only
    val ev = Seq((1L, ts(0)), (2L, ts(0)), (1L, ts(1)), (3L, ts(1)),
      (2L, ts(2))).toDF("user_id", "ts")
    val out = Events.cumulativeDistinct(ev, "user_id", "ts")
      .orderBy("day").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 2L, 1L)) // events
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 1L, 0L)) // new
    assert(out.map(_.getLong(3)).toSeq == Seq(2L, 3L, 3L)) // cumulative
  }

  test("partialCorr: confounder-driven correlation collapses") {
    // x = z + e1, y = z + e2 with independent hash-like noise: raw
    // r_xy ~ 0.999 but partialling z out leaves only corr(e1, e2)
    // ~ 0.10; the 'real' group's x-y link survives partialling
    val rows = (1 to 50).map { i =>
      val z = i.toDouble
      val e1 = ((i * 37) % 101 - 50) / 50.0
      val e2 = ((i * 53) % 97 - 48) / 48.0
      ("conf", z + e1, z + e2, z)
    } ++ (1 to 50).map { i =>
      // y depends on x only; z is near-constant noise
      ("real", i.toDouble, 2.0 * i, (i % 3).toDouble)
    }
    val out = Stats.partialCorr(rows.toDF("g", "x", "y", "z"),
        "g", "x", "y", "z")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("conf").getDouble(2) > 0.99)  // raw r_xy
    assert(math.abs(out("conf").getDouble(5)) < 0.3) // partial ~ 0.10
    assert(out("real").getDouble(5) > 0.999) // survives partialling
  }

  test("mcnemar: hand-computed discordant cells") {
    // b = only_a = 8, c = only_b = 2 -> chi2 = (6-1)^2/10 = 2.5
    val rows = Seq.fill(5)((1, 1, 1)) ++ Seq.fill(8)((1, 1, 0)) ++
      Seq.fill(2)((1, 0, 1)) ++ Seq.fill(3)((1, 0, 0))
    val r = Stats.mcnemar(rows.toDF("label", "pred_a", "pred_b"),
      "label", "pred_a", "pred_b").collect()(0)
    assert(r.getLong(0) == 18 && r.getLong(1) == 5)
    assert(r.getLong(2) == 8 && r.getLong(3) == 2 && r.getLong(4) == 3)
    assert(r.getDouble(5) == 2.5)
  }

  test("mcnemar: no discordance emits null chi2") {
    val rows = Seq((1, 1, 1), (0, 0, 0), (1, 0, 0))
    val r = Stats.mcnemar(rows.toDF("label", "pred_a", "pred_b"),
      "label", "pred_a", "pred_b").collect()(0)
    assert(r.isNullAt(5))
  }

  test("fkAudit: orphans, nulls and rates are exact") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L),
      Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Integrity.fkAudit(child, "fk", parent, "pk", "c->p")
      .collect()(0)
    assert(r.getString(0) == "c->p")
    assert(r.getLong(1) == 7 && r.getLong(2) == 1) // rows, null rows
    assert(r.getLong(3) == 3 && r.getLong(4) == 1) // orphan rows, keys
    assert(r.getDouble(5) == 0.5)                  // 3 of 6 non-null
  }

  test("fkAudit: clean edge reports zero orphans") {
    val child = Seq(1L, 2L, 2L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Integrity.fkAudit(child, "fk", parent, "pk", "e").collect()(0)
    assert(r.getLong(3) == 0 && r.getDouble(5) == 0.0)
  }

  test("cronbachAlpha: perfectly parallel items give alpha 1") {
    // every subject scores the same on all 3 items -> item totals are
    // 3x any item -> total_var = 9 * item_var, sum_item_var = 3 * v
    // alpha = 3/2 * (1 - 3v/9v) = 1
    val rows = (1 to 20).flatMap(s =>
      Seq((s, "a", s.toDouble), (s, "b", s.toDouble), (s, "c", s.toDouble)))
    val r = Stats.cronbachAlpha(rows.toDF("s", "i", "v"), "s", "i", "v")
      .collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 20)
    assert(r.getDouble(4) == 1.0)
  }

  test("cronbachAlpha: independent items give alpha near 0; " +
      "incomplete subjects drop") {
    // items are independent hash-like sequences; subject 99 has only
    // 2 of 3 items and must not enter
    val rows = (1 to 60).flatMap { s =>
      Seq((s, "a", ((s * 37) % 101).toDouble),
        (s, "b", ((s * 53) % 97).toDouble),
        (s, "c", ((s * 71) % 89).toDouble))
    } ++ Seq((99, "a", 5.0), (99, "b", 5.0))
    val r = Stats.cronbachAlpha(rows.toDF("s", "i", "v"), "s", "i", "v")
      .collect()(0)
    assert(r.getLong(1) == 60)
    assert(math.abs(r.getDouble(4)) < 0.5)
  }
}
